package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-10 batch 21: tuple/vector arithmetic and the array tail.
  *
  *  - tuplePlus/Minus/Multiply/Divide/Modulo/IntDiv[OrZero] (+ByNumber)
  *    and tupleNegate (reference src/Functions/vectorFunctions.cpp):
  *    element-wise over struct fields; integer fields promote to Int64,
  *    any fractional operand promotes the field to Float64, divide is
  *    always Float64 (CH divide returns Float64)
  *  - tupleConcat / tupleNames / tupleToNameValuePairs /
  *    tupleHammingDistance / flattenTuple (src/Functions/tuple*.cpp)
  *  - arrayPRAUC (src/Functions/array/arrayAUC.cpp:322 — right Riemann
  *    sum over the Precision x TP curve scaled by total positives,
  *    thresholds advance only when the score changes)
  *  - emptyArrayToSingle (src/Functions/emptyArrayToSingle.cpp: empty
  *    arrays become a one-element array of the type default)
  *  - arrayPartialShuffle seeded determinism (structural: same contract
  *    as src/Functions/array/arrayShuffle.cpp — first n positions are a
  *    uniform sample; the exact permutation for a given seed is
  *    RNG-specific and documented as non-portable)
  */
object Batch21 {

  // ---- numeric helpers over struct fields ----
  private[functions] def isFractional(t: DataType): Boolean = t match {
    case DoubleType | FloatType => true
    case _: DecimalType => true
    case _ => false
  }

  private[functions] def isNumeric(t: DataType): Boolean = t match {
    case _: NumericType => true
    case _ => false
  }

  private[functions] def asDouble(v: Any): Double = v match {
    case n: Number => n.doubleValue
    case d: Decimal => d.toDouble
    case b: Boolean => if (b) 1.0 else 0.0
    case other => throw new IllegalArgumentException(s"not numeric: $other")
  }

  private[functions] def asLong(v: Any): Long = v match {
    case n: Number => n.longValue
    case d: Decimal => d.toLong
    case b: Boolean => if (b) 1L else 0L
    case other => throw new IllegalArgumentException(s"not numeric: $other")
  }

  /** Result field type + value for an elementwise op. */
  private[functions] def fieldResultType(op: String, lt: DataType, rt: DataType): DataType =
    if (op == "divide") DoubleType
    else if (isFractional(lt) || isFractional(rt)) DoubleType
    else LongType

  private[functions] def applyOp(op: String, resT: DataType, l: Any, r: Any): Any =
    resT match {
      case DoubleType =>
        val (a, b) = (asDouble(l), asDouble(r))
        op match {
          case "plus" => a + b
          case "minus" => a - b
          case "multiply" => a * b
          case "divide" => a / b
          case "modulo" => a % b
          case "intDiv" => math.floor(a / b)
          case "intDivOrZero" => if (b == 0.0) 0.0 else math.floor(a / b)
        }
      case LongType =>
        val (a, b) = (asLong(l), asLong(r))
        op match {
          case "plus" => a + b
          case "minus" => a - b
          case "multiply" => a * b
          case "modulo" => a % b
          case "intDiv" => a / b
          case "intDivOrZero" => if (b == 0L) 0L else a / b
        }
    }

  // ---- arrayPRAUC: exact reference algorithm ----
  def prAuc(scores: Array[Double], labels: Array[Boolean]): Double = {
    val n = scores.length
    if (n == 0) return 0.0
    val idx = (0 until n).sortBy(i => -scores(i))
    var area = 0.0
    var threshold = scores(idx(0))
    var prevTp = 0L
    var currTp = 0L
    var currFp = 0L
    for (i <- idx) {
      if (scores(i) != threshold) {
        if (currTp + currFp > 0)
          area += currTp.toDouble / (currTp + currFp) * (currTp - prevTp)
        prevTp = currTp
        threshold = scores(i)
      }
      if (labels(i)) currTp += 1 else currFp += 1
    }
    if (currTp + currFp > 0)
      area += currTp.toDouble / (currTp + currFp) * (currTp - prevTp)
    val totalPositives = currTp
    if (totalPositives == 0) 0.0 else area / totalPositives
  }

  /** splitmix64 — public-domain seed expansion (Steele et al. 2014). */
  private[functions] def splitmix64(state: Long): Long = {
    var z = state + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

/** Element-wise tuple arithmetic (both sides structs). */
case class TupleArith(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  private def lf = left.dataType.asInstanceOf[StructType].fields
  private def rf = right.dataType.asInstanceOf[StructType].fields
  override def dataType: DataType = {
    require(lf.length == rf.length, s"tuple sizes differ: ${lf.length} vs ${rf.length}")
    StructType(lf.zip(rf).zipWithIndex.map { case ((l, r), i) =>
      StructField(s"col${i + 1}", Batch21.fieldResultType(op, l.dataType, r.dataType))
    })
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (lr, rr) = (l.asInstanceOf[InternalRow], r.asInstanceOf[InternalRow])
    val out = new Array[Any](lf.length)
    var i = 0
    while (i < lf.length) {
      val t = Batch21.fieldResultType(op, lf(i).dataType, rf(i).dataType)
      out(i) = Batch21.applyOp(op, t, lr.get(i, lf(i).dataType), rr.get(i, rf(i).dataType))
      i += 1
    }
    InternalRow.fromSeq(out.toSeq)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TupleArith =
    copy(left = l, right = r)
}

/** tupleMultiplyByNumber / tupleDivideByNumber / ... (right is a scalar). */
case class TupleArithByNumber(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  private def lf = left.dataType.asInstanceOf[StructType].fields
  override def dataType: DataType =
    StructType(lf.zipWithIndex.map { case (f, i) =>
      StructField(s"col${i + 1}",
        Batch21.fieldResultType(op, f.dataType, right.dataType))
    })
  override def nullSafeEval(l: Any, r: Any): Any = {
    val lr = l.asInstanceOf[InternalRow]
    val out = new Array[Any](lf.length)
    var i = 0
    while (i < lf.length) {
      val t = Batch21.fieldResultType(op, lf(i).dataType, right.dataType)
      out(i) = Batch21.applyOp(op, t, lr.get(i, lf(i).dataType), r)
      i += 1
    }
    InternalRow.fromSeq(out.toSeq)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TupleArithByNumber =
    copy(left = l, right = r)
}

case class TupleNegateExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private def cf = child.dataType.asInstanceOf[StructType].fields
  override def dataType: DataType =
    StructType(cf.zipWithIndex.map { case (f, i) =>
      StructField(s"col${i + 1}",
        if (Batch21.isFractional(f.dataType)) DoubleType else LongType)
    })
  override def nullSafeEval(v: Any): Any = {
    val row = v.asInstanceOf[InternalRow]
    InternalRow.fromSeq(cf.zipWithIndex.map { case (f, i) =>
      // the branches must NOT unify: Scala would widen the Long branch
      // to Double and break the declared LongType field
      val neg: Any =
        if (Batch21.isFractional(f.dataType)) -Batch21.asDouble(row.get(i, f.dataType))
        else -Batch21.asLong(row.get(i, f.dataType))
      neg
    }.toSeq)
  }
  override protected def withNewChildInternal(c: Expression): TupleNegateExpr = copy(child = c)
}

case class TupleConcatExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  private def allFields = children.flatMap(_.dataType.asInstanceOf[StructType].fields)
  override def dataType: DataType =
    StructType(allFields.zipWithIndex.map { case (f, i) =>
      StructField(s"col${i + 1}", f.dataType, f.nullable)
    })
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val parts = children.map(_.eval(input))
    if (parts.contains(null)) return null
    val vals = children.zip(parts).flatMap { case (c, p) =>
      val fs = c.dataType.asInstanceOf[StructType].fields
      val row = p.asInstanceOf[InternalRow]
      fs.zipWithIndex.map { case (f, i) => row.get(i, f.dataType) }
    }
    InternalRow.fromSeq(vals)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TupleConcatExpr =
    copy(children = c)
}

/** CH's tuple() builds UNNAMED tuples whose element names are the
  * ordinals '1','2',… (tupleNames.cpp); Spark's struct() auto-names
  * fields after the source expressions, so the ordinals are emitted
  * unconditionally (named-tuple CASTs are outside the dialect surface). */
case class TupleNamesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val n = child.dataType.asInstanceOf[StructType].fields.length
    new GenericArrayData(
      Array.tabulate[Any](n)(i => UTF8String.fromString((i + 1).toString)))
  }
  override protected def withNewChildInternal(c: Expression): TupleNamesExpr = copy(child = c)
}

/** array<struct<name string, value>>; numeric tuples carry Float64
  * values, all-string tuples carry String (CH requires one shared type). */
case class TupleToNameValuePairsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private def cf = child.dataType.asInstanceOf[StructType].fields
  private def allString = cf.forall(_.dataType == StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("value", if (allString) StringType else DoubleType))))
  override def nullSafeEval(v: Any): Any = {
    val row = v.asInstanceOf[InternalRow]
    val out = cf.zipWithIndex.map { case (f, i) =>
      val name = UTF8String.fromString((i + 1).toString) // ordinal names, as tupleNames
      val value: Any =
        if (allString) row.get(i, f.dataType)
        else Batch21.asDouble(row.get(i, f.dataType))
      InternalRow.fromSeq(Seq(name, value))
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(c: Expression): TupleToNameValuePairsExpr =
    copy(child = c)
}

/** Count of pairwise-unequal elements (reference tupleHammingDistance.cpp). */
case class TupleHammingDistanceExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  private def lf = left.dataType.asInstanceOf[StructType].fields
  private def rf = right.dataType.asInstanceOf[StructType].fields
  override def dataType: DataType = IntegerType
  override def nullSafeEval(l: Any, r: Any): Any = {
    require(lf.length == rf.length, "tuple sizes differ")
    val (lr, rr) = (l.asInstanceOf[InternalRow], r.asInstanceOf[InternalRow])
    var d = 0
    var i = 0
    while (i < lf.length) {
      val (a, b) = (lr.get(i, lf(i).dataType), rr.get(i, rf(i).dataType))
      val eq =
        if (Batch21.isNumeric(lf(i).dataType) && Batch21.isNumeric(rf(i).dataType))
          Batch21.asDouble(a) == Batch21.asDouble(b)
        else a == b
      if (!eq) d += 1
      i += 1
    }
    d
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TupleHammingDistanceExpr =
    copy(left = l, right = r)
}

/** Depth-first flatten of nested structs into one flat tuple. */
case class FlattenTupleExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private def flatFields(t: StructType): Seq[StructField] =
    t.fields.toSeq.flatMap { f =>
      f.dataType match {
        case s: StructType => flatFields(s)
        case _ => Seq(f)
      }
    }
  override def dataType: DataType =
    StructType(flatFields(child.dataType.asInstanceOf[StructType])
      .zipWithIndex.map { case (f, i) => StructField(s"col${i + 1}", f.dataType, f.nullable) })
  private def flatValues(row: InternalRow, t: StructType): Seq[Any] =
    t.fields.toSeq.zipWithIndex.flatMap { case (f, i) =>
      f.dataType match {
        case s: StructType => flatValues(row.getStruct(i, s.fields.length), s)
        case dt => Seq(row.get(i, dt))
      }
    }
  override def nullSafeEval(v: Any): Any =
    InternalRow.fromSeq(flatValues(v.asInstanceOf[InternalRow],
      child.dataType.asInstanceOf[StructType]))
  override protected def withNewChildInternal(c: Expression): FlattenTupleExpr = copy(child = c)
}

case class ChArrayPRAUC(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(s: Any, l: Any): Any = {
    val sa = s.asInstanceOf[ArrayData]
    val la = l.asInstanceOf[ArrayData]
    val scoreT = left.dataType.asInstanceOf[ArrayType].elementType
    val labelT = right.dataType.asInstanceOf[ArrayType].elementType
    val n = sa.numElements()
    require(la.numElements() == n, "arrayPRAUC: size mismatch")
    val scores = Array.tabulate(n)(i => Batch21.asDouble(sa.get(i, scoreT)))
    val labels = Array.tabulate(n)(i => Batch21.asDouble(la.get(i, labelT)) > 0)
    Batch21.prAuc(scores, labels)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ChArrayPRAUC =
    copy(left = l, right = r)
}

/** Empty arrays become [default-of-element-type] (emptyArrayToSingle.cpp). */
case class ChEmptyArrayToSingle(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() > 0) arr
    else {
      val elemT = child.dataType.asInstanceOf[ArrayType].elementType
      val default: Any = elemT match {
        case ByteType => 0.toByte
        case ShortType => 0.toShort
        case IntegerType => 0
        case LongType => 0L
        case FloatType => 0.0f
        case DoubleType => 0.0
        case d: DecimalType => Decimal(0, d.precision, d.scale)
        case BooleanType => false
        case StringType => UTF8String.fromString("")
        case DateType => 0 // 1970-01-01
        case TimestampType | TimestampNTZType => 0L
        case other => throw new IllegalArgumentException(
          s"emptyArrayToSingle: no default for $other")
      }
      new GenericArrayData(Array[Any](default))
    }
  }
  override protected def withNewChildInternal(c: Expression): ChEmptyArrayToSingle =
    copy(child = c)
}

/** Seeded Fisher-Yates (splitmix64 stream). Deterministic for a given
  * seed, but the permutation for a seed is NOT the reference's (their
  * pcg RNG) — documented structural equivalence. */
case class ChPartialShuffle(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = children.head.dataType
  override def nullable: Boolean = children.head.nullable
  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val elemT = children.head.dataType.asInstanceOf[ArrayType].elementType
    val n = arr.numElements()
    val vals = Array.tabulate[Any](n)(i => arr.get(i, elemT))
    val seed = if (children.length >= 3) {
      val s = children(2).eval(input)
      if (s == null) 0L else s.asInstanceOf[Number].longValue
    } else System.nanoTime()
    var state = seed
    var i = n - 1
    while (i > 0) {
      state = Batch21.splitmix64(state)
      val j = ((state >>> 1) % (i + 1)).toInt
      val t = vals(i); vals(i) = vals(j); vals(j) = t
      i -= 1
    }
    new GenericArrayData(vals)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ChPartialShuffle =
    copy(children = c)
}

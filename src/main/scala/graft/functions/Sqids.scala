package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-10 batch 35: Sqids (reference src/Functions/sqid.cpp over
  * contrib/sqids-cpp) — the published Sqids spec
  * (https://sqids.org/spec, v0.4 algorithm): consistent-shuffled
  * default alphabet, per-number separator re-shuffle, prefix char from
  * the offset derived from the inputs. Values pinned against the
  * reference's own test outputs (02933_sqid.reference: 1→'Uk',
  * [1,2]→'XMbT', [1,2,3]→'86Rf07', [1,2,3,4]→'Td1EnWQo').
  * The default blocklist re-encode loop is NOT implemented (the
  * blocklist file is not vendored here) — ids that would collide with a
  * blocked word encode to their first candidate instead (documented). */
object Sqids {
  private val DefaultAlphabet =
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

  /** The spec's consistent shuffle. */
  private def shuffle(a0: Array[Char]): Array[Char] = {
    val a = a0.clone()
    var i = 0
    var j = a.length - 1
    while (j > 0) {
      val r = (i * j + a(i) + a(j)) % a.length
      val t = a(i); a(i) = a(r); a(r) = t
      i += 1; j -= 1
    }
    a
  }

  private def toId(num: Long, alph: Array[Char]): String = {
    val sb = new StringBuilder
    var n = num
    do {
      sb.insert(0, alph((n % alph.length).toInt))
      n /= alph.length
    } while (n > 0)
    sb.toString
  }

  private def toNumber(id: String, alph: Array[Char]): Option[Long] = {
    var n = 0L
    var i = 0
    while (i < id.length) {
      val idx = alph.indexOf(id.charAt(i))
      if (idx < 0) return None
      n = n * alph.length + idx
      i += 1
    }
    Some(n)
  }

  private val baseShuffled: Array[Char] = shuffle(DefaultAlphabet.toCharArray)

  def encode(numbers: Seq[Long]): String = {
    if (numbers.isEmpty) return ""
    require(numbers.forall(_ >= 0), "sqidEncode: numbers must be non-negative")
    var offset = numbers.length
    var i = 0
    while (i < numbers.length) {
      offset += baseShuffled((numbers(i) % baseShuffled.length).toInt).toInt + i
      i += 1
    }
    offset %= baseShuffled.length
    var alphabet = baseShuffled.drop(offset) ++ baseShuffled.take(offset)
    val prefix = alphabet(0)
    alphabet = alphabet.reverse
    val ret = new StringBuilder().append(prefix)
    i = 0
    while (i < numbers.length) {
      ret.append(toId(numbers(i), alphabet.drop(1)))
      if (i < numbers.length - 1) {
        ret.append(alphabet(0)) // separator
        alphabet = shuffle(alphabet)
      }
      i += 1
    }
    ret.toString
  }

  def decode(id: String): Seq[Long] = {
    if (id.isEmpty) return Seq.empty
    if (id.exists(c => !DefaultAlphabet.contains(c))) return Seq.empty
    val prefix = id.charAt(0)
    val offset = baseShuffled.indexOf(prefix)
    if (offset < 0) return Seq.empty
    var alphabet = (baseShuffled.drop(offset) ++ baseShuffled.take(offset)).reverse
    var rest = id.substring(1)
    val out = scala.collection.mutable.Buffer.empty[Long]
    while (rest.nonEmpty) {
      val sep = alphabet(0)
      val idx = rest.indexOf(sep)
      val (chunk, tail) =
        if (idx < 0) (rest, "") else (rest.substring(0, idx), rest.substring(idx + 1))
      if (chunk.isEmpty) return out.toSeq
      toNumber(chunk, alphabet.drop(1)) match {
        case Some(n) => out += n
        case None => return Seq.empty
      }
      if (tail.nonEmpty || idx >= 0) alphabet = shuffle(alphabet)
      rest = tail
    }
    out.toSeq
  }
}

/** sqidEncode(n1, n2, …) -> String */
case class SqidEncode(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.contains(null)) return null
    val nums = vals.map {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => other.toString.toLong
    }
    UTF8String.fromString(Sqids.encode(nums))
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): SqidEncode = copy(children = cs)
}

/** sqidDecode(id) -> Array(UInt64); invalid ids decode to []. */
case class SqidDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Sqids.decode(v.toString).map(x => x: Any).toArray)
  override protected def withNewChildInternal(c: Expression): SqidDecode =
    copy(child = c)
}

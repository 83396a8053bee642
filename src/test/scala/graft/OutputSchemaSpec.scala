package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-comparator output contract: every registered query must emit only
  * scalar (atomic) columns. The driver's pandas comparator cannot sort or
  * hash complex values — DECIMAL hashing bit it in round 6, numpy arrays in
  * round 7 (q_fn_synonyms / q_fn_dialect_tail / q_fn_sparse_grams) — so
  * arrays/maps/structs must be rendered as engine-stable strings
  * (array_join / array_to_string) on both sides before registration. */
class OutputSchemaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("no registered query output contains ArrayType/MapType/StructType") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val bad = q(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
      bad
    }
    assert(offenders.isEmpty,
      s"complex-typed output columns break the driver comparator:\n  ${offenders.mkString("\n  ")}")
  }
}

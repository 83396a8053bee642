package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Length, Size}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
import org.apache.spark.sql.types.{ArrayType, MapType}

/** Polymorphic length (reference src/Functions/array/length.cpp +
  * src/Functions/lengthUTF8.cpp registration: ClickHouse `length` accepts
  * String OR Array/Map). Spark splits this into `length` (string) and
  * `size` (collections); this RuntimeReplaceable dispatches on the
  * resolved child type so dialect queries can stay polymorphic. Found by
  * the dialect fuzzer (FuzzDialect): `length(splitByChar(...))` used to
  * fail analysis after translating to Spark's string-only `length`. */
case class ChLength(child: Expression) extends RuntimeReplaceable
    with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType | _: MapType => Size(child, legacySizeOfNull = false)
    case _ => Length(child)
  }
  override protected def withNewChildInternal(newChild: Expression): ChLength =
    copy(child = newChild)
}

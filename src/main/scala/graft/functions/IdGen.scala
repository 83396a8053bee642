package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ID generation (reference: src/Functions/generateUUIDv4.cpp,
  * generateUUIDv7.cpp, generateSnowflakeID.cpp). v4 maps straight to
  * Spark's built-in `uuid()`; v7 and snowflake are time-ordered and need
  * per-partition state, so they are `Nondeterministic` expressions
  * initialized with the partition index (no executor coordination — the
  * partition index doubles as the machine/worker id, which is exactly the
  * reference's "machine id" role).
  */
object IdGen {
  import org.apache.spark.sql.graft.ColumnBridge.column

  /** UUID version 7 (draft RFC 9562): 48-bit unix millis, 4-bit version,
    * 12 random bits, 2-bit variant, 62 random bits. Time-ordered. */
  case class UuidV7() extends LeafExpression with Nondeterministic with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    @transient private var rng: java.util.Random = _
    override protected def initializeInternal(partitionIndex: Int): Unit =
      rng = new java.util.Random(java.security.SecureRandom.getInstance("SHA1PRNG").nextLong() ^ partitionIndex)
    override protected def evalInternal(input: InternalRow): Any = {
      val ms = System.currentTimeMillis()
      val hi = (ms << 16) | 0x7000L | (rng.nextInt(1 << 12) & 0xfffL)
      val lo = 0x8000000000000000L | (rng.nextLong() >>> 2)
      UTF8String.fromString(new java.util.UUID(hi, lo).toString)
    }
    override def prettyName: String = "generate_uuid_v7"
  }

  /** Snowflake ID: 41-bit millis since epoch (2010-11-04, the widely
    * published original epoch), 10-bit machine id (partition index),
    * 12-bit per-partition sequence. Monotonic within a partition. */
  case class SnowflakeId() extends LeafExpression with Nondeterministic with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    private val epoch = 1288834974657L
    @transient private var machine: Long = _
    @transient private var seq: Long = _
    @transient private var lastMs: Long = _
    override protected def initializeInternal(partitionIndex: Int): Unit = {
      machine = partitionIndex & 1023L; seq = 0L; lastMs = -1L
    }
    override protected def evalInternal(input: InternalRow): Any = {
      val ms = System.currentTimeMillis()
      if (ms == lastMs) seq = (seq + 1) & 4095L else { seq = 0L; lastMs = ms }
      ((ms - epoch) << 22) | (machine << 12) | seq
    }
    override def prettyName: String = "generate_snowflake_id"
  }

  def generate_uuid_v7(): Column = column(UuidV7())
  def generate_snowflake_id(): Column = column(SnowflakeId())

  /** Millisecond timestamp embedded in a snowflake id. */
  def snowflake_to_millis(id: Column): Column = {
    import org.apache.spark.sql.functions._
    shiftright(id, 22) + 1288834974657L
  }
}

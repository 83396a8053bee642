package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

case class Ev(user: Long, ts: Timestamp, value: Double)
case class SessionState(n: Long, total: Double)
case class SessionOut(user: Long, n: Long, total: Double)

/** Custom stateful streaming (SURVEY.md §2.9 incremental MV /
  * custom-state row): flatMapGroupsWithState sessionization with explicit
  * state — the escape hatch when windows/watermarks can't express the
  * state machine. */
class StatefulStreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("flatMapGroupsWithState accumulates per-user running session state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = mem.toDS()
      .groupByKey(_.user)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0))
          val batch = evs.toSeq
          val next = SessionState(prev.n + batch.size, prev.total + batch.map(_.value).sum)
          state.update(next)
          Iterator(SessionOut(user, next.n, next.total))
      }
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("update").start()
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    mem.addData(Ev(1, t0, 1.0), Ev(1, t0, 2.0), Ev(2, t0, 5.0))
    q.processAllAvailable()
    mem.addData(Ev(1, t0, 4.0))
    q.processAllAvailable(); q.stop()
    val last = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
    assert(last(1L) == (1L, 3L, 7.0))
    assert(last(2L) == (2L, 1L, 5.0))
  }
}

package graft.ops

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.LinkedBlockingQueue
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StringType

import scala.jdk.CollectionConverters._

/** Executable (external-process) UDFs (reference:
  * src/Functions/UserDefined/UserDefinedExecutableFunction.cpp — a
  * user-configured command that reads argument rows on stdin and writes
  * one result row per input row on stdout, TabSeparated).
  *
  * Spark shape: one process per PARTITION (amortizing spawn cost exactly
  * like the reference's process pool), a bounded handoff queue between a
  * writer thread (feeds stdin) and the consuming iterator (reads stdout),
  * so memory stays O(queue), never O(partition). The operator is a plain
  * mapPartitions — it parallelizes per partition and never shuffles.
  *
  * Contract (same as the reference's): the command must emit exactly one
  * output line per input line, in input order. Input values are
  * newline-sanitized before writing; null input is sent as "".
  */
object ExecutableUdf {

  private case class Handoff(row: Row)

  /** Append `outputCol` = one stdout line of `cmd` per row of `inputCol`. */
  def pipeColumn(df: DataFrame, inputCol: String, outputCol: String,
                 cmd: Seq[String]): DataFrame = {
    val outSchema = df.schema.add(outputCol, StringType, nullable = true)
    val idx = df.schema.fieldIndex(inputCol)
    val cmdList = cmd.toList
    df.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else new Iterator[Row] {
        private val proc = new ProcessBuilder(cmdList.asJava).start()
        private val toProc = new BufferedWriter(
          new OutputStreamWriter(proc.getOutputStream, UTF_8))
        private val fromProc = new BufferedReader(
          new InputStreamReader(proc.getInputStream, UTF_8))
        // Bounded queue: the writer can run at most 1024 rows ahead of the
        // reader, which also bounds the process's in-flight pipe data.
        private val queue = new LinkedBlockingQueue[AnyRef](1024)
        private val poison = new Object
        private val writerErr = new AtomicReference[Throwable]

        private val writer = new Thread(() => {
          try {
            while (rows.hasNext) {
              val r = rows.next()
              val v = if (r.isNullAt(idx)) ""
                      else String.valueOf(r.get(idx))
                        .replace('\n', ' ').replace('\r', ' ')
              toProc.write(v); toProc.newLine()
              queue.put(Handoff(r))
            }
            toProc.close()
          } catch {
            case t: Throwable => writerErr.set(t); proc.destroy()
          } finally queue.put(poison)
        }, s"graft-exec-udf-writer")
        writer.setDaemon(true)
        writer.start()

        private var pending: Row = _
        private var done = false

        private def advance(): Unit = {
          if (pending != null || done) return
          queue.take() match {
            case Handoff(r) =>
              val line = fromProc.readLine()
              if (line == null)
                throw new IllegalStateException(
                  s"executable UDF ${cmdList.mkString(" ")} ended before producing " +
                    "one line per input row")
              pending = Row.fromSeq(r.toSeq :+ line)
            case _ => // poison: input exhausted
              done = true
              if (writerErr.get != null)
                throw new IllegalStateException("executable UDF writer failed", writerErr.get)
              if (fromProc.readLine() != null)
                throw new IllegalStateException(
                  s"executable UDF ${cmdList.mkString(" ")} produced more lines than input rows")
              val rc = proc.waitFor()
              if (rc != 0)
                throw new IllegalStateException(
                  s"executable UDF ${cmdList.mkString(" ")} exited with code $rc")
          }
        }

        override def hasNext: Boolean = { advance(); pending != null }
        override def next(): Row = {
          advance()
          val r = pending; pending = null
          if (r == null) throw new NoSuchElementException
          r
        }
      }
    }(Encoders.row(outSchema))
  }
}

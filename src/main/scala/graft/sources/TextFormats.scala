package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Human/interchange text OUTPUT formats — the reference's Pretty,
  * Markdown and SQLInsert writers (src/Formats/registerFormats.cpp:
  * registerOutputFormatPretty / Markdown / SQLInsert;
  * Processors/Formats/Impl/PrettyBlockOutputFormat.cpp,
  * MarkdownRowOutputFormat.cpp, SQLInsertRowOutputFormat.cpp).
  *
  * Two surfaces per format:
  *   - `pretty`/`markdown`/`sqlInsert`: driver-side strings for
  *     interactive use, capped by maxRows like `df.show` (these formats
  *     exist for humans and INSERT scripts, i.e. driver-sized output).
  *   - `markdownLines`/`sqlInsertLines`: a one-string-column Dataset with
  *     each output LINE rendered inside the executors (header emitted by
  *     the companion `*Header` helper), so a large export can stream
  *     through `.write.text` without ever collecting — Pretty has no
  *     distributed variant because its column widths are a global
  *     property (two-pass width agg is provided for the string form).
  */
object TextFormats {

  // ------------------------------------------------------------ shared

  /** Render a single value the way the reference's text formats do:
    * NULL -> \N (TSV convention), strings verbatim, floats via toString. */
  private def cell(v: Any): String = v match {
    case null => "\\N"
    case b: Array[Byte] => b.map(x => f"$x%02X").mkString
    case s: Seq[_] => s.map(cell).mkString("[", ",", "]")
    case x => x.toString
  }

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  // ------------------------------------------------------------ Pretty

  /** PrettyCompact-style box table. Column widths are computed with a
    * distributed max-length aggregation over the WHOLE frame (so a capped
    * preview still aligns like the full data), then only `maxRows` rows
    * are collected for display. */
  def pretty(df: DataFrame, maxRows: Int = 20): String = {
    val names = df.columns
    val shown = df.limit(maxRows).collect()
    val rendered = shown.map(r => names.indices.map(i => cell(r.get(i))).toArray)
    val widthRow = df.agg(
      max(length(format_string("%s", col(names.head)))).as("w0"),
      names.tail.map(c => max(length(format_string("%s", col(c)))).as(s"w_$c")): _*)
      .collect()(0)
    val widths = names.indices.map { i =>
      val dataW = if (widthRow.isNullAt(i)) 0 else widthRow.getAs[Number](i).intValue
      math.max(names(i).length, math.max(dataW, 2))
    }
    def pad(s: String, w: Int, right: Boolean) =
      if (right) " " * (w - s.length) + s else s + " " * (w - s.length)
    val numeric = df.schema.fields.map(f => isNumeric(f.dataType))
    def line(l: String, m: String, r: String, fill: String) =
      widths.map(w => fill * (w + 2)).mkString(l, m, r)
    val sb = new StringBuilder
    sb.append(line("┌", "┬", "┐", "─")).append('\n')
    sb.append(names.indices.map(i => s" ${pad(names(i), widths(i), right = false)} ")
      .mkString("│", "│", "│")).append('\n')
    sb.append(line("├", "┼", "┤", "─")).append('\n')
    rendered.foreach { r =>
      sb.append(r.indices.map(i => s" ${pad(r(i), widths(i), numeric(i))} ")
        .mkString("│", "│", "│")).append('\n')
    }
    sb.append(line("└", "┴", "┘", "─"))
    sb.toString
  }

  // ---------------------------------------------------------- Markdown

  /** GitHub-table header: `| a | b |` + alignment row (numeric columns
    * right-aligned `---:`, like the reference's MarkdownRowOutputFormat). */
  def markdownHeader(schema: StructType): String = {
    val names = schema.fields.map(_.name)
    val aligns = schema.fields.map(f => if (isNumeric(f.dataType)) "---:" else "---")
    names.mkString("| ", " | ", " |") + "\n" + aligns.mkString("| ", " | ", " |")
  }

  private def mdEscape(s: String): String =
    s.replace("\\", "\\\\").replace("|", "\\|").replace("\n", "<br>")

  /** Each data row as one markdown table line, rendered in executors. */
  def markdownLines(df: DataFrame): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.schema.length
    df.map(r => (0 until n).map(i => mdEscape(cell(r.get(i))))
      .mkString("| ", " | ", " |"))
  }

  /** Driver-side full markdown table (header + up to maxRows rows). */
  def markdown(df: DataFrame, maxRows: Int = 1000): String =
    (markdownHeader(df.schema) +:
      markdownLines(df.limit(maxRows)).collect().toSeq).mkString("\n")

  /** Distributed markdown SINK (reference output formats are streaming
    * writers — registerFormats.cpp): the header + alignment row are
    * prepended to the first partition and every data line renders inside
    * its executor, so an arbitrarily large frame streams to `path` via
    * write.text without ever collecting on the driver. */
  def writeMarkdown(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val header = markdownHeader(df.schema).split("\n", -1).toSeq
    val rdd = markdownLines(df).rdd
    val out =
      if (rdd.getNumPartitions == 0) spark.createDataset(header)
      else spark.createDataset(rdd.mapPartitionsWithIndex { (i, it) =>
        if (i == 0) header.iterator ++ it else it
      })
    out.write.mode("overwrite").text(path)
  }

  /** Distributed Pretty SINK. Column widths are a global property, so
    * pass 1 is a distributed max-length aggregation (one 1-row collect);
    * pass 2 renders each row in its executor with the broadcast widths.
    * Box borders are stitched onto the first/last partitions. */
  def writePretty(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val names = df.columns
    val nCols = names.length
    // widths must come from the SAME cell() rendering used in pass 2 —
    // format_string("%s", ...) diverges on nulls/dates/decimals/binary and
    // would mis-size the box. One distributed max-reduce, 1 array collect.
    val cellLens = df.map(r => (0 until nCols).map(i => cell(r.get(i)).length).toArray)
      .rdd.fold(Array.fill(nCols)(0))((a, b) => a.zip(b).map(t => math.max(t._1, t._2)))
    val widths = names.indices.map { i =>
      math.max(names(i).length, math.max(cellLens(i), 2))
    }
    val numeric = df.schema.fields.map(f => isNumeric(f.dataType))
    def pad(s: String, w: Int, right: Boolean) = {
      val fill = " " * math.max(0, w - s.length)
      if (right) fill + s else s + fill
    }
    def border(l: String, m: String, r: String) =
      widths.map(w => "─" * (w + 2)).mkString(l, m, r)
    val head = Seq(
      border("┌", "┬", "┐"),
      names.indices.map(i => s" ${pad(names(i), widths(i), right = false)} ")
        .mkString("│", "│", "│"),
      border("├", "┼", "┤"))
    val bottom = border("└", "┴", "┘")
    val n = names.length
    val lines = df.map(r => (0 until n).map(i => cell(r.get(i))).toArray)
      .rdd.map(cells => cells.indices.map(i =>
        s" ${pad(cells(i), widths(i), numeric(i))} ").mkString("│", "│", "│"))
    val parts = lines.getNumPartitions
    val out =
      if (parts == 0) spark.createDataset(head :+ bottom)
      else spark.createDataset(lines.mapPartitionsWithIndex { (i, it) =>
        val withHead = if (i == 0) head.iterator ++ it else it
        if (i == parts - 1) withHead ++ Iterator(bottom) else withHead
      })
    out.write.mode("overwrite").text(path)
  }

  // --------------------------------------------------------- SQLInsert

  private def sqlLiteral(v: Any, dt: DataType): String = (v, dt) match {
    case (null, _) => "NULL"
    case (s: String, _) => "'" + s.replace("'", "''") + "'"
    case (t: java.sql.Timestamp, _) => "'" + t.toString + "'"
    case (b: Array[Byte], _) => "x'" + b.map(x => f"$x%02X").mkString + "'"
    case (b: Boolean, _) => if (b) "TRUE" else "FALSE"
    case (x, _) => x.toString
  }

  /** `INSERT INTO tbl (a, b) VALUES` prefix, reference SQLInsert shape. */
  def sqlInsertHeader(schema: StructType, table: String): String =
    s"INSERT INTO $table (${schema.fields.map(_.name).mkString(", ")}) VALUES"

  /** One `(v1, v2, ...)` tuple per row, rendered in executors; a writer
    * joins them with ",\n" under the header (or chunks them into batches
    * of `output_format_sql_insert_max_batch_size` like the reference). */
  def sqlInsertLines(df: DataFrame): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = df.schema.fields
    val n = fields.length
    val types = fields.map(_.dataType)
    df.map(r => (0 until n).map(i => sqlLiteral(r.get(i), types(i)))
      .mkString("(", ", ", ")"))
  }

  /** Driver-side INSERT script: full statements in batches of
    * `batchRows` VALUES tuples (reference default 65505; small default
    * here for readable scripts). */
  def sqlInsert(df: DataFrame, table: String, maxRows: Int = 1000,
                batchRows: Int = 100): String = {
    val header = sqlInsertHeader(df.schema, table)
    sqlInsertLines(df.limit(maxRows)).collect().grouped(batchRows).map { batch =>
      header + " " + batch.mkString(", ") + ";"
    }.mkString("\n")
  }

  /** Distributed SQLInsert SINK: each partition batches its own rows into
    * complete INSERT statements of `batchRows` tuples (the reference's
    * output_format_sql_insert_max_batch_size chunking), so the script
    * streams to `path` without a driver collect and stays valid SQL. */
  def writeSqlInsert(df: DataFrame, table: String, path: String,
                     batchRows: Int = 100): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val header = sqlInsertHeader(df.schema, table)
    sqlInsertLines(df).mapPartitions { it =>
      it.grouped(batchRows).map(b => header + " " + b.mkString(", ") + ";")
    }.write.mode("overwrite").text(path)
  }
}

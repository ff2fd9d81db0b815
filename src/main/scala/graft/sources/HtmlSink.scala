package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S10 — HTML leaderboard sink (`QBReadStats.R:229-258`: two gt tables
  * rendered side by side and saved with htmltools::save_html).
  *
  * Deliberately driver-side: the reference's HTML output is a
  * PRESENTATION of an already-reduced leaderboard (10-33 rows). The
  * engine's job at 100 TB is to reduce first — rank/limit runs
  * distributed (see w8's TakeOrderedAndProject shape) — and only the
  * final small result is collected and rendered. `maxRows` guards
  * against accidentally pointing the sink at an unreduced frame.
  */
object HtmlSink {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** One titled `<table>` (the gt() + tab_header analog). */
  def renderTable(df: DataFrame, title: String, maxRows: Int = 1000): String = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"HtmlSink renders presentation-sized frames (> $maxRows rows); reduce first")
    val cols = df.columns
    val header = cols.map(c => s"<th>${esc(c)}</th>").mkString
    val body = rows.map { r =>
      cols.indices.map { i =>
        val v = if (r.isNullAt(i)) "" else esc(String.valueOf(r.get(i)))
        s"<td>$v</td>"
      }.mkString("<tr>", "", "</tr>")
    }.mkString("\n")
    s"""<table>
       |<caption>${esc(title)}</caption>
       |<thead><tr>$header</tr></thead>
       |<tbody>
       |$body
       |</tbody>
       |</table>""".stripMargin
  }

  /** The reference's side-by-side flex container (QBReadStats.R:250-253). */
  def sideBySide(tables: Seq[String]): String =
    tables
      .map(t => s"""<div style="margin: 0 5px;">$t</div>""")
      .mkString(
        """<div style="display: flex; justify-content: center; gap: 10px;">""",
        "\n", "</div>")

  def document(body: String): String =
    s"<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\"/></head><body>\n$body\n</body></html>"

  /** save_html analog: one file at `path`, through the Hadoop FS API so
    * the same code writes local paths and object stores. */
  def write(spark: SparkSession, html: String, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}

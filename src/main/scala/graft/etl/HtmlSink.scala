package graft.etl

import org.apache.spark.sql.DataFrame

/** HTML table sink (SURVEY §2.1 S5): the engine-side equivalent of the
  * reference's `DataFrame.to_html()` dashboard tables
  * (`/root/reference/server.py:213,292`). Emits the same structural
  * shape pandas produces — `<table border="1" class="dataframe">` with
  * a `<thead>` header row, a leading index column, and one `<tbody>`
  * row per record — so the reference's Jinja templates could consume
  * it unchanged.
  *
  * A driver-side render is inherently a collect, so the row budget is
  * an EXPLICIT argument and enforced with `limit(maxRows)` INSIDE the
  * plan — the limit pushes into the scan, and at 100 TB the collect
  * moves `maxRows` rows, never the table. Rendering whole partitions
  * (the reference collects the full quarter) is exactly the
  * anti-pattern SURVEY §2.1 S6 replaced with two-pass aggregation;
  * callers that want "the whole table" should aggregate first.
  */
object HtmlSink {

  private def escape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c   => c.toString
    }

  /** Render the first `maxRows` rows as a pandas-shaped HTML table. */
  def toHtml(df: DataFrame, maxRows: Int = 1000): String = {
    val cols = df.columns
    val rows = df.limit(maxRows).collect()
    val sb = new StringBuilder
    sb ++= "<table border=\"1\" class=\"dataframe\">\n"
    sb ++= "  <thead>\n    <tr style=\"text-align: right;\">\n      <th></th>\n"
    cols.foreach(c => sb ++= s"      <th>${escape(c)}</th>\n")
    sb ++= "    </tr>\n  </thead>\n  <tbody>\n"
    rows.zipWithIndex.foreach { case (r, i) =>
      sb ++= s"    <tr>\n      <th>$i</th>\n"
      cols.indices.foreach { j =>
        val v = if (r.isNullAt(j)) "NaN" else escape(String.valueOf(r.get(j)))
        sb ++= s"      <td>$v</td>\n"
      }
      sb ++= "    </tr>\n"
    }
    sb ++= "  </tbody>\n</table>"
    sb.result()
  }
}

package graft.etl

import graft.SparkSpec

/** S5 — the HTML table sink renders pandas-`to_html`-shaped output
  * from a Spark DataFrame, bounded, escaped, and value-faithful.
  */
class HtmlSinkSpec extends SparkSpec {

  test("renders pandas-shaped structure with header, index, and values") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b<c&d>")).toDF("k", "v")
    val html = HtmlSink.toHtml(df.orderBy("k"))
    assert(html.startsWith("<table border=\"1\" class=\"dataframe\">"))
    assert(html.contains("<thead>") && html.contains("<tbody>") && html.endsWith("</table>"))
    assert(html.contains("<th>k</th>") && html.contains("<th>v</th>"))
    // leading index column like pandas
    assert(html.contains("<th>0</th>") && html.contains("<th>1</th>"))
    assert(html.contains("<td>1</td>") && html.contains("<td>a</td>"))
    // HTML entities escaped, null → NaN (pandas rendering)
    assert(html.contains("<td>b&lt;c&amp;d&gt;</td>"))
    val withNull = Seq((1, Option.empty[String]), (2, Some("x"))).toDF("k", "v")
    assert(HtmlSink.toHtml(withNull.orderBy("k")).contains("<td>NaN</td>"))
  }

  test("maxRows bounds the collect and pushes a limit into the plan") {
    val docs = graft.Tables.documents(spark, sf)
    val html = HtmlSink.toHtml(docs.select("doc_id", "lang"), maxRows = 7)
    assert(html.split("<tr>", -1).length - 1 == 7, "exactly maxRows body rows")
    // an aggregate (the intended caller shape) renders fully under budget
    import org.apache.spark.sql.functions._
    val agg = docs.groupBy("lang").agg(count(lit(1)).as("n")).orderBy("lang")
    val t = HtmlSink.toHtml(agg, maxRows = 100)
    assert(t.split("<tr>", -1).length - 1 == agg.count())
  }
}

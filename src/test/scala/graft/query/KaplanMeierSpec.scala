package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q252: the KM fold must equal a driver-side replay over
  * reconstructed (duration, event) subjects, with the survival
  * curve's structural invariants.
  */
class KaplanMeierSpec extends SparkSpec {

  test("q252: engine fold == driver replay; curve invariants hold") {
    val out = graft.SparkEntry.queries("q252_kaplan_meier")(spark, sf).collect()
    assert(out.nonEmpty)
    val subj = graft.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("fo"), max(col("o_orderdate")).as("lo"))
      .join(graft.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), datediff(col("lo"), col("fo")).cast("long").as("dur"),
        (col("lo") < lit("2001-02-01").cast("timestamp")).as("event"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))

    out.groupBy(_.getAs[String]("segment")).foreach { case (seg, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("t"))
      val mine = subj.filter(_._1 == seg)
      var s = BigInt(1000000)
      val expected = mine.filter(_._3).map(_._2).distinct.sorted.map { t =>
        val n = mine.count(_._2 >= t).toLong
        val d = mine.count(x => x._2 == t && x._3).toLong
        s = s * (n - d) / n
        (t, n, d, s)
      }
      val got = sorted.map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_at_risk"),
        r.getAs[Long]("n_events"), BigInt(r.getAs[Long]("s_micro"))))
      assert(got.toSeq == expected.toSeq, s"segment $seg KM mismatch")
      // invariants: S non-increasing, at-risk strictly decreasing
      got.map(_._4).sliding(2).foreach { case Array(a, b) => assert(b <= a); case _ => }
      got.map(_._2).sliding(2).foreach { case Array(a, b) => assert(b < a); case _ => }
    }
    // censoring is real at this horizon: some subjects never event
    assert(subj.exists(!_._3), "no censored subjects - the censor date is vacuous")
  }
}

package graft.ext

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MomentsSpec extends SparkSpec {

  test("q109: integer moments agree with float var_pop/avg within 1 micro") {
    val got = SparkEntry.queries("q109_feature_moments")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("mean_micro"), r.getAs[Long]("var_micro"))))
      .toMap
    val ref = Tables.documents(spark, sf)
      .select(col("source"), size(split(col("text"), " ")).cast("double").as("x"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), avg(col("x")).as("mean"), var_pop(col("x")).as("v"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mean"), r.getAs[Double]("v"))))
      .toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (src, (n, meanMicro, varMicro)) =>
      val (rn, rMean, rVar) = ref(src)
      assert(n == rn)
      // floor at micro resolution: |int - 1e6*float| < 1 (+ float noise)
      assert(math.abs(meanMicro - rMean * 1e6) < 2.0, s"$src mean")
      assert(math.abs(varMicro - rVar * 1e6) < 2.0, s"$src var")
    }
  }

  test("q110: session bounds respect the 30-minute gap rule") {
    val sessions = SparkEntry.queries("q110_sessionize")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[java.sql.Timestamp]("session_start").toInstant,
        r.getAs[java.sql.Timestamp]("session_end").toInstant,
        r.getAs[Long]("n_events")))
    // sessions partition all events
    val nEvents = Tables.events(spark, sf).count()
    assert(sessions.map(_._5).sum == nEvents)
    // per user: ordinals are 1..k and consecutive sessions are
    // separated by MORE than the gap
    val gapUs = 1800000000L
    sessions.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gap = java.time.Duration.between(a._4, b._3)
          assert(gap.toNanos / 1000 > gapUs,
            s"sessions ${a._2}/${b._2} closer than the gap: $gap")
        case _ =>
      }
      // within a session, start <= end
      sorted.foreach(s => assert(!s._3.isAfter(s._4)))
    }
  }
}

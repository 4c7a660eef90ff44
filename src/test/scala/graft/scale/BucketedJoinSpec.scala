package graft.scale

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketed-store co-located join: writing both fact tables bucketed
  * by the join key lets the join run with ZERO shuffle exchanges —
  * the storage-layout lever for repeated 100 TB fact-to-fact joins
  * (pay the shuffle once at write time, never at query time).
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed lineitem ⋈ orders plans without a shuffle exchange") {
    // explicit table paths → warehouse dir (a static conf) irrelevant
    val wh = Files.createTempDirectory("graft_wh").toString
    // AQE rewrites make the exchange assertion ambiguous; plain plan.
    // Broadcast off: at test SF everything fits under the threshold,
    // which would sidestep the bucket co-location being demonstrated.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.lineitem(spark, sf)
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li_b").saveAsTable("li_b")
      Tables.orders(spark, sf)
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/o_b").saveAsTable("o_b")

      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucket co-location: the join itself needs no Exchange — the
      // ONLY shuffle in the whole plan is the post-join aggregation
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1, s"expected 1 exchange (post-join agg), got $exchanges:\n$plan")
      assert(!plan.contains("BroadcastExchange"), s"broadcast crept in:\n$plan")
      assert(plan.contains("SortMergeJoin"),
        s"expected a SortMergeJoin running shuffle-free on buckets:\n$plan")
      // and it computes the right thing
      val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val direct = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(viaBuckets.keySet == direct.keySet)
      viaBuckets.foreach { case (k, v) => assert(math.abs(v - direct(k)) < 1e-6) }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}

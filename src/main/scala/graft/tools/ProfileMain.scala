package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-job decomposition of a named query (dev tool, guide §1/§7):
  * `runMain graft.tools.ProfileMain <query> [reps]` runs the query
  * under the Bench session settings and prints, for every Spark job
  * in the LAST rep: wall-clock, task-time sum, task count, and the
  * job group/description — plus the wall-clock NOT covered by any job
  * (driver-side planning, commit protocol, stream trigger machinery).
  * This is the "named decomposition" instrument for the per-query
  * fixed-cost work (round-17 verdict #3).
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ProfileMain <query> [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
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
    val spec = graft.SparkEntry.allSpecs.find(_.name == name)
      .getOrElse(sys.error(s"unknown query: $name"))

    final case class JobRec(id: Int, start: Long, var end: Long = -1L,
        var desc: String = "", var nTasks: Int = 0, var taskMs: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    var collecting = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (collecting) {
        val d = Option(e.properties)
          .map(p => String.valueOf(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(e.jobId, JobRec(e.jobId, e.time, desc = d))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId); if (r != null) r.end = e.time
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = if (collecting) {
        // attribute tasks to the newest unfinished job (approximation:
        // local-mode queries here run jobs serially)
        val open = jobs.values.toArray(Array.empty[JobRec]).filter(_.end < 0)
        if (open.nonEmpty && e.taskInfo != null) {
          val r = open.maxBy(_.id)
          r.nTasks += 1
          r.taskMs += (e.taskInfo.finishTime - e.taskInfo.launchTime)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    (1 to reps).foreach { i =>
      jobs.clear()
      collecting = i == reps
      val t0 = System.nanoTime()
      spec.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name rep$i wall=$wall%.3f s")
      if (i == reps) {
        collecting = false
        Thread.sleep(300) // let listener events drain
        val rs = jobs.values.toArray(Array.empty[JobRec]).sortBy(_.start)
        var covered = 0L
        var lastEnd = 0L
        rs.foreach { r =>
          val e = if (r.end < 0) r.start else r.end
          val s = math.max(r.start, lastEnd)
          if (e > s) covered += e - s
          lastEnd = math.max(lastEnd, e)
          println(f"[profile]   job ${r.id}%4d wall=${(e - r.start) / 1000.0}%7.3f s " +
            f"tasks=${r.nTasks}%4d taskSum=${r.taskMs / 1000.0}%8.3f s  ${r.desc.take(90)}")
        }
        val gaps = wall - covered / 1000.0
        println(f"[profile] $name jobs=${rs.length} covered=${covered / 1000.0}%.3f s " +
          f"uncovered(driver/planning/triggers)=$gaps%.3f s")
      }
    }
    spark.stop()
  }
}

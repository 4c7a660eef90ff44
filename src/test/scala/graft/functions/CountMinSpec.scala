package graft.functions

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Count-min sketch (q99) behavior: the one-sided error guarantee,
  * partition-invariance of the algebraic build, and a driver-side
  * replay of the exact counter matrix.
  */
class CountMinSpec extends SparkSpec {

  private val Depth = 3
  private val Width = 64

  /** (h1, h2) per distinct token plus its true count, collected from
    * the sf0.001 corpus — the ground truth the sketch is checked
    * against.
    */
  private lazy val tokenCounts: Seq[((Long, Long), Long)] = {
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
      .withColumn("th", md5(to_binary(col("token"), lit("utf-8"))))
      .select(
        conv(substring(col("th"), 1, 15), 16, 10).cast("long").as("h1"),
        conv(substring(col("th"), 16, 15), 16, 10).cast("long").bitwiseOR(1).as("h2"))
      .groupBy("h1", "h2").agg(count(lit(1)).as("cnt"))
      .collect()
    toks.map(r => (r.getAs[Long]("h1"), r.getAs[Long]("h2")) -> r.getAs[Long]("cnt")).toSeq
  }

  private def replayMatrix: Array[Long] = {
    val m = new Array[Long](Depth * Width)
    tokenCounts.foreach { case ((h1, h2), cnt) => CountMin.add(m, h1, h2, Width, cnt) }
    m
  }

  private def sparkMatrix(parts: Int): Array[Long] = {
    import spark.implicits._
    val occurrences = tokenCounts.flatMap { case (k, cnt) =>
      Seq.fill(cnt.toInt)(k)
    }
    occurrences.toDS().repartition(parts)
      .groupByKey(_ => 0)
      .agg(CountMinAgg(Depth, Width).toColumn.name("cms"))
      .collect().head._2
  }

  test("sketch build is partition-invariant and matches a driver replay") {
    val expected = replayMatrix
    assert(sparkMatrix(1).sameElements(expected))
    assert(sparkMatrix(7).sameElements(expected), "merge order changed the matrix")
    // mass conservation: every row sums to the total occurrence count
    val total = tokenCounts.map(_._2).sum
    (0 until Depth).foreach { r =>
      assert(expected.slice(r * Width, (r + 1) * Width).sum == total)
    }
  }

  test("estimates never underestimate, for EVERY token (one-sided error)") {
    val m = replayMatrix
    tokenCounts.foreach { case ((h1, h2), cnt) =>
      val est = (0 until Depth).map { r =>
        m(r * Width + java.lang.Math.floorMod(h1 + r * h2, Width.toLong).toInt)
      }.min
      assert(est >= cnt, s"CMS underestimated: est $est < true $cnt")
    }
  }

  test("q99 report: top-20 by true count, overcount = est - true >= 0") {
    val rows = SparkEntry.queries("q99_heavy_hitters")(spark, sf).collect()
    assert(rows.length == 20)
    val trues = rows.map(r => r.getAs[Long]("true_cnt"))
    assert(trues.sameElements(trues.sorted.reverse), "not ranked by true count")
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L)
      assert(r.getAs[Long]("est_cnt") ==
        r.getAs[Long]("true_cnt") + r.getAs[Long]("overcount"))
    }
  }
}

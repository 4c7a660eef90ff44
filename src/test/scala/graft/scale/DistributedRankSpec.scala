package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-pass primitive must be BIT-IDENTICAL to the global-window
  * forms it replaces (the q217/q224/q228/q203/q242/q178 rewrites all
  * lean on this), for every key distribution that could trip it:
  * uniform, heavily tied (ties must share a bucket), skewed (one hot
  * value straddling many percentile cuts), tiny (n < buckets,
  * n < tiles), and empty.
  */
class DistributedRankSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(Long, Long)]): DataFrame =
    rows.toDF("k", "id").repartition(4)

  private val shapes: Seq[(String, Seq[(Long, Long)])] = Seq(
    "uniform" -> (1L to 500L).map(i => ((i * 2654435761L) % 1000L, i)),
    "tied" -> (1L to 500L).map(i => (i % 7L, i)),
    "skewed" -> (1L to 500L).map(i => (if (i % 10 == 0) i else 42L, i)),
    "tiny" -> Seq((5L, 1L), (3L, 2L), (5L, 3L)),
    "single" -> Seq((9L, 1L)))

  test("withRank equals the global-window row_number on every shape") {
    shapes.foreach { case (label, rows) =>
      val df = frame(rows)
      val got = DistributedRank
        .withRank(df, "r", col("k"), Seq(col("id")), buckets = 8)
        .select(col("id"), col("r"))
      val want = df
        .withColumn("r", row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
        .select(col("id"), col("r"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty, label)
    }
  }

  test("withNtile equals the global-window ntile on every shape and tile count") {
    shapes.foreach { case (label, rows) =>
      Seq(3, 5, 16).foreach { tiles =>
        val df = frame(rows)
        val got = DistributedRank
          .withNtile(df, "t", tiles, col("k"), Seq(col("id")), buckets = 8)
          .select(col("id"), col("t"))
        val want = df
          .withColumn("t", ntile(tiles).over(Window.orderBy(col("k"), col("id"))))
          .select(col("id"), col("t"))
        assert(got.except(want).isEmpty && want.except(got).isEmpty, s"$label/$tiles")
      }
    }
  }

  test("explicit uniform bounds skip the percentile pass and stay exact") {
    val rows = (1L to 300L).map(i => ((i * 48271L) % 1024L, i))
    val df = frame(rows)
    val got = DistributedRank
      .withRank(df, "r", col("k"), Seq(col("id")), buckets = 8,
        bounds = Some(DistributedRank.uniformBounds(1024L, 8)))
      .select(col("id"), col("r"))
    val want = df
      .withColumn("r", row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
      .select(col("id"), col("r"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("withNtiles (multi-key) equals independent global-window ntiles on every shape") {
    shapes.foreach { case (label, rows) =>
      val df = rows.map { case (k, id) => (k, (id * 7919L) % 101L, id) }
        .toDF("k1", "k2", "id").repartition(4)
      val got = DistributedRank.withNtiles(df,
          Seq(("t1", 4, col("k1")), ("t2", 7, col("k2"))),
          Seq(col("id")), buckets = 8)
        .select(col("id"), col("t1"), col("t2"))
      val want = df
        .withColumn("t1", ntile(4).over(Window.orderBy(col("k1"), col("id"))))
        .withColumn("t2", ntile(7).over(Window.orderBy(col("k2"), col("id"))))
        .select(col("id"), col("t1"), col("t2"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty, label)
    }
  }

  test("withNtiles at buckets=1024 × 3 keys — the joint-cell cap is gone") {
    // the pre-round-9 joint cell table (buckets^keys ≤ 1e6) capped
    // 3-key use at ~100 buckets; the grouping-sets marginals collect
    // ≤ 3 × 1024 rows, so 1024 buckets × 3 keys must now work and
    // stay bit-equal to the window forms
    val df = (1L to 800L).map(i =>
        ((i * 2654435761L) % 100000L, (i * 7919L) % 50021L, i % 17L, i))
      .toDF("k1", "k2", "k3", "id").repartition(4)
    val got = DistributedRank.withNtiles(df,
        Seq(("t1", 4, col("k1")), ("t2", 100, col("k2")), ("t3", 7, col("k3"))),
        Seq(col("id")), buckets = 1024)
      .select(col("id"), col("t1"), col("t2"), col("t3"))
    val want = df
      .withColumn("t1", ntile(4).over(Window.orderBy(col("k1"), col("id"))))
      .withColumn("t2", ntile(100).over(Window.orderBy(col("k2"), col("id"))))
      .withColumn("t3", ntile(7).over(Window.orderBy(col("k3"), col("id"))))
      .select(col("id"), col("t1"), col("t2"), col("t3"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("contract guards: fractional key, null key, and _drk_ columns all fail fast") {
    val df = frame((1L to 20L).map(i => (i % 5L, i)))
    // fractional key — would be silently truncated by the long cast
    val fr = intercept[IllegalArgumentException] {
      DistributedRank.withRank(df, "r", col("k") / 2.0, Seq(col("id")))
    }
    assert(fr.getMessage.contains("integral"), fr.getMessage)
    // null key — no Window.orderBy-equivalent contract
    val withNull = df.withColumn("k", when(col("id") === 7L, lit(null)).otherwise(col("k")))
      .select(col("k").cast("long").as("k"), col("id"))
    val nl = intercept[IllegalArgumentException] {
      DistributedRank.withRank(withNull, "r", col("k"), Seq(col("id"))).count()
    }
    assert(nl.getMessage.contains("null"), nl.getMessage)
    // a caller column under the reserved staging prefix would be
    // silently replaced and dropped
    val cl = intercept[IllegalArgumentException] {
      DistributedRank.withRank(df.withColumn("_drk_k", col("k")), "r",
        col("k"), Seq(col("id")))
    }
    assert(cl.getMessage.contains("_drk_"), cl.getMessage)
    // same guards on the multi-ntile and prefix-sum entry points
    intercept[IllegalArgumentException] {
      DistributedRank.withNtiles(df, Seq(("t", 4, col("k") * 0.5)), Seq(col("id")))
    }
    intercept[IllegalArgumentException] {
      DistributedRank.withPrefixSum(df, "ps", lit(1.5), col("k"), Seq(col("id")))
    }
  }

  test("withPrefixSum equals the global-window exclusive running sum on every shape") {
    shapes.foreach { case (label, rows) =>
      val df = rows.map { case (k, id) => (k, id, (id % 11L) + 1L) }
        .toDF("k", "id", "v").repartition(4)
      val got = DistributedRank
        .withPrefixSum(df, "ps", col("v"), col("k"), Seq(col("id")), buckets = 8)
        .select(col("id"), col("ps"))
      val want = df
        .withColumn("ps", coalesce(sum(col("v")).over(
          Window.orderBy(col("k"), col("id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("id"), col("ps"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty, label)
    }
  }

  test("empty input yields an empty ranked frame") {
    val df = frame(Seq.empty)
    assert(DistributedRank.withRank(df, "r", col("k"), Seq(col("id"))).count() === 0L)
    assert(DistributedRank.withNtile(df, "t", 5, col("k"), Seq(col("id"))).count() === 0L)
  }

  test("randomized shapes: rank/ntile/prefix-sum equal the window forms (seeded fuzz)") {
    val rng = new scala.util.Random(0x5eed)
    (1 to 12).foreach { round =>
      val n = 1 + rng.nextInt(400)
      val keySpace = 1 + rng.nextInt(if (rng.nextBoolean()) 5 else 5000)
      val rows = (1L to n.toLong).map(id => (rng.nextInt(keySpace).toLong, id))
      val buckets = 2 + rng.nextInt(30)
      val tiles = 1 + rng.nextInt(12)
      val df = frame(rows)
      val gotR = DistributedRank
        .withRank(df, "r", col("k"), Seq(col("id")), buckets)
        .select(col("id"), col("r"))
      val wantR = df.withColumn("r",
          row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
        .select(col("id"), col("r"))
      assert(gotR.except(wantR).isEmpty && wantR.except(gotR).isEmpty, s"rank round $round")
      val gotT = DistributedRank
        .withNtile(df, "t", tiles, col("k"), Seq(col("id")), buckets)
        .select(col("id"), col("t"))
      val wantT = df.withColumn("t",
          ntile(tiles).over(Window.orderBy(col("k"), col("id"))))
        .select(col("id"), col("t"))
      assert(gotT.except(wantT).isEmpty && wantT.except(gotT).isEmpty, s"ntile round $round")
      val gotP = DistributedRank
        .withPrefixSum(df, "ps", col("id") % 13L + 1L, col("k"), Seq(col("id")), buckets)
        .select(col("id"), col("ps"))
      val wantP = df.withColumn("ps", coalesce(sum(col("id") % 13L + 1L).over(
          Window.orderBy(col("k"), col("id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("id"), col("ps"))
      assert(gotP.except(wantP).isEmpty && wantP.except(gotP).isEmpty, s"psum round $round")
    }
  }

  test("the ranking window is bucket-partitioned — never a global sort") {
    val df = frame((1L to 100L).map(i => (i % 13L, i)))
    val plan = DistributedRank.withRank(df, "r", col("k"), Seq(col("id")), buckets = 8)
      .queryExecution.optimizedPlan.toString
    // the Window's partitionSpec must be non-empty (no
    // "WindowExec: No Partition Defined" hazard)
    assert(plan.contains("windowspecdefinition(_drk_b"), plan)
  }
}

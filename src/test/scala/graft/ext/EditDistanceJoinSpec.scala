package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q180 FastSS deletion-neighborhood join: the registered oracle is a
  * brute-force all-pairs levenshtein, so the driver already proves
  * losslessness on the real (uniform-length, substitution-only)
  * names. These specs cover what that data cannot: the INSERT and
  * DELETE edit shapes (length-changing), the multi-position-collision
  * dedup, and an in-engine blocked ≡ brute equivalence.
  */
class EditDistanceJoinSpec extends SparkSpec {

  /** Fixture dir with a planted customer.parquet (q180 reads only
    * c_name).
    */
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_edj").toString
    Seq("abc", "abcd", "bc", "axc", "abe", "xyz", "aa", "ab")
      .toDF("c_name").write.mode("overwrite").parquet(s"$d/customer.parquet")
    d
  }

  test("insert, delete, and substitute shapes all surface; distance-2 pairs do not") {
    val planted = Seq("abc", "abcd", "bc", "axc", "abe", "xyz", "aa", "ab")
    val pairs = SparkEntry.queries("q180_edit_distance_join")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // ground truth from an engine-independent DP implementation
    val brute = (for {
      a <- planted; b <- planted
      if a < b && levDist(a, b) <= 1
    } yield (a, b)).toSet
    assert(pairs == brute, "blocked result must equal brute force on the fixture")
    assert(pairs(("abc", "abcd")), "insertion shape")
    assert(pairs(("abc", "bc")), "deletion shape")
    assert(pairs(("abc", "axc")), "substitution shape")
    assert(pairs(("aa", "ab")), "multi-position variant collision dedups to one row")
    assert(!pairs(("abe", "axc")), "distance-2 pair must not surface")
  }

  test("blocked join equals brute force on real names at sf0.001") {
    val blocked = SparkEntry.queries("q180_edit_distance_join")(spark, sf)
      .select("n1", "n2").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val names = graft.Tables.customer(spark, sf)
      .select(col("c_name")).distinct().as[String](org.apache.spark.sql.Encoders.STRING)
      .collect()
    val brute = (for {
      a <- names; b <- names
      if a < b && levDist(a, b) <= 1
    } yield (a, b)).toSet
    assert(blocked == brute)
    assert(blocked.nonEmpty, "real names contain distance-1 pairs; empty means broken")
  }

  /** Reference Levenshtein (classic DP), independent of both engines. */
  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}

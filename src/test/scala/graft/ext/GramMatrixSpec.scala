package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q187 Gram matrix: full cell-by-cell agreement with a driver-side
  * recompute from the raw embeddings (independent quantization +
  * dense O(n·D²) accumulation), plus the structural invariants.
  */
class GramMatrixSpec extends SparkSpec {

  private lazy val cells =
    SparkEntry.queries("q187_gram_matrix")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap

  private lazy val codes: Array[Array[Long]] = {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val d = vecs.head.length
    val mn = Array.tabulate(d)(i => vecs.map(_(i)).min)
    val mx = Array.tabulate(d)(i => vecs.map(_(i)).max)
    vecs.map { v =>
      Array.tabulate(d) { i =>
        if (mx(i) == mn(i)) 0L
        else math.min(math.max(
          math.floor((v(i) - mn(i)) * 254.0 / (mx(i) - mn(i))).toLong - 127, -127L), 127L)
      }
    }
  }

  test("every upper-triangle cell matches the dense driver-side recompute") {
    val d = codes.head.length
    assert(cells.size == d * (d + 1) / 2)
    for (i <- 0 until d; j <- i until d) {
      val expected = codes.map(v => v(i) * v(j)).sum
      val (n, g) = cells((i, j))
      assert(n == codes.length)
      assert(g == expected, s"cell ($i,$j): $g vs $expected")
    }
  }

  test("diagonal is nonnegative and dominates (Cauchy-Schwarz on each pair)") {
    val d = codes.head.length
    for (i <- 0 until d; j <- i + 1 until d) {
      val gii = cells((i, i))._2
      val gjj = cells((j, j))._2
      val gij = cells((i, j))._2
      assert(gii >= 0 && gjj >= 0)
      // g_ij^2 <= g_ii * g_jj — would catch any cell-pairing mixup
      assert(BigInt(gij).pow(2) <= BigInt(gii) * BigInt(gjj), s"CS violated at ($i,$j)")
    }
  }
}

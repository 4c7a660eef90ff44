package graft.scale

import graft.{SparkEntry, SparkSpec}
import java.math.BigInteger
import java.security.MessageDigest

/** q222: recompute every doc's shard straight from the ring
  * DEFINITION (first vnode position ≥ h, wrapping to the ring
  * minimum) — no intervals, no buckets — proving the engine's
  * bucketized equi-join reformulation is lossless; then assert the
  * consistent-hashing contract itself.
  */
class ConsistentHashSpec extends SparkSpec {

  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    new BigInteger(d.map(b => f"$b%02x").mkString.substring(0, 15), 16).longValue
  }

  private def ring(n: Int): Seq[(Long, Long)] =
    (for (s <- 0 until n; v <- 0 until 32) yield (h60(s + ":" + v + ":ring"), s.toLong))
      .sortBy(_._1)

  private def assign(r: Seq[(Long, Long)], h: Long): Long =
    r.find(_._1 >= h).getOrElse(r.head)._2

  test("q222: migration matrix matches the direct ring definition; moves only to the new shard") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    val ra = ring(4); val rb = ring(5)
    val expected = docs
      .map { id => val h = h60(id + ":ch"); (assign(ra, h), assign(rb, h)) }
      .groupBy(identity).map { case ((a, b), xs) => (a, b, xs.length.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q222_consistent_hash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.map(g => (g._1, g._2, g._3)).toSeq == expected)
    // exactly-one-interval-per-doc: the matrix conserves the corpus
    assert(got.map(_._3).sum == docs.length.toLong)
    // the consistent-hashing contract: a grown ring only sheds keys TO
    // the new shard — no old-to-old migration, and the new shard takes
    // a nontrivial (~1/n+1) slice
    got.foreach { case (a, b, _, m) =>
      assert((m == 1) == (a != b))
      if (a != b) assert(b == 4L, s"doc moved between OLD shards $a -> $b")
    }
    val moved = got.filter(_._4 == 1).map(_._3).sum.toDouble / docs.length
    assert(moved > 0.10 && moved < 0.35, s"moved fraction $moved outside the 1/5 envelope")
  }
}

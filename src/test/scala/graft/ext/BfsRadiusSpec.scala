package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q196 BFS hop distances: recomputed driver-side from the q45 edge
  * list and the md5 seed rule.
  */
class BfsRadiusSpec extends SparkSpec {

  test("hop distances equal a driver-side BFS from the same seeds") {
    val edges = SparkEntry.queries("q45_ngram_jaccard")(spark, sf)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val seeds = graft.Tables.documents(spark, sf).select(col("doc_id")).collect()
      .map(_.getLong(0)).filter { id =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(h.substring(0, 15), 16) % 100 == 0
      }.toSet
    // textbook level-synchronous BFS
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    var level = 0L
    while (frontier.nonEmpty) {
      level += 1
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty)).filterNot(dist.contains)
      next.foreach(n => dist += n -> level)
      frontier = next
    }
    val got = SparkEntry.queries("q196_bfs_contamination_radius")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist, "engine BFS must equal the textbook recompute")
    assert(seeds.forall(s => got(s) == 0L))
    assert(got.nonEmpty)
  }
}

package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q209 weighted multi-source shortest paths: recomputed driver-side
  * from first principles — brute-force J≥0.5 pairs over distinct
  * 3-shingles, ppm dissimilarity weights, 8 Bellman–Ford rounds from
  * the salted md5 seed set.
  */
class SsspSpec extends SparkSpec {

  private def isSeed(id: Long): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:q209".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16) % 7 == 0
  }

  test("distances match a brute-force Bellman-Ford recompute") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sh = docs.map { case (id, t) =>
      val ws = t.split(" ")
      id -> (0 to math.max(0, ws.length - 3)).map(i => ws.slice(i, i + 3).mkString(" "))
        .filter(_.split(" ").length == 3).toSet
    }.toMap
    val ids = docs.map(_._1).sorted
    val edges = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = (sh(a) & sh(b)).size
      if inter > 0
      union = sh(a).size + sh(b).size - inter
      if inter.toDouble / union >= 0.5
    } yield (a, b, 1000000L - inter.toLong * 1000000L / union)).toSeq
    val sym = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    // carry (dist, hops-of-that-shortest-path) so the multi-hop
    // sanity check below can tell relayed paths from direct edges
    var dist: Map[Long, (Long, Int)] = ids.filter(isSeed).map(_ -> (0L, 0)).toMap
    for (_ <- 1 to 8) {
      val relaxed = sym.flatMap { case (u, v, w) =>
        dist.get(u).map { case (d, h) => v -> (d + w, h + 1) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).map { case (k, xs) =>
        k -> xs.map(_._2).min
      }
    }
    val got = SparkEntry.queries("q209_shortest_paths")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist.view.mapValues(_._1).toMap)
    // propagation actually happened: some non-seed doc was reached.
    // (At sf0.001 every data-given shortest path is 1 hop — all 5
    // seeded components are stars around their seed — so a hops≥2
    // assertion would be vacuously unsatisfiable here; the dist-map
    // equality above IS the relaxation-semantics proof, and the
    // synthetic chain below exercises the multi-round fold.)
    assert(got.values.exists(_ > 0), "no propagation beyond the seed set")
    // sanity of the recompute harness itself on a planted 4-chain:
    // seed -10- a -20- b -30- c must yield cumulative sums
    val chain = Seq((1L, 2L, 10L), (2L, 3L, 20L), (3L, 4L, 30L))
      .flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    var cd: Map[Long, Long] = Map(1L -> 0L)
    for (_ <- 1 to 8) {
      val rx = chain.flatMap { case (u, v, w) => cd.get(u).map(d => v -> (d + w)) }
      cd = (cd.toSeq ++ rx).groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).min }
    }
    assert(cd == Map(1L -> 0L, 2L -> 10L, 3L -> 30L, 4L -> 60L))
  }
}

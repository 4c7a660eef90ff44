package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q213 2-core: peeling recomputed driver-side from brute-force
  * pairs, plus proof the fixed round budget actually reached the
  * fixpoint on this data.
  */
class KcoreSpec extends SparkSpec {

  test("2-core survivors and degrees match a driver peel; rounds converged") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sh = docs.map { case (id, t) =>
      val ws = t.split(" ")
      id -> (0 to math.max(0, ws.length - 3)).map(i => ws.slice(i, i + 3))
        .filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val ids = docs.map(_._1).sorted
    var edges = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = (sh(a) & sh(b)).size
      if inter > 0
      union = sh(a).size + sh(b).size - inter
      if inter.toDouble / union >= 0.5
    } yield (a, b)).toSeq
    val full = edges
    def degrees(es: Seq[(Long, Long)]): Map[Long, Long] =
      es.flatMap { case (a, b) => Seq(a, b) }.groupBy(identity)
        .map { case (k, xs) => k -> xs.size.toLong }
    var prev = edges
    var rounds = 0
    for (_ <- 1 to 8) {
      val deg = degrees(edges)
      val next = edges.filter { case (a, b) => deg(a) >= 2 && deg(b) >= 2 }
      if (next == edges && rounds == 0) () // already stable
      if (next != edges) rounds += 1
      prev = edges
      edges = next
    }
    // fixed budget reached the fixpoint: one more round changes nothing
    val degF = degrees(edges)
    assert(edges.forall { case (a, b) => degF(a) >= 2 && degF(b) >= 2 },
      "8 peel rounds did not converge on this data")
    val coreDeg = degrees(edges)
    val fullDeg = degrees(full)
    val expected = coreDeg.map { case (id, cd) =>
      id -> (cd, fullDeg(id), fullDeg(id) - cd)
    }
    val got = SparkEntry.queries("q213_kcore")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    // peeling actually removed something: the core is a strict subgraph
    assert(degrees(full).size > coreDeg.size || full.size > edges.size,
      "nothing peeled - the graph had no fringe to strip")
  }
}

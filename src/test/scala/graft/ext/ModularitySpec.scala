package graft.ext

import graft.SparkSpec

/** q241: modularity identities — degree mass sums to 2m, cut edges
  * are symmetric double counts of cross-source edges, and Q matches
  * a driver-side rational recompute.
  */
class ModularitySpec extends SparkSpec {

  test("q241: identities hold and Q matches the rational recompute") {
    val out = graft.SparkEntry.queries("q241_modularity")(spark, sf).collect()
    assert(out.length == 20, "one row per source")
    val edges = Dedup.jaccardPairs(spark, sf).select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val src = graft.Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val m = edges.length.toLong
    assert(out.map(_.getAs[Long]("d_c")).sum == 2 * m, "degree mass = 2m")
    val crossEdges = edges.count { case (a, b) => src(a) != src(b) }.toLong
    assert(out.map(_.getAs[Long]("cut_c")).sum == 2 * crossEdges)
    val inTotal = edges.count { case (a, b) => src(a) == src(b) }.toLong
    assert(out.map(_.getAs[Long]("in_c")).sum == inTotal)
    // rational Q
    val num = out.map(r => BigInt(r.getAs[Long]("contrib_num"))).sum
    val qMicro = num * 1000000 / (4 * BigInt(m) * m)
    out.foreach(r => assert(BigInt(r.getAs[Long]("q_total_micro")) == qMicro))
    // per-source contribution formula
    out.foreach { r =>
      assert(r.getAs[Long]("contrib_num") ==
        4 * m * r.getAs[Long]("in_c") - r.getAs[Long]("d_c") * r.getAs[Long]("d_c"))
    }
  }
}

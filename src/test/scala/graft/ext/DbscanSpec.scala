package graft.ext

import graft.{SparkEntry, SparkSpec}

/** q255: the relational DBSCAN must equal a driver-side CLASSIC
  * implementation (degree count, union-find over core-core edges,
  * min-label border attachment) run on brute-force Hamming pairs —
  * an algorithmic replay independent of both the band join and the
  * SQL oracle. Plus the semantic point of shipping DBSCAN at all:
  * density pruning must actually demote some connected doc to
  * border/noise (otherwise it degenerates to q59's CC).
  */
class DbscanSpec extends SparkSpec {

  private val Radius = 5
  private val MinNbrs = 2

  test("q255 equals a classic driver-side DBSCAN on brute-force pairs") {
    val sh = Dedup.simhash60Frame(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = sh.keys.toSeq.sorted
    val pairs = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      if java.lang.Long.bitCount(sh(ids(i)) ^ sh(ids(j))) <= Radius
    } yield (ids(i), ids(j))
    val nbrs = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val core = ids.filter(id => nbrs.getOrElse(id, Nil).size >= MinNbrs).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      if (core(a) && core(b)) { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    }
    // cluster label = MIN doc_id in the component
    val label = core.map(c => c -> core.filter(x => find(x) == find(c)).min).toMap
    val expected = ids.map { id =>
      val n = nbrs.getOrElse(id, Nil).size.toLong
      if (core(id)) (id, n, "core", Some(label(id)))
      else {
        val coreNb = nbrs.getOrElse(id, Nil).filter(core.contains)
        if (coreNb.nonEmpty) (id, n, "border", Some(coreNb.map(label).min))
        else (id, n, "noise", None)
      }
    }
    val got = SparkEntry.queries("q255_dbscan_clusters")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSeq
    assert(got == expected)
  }

  test("density pruning bites: some connected doc is NOT core (the CC-vs-DBSCAN point)") {
    val rows = SparkEntry.queries("q255_dbscan_clusters")(spark, sf).collect()
    assert(rows.exists(_.getString(2) == "core"), "no cores — radius/minPts miscalibrated")
    assert(rows.exists(r => r.getLong(1) >= 1 && r.getString(2) != "core"),
      "every connected doc is core — DBSCAN degenerated to plain CC here")
    assert(rows.exists(_.getString(2) == "noise"), "no noise tier")
  }
}

package graft.ext

import graft.{SparkEntry, SparkSpec}

/** q255: the relational DBSCAN must equal a driver-side CLASSIC
  * implementation (degree count, union-find over core-core edges,
  * min-label border attachment) run on brute-force Hamming pairs
  * over the 120-bit shingle simhash — an algorithmic replay
  * independent of both the band join and the SQL oracle. Plus the
  * semantic point of shipping DBSCAN at all: density pruning must
  * actually demote some connected doc to border/noise (otherwise it
  * degenerates to q59's CC). The sf0.01 driver corpus has no border
  * docs under this geometry, so the attach path is additionally
  * pinned by a PLANTED pair graph driven through the exact
  * production role/label derivation (dbscanFromPairs).
  */
class DbscanSpec extends SparkSpec {

  private val Radius = 5
  private val MinNbrs = 2

  test("q255 equals a classic driver-side DBSCAN on brute-force pairs") {
    val sh = Dedup.shingleSimhash120Frame(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ids = sh.keys.toSeq.sorted
    def dist(a: Long, b: Long): Int =
      java.lang.Long.bitCount(sh(a)._1 ^ sh(b)._1) +
        java.lang.Long.bitCount(sh(a)._2 ^ sh(b)._2)
    val pairs = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      if dist(ids(i), ids(j)) <= Radius
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
    // the round-9 geometry keeps borders live at this SF (calibration
    // fact — radius 5 over the shingle-120 fingerprint)
    assert(rows.exists(_.getString(2) == "border"), "no border tier at sf0.001")
  }

  test("planted pair graph: border attaches to the MIN adjacent core label") {
    import spark.implicits._
    // two core triangles {1,2,3} and {10,11,12} (every member degree
    // 2 = MinNbrs → core); doc 20 has ONE edge, to core 3 → border of
    // cluster 1; doc 30 has no edges → noise; docs 40-41 are an
    // isolated pair (degree 1 each, neither core) → both noise even
    // though connected — the density-demotion case
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 12L, 20L, 30L, 40L, 41L).toDF("doc_id")
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (3L, 20L),
      (40L, 41L)).toDF("a_id", "b_id")
    val got = DupGraph.dbscanFromPairs(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    val expected = Seq(
      (1L, 2L, "core", Some(1L)), (2L, 2L, "core", Some(1L)),
      (3L, 3L, "core", Some(1L)),
      (10L, 2L, "core", Some(10L)), (11L, 2L, "core", Some(10L)),
      (12L, 2L, "core", Some(10L)),
      (20L, 1L, "border", Some(1L)),
      (30L, 0L, "noise", None),
      (40L, 1L, "noise", None), (41L, 1L, "noise", None))
    assert(got == expected)
  }

  test("planted dense bridge: clusters merge through a CORE bridge and the attach follows") {
    import spark.implicits._
    // doc 20 touches core 3 (triangle 1) and core 10 (triangle 2):
    // degree 2 = MinNbrs makes 20 itself core, so the two triangles
    // legitimately merge into one cluster labeled min core id = 1 —
    // DBSCAN only prevents SPARSE bridges, and this pins the dense
    // side of that contract. Doc 21 has one edge to core 10: border,
    // and its attach label must read the MERGED cluster's label (1),
    // i.e. attachment resolves labels AFTER core clustering
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 12L, 20L, 21L).toDF("doc_id")
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (3L, 20L), (10L, 20L),
      (10L, 21L)).toDF("a_id", "b_id")
    val got = DupGraph.dbscanFromPairs(docs, pairs).collect()
      .map(r => r.getLong(0) -> ((r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got(20L) == ("core", Some(1L)), s"bridge doc: ${got(20L)}")
    assert(got(21L) == ("border", Some(1L)) || got(21L) == ("border", Some(10L)),
      s"border doc: ${got(21L)}")
    // 20 is core and adjacent to cores 3 and 10 → one merged cluster
    // labeled min(all core ids) = 1; 21's only core neighbor is 10,
    // whose cluster label is now 1 — so the attach must read 1
    assert(got(21L) == ("border", Some(1L)), s"attach label: ${got(21L)}")
  }
}

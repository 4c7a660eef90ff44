package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: the step AFTER pair detection that an
  * actual corpus dedup needs. q45/q46 emit near-dup PAIRS; to drop
  * duplicates you need connected components over the pair graph —
  * (a,b) and (b,c) near-dups must collapse into ONE cluster {a,b,c}
  * with one survivor, or the "dedup" keeps transitive copies.
  *
  * Algorithm: iterative min-label propagation over the symmetrized
  * edge list — every node starts labeled with its own id; each round,
  * every node takes the min of its own label and its neighbors'
  * labels; fixpoint = each node labeled with the min doc_id of its
  * component (the canonical survivor). Each round is one shuffle
  * (join on id + groupBy min), so the whole computation is
  * O(diameter) shuffles over the EDGE list — never the O(n²) pair
  * space, and no driver-side graph state (the driver sees only a
  * one-row convergence counter per round). Near-dup components are
  * shallow (dup clusters, not social graphs), so diameter — and the
  * round count — is small; an adversarial million-node chain would
  * call for the large-star/small-star contraction of Kiveris et al.
  * ("Connected Components in MapReduce and Beyond", SoCC'14), which
  * converges in O(log n) rounds with the same join/groupBy building
  * blocks.
  */
object DupGraph {

  /** Safety bound on propagation rounds. One-hop min-label propagation
    * converges in O(diameter) rounds (NOT O(log n)), so this bound is
    * hit by any component of diameter > 16 — plausible only for
    * adversarial chains, not dup clusters. Rather than silently return
    * wrong labels, `connectedComponents` throws when the bound is hit
    * unconverged (the large-star/small-star contraction cited above is
    * the O(log n) upgrade if that ever fires).
    */
  private val MaxRounds = 16

  /** Connected components over an (a_id, b_id) undirected edge list:
    * returns (id, comp) for every node that appears in an edge, with
    * comp = min node id of its component. Each iteration
    * localCheckpoints the label table — labels are small (two longs
    * per node) and the checkpoint both truncates the exponentially
    * growing lineage and stops Spark re-running earlier rounds.
    *
    * One round = ONE shuffle pair (edge-label join + per-id min) with
    * the `changed` flag computed inside the same plan
    * (`least(own, min-of-neighbors) < own`), so the convergence probe
    * is a filter over the just-checkpointed labels, not an extra
    * join job per round.
    */
  private[ext] def connectedComponents(edges: DataFrame): DataFrame = {
    // symmetrize with ONE pass over the edges plan — a union of two
    // selects would execute the (often expensive) pair-generation
    // pipeline twice inside the checkpoint job
    val sym = edges
      .select(explode(array(
        struct(col("a_id").as("u"), col("b_id").as("v")),
        struct(col("b_id").as("u"), col("a_id").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .localCheckpoint()
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    // one propagation step as a PLAN (no action): labels -> labels
    def step(l: DataFrame): DataFrame = {
      val nm = sym.join(l, sym("u") === l("id"))
        .groupBy(col("v").as("sid")).agg(min("comp").as("nmin"))
      l.join(nm, l("id") === nm("sid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
    }
    var round = 0
    var converged = false
    while (!converged && round < MaxRounds) {
      // TWO propagation steps per job (round-15 fixed-cost shave: the
      // per-round checkpoint job dominates at bounded graph sizes —
      // the CDC folds run this over touched neighborhoods of a few
      // hundred edges, where scheduling, not data, is the cost). The
      // convergence count observes the SECOND step: labels are
      // monotone non-increasing, so a no-change second step means a
      // fixed point whether or not the first step moved; the extra
      // half-step past convergence is idempotent.
      val mid = step(labels)
      val neighborMin = sym.join(mid, sym("u") === mid("id"))
        .groupBy(col("v").as("id")).agg(min("comp").as("nmin"))
        .withColumnRenamed("id", "nid")
      // the convergence count rides the checkpoint job itself
      // (CollectMetrics above the localCheckpoint): one job per round
      // instead of checkpoint + a separate filter/isEmpty probe
      val obs = org.apache.spark.sql.Observation()
      val next = mid
        .join(neighborMin, mid("id") === neighborMin("nid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"),
          (coalesce(col("nmin"), col("comp")) < col("comp")).as("changed"))
        .observe(obs, count(when(col("changed"), 1)).as("n_changed"))
        .localCheckpoint()
      converged = obs.get("n_changed").asInstanceOf[Long] == 0L
      labels = next.select(col("id"), col("comp")) // projection over the checkpoint
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $MaxRounds rounds " +
          "(component diameter exceeds the bound); labels would be wrong")
    labels
  }

  /** Round bound for the star contraction: alternating large/small
    * star halves the tree height every pass, so convergence is
    * O(log n) rounds — 48 covers any component a real cluster could
    * hold (2^48 nodes) with margin for the constant factor.
    */
  private val MaxStarRounds = 48

  /** Connected components via the LARGE-STAR / SMALL-STAR contraction
    * of Kiveris et al. ("Connected Components in MapReduce and
    * Beyond", SoCC'14) — the O(log n)-round upgrade over one-hop
    * label propagation for adversarial (deep) graphs. Same contract
    * as [[connectedComponents]]: (id, comp) for every node in an
    * edge, comp = component min.
    *
    * Edges are kept canonical (u > v, distinct). One round =
    * large-star (each node links its LARGER neighbors to its minimum
    * neighbor-or-self) then small-star (each node links its smaller
    * neighbors to their collective minimum); each phase is one
    * groupBy + one join over the edge list, so a round is a constant
    * number of edge-list shuffles regardless of graph depth. The
    * fixpoint is a star forest whose centers are the component
    * minima; convergence is detected by edge-set equality
    * (count + anti-join — two cheap jobs over checkpointed edges).
    */
  private[ext] def connectedComponentsStar(edges: DataFrame): DataFrame = {
    def canon(e: DataFrame): DataFrame = e
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e
        .select(explode(array(
          struct(col("u").as("a"), col("v").as("b")),
          struct(col("v").as("a"), col("u").as("b")))).as("x"))
        .select(col("x.a").as("a"), col("x.b").as("b"))
      val mins = sym.groupBy(col("a")).agg(min(col("b")).as("mb"))
        .withColumn("m", least(col("a"), col("mb")))
        .select(col("a"), col("m"))
      // every edge (a,b), a<b contributes via a's group (b>a), so
      // dropping the b<a side loses no connectivity
      sym.join(mins, "a").filter(col("b") > col("a"))
        .select(col("b").as("u"), col("m").as("v"))
    }
    def smallStar(e: DataFrame): DataFrame = {
      // e is canonical (u > v): grouping by u sees exactly the
      // smaller neighbors, whose min is the new star center
      val mins = e.groupBy(col("u")).agg(min(col("v")).as("m"))
      val moved = e.join(mins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      moved.union(mins.select(col("u"), col("m").as("v")))
    }
    // edge counts ride each checkpoint job via CollectMetrics (the
    // q59-loop trick): per round that drops the separate count() job,
    // and the anti-join probe only runs when counts already match
    // (i.e. at the fixpoint), so a round is checkpoint + nothing
    val obs0 = org.apache.spark.sql.Observation()
    var cur = canon(edges.select(col("a_id").as("u"), col("b_id").as("v")))
      .observe(obs0, count(lit(1)).as("n"))
      .localCheckpoint()
    var curCount = obs0.get("n").asInstanceOf[Long]
    var round = 0
    var converged = curCount == 0L
    while (!converged && round < MaxStarRounds) {
      val obs = org.apache.spark.sql.Observation()
      val next = canon(smallStar(largeStar(cur)))
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint()
      val nextCount = obs.get("n").asInstanceOf[Long]
      converged = nextCount == curCount &&
        next.join(cur, Seq("u", "v"), "left_anti").limit(1).isEmpty
      cur = next
      curCount = nextCount
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star contraction did not converge in $MaxStarRounds rounds")
    cur.select(col("u").as("id"), col("v").as("comp"))
      .union(cur.select(col("v").as("id"), col("v").as("comp")))
      .distinct()
  }

  /** Per-document cluster assignment over the q45 verified Jaccard
    * pairs: (doc_id, comp_id, comp_size), comp_id = the cluster's
    * canonical (min) doc_id; edge-free docs are their own singleton.
    * Shared by q59 (the report), q82 (the materialized dedup), and
    * q91 (the star-contraction variant).
    */
  private def assignments(
      spark: SparkSession, dir: String,
      cc: DataFrame => DataFrame = connectedComponents): DataFrame = {
    val comp = cc(
      Dedup.materializedPairs(spark, dir).select(col("a_id"), col("b_id")))
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .join(comp, col("doc_id") === col("id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp_id"))
      .withColumn("comp_size", count(lit(1)).over(Window.partitionBy(col("comp_id"))))
  }

  /** q59 — near-duplicate clusters: connected components over the q45
    * verified Jaccard pairs, reported per document — `comp_id` is the
    * cluster's canonical (min) doc_id, `comp_size` its member count;
    * docs with no near-dup edge are their own singleton cluster. A
    * downstream dedup keeps exactly the rows with doc_id = comp_id.
    */
  private def q59(spark: SparkSession, dir: String): DataFrame =
    assignments(spark, dir).orderBy("doc_id")

  /** q91 — the SAME cluster contract as q59, computed by the
    * large-star/small-star contraction instead of one-hop label
    * propagation: identical output (and identical oracle), different
    * round complexity — O(log n) edge-list shuffles instead of
    * O(diameter), the algorithm you switch to when components can be
    * deep (adversarial chains, citation graphs) rather than the
    * shallow blobs near-dup clusters form. Kept alongside q59 the way
    * q46b/q47b sit beside their sketch twins: one contract, two
    * engine strategies, both oracle-gated.
    */
  private def q91(spark: SparkSession, dir: String): DataFrame =
    assignments(spark, dir, connectedComponentsStar).orderBy("doc_id")

  /** q82 — the DEDUPLICATED CORPUS itself: the step q59's report
    * feeds. One survivor per cluster (the canonical min doc_id),
    * carrying how many near-dup members it absorbed; every non-maximal
    * cluster member is dropped. The join back to `documents` is on the
    * survivor ids only, and text leaves as a digest, not a payload —
    * at 100 TB this materialization shuffles 16-byte ids plus one
    * md5 per surviving row. Oracle: the same recursive-CTE closure as
    * q59 restricted to doc_id = comp_id.
    */
  private def q82(spark: SparkSession, dir: String): DataFrame = {
    val survivors = assignments(spark, dir)
      .filter(col("doc_id") === col("comp_id"))
      .select(col("doc_id"), (col("comp_size") - 1).as("n_dups_absorbed"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        md5(to_binary(col("text"), lit("utf-8"))).as("text_digest"))
      .join(survivors, "doc_id")
      .orderBy("doc_id")
  }

  private val q59Sql =
    s"""WITH RECURSIVE ${Dedup.jaccardScoredCte},
       |pairs AS (
       |  SELECT a_id, b_id FROM scored
       |  WHERE inter / (na + nb - inter) >= 0.5),
       |sym AS (SELECT a_id AS u, b_id AS v FROM pairs
       |        UNION ALL SELECT b_id, a_id FROM pairs),
       |reach AS (
       |  SELECT u AS id, u AS comp FROM sym
       |  UNION
       |  SELECT s.v AS id, r.comp FROM reach r JOIN sym s ON s.u = r.id),
       |comp AS (SELECT id, MIN(comp) AS comp_id FROM reach GROUP BY id),
       |asg AS (
       |  SELECT d.doc_id, COALESCE(c.comp_id, d.doc_id) AS comp_id
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
       |SELECT doc_id, comp_id,
       |       CAST(COUNT(*) OVER (PARTITION BY comp_id) AS BIGINT) AS comp_size
       |FROM asg ORDER BY doc_id""".stripMargin

  private val q82Sql =
    s"""WITH RECURSIVE ${Dedup.jaccardScoredCte},
       |pairs AS (
       |  SELECT a_id, b_id FROM scored
       |  WHERE inter / (na + nb - inter) >= 0.5),
       |sym AS (SELECT a_id AS u, b_id AS v FROM pairs
       |        UNION ALL SELECT b_id, a_id FROM pairs),
       |reach AS (
       |  SELECT u AS id, u AS comp FROM sym
       |  UNION
       |  SELECT s.v AS id, r.comp FROM reach r JOIN sym s ON s.u = r.id),
       |comp AS (SELECT id, MIN(comp) AS comp_id FROM reach GROUP BY id),
       |asg AS (
       |  SELECT d.doc_id, COALESCE(c.comp_id, d.doc_id) AS comp_id
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
       |sized AS (
       |  SELECT doc_id, comp_id,
       |         COUNT(*) OVER (PARTITION BY comp_id) AS comp_size
       |  FROM asg)
       |SELECT d.doc_id, d.source, md5(d.text) AS text_digest,
       |       CAST(s.comp_size - 1 AS BIGINT) AS n_dups_absorbed
       |FROM sized s JOIN documents d ON d.doc_id = s.doc_id
       |WHERE s.doc_id = s.comp_id
       |ORDER BY d.doc_id""".stripMargin

  /** q116 — TRANSITIVE contamination audit: q67 catches train docs
    * sharing literal 8-grams with held-out docs, but a held-out doc's
    * NEAR-DUPLICATE in the train split leaks evaluation data just the
    * same (lightly edited copies share answers, not necessarily exact
    * 8-grams once perturbed). The fix is graph-shaped: any q59 dup
    * cluster containing a held-out (val/test-split) member taints
    * EVERY train member of that cluster — quarantine them all.
    * Reported per tainted train doc with its cluster id/size and how
    * many held-out members the cluster holds.
    *
    * Pure composition of audited machinery: q45 verified pairs →
    * [[connectedComponents]] → split buckets (the q58 md5 split) →
    * one per-cluster aggregate + one membership join — everything
    * shuffles ids and counts only. Oracle = the q59 recursive-closure
    * CTE extended with the same split/taint relational steps.
    *
    * HELD-OUT CONVENTION (intentional family difference): this audit
    * taints on the FULL non-train pool (bucket ≥ TrainPct, val AND
    * test) because a val-set near-duplicate in train biases model
    * selection just like test leakage biases the final eval; the
    * n-gram/semantic audits q67/q113/q121 index only the TEST split
    * (bucket ≥ TrainPct+ValPct) — the irrecoverable final-eval
    * surface. Compare the audits knowing the pools differ.
    */
  private def q116(spark: SparkSession, dir: String): DataFrame = {
    val bucket = TrainPrep.splitBucket(col("doc_id"))
    val sp = assignments(spark, dir).withColumn("bucket", bucket)
    val taint = sp.groupBy(col("comp_id"))
      .agg(sum(when(col("bucket") >= TrainPrep.TrainPct, 1L).otherwise(0L))
        .as("n_heldout_members"))
    sp.join(taint, "comp_id")
      .filter(col("bucket") < TrainPrep.TrainPct && col("n_heldout_members") > 0)
      .select(col("doc_id"), col("comp_id"), col("comp_size"), col("n_heldout_members"))
      .orderBy("doc_id")
  }

  private val q116Sql =
    s"""WITH RECURSIVE ${Dedup.jaccardScoredCte},
       |pairs AS (
       |  SELECT a_id, b_id FROM scored
       |  WHERE inter / (na + nb - inter) >= 0.5),
       |sym AS (SELECT a_id AS u, b_id AS v FROM pairs
       |        UNION ALL SELECT b_id, a_id FROM pairs),
       |reach AS (
       |  SELECT u AS id, u AS comp FROM sym
       |  UNION
       |  SELECT s.v AS id, r.comp FROM reach r JOIN sym s ON s.u = r.id),
       |comp AS (SELECT id, MIN(comp) AS comp_id FROM reach GROUP BY id),
       |asg AS (
       |  SELECT d.doc_id, COALESCE(c.comp_id, d.doc_id) AS comp_id
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
       |sp AS (
       |  SELECT doc_id, comp_id,
       |         COUNT(*) OVER (PARTITION BY comp_id) AS comp_size,
       |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
       |  FROM asg),
       |tc AS (
       |  SELECT comp_id,
       |         CAST(SUM(CASE WHEN bucket >= ${TrainPrep.TrainPct} THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_heldout_members
       |  FROM sp GROUP BY comp_id)
       |SELECT sp.doc_id, sp.comp_id, CAST(sp.comp_size AS BIGINT) AS comp_size,
       |       tc.n_heldout_members
       |FROM sp JOIN tc USING (comp_id)
       |WHERE sp.bucket < ${TrainPrep.TrainPct} AND tc.n_heldout_members > 0
       |ORDER BY sp.doc_id""".stripMargin

  /** q142 rank scale (micromass × 1e6): ranks are BIGINTs summing to
    * ~[[PrScale]] across the subgraph, so every intermediate stays far
    * under 2^63 and truncating integer division is the ONLY rounding
    * — identical in both engines for positive operands.
    */
  private val PrScale = 1000000000000L

  /** q142 damping = 85/100 and a fixed 5 iterations (unrolled in the
    * oracle; no convergence probe, so the computation is a pure
    * function of the edge list in both engines).
    */
  private val PrIters = 5

  /** q142 — PAGERANK over the near-dup pair graph: the iterative
    * link-analysis family (the one CC doesn't cover — value
    * PROPAGATION rather than label collapse), run where it's useful
    * in a corpus pipeline: scoring boilerplate HUBS. A template shared
    * by many documents sits central in the near-dup graph; its
    * PageRank concentrates mass from every spoke, so ranking the
    * subgraph surfaces the templates a cleaning pass should inspect
    * first (degree alone can't distinguish one 10-spoke hub from ten
    * chained copies — rank can).
    *
    * Engine shape: the symmetrized q45 edge list is lazily
    * checkpointed once (the pair-verification pipeline must not
    * re-run per iteration), each iteration is one join + one groupBy
    * over edges — the same shuffle unit as a CC round — and 5
    * iterations compose into ONE linear plan evaluated by a single
    * action (no per-round materialization: lineage is 5 deep, not
    * exponential). Only the node count N crosses to the driver.
    *
    * Exactness: ranks are scaled integers ([[PrScale]]); each edge
    * contributes `r_u DIV deg_u`, each update is
    * `T + (85 · Σcontrib) DIV 100` with
    * `T = (15 · PrScale) DIV (100 · N)` — every division truncates
    * positive BIGINTs, which Spark's `DIV` and DuckDB's `//` agree on
    * bit-for-bit. The oracle unrolls the 5 iterations as chained CTEs
    * over the shared [[Dedup.jaccardScoredCte]] edge derivation.
    */
  private def q142(spark: SparkSession, dir: String): DataFrame = {
    val sym = Dedup.materializedPairs(spark, dir)
      .select(explode(array(
        struct(col("a_id").as("u"), col("b_id").as("v")),
        struct(col("b_id").as("u"), col("a_id").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .localCheckpoint(false)
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    val n = deg.count()
    // empty graph → empty ranking (what the oracle's joins produce),
    // not a failure: a clean corpus simply has no hubs to report
    if (n == 0L)
      return deg.select(col("u").as("doc_id"), col("deg").as("n_neighbors"),
        col("deg").as("rank_scaled"))
    val teleport = (15L * PrScale) / (100L * n)
    var r = deg.select(col("u").as("id"), lit(PrScale / n).as("r"))
    for (_ <- 1 to PrIters) {
      val contrib = sym
        .join(deg, "u")
        .join(r, sym("u") === r("id"))
        .select(col("v"), expr("r DIV deg").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("s"))
      r = deg.select(col("u").as("id"))
        .join(contrib, col("id") === contrib("v"), "left")
        .select(col("id"),
          (lit(teleport) + expr("(85 * coalesce(s, CAST(0 AS BIGINT))) DIV 100")).as("r"))
    }
    r.join(deg, r("id") === deg("u"))
      .select(col("id").as("doc_id"), col("deg").as("n_neighbors"),
        col("r").as("rank_scaled"))
      .orderBy("doc_id")
  }

  private val q142Sql = {
    val step = (k: Int) =>
      s"""c$k AS (
         |  SELECT s.v, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
         |  FROM sym s JOIN deg d ON s.u = d.u JOIN r${k - 1} r ON r.id = s.u
         |  GROUP BY s.v),
         |r$k AS (
         |  SELECT d.u AS id,
         |         (15 * $PrScale) // (100 * n.n) + (85 * COALESCE(c.s, 0)) // 100 AS r
         |  FROM deg d LEFT JOIN c$k c ON c.v = d.u CROSS JOIN n)""".stripMargin
    s"""WITH ${Dedup.jaccardScoredCte},
       |pairs AS (
       |  SELECT a_id, b_id FROM scored
       |  WHERE inter / (na + nb - inter) >= 0.5),
       |sym AS (SELECT a_id AS u, b_id AS v FROM pairs
       |        UNION ALL SELECT b_id, a_id FROM pairs),
       |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY u),
       |n AS (SELECT COUNT(*) AS n FROM deg),
       |r0 AS (SELECT u AS id, $PrScale // n.n AS r FROM deg CROSS JOIN n),
       |${(1 to PrIters).map(step).mkString(",\n")}
       |SELECT r.id AS doc_id, d.deg AS n_neighbors, CAST(r.r AS BIGINT) AS rank_scaled
       |FROM r$PrIters r JOIN deg d ON d.u = r.id
       |ORDER BY doc_id""".stripMargin
  }

  /** q143 — TRIANGLE COUNTING + local clustering coefficient over the
    * near-dup graph: the structural probe that tells a CLIQUE (a
    * template stamped out many times — every copy near-dups every
    * other) from a CHAIN (drifting edits — a near-dups b near-dups c,
    * but a≁c). Dup clusters with high clustering coefficient are safe
    * to collapse to one survivor; low-coefficient clusters deserve a
    * look before deleting "duplicates" that differ end-to-end.
    *
    * The canonical distributed formulation: triangles enumerated once
    * each as ordered triples a<b<c via two self-joins of the
    * canonical (u<v) edge list — at cluster scale the join order
    * pivots on orienting edges from low- to high-degree endpoints so
    * no reducer sees a hub's full neighborhood squared; at this graph
    * size (hundreds of verified pairs) plain joins are optimal.
    * Integer-exact: coefficient reported as ppm,
    * `(2·T·1e6) DIV (deg·(deg−1))` for deg ≥ 2, NULL below (both
    * engines truncate positive BIGINTs identically).
    */
  private def q143(spark: SparkSession, dir: String): DataFrame = {
    val e = Dedup.materializedPairs(spark, dir)
      .select(col("a_id").as("u"), col("b_id").as("v"))
      .localCheckpoint(false)
    val deg = e.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val tri = e.select(col("u").as("a"), col("v").as("b"))
      .join(e.select(col("u").as("b"), col("v").as("c")), "b")
      .join(e.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"))
      .select(col("a"), col("b"), col("c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("deg").as("n_neighbors"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        expr("""CASE WHEN deg >= 2
               | THEN (2 * coalesce(n_triangles, CAST(0 AS BIGINT)) * 1000000)
               |      DIV (deg * (deg - 1))
               | END""".stripMargin.replace("\n", " ")).as("clustering_ppm"))
      .orderBy("doc_id")
  }

  private val q143Sql =
    s"""WITH ${Dedup.jaccardScoredCte},
       |e AS (
       |  SELECT a_id AS u, b_id AS v FROM scored
       |  WHERE inter / (na + nb - inter) >= 0.5),
       |deg AS (
       |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
       |    SELECT u AS id FROM e UNION ALL SELECT v FROM e)
       |  GROUP BY id),
       |tri AS (
       |  SELECT ab.u AS a, ab.v AS b, bc.v AS c
       |  FROM e ab JOIN e bc ON ab.v = bc.u
       |            JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
       |pn AS (
       |  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
       |    SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
       |    UNION ALL SELECT c FROM tri)
       |  GROUP BY id)
       |SELECT deg.id AS doc_id, deg.deg AS n_neighbors,
       |       COALESCE(pn.n_triangles, 0) AS n_triangles,
       |       CASE WHEN deg.deg >= 2
       |            THEN (2 * COALESCE(pn.n_triangles, 0) * 1000000)
       |                 // (deg.deg * (deg.deg - 1))
       |            END AS clustering_ppm
       |FROM deg LEFT JOIN pn ON pn.id = deg.id
       |ORDER BY doc_id""".stripMargin

  /** q194 — SURVIVORSHIP (the MDM "golden record" build): per
    * near-dup cluster, fuse one canonical record with a DIFFERENT
    * rule per field — the defining trait of survivorship vs q82's
    * keep-one-row dedup, where a single winner donates every field:
    *   - `lang`: cluster MODE (most frequent, lexicographic
    *     tie-break) — consensus fields take the majority;
    *   - `source`: from the EARLIEST member (min doc_id) —
    *     provenance fields take the first-seen value;
    *   - `text_from` / `max_chars`: the LONGEST member wins —
    *     completeness fields take the richest value (the winner's ID
    *     ships, never its body — the shuffle-payload rule).
    * Different fields can come from different rows, which no single
    * max_by can express. Plan: the shared CC assignments, then three
    * comp-keyed aggregation/window passes (distributed by cluster
    * key) joined on the cluster id — no global stage, no body
    * columns through any exchange. The oracle rebuilds the identical
    * clusters (recursive CTE) and rules.
    */
  private def q194(spark: SparkSession, dir: String): DataFrame = {
    val members = assignments(spark, dir)
      .join(Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars")), "doc_id")
    val base = members.groupBy(col("comp_id"))
      .agg(count(lit(1)).as("n_members"), max(col("n_chars")).as("max_chars"))
    val textW = members.withColumn("rn", row_number().over(
        Window.partitionBy(col("comp_id")).orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rn") === 1).select(col("comp_id"), col("doc_id").as("text_from"))
    val srcW = members.withColumn("rn", row_number().over(
        Window.partitionBy(col("comp_id")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).select(col("comp_id"), col("source"))
    val langW = members.groupBy(col("comp_id"), col("lang"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("comp_id")).orderBy(col("cnt").desc, col("lang"))))
      .filter(col("rn") === 1).select(col("comp_id"), col("lang"))
    base.join(textW, "comp_id").join(srcW, "comp_id").join(langW, "comp_id")
      .select(col("comp_id"), col("n_members"), col("lang"), col("source"),
        col("text_from"), col("max_chars"))
      .orderBy("comp_id")
  }

  private val q194Sql =
    s"""WITH RECURSIVE ${Dedup.jaccardScoredCte},
       |pairs AS (
       |  SELECT a_id, b_id FROM scored
       |  WHERE inter / (na + nb - inter) >= 0.5),
       |sym AS (SELECT a_id AS u, b_id AS v FROM pairs
       |        UNION ALL SELECT b_id, a_id FROM pairs),
       |reach AS (
       |  SELECT u AS id, u AS comp FROM sym
       |  UNION
       |  SELECT s.v AS id, r.comp FROM reach r JOIN sym s ON s.u = r.id),
       |comp AS (SELECT id, MIN(comp) AS comp_id FROM reach GROUP BY id),
       |asg AS (
       |  SELECT d.doc_id, COALESCE(c.comp_id, d.doc_id) AS comp_id,
       |         d.lang, d.source, d.n_chars
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
       |base AS (
       |  SELECT comp_id, COUNT(*) AS n_members,
       |         CAST(MAX(n_chars) AS BIGINT) AS max_chars
       |  FROM asg GROUP BY 1),
       |tw AS (
       |  SELECT comp_id, doc_id AS text_from FROM (
       |    SELECT comp_id, doc_id,
       |           ROW_NUMBER() OVER (PARTITION BY comp_id
       |                              ORDER BY n_chars DESC, doc_id) AS rn
       |    FROM asg) WHERE rn = 1),
       |sw AS (
       |  SELECT comp_id, source FROM (
       |    SELECT comp_id, source,
       |           ROW_NUMBER() OVER (PARTITION BY comp_id ORDER BY doc_id) AS rn
       |    FROM asg) WHERE rn = 1),
       |lm AS (
       |  SELECT comp_id, lang FROM (
       |    SELECT comp_id, lang,
       |           ROW_NUMBER() OVER (PARTITION BY comp_id
       |                              ORDER BY COUNT(*) DESC, lang) AS rn
       |    FROM asg GROUP BY comp_id, lang) WHERE rn = 1)
       |SELECT base.comp_id, base.n_members, lm.lang, sw.source,
       |       tw.text_from, base.max_chars
       |FROM base JOIN tw USING (comp_id) JOIN sw USING (comp_id)
       |          JOIN lm USING (comp_id)
       |ORDER BY comp_id""".stripMargin

  /** q196 — BFS round bound: hop distances only shrink and every
    * improving round reduces Σdist or grows the reached set, so the
    * loop converges within the seed-to-node diameter; 16 rounds
    * covers any component the shallow near-dup graph can hold, and
    * hitting the bound unconverged throws (the DupGraph contract).
    * The oracle's recursive CTE carries the same bound as a WHERE
    * depth guard — without it, cycles would enumerate (node, d),
    * (node, d+L), ... forever before the outer MIN.
    */
  private val MaxBfsRounds = 16

  /** q196 — MULTI-SOURCE BFS hop distance over the near-dup graph:
    * for every document reachable from the md5-selected ~1% seed set,
    * its minimum hop count to any seed — the graph-traversal
    * primitive backing contamination-radius queries ("everything
    * within 2 hops of a known-bad doc", the transitive widening of
    * q116's 1-hop taint). Frontier relaxation, not pointer-chasing:
    * each round is ONE edge-label equi-join + per-node MIN — dist'
    * = min(dist, min over in-neighbors(dist)+1) — with the
    * convergence probe (reached count + Σdist, both monotone) riding
    * the round's checkpoint job via CollectMetrics (the CC-family
    * pattern: one job per round). O(diameter) shuffle rounds over
    * (id, dist) pairs — labels through the shuffle, never documents.
    */
  private def q196(spark: SparkSession, dir: String): DataFrame = {
    val edges = Dedup.materializedPairs(spark, dir).select(col("a_id"), col("b_id"))
    val sym = edges
      .select(explode(array(
        struct(col("a_id").as("u"), col("b_id").as("v")),
        struct(col("b_id").as("u"), col("a_id").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .localCheckpoint()
    var dist = Tables.documents(spark, dir).select(col("doc_id"))
      .filter(graft.ext.TrainPrep.md5Bucket(col("doc_id"), 100) === 0)
      .select(col("doc_id").as("id"), lit(0L).as("d"))
      .localCheckpoint()
    var prev = (-1L, -1L)
    var round = 0
    var converged = false
    while (!converged && round < MaxBfsRounds) {
      val obs = org.apache.spark.sql.Observation()
      val next = dist
        .unionAll(sym.join(dist, sym("u") === dist("id"))
          .select(col("v").as("id"), (col("d") + 1).as("d")))
        .groupBy(col("id")).agg(min(col("d")).as("d"))
        .observe(obs, count(lit(1)).as("n"), sum(col("d")).as("s"))
        .localCheckpoint()
      val cur = (obs.get("n").asInstanceOf[Long], obs.get("s").asInstanceOf[Long])
      converged = cur == prev
      prev = cur
      dist = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"BFS did not converge in $MaxBfsRounds relaxation rounds")
    dist.select(col("id").as("doc_id"), col("d").as("dist")).orderBy("doc_id")
  }

  private val q196Sql =
    s"""WITH RECURSIVE ${Dedup.jaccardScoredCte},
       |pairs AS (
       |  SELECT a_id, b_id FROM scored
       |  WHERE inter / (na + nb - inter) >= 0.5),
       |sym AS (SELECT a_id AS u, b_id AS v FROM pairs
       |        UNION ALL SELECT b_id, a_id FROM pairs),
       |seeds AS (
       |  SELECT doc_id AS id FROM documents
       |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 = 0),
       |reach AS (
       |  SELECT id, 0 AS d FROM seeds
       |  UNION
       |  SELECT s.v, r.d + 1 FROM reach r JOIN sym s ON s.u = r.id
       |  WHERE r.d < $MaxBfsRounds)
       |SELECT id AS doc_id, CAST(MIN(d) AS BIGINT) AS dist
       |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin

  /** q209 — fixed Bellman–Ford round count, unrolled in BOTH engines
    * so the result is a pure function of the edge list (the q142
    * argument): no convergence probe, no driver-visible state beyond
    * the source id. 8 rounds bounds 8-hop shortest paths — beyond any
    * path the shallow near-dup components hold; if a deeper graph
    * appeared, paths longer than 8 hops would simply read as their
    * best-8-hop relaxation IDENTICALLY in both engines.
    */
  private val SsspIters = 8

  /** q209 — WEIGHTED MULTI-SOURCE SHORTEST PATHS over the near-dup
    * graph (Bellman–Ford): q196 answers "how many hops from a seed";
    * this answers "how far in DISSIMILARITY" — edge weight =
    * 1e6 − jaccard_ppm, so a chain of tight copies (J≈1, w≈0) stays
    * near its seed while one loose link (J≈0.5, w≈5e5) pushes its
    * subtree away. An md5-selected ~14% salted seed set (the q196
    * shape; dense enough that components contain seeds at the demo
    * corpus size, decorrelated from q196's bucket): the
    * drift-aware contamination radius — delete everything within
    * dissimilarity D of a flagged seed, not within K hops.
    *
    * Engine shape: the symmetrized weighted edge list checkpoints
    * once; the dist table holds REACHED nodes only (the q196 BFS
    * frontier shape — no NULL sentinel rows), so each relaxation
    * round is `(dist ∪ relaxed-neighbors) groupBy id MIN(d)` — one
    * equi-join + one aggregate — checkpointed per round because the
    * round references dist twice (union arm + join probe); without
    * the checkpoint BOTH engines would inline the previous round
    * twice and the plan doubles per iteration (measured: the 2⁸
    * blowup wedged DuckDB outright — the oracle carries the same
    * fix as MATERIALIZED CTEs). Distances are exact BIGINT ppm
    * sums. Nothing crosses to the driver.
    */
  private def q209(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.materializedPairs(spark, dir)
      .select(col("a_id"), col("b_id"),
        expr("1000000 - (CAST(inter AS BIGINT) * 1000000) DIV CAST(na + nb - inter AS BIGINT)")
          .as("w"))
    val sym = pairs
      .select(explode(array(
        struct(col("a_id").as("u"), col("b_id").as("v"), col("w")),
        struct(col("b_id").as("u"), col("a_id").as("v"), col("w")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.w").as("w"))
      .localCheckpoint()
    var dist = Tables.documents(spark, dir).select(col("doc_id").as("id"))
      .filter(graft.ext.TrainPrep.md5Bucket(col("id"), 7, ":q209") === 0)
      .select(col("id"), lit(0L).as("d"))
    for (_ <- 1 to SsspIters) {
      dist = dist
        .unionAll(sym.join(dist, sym("u") === dist("id"))
          .select(col("v").as("id"), (col("d") + col("w")).as("d")))
        .groupBy(col("id")).agg(min(col("d")).as("d"))
        .localCheckpoint()
    }
    dist.select(col("id").as("doc_id"), col("d").as("dist_scaled")).orderBy("doc_id")
  }

  private val q209Sql = {
    val step = (k: Int) =>
      s"""d$k AS MATERIALIZED (
         |  SELECT id, MIN(d) AS d FROM (
         |    SELECT id, d FROM d${k - 1}
         |    UNION ALL
         |    SELECT s.v, d.d + s.w FROM sym s JOIN d${k - 1} d ON d.id = s.u)
         |  GROUP BY id)""".stripMargin
    s"""WITH ${Dedup.jaccardScoredCte},
       |pairs AS (
       |  SELECT a_id, b_id,
       |         1000000 - (CAST(inter AS BIGINT) * 1000000)
       |                   // CAST(na + nb - inter AS BIGINT) AS w
       |  FROM scored WHERE inter / (na + nb - inter) >= 0.5),
       |sym AS MATERIALIZED (
       |  SELECT a_id AS u, b_id AS v, w FROM pairs
       |  UNION ALL SELECT b_id, a_id, w FROM pairs),
       |d0 AS (
       |  SELECT doc_id AS id, CAST(0 AS BIGINT) AS d FROM documents
       |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':q209'), 1, 15))::BIGINT % 7 = 0),
       |${(1 to SsspIters).map(step).mkString(",\n")}
       |SELECT id AS doc_id, CAST(d AS BIGINT) AS dist_scaled
       |FROM d$SsspIters ORDER BY doc_id""".stripMargin
  }

  /** q213 — peel-round budget, identical in both engines: the result
    * is defined as "the edges surviving [[KcoreRounds]] peel rounds",
    * a pure function of the edge list (the q209 truncation contract).
    * Peeling removes every current degree-<k node per round, so a
    * component of n nodes needs at most ⌈n/2⌉ rounds; near-dup
    * components are few-node clusters, and KcoreSpec proves the
    * fixpoint was actually reached on this data (round r+1 ≡ round
    * r), so the truncated result IS the true 2-core here.
    */
  private val KcoreRounds = 8

  /** q213 — 2-CORE decomposition of the near-dup graph (iterative
    * peeling): strip degree-1 appendages round after round until only
    * nodes with ≥2 surviving neighbors remain. The structural
    * complement of q143's clustering coefficient: the 2-core
    * separates template CORES (every member mutually tangled —
    * cycles/cliques) from the chain/star FRINGE that mere transitive
    * duplication builds; a cleaning pass treats the two differently
    * (cores collapse to one survivor; fringes deserve a look before
    * deleting "copies" that differ end to end). Output: every
    * surviving node with its in-core degree, plus its component
    * fringe size (peeled neighbors) — the triage report.
    *
    * Engine shape: each peel round recomputes degrees (one groupBy)
    * and keeps edges whose BOTH endpoints pass (two semi-join-shaped
    * equi-joins); rounds checkpoint (the q209 double-reference rule
    * — the edge set feeds both the degree aggregate and the filter).
    * The oracle unrolls the same rounds as MATERIALIZED CTEs.
    */
  private def q213(spark: SparkSession, dir: String): DataFrame = {
    val canon = Dedup.materializedPairs(spark, dir)
      .select(col("a_id").as("u"), col("b_id").as("v"))
      .localCheckpoint()
    var edges = canon
    for (_ <- 1 to KcoreRounds) {
      val deg = edges
        .select(explode(array(col("u"), col("v"))).as("id"))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= 2).select(col("id"))
      edges = edges
        .join(keep.withColumnRenamed("id", "u"), Seq("u"))
        .join(keep.withColumnRenamed("id", "v"), Seq("v"))
        .select(col("u"), col("v"))
        .localCheckpoint()
    }
    val coreDeg = edges
      .select(explode(array(col("u"), col("v"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("core_degree"))
    val fullDeg = canon
      .select(explode(array(col("u"), col("v"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("full_degree"))
    coreDeg.join(fullDeg, Seq("doc_id"))
      .select(col("doc_id"), col("core_degree"), col("full_degree"),
        (col("full_degree") - col("core_degree")).as("n_peeled_neighbors"))
      .orderBy("doc_id")
  }

  private val q213Sql = {
    val step = (k: Int) =>
      s"""e$k AS MATERIALIZED (
         |  SELECT e.u, e.v FROM e${k - 1} e
         |  JOIN (SELECT id FROM (
         |          SELECT u AS id FROM e${k - 1} UNION ALL SELECT v FROM e${k - 1})
         |        GROUP BY id HAVING COUNT(*) >= 2) ku ON e.u = ku.id
         |  JOIN (SELECT id FROM (
         |          SELECT u AS id FROM e${k - 1} UNION ALL SELECT v FROM e${k - 1})
         |        GROUP BY id HAVING COUNT(*) >= 2) kv ON e.v = kv.id)""".stripMargin
    s"""WITH ${Dedup.jaccardScoredCte},
       |e0 AS MATERIALIZED (
       |  SELECT a_id AS u, b_id AS v FROM scored
       |  WHERE inter / (na + nb - inter) >= 0.5),
       |${(1 to KcoreRounds).map(step).mkString(",\n")},
       |core AS (
       |  SELECT id AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_degree FROM (
       |    SELECT u AS id FROM e$KcoreRounds UNION ALL SELECT v FROM e$KcoreRounds)
       |  GROUP BY id),
       |full_d AS (
       |  SELECT id AS doc_id, CAST(COUNT(*) AS BIGINT) AS full_degree FROM (
       |    SELECT u AS id FROM e0 UNION ALL SELECT v FROM e0)
       |  GROUP BY id)
       |SELECT core.doc_id, core.core_degree, full_d.full_degree,
       |       full_d.full_degree - core.core_degree AS n_peeled_neighbors
       |FROM core JOIN full_d ON core.doc_id = full_d.doc_id
       |ORDER BY core.doc_id""".stripMargin
  }

  /** q241 — GRAPH MODULARITY of the source partition over the
    * near-dup graph (Newman–Girvan Q): does near-duplication
    * concentrate WITHIN sources (mirror sites, shared boilerplate) or
    * cut across them (syndication)? Q = Σ_c [in_c/m − (D_c/2m)²],
    * computed entirely in exact integers by clearing denominators:
    * per-cluster contribution numerator 4m·in_c − D_c², global
    * Q_micro = Σ·10⁶ DIV 4m² — one value both engines agree on
    * bit-for-bit. Clusters here are the SOURCE attribute (no
    * iteration — the q59/q91 CC machinery scores a DISCOVERED
    * partition the same way; this query scores the curator's
    * partition). Per-source rows carry in/cut edges, degree mass and
    * doc count; every row repeats the global Q (1-row broadcast, q03
    * pattern).
    *
    * Scale shape: rides the shared q45 pair generator (edges as id
    * pairs), one groupBy(source) each for degrees and edges, a ≤
    * |sources|-row rollup — the metric stage adds nothing
    * data-volume-bound. sf0.001: 28 edges, mostly cross-source (the
    * planted near-dups deliberately span sources — TESTDATA fact),
    * so Q lands near zero/negative: the metric DETECTS that sources
    * are not dup-communities here, which is the honest readout.
    */
  private def q241(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val edges = Dedup.materializedPairs(spark, dir).select(col("a_id"), col("b_id"))
      .join(docs.select(col("doc_id").as("a_id"), col("source").as("sa")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("source").as("sb")), "b_id")
    val m = edges.agg(count(lit(1)).as("m"))
    val deg = edges.select(col("a_id").as("doc_id")).unionAll(edges.select(col("b_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("deg"))
    val degBySource = docs.join(deg, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("deg"), lit(0L))).as("d_c"))
    val inBySource = edges.filter(col("sa") === col("sb"))
      .groupBy(col("sa").as("source")).agg(count(lit(1)).as("in_c"))
    degBySource
      .join(inBySource, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("d_c"),
        coalesce(col("in_c"), lit(0L)).as("in_c"))
      .withColumn("cut_c", col("d_c") - col("in_c") * 2)
      .crossJoin(broadcast(m))
      .withColumn("contrib_num", expr("4 * m * in_c - d_c * d_c"))
      .select(col("source"), col("n_docs"), col("in_c"), col("cut_c"), col("d_c"),
        col("contrib_num"),
        expr("CAST((SUM(contrib_num) OVER () * 1000000) DIV (4 * m * m) AS BIGINT)")
          .as("q_total_micro"))
      .orderBy(col("source"))
  }

  private val q241Sql =
    s"""WITH ${Dedup.jaccardScoredCte},
       |pairs AS (
       |  SELECT a_id, b_id FROM scored
       |  WHERE inter / (na + nb - inter) >= 0.5),
       |lab AS (
       |  SELECT p.a_id, p.b_id, da.source AS sa, db.source AS sb
       |  FROM pairs p JOIN documents da ON p.a_id = da.doc_id
       |               JOIN documents db ON p.b_id = db.doc_id),
       |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM lab),
       |deg AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
       |    SELECT a_id AS doc_id FROM lab UNION ALL SELECT b_id FROM lab)
       |  GROUP BY 1),
       |dbs AS (
       |  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(COALESCE(deg, 0)) AS BIGINT) AS d_c
       |  FROM documents d LEFT JOIN deg ON d.doc_id = deg.doc_id
       |  GROUP BY 1),
       |ibs AS (
       |  SELECT sa AS source, CAST(COUNT(*) AS BIGINT) AS in_c
       |  FROM lab WHERE sa = sb GROUP BY 1),
       |cells AS (
       |  SELECT dbs.source, n_docs, COALESCE(in_c, 0) AS in_c,
       |         d_c - 2 * COALESCE(in_c, 0) AS cut_c, d_c,
       |         4 * m * COALESCE(in_c, 0) - d_c * d_c AS contrib_num, m
       |  FROM dbs LEFT JOIN ibs ON dbs.source = ibs.source CROSS JOIN m)
       |SELECT source, n_docs, in_c, cut_c, d_c, contrib_num,
       |       CAST((SUM(contrib_num) OVER () * 1000000) // (4 * m * m) AS BIGINT)
       |         AS q_total_micro
       |FROM cells
       |ORDER BY source""".stripMargin

  /** q254 Borůvka round budget: components at least halve per round,
    * so ⌈log₂ sources⌉ rounds span any source count this corpus
    * reaches; the loop breaks early at one component.
    */
  private val BoruvkaRounds = 6

  /** q254 — PARALLEL MINIMUM SPANNING TREE (Borůvka) over the
    * source-similarity graph: edge weight = 10⁶ − shingle-set
    * Jaccard ppm between two sources (the q53 corpus matrix as a
    * graph), and the MST is the backbone a curator reads as "which
    * corpora are closest kin" — single-linkage clustering's
    * dendrogram skeleton. Borůvka is THE parallel MST algorithm
    * (each round every component selects its minimum outgoing edge,
    * selected edges merge components): rounds are relational —
    * per-component min by a UNIQUE composite key (w·10⁶ + u·10³ + v,
    * so the MST is unique and any correct algorithm must produce
    * exactly this edge set), contraction = min-label closure over
    * the selection graph (the q59 machinery on the component graph).
    * The ORACLE replays the identical rounds in SQL with a recursive
    * closure per round — hash-gated algorithm parity, not just
    * result parity.
    *
    * Scale shape: everything after the shingle-index equi-join is
    * post-aggregation (≤ sources² edges); rounds are O(log sources)
    * with localCheckpoint per round (the DupGraph loop rule). The
    * inner label propagation iterates on a ≤|components| frame —
    * pointer-jumping (q91) is the upgrade path when "sources" means
    * millions of shards rather than tens of corpora.
    */
  private def q254(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = Tables.documents(spark, dir)
      .select(col("source"), explode(Dedup.shingles(col("text"))).as("g"))
      .distinct()
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = sh.select(col("source").as("sa"), col("g"))
      .join(sh.select(col("source").as("sb"), col("g")), "g")
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("i"))
    val idx = sizes.select(col("source"))
      .withColumn("node", row_number().over(Window.orderBy(col("source"))).cast("long") - 1)
    val edges = inter
      .join(sizes.select(col("source").as("sa"), col("n").as("na")), "sa")
      .join(sizes.select(col("source").as("sb"), col("n").as("nb")), "sb")
      .select(col("sa"), col("sb"),
        expr("1000000 - (1000000 * i) DIV (na + nb - i)").as("w"))
      .join(idx.select(col("source").as("sa"), col("node").as("u")), "sa")
      .join(idx.select(col("source").as("sb"), col("node").as("v")), "sb")
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"), col("w"))
      .withColumn("key", expr("w * 1000000 + u * 1000 + v"))
      .localCheckpoint()
    var comp = idx.select(col("node"), col("node").as("comp")).localCheckpoint()
    var mst = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "u BIGINT, v BIGINT, w BIGINT, key BIGINT, round INT"))
    var done = false
    for (r <- 1 to BoruvkaRounds if !done) {
      val e2 = edges
        .join(comp.select(col("node").as("u"), col("comp").as("cu")), "u")
        .join(comp.select(col("node").as("v"), col("comp").as("cv")), "v")
        .filter(col("cu") =!= col("cv"))
        .localCheckpoint()
      if (e2.isEmpty) done = true
      else {
        val both = e2.select(col("cu").as("c"), col("key"))
          .unionByName(e2.select(col("cv").as("c"), col("key")))
        val keys = both
          .withColumn("rn", row_number().over(Window.partitionBy(col("c")).orderBy(col("key"))))
          .filter(col("rn") === 1).select(col("key")).distinct()
        val sel = e2.join(keys, "key").localCheckpoint()
        mst = mst.unionByName(
          sel.select(col("u"), col("v"), col("w"), col("key")).withColumn("round", lit(r)))
        // contraction: min-label propagation over the component graph
        val sym = sel.select(col("cu").as("x"), col("cv").as("y"))
          .unionByName(sel.select(col("cv").as("x"), col("cu").as("y"))).distinct()
          .localCheckpoint()
        var lab = comp.select(col("comp").as("id")).distinct()
          .withColumn("lab", col("id")).localCheckpoint()
        var changed = true
        while (changed) {
          val contrib = sym
            .join(lab.select(col("id").as("x"), col("lab").as("xl")), "x")
            .select(col("y").as("id"), col("xl").as("lab"))
          // convergence rides the checkpoint job via CollectMetrics
          // (the outer CC loop's observe piggyback) — one job per
          // round instead of a separate limit(1).count() probe
          val obs = org.apache.spark.sql.Observation()
          val next = lab.select(col("id"), col("lab")).unionByName(contrib)
            .groupBy(col("id")).agg(min(col("lab")).as("lab2"))
            .join(lab, "id")
            .select(col("id"), col("lab2").as("lab"),
              (col("lab2") < col("lab")).cast("long").as("chg"))
            .observe(obs, sum(col("chg")).as("n"))
            .select(col("id"), col("lab"))
            .localCheckpoint()
          changed = obs.get("n").asInstanceOf[Long] > 0
          lab = next
        }
        comp = comp
          .join(lab.select(col("id").as("comp"), col("lab").as("newc")), "comp")
          .select(col("node"), col("newc").as("comp"))
          .localCheckpoint()
      }
    }
    mst
      .join(idx.select(col("source").as("a_source"), col("node").as("u")), "u")
      .join(idx.select(col("source").as("b_source"), col("node").as("v")), "v")
      .select(col("a_source"), col("b_source"), col("w").as("dist_ppm"), col("round"))
      .orderBy(col("a_source"), col("b_source"))
  }

  private val q254Sql = {
    val rounds = (1 to BoruvkaRounds).map { r =>
      s"""e$r AS MATERIALIZED (
         |  SELECT e.u, e.v, e.w, e.key, cu.comp AS cu, cv.comp AS cv
         |  FROM edges e
         |  JOIN comp${r - 1} cu ON e.u = cu.node
         |  JOIN comp${r - 1} cv ON e.v = cv.node
         |  WHERE cu.comp <> cv.comp),
         |pick$r AS (
         |  SELECT DISTINCT key FROM (
         |    SELECT c, key, ROW_NUMBER() OVER (PARTITION BY c ORDER BY key) AS rn
         |    FROM (SELECT cu AS c, key FROM e$r UNION ALL SELECT cv, key FROM e$r))
         |  WHERE rn = 1),
         |sel$r AS MATERIALIZED (SELECT e$r.* FROM e$r JOIN pick$r USING (key)),
         |sym$r AS (SELECT cu AS x, cv AS y FROM sel$r UNION SELECT cv, cu FROM sel$r),
         |reach$r AS (
         |  SELECT comp AS id, comp AS lab FROM (SELECT DISTINCT comp FROM comp${r - 1})
         |  UNION
         |  SELECT s.y, rch.lab FROM reach$r rch JOIN sym$r s ON s.x = rch.id),
         |newlab$r AS (SELECT id, MIN(lab) AS lab FROM reach$r GROUP BY id),
         |comp$r AS MATERIALIZED (
         |  SELECT c.node, n.lab AS comp
         |  FROM comp${r - 1} c JOIN newlab$r n ON c.comp = n.id)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to BoruvkaRounds)
      .map(r => s"SELECT u, v, w, $r AS round FROM sel$r").mkString("\n  UNION ALL\n  ")
    s"""WITH RECURSIVE w0 AS (
       |  SELECT source, string_split(text, ' ') AS ws FROM documents),
       |sh AS MATERIALIZED (
       |  SELECT DISTINCT source, s AS g FROM (
       |    SELECT source,
       |           CASE WHEN len(ws) >= 3 THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
       |                ELSE array_to_string(ws, ' ') END AS s
       |    FROM (SELECT source, ws,
       |                 unnest(CASE WHEN len(ws) >= 3 THEN range(1, len(ws) - 1)
       |                             ELSE [1] END) AS i
       |          FROM w0))),
       |sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.source AS sa, b.source AS sb, CAST(COUNT(*) AS BIGINT) AS i
       |  FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
       |  GROUP BY 1, 2),
       |idx AS (SELECT source, CAST(ROW_NUMBER() OVER (ORDER BY source) AS BIGINT) - 1 AS node
       |        FROM sizes),
       |edges AS MATERIALIZED (
       |  SELECT LEAST(ia.node, ib.node) AS u, GREATEST(ia.node, ib.node) AS v, w,
       |         w * 1000000 + LEAST(ia.node, ib.node) * 1000 + GREATEST(ia.node, ib.node) AS key
       |  FROM (
       |    SELECT sa, sb, 1000000 - (1000000 * i) // (na.n + nb.n - i) AS w
       |    FROM inter JOIN sizes na ON sa = na.source JOIN sizes nb ON sb = nb.source)
       |  JOIN idx ia ON sa = ia.source JOIN idx ib ON sb = ib.source),
       |comp0 AS (SELECT node, node AS comp FROM idx),
       |$rounds,
       |mst AS (
       |  $unions)
       |SELECT ia.source AS a_source, ib.source AS b_source,
       |       CAST(w AS BIGINT) AS dist_ppm, CAST(round AS INT) AS round
       |FROM mst JOIN idx ia ON u = ia.node JOIN idx ib ON v = ib.node
       |ORDER BY a_source, b_source""".stripMargin
  }

  /** q255 geometry: Hamming radius 5 over the 120-bit SHINGLE
    * simhash (two 60-bit words) → 6 disjoint 20-bit bands (d ≤ 5
    * differing bits cannot touch all 6 bands, so ≥ 1 band matches
    * exactly — the q229 pigeonhole, re-cut for the wider
    * fingerprint); MinPts = 2 NEIGHBORS (the classic "minPts = 3
    * including the point itself").
    *
    * Round 9 re-calibration, all numbers DuckDB-probed on the driver
    * corpus: the r8 geometry (radius 5 over the 60-bit WORD simhash,
    * 6×10-bit bands = 1,024 block values) admitted 13.7% of the
    * sf0.1 pair space as band candidates — the quadratic
    * per-band-value blow-up the r8 verdict flagged. Band width is
    * W/(radius+1), so the fix is a wider fingerprint at the same
    * radius — but width alone is NOT enough on this corpus: WORD
    * simhashes saturate on the ~31-token vocabulary (median per-bit
    * equality 0.68 between random docs), so 8×15-bit word bands still
    * admit 7.6%. Switching the features to 3-word SHINGLES (feature
    * space grows with the corpus → near-uniform bits) makes the
    * 6×20-bit bands carry their nominal entropy: measured 23 ppm of
    * the sf0.1 pair space (q259 registers the measurement). Radius 5
    * at 120 shingle bits was also probed non-degenerate: cores at
    * all three SFs (1/3/9), borders at sf0.001 and sf0.1 (none exist
    * in the sf0.01 corpus — the attach path is additionally pinned
    * by DbscanSpec's planted fixture), noise everywhere.
    */
  private val DbRadius = 5
  private val DbBands = 6
  private val DbBandBits = 20 // 6 × 20 = 120 across (w0, w1)
  private val DbMinNbrs = 2

  /** q255 — DBSCAN DENSITY CLUSTERING over document fingerprints
    * (Ester et al., KDD'96), the principled upgrade over plain
    * connected components for near-dup corpus structure: CC (q59)
    * chains A–B–C into one cluster even when A and C are unrelated —
    * one accidental bridge merges two dup families. DBSCAN only lets
    * DENSE points (≥ MinPts neighbors within eps) propagate cluster
    * membership, so sparse bridges become border/noise instead of
    * welds. Metric space: 60-bit md5 simhashes (q47b) under Hamming
    * distance, eps = ≤ 5 bits; the eps-neighborhood join is the
    * PIGEONHOLE band join (radius 5 → 6 disjoint 10-bit bands),
    * provably LOSSLESS like q229 — so the clustering is an exact
    * function of the corpus, and the brute-force oracle hash-verifies
    * it: roles and labels, not just counts.
    *
    * Semantics (deterministic by construction): core = ≥ 2 neighbors
    * within radius; clusters = connected components over CORE–CORE
    * eps-edges (label = min core doc_id, the [[connectedComponents]]
    * contract), isolated cores are singleton clusters; border =
    * non-core adjacent to ≥ 1 core, attached to the MIN adjacent
    * core label (classic DBSCAN leaves border assignment
    * scan-order-dependent; the min rule makes it engine-exact);
    * everything else — including docs with no eps-neighbor at all —
    * is noise with a NULL label.
    *
    * Scale shape: fingerprints are one groupBy(doc) with map-side bit
    * tallies; the band join shuffles 6 (band, 10-bit key, id, sh)
    * rows per doc; degrees/roles are id-only aggregates; the CC
    * iteration runs on the CORE subgraph only (≪ corpus — density
    * pruning shrinks the graph before the iterative stage, the
    * reverse of q59 which iterates on every matched pair). Band-value
    * heat at corpus scale is the q129 salting case.
    */
  /** The eps-neighborhood pairs of the q255 metric space: band
    * equi-join on (band, 20-bit band value) over the 120-bit shingle
    * simhash — lossless for Hamming ≤ [[DbRadius]] by pigeonhole —
    * then the exact two-word distance predicate. Bands 0-2 cut `w0`,
    * 3-5 cut `w1`.
    */
  private[ext] def dbscanEpsPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingleSimhash120Frame(spark, dir)
    val banded = sh.select(col("doc_id"), col("w0"), col("w1"),
        explode(array((0 until DbBands).map(lit(_)): _*)).as("band"))
      .withColumn("bv",
        when(col("band") < DbBands / 2,
          expr(s"shiftright(w0, band * $DbBandBits)"))
          .otherwise(expr(s"shiftright(w1, (band - ${DbBands / 2}) * $DbBandBits)"))
          .bitwiseAND(lit((1L << DbBandBits) - 1)))
    banded.select(col("band"), col("bv"),
        col("doc_id").as("a_id"), col("w0").as("a_w0"), col("w1").as("a_w1"))
      .join(banded.select(col("band"), col("bv"),
        col("doc_id").as("b_id"), col("w0").as("b_w0"), col("w1").as("b_w1")),
        Seq("band", "bv"))
      .filter(col("a_id") < col("b_id"))
      .filter(expr("bit_count(a_w0 ^ b_w0) + bit_count(a_w1 ^ b_w1)") <= DbRadius)
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  private def q255(spark: SparkSession, dir: String): DataFrame = {
    val pairs = dbscanEpsPairs(spark, dir)
      .localCheckpoint() // feeds degrees, core edges, and border attach
    dbscanFromPairs(Tables.documents(spark, dir).select(col("doc_id")), pairs)
  }

  /** The DBSCAN role/label derivation given the eps-pairs — factored
    * out so DbscanSpec can drive a PLANTED pair graph through the
    * exact production path (the driver corpus has no border docs at
    * sf0.01, so the attach logic needs a fixture to be exercised
    * everywhere). `docs` carries one `doc_id` per point; `pairs`
    * must be (a_id < b_id) distinct eps-edges, pre-checkpointed by
    * the caller when they feed multiple consumers.
    */
  private[ext] def dbscanFromPairs(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val nbrs = pairs.select(explode(array(
        struct(col("a_id").as("id"), col("b_id").as("nb")),
        struct(col("b_id").as("id"), col("a_id").as("nb")))).as("e"))
      .select(col("e.id").as("id"), col("e.nb").as("nb"))
    val deg = nbrs.groupBy(col("id")).agg(count(lit(1)).as("n_neighbors"))
    val core = deg.filter(col("n_neighbors") >= DbMinNbrs).select(col("id"))
    val coreEdges = pairs
      .join(core.select(col("id").as("a_id")), "a_id")
      .join(core.select(col("id").as("b_id")), "b_id")
    val comp = connectedComponents(coreEdges)
    val coreClusters = core
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("cluster_id"))
    val borderAssign = nbrs
      .join(coreClusters.select(col("id").as("nb"), col("cluster_id")), "nb")
      .join(core.withColumn("is_core", lit(1)), Seq("id"), "left")
      .filter(col("is_core").isNull)
      .groupBy(col("id")).agg(min(col("cluster_id")).as("cluster_id"))
    docs
      .join(deg.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .join(coreClusters.select(col("id").as("doc_id"), col("cluster_id").as("core_cl")),
        Seq("doc_id"), "left")
      .join(borderAssign.select(col("id").as("doc_id"), col("cluster_id").as("border_cl")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        when(col("core_cl").isNotNull, lit("core"))
          .when(col("border_cl").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("core_cl"), col("border_cl")).as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  private val q255Sql =
    s"""WITH RECURSIVE
       |${Dedup.shingleSimhash120Cte},
       |p AS MATERIALIZED (SELECT a.doc_id AS a_id, b2.doc_id AS b_id
       |      FROM s120 a JOIN s120 b2 ON a.doc_id < b2.doc_id
       |      WHERE bit_count(xor(a.w0, b2.w0)) + bit_count(xor(a.w1, b2.w1)) <= $DbRadius),
       |nb AS (SELECT a_id AS id, b_id AS nb FROM p
       |       UNION ALL SELECT b_id, a_id FROM p),
       |deg AS (SELECT id, COUNT(*) AS n FROM nb GROUP BY id),
       |core AS (SELECT id FROM deg WHERE n >= $DbMinNbrs),
       |ce AS (SELECT a_id AS u, b_id AS v FROM p
       |       WHERE a_id IN (SELECT id FROM core) AND b_id IN (SELECT id FROM core)),
       |sym AS (SELECT u, v FROM ce UNION ALL SELECT v, u FROM ce),
       |reach AS (
       |  SELECT u AS id, u AS comp FROM sym
       |  UNION
       |  SELECT sy.v AS id, r.comp FROM reach r JOIN sym sy ON sy.u = r.id),
       |mp AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
       |cl AS (SELECT c.id, COALESCE(mp.comp, c.id) AS cluster_id
       |       FROM core c LEFT JOIN mp ON c.id = mp.id),
       |bo AS (SELECT nb.id, MIN(cl.cluster_id) AS cluster_id
       |       FROM nb JOIN cl ON nb.nb = cl.id
       |       WHERE nb.id NOT IN (SELECT id FROM core)
       |       GROUP BY nb.id)
       |SELECT d.doc_id,
       |       CAST(COALESCE(deg.n, 0) AS BIGINT) AS n_neighbors,
       |       CASE WHEN cl.id IS NOT NULL THEN 'core'
       |            WHEN bo.id IS NOT NULL THEN 'border'
       |            ELSE 'noise' END AS role,
       |       CAST(COALESCE(cl.cluster_id, bo.cluster_id) AS BIGINT) AS cluster_id
       |FROM documents d
       |LEFT JOIN deg ON d.doc_id = deg.id
       |LEFT JOIN cl ON d.doc_id = cl.id
       |LEFT JOIN bo ON d.doc_id = bo.id
       |ORDER BY d.doc_id""".stripMargin

  /** q259 — DBSCAN BLOCKING POWER, measured (the q138 move applied to
    * q255's eps-neighborhood join): for the round-9 geometry (radius
    * 5 over the 120-bit shingle simhash, 6×20-bit bands) AND the
    * retired round-8 geometry (radius 5 over the 60-bit word simhash,
    * 6×10-bit bands), count the DISTINCT band-collision candidate
    * pairs, the true eps-pairs among them, and the candidate fraction
    * of the full pair space in ppm — so the blocking-power claim in
    * q255's scaladoc is a hash-gated FACT of the corpus, not prose.
    * Expected shape (sf0.1 probe): word60 ≈ 137,000 ppm of the pair
    * space — the quadratic band-value blow-up — vs shingle120 ≈ 23
    * ppm, a ~6,000× reduction from the same radius by spending
    * fingerprint width and feature entropy where the bands need it.
    *
    * Scale shape: each geometry is one band equi-join (6 rows/doc
    * through the shuffle) + one distinct + one 1-row aggregate; the
    * doc count for the pair-space denominator is a bounded driver
    * scalar (the q96 class). Both engines compute identical integers,
    * so the ppm readout hash-matches exactly.
    */
  private def q259(spark: SparkSession, dir: String): DataFrame = {
    val nDocs = Tables.documents(spark, dir).count() // bounded: one scalar
    val space = nDocs * (nDocs - 1) / 2

    def geometryRow(name: String, nBands: Int, bandBits: Int,
        pairsWithDist: DataFrame): DataFrame =
      pairsWithDist.distinct()
        .agg(count(lit(1)).as("candidate_pairs"),
          coalesce(sum(when(col("dist") <= DbRadius, 1L)), lit(0L)).as("eps_pairs"))
        .select(lit(name).as("geometry"),
          lit(nBands).as("n_bands"), lit(bandBits).as("band_bits"),
          col("candidate_pairs"), col("eps_pairs"),
          lit(space).as("pair_space"),
          expr(s"candidate_pairs * 1000000 DIV ${space}L").as("cand_ppm"))

    val s120 = Dedup.shingleSimhash120Frame(spark, dir)
    val banded120 = s120.select(col("doc_id"), col("w0"), col("w1"),
        explode(array((0 until DbBands).map(lit(_)): _*)).as("band"))
      .withColumn("bv",
        when(col("band") < DbBands / 2,
          expr(s"shiftright(w0, band * $DbBandBits)"))
          .otherwise(expr(s"shiftright(w1, (band - ${DbBands / 2}) * $DbBandBits)"))
          .bitwiseAND(lit((1L << DbBandBits) - 1)))
    val cand120 = banded120.select(col("band"), col("bv"),
        col("doc_id").as("a_id"), col("w0").as("a_w0"), col("w1").as("a_w1"))
      .join(banded120.select(col("band"), col("bv"),
        col("doc_id").as("b_id"), col("w0").as("b_w0"), col("w1").as("b_w1")),
        Seq("band", "bv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("bit_count(a_w0 ^ b_w0) + bit_count(a_w1 ^ b_w1)").as("dist"))

    val s60 = Dedup.simhash60Frame(spark, dir)
    val banded60 = s60.select(col("doc_id"), col("sh"),
        explode(array((0 until 6).map(lit(_)): _*)).as("band"))
      .withColumn("bv", expr("shiftright(sh, band * 10)")
        .bitwiseAND(lit((1L << 10) - 1)))
    val cand60 = banded60.select(col("band"), col("bv"),
        col("doc_id").as("a_id"), col("sh").as("a_sh"))
      .join(banded60.select(col("band"), col("bv"),
        col("doc_id").as("b_id"), col("sh").as("b_sh")), Seq("band", "bv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), expr("bit_count(a_sh ^ b_sh)").as("dist"))

    geometryRow("shingle120_6x20", DbBands, DbBandBits, cand120)
      .unionAll(geometryRow("word60_6x10", 6, 10, cand60))
      .orderBy(col("geometry"))
  }

  private val q259Sql =
    s"""WITH
       |${Dedup.shingleSimhash120Cte},
       |b120 AS MATERIALIZED (SELECT doc_id, band,
       |                (CASE WHEN band < 3 THEN w0 >> (band * 20)
       |                      ELSE w1 >> ((band - 3) * 20) END) & 1048575 AS bv,
       |                w0, w1
       |         FROM s120 CROSS JOIN (SELECT unnest(range(0, 6)) AS band) bs),
       |c120 AS MATERIALIZED (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |                bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) AS dist
       |         FROM b120 a JOIN b120 b
       |           ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
       |ww AS (SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM documents),
       |wh AS (SELECT doc_id, ('0x' || substr(md5(wd), 1, 15))::BIGINT AS h FROM ww),
       |wbt AS (SELECT doc_id, j,
       |               SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |        FROM wh CROSS JOIN (SELECT unnest(range(0, 60)) AS j) bits
       |        GROUP BY doc_id, j),
       |s60 AS MATERIALIZED (SELECT doc_id,
       |               CAST(SUM(CASE WHEN v > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS sh
       |        FROM wbt GROUP BY doc_id),
       |b60 AS MATERIALIZED (SELECT doc_id, band, (sh >> (band * 10)) & 1023 AS bv, sh
       |        FROM s60 CROSS JOIN (SELECT unnest(range(0, 6)) AS band) bs),
       |c60 AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |               bit_count(xor(a.sh, b.sh)) AS dist
       |        FROM b60 a JOIN b60 b
       |          ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
       |sp AS (SELECT COUNT(*) * (COUNT(*) - 1) // 2 AS space FROM documents)
       |SELECT * FROM (
       |  SELECT 'shingle120_6x20' AS geometry, 6 AS n_bands, 20 AS band_bits,
       |         CAST(COUNT(*) AS BIGINT) AS candidate_pairs,
       |         CAST(COALESCE(SUM(CASE WHEN dist <= $DbRadius THEN 1 ELSE 0 END), 0) AS BIGINT) AS eps_pairs,
       |         CAST((SELECT space FROM sp) AS BIGINT) AS pair_space,
       |         CAST(COUNT(*) * 1000000 // (SELECT space FROM sp) AS BIGINT) AS cand_ppm
       |  FROM c120
       |  UNION ALL
       |  SELECT 'word60_6x10', 6, 10,
       |         CAST(COUNT(*) AS BIGINT),
       |         CAST(COALESCE(SUM(CASE WHEN dist <= $DbRadius THEN 1 ELSE 0 END), 0) AS BIGINT),
       |         CAST((SELECT space FROM sp) AS BIGINT),
       |         CAST(COUNT(*) * 1000000 // (SELECT space FROM sp) AS BIGINT)
       |  FROM c60)
       |ORDER BY geometry""".stripMargin

  /** The q260 incremental-update algebra, factored for the planted
    * spec (no batch doc bridges two corpus clusters in the driver
    * corpus at any SF — probed — so the MERGE path needs a fixture):
    * given the materialized corpus assignment and the batch-touching
    * edges only, produce the updated assignment for every doc.
    *
    * The update runs on the QUOTIENT graph: nodes are batch docs
    * plus touched corpus CLUSTER LABELS (never corpus docs — the
    * state already collapsed those), edges are batch-batch pairs
    * plus batch→cluster-label mappings of the batch-corpus pairs.
    * Because a cluster's label IS its min member id, the min label
    * of a merged quotient component equals the min doc_id of the
    * merged member set — so relabeling through the quotient is EXACT
    * (incremental ≡ from-scratch, which is what the q260 oracle then
    * hash-proves corpus-wide).
    */
  private[ext] def incrementalClusters(
      corpusAssign: DataFrame, // (doc_id, comp_id) — the materialized state
      batchDocs: DataFrame,    // (doc_id)
      bbPairs: DataFrame,      // (a_id, b_id) batch-batch eps/jaccard pairs
      bcPairs: DataFrame       // (batch_id, corpus_id) cross pairs
  ): DataFrame = {
    val bcQuotient = bcPairs
      .join(corpusAssign.select(col("doc_id").as("corpus_id"), col("comp_id")), "corpus_id")
      .select(col("batch_id").as("a_id"), col("comp_id").as("b_id"))
    val quotient = connectedComponents(
      bbPairs.select(col("a_id"), col("b_id")).unionAll(bcQuotient))
    val batchAssign = batchDocs
      .join(quotient, col("doc_id") === col("id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp_id"),
        lit("batch").as("origin"))
    val corpusNew = corpusAssign
      .join(quotient, col("comp_id") === col("id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("comp_id")).as("comp_id"),
        lit("corpus").as("origin"))
    corpusNew.unionAll(batchAssign)
  }

  /** q260 — INCREMENTAL DUP-CLUSTER MAINTENANCE: the q80 incremental
    * discipline applied to the CLUSTER surface (q59/q82). An ingest
    * batch (the q58 md5 split, bucket ≥ 90) arrives against a corpus
    * whose near-dup cluster assignment is already materialized; the
    * update touches ONLY batch-keyed pairs — batch-batch and
    * batch-corpus edges (in production the corpus side is served by
    * the pre-materialized shingle index, the q80 move) — and runs CC
    * on the [[incrementalClusters]] quotient graph, whose size is
    * bounded by the BATCH degree, not the corpus. Corpus docs
    * relabel through their old cluster label; comp_size recounts
    * over the updated assignment.
    *
    * THE ORACLE IS THE FULL FROM-SCRATCH RECOMPUTE (q59's closure
    * over all pairs, plus the origin flag) — so the hash gate proves
    * incremental ≡ scratch on the whole corpus, the defining
    * correctness bar for incremental view maintenance (the q133
    * convention). The shared [[Dedup.jaccardPairs]] generator feeds
    * both the state build and the increment, keeping the oracle
    * exact; the demonstration is the update ALGEBRA — CC's
    * associativity lets the corpus-corpus pairs be collapsed into
    * state first, then extended by the batch without revisiting them.
    */
  private def q260(spark: SparkSession, dir: String): DataFrame = {
    val bucket = graft.ext.TrainPrep.md5Bucket(col("doc_id"), 100)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), (bucket >= 90).as("is_batch"))
      .localCheckpoint() // feeds the split twice + the final join
    val pairs = Dedup.materializedPairs(spark, dir).select(col("a_id"), col("b_id"))
      .join(docs.select(col("doc_id").as("a_id"), col("is_batch").as("a_batch")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("is_batch").as("b_batch")), "b_id")
      .localCheckpoint() // consumed by three disjoint filters
    // the materialized state: CC over corpus-corpus pairs only
    val corpusAssign = docs.filter(!col("is_batch")).select(col("doc_id"))
      .join(connectedComponents(
        pairs.filter(!col("a_batch") && !col("b_batch")).select(col("a_id"), col("b_id"))),
        col("doc_id") === col("id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp_id"))
    val bb = pairs.filter(col("a_batch") && col("b_batch")).select(col("a_id"), col("b_id"))
    val bc = pairs.filter(col("a_batch") =!= col("b_batch"))
      .select(when(col("a_batch"), col("a_id")).otherwise(col("b_id")).as("batch_id"),
        when(col("a_batch"), col("b_id")).otherwise(col("a_id")).as("corpus_id"))
    incrementalClusters(corpusAssign, docs.filter(col("is_batch")).select(col("doc_id")),
        bb, bc)
      .withColumn("comp_size", count(lit(1)).over(Window.partitionBy(col("comp_id"))))
      .select(col("doc_id"), col("comp_id"), col("comp_size"), col("origin"))
      .orderBy(col("doc_id"))
  }

  /** DELETE update for the maintained cluster assignment — the
    * NON-ABELIAN case of the incremental family (q271's IVF cells and
    * q273's BM25 summaries subtract algebraically; connectivity does
    * not: removing a doc can SPLIT its component). The locality that
    * replaces algebra: a delete only ever affects components that
    * CONTAIN a doomed doc — every edge it removes is incident to a
    * doomed doc, so components without one keep their exact member
    * set, edges, label (min member, still alive), and size. The
    * update is therefore:
    *
    *   1. touched components = the doomed ids' labels (batch-keyed
    *      point lookups against the assignment);
    *   2. KEPT: every row of an untouched component is carried BY
    *      REFERENCE — label and size unchanged (the q263/q267
    *      discipline);
    *   3. RELABELED: CC re-runs on the pair subgraph induced on the
    *      touched components' SURVIVING members only (served from the
    *      maintained pair table — no re-shingling), labels = min
    *      surviving member, sizes recounted within this bounded set.
    *
    * Cost is O(batch + touched components), never the corpus; the
    * localized CC equals the global survivors-only CC because no
    * verified pair crosses components. The `origin` column tags
    * kept vs relabeled rows for the spec; q276 drops it.
    */
  private[ext] def deleteFromClusters(corpusAssign: DataFrame,
      doomedDocs: DataFrame, pairs: DataFrame): DataFrame = {
    val touched = corpusAssign
      .join(doomedDocs, Seq("doc_id"), "leftsemi")
      .select(col("comp_id")).distinct()
    val kept = corpusAssign.join(touched, Seq("comp_id"), "left_anti")
      .select(col("doc_id"), col("comp_id"), col("comp_size"),
        lit("kept").as("origin"))
    val survivors = corpusAssign.join(touched, Seq("comp_id"), "leftsemi")
      .join(doomedDocs, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
      .localCheckpoint(false) // feeds both edge semi-joins + relabel
    val sub = pairs
      .join(survivors.select(col("doc_id").as("a_id")), Seq("a_id"), "leftsemi")
      .join(survivors.select(col("doc_id").as("b_id")), Seq("b_id"), "leftsemi")
      .select(col("a_id"), col("b_id"))
    val rec = connectedComponents(sub)
    val relabeled = survivors
      .join(rec, col("doc_id") === col("id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp_id"))
    val sizes = relabeled.groupBy(col("comp_id")).agg(count(lit(1)).as("comp_size"))
    kept.unionByName(relabeled.join(sizes, "comp_id")
      .select(col("doc_id"), col("comp_id"), col("comp_size"),
        lit("relabeled").as("origin")))
  }

  /** q276 — DUP-CLUSTER DELETE MAINTENANCE (oracle-gated): the
    * materialized q59 assignment takes a delete of the md5
    * bucket ≥ 90 docs and updates through [[deleteFromClusters]] —
    * the component-splitting case the append path (q260) never
    * faces. THE ORACLE IS THE FROM-SCRATCH CLOSURE OVER THE
    * SURVIVORS ONLY (q59's reach CTE on the survivor-filtered pair
    * set), so the hash gate proves localized-recompute ≡
    * survivors-rebuild tri-SF, including every split's new labels
    * and sizes. ClusterDeleteSpec pins the split itself on a planted
    * chain (deleting the middle doc must break one cluster into two)
    * and that untouched clusters ride through as `kept` rows.
    */
  private def q276(spark: SparkSession, dir: String): DataFrame = {
    val doomed = Tables.documents(spark, dir)
      .filter(graft.ext.TrainPrep.md5Bucket(col("doc_id"), 100) >= 90)
      .select(col("doc_id"))
    val pairs = Dedup.materializedPairs(spark, dir).select(col("a_id"), col("b_id"))
    deleteFromClusters(assignments(spark, dir), doomed, pairs)
      .select(col("doc_id"), col("comp_id"), col("comp_size"))
      .orderBy(col("doc_id"))
  }

  private val q276Sql =
    s"""WITH RECURSIVE ${Dedup.jaccardScoredCte},
       |pairs AS (
       |  SELECT a_id, b_id FROM scored
       |  WHERE inter / (na + nb - inter) >= 0.5),
       |surv AS MATERIALIZED (
       |  SELECT doc_id FROM documents
       |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90),
       |sp AS (
       |  SELECT p.a_id, p.b_id FROM pairs p
       |  JOIN surv sa ON sa.doc_id = p.a_id
       |  JOIN surv sb ON sb.doc_id = p.b_id),
       |sym AS (SELECT a_id AS u, b_id AS v FROM sp
       |        UNION ALL SELECT b_id, a_id FROM sp),
       |reach AS (
       |  SELECT u AS id, u AS comp FROM sym
       |  UNION
       |  SELECT s.v AS id, r.comp FROM reach r JOIN sym s ON s.u = r.id),
       |comp AS (SELECT id, MIN(comp) AS comp_id FROM reach GROUP BY id),
       |asg AS (
       |  SELECT s.doc_id, COALESCE(c.comp_id, s.doc_id) AS comp_id
       |  FROM surv s LEFT JOIN comp c ON s.doc_id = c.id)
       |SELECT doc_id, comp_id,
       |       CAST(COUNT(*) OVER (PARTITION BY comp_id) AS BIGINT) AS comp_size
       |FROM asg ORDER BY doc_id""".stripMargin

  private val q260Sql =
    s"""WITH RECURSIVE ${Dedup.jaccardScoredCte},
       |pairs AS (
       |  SELECT a_id, b_id FROM scored
       |  WHERE inter / (na + nb - inter) >= 0.5),
       |sym AS (SELECT a_id AS u, b_id AS v FROM pairs
       |        UNION ALL SELECT b_id, a_id FROM pairs),
       |reach AS (
       |  SELECT u AS id, u AS comp FROM sym
       |  UNION
       |  SELECT s.v AS id, r.comp FROM reach r JOIN sym s ON s.u = r.id),
       |comp AS (SELECT id, MIN(comp) AS comp_id FROM reach GROUP BY id),
       |asg AS (
       |  SELECT d.doc_id, COALESCE(c.comp_id, d.doc_id) AS comp_id
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
       |SELECT doc_id, comp_id,
       |       CAST(COUNT(*) OVER (PARTITION BY comp_id) AS BIGINT) AS comp_size,
       |       CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 >= 90
       |            THEN 'batch' ELSE 'corpus' END AS origin
       |FROM asg ORDER BY doc_id""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q255_dbscan_clusters", q255, Some(q255Sql)),
    QuerySpec("q259_dbscan_blocking_power", q259, Some(q259Sql)),
    QuerySpec("q260_incremental_dup_clusters", q260, Some(q260Sql)),
    QuerySpec("q276_cluster_delete_maintenance", q276, Some(q276Sql)),
    QuerySpec("q213_kcore", q213, Some(q213Sql)),
    QuerySpec("q209_shortest_paths", q209, Some(q209Sql)),
    QuerySpec("q196_bfs_contamination_radius", q196, Some(q196Sql)),
    QuerySpec("q194_survivorship", q194, Some(q194Sql)),
    QuerySpec("q59_dup_clusters", q59, Some(q59Sql), headline = true),
    QuerySpec("q82_dedup_corpus", q82, Some(q82Sql)),
    QuerySpec("q91_dup_clusters_star", q91, Some(q59Sql)),
    QuerySpec("q116_neardup_contamination", q116, Some(q116Sql)),
    QuerySpec("q142_pagerank_hubs", q142, Some(q142Sql)),
    QuerySpec("q143_triangle_count", q143, Some(q143Sql)),
    QuerySpec("q241_modularity", q241, Some(q241Sql)),
    QuerySpec("q254_boruvka_mst", q254, Some(q254Sql)),
  )
}

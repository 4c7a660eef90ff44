package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[DupGraph.deleteFromClusters]] on a planted state where the
  * component-SPLITTING case — the reason cluster deletes cannot be
  * algebraic — is forced: a 3-doc chain cluster loses its middle doc
  * and must break into two singletons with fresh labels and sizes,
  * while an untouched pair cluster and an untouched singleton ride
  * through as `kept` rows (carried by reference, never recomputed).
  * The real-corpus localized-recompute ≡ survivors-rebuild identity
  * is pinned by q276's tri-SF DuckDB oracle gate.
  */
class ClusterDeleteSpec extends SparkSpec {

  test("deleting a chain's middle doc splits its cluster; untouched clusters are kept") {
    import spark.implicits._
    val assign = Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), // chain cluster {1,2,3}
      (10L, 10L, 2L), (11L, 10L, 2L),           // pair cluster {10,11}
      (20L, 20L, 1L))                            // singleton {20}
      .toDF("doc_id", "comp_id", "comp_size")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val doomed = Seq(2L).toDF("doc_id")
    val got = DupGraph.deleteFromClusters(assign, doomed, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == Set(
      (1L, 1L, 1L, "relabeled"),   // split: 1 is now its own cluster
      (3L, 3L, 1L, "relabeled"),   // split: 3 gets a FRESH label
      (10L, 10L, 2L, "kept"),      // untouched cluster carried by reference
      (11L, 10L, 2L, "kept"),
      (20L, 20L, 1L, "kept")),
      s"unexpected post-delete state: $got")
  }

  test("deleting one member of a pair leaves a relabeled survivor singleton") {
    import spark.implicits._
    val assign = Seq((10L, 10L, 2L), (11L, 10L, 2L), (20L, 20L, 1L))
      .toDF("doc_id", "comp_id", "comp_size")
    val pairs = Seq((10L, 11L)).toDF("a_id", "b_id")
    val doomed = Seq(10L).toDF("doc_id")
    val got = DupGraph.deleteFromClusters(assign, doomed, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == Set(
      (11L, 11L, 1L, "relabeled"), // survivor relabels to its own id
      (20L, 20L, 1L, "kept")),
      s"unexpected post-delete state: $got")
  }
}

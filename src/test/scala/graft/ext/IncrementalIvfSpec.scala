package graft.ext

import graft.{SparkEntry, SparkSpec}

/** q262: incremental IVF cell maintenance must be non-vacuous (the
  * batch actually lands members in existing cells) and internally
  * consistent; the merge ≡ scratch identity itself is what the
  * DuckDB oracle hash-proves (the oracle assigns ALL vectors in one
  * pass against the same frozen centroids). Here we pin the
  * invariants the hash gate can't phrase: conservation of members
  * across cells, batch fraction matching the md5 split, and
  * determinism across runs.
  */
class IncrementalIvfSpec extends SparkSpec {

  test("q262: member conservation, real batch contribution, determinism") {
    val run1 = SparkEntry.queries("q262_incremental_ivf")(spark, sf).collect()
    val nVecs = graft.Tables.embeddings(spark, sf).count()
    // every vector lands in exactly one cell
    assert(run1.map(_.getLong(1)).sum == nVecs,
      s"cells hold ${run1.map(_.getLong(1)).sum} of $nVecs vectors")
    // the batch split contributed, and only to cells it belongs to
    val added = run1.map(_.getLong(2)).sum
    assert(added > 0, "no batch vectors — the increment is vacuous")
    assert(run1.forall(r => r.getLong(2) <= r.getLong(1)))
    // ~10% md5 split (loose: small-N binomial)
    assert(added < nVecs / 4, s"batch fraction implausible: $added of $nVecs")
    // at least one cell MIXES state and batch members — the actual
    // merge case (not all-batch cells appearing fresh)
    assert(run1.exists(r => r.getLong(2) > 0 && r.getLong(2) < r.getLong(1)),
      "no cell mixes corpus and batch members")
    val run2 = SparkEntry.queries("q262_incremental_ivf")(spark, sf).collect()
    assert(run1.map(_.toString).toSeq == run2.map(_.toString).toSeq, "nondeterministic")
  }

  test("q271: subtractive delete conserves members and really deletes from mixed cells") {
    val rows = SparkEntry.queries("q271_ivf_delete_maintenance")(spark, sf).collect()
    val nVecs = graft.Tables.embeddings(spark, sf).count()
    val (members, added, deleted) = (rows.map(_.getLong(1)).sum,
      rows.map(_.getLong(2)).sum, rows.map(_.getLong(3)).sum)
    // survivors + deleted account for every vector exactly once
    assert(members + deleted == nVecs,
      s"$members surviving + $deleted deleted != $nVecs vectors")
    assert(deleted > 0, "no deletions — the subtract path is vacuous")
    assert(added > 0 && rows.forall(r => r.getLong(2) <= r.getLong(1)))
    // the delete batch must hit a cell that also KEEPS members —
    // the genuine subtract-from-state case, not a whole-cell drop
    assert(rows.exists(r => r.getLong(3) > 0 && r.getLong(1) > 0),
      "no cell mixes surviving and deleted members")
  }

  test("q264: the streaming per-trigger fold lands on exactly q262's one-shot merge") {
    // fold(triggers) == merge(batch) because cell sums are
    // associative+commutative and assignment against FROZEN
    // centroids is per-vector independent; both also hash-match the
    // from-scratch oracle, but the in-engine equality pins it
    // without the oracle in the loop
    val oneShot = SparkEntry.queries("q262_incremental_ivf")(spark, sf).collect()
    val folded = SparkEntry.queries("q264_stream_ivf_maintenance")(spark, sf).collect()
    assert(folded.map(_.toString).toSeq == oneShot.map(_.toString).toSeq,
      "streaming fold diverged from the one-shot merge")
  }
}

package graft.query

import graft.{SparkEntry, SparkSpec}

/** q221: scala recompute of the integer power iteration, plus the
  * structural facts the truncation contract leans on — the chain is
  * CLOSED (every destination type is also a source) and the iterate
  * has actually REACHED its fixpoint by the round budget.
  */
class MarkovSpec extends SparkSpec {

  test("q221: stationary iterate matches recompute; fixpoint reached; chain closed") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._3.getTime, r._3.getNanos, r._4)).map(_._2)
      sorted.zip(sorted.tail)
    }.toSeq
    val cnt = pairs.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val rowtot = cnt.groupBy(_._1._1).map { case (s, xs) => s -> xs.values.sum }
    val states = rowtot.keySet
    // closure: a destination that is never a source would swallow mass
    assert(cnt.keySet.map(_._2).subsetOf(states), "chain not closed")
    def step(v: Map[String, Long]): Map[String, Long] =
      cnt.toSeq.groupBy(_._1._2).map { case (j, entries) =>
        j -> entries.map { case ((i, _), c) =>
          (BigInt(v.getOrElse(i, 0L)) * c / rowtot(i)).toLong
        }.sum
      }
    var v = states.map(_ -> 1000000000000L / states.size).toMap
    for (_ <- 1 to 16) v = step(v)
    // truncating rounds never settle exactly (each loses O(m) units at
    // 10^12 scale, jittering by a few units forever); the contract is
    // convergence at the OUTPUT resolution: one more round must not
    // move any ppm readout
    assert(step(v).map { case (k, p) => k -> p / 1000000L } ==
      v.map { case (k, p) => k -> p / 1000000L },
      "round 17 moves the ppm readout - fixpoint NOT reached in budget")
    val total = ev.length.toLong
    val got = SparkEntry.queries("q221_markov_stationary")(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == states)
    got.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == v(t) / 1000000L, s"$t stationary")
      val n = ev.count(_._2 == t).toLong
      assert(r.getLong(2) == n && r.getLong(3) == n * 1000000L / total)
      assert(r.getLong(4) == math.abs(v(t) / 1000000L - n * 1000000L / total))
    }
  }
}

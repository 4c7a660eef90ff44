package graft.scale

import graft.{SparkEntry, SparkSpec}

/** Ad-hoc plan audit (kept as a spec so it runs in CI): the q20 star
  * join must broadcast every dimension side — a sort-merge join on
  * part/supplier would shuffle the 600k-row fact once per dim.
  */
class PlanAuditSpec extends SparkSpec {
  test("q20 broadcasts all dimension joins (no SMJ on dims)") {
    val plan = SparkEntry.queries("q20_star_denorm")(spark, sf)
      .queryExecution.executedPlan.toString
    val smjCount = "SortMergeJoin".r.findAllIn(plan).length
    // lineitem⋈orders is the one legitimate fact-to-fact shuffle join
    assert(smjCount <= 1, s"$smjCount SortMergeJoins in q20:\n$plan")
  }
}

package graft.scale

import graft.SparkSpec

/** q242: the recurrence must BE a Hilbert curve (exhaustive order-3
  * proof: bijection + unit-step adjacency), and the measured layout
  * comparison must show Hilbert's locality win in total.
  */
class HilbertLayoutSpec extends SparkSpec {

  test("order-3 curve is a bijection with unit-step adjacency") {
    val n = 8
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (graft.functions.HilbertIndex.computeAtOrder(3, x, y), (x, y))
    val ds = cells.map(_._1)
    assert(ds.sorted == (0L until (n * n).toLong), "d must be a bijection onto 0..63")
    val byD = cells.sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"consecutive curve cells must be grid neighbors: ($x1,$y1)->($x2,$y2)")
    case _ => ()
    }
  }

  test("q242: Hilbert touches strictly fewer files in total than Z-order") {
    val out = graft.SparkEntry.queries("q242_hilbert_layout")(spark, sf).collect()
    assert(out.length == 4)
    val z = out.map(_.getAs[Long]("files_z")).sum
    val h = out.map(_.getAs[Long]("files_h")).sum
    assert(h < z, s"expected Hilbert total < Z total, got h=$h z=$z")
    // native expression == driver recompute on the real cells
    graft.GraftExtensions.register(spark)
    val sample = graft.Tables.lineitem(spark, sf)
      .selectExpr("l_partkey", "l_suppkey").distinct().limit(200).collect()
    sample.foreach { r =>
      val (p, s2) = (r.getLong(0), r.getLong(1))
      val viaSql = spark.sql(s"SELECT hilbert_index(${p}L, ${s2}L) v").collect().head.getLong(0)
      assert(viaSql == graft.functions.HilbertIndex.compute(p, s2))
    }
  }
}

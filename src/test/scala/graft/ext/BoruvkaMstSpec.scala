package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q254: the composite key makes edge weights unique, so the MST is
  * UNIQUE — the engine's Borůvka rounds must produce exactly the
  * edge set of a driver-side Kruskal (different algorithm, same
  * tree), and that set must be a spanning tree.
  */
class BoruvkaMstSpec extends SparkSpec {

  test("q254: Boruvka == Kruskal on the unique-weight graph; result spans") {
    val out = graft.SparkEntry.queries("q254_boruvka_mst")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))

    // rebuild the weighted graph on the driver
    val sh = graft.Tables.documents(spark, sf)
      .select(col("source"), explode(Dedup.shingles(col("text"))).as("g"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val bySrc = sh.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sources = bySrc.keys.toSeq.sorted
    val nodeOf = sources.zipWithIndex.toMap
    val edges = (for {
      i <- sources.indices; j <- i + 1 until sources.length
      a = bySrc(sources(i)); b = bySrc(sources(j))
      inter = (a & b).size.toLong
      w = 1000000L - (1000000L * inter) / (a.size + b.size - inter)
      u = nodeOf(sources(i)).toLong; v = nodeOf(sources(j)).toLong
    } yield (w * 1000000 + u * 1000 + v, u, v, w, sources(i), sources(j)))
      .sortBy(_._1)

    // Kruskal with union-find
    val parent = collection.mutable.ArrayBuffer.range(0, sources.length)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    val kruskal = edges.flatMap { case (_, u, v, w, sa, sb) =>
      val (ru, rv) = (find(u.toInt), find(v.toInt))
      if (ru == rv) None else { parent(ru) = rv; Some((sa, sb, w)) }
    }
    assert(kruskal.length == sources.length - 1)
    assert(out.length == sources.length - 1, "MST must have n-1 edges")
    assert(out.map(t => (t._1, t._2, t._3)).toSet == kruskal.toSet,
      "Boruvka and Kruskal must agree on the unique MST")

    // spanning: one component over the MST edges
    val p2 = collection.mutable.ArrayBuffer.range(0, sources.length)
    def find2(x: Int): Int = { var r = x; while (p2(r) != r) r = p2(r); r }
    out.foreach { case (a, b, _, _) => p2(find2(nodeOf(a))) = find2(nodeOf(b)) }
    assert(sources.indices.map(find2).distinct.length == 1, "MST must span all sources")
  }
}

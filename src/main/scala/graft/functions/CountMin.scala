package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Engine-portable count-min sketch (Cormode & Muthukrishnan, "An
  * improved data stream summary: the count-min sketch", J.Alg. 2005)
  * over the same md5-halves double hashing as [[Bloom64]]: row r
  * probes position `(h1 + r·h2) mod width` (Kirsch-Mitzenmacher
  * family derivation). Because the hash family and the counter
  * arithmetic are engine-identical integer math, the entire counter
  * matrix — and therefore every frequency estimate — is reproducible
  * relationally outside Spark, which is what lets the q99 oracle
  * re-derive each estimate in DuckDB (per-cell SUMs + MIN over rows).
  * Spark's own CountMinSketch aggregate hashes with murmur internals
  * and can't be cross-checked that way.
  */
object CountMin {

  /** Add `weight` to key (h1,h2)'s cell in every row of the flattened
    * depth×width matrix. floorMod for the same reason as
    * [[Bloom64.set]]: callers may feed arbitrary bigints.
    */
  def add(cells: Array[Long], h1: Long, h2: Long, width: Int, weight: Long): Unit = {
    val depth = cells.length / width
    var r = 0
    while (r < depth) {
      val p = java.lang.Math.floorMod(h1 + r * h2, width.toLong).toInt
      cells(r * width + p) += weight
      r += 1
    }
  }
}

/** Typed aggregator building a depth×width count-min matrix from
  * (h1, h2) key-hash occurrences (weight 1 each). Counter addition is
  * associative/commutative, so partial aggregation and merge are
  * exact at any parallelism: at 100 TB the sketch build is a pure map
  * stage and only `depth·width` longs per partition ever shuffle —
  * the heavy-hitter path that never pays the full token-key shuffle
  * an exact count requires.
  */
case class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], key: (Long, Long)): Array[Long] = {
    CountMin.add(buf, key._1, key._2, width, 1L)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

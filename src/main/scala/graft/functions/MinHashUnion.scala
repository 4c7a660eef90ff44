package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator merging per-document MinHash signatures into a
  * group-level signature by element-wise min — mathematically the
  * signature of the UNION of the groups' shingle sets (min is
  * associative/commutative, so partial aggregation and merge are
  * exact at any parallelism). The corpus-similarity primitive: one
  * pass over documents yields a per-source sketch; pairwise sketch
  * agreement then estimates cross-source Jaccard without ever
  * comparing documents.
  */
object MinHashUnion extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.empty

  private def mergeArrays(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val out = new Array[Long](a.length)
      var i = 0
      while (i < a.length) { out(i) = math.min(a(i), b(i)); i += 1 }
      out
    }

  override def reduce(buf: Array[Long], sig: Array[Long]): Array[Long] =
    mergeArrays(buf, sig)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    mergeArrays(a, b)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

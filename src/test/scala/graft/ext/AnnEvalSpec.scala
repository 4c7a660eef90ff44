package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q211 ANN eval: recall@K and reciprocal ranks recomputed driver-side
  * from first principles — int8 quantization, md5-Rademacher SRP
  * buckets, exact integer dots, the same tie-breaks.
  */
class AnnEvalSpec extends SparkSpec {

  private val K = 10
  private val NumQueries = 5
  private val Tables_ = 6
  private val Planes = 5

  test("recall and reciprocal rank match a full driver recompute") {
    val rows = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val dims = rows.head._2.length
    val mn = (0 until dims).map(p => rows.map(_._2(p)).min)
    val mx = (0 until dims).map(p => rows.map(_._2(p)).max)
    val codes: Map[Long, Array[Long]] = rows.map { case (id, xs) =>
      id -> xs.zipWithIndex.map { case (x, p) =>
        if (mx(p) == mn(p)) 0L
        else math.min(math.max(math.floor((x - mn(p)) * 254.0 / (mx(p) - mn(p))).toLong - 127L,
          -127L), 127L)
      }
    }.toMap
    def md5ParityWeight(t: Int, p: Int, pos: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${t}_${p}_$pos".getBytes("UTF-8"))
      val c = d.map("%02x".format(_)).mkString.charAt(0)
      if (c.toInt % 2 == 0) 1L else -1L
    }
    val buckets: Map[Long, Seq[(Int, Long)]] = codes.map { case (id, cs) =>
      id -> (0 until Tables_).map { t =>
        val b = (0 until Planes).map { p =>
          val proj = (0 until dims).map(pos => cs(pos) * md5ParityWeight(t, p, pos)).sum
          if (proj >= 0) 1L << p else 0L
        }.sum
        (t, b)
      }
    }
    val norms = codes.map { case (id, cs) => id -> cs.map(c => c * c).sum }
    def topK(qid: Long, candidates: Iterable[Long]): Seq[(Long, Int)] =
      candidates.filter(v => v != qid && norms(v) > 0 && norms(qid) > 0).toSeq
        .map { v =>
          val dot = (0 until dims).map(p => codes(qid)(p) * codes(v)(p)).sum
          val cos = dot.toDouble / (math.sqrt(norms(qid).toDouble) * math.sqrt(norms(v).toDouble))
          (v, cos)
        }
        .sortBy { case (v, cos) => (-cos, v) }.take(K).zipWithIndex
        .map { case ((v, _), i) => (v, i + 1) }
    val ids = codes.keySet
    val expected = (0L until NumQueries.toLong).map { qid =>
      val truth = topK(qid, ids)
      val cand = ids.filter(v => v != qid &&
        buckets(v).exists { case (t, b) => buckets(qid).contains((t, b)) })
      val sys = topK(qid, cand).toMap
      val hits = truth.count { case (v, _) => sys.contains(v) }
      val rr = truth.find(_._2 == 1).flatMap(t => sys.get(t._1))
        .map(r => 1000000L / r).getOrElse(0L)
      qid -> (truth.length.toLong, hits.toLong, hits.toLong * 1000000L / K, rr)
    }.toMap
    val got = SparkEntry.queries("q211_ann_eval")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expected)
    // the eval is informative: recall is neither uniformly 0 nor 100%
    // at the shallow demo family (q138 carries the deep-table story)
    assert(got.values.exists(_._3 > 0) && got.values.exists(_._3 < 1000000L))
  }
}

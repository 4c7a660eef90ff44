package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q214 Fellegi–Sunter linkage: the confusion matrix recomputed
  * driver-side from first principles (md5 corruption classes,
  * windowed blocking with ±1 probe, fixed log-odds scoring).
  */
class RecordLinkageSpec extends SparkSpec {

  private def bucket(id: Long, mod: Int, salt: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id$salt".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16) % mod
  }

  test("confusion matrix matches a driver recompute; thresholds are clean") {
    val cust = graft.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Number](2).longValue, r.getLong(3)))
    val crm = cust.map { case (id, name, nation, bal) =>
      val cls = bucket(id, 10, ":q214")
      val drift = bucket(id, 7, ":q214bal") - 3
      (id,
        if (cls == 7 || cls == 8) name.substring(0, 1) + name.substring(2) else name,
        if (cls == 9) (nation + 1) % 25 else nation,
        bal + drift)
    }
    val counts = scala.collection.mutable.Map[String, (Long, Long, Long)]()
      .withDefaultValue((0L, 0L, 0L))
    val matchedTrue = scala.collection.mutable.Set[Long]()
    for ((id, name, nation, bal) <- cust; (sid, name2, nation2, bal2) <- crm) {
      val blocked = nation == nation2 && math.abs(bal / 100000 - bal2 / 100000) <= 1
      if (blocked) {
        val score = (if (name == name2) 4000000L else -1000000L) +
          (if (math.abs(bal - bal2) <= 5) 3000000L else -2000000L) + 1000000L
        val dec = if (score >= 6000000L) "match"
        else if (score >= 0L) "possible" else "non_match"
        val t = if (id == sid) 1L else 0L
        if (t == 1) matchedTrue += sid
        val (p, tr, f) = counts(dec)
        counts(dec) = (p + 1, tr + t, f + (1 - t))
      }
    }
    val missed = crm.count(c => !matchedTrue.contains(c._1)).toLong
    counts("missed_by_blocking") = (missed, missed, 0L)
    val got = SparkEntry.queries("q214_record_linkage")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == counts.toMap)
    // linkage hygiene on this data: no false positives at or above the
    // match threshold, and every customer is accounted for exactly once
    assert(got("match")._3 == 0L)
    val trueTotal = got.values.map(_._2).sum
    assert(trueTotal == cust.length.toLong,
      s"true links + misses must partition the corpus: $trueTotal")
  }
}

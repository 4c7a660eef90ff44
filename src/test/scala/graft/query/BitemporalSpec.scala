package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q235: bitemporal invariants — exactly one record answers every
  * (valid, transaction) probe, corrections retract exactly the
  * planted 10000 cents, and only where the revision is
  * valid-selected.
  */
class BitemporalSpec extends SparkSpec {

  test("q235: probe uniqueness on a grid; correction surfaces iff the revision is valid-selected") {
    val out = graft.SparkEntry.queries("q235_bitemporal_asof")(spark, sf).collect()
    assert(out.nonEmpty)

    // driver-side record rebuild
    val fo = graft.Tables.orders(spark, sf)
      .select("o_custkey", "o_orderdate", "o_orderkey").collect()
      .groupBy(_.getAs[Long]("o_custkey")).view.mapValues { rs =>
        rs.minBy(r => (r.getAs[java.time.LocalDateTime]("o_orderdate")
          .toEpochSecond(java.time.ZoneOffset.UTC), r.getAs[Long]("o_orderkey")))
          .getAs[java.time.LocalDateTime]("o_orderdate")
      }.toMap
    def bucket0(ck: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$ck:q235".getBytes("UTF-8")).map("%02x".format(_)).mkString
      BigInt(md.take(15), 16) % 10 == 0
    }
    val v = java.time.LocalDateTime.parse("2000-01-01T00:00:00")

    out.foreach { r =>
      val ck = r.getAs[Long]("ck")
      val foDt = fo.get(ck)
      val corrected = bucket0(ck) && foDt.exists(!_.isAfter(v))
      assert(r.getAs[Boolean]("was_corrected") == corrected, s"ck=$ck corrected flag")
      if (corrected)
        assert(r.getAs[Long]("bal_t1_cents") - r.getAs[Long]("bal_t2_cents") == 10000L,
          s"ck=$ck retraction amount")
      else
        assert(r.getAs[Long]("bal_t1_cents") == r.getAs[Long]("bal_t2_cents"))
      val expRecords = (foDt, bucket0(ck)) match {
        case (None, _) => 1L
        case (Some(_), true) => 4L
        case (Some(_), false) => 3L
      }
      assert(r.getAs[Long]("n_records") == expRecords, s"ck=$ck record count")
    }

    // grid uniqueness: for every customer and a (V, T) grid spanning
    // all belief windows, exactly one record matches
    val recs = out.map { r => r.getAs[Long]("ck") }.map { ck =>
      val foDt = fo.get(ck)
      val inf = java.time.LocalDateTime.parse("9999-01-01T00:00:00")
      val epoch = java.time.LocalDateTime.parse("1995-01-01T00:00:00")
      val b0 = bucket0(ck)
      val base = Seq((epoch, inf, epoch, foDt.getOrElse(inf)))
      val rev = foDt.toSeq.flatMap { f =>
        val corrAt = f.plusDays(30)
        val g2 = Seq((epoch, f, f, inf))
        if (b0) g2 ++ Seq((f, inf, f, corrAt), (f, inf, corrAt, inf))
        else g2 ++ Seq((f, inf, f, inf))
      }
      ck -> (base ++ rev)
    }.toMap
    val probesV = Seq("1995-06-01", "1999-12-31", "2000-01-01", "2001-12-31")
      .map(d => java.time.LocalDateTime.parse(d + "T00:00:00"))
    recs.foreach { case (ck, rs) =>
      val probesT = fo.get(ck).toSeq.flatMap(f => Seq(f.plusDays(15), f.plusDays(45))) :+
        java.time.LocalDateTime.parse("1996-01-01T00:00:00")
      for (pv <- probesV; pt <- probesT) {
        val hits = rs.count { case (vf, vt, tf, tt) =>
          !pv.isBefore(vf) && pv.isBefore(vt) && !pt.isBefore(tf) && pt.isBefore(tt)
        }
        assert(hits == 1, s"ck=$ck V=$pv T=$pt matched $hits records")
      }
    }
  }
}

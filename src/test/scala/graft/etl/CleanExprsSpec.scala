package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row

/** F1-F13 against the exact dirty literals from the reference data
  * (FIXTURES.md §A1; reference `transformer.py` / `server.py`).
  */
class CleanExprsSpec extends SparkSpec {

  import spark.implicits._

  private val tabs31 = "\t" * 31

  /** FIXTURES.md A1 rows, literals verbatim from the reference data. */
  private lazy val rawFact = Seq(
    // clean BIKE row
    ("1617.0", "2019-03-09 20:45:00 s/d 2019-03-09 22:05:00", "BIKE",
      "6.171031002E9", "-0.030327699676919,109.29775301089", "5.55",
      "2500.0", "0.0", "2500.0", ""),
    // cross-midnight FOOD row (duration 343 min), non-empty merchant FK
    ("2.0", "2019-03-09 19:55:00 s/d 2019-03-10 01:38:00", "FOOD",
      "6.171031001E9", "-0.05,109.33", "7.99", "1000.0", "200.0", "1200.0", "93.0"),
    // tab-polluted latlng (the 10 dirty rows, server.py:93-94)
    ("3.0", "2018-09-10 08:42:00 s/d 2018-09-10 09:48:00", "CAR",
      "6.171031002E9",
      s"-0.03844709999999999,109.3272303 $tabs31-0.03844709999999999",
      "2.0", "5000.0", "0.0", "5000.0", ""),
    // missing-comma latlng → F7 fallback: prefix up to second '-'
    ("4.0", "2018-10-01 00:00:00 s/d 2018-10-01 00:00:59", "SHOP",
      "6.171031003E9", "-0.0303277-109.33563", "0.4", "0.0", "0.0", "0.0", "7.0"),
  ).toDF("id", "date_process", "mode", "from_kelurahanid",
    "transaction_from_latlng", "distance", "amount_delivery",
    "amount_merchant", "transaction_amount_total", "merchant_id")
    .withColumn("to_kelurahanid", $"from_kelurahanid")
    .withColumn("transaction_to_latlng", $"transaction_from_latlng")
    .withColumn("from_alamat", $"mode")
    .withColumn("to_alamat", $"mode")
    .withColumn("customer_id", $"id")
    .withColumn("driver_id", $"id")

  private lazy val cleaned =
    ReferencePipeline.cleanFact(rawFact).orderBy("id").collect()

  private def row(id: Long): Row =
    cleaned.find(_.getAs[Long]("id") == id).get

  test("F1: scientific-notation id is string surgery, preserves all digits") {
    assert(row(1617).getAs[Long]("from_kelurahanid") == 6171031002L)
    assert(row(4).getAs[Long]("from_kelurahanid") == 6171031003L)
  }

  test("F2: trailing .0 removed from ids") {
    assert(cleaned.map(_.getAs[Long]("id")).sorted.toSeq == Seq(2L, 3L, 4L, 1617L))
  }

  test("F4/F5: date_process splits on ' s/d ' into start/end timestamps") {
    val r = row(1617)
    assert(r.getAs[java.sql.Timestamp]("date_start").toString == "2019-03-09 20:45:00.0")
    assert(r.getAs[java.sql.Timestamp]("date_end").toString == "2019-03-09 22:05:00.0")
  }

  test("F6: distance truncates toward zero, not rounds (7.99 → 7)") {
    assert(row(2).getAs[Int]("distance_rounded") == 7)
    assert(row(1617).getAs[Int]("distance_rounded") == 5)
  }

  test("F7: clean latlng → lat is part before comma") {
    assert(math.abs(row(1617).getAs[Double]("transaction_from_lat") - (-0.030327699676919)) < 1e-12)
  }

  test("F7: tab-polluted latlng still yields clean lat") {
    assert(math.abs(row(3).getAs[Double]("transaction_from_lat") - (-0.03844709999999999)) < 1e-12)
  }

  test("F7: missing-comma latlng falls back to prefix before second '-'") {
    assert(math.abs(row(4).getAs[Double]("transaction_from_lat") - (-0.0303277)) < 1e-12)
  }

  test("F8: lng comes from first space token of pre-tab-run segment") {
    assert(math.abs(row(3).getAs[Double]("transaction_from_lng") - 109.3272303) < 1e-12)
    assert(math.abs(row(1617).getAs[Double]("transaction_from_lng") - 109.29775301089) < 1e-12)
  }

  test("F8: missing-comma latlng yields null lng (pandas NaN parity)") {
    assert(row(4).isNullAt(row(4).fieldIndex("transaction_from_lng")))
  }

  test("F9: duration in whole minutes, truncated (59s → 0; cross-midnight 343)") {
    assert(row(4).getAs[Int]("duration") == 0)
    assert(row(2).getAs[Int]("duration") == 343)
    assert(row(1617).getAs[Int]("duration") == 80)
  }

  test("F11: quarter key matches pandas Period('Q') format") {
    assert(row(1617).getAs[String]("quarter") == "2019Q1")
    assert(row(3).getAs[String]("quarter") == "2018Q3")
    assert(row(4).getAs[String]("quarter") == "2018Q4")
  }

  test("empty-string merchant FK becomes null (join-safety, SURVEY §7 risk register)") {
    assert(row(1617).isNullAt(row(1617).fieldIndex("merchant_id")))
    assert(row(2).getAs[Long]("merchant_id") == 93L)
  }
}

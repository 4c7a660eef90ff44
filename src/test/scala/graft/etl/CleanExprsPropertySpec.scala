package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-style checks (SURVEY.md §5.3): round-trips and invariants
  * of the cleaning expressions over seeded randomly-generated inputs,
  * evaluated through the real Catalyst expressions (not
  * reimplementations). Seeded → deterministic CI.
  */
class CleanExprsPropertySpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def evalOne(input: Seq[String], expr: org.apache.spark.sql.Column): Seq[Any] =
    input.toDF("c").select(expr.as("r")).collect().toSeq.map(_.get(0))

  test("F1 round-trip: any 10-digit id survives sci-notation mangling") {
    val ids = Seq.fill(200)(1000000000L + (rnd.nextLong(9000000000L)))
    val sci = ids.map { id => val s = id.toString; s"${s.head}.${s.tail}E9" }
    assert(evalOne(sci, CleanExprs.sciNotationIdToLong($"c")) == ids)
  }

  test("F2: removeAfterDot(x + '.' + anything) == x") {
    val ids = Seq.fill(200)(math.abs(rnd.nextLong()))
    val raw = ids.map(i => s"$i.${rnd.nextInt(1000)}")
    assert(evalOne(raw, CleanExprs.removeAfterDot($"c")) == ids.map(_.toString))
  }

  test("F4/F5 round-trip: re-concatenating start/end equals input") {
    def ts() = new java.sql.Timestamp(rnd.nextLong(2000000000L) / 60 * 60000L)
      .toString.stripSuffix(".0")
    val raw = Seq.fill(200)(s"${ts()} s/d ${ts()}")
    val out = raw.toDF("c").select(
      concat(
        date_format(CleanExprs.dateProcessStart($"c"), "yyyy-MM-dd HH:mm:ss"),
        lit(" s/d "),
        date_format(CleanExprs.dateProcessEnd($"c"), "yyyy-MM-dd HH:mm:ss")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(out == raw)
  }

  test("F6: truncation toward zero matches Scala .toInt for any double") {
    val ds = Seq.fill(500)((rnd.nextDouble() - 0.5) * 2e6)
    assert(evalOne(ds.map(_.toString), CleanExprs.roundedDist($"c")) == ds.map(_.toInt))
  }

  test("F9: duration truncates seconds to whole minutes") {
    val pairs = Seq.fill(200)((rnd.nextLong(1000000000L), rnd.nextLong(36000L)))
    val out = pairs.toDF("s", "d")
      .select(CleanExprs.durationMinutes(
        timestamp_seconds($"s"), timestamp_seconds($"s" + $"d")).as("m"), $"d")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    out.foreach { case (m, d) => assert(m == (d / 60).toInt) }
  }

  test("histogram: bin counts always sum to row count, bins in [0,9]") {
    (1 to 5).foreach { _ =>
      val vs = Seq.fill(1 + rnd.nextInt(500))((rnd.nextDouble() - 0.5) * 2e4)
      val hist = ReferencePipeline.numericHistogram(vs.toDF("v"), $"v").collect()
      assert(hist.map(_.getLong(1)).sum == vs.length)
      assert(hist.map(_.getInt(0)).forall(b => b >= 0 && b <= 9))
    }
  }

  test("F7/F8 never throw on adversarial garbage, worst case null") {
    val garbage = Seq("", ",", "a,b", "--", "1.2,3.4,5.6", "\t\t", " ", "-", "x")
    val out = garbage.toDF("c")
      .select(CleanExprs.latOf($"c").as("lat"), CleanExprs.lngOf($"c").as("lng"))
      .collect()
    assert(out.length == garbage.length) // no exception = pass; values may be null
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions are reachable from plain SQL when the
  * library is deployed via spark.sql.extensions.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  // getOrCreate may return another suite's session (builder-time
  // extensions would be silently ignored), so register directly — the
  // same tuples the spark.sql.extensions path injects.
  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(s)
    s
  }

  test("custom expressions callable from SQL") {
    val r = spark.sql(
      """SELECT rolling_hash64('abc') AS rh,
        |       simhash64(array('a', 'b')) AS sh,
        |       size(minhash_signature(array('x', 'y'), 16)) AS mh_len,
        |       word_shingles('a b c d', 3) AS ws,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |       dot_long(array(3L, -4L, 127L), array(2L, 5L, -127L)) AS dl,
        |       collapse_runs('a a b b b a c c') AS cr
        |""".stripMargin).collect()(0)
    assert(r.getAs[String]("cr") == "a b a c")
    assert(r.getAs[Long]("dl") == 3L * 2 - 4 * 5 - 127L * 127)
    assert(r.getAs[Long]("rh") == graft.functions.RollingHash64.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
    assert(r.getAs[Int]("mh_len") == 16)
    assert(r.getSeq[String](r.fieldIndex("ws")) == Seq("a b c", "b c d"))
    assert(r.getAs[Double]("dp") == 11.0)
  }

  test("bloom_might_contain callable from SQL, membership matches the builder") {
    val bits = new Array[Long](64) // m = 4096
    graft.functions.Bloom64.set(bits, 12345L, 67891L, 4096, 6)
    val lit = bits.mkString("array(", "L, ", "L)")
    val r = spark.sql(
      s"""SELECT bloom_might_contain($lit, 12345L, 67891L, 4096, 6) AS hit,
         |       bloom_might_contain($lit, 54321L, 19876L, 4096, 6) AS miss
         |""".stripMargin).collect()(0)
    assert(r.getAs[Boolean]("hit"))
    assert(!r.getAs[Boolean]("miss"))
  }

  test("SQL and Column-API forms agree") {
    import org.apache.spark.sql.functions.{col, split}
    val df = spark.createDataFrame(Seq(Tuple1("the quick brown fox jumps"))).toDF("text")
    val viaCol = df.select(graft.functions.simhash64(split(col("text"), " "))).collect()(0).getLong(0)
    df.createOrReplaceTempView("t")
    val viaSql = spark.sql("SELECT simhash64(split(text, ' ')) FROM t").collect()(0).getLong(0)
    assert(viaCol == viaSql)
  }
}

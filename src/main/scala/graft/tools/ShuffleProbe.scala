package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** One-off audit helper: lists every registered (non-streaming) query
  * whose physical plan shuffles a raw document body (`text#…` in an
  * Exchange's input) — the feed for ShuffleSchemaGuardSpec's
  * allowlist. Not part of the driver contract.
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val streaming = graft.streaming.StreamingQueries.specs.map(_.name).toSet
    SparkEntry.allSpecs.filterNot(s => streaming(s.name)).foreach { spec =>
      try {
        val fmt = spec.fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val hits = ShuffleGuard.bodyShuffles(fmt)
        if (hits.nonEmpty) println(s"BODYSHUFFLE ${spec.name}: ${hits.mkString("; ")}")
      } catch { case e: Throwable =>
        println(s"PROBEFAIL ${spec.name}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

/** Shared parser for the formatted explain: finds Exchange nodes whose
  * input carries a banned wide-payload attribute.
  */
object ShuffleGuard {
  /** Attribute names whose bytes must NOT cross a shuffle: raw
    * document bodies and multimodal payloads. Digests, ids, codes,
    * grams, and embeddings (fixed 256 B vectors that ARE the data)
    * are fine.
    */
  val BannedAttrs = Seq("text", "payload", "frame_bytes")

  /** Returns one diagnostic per offending Exchange in a formatted
    * explain string: the node header plus the banned attrs seen.
    *
    * An attribute counts only when the banned NAME is a standalone
    * attribute in the Exchange's input list (preceded by `[`, `,` or
    * whitespace) — expression-DERIVED attributes whose generated name
    * merely embeds the body reference (e.g. `md5(...(text#87))#122`,
    * a digest) carry safe bytes. Name-based by design: it catches
    * per-row body movement; O(partitions) partial-aggregate extremes
    * (min#/max#) are out of scope and acceptable.
    */
  def bodyShuffles(formatted: String): Seq[String] = {
    val nodeHeader = """^\(\d+\) (\w+).*$""".r
    val banned = BannedAttrs.map(a => (a, s"""(?:^|[\\[\\s,])${a}#\\d+""".r))
    var current = ""
    val out = scala.collection.mutable.ListBuffer[String]()
    formatted.linesIterator.foreach { line =>
      line match {
        case nodeHeader(name) => current = name
        case _ =>
          if (current == "Exchange" && line.trim.startsWith("Input")) {
            val bad = banned.collect {
              case (a, r) if r.findFirstIn(line).isDefined => a
            }
            if (bad.nonEmpty) out += s"Exchange carries ${bad.mkString(",")}"
          }
      }
    }
    out.toList
  }
}

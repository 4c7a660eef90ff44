package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.api.{InitContext, ReadSupport, WriteSupport}
import org.apache.parquet.hadoop.api.ReadSupport.ReadContext
import org.apache.parquet.hadoop.api.WriteSupport.WriteContext
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetReader, ParquetWriter}
import org.apache.parquet.io.api.{Binary, Converter, GroupConverter, PrimitiveConverter, RecordConsumer, RecordMaterializer}
import org.apache.parquet.schema.{MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.stringType
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{BINARY, DOUBLE, INT64}

/** COLUMNAR DATA PLANE for the manifest store — every data file the
  * store writes is PARQUET (Snappy-compressed, dictionary-encoded,
  * column-pruned on read), closing the round-13 design gap: the
  * metadata layer (zone maps, blooms, per-file sums, stats-answered
  * aggregates) was 100-TB-shaped while the data files were
  * uncompressed CSV parsed whole-row on every scan. The manifest
  * commit protocol, file naming, deletion-vector/update-key sidecars
  * (which stay newline-key CSVs — bounded metadata, not data), and
  * every DML verb's semantics are unchanged; only the bytes inside
  * `part-*` data files moved to a real format.
  *
  * Layout (round 15, the TYPED NAMED schema): each data file's parquet
  * schema carries the table's REAL column names and a declared type
  * per position — LONG (INT64), DOUBLE, or STRING (BINARY/UTF8) — all
  * OPTIONAL. The type vector is table metadata
  * ([[ManifestSource.tableTypes]]); positions are immutable once
  * created, so a file written before an addColumn evolution simply
  * lacks the trailing columns and readers surface NULL, the same
  * arity-padding contract the positional dialect had. Rows travel as
  * `Array[Any]` (java.lang.Long / java.lang.Double / String / null)
  * indexed by schema position.
  *
  * Files written by earlier rounds use positional names `c0..cN`
  * (INT64 everywhere except c2 STRING); the read side resolves a
  * wanted position by its REAL name first and falls back to `c<i>`,
  * and picks converters off the FILE's own parquet types — so mixed
  * generations (old positional + new named files in one snapshot)
  * scan seamlessly.
  *
  * The writer/reader pair below is parquet-mr's low-level
  * WriteSupport/ReadSupport API rather than the example Group API:
  * no per-row Group allocation, and the read side materializes
  * straight into a reusable positional array. Column pruning is real
  * parquet projection — the requested schema in [[RowReadSupport]]
  * restricts which column chunks are decoded, so a single-column
  * scan of the store reads one column's pages, not the row.
  *
  * A `.csv` data file (legacy dialect, still written by hand in a few
  * concurrency specs) reads through the same [[openRows]] entry point
  * via a line-splitting fallback — the store is format-dual on read,
  * parquet-only on write.
  */
object DataFile {
  private[sources] def colName(i: Int): String = "c" + i

  // Declared column types are one char per position: 'L' = BIGINT,
  // 'D' = DOUBLE, 'S' = STRING, 'B' = BINARY (opaque bytes — round 16,
  // the multimodal-payload column; see ManifestSource.tableTypes)

  /** Hadoop conf for the store's data files: the RAW local filesystem
    * (no `.crc` checksum twins — parquet carries its own page/footer
    * checksums, and a crc sidecar would be invisible orphan state to
    * [[ManifestSource.vacuum]]'s referenced-set sweep), cache
    * disabled so a checksummed FS instance cached by Spark under the
    * `file` scheme can never shadow this choice.
    */
  private def ioConf(): Configuration = {
    val c = new Configuration(false)
    c.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    c.setBoolean("fs.file.impl.disable.cache", true)
    c
  }

  private def schemaFor(names: Seq[String], types: Seq[Char]): MessageType = {
    val b = Types.buildMessage()
    names.indices.foreach { i =>
      types(i) match {
        case 'S' => b.addField(Types.optional(BINARY).as(stringType).named(names(i)))
        case 'B' => b.addField(Types.optional(BINARY).named(names(i)))
        case 'D' => b.addField(Types.optional(DOUBLE).named(names(i)))
        case _ => b.addField(Types.optional(INT64).named(names(i)))
      }
    }
    b.named("row")
  }

  /** True when the path is a legacy CSV-dialect data file. */
  private def isCsv(path: String): Boolean = path.endsWith(".csv")

  /** Field names of one parquet data file's footer — a single
    * low-level footer read. The change feed's name-dialect grouping
    * used `spark.read.parquet(f).schema` per changed file, which pays
    * a full DataSource resolution (file listing, schema merge,
    * relation construction) of ~100 ms per file ON THE DRIVER; the
    * r16 baseline measured it doubling the whole feed computation
    * (q280 1.0 → 2.4 s). A bare parquet-mr footer read is ~1 ms.
    */
  def footerFieldNames(pathStr: String): Seq[String] = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new Path(pathStr), ioConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val s = r.getFileMetaData.getSchema
      (0 until s.getFieldCount).map(s.getFieldName)
    } finally r.close()
  }

  // ---------------------------------------------------------------
  // WRITE
  // ---------------------------------------------------------------

  private final class RowWriteSupport(names: Seq[String], types: Seq[Char])
      extends WriteSupport[Array[Any]] {
    private var rc: RecordConsumer = _
    override def init(conf: Configuration): WriteContext =
      new WriteContext(schemaFor(names, types),
        java.util.Collections.emptyMap[String, String]())
    override def prepareForWrite(r: RecordConsumer): Unit = rc = r
    override def write(a: Array[Any]): Unit = {
      rc.startMessage()
      var i = 0
      while (i < a.length) {
        val v = a(i)
        if (v != null) {
          val n = names(i)
          rc.startField(n, i)
          types(i) match {
            case 'S' => rc.addBinary(Binary.fromString(v.asInstanceOf[String]))
            case 'B' => rc.addBinary(
              Binary.fromConstantByteArray(v.asInstanceOf[Array[Byte]]))
            case 'D' => rc.addDouble(v.asInstanceOf[java.lang.Double].doubleValue())
            case _ => rc.addLong(v.asInstanceOf[java.lang.Long].longValue())
          }
          rc.endField(n, i)
        }
        i += 1
      }
      rc.endMessage()
    }
  }

  private final class WriterBuilder(path: Path, names: Seq[String], types: Seq[Char])
      extends ParquetWriter.Builder[Array[Any], WriterBuilder](path) {
    override def self(): WriterBuilder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[Array[Any]] =
      new RowWriteSupport(names, types)
  }

  /** Streaming row writer for one data file shaped (names, types).
    * Values: java.lang.Long / java.lang.Double / String (or null) by
    * declared position type. Rows shorter than the arity are padded
    * with trailing nulls.
    */
  final class Writer(pathStr: String, names: Seq[String], types: Seq[Char])
      extends AutoCloseable {
    private val nCols = names.size
    require(types.size == nCols, s"types ${types.size} != names $nCols")
    private val w: ParquetWriter[Array[Any]] =
      new WriterBuilder(new Path(pathStr), names, types)
        .withConf(ioConf())
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
        .build()
    private val pad = new Array[Any](nCols)

    def write(a: Array[Any]): Unit =
      if (a.length == nCols) w.write(a)
      else {
        java.util.Arrays.fill(pad.asInstanceOf[Array[AnyRef]], null)
        System.arraycopy(a, 0, pad, 0, math.min(a.length, nCols))
        w.write(pad)
      }

    /** Base-row convenience used by the V2 and bounded-batch writers. */
    def writeBase(ok: Long, us: Long, flag: String, qty: Long, pc: Long): Unit = {
      java.util.Arrays.fill(pad.asInstanceOf[Array[AnyRef]], null)
      pad(0) = java.lang.Long.valueOf(ok); pad(1) = java.lang.Long.valueOf(us)
      pad(2) = flag
      pad(3) = java.lang.Long.valueOf(qty); pad(4) = java.lang.Long.valueOf(pc)
      w.write(pad)
    }

    override def close(): Unit = w.close()
  }

  def writer(dir: String, name: String, names: Seq[String],
      types: Seq[Char]): Writer =
    new Writer(new Path(dir, name).toString, names, types)

  // ---------------------------------------------------------------
  // READ
  // ---------------------------------------------------------------

  private final class RowMaterializer(requested: MessageType, arity: Int,
      idxOf: String => Int) extends RecordMaterializer[Array[Any]] {
    private val row = new Array[Any](arity)
    private val root: GroupConverter = new GroupConverter {
      private val convs: Array[Converter] =
        (0 until requested.getFieldCount).map { j =>
          val idx = idxOf(requested.getFieldName(j))
          // converter by the FILE's own column type — self-describing,
          // so positional legacy files and typed named files mix freely
          // BINARY splits on the logical annotation: UTF8-annotated is
          // the string column, bare BINARY is opaque bytes ('B')
          requested.getType(j).asPrimitiveType().getPrimitiveTypeName match {
            case BINARY
              if requested.getType(j).getLogicalTypeAnnotation == stringType() =>
              new PrimitiveConverter {
                override def addBinary(b: Binary): Unit = row(idx) = b.toStringUsingUTF8
              }
            case BINARY => new PrimitiveConverter {
              override def addBinary(b: Binary): Unit = row(idx) = b.getBytes
            }
            case DOUBLE => new PrimitiveConverter {
              override def addDouble(v: Double): Unit = row(idx) = java.lang.Double.valueOf(v)
            }
            case _ => new PrimitiveConverter {
              override def addLong(v: Long): Unit = row(idx) = java.lang.Long.valueOf(v)
            }
          }
        }.toArray
      override def getConverter(j: Int): Converter = convs(j)
      override def start(): Unit =
        java.util.Arrays.fill(row.asInstanceOf[Array[AnyRef]], null)
      override def end(): Unit = ()
    }
    override def getCurrentRecord: Array[Any] = row
    override def getRootConverter: GroupConverter = root
  }

  private final class RowReadSupport(wanted: Array[Int], arity: Int,
      names: Seq[String]) extends ReadSupport[Array[Any]] {
    // requested-field-name → row position, covering both dialects
    private def idxOf(n: String): Int = {
      val i = names.indexOf(n)
      if (i >= 0) i else n.stripPrefix("c").toInt
    }
    override def init(ctx: InitContext): ReadContext = {
      val file = ctx.getFileSchema
      val b = Types.buildMessage()
      // projection = wanted ∩ file columns, resolved by the position's
      // REAL name first, the legacy positional `c<i>` second; a wanted
      // column the file predates surfaces null from the materializer's
      // cleared slots
      wanted.sorted.foreach { i =>
        val n = if (i < names.size && file.containsField(names(i))) names(i)
          else colName(i)
        if (file.containsField(n))
          b.addField(file.getType(file.getFieldIndex(n)))
      }
      new ReadContext(b.named("row"))
    }
    override def prepareForRead(conf: Configuration,
        meta: java.util.Map[String, String], fileSchema: MessageType,
        ctx: ReadContext): RecordMaterializer[Array[Any]] =
      new RowMaterializer(ctx.getRequestedSchema, arity, idxOf)
  }

  /** Iterator over one data file's rows as positional `Array[Any]` of
    * length `arity` (the SNAPSHOT schema arity — files written before
    * an evolution pad with nulls). Only `wanted` positions are
    * populated; for a parquet file only those columns are decoded
    * (true columnar pruning). `names` are the snapshot's column names
    * (positional-name fallback covers legacy files). The returned
    * array is REUSED between rows — consume or copy before advancing.
    * Dispatches on extension: `.csv` files read through the legacy
    * line-split dialect.
    */
  def openRows(path: String, arity: Int, wanted: Array[Int],
      names: Seq[String]): RowCursor =
    if (isCsv(path)) new CsvCursor(path, arity, wanted)
    else new ParquetCursor(path, arity, wanted, names)

  sealed trait RowCursor extends AutoCloseable {
    /** Advance; false at EOF. */
    def next(): Boolean
    /** The current row (valid until the next `next()`). */
    def get(): Array[Any]
  }

  private final class ParquetCursor(path: String, arity: Int, wanted: Array[Int],
      names: Seq[String]) extends RowCursor {
    private val r: ParquetReader[Array[Any]] =
      ParquetReader.builder(new RowReadSupport(wanted, arity, names), new Path(path))
        .withConf(ioConf())
        .build()
    private var cur: Array[Any] = _
    override def next(): Boolean = { cur = r.read(); cur != null }
    override def get(): Array[Any] = cur
    override def close(): Unit = r.close()
  }

  private final class CsvCursor(path: String, arity: Int, wanted: Array[Int])
      extends RowCursor {
    // Hadoop FS open (not Source.fromFile, which treats a scheme'd
    // path like `file:/x/part-1.csv` as a literal filename) — keeps
    // the legacy-CSV read path format-dual for remote-scheme stores,
    // same as ParquetCursor. Legacy dialect predates typed schemas:
    // position 2 is the string column, everything else BIGINT.
    private val src = {
      val p = new Path(path)
      scala.io.Source.fromInputStream(
        p.getFileSystem(ioConf()).open(p), "UTF-8")
    }
    private val it = src.getLines()
    private val row = new Array[Any](arity)
    private val want = wanted.toSet
    override def next(): Boolean =
      if (!it.hasNext) false
      else {
        val a = it.next().split(",", -1)
        java.util.Arrays.fill(row.asInstanceOf[Array[AnyRef]], null)
        var i = 0
        while (i < arity) {
          if (want(i) && i < a.length && a(i).nonEmpty) {
            row(i) = if (i == 2) a(i) else java.lang.Long.valueOf(a(i).toLong)
          } else if (want(i) && i == 2 && i < a.length) row(i) = a(i)
          i += 1
        }
        true
      }
    override def get(): Array[Any] = row
    override def close(): Unit = src.close()
  }

  /** All positions 0 until arity — the rewrite verbs' full-row read. */
  def allCols(arity: Int): Array[Int] = Array.tabulate(arity)(identity)
}

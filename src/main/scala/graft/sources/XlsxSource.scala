package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, TableScan}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal xlsx parser over the OOXML container (a zip of XML parts —
  * ECMA-376; values in `xl/worksheets/sheet1.xml`, shared strings in
  * `xl/sharedStrings.xml`). Stdlib only (java.util.zip + JDK StAX) —
  * no external reader jar, which is the whole point: the reference
  * loads its five dimension tables with `pd.read_excel`
  * (reference server.py:26-48) and this container has no xlsx
  * library offline.
  *
  * Semantics mirror `tools/extract_dim_fixtures.py` (the script that
  * produced the golden dim fixtures) cell-for-cell: raw cell text,
  * shared-string resolution, cells keyed by column LETTER (so sparse
  * rows stay aligned), columns ordered A..Z then AA.., everything a
  * string — typing is the job of the dim loaders
  * ([[graft.etl.ReferencePipeline.dimKategori]] etc.), exactly as
  * with the parquet fixtures.
  */
object XlsxParse {

  /** Bytes of one zip entry, or None if absent. Two linear scans per
    * file (shared strings, then the sheet) — entry order inside an
    * xlsx is not guaranteed, and the files are small enough that
    * re-scanning beats building an index.
    */
  private def entryBytes(zipBytes: Array[Byte], name: String): Option[Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
      .collectFirst { case e if e.getName == name => zin.readAllBytes() }
  }

  /** The shared-string table: rich-text runs (`<si>` with several
    * `<t>` descendants) concatenate, like the fixture extractor.
    */
  private def sharedStrings(zipBytes: Array[Byte]): IndexedSeq[String] =
    entryBytes(zipBytes, "xl/sharedStrings.xml") match {
      case None => Vector.empty
      case Some(bytes) =>
        val r = XMLInputFactory.newInstance()
          .createXMLStreamReader(new ByteArrayInputStream(bytes))
        val out = Vector.newBuilder[String]
        var sb: StringBuilder = null
        var inT = false
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
              case "si" => sb = new StringBuilder
              case "t"  => inT = true
              case _    =>
            }
            case XMLStreamConstants.CHARACTERS if inT && sb != null =>
              sb.append(r.getText)
            case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
              case "si" => out += sb.toString; sb = null
              case "t"  => inT = false
              case _    =>
            }
            case _ =>
          }
        }
        out.result()
    }

  private val ColLetters = "([A-Z]+)".r

  /** All sheet rows as columnLetter → raw cell text (shared strings
    * resolved, inline strings supported), in sheet order. Row 0 is
    * the header.
    */
  def rows(zipBytes: Array[Byte]): Vector[Map[String, String]] = {
    val shared = sharedStrings(zipBytes)
    val sheet = entryBytes(zipBytes, "xl/worksheets/sheet1.xml")
      .getOrElse(throw new IllegalArgumentException("xlsx has no xl/worksheets/sheet1.xml"))
    val r = XMLInputFactory.newInstance()
      .createXMLStreamReader(new ByteArrayInputStream(sheet))
    val out = Vector.newBuilder[Map[String, String]]
    var row: Map[String, String] = null
    var cellCol: String = null
    var cellType: String = null
    var text: StringBuilder = null
    var collecting = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = Map.empty
          case "c" =>
            cellCol = Option(r.getAttributeValue(null, "r"))
              .flatMap(ColLetters.findFirstIn).orNull
            cellType = r.getAttributeValue(null, "t")
          case "v" | "t" => text = new StringBuilder; collecting = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS if collecting =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "row" => out += row; row = null
          case "v" | "t" =>
            collecting = false
            if (row != null && cellCol != null && text != null) {
              val raw = text.toString
              val v = if (cellType == "s") shared(raw.trim.toInt) else raw
              row = row.updated(cellCol, v)
            }
            text = null
          case "c" => cellCol = null; cellType = null
          case _ =>
        }
        case _ =>
      }
    }
    out.result()
  }

  /** Header as (columnLetter, columnName), ordered A..Z then AA.. —
    * the fixture extractor's `(len, letters)` sort.
    */
  def header(zipBytes: Array[Byte]): Seq[(String, String)] = {
    val first = rows(zipBytes).headOption
      .getOrElse(throw new IllegalArgumentException("xlsx sheet is empty"))
    first.toSeq.sortBy { case (c, _) => (c.length, c) }
  }
}

/** `spark.read.format("graft-xlsx").load(path)` — SURVEY §2.1 S1 as a
  * native Spark source instead of a Python fixture-extraction step.
  *
  * Scale shape: schema (the header) is a driver-side metadata read of
  * ONE file — the parquet-footer pattern; the data scan distributes
  * whole files across executors via `binaryFiles` (an xlsx is a zip —
  * not splittable within a file, so the parallel unit is the file,
  * exactly like gzip text). Fine for its role: dimension loads of
  * many small workbooks, not fact data.
  */
class XlsxRelation(override val sqlContext: SQLContext, path: String)
    extends BaseRelation with TableScan with Serializable {

  private def firstFileBytes: Array[Byte] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(sqlContext.sparkContext.hadoopConfiguration)
    val file =
      if (fs.getFileStatus(hPath).isDirectory)
        fs.listStatus(hPath).filter(_.isFile).map(_.getPath)
          .sortBy(_.getName).headOption
          .getOrElse(throw new IllegalArgumentException(s"no files under $path"))
      else hPath
    val in = fs.open(file)
    try in.readAllBytes() finally in.close()
  }

  private lazy val headerCols: Seq[(String, String)] = XlsxParse.header(firstFileBytes)

  override def schema: StructType =
    StructType(headerCols.map { case (_, name) => StructField(name, StringType, nullable = true) })

  override def buildScan(): RDD[Row] = {
    val letters = headerCols.map(_._1)
    sqlContext.sparkContext.binaryFiles(path).flatMap { case (_, stream) =>
      XlsxParse.rows(stream.toArray()).drop(1) // each file re-skips its header
        .map(m => Row.fromSeq(letters.map(l => m.get(l).orNull)))
    }
  }
}

/** Registered as `graft-xlsx` via META-INF/services. */
class DefaultSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-xlsx"
  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-xlsx requires a path"))
    new XlsxRelation(sqlContext, path)
  }
}

package graft.sources

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.Comparator

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** "gseg" — a minimal columnar segment format with a full
  * DataSourceV2 READ integration, built to demonstrate (and test)
  * the three scan-side contracts a 100 TB source lives or dies by:
  *
  *  1. COLUMN PRUNING that actually skips bytes: each segment stores
  *     columns as independent length-prefixed blocks, so a reader
  *     asked for 2 of 5 columns seeks past the other blocks instead
  *     of decoding them ([[SegScanBuilder.pruneColumns]] →
  *     [[SegPartitionReader]]).
  *  2. PLANNING-TIME FILE SKIPPING: segment headers carry per-column
  *     min/max for numeric columns; [[SegScan.planInputPartitions]]
  *     drops whole files whose range cannot satisfy the pushed
  *     filters — the same zone-map idea parquet row-group stats and
  *     lakehouse manifests implement, at file grain.
  *  3. FILTER PUSHDOWN with the parquet-style safety contract:
  *     supported comparisons are evaluated inside the reader (rows
  *     die before reaching Spark) AND still returned as post-scan
  *     filters, so Spark re-checks them — pushdown is a performance
  *     statement, never a correctness dependency, and filter columns
  *     are guaranteed to stay in the required schema.
  *
  * The write side is deliberately plain (one segment per partition,
  * buffered in memory, local-FS java.io): segment layout is the point
  * here, not a second committer; a production writer would stream
  * through the Hadoop FileSystem API with a size-capped segment roll.
  * Supported types: long, int, double, string, with per-column null
  * bitmaps. Layout per file:
  *
  *   "GSEG" magic, version byte, int nRows, int nCols,
  *   per column: name (len-prefixed UTF-8), type tag byte,
  *               long blockBytes, double min, double max (NaN for
  *               non-numeric / all-null),
  *   per column block: nRows-bit null bitmap (packed bytes), then
  *               non-null values (fixed width; strings len-prefixed).
  */
object SegSource {
  private[sources] val Magic = Array[Byte]('G', 'S', 'E', 'G')
  private[sources] val Version: Byte = 1

  private[sources] def tag(dt: DataType): Byte = dt match {
    case LongType    => 0
    case IntegerType => 1
    case DoubleType  => 2
    case StringType  => 3
    case other => throw new IllegalArgumentException(
      s"gseg supports long/int/double/string, got $other")
  }
  private[sources] def dtype(tag: Byte): DataType = tag match {
    case 0 => LongType
    case 1 => IntegerType
    case 2 => DoubleType
    case 3 => StringType
  }

  /** Write `df` as one .gseg segment per partition under `dir`.
    * Empty partitions produce no file. */
  def write(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    schema.fields.foreach(f => tag(f.dataType)) // validate types up front
    graft.Fs.deleteRecursively(dir)
    Files.createDirectories(Paths.get(dir))
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val rows = it.toArray
        val pid = org.apache.spark.TaskContext.getPartitionId()
        writeSegment(rows, schema, f"$dir/part-$pid%05d.gseg")
      }
    }
  }

  private def writeSegment(rows: Array[Row], schema: StructType,
      file: String): Unit = {
    val n = rows.length
    val nCols = schema.length
    // encode each column block (null bitmap + values) independently
    val blocks = new Array[Array[Byte]](nCols)
    val mins = new Array[Double](nCols)
    val maxs = new Array[Double](nCols)
    var c = 0
    while (c < nCols) {
      val bo = new java.io.ByteArrayOutputStream()
      val o = new DataOutputStream(bo)
      val bitmap = new Array[Byte]((n + 7) / 8)
      var i = 0
      while (i < n) {
        if (rows(i).isNullAt(c)) bitmap(i >> 3) =
          (bitmap(i >> 3) | (1 << (i & 7))).toByte
        i += 1
      }
      o.write(bitmap)
      var mn = Double.NaN
      var mx = Double.NaN
      def acc(v: Double): Unit = {
        if (mn.isNaN || v < mn) mn = v
        if (mx.isNaN || v > mx) mx = v
      }
      i = 0
      schema(c).dataType match {
        case LongType => while (i < n) {
          if (!rows(i).isNullAt(c)) {
            val v = rows(i).getLong(c); o.writeLong(v); acc(v.toDouble)
          }
          i += 1
        }
        case IntegerType => while (i < n) {
          if (!rows(i).isNullAt(c)) {
            val v = rows(i).getInt(c); o.writeInt(v); acc(v.toDouble)
          }
          i += 1
        }
        case DoubleType => while (i < n) {
          if (!rows(i).isNullAt(c)) {
            val v = rows(i).getDouble(c); o.writeDouble(v); acc(v)
          }
          i += 1
        }
        case StringType => while (i < n) {
          if (!rows(i).isNullAt(c)) {
            val b = rows(i).getString(c).getBytes(UTF_8)
            o.writeInt(b.length); o.write(b)
          }
          i += 1
        }
        case _ => ()
      }
      o.flush()
      blocks(c) = bo.toByteArray
      mins(c) = mn; maxs(c) = mx
      c += 1
    }
    val out = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(file)))
    try {
      out.write(Magic); out.writeByte(Version)
      out.writeInt(n); out.writeInt(nCols)
      c = 0
      while (c < nCols) {
        val nm = schema(c).name.getBytes(UTF_8)
        out.writeInt(nm.length); out.write(nm)
        out.writeByte(tag(schema(c).dataType))
        out.writeLong(blocks(c).length.toLong)
        out.writeDouble(mins(c)); out.writeDouble(maxs(c))
        c += 1
      }
      blocks.foreach(out.write)
    } finally out.close()
  }

  // ---------------- header / schema ----------------

  private[sources] case class ColMeta(name: String, tag: Byte,
      bytes: Long, min: Double, max: Double)
  private[sources] case class SegHeader(nRows: Int, cols: Array[ColMeta]) {
    def schema: StructType =
      StructType(cols.map(c => StructField(c.name, dtype(c.tag))))
  }

  private[sources] def readHeader(in: DataInputStream): SegHeader = {
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(magic.sameElements(Magic) && in.readByte() == Version,
      "not a gseg v1 file")
    val n = in.readInt()
    val nCols = in.readInt()
    val cols = Array.fill(nCols) {
      val nm = new Array[Byte](in.readInt())
      in.readFully(nm)
      ColMeta(new String(nm, UTF_8), in.readByte(), in.readLong(),
        in.readDouble(), in.readDouble())
    }
    SegHeader(n, cols)
  }

  private[sources] def headerOf(file: String): SegHeader = {
    val in = new DataInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(file)))
    try readHeader(in) finally in.close()
  }

  private[sources] def listSegments(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) throw new IllegalArgumentException(
      s"gseg path is not a directory: $dir")
    val s = Files.list(p)
    try s.iterator().asScala.map(_.toString)
      .filter(_.endsWith(".gseg")).toSeq.sorted
    finally s.close()
  }

  // ---------------- filter support ----------------

  /** File-grain zone-map check: can `file`'s per-column [min,max]
    * possibly satisfy `f`? Conservative: unknown shapes keep the file.
    * Only numeric columns carry stats (string min/max stay NaN, which
    * fails every comparison below and so keeps the file). */
  private[sources] def mayMatch(h: SegHeader, f: Filter): Boolean = {
    val byName = h.cols.map(c => c.name -> c).toMap
    def num(v: Any): Option[Double] = v match {
      case l: Long => Some(l.toDouble)
      case i: Int => Some(i.toDouble)
      case d: Double => Some(d)
      case f2: Float => Some(f2.toDouble)
      case s: Short => Some(s.toDouble)
      case b: Byte => Some(b.toDouble)
      case _ => None
    }
    def stats(attr: String): Option[(Double, Double)] =
      byName.get(attr).collect {
        case c if !c.min.isNaN && !c.max.isNaN => (c.min, c.max)
      }
    f match {
      case EqualTo(a, v) => (stats(a), num(v)) match {
        case (Some((mn, mx)), Some(x)) => x >= mn && x <= mx
        case _ => true
      }
      case GreaterThan(a, v) => (stats(a), num(v)) match {
        case (Some((_, mx)), Some(x)) => mx > x
        case _ => true
      }
      case GreaterThanOrEqual(a, v) => (stats(a), num(v)) match {
        case (Some((_, mx)), Some(x)) => mx >= x
        case _ => true
      }
      case LessThan(a, v) => (stats(a), num(v)) match {
        case (Some((mn, _)), Some(x)) => mn < x
        case _ => true
      }
      case LessThanOrEqual(a, v) => (stats(a), num(v)) match {
        case (Some((mn, _)), Some(x)) => mn <= x
        case _ => true
      }
      case And(l, r) => mayMatch(h, l) && mayMatch(h, r)
      case _ => true
    }
  }

  /** Row-grain evaluation of the pushed subset inside the reader.
    * Returns true when the filter shape is not one we push (those
    * are never in the pushed array, but stay conservative). */
  private[sources] def evalFilter(f: Filter, get: String => Any): Boolean = {
    def cmp(a: String, v: Any): Option[Int] = {
      val x = get(a)
      if (x == null) None
      else (x, v) match {
        case (l: Long, _) => numOf(v).map(d => java.lang.Double.compare(l.toDouble, d))
        case (i: Int, _) => numOf(v).map(d => java.lang.Double.compare(i.toDouble, d))
        case (d: Double, _) => numOf(v).map(o => java.lang.Double.compare(d, o))
        case (s: UTF8String, vs: String) => Some(s.toString.compareTo(vs))
        case _ => None
      }
    }
    f match {
      case EqualTo(a, v) => cmp(a, v).exists(_ == 0)
      case GreaterThan(a, v) => cmp(a, v).exists(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v).exists(_ >= 0)
      case LessThan(a, v) => cmp(a, v).exists(_ < 0)
      case LessThanOrEqual(a, v) => cmp(a, v).exists(_ <= 0)
      case IsNull(a) => get(a) == null
      case IsNotNull(a) => get(a) != null
      case And(l, r) => evalFilter(l, get) && evalFilter(r, get)
      case _ => true
    }
  }
  private def numOf(v: Any): Option[Double] = v match {
    case l: Long => Some(l.toDouble)
    case i: Int => Some(i.toDouble)
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    case s: Short => Some(s.toDouble)
    case b: Byte => Some(b.toDouble)
    case _ => None
  }

  private[sources] def supportedFilter(f: Filter): Boolean = f match {
    case EqualTo(_, _) | GreaterThan(_, _) | GreaterThanOrEqual(_, _) |
         LessThan(_, _) | LessThanOrEqual(_, _) | IsNull(_) |
         IsNotNull(_) => true
    case And(l, r) => supportedFilter(l) && supportedFilter(r)
    case _ => false
  }
}

/** Entry point registered as format "gseg" (DataSourceRegister via
  * META-INF/services). */
class SegDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gseg"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = SegSource.listSegments(options.get("path"))
    require(files.nonEmpty, "gseg: no .gseg segments under path")
    SegSource.headerOf(files.head).schema
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SegTable(schema, properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

class SegTable(tschema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"gseg:$path"
  override def schema(): StructType = tschema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SegScanBuilder(tschema, path)
}

class SegScanBuilder(full: StructType, path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept the shapes the reader can evaluate; return EVERYTHING as
    * post-scan (the parquet contract): Spark re-checks pushed filters,
    * so a reader bug degrades to wasted rows, never wrong answers,
    * and filter columns stay in the pruned schema. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(SegSource.supportedFilter)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = SegScan(path, required, pushed)
}

case class SegInputPartition(file: String) extends InputPartition

case class SegScan(path: String, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"gseg path=$path ReadColumns=[${required.fieldNames.mkString(",")}] " +
      s"PushedFilters=[${pushed.mkString(", ")}]"

  /** One partition per surviving segment. This is the split-planning
    * hook: header min/max zone maps are consulted against the pushed
    * filters and non-matching FILES never become tasks. (A production
    * source would additionally coalesce small segments into shared
    * splits; segment=split keeps the demo honest.) */
  override def planInputPartitions(): Array[InputPartition] = {
    val files = SegSource.listSegments(path)
    val kept = files.filter(f => {
      val h = SegSource.headerOf(f)
      pushed.forall(SegSource.mayMatch(h, _))
    })
    graft.Counters.add("gseg_files_total", files.size.toLong)
    graft.Counters.add("gseg_files_skipped", (files.size - kept.size).toLong)
    kept.map(SegInputPartition.apply).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    SegReaderFactory(required, pushed)
}

case class SegReaderFactory(required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SegPartitionReader(p.asInstanceOf[SegInputPartition].file,
      required, pushed)
}

/** Decodes ONLY the columns the scan needs (union of projection and
  * pushed-filter references), seeking past every other block, then
  * streams rows through the pushed filters. Column-at-a-time decode
  * into primitive/object arrays, row emission after. */
class SegPartitionReader(file: String, required: StructType,
    pushed: Array[Filter]) extends PartitionReader[InternalRow] {
  import SegSource._

  private val header = headerOf(file)
  private val filterCols: Set[String] = {
    def refs(f: Filter): Seq[String] = f.references.toSeq
    pushed.flatMap(refs).toSet
  }
  private val neededNames: Seq[String] = {
    val req = required.fieldNames.toSeq
    req ++ header.cols.map(_.name).filter(n =>
      filterCols.contains(n) && !req.contains(n))
  }
  // decoded column storage, by needed-column index
  private val colIdx = neededNames.zipWithIndex.toMap
  private val decoded = new Array[Array[Any]](neededNames.size)

  locally {
    val in = new DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(file)))
    try {
      readHeader(in) // position after header
      val n = header.nRows
      header.cols.foreach { cm =>
        colIdx.get(cm.name) match {
          case None => // pruned: seek past the whole block
            var toSkip = cm.bytes
            while (toSkip > 0) {
              val s = in.skip(toSkip)
              if (s <= 0) throw new EOFException(s"gseg: bad skip in $file")
              toSkip -= s
            }
          case Some(ci) =>
            val bitmap = new Array[Byte]((n + 7) / 8)
            in.readFully(bitmap)
            def isNull(i: Int): Boolean =
              (bitmap(i >> 3) & (1 << (i & 7))) != 0
            val vals = new Array[Any](n)
            var i = 0
            cm.tag match {
              case 0 => while (i < n) {
                if (!isNull(i)) vals(i) = in.readLong(); i += 1
              }
              case 1 => while (i < n) {
                if (!isNull(i)) vals(i) = in.readInt(); i += 1
              }
              case 2 => while (i < n) {
                if (!isNull(i)) vals(i) = in.readDouble(); i += 1
              }
              case 3 => while (i < n) {
                if (!isNull(i)) {
                  val b = new Array[Byte](in.readInt())
                  in.readFully(b)
                  vals(i) = UTF8String.fromBytes(b)
                }
                i += 1
              }
            }
            decoded(ci) = vals
        }
      }
    } finally in.close()
  }

  private var row = -1
  private val outIdx: Array[Int] =
    required.fieldNames.map(colIdx)
  private var current: InternalRow = _

  override def next(): Boolean = {
    val n = header.nRows
    while ({ row += 1; row < n }) {
      def get(name: String): Any = decoded(colIdx(name))(row)
      if (pushed.forall(evalFilter(_, get))) {
        val vals = new Array[Any](outIdx.length)
        var i = 0
        while (i < outIdx.length) {
          vals(i) = decoded(outIdx(i))(row); i += 1
        }
        current = new GenericInternalRow(vals)
        return true
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

package graft.sources

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 reader for raw HARP `.bin` chunk streams — S1 on the
  * reference's native format, so a user with on-disk Aeon data queries it
  * directly: `spark.read.format("graft.sources.HarpBinSource")
  * .option("chunkSeconds", 3600).load(chunkFileGlob)`.
  *
  * Scale design: one input partition per chunk file (the natural HARP
  * parallel unit — hour chunks, `combine_pose_id_automated.py:25-44`), and
  * FILE-LEVEL PRUNING from query filters before any byte is read:
  * `time >=/<=/...` bounds skip files whose `[chunkStart, chunkStart +
  * chunkSeconds)` window cannot intersect, and `register = k` skips files
  * whose filename register differs — the engine-side equivalent of the
  * reference's find_chunks catalog pruning. Filters are also re-applied by
  * Spark row-side (we report them as residual), so pruning is purely an
  * I/O optimization and never changes results.
  */
class HarpBinSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HarpBinTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HarpBinTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object HarpBinTable {
  val schema: StructType = StructType(Seq(
    StructField("time", TimestampType, nullable = false),
    StructField("msg_type", IntegerType, nullable = false),
    StructField("register", IntegerType, nullable = false),
    StructField("port", IntegerType, nullable = false),
    StructField("payload", ArrayType(FloatType, containsNull = false),
      nullable = false)))
}

class HarpBinTable(path: String) extends Table with SupportsRead {
  require(path != null, "harpbin source requires a path")
  override def name(): String = s"harpbin($path)"
  override def schema(): StructType = HarpBinTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HarpBinScanBuilder(path, options.getLong("chunkSeconds", 3600L))
}

class HarpBinScanBuilder(path: String, chunkSeconds: Long)
    extends ScanBuilder with SupportsPushDownFilters {
  private var loUs = Long.MinValue
  private var hiUs = Long.MaxValue
  private var register: Option[Int] = None

  private def toUs(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(t.getTime * 1000L + t.getNanos / 1000 % 1000)
    case i: java.time.Instant => Some(i.getEpochSecond * 1000000L + i.getNano / 1000)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach {
      case GreaterThanOrEqual("time", v) => toUs(v).foreach(u => loUs = math.max(loUs, u))
      case GreaterThan("time", v) => toUs(v).foreach(u => loUs = math.max(loUs, u))
      case LessThanOrEqual("time", v) => toUs(v).foreach(u => hiUs = math.min(hiUs, u))
      case LessThan("time", v) => toUs(v).foreach(u => hiUs = math.min(hiUs, u))
      case EqualTo("register", r: Int) => register = Some(r)
      case EqualTo("register", r: Integer) => register = Some(r.intValue())
      case _ => ()
    }
    filters // residual: Spark re-applies row-side; pruning is I/O-only
  }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan =
    new HarpBinScan(path, chunkSeconds, loUs, hiUs, register)
}

class HarpBinScan(path: String, chunkSeconds: Long, loUs: Long, hiUs: Long,
    register: Option[Int]) extends Scan with Batch {
  override def readSchema(): StructType = HarpBinTable.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val hconf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty).flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).filter(f => f.getPath.getName.endsWith(".bin"))
      else Array(st)
    }
    matched.iterator
      .filter { st =>
        val name = st.getPath.getName
        // LAYOUT CONTRACT: a chunk file contains only rows within
        // [chunkStart, chunkStart + chunkSeconds) of its filename
        // timestamp (the reference's hourly writer guarantees this).
        // Pruning is a row FILTER under that contract — a file violating
        // it (writer clock drift, wrong chunkSeconds option) would have
        // its out-of-window rows silently dropped, so chunkSeconds must
        // match the writer's actual chunking.
        val timeOk = HarpBin.chunkStartUs(name).forall { cs =>
          cs <= hiUs && cs + chunkSeconds * 1000000L > loUs
        }
        val regOk = register.forall(r => HarpBin.fileRegister(name).forall(_ == r))
        timeOk && regOk
      }
      .map(st => HarpBinPartition(st.getPath.toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    new HarpBinReaderFactory(conf)
  }
}

case class HarpBinPartition(file: String) extends InputPartition

class HarpBinReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[HarpBinPartition].file
    new HarpBinReader(file, conf.value)
  }
}

class HarpBinReader(file: String, conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val bytes: Array[Byte] = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val len = HarpBinReader.checkedLength(fs.getFileStatus(p).getLen, file)
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    buf
  }
  private val it = HarpBin.decode(bytes)
  private var cur: InternalRow = _

  override def next(): Boolean =
    if (!it.hasNext) false
    else {
      val (tsUs, msgType, register, port, payload) = it.next()
      cur = InternalRow(tsUs, msgType, register, port,
        ArrayData.toArrayData(payload))
      true
    }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}

object HarpBinReader {
  /** The reader buffers one chunk file whole (hour chunks are tens of MB at
    * 50 fps); a file at/over 2 GiB would overflow the Int cast into a
    * negative array size — fail with a clear message instead. */
  def checkedLength(len: Long, file: String): Int = {
    require(len < Int.MaxValue,
      s"HARP chunk file too large to buffer ($len bytes): $file — " +
        "hour chunks are expected to be tens of MB; split the file")
    len.toInt
  }
}

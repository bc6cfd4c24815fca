package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, File, FileOutputStream, RandomAccessFile}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Scratch, Tables}

/** GFWB — a minimal fixed-width binary record format, defined here so the
  * engine has a REAL custom-source surface to connect to (SURVEY §2.1's
  * source tier beyond the built-ins): the [[FwbDataSource]] DataSource V2
  * connector reads it with column pruning and key-range file skipping.
  *
  * Layout per file (parquet-style footer so the WRITER streams — records
  * first, metadata after, never buffered):
  * {{{
  *   record*          n × 25 bytes: orderkey i64 | custkey i64 | cents i64 | prio u8
  *   footer           count i64, minKey i64, maxKey i64,
  *                    dictN i32, dictN × (len i32, utf8 bytes)
  *   tail             footerLen i32, magic i32          (last 8 bytes)
  * }}}
  * All integers big-endian (DataOutput). Prices are stored as EXACT integer
  * cents — the schema exposes `o_cents BIGINT` rather than reconstructing a
  * double, so every downstream aggregate is integer-exact cross-engine.
  * The priority string is dictionary-coded to one byte per record; the
  * bounded domain (5 values) travels in each file's footer, so readers
  * need no side channel.
  */
object FwbFormat {

  val Magic = 0x47465742 // "GFWB"
  val RecordBytes = 25

  val schema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType, nullable = false),
    StructField("o_custkey", LongType, nullable = false),
    StructField("o_cents", LongType, nullable = false),
    StructField("o_orderpriority", StringType, nullable = false)))

  val FixtureFiles = 4

  def fixturePath(dir: String): String =
    Scratch.path(s"fwb_${Scratch.tag(dir)}_pid${ProcessHandle.current.pid}")

  /** Write the orders table as [[FixtureFiles]] range-partitioned GFWB
    * files (disjoint, sorted key ranges per file — the layout that makes
    * footer min/max skipping effective, q97's range-clustering discipline
    * applied to a foreign format). Built once per (process, sf dir) behind
    * the shared marker idiom; each executor task streams its own file.
    */
  def writeFixture(s: SparkSession, dir: String): String = {
    val out = fixturePath(dir)
    Scratch.buildOnce(out) {
      new File(out).mkdirs()
      // bounded-domain dictionary (≤5 distinct priorities), shipped to the
      // writing tasks and embedded in every file footer
      val dict = Tables.orders(s, dir).select("o_orderpriority")
        .distinct().collect().map(_.getString(0)).sorted
      val codeOf = dict.zipWithIndex.toMap
      val bcDict = s.sparkContext.broadcast((dict, codeOf))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("o_cents"),
          col("o_orderpriority"))
        .repartitionByRange(FixtureFiles, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .foreachPartition { (it: Iterator[Row]) =>
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val (d, codes) = bcDict.value
          // Stage under an attempt-unique dot-name, rename into place
          // (FwbWrite's staging idiom): final names are immutable from the
          // moment they exist, so a retried/speculative attempt can never
          // truncate a file a concurrent reader — or the streaming
          // reader's append-only listing — already trusts (ADVICE r11).
          val staged = new File(s"$out/.part-$pid.attempt-${tc.taskAttemptId()}.gfwb")
          if (writeFile(staged.getPath, it, d, codes)) {
            val fin = new File(s"$out/part-$pid.gfwb")
            if (!staged.renameTo(fin) && !fin.exists())
              throw new java.io.IOException(s"rename failed: $staged -> $fin")
          }
        }
    }
    out
  }

  /** Returns false (writing nothing) for an empty partition. */
  private[graft] def writeFile(path: String, it: Iterator[Row],
      dict: Array[String], codeOf: Map[String, Int]): Boolean = {
    if (!it.hasNext) return false
    val o = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      var n = 0L
      var minKey = Long.MaxValue
      var maxKey = Long.MinValue
      it.foreach { r =>
        val k = r.getLong(0)
        o.writeLong(k); o.writeLong(r.getLong(1)); o.writeLong(r.getLong(2))
        o.writeByte(codeOf(r.getString(3)))
        n += 1; if (k < minKey) minKey = k; if (k > maxKey) maxKey = k
      }
      writeFooter(o, n, minKey, maxKey, dict)
    } finally o.close()
    true
  }

  /** The ONE footer serializer — shared by the fixture writer above and
    * the V2 sink's task writer ([[FwbWrite]]), so the footerLen
    * accounting and [[readFooter]]'s seek arithmetic can never drift
    * between the two write paths.
    */
  private[graft] def writeFooter(o: DataOutputStream, n: Long,
      minKey: Long, maxKey: Long, dict: Iterable[String]): Unit = {
    var footerLen = 8 + 8 + 8 + 4
    o.writeLong(n); o.writeLong(minKey); o.writeLong(maxKey)
    o.writeInt(dict.size)
    dict.foreach { w =>
      val b = w.getBytes("UTF-8")
      o.writeInt(b.length); o.write(b)
      footerLen += 4 + b.length
    }
    o.writeInt(footerLen); o.writeInt(Magic)
  }

  /** Per-file footer as planning metadata: (count, minKey, maxKey, dict). */
  def readFooter(path: String): (Long, Long, Long, Array[String]) = {
    val f = new RandomAccessFile(path, "r")
    try {
      f.seek(f.length - 8)
      val footerLen = f.readInt()
      require(f.readInt() == Magic, s"$path: bad GFWB magic")
      f.seek(f.length - 8 - footerLen)
      val n = f.readLong(); val minKey = f.readLong(); val maxKey = f.readLong()
      val dict = Array.fill(f.readInt()) {
        val b = new Array[Byte](f.readInt()); f.readFully(b); new String(b, "UTF-8")
      }
      (n, minKey, maxKey, dict)
    } finally f.close()
  }
}

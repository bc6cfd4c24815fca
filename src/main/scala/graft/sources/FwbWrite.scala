package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, File, FileOutputStream}
import java.util.UUID

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** DataSource V2 WRITE path for GFWB — the sink half of the connector,
  * with the two-phase commit protocol a distributed sink needs to be
  * exactly-once at the job level:
  *
  *  - each task ATTEMPT streams its partition into its own STAGED file
  *    (`.<uuid>-<partition>-<task>.gfwb.tmp` — dot-prefixed and
  *    wrong-suffixed, so the read path's `*.gfwb` listing can never see
  *    it, and attempt-unique, so retries/speculation never share a file),
  *  - task commit returns the staged path as its [[WriterCommitMessage]],
  *  - job `commit` renames every staged file to its final name in one
  *    driver-side pass (plus, under truncate/overwrite, deletes the
  *    previous generation first),
  *  - job `abort` deletes the staged files and leaves the previous
  *    generation untouched.
  *
  * A failed or speculative task therefore contributes nothing visible;
  * a failed JOB leaves the destination exactly as it was (FwbSourceSpec
  * injects a mid-write failure and pins both). The per-file priority
  * dictionary is built order-of-appearance per task (≤255 values — the
  * byte code's contract, enforced loudly), so writers need no global
  * coordination: the footer makes each file self-describing.
  */
private[sources] class FwbWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new FwbWrite(path, info.schema(), doTruncate)
}

private[sources] class FwbWrite(path: String, schema: StructType, truncate: Boolean)
    extends Write with BatchWrite {
  require(schema.fieldNames.sameElements(FwbFormat.schema.fieldNames) &&
    schema.fields.map(_.dataType).sameElements(FwbFormat.schema.fields.map(_.dataType)),
    s"graft-fwb expects schema ${FwbFormat.schema.simpleString}, got ${schema.simpleString}")

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    new File(path).mkdirs()
    new FwbWriterFactory(path, UUID.randomUUID().toString)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.collect { case FwbCommitMessage(p) if p != null => new File(p) }
    if (truncate) {
      Option(new File(path).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".gfwb")).foreach(_.delete())
    }
    staged.foreach { f =>
      // .<uuid>-<pid>.gfwb.tmp → part-<uuid>-<pid>.gfwb
      val fin = new File(f.getParent,
        "part-" + f.getName.stripPrefix(".").stripSuffix(".tmp"))
      require(f.renameTo(fin), s"commit rename failed: $f -> $fin")
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case FwbCommitMessage(p) if p != null => new File(p).delete()
      case _ =>
    }
}

private[sources] case class FwbCommitMessage(stagedPath: String)
    extends WriterCommitMessage

private[sources] class FwbWriterFactory(path: String, writeId: String)
    extends DataWriterFactory {
  // taskId in the staged name keeps retried/speculative ATTEMPTS of the
  // same partition on disjoint files: the losing attempt's abort deletes
  // only its own stage, and only the attempt whose commit message reaches
  // the driver gets promoted — without it, attempt B would truncate the
  // file attempt A is still writing
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FwbDataWriter(s"$path/.$writeId-$partitionId-$taskId.gfwb.tmp")
}

private[sources] class FwbDataWriter(staged: String) extends DataWriter[InternalRow] {
  private var out: DataOutputStream = _
  private val dict = mutable.LinkedHashMap.empty[String, Int]
  private var n = 0L
  private var minKey = Long.MaxValue
  private var maxKey = Long.MinValue

  override def write(row: InternalRow): Unit = {
    if (out == null) // empty partitions never create a file
      out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(staged)))
    val k = row.getLong(0)
    out.writeLong(k); out.writeLong(row.getLong(1)); out.writeLong(row.getLong(2))
    val prio = row.getUTF8String(3).toString
    val code = dict.getOrElseUpdate(prio, {
      require(dict.size < 256, "GFWB dictionary overflow: >255 distinct priority values")
      dict.size
    })
    out.writeByte(code)
    n += 1; if (k < minKey) minKey = k; if (k > maxKey) maxKey = k
  }

  override def commit(): WriterCommitMessage = {
    if (out == null) return FwbCommitMessage(null)
    FwbFormat.writeFooter(out, n, minKey, maxKey, dict.keys)
    out.close(); out = null
    FwbCommitMessage(staged)
  }

  override def abort(): Unit = {
    if (out != null) { out.close(); out = null }
    new File(staged).delete()
  }

  override def close(): Unit =
    if (out != null) { out.close(); out = null }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.lit
import graft.media.MediaFunctions
import graft.media.MediaFunctions.MediaRecord

/** The multimodal plumbing around the stubbed decode: typed schemas,
  * per-partition batch iteration, partition preservation, determinism —
  * everything that stays when a real codec replaces the stub.
  */
class MediaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def records() = {
    import spark.implicits._
    Tables.documents(spark, sf)
      .selectExpr("doc_id as id", "cast(text as binary) as payload", "'text/plain' as format")
      .as[MediaRecord]
  }

  test("decodeFrames: one output per record, stable schema, deterministic") {
    val recs = records()
    val d1 = MediaFunctions.decodeFrames(recs)
    assert(d1.count() == recs.count())
    assert(d1.schema.fieldNames.toSeq ==
      Seq("id", "width", "height", "n_pixels", "checksum"))
    val a = d1.collect().sortBy(_.id).map(_.checksum).toSeq
    val b = MediaFunctions.decodeFrames(recs).collect().sortBy(_.id).map(_.checksum).toSeq
    assert(a == b)
    assert(d1.collect().forall(f => f.n_pixels == f.width.toLong * f.height))
  }

  test("decodeFrames: narrow transformation — partitioning preserved, no added shuffle") {
    def exchanges(plan: String): Int = "Exchange".r.findAllIn(plan).length
    val recs = records().repartition(6)
    val decoded = MediaFunctions.decodeFrames(recs)
    assert(decoded.rdd.getNumPartitions == 6)
    // the only Exchange is the repartition(6) above — decode adds none
    assert(exchanges(decoded.queryExecution.executedPlan.toString) ==
      exchanges(recs.queryExecution.executedPlan.toString))
  }

  test("resizePayloads: size bounded by cap, small payloads untouched, deterministic") {
    val recs = records()
    val cap = 64
    val resized = MediaFunctions.resizePayloads(recs, cap).collect()
    val orig = recs.collect().map(r => r.id -> r.payload).toMap
    assert(resized.length == orig.size)
    resized.foreach { r =>
      assert(r.payload.length <= cap, s"id=${r.id} len=${r.payload.length}")
      if (orig(r.id).length <= cap)
        assert(r.payload.sameElements(orig(r.id)), s"small payload ${r.id} must pass through")
      else {
        // subsample keeps bytes at stride positions, starting at 0
        val stride = (orig(r.id).length + cap - 1) / cap
        assert(r.payload(0) == orig(r.id)(0))
        assert(r.payload(1) == orig(r.id)(stride))
      }
    }
    val again = MediaFunctions.resizePayloads(recs, cap).collect()
      .sortBy(_.id).map(_.payload.toSeq).toSeq
    assert(again == resized.sortBy(_.id).map(_.payload.toSeq).toSeq)
  }

  test("sampleFrames: offsets stride correctly and stay in payload bounds") {
    import spark.implicits._
    val sampled = MediaFunctions.sampleFrames(records(), frameSize = 16, stride = 4)
    val byId = sampled.collect().groupBy(_.id)
    assert(byId.nonEmpty)
    val lens = records().collect().map(r => r.id -> r.payload.length).toMap
    byId.foreach { case (id, frames) =>
      val idxs = frames.map(_.frame_idx).sorted
      assert(idxs.toSeq == (0 until frames.length).toSeq)
      frames.foreach { f =>
        assert(f.offset == f.frame_idx.toLong * 16 * 4)
        assert(f.offset + 16 <= lens(id))
      }
    }
  }

  test("extractFeatures: fixed-width vectors whose mass equals the payload size") {
    val feats = MediaFunctions.extractFeatures(records()).collect()
    val lens = records().collect().map(r => r.id -> r.payload.length.toLong).toMap
    assert(feats.length == lens.size)
    feats.foreach { f =>
      assert(f.hist.length == 16)           // fixed-width output contract
      assert(f.hist.sum == f.n_bytes)       // every byte lands in one bin
      assert(f.n_bytes == lens(f.id))
      assert(f.hist.forall(_ >= 0))
    }
    // deterministic across runs
    val again = MediaFunctions.extractFeatures(records()).collect()
      .sortBy(_.id).map(_.hist.toSeq).toSeq
    assert(again == feats.sortBy(_.id).map(_.hist.toSeq).toSeq)
  }

  test("aHash: values stay in 60-bit range and exact duplicates collide") {
    val hs = MediaFunctions.aHashes(records()).collect().map(h => h.id -> h.ahash).toMap
    assert(hs.values.forall(h => h >= 0 && h < (1L << 60)))
    // identical payloads must produce identical fingerprints
    val texts = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    for ((a, ta) <- texts; (b, tb) <- texts if a < b && ta == tb)
      assert(hs(a) == hs(b), s"exact dup $a/$b must collide")
  }

  test("q147 banding finds every pair all-pairs Hamming finds (recall 1 at <= 3)") {
    import spark.implicits._
    val got = graft.media.MediaQueries.q147ImageNearDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hs = MediaFunctions.aHashes(
      MediaFunctions.resizePayloads(
        Tables.documents(spark, sf).select($"doc_id".as("id"),
          $"text".cast("binary").as("payload"), lit("fake").as("format"))
          .as[MediaFunctions.MediaRecord], cap = 64)).collect()
    val want = (for {
      a <- hs; b <- hs if a.id < b.id
      d = java.lang.Long.bitCount(a.ahash ^ b.ahash) if d <= 3
    } yield (a.id, b.id, d.toLong)).toSet
    assert(got == want)
    assert(want.nonEmpty, "test corpus must contain at least one near-dup pair")
  }
}

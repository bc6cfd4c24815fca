package graft

import org.apache.spark.sql.functions.{month, year}
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.EtlQueries

/** The partition-scoping claim of q132's MERGE path is physical: a CDC
  * batch touching (1997, 1–2) must leave every other partition's files
  * byte-for-byte untouched — not just value-equal. The oracle pins the
  * merged values; this spec pins the IO scope.
  */
class UpsertSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def md5(f: java.io.File): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(f.toPath))
      .map(b => f"$b%02x").mkString

  /** relative-path → content-md5 of every data file under the lake root */
  private def snapshot(root: java.io.File): Map[String, String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else Seq(f)
    walk(root)
      .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
      .map(f => root.toPath.relativize(f.toPath).toString -> md5(f))
      .toMap
  }

  test("q132 upsert rewrites only the touched partitions; untouched files are byte-identical") {
    import spark.implicits._
    val out = EtlQueries.upsertLakePath(sf)
    EtlQueries.writeUpsertBase(spark, sf, out)
    val root = new java.io.File(out)
    val before = snapshot(root)
    assert(before.nonEmpty)

    EtlQueries.applyUpsert(spark, out, EtlQueries.upsertCdc(spark, sf),
      $"o_year" === 1997 && $"o_month" <= 2)
    val after = snapshot(root)

    def touched(p: String) =
      p.startsWith("o_year=1997/o_month=1/") || p.startsWith("o_year=1997/o_month=2/")
    // untouched partitions: same file set, same bytes
    assert(before.filterNot(kv => touched(kv._1)) == after.filterNot(kv => touched(kv._1)),
      "untouched partition files must be byte-identical across the upsert")
    // touched partitions really were rewritten (new file names under overwrite)
    assert(before.keys.exists(touched) && after.keys.exists(touched))
    assert(before.view.filterKeys(touched).toMap != after.view.filterKeys(touched).toMap,
      "touched partitions must change")

    // merged content: every update key flipped to U, inserts present,
    // row count = base + inserts (updates replace, never duplicate)
    val cur = spark.read.parquet(out).cache()
    try {
      val window = Tables.orders(spark, sf)
        .filter(year($"o_orderdate") === 1997 && month($"o_orderdate") <= 2)
      val expU = window.filter($"o_orderkey" % 10 === 0).count()
      val expI = window.filter($"o_orderkey" % 100 === 0).count()
      val baseN = Tables.orders(spark, sf).count()
      assert(expU > 0 && expI > 0, "fixture must exercise both update and insert paths")
      assert(cur.filter($"o_orderstatus" === "U").count() == expU)
      assert(cur.filter($"o_orderstatus" === "I").count() == expI)
      assert(cur.count() == baseN + expI)
    } finally cur.unpersist()
  }
}

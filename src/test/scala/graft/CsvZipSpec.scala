package graft

import graft.export.CsvZip
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

class CsvZipSpec extends SparkSpec {
  import spark.implicits._

  test("zip export: one csv per series + manifest, ;-sep, 8-dp floats") {
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    val df = Seq(
      ("a", t0, 1.5), ("a", t0.plusHours(1), 2.25),
      ("b", t0, 3.0))
      .toDF("kind", "ts", "value")
    val out = java.nio.file.Files.createTempDirectory("csvzip").toString + "/export.zip"
    val manifest = CsvZip.export(df, Seq("kind"), out)
    assert(manifest.length === 2)
    val zf = new ZipFile(out)
    try {
      val names = zf.entries().asScala.map(_.getName).toSet
      assert(names === Set("export_serie_0.csv", "export_serie_1.csv", "content_summary.csv"))
      val bodies = zf.entries().asScala.map { e =>
        e.getName -> new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
      }.toMap
      // series are collected per key; find the "a" one via the manifest
      val aIdx = manifest.find(_._2("kind") == "a").get._1
      val aBody = bodies(s"export_serie_$aIdx.csv")
      assert(aBody.startsWith("ts;value\n"))
      assert(aBody.contains(";1.50000000\n") && aBody.contains(";2.25000000\n"))
      // pandas to_csv datetime format, not LocalDateTime.toString
      assert(aBody.contains("2024-01-01 00:00:00;1.50000000\n"))
      assert(aBody.contains("2024-01-01 01:00:00;2.25000000\n"))
      val summary = bodies("content_summary.csv")
      assert(summary.startsWith("serie;kind;n_points\n"))
      assert(summary.contains(s"export_serie_$aIdx;a;2\n"))
    } finally zf.close()
  }

  test("zip export refuses selections beyond maxSeries (driver-bomb guard)") {
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    val df = Seq(("a", t0, 1.0), ("b", t0, 2.0), ("c", t0, 3.0))
      .toDF("kind", "ts", "value")
    val out = java.nio.file.Files.createTempDirectory("csvzipg").toString + "/export.zip"
    val e = intercept[IllegalArgumentException](
      CsvZip.export(df, Seq("kind"), out, maxSeries = 2))
    assert(e.getMessage.contains("exportDistributed"))
    // within the limit still works
    assert(CsvZip.export(df, Seq("kind"), out, maxSeries = 3).length === 3)
  }

  test("distributed export: executor-written per-key csv dirs + manifest, no driver collect") {
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00")
    val df = Seq(
      ("a", t0, 1.5), ("a", t0.plusHours(1), 2.25),
      ("b", t0, 3.0))
      .toDF("kind", "ts", "value")
    val out = java.nio.file.Files.createTempDirectory("csvdist").toString
    CsvZip.exportDistributed(df, Seq("kind"), out)
    val aDir = new java.io.File(s"$out/series/kind=a")
    assert(aDir.isDirectory)
    val aBody = aDir.listFiles().filter(_.getName.endsWith(".csv"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")).mkString
    assert(aBody.contains("2024-01-01 00:00:00;1.50000000"))
    assert(aBody.contains("2024-01-01 01:00:00;2.25000000"))
    val manifest = new java.io.File(s"$out/content_summary").listFiles()
      .filter(_.getName.endsWith(".csv"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")).mkString
    assert(manifest.contains("a;2") && manifest.contains("b;1"))
  }
}

package graft.export

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Admin CSV/zip export parity (reference
  * hostore/admin_actions.py:15-123): each selected series becomes
  * `export_serie_<i>.csv` (`;`-separated, fixed 8-dp floats) plus a
  * `content_summary.csv` manifest, all zipped.
  *
  * Distributed shape: the per-series CSV bodies are produced by ONE Spark
  * job (groupBy key → sorted lines per series); only the final zip
  * assembly is driver-side, because a zip file is inherently a
  * single-writer sink. For lakehouse-scale exports use
  * `df.write.partitionBy(keys).csv(...)` instead — this module exists for
  * byte-format parity with the reference's admin action.
  */
object CsvZip {

  private val CsvTsFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Export `df` (keys..., ts, value) as the reference's zip layout.
    * Returns the manifest rows (serie index, key values, n points).
    *
    * This path collects every selected series to the driver (a zip file
    * is a single-writer sink) — it exists for byte parity with the
    * reference's admin action on SMALL selections. `maxSeries` refuses a
    * selection that would materialize more than that many series
    * driver-side (checked via `limit(maxSeries+1)` on the aggregated
    * frame — no extra job, bounded memory); point big exports at
    * [[exportDistributed]].
    */
  def export(df: DataFrame, keys: Seq[String], outFile: String,
      tsCol: String = "ts", valueCol: String = "value",
      maxSeries: Int = 10000): Seq[(Int, Map[String, String], Long)] = {
    require(maxSeries >= 1, "maxSeries must be >= 1")
    // one job: per-series sorted (ts;value) lines
    val perSeries = df
      .groupBy(keys.map(col): _*)
      .agg(
        sort_array(collect_list(struct(col(tsCol), col(valueCol)))).as("pts"),
        count(lit(1)).as("n"))
      .limit(maxSeries + 1)
      .collect()
    if (perSeries.length > maxSeries)
      throw new IllegalArgumentException(
        s"CsvZip.export: selection exceeds $maxSeries series — the zip export is a " +
          "driver-side admin path; use CsvZip.exportDistributed for large exports")

    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(outFile)))
    val manifest = scala.collection.mutable.ListBuffer.empty[(Int, Map[String, String], Long)]
    try {
      perSeries.zipWithIndex.foreach { case (row, i) =>
        val attrs = keys.map(k => k -> String.valueOf(row.getAs[Any](k))).toMap
        val pts = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("pts")
        zos.putNextEntry(new ZipEntry(s"export_serie_$i.csv"))
        val header = s"$tsCol;$valueCol\n"
        zos.write(header.getBytes("UTF-8"))
        pts.foreach { p =>
          // pandas to_csv datetime format (admin_actions.py exports via
          // pandas): "yyyy-MM-dd HH:mm:ss", not LocalDateTime.toString's
          // ISO "yyyy-MM-ddTHH:mm"
          val t = p.get(0) match {
            case l: java.time.LocalDateTime => l.format(CsvTsFmt)
            case other                      => String.valueOf(other)
          }
          val v = p.get(1) match {
            case null      => ""
            case d: Double => f"$d%.8f"
            case other     => String.valueOf(other)
          }
          zos.write(s"$t;$v\n".getBytes("UTF-8"))
        }
        zos.closeEntry()
        manifest += ((i, attrs, row.getAs[Long]("n")))
      }
      // content_summary.csv manifest (admin_actions.py:55-64)
      zos.putNextEntry(new ZipEntry("content_summary.csv"))
      zos.write((s"serie;${keys.mkString(";")};n_points\n").getBytes("UTF-8"))
      manifest.foreach { case (i, attrs, n) =>
        zos.write((s"export_serie_$i;${keys.map(attrs).mkString(";")};$n\n").getBytes("UTF-8"))
      }
      zos.closeEntry()
    } finally zos.close()
    manifest.toList
  }

  /** Scale-path export: per-key CSV files written by the EXECUTORS
    * (`partitionBy(keys)`), plus a manifest job — nothing is ever
    * collected to the driver, so this is the form to point at a big
    * store (the zip form above is admin-parity for small selections;
    * a zip file is a single-writer sink by construction).
    *
    * Layout: `outDir/<k1>=<v1>/.../part-*.csv` with `;` separator and
    * the reference's 8-dp float / pandas timestamp formats, and
    * `outDir/content_summary/` as a one-file CSV of
    * (keys..., n_points) per series.
    */
  def exportDistributed(
      df: DataFrame,
      keys: Seq[String],
      outDir: String,
      tsCol: String = "ts",
      valueCol: String = "value"): Unit = {
    val body = df.select(
      keys.map(col) :+
        date_format(col(tsCol), "yyyy-MM-dd HH:mm:ss").as(tsCol) :+
        format_number(col(valueCol).cast("double"), 8).as(valueCol): _*)
      // format_number inserts thousands separators — strip to plain 8-dp
      .withColumn(valueCol, regexp_replace(col(valueCol), ",", ""))
    body
      .repartition(keys.map(col): _*)
      .sortWithinPartitions((keys.map(col) :+ col(tsCol)): _*)
      .write.mode("overwrite")
      .option("sep", ";")
      .option("header", "true")
      .partitionBy(keys: _*)
      .csv(s"$outDir/series")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_points"))
      .orderBy(keys.map(col): _*)
      .coalesce(1)
      .write.mode("overwrite")
      .option("sep", ";")
      .option("header", "true")
      .csv(s"$outDir/content_summary")
  }
}

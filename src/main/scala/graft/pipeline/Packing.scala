package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining exports — the concat-then-split
  * layout: documents are laid end-to-end in a deterministic order and the
  * token stream is cut into fixed-`budget` sequences, so every training
  * sequence is full (no padding waste) and a document may straddle two
  * adjacent sequences.
  *
  * Distributed shape: the corpus is first hash-sharded
  * ([[Sampling.shardAssign]] — portable, repartition-proof), then the
  * running token offset is a window `sum` PER SHARD, ordered by the
  * salted portable hash of the doc id (a deterministic "shuffle": the
  * pack order is well-mixed but identical on every engine and rerun).
  * The only sort is per-shard, and `numShards` is chosen so a shard's
  * doc-count fits a task — at 100 TB you raise `numShards`, never the
  * size of any single sort. No global window, no driver state.
  *
  * Output, one row per surviving document: `(id, shard, n_tokens,
  * start_off, pack_first, pack_last)` — `start_off` is the document's
  * first-token offset in its shard's stream, `pack_first`/`pack_last`
  * the fixed-size sequences it lands in (`pack_last > pack_first` ⇔ the
  * document straddles a boundary). Zero-token documents are dropped (a
  * real pipeline filters empties before packing; keeping them would make
  * `pack_last = pack_first - 1` nonsense rows).
  */
object Packing {

  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      numShards: Int,
      salt: String = "pack"): DataFrame =
    packTokenCounts(
      df.select(col(idCol).as("id"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens")),
      "id", "n_tokens", budget, numShards, salt)
      .select("id", "shard", "n_tokens", "start_off", "pack_first", "pack_last")

  /** Packing over a PRE-COMPUTED token-count column — the composition
    * form ([[graft.pipeline.Curation.curate]] counts tokens once in the
    * same projection as its content hash, so the corpus text is never
    * re-read here). Appends (shard, start_off, pack_first, pack_last)
    * to the input's columns; zero-token rows are dropped.
    */
  def packTokenCounts(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Int,
      numShards: Int,
      salt: String = "pack"): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val sharded = Sampling.shardAssign(
      df.filter(col(tokensCol) > 0), idCol, numShards, salt)
    val order = Window.partitionBy(col("shard"))
      .orderBy(Sampling.hashScore(col(idCol), salt), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded
      .withColumn("start_off", coalesce(sum(col(tokensCol)).over(order), lit(0L)))
      .withColumn("pack_first", expr(s"start_off div ${budget.toLong}"))
      .withColumn("pack_last", expr(s"(start_off + `$tokensCol` - 1) div ${budget.toLong}"))
  }

  /** Materialize a packed export a trainer consumes directly: join the
    * packing manifest back to the document bodies and write parquet
    * partitioned by `shard`, one file per shard, rows in pack order
    * (`start_off`) within the file — so a sequential read of a shard's
    * file IS the concatenated token stream, no trainer-side sort. Bodies
    * are shuffled exactly once (the repartition-by-shard that also
    * collapses each shard to one task/file); the manifest side is the
    * narrow frame. At 100 TB, `numShards` (chosen at pack time) bounds
    * every task's sort and file size — raise shards, never file size.
    * Returns the per-shard row/token totals (the export's receipt).
    */
  def writePacked(
      packed: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      outDir: String): DataFrame = {
    packed.join(docs.select(col(idCol).as("id"), col(textCol).as("text")), Seq("id"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("start_off"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    // receipt from the narrow manifest alone — consuming it must not
    // re-run the body join the write already paid for
    packed.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy("shard")
  }
}

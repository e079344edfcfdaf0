package graft.pipeline

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and sharding for training-data pipelines.
  *
  * `DataFrame.sample` is seed-, partitioning- and scan-order-dependent:
  * re-running after a repartition (or on a different cluster size) keeps
  * DIFFERENT rows, which poisons dataset reproducibility and dedup-split
  * hygiene (a train/test split must not move when the pipeline reruns).
  * These operators decide membership from a portable content hash of the
  * row id alone (graft.functions.PortableHash — md5-based, identical in
  * any engine): stable under reruns, repartitioning, and engine swaps,
  * and verifiable row-for-row by the DuckDB oracle.
  *
  * All are narrow per-row predicates/projections — no shuffle, no state;
  * they compose with any scan and survive any scale.
  */
object Sampling {

  /** Salts are embedded verbatim in the DuckDB twin's SQL string literal
    * ([[sqlHashScore]]); restrict them to characters that cannot break
    * out of a single-quoted literal so the two engines can never
    * silently diverge on an exotic salt.
    */
  private def checkSalt(salt: String): Unit =
    require(
      salt.matches("[A-Za-z0-9_:.\\-]*"),
      s"salt must match [A-Za-z0-9_:.-]* (it is embedded in oracle SQL), got '$salt'")

  /** Membership score in [0, 1): position of the salted id hash on the
    * unit interval. The salt namespaces decisions (the sample keep-set,
    * the shard id, and a train/test split must be independent).
    */
  def hashScore(id: Column, salt: String): Column = {
    checkSalt(salt)
    PortableHash.hashMod(concat(lit(s"$salt:"), id.cast("string")))
      .cast("double") / lit(PortableHash.P.toDouble)
  }

  /** DuckDB twin of [[hashScore]]. */
  def sqlHashScore(idExpr: String, salt: String): String = {
    checkSalt(salt)
    s"(CAST(${PortableHash.sqlHashMod(s"('$salt:' || CAST($idExpr AS VARCHAR))")} AS DOUBLE) / ${PortableHash.P})"
  }

  /** Keep ~`fraction` of rows, decided per row id — deterministic and
    * repartition-proof.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double, salt: String = "sample"): DataFrame =
    df.filter(hashScore(col(idCol), salt) < fraction)

  /** Stratified variant: per-stratum keep fractions (e.g. downsample the
    * dominant language), absent strata fall back to `defaultFraction`.
    * The fractions table is a literal when-chain — no join, stays narrow.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double,
      salt: String = "sample"): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(hashScore(col(idCol), salt) < frac)
  }

  /** Stable shard assignment in [0, numShards) — the training-export
    * "shuffle": downstream readers stream shard files in any order and
    * get a deterministic, well-mixed permutation of the corpus.
    */
  def shardAssign(df: DataFrame, idCol: String, numShards: Int, salt: String = "shard"): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    checkSalt(salt)
    df.withColumn("shard",
      pmod(PortableHash.hashMod(concat(lit(s"$salt:"), col(idCol).cast("string"))), lit(numShards.toLong)))
  }
}

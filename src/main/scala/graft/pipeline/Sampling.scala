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

  /** EXACT stratified proportional split — per stratum, allocate rows to
    * named splits in exactly the largest-remainder (Hamilton) counts for
    * the given fractions: a stratum of n rows sends floor(n·f_k) rows to
    * split k, plus one extra to the splits with the largest fractional
    * remainders (ties → earlier split in `splits` order) until the
    * counts sum to n. Assignment order is the salted portable hash (id
    * tiebreak), so the split is deterministic, repartition-proof, and
    * engine-replayable — and unlike [[stratifiedSample]]'s hash
    * thresholds, the per-stratum counts are EXACT, not binomial.
    *
    * Scale shape (the capPerDomain discipline, extended from top-N to
    * full ranking): no whole-stratum window. Rows rank within
    * (stratum, salt-bucket) — `numBuckets` deterministic hash buckets,
    * each window bounded by ~stratum/numBuckets — and the global
    * per-stratum rank is the in-bucket rank plus the exclusive prefix
    * sum of preceding buckets' counts, joined back from a
    * one-row-per-(stratum, bucket) frame. Total order: (bucket, hash,
    * id) — hash-derived, so it is a uniform permutation of the stratum.
    * The split thresholds derive from the per-stratum counts frame
    * (one row per stratum) — everything joined back is metadata-sized.
    *
    * Contract: the stratum column must be non-null (a null stratum has
    * no defined allocation; such rows would silently drop at the
    * metadata joins, so the operator filters them out explicitly and a
    * caller who cares routes nulls to a sentinel stratum first).
    *
    * Output: df's columns + `split`.
    */
  def stratifiedSplit(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      splits: Seq[(String, Double)],
      salt: String = "split",
      numBuckets: Int = 64): DataFrame = {
    checkSalt(salt)
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 >= 0) && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must be >= 0 and sum to 1, got $splits")
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val k = splits.size
    val h = PortableHash.hashMod(concat(lit(s"$salt:"), col(idCol).cast("string")))
    val base = df.filter(col(strataCol).isNotNull).withColumn("__h", h)
      .withColumn("__bkt", pmod(col("__h"), lit(numBuckets.toLong)))
    // per-(stratum, bucket) counts -> exclusive prefix offsets; the
    // window runs over numBuckets rows per stratum (metadata-sized)
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("__bkt"))
    val offsets = base.groupBy(col(strataCol), col("__bkt"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__off", coalesce(
        sum(col("__bn")).over(wOff.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col(strataCol), col("__bkt"), col("__off"))
    // per-stratum totals -> largest-remainder CUMULATIVE thresholds:
    // rank k's rows are those with threshold_{k-1} <= rank < threshold_k
    val totals = base.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    // floor targets and remainders per split, as columns (k is tiny)
    val withTargets = splits.zipWithIndex.foldLeft(totals) {
      case (acc, ((_, f), i)) => acc
        .withColumn(s"__fl$i", floor(col("__n") * f).cast("long"))
        .withColumn(s"__rem$i", col("__n") * f - floor(col("__n") * f))
    }
    // leftover = n - sum(floors); split i gets +1 iff its remainder rank
    // (desc, ties -> lower i) < leftover. Rank computed by counting
    // strictly-greater remainders (and equal-remainder earlier splits).
    val leftover = col("__n") - (0 until k).map(i => col(s"__fl$i")).reduce(_ + _)
    val withBonus = (0 until k).foldLeft(withTargets.withColumn("__left", leftover)) {
      case (acc, i) =>
        val rank = (0 until k).filter(_ != i).map { j =>
          // earlier splits win remainder ties: for j < i a tie counts
          // against i (>=); for j > i it doesn't (strict >)
          val beats = if (j < i) col(s"__rem$j") >= col(s"__rem$i")
                      else col(s"__rem$j") > col(s"__rem$i")
          when(beats, 1L).otherwise(0L)
        }.reduceOption(_ + _).getOrElse(lit(0L))
        acc.withColumn(s"__tgt$i", col(s"__fl$i") + when(rank < col("__left"), 1L).otherwise(0L))
    }
    // cumulative thresholds c_i = sum of targets 0..i
    val withCums = (0 until k).foldLeft(withBonus) { case (acc, i) =>
      acc.withColumn(s"__c$i", (0 to i).map(j => col(s"__tgt$j")).reduce(_ + _))
    }
    val thresholds = withCums.select(
      (col(strataCol) +: (0 until k).map(i => col(s"__c$i"))): _*)
    // in-bucket rank (bounded window) + bucket offset = global rank
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol), col("__bkt"))
      .orderBy(col("__h"), col(idCol))
    val ranked = base
      .withColumn("__r", row_number().over(wIn).cast("long") - 1L)
      .join(offsets, Seq(strataCol, "__bkt"))
      .withColumn("__rank", col("__r") + col("__off"))
      .join(thresholds, Seq(strataCol))
    val splitCol = (k - 1 to 0 by -1).foldLeft(lit(splits.last._1)) {
      case (acc, i) => when(col("__rank") < col(s"__c$i"), lit(splits(i)._1)).otherwise(acc)
    }
    ranked.withColumn("split", splitCol)
      .drop((Seq("__h", "__bkt", "__r", "__off", "__rank") ++ (0 until k).map(i => s"__c$i")): _*)
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

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine hashed linear classifier — the fastText-style quality/
  * language gate every pre-training pipeline fronts its corpus with
  * (predict a binary label from a hashed bag of uni+bigram features),
  * trained by full-batch gradient descent INSIDE the engine (`iters`
  * steps — the headline queries run 12; the parameter default is 2).
  *
  * Shape per iteration (the k-means pattern applied to GD): the weight
  * vector is `numBuckets` values, collected to the driver and embedded
  * as an ARRAY LITERAL in the next pass — margins are a pure codegen'd
  * projection over the per-(doc, bucket) count table (no join), and the
  * gradient is ONE bucket aggregation. The corpus text is read once
  * (the feature explode is checkpointed — at most one (doc, bucket,
  * cnt) row per doc-bucket pair); nothing doc-sized ever reaches the
  * driver.
  *
  * Determinism (the q_kmeans_inertia discipline, applied to training):
  * every aggregation is exact-integer — the margin is Σ cnt·w_micro in
  * decimal(38,0); the per-doc residual is quantized to integer
  * micro-units BEFORE the gradient sum (probabilities are rounded to
  * 6 dp, so (p − y)·1e6 is exact); the weight update is one fixed
  * double chain rounded back to micro-units on the driver. Training is
  * bit-reproducible at any partition count, and the DuckDB oracle
  * replays the identical unrolled iterations.
  */
object Classifier {

  /** Hashed bag-of-features counts: (id, bucket, cnt) — one row per
    * occupied bucket per doc, via the DSIR uni+bigram bucket machinery
    * (one md5 per token, bigram hashes derived arithmetically).
    */
  def features(df: DataFrame, idCol: String, textCol: String, numBuckets: Int): DataFrame =
    Curation.featureBuckets(df, idCol, textCol, numBuckets)
      .groupBy("id", "bucket").agg(count(lit(1)).as("cnt"))

  /** [[features]] plus the intercept: virtual bucket `numBuckets` hit
    * once by EVERY doc (so the weight vector has numBuckets+1 entries
    * and a doc with no text features still carries the bias row).
    */
  private def featuresWithBias(
      df: DataFrame, idCol: String, textCol: String, numBuckets: Int): DataFrame =
    features(df, idCol, textCol, numBuckets).unionByName(
      df.select(col(idCol).as("id"), lit(numBuckets.toLong).as("bucket"), lit(1L).as("cnt")))

  /** σ(m) rounded to 6 dp — the one transcendental in the loop, applied
    * to a micro-quantized margin and re-quantized immediately (the
    * rounding keeps the two engines' exp() in lockstep, same policy as
    * the TF-IDF/perplexity/DSIR twins).
    */
  private def sigmoid6(m: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(-m)), 6)

  /** Margin of each doc under micro-unit weights embedded as an array
    * literal: Σ cnt·w_micro exactly (decimal), divided once to double.
    * Docs with no features get margin 0 via the left join in callers.
    */
  private def marginCol(wMicro: Array[Long]): Column = {
    val wLit = array(wMicro.map(lit): _*)
    (sum((col("cnt") * element_at(wLit, (col("bucket") + 1).cast("int")))
      .cast("decimal(38,0)")).cast("double") / 1e6)
  }

  /** Train `iters` full-batch GD steps of logistic regression on
    * `labelCol` (boolean/0-1) over hashed text features, returning the
    * micro-unit weight VECTOR (numBuckets+1 entries, intercept last) —
    * the fitted artifact itself, ready for [[scoreLogReg]] or a
    * [[ModelCache]] entry. [[trainLogReg]] wraps it as a table.
    *
    * The iteration loop runs over a PACKED checkpoint — one row per doc
    * carrying (y, [(bucket, cnt)…]) — so each GD step is a single plan:
    * margin and residual are per-row array folds (≤ numBuckets+1 exact
    * integer terms, order-free), and the gradient is ONE map-side-
    * combined aggregation of numBuckets groups. No per-iteration join,
    * one shuffle per step (was three — measured ~2.5× on the bench
    * fixture). The fold accumulates in decimal(38,0), so the unordered
    * collect_list packing cannot perturb the sum.
    */
  def trainLogRegWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      numBuckets: Int = 256,
      iters: Int = 2,
      lr: Double = 0.5): Array[Long] = {
    require(numBuckets >= 1 && iters >= 1 && lr > 0,
      s"need numBuckets/iters >= 1 and lr > 0, got $numBuckets, $iters, $lr")
    val labeled = df.select(col(idCol).as("id"),
      col(labelCol).cast("boolean").cast("int").cast("double").as("__y"))
    val packed = featuresWithBias(df, idCol, textCol, numBuckets)
      .groupBy("id").agg(collect_list(struct(col("bucket"), col("cnt"))).as("__fs"))
      .join(labeled, Seq("id")) // every doc has >= the bias row
      .localCheckpoint() // every iteration re-reads it; never re-scan text
    val n = packed.count()
    var w = new Array[Long](numBuckets + 1) // +1: the intercept bucket
    for (_ <- 0 until iters) {
      val wLit = array(w.map(lit): _*)
      val marginC = (aggregate(col("__fs"), lit(0).cast("decimal(38,0)"),
        (acc, f) => acc + (f.getField("cnt") *
          element_at(wLit, (f.getField("bucket") + 1).cast("int"))).cast("decimal(38,0)"))
        .cast("double") / 1e6)
      val grads = packed
        .withColumn("__rm",
          round((sigmoid6(marginC) - col("__y")) * 1e6, 0).cast("long"))
        .select(explode(col("__fs")).as("__f"), col("__rm"))
        .groupBy(col("__f.bucket").as("bucket"))
        .agg(sum((col("__f.cnt") * col("__rm")).cast("decimal(38,0)")).as("__g"))
        .select(col("bucket"), col("__g").cast("double").as("g"))
        .collect().map(r => (r.getLong(0).toInt, r.getDouble(1)))
      val wNext = w.clone()
      grads.foreach { case (b, g) =>
        // one fixed chain: w − round(lr·g/n) in micro-units
        wNext(b) = w(b) - java.math.BigDecimal.valueOf(lr * g / n)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      }
      w = wNext
    }
    w
  }

  /** [[trainLogRegWeights]] presented as the weight TABLE
    * (bucket, w_micro, weight) for every bucket, weight = w_micro / 1e6
    * (so 6-dp exact).
    */
  def trainLogReg(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      numBuckets: Int = 256,
      iters: Int = 2,
      lr: Double = 0.5): DataFrame =
    weightTable(df.sparkSession,
      trainLogRegWeights(df, idCol, textCol, labelCol, numBuckets, iters, lr))

  /** A micro-unit weight vector as the (bucket, w_micro, weight) table
    * [[trainLogReg]] returns — how a registry-cached fit re-enters the
    * declarative world.
    */
  def weightTable(spark: org.apache.spark.sql.SparkSession, w: Array[Long]): DataFrame = {
    import spark.implicits._
    w.zipWithIndex.map { case (wm, b) => (b.toLong, wm, wm.toDouble / 1e6) }
      .toSeq.toDF("bucket", "w_micro", "weight")
  }

  /** Score a corpus under a trained micro-unit weight vector: margin,
    * p = σ(margin) at 6 dp, and the hard prediction. Every input row is
    * present (featureless docs score p = 0.5). Pure projection +
    * one per-doc aggregation — the weights are literals, no join with
    * anything driver-sized.
    */
  def scoreLogReg(
      df: DataFrame,
      idCol: String,
      textCol: String,
      wMicro: Array[Long]): DataFrame = {
    // wMicro has numBuckets+1 entries; the last is the intercept
    val feats = featuresWithBias(df, idCol, textCol, wMicro.length - 1)
    val margins = feats.groupBy("id").agg(marginCol(wMicro).as("margin"))
    df.select(col(idCol).as("id"))
      .join(margins, Seq("id"), "left")
      .withColumn("margin", coalesce(col("margin"), lit(0.0)))
      .withColumn("p", sigmoid6(col("margin")))
      .withColumn("predicted", col("p") >= 0.5)
      .select("id", "margin", "p", "predicted")
  }
}

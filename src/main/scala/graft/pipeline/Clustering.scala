package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn near-dup PAIRS (from any of the
  * [[Dedup]] candidate generators) into CLUSTERS, so a pipeline can keep
  * exactly one canonical document per duplicate group. Pairs alone
  * under-delete: if A~B and B~C, dropping one doc per pair can still keep
  * two of {A,B,C}; the transitive closure (connected components) is what
  * "one per group" actually means. This is the step the reference's dedup
  * story stops short of and every corpus-scale pipeline needs.
  *
  * Spark-first shape: min-label propagation as iterated equi-joins —
  * labels start as each node's own id and every round each node takes
  * (a) the min of its neighbors' labels and (b) its label's own label
  * (pointer doubling / path halving, the classic PRAM trick — one extra
  * node-sized self-join per round). Each round is two shuffle joins plus
  * one hash aggregation (all AQE-splittable; no windows, no driver-side
  * graph). Neighbor-min alone converges in O(diameter) rounds; the
  * pointer jump compresses label chains geometrically, so convergence is
  * O(log diameter) — an adversarial million-node chain finishes in ~20
  * rounds instead of a million (the same bound large-star/small-star —
  * Kiveris et al., SoCC'14 — buys, with simpler invariants: labels only
  * ever decrease toward the component min, and every label is a live
  * node id). Near-dup clusters are shallow anyway (2-4 rounds); each
  * round is `localCheckpoint`ed to truncate lineage (GC-reclaimed, no
  * cache pin).
  */
object Clustering {

  /** Connected components over an undirected pair list.
    * Input: one row per edge (`aCol`, `bCol`) — direction and duplicates
    * don't matter. Output: (id, component) for every node that appears in
    * a pair, where `component` is the MINIMUM id in the node's component
    * (deterministic canonical representative, independent of partitioning
    * and iteration order).
    *
    * `maxIter` guards the propagation loop; it throws rather than return
    * a silently-unconverged labeling.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxIter: Int = 25,
      maxDriverEdges: Long = 100000L): DataFrame = {
    // symmetric edge list, deduped — read once per round, so materialize
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    // Adaptive small-graph fast path (the split family's count-then-
    // branch discipline): near-dup graphs are PAIR-bounded — nodes ≤
    // 2·|candidate pairs|, not corpus-sized — so when the deduped edge
    // list fits the driver comfortably, a single union-find pass beats
    // 3-6 distributed rounds of two shuffle joins each (at sf0.1 the
    // whole graph is a few hundred edges paying ~6 scheduled jobs).
    // Identical output by law (ClusteringSpec pins driver vs iterative
    // on random graphs): min-id component labels either way. The
    // iterative path below remains the scale default; maxDriverEdges=0
    // forces it.
    // (fast path only for integral ids: its min-union must agree with
    // Catalyst's `least` ordering, which is guaranteed for integers)
    val integralId = edges.schema.head.dataType match {
      case _: org.apache.spark.sql.types.LongType | _: org.apache.spark.sql.types.IntegerType |
           _: org.apache.spark.sql.types.ShortType | _: org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    val nEdges = if (integralId) edges.count() else Long.MaxValue
    if (nEdges > 0 && nEdges <= maxDriverEdges) {
      // 100k cap (ADVICE r12; was 1M): the collected two-long Rows plus
      // the union-find map stay a few MB on the driver — a near-dup edge
      // list past 100k belongs on the executors anyway
      val es = edges.select(col("src").cast("long"), col("dst").cast("long")).collect()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) { parent.put(r, parent.get(parent.get(r))); r = parent.get(r) }
        r
      }
      es.foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
      }
      // second pass: path-compress every node to its final min root
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
      parent.keySet.forEach(v => out += ((v, find(v))))
      val spark = pairs.sparkSession
      import spark.implicits._
      val idType = edges.schema.head.dataType
      return out.toSeq.toDF("id", "comp")
        .select(col("id").cast(idType), col("comp").cast(idType))
    }
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // (a) min label among each node's neighbors, one hop per round
      val nbrMin = edges.join(labels.select(col("id").as("src"), col("comp").as("__nc")), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("__nc")).as("__nbr"))
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("__old"),
          least(col("comp"), coalesce(col("__nbr"), col("comp"))).as("__c1"))
      // (b) pointer jumping: follow the label's own label from the
      // PREVIOUS round's (checkpointed) table — comp_{t+1}(u) ≤
      // comp_t(comp_t(u)), the synchronous PRAM update, so the lookup is
      // a cheap scan of materialized blocks and the neighbor-min
      // aggregation appears in the plan once. Every label IS a live node
      // id, so the join always hits; labels only ever decrease, and a
      // label's component never changes — compression stays correct.
      val jump = labels.select(col("id").as("__lid"), col("comp").as("__cc"))
      val next = stepped.join(jump, col("__c1") === col("__lid"), "left")
        .select(col("id"),
          least(col("__c1"), coalesce(col("__cc"), col("__c1"))).as("comp"),
          (least(col("__c1"), coalesce(col("__cc"), col("__c1"))) < col("__old")).as("__chg"))
      // convergence check folded into the materialization job: observe()
      // counts changed labels WHILE localCheckpoint materializes the round
      // — one action per round, not two (the separate isEmpty job was
      // ~20-30% of q_dup_clusters)
      val obs = org.apache.spark.sql.Observation(s"cc_round_$it")
      val materialized = next
        .observe(obs, sum(when(col("__chg"), 1L).otherwise(0L)).as("changed"))
        .localCheckpoint() // eager: runs the job, which fills the observation
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      labels = materialized.drop("__chg")
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          s"pointer doubling bounds depth at 2^$maxIter, so this indicates a bug, " +
          "not a deep graph; raise maxIter only after checking the edge list")
    labels
  }

  /** Squared-euclidean distances from a vector column to each centroid
    * literal — one array element per centroid, a genuinely codegen'd
    * native pass ([[graft.functions.CentroidDists]]), no join. Shared by
    * [[kmeans]] and the trained-IVF probe path
    * ([[Similarity.ivfTopKTrained]]).
    */
  def centroidDists(vec: Column, cents: Array[Seq[Double]]): Column =
    graft.functions.VectorExpressions.centroid_dists(vec, cents.toSeq)

  /** The higher-order-function formulation [[centroidDists]]'s native
    * expression is law-tested bit-identical to (PipelineSpec) — kept as
    * the executable statement of the semantics (zip_with null-padding on
    * length mismatch, left-to-right IEEE fold), never on a hot path: the
    * interpreted lambdas run k× per row and allocate a zipped array per
    * centroid.
    */
  private[graft] def centroidDistsDecl(vec: Column, cents: Array[Seq[Double]]): Column =
    array(cents.map { c =>
      aggregate(zip_with(vec, typedlit(c), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)
    }: _*)

  /** Train the k-means codebook and return it driver-side (k×dim doubles
    * — the MLlib pattern). Deterministic: md5-ordered init, quantized
    * means; see [[kmeans]] for the full invariants.
    *
    * `cacheKey`: a [[ModelCache]] registry key for the fitted codebook —
    * training is deterministic, so consumers naming the same (input,
    * k, iters, quantize) share ONE fit per session (assignment,
    * diagnostics, diversity sampling, and a trained-IVF index all read
    * the same few-KB artifact). None = always refit.
    */
  def kmeansCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      quantize: Int = 6,
      cacheKey: Option[String] = None): Array[Seq[Double]] = cacheKey match {
    case Some(key) => ModelCache.getOrFit(s"kmeans:$key:k$k:i$iters:q$quantize") {
      kmeansCentroidsFit(df, idCol, vecCol, k, iters, quantize)
    }
    case None => kmeansCentroidsFit(df, idCol, vecCol, k, iters, quantize)
  }

  private def kmeansCentroidsFit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      quantize: Int): Array[Seq[Double]] = {
    require(k >= 1 && iters >= 0, s"need k >= 1, iters >= 0; got k=$k iters=$iters")
    val dv = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))

    // deterministic seedless init: smallest md5(id) — TakeOrdered, no sort
    var cents: Array[Seq[Double]] = dv
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(k)
      .collect()
      .map(_.getSeq[Double](1))

    for (_ <- 0 until iters) {
      val assigned = dv.withColumn("__ds", centroidDists(col("v"), cents))
        .withColumn("cluster",
          (array_position(col("__ds"), array_min(col("__ds"))) - 1).cast("long"))
      val means = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("__d", "__x")))
        .groupBy(col("cluster"), col("__d"))
        .agg(avg(col("__x")).as("__m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cl, rows) =>
          cl.toInt -> rows.sortBy(_.getInt(1))
            .map(r => BigDecimal(r.getDouble(2)).setScale(quantize, BigDecimal.RoundingMode.HALF_UP).toDouble)
            .toSeq
        }
      cents = cents.zipWithIndex.map { case (prev, i) => means.getOrElse(i, prev) }
    }
    cents
  }

  /** K-means over an embedding column (Lloyd's iterations) — the corpus
    * partitioner behind data-mixing and diversity sampling (cluster, then
    * sample per cluster). Deterministic end-to-end so two engines (and
    * two runs) agree:
    *
    *  - init: the `k` vectors with the smallest `md5(id)` hex string —
    *    a seedless uniform sample, same trick as `Similarity.ivfTopK`;
    *    cluster ids are 0..k-1 in that md5 order;
    *  - assignment: squared-euclidean argmin, ties broken by cluster id;
    *  - update: per-dimension mean, ROUNDED to `quantize` decimals —
    *    quantization pins the centroids across engines whose partial-sum
    *    orders differ (error ~1e-13 vs grid 1e-6), so the next
    *    iteration's distances are computed from bit-identical centroids;
    *  - a cluster that loses all points keeps its previous centroid.
    *
    * Per iteration: one pass over the data — assignment is a broadcast
    * of k centroid literals into a codegen'd distance expression (no
    * join, no shuffle), the mean is one hash aggregation keyed by
    * (cluster, dim) whose partial aggregation reduces each partition to
    * at most k×dim rows before the shuffle. The k×dim centroid matrix is
    * collected to the driver between iterations (exactly what Spark
    * MLlib's KMeans does — it is a few KB and O(iters) round trips, not
    * a driver bomb). The input is re-scanned once per iteration rather
    * than checkpointed: at 100 TB a columnar re-scan of (id, vec) beats
    * materializing the working set.
    *
    * Output: (id, cluster, dist) — dist is the squared euclidean
    * distance to the winning centroid, rounded to `quantize` decimals.
    * Split as [[kmeansCentroids]] (training, returns the codebook) +
    * final assignment here, so the codebook is reusable (trained IVF:
    * [[Similarity.ivfTopKTrained]]).
    */
  def kmeans(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 8,
      iters: Int = 2,
      quantize: Int = 6,
      cacheKey: Option[String] = None): DataFrame = {
    val cents = kmeansCentroids(df, idCol, vecCol, k, iters, quantize, cacheKey)
    // argmin = first index achieving the array min (exact double equality
    // on an element of the array itself, so it is safe)
    df.select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("__ds", centroidDists(col("v"), cents))
      .withColumn("cluster",
        (array_position(col("__ds"), array_min(col("__ds"))) - 1).cast("long"))
      .withColumn("dist", round(array_min(col("__ds")), quantize))
      .select("id", "cluster", "dist")
  }

  /** Clustering-quality diagnostics over a (id, cluster, dist) assignment
    * frame ([[kmeans]] output, where `dist` is the SQUARED distance to
    * the assigned centroid): per cluster, the member count, its share of
    * all points (the balance diagnostic — a dominant share means the
    * clustering degenerated and diversity sampling downstream would be
    * fake), the inertia contribution (sum of squared distances — the
    * quantity Lloyd's descends; compare across k/iters to pick a
    * codebook), and mean/max squared distance (compactness / outlier
    * reach). One hash aggregation of k rows plus a broadcast of the
    * 1-row total — no window, no second corpus pass. Empty clusters do
    * not appear (no assignment rows), matching the SQL twin.
    *
    * Determinism: `dist` arrives quantized to `quantize` decimals
    * ([[kmeans]] rounds it), so the per-cluster sum is an EXACT decimal —
    * but summing doubles is order-dependent at the ulp level, and a mean
    * landing exactly on a rounding boundary can flip its last digit with
    * the partial-aggregation order (= partition count). The sum therefore
    * runs in integer micro-units (`long` is associative-commutative-exact),
    * and inertia/mean are derived by single IEEE divisions — bit-identical
    * at any parallelism, and engine-portable.
    */
  def clusterMetrics(assigned: DataFrame, quantize: Int = 6): DataFrame = {
    val scale = math.pow(10, quantize)
    val perCluster = assigned.groupBy("cluster").agg(
      count(lit(1)).as("n_points"),
      sum(round(col("dist") * scale).cast("long")).as("__micro"),
      max(col("dist")).as("max_sqdist"))
    val total = perCluster.agg(sum(col("n_points")).as("__tot"))
    perCluster.crossJoin(broadcast(total))
      .withColumn("share", col("n_points").cast("double") / col("__tot"))
      .withColumn("inertia", col("__micro").cast("double") / scale)
      .withColumn("mean_sqdist",
        col("__micro").cast("double") / scale / col("n_points"))
      .select("cluster", "n_points", "share", "inertia", "mean_sqdist", "max_sqdist")
  }

  /** End-to-end near-dup canonicalization: MinHash-LSH candidate pairs
    * ([[Dedup.minhashLshPairs]]) → connected components → every document
    * assigned a cluster id (its own id when it has no near-dup). Output:
    * (id, component, is_canonical) — filter `!is_canonical` for the drop
    * list, `is_canonical` for the surviving corpus.
    */
  def nearDupClusters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      minSim: Double = 0.5): DataFrame =
    nearDupClustersFromPairs(df, idCol,
      Dedup.minhashLshPairs(df, idCol, textCol, n, bands, rowsPerBand, minSim))

  /** [[nearDupClusters]] over CALLER-supplied candidate pairs — any pair
    * generator plugs into the same canonicalization: winnowed
    * fingerprints ([[graft.pipeline.TextAnalysis.winnowPairs]]), SimHash
    * bands, embedding cosine, or a custom join. `pairs` needs columns
    * (id_a, id_b); every document in `df` gets a component (its own id
    * when unpaired) and one canonical representative per component.
    */
  def nearDupClustersFromPairs(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs.select(col("id_a"), col("id_b")))
    df.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left")
      .withColumn("component", coalesce(col("comp"), col("id")))
      .withColumn("is_canonical", col("component") === col("id"))
      .select("id", "component", "is_canonical")
  }
}

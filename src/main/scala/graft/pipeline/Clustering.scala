package graft.pipeline

import org.apache.spark.sql.DataFrame
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
  * labels start as each node's own id and every round each node takes the
  * min of its neighbors' labels. Each round is ONE shuffle join on the
  * node id plus one hash aggregation (both AQE-splittable; no windows, no
  * driver-side graph), and converges in O(cluster diameter) rounds —
  * near-dup clusters are shallow (diameter a handful of hops even for
  * chained shingle-drift), so the loop runs 2-4 rounds in practice, each
  * `localCheckpoint`ed to truncate lineage (GC-reclaimed, no cache pin).
  * For adversarial long-chain graphs, large-star/small-star (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14) converges
  * in O(log n) rounds with the same join-per-round building blocks;
  * dedup graphs don't need it, so this keeps the simpler invariant.
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
      maxIter: Int = 25): DataFrame = {
    // symmetric edge list, deduped — read once per round, so materialize
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // min label among each node's neighbors, one hop per round
      val nbrMin = edges.join(labels.select(col("id").as("src"), col("comp").as("__nc")), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("__nc")).as("__nbr"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("__nbr"), col("comp"))).as("comp"),
          (col("__nbr") < col("comp")).as("__chg"))
        .localCheckpoint()
      converged = next.filter(col("__chg")).isEmpty
      labels = next.drop("__chg")
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "pathologically deep component; raise maxIter or use a star-contraction variant")
    labels
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
      minSim: Double = 0.5): DataFrame = {
    val pairs = Dedup.minhashLshPairs(df, idCol, textCol, n, bands, rowsPerBand, minSim)
    val comps = connectedComponents(pairs)
    df.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left")
      .withColumn("component", coalesce(col("comp"), col("id")))
      .withColumn("is_canonical", col("component") === col("id"))
      .select("id", "component", "is_canonical")
  }
}

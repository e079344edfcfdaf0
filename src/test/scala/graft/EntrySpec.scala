package graft

/** Driver-contract smoke: entry() returns rows on sf0.001, and every
  * declared query has either an oracle twin or is explicitly rows-only.
  */
class EntrySpec extends SparkSpec {
  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys; rows-only set is the known one") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle without query: ${o.diff(q)}")
    val rowsOnly = q.diff(o)
    // q_pca_topk is deliberately twin-less: the driver-side Jacobi eigen
    // solve is not SQL-expressible in DuckDB; PipelineSpec pins it by law
    // (full-basis rotation invariance, recall-vs-variance, determinism).
    // The q_opq_* twins are publish-after-run (the rotation literals
    // exist only after a query evaluates — Verify runs every query
    // before dumping, so the driver's selfcheck always sees them), so in
    // a fresh session they are legitimately absent from the static map.
    val deferred = Set("q_pca_topk", "q_opq_topk", "q_opq_codes", "q_opq_refined")
    assert(rowsOnly.contains("q_pca_topk") && rowsOnly.subsetOf(deferred),
      s"unexpected rows-only queries: ${rowsOnly -- deferred}")
  }

  test("simhash column form and corpus form agree") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "the quick brown fox")).toDF("doc_id", "text")
    val colForm = docs.select(col("doc_id").as("id"), graft.pipeline.Dedup.simhash(col("text")).as("sig"))
    val dfForm = graft.pipeline.Dedup.simhashSignatures(docs, "doc_id", "text")
    assert(colForm.orderBy("id").collect().map(_.getLong(1)).toSeq ===
      dfForm.orderBy("id").collect().map(_.getLong(1)).toSeq)
  }
}

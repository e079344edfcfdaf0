package graft.pipeline

/** Session-lifetime registry for FITTED MODEL ARTIFACTS — the small
  * driver-side statistics an engine derives from a corpus and then
  * reuses across queries: trained classifier weights, k-means
  * codebooks, covariance moments, PCA bases. Each artifact is a
  * deterministic function of (input identity, hyper-parameters) — the
  * cache key spells both out — so a cache hit returns bit-identical
  * values to a refit, and every result that consumed a cached artifact
  * hashes identically to one that refit from scratch.
  *
  * Why this exists: a pipeline that trains a quality classifier and
  * then scores the corpus with it must not pay for training twice —
  * the fit is an ARTIFACT (a few KB of weights), not part of the
  * scoring query's semantics. Same for a k-means codebook shared by
  * assignment, diagnostics, diversity sampling, and a trained-IVF
  * index: one codebook, many consumers. This is the Spark MLlib
  * `Model` concept reduced to its driver-side payload, keyed instead
  * of passed by reference so independent query closures (the
  * SparkEntry contract) can share fits without threading objects.
  *
  * Scale: entries are O(model) — weight vectors, k×dim codebooks, d²
  * moment triangles — never O(corpus). Nothing distributed is ever
  * cached here; every consumer still runs its own full pass over the
  * data it reads.
  *
  * Concurrency: values are deterministic, so a duplicate fit under a
  * race is harmless (last write wins with identical content) — no
  * locking around the (possibly Spark-job-running) fit closure, which
  * also keeps re-entrant fits (an artifact whose fit consumes another
  * cached artifact) deadlock-free.
  *
  * `GRAFT_MODEL_CACHE=0` disables reuse (every call refits) — the knob
  * that lets a benchmark measure cold-fit cost explicitly.
  */
object ModelCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private def enabled: Boolean = sys.env.get("GRAFT_MODEL_CACHE").forall(_.trim != "0")

  /** The cached artifact for `key`, fitting (and registering) it on
    * first use. `key` must identify the input data and every
    * hyper-parameter the fit depends on.
    */
  def getOrFit[T <: AnyRef](key: String)(fit: => T): T = {
    if (!enabled) return fit
    val cur = cache.get(key)
    if (cur != null) return cur.asInstanceOf[T]
    val v = fit
    val prev = cache.putIfAbsent(key, v)
    (if (prev != null) prev else v).asInstanceOf[T]
  }

  /** Drop every cached artifact (tests; or after overwriting inputs). */
  def clear(): Unit = cache.clear()
}

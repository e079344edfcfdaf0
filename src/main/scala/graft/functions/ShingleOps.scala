package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass shingle/token hashing (SURVEY.md §2.10 tier (b):
  * custom codegen `Expression`s) — the scan-side projections behind every
  * shingle/token-derived operator (MinHash, Jaccard, containment,
  * contamination, DSIR, duplicate spans).
  *
  * Why native instead of the composed built-ins they replace: the
  * built-in formulations (`transform`/`slice`/`concat_ws`/`array_distinct`
  * over `regexp_extract_all` tokens — see [[graft.pipeline.Dedup.shingles]])
  * are higher-order functions, which Spark evaluates on the INTERPRETED
  * path (HigherOrderFunction is CodegenFallback) — every document pays
  * per-shingle UTF8String allocations, a boxed lambda call per element,
  * an O(s²)-ish `array_distinct`, and a fresh MessageDigest per md5. At
  * corpus scale this is the single largest cold-start stage cost in the
  * engine (the round-12 stage-cold bench: the shingle/token explode
  * stages carry ~2 s per query at sf0.1). Each expression here makes ONE
  * pass over the document bytes with zero per-shingle allocations beyond
  * the 16-byte digest, and stays inside whole-stage codegen.
  *
  * VALUE COMPATIBILITY IS THE CONTRACT: each expression reproduces its
  * built-in chain bit-for-bit (ShingleOpsSpec pins equivalence on random
  * Unicode inputs, and every DuckDB oracle twin remains valid unchanged):
  *
  *  - tokens: maximal `[A-Za-z0-9]+` runs. The input must be ALREADY
  *    LOWERCASED by the caller (`lower(text)` — kept outside so Spark's
  *    own collation-aware `Lower` does the case mapping). ASCII bytes
  *    never occur inside multi-byte UTF-8 sequences, so a byte scan for
  *    alnum runs is exactly the Java-regex char scan.
  *  - shingle string: n tokens joined by a single space — injective per
  *    window (tokens contain no spaces), so string equality is
  *    element-wise token equality, which is how the dedup table compares.
  *  - hash: first 60 bits of md5 of the shingle's UTF-8 bytes
  *    ([[Hash60]]), streamed straight from the token byte ranges — the
  *    joined string is never materialized.
  */
object ShingleOps {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val EMPTY = new Array[Long](0)

  val P: Long = PortableHash.P

  @inline private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z')

  /** Tokenize `bytes` into maximal alnum runs; returns packed
    * (start, end) offset pairs and the token count: offs(2i) = start,
    * offs(2i+1) = end (exclusive).
    */
  private def tokenize(bytes: Array[Byte]): (Array[Int], Int) = {
    var offs = new Array[Int](32)
    var t = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      if (isAlnum(bytes(i))) {
        val s = i
        i += 1
        while (i < len && isAlnum(bytes(i))) i += 1
        if (2 * t == offs.length) offs = java.util.Arrays.copyOf(offs, offs.length * 2)
        offs(2 * t) = s
        offs(2 * t + 1) = i
        t += 1
      } else i += 1
    }
    (offs, t)
  }

  /** md5-60 of the window `w..w+n-1` of tokens, streamed (no string). */
  private def windowHash60(
      md: java.security.MessageDigest,
      bytes: Array[Byte], offs: Array[Int], w: Int, n: Int): Long = {
    md.reset()
    var k = w
    while (k < w + n) {
      md.update(bytes, offs(2 * k), offs(2 * k + 1) - offs(2 * k))
      if (k != w + n - 1) md.update(' '.toByte)
      k += 1
    }
    val d = md.digest()
    val hi =
      ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
      ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8)  |  (d(7) & 0xFFL)
    hi >>> 4
  }

  @inline private def windowsEqual(
      bytes: Array[Byte], offs: Array[Int], a: Int, b: Int, n: Int): Boolean = {
    var k = 0
    while (k < n) {
      val as = offs(2 * (a + k)); val ae = offs(2 * (a + k) + 1)
      val bs = offs(2 * (b + k)); val be = offs(2 * (b + k) + 1)
      if (ae - as != be - bs) return false
      var i = 0
      val l = ae - as
      while (i < l) {
        if (bytes(as + i) != bytes(bs + i)) return false
        i += 1
      }
      k += 1
    }
    true
  }

  /** Distinct-BY-STRING word n-gram shingle hash60s, first-occurrence
    * order — the native form of
    * `transform(array_distinct(shingles), md5-60)`. Dedup is exact: a
    * 64-bit probe hash selects the slot, byte comparison of the token
    * windows decides equality (never the probe hash alone), so two
    * distinct shingles colliding in ANY hash still both emit — identical
    * to `array_distinct` over the shingle strings.
    */
  def distinctShingleHash60(bytes: Array[Byte], n: Int): Array[Long] = {
    val (offs, t) = tokenize(bytes)
    if (t < n) return EMPTY
    val m = t - n + 1
    var cap = 4
    while (cap < m * 2) cap <<= 1
    val slots = new Array[Int](cap)
    java.util.Arrays.fill(slots, -1)
    val out = new Array[Long](m)
    var outN = 0
    val md = mdLocal.get()
    var w = 0
    while (w < m) {
      // FNV-1a over the window bytes + separators: probe key only
      var fh = -3750763034362895579L
      var j = w
      while (j < w + n) {
        var p = offs(2 * j)
        val e = offs(2 * j + 1)
        while (p < e) { fh = (fh ^ bytes(p)) * 1099511628211L; p += 1 }
        fh = (fh ^ 0x20L) * 1099511628211L
        j += 1
      }
      var idx = (fh ^ (fh >>> 32)).toInt & (cap - 1)
      var isNew = false
      var probing = true
      while (probing) {
        val s = slots(idx)
        if (s < 0) { slots(idx) = w; isNew = true; probing = false }
        else if (windowsEqual(bytes, offs, s, w, n)) probing = false
        else idx = (idx + 1) & (cap - 1)
      }
      if (isNew) {
        out(outN) = windowHash60(md, bytes, offs, w, n)
        outN += 1
      }
      w += 1
    }
    if (outN == m) out else java.util.Arrays.copyOf(out, outN)
  }

  /** ArrayData wrapper of [[distinctShingleHash60]] (called from codegen). */
  def shingleArray(s: UTF8String, n: Int): UnsafeArrayData =
    UnsafeArrayData.fromPrimitiveArray(distinctShingleHash60(s.getBytes, n))

  /** Maximal `[A-Za-z0-9]+` runs as an array of strings — the native form
    * of `regexp_extract_all(text, "[A-Za-z0-9]+", 0)`
    * ([[graft.pipeline.TextAnalysis.regexTokens]]). One byte scan, each
    * token a zero-copy slice view of the input buffer; ASCII bytes never
    * occur inside multi-byte UTF-8 sequences, so the byte scan is exactly
    * the Java-regex char scan on ANY input (upper or lower case).
    */
  def tokensArray(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    val (offs, t) = tokenize(bytes)
    val out = new Array[Any](t)
    var i = 0
    while (i < t) {
      out(i) = UTF8String.fromBytes(bytes, offs(2 * i), offs(2 * i + 1) - offs(2 * i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Distinct-BY-VALUE mod-P shingle hashes, first-occurrence order: the
    * per-doc shingle-hash SET as an array — exactly the multiset
    * `dropDuplicates` / `collect_set` would leave of the mod-P explode
    * (within-doc mod-P collisions collapse to one value). Emitting the
    * set from the scan lets set-consumers (containment's exploded base,
    * Jaccard's per-doc sets) skip the dedup/collect_set SHUFFLE entirely.
    */
  def distinctShingleHashMods(bytes: Array[Byte], n: Int): Array[Long] = {
    val h60 = distinctShingleHash60(bytes, n)
    if (h60.length == 0) return EMPTY
    val m = h60.length
    var cap = 4
    while (cap < m * 2) cap <<= 1
    // open addressing over the VALUES; -1 is an impossible mod-P hash
    val slots = new Array[Long](cap)
    java.util.Arrays.fill(slots, -1L)
    val out = new Array[Long](m)
    var outN = 0
    var i = 0
    while (i < m) {
      val v = h60(i) % P
      var idx = ((v * -7046029254386353131L) >>> 40).toInt & (cap - 1)
      var probing = true
      while (probing) {
        val s = slots(idx)
        if (s == -1L) { slots(idx) = v; out(outN) = v; outN += 1; probing = false }
        else if (s == v) probing = false
        else idx = (idx + 1) & (cap - 1)
      }
      i += 1
    }
    if (outN == m) out else java.util.Arrays.copyOf(out, outN)
  }

  /** ArrayData wrapper of [[distinctShingleHashMods]] (called from codegen). */
  def shingleModArray(s: UTF8String, n: Int): UnsafeArrayData =
    UnsafeArrayData.fromPrimitiveArray(distinctShingleHashMods(s.getBytes, n))

  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, (Array[Long], Array[Long])]()

  private def perms(numHashes: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(numHashes, { _ =>
      val cs = PortableHash.permConsts(numHashes)
      (cs.map(_._1).toArray, cs.map(_._2).toArray)
    })

  /** Per-document MinHash signature, fused into the shingle pass: for
    * each of `numHashes` permutations `(a_i·h + b_i) mod P` over the
    * mod-P-reduced distinct shingle hashes, the minimum — the whole
    * signature from ONE pass over the document, no explode rows and no
    * aggregation shuffle (the groupBy-of-mins formulation shuffles
    * docs×shingles rows; this shuffles nothing). Empty array when the
    * document has < n tokens — callers filter, mirroring the
    * no-rows-in-groupBy semantics of the aggregated form.
    *
    * Duplicate shingles cannot skew a min, and a per-permutation min
    * over the distinct hash set is EXACTLY the aggregated
    * `min(pmod(a*h+b, P))` — MinhashSigSpec pins bit-equality.
    */
  def minhashSig(s: UTF8String, n: Int, numHashes: Int): UnsafeArrayData = {
    val hs = distinctShingleHash60(s.getBytes, n)
    if (hs.length == 0) return UnsafeArrayData.fromPrimitiveArray(EMPTY)
    val (as_, bs) = perms(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val base = hs(i) % P // hash60 >= 0, so % == pmod
      var j = 0
      while (j < numHashes) {
        val v = (as_(j) * base + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Per-document MinHash signature DERIVED from an already-computed
    * mod-P distinct shingle-hash set ([[distinctShingleHashMods]]): for
    * each permutation the min of `(a_i·v + b_i) mod P` over the set's
    * values. A per-permutation min over the distinct mod-P values equals
    * the min over the raw hash60 stream (`(a·(h mod P)+b) mod P` is a
    * function of `h mod P`, and duplicates cannot move a min), so this is
    * bit-identical to [[minhashSig]] on the same text — ShingleOpsSpec
    * pins it. Purpose: an operator that already materialized the hash SET
    * (exact-Jaccard verification) derives its LSH signature from the set
    * with pure arithmetic instead of paying a second full text pass —
    * the round-15 cold profile showed the set and signature scans of
    * ngramJaccardPairsLsh racing as two concurrent ~1.2 s corpus passes.
    */
  def minhashSigFromMods(
      mods: org.apache.spark.sql.catalyst.util.ArrayData,
      numHashes: Int): UnsafeArrayData = {
    val m = mods.numElements()
    if (m == 0) return UnsafeArrayData.fromPrimitiveArray(EMPTY)
    val (as_, bs) = perms(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < m) {
      val base = mods.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = (as_(j) * base + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Per-document term→count map over the alnum tokens — the native,
    * shuffle-free form of `explode(tokens) → groupBy(id, term) → count`:
    * term frequency is a PER-DOCUMENT statistic, so counting it inside
    * the scan projection removes the corpus-sized (id, term) exchange
    * entirely (the DSIR-fusion recipe applied to TF). Keys are the
    * document's distinct tokens in first-occurrence order (order is
    * immaterial to every consumer — the map is exploded straight back to
    * rows); values are occurrence counts. Equality is exact byte
    * comparison of the token windows (the probe hash only selects the
    * slot), identical to string groupBy semantics.
    */
  def tokenTf(s: UTF8String): org.apache.spark.sql.catalyst.util.MapData = {
    val bytes = s.getBytes
    val (offs, t) = tokenize(bytes)
    if (t == 0)
      return new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0)),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0)))
    var cap = 4
    while (cap < t * 2) cap <<= 1
    val slots = new Array[Int](cap)       // first-occurrence token window
    java.util.Arrays.fill(slots, -1)
    val slotOut = new Array[Int](cap)     // slot → output index
    val firstW = new Array[Int](t)        // output index → window
    val counts = new Array[Long](t)
    var outN = 0
    var w = 0
    while (w < t) {
      var fh = -3750763034362895579L
      var p = offs(2 * w)
      val e = offs(2 * w + 1)
      while (p < e) { fh = (fh ^ bytes(p)) * 1099511628211L; p += 1 }
      var idx = (fh ^ (fh >>> 32)).toInt & (cap - 1)
      var probing = true
      while (probing) {
        val s0 = slots(idx)
        if (s0 < 0) {
          slots(idx) = w; slotOut(idx) = outN
          firstW(outN) = w; counts(outN) = 1L; outN += 1
          probing = false
        } else if (windowsEqual(bytes, offs, s0, w, 1)) {
          counts(slotOut(idx)) += 1L
          probing = false
        } else idx = (idx + 1) & (cap - 1)
      }
      w += 1
    }
    val keys = new Array[Any](outN)
    val vals = new Array[Any](outN)
    var i = 0
    while (i < outN) {
      val fw = firstW(i)
      keys(i) = UTF8String.fromBytes(bytes, offs(2 * fw), offs(2 * fw + 1) - offs(2 * fw))
      vals(i) = counts(i)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vals))
  }

  /** DSIR hashed bag-of-features buckets, fused: per token the md5-60
    * mod-P hash, per adjacent pair the rolling bigram hash
    * `(h1·31 + h2) mod P`, each reduced mod `numBuckets`; unigrams then
    * bigrams, duplicates KEPT (the downstream distribution counts them) —
    * the native form of [[graft.pipeline.Curation.featureBuckets]]'s
    * explode input.
    */
  def tokenBuckets(s: UTF8String, numBuckets: Int): UnsafeArrayData = {
    val bytes = s.getBytes
    val (offs, t) = tokenize(bytes)
    if (t == 0) return UnsafeArrayData.fromPrimitiveArray(EMPTY)
    val md = mdLocal.get()
    val hs = new Array[Long](t)
    var i = 0
    while (i < t) {
      hs(i) = windowHash60(md, bytes, offs, i, 1) % P
      i += 1
    }
    val nb = numBuckets.toLong
    val out = new Array[Long](t + (if (t >= 2) t - 1 else 0))
    i = 0
    while (i < t) { out(i) = hs(i) % nb; i += 1 }
    i = 0
    while (i < t - 1) {
      out(t + i) = ((hs(i) * 31L + hs(i + 1)) % P) % nb
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Fused DSIR scorer: the SAME feature stream as [[tokenBuckets]]
    * (per-token md5-60 mod-P unigram hash, rolling `(h1·31+h2) mod P`
    * bigram hash, each reduced mod `numBuckets`, duplicates kept), but
    * instead of emitting bucket ids each occurrence accumulates
    * `lam(bucket)` (the λ table in integer micro-units, dense-indexed by
    * bucket, absent buckets 0) plus a feature count. Returns
    * `{n_features, λ_sum_micro}` as a 2-long array — the whole DSIR
    * importance score of a document from ONE byte scan, no explode rows,
    * no (doc, bucket) shuffle, no λ join
    * ([[graft.pipeline.Curation.dsirScores]]; bit-equality vs the
    * explode → groupBy → broadcast-join chain pinned in ShingleOpsSpec).
    */
  def tokenBucketLamSum(s: UTF8String, numBuckets: Int, lam: Array[Long]): UnsafeArrayData = {
    val bytes = s.getBytes
    val (offs, t) = tokenize(bytes)
    val out = new Array[Long](2)
    if (t == 0) return UnsafeArrayData.fromPrimitiveArray(out)
    val md = mdLocal.get()
    val hs = new Array[Long](t)
    var i = 0
    while (i < t) {
      hs(i) = windowHash60(md, bytes, offs, i, 1) % P
      i += 1
    }
    val nb = numBuckets.toLong
    var n = 0L
    var sum = 0L
    i = 0
    while (i < t) { sum += lam((hs(i) % nb).toInt); n += 1; i += 1 }
    i = 0
    while (i < t - 1) {
      sum += lam((((hs(i) * 31L + hs(i + 1)) % P) % nb).toInt)
      n += 1
      i += 1
    }
    out(0) = n
    out(1) = sum
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** LSH band keys from a MinHash signature, fused: for band `b`, the
    * lowercase md5 hex of the ASCII decimal comma-join of signature slots
    * `[b·rowsPerBand, (b+1)·rowsPerBand)` — byte-identical to
    * `md5(concat_ws(",", transform(slice(sig, b·r+1, r), cast string)))`,
    * the banding chain [[graft.pipeline.Dedup]] (and the DuckDB oracle)
    * uses, with one pass and zero interpreted higher-order evals. A
    * shorter-than-geometry signature mirrors `slice` semantics (join what
    * is there; an empty slice hashes the empty string).
    */
  def bandHashes(
      sig: org.apache.spark.sql.catalyst.util.ArrayData,
      bands: Int, rowsPerBand: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val md = mdLocal.get()
    val len = sig.numElements()
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder(rowsPerBand * 12)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var i = b * rowsPerBand
      val e = math.min(i + rowsPerBand, len)
      while (i < e) {
        if (sb.length > 0) sb.append(',')
        sb.append(sig.getLong(i))
        i += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val hex = new Array[Char](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = HexDigits((d(j) >> 4) & 0xF)
        hex(2 * j + 1) = HexDigits(d(j) & 0xF)
        j += 1
      }
      out(b) = UTF8String.fromString(new String(hex))
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Every w-token window's mod-P hash IN POSITION ORDER, duplicates
    * kept — the native form of [[graft.pipeline.Dedup.windowHashes]]
    * (duplicate-span detection posexplodes this, so order and
    * multiplicity both matter).
    */
  def windowHashMods(s: UTF8String, w: Int): UnsafeArrayData = {
    val bytes = s.getBytes
    val (offs, t) = tokenize(bytes)
    if (t < w) return UnsafeArrayData.fromPrimitiveArray(EMPTY)
    val m = t - w + 1
    val md = mdLocal.get()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      out(i) = windowHash60(md, bytes, offs, i, w) % P
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken), fused:
    * the full [[graft.pipeline.TextAnalysis.winnow]] per-document pipeline
    * — w-token window hashes, packed (hash·2³² + 1-based pos) keys, the
    * min of every k-run of consecutive keys (leftmost-smallest tie-break
    * is inherent: packed keys are unique), distinct — in ONE byte scan
    * with an O(m) monotonic-deque sliding min. Output: the distinct
    * selected packed keys in first-selection order (consumers unpack
    * fp = key div 2³², pos = key mod 2³²; order is immaterial — the
    * DataFrame form's distinct() was unordered too). Documents with
    * fewer than k windows emit the min of what they have; fewer than w
    * tokens emit nothing. Bit-equal to the exploded window/sort pipeline
    * (ShingleOpsSpec pins it).
    */
  def winnowFps(s: UTF8String, w: Int, k: Int): UnsafeArrayData = {
    val bytes = s.getBytes
    val (offs, t) = tokenize(bytes)
    if (t < w) return UnsafeArrayData.fromPrimitiveArray(EMPTY)
    val m = t - w + 1
    val md = mdLocal.get()
    val keys = new Array[Long](m)
    var i = 0
    while (i < m) {
      keys(i) = (windowHash60(md, bytes, offs, i, w) % P) * 4294967296L + (i + 1)
      i += 1
    }
    val nSel = math.max(1, m - (k - 1))
    val sel = new Array[Long](nSel)
    if (m < k) {
      // single truncated window: min over everything
      var mn = keys(0)
      var j = 1
      while (j < m) { if (keys(j) < mn) mn = keys(j); j += 1 }
      sel(0) = mn
    } else {
      // monotonic deque of indices; window i covers keys[i .. i+k-1]
      val dq = new Array[Int](m)
      var head = 0
      var tail = 0
      var j = 0
      while (j < m) {
        while (tail > head && keys(dq(tail - 1)) > keys(j)) tail -= 1
        dq(tail) = j; tail += 1
        if (j >= k - 1) {
          val start = j - (k - 1)
          while (dq(head) < start) head += 1
          sel(start) = keys(dq(head))
        }
        j += 1
      }
    }
    // distinct, first-occurrence order (values are nonzero: pos >= 1)
    var cap = 4
    while (cap < nSel * 2) cap <<= 1
    val slots = new Array[Long](cap)
    val out = new Array[Long](nSel)
    var outN = 0
    i = 0
    while (i < nSel) {
      val v = sel(i)
      var idx = ((v ^ (v >>> 32)) * -7046029254386353131L >>> 40).toInt & (cap - 1)
      var probing = true
      while (probing) {
        val s0 = slots(idx)
        if (s0 == 0L) { slots(idx) = v; out(outN) = v; outN += 1; probing = false }
        else if (s0 == v) probing = false
        else idx = (idx + 1) & (cap - 1)
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (outN == nSel) out else java.util.Arrays.copyOf(out, outN))
  }

  /** Per-document bigram term-frequency rows — the windowed (n = 2)
    * sibling of [[tokenTf]]: one row per DISTINCT adjacent token pair
    * with its occurrence count, first-occurrence order, from one byte
    * scan. The (id, prev, cur, tf) explode of this array replaces the
    * per-occurrence bigram explode: grouped counts become Σ tf and
    * per-document means become tf-weighted means, so no shuffle ever
    * carries one row per token occurrence. Dedup is exact (FNV probe
    * hash selects the slot, byte comparison of both token windows
    * decides equality).
    */
  def bigramTf(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    bigramTfImpl(s, withVocabMarker = false)

  /** [[bigramTf]] plus ONE trailing vocab-marker row `(last_token, "",
    * 0)` for any document with at least one token — same single
    * tokenize pass (the r18 composed form paid a SECOND full
    * tokenization for `element_at(tokens, -1)`, ~0.4 s of pure CPU per
    * sf0.1 corpus pass). Within a document every token but the last
    * appears in `prev`, so `distinct(prev)` over the exploded rows is
    * exactly the corpus vocabulary; "" is never a real token (tokens are
    * maximal alnum runs) and the marker's tf 0 keeps any unfiltered
    * Σ tf identical.
    */
  def bigramTfVocab(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    bigramTfImpl(s, withVocabMarker = true)

  private def bigramTfImpl(
      s: UTF8String,
      withVocabMarker: Boolean): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val (offs, t) = tokenize(bytes)
    val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    def markerRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      UTF8String.fromBytes(bytes, offs(2 * (t - 1)), offs(2 * t - 1) - offs(2 * (t - 1))),
      UTF8String.EMPTY_UTF8,
      0L))
    if (t < 2) {
      if (withVocabMarker && t == 1)
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](markerRow))
      return empty
    }
    val m = t - 1
    var cap = 4
    while (cap < m * 2) cap <<= 1
    val slots = new Array[Int](cap)
    java.util.Arrays.fill(slots, -1)
    val slotOut = new Array[Int](cap)
    val firstW = new Array[Int](m)
    val counts = new Array[Long](m)
    var outN = 0
    var w = 0
    while (w < m) {
      var fh = -3750763034362895579L
      var j = w
      while (j < w + 2) {
        var p = offs(2 * j)
        val e = offs(2 * j + 1)
        while (p < e) { fh = (fh ^ bytes(p)) * 1099511628211L; p += 1 }
        fh = (fh ^ 0x20L) * 1099511628211L
        j += 1
      }
      var idx = (fh ^ (fh >>> 32)).toInt & (cap - 1)
      var probing = true
      while (probing) {
        val s0 = slots(idx)
        if (s0 < 0) {
          slots(idx) = w; slotOut(idx) = outN
          firstW(outN) = w; counts(outN) = 1L; outN += 1
          probing = false
        } else if (windowsEqual(bytes, offs, s0, w, 2)) {
          counts(slotOut(idx)) += 1L
          probing = false
        } else idx = (idx + 1) & (cap - 1)
      }
      w += 1
    }
    val rows = new Array[Any](if (withVocabMarker) outN + 1 else outN)
    var i = 0
    while (i < outN) {
      val fw = firstW(i)
      rows(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
        UTF8String.fromBytes(bytes, offs(2 * fw), offs(2 * fw + 1) - offs(2 * fw)),
        UTF8String.fromBytes(bytes, offs(2 * fw + 2), offs(2 * fw + 3) - offs(2 * fw + 2)),
        counts(i)))
      i += 1
    }
    if (withVocabMarker) rows(outN) = markerRow
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}

  /** Column: maximal alnum-run tokens of `text` (case preserved — callers
    * lower() first when they need folded tokens, same contract as the
    * regexp form this replaces). */
  def tokensCol(text: Column): Column =
    toColumn(TokensExpr(toExpr(text)))

  /** Column: distinct shingle hash60s of ALREADY-LOWERCASED text. */
  def shingleHash60s(lowered: Column, n: Int): Column =
    toColumn(ShingleHash60s(toExpr(lowered), n))

  /** Column: per-doc distinct mod-P shingle-hash SET of ALREADY-LOWERCASED
    * text. */
  def shingleHashModSet(lowered: Column, n: Int): Column =
    toColumn(ShingleHashModSet(toExpr(lowered), n))

  /** Column: fused MinHash signature of ALREADY-LOWERCASED text. */
  def minhashSigCol(lowered: Column, n: Int, numHashes: Int): Column =
    toColumn(MinhashSigExpr(toExpr(lowered), n, numHashes))

  /** Column: MinHash signature derived from a mod-P shingle-hash-set
    * column ([[shingleHashModSet]]) — no second text pass. */
  def minhashSigFromModsCol(mods: Column, numHashes: Int): Column =
    toColumn(MinhashSigFromModsExpr(toExpr(mods), numHashes))

  /** Column: per-doc term→count map of ALREADY-LOWERCASED text (explode
    * for the shuffle-free (id, term, tf) base). */
  def tokenTfCol(lowered: Column): Column =
    toColumn(TokenTfExpr(toExpr(lowered)))

  /** Column: per-band md5-hex LSH keys of a signature column. */
  def bandHashesCol(sig: Column, bands: Int, rowsPerBand: Int): Column =
    toColumn(BandHashesExpr(toExpr(sig), bands, rowsPerBand))

  /** Column: DSIR feature buckets of ALREADY-LOWERCASED text. */
  def tokenBucketsCol(lowered: Column, numBuckets: Int): Column =
    toColumn(TokenBucketsExpr(toExpr(lowered), numBuckets))

  /** Column: fused DSIR `{n_features, λ_sum_micro}` of ALREADY-LOWERCASED
    * text against a dense λ table (index = bucket, micro-units). */
  def tokenBucketLamSumCol(lowered: Column, numBuckets: Int, lam: Array[Long]): Column =
    toColumn(TokenBucketLamSumExpr(toExpr(lowered), numBuckets, lam.toSeq))

  /** Column: distinct winnow-selected packed (fp·2³² + pos) fingerprint
    * keys of ALREADY-LOWERCASED text. */
  def winnowFpsCol(lowered: Column, w: Int, k: Int): Column =
    toColumn(WinnowFpsExpr(toExpr(lowered), w, k))

  /** Column: per-doc distinct (prev, cur, tf) bigram rows of
    * ALREADY-LOWERCASED text. */
  def bigramTfCol(lowered: Column): Column =
    toColumn(BigramTfExpr(toExpr(lowered)))

  /** Column: [[bigramTfCol]] rows plus the per-doc vocab-marker row
    * (see [[ShingleOps.bigramTfVocab]]). */
  def bigramTfVocabCol(lowered: Column): Column =
    toColumn(BigramTfVocabExpr(toExpr(lowered)))

  /** Column: positional window hash mods of ALREADY-LOWERCASED text. */
  def windowHashModsCol(lowered: Column, w: Int): Column =
    toColumn(WindowHashModsExpr(toExpr(lowered), w))
}

/** Shared shape of the four ShingleOps expressions: string in,
  * array<long> out, null-intolerant, one static helper call. Plan
  * identity (equals/canonicalization, and therefore the StageCache's
  * plan matching) is carried by each subclass's case-class constructor
  * fields (n, numHashes, numBuckets, w) — n=2 and n=3 are distinct plans.
  *
  * `containsNull = false` is an intentional TIGHTENING vs the
  * higher-order chains these replaced (regexp_extract_all / transform
  * derive containsNull = true): the helpers build primitive long arrays
  * that can never hold null, no query surface unions a native-expr
  * column with a regex-chain one, and the oracle compare hashes values,
  * not element nullability.
  */
sealed abstract class ShingleOpsExpression extends UnaryExpression {
  def helperCall(c: String): String
  def evalHelper(s: UTF8String): Any

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $dt")
  }

  override def nullSafeEval(input: Any): Any = evalHelper(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${helperCall(c)};")
}

/** Native `[A-Za-z0-9]+`-run tokenizer — value-identical to
  * `regexp_extract_all(text, "[A-Za-z0-9]+", 0)` (ShingleOpsSpec pins the
  * equivalence), with one byte scan and zero-copy token slices instead of
  * an interpreted regex machine per row.
  */
case class TokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $dt")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleOps.tokensArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleOps.tokensArray($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ShingleHash60s(child: Expression, n: Int) extends ShingleOpsExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def helperCall(c: String): String =
    s"graft.functions.ShingleOps.shingleArray($c, $n)"
  override def evalHelper(s: UTF8String): Any = ShingleOps.shingleArray(s, n)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ShingleHashModSet(child: Expression, n: Int) extends ShingleOpsExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def helperCall(c: String): String =
    s"graft.functions.ShingleOps.shingleModArray($c, $n)"
  override def evalHelper(s: UTF8String): Any = ShingleOps.shingleModArray(s, n)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinhashSigExpr(child: Expression, n: Int, numHashes: Int)
    extends ShingleOpsExpression {
  require(n >= 1 && numHashes >= 1, s"bad minhash params n=$n numHashes=$numHashes")
  override def helperCall(c: String): String =
    s"graft.functions.ShingleOps.minhashSig($c, $n, $numHashes)"
  override def evalHelper(s: UTF8String): Any = ShingleOps.minhashSig(s, n, numHashes)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Signature-from-set (see [[ShingleOps.minhashSigFromMods]]): array<long>
  * in (the mod-P distinct hash set), array<long> signature out. */
case class MinhashSigFromModsExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def prettyName: String = "minhash_sig_from_mods"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<long>, got $dt")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleOps.minhashSigFromMods(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleOps.minhashSigFromMods($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** LSH band keys (see [[ShingleOps.bandHashes]]): array<long> signature
  * in, array<string> of `bands` md5-hex band keys out. */
case class BandHashesExpr(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(bands >= 1 && rowsPerBand >= 1,
    s"bad banding geometry bands=$bands rowsPerBand=$rowsPerBand")

  override def prettyName: String = "band_hashes"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<long>, got $dt")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleOps.bandHashes(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleOps.bandHashes($c, $bands, $rowsPerBand);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-doc term-frequency map (see [[ShingleOps.tokenTf]]): string in,
  * map<string,long> out — the shuffle-free (id, term, tf) base. */
case class TokenTfExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "token_tf"
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $dt")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleOps.tokenTf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleOps.tokenTf($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class TokenBucketsExpr(child: Expression, numBuckets: Int)
    extends ShingleOpsExpression {
  require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
  override def helperCall(c: String): String =
    s"graft.functions.ShingleOps.tokenBuckets($c, $numBuckets)"
  override def evalHelper(s: UTF8String): Any = ShingleOps.tokenBuckets(s, numBuckets)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused DSIR score projection (see [[ShingleOps.tokenBucketLamSum]]).
  * The λ table is a constructor field (an immutable Seq, so case-class
  * equality/canonicalization distinguishes different fits — two scored
  * corpora only share a cached stage when corpus, bucket count AND λ all
  * match); codegen reaches the primitive array through a reference
  * object, paying no per-row boxing.
  */
case class TokenBucketLamSumExpr(child: Expression, numBuckets: Int, lam: Seq[Long])
    extends UnaryExpression {
  require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
  require(lam.length == numBuckets,
    s"dense λ table must have exactly numBuckets=$numBuckets entries, got ${lam.length}")

  override def prettyName: String = "token_bucket_lam_sum"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $dt")
  }

  @transient private lazy val lamArr: Array[Long] = lam.toArray

  override def nullSafeEval(input: Any): Any =
    ShingleOps.tokenBucketLamSum(input.asInstanceOf[UTF8String], numBuckets, lamArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lamRef = ctx.addReferenceObj("lamArr", lamArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleOps.tokenBucketLamSum($c, $numBuckets, $lamRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WinnowFpsExpr(child: Expression, w: Int, k: Int)
    extends ShingleOpsExpression {
  require(w >= 1 && k >= 1, s"need w >= 1, k >= 1; got w=$w k=$k")
  override def prettyName: String = "winnow_fps"
  override def helperCall(c: String): String =
    s"graft.functions.ShingleOps.winnowFps($c, $w, $k)"
  override def evalHelper(s: UTF8String): Any = ShingleOps.winnowFps(s, w, k)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-doc distinct bigram TF rows (see [[ShingleOps.bigramTf]]): string
  * in, array<struct<prev:string, cur:string, tf:long>> out. */
case class BigramTfExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "bigram_tf"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("prev", StringType, nullable = false),
    StructField("cur", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $dt")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleOps.bigramTf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleOps.bigramTf($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[BigramTfExpr]] plus the per-doc trailing vocab-marker row
  * (see [[ShingleOps.bigramTfVocab]]): same single tokenize pass. */
case class BigramTfVocabExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "bigram_tf_vocab"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("prev", StringType, nullable = false),
    StructField("cur", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $dt")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleOps.bigramTfVocab(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleOps.bigramTfVocab($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WindowHashModsExpr(child: Expression, w: Int)
    extends ShingleOpsExpression {
  require(w >= 1, s"window width must be >= 1, got $w")
  override def helperCall(c: String): String =
    s"graft.functions.ShingleOps.windowHashMods($c, $w)"
  override def evalHelper(s: UTF8String): Any = ShingleOps.windowHashMods(s, w)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

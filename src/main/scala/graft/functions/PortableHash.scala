package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing for the dedup/similarity operators.
  *
  * Round-1 used `xxhash64`, which no ANSI engine reproduces — so the
  * MinHash/SimHash/fingerprint/LSH queries could only be rows-checked
  * against the DuckDB oracle. This module replaces it with a 60-bit hash
  * both engines compute identically: the first 15 hex digits of the MD5
  * of the UTF-8 string, parsed as an integer —
  *   Spark : `conv(substring(md5(c), 1, 15), 16, 10)::long`
  *   DuckDB: `CAST(('0x' || substr(md5(c),1,15)) AS BIGINT)`
  * MD5 of identical UTF-8 bytes is identical everywhere, and 15 hex
  * digits (60 bits) always fit a signed 64-bit int.
  *
  * MinHash permutations use the universal-hash family
  * `h_i(x) = (a_i * x + b_i) mod P` with P = 2^31 - 1 over the 60-bit
  * base hash reduced mod P: one MD5 per shingle regardless of the number
  * of permutations, and every intermediate stays below 2^62 (ANSI-safe).
  * The `a_i`/`b_i` constants derive from MD5 at CONSTANT-FOLD time (Scala
  * side) and are embedded as integer literals in both engines' plans.
  */
object PortableHash {

  /** 2^31 - 1, the Mersenne prime used for all modular arithmetic. */
  val P: Long = 2147483647L

  /** 60-bit portable hash of a string column — native codegen expression
    * ([[graft.functions.Hash60]]): md5 digest bytes straight to a long,
    * no 32-char hex string / substring / base-16 conv in the hot loop.
    */
  def hash60(c: Column): Column = Hash60.hash60(c)

  /** Composed built-in formulation of [[hash60]] — the portability
    * cross-check PortableHashSpec pins the native expression against
    * (this chain is what the DuckDB oracle twin mirrors in SQL).
    */
  def hash60Builtin(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Base hash reduced into [0, P): safe factor for modular products. */
  def hashMod(c: Column): Column = pmod(hash60(c), lit(P))

  /** DuckDB twin of [[hash60]] (e = SQL expression string). */
  def sqlHash60(e: String): String =
    s"CAST(('0x' || substr(md5($e),1,15)) AS BIGINT)"

  /** DuckDB twin of [[hashMod]]. */
  def sqlHashMod(e: String): String = s"(${sqlHash60(e)} % $P)"

  /** Scala-side md5-derived 60-bit value — used to generate deterministic
    * constants (minhash permutation coefficients, LSH plane components)
    * that are embedded as literals in BOTH engines' queries.
    */
  def const60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** MinHash permutation coefficients (a_i in [1, P), b_i in [0, P)). */
  def permConsts(n: Int): Seq[(Long, Long)] =
    (0 until n).map { i =>
      (const60(s"minhash-a:$i") % (P - 1) + 1, const60(s"minhash-b:$i") % P)
    }

  /** `h_i(base) = (a*base + b) mod P` — base MUST be in [0, P). */
  def perm(base: Column, a: Long, b: Long): Column =
    pmod(base * a + b, lit(P))

  /** Integer numerator of a hyperplane component, in [-1000001, 1000001].
    * The float component is `planeInt / 1000001.0` — kept as an INTEGER
    * plus one IEEE division so both engines (Scala literal vs SQL integer
    * literal) produce bit-identical doubles.
    */
  def planeInt(p: Int, j: Int): Long =
    const60(s"plane:$p:$j") % 2000003L - 1000001L

  /** Random-hyperplane component in [-1, 1], deterministic per (plane,
    * dim index). Generated Scala-side, embedded as array literals.
    */
  def planeComponent(p: Int, j: Int): Double = planeInt(p, j).toDouble / 1000001.0

  /** `numPlanes` x `dim` literal hyperplane matrix. */
  def planes(numPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes, dim)(planeComponent)

  /** Integer numerators of [[planes]] — for embedding in SQL oracles. */
  def planeInts(numPlanes: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(numPlanes, dim)(planeInt)
}

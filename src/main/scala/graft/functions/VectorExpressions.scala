package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst vector expressions (SURVEY.md §2.10 tier (b): a custom
  * `Expression` with `doGenCode` beats a Scala UDF and beats interpreted
  * higher-order functions). The HOF formulation
  * (`aggregate(zip_with(...))`) evaluates interpreted per row — fine for
  * a projection, ruinous inside an N×M similarity join. This expression
  * generates a tight primitive loop inside whole-stage codegen.
  *
  * Semantics match the portable form exactly: elements are widened to
  * double BEFORE multiplication and summed left-to-right, so results are
  * bit-identical to `CAST(a[i] AS DOUBLE)*CAST(b[i] AS DOUBLE)` folds in
  * any ANSI engine (the DuckDB oracle relies on this).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val fx = elemIsFloat(left); val fy = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $getA * $getB;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Symmetric per-vector int8 quantization in ONE native pass:
  * `struct(scale double, qvec array<int>)` where `scale = max|v_i|/127`
  * and `q_i = round(v_i/scale) ∈ [-127,127]` (HALF_UP, matching Spark's
  * `round`). Value-identical to the higher-order-function chain
  * `array_max(transform(abs)) → transform(round(x/scale))` it replaces
  * (PipelineSpec pins the equivalence) — but that chain evaluates
  * interpreted lambdas, breaks whole-stage codegen, and Catalyst's
  * CollapseProject + InferFiltersFromGenerate duplicate the WHOLE chain
  * into a pushed-down filter under any downstream explode (measured: the
  * duplicated interpreted chain was >10× the cost of the quantization
  * itself). Corner semantics mirror the chain exactly: null input →
  * null; null elements are skipped by the max and quantize to null;
  * an empty or all-null array has no max → scale null, qvec all-zero;
  * an all-zero vector → scale 0.0, qvec all-zero; element-wise NaN/Inf
  * pass `round` unchanged and cast to int with Scala semantics, and the
  * max uses Spark's double ordering (NaN greatest).
  */
case class QuantizeInt8Expr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "quantize_int8"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = true),
    StructField("qvec", ArrayType(IntegerType, containsNull = true), nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got $dt")
    }

  override def nullSafeEval(input: Any): Any =
    VectorExpressions.quantizeInt8Row(input.asInstanceOf[ArrayData], elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorExpressions.quantizeInt8Row($c, $elemIsFloat);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Squared-euclidean distances from a vector column to a literal
  * centroid codebook, ONE native pass: array<double> out, element i =
  * Σ_d (v_d − c_i,d)², summed left-to-right (bit-identical IEEE order
  * to the `aggregate(zip_with((a-b)*(a-b)))` fold it replaces — the
  * HOF chain evaluates interpreted lambdas k× per row and allocates a
  * zipped array per centroid; PipelineSpec pins the equivalence).
  * Corner semantics mirror the chain exactly: null input → null; a
  * length mismatch or any null element → that centroid's distance is
  * null (zip_with pads the shorter side with null and the fold
  * propagates it).
  *
  * `cents` is `Seq[Seq[Double]]`, not arrays — case-class value
  * equality is what Catalyst plan canonicalization (and StageCache
  * plan-identity reuse) compare.
  */
case class CentroidDists(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {
  require(cents.nonEmpty, "centroid codebook must be non-empty")

  override def prettyName: String = "centroid_dists"

  @transient private lazy val centArrays: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got $dt")
    }

  override def nullSafeEval(input: Any): Any =
    VectorExpressions.centroidDistsArray(
      input.asInstanceOf[ArrayData], centArrays, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the codebook into the generated class once, not per row
    val centsRef = ctx.addReferenceObj("cents", centArrays, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorExpressions.centroidDistsArray($c, $centsRef, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of positions where two long arrays agree, ONE native pass —
  * the MinHash signature-similarity numerator, evaluated once per
  * CANDIDATE PAIR (the largest intermediate the dedup family builds at
  * corpus scale). Value-identical to
  * `size(filter(zip_with(a, b, (x, y) => x === y), p => p))`
  * (PipelineSpec pins the equivalence): only positions below the
  * shorter length can match (zip_with pads the longer side with null,
  * `===` nulls out, filter drops nulls), a position with EITHER element
  * null contributes nothing (null === anything → null), and a
  * both-null position also contributes nothing (null === null is null
  * under `===`, not true).
  */
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sig_agree"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two array<long>, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExpressions.sigAgreeCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorExpressions.sigAgreeCount($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sign-LSH bucket id in ONE native pass: bit p of the result is set
  * iff the dot product of the vector with deterministic hyperplane p
  * (`PortableHash.planes(numPlanes, maxDim)` — the same literals the
  * SQL oracles embed) is ≥ 0. Value-identical to the per-plane
  * `aggregate(zip_with(vec, w, x·c))` fold chain it replaces
  * (PipelineSpec pins the equivalence): products widen to double and
  * sum left-to-right per plane. The corner contract is NON-NULL —
  * matching the `when(proj >= 0, bit).otherwise(0)` chain: a null
  * input, a null element, or a vector longer than `maxDim` yields
  * bucket 0 (every plane's fold nulls out and `otherwise` zeroes the
  * bit); an EMPTY vector yields all bits set (the empty fold is 0.0,
  * and 0.0 ≥ 0); a NaN projection sets its bit (Spark's NaN-greatest
  * comparison).
  */
case class LshBucketExpr(child: Expression, numPlanes: Int, maxDim: Int)
    extends UnaryExpression {
  require(numPlanes >= 1 && numPlanes <= 62, s"numPlanes must be in [1,62], got $numPlanes")
  require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")

  override def prettyName: String = "lsh_bucket"

  @transient private lazy val planes: Array[Array[Double]] =
    PortableHash.planes(numPlanes, maxDim)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got $dt")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else VectorExpressions.lshBucketLong(v.asInstanceOf[ArrayData], planes, elemIsFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = ${childGen.isNull} ? 0L :
          graft.functions.VectorExpressions.lshBucketLong(${childGen.value}, $planesRef, $elemIsFloat);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}

  /** One-pass evaluation backing [[LshBucketExpr]]. See the expression
    * Scaladoc for the non-null corner contract.
    */
  def lshBucketLong(a: ArrayData, planes: Array[Array[Double]], elemIsFloat: Boolean): Long = {
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return 0L; i += 1 }
    if (n > planes(0).length) return 0L
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      var s = 0.0
      var j = 0
      while (j < n) {
        s += (if (elemIsFloat) a.getFloat(j).toDouble else a.getDouble(j)) * w(j)
        j += 1
      }
      if (s >= 0.0 || java.lang.Double.isNaN(s)) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** One-pass evaluation backing [[CentroidDists]] (interpreted eval and
    * generated code both call it). See the expression Scaladoc for the
    * corner-semantics contract.
    */
  def centroidDistsArray(
      a: ArrayData,
      cents: Array[Array[Double]],
      elemIsFloat: Boolean): ArrayData = {
    val n = a.numElements()
    var hasNullElem = false
    var i = 0
    while (i < n && !hasNullElem) { if (a.isNullAt(i)) hasNullElem = true; i += 1 }
    val k = cents.length
    val out = new Array[Any](k)
    var anyNull = false
    var ci = 0
    while (ci < k) {
      val c = cents(ci)
      if (hasNullElem || c.length != n) { anyNull = true }
      else {
        var s = 0.0
        var j = 0
        while (j < n) {
          val d = (if (elemIsFloat) a.getFloat(j).toDouble else a.getDouble(j)) - c(j)
          s += d * d
          j += 1
        }
        out(ci) = java.lang.Double.valueOf(s)
      }
      ci += 1
    }
    if (!anyNull) {
      val prim = new Array[Double](k)
      var m = 0
      while (m < k) { prim(m) = out(m).asInstanceOf[java.lang.Double].doubleValue(); m += 1 }
      UnsafeArrayData.fromPrimitiveArray(prim)
    } else new GenericArrayData(out)
  }

  /** One-pass evaluation backing [[QuantizeInt8Expr]] (called from both
    * interpreted eval and generated code). See the expression Scaladoc
    * for the corner-semantics contract.
    */
  def quantizeInt8Row(a: ArrayData, elemIsFloat: Boolean): InternalRow = {
    val n = a.numElements()
    var ma = 0.0
    var hasMa = false
    var hasNull = false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) hasNull = true
      else {
        val v = math.abs(if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i))
        // Spark double ordering (NaN greatest) == java.lang.Double.compare
        if (!hasMa || java.lang.Double.compare(v, ma) > 0) { ma = v; hasMa = true }
      }
      i += 1
    }
    if (!hasMa)
      return new GenericInternalRow(Array[Any](null,
        UnsafeArrayData.fromPrimitiveArray(new Array[Int](n))))
    val scale = ma / 127.0
    val scaleBoxed = java.lang.Double.valueOf(scale)
    if (java.lang.Double.compare(ma, 0.0) <= 0)
      return new GenericInternalRow(Array[Any](scaleBoxed,
        UnsafeArrayData.fromPrimitiveArray(new Array[Int](n))))
    val qv: ArrayData =
      if (!hasNull) {
        val out = new Array[Int](n)
        var j = 0
        while (j < n) {
          out(j) = roundHalfUpToInt(
            (if (elemIsFloat) a.getFloat(j).toDouble else a.getDouble(j)) / scale)
          j += 1
        }
        UnsafeArrayData.fromPrimitiveArray(out)
      } else {
        val out = new Array[Any](n)
        var j = 0
        while (j < n) {
          if (!a.isNullAt(j))
            out(j) = java.lang.Integer.valueOf(roundHalfUpToInt(
              (if (elemIsFloat) a.getFloat(j).toDouble else a.getDouble(j)) / scale))
          j += 1
        }
        new GenericArrayData(out)
      }
    new GenericInternalRow(Array[Any](scaleBoxed, qv))
  }

  /** `cast(round(x, 0) as int)` with Spark semantics: HALF_UP via the
    * decimal string form (Spark's Round for double), NaN/Inf unchanged
    * through the round, Scala toInt for the cast.
    */
  private def roundHalfUpToInt(x: Double): Int =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x.toInt
    else BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble.toInt

  /** Column-level native dot product. (Spark 4's Column is ColumnNode-
    * backed; GraftColumnBridge is the classic bridge both ways.)
    */
  def dot_product(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpr(a), toExpr(b)))

  /** Column-level native int8 quantization:
    * `struct(scale double, qvec array<int>)`.
    */
  def quantize_int8(v: Column): Column =
    toColumn(QuantizeInt8Expr(toExpr(v)))

  /** Column-level native squared distances to a literal codebook:
    * `array<double>` of length `cents.size`.
    */
  def centroid_dists(v: Column, cents: Seq[Seq[Double]]): Column =
    toColumn(CentroidDists(toExpr(v), cents))

  /** Column-level native sign-LSH bucket id (long, bit per plane). */
  def lsh_bucket(v: Column, numPlanes: Int, maxDim: Int): Column =
    toColumn(LshBucketExpr(toExpr(v), numPlanes, maxDim))

  /** Column-level native signature-agreement count (int). */
  def sig_agree(a: Column, b: Column): Column =
    toColumn(SigAgree(toExpr(a), toExpr(b)))

  /** One-pass evaluation backing [[SigAgree]]. */
  def sigAgreeCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** Register `dot_product` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
}

package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity operators.
  *
  * The composed formulations (`aggregate(zip_with(...))` folds) evaluate as
  * interpreted higher-order lambdas — a closure invocation per element per
  * centroid; at dim 64 × nlist 16 that is ~2k interpreted calls per row.
  * These kernels run the same IEEE operation sequence (sequential
  * left-to-right accumulation, identical to the fold) in one tight loop,
  * and stay inside whole-stage codegen via the reference-call bridge.
  */
object VectorExpressions {
  @inline private[expressions] def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  private[expressions] def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** Cosine similarity of two numeric arrays (float or double elements),
  * accumulated left-to-right in double — bit-identical to the
  * `aggregate(zip_with(...))` formulation it replaces.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  @transient private lazy val lFloat = VectorExpressions.isFloatArray(left.dataType)
  @transient private lazy val rFloat = VectorExpressions.isFloatArray(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = VectorExpressions.elem(x, i, lFloat)
      val yv = VectorExpressions.elem(y, i, rFloat)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  /** Public bridge for generated code. */
  def compute(a: Any, b: Any): Any = nullSafeEval(a, b)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this, classOf[CosineSimExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = ((java.lang.Double) $ref.compute($a, $b)).doubleValue();")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** The `n` nearest centroid ids (squared-L2, ties to the smaller id),
  * nearest first — the centroid table rides in the expression itself
  * (nlist×dim doubles), so assignment is a pure projection with no join,
  * no window, no shuffle.
  */
case class NearestCentroidsExpr(
    child: Expression,
    cids: Array[Int],
    centroids: Array[Array[Double]],
    n: Int)
    extends UnaryExpression with SinglePassCodegen {

  require(cids.length == centroids.length && n >= 1)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val isFloat = VectorExpressions.isFloatArray(child.dataType)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val k = centroids.length
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      val lim = math.min(cent.length, v.numElements())
      var s = 0.0
      var i = 0
      while (i < lim) {
        val d = VectorExpressions.elem(v, i, isFloat) - cent(i)
        s += d * d; i += 1
      }
      dists(c) = s; c += 1
    }
    // partial selection of the n smallest; strict < keeps the earlier
    // (smaller-cid) centroid on ties
    val take = math.min(n, k)
    val out = new Array[Int](take)
    val used = new Array[Boolean](k)
    var filled = 0
    while (filled < take) {
      var best = -1
      var c2 = 0
      while (c2 < k) {
        if (!used(c2) && (best < 0 || dists(c2) < dists(best))) best = c2
        c2 += 1
      }
      used(best) = true
      out(filled) = cids(best)
      filled += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsExpr =
    copy(child = newChild)
}

/** Sign-bit LSH bucket id from `numPlanes` pseudo-random hyperplanes —
  * native single-pass kernel. Bit-identical to the composed formulation
  * (`aggregate(zip_with(vec, sequence(...)))` per plane): the plane
  * component for (p, i) is pmod(xxhash64(p, i), 1e6)/1e6 - 0.5 with
  * Spark's chained xxhash64 (seed 42), and the projection accumulates
  * left-to-right in double, exactly like the sequential fold. The
  * composed form costs numPlanes × dim interpreted closure calls per
  * row; this runs one fused loop over a per-dimension component table
  * computed once per (numPlanes, dim).
  */
case class LshBucketExpr(child: Expression, numPlanes: Int)
    extends UnaryExpression with SinglePassCodegen {
  require(numPlanes >= 0 && numPlanes <= 63,
    s"numPlanes in [0, 63]: $numPlanes — 1L << p wraps silently at p >= 64")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val isFloat = VectorExpressions.isFloatArray(child.dataType)

  // plane components depend only on (plane, index): computed once per
  // observed dimension, shared across rows (and across local threads)
  @transient private lazy val componentCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]

  private def components(dim: Int): Array[Array[Double]] =
    componentCache.computeIfAbsent(dim, { d =>
      Array.tabulate(numPlanes) { p =>
        Array.tabulate(d) { i =>
          // Spark's multi-arg xxhash64 chains: seed 42, then each argument
          // (both IntegerType here) feeds the next hash
          val h1 = org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(p, IntegerType, 42L)
          val h2 = org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(i, IntegerType, h1)
          val m = 1000000L
          val pm = ((h2 % m) + m) % m
          pm.toDouble / 1000000.0 - 0.5
        }
      }
    })

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val comps = components(dim)
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      val comp = comps(p)
      var proj = 0.0
      var i = 0
      while (i < dim) {
        proj += VectorExpressions.elem(v, i, isFloat) * comp(i)
        i += 1
      }
      if (proj > 0) bucket |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

/** [[LshBucketExpr]] with an EXPLICIT hyperplane table instead of the
  * xxhash64-derived one — the oracle-gate variant: the caller derives the
  * plane components from a hash an external engine can also compute (e.g.
  * md5 → dyadic rationals, [[graft.ops.Similarity.md5Planes]]), so the
  * bucket assignment is recomputable bit-for-bit outside Spark. Same
  * left-to-right double accumulation and strict `proj > 0` sign rule as
  * the production kernel; dimensions beyond a plane's length contribute
  * nothing (min-length loop, like [[CosineSimExpr]]).
  */
case class PlaneLshBucketExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with SinglePassCodegen {
  require(planes.length <= 63,
    s"plane count <= 63: ${planes.length} — 1L << p wraps silently at p >= 64")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val isFloat = VectorExpressions.isFloatArray(child.dataType)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val comp = planes(p)
      val lim = math.min(comp.length, v.numElements())
      var proj = 0.0
      var i = 0
      while (i < lim) {
        proj += VectorExpressions.elem(v, i, isFloat) * comp(i)
        i += 1
      }
      if (proj > 0) bucket |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneLshBucketExpr =
    copy(child = newChild)
}

/** Product-quantization code assignment (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): the vector is
  * split into `m` contiguous subvectors of `dim/m` components; subspace
  * `j` is assigned the id of its nearest codebook entry (squared-L2,
  * index-order accumulation, strict `<` keeps the smaller code on ties —
  * the same tie rule as [[NearestCentroidsExpr]]). The codebooks ride in
  * the expression (m×ksub×subdim doubles), so encoding is a pure
  * projection — no join, no shuffle. Returns `array<int>` of m codes.
  */
case class PqCodesExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with SinglePassCodegen {

  require(codebooks.nonEmpty && codebooks.forall(_.length == codebooks(0).length) &&
      codebooks.forall(_.forall(_.length == codebooks(0)(0).length)),
    "codebooks must be non-empty with uniform ksub and subdim across subspaces")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val isFloat = VectorExpressions.isFloatArray(child.dataType)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = codebooks.length
    val sd = codebooks(0)(0).length
    // any dim mismatch must fail loudly, in BOTH directions: a short
    // vector would score truncated subspaces as distance 0 to EVERY
    // centroid (artificially close, wrong neighbors); a LONG vector
    // (128-d data against 64-d-trained codebooks) would silently encode
    // only its prefix — trainPqCodebooks requires dim % m == 0 and
    // covers the full dimension, so exact length is the only valid shape
    require(v.numElements() == m * sd,
      s"vector has ${v.numElements()} elements; PQ codebooks need exactly ${m * sd}")
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val book = codebooks(j)
      val base = j * sd
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var s = 0.0
        var i = 0
        while (i < sd) {
          val d = VectorExpressions.elem(v, base + i, isFloat) - cent(i)
          s += d * d; i += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      out(j) = best; j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodesExpr =
    copy(child = newChild)
}

/** Per-query asymmetric-distance lookup table for PQ/ADC: entry
  * `j*ksub + c` is the squared-L2 distance (index-order fold) between the
  * query's subvector `j` and codebook entry `(j, c)`. Computed ONCE per
  * query row — the ADC score of a (query, code-vector) pair is then just
  * `m` array lookups + `m−1` adds, which is the entire point of PQ: the
  * corpus-side scan touches `m` small ints per vector, never `dim`
  * floats. Returns `array<double>` of m×ksub entries, subspace-major.
  */
case class PqLutExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with SinglePassCodegen {

  require(codebooks.nonEmpty && codebooks.forall(_.length == codebooks(0).length) &&
      codebooks.forall(_.forall(_.length == codebooks(0)(0).length)),
    "codebooks must be non-empty with uniform ksub and subdim across subspaces")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val isFloat = VectorExpressions.isFloatArray(child.dataType)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = codebooks.length
    val ksub = codebooks(0).length
    val sd = codebooks(0)(0).length
    // same exact-length rule as PqCodesExpr: short clamps read as
    // distance 0, long vectors would silently score on their prefix
    require(v.numElements() == m * sd,
      s"vector has ${v.numElements()} elements; PQ codebooks need exactly ${m * sd}")
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val book = codebooks(j)
      val base = j * sd
      var c = 0
      while (c < ksub) {
        val cent = book(c)
        var s = 0.0
        var i = 0
        while (i < sd) {
          val d = VectorExpressions.elem(v, base + i, isFloat) - cent(i)
          s += d * d; i += 1
        }
        out(j * ksub + c) = s; c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** Residual of a vector against its assigned centroid — `v − c_list`,
  * componentwise IEEE subtraction (array<double>). The centroid table
  * rides in the expression, so IVF-PQ residual encoding stays a pure
  * projection: `PqCodesExpr(ResidualExpr(vec, list))` composes into one
  * codegen'd pipeline with no join. `list` ids index the table by
  * position of the cid (the [[NearestCentroidsExpr]] output).
  */
case class ResidualExpr(left: Expression, right: Expression,
    cids: Array[Int], centroids: Array[Array[Double]])
    extends BinaryExpression {

  require(cids.length == centroids.length && centroids.nonEmpty)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable

  @transient private lazy val isFloat = VectorExpressions.isFloatArray(left.dataType)
  @transient private lazy val byCid: Map[Int, Array[Double]] =
    cids.zip(centroids).toMap

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cid = b.asInstanceOf[Int]
    val cent = byCid.getOrElse(cid,
      throw new IllegalArgumentException(s"unknown centroid id $cid"))
    require(v.numElements() >= cent.length,
      s"vector has ${v.numElements()} elements; centroid has ${cent.length}")
    val out = new Array[Double](cent.length)
    var i = 0
    while (i < cent.length) {
      out(i) = VectorExpressions.elem(v, i, isFloat) - cent(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Public bridge for generated code. */
  def compute(a: Any, b: Any): Any = nullSafeEval(a, b)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this, classOf[ResidualExpr].getName)
    // explicit boxing: janino's autoboxing of a primitive int argument
    // into an Object parameter is not guaranteed across versions
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.compute($a, java.lang.Integer.valueOf($b));")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ResidualExpr =
    copy(left = newLeft, right = newRight)
}

/** Centered orthonormal rotation `y = R·(x − mu)` — the OPQ-lite
  * preprocessing (rotate into decorrelated coordinates before PQ's
  * subspace split; PCA rotation is the classic OPQ approximation, Ge et
  * al. CVPR'13 §2). The k×d matrix and the means ride in the expression,
  * so rotation is a pure projection — no join, no shuffle — and because
  * rotation preserves pairwise L2 distances (centering cancels in
  * differences), ADC distances over rotated codes estimate the SAME
  * metric the raw-coordinate PQ estimates. Index-order accumulation per
  * output component: bit-reproducible.
  */
case class RotateExpr(child: Expression, means: Array[Double],
    components: Array[Array[Double]])
    extends UnaryExpression with SinglePassCodegen {

  require(components.nonEmpty && components.forall(_.length == means.length),
    "components must be non-empty rows of the means' dimension")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val isFloat = VectorExpressions.isFloatArray(child.dataType)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = means.length
    require(v.numElements() == d,
      s"vector has ${v.numElements()} elements; rotation expects exactly $d")
    val out = new Array[Double](components.length)
    var c = 0
    while (c < components.length) {
      val row = components(c)
      var s = 0.0
      var i = 0
      while (i < d) {
        s += (VectorExpressions.elem(v, i, isFloat) - means(i)) * row(i)
        i += 1
      }
      out(c) = s
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RotateExpr =
    copy(child = newChild)
}

object NativeVectorFunctions {
  /** Column API for [[CosineSimExpr]]. */
  def cosine(a: Column, b: Column): Column =
    SparkInternals.column(CosineSimExpr(
      SparkInternals.expression(a), SparkInternals.expression(b)))

  /** Column API for [[LshBucketExpr]]. */
  def lshBucket(vec: Column, numPlanes: Int): Column =
    SparkInternals.column(LshBucketExpr(SparkInternals.expression(vec), numPlanes))

  /** Column API for [[PlaneLshBucketExpr]]. */
  def planeLshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    SparkInternals.column(PlaneLshBucketExpr(SparkInternals.expression(vec), planes))

  /** Column API for [[NearestCentroidsExpr]]. */
  def nearestCentroids(vec: Column, centroids: Array[(Int, Array[Double])], n: Int): Column =
    SparkInternals.column(NearestCentroidsExpr(
      SparkInternals.expression(vec),
      centroids.map(_._1), centroids.map(_._2), n))

  /** Column API for [[PqCodesExpr]]. */
  def pqCodes(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    SparkInternals.column(PqCodesExpr(SparkInternals.expression(vec), codebooks))

  /** Column API for [[ResidualExpr]]. */
  def residual(vec: Column, list: Column,
      centroids: Array[(Int, Array[Double])]): Column =
    SparkInternals.column(ResidualExpr(
      SparkInternals.expression(vec), SparkInternals.expression(list.cast("int")),
      centroids.map(_._1), centroids.map(_._2)))

  /** Column API for [[PqLutExpr]]. */
  def pqLut(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    SparkInternals.column(PqLutExpr(SparkInternals.expression(vec), codebooks))

  /** Column API for [[RotateExpr]]. */
  def rotate(vec: Column, means: Array[Double],
      components: Array[Array[Double]]): Column =
    SparkInternals.column(RotateExpr(SparkInternals.expression(vec), means, components))
}

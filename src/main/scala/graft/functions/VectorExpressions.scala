package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dense-vector kernels as native Catalyst `Expression`s.
  *
  * The higher-order-function route (`zip_with` + `aggregate`,
  * [[VectorFunctions]]) is interpreted per element — lambda dispatch and
  * boxing per float — which made all-pairs cosine the bench bottleneck.
  * These expressions participate in whole-stage codegen: the generated code
  * calls a static primitive loop over the Tungsten `ArrayData`, no copies,
  * no boxing.
  *
  * Numeric contract (shared with the DuckDB oracle): every element is
  * widened to double BEFORE multiplication and the sum accumulates
  * sequentially left-to-right — bit-identical to `list_dot_product` on
  * `DOUBLE[]` lists, so results stay hash-comparable.
  */
object VecOps {
  /** Sequential-double dot product over two Tungsten arrays. */
  def dot(a: ArrayData, b: ArrayData, isFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    }
    s
  }

  /** Random-hyperplane sign-bit signature in ONE pass over the vector —
    * the narrow-map replacement for a posexplode + nBits-aggregate groupBy
    * (which shuffles rows×dim elements). Hyperplane component (b, i)
    * derives from the same murmur3-of-int family Spark's `hash()` uses
    * (seed 42), mapped to [-1, 1): no RNG state, executors and re-runs
    * agree bit-for-bit.
    */
  def hyperplaneSig(v: ArrayData, nBits: Int, isFloat: Boolean): Long = {
    val n = v.numElements()
    val sums = new Array[Double](nBits)
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      var b = 0
      while (b < nBits) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashInt(b * 7919 + i, 42)
        val m = ((h % 2000001) + 2000001) % 2000001
        sums(b) += x * ((m - 1000000).toDouble / 1000000.0)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < nBits) { if (sums(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Top-`nprobe` nearest centroids (cosine desc, id asc) for one vector in
    * ONE narrow pass — the map-side replacement for the broadcast-join +
    * `row_number over Window.partitionBy(vec_id)` argmax, which re-shuffled
    * the whole corpus on vec_id (k×corpus rows through an Exchange) once
    * per assignment pass. Centroids are driver state (k×dim doubles), so
    * the argmax needs no join at all.
    *
    * Arithmetic is bit-identical to the join form: centroid floats are
    * exactly widened to double up front, dot/norm accumulate sequentially
    * left-to-right, cosine = dot/(‖v‖·‖c‖) with the 0-norm case ordered
    * last (the join form yields null, which `desc` also orders last).
    */
  def nearestCells(v: ArrayData, cvecs: Array[Array[Double]],
      cnorms: Array[Double], ids: Array[Long], nprobe: Int,
      isFloat: Boolean): ArrayData =
    nearestCells(v, cvecs, cnorms, ids, nprobe, isFloat, false)

  /** `l2 = true` ranks centroids by ascending L2 distance instead of
    * descending cosine, via the monotone-equivalent score
    * x·c − ‖c‖²/2 (‖x‖² is constant per vector) — the assignment rule
    * product quantization needs, where codeword MAGNITUDE matters for
    * reconstruction, not just direction.
    */
  def nearestCells(v: ArrayData, cvecs: Array[Array[Double]],
      cnorms: Array[Double], ids: Array[Long], nprobe: Int,
      isFloat: Boolean, l2: Boolean): ArrayData = {
    val k = cvecs.length
    val n = v.numElements()
    var vn = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      vn += x * x
      i += 1
    }
    vn = math.sqrt(vn)
    val sims = new Array[Double](k)
    var j = 0
    while (j < k) {
      val c = cvecs(j)
      val m = math.min(n, c.length)
      var s = 0.0
      var t = 0
      while (t < m) {
        val x = if (isFloat) v.getFloat(t).toDouble else v.getDouble(t)
        s += x * c(t)
        t += 1
      }
      if (l2) {
        sims(j) = s - (cnorms(j) * cnorms(j)) / 2.0
      } else {
        val denom = vn * cnorms(j)
        sims(j) = if (denom == 0.0) Double.NegativeInfinity else s / denom
      }
      j += 1
    }
    // selection: top nprobe by (sim desc, id asc); ids are sorted asc, so a
    // strict > keeps the lower id on ties — same order the window produced
    val p = math.min(nprobe, k)
    val out = new Array[Long](p)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < p) {
      var best = -1
      var bs = Double.NegativeInfinity
      var q = 0
      while (q < k) {
        if (!taken(q) && (best == -1 || sims(q) > bs)) { best = q; bs = sims(q) }
        q += 1
      }
      taken(best) = true
      out(r) = ids(best)
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Sequential-double squared-L2 distance. */
  def l2sq(a: ArrayData, b: ArrayData, isFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d =
        if (isFloat) a.getFloat(i).toDouble - b.getFloat(i).toDouble
        else a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }
}

/** Shared analysis-time gate: the kernels read elements via
  * `ArrayData.getFloat`/`getDouble`, so anything but array<float> /
  * array<double> would be silently misread — fail at analysis instead.
  */
object VecTypeCheck {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  def check(exprName: String, children: Seq[Expression]): TypeCheckResult = {
    val bad = children.filterNot(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (bad.nonEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$exprName requires array<float> or array<double> arguments, got " +
          bad.map(_.dataType.simpleString).mkString(", "))
    else if (children.map(_.dataType.asInstanceOf[ArrayType].elementType)
        .distinct.size > 1)
      // the kernels pick float-vs-double reads from the FIRST argument, so
      // mixed widths would silently misread the other side
      TypeCheckResult.TypeCheckFailure(
        s"$exprName requires all arguments to share one element type, got " +
          children.map(_.dataType.simpleString).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess
  }
}

/** dot(a, b) over array<float> / array<double> columns. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecTypeCheck.check("vec_dot", Seq(left, right))

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecOps.dot($a, $b, $isFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance over array<float> / array<double> columns. */
case class VecL2Sq(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecTypeCheck.check("vec_l2sq", Seq(left, right))

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecOps.l2sq($a, $b, $isFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

/** Single-pass random-hyperplane signature over an embedding column. */
case class VecHyperplaneSig(child: Expression, nBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nBits > 0 && nBits <= 63, "signature must fit a long")
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecTypeCheck.check("vec_hyperplane_sig", Seq(child))

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(v: Any): Any =
    VecOps.hyperplaneSig(v.asInstanceOf[ArrayData], nBits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VecOps.hyperplaneSig($v, $nBits, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression)
      : VecHyperplaneSig = copy(child = newChild)
}

/** Fused map-side IVF cell assignment: top-`nprobe` centroid ids for an
  * embedding column, centroids held as driver state and shipped inside the
  * expression (a few KB), so assignment is a narrow projection — no
  * broadcast join, no per-vector window shuffle. `ids` MUST be sorted
  * ascending (ties resolve to the lower id, matching the window form).
  */
case class VecNearestCentroids(child: Expression, ids: Array[Long],
    cvecs: Array[Array[Double]], nprobe: Int, l2: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(cvecs.nonEmpty, "at least one centroid")
  require(nprobe > 0, "nprobe must be positive")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecTypeCheck.check("vec_nearest_centroids", Seq(child))

  // ‖c‖ precomputed once per centroid; deterministic on re-materialization
  @transient private lazy val cnorms: Array[Double] =
    cvecs.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(v: Any): Any =
    VecOps.nearestCells(v.asInstanceOf[ArrayData], cvecs, cnorms, ids,
      nprobe, isFloat, l2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cvecsRef = ctx.addReferenceObj("cvecs", cvecs, "double[][]")
    val cnormsRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VecOps.nearestCells(" +
        s"$v, $cvecsRef, $cnormsRef, $idsRef, $nprobe, $isFloat, $l2);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : VecNearestCentroids = copy(child = newChild)
}

object VectorExpressions {
  def hyperplaneSig(v: Column, nBits: Int): Column =
    GraftColumnBridge.column(
      VecHyperplaneSig(GraftColumnBridge.expression(v), nBits))

  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def l2sq(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VecL2Sq(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** array<long> of the `nprobe` nearest centroid ids (cosine desc, id
    * asc). `ids` must be sorted ascending and positionally aligned with
    * `cvecs`.
    */
  def nearestCentroids(v: Column, ids: Array[Long],
      cvecs: Array[Array[Double]], nprobe: Int): Column =
    GraftColumnBridge.column(
      VecNearestCentroids(GraftColumnBridge.expression(v), ids, cvecs, nprobe))

  /** L2 variant: nearest by ascending squared distance (via the monotone
    * x·c − ‖c‖²/2 score) — the product-quantization assignment rule.
    */
  def nearestCentroidsL2(v: Column, ids: Array[Long],
      cvecs: Array[Array[Double]], nprobe: Int): Column =
    GraftColumnBridge.column(
      VecNearestCentroids(GraftColumnBridge.expression(v), ids, cvecs,
        nprobe, l2 = true))
}

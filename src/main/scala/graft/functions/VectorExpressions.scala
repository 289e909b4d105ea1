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

/** dot(a, b) over array<float> / array<double> columns. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

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
}

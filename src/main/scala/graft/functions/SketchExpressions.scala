package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Codegen'd probes against DRIVER-BUILT sketches shipped inside the
  * expression (both `spark.util.sketch` classes are `Serializable`; a
  * filter over a benchmark-sized eval set is a few hundred KB — the same
  * driver-state discipline as [[VecNearestCentroids]]' centroids).
  *
  * The point at 100 TB: probing a broadcast sketch is a NARROW map over
  * the corpus — the corpus-side rows never shuffle, never join, never
  * explode; only the (tiny) candidate survivors pay the exact follow-up.
  * These expressions keep that probe inside whole-stage codegen instead
  * of a Scala UDF's serialization/boxing path.
  */
object SketchExpressions {

  /** `bloom.mightContain(col)` over a string column. */
  def mightContain(c: Column, bloom: BloomFilter): Column =
    GraftColumnBridge.column(
      BloomMightContainExpr(GraftColumnBridge.expression(c), bloom))

  /** `cms.estimateCount(col)` over a string column. */
  def cmsEstimate(c: Column, cms: CountMinSketch): Column =
    GraftColumnBridge.column(
      CmsEstimateExpr(GraftColumnBridge.expression(c), cms))

  private[functions] def requireString(name: String, child: Expression)
      : TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires a string argument, got ${child.dataType.simpleString}")
}

/** Bloom membership probe. `putString`/`putBinary` in Spark's sketch both
  * hash the UTF-8 bytes, so probing with the raw `UTF8String` bytes is
  * consistent with any build path.
  */
case class BloomMightContainExpr(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    SketchExpressions.requireString("bloom_might_contain", child)

  override protected def nullSafeEval(s: Any): Any =
    bloom.mightContainBinary(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, s => s"$ref.mightContainBinary($s.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContainExpr = copy(child = newChild)
}

/** Count-Min point estimate (never an underestimate; over by at most
  * eps·N with the sketch's confidence).
  */
case class CmsEstimateExpr(child: Expression, cms: CountMinSketch)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    SketchExpressions.requireString("cms_estimate", child)

  override protected def nullSafeEval(s: Any): Any =
    cms.estimateCount(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    defineCodeGen(ctx, ev, s => s"$ref.estimateCount($s.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CmsEstimateExpr = copy(child = newChild)
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{MinhashSigExpr, NfcNormalizeExpr, RepetitionStatsExpr, ShinglesExpr, SimhashExpr, TokensExpr, VecDot, VecHyperplaneSig, VecL2Sq}

/** SQL surface for the native kernels: install with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) and the codegen
  * expressions become callable from plain SQL:
  *
  * {{{
  *   SELECT vec_dot(a, b), graft_tokens(text),
  *          graft_shingles(text, 3), minhash_sig(text, 8, 3)
  * }}}
  *
  * Literal-int arguments (k, n) are extracted at resolution time; the
  * expressions themselves participate in whole-stage codegen like any
  * built-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => BpeCountRewrite)
  }
}

/** Rewrite `size(bpe_encode(text, pieces))` to the count-only kernel
  * ([[graft.functions.BpeCountExpr]]): the packing/budget operators need
  * token COUNTS, never the id arrays, and the naive spelling allocates
  * an `array<int>` per document just to take its length. Same greedy
  * MaxMatch walk, same nullability (`size` returns null on null input
  * in the non-legacy mode — the only mode rewritten), no allocation.
  * Injected by [[GraftExtensions]]; also applied by
  * [[GraftExtensions.install]] through `spark.experimental
  * .extraOptimizations` for sessions built without extensions.
  */
object BpeCountRewrite
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.Size
  import graft.functions.{BpeCountExpr, BpeEncodeExpr}
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    // ...WithSubqueries: the spelling inside a scalar/IN/EXISTS subquery
    // plan rewrites too (plain transformAllExpressions never descends
    // into SubqueryExpression plans — a missed optimization, not a bug)
    plan.transformAllExpressionsWithSubqueries {
      // legacy sizeOfNull (size(null) = -1) would change semantics:
      // BpeCountExpr is null-on-null, so only the modern mode rewrites
      case Size(enc: BpeEncodeExpr, false) =>
        BpeCountExpr(enc.child, enc.pieces)
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))),
    (new FunctionIdentifier("vec_l2sq"),
      new ExpressionInfo(classOf[VecL2Sq].getName, "vec_l2sq"),
      (args: Seq[Expression]) => VecL2Sq(args(0), args(1))),
    (new FunctionIdentifier("graft_tokens"),
      new ExpressionInfo(classOf[TokensExpr].getName, "graft_tokens"),
      (args: Seq[Expression]) => TokensExpr(args(0))),
    (new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "graft_shingles"),
      (args: Seq[Expression]) =>
        ShinglesExpr(args(0), intLit(args(1), "shingle n"))),
    (new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinhashSigExpr(args(0),
        intLit(args(1), "k"), intLit(args(2), "shingle n"))),
    (new FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimhashExpr].getName, "simhash"),
      (args: Seq[Expression]) => SimhashExpr(args(0), intLit(args(1), "bits"))),
    (new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStatsExpr].getName,
        "repetition_stats"),
      (args: Seq[Expression]) => RepetitionStatsExpr(args(0))),
    (new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalizeExpr(args(0))),
    (new FunctionIdentifier("vec_hyperplane_sig"),
      new ExpressionInfo(classOf[VecHyperplaneSig].getName, "vec_hyperplane_sig"),
      (args: Seq[Expression]) =>
        VecHyperplaneSig(args(0), intLit(args(1), "nBits"))),
    // zvalue(c1, ..., cn, bits): N-column Morton interleave, composed from
    // built-in shift/and/multiply/add nodes so it codegens like any
    // arithmetic (mirrors graft.store.ZOrder.zValueN)
    (new FunctionIdentifier("zvalue"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "zvalue"),
      (args: Seq[Expression]) => {
        require(args.size >= 3,
          "zvalue needs at least two columns and a bits literal")
        zValueExpr(args.init, intLit(args.last, "bits"))
      }),
  )

  private def zValueExpr(cols: Seq[Expression], bits: Int): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    val n = cols.size
    require(bits >= 1 && bits * n <= 63, s"bits*$n must fit a signed long")
    val longs = cols.map(c => Cast(c, org.apache.spark.sql.types.LongType))
    val terms: Seq[Expression] = for {
      i <- 0 until bits
      (c, j) <- longs.zipWithIndex
    } yield Multiply(BitwiseAnd(ShiftRight(c, Literal(i)), Literal(1L)),
      Literal(1L << (i * n + j)))
    terms.reduce(Add(_, _))
  }

  /** Register on an already-running session (withExtensions only applies
    * at construction time). Functions go through the registry; the
    * [[BpeCountRewrite]] optimizer rule rides
    * `spark.experimental.extraOptimizations`, the post-construction hook
    * for logical rules.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.GraftColumnBridge
        .registerFunction(spark, id, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(BpeCountRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BpeCountRewrite
  }
}

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType}

/** Optimizer rule: recognize the composable dot-product shape
  * `aggregate(zip_with(a, b, (x,y) => double(x)*double(y)), 0.0, +)` over
  * float arrays and replace it with the codegen'd [[DotProductF]].
  *
  * The rewrite is behavior-preserving by construction: DotProductF
  * reproduces the fold exactly (same order, same null semantics), so
  * users keep writing the declarative form and the optimizer supplies
  * the fast path — the Catalyst way to make a hot kernel disappear from
  * profiles without changing any call sites.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private object DoubleOf {
    def unapply(e: Expression): Option[NamedLambdaVariable] = e match {
      case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(DoubleOf(x), DoubleOf(y), _), Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _)),
        Literal(zero, DoubleType),
        LambdaFunction(Add(accRef: NamedLambdaVariable, elemRef: NamedLambdaVariable, _),
          Seq(acc: NamedLambdaVariable, elem: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), _))
      if zero == 0.0 && isFloatArray(a) && isFloatArray(b) &&
        x.exprId == lx.exprId && y.exprId == ly.exprId &&
        accRef.exprId == acc.exprId && elemRef.exprId == elem.exprId &&
        fin.exprId == finArg.exprId =>
      DotProductF(a, b)
  }
}

/** Session extensions: the `graft_dot` SQL function plus the HOF→native
  * rewrite. Activated via `spark.sql.extensions=graft.plans.GraftExtensions`
  * (graft.Sessions sets it for every entry point).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductF].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProductF(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigAgg].getName, "graft_minhash_sig"),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash_sig(hash, k): k must be an integer literal, got $other")
        }
        MinHashSigAgg(children(0), k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash_sig"),
      new ExpressionInfo(classOf[SimHashSigAgg].getName, "graft_simhash_sig"),
      (children: Seq[Expression]) => {
        if (children.length != 1) throw new IllegalArgumentException(
          s"graft_simhash_sig(hash) takes 1 argument, got ${children.length}")
        SimHashSigAgg(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_theta_sketch"),
      new ExpressionInfo(classOf[ThetaSketchAgg].getName, "graft_theta_sketch"),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_theta_sketch(hash, k): k must be an integer literal, got $other")
        }
        ThetaSketchAgg(children(0), k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[CountMinSketchAgg].getName, "graft_cms"),
      (children: Seq[Expression]) => {
        if (children.length != 3) throw new IllegalArgumentException(
          s"graft_cms(hash, depth, width) takes 3 arguments, got ${children.length}")
        val args = children.drop(1).map {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_cms(hash, depth, width): depth/width must be integer literals, got $other")
        }
        CountMinSketchAgg(children.head, args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_heavy_hitters"),
      (children: Seq[Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"graft_heavy_hitters(item, k) takes 2 arguments, got ${children.length}")
        val k = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_heavy_hitters(item, k): k must be an integer literal, got $other")
        }
        MisraGriesAgg(children(0), k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_quantile_sketch"),
      new ExpressionInfo(classOf[QuantileSampleAgg].getName, "graft_quantile_sketch"),
      (children: Seq[Expression]) => {
        if (children.length != 3) throw new IllegalArgumentException(
          s"graft_quantile_sketch(hash, value, k) takes 3 arguments, got ${children.length}")
        val k = children(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_quantile_sketch(hash, value, k): k must be an integer literal, got $other")
        }
        QuantileSampleAgg(children(0), children(1), k)
      }))
    // Spark's bloom probe expression exists but is not SQL-registered
    // (it backs runtime row-level filtering); expose it for the
    // incremental-dedup pre-filter.
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) => BloomFilterMightContain(children(0), children(1))))
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectPlannerStrategy(_ => GroupedTopKStrategy)
    ext.injectPlannerStrategy(_ => IntervalJoinStrategy)
  }
}

package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.aggregate

/** Session-extension entry point — the (c) tier of the extension
  * preference order: whole-session integration of graft's native
  * expressions via `SparkSessionExtensions`.
  *
  * Activate at session build time with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`:
  *   - `cosine_similarity_native` / `squared_distance_native` become
  *     callable from SQL text, not just the Column API;
  *   - [[RewriteHofVectorMath]] runs in the optimizer, transparently
  *     replacing the interpreted higher-order cosine / squared-distance
  *     folds with the codegen'd native expressions (bit-identical
  *     results — same sequential double accumulation), so even queries
  *     written against the composable HOF API get the hot-path plan.
  *
  * For an already-running session, [[GraftExtensions.register]] adds the
  * SQL functions and `spark.experimental.extraOptimizations` can carry
  * the rewrite rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => RewriteHofVectorMath)
  }
}

object GraftExtensions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def binary(
      name: String,
      cls: Class[_],
      build: (Expression, Expression) => Expression
  ): FunctionDescription =
    (
      FunctionIdentifier(name),
      new ExpressionInfo(cls.getCanonicalName, name),
      (args: Seq[Expression]) => {
        if (args.length != 2)
          throw new IllegalArgumentException(
            s"$name expects exactly 2 arguments, got ${args.length}"
          )
        build(args(0), args(1))
      }
    )

  /** The SQL-callable native expressions. `hilbert_index(x, y, bits)` and
    * `unicode_normalize(s, 'NFC')` take their static parameter as a
    * foldable literal (the expression needs it at construction). */
  val functions: Seq[FunctionDescription] = Seq(
    binary(
      "cosine_similarity_native",
      classOf[CosineSimilarityExpr],
      CosineSimilarityExpr(_, _)
    ),
    binary(
      "squared_distance_native",
      classOf[SquaredDistanceExpr],
      SquaredDistanceExpr(_, _)
    ),
    (
      FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndexExpr].getCanonicalName, "hilbert_index"),
      (args: Seq[Expression]) => args match {
        case Seq(x, y, Literal(bits: Int, org.apache.spark.sql.types.IntegerType)) =>
          HilbertIndexExpr(x, y, bits)
        case Seq(x, y) => HilbertIndexExpr(x, y, 16)
        case _ =>
          throw new IllegalArgumentException(
            "hilbert_index expects (x, y[, bits literal])"
          )
      }
    ),
    (
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalizeExpr].getCanonicalName, "unicode_normalize"),
      (args: Seq[Expression]) => args match {
        case Seq(s, Literal(form, org.apache.spark.sql.types.StringType)) =>
          UnicodeNormalizeExpr(s, form.toString)
        case Seq(s) => UnicodeNormalizeExpr(s, "NFC")
        case _ =>
          throw new IllegalArgumentException(
            "unicode_normalize expects (str[, form literal])"
          )
      }
    ),
    // Mergeable sketch AGGREGATES (graft.functions.Sketches), SQL-callable:
    // the builder hands the analyzer a bare ScalaAggregator (an
    // AggregateFunction) and resolution wraps it into an AggregateExpression
    // exactly like a built-in aggregate — map-side partials and executor
    // merges included, so the SQL form keeps the sketches' one-pass
    // guarantees. Static parameters (capacity / depth / width) must be
    // integer literals: the Aggregator needs them at construction.
    (
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(
        classOf[graft.functions.Sketches.MisraGries].getCanonicalName,
        "misra_gries"
      ),
      (args: Seq[Expression]) => args match {
        case Seq(v, Literal(cap: Int, org.apache.spark.sql.types.IntegerType)) =>
          aggregate.ScalaAggregator(
            Seq(v),
            new graft.functions.Sketches.MisraGries(cap),
            stringEncoder,
            mapStringLongEncoder,
            aggregatorName = Some("misra_gries")
          )
        case _ =>
          throw new IllegalArgumentException(
            "misra_gries expects (value, capacity int literal)"
          )
      }
    ),
    (
      FunctionIdentifier("count_min"),
      new ExpressionInfo(
        classOf[graft.functions.Sketches.CountMin].getCanonicalName,
        "count_min"
      ),
      (args: Seq[Expression]) => args match {
        case Seq(
              v,
              Literal(depth: Int, org.apache.spark.sql.types.IntegerType),
              Literal(width: Int, org.apache.spark.sql.types.IntegerType)
            ) =>
          aggregate.ScalaAggregator(
            Seq(v),
            new graft.functions.Sketches.CountMin(depth, width),
            stringEncoder,
            longArrayEncoder,
            aggregatorName = Some("count_min")
          )
        case _ =>
          throw new IllegalArgumentException(
            "count_min expects (value, depth int literal, width int literal)"
          )
      }
    )
  )

  // Explicit AgnosticEncoder construction (shared with the sketches'
  // buffer/output encoders) — NO scala-reflect TypeTags, so the SQL
  // functions resolve under REPL/embedded classloaders too.
  import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoders, ExpressionEncoder}

  private def stringEncoder: ExpressionEncoder[String] =
    ExpressionEncoder(AgnosticEncoders.StringEncoder)

  private def mapStringLongEncoder: ExpressionEncoder[Map[String, Long]] =
    graft.functions.Sketches.mapStringLongEncoder

  private def longArrayEncoder: ExpressionEncoder[Array[Long]] =
    graft.functions.Sketches.longArrayEncoder

  /** Register the SQL functions into an already-built session (the
    * config-time path above goes through the same descriptors). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

/** Optimizer rule replacing the canonical higher-order vector-math shapes
  * (`VectorFunctions.cosineSimilarity` / `squaredDistance`: a left fold of
  * a `zip_with`/`transform` product) with the native codegen'd
  * expressions. Interpreted lambda evaluation is the dominant cost of
  * brute-force similarity scans (PERFORMANCE.md item 1); this rewrite
  * makes the fix transparent to code written against the composable API.
  *
  * The match is deliberately conservative: only the exact fold shape the
  * library emits (zero literal 0.0, Add merge lambda, identity finish,
  * element-wise Multiply) is touched, and the replacement is bit-identical
  * by construction — both forms accumulate doubles sequentially
  * left-to-right. Anything else is left untouched.
  */
object RewriteHofVectorMath extends Rule[LogicalPlan] {

  /** `aggregate(xs, 0.0D, (acc, x) => acc + x)` — the library's fsum. */
  private def asFoldSum(e: Expression): Option[Expression] = e match {
    case agg: ArrayAggregate =>
      val zeroOk = agg.zero match {
        case Literal(z, org.apache.spark.sql.types.DoubleType) =>
          z.asInstanceOf[Double] == 0.0
        case _ => false
      }
      val mergeOk = agg.merge match {
        case LambdaFunction(_: Add, _, _) => true
        case _                            => false
      }
      val finishOk = agg.finish match {
        case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
          v.exprId == a.exprId
        case _ => false
      }
      if (zeroOk && mergeOk && finishOk) Some(agg.argument) else None
    case _ => None
  }

  /** fsum(zip_with(a, b, (x, y) => X * Y)) => dot-product of (a, b). */
  private def asDot(e: Expression): Option[(Expression, Expression)] =
    asFoldSum(e).collect {
      case zw: ZipWith if zw.function.isInstanceOf[LambdaFunction] &&
        zw.function.asInstanceOf[LambdaFunction].function.isInstanceOf[Multiply] =>
        (zw.left, zw.right)
    }

  /** sqrt(fsum(transform(a, x => x' * x'))) => L2 norm of a. */
  private def asNorm(e: Expression): Option[Expression] = e match {
    case s: Sqrt =>
      asFoldSum(s.child).collect {
        case t: ArrayTransform if t.function.isInstanceOf[LambdaFunction] &&
          t.function.asInstanceOf[LambdaFunction].function.isInstanceOf[Multiply] =>
          t.argument
      }
    case _ => None
  }

  /** fsum(zip_with(a, b, (x, y) => (x'-y')*(x'-y'))) => squared distance. */
  private def asSqDist(e: Expression): Option[(Expression, Expression)] =
    asFoldSum(e).collect {
      case zw: ZipWith if zw.function.isInstanceOf[LambdaFunction] && {
        zw.function.asInstanceOf[LambdaFunction].function match {
          case m: Multiply =>
            m.left.isInstanceOf[Subtract] && m.left.semanticEquals(m.right)
          case _ => false
        }
      } =>
        (zw.left, zw.right)
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case d: Divide =>
        (asDot(d.left), d.right) match {
          case (Some((a, b)), m: Multiply) =>
            (asNorm(m.left), asNorm(m.right)) match {
              case (Some(na), Some(nb))
                  if na.semanticEquals(a) && nb.semanticEquals(b) =>
                CosineSimilarityExpr(a, b)
              case _ => d
            }
          case _ => d
        }
      case agg: ArrayAggregate =>
        asSqDist(agg) match {
          case Some((a, b)) => SquaredDistanceExpr(a, b)
          case None         => agg
        }
    }
}

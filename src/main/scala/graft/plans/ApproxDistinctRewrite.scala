package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, IsNotNull, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.expressions.Conv
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.aggregate.ScalaAggregator
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** Opt-in approximate-query acceleration: a Catalyst optimizer rule
  * that rewrites `count(DISTINCT x)` into the deterministic KMV
  * estimate ([[graft.functions.KmvEstimate]]) when the session asks
  * for it. An exact distinct over a 100 TB fact column is a full
  * data-sized shuffle of the distinct keys (planned as an Expand +
  * two-phase aggregate); the KMV aggregate is a bounded ≤k-long buffer
  * with map-side partials — the shuffle carries k·8 bytes per
  * partition per group. The BlinkDB-style contract, made Spark-native:
  * the QUERY is unchanged, the session flag decides exactness, and
  * because the sketch is h60-deterministic the "approximate" answer is
  * still bit-reproducible run to run (and exact below k distinct
  * values per group).
  *
  * Configuration (session confs):
  *   - `spark.graft.approxDistinct`: "true" enables the rewrite
  *   - `spark.graft.approxDistinct.k`: sketch size (default 256,
  *     σ ≈ 1/√k ≈ 6%)
  *
  * Scope guard: only single-argument, unfiltered `count(DISTINCT x)`
  * is rewritten; multi-column distincts and FILTER clauses keep exact
  * semantics. The counted expression is cast to string and h60-hashed
  * (the same hash the oracle-checked sketches ride); a null-filter
  * clause on the substituted aggregate preserves count(DISTINCT)'s
  * null-ignoring semantics. The substitution happens INSIDE the Alias,
  * so output names, exprIds, and LongType are untouched — downstream
  * operators cannot tell, which is the point.
  *
  * The rule runs post-analysis (extraOptimizations), so the
  * substituted tree is built fully resolved: explicit Casts (with the
  * session time zone), and a [[ScalaAggregator]] with resolveAndBind-ed
  * encoders — the analyzer's ResolveEncodersInScalaAgg has already run
  * and won't come back for us.
  *
  * Installed like [[DangerousWriteGate]]: session-builder extensions or
  * [[ApproxDistinctRewrite.install]] on a live session.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  final val EnabledKey = "spark.graft.approxDistinct"
  final val KKey = "spark.graft.approxDistinct.k"

  /** h60 of the counted expression, as fully-resolved catalyst nodes:
    * cast(conv(substr(md5(cast(cast(x as string) as binary)), 1, 15),
    * 16, 10) as long) — PortableHash.h60col with the analyzer's
    * implicit string→binary cast made explicit.
    */
  private def h60Expr(child: Expression): Expression = {
    val tz = Some(conf.sessionLocalTimeZone)
    val asString = Cast(child, StringType, tz)
    val hex = Substring(Md5(Cast(asString, BinaryType, tz)),
      Literal(1), Literal(15))
    Cast(Conv(hex, Literal(16), Literal(10)), LongType, tz)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").toBoolean) return plan
    val k = conf.getConfString(KKey, "256").toInt
    val longEnc = ExpressionEncoder[Long]().resolveAndBind()
    val bufEnc = ExpressionEncoder[Array[Long]]().resolveAndBind()
    plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae: AggregateExpression if ae.isDistinct &&
              ae.filter.isEmpty &&
              ae.aggregateFunction.isInstanceOf[Count] &&
              ae.aggregateFunction.children.lengthCompare(1) == 0 =>
            val child = ae.aggregateFunction.children.head
            val sketch = ScalaAggregator(
              Seq(h60Expr(child)),
              new graft.functions.KmvEstimate(k),
              longEnc, bufEnc,
              nullable = false,
              isDeterministic = true,
              aggregatorName = Some(s"kmv_estimate_$k"))
            sketch.toAggregateExpression()
              .copy(filter = Some(IsNotNull(child)))
        }
    }
  }

  /** Attach to a live session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  /** Detach from a live session. */
  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == this)
}

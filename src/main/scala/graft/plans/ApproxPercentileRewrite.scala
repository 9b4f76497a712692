package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, IsNotNull, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.expressions.Conv
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.aggregate.ScalaAggregator
import org.apache.spark.sql.types.{BinaryType, DoubleType, LongType, NumericType, StringType}

/** Opt-in approximate-quantile acceleration — [[ApproxDistinctRewrite]]
  * for percentiles: a Catalyst optimizer rule that substitutes
  * `percentile(x, p)` (and `percentile_approx(x, p, a)` over double
  * columns) with the deterministic bounded-state
  * [[graft.functions.KmvQuantile]] census sketch when the session asks
  * for it.
  *
  * Why each direction matters at 100 TB:
  *   - exact `percentile` buffers EVERY value per group
  *     (OpenHashMap state) — unbounded memory, the aggregate that
  *     falls over first on a fact column. The sketch is ≤ k
  *     (hash, value, count) triples with map-side partials.
  *   - `percentile_approx` is already bounded (GK summaries), but its
  *     result depends on partition layout and merge order; the KMV
  *     census is a pure function of the DATA under h60 — the same
  *     answer on any cluster shape, rerun, or engine (the property all
  *     oracle-checked sketches here ride).
  *
  * Same contract as the distinct rewrite: the QUERY is unchanged, the
  * session flag decides, the estimate is exact below k distinct values
  * per group (the census is complete there, and the finish implements
  * `Percentile`'s own interpolation), and the substitution happens
  * inside the Alias so names/types are untouched. Guards keep exact
  * semantics for everything else: scalar foldable percentage only (no
  * array form), no DISTINCT, no FILTER, frequency 1, numeric child —
  * and for `percentile_approx` a DoubleType child only, because its
  * return type follows the child and the sketch emits double.
  *
  * Configuration (session confs):
  *   - `spark.graft.approxPercentile`: "true" enables the rewrite
  *   - `spark.graft.approxPercentile.k`: sample size (default 512;
  *     distinct-domain quantile error ~1/√k, frequency-skew caveat in
  *     the aggregator docs)
  */
object ApproxPercentileRewrite extends Rule[LogicalPlan] {

  final val EnabledKey = "spark.graft.approxPercentile"
  final val KKey = "spark.graft.approxPercentile.k"

  /** h60 of the aggregated VALUE (sampling key): cast(conv(substr(
    * md5(cast(cast(x as string) as binary)), 1, 15), 16, 10) as long).
    */
  private def h60Expr(child: Expression): Expression = {
    val tz = Some(conf.sessionLocalTimeZone)
    val asString = Cast(child, StringType, tz)
    val hex = Substring(Md5(Cast(asString, BinaryType, tz)),
      Literal(1), Literal(15))
    Cast(Conv(hex, Literal(16), Literal(10)), LongType, tz)
  }

  private def scalarPct(e: Expression): Option[Double] = e match {
    case _ if e.foldable && e.dataType == DoubleType =>
      Option(e.eval()).map(_.asInstanceOf[Double])
    case _ => None
  }

  /** (child, percentage) when the aggregate is rewritable. */
  private def extract(f: AggregateFunction): Option[(Expression, Double)] =
    f match {
      case p: Percentile
          if p.child.dataType.isInstanceOf[NumericType] &&
            p.frequencyExpression.foldable &&
            Option(p.frequencyExpression.eval()).contains(1L) =>
        scalarPct(p.percentageExpression).map(p.child -> _)
      case p: ApproximatePercentile if p.child.dataType == DoubleType =>
        scalarPct(p.percentageExpression).map(p.child -> _)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").toBoolean) return plan
    val k = conf.getConfString(KKey, "512").toInt
    val inEnc = ExpressionEncoder[(Long, Double)]().resolveAndBind()
    val bufEnc =
      ExpressionEncoder[graft.functions.ValueCensusBuf]().resolveAndBind()
    plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae: AggregateExpression if !ae.isDistinct &&
              ae.filter.isEmpty && extract(ae.aggregateFunction).isDefined =>
            val (child, pct) = extract(ae.aggregateFunction).get
            val tz = Some(conf.sessionLocalTimeZone)
            val sketch = ScalaAggregator(
              Seq(h60Expr(child), Cast(child, DoubleType, tz)),
              new graft.functions.KmvQuantile(k, pct),
              inEnc, bufEnc,
              nullable = true,
              isDeterministic = true,
              aggregatorName = Some(s"kmv_quantile_$k"))
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

package graft.functions

import graft.model.Severity
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator: max-severity-with-payload — reduces a group of
  * (severity, rule) findings to the single worst one, carrying which
  * rule caused it (the payload that plain `max(severity)` drops and
  * `max_by` covers untyped; this is the `Aggregator[IN, BUF, OUT]`
  * surface from SURVEY.md §2.3's UDF/UDAF row).
  *
  * Merge is associative/commutative with a lexicographic (severity,
  * rule) tiebreak, so partial aggregation across partitions is
  * deterministic.
  */
final class MaxSeverityAgg
    extends Aggregator[(Int, String), (Int, String), String] {

  def zero: (Int, String) = (Severity.Safe - 1, "")

  def reduce(b: (Int, String), a: (Int, String)): (Int, String) =
    merge(b, a)

  def merge(b1: (Int, String), b2: (Int, String)): (Int, String) =
    if (b2._1 > b1._1 || (b2._1 == b1._1 && b2._2 > b1._2)) b2 else b1

  def finish(r: (Int, String)): String =
    if (r._1 < Severity.Safe) "SAFE"
    else if (r._2.isEmpty) Severity.label(r._1)
    else s"${Severity.label(r._1)}(${r._2})"

  def bufferEncoder: Encoder[(Int, String)] =
    Encoders.tuple(Encoders.scalaInt, Encoders.STRING)

  def outputEncoder: Encoder[String] = Encoders.STRING
}

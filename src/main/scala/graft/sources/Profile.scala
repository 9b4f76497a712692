package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Column-level data profiling: null counts, cardinalities, min/max —
  * the pre/post-migration validation report (does the target's shape
  * match the source's?). One wide aggregation computes every column's
  * stats in a single pass over the data (one job, one scan — never one
  * job per column), so profiling 100 TB costs one read.
  */
object Profile {

  final case class ColumnProfile(column: String, dataType: String,
      nRows: Long, nNulls: Long, approxDistinct: Long,
      min: String, max: String)

  /** Profile every column of `df` in one scan. Distinct counts are
    * HLL-approximate (rsd 2%) — exact distincts per column would be a
    * shuffle per column.
    */
  def profile(df: DataFrame): Seq[ColumnProfile] = {
    val cols = df.schema.fields
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { f =>
      val c = col(f.name)
      // min/max over complex types isn't ordered — guard to atomic types
      import org.apache.spark.sql.types._
      val orderable = f.dataType match {
        case _: ArrayType | _: MapType | _: StructType | _: BinaryType => false
        case _ => true
      }
      Seq(
        count(when(c.isNull, 1)).as(s"__nulls_${f.name}"),
        approx_count_distinct(
          if (orderable) c else to_json(c), 0.02)
          .as(s"__dist_${f.name}"),
        (if (orderable) min(c).cast("string") else lit(null))
          .as(s"__min_${f.name}"),
        (if (orderable) max(c).cast("string") else lit(null))
          .as(s"__max_${f.name}"))
    }.toIndexedSeq
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    cols.toSeq.map { f =>
      ColumnProfile(f.name, f.dataType.simpleString, n,
        row.getAs[Long](s"__nulls_${f.name}"),
        row.getAs[Long](s"__dist_${f.name}"),
        Option(row.getAs[String](s"__min_${f.name}")).getOrElse(""),
        Option(row.getAs[String](s"__max_${f.name}")).getOrElse(""))
    }
  }

  /** Source/target profile comparison: per-column drift report.
    * Approximate-distinct drift beyond `distinctTolerance` (relative)
    * counts as a mismatch; min/max/null counts compare exactly.
    */
  def compare(src: Seq[ColumnProfile], dst: Seq[ColumnProfile],
      distinctTolerance: Double = 0.05): Seq[String] = {
    val dstBy = dst.map(p => p.column -> p).toMap
    src.flatMap { s =>
      dstBy.get(s.column) match {
        case None => Seq(s"column ${s.column}: missing in target")
        case Some(d) =>
          val issues = Seq.newBuilder[String]
          if (s.nRows != d.nRows)
            issues += s"column ${s.column}: rows ${s.nRows} -> ${d.nRows}"
          if (s.nNulls != d.nNulls)
            issues += s"column ${s.column}: nulls ${s.nNulls} -> ${d.nNulls}"
          if (s.min != d.min || s.max != d.max)
            issues += s"column ${s.column}: range [${s.min}, ${s.max}] -> [${d.min}, ${d.max}]"
          val rel = math.abs(s.approxDistinct - d.approxDistinct).toDouble /
            math.max(1L, s.approxDistinct)
          if (rel > distinctTolerance)
            issues += s"column ${s.column}: distinct ~${s.approxDistinct} -> ~${d.approxDistinct}"
          issues.result()
      }
    } ++ dst.filterNot(p => src.exists(_.column == p.column))
      .map(p => s"column ${p.column}: unexpected in target")
  }
}

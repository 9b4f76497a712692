package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-16 optimization parity pins: every rewrite that changed an
  * operator's INTERNALS (not its values) is held bit-equal to the
  * round-15 dataflow, re-implemented verbatim here as the reference.
  * The oracle sweep pins the end-to-end hashes; these pin the factored
  * helpers directly so a drift is attributed to the right rewrite.
  */
class OptimizationParitySpec extends SparkFunSuite {

  /** The round-15 bpeTrain dataflow, verbatim (50-round distributed
    * loop: per-round pair census + collect + replace + checkpoint).
    */
  private def bpeTrainOld(census: DataFrame, nMerges: Int)
      : (Seq[(Int, String, String)], DataFrame) = {
    var seqs = census.select(col("word"), col("cnt"),
      rtrim(regexp_replace(col("word"), "(.)", "$1 ")).as("seq"))
    val merges =
      scala.collection.mutable.ArrayBuffer[(Int, String, String)]()
    var exhausted = false
    for (rank <- 1 to nMerges if !exhausted) {
      val arrs = seqs
        .select(col("cnt"), split(col("seq"), " ").as("t"))
        .select(col("cnt"),
          slice(col("t"), lit(1), size(col("t")) - 1).as("la"),
          slice(col("t"), lit(2), size(col("t")) - 1).as("ra"))
      val bestRow = arrs
        .select(col("cnt"),
          explode(arrays_zip(col("la"), col("ra"))).as("p"))
        .select(col("p.la").as("l"), col("p.ra").as("r"), col("cnt"))
        .groupBy(col("l"), col("r")).agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect().headOption
      bestRow match {
        case None => exhausted = true
        case Some(best) =>
          val (bl, br) = (best.getString(0), best.getString(1))
          merges += ((rank, bl, br))
          seqs = seqs.select(col("word"), col("cnt"),
            replace(col("seq"), lit(bl + " " + br), lit(bl + br))
              .as("seq"))
            .localCheckpoint()
      }
    }
    (merges.toSeq, seqs)
  }

  private def assertBpeParity(census: DataFrame, nMerges: Int): Unit = {
    val (mNew, sNew) =
      graft.queries.TextCurationOps.bpeTrain(census, nMerges)
    val (mOld, sOld) = bpeTrainOld(census, nMerges)
    assert(mNew == mOld, "merge tables differ")
    val key = Seq("word", "cnt", "seq")
    val newRows = sNew.select(key.map(col): _*).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    val oldRows = sOld.select(key.map(col): _*).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    assert(newRows.toSeq == oldRows.toSeq, "final sequences differ")
  }

  test("bpeTrain single-task kernel ≡ round-15 distributed loop on the " +
      "sf0.001 corpus census (merges + final seqs, 50 merges)") {
    val census = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(graft.queries.TextOps.words(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    assertBpeParity(census, 50)
  }

  test("bpeTrain parity on an adversarial census: UTF-8 vs UTF-16 order " +
      "divergence, count ties broken by (lhs, rhs), cross-token replace " +
      "artifacts, repeated-letter runs") {
    import spark.implicits._
    // ｡ is EF BD A1 in UTF-8 but sorts AFTER U+10000 (F0 90 80 80)
    // in UTF-16 code-unit order (D800 DC00) — pins the byte-order
    // comparator. "aaaa" pins non-overlapping left-to-right replace.
    // Equal-count pairs pin the (c desc, l, r) tie-break.
    val census = Seq(
      ("aaaa", 7L), ("aaa", 3L), ("ab", 5L), ("ba", 5L),
      ("｡x", 4L), (new String(Character.toChars(0x10000)) + "x", 4L),
      ("zz", 2L), ("Zz", 2L), ("z", 1L), ("", 1L),
      ("café", 6L), ("cafe", 6L)
    ).toDF("word", "cnt").localCheckpoint()
    assertBpeParity(census, 12)
  }

  /** The round-15 dupSpans dataflow, verbatim (census + join-back +
    * (doc_id, pos) distinct).
    */
  private def dupSpansOld(norm: DataFrame, L: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val posts = norm
      .select(col("doc_id"), col("t"),
        posexplode(graft.functions.Winnow.gramHashes(col("t"), L)))
      .select(col("doc_id"), (col("pos") + 1).cast("bigint").as("pos"),
        col("col").as("g"))
    val crossg = posts.select(col("doc_id"), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select(col("g"))
    val dup = posts.join(crossg, "g")
      .select(col("doc_id"), col("pos")).distinct()
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prev = lag(col("pos"), 1).over(wDoc)
    dup
      .withColumn("brk",
        when(prev.isNull || col("pos") - prev > L, 1).otherwise(0))
      .withColumn("isl", sum(col("brk")).over(wDoc))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (L - 1)).as("e"))
  }

  test("orientedTriangles packed closing key: the id-packed fast path " +
      "(ids < 2^31) and the two-key fallback (huge ids) enumerate the " +
      "same triangle set") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) + a dangling edge; shifting every
    // id by 2^31 forces the unpackable fallback — same triangles.
    val small = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val shift = 1L << 31
    val big = small.select((col("a") + shift).as("a"),
      (col("b") + shift).as("b"))
    def tris(df: org.apache.spark.sql.DataFrame) =
      graft.queries.GraphOps.orientedTrianglesOf(df)
        .select(col("u"), col("v"), col("w")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .map { case (u, v, w) =>
          val s = Seq(u % shift, v % shift, w % shift).sorted
          (s(0), s(1), s(2))
        }.sorted.toSeq
    val smallTris = tris(small)
    assert(smallTris.size == 4, s"K4 has 4 triangles, got $smallTris")
    assert(tris(big) == smallTris,
      "fallback (unpackable ids) must enumerate the same triangles")
  }

  test("dupSpans window-census shape ≡ round-15 census+join shape on " +
      "the sf0.001 corpus (full (doc_id, isl, s, e) span set)") {
    val norm = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        regexp_replace(lower(col("text")), "\\s+", " ").as("t"))
      .localCheckpoint()
    def rows(df: DataFrame) = df
      .select(col("doc_id"), col("isl"), col("s"), col("e")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val newSpans = rows(graft.queries.TextOps.dupSpans(norm, 20))
    val oldSpans = rows(dupSpansOld(norm, 20))
    assert(newSpans.nonEmpty, "fixture must produce duplicated spans")
    assert(newSpans == oldSpans, "span sets differ")
  }
}

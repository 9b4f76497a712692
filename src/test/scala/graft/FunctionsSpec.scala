package graft

import graft.functions.ShingleMinHash
import graft.queries.TextOps
import org.apache.spark.sql.functions._

/** Custom-expression tests: the Catalyst ShingleMinHash must be
  * bit-identical to the composable higher-order form it replaces.
  */
class FunctionsSpec extends SparkFunSuite {

  test("ShingleMinHash matches the composable minhashSig(shingles3) form") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark group query row data slow small filter"),
      (3L, "a b c"), // exactly one shingle
      (4L, "one two"), // zero shingles
      (5L, "x y z x y z x y z")) // repeated shingles
      .toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val fast = docs.select(col("doc_id"),
      ShingleMinHash.shingleMinhash(toks).as("sig"))
    val slow = docs.select(col("doc_id"),
      TextOps.minhashSig(TextOps.shingles3(toks)).as("sig"))
    val f = fast.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    val s = slow.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Option(r.getSeq[Long](1))))
    f.zip(s).foreach { case ((idF, sigF), (idS, sigSOpt)) =>
      assert(idF == idS)
      sigSOpt match {
        case Some(sigS) if !sigS.contains(null) =>
          assert(sigF == sigS, s"signature mismatch for doc $idF")
        case _ =>
          // composable form yields nulls for zero shingles; the custom
          // expression yields Long.MaxValue sentinels — both mean
          // "no shingles", only the custom one is join-safe
          assert(sigF.forall(_ == Long.MaxValue))
      }
    }
  }

  test("VectorDot matches the aggregate(zip_with) composable form " +
      "bit-for-bit, including float/double mixes and null semantics") {
    import spark.implicits._
    import graft.functions.VectorDot
    // adversarial values: denormal-adjacent, sign-of-zero, large/small
    // magnitude mixes where accumulation ORDER changes the last bits —
    // equality here proves the op sequence is identical, not just close
    val vecs = Seq(
      (1L, Seq(1.5f, -2.25f, 3.125f, 0.1f), Seq(0.3f, 1e30f, -1e-30f, 7f)),
      (2L, Seq(0.0f, -0.0f, 1e-38f, 3e38f), Seq(-0.0f, 0.0f, 1e38f, 1e-9f)),
      (3L, Seq.fill(64)(0.1f), Seq.fill(64)(-0.3f)),
      (4L, Seq.empty[Float], Seq.empty[Float]))
      .toDF("id", "a", "b")
    def slow(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) =>
        p.cast("double") * q.cast("double")), lit(0.0), (acc, v) => acc + v)
    val rows = vecs.select(col("id"),
      VectorDot.dot(col("a"), col("b")).as("fast"),
      slow(col("a"), col("b")).as("slow")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        s"dot mismatch for id ${r.getLong(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
    }
    // float × double-literal mix (the s02/d12 hyperplane shape)
    val planes = typedLit(Seq(0.5, -1.25, 2.0, 0.125))
    val mixed = vecs.filter(col("id") === 1).select(
      VectorDot.dot(col("a"), planes).as("fast"),
      slow(col("a"), planes).as("slow")).head()
    assert(mixed.getDouble(0) == mixed.getDouble(1))
    // length mismatch → NULL (zip_with pads with null and poisons the sum)
    val lm = vecs.filter(col("id") === 1).select(
      VectorDot.dot(col("a"), typedLit(Seq(1.0, 2.0))).as("fast"),
      slow(col("a"), typedLit(Seq(1.0, 2.0))).as("slow")).head()
    assert(lm.isNullAt(0) && lm.isNullAt(1))
  }

  test("VectorCosine matches the three-VectorDot composable form " +
      "bit-for-bit, including zero-norm NaN/Inf and null semantics") {
    import spark.implicits._
    import graft.functions.{VectorCosine, VectorDot}
    val vecs = Seq(
      (1L, Seq(1.5f, -2.25f, 3.125f, 0.1f), Seq(0.3f, 1e30f, -1e-30f, 7f)),
      (2L, Seq(1e-4f, -0.0f, 1e-38f, 3e38f), Seq(-0.0f, 2.0f, 1e38f, 1e-9f)),
      (3L, Seq.fill(64)(0.1f), Seq.fill(64)(-0.3f)))
      .toDF("id", "a", "b")
    def slow(x: org.apache.spark.sql.Column,
        y: org.apache.spark.sql.Column) =
      VectorDot.dot(x, y) / sqrt(VectorDot.dot(x, x)) /
        sqrt(VectorDot.dot(y, y))
    val rows = vecs.select(col("id"),
      VectorCosine.cosine(col("a"), col("b")).as("fast"),
      slow(col("a"), col("b")).as("slow")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        s"cosine mismatch for id ${r.getLong(0)}: " +
          s"${r.getDouble(1)} vs ${r.getDouble(2)}")
    }
    // float-array vs double-literal mix (the d17 benchmark shape)
    val bl = typedLit(Seq(0.5, -1.25, 2.0, 0.125))
    val mixed = vecs.filter(col("id") === 1).select(
      VectorCosine.cosine(col("a"), bl).as("fast"),
      slow(col("a"), bl).as("slow")).head()
    assert(java.lang.Double.doubleToRawLongBits(mixed.getDouble(0)) ==
      java.lang.Double.doubleToRawLongBits(mixed.getDouble(1)))
    // length mismatch → NULL in both forms
    val lm = vecs.filter(col("id") === 1).select(
      VectorCosine.cosine(col("a"), typedLit(Seq(1.0, 2.0))).as("fast"),
      slow(col("a"), typedLit(Seq(1.0, 2.0))).as("slow")).head()
    assert(lm.isNullAt(0) && lm.isNullAt(1))
    // zero-norm divergence, pinned: the composable form THROWS under
    // ANSI mode (double divide-by-zero is an error), the fused
    // expression follows IEEE and yields NaN — documented in the
    // VectorCosine scaladoc; no catalog query ever feeds a zero vector
    val z = Seq((1L, Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("id", "a", "b")
    val nan = z.select(
      VectorCosine.cosine(col("a"), col("b")).as("c")).head()
    assert(java.lang.Double.isNaN(nan.getDouble(0)))
    intercept[Exception] {
      z.select(slow(col("a"), col("b")).as("c")).head()
    }
  }

  test("SimHash60 matches the composable nested-aggregate form") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark group query row data slow small filter"),
      (3L, "one"),
      (4L, "x y z x y z"))
      .toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val fast = docs.select(col("doc_id"),
      graft.functions.SimHash60.simhash60(toks).as("sh"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val slow = docs.select(col("doc_id"),
      TextOps.simhash60(toks).as("sh"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.toSeq == slow.toSeq)
  }

  test("custom expressions are SQL-callable after registration") {
    graft.functions.GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, "alpha beta gamma delta")).toDF("id", "text")
      .createOrReplaceTempView("fn_docs")
    val viaSql = spark.sql(
      """SELECT shingle_minhash(split(text, ' '), 64, 3) AS sig,
        |       simhash60(split(text, ' ')) AS sh,
        |       winnow_fingerprint(text, 8, 16) AS fps,
        |       vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS vd,
        |       vector_cosine(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS vc
        |FROM fn_docs""".stripMargin).head()
    val viaApi = spark.table("fn_docs").select(
      ShingleMinHash.shingleMinhash(split(col("text"), " ")).as("sig"),
      graft.functions.SimHash60.simhash60(split(col("text"), " ")).as("sh"),
      graft.functions.Winnow.winnowFingerprint(col("text"), 8, 16).as("fps"),
      graft.functions.VectorDot.dot(
        typedLit(Seq(1.0, 2.0)), typedLit(Seq(3.0, 4.0))).as("vd"),
      graft.functions.VectorCosine.cosine(
        typedLit(Seq(1.0, 2.0)), typedLit(Seq(3.0, 4.0))).as("vc"))
      .head()
    assert(viaSql.getSeq[Long](0) == viaApi.getSeq[Long](0))
    assert(viaSql.getLong(1) == viaApi.getLong(1))
    assert(viaSql.getSeq[Long](2) == viaApi.getSeq[Long](2))
    assert(viaSql.getDouble(3) == viaApi.getDouble(3))
    assert(viaSql.getDouble(4) == viaApi.getDouble(4))
  }

  test("winnowing: shared long substrings guarantee shared fingerprints") {
    import spark.implicits._
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, s"PREFIX AAA $common SUFFIX BBB"),
      (2L, s"completely different lead-in text $common and another tail"),
      (3L, "nothing in common with the others at all zzz qqq www"))
      .toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
      graft.functions.Winnow.winnowFingerprint(col("text"), 8, 16).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // guarantee: any shared substring of length >= w+k-1 (=23) shares
    // at least one fingerprint; `common` is 60 chars
    assert((fps(1L) & fps(2L)).nonEmpty)
    // determinism
    val fps2 = docs.select(col("doc_id"),
      graft.functions.Winnow.winnowFingerprint(col("text"), 8, 16).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps == fps2)
    // short text → degenerate single-min fingerprint, no crash
    val tiny = Seq((9L, "abc")).toDF("doc_id", "text")
      .select(graft.functions.Winnow.winnowFingerprint(col("text"), 8, 16))
      .head().getSeq[Long](0)
    assert(tiny.isEmpty)
  }

  test("identical texts share signatures; different texts differ") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words here my friend"))
      .toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id"),
      ShingleMinHash.shingleMinhash(split(col("text"), " ")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("winnow candidates: hot fingerprints are df-pruned before the self-join") {
    import spark.implicits._
    // fp 999 is "boilerplate": shared by 300 docs — naively 300² ≈ 45k
    // candidate rows. fps 1-8 are a genuine near-dup signal between
    // docs 1 and 2 (8 shared = minShared).
    val hot = (1L to 300L).map(id => (id, 999L))
    val signal = (1L to 8L).flatMap(fp => Seq((1L, fp), (2L, fp)))
    val exploded = (hot ++ signal).toDF("doc_id", "fp")
    val pairs = TextOps.winnowCandidatePairs(exploded, minShared = 8,
      maxDf = 100)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 2L)))
    // and with the cap above the hot fp's df, the hot pairs come back
    // (shared_fps=1 each, still below minShared — but the candidate set
    // is the k² blowup the cap exists to avoid)
    val uncapped = TextOps.winnowCandidatePairs(exploded, minShared = 1,
      maxDf = 1000)
    assert(uncapped.count() == 300L * 299L / 2)
  }

  test("KmvKthMin: bounded buffer, duplicate collapse, under-k fallback") {
    val a = new graft.functions.KmvKthMin(4)
    // duplicates collapse (KMV is over the distinct hash set)
    val buf = Seq(9L, 3L, 9L, 7L, 1L, 3L).foldLeft(a.zero)(a.reduce)
    assert(buf.toSeq == Seq(1L, 3L, 7L, 9L))
    // buffer never exceeds k; a new small value evicts the largest
    val buf2 = a.reduce(buf, 2L)
    assert(buf2.toSeq == Seq(1L, 2L, 3L, 7L))
    // merge = sorted distinct union truncated to k
    val merged = a.merge(buf2, Seq(0L, 3L, 8L).foldLeft(a.zero)(a.reduce))
    assert(merged.toSeq == Seq(0L, 1L, 2L, 3L))
    assert(a.finish(merged) == 3L) // k-th smallest
    // fewer than k distincts → -1 sentinel (fall back to exact)
    assert(a.finish(Seq(5L, 6L).foldLeft(a.zero)(a.reduce)) == -1L)
  }

  test("GramHashes matches the composable transform+h60col form") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghijklmnopqrstuvwxyz 0123456789"),
      (2L, "short"), (3L, ""), (4L, "exactly twenty chars"),
      (5L, "ünïcödé multibyte grams stress the byte/char offset split"),
      // astral-plane (non-BMP) chars: 🚀/𝕊 are surrogate PAIRS in the
      // JVM but ONE character to Spark substring / DuckDB substr —
      // code-unit gram slicing would split the pair and diverge from
      // the composable form (the r6 ADVICE finding)
      (6L, "astral 🚀 rocket and 𝕊 math double-struck fill this line"))
      .toDF("doc_id", "t")
    val L = 20
    val fast = docs.select(col("doc_id"),
      graft.functions.Winnow.gramHashes(col("t"), L).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val slow = docs.select(col("doc_id"),
      when(length(col("t")) >= L,
        transform(sequence(lit(0), length(col("t")) - L), i =>
          graft.functions.PortableHash.h60col(
            col("t").substr(i + 1, lit(L)))))
        .otherwise(array().cast("array<long>")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fast.keySet == slow.keySet)
    fast.foreach { case (id, g) =>
      assert(g == slow(id), s"gram hashes differ for doc $id")
    }
    // "exactly twenty chars" (20 chars) has exactly one gram
    assert(fast(4L).length == 1)
    assert(fast(2L).isEmpty && fast(3L).isEmpty)
  }

  test("KmvMinSet: set algebra estimates real partial overlap") {
    // q71's sf0.01 fixture is degenerate (every user does every event
    // type, Jaccard 1), so the partial-overlap arm of the estimator is
    // exercised here: two 60-bit-hashed sets of 2000 ids overlapping
    // on 1000 (ids 0-1999 vs 1000-2999)
    val k = 64
    val agg = new graft.functions.KmvMinSet(k)
    def sketch(ids: Range): Array[Long] =
      ids.map(i => graft.functions.PortableHash.h60(s"kmvtest_$i"))
        .foldLeft(agg.zero)(agg.reduce)
    val ma = sketch(0 until 2000)
    val mb = sketch(1000 until 3000)
    assert(ma.length == k && mb.length == k)
    val merged = agg.merge(ma, mb) // union sketch: k smallest of both
    val hk = merged(k - 1)
    val estUnion = (k - 1).toDouble * 1152921504606846976.0 / hk.toDouble
    val shared = merged.count(h =>
      ma.contains(h) && mb.contains(h)).toDouble
    val estInter = shared / k * estUnion
    assert(math.abs(estUnion - 3000) / 3000 < 0.35,
      s"union estimate $estUnion far from 3000")
    assert(math.abs(estInter - 1000) / 1000 < 0.5,
      s"intersection estimate $estInter far from 1000")
    // merge is order-insensitive (the mergeability contract)
    assert(agg.merge(mb, ma).toSeq == merged.toSeq)
  }

  test("PII patterns fire on real PII and leave clean text untouched") {
    import spark.implicits._
    // the oracle corpus is PII-free, so the x12 hash check proves the
    // zero case; this proves the patterns actually match their classes
    val rows = Seq(
      (1L, "contact alice.smith+tag@ex-ample.co.uk today"),
      (2L, "call 555-123-4567 or 555.987.6543 now"),
      (3L, "host 192.168.0.1 and 10.0.255.13"),
      (4L, "ssn 123-45-6789 on file"),
      (5L, "no pii here, just words and 42"))
      .toDF("doc_id", "text")
    val got = rows
      .select(col("doc_id"), TextOps.redactPii(col("text")).as("red"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "contact <email> today")
    assert(got(2L) == "call <phone> or <phone> now")
    assert(got(3L) == "host <ipv4> and <ipv4>")
    assert(got(4L) == "ssn <ssn> on file")
    assert(got(5L) == "no pii here, just words and 42")
  }
}

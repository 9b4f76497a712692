package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Catalog._

/** Training-data pipeline operators over `documents` and `embeddings`:
  * deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding cosine), similarity search (brute-force + LSH-bucketed
  * ANN), and text analysis (token stats, quality scoring, language ID,
  * fingerprinting).
  *
  * Scale posture: everything row-local runs as codegen'd higher-order
  * functions (transform/aggregate/filter) — no UDFs, no driver loops.
  * Pairwise stages never do data × data cross joins at scale: MinHash/
  * SimHash/LSH band-bucket joins produce candidates first; the exact
  * all-pairs variants exist for oracle verification on the bounded
  * document corpus (500 docs — the corpus does not grow with sf).
  */
object TextOps {

  /** Whitespace-token array (both-engine-reproducible normalization). */
  private def words(c: Column): Column =
    split(regexp_replace(c, "^\\s+|\\s+$", ""), "\\s+")

  /** Distinct 3-word shingles — the dedup feature set. Word *sets* are
    * useless on a small vocabulary (every doc shares most words);
    * position-bearing shingles discriminate real near-duplicates.
    */
  def shingles3(wordsCol: Column): Column =
    // guard: sequence(0, n-3) on n<3 DESCENDS ([0,-1]) instead of being
    // empty, driving element_at to index 0 → error. Short docs get an
    // empty shingle set.
    when(size(wordsCol) >= 3,
      array_distinct(transform(sequence(lit(0), size(wordsCol) - 3), i =>
        concat_ws(" ", element_at(wordsCol, i + 1),
          element_at(wordsCol, i + 2), element_at(wordsCol, i + 3)))))
      .otherwise(array().cast("array<string>"))

  private def docs(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")

  /** documents with the shingle set materialized as a column.
    *
    * The intermediate `toks` projection is load-bearing: without it the
    * `split()` expression inlines into every `element_at` of shingles3
    * and the regex tokenization re-runs per shingle element — O(n²·regex)
    * per row (observed as a 100× slowdown). A multiply-referenced,
    * non-cheap alias survives CollapseProject, so `toks` is evaluated
    * once per row.
    */
  /** (doc_id, w=shingle set) for any (doc_id, text) frame — the
    * document-frame-agnostic form ([[graft.streaming.DedupStream]]
    * shingles per-micro-batch frames through the same definition).
    */
  private[graft] def shinglesOf(df: DataFrame): DataFrame =
    df.select(col("doc_id"), words(col("text")).as("toks"))
      .select(col("doc_id"), shingles3(col("toks")).as("w"))

  private def docShingles(s: SparkSession, d: String): DataFrame =
    shinglesOf(docs(s, d))

  private def emb(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")

  // --- incremental-dedup shared pieces (d14 in-session / d16 stored) ---

  /** LSH band hashes of a MinHash signature: band i folds its
    * rowsPerBand signature rows with the portable acc·FoldBase+v mod P
    * fold (DuckDB-rederivable). One definition for d14/d16 so the two
    * incremental-dedup postures cannot drift.
    */
  private def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), bi =>
      aggregate(
        slice(sig, bi * rowsPerBand + 1, lit(rowsPerBand)),
        lit(0L),
        (acc, v) => pmod(
          acc * graft.functions.PortableHash.FoldBase + v,
          lit(graft.functions.PortableHash.P))))

  /** (doc_id, band, band_hash) rows for a document frame — the LSH
    * band-index representation (16 rows × 16 bytes per doc). Docs with
    * <3 tokens have no shingles (identical empty signatures would
    * collide everywhere) and are excluded, exactly as d03.
    */
  private[graft] def bandIndex(df: DataFrame, bands: Int, rowsPerBand: Int)
      : DataFrame = df
    .select(col("doc_id"), words(col("text")).as("toks"))
    .filter(size(col("toks")) >= 3)
    .withColumn("sig",
      graft.functions.ShingleMinHash.shingleMinhash(col("toks")))
    .select(col("doc_id"),
      posexplode(bandHashes(col("sig"), bands, rowsPerBand)))
    .select(col("doc_id"), col("pos").as("band"), col("col").as("band_hash"))

  /** The candidate→verdict tail shared by d14/d16: exact Jaccard over
    * shingles of CANDIDATE docs only (LSH-bounded; the semi-join +
    * checkpoint keeps the tokenize+shingle scan single — the x21/d08
    * multi-consumer class), per-incoming-doc argmax (jaccard desc,
    * doc_id tiebreak), and an admit/drop verdict row for EVERY
    * incoming doc (n_matches = 0 ⇒ genuinely new).
    */
  private def lshIncrementalVerdicts(
      s: SparkSession, d: String, cand: DataFrame,
      incoming: Column): DataFrame =
    lshVerdictTail(docShingles(s, d),
      docs(s, d).filter(incoming).select(col("doc_id").as("doc_new")),
      cand)

  /** The frame-agnostic core of the verdict tail: `allShingles` is any
    * (doc_id, w) source covering both candidate sides, `incomingIds`
    * the (doc_new) universe that must each get a verdict row.
    */
  private[graft] def lshVerdictTail(allShingles: DataFrame,
      incomingIds: DataFrame, cand: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val candIds = cand
      .select(explode(array(col("doc_new"), col("doc_idx")))
        .as("doc_id"))
      .distinct()
    val sh = allShingles
      .join(candIds, Seq("doc_id"), "left_semi")
      .localCheckpoint()
    val best = cand
      .join(sh.select(col("doc_id").as("doc_new"), col("w").as("wa")),
        Seq("doc_new"))
      .join(sh.select(col("doc_id").as("doc_idx"), col("w").as("wb")),
        Seq("doc_idx"))
      .withColumn("jaccard",
        size(array_intersect(col("wa"), col("wb"))).cast("double") /
          size(array_union(col("wa"), col("wb"))).cast("double"))
      .filter(col("jaccard") >= 0.4)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_new"))
          .orderBy(col("jaccard").desc, col("doc_idx"))))
      .withColumn("n_matches",
        count(lit(1)).over(Window.partitionBy(col("doc_new"))))
      .filter(col("rn") === 1)
      .select(col("doc_new"), col("n_matches"),
        col("doc_idx").as("best_idx"), col("jaccard").as("best_jaccard"))
    incomingIds
      .join(best, Seq("doc_new"), "left")
      .select(col("doc_new"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("best_idx"), col("best_jaccard"))
      .orderBy(col("doc_new"))
  }

  /** One DuckDB oracle for BOTH incremental-dedup postures — d14 and
    * d16 differ only in where the history band index lives (session
    * checkpoint vs parquet on disk), never in semantics, so the same
    * SQL re-derives signatures, bands, candidates, and verdicts for
    * each.
    */
  private val incrementalDedupOracle: String =
    """WITH perms AS (
          SELECT
            list_transform(range(0, 64), i ->
              ('0x' || substr(md5('perm_a_' || i), 1, 15))::BIGINT % 2147483646 + 1) AS pa,
            list_transform(range(0, 64), i ->
              ('0x' || substr(md5('perm_b_' || i), 1, 15))::BIGINT % 2147483647) AS pb),
        t0 AS (
          SELECT doc_id,
            source IN ('src16','src17','src18','src19') AS inc,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents),
        sh AS (
          SELECT doc_id, inc,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS w
          FROM t0 WHERE len(w) >= 3),
        hs AS (
          SELECT doc_id, inc,
            list_transform(w, s ->
              ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS h
          FROM sh),
        sig AS (
          SELECT doc_id, inc,
            list_transform(range(0, 64), i ->
              list_min(list_transform(h, x ->
                (pa[i+1] * x + pb[i+1]) % 2147483647))) AS sig
          FROM hs, perms),
        banded AS (
          SELECT doc_id, inc, b AS band,
            list_reduce(list_prepend(0::BIGINT, sig[b*4+1 : b*4+4]),
              (acc, v) -> (acc * 1000003 + v) % 2147483647) AS band_hash
          FROM sig, range(0, 16) t(b)),
        cand AS (
          SELECT DISTINCT l.doc_id AS doc_new, r.doc_id AS doc_idx
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.band_hash = r.band_hash
          WHERE l.inc AND NOT r.inc),
        verified AS (
          SELECT c.doc_new, c.doc_idx,
            cast(len(list_intersect(x.w, y.w)) as double) /
              cast(len(list_distinct(list_concat(x.w, y.w))) as double)
              AS jaccard
          FROM cand c
          JOIN sh x ON x.doc_id = c.doc_new
          JOIN sh y ON y.doc_id = c.doc_idx
          WHERE cast(len(list_intersect(x.w, y.w)) as double) /
                cast(len(list_distinct(list_concat(x.w, y.w))) as double)
                >= 0.4),
        m AS (
          SELECT doc_new, doc_idx, jaccard,
            row_number() OVER (PARTITION BY doc_new
              ORDER BY jaccard DESC, doc_idx) AS rn,
            cast(count(*) OVER (PARTITION BY doc_new) as bigint)
              AS n_matches
          FROM verified),
        inc0 AS (
          SELECT doc_id AS doc_new FROM documents
          WHERE source IN ('src16','src17','src18','src19'))
        SELECT i.doc_new,
          cast(coalesce(m.n_matches, 0) as bigint) AS n_matches,
          m.doc_idx AS best_idx, m.jaccard AS best_jaccard
        FROM inc0 i LEFT JOIN m ON m.doc_new = i.doc_new AND m.rn = 1
        ORDER BY i.doc_new"""

  /** Every embedding with its nearest codebook centroid:
    * `(vec_id, embedding, cent_id)`. The codebook is the deterministic
    * k-vector "training" set (vec_id < k, default 8) collected to a
    * LITERAL array, so assignment is a row-local argmax fold in one
    * projection: zero shuffle, zero row blowup. (The alternative —
    * crossJoin(broadcast) + row_number over Window.partitionBy(vec_id)
    * — shuffles the k×-inflated corpus by vec_id; at 100 TB that
    * exchange IS the job.)
    * Fold iterates cent_id ascending with strict `>`, so ties pick the
    * smallest cent_id — the same selection as a row_number over
    * (csim DESC, cent_id ASC), with bit-identical cosines. Shared by
    * s03 (IVF probe) and d10 (semantic near-dup clustering).
    * Literal codebooks stop scaling around k ≈ 100 (the plan carries
    * k·dim literals); past that use d12's shape — the codebook as a
    * one-row BROADCAST relation (data, not plan) with a two-level
    * coarse→fine argmax, O(√k) per row instead of O(k).
    */
  private def assignToCodebook(s: SparkSession, d: String,
      k: Int = 8): DataFrame = assignToCodebookOf(emb(s, d), k)

  /** Frame-agnostic form of the row-local literal-codebook cell
    * assignment (centroids = the first k vec_ids, s03's convention) —
    * s15's spec runs it on a clustered fixture frame.
    */
  private[graft] def assignToCodebookOf(base: DataFrame,
      k: Int): DataFrame = {
    val cents = base.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    val centArr = array(
      cents.select(col("cent_id"), col("ce")).collect()
        .map(r => (r.getLong(0), r.getSeq[Any](1)))
        .sortBy(_._1)
        .map { case (id, v) =>
          // lit() on the runtime element type: the codebook frame may
          // carry float (parquet) or double (derived) embeddings
          struct(lit(id).as("cent_id"),
            array(v.map(x => lit(x)).toIndexedSeq: _*).as("ce"))
        }.toIndexedSeq: _*)
    base.select(col("vec_id"), col("embedding"),
      aggregate(centArr,
        struct(lit(-2.0).as("sim"), lit(-1L).as("cent_id")),
        (acc, c) => {
          val sim = cosine(col("embedding"), c.getField("ce"))
          when(sim > acc.getField("sim"),
            struct(sim.as("sim"),
              c.getField("cent_id").as("cent_id")))
            .otherwise(acc)
        }).getField("cent_id").as("cent_id"))
  }

  /** NN-descent k-NN-graph stage report (s15; Dong, Moses & Li, WWW
    * 2011). Init = within-IVF-cell top-k UNION `nRand` deterministic
    * pseudo-random cross-corpus edges per node (h60-derived, DuckDB-
    * rederivable — random init is what lets descent ESCAPE the cell
    * blocking: a cell-local graph's neighbors-of-neighbors never leave
    * the cell). One descent round runs the paper's LOCAL JOIN — every
    * node introduces all pairs of its undirected B∪R pool
    * neighborhood — scores only cross-cell proposals not already paid
    * for, and re-selects top-k from everything scored. Output: one
    * row per stage with the pair-scoring bill and recall@k hits on the
    * first `nProbes` nodes vs exact ground truth (bounded scan).
    * Requires contiguous vec_ids 0..n-1 (the random-edge modulus); at
    * scale an id-assignment pass (zipWithIndex) provides this.
    */
  private[graft] def nnDescentReport(base: DataFrame, nCents: Int,
      nRand: Int = 3, k: Int = 5, nProbes: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.PortableHash.h60col
    // metadata-scale driver scalar (g01's iterative-action convention)
    val n = base.count()
    // cells sized to the corpus — ~64 vectors per cell, floored at
    // nCents — so blocking init stays LINEAR: with a FIXED cell count
    // the within-cell pair set grows as n²/k (measured: a 26× decade
    // on 10× vectors at k=8). ⌈n/64⌉ keeps per-cell pairs bounded;
    // beyond ~10^4 centroids the literal-codebook argmax would switch
    // to a broadcast join (s03's alternative posture).
    val kCells = math.max(nCents, ((n + 63) / 64).toInt)
    val asg = assignToCodebookOf(base, kCells).localCheckpoint()
    val ea = asg.select(col("cent_id"), col("vec_id").as("a"),
      col("embedding").as("va"))
    val eb = asg.select(col("cent_id"), col("vec_id").as("b"),
      col("embedding").as("vb"))
    val emb2 = asg.select(col("vec_id"), col("embedding"))
    def score(pairs: DataFrame): DataFrame = pairs
      .join(emb2.select(col("vec_id").as("a"),
        col("embedding").as("va")), Seq("a"))
      .join(emb2.select(col("vec_id").as("b"),
        col("embedding").as("vb")), Seq("b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .select(col("a"), col("b"), col("cos"))
    val cellPairs = ea.join(eb, Seq("cent_id"))
      .filter(col("a") =!= col("b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .select(col("a"), col("b"), col("cos"))
    val rndScored = score(
      asg.select(col("vec_id").as("a"))
        .select(col("a"), explode(sequence(lit(0), lit(nRand - 1)))
          .as("j"))
        .select(col("a"), pmod(col("a") + 1 +
          pmod(h60col(concat(lit("nn_init_"), col("a"), lit("_"),
            col("j"))), lit(n - 1)), lit(n)).as("b"))
        .filter(col("a") =!= col("b")).distinct())
      .localCheckpoint()
    val w = Window.partitionBy(col("a"))
      .orderBy(col("cos").desc, col("b"))
    def topK(scored: DataFrame): DataFrame = scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("a"), col("b"), col("cos"))
    // re-alias union inputs to mint fresh exprIds: both sides descend
    // from the same checkpointed asg, and Union's constraint rewrite
    // chokes on attribute ids shared across children
    def fresh(df: DataFrame): DataFrame = df.select(
      df.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
    val knn0 = topK(fresh(cellPairs).union(fresh(rndScored)))
      .localCheckpoint()
    // Dong et al.'s LOCAL JOIN: the candidate pool keeps the random
    // edges even though their cosine is poor (selecting top-k BEFORE
    // propagating kills exploration — measured 0 recall gain), and
    // every node m introduces all pairs of its UNDIRECTED pool
    // neighborhood (B ∪ R) to each other. Same-cell proposals are
    // already scored by init (cellpairs is exactly the same-cell pair
    // set), so only cross-cell proposals minus the random-scored
    // pairs pay for scoring.
    val pool = fresh(topK(cellPairs).select(col("a"), col("b")))
      .union(fresh(rndScored.select(col("a"), col("b")))).distinct()
      .localCheckpoint()
    val und = fresh(pool.select(col("a").as("m"), col("b").as("x")))
      .union(fresh(pool.select(col("b").as("m"), col("a").as("x"))))
      .distinct()
    val cells = asg.select(col("vec_id"), col("cent_id"))
    val proposals = und.select(col("m"), col("x").as("a"))
      .join(und.select(col("m").as("m2"), col("x").as("b")),
        col("m") === col("m2"))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"))
      .distinct()
      .join(cells.select(col("vec_id").as("a"),
        col("cent_id").as("ca")), Seq("a"))
      .join(cells.select(col("vec_id").as("b"),
        col("cent_id").as("cb")), Seq("b"))
      .filter(col("ca") =!= col("cb"))
      .select(col("a"), col("b"))
      .join(rndScored.select(col("a"), col("b")), Seq("a", "b"),
        "left_anti")
    val nonScored = score(proposals).localCheckpoint()
    val knn1 = topK(fresh(knn0).union(fresh(nonScored)))
    val probes = emb2.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("a"), col("embedding").as("va"))
    val exactK = emb2.select(col("vec_id").as("b"),
        col("embedding").as("vb"))
      .crossJoin(broadcast(probes))
      .filter(col("a") =!= col("b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("a"), col("b"))
    def stageRow(stage: String, knn: DataFrame, scoredA: DataFrame,
        scoredB: Option[DataFrame]): DataFrame = {
      val nSc = scoredB match {
        case Some(sb) => scoredA.agg(count(lit(1)).as("na")).crossJoin(
          sb.agg(count(lit(1)).as("nb")))
          .select((col("na") + col("nb")).as("n_scored"))
        case None => scoredA.agg(count(lit(1)).as("n_scored"))
      }
      nSc.crossJoin(
          knn.filter(col("a") < nProbes).join(exactK, Seq("a", "b"))
            .agg(count(lit(1)).as("hits5")))
        .select(lit(stage).as("stage"), col("n_scored"), col("hits5"))
    }
    stageRow("1_init", knn0, cellPairs, Some(rndScored))
      .unionByName(stageRow("2_descent", knn1, nonScored, None))
      .orderBy(col("stage"))
  }

  /** Fingerprint-sharing candidate pairs from exploded (doc_id, fp)
    * rows, WITHOUT a self-join: group the doc list per fingerprint,
    * prune hot fingerprints, and expand each surviving list's ordered
    * pairs row-locally. One shuffle on fp + one on the pair key; the
    * expensive fingerprint computation runs exactly once (a self-join
    * re-evaluates the input subtree per side once AQE broadcasts one of
    * them — non-identical exchanges don't reuse).
    *
    * A fingerprint shared by k documents yields k² candidate pairs, and
    * boilerplate (license headers, templates) makes hot fingerprints
    * common in real corpora — so fingerprints with document frequency
    * > `maxDf` are dropped (df-style pruning: a near-universal
    * fingerprint carries no near-dup signal anyway), which also bounds
    * the expansion blowup and the pair-skew a single hot key would
    * otherwise concentrate on one reducer.
    */
  def winnowCandidatePairs(exploded: DataFrame, minShared: Int = 8,
      maxDf: Int = 1000): DataFrame =
    exploded
      .groupBy(col("fp"))
      .agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")).between(2, maxDf))
      // ordered-pair expansion as two chained Generates + a filter —
      // all whole-stage codegen. (The nested transform/filter/struct
      // lambda tower produced the same df² rows but ran interpreted:
      // ~10 s of pure lambda-frame overhead at sf0.1; this form is
      // sub-second for the same output.)
      .select(explode(col("ds")).as("doc_a"), col("ds"))
      .select(col("doc_a"), explode(col("ds")).as("doc_b"))
      .filter(col("doc_b") > col("doc_a"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
      .orderBy(col("doc_a"), col("doc_b"))

  /** d08's inverted-index exact near-dup pipeline, factored for reuse
    * (d08 = these pairs ordered; d11 = these pairs joined with the x17
    * split): (doc_a, doc_b, jaccard) with jaccard ≥ 0.4 over the
    * df-pruned shingle universe.
    *
    * Shapes that matter at 100 TB (measured rationale in the scaladoc
    * of winnowCandidatePairs and the d08 query comment):
    * - FAST generate shape — explode of the shingle EXPRESSION over a
    *   once-aliased token array; exploding an aliased expensive array
    *   column re-evaluates the array per OUTPUT ELEMENT (~50× here,
    *   35 s vs 0.6 s at sf0.1).
    * - df-cap as a count over a window BY fp, not a groupBy+join-back:
    *   AQE broadcasts the small df side of that join, so the two posts
    *   subtrees get non-identical exchanges and the expensive shingle
    *   generate runs once per side. The window form gives BOTH
    *   downstream consumers (sizes, pair expansion) the same
    *   hash-partitioning-by-fp exchange over the same subtree, which
    *   ReuseExchange dedupes — the tokenize+shingle scan runs exactly
    *   once (verified in the final adaptive plan).
    * - jaccard from COUNTS alone: |A∩B| = shared-posting count,
    *   |A∪B| = |A'|+|B'|−|A∩B| — no shingle ARRAY ever rides a
    *   shuffle and there is no verify join carrying sets.
    */
  private def postingJaccardPairs(s: SparkSession, d: String): DataFrame =
    postingJaccardPairsFrom(docs(s, d)
      .select(col("doc_id"), words(col("text")).as("toks")))

  /** [[postingJaccardPairs]] over an arbitrary tokenized corpus slice
    * (`doc_id`, `toks`) — what lets p01 run the detector on a
    * PIPELINE STAGE's survivors instead of the raw table. The df≤50
    * cap is then a frequency semantic of the corpus being deduped,
    * which is the composition a real run wants.
    */
  private def postingJaccardPairsFrom(tokd: DataFrame): DataFrame = {
    val posts = tokd
      .select(col("doc_id"), explode(shingles3(col("toks"))).as("fp"))
    val okPosts = posts
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .filter(col("df") <= 50)
      .select(col("doc_id"), col("fp"))
    // |A'|: the doc's shingle count within the df-pruned universe
    val sizes = okPosts.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("sz"))
    val shared = winnowCandidatePairs(okPosts, minShared = 1, maxDf = 50)
    shared
      .join(sizes.select(col("doc_id").as("doc_a"),
        col("sz").as("sz_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"),
        col("sz").as("sz_b")), "doc_b")
      .withColumn("jaccard", col("shared_fps").cast("double") /
        (col("sz_a") + col("sz_b") - col("shared_fps")).cast("double"))
      .filter(col("jaccard") >= 0.4)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Global exclusive prefix offsets over a (doc_id, n) frame — the
    * TWO-LEVEL BLOCK PREFIX SUM that replaces an unpartitioned
    * `Window.orderBy(doc_id)` (a corpus-wide single task) for
    * stream-position arithmetic (x22 vocab growth, x23 sequence
    * packing). Within-block exclusive prefix via a window PARTITIONED
    * by `blk = doc_id div docsPerBlock` (parallel, bounded rows per
    * task); block totals get the global prefix in a second window over
    * ONE ROW PER BLOCK (N/docsPerBlock rows — the only SinglePartition
    * step, metadata-scale by construction); the two add up to the
    * global offset. The caller must pass a CHECKPOINTED metadata-scale
    * counts frame (two prefix consumers would otherwise re-derive it).
    * Returns (doc_id, off).
    */
  private def streamOffsets(counts0: DataFrame,
      docsPerBlock: Long = 512L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = counts0
      .withColumn("blk", expr(s"doc_id div $docsPerBlock"))
    val blkW = Window.orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val blkOffs = counts.groupBy(col("blk"))
      .agg(sum(col("n")).as("bn"))
      .withColumn("boff", coalesce(sum(col("bn")).over(blkW), lit(0L)))
      .select(col("blk"), col("boff"))
    val inW = Window.partitionBy(col("blk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .withColumn("inoff", coalesce(sum(col("n")).over(inW), lit(0L)))
      .join(broadcast(blkOffs), Seq("blk"))
      .select(col("doc_id"), (col("boff") + col("inoff")).as("off"))
  }

  /** One integer-exact Lloyd update of the per-subspace PQ codebooks:
    * s05's fixed-point k-means applied independently in each of the
    * nSub subDim-wide slices, in ONE distributed pass (not one job per
    * subspace — that would scan the embeddings nSub times). Rows
    * posexplode to (sub, slice); assignment is a row-local argmin
    * against the nSub×k LITERAL seed slices (zero shuffle, ties to the
    * smallest cid — the s05/s06 oracle convention); the update is one
    * (sub, cid, pos)-keyed aggregation whose collect is nSub·k·subDim
    * longs (codebook metadata, the PageRank-style per-round action).
    * Centroid means are `sum div count` — both engines truncate
    * integer division toward zero, so the trained cells are
    * bit-identical to the oracle's `//` re-derivation. Empty cells
    * keep their seed centroid.
    */
  private def trainPqCodebooks(base: DataFrame, nSub: Int, subDim: Int,
      seeds: Seq[(Long, Seq[Long])])
      : IndexedSeq[IndexedSeq[(Long, IndexedSeq[Long])]] = {
    val seedSlices = IndexedSeq.tabulate(nSub) { sub =>
      seeds.map { case (cid, v) =>
        (cid, IndexedSeq.tabulate(subDim)(j => v(sub * subDim + j)))
      }.toIndexedSeq
    }
    val centsBySub = array(seedSlices.map { subCents =>
      array(subCents.map { case (cid, cv) =>
        struct(lit(cid).as("cid"), array(cv.map(lit(_)): _*).as("cv"))
      }: _*)
    }: _*)
    val rows = base
      .select(col("qv"), explode(sequence(lit(0), lit(nSub - 1))).as("sub"))
      .select(col("sub"),
        slice(col("qv"), col("sub") * lit(subDim) + lit(1),
          lit(subDim)).as("sv"))
    val assigned = rows.select(col("sub"), col("sv"),
      aggregate(element_at(centsBySub, col("sub") + 1),
        struct(lit(Long.MaxValue).as("dist"), lit(-1L).as("cid")),
        (acc, c) => {
          val dist = aggregate(zip_with(col("sv"), c.getField("cv"),
            (a, b) => (a - b) * (a - b)), lit(0L), (s2, x) => s2 + x)
          when(dist < acc.getField("dist"),
            struct(dist.as("dist"), c.getField("cid").as("cid")))
            .otherwise(acc)
        }).getField("cid").as("cid"))
    val means = assigned
      .select(col("sub"), col("cid"),
        posexplode(col("sv")).as(Seq("pos", "v")))
      .groupBy(col("sub"), col("cid"), col("pos"))
      .agg(expr("sum(v) div count(1)").as("c"))
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1)), (r.getInt(2), r.getLong(3))))
      .groupBy(_._1)
      .map { case (key, rs) =>
        key -> rs.map(_._2).sortBy(_._1).map(_._2).toIndexedSeq
      }
    IndexedSeq.tabulate(nSub) { sub =>
      seedSlices(sub).map { case (cid, cv) =>
        cid -> means.getOrElse((sub, cid), cv)
      }
    }
  }

  /** PII pattern classes, deliberately restricted to syntax shared by
    * Java regex and RE2 (the oracle engine): character classes, bounded
    * repetition, `\b`/`\d` — no lookarounds, no backrefs. Redaction
    * applies them in THIS order (later patterns see earlier
    * replacements), so both engines transform identically.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b")

  /** `text` with every [[piiPatterns]] match replaced by its class tag
    * (`<email>`, …). Row-local codegen'd regexp_replace chain.
    */
  def redactPii(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (name, pat)) =>
      regexp_replace(acc, pat, s"<$name>")
    }

  /** Cosine similarity of two float-array columns, computed in double
    * over [[graft.functions.VectorDot]] (a fused codegen'd loop — no
    * UDF, no interpreted lambda frames).
    */
  def cosine(a: Column, b: Column): Column =
    // ONE fused codegen'd loop for all three accumulators — bit-
    // identical to dot(a,b)/sqrt(dot(a,a))/sqrt(dot(b,b)) (parity in
    // FunctionsSpec), but each array element is read once instead of
    // three times (and the broadcast query vector is no longer
    // re-walked twice per corpus row for its constant norm)
    graft.functions.VectorCosine.cosine(a, b)

  /** 64-permutation MinHash signature of a word array with the
    * portable arithmetic of [[graft.functions.PortableHash]]: for
    * permutation i, min over words of (A(i)·(h60(w) mod P)+B(i)) mod P.
    * This is the composable higher-order twin of the fast
    * ShingleMinHash expression (parity-tested in FunctionsSpec) and
    * the exact formula the DuckDB oracles re-derive.
    */
  def minhashSig(wordsCol: Column, k: Int = 64): Column = {
    import graft.functions.PortableHash.{P, h60col, permA, permB}
    val as = typedLit((0 until k).map(permA))
    val bs = typedLit((0 until k).map(permB))
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(wordsCol, w =>
        pmod(element_at(as, i + 1) * pmod(h60col(w), lit(P)) +
          element_at(bs, i + 1), lit(P)))))
  }

  /** Column-bits variants of shiftleft/shiftright (the Scala API only
    * accepts literal Int bit counts; the SQL functions accept columns).
    */
  private def shl(x: Column, bits: Column): Column =
    call_function("shiftleft", x, bits)
  private def shr(x: Column, bits: Column): Column =
    call_function("shiftright", x, bits)

  /** 60-bit SimHash of a word array: bit b is set iff the sum over
    * words of sign(bit b of h60(word)) is positive — the composable
    * twin of the fast SimHash60 expression and the DuckDB oracle
    * formula (60 portable bits; see SimHash60 docs for why not 64).
    */
  def simhash60(wordsCol: Column): Column =
    aggregate(
      sequence(lit(0), lit(59)),
      lit(0L),
      (acc, b) => {
        val bitSum = aggregate(wordsCol, lit(0),
          (s2, w) => s2 + when(shr(graft.functions.PortableHash.h60col(w), b)
            .bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
        acc.bitwiseOR(when(bitSum > 0, shl(lit(1L), b)).otherwise(0L))
      })

  /** Shared pipeline of d22/d23: per-doc rewritten corpus after cutting
    * every maximal span covered by a cross-doc 20-gram (Lee et al.'s
    * substring-level dedup, applied rather than just measured as d13
    * does). Returns one row per document with the normalized text `t`,
    * span/char accounting, and the rewritten text `ctext`.
    *
    * Interval merge without an interval self-join: covering intervals
    * all have length L and arrive sorted by start, so two intervals
    * overlap-or-abut iff their starts differ by <= L — the island
    * break is a lag-window flag, the island id a running sum, and the
    * merged span [min start, max start + L - 1] a per-island agg.
    * Kept segments are the complement: a lag window over spans yields
    * the segment BEFORE each span, plus one trailing segment per doc.
    * The rebuild concatenates doc-scale segment arrays row-locally —
    * per-doc state is bounded by document length, never corpus size.
    */
  private def spanCleanedDocs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = 20
    val norm = docs(s, d).select(col("doc_id"),
      regexp_replace(lower(col("text")), "\\s+", " ").as("t"))
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
    val spans = dup
      .withColumn("brk",
        when(prev.isNull || col("pos") - prev > L, 1).otherwise(0))
      .withColumn("isl", sum(col("brk")).over(wDoc))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (L - 1)).as("e"))
    val spanAgg = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("removed_chars"),
        max(col("e")).as("last_e"))
    val wS = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    // re-alias union inputs: both sides derive from the same lineage
    // and Union rejects shared exprIds across children
    val segBefore = spans
      .select(col("doc_id"),
        coalesce(lag(col("e"), 1).over(wS) + 1, lit(1L)).as("ks"),
        (col("s") - 1).as("ke"))
      .select(col("doc_id").as("doc_id"), col("ks").as("ks"),
        col("ke").as("ke"))
    val segTail = spanAgg.join(norm, "doc_id")
      .select(col("doc_id").as("doc_id"),
        (col("last_e") + 1).as("ks"),
        length(col("t")).cast("bigint").as("ke"))
    val cleanedDup = segBefore.unionByName(segTail)
      .filter(col("ke") >= col("ks"))
      .join(norm, "doc_id")
      .select(col("doc_id"), col("ks"),
        substring(col("t"), col("ks").cast("int"),
          (col("ke") - col("ks") + 1).cast("int")).as("seg"))
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("ks"), col("seg")))),
          x => x.getField("seg")), "").as("ct"))
    norm
      .join(spanAgg, Seq("doc_id"), "left")
      .join(cleanedDup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("t"),
        length(col("t")).cast("bigint").as("orig_len"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("removed_chars"), lit(0L)).as("removed_chars"),
        when(col("n_spans").isNull, col("t"))
          .otherwise(coalesce(col("ct"), lit(""))).as("ctext"))
      .withColumn("cleaned_len", length(col("ctext")).cast("bigint"))
  }

  /** DuckDB CTE chain re-deriving [[spanCleanedDocs]] ending in a
    * `percleaned` relation (doc_id, t, orig_len, n_spans,
    * removed_chars, ctext, cleaned_len) — shared by d22/d23 oracles.
    */
  private val spanCleanedSqlCtes: String = """WITH norm AS (
      SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS t
      FROM documents),
    posts AS (
      SELECT doc_id, i AS pos,
        ('0x' || substr(md5(substr(t, i, 20)), 1, 15))::BIGINT AS g
      FROM norm, LATERAL (SELECT unnest(range(1, length(t) - 20 + 2)) AS i) r
      WHERE length(t) >= 20),
    crossg AS (
      SELECT g FROM (SELECT DISTINCT doc_id, g FROM posts)
      GROUP BY g HAVING count(*) >= 2),
    dup AS (SELECT DISTINCT p.doc_id, p.pos
      FROM posts p JOIN crossg USING (g)),
    isl0 AS (
      SELECT doc_id, pos,
        CASE WHEN lag(pos) OVER w IS NULL
               OR pos - lag(pos) OVER w > 20 THEN 1 ELSE 0 END AS brk
      FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    isl1 AS (
      SELECT doc_id, pos,
        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
      FROM isl0),
    spans AS (
      SELECT doc_id, isl, min(pos) AS s, max(pos) + 19 AS e
      FROM isl1 GROUP BY doc_id, isl),
    spanagg AS (
      SELECT doc_id, cast(count(*) as bigint) AS n_spans,
        cast(sum(e - s + 1) as bigint) AS removed_chars,
        max(e) AS last_e
      FROM spans GROUP BY doc_id),
    seg AS (
      SELECT doc_id,
        coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS ks,
        s - 1 AS ke
      FROM spans
      UNION ALL
      SELECT sa.doc_id, sa.last_e + 1 AS ks, length(n.t) AS ke
      FROM spanagg sa JOIN norm n USING (doc_id)),
    cleanedagg AS (
      SELECT sg.doc_id,
        string_agg(substr(n.t, sg.ks::INT, (sg.ke - sg.ks + 1)::INT),
          '' ORDER BY sg.ks) AS ct
      FROM seg sg JOIN norm n USING (doc_id)
      WHERE sg.ke >= sg.ks
      GROUP BY sg.doc_id),
    percleaned AS (
      SELECT n.doc_id, n.t,
        cast(length(n.t) as bigint) AS orig_len,
        cast(coalesce(sa.n_spans, 0) as bigint) AS n_spans,
        cast(coalesce(sa.removed_chars, 0) as bigint) AS removed_chars,
        CASE WHEN sa.doc_id IS NULL THEN n.t
             ELSE coalesce(c.ct, '') END AS ctext,
        cast(length(CASE WHEN sa.doc_id IS NULL THEN n.t
             ELSE coalesce(c.ct, '') END) as bigint) AS cleaned_len
      FROM norm n
      LEFT JOIN spanagg sa USING (doc_id)
      LEFT JOIN cleanedagg c USING (doc_id))"""

  def queries: Seq[(String, Q)] = Seq(

    // ------------------------------------------------------------------
    // Text analysis: token counts + distinct words.
    // ------------------------------------------------------------------
    "x01_token_stats" -> Q(
      (s, d) =>
        docs(s, d).select(
          col("doc_id"),
          size(words(col("text"))).cast("bigint").as("n_tokens"),
          size(array_distinct(words(col("text")))).cast("bigint")
            .as("n_distinct"),
          length(col("text")).cast("bigint").as("n_chars_obs"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        cast(len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) as bigint) AS n_tokens,
        cast(len(list_distinct(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))) as bigint) AS n_distinct,
        cast(length(text) as bigint) AS n_chars_obs
        FROM documents
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Text analysis: quality scoring (length / punctuation / stopword
    // ratios — per-row double arithmetic, bit-reproducible).
    // ------------------------------------------------------------------
    "x02_quality_score" -> Q(
      (s, d) => {
        val w = words(col("text"))
        val nTok = size(w).cast("double")
        val nChars = length(col("text")).cast("double")
        val punct = (length(col("text")) -
          length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("double")
        val stops = size(filter(w, x =>
          x.isin("the", "a", "of", "and", "to", "in"))).cast("double")
        val avgWordLen =
          length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nTok
        docs(s, d).select(
          col("doc_id"),
          (punct / nChars).as("punct_ratio"),
          (stops / nTok).as("stopword_ratio"),
          avgWordLen.as("avg_word_len"),
          ((stops / nTok) * 0.4 +
            (lit(1.0) - punct / nChars) * 0.3 +
            when(avgWordLen >= 3 && avgWordLen <= 8, 0.3).otherwise(0.0))
            .as("quality"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
          SELECT doc_id, text,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents),
        m AS (
          SELECT doc_id,
            cast(len(w) as double) AS n_tok,
            cast(length(text) as double) AS n_chars,
            cast(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) as double) AS punct,
            cast(len(list_filter(w, x -> x IN ('the','a','of','and','to','in'))) as double) AS stops,
            cast(length(regexp_replace(text, '\s+', '', 'g')) as double) / cast(len(w) as double) AS awl
          FROM d)
        SELECT doc_id,
          punct / n_chars AS punct_ratio,
          stops / n_tok AS stopword_ratio,
          awl AS avg_word_len,
          (stops / n_tok) * 0.4 + (1.0 - punct / n_chars) * 0.3 +
                CASE WHEN awl >= 3 AND awl <= 8 THEN 0.3 ELSE 0.0 END AS quality
        FROM m
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Document fingerprint: md5 of case/whitespace-normalized text —
    // the canonical-form dedup key.
    // ------------------------------------------------------------------
    "x03_fingerprint" -> Q(
      (s, d) =>
        docs(s, d).select(
          col("doc_id"),
          md5(regexp_replace(lower(col("text")), "\\s+", " "))
            .as("fingerprint"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
        FROM documents
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Language ID: function-word + charset heuristic, expressed with
    // built-in expressions (no typed Dataset.map — the scan stays in
    // the codegen path with no serde boundary; LangIdSpec asserts
    // parity with the Scala scorer). DuckDB re-derives the same
    // heuristic independently, so this is hash-verified.
    // ------------------------------------------------------------------
    "x04_lang_id" -> Q(
      (s, d) =>
        docs(s, d).select(col("doc_id"), col("text"), col("lang"))
          .withColumn("toks", graft.text.LangId.tokens(col("text")))
          .select(col("doc_id"),
            graft.text.LangId.detectFromTokens(col("text"), col("toks"))
              .as("lang_pred"),
            col("lang").as("lang_label"))
          .orderBy(col("doc_id")),
      Some("""WITH d AS (
          SELECT doc_id, text, lang,
            list_filter(string_split_regex(lower(text), '\s+'),
              t -> t <> '') AS toks
          FROM documents),
        m AS (
          SELECT doc_id, lang,
            cast(length(regexp_replace(text, '\s+', '', 'g')) as double) AS total,
            cast(len(regexp_extract_all(text, '[\x{3400}-\x{4dbf}\x{4e00}-\x{9fff}]')) as double) AS cjk,
            len(list_filter(toks, t -> t IN ('the','and','of','to','in','is','that','it','for','was','with','on','as','are','this'))) AS s_en,
            len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','mit','auf','sich','den','von','für','im','zu'))) AS s_de,
            len(list_filter(toks, t -> t IN ('le','la','les','de','et','est','un','une','dans','que','pour','pas','des','du','avec'))) AS s_fr,
            len(list_filter(toks, t -> t IN ('el','la','los','las','de','que','es','en','un','una','por','con','para','no','se'))) AS s_es
          FROM d)
        SELECT doc_id,
          CASE WHEN total > 0 AND cjk / total > 0.3 THEN 'zh'
               WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und'
               WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
               WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
               WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
               ELSE 'es' END AS lang_pred,
          lang AS lang_label
        FROM m
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // BPE-ish subword token counting: the GPT-2 pretokenizer regex
    // (contractions | letter-runs | digit-runs | punctuation-runs),
    // counted with regexp_extract_all — the standard cheap token-count
    // estimator for training-data budgeting.
    // ------------------------------------------------------------------
    "x06_bpe_tokens" -> Q(
      (s, d) =>
        docs(s, d).select(
          col("doc_id"),
          size(regexp_extract_all(col("text"),
            lit("'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"), lit(0)))
            .cast("bigint").as("n_bpe_tokens"),
          size(words(col("text"))).cast("bigint").as("n_ws_tokens"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        cast(len(regexp_extract_all(text,
          '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+')) as bigint)
          AS n_bpe_tokens,
        cast(len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) as bigint) AS n_ws_tokens
        FROM documents
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Winnowing fingerprints: substring-level near-dup keys (k=8-char
    // grams, w=16 windows; FunctionsSpec asserts the guarantee: shared
    // ≥(w+k-1)-char substrings ⇒ shared fingerprints). The scale path
    // explodes fingerprints and equi-joins — candidates without any
    // all-pairs comparison. Hash-verified: gram hashes are portable
    // h60(md5), so the oracle recomputes the full winnow + posting-list
    // pipeline from the raw text.
    // ------------------------------------------------------------------
    "x07_winnow_fingerprints" -> Q(
      (s, d) => {
        // FAST generate shape (see d08): the winnow expression feeds
        // explode directly instead of through an aliased array column
        val exploded = docs(s, d).select(col("doc_id"),
          explode(graft.functions.Winnow.winnowFingerprint(
            regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))
        winnowCandidatePairs(exploded)
      },
      Some("""WITH norm AS (
          SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS t
          FROM documents),
        grams AS (
          SELECT doc_id,
            list_transform(range(1, length(t) - 8 + 2), i ->
              ('0x' || substr(md5(substr(t, i, 8)), 1, 15))::BIGINT) AS h
          FROM norm WHERE length(t) >= 8),
        fpl AS (
          SELECT doc_id,
            CASE WHEN len(h) <= 16 THEN [list_min(h)]
                 ELSE list_distinct(list_transform(range(1, len(h) - 16 + 2),
                   j -> list_min(h[j : j + 15]))) END AS fps
          FROM grams),
        posts AS (SELECT doc_id, unnest(fps) AS fp FROM fpl),
        ok_fp AS (
          SELECT fp FROM posts GROUP BY fp
          HAVING count(*) BETWEEN 2 AND 1000),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM posts a
          JOIN ok_fp f ON a.fp = f.fp
          JOIN posts b ON b.fp = a.fp AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, cast(count(*) as bigint) AS shared_fps
        FROM pairs GROUP BY doc_a, doc_b
        HAVING count(*) >= 8
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // Per-doc duplicated-span coverage — the "deduplicate SUBSTRINGS,
    // not documents" signal (Lee et al., "Deduplicating Training Data
    // Makes Language Models Better"): what fraction of a document's
    // character positions sit inside a 20-gram that also occurs in
    // ANOTHER document. x07 finds the near-dup pairs; this is the
    // per-document coverage number a curation run thresholds on (or
    // uses to strip the duplicated spans). Cross-doc-ness is
    // df ≥ 2 over DISTINCT documents, so within-doc repetition (x18's
    // signal) does not count. Shapes: one gram-keyed shuffle for df
    // (the per-(doc, gram) pre-dedup spreads hot template grams across
    // their docs' partitions first), then gdf as a COUNT OVER A WINDOW
    // BY g — not a groupBy+join-back, whose two consumers of the
    // tokenize+pre-agg subtree got non-identical exchanges and ran the
    // expensive gram scan twice (the d08 lesson, re-flagged by the r6
    // plan audit); the window form makes the plan LINEAR, so the scan
    // runs once by construction. One per-doc agg closes it — the
    // d08/x13 posting-index family at character level.
    // ------------------------------------------------------------------
    "d13_dup_span_fraction" -> Q(
      (s, d) => {
        val L = 20
        // gram-hash array fed straight to explode over the once-aliased
        // normalized text (the d08/x13 fast generate shape); GramHashes
        // is the tight-loop Catalyst expression — the composable
        // transform+h60col tower pays an interpreted lambda frame and
        // an md5→hex→conv parse per gram (bit-parity in FunctionsSpec)
        val grams = graft.functions.Winnow.gramHashes(col("t"), L)
        val posts = docs(s, d)
          .select(col("doc_id"),
            regexp_replace(lower(col("text")), "\\s+", " ").as("t"))
          .select(col("doc_id"), explode(grams).as("g"))
        val perDocGram = posts.groupBy(col("doc_id"), col("g"))
          .agg(count(lit(1)).as("n"))
        perDocGram
          .withColumn("gdf", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
          .groupBy(col("doc_id"))
          .agg(sum(col("n")).as("n_grams"),
            sum(when(col("gdf") >= 2, col("n"))
              .otherwise(lit(0L))).as("n_shared"))
          .withColumn("dup_frac", col("n_shared").cast("double") /
            col("n_grams").cast("double"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH norm AS (
          SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS t
          FROM documents),
        posts AS (
          SELECT doc_id,
            unnest(list_transform(range(1, length(t) - 20 + 2), i ->
              ('0x' || substr(md5(substr(t, i, 20)), 1, 15))::BIGINT))
              AS g
          FROM norm WHERE length(t) >= 20),
        pdg AS (
          SELECT doc_id, g, cast(count(*) as bigint) AS n
          FROM posts GROUP BY doc_id, g),
        df AS (
          SELECT g, cast(count(*) as bigint) AS gdf
          FROM pdg GROUP BY g)
        SELECT p.doc_id,
          cast(sum(p.n) as bigint) AS n_grams,
          cast(sum(CASE WHEN d.gdf >= 2 THEN p.n ELSE 0 END) as bigint)
            AS n_shared,
          cast(sum(CASE WHEN d.gdf >= 2 THEN p.n ELSE 0 END) as double) /
            cast(sum(p.n) as double) AS dup_frac
        FROM pdg p JOIN df d USING (g)
        GROUP BY p.doc_id
        ORDER BY p.doc_id"""),
      bench = true),

    // ------------------------------------------------------------------
    // Exact dedup: group by normalized-content fingerprint, keep the
    // lowest doc_id as representative (hash-groupBy; one shuffle on the
    // fingerprint — the 100 TB-safe exact-dedup shape).
    // ------------------------------------------------------------------
    "d01_exact_dedup" -> Q(
      (s, d) =>
        docs(s, d)
          .select(col("doc_id"),
            md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
          .groupBy(col("fp"))
          .agg(min(col("doc_id")).as("rep_doc_id"),
            count(lit(1)).as("n_copies"))
          .orderBy(col("fp")),
      Some("""SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
        min(doc_id) AS rep_doc_id, count(*) AS n_copies
        FROM documents
        GROUP BY 1
        ORDER BY fp""")),

    // ------------------------------------------------------------------
    // N-gram (word-set) Jaccard near-dup pairs, exact all-pairs variant
    // for oracle verification (the corpus is bounded; the scale path is
    // d03's MinHash+LSH banding).
    // ------------------------------------------------------------------
    "d02_jaccard_pairs" -> Q(
      (s, d) => {
        // exact all-pairs is the ORACLE variant: bounded to a fixed doc
        // window so its O(n^2) cost stays constant at any sf (identical
        // results at sf<=0.01 where all doc_ids < 1000); d03's LSH is
        // the full-corpus scale path
        val base = docShingles(s, d).filter(col("doc_id") < 1000)
        val a = base.select(col("doc_id").as("doc_a"), col("w").as("wa"))
        val b = base.select(col("doc_id").as("doc_b"), col("w").as("wb"))
        a.join(b, col("doc_a") < col("doc_b"))
          .withColumn("jaccard",
            size(array_intersect(col("wa"), col("wb"))).cast("double") /
              size(array_union(col("wa"), col("wb"))).cast("double"))
          .filter(col("jaccard") >= 0.4)
          .select(col("doc_a"), col("doc_b"), col("jaccard"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH t0 AS (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents WHERE doc_id < 1000),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS w
          FROM t0)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          cast(len(list_intersect(a.w, b.w)) as double) /
                cast(len(list_distinct(list_concat(a.w, b.w))) as double) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE cast(len(list_intersect(a.w, b.w)) as double) /
              cast(len(list_distinct(list_concat(a.w, b.w))) as double) >= 0.4
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // Dup CLUSTERS from dup pairs: connected components over the d02
    // near-dup graph via iterative min-label propagation (the step that
    // turns pairwise candidates into "keep one per cluster" dedup).
    // DuckDB re-derives components independently with a recursive
    // transitive-closure CTE — tractable on the bounded oracle window,
    // while the Spark loop is the shape that scales.
    // ------------------------------------------------------------------
    "d07_dup_clusters" -> Q(
      (s, d) => {
        val base = docShingles(s, d).filter(col("doc_id") < 1000)
        val a = base.select(col("doc_id").as("doc_a"), col("w").as("wa"))
        val b = base.select(col("doc_id").as("doc_b"), col("w").as("wb"))
        val pairs = a.join(b, col("doc_a") < col("doc_b"))
          .withColumn("jaccard",
            size(array_intersect(col("wa"), col("wb"))).cast("double") /
              size(array_union(col("wa"), col("wb"))).cast("double"))
          .filter(col("jaccard") >= 0.4)
          .select(col("doc_a"), col("doc_b"))
        graft.operators.ConnectedComponents.components(pairs)
          .select(col("id").as("doc_id"), col("cluster"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE t0 AS (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents WHERE doc_id < 1000),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS w
          FROM t0),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE cast(len(list_intersect(a.w, b.w)) as double) /
                cast(len(list_distinct(list_concat(a.w, b.w))) as double) >= 0.4),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
        SELECT src AS doc_id, least(src, min(dst)) AS cluster
        FROM reach GROUP BY src
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // MinHash + LSH banded near-dup: 64-perm signatures, 16 bands × 4
    // rows, band-bucket join produces candidates, exact Jaccard
    // verifies. This is the linear-shuffle scale path (no all-pairs).
    // Hash-verified: signatures/bands use PortableHash's mod-p
    // arithmetic, which the DuckDB oracle re-derives from scratch.
    // ------------------------------------------------------------------
    "d03_minhash_lsh" -> Q(
      (s, d) => {
        val bands = 16
        val rowsPerBand = 4
        val base = docShingles(s, d)
        // banded rows carry ONLY (band, band_hash, doc_id): the shingle
        // arrays must not ride through the band shuffle, and candidate
        // dedup happens on bare (doc_a, doc_b) id pairs — array-typed
        // shuffle keys were a 20× slowdown here.
        // custom Catalyst expression: one-pass shingle+signature loop,
        // bit-identical to minhashSig(shingles) but ~50× faster (nested
        // higher-order lambdas don't codegen; see ShingleMinHash docs).
        // It consumes raw tokens, so band hashing reads docs directly.
        // docs with <3 words have an EMPTY shingle set → all-identical
        // signatures → they collide with each other in every band (n²
        // candidate pairs) yet their Jaccard is 0/0 = NaN and never
        // passes the threshold. Prune them before banding: semantics
        // identical, and the degenerate-key blowup disappears at scale.
        val banded = docs(s, d)
          .select(col("doc_id"), words(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
          .withColumn("sig",
            graft.functions.ShingleMinHash.shingleMinhash(col("toks")))
          .select(col("doc_id"),
            // band hash = mod-p polynomial fold of the band's 4 sig
            // values (acc*FoldBase+v mod P, acc0=0) — portable to the
            // oracle; a band collision only creates a false candidate
            // that the exact-Jaccard verification below discards.
            posexplode(transform(sequence(lit(0), lit(bands - 1)), bi =>
              aggregate(
                slice(col("sig"), bi * rowsPerBand + 1, lit(rowsPerBand)),
                lit(0L),
                (acc, v) => pmod(
                  acc * graft.functions.PortableHash.FoldBase + v,
                  lit(graft.functions.PortableHash.P))))))
          .select(col("doc_id"), col("pos").as("band"),
            col("col").as("band_hash"))
        // candidate pairs: banded self-join on (band, band_hash). Both
        // join inputs are the same canonical subplan shuffled on the
        // same keys, so ReuseExchange materializes the scan+minhash
        // once (verified in the formatted plan). A groupBy+collect_list
        // pair-expansion variant was tried and is ~1.7× slower — the
        // nested pair-enumeration lambda doesn't codegen.
        val cand = banded.as("l")
          .join(banded.as("r"), Seq("band", "band_hash"))
          .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
          .filter(col("doc_a") < col("doc_b"))
          .distinct()
        // verification: join the candidate pairs straight back to the
        // shingle table on each side. (An earlier semi-join "prune"
        // computed candDocs = union of two selects of cand, which made
        // Catalyst evaluate the whole scan+minhash+join subtree three
        // times — the prune cost more than the shingling it saved. The
        // small candidate side broadcasts, so no shingle arrays ride a
        // shuffle.)
        cand
          .join(base.select(col("doc_id").as("doc_a"),
            col("w").as("wa")), Seq("doc_a"))
          .join(base.select(col("doc_id").as("doc_b"),
            col("w").as("wb")), Seq("doc_b"))
          .withColumn("jaccard",
            size(array_intersect(col("wa"), col("wb"))).cast("double") /
              size(array_union(col("wa"), col("wb"))).cast("double"))
          .filter(col("jaccard") >= 0.4)
          .select(col("doc_a"), col("doc_b"), col("jaccard"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH perms AS (
          SELECT
            list_transform(range(0, 64), i ->
              ('0x' || substr(md5('perm_a_' || i), 1, 15))::BIGINT % 2147483646 + 1) AS pa,
            list_transform(range(0, 64), i ->
              ('0x' || substr(md5('perm_b_' || i), 1, 15))::BIGINT % 2147483647) AS pb),
        t0 AS (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS w
          FROM t0 WHERE len(w) >= 3),
        hs AS (
          SELECT doc_id,
            list_transform(w, s ->
              ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS h
          FROM sh),
        sig AS (
          SELECT doc_id,
            list_transform(range(0, 64), i ->
              list_min(list_transform(h, x ->
                (pa[i+1] * x + pb[i+1]) % 2147483647))) AS sig
          FROM hs, perms),
        banded AS (
          SELECT doc_id, b AS band,
            list_reduce(list_prepend(0::BIGINT, sig[b*4+1 : b*4+4]),
              (acc, v) -> (acc * 1000003 + v) % 2147483647) AS band_hash
          FROM sig, range(0, 16) t(b)),
        cand AS (
          SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.band_hash = r.band_hash
              AND l.doc_id < r.doc_id)
        SELECT c.doc_a, c.doc_b,
          cast(len(list_intersect(x.w, y.w)) as double) /
            cast(len(list_distinct(list_concat(x.w, y.w))) as double)
            AS jaccard
        FROM cand c
        JOIN sh x ON x.doc_id = c.doc_a
        JOIN sh y ON y.doc_id = c.doc_b
        WHERE cast(len(list_intersect(x.w, y.w)) as double) /
              cast(len(list_distinct(list_concat(x.w, y.w))) as double)
              >= 0.4
        ORDER BY doc_a, doc_b"""),
      bench = true),

    // ------------------------------------------------------------------
    // SimHash near-dup: 60-bit signatures, candidates via 4×15-bit
    // band equality (a doc pair within Hamming distance 3 shares at
    // least one exact 15-bit quarter — pigeonhole over 4 bands),
    // verified by bit_count(xor). Hash-verified: the signature is
    // portable h60 bit arithmetic the oracle re-derives.
    // ------------------------------------------------------------------
    "d04_simhash" -> Q(
      (s, d) => {
        val base = docs(s, d)
          .select(col("doc_id"),
            graft.functions.SimHash60.simhash60(words(col("text"))).as("sh"))
        val banded = base.select(col("doc_id"), col("sh"),
          posexplode(transform(sequence(lit(0), lit(3)), q =>
            shr(col("sh"), q * 15).bitwiseAND(lit(0x7FFFL)))))
          .withColumnRenamed("pos", "quarter")
          .withColumnRenamed("col", "qhash")
        val l = banded.select(col("quarter"), col("qhash"),
          col("doc_id").as("doc_a"), col("sh").as("sha"))
        val r = banded.select(col("quarter"), col("qhash"),
          col("doc_id").as("doc_b"), col("sh").as("shb"))
        l.join(r, Seq("quarter", "qhash"))
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            bit_count(col("sha").bitwiseXOR(col("shb"))).as("hamming"))
          .distinct()
          .filter(col("hamming") <= 3)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH t0 AS (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents),
        hs AS (
          SELECT doc_id,
            list_transform(w, x ->
              ('0x' || substr(md5(x), 1, 15))::BIGINT) AS h
          FROM t0),
        sig AS (
          SELECT doc_id,
            cast(list_sum(list_transform(range(0, 60), b ->
              CASE WHEN cast(list_sum(list_transform(h, v ->
                  CASE WHEN (v >> b) & 1 = 1 THEN 1 ELSE -1 END)) as bigint) > 0
                THEN 1::BIGINT << b ELSE 0::BIGINT END)) as bigint) AS sh
          FROM hs),
        banded AS (
          SELECT doc_id, sh, q AS quarter,
            (sh >> cast(q*15 as int)) & 32767 AS qhash
          FROM sig, range(0, 4) t(q)),
        pairs AS (
          SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
            cast(bit_count(xor(l.sh, r.sh)) as int) AS hamming
          FROM banded l JOIN banded r
            ON l.quarter = r.quarter AND l.qhash = r.qhash
              AND l.doc_id < r.doc_id)
        SELECT doc_a, doc_b, hamming
        FROM pairs
        WHERE hamming <= 3
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // Embedding cosine near-dup pairs (exact; double-precision dot).
    // ------------------------------------------------------------------
    "d05_embedding_neardup" -> Q(
      (s, d) => {
        // bounded exact variant (oracle); the scale path is LSH/IVF
        // bucketing as in s02
        val base = emb(s, d).filter(col("vec_id") < 1000)
        val a = base.select(col("vec_id").as("vec_a"),
          col("embedding").as("ea"))
        val b = base.select(col("vec_id").as("vec_b"),
          col("embedding").as("eb"))
        a.join(b, col("vec_a") < col("vec_b"))
          .withColumn("cos", cosine(col("ea"), col("eb")))
          .filter(col("cos") >= 0.4)
          .select(col("vec_a"), col("vec_b"), col("cos"))
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> cast(x as double)) AS v FROM embeddings WHERE vec_id < 1000),
        n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          list_dot_product(a.v, b.v) / a.nrm / b.nrm AS cos
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) / a.nrm / b.nrm >= 0.4
        ORDER BY vec_a, vec_b""")),

    // ------------------------------------------------------------------
    // Brute-force cosine top-k: 10 nearest neighbors of vec_id 0.
    // ------------------------------------------------------------------
    "s01_cosine_topk" -> Q(
      (s, d) => {
        val base = emb(s, d)
        val query = base.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        base.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(query))
          .withColumn("cos", cosine(col("embedding"), col("qe")))
          .select(col("vec_id"), col("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> cast(x as double)) AS v FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        q AS (SELECT v AS qv, nrm AS qnrm FROM n WHERE vec_id = 0)
        SELECT n.vec_id,
          list_dot_product(n.v, q.qv) / n.nrm / q.qnrm AS cos
        FROM n, q
        WHERE n.vec_id <> 0
        ORDER BY list_dot_product(n.v, q.qv) / n.nrm / q.qnrm DESC, n.vec_id
        LIMIT 10"""),
      bench = true),

    // ------------------------------------------------------------------
    // LSH-bucketed ANN (the 100 TB scale path): 6 deterministic random
    // hyperplanes → 64-bucket partitioning; search the query's bucket
    // only. Hyperplane component (p,i) = (h60("p_i") mod 1000)/500 - 1
    // — the portable PortableHash formula, materialized driver-side as
    // a literal matrix (the dimension comes from one metadata-scale
    // head(); the matrix is data-independent, so this costs one row).
    // Hash-verified: the oracle re-derives the same planes with md5()
    // and replays bucketing + cosine top-k from scratch.
    // ------------------------------------------------------------------
    "s02_ann_lsh" -> Q(
      (s, d) => {
        val planes = 6
        val dim = emb(s, d).select(size(col("embedding"))).head.getInt(0)
        val mat: Seq[Seq[Double]] = (0 until planes).map(p =>
          (0 until dim).map(i =>
            (graft.functions.PortableHash.h60(s"${p}_${i}") % 1000L)
              .toDouble / 500.0 - 1.0))
        val matC = typedLit(mat)
        def bucket(v: Column): Column =
          aggregate(sequence(lit(0), lit(planes - 1)), lit(0L), (acc, p) => {
            val proj = graft.functions.VectorDot.dot(v,
              element_at(matC, p + 1))
            acc.bitwiseOR(when(proj > 0, shl(lit(1L), p)).otherwise(0L))
          })
        val base = emb(s, d).withColumn("bkt", bucket(col("embedding")))
        val query = base.filter(col("vec_id") === 0)
          .select(col("bkt").as("qbkt"), col("embedding").as("qe"))
        base.join(broadcast(query), col("bkt") === col("qbkt"))
          .filter(col("vec_id") =!= 0)
          .withColumn("cos", cosine(col("embedding"), col("qe")))
          .select(col("vec_id"), col("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
      },
      Some("""WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> cast(x as double)) AS v
          FROM embeddings),
        dim AS (SELECT max(len(v)) AS d FROM e),
        planes AS (
          SELECT p, list_transform(range(0, d), i ->
            cast(('0x' || substr(md5(p || '_' || i), 1, 15))::BIGINT % 1000
              as double) / 500.0 - 1.0) AS pv
          FROM range(0, 6) t(p), dim),
        pl AS (SELECT list(pv ORDER BY p) AS pvs FROM planes),
        b AS (
          SELECT vec_id, v,
            cast(list_sum(list_transform(range(0, 6), p ->
              CASE WHEN list_dot_product(v, pvs[p+1]) > 0
                THEN (1::BIGINT << p) ELSE 0::BIGINT END)) as bigint) AS bkt
          FROM e, pl),
        n AS (
          SELECT vec_id, v, bkt,
            sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM b),
        q AS (SELECT bkt AS qbkt, v AS qv, nrm AS qnrm FROM n WHERE vec_id = 0)
        SELECT n.vec_id,
          list_dot_product(n.v, q.qv) / n.nrm / q.qnrm AS cos
        FROM n, q
        WHERE n.bkt = q.qbkt AND n.vec_id <> 0
        ORDER BY list_dot_product(n.v, q.qv) / n.nrm / q.qnrm DESC, n.vec_id
        LIMIT 10""")),

    // ------------------------------------------------------------------
    // Grouped text rollup: per (lang, source) corpus stats — the
    // "dataset card" aggregation.
    // ------------------------------------------------------------------
    "x05_corpus_stats" -> Q(
      (s, d) =>
        docs(s, d)
          .select(col("lang"), col("source"), col("n_chars"),
            size(words(col("text"))).cast("bigint").as("n_tokens"))
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            sum(col("n_tokens")).as("total_tokens"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .orderBy(col("lang"), col("source")),
      Some("""SELECT lang, source, count(*) AS n_docs,
        cast(sum(n_chars) as bigint) AS total_chars,
        cast(sum(len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))) as bigint) AS total_tokens,
        min(n_chars) AS min_chars, max(n_chars) AS max_chars
        FROM documents
        GROUP BY lang, source
        ORDER BY lang, source""")),

    // ------------------------------------------------------------------
    // Filter-yield report: x02's quality signals composed into keep/drop
    // decisions, rolled up per (lang, source) — the dataset-curation
    // step a training pipeline runs before tokenization, with the yield
    // numbers a data card publishes. Map-only signals + one small-key
    // aggregation; scales linearly.
    // ------------------------------------------------------------------
    "x09_filter_yield" -> Q(
      (s, d) => {
        val w = words(col("text"))
        val nTok = size(w).cast("double")
        val punct = (length(col("text")) -
          length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("double")
        val punctRatio = punct / length(col("text")).cast("double")
        val keep = nTok >= 5 && nTok <= 5000 && punctRatio < lit(0.1)
        docs(s, d)
          .withColumn("keep", keep)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            expr("cast(count_if(keep) as bigint)").as("n_kept"),
            (expr("cast(count_if(keep) as bigint)").cast("double") /
              count(lit(1)).cast("double")).as("yield_rate"))
          .orderBy(col("lang"), col("source"))
      },
      Some("""WITH m AS (
          SELECT lang, source,
            cast(len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) as double) AS n_tok,
            cast(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) as double)
              / cast(length(text) as double) AS punct_ratio
          FROM documents),
        k AS (
          SELECT lang, source,
            n_tok >= 5 AND n_tok <= 5000 AND punct_ratio < 0.1 AS keep
          FROM m)
        SELECT lang, source, count(*) AS n_docs,
          cast(count_if(keep) as bigint) AS n_kept,
          cast(cast(count_if(keep) as bigint) as double)
            / cast(count(*) as double) AS yield_rate
        FROM k GROUP BY lang, source
        ORDER BY lang, source""")),

    // ------------------------------------------------------------------
    // Gopher-style repetition/symbol quality signals: mean word length,
    // symbol-to-token ratio, numeric-token fraction, and the fraction of
    // 2-grams occupied by the single most frequent 2-gram (the
    // repetition filter that catches keyword-stuffed / boilerplate-
    // looping docs). All row-local HOFs over an aliased token array —
    // the per-row cost is bounded by document length, so the filter is
    // scan-shaped at any corpus size.
    // ------------------------------------------------------------------
    "x10_gopher_quality" -> Q(
      (s, d) => {
        val base = docs(s, d)
          .select(col("doc_id"), col("text"), words(col("text")).as("toks"))
          .select(col("doc_id"), col("text"), col("toks"),
            when(size(col("toks")) >= 2,
              transform(sequence(lit(1), size(col("toks")) - 1), i =>
                concat_ws(" ", element_at(col("toks"), i),
                  element_at(col("toks"), i + 1))))
              .otherwise(array().cast("array<string>")).as("g2"))
        val nTok = size(col("toks")).cast("double")
        val top2 = when(size(col("g2")) > 0,
          array_max(transform(col("g2"), g =>
            size(filter(col("g2"), x => x === g)))).cast("double") /
            size(col("g2")).cast("double"))
          .otherwise(lit(0.0))
        val mwl = length(regexp_replace(col("text"), "\\s+", ""))
          .cast("double") / nTok
        val sym = size(regexp_extract_all(col("text"),
          lit("#|\\.\\.\\."), lit(0))).cast("double") / nTok
        val num = size(filter(col("toks"),
          t => t.rlike("^[0-9]+$"))).cast("double") / nTok
        base.select(col("doc_id"),
            mwl.as("mean_word_len"), sym.as("symbol_ratio"),
            num.as("numeric_frac"), top2.as("top_bigram_frac"))
          .withColumn("keep",
            col("mean_word_len").between(3.0, 10.0) &&
              col("symbol_ratio") < 0.1 &&
              col("numeric_frac") < 0.3 &&
              col("top_bigram_frac") < 0.2)
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
          SELECT doc_id, text,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks
          FROM documents),
        g AS (
          SELECT doc_id, text, toks,
            list_transform(range(1, len(toks)), i ->
              toks[i] || ' ' || toks[i+1]) AS g2
          FROM t),
        m AS (
          SELECT doc_id,
            cast(length(regexp_replace(text, '\s+', '', 'g')) as double)
              / cast(len(toks) as double) AS mean_word_len,
            cast(len(regexp_extract_all(text, '#|\.\.\.')) as double)
              / cast(len(toks) as double) AS symbol_ratio,
            cast(len(list_filter(toks, x -> regexp_matches(x, '^[0-9]+$'))) as double)
              / cast(len(toks) as double) AS numeric_frac,
            CASE WHEN len(g2) > 0 THEN
              cast(list_max(list_transform(g2, y ->
                len(list_filter(g2, x -> x = y)))) as double)
                / cast(len(g2) as double)
            ELSE 0.0 END AS top_bigram_frac
          FROM g)
        SELECT doc_id, mean_word_len, symbol_ratio, numeric_frac,
          top_bigram_frac,
          mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND symbol_ratio < 0.1 AND numeric_frac < 0.3
            AND top_bigram_frac < 0.2 AS keep
        FROM m
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Quality-filter ABLATION — before tuning a filter stack, measure
    // what each rule actually does: per rule, how many documents fail
    // it at all, and how many fail ONLY it (the documents that rule
    // alone removes — drop the rule and exactly these come back). A
    // rule with n_fail high but n_unique_fail ≈ 0 is redundant with
    // the rest of the stack; a rule carrying most of its failures
    // uniquely is the one whose threshold deserves scrutiny (here the
    // deliberately-aggressive type-token-ratio rule rejects ~2/3 of
    // the corpus almost entirely on its own — exactly the pathology
    // this readout exists to surface BEFORE a 100 TB run pays for
    // it; x10's production thresholds are all-pass on this corpus,
    // which would make the report vacuous). ONE corpus pass computes
    // the four fail bits; the 4-row report is a single aggregate
    // unpivoted with stack() — no per-rule rescans (the 40-rule
    // version is still one scan, m10's discipline).
    // ------------------------------------------------------------------
    "x33_filter_ablation" -> Q(
      (s, d) => {
        val base = docs(s, d)
          .select(col("doc_id"), col("text"), words(col("text")).as("toks"))
          .select(col("doc_id"), col("text"), col("toks"),
            when(size(col("toks")) >= 2,
              transform(sequence(lit(1), size(col("toks")) - 1), i =>
                concat_ws(" ", element_at(col("toks"), i),
                  element_at(col("toks"), i + 1))))
              .otherwise(array().cast("array<string>")).as("g2"))
        val nTok = size(col("toks")).cast("double")
        val top2 = when(size(col("g2")) > 0,
          array_max(transform(col("g2"), g =>
            size(filter(col("g2"), x => x === g)))).cast("double") /
            size(col("g2")).cast("double"))
          .otherwise(lit(0.0))
        val mwl = length(regexp_replace(col("text"), "\\s+", ""))
          .cast("double") / nTok
        val ttr = size(array_distinct(col("toks"))).cast("double") / nTok
        val bits = base.select(
          (mwl < 4.2).as("b1"),
          (size(col("toks")) < 25).as("b2"),
          (top2 >= 0.1).as("b3"),
          (ttr < 0.55).as("b4"))
        bits.agg(
            count(when(col("b1"), 1)).as("f1"),
            count(when(col("b1") && !col("b2") && !col("b3") &&
              !col("b4"), 1)).as("u1"),
            count(when(col("b2"), 1)).as("f2"),
            count(when(col("b2") && !col("b1") && !col("b3") &&
              !col("b4"), 1)).as("u2"),
            count(when(col("b3"), 1)).as("f3"),
            count(when(col("b3") && !col("b1") && !col("b2") &&
              !col("b4"), 1)).as("u3"),
            count(when(col("b4"), 1)).as("f4"),
            count(when(col("b4") && !col("b1") && !col("b2") &&
              !col("b3"), 1)).as("u4"))
          .select(expr("stack(4, " +
            "'mean_word_len', f1, u1, 'min_tokens', f2, u2, " +
            "'top_bigram', f3, u3, 'type_token_ratio', f4, u4) " +
            "AS (rule, n_fail, n_unique_fail)"))
          .orderBy(col("rule"))
      },
      Some("""WITH t AS (
          SELECT doc_id, text,
            string_split_regex(
              regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks
          FROM documents),
        g AS (
          SELECT doc_id, text, toks,
            list_transform(range(1, len(toks)), i ->
              toks[i] || ' ' || toks[i+1]) AS g2
          FROM t),
        m AS (
          SELECT doc_id, len(toks) AS n_toks,
            cast(length(regexp_replace(text, '\s+', '', 'g')) as double)
              / cast(len(toks) as double) AS mean_word_len,
            cast(len(list_distinct(toks)) as double)
              / cast(len(toks) as double) AS ttr,
            CASE WHEN len(g2) > 0 THEN
              cast(list_max(list_transform(g2, y ->
                len(list_filter(g2, x -> x = y)))) as double)
                / cast(len(g2) as double)
            ELSE 0.0 END AS top_bigram_frac
          FROM g),
        fl AS (
          SELECT
            mean_word_len < 4.2 AS b1,
            n_toks < 25 AS b2,
            top_bigram_frac >= 0.1 AS b3,
            ttr < 0.55 AS b4
          FROM m),
        a AS (
          SELECT
            cast(count(*) FILTER (WHERE b1) as bigint) AS f1,
            cast(count(*) FILTER (WHERE b1 AND NOT b2 AND NOT b3
              AND NOT b4) as bigint) AS u1,
            cast(count(*) FILTER (WHERE b2) as bigint) AS f2,
            cast(count(*) FILTER (WHERE b2 AND NOT b1 AND NOT b3
              AND NOT b4) as bigint) AS u2,
            cast(count(*) FILTER (WHERE b3) as bigint) AS f3,
            cast(count(*) FILTER (WHERE b3 AND NOT b1 AND NOT b2
              AND NOT b4) as bigint) AS u3,
            cast(count(*) FILTER (WHERE b4) as bigint) AS f4,
            cast(count(*) FILTER (WHERE b4 AND NOT b1 AND NOT b2
              AND NOT b3) as bigint) AS u4
          FROM fl)
        SELECT 'mean_word_len' AS rule, f1 AS n_fail,
          u1 AS n_unique_fail FROM a
        UNION ALL SELECT 'min_tokens', f2, u2 FROM a
        UNION ALL SELECT 'top_bigram', f3, u3 FROM a
        UNION ALL SELECT 'type_token_ratio', f4, u4 FROM a
        ORDER BY rule""")),

    // ------------------------------------------------------------------
    // Language-ID EVALUATION — the confusion census of x04's stopword
    // classifier against the corpus's recorded lang label (s09's
    // eval-harness convention: the metric a pipeline computes before
    // trusting x04's predictions to route a mixture plan). One
    // classify pass (the shared LangId expressions — x04 and its eval
    // cannot drift), one (label, pred) aggregation; label totals ride
    // a label-keyed window so each row carries its denominator. The
    // readout: which languages leak into which, and how much 'und'
    // (no stopword hit) each label produces — the routing loss x16's
    // mixture plan inherits from the classifier. On THIS corpus the
    // verdict is damning and honest: the synthetic text draws from an
    // English-ish vocabulary regardless of the recorded label, so
    // de/es/fr/zh route almost entirely to en or und (s09's
    // harness-is-the-deliverable convention — the eval exists
    // precisely to catch a classifier this wrong before a mixture
    // plan trusts it).
    // ------------------------------------------------------------------
    "x34_langid_confusion" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val pred = docs(s, d)
          .select(col("doc_id"), col("text"), col("lang"))
          .withColumn("toks", graft.text.LangId.tokens(col("text")))
          .select(col("lang").as("lang_label"),
            graft.text.LangId.detectFromTokens(col("text"), col("toks"))
              .as("lang_pred"))
        pred.groupBy(col("lang_label"), col("lang_pred"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("label_total",
            sum(col("n_docs")).over(
              Window.partitionBy(col("lang_label"))))
          .withColumn("correct", col("lang_label") === col("lang_pred"))
          .orderBy(col("lang_label"), col("lang_pred"))
      },
      Some("""WITH d AS (
          SELECT doc_id, text, lang,
            list_filter(string_split_regex(lower(text), '\s+'),
              t -> t <> '') AS toks
          FROM documents),
        m AS (
          SELECT doc_id, lang,
            cast(length(regexp_replace(text, '\s+', '', 'g')) as double) AS total,
            cast(len(regexp_extract_all(text, '[\x{3400}-\x{4dbf}\x{4e00}-\x{9fff}]')) as double) AS cjk,
            len(list_filter(toks, t -> t IN ('the','and','of','to','in','is','that','it','for','was','with','on','as','are','this'))) AS s_en,
            len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','mit','auf','sich','den','von','für','im','zu'))) AS s_de,
            len(list_filter(toks, t -> t IN ('le','la','les','de','et','est','un','une','dans','que','pour','pas','des','du','avec'))) AS s_fr,
            len(list_filter(toks, t -> t IN ('el','la','los','las','de','que','es','en','un','una','por','con','para','no','se'))) AS s_es
          FROM d),
        p AS (
          SELECT lang AS lang_label,
            CASE WHEN total > 0 AND cjk / total > 0.3 THEN 'zh'
                 WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und'
                 WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                 WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                 WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                 ELSE 'es' END AS lang_pred
          FROM m),
        conf AS (
          SELECT lang_label, lang_pred,
            cast(count(*) as bigint) AS n_docs
          FROM p GROUP BY 1, 2)
        SELECT lang_label, lang_pred, n_docs,
          cast(sum(n_docs) OVER (PARTITION BY lang_label) as bigint)
            AS label_total,
          lang_label = lang_pred AS correct
        FROM conf
        ORDER BY lang_label, lang_pred""")),

    // ------------------------------------------------------------------
    // NEYMAN ALLOCATION — variance-weighted sample budgeting: when an
    // eval/annotation budget must split across strata, optimal
    // allocation is n_h·σ_h / Σ(n_h·σ_h), not proportional n_h (a
    // high-variance stratum needs more samples per doc). σ from q39's
    // discipline — EXACT integer Σx/Σx² per stratum, then the same
    // row-local IEEE sqrt in both engines (native streaming stddev is
    // partition-order-dependent and could never hash-match). The one
    // remaining cross-row double sum (Σ weights over strata) is an
    // ORDERED left fold over the lang-sorted collected list —
    // identical operation order in both engines on the strata-scale
    // (5-row) list, so even the double total is bit-exact. Corpus
    // work: ONE tokenize + one lang-keyed integer aggregation.
    // ------------------------------------------------------------------
    "x35_neyman_allocation" -> Q(
      (s, d) => {
        val m = docs(s, d)
          .select(col("lang"), size(words(col("text"))).as("nl"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_h"),
            sum(col("nl").cast("long")).as("s1"),
            sum((col("nl") * col("nl")).cast("long")).as("s2"))
        val sd = sqrt((col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") /
            col("n_h").cast("double")) /
          (col("n_h") - 1).cast("double"))
        val w = m.withColumn("sd", sd)
          .withColumn("wt", col("n_h").cast("double") * col("sd"))
          .localCheckpoint()
        val tot = w.agg(aggregate(
          array_sort(collect_list(struct(col("lang"), col("wt")))),
          lit(0.0), (acc, x) => acc + x.getField("wt")).as("tw"))
        w.crossJoin(broadcast(tot))
          .select(col("lang"), col("n_h").as("n_docs"),
            col("sd").as("stddev_len"),
            floor(lit(1000) * col("wt") / col("tw")).cast("long")
              .as("quota_permille"))
          .orderBy(col("lang"))
      },
      Some("""WITH t AS (
          SELECT lang,
            len(string_split_regex(
              regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS nl
          FROM documents),
        m AS (
          SELECT lang, cast(count(*) as bigint) AS n_h,
            cast(sum(nl) as bigint) AS s1,
            cast(sum(nl * nl) as bigint) AS s2
          FROM t GROUP BY 1),
        w AS (
          SELECT lang, n_h,
            sqrt((cast(s2 as double) -
              cast(s1 as double) * cast(s1 as double) /
                cast(n_h as double)) /
              cast(n_h - 1 as double)) AS sd
          FROM m),
        w2 AS (SELECT lang, n_h, sd,
            cast(n_h as double) * sd AS wt FROM w),
        tot AS (
          -- explicit left fold in lang order: the same operation
          -- order Spark's aggregate() runs, so the double total is
          -- bit-exact (list_sum's summation order is unspecified)
          SELECT list_reduce(list(wt ORDER BY lang),
            (a, b) -> a + b) AS tw
          FROM w2)
        SELECT w2.lang, w2.n_h AS n_docs, w2.sd AS stddev_len,
          cast(floor(1000 * w2.wt / tot.tw) as bigint)
            AS quota_permille
        FROM w2, tot ORDER BY w2.lang""")),

    // ------------------------------------------------------------------
    // Shingle containment (asymmetric near-dup: how much of the SMALLER
    // doc is inside the pair): |A∩B| / min(|A|,|B|). Catches
    // subset/quotation duplication that symmetric Jaccard dilutes.
    // Bounded exact variant (oracle); the scale path is d03's LSH.
    // ------------------------------------------------------------------
    "d06_containment" -> Q(
      (s, d) => {
        val base = docShingles(s, d)
          .filter(col("doc_id") < 1000 && size(col("w")) > 0)
        val a = base.select(col("doc_id").as("doc_a"), col("w").as("wa"))
        val b = base.select(col("doc_id").as("doc_b"), col("w").as("wb"))
        a.join(b, col("doc_a") < col("doc_b"))
          .withColumn("containment",
            size(array_intersect(col("wa"), col("wb"))).cast("double") /
              least(size(col("wa")), size(col("wb"))).cast("double"))
          .filter(col("containment") >= 0.5)
          .select(col("doc_a"), col("doc_b"), col("containment"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH t0 AS (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents WHERE doc_id < 1000),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS w
          FROM t0 WHERE len(w) >= 3)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          cast(len(list_intersect(a.w, b.w)) as double) /
            cast(least(len(a.w), len(b.w)) as double) AS containment
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE cast(len(list_intersect(a.w, b.w)) as double) /
              cast(least(len(a.w), len(b.w)) as double) >= 0.5
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // Document-length histogram: fixed-width buckets + share of corpus.
    // Integer `div` (not /) so both engines floor identically.
    // ------------------------------------------------------------------
    "x08_len_histogram" -> Q(
      (s, d) =>
        t(s, d, "documents")
          .groupBy(expr("n_chars div 200").as("bucket"))
          .agg(count(lit(1)).as("n"))
          .withColumn("share", col("n").cast("double") /
            sum(col("n")).over(org.apache.spark.sql.expressions.Window
              .partitionBy()).cast("double"))
          .orderBy(col("bucket")),
      Some("""WITH h AS (
          SELECT n_chars // 200 AS bucket, count(*) AS n
          FROM documents GROUP BY bucket)
        SELECT bucket, n,
          cast(n as double) / cast(sum(n) OVER () as double) AS share
        FROM h ORDER BY bucket""")),

    // ------------------------------------------------------------------
    // IVF-style ANN (the scale path for similarity search): assign every
    // vector to its nearest of 8 deterministic centroids (vec_id 0-7 as
    // the "trained" codebook), then search only the 2 centroids nearest
    // the query. At 100 TB the assignment is one broadcast-join pass and
    // each probe touches ~2/8 of the corpus; recall is tested in
    // TextOpsSpec against s01's exact top-k.
    // ------------------------------------------------------------------
    "s03_ivf_ann" -> Q(
      (s, d) => {
        val base = emb(s, d)
        val cents = base.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
        // row-local literal-codebook argmax (see assignToCodebook)
        val assigned = assignToCodebook(s, d)
        // the query's 2 nearest centroids
        val q = base.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        val probe = cents.crossJoin(broadcast(q))
          .withColumn("qsim", cosine(col("ce"), col("qe")))
          .orderBy(col("qsim").desc, col("cent_id"))
          .limit(2)
          .select(col("cent_id").as("probe_cent"))
        assigned
          .join(broadcast(probe), col("cent_id") === col("probe_cent"))
          .filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .withColumn("cos", cosine(col("embedding"), col("qe")))
          .select(col("vec_id"), col("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> cast(x as double)) AS v FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 8),
        asgn AS (
          SELECT vec_id, v, nrm, cent_id,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY list_dot_product(v, cv) / nrm / cnrm DESC, cent_id)
              AS rn
          FROM n, c),
        assigned AS (SELECT vec_id, v, nrm, cent_id FROM asgn WHERE rn = 1),
        q AS (SELECT v AS qv, nrm AS qnrm FROM n WHERE vec_id = 0),
        probe AS (
          SELECT cent_id FROM c, q
          ORDER BY list_dot_product(cv, qv) / cnrm / qnrm DESC, cent_id
          LIMIT 2)
        SELECT a.vec_id,
          list_dot_product(a.v, q.qv) / a.nrm / q.qnrm AS cos
        FROM assigned a JOIN probe p ON a.cent_id = p.cent_id, q
        WHERE a.vec_id <> 0
        ORDER BY cos DESC, a.vec_id
        LIMIT 10"""),
      bench = true),

    // ------------------------------------------------------------------
    // IVF nprobe tuning curve — d15's role, for the vector index:
    // recall@10 AND rows-scanned at probe budgets 1/2/4, from ONE
    // shared assignment + scoring pass (checkpointed; each budget is a
    // FILTER on centroid rank, never a re-scan). n_scanned is the cost
    // axis a capacity plan prices; recall10 is the quality axis —
    // together they are the "how many probes do I need" answer every
    // IVF deployment must produce before trusting s03's nprobe=2
    // default. All broadcasts are the 1-row query / 8-row centroid
    // rank table; the corpus-side work is the one cell-pruned cosine
    // scan.
    // ------------------------------------------------------------------
    "s14_ivf_tuning" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = emb(s, d)
        val q = base.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        val cents = base.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
        val ranked = cents.crossJoin(broadcast(q))
          .withColumn("qsim", cosine(col("ce"), col("qe")))
          .withColumn("crk", row_number().over(
            Window.orderBy(col("qsim").desc, col("cent_id"))))
          .select(col("cent_id"), col("crk"))
        val exact10 = base.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .withColumn("cos", cosine(col("embedding"), col("qe")))
          .orderBy(col("cos").desc, col("vec_id")).limit(10)
          .select(col("vec_id")).withColumn("hit", lit(1L))
        val scored = assignToCodebook(s, d)
          .filter(col("vec_id") =!= 0)
          .join(broadcast(ranked), Seq("cent_id"))
          .crossJoin(broadcast(q))
          .withColumn("cos", cosine(col("embedding"), col("qe")))
          .select(col("vec_id"), col("crk"), col("cos"))
          .localCheckpoint()
        Seq(1, 2, 4).map { np =>
          val probed = scored.filter(col("crk") <= np)
          probed.orderBy(col("cos").desc, col("vec_id")).limit(10)
            .join(exact10, Seq("vec_id"), "left")
            .agg(count(lit(1)).as("k_returned"),
              coalesce(sum(col("hit")), lit(0L)).as("recall10"))
            .crossJoin(probed.agg(count(lit(1)).as("n_scanned")))
            .select(lit(np).as("nprobe"), col("n_scanned"),
              col("k_returned"), col("recall10"))
        }.reduce(_ unionAll _).orderBy(col("nprobe"))
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> cast(x as double)) AS v FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 8),
        asgn AS (
          SELECT vec_id, v, nrm, cent_id,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY list_dot_product(v, cv) / nrm / cnrm DESC, cent_id)
              AS rn
          FROM n, c),
        assigned AS (SELECT vec_id, v, nrm, cent_id FROM asgn
          WHERE rn = 1),
        q AS (SELECT v AS qv, nrm AS qnrm FROM n WHERE vec_id = 0),
        ranked AS (
          SELECT cent_id, row_number() OVER (
            ORDER BY list_dot_product(cv, qv) / cnrm / qnrm DESC,
              cent_id) AS crk
          FROM c, q),
        ex10 AS (
          SELECT n.vec_id FROM n, q WHERE n.vec_id <> 0
          ORDER BY list_dot_product(n.v, q.qv) / n.nrm / q.qnrm DESC,
            n.vec_id
          LIMIT 10),
        scored AS MATERIALIZED (
          SELECT a.vec_id, r.crk,
            list_dot_product(a.v, q.qv) / a.nrm / q.qnrm AS cos
          FROM assigned a JOIN ranked r ON r.cent_id = a.cent_id, q
          WHERE a.vec_id <> 0),
        t1 AS (SELECT vec_id FROM scored WHERE crk <= 1
          ORDER BY cos DESC, vec_id LIMIT 10),
        s1 AS (SELECT cast(1 as int) AS nprobe,
          (SELECT cast(count(*) as bigint) FROM scored WHERE crk <= 1)
            AS n_scanned,
          cast(count(*) as bigint) AS k_returned,
          cast(count(*) FILTER (WHERE vec_id IN
            (SELECT vec_id FROM ex10)) as bigint) AS recall10
          FROM t1),
        t2 AS (SELECT vec_id FROM scored WHERE crk <= 2
          ORDER BY cos DESC, vec_id LIMIT 10),
        s2 AS (SELECT cast(2 as int),
          (SELECT cast(count(*) as bigint) FROM scored WHERE crk <= 2),
          cast(count(*) as bigint),
          cast(count(*) FILTER (WHERE vec_id IN
            (SELECT vec_id FROM ex10)) as bigint)
          FROM t2),
        t4 AS (SELECT vec_id FROM scored WHERE crk <= 4
          ORDER BY cos DESC, vec_id LIMIT 10),
        s4 AS (SELECT cast(4 as int),
          (SELECT cast(count(*) as bigint) FROM scored WHERE crk <= 4),
          cast(count(*) as bigint),
          cast(count(*) FILTER (WHERE vec_id IN
            (SELECT vec_id FROM ex10)) as bigint)
          FROM t4)
        SELECT * FROM (
          SELECT * FROM s1 UNION ALL SELECT * FROM s2
          UNION ALL SELECT * FROM s4) u
        ORDER BY nprobe""")),

    // ------------------------------------------------------------------
    // NN-DESCENT k-NN GRAPH construction (Dong, Moses & Li, WWW 2011)
    // — the all-nodes face of ANN: build every vector's top-5 neighbor
    // list, not one query's. Init = within-IVF-cell top-5 (s03's
    // row-local literal-codebook assignment; quadratic only in cell
    // size — production sizes cells ~sqrt(n)) UNION 3 deterministic
    // h60-derived pseudo-random cross-corpus edges per node. The
    // random edges are load-bearing: a purely cell-blocked graph's
    // neighbors-of-neighbors NEVER leave the cell (measured: descent
    // gains exactly 0 hits without them), which is why the paper
    // initializes randomly. One LOCAL-JOIN round (each node
    // introduces all pairs of its undirected B∪R pool neighborhood),
    // scoring only cross-cell proposals not already paid for, then
    // re-selects top-5 from everything scored. The report carries
    // recall@5 on 20 probe nodes vs exact ground truth (bounded,
    // s04's convention) AND n_scored, the scoring bill per stage:
    // here init 32.6k + descent 42.7k pairs lift recall 52 → 61 of
    // 100 where brute force would score 250k — and the QueriesSpec
    // clustered fixture shows the same code jumping 77 → 85 when the
    // data has the local structure descent exploits (near-uniform
    // vectors are its honest floor). Every join is key-partitioned
    // (cell, then node id); nothing all-pairs the corpus.
    // ------------------------------------------------------------------
    "s15_nn_descent" -> Q(
      (s, d) => nnDescentReport(emb(s, d), nCents = 8),
      bench = true,
      oracle = Some("""WITH e AS (SELECT vec_id,
            list_transform(embedding, x -> cast(x as double)) AS v
          FROM embeddings),
        n AS (SELECT vec_id, v,
            sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM e),
        nv AS (SELECT count(*) AS cnt FROM n),
        -- cells sized ~64 vectors each, floored at 8 (the Spark side's
        -- linear-init dial); at this corpus this evaluates to 8
        c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
          FROM n, nv WHERE vec_id < greatest(8, (nv.cnt + 63) // 64)),
        asgn AS (
          SELECT vec_id, v, nrm, cent_id,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY list_dot_product(v, cv) / nrm / cnrm DESC,
                cent_id) AS rn
          FROM n, c),
        assigned AS (SELECT vec_id, v, nrm, cent_id
          FROM asgn WHERE rn = 1),
        cellpairs AS (
          SELECT x.vec_id AS a, y.vec_id AS b,
            list_dot_product(x.v, y.v) / x.nrm / y.nrm AS cos
          FROM assigned x JOIN assigned y ON x.cent_id = y.cent_id
            AND x.vec_id <> y.vec_id),
        rnd0 AS (
          SELECT x.vec_id AS a,
            (x.vec_id + 1 +
             (('0x' || substr(md5('nn_init_' || x.vec_id || '_' || j),
               1, 15))::BIGINT % (nv.cnt - 1))) % nv.cnt AS b
          FROM n x, nv, (SELECT unnest([0, 1, 2]) AS j)),
        rndsc AS (
          SELECT r.a, r.b,
            list_dot_product(x.v, y.v) / x.nrm / y.nrm AS cos
          FROM (SELECT DISTINCT a, b FROM rnd0 WHERE a <> b) r
          JOIN n x ON x.vec_id = r.a
          JOIN n y ON y.vec_id = r.b),
        cellknn AS (
          SELECT a, b, cos FROM (
            SELECT a, b, cos, row_number() OVER (PARTITION BY a
              ORDER BY cos DESC, b) AS rn
            FROM cellpairs) t WHERE rn <= 5),
        pool AS (SELECT a, b FROM cellknn
          UNION SELECT a, b FROM rndsc),
        und AS (SELECT a AS m, b AS x FROM pool
          UNION SELECT b, a FROM pool),
        knn0 AS (
          SELECT a, b, cos FROM (
            SELECT a, b, cos, row_number() OVER (PARTITION BY a
              ORDER BY cos DESC, b) AS rn
            FROM (SELECT * FROM cellpairs UNION ALL
                  SELECT * FROM rndsc) u0) t WHERE rn <= 5),
        props AS (
          SELECT DISTINCT p.x AS a, q.x AS b
          FROM und p JOIN und q ON p.m = q.m AND p.x <> q.x
          JOIN assigned ax ON ax.vec_id = p.x
          JOIN assigned ay ON ay.vec_id = q.x
          WHERE ax.cent_id <> ay.cent_id
            AND NOT EXISTS (SELECT 1 FROM rndsc k
              WHERE k.a = p.x AND k.b = q.x)),
        nonscored AS (
          SELECT p.a, p.b,
            list_dot_product(x.v, y.v) / x.nrm / y.nrm AS cos
          FROM props p
          JOIN n x ON x.vec_id = p.a
          JOIN n y ON y.vec_id = p.b),
        knn1 AS (
          SELECT a, b, cos FROM (
            SELECT a, b, cos, row_number() OVER (PARTITION BY a
              ORDER BY cos DESC, b) AS rn
            FROM (SELECT * FROM knn0 UNION ALL
                  SELECT * FROM nonscored) u) t
          WHERE rn <= 5),
        exact5 AS (
          SELECT a, b FROM (
            -- division order mirrors Spark's cosine(probe, corpus):
            -- dot / probe_nrm / corpus_nrm (a/n1/n2 vs a/n2/n1 can
            -- differ in the last ULP and flip a near-tie rank)
            SELECT q.vec_id AS a, x.vec_id AS b,
              row_number() OVER (PARTITION BY q.vec_id
                ORDER BY list_dot_product(q.v, x.v) / q.nrm / x.nrm
                  DESC, x.vec_id) AS rn
            FROM n x, (SELECT vec_id, v, nrm FROM n
              WHERE vec_id < 20) q
            WHERE x.vec_id <> q.vec_id) t
          WHERE rn <= 5),
        s1 AS (SELECT '1_init' AS stage,
          (SELECT cast(count(*) as bigint) FROM cellpairs) +
          (SELECT cast(count(*) as bigint) FROM rndsc) AS n_scored,
          (SELECT cast(count(*) as bigint) FROM knn0
            JOIN exact5 USING (a, b) WHERE a < 20) AS hits5),
        s2 AS (SELECT '2_descent' AS stage,
          (SELECT cast(count(*) as bigint) FROM nonscored) AS n_scored,
          (SELECT cast(count(*) as bigint) FROM knn1
            JOIN exact5 USING (a, b) WHERE a < 20) AS hits5)
        SELECT * FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2) u
        ORDER BY stage""")),

    // ------------------------------------------------------------------
    // IVF index UPSERT monitoring — p02's question, for the vector
    // index: a new drop of vectors (h60 hash-split 20%, x17's
    // convention; the 8 codebook rows are day-0 by construction) is
    // assigned to the STORED day-0 cells with the same zero-shuffle
    // literal-codebook argmax — centroids never retrain on ingest. To
    // make the monitor's alarm PROVABLE (m10's convention: an
    // all-green report proves nothing), the drop's content skews by
    // construction: each incoming vector is pulled toward centroid 2
    // (v' = v + 0.1·c2, double-exact in both engines — d17's
    // inject-the-defect move; 0.1 is tuned so the skew DISCRIMINATES:
    // cell 2 flags on over-share, cell 4 on starvation, six cells
    // stay green), the way a new crawl source skews toward one
    // content type. The per-cell report prices the
    // decision the index operator actually faces: growth_ppm (integer
    // 1e6·new div old) says which cells the drop inflates, and
    // `drifted` runs x31's exact two-proportion z-test
    // (cross-multiplied DECIMAL38/HUGEINT integers, z > 2) on each
    // cell's share-of-new vs share-of-old — when it fires, the stored
    // centroids no longer describe the data and a retrain (s06's
    // training pass) is due. ONE corpus scan + one 8-row aggregate;
    // totals ride a 1-row broadcast.
    // ------------------------------------------------------------------
    "s16_ivf_upsert" -> Q(
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        import graft.functions.PortableHash.h60col
        val base = emb(s, d)
        val c2 = base.filter(col("vec_id") === 2)
          .select(col("embedding")).collect()(0).getSeq[Float](0)
        val c2lit = array(c2.map(x => lit(x.toDouble)).toIndexedSeq: _*)
        val isNew = pmod(h60col(concat(lit("ivf_new_"), col("vec_id"))),
          lit(5)) === 0 && col("vec_id") >= 8
        val vd = transform(col("embedding"), x => x.cast("double"))
        val frame = base.select(col("vec_id"),
          when(isNew, zip_with(vd, c2lit,
            (x, y) => x + lit(0.1) * y)).otherwise(vd).as("embedding"))
        val per = assignToCodebookOf(frame, 8)
          .select(col("cent_id"), isNew.as("is_new"))
          .groupBy(col("cent_id"))
          .agg(count(when(!col("is_new"), 1)).as("n_old"),
            count(when(col("is_new"), 1)).as("n_new"))
        val tot = per.agg(sum(col("n_old")).as("t_old"),
          sum(col("n_new")).as("t_new"))
        def d38(c: Column) = c.cast(DecimalType(38, 0))
        val diff = col("n_new") * col("t_old") -
          col("n_old") * col("t_new")
        per.crossJoin(broadcast(tot))
          .select(col("cent_id"), col("n_old"), col("n_new"),
            expr("1000000 * n_new div n_old").as("growth_ppm"),
            (d38(diff) * d38(diff) * d38(col("t_old") + col("t_new")) >
              lit(4) * d38(col("t_old")) * d38(col("t_new")) *
                d38(col("n_old") + col("n_new")) *
                (d38(col("t_old") + col("t_new")) -
                  d38(col("n_old") + col("n_new")))).as("drifted"))
          .orderBy(col("cent_id"))
      },
      Some("""WITH e0 AS (SELECT vec_id,
            list_transform(embedding, x -> cast(x as double)) AS v,
            ('0x' || substr(md5('ivf_new_' || vec_id), 1, 15))::BIGINT
              % 5 = 0 AND vec_id >= 8 AS is_new
          FROM embeddings),
        c2 AS (SELECT v AS c2v FROM e0 WHERE vec_id = 2),
        e AS (SELECT vec_id, is_new,
            CASE WHEN is_new THEN
              list_transform(range(1, len(v) + 1), i ->
                v[i] + 0.1 * c2.c2v[i])
            ELSE v END AS v
          FROM e0, c2),
        n AS (SELECT vec_id, is_new, v,
            sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM e),
        c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
          FROM n WHERE vec_id < 8),
        asgn AS (
          SELECT vec_id, is_new, cent_id,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY list_dot_product(v, cv) / nrm / cnrm DESC,
                cent_id) AS rn
          FROM n, c),
        tagged AS (
          SELECT cent_id, is_new FROM asgn WHERE rn = 1),
        per AS (
          SELECT cent_id,
            cast(count(*) FILTER (WHERE NOT is_new) as bigint) AS n_old,
            cast(count(*) FILTER (WHERE is_new) as bigint) AS n_new
          FROM tagged GROUP BY 1),
        tot AS (
          SELECT cast(sum(n_old) as bigint) AS t_old,
            cast(sum(n_new) as bigint) AS t_new
          FROM per)
        SELECT p.cent_id, p.n_old, p.n_new,
          cast(1000000 * p.n_new // p.n_old as bigint) AS growth_ppm,
          (cast(p.n_new * t.t_old - p.n_old * t.t_new as hugeint) *
           cast(p.n_new * t.t_old - p.n_old * t.t_new as hugeint) *
           cast(t.t_old + t.t_new as hugeint)) >
          (4 * cast(t.t_old as hugeint) * cast(t.t_new as hugeint) *
           cast(p.n_old + p.n_new as hugeint) *
           cast(t.t_old + t.t_new - p.n_old - p.n_new as hugeint))
            AS drifted
        FROM per p, tot t ORDER BY p.cent_id""")),

    // ------------------------------------------------------------------
    // ANN quality evaluation: recall@10 of the IVF 2-probe path (s03's
    // index shape) against exact brute-force ground truth, batched over
    // the 10 query vectors vec_id < 10 — the measurement a production
    // similarity-search deployment runs before trusting an index. The
    // ground-truth side is the expensive one and is bounded by the
    // query batch (10 × corpus row-local cosines, one broadcast of the
    // 10-vector batch — no shuffle grows with the corpus); the IVF side
    // reuses the same row-local literal-codebook argmax as s03. Exact
    // and approximate top-10 sets are intersected per query; ties
    // broken by vec_id on BOTH sides and in the oracle, so recall is
    // hash-stable, not approximately-equal.
    // ------------------------------------------------------------------
    "s04_ann_recall" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = emb(s, d)
        val queries = base.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        // exact ground truth: top-10 per query by cosine
        val exact = base.crossJoin(broadcast(queries))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cos", cosine(col("embedding"), col("qe")))
          .withColumn("rn", row_number().over(Window.partitionBy(col("q_id"))
            .orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rn") <= 10)
          .select(col("q_id"), col("vec_id"))
        // IVF side: each query probes its 2 nearest centroids
        val cents = base.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
        val probes = cents.crossJoin(broadcast(queries))
          .withColumn("qsim", cosine(col("ce"), col("qe")))
          .withColumn("rn", row_number().over(Window.partitionBy(col("q_id"))
            .orderBy(col("qsim").desc, col("cent_id"))))
          .filter(col("rn") <= 2)
          .select(col("q_id").as("pq_id"), col("cent_id").as("probe_cent"))
        val approx = assignToCodebook(s, d)
          .join(broadcast(probes), col("cent_id") === col("probe_cent"))
          .join(broadcast(queries), col("pq_id") === col("q_id"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cos", cosine(col("embedding"), col("qe")))
          .withColumn("rn", row_number().over(Window.partitionBy(col("q_id"))
            .orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rn") <= 10)
          .select(col("q_id").as("aq_id"), col("vec_id").as("a_vec"))
        exact.join(approx,
            col("q_id") === col("aq_id") && col("vec_id") === col("a_vec"),
            "left")
          .groupBy(col("q_id"))
          .agg(count(col("a_vec")).as("n_hits"))
          .withColumn("recall", col("n_hits").cast("double") / lit(10.0))
          .orderBy(col("q_id"))
      },
      Some("""WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> cast(x as double)) AS v
          FROM embeddings),
        n AS (
          SELECT vec_id, v,
            sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM e),
        q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM n
              WHERE vec_id < 10),
        exact AS (
          SELECT q_id, vec_id FROM (
            SELECT q.q_id, n.vec_id,
              row_number() OVER (PARTITION BY q.q_id
                ORDER BY list_dot_product(n.v, q.qv) / n.nrm / q.qnrm DESC,
                  n.vec_id) AS rn
            FROM n, q WHERE n.vec_id <> q.q_id)
          WHERE rn <= 10),
        c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n
              WHERE vec_id < 8),
        asgn AS (
          SELECT vec_id, cent_id FROM (
            SELECT n.vec_id, c.cent_id,
              row_number() OVER (PARTITION BY n.vec_id
                ORDER BY list_dot_product(n.v, c.cv) / n.nrm / c.cnrm DESC,
                  c.cent_id) AS rn
            FROM n, c)
          WHERE rn = 1),
        probes AS (
          SELECT q_id, cent_id FROM (
            SELECT q.q_id, c.cent_id,
              row_number() OVER (PARTITION BY q.q_id
                ORDER BY list_dot_product(c.cv, q.qv) / c.cnrm / q.qnrm DESC,
                  c.cent_id) AS rn
            FROM c, q)
          WHERE rn <= 2),
        approx AS (
          SELECT q_id, vec_id FROM (
            SELECT p.q_id, a.vec_id,
              row_number() OVER (PARTITION BY p.q_id
                ORDER BY list_dot_product(n.v, q.qv) / n.nrm / q.qnrm DESC,
                  a.vec_id) AS rn
            FROM asgn a
            JOIN probes p ON a.cent_id = p.cent_id
            JOIN n ON n.vec_id = a.vec_id
            JOIN q ON q.q_id = p.q_id
            WHERE a.vec_id <> p.q_id)
          WHERE rn <= 10)
        SELECT e.q_id, cast(count(a.vec_id) as bigint) AS n_hits,
          cast(count(a.vec_id) as double) / 10.0 AS recall
        FROM exact e
        LEFT JOIN approx a ON a.q_id = e.q_id AND a.vec_id = e.vec_id
        GROUP BY e.q_id
        ORDER BY e.q_id""")),

    // ------------------------------------------------------------------
    // TRAINED codebook: 2 unrolled Lloyd iterations of k-means over
    // QUANTIZED embeddings — the training step the IVF/semantic
    // operators' codebooks come from (s03/d10 seed from raw vectors;
    // d12 scales k; this TRAINS the centroids). Float k-means can never
    // hash-match across engines (mean = order-dependent float sums), so
    // the state is integer fixed-point — the same portability trick as
    // PageRank: vectors quantize to floor(x·1000) (a float's 24-bit
    // mantissa times 1000 is exact in a double, so quantization is
    // bit-identical in both engines), distances are integer L2,
    // centroid updates are per-dimension floor-div means, ties argmin
    // to the smallest cent_id. Empty clusters keep their previous
    // centroid (both engines).
    //
    // Scale shape per iteration: assignment is a row-local fold over k
    // LITERAL centroids (zero shuffle — d10's codebook shape); the
    // update is one (cid, pos)-keyed aggregation of k·dim rows; the
    // driver-side collect is k·dim longs (metadata, the PageRank-style
    // per-round action). At large k the assignment swaps to d12's
    // broadcast-relation two-level argmax — the dial is the same.
    // Output: per-cluster size, inertia (sum of round-2 assignment
    // distances), and the trained-centroid checksum.
    // ------------------------------------------------------------------
    "s05_kmeans_quantized" -> Q(
      (s, d) => {
        val k = 8
        val quant = transform(col("embedding"),
          x => floor(x.cast("double") * lit(1000.0)).cast("long"))
        val base = emb(s, d).select(col("vec_id"), quant.as("qv"))
        def centArray(cents: Seq[(Long, Seq[Long])]): Column =
          array(cents.sortBy(_._1).map { case (id, v) =>
            struct(lit(id).as("cid"),
              array(v.map(lit(_)).toIndexedSeq: _*).as("cv"))
          }.toIndexedSeq: _*)
        // nearest centroid by integer L2; fold ascends cid with strict
        // <, so ties pick the smallest cid (= row_number over
        // (dist, cid) in the oracle)
        def assign(cents: Seq[(Long, Seq[Long])]) =
          base.select(col("vec_id"), col("qv"),
            aggregate(centArray(cents),
              struct(lit(Long.MaxValue).as("dist"), lit(-1L).as("cid")),
              (acc, c) => {
                val dist = aggregate(
                  zip_with(col("qv"), c.getField("cv"),
                    (a, b) => (a - b) * (a - b)),
                  lit(0L), (s2, x) => s2 + x)
                when(dist < acc.getField("dist"),
                  struct(dist.as("dist"), c.getField("cid").as("cid")))
                  .otherwise(acc)
              }).as("best"))
            .select(col("vec_id"), col("qv"),
              col("best.cid").as("cid"), col("best.dist").as("dist"))
        def step(prev: Seq[(Long, Seq[Long])]): Seq[(Long, Seq[Long])] = {
          val sums = assign(prev)
            .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "v")))
            .groupBy(col("cid"), col("pos"))
            .agg(expr("sum(v) div count(1)").as("c"))
            .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
          val byCid = sums.groupBy(_._1).map { case (cid, rs) =>
            cid -> rs.sortBy(_._2).map(_._3).toSeq
          }
          prev.map { case (cid, old) => cid -> byCid.getOrElse(cid, old) }
        }
        val init = base.filter(col("vec_id") < k)
          .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
          .sortBy(_._1).toSeq
        val trained = step(init)
        val centDf = s.createDataFrame(
          trained.map { case (cid, v) => (cid, v.sum) })
          .toDF("cid", "centroid_sum")
        centDf
          .join(assign(trained).groupBy(col("cid"))
              .agg(count(lit(1)).as("n_vectors"),
                sum(col("dist")).as("inertia")),
            Seq("cid"), "left")
          .select(col("cid"),
            coalesce(col("n_vectors"), lit(0L)).as("n_vectors"),
            coalesce(col("inertia"), lit(0L)).as("inertia"),
            col("centroid_sum"))
          .orderBy(col("cid"))
      },
      Some("""WITH e AS MATERIALIZED (
          SELECT vec_id,
            list_transform(embedding, x ->
              cast(floor(cast(x as double) * 1000) as bigint)) AS qv
          FROM embeddings),
        c0 AS MATERIALIZED (
          SELECT vec_id AS cid, qv AS cv FROM e WHERE vec_id < 8),
        a1 AS MATERIALIZED (
          SELECT vec_id, qv, cid, dist FROM (
            SELECT e.vec_id, e.qv, c.cid,
              list_sum(list_transform(range(1, 65), p ->
                (e.qv[p] - c.cv[p]) * (e.qv[p] - c.cv[p]))) AS dist,
              row_number() OVER (PARTITION BY e.vec_id ORDER BY
                list_sum(list_transform(range(1, 65), p ->
                  (e.qv[p] - c.cv[p]) * (e.qv[p] - c.cv[p]))), c.cid)
                AS rn
            FROM e, c0 c) x WHERE rn = 1),
        s1 AS (
          SELECT cid, pos, sum(v) // count(*) AS c FROM (
            SELECT a.cid, p.pos, a.qv[p.pos] AS v
            FROM a1 a, (SELECT unnest(range(1, 65)) AS pos) p) y
          GROUP BY cid, pos),
        c1l AS (SELECT cid, list(c ORDER BY pos) AS cv
          FROM s1 GROUP BY cid),
        c1 AS MATERIALIZED (
          SELECT c0.cid, coalesce(l.cv, c0.cv) AS cv
          FROM c0 LEFT JOIN c1l l ON l.cid = c0.cid),
        a2 AS MATERIALIZED (
          SELECT vec_id, cid, dist FROM (
            SELECT e.vec_id, c.cid,
              list_sum(list_transform(range(1, 65), p ->
                (e.qv[p] - c.cv[p]) * (e.qv[p] - c.cv[p]))) AS dist,
              row_number() OVER (PARTITION BY e.vec_id ORDER BY
                list_sum(list_transform(range(1, 65), p ->
                  (e.qv[p] - c.cv[p]) * (e.qv[p] - c.cv[p]))), c.cid)
                AS rn
            FROM e, c1 c) x WHERE rn = 1),
        agg AS (
          SELECT cid, cast(count(*) as bigint) AS n_vectors,
            cast(sum(dist) as bigint) AS inertia
          FROM a2 GROUP BY cid),
        csum AS (
          SELECT cid, cast(list_sum(cv) as bigint) AS centroid_sum
          FROM c1)
        SELECT s.cid, coalesce(a.n_vectors, 0) AS n_vectors,
          coalesce(a.inertia, 0) AS inertia, s.centroid_sum
        FROM csum s LEFT JOIN agg a USING (cid)
        ORDER BY s.cid""")),

    // ------------------------------------------------------------------
    // Full-corpus EXACT near-dup via an inverted shingle index — the
    // scalable exact middle path between d02 (all-pairs, bounded to an
    // oracle window) and d03 (probabilistic LSH). Explode shingles,
    // drop hot shingles (df > 50 — boilerplate carries no near-dup
    // signal and a hot key would concentrate df² pair rows on one
    // reducer), expand each surviving posting list's pairs row-locally,
    // and compute Jaccard over the df-pruned shingle universe FROM
    // COUNTS alone: |A∩B| is the pair's shared-posting count and
    // |A∪B| = |A'| + |B'| − |A∩B| — so after the one data-sized
    // shuffle on shingle, everything downstream is count arithmetic
    // joined against a per-doc size table; no shingle ARRAY ever rides
    // a shuffle and there is no verify join carrying sets. (An earlier
    // version verified against the full shingle sets via an array
    // join — inconsistent with the df-pruned candidate universe AND
    // the dominant cost at sf0.1: 1.1M candidate pairs × 300-string
    // array intersections.) The df cap is part of the operator's
    // semantics and is mirrored exactly in the oracle.
    // ------------------------------------------------------------------
    "d08_posting_jaccard" -> Q(
      (s, d) => postingJaccardPairs(s, d)
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""WITH t0 AS (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS w
          FROM t0 WHERE len(w) >= 3),
        posts AS (SELECT doc_id, unnest(w) AS fp FROM sh),
        dfc AS (SELECT fp, count(*) AS df FROM posts GROUP BY fp),
        okposts AS (
          SELECT p.doc_id, p.fp FROM posts p
          JOIN dfc ON dfc.fp = p.fp AND dfc.df <= 50),
        sizes AS (
          SELECT doc_id, cast(count(*) as bigint) AS sz
          FROM okposts GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            cast(count(*) as bigint) AS shared_fps
          FROM okposts a
          JOIN okposts b ON b.fp = a.fp AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT s.doc_a, s.doc_b,
          cast(s.shared_fps as double) /
            cast(x.sz + y.sz - s.shared_fps as double) AS jaccard
        FROM shared s
        JOIN sizes x ON x.doc_id = s.doc_a
        JOIN sizes y ON y.doc_id = s.doc_b
        WHERE cast(s.shared_fps as double) /
              cast(x.sz + y.sz - s.shared_fps as double) >= 0.4
        ORDER BY doc_a, doc_b"""),
      bench = true),

    // ------------------------------------------------------------------
    // TF-IDF top terms per document (linear idf = N/df — a ratio of
    // exact integers, so the score is one correctly-rounded double
    // division in both engines; log-idf would rank identically but
    // libm log() is not bit-portable). Two vocabulary-keyed aggregates
    // + one join on term (vocabulary-scale, not corpus-scale) + a
    // per-doc top-k window: every shuffle key is either `term` or
    // `doc_id`, both well-distributed at 100 TB. N rides in as a
    // 1-row broadcast cross join derived from the tf aggregate itself
    // (count of distinct doc_ids), so the whole query is ONE job — no
    // separate driver-side count() action.
    // ------------------------------------------------------------------
    "x11_tfidf_topterms" -> Q(
      (s, d) => {
        val tf = docs(s, d)
          .select(col("doc_id"), explode(words(col("text"))).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        // every doc has ≥1 token in this corpus, so distinct doc_ids in
        // tf = N; the 1-row frame broadcasts
        val n = tf.select(countDistinct(col("doc_id")).as("nd"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        tf.join(dfc, "term")
          .crossJoin(broadcast(n))
          .withColumn("score",
            (col("tf") * col("nd")).cast("double") /
              col("df").cast("double"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("term"), col("tf"),
            col("df"), col("score"))
          .orderBy(col("doc_id"), col("rank"))
      },
      Some("""WITH toks AS (
          SELECT doc_id,
            unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS term
          FROM documents),
        tf AS (
          SELECT doc_id, term, cast(count(*) as bigint) AS tf
          FROM toks GROUP BY doc_id, term),
        dfc AS (
          SELECT term, cast(count(*) as bigint) AS df
          FROM tf GROUP BY term),
        n AS (SELECT cast(count(*) as bigint) AS nd FROM documents),
        scored AS (
          SELECT doc_id, term, tf, df,
            cast(tf * nd as double) / cast(df as double) AS score,
            cast(row_number() OVER (PARTITION BY doc_id
              ORDER BY cast(tf * nd as double) / cast(df as double) DESC,
                term) as integer) AS rank
          FROM tf JOIN dfc USING (term), n)
        SELECT doc_id, rank, term, tf, df, score
        FROM scored WHERE rank <= 3
        ORDER BY doc_id, rank"""),
      bench = true),

    // ------------------------------------------------------------------
    // PII scan + redaction: per-doc match counts for the standard
    // pattern classes (email / phone / IPv4 / SSN) and the redacted
    // length. Row-local regex work (codegen'd regexp_extract_all /
    // regexp_replace — no UDF), so it scales as a pure map. The synthetic
    // corpus is PII-free (all counts 0, redacted_len = original), which
    // the oracle hash-verifies; FunctionsSpec drives the same patterns
    // over crafted PII strings to prove they actually fire.
    // ------------------------------------------------------------------
    "x12_pii_redact" -> Q(
      (s, d) => {
        val counted = piiPatterns.foldLeft(
          docs(s, d).select(col("doc_id"), col("text"))) {
          case (acc, (name, pat)) =>
            acc.withColumn(s"n_$name",
              size(regexp_extract_all(col("text"), lit(pat), lit(0)))
                .cast("bigint"))
        }
        counted
          .withColumn("redacted_len",
            length(redactPii(col("text"))).cast("bigint"))
          .withColumn("is_clean",
            piiPatterns.map(p => col(s"n_${p._1}") === 0L).reduce(_ && _))
          .drop("text")
          .orderBy(col("doc_id"))
      },
      Some("""WITH m AS (
          SELECT doc_id,
            cast(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) as bigint) AS n_email,
            cast(len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) as bigint) AS n_phone,
            cast(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) as bigint) AS n_ipv4,
            cast(len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) as bigint) AS n_ssn,
            cast(length(
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g'),
                '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<phone>', 'g'),
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<ipv4>', 'g'),
                '\b\d{3}-\d{2}-\d{4}\b', '<ssn>', 'g')) as bigint)
              AS redacted_len
          FROM documents)
        SELECT doc_id, n_email, n_phone, n_ipv4, n_ssn, redacted_len,
          n_email = 0 AND n_phone = 0 AND n_ipv4 = 0 AND n_ssn = 0
            AS is_clean
        FROM m
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Bigram novelty — a corpus-statistics quality signal: the fraction
    // of a document's distinct bigrams seen in no other document
    // (doc-frequency 1). High novelty = fresh text; low novelty =
    // template/boilerplate. Corpus model build = one aggregate keyed by
    // bigram (vocabulary-scale); scoring = one join on bigram + one
    // per-doc aggregate. The novelty ratio is a single division of
    // exact integers — bit-identical across engines. Docs with no
    // bigram (< 2 tokens) are out of scope on both sides.
    // ------------------------------------------------------------------
    "x13_bigram_novelty" -> Q(
      (s, d) => {
        // FAST generate shape (see d08): explode of the bigram
        // expression over once-aliased toks — an aliased bgs column
        // here re-evaluated the whole bigram build per exploded
        // element (40 s vs ~1 s at sf0.1). No size>0 filter either:
        // explode drops empty arrays, and a pre-filter is pushed below
        // the projection where it re-evaluates the expression again.
        val bigrams =
          when(size(col("toks")) >= 2,
            array_distinct(
              transform(sequence(lit(1), size(col("toks")) - 1), i =>
                concat_ws(" ", element_at(col("toks"), i),
                  element_at(col("toks"), i + 1)))))
            .otherwise(array().cast("array<string>"))
        val posts = docs(s, d)
          .select(col("doc_id"), words(col("text")).as("toks"))
          .select(col("doc_id"), explode(bigrams).as("bg"))
        val dfc = posts.groupBy(col("bg"))
          .agg(count(lit(1)).as("bg_df"))
        posts.join(dfc, "bg")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            count(when(col("bg_df") === 1L, 1)).as("n_novel"))
          .withColumn("novelty", col("n_novel").cast("double") /
            col("n_bigrams").cast("double"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks
          FROM documents),
        b AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(toks)), i ->
              toks[i] || ' ' || toks[i+1])) AS bgs
          FROM t WHERE len(toks) >= 2),
        posts AS (
          SELECT doc_id, unnest(bgs) AS bg FROM b WHERE len(bgs) > 0),
        dfc AS (
          SELECT bg, cast(count(*) as bigint) AS bg_df
          FROM posts GROUP BY bg)
        SELECT p.doc_id,
          cast(count(*) as bigint) AS n_bigrams,
          cast(count(*) FILTER (WHERE d.bg_df = 1) as bigint) AS n_novel,
          cast(count(*) FILTER (WHERE d.bg_df = 1) as double) /
            cast(count(*) as double) AS novelty
        FROM posts p JOIN dfc d USING (bg)
        GROUP BY p.doc_id
        ORDER BY p.doc_id"""),
      bench = true),

    // ------------------------------------------------------------------
    // PII redaction cross-engine fixture: x12 hash-verifies the
    // zero-match case (the corpus is PII-free), so Java-vs-RE2
    // divergence on \b or class semantics could hide there. This query
    // runs the SAME pattern chain over an inline corpus of synthetic
    // PII (every class, plus near-miss negatives) in BOTH engines and
    // hash-compares counts and the redacted text itself.
    // ------------------------------------------------------------------
    "x14_pii_fixture" -> Q(
      (s, d) => {
        import s.implicits._
        val fixture = piiFixture.toDF("doc_id", "text")
        val counted = piiPatterns.foldLeft(fixture) {
          case (acc, (name, pat)) =>
            acc.withColumn(s"n_$name",
              size(regexp_extract_all(col("text"), lit(pat), lit(0)))
                .cast("bigint"))
        }
        counted
          .withColumn("redacted", redactPii(col("text")))
          .drop("text")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH fixture(doc_id, text) AS (VALUES
          ${piiFixture.map { case (id, t) =>
            s"(cast($id as bigint), '${t.replace("'", "''")}')"
          }.mkString(",\n          ")})
        SELECT doc_id,
          cast(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) as bigint) AS n_email,
          cast(len(regexp_extract_all(text, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) as bigint) AS n_phone,
          cast(len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) as bigint) AS n_ipv4,
          cast(len(regexp_extract_all(text, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) as bigint) AS n_ssn,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<email>', 'g'),
            '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<phone>', 'g'),
            '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<ipv4>', 'g'),
            '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<ssn>', 'g') AS redacted
        FROM fixture
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Dedup KEEP-LIST — the end product a curation pipeline actually
    // consumes: every document with its cluster representative and a
    // keep/drop verdict (keep = the cluster's min doc_id; singletons
    // keep themselves). Composes d07's clustering with a left join back
    // to the corpus. Pair-gen is the bounded all-pairs oracle twin
    // (window doc_id < 1000, same as d07); at scale candidates come
    // from d03/d08 and the rest of this plan is unchanged.
    // ------------------------------------------------------------------
    "d09_dedup_keeplist" -> Q(
      (s, d) => {
        val base = docShingles(s, d).filter(col("doc_id") < 1000)
        val a = base.select(col("doc_id").as("doc_a"), col("w").as("wa"))
        val b = base.select(col("doc_id").as("doc_b"), col("w").as("wb"))
        val pairs = a.join(b, col("doc_a") < col("doc_b"))
          .withColumn("jaccard",
            size(array_intersect(col("wa"), col("wb"))).cast("double") /
              size(array_union(col("wa"), col("wb"))).cast("double"))
          .filter(col("jaccard") >= 0.4)
          .select(col("doc_a"), col("doc_b"))
        val cc = graft.operators.ConnectedComponents.components(pairs)
        docs(s, d).filter(col("doc_id") < 1000).select(col("doc_id"))
          .join(cc, col("doc_id") === col("id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster"), col("doc_id")).as("cluster"))
          .withColumn("keep", col("doc_id") === col("cluster"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE t0 AS (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents WHERE doc_id < 1000),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS w
          FROM t0),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE cast(len(list_intersect(a.w, b.w)) as double) /
                cast(len(list_distinct(list_concat(a.w, b.w))) as double) >= 0.4),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        cc AS (
          SELECT src AS doc_id, least(src, min(dst)) AS cluster
          FROM reach GROUP BY src)
        SELECT d.doc_id,
          coalesce(cc.cluster, d.doc_id) AS cluster,
          d.doc_id = coalesce(cc.cluster, d.doc_id) AS keep
        FROM (SELECT doc_id FROM documents WHERE doc_id < 1000) d
        LEFT JOIN cc ON cc.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // ------------------------------------------------------------------
    // Dedup SAVINGS report — the operational readout every dedup run
    // emits before anyone deletes anything: per source, how many docs
    // and how many TOKENS survive the near-dup keep-list, and what
    // fraction of the source's token budget was duplicate weight.
    // (Near-dup, not md5-exact: this corpus contains zero byte-exact
    // duplicates — checked — so an exact-dedup savings report would be
    // all zeros; the shingle-level near-dups are where the duplicate
    // weight actually lives, as in any real crawl.) The keep-list is
    // the AT-SCALE one — d08's df-capped posting index → exact-Jaccard
    // verify → CC cluster reps (p01 stage 2's machinery, full corpus,
    // no all-pairs, no window) — and the keeper is the GLOBAL cluster
    // min, so a source whose duplicates' keepers live in ANOTHER
    // source loses them here: cross-source dedup attribution, the
    // per-source face of d18's overlap audit (d18 predicts which
    // sources share content; this measures who pays when the shared
    // copies collapse). Token counts ride the original tokenize —
    // never a second pass.
    // ------------------------------------------------------------------
    "x30_dedup_savings" -> Q(
      (s, d) => {
        val toked = docs(s, d).select(col("source"), col("doc_id"),
          words(col("text")).as("w"))
          .withColumn("n_toks", size(col("w")).cast("long"))
        val pairs = postingJaccardPairsFrom(
          toked.filter(size(col("w")) >= 3)
            .select(col("doc_id"), col("w").as("toks")))
          .select(col("doc_a"), col("doc_b"))
        val cc = graft.operators.ConnectedComponents.components(pairs)
        toked.join(cc, col("doc_id") === col("id"), "left")
          .withColumn("keep",
            coalesce(col("cluster"), col("doc_id")) === col("doc_id"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("keep"), 1)).as("n_kept"),
            sum(col("n_toks")).as("tokens"),
            coalesce(sum(when(col("keep"), col("n_toks"))), lit(0L))
              .as("tokens_kept"))
          .withColumn("dup_token_pct",
            (col("tokens") - col("tokens_kept")).cast("double") /
              col("tokens").cast("double"))
          .orderBy(col("source"))
      },
      Some("""WITH RECURSIVE t0 AS (
          SELECT source, doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'),
              '\s+') AS w
          FROM documents),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sw
          FROM t0 WHERE len(w) >= 3),
        dposts AS (SELECT doc_id, unnest(sw) AS fp FROM sh),
        dfc AS (SELECT fp, count(*) AS df FROM dposts GROUP BY fp),
        okposts AS (
          SELECT p.doc_id, p.fp FROM dposts p
          JOIN dfc ON dfc.fp = p.fp AND dfc.df <= 50),
        dsizes AS (
          SELECT doc_id, cast(count(*) as bigint) AS sz
          FROM okposts GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            cast(count(*) as bigint) AS shared_fps
          FROM okposts a
          JOIN okposts b ON b.fp = a.fp AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
        prs AS (
          SELECT s.doc_a, s.doc_b
          FROM shared s
          JOIN dsizes x ON x.doc_id = s.doc_a
          JOIN dsizes y ON y.doc_id = s.doc_b
          WHERE cast(s.shared_fps as double) /
                cast(x.sz + y.sz - s.shared_fps as double) >= 0.4),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM prs
          UNION SELECT doc_b, doc_a FROM prs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        ccx AS (
          SELECT src AS doc_id, least(src, min(dst)) AS cluster
          FROM reach GROUP BY src),
        flagged AS (
          SELECT t0.source, t0.doc_id,
            cast(len(t0.w) as bigint) AS n_toks,
            coalesce(ccx.cluster, t0.doc_id) = t0.doc_id AS keep
          FROM t0 LEFT JOIN ccx ON ccx.doc_id = t0.doc_id)
        SELECT source,
          cast(count(*) as bigint) AS n_docs,
          cast(count(*) FILTER (WHERE keep) as bigint) AS n_kept,
          cast(sum(n_toks) as bigint) AS tokens,
          cast(coalesce(sum(n_toks) FILTER (WHERE keep), 0) as bigint)
            AS tokens_kept,
          cast(cast(sum(n_toks) as bigint) -
              cast(coalesce(sum(n_toks) FILTER (WHERE keep), 0)
                as bigint) as double) /
            cast(cast(sum(n_toks) as bigint) as double) AS dup_token_pct
        FROM flagged
        GROUP BY source
        ORDER BY source""")),

    // ------------------------------------------------------------------
    // SOFT dedup — weight, don't delete: each document keeps a
    // training weight of 1e6 div cluster_size ppm (singletons 1e6), so
    // a 4-copy cluster contributes ~one document's worth of gradient
    // instead of 4× (the repetition-hurts result of Lee et al. 2022
    // without hard deletion's coverage risk). Clusters come from the
    // AT-SCALE path (x30's df-capped posting index → Jaccard verify →
    // connected components — no all-pairs); cluster size is a count
    // over a cluster-keyed window (doc-scale keys, never a global
    // sort), and the weight is integer div — exact in both engines.
    // Output: the cluster-size histogram with raw vs weighted token
    // mass — the "what does soft dedup cost me" readout next to x30's
    // hard-delete savings.
    // ------------------------------------------------------------------
    "d19_soft_dedup_weights" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toked = docs(s, d)
          .select(col("doc_id"), words(col("text")).as("w"))
          .withColumn("n_toks", size(col("w")).cast("long"))
        val pairs = postingJaccardPairsFrom(
          toked.filter(size(col("w")) >= 3)
            .select(col("doc_id"), col("w").as("toks")))
          .select(col("doc_a"), col("doc_b"))
        val cc = graft.operators.ConnectedComponents.components(pairs)
        toked.join(cc, col("doc_id") === col("id"), "left")
          .select(col("doc_id"), col("n_toks"),
            coalesce(col("cluster"), col("doc_id")).as("cluster"))
          .withColumn("cl_size",
            count(lit(1)).over(Window.partitionBy(col("cluster"))))
          .withColumn("w_ppm", expr("1000000 div cl_size"))
          .groupBy(col("cl_size"))
          .agg(countDistinct(col("cluster")).as("n_clusters"),
            count(lit(1)).as("n_docs"),
            sum(col("n_toks")).as("tokens"),
            sum(col("n_toks") * col("w_ppm")).as("weighted_tokens_ppm"))
          .orderBy(col("cl_size"))
      },
      Some("""WITH RECURSIVE t0 AS (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'),
              '\s+') AS w
          FROM documents),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sw
          FROM t0 WHERE len(w) >= 3),
        dposts AS (SELECT doc_id, unnest(sw) AS fp FROM sh),
        dfc AS (SELECT fp, count(*) AS df FROM dposts GROUP BY fp),
        okposts AS (
          SELECT p.doc_id, p.fp FROM dposts p
          JOIN dfc ON dfc.fp = p.fp AND dfc.df <= 50),
        dsizes AS (
          SELECT doc_id, cast(count(*) as bigint) AS sz
          FROM okposts GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            cast(count(*) as bigint) AS shared_fps
          FROM okposts a
          JOIN okposts b ON b.fp = a.fp AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
        prs AS (
          SELECT s.doc_a, s.doc_b
          FROM shared s
          JOIN dsizes x ON x.doc_id = s.doc_a
          JOIN dsizes y ON y.doc_id = s.doc_b
          WHERE cast(s.shared_fps as double) /
                cast(x.sz + y.sz - s.shared_fps as double) >= 0.4),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM prs
          UNION SELECT doc_b, doc_a FROM prs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        ccx AS (
          SELECT src AS doc_id, least(src, min(dst)) AS cluster
          FROM reach GROUP BY src),
        wc AS (
          SELECT t0.doc_id, cast(len(t0.w) as bigint) AS n_toks,
            coalesce(ccx.cluster, t0.doc_id) AS cluster
          FROM t0 LEFT JOIN ccx ON ccx.doc_id = t0.doc_id),
        ws AS (
          SELECT doc_id, n_toks, cluster,
            cast(count(*) OVER (PARTITION BY cluster) as bigint) AS cl_size
          FROM wc)
        SELECT cl_size,
          cast(count(DISTINCT cluster) as bigint) AS n_clusters,
          cast(count(*) as bigint) AS n_docs,
          cast(sum(n_toks) as bigint) AS tokens,
          cast(sum(n_toks * (1000000 // cl_size)) as bigint)
            AS weighted_tokens_ppm
        FROM ws GROUP BY cl_size ORDER BY cl_size""")),

    // ------------------------------------------------------------------
    // INCREMENTAL cluster maintenance — when a new drop arrives, do
    // NOT re-cluster the corpus: run connected components on the
    // CONTRACTED graph. Day-0 (sources src0-15) clusters once; the
    // incremental step maps every new-vs-old candidate pair's old
    // endpoint to its stored cluster REP and runs CC over (rep, new)
    // ∪ (new, new) edges only — a graph of reps + new docs, not of
    // documents. Because each rep is the MIN of its members, the
    // contracted component's min equals the true global min, so the
    // merged labels are exactly the from-scratch labels. THE ORACLE IS
    // THE PROOF: DuckDB re-clusters the FULL corpus from scratch
    // (transitive closure over all pairs), and the hash match IS the
    // merge ≡ recompute theorem (q76's pattern, for graphs). Pair
    // generation uses the full-corpus df-capped posting index on both
    // paths (df stats are maintainable incrementally; recomputed here)
    // so the two pair sets coincide by construction. Output: the final
    // multi-doc cluster census with each cluster's new-doc count.
    // ------------------------------------------------------------------
    "d20_incremental_clusters" -> Q(
      (s, d) => {
        val isNew = col("source")
          .isin("src16", "src17", "src18", "src19")
        val toked = docs(s, d)
          .select(col("doc_id"), isNew.as("is_new"),
            words(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
        val pairs = postingJaccardPairsFrom(
          toked.select(col("doc_id"), col("toks")))
          .select(col("doc_a"), col("doc_b")).localCheckpoint()
        val newIds = docs(s, d).filter(isNew)
          .select(col("doc_id")).localCheckpoint()
        // day-0: components over old-old pairs only
        val oldPairs = pairs
          .join(newIds.select(col("doc_id").as("doc_a")), Seq("doc_a"),
            "left_anti")
          .join(newIds.select(col("doc_id").as("doc_b")), Seq("doc_b"),
            "left_anti")
        val day0 = graft.operators.ConnectedComponents
          .components(oldPairs.select(col("doc_a"), col("doc_b")))
          .select(col("id"), col("cluster")).localCheckpoint()
        // incremental: pairs touching a new doc, old side contracted
        // to its stored rep
        val incPairs = pairs
          .join(newIds.select(col("doc_id").as("doc_a"))
            .withColumn("a_new", lit(true)), Seq("doc_a"), "left")
          .join(newIds.select(col("doc_id").as("doc_b"))
            .withColumn("b_new", lit(true)), Seq("doc_b"), "left")
          .filter(col("a_new").isNotNull || col("b_new").isNotNull)
          .join(day0.select(col("id").as("doc_a"),
            col("cluster").as("ra")), Seq("doc_a"), "left")
          .join(day0.select(col("id").as("doc_b"),
            col("cluster").as("rb")), Seq("doc_b"), "left")
          .select(coalesce(col("ra"), col("doc_a")).as("na"),
            coalesce(col("rb"), col("doc_b")).as("nb"))
          .filter(col("na") =!= col("nb"))
        val merged = graft.operators.ConnectedComponents
          .components(incPairs.select(col("na"), col("nb")))
          .select(col("id").as("node"), col("cluster").as("mlbl"))
          .localCheckpoint()
        // final label per doc: old docs go day-0 rep → merged label of
        // that rep; new docs take their merged label; untouched keep
        // themselves
        val assigned = docs(s, d).select(col("doc_id"), isNew.as("nw"))
          .join(day0.select(col("id").as("doc_id"),
            col("cluster").as("r0")), Seq("doc_id"), "left")
          .withColumn("pre", coalesce(col("r0"), col("doc_id")))
          .join(merged.select(col("node").as("pre"), col("mlbl")),
            Seq("pre"), "left")
          .select(col("doc_id"), col("nw"),
            coalesce(col("mlbl"), col("pre")).as("cluster"))
        assigned.groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("nw"), 1)).as("n_new"))
          .filter(col("n_docs") >= 2)
          .orderBy(col("cluster"))
      },
      Some("""WITH RECURSIVE t0 AS (
          SELECT doc_id,
            source IN ('src16','src17','src18','src19') AS is_new,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'),
              '\s+') AS w
          FROM documents),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sw
          FROM t0 WHERE len(w) >= 3),
        dposts AS (SELECT doc_id, unnest(sw) AS fp FROM sh),
        dfc AS (SELECT fp, count(*) AS df FROM dposts GROUP BY fp),
        okposts AS (
          SELECT p.doc_id, p.fp FROM dposts p
          JOIN dfc ON dfc.fp = p.fp AND dfc.df <= 50),
        dsizes AS (
          SELECT doc_id, cast(count(*) as bigint) AS sz
          FROM okposts GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            cast(count(*) as bigint) AS shared_fps
          FROM okposts a
          JOIN okposts b ON b.fp = a.fp AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
        prs AS (
          SELECT s.doc_a, s.doc_b
          FROM shared s
          JOIN dsizes x ON x.doc_id = s.doc_a
          JOIN dsizes y ON y.doc_id = s.doc_b
          WHERE cast(s.shared_fps as double) /
                cast(x.sz + y.sz - s.shared_fps as double) >= 0.4),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM prs
          UNION SELECT doc_b, doc_a FROM prs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        ccx AS (
          SELECT src AS doc_id, least(src, min(dst)) AS cluster
          FROM reach GROUP BY src),
        assigned AS (
          SELECT t0.doc_id, t0.is_new,
            coalesce(ccx.cluster, t0.doc_id) AS cluster
          FROM t0 LEFT JOIN ccx ON ccx.doc_id = t0.doc_id)
        SELECT cluster, cast(count(*) as bigint) AS n_docs,
          cast(count(*) FILTER (WHERE is_new) as bigint) AS n_new
        FROM assigned GROUP BY cluster HAVING count(*) >= 2
        ORDER BY cluster""")),

    // ------------------------------------------------------------------
    // Containment at SCALE — closes d06's documented gap ("the scale
    // path is LSH"): the same df-capped posting index d08 runs for
    // Jaccard, with the asymmetric formula shared / min(|A'|, |B'|)
    // over the PRUNED shingle universe (primes stay primed: a doc
    // whose shingles are all ubiquitous has no indexed shingles and
    // correctly produces no candidates — the pruned-universe semantic,
    // stated as such; d06 remains the bounded exact-universe twin).
    // Catches quotation/subset duplication that symmetric Jaccard
    // dilutes, without an all-pairs join at any scale.
    // ------------------------------------------------------------------
    "d21_containment_scaled" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tokd = docs(s, d)
          .select(col("doc_id"), words(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
        val posts = tokd.select(col("doc_id"),
          explode(shingles3(col("toks"))).as("fp"))
        val okPosts = posts
          .withColumn("df",
            count(lit(1)).over(Window.partitionBy(col("fp"))))
          .filter(col("df") <= 50)
          .select(col("doc_id"), col("fp"))
        val sizes = okPosts.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("sz"))
        winnowCandidatePairs(okPosts, minShared = 1, maxDf = 50)
          .join(sizes.select(col("doc_id").as("doc_a"),
            col("sz").as("sz_a")), "doc_a")
          .join(sizes.select(col("doc_id").as("doc_b"),
            col("sz").as("sz_b")), "doc_b")
          .withColumn("containment", col("shared_fps").cast("double") /
            least(col("sz_a"), col("sz_b")).cast("double"))
          .filter(col("containment") >= 0.5)
          .select(col("doc_a"), col("doc_b"), col("containment"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH t0 AS (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'),
              '\s+') AS w
          FROM documents),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sw
          FROM t0 WHERE len(w) >= 3),
        dposts AS (SELECT doc_id, unnest(sw) AS fp FROM sh),
        dfc AS (SELECT fp, count(*) AS df FROM dposts GROUP BY fp),
        okposts AS (
          SELECT p.doc_id, p.fp FROM dposts p
          JOIN dfc ON dfc.fp = p.fp AND dfc.df <= 50),
        dsizes AS (
          SELECT doc_id, cast(count(*) as bigint) AS sz
          FROM okposts GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            cast(count(*) as bigint) AS shared_fps
          FROM okposts a
          JOIN okposts b ON b.fp = a.fp AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT s.doc_a, s.doc_b,
          cast(s.shared_fps as double) /
            cast(least(x.sz, y.sz) as double) AS containment
        FROM shared s
        JOIN dsizes x ON x.doc_id = s.doc_a
        JOIN dsizes y ON y.doc_id = s.doc_b
        WHERE cast(s.shared_fps as double) /
              cast(least(x.sz, y.sz) as double) >= 0.5
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // Substring-span dedup that EMITS the cleaned corpus (Lee et al.,
    // "Deduplicating Training Data Makes Language Models Better" — the
    // operator d13 measures toward): positions covered by a cross-doc
    // 20-gram (df >= 2 over distinct docs, d13's definition) are merged
    // into maximal spans (two covering grams whose starts differ by
    // <= L overlap/abut, so islands break exactly where the start gap
    // exceeds L — a lag-window flag + running sum, no interval
    // self-join), the spans are CUT, and each document is rewritten as
    // the ordered concatenation of its kept segments. Output is the
    // full rewrite audit: span count, removed chars, cleaned length
    // (orig_len = cleaned_len + removed_chars by construction), the
    // md5 of the WHOLE rewritten text (the oracle hash-verifies every
    // byte of the emitted corpus, not a statistic of it) and an 80-char
    // sample. Scale shape: char-scale explode (same cost class as d13),
    // one gram-keyed distinct + df filter, one gram-keyed join back,
    // then everything is doc-keyed windows/aggs whose per-doc state is
    // bounded by document length — the same bound as holding the text
    // column itself. No all-pairs anywhere.
    // ------------------------------------------------------------------
    "d22_span_dedup_rewrite" -> Q(
      (s, d) => spanCleanedDocs(s, d)
        .select(col("doc_id"), col("orig_len"), col("n_spans"),
          col("removed_chars"), col("cleaned_len"),
          md5(col("ctext")).as("cleaned_md5"),
          substring(col("ctext"), 1, 80).as("cleaned_head"))
        .orderBy(col("doc_id")),
      Some(spanCleanedSqlCtes + """
        SELECT doc_id, orig_len, n_spans, removed_chars, cleaned_len,
          md5(ctext) AS cleaned_md5,
          substr(ctext, 1, 80) AS cleaned_head
        FROM percleaned
        ORDER BY doc_id"""),
      bench = true),

    // ------------------------------------------------------------------
    // Before/after census of the d22 rewrite — the corpus-level
    // token-mass accounting a curation run reports after the cut:
    // docs affected, spans cut, char mass removed, and whitespace-token
    // mass before vs after (cut points can fuse adjacent tokens, so
    // token mass is NOT derivable from char counts — it is recomputed
    // on the rewritten text). Fractions are double divisions of exact
    // integers < 2^53 — bit-identical across engines.
    // ------------------------------------------------------------------
    "d23_span_dedup_census" -> Q(
      (s, d) => {
        def toks(c: Column): Column = {
          val trimmed = regexp_replace(c, "^\\s+|\\s+$", "")
          when(length(trimmed) === 0, lit(0L))
            .otherwise(size(split(trimmed, "\\s+")).cast("bigint"))
        }
        spanCleanedDocs(s, d)
          .select(col("orig_len"), col("n_spans"), col("removed_chars"),
            col("cleaned_len"), toks(col("t")).as("tb"),
            toks(col("ctext")).as("ta"))
          .agg(count(lit(1)).as("docs_total"),
            sum(when(col("n_spans") > 0, 1L).otherwise(0L))
              .as("docs_affected"),
            sum(col("n_spans")).as("spans_total"),
            sum(col("orig_len")).as("chars_total"),
            sum(col("removed_chars")).as("chars_removed"),
            sum(col("tb")).as("tokens_before"),
            sum(col("ta")).as("tokens_after"))
          .withColumn("char_frac_removed",
            col("chars_removed").cast("double") /
              col("chars_total").cast("double"))
          .withColumn("token_frac_removed",
            (col("tokens_before") - col("tokens_after")).cast("double") /
              col("tokens_before").cast("double"))
          .orderBy(col("docs_total"))
      },
      Some(spanCleanedSqlCtes + """,
        toked AS (
          SELECT orig_len, n_spans, removed_chars, cleaned_len,
            CASE WHEN length(regexp_replace(t, '^\s+|\s+$', '', 'g')) = 0
              THEN 0 ELSE len(string_split_regex(
                regexp_replace(t, '^\s+|\s+$', '', 'g'), '\s+')) END AS tb,
            CASE WHEN length(regexp_replace(ctext, '^\s+|\s+$', '', 'g')) = 0
              THEN 0 ELSE len(string_split_regex(
                regexp_replace(ctext, '^\s+|\s+$', '', 'g'), '\s+')) END AS ta
          FROM percleaned),
        census AS (
          SELECT cast(count(*) as bigint) AS docs_total,
            cast(sum(CASE WHEN n_spans > 0 THEN 1 ELSE 0 END) as bigint)
              AS docs_affected,
            cast(sum(n_spans) as bigint) AS spans_total,
            cast(sum(orig_len) as bigint) AS chars_total,
            cast(sum(removed_chars) as bigint) AS chars_removed,
            cast(sum(tb) as bigint) AS tokens_before,
            cast(sum(ta) as bigint) AS tokens_after
          FROM toked)
        SELECT docs_total, docs_affected, spans_total, chars_total,
          chars_removed, tokens_before, tokens_after,
          cast(chars_removed as double) / cast(chars_total as double)
            AS char_frac_removed,
          cast(tokens_before - tokens_after as double) /
            cast(tokens_before as double) AS token_frac_removed
        FROM census
        ORDER BY docs_total""")),

    // ------------------------------------------------------------------
    // Vocabulary DRIFT detection — the data-quality monitor an ingest
    // pipeline runs on every drop (p02's split: history src0-15 vs
    // incoming src16-19): per word, a two-proportion z>2 test decided
    // WITHOUT floats via e19's cross-multiplied integer rearrangement
    //   (c1·n2 − c2·n1)²·N > 4·n1·n2·C·(N−C)
    // (DECIMAL(38) / HUGEINT — same exact integers, same flag), with
    // Apriori-style support gating (c1+c2 ≥ 30) and ranking by the
    // cross-difference |c1·n2 − c2·n1| — the unnormalized drift
    // magnitude, exact in int64 (a signed scaled ratio would hit the
    // Spark-div-truncates vs DuckDB-//-floors divergence on negative
    // values; the abs cross-product avoids division entirely). Scale
    // shape: ONE tokenize pass, one word-keyed count agg with
    // map-side partials, a 1-row totals broadcast; the test arithmetic
    // is row-local over vocabulary-scale rows.
    // ------------------------------------------------------------------
    "x31_vocab_drift" -> Q(
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val incoming = col("source")
          .isin("src16", "src17", "src18", "src19")
        val w0 = docs(s, d)
          .select(incoming.as("inc"), explode(words(col("text"))).as("w"))
        val counts = w0.groupBy(col("w"))
          .agg(count(when(!col("inc"), 1)).as("c1"),
            count(when(col("inc"), 1)).as("c2"))
        val tot = counts.agg(sum(col("c1")).as("n1"),
          sum(col("c2")).as("n2"))
        def d38(c: Column) = c.cast(DecimalType(38, 0))
        val diff = col("c1") * col("n2") - col("c2") * col("n1")
        counts.filter(col("c1") + col("c2") >= 30)
          .crossJoin(broadcast(tot))
          .withColumn("cross_diff", abs(diff))
          .withColumn("significant",
            d38(diff) * d38(diff) * d38(col("n1") + col("n2")) >
              lit(4) * d38(col("n1")) * d38(col("n2")) *
                d38(col("c1") + col("c2")) *
                (d38(col("n1") + col("n2")) -
                  d38(col("c1") + col("c2"))))
          .select(col("w").as("word"), col("c1").as("c_hist"),
            col("c2").as("c_new"), col("cross_diff"), col("significant"))
          .orderBy(col("cross_diff").desc, col("word"))
          .limit(20)
      },
      Some("""WITH w0 AS (
          SELECT source IN ('src16','src17','src18','src19') AS inc,
            unnest(string_split_regex(
              regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS w
          FROM documents),
        counts AS (
          SELECT w,
            cast(count(*) FILTER (WHERE NOT inc) as bigint) AS c1,
            cast(count(*) FILTER (WHERE inc) as bigint) AS c2
          FROM w0 GROUP BY w),
        tot AS (
          SELECT cast(sum(c1) as bigint) AS n1,
            cast(sum(c2) as bigint) AS n2
          FROM counts),
        f AS (
          SELECT c.w, c.c1, c.c2,
            abs(c.c1 * t.n2 - c.c2 * t.n1) AS xd,
            (cast(c.c1 * t.n2 - c.c2 * t.n1 as hugeint) *
             cast(c.c1 * t.n2 - c.c2 * t.n1 as hugeint) *
             cast(t.n1 + t.n2 as hugeint)) >
            (4 * cast(t.n1 as hugeint) * cast(t.n2 as hugeint) *
             cast(c.c1 + c.c2 as hugeint) *
             cast(t.n1 + t.n2 - c.c1 - c.c2 as hugeint)) AS significant
          FROM counts c, tot t
          WHERE c.c1 + c.c2 >= 30)
        SELECT w AS word, c1 AS c_hist, c2 AS c_new,
          cast(xd as bigint) AS cross_diff, significant
        FROM f ORDER BY cross_diff DESC, word LIMIT 20""")),

    // ------------------------------------------------------------------
    // Cross-document BOILERPLATE detection (CCNet's per-domain pass,
    // Wenzek et al. 2020): a phrase appearing in a large fraction of
    // one SOURCE's documents is template chrome (nav bars, footers,
    // cookie banners), not content — and it survives every per-document
    // quality filter precisely because every document has it. Per
    // (source, bigram): document frequency within the source (distinct
    // per doc via array_distinct, so a doc repeating the phrase counts
    // once); boilerplate iff df covers >= 20% of the source's docs.
    // One tokenize pass; the (source, bigram) aggregation has map-side
    // partials and vocabulary-bounded cardinality; the per-source top
    // pick is a window over the few boilerplate survivors, partitioned
    // by source (a key that grows with domains, not corpus bytes —
    // never a global sort). The report is what a curation run strips
    // BEFORE dedup: boilerplate inflates shingle overlap between
    // unrelated pages of the same domain and poisons MinHash verdicts.
    // ------------------------------------------------------------------
    "x32_boilerplate_ngrams" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val bigrams = when(size(col("toks")) >= 2,
          array_distinct(transform(sequence(lit(1), size(col("toks")) - 1),
            i => concat_ws(" ", element_at(col("toks"), i),
              element_at(col("toks"), i + 1)))))
          .otherwise(array().cast("array<string>"))
        val tokd = docs(s, d)
          .select(col("doc_id"), col("source"), words(col("text")).as("toks"))
        // explode the EXPRESSION over the once-aliased toks (the fast
        // generate shape — exploding an aliased array re-evaluates it
        // per output element)
        val df = tokd
          .select(col("source"), explode(bigrams).as("sh"))
          .groupBy(col("source"), col("sh"))
          .agg(count(lit(1)).as("df"))
        val nDocs = docs(s, d).groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("df").desc, col("sh"))
        // top candidate reported UNGATED (with its coverage permille)
        // so the readout stays informative at every scale; the 20%
        // boilerplate gate only feeds the n_boiler count — at sf0.1
        // this corpus's max per-source coverage falls to ~13% and a
        // gated-only report would go empty (the sf0.01 hits were the
        // small-sample tail)
        df.join(nDocs, "source")
          .withColumn("rn", row_number().over(w))
          .groupBy(col("source"), col("n_docs"))
          .agg(count(when(col("df") * 5 >= col("n_docs"), 1))
            .as("n_boiler"),
            max(when(col("rn") === 1, col("sh"))).as("top_sh"),
            max(when(col("rn") === 1, col("df"))).as("top_df"),
            max(when(col("rn") === 1,
              expr("1000 * df div n_docs"))).as("top_permille"))
          .orderBy(col("source"))
      },
      Some("""WITH t AS (
          SELECT doc_id, source,
            string_split_regex(
              regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks
          FROM documents),
        g AS (
          SELECT source,
            unnest(list_distinct(CASE WHEN len(toks) >= 2 THEN
              list_transform(range(1, len(toks)), i ->
                toks[i] || ' ' || toks[i+1])
              ELSE [] END)) AS sh
          FROM t),
        df AS (SELECT source, sh, count(*) AS df FROM g GROUP BY 1, 2),
        nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        b AS (
          SELECT df.source, df.sh, df.df, nd.n_docs,
            row_number() OVER (PARTITION BY df.source
                               ORDER BY df.df DESC, df.sh) AS rn
          FROM df JOIN nd USING (source))
        SELECT source, n_docs,
          cast(count(*) FILTER (WHERE df * 5 >= n_docs) as bigint)
            AS n_boiler,
          max(CASE WHEN rn = 1 THEN sh END) AS top_sh,
          max(CASE WHEN rn = 1 THEN df END) AS top_df,
          max(CASE WHEN rn = 1 THEN cast(1000 * df // n_docs as bigint)
            END) AS top_permille
        FROM b GROUP BY source, n_docs ORDER BY source""")),

    // ------------------------------------------------------------------
    // Benchmark DECONTAMINATION — the n-gram-overlap check run before
    // training: count each corpus document's distinct 8-word grams that
    // also appear in a benchmark set (here: the deterministic pseudo-
    // benchmark doc_id % 97 = 0), and flag contamination. The benchmark
    // n-gram set is tiny and broadcasts; the corpus side is one explode
    // (fast generate shape) + doc_id-keyed aggregates — linear at
    // 100 TB. Both explodes use the expression-input generate shape.
    // ------------------------------------------------------------------
    "x15_decontamination" -> Q(
      (s, d) => {
        def grams8(toks: Column): Column =
          when(size(toks) >= 8,
            array_distinct(transform(sequence(lit(0), size(toks) - 8), i =>
              concat_ws(" ", (0 until 8).map(o =>
                element_at(toks, i + o + 1)): _*))))
            .otherwise(array().cast("array<string>"))
        val benchNg = docs(s, d).filter(col("doc_id") % 97 === 0)
          .select(col("doc_id"), words(col("text")).as("toks"))
          .select(explode(grams8(col("toks"))).as("ng"))
          .distinct()
        val corpusPosts = docs(s, d).filter(col("doc_id") % 97 =!= 0)
          .select(col("doc_id"), words(col("text")).as("toks"))
          .select(col("doc_id"), explode(grams8(col("toks"))).as("ng"))
        val perDoc = corpusPosts.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_ngrams"))
        val contaminated = corpusPosts.join(benchNg, "ng")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_contaminated"))
        docs(s, d).filter(col("doc_id") % 97 =!= 0).select(col("doc_id"))
          .join(perDoc, Seq("doc_id"), "left")
          .join(contaminated, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
            coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
          .withColumn("contamination_rate",
            when(col("n_ngrams") > 0,
              col("n_contaminated").cast("double") /
                col("n_ngrams").cast("double")).otherwise(lit(0.0)))
          .withColumn("contaminated",
            col("n_contaminated") >= 5 || col("contamination_rate") > 0.1)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents),
        ng AS (
          SELECT doc_id,
            CASE WHEN len(w) >= 8 THEN
              list_distinct(list_transform(range(1, len(w) - 6),
                i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3],
                  w[i+4], w[i+5], w[i+6], w[i+7])))
            ELSE [] END AS ngs
          FROM tok),
        bench AS (
          SELECT DISTINCT unnest(ngs) AS ng FROM ng WHERE doc_id % 97 = 0),
        posts AS (
          SELECT doc_id, unnest(ngs) AS ng FROM ng WHERE doc_id % 97 <> 0),
        per_doc AS (
          SELECT doc_id, cast(count(*) as bigint) AS n_ngrams
          FROM posts GROUP BY doc_id),
        contam AS (
          SELECT p.doc_id, cast(count(*) as bigint) AS n_contaminated
          FROM posts p JOIN bench b ON p.ng = b.ng
          GROUP BY p.doc_id)
        SELECT d.doc_id,
          coalesce(pd.n_ngrams, 0) AS n_ngrams,
          coalesce(c.n_contaminated, 0) AS n_contaminated,
          CASE WHEN coalesce(pd.n_ngrams, 0) > 0 THEN
            cast(coalesce(c.n_contaminated, 0) as double) /
              cast(pd.n_ngrams as double)
          ELSE 0.0 END AS contamination_rate,
          coalesce(c.n_contaminated, 0) >= 5 OR
            (CASE WHEN coalesce(pd.n_ngrams, 0) > 0 THEN
              cast(coalesce(c.n_contaminated, 0) as double) /
                cast(pd.n_ngrams as double)
            ELSE 0.0 END) > 0.1 AS contaminated
        FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
        LEFT JOIN per_doc pd ON pd.doc_id = d.doc_id
        LEFT JOIN contam c ON c.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // ------------------------------------------------------------------
    // Data-mixture PLAN — the sampling-rate computation a training run
    // does before reading anything: given target language shares and a
    // token/doc budget (half the corpus here), derive each language's
    // sampling rate min(1, share·budget/n) and expected yield. One
    // language-keyed aggregate + a literal targets table + a 1-row
    // broadcast total; all the arithmetic is exact-integer-ratio
    // doubles, so the plan is bit-identical cross-engine.
    // ------------------------------------------------------------------
    "x16_mixture_plan" -> Q(
      (s, d) => {
        import s.implicits._
        val targets = Seq(("en", 0.5), ("zh", 0.2), ("de", 0.1),
          ("fr", 0.1), ("es", 0.1)).toDF("lang", "target_share")
        val counts = docs(s, d).groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"))
        val total = counts.agg(sum(col("n_docs")).as("n_total"))
        counts.join(targets, "lang")
          .crossJoin(broadcast(total))
          .withColumn("budget", col("n_total").cast("double") * 0.5)
          .withColumn("rate",
            least(lit(1.0), col("target_share") * col("budget") /
              col("n_docs").cast("double")))
          .withColumn("expected_docs",
            floor(col("rate") * col("n_docs").cast("double")).cast("bigint"))
          .select(col("lang"), col("n_docs"), col("target_share"),
            col("rate"), col("expected_docs"))
          .orderBy(col("lang"))
      },
      Some("""WITH targets(lang, target_share) AS (VALUES
          ('en', 0.5), ('zh', 0.2), ('de', 0.1), ('fr', 0.1), ('es', 0.1)),
        counts AS (
          SELECT lang, cast(count(*) as bigint) AS n_docs
          FROM documents GROUP BY lang),
        total AS (SELECT cast(sum(n_docs) as bigint) AS n_total FROM counts)
        SELECT c.lang, c.n_docs,
          cast(t.target_share as double) AS target_share,
          least(1.0, cast(t.target_share as double) *
            (cast(n_total as double) * 0.5) / cast(c.n_docs as double))
            AS rate,
          cast(floor(least(1.0, cast(t.target_share as double) *
            (cast(n_total as double) * 0.5) / cast(c.n_docs as double)) *
            cast(c.n_docs as double)) as bigint) AS expected_docs
        FROM counts c JOIN targets t USING (lang), total
        ORDER BY lang""")),

    // ------------------------------------------------------------------
    // Deterministic TRAIN/VAL/TEST split — assignment by portable hash
    // of the doc id (h60 mod 100: <90 train, <95 val, else test), so
    // the split is stable across runs, engines and repartitions; output
    // is the per-(split, lang) census. Row-local hash + one small-key
    // aggregate; nothing here changes shape at 100 TB.
    // ------------------------------------------------------------------
    "x17_hash_split" -> Q(
      (s, d) => {
        val bucket = pmod(graft.functions.PortableHash.h60col(
          concat(lit("split_"), col("doc_id"))), lit(100L))
        docs(s, d)
          .withColumn("split",
            when(bucket < 90, "train").when(bucket < 95, "val")
              .otherwise("test"))
          .groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("split"), col("lang"))
      },
      Some("""WITH b AS (
          SELECT lang,
            ('0x' || substr(md5('split_' || doc_id), 1, 15))::BIGINT % 100
              AS bucket
          FROM documents)
        SELECT CASE WHEN bucket < 90 THEN 'train'
                    WHEN bucket < 95 THEN 'val'
                    ELSE 'test' END AS split,
          lang, cast(count(*) as bigint) AS n_docs
        FROM b
        GROUP BY 1, 2
        ORDER BY split, lang""")),

    // ------------------------------------------------------------------
    // SEMANTIC near-dup (SemDeDup-style): assign every embedding to its
    // nearest codebook centroid — the row-local zero-shuffle argmax of
    // assignToCodebook — then exact pairwise cosine ONLY within a
    // cluster. Clustering shrinks the pair space ~k-fold (15.5k of the
    // 125k all-pairs at sf0.01) at a measurable recall cost against the
    // exact d05 (20 of its 59 τ=0.4 pairs here — random centroids over
    // near-uniform synthetic vectors; real embedding spaces cluster far
    // tighter, and recall rises with k). The equi-join on cent_id keeps
    // the plan free of any data×data cross join; at 100 TB each cluster
    // sub-buckets again with s02's hyperplane LSH before pairing.
    // ------------------------------------------------------------------
    "d10_semantic_neardup" -> Q(
      (s, d) => {
        def dot(x: Column, y: Column): Column =
          graft.functions.VectorDot.dot(x, y)
        // norm hoisted to once-per-VECTOR (the oracle's own shape:
        // dot/nrm_a/nrm_b) — computing cosine(ea, eb) per pair would
        // re-derive both norms per PAIR, tripling the dominant
        // per-pair dot cost (measured 7.0 s → 3.6 s at sf0.1 in the
        // interpreted-HOF era; VectorDot keeps the same shape fused)
        val assigned = assignToCodebook(s, d)
          .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
        val a = assigned.select(col("cent_id"), col("vec_id").as("vec_a"),
          col("embedding").as("ea"), col("nrm").as("nrm_a"))
        val b = assigned.select(col("cent_id"), col("vec_id").as("vec_b"),
          col("embedding").as("eb"), col("nrm").as("nrm_b"))
        a.join(b, Seq("cent_id"))
          .filter(col("vec_a") < col("vec_b"))
          .withColumn("cos",
            dot(col("ea"), col("eb")) / col("nrm_a") / col("nrm_b"))
          .filter(col("cos") >= 0.4)
          .select(col("cent_id"), col("vec_a"), col("vec_b"), col("cos"))
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> cast(x as double)) AS v FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 8),
        asgn AS (
          SELECT vec_id, v, nrm, cent_id,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY list_dot_product(v, cv) / nrm / cnrm DESC, cent_id)
              AS rn
          FROM n, c),
        assigned AS (SELECT vec_id, v, nrm, cent_id FROM asgn WHERE rn = 1),
        pairs AS (
          SELECT a.cent_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
            list_dot_product(a.v, b.v) / a.nrm / b.nrm AS cos
          FROM assigned a
          JOIN assigned b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id)
        SELECT cent_id, vec_a, vec_b, cos FROM pairs
        WHERE cos >= 0.4
        ORDER BY vec_a, vec_b"""),
      bench = true),

    // ------------------------------------------------------------------
    // Train/test SPLIT-LEAKAGE audit — the eval-integrity check a
    // curation pipeline must run: near-duplicate pairs (d08's exact
    // posting-index detector) that straddle x17's deterministic hash
    // split. A test document with a train near-twin inflates eval —
    // the fix is dedup-BEFORE-split (d09's keep-list), and this query
    // is the regression check that proves it happened. Adds only two
    // row-local h60 projections and a filter on top of d08's plan.
    // ------------------------------------------------------------------
    "d11_split_leakage" -> Q(
      (s, d) => {
        def split(c: Column): Column = {
          val bucket = pmod(graft.functions.PortableHash.h60col(
            concat(lit("split_"), c)), lit(100L))
          when(bucket < 90, "train").when(bucket < 95, "val")
            .otherwise("test")
        }
        postingJaccardPairs(s, d)
          .withColumn("split_a", split(col("doc_a")))
          .withColumn("split_b", split(col("doc_b")))
          .filter(col("split_a") =!= col("split_b"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH t0 AS (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS w
          FROM t0 WHERE len(w) >= 3),
        posts AS (SELECT doc_id, unnest(w) AS fp FROM sh),
        dfc AS (SELECT fp, count(*) AS df FROM posts GROUP BY fp),
        okposts AS (
          SELECT p.doc_id, p.fp FROM posts p
          JOIN dfc ON dfc.fp = p.fp AND dfc.df <= 50),
        sizes AS (
          SELECT doc_id, cast(count(*) as bigint) AS sz
          FROM okposts GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            cast(count(*) as bigint) AS shared_fps
          FROM okposts a
          JOIN okposts b ON b.fp = a.fp AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
        pairs AS (
          SELECT s.doc_a, s.doc_b,
            cast(s.shared_fps as double) /
              cast(x.sz + y.sz - s.shared_fps as double) AS jaccard
          FROM shared s
          JOIN sizes x ON x.doc_id = s.doc_a
          JOIN sizes y ON y.doc_id = s.doc_b
          WHERE cast(s.shared_fps as double) /
                cast(x.sz + y.sz - s.shared_fps as double) >= 0.4),
        tagged AS (
          SELECT doc_a, doc_b, jaccard,
            CASE WHEN ('0x' || substr(md5('split_' || doc_a), 1, 15))::BIGINT % 100 < 90 THEN 'train'
                 WHEN ('0x' || substr(md5('split_' || doc_a), 1, 15))::BIGINT % 100 < 95 THEN 'val'
                 ELSE 'test' END AS split_a,
            CASE WHEN ('0x' || substr(md5('split_' || doc_b), 1, 15))::BIGINT % 100 < 90 THEN 'train'
                 WHEN ('0x' || substr(md5('split_' || doc_b), 1, 15))::BIGINT % 100 < 95 THEN 'val'
                 ELSE 'test' END AS split_b
          FROM pairs)
        SELECT doc_a, doc_b, jaccard, split_a, split_b
        FROM tagged
        WHERE split_a <> split_b
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // SEMANTIC near-dup, SCALED (d10's dial turned): the fix for d10's
    // fixed-k quadratic (sf1 decade 55× — k=8 means in-cluster
    // all-pairs is O(N²/8)). Three changes, each mirrored exactly in
    // the oracle so the whole scaled path stays hash-verified:
    //   1. k ∝ corpus: k = max(16, N/64) centroids (the first k
    //      vectors), so expected cluster size is a CONSTANT ~64 and
    //      total in-cluster pair work is linear in N.
    //   2. The codebook is a one-row BROADCAST relation, not plan
    //      literals (assignToCodebook's literal array carries k·dim
    //      literals — fine at k=8, plan-explosion at k=300+), and
    //      assignment is two-level: argmax over √k coarse centroids,
    //      then argmax over the picked cell's fine centroids — O(√k)
    //      dot products per row instead of O(k). The per-row fold is
    //      still zero-shuffle; the only data movement for assignment
    //      is one broadcast of the codebook row.
    //   3. Inside each cluster, candidates sub-bucket with h60-derived
    //      hyperplane LSH (4 tables × 4 planes, OR-construction like
    //      d03's bands): pairing joins on (cent_id, table, band), so
    //      bucket population — not cluster population — bounds the
    //      per-doc pair work. Candidate pairs then dedup on bare ids
    //      and join back to the plain scan for the exact cosine (no
    //      arrays ride the pair shuffle; d03's discipline).
    // Recall vs the exact d05 is the LSH tradeoff (a τ=0.4 pair crosses
    // 4 random hyperplanes with p≈0.16 per table → ~0.5 for 4 tables;
    // tight near-dups ≥0.9 are caught with p→1), the same contract as
    // s02/d03. Centroid derivation (fine×coarse argmax) is a
    // metadata-scale k×√k cross join — allowlisted in PlanAuditSpec.
    // ------------------------------------------------------------------
    "d12_semantic_scaled" -> Q(
      (s, d) => {
        def dot(x: Column, y: Column): Column =
          graft.functions.VectorDot.dot(x, y)
        val bandTables = 4
        val planes = 4
        val nVecs = emb(s, d).count() // metadata-scale scalar, like g01's N
        val k = math.max(16L, nVecs / 64L)
        val kc = math.ceil(math.sqrt(k.toDouble)).toLong
        val dim = emb(s, d).select(size(col("embedding"))).head.getInt(0)

        val base = emb(s, d)
          .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
        val fine = base.filter(col("vec_id") < k)
          .select(col("vec_id").as("cent_id"), col("embedding").as("ce"),
            col("nrm").as("cnrm"))
        val coarse = fine.filter(col("cent_id") < kc)
          .select(col("cent_id").as("coarse_id"), col("ce").as("cce"),
            col("cnrm").as("ccnrm"))

        // fine centroid -> coarse cell: argmax cosine, tie -> smallest
        // coarse_id (row_number mirrors the folds' strict-> semantics)
        val wf = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cent_id"))
          .orderBy(col("fc_cos").desc, col("coarse_id"))
        val f2c = fine.crossJoin(coarse)
          .withColumn("fc_cos",
            dot(col("ce"), col("cce")) / col("cnrm") / col("ccnrm"))
          .withColumn("rn", row_number().over(wf))
          .filter(col("rn") === 1)
          .select(col("coarse_id"), col("cent_id"), col("ce"), col("cnrm"))

        // ONE codebook row: sorted coarse array + map coarse_id -> its
        // cell's sorted fine centroids. collect_list order is
        // nondeterministic but array_sort on (unique id, ...) structs
        // restores a canonical order, and map lookup is order-blind.
        val cellsAgg = f2c
          .groupBy(col("coarse_id"))
          .agg(array_sort(collect_list(struct(col("cent_id"), col("ce"),
            col("cnrm")))).as("cell"))
          .agg(map_from_entries(collect_list(struct(col("coarse_id"),
            col("cell")))).as("cells"))
        val coarseAgg = coarse
          .agg(array_sort(collect_list(struct(col("coarse_id"),
            col("cce"), col("ccnrm")))).as("coarse_arr"))
        val codebook = coarseAgg.crossJoin(cellsAgg)

        // two-level row-local assignment over the broadcast codebook
        val assigned = base.crossJoin(broadcast(codebook))
          .withColumn("coarse_pick",
            aggregate(col("coarse_arr"),
              struct(lit(-2.0).as("sim"), lit(-1L).as("id")),
              (acc, c) => {
                val sim = dot(col("embedding"), c.getField("cce")) /
                  col("nrm") / c.getField("ccnrm")
                when(sim > acc.getField("sim"),
                  struct(sim.as("sim"), c.getField("coarse_id").as("id")))
                  .otherwise(acc)
              }).getField("id"))
          .withColumn("cent_id",
            aggregate(element_at(col("cells"), col("coarse_pick")),
              struct(lit(-2.0).as("sim"), lit(-1L).as("id")),
              (acc, c) => {
                val sim = dot(col("embedding"), c.getField("ce")) /
                  col("nrm") / c.getField("cnrm")
                when(sim > acc.getField("sim"),
                  struct(sim.as("sim"), c.getField("cent_id").as("id")))
                  .otherwise(acc)
              }).getField("id"))
          .select(col("vec_id"), col("cent_id"), col("embedding"))

        // in-cluster LSH sub-buckets: per band table, r sign bits of
        // h60-derived hyperplane projections (s02's construction, one
        // matrix per table). Banded rows carry ONLY ids + band key.
        val mat: Seq[Seq[Seq[Double]]] = (0 until bandTables).map(bt =>
          (0 until planes).map(p =>
            (0 until dim).map(i =>
              (graft.functions.PortableHash.h60(s"d12_${bt}_${p}_${i}")
                % 1000L).toDouble / 500.0 - 1.0)))
        val matC = typedLit(mat)
        val banded = assigned
          .select(col("vec_id"), col("cent_id"),
            posexplode(transform(sequence(lit(0), lit(bandTables - 1)),
              bt => {
                val tmat = element_at(matC, bt + 1)
                aggregate(sequence(lit(0), lit(planes - 1)), lit(0L),
                  (acc, p) => {
                    val proj = graft.functions.VectorDot.dot(
                      col("embedding"), element_at(tmat, p + 1))
                    acc.bitwiseOR(
                      when(proj > 0, shl(lit(1L), p)).otherwise(0L))
                  })
              })))
          .select(col("vec_id"), col("cent_id"), col("pos").as("btab"),
            col("col").as("bkt"))
        val cand = banded.as("l")
          .join(banded.as("r"), Seq("cent_id", "btab", "bkt"))
          .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"))
          .filter(col("vec_a") < col("vec_b"))
          .distinct()

        // exact cosine only for the deduped candidates, vectors fetched
        // from the plain scan (never through the pair shuffle)
        val vecs = base.select(col("vec_id"), col("embedding"), col("nrm"))
        cand
          .join(vecs.select(col("vec_id").as("vec_a"),
            col("embedding").as("ea"), col("nrm").as("nrm_a")), Seq("vec_a"))
          .join(vecs.select(col("vec_id").as("vec_b"),
            col("embedding").as("eb"), col("nrm").as("nrm_b")), Seq("vec_b"))
          .withColumn("cos",
            dot(col("ea"), col("eb")) / col("nrm_a") / col("nrm_b"))
          .filter(col("cos") >= 0.4)
          .select(col("vec_a"), col("vec_b"), col("cos"))
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> cast(x as double)) AS v FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        params AS (SELECT greatest(16, count(*) // 64) AS k,
            cast(ceil(sqrt(greatest(16, count(*) // 64))) as bigint) AS kc
          FROM embeddings),
        dim AS (SELECT max(len(v)) AS d FROM e),
        fine AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
          FROM n, params WHERE vec_id < k),
        coarse AS (SELECT cent_id AS coarse_id, cv AS ccv, cnrm AS ccnrm
          FROM fine, params WHERE cent_id < kc),
        f2c AS (
          SELECT coarse_id, cent_id, cv, cnrm FROM (
            SELECT c.coarse_id, f.cent_id, f.cv, f.cnrm,
              row_number() OVER (PARTITION BY f.cent_id
                ORDER BY list_dot_product(f.cv, c.ccv) / f.cnrm / c.ccnrm
                  DESC, c.coarse_id) AS rn
            FROM fine f, coarse c) WHERE rn = 1),
        ac AS (
          SELECT vec_id, coarse_id FROM (
            SELECT n.vec_id, c.coarse_id,
              row_number() OVER (PARTITION BY n.vec_id
                ORDER BY list_dot_product(n.v, c.ccv) / n.nrm / c.ccnrm
                  DESC, c.coarse_id) AS rn
            FROM n, coarse c) WHERE rn = 1),
        assigned AS (
          SELECT vec_id, cent_id FROM (
            SELECT n.vec_id, f.cent_id,
              row_number() OVER (PARTITION BY n.vec_id
                ORDER BY list_dot_product(n.v, f.cv) / n.nrm / f.cnrm
                  DESC, f.cent_id) AS rn
            FROM n JOIN ac ON ac.vec_id = n.vec_id
            JOIN f2c f ON f.coarse_id = ac.coarse_id) WHERE rn = 1),
        mat AS (
          SELECT t, p, list_transform(range(0, d), i ->
            cast(('0x' || substr(md5('d12_' || t || '_' || p || '_' || i), 1, 15))::BIGINT % 1000
              as double) / 500.0 - 1.0) AS pv
          FROM range(0, 4) tt(t), range(0, 4) pp(p), dim),
        pl AS (SELECT t, list(pv ORDER BY p) AS pvs FROM mat GROUP BY t),
        bnd AS (
          SELECT a.vec_id, a.cent_id, pl.t,
            cast(list_sum(list_transform(range(0, 4), p ->
              CASE WHEN list_dot_product(n.v, pvs[p+1]) > 0
                THEN (1::BIGINT << p) ELSE 0::BIGINT END)) as bigint) AS bkt
          FROM assigned a JOIN n ON n.vec_id = a.vec_id, pl),
        cand AS (
          SELECT DISTINCT la.vec_id AS vec_a, lb.vec_id AS vec_b
          FROM bnd la JOIN bnd lb
            ON la.cent_id = lb.cent_id AND la.t = lb.t
              AND la.bkt = lb.bkt AND la.vec_id < lb.vec_id)
        SELECT c.vec_a, c.vec_b,
          list_dot_product(a.v, b.v) / a.nrm / b.nrm AS cos
        FROM cand c
        JOIN n a ON a.vec_id = c.vec_a
        JOIN n b ON b.vec_id = c.vec_b
        WHERE list_dot_product(a.v, b.v) / a.nrm / b.nrm >= 0.4
        ORDER BY vec_a, vec_b"""),
      bench = true),

    // ------------------------------------------------------------------
    // Within-document REPETITION signals (the Gopher repetition
    // filters): duplicate-word fraction, duplicate-5-gram fraction and
    // top-word share, each an exact integer ratio (int→double casts are
    // exact, the division is correctly rounded — bit-identical in both
    // engines). Entirely row-local higher-order functions: no shuffle,
    // no UDF — the per-document cost is O(words²) on ≤~120-word docs
    // and the operator's shape is unchanged at 100 TB.
    // ------------------------------------------------------------------
    "x18_repetition_signals" -> Q(
      (s, d) => {
        val base = docs(s, d)
          .select(col("doc_id"), words(col("text")).as("toks"))
        // g5 aliased behind its own projection: multi-referenced below
        // (size + array_distinct), and an inlined transform would
        // re-evaluate per reference
        val g = base.select(
          col("doc_id"), col("toks"),
          when(size(col("toks")) >= 5,
            transform(sequence(lit(0), size(col("toks")) - 5), i =>
              concat_ws(" ", (0 until 5).map(o =>
                element_at(col("toks"), i + o + 1)): _*)))
            .otherwise(array().cast("array<string>")).as("g5"))
        g.select(
          col("doc_id"),
          size(col("toks")).cast("bigint").as("n_words"),
          ((size(col("toks")) - size(array_distinct(col("toks"))))
            .cast("double") / size(col("toks")).cast("double"))
            .as("dup_word_frac"),
          when(size(col("g5")) > 0,
            (size(col("g5")) - size(array_distinct(col("g5"))))
              .cast("double") / size(col("g5")).cast("double"))
            .otherwise(lit(0.0)).as("dup_5gram_frac"),
          (array_max(transform(array_distinct(col("toks")), w =>
            size(filter(col("toks"), t => t === w))))
            .cast("double") / size(col("toks")).cast("double"))
            .as("top_word_frac"))
          .withColumn("flagged",
            col("dup_5gram_frac") > 0.10 || col("top_word_frac") > 0.20)
          .orderBy(col("doc_id"))
      },
      Some("""WITH t0 AS (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents),
        g AS (
          SELECT doc_id, w,
            CASE WHEN len(w) >= 5 THEN
              list_transform(range(1, len(w) - 3), i ->
                concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))
            ELSE [] END AS g5
          FROM t0),
        sig AS (
          SELECT doc_id,
            cast(len(w) as bigint) AS n_words,
            cast(len(w) - len(list_distinct(w)) as double) /
              cast(len(w) as double) AS dup_word_frac,
            CASE WHEN len(g5) > 0 THEN
              cast(len(g5) - len(list_distinct(g5)) as double) /
                cast(len(g5) as double)
            ELSE 0.0 END AS dup_5gram_frac,
            cast(list_max(list_transform(list_distinct(w), x ->
              len(list_filter(w, y -> y = x)))) as double) /
              cast(len(w) as double) AS top_word_frac
          FROM g)
        SELECT doc_id, n_words, dup_word_frac, dup_5gram_frac,
          top_word_frac,
          dup_5gram_frac > 0.10 OR top_word_frac > 0.20 AS flagged
        FROM sig
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Count-min-sketch heavy hitters — the third member of the sketch
    // family (q32 HLL distinct, q67 KMV distinct): a depth-4 ×
    // width-1024 CMS over the token stream, probed with the exact
    // top-20 words so the oracle verifies estimate ≥ exact and the
    // overcount. Hash rows are the portable h60/mod-P arithmetic
    // (PortableHash), so DuckDB re-derives the whole sketch.
    //
    // Shape: the sketch is built FROM the per-word exact counts, not
    // from raw token occurrences — CMS cells are additive, so bucketing
    // the aggregated counts yields the identical sketch with ONE
    // tokenize pass and one data-sized shuffle (on w); everything after
    // is vocabulary-scale, and both consumers of `counts` (sketch and
    // top-k) share the same groupBy exchange (ReuseExchange). Sketch
    // state is 4096 rows regardless of corpus size and cells merge by
    // addition — the property that makes CMS the 100 TB tool.
    // ------------------------------------------------------------------
    "x19_cms_heavy_hitters" -> Q(
      (s, d) => {
        import graft.functions.PortableHash.{P, h60, h60col}
        val width = 1024L
        val depth = 4
        val as = (0 until depth).map(i => h60("cms_a_" + i) % (P - 1) + 1)
        val bs = (0 until depth).map(i => h60("cms_b_" + i) % P)
        def buckets(hw: Column): Column = array((0 until depth).map(i =>
          struct(lit(i).as("i"),
            pmod(pmod(lit(as(i)) * hw + lit(bs(i)), lit(P)), lit(width))
              .as("bucket"))): _*)
        val counts = docs(s, d)
          .select(explode(words(col("text"))).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        // hw aliased behind its own projection (md5 is expensive and
        // referenced by all 4 bucket rows)
        val sketch = counts
          .select(col("cnt"), pmod(h60col(col("w")), lit(P)).as("hw"))
          .select(col("cnt"), explode(buckets(col("hw"))).as("ib"))
          .groupBy(col("ib.i").as("i"), col("ib.bucket").as("bucket"))
          .agg(sum(col("cnt")).as("c"))
        val top = counts
          .orderBy(col("cnt").desc, col("w")).limit(20)
          .select(col("w"), col("cnt").as("exact_cnt"),
            pmod(h60col(col("w")), lit(P)).as("hw"))
          .select(col("w"), col("exact_cnt"),
            explode(buckets(col("hw"))).as("ib"))
          .select(col("w"), col("exact_cnt"),
            col("ib.i").as("i"), col("ib.bucket").as("bucket"))
        sketch.join(broadcast(top), Seq("i", "bucket"))
          .groupBy(col("w"), col("exact_cnt"))
          .agg(min(col("c")).as("cms_cnt"))
          .select(col("w").as("word"), col("exact_cnt"), col("cms_cnt"),
            (col("cms_cnt") - col("exact_cnt")).as("overcount"))
          .orderBy(col("exact_cnt").desc, col("word"))
      },
      Some("""WITH tok AS (
          SELECT unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS w
          FROM documents),
        counts AS (
          SELECT w, cast(count(*) as bigint) AS cnt FROM tok GROUP BY w),
        params AS (
          SELECT i,
            ('0x' || substr(md5('cms_a_' || i), 1, 15))::BIGINT
              % 2147483646 + 1 AS a,
            ('0x' || substr(md5('cms_b_' || i), 1, 15))::BIGINT
              % 2147483647 AS b
          FROM range(4) t(i)),
        sketch AS (
          SELECT i,
            ((a * (('0x' || substr(md5(w), 1, 15))::BIGINT % 2147483647)
              + b) % 2147483647) % 1024 AS bucket,
            cast(sum(cnt) as bigint) AS c
          FROM counts, params
          GROUP BY 1, 2),
        top AS (
          SELECT w, cnt AS exact_cnt FROM counts
          ORDER BY cnt DESC, w LIMIT 20),
        est AS (
          SELECT t.w, t.exact_cnt, min(s.c) AS cms_cnt
          FROM top t, params p
          JOIN sketch s ON s.i = p.i AND s.bucket =
            ((p.a * (('0x' || substr(md5(t.w), 1, 15))::BIGINT
              % 2147483647) + p.b) % 2147483647) % 1024
          GROUP BY t.w, t.exact_cnt)
        SELECT w AS word, exact_cnt, cms_cnt,
          cms_cnt - exact_cnt AS overcount
        FROM est
        ORDER BY exact_cnt DESC, word"""),
      bench = true),

    // ------------------------------------------------------------------
    // APPLY the x16 mixture plan: x16 computes per-language sampling
    // rates; this query actually samples with them — keep doc iff
    // h60("mix_"+doc_id) mod 1e6 < floor(rate·1e6) — and reports the
    // per-language realized yield. The deterministic hash gate (same
    // family as x17's split) means the sample is stable across runs,
    // engines and repartitions: rerunning the pipeline on a grown
    // corpus keeps previously-kept documents kept (rates aside), which
    // is what makes incremental recuration possible at 100 TB. Rates
    // ride a 5-row broadcast; one aggregate over the corpus.
    // ------------------------------------------------------------------
    "x20_mixture_apply" -> Q(
      (s, d) => {
        import s.implicits._
        val targets = Seq(("en", 0.5), ("zh", 0.2), ("de", 0.1),
          ("fr", 0.1), ("es", 0.1)).toDF("lang", "target_share")
        val counts = docs(s, d).groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"))
        val total = counts.agg(sum(col("n_docs")).as("n_total"))
        val rates = counts.join(targets, "lang")
          .crossJoin(broadcast(total))
          .withColumn("rate",
            least(lit(1.0), col("target_share") *
              (col("n_total").cast("double") * 0.5) /
              col("n_docs").cast("double")))
          .select(col("lang"), col("n_docs"), col("rate"))
        val kept = docs(s, d).select(col("lang"), col("doc_id"))
          .join(broadcast(rates.select(col("lang"), col("rate"))), "lang")
          .groupBy(col("lang"))
          .agg(count(when(
            pmod(graft.functions.PortableHash.h60col(
              concat(lit("mix_"), col("doc_id"))), lit(1000000L)) <
              floor(col("rate") * 1000000), 1)).as("n_kept"))
        rates.join(kept, "lang")
          .select(col("lang"), col("n_docs"), col("rate"), col("n_kept"),
            (col("n_kept").cast("double") / col("n_docs").cast("double"))
              .as("realized_rate"))
          .orderBy(col("lang"))
      },
      Some("""WITH targets(lang, target_share) AS (VALUES
          ('en', 0.5), ('zh', 0.2), ('de', 0.1), ('fr', 0.1), ('es', 0.1)),
        counts AS (
          SELECT lang, cast(count(*) as bigint) AS n_docs
          FROM documents GROUP BY lang),
        total AS (SELECT cast(sum(n_docs) as bigint) AS n_total FROM counts),
        rates AS (
          SELECT c.lang, c.n_docs,
            least(1.0, cast(t.target_share as double) *
              (cast(n_total as double) * 0.5) / cast(c.n_docs as double))
              AS rate
          FROM counts c JOIN targets t USING (lang), total),
        kept AS (
          SELECT d.lang, count(*) FILTER (
            ('0x' || substr(md5('mix_' || d.doc_id), 1, 15))::BIGINT
              % 1000000 < cast(floor(r.rate * 1000000) as bigint))
              AS n_kept
          FROM documents d JOIN rates r ON r.lang = d.lang
          GROUP BY d.lang)
        SELECT r.lang, r.n_docs, r.rate, cast(k.n_kept as bigint) AS n_kept,
          cast(k.n_kept as double) / cast(r.n_docs as double)
            AS realized_rate
        FROM rates r JOIN kept k ON k.lang = r.lang
        ORDER BY r.lang""")),

    // ------------------------------------------------------------------
    // Corpus-trained bigram language-model score — the CCNet/Gopher
    // "perplexity filter" stage: score each document by how predictable
    // its bigrams are under a bigram MLE model trained on the corpus
    // itself. Classic KenLM filtering is float log-prob; that can never
    // hash-match across engines, so the score is the integer-exact
    // analog: per bigram occurrence, p_scaled = (1e6·c2) div c1 where
    // c2 = corpus count of the bigram and c1 = corpus count of bigrams
    // starting with its first word (so p_scaled ≈ 1e6·P(w2|w1)); the
    // document score is the integer mean over its bigram occurrences.
    // Template/boilerplate text scores high, novel text scores low —
    // the inverse of x13's novelty, but trained, not df-thresholded.
    //
    // Scale shape: ONE tokenize pass. Doc-bigram occurrence counts
    // (shuffle on (doc_id, bg)) feed BOTH the model (c2 = sum n by bg;
    // c1 re-aggregated from c2 by prefix — the model is derived, never
    // re-scans the corpus) and the scoring join (model joined back on
    // bg — a keyed hash join, NOT a broadcast: at 100 TB the bigram
    // vocabulary is data-sized). occ and c2 are localCheckpointed (the
    // g02/g03 materialization pattern) because each has TWO consumers
    // whose exchanges are non-identical — without it the tokenize
    // subtree executed twice (r6 plan-audit flag). A window-by-key form
    // would be linear but ships every occurrence of a Zipf-hot bigram
    // (c2) or first-word (c1) to ONE window partition; the
    // checkpointed aggregation tree keeps partial aggregation, so hot
    // keys combine map-side. Zipf skew on hot bigrams lands on the
    // (doc_id, bg) pre-aggregation, which spreads any hot bigram across
    // its documents' partitions before the bg-keyed exchange.
    // ------------------------------------------------------------------
    "x21_bigram_lm_score" -> Q(
      (s, d) => {
        val bigrams =
          when(size(col("toks")) >= 2,
            transform(sequence(lit(1), size(col("toks")) - 1), i =>
              concat_ws(" ", element_at(col("toks"), i),
                element_at(col("toks"), i + 1))))
            .otherwise(array().cast("array<string>"))
        // explode of the bigram expression over once-aliased toks (the
        // d08/x13 fast generate shape); NO array_distinct — the LM
        // needs occurrence multiplicity
        val occ = docs(s, d)
          .select(col("doc_id"), words(col("text")).as("toks"))
          .select(col("doc_id"), explode(bigrams).as("bg"))
          .groupBy(col("doc_id"), col("bg"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint()
        val c2 = occ.groupBy(col("bg")).agg(sum(col("n")).as("c2"))
          .localCheckpoint()
        val c1 = c2
          .groupBy(element_at(split(col("bg"), " "), 1).as("w1"))
          .agg(sum(col("c2")).as("c1"))
        val model = c2
          .withColumn("w1", element_at(split(col("bg"), " "), 1))
          .join(c1, "w1")
          .select(col("bg"),
            expr("(1000000 * c2) div c1").as("p_scaled"))
        occ.join(model, "bg")
          .groupBy(col("doc_id"))
          .agg(sum(col("n")).as("n_bigrams"),
            sum(col("n") * col("p_scaled")).as("total_scaled"))
          .select(col("doc_id"), col("n_bigrams"),
            expr("total_scaled div n_bigrams").as("lm_score"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS MATERIALIZED (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks
          FROM documents),
        occ AS MATERIALIZED (
          SELECT doc_id, bg, cast(count(*) as bigint) AS n FROM (
            SELECT doc_id, unnest(list_transform(range(1, len(toks)), i ->
              toks[i] || ' ' || toks[i+1])) AS bg
            FROM t WHERE len(toks) >= 2) u
          GROUP BY doc_id, bg),
        c2 AS MATERIALIZED (
          SELECT bg, cast(sum(n) as bigint) AS c2 FROM occ GROUP BY bg),
        c1 AS MATERIALIZED (
          SELECT string_split(bg, ' ')[1] AS w1,
            cast(sum(c2) as bigint) AS c1
          FROM c2 GROUP BY 1),
        model AS (
          SELECT c2.bg, (1000000 * c2.c2) // c1.c1 AS p_scaled
          FROM c2 JOIN c1 ON string_split(c2.bg, ' ')[1] = c1.w1)
        SELECT o.doc_id, cast(sum(o.n) as bigint) AS n_bigrams,
          cast(sum(o.n * m.p_scaled) // sum(o.n) as bigint) AS lm_score
        FROM occ o JOIN model m USING (bg)
        GROUP BY o.doc_id
        ORDER BY o.doc_id"""),
      bench = true),

    // ------------------------------------------------------------------
    // Product quantization + asymmetric-distance scan (the
    // Jégou/Douze/Schmid PQ-ADC scheme) — the memory side of
    // production ANN: a 64-dim vector compresses to 8 subspace codes
    // (one 4-bit-ish code per 8-dim slice against a 16-entry subspace
    // codebook), and query-time distance is 8 LOOKUPS into a
    // per-query table instead of 64 multiplies against raw floats. At
    // 100 TB the raw embeddings don't fit hot storage; the codes do
    // (64 dims × 4 bytes → 8 bytes/vector), and the scan touches only
    // them. Integer-exact throughout (s05's floor(x·1000)
    // quantization), so assignment, LUT, and the ADC sum are all
    // bit-reproducible: codebook = the vec_id<16 seed slices put
    // through ONE Lloyd update of [[trainPqCodebooks]] (s05's
    // fixed-point trainer, per subspace, one distributed pass — the
    // r6 "wire the trainer in" ask); the query's 8×16 lookup table is
    // computed driver-side and enters the plan as LITERALS — the
    // whole scan is one row-local fold, zero shuffle, TakeOrdered
    // top-10. exact_dist rides along to show the approximation
    // against ground truth on the same rows. Measured honestly: on
    // the near-uniform synthetic embeddings training lifts top-10
    // overlap vs exact only marginally (random vectors have little
    // cluster structure for 16 cells to exploit); on a CLUSTERED
    // fixture the trained codebooks recover the true neighbors where
    // seeds don't — measured in QueriesSpec ("s06 trained PQ
    // recall"), which is the honest recall claim. The oracle verifies
    // the MECHANISM bit-for-bit (training update, codes, LUT, ADC
    // sums).
    // ------------------------------------------------------------------
    "s06_pq_adc" -> Q(
      (s, d) => {
        val nSub = 8; val subDim = 8; val kCent = 16
        val quant = transform(col("embedding"),
          x => floor(x.cast("double") * lit(1000.0)).cast("long"))
        val base = emb(s, d).select(col("vec_id"), quant.as("qv"))
        val seeds = base.filter(col("vec_id") < kCent)
          .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
          .sortBy(_._1).toSeq
        val qVec = base.filter(col("vec_id") === 0)
          .head().getSeq[Long](1)
        val trained = trainPqCodebooks(base, nSub, subDim, seeds)
        def sliceD2(sub: Int, cv: IndexedSeq[Long]): Long = {
          var s2 = 0L; var j = 0
          while (j < subDim) {
            val dd = qVec(sub * subDim + j) - cv(j)
            s2 += dd * dd; j += 1
          }
          s2
        }
        // per-query LUT: lut(sub)(cid) = |q_sub - trained_cid_sub|²,
        // driver-side integers straight into the plan as literals
        val lut = Array.tabulate(nSub, kCent)((sub, c) =>
          sliceD2(sub, trained(sub)(c)._2))
        // per-row: for each subspace, argmin over the 16 literal
        // centroid slices (ties → smallest cid), then ADC = Σ lut[sub][code]
        val approxDist = (0 until nSub).map { sub =>
          val centSlices = array(trained(sub).map { case (cid, cv) =>
            struct(lit(cid).as("cid"),
              array(cv.map(lit(_)): _*).as("cv"))
          }: _*)
          val qSlice = array((0 until subDim).map(j =>
            col("qv").getItem(sub * subDim + j)).toIndexedSeq: _*)
          val code = aggregate(centSlices,
            struct(lit(Long.MaxValue).as("dist"), lit(-1L).as("cid")),
            (acc, c) => {
              val dist = aggregate(
                zip_with(qSlice, c.getField("cv"),
                  (a, b) => (a - b) * (a - b)),
                lit(0L), (s2, x) => s2 + x)
              when(dist < acc.getField("dist"),
                struct(dist.as("dist"), c.getField("cid").as("cid")))
                .otherwise(acc)
            }).getField("cid")
          element_at(
            array(lut(sub).map(lit(_)).toIndexedSeq: _*),
            (code + 1).cast("int"))
        }.reduce(_ + _)
        val qLit = array(qVec.map(lit(_)).toIndexedSeq: _*)
        val exactDist = aggregate(
          zip_with(col("qv"), qLit, (a, b) => (a - b) * (a - b)),
          lit(0L), (s2, x) => s2 + x)
        base.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), approxDist.as("approx_dist"),
            exactDist.as("exact_dist"))
          .orderBy(col("approx_dist"), col("vec_id"))
          .limit(10)
      },
      Some("""WITH e AS MATERIALIZED (
          SELECT vec_id,
            list_transform(embedding, x ->
              cast(floor(cast(x as double) * 1000) as bigint)) AS qv
          FROM embeddings),
        q AS (SELECT qv AS quv FROM e WHERE vec_id = 0),
        subs AS (SELECT unnest(range(0, 8)) AS sub),
        cb0 AS MATERIALIZED (
          SELECT s.sub, c.vec_id AS cid,
            list_transform(range(1, 9), j ->
              c.qv[cast(s.sub * 8 + j as int)]) AS cv
          FROM e c, subs s WHERE c.vec_id < 16),
        a1 AS MATERIALIZED (
          SELECT vec_id, sub, cid FROM (
            SELECT e.vec_id, c.sub, c.cid,
              row_number() OVER (PARTITION BY e.vec_id, c.sub ORDER BY
                list_sum(list_transform(range(1, 9), j ->
                  (e.qv[cast(c.sub * 8 + j as int)] - c.cv[cast(j as int)]) *
                  (e.qv[cast(c.sub * 8 + j as int)] - c.cv[cast(j as int)]))),
                c.cid) AS rn
            FROM e, cb0 c) x WHERE rn = 1),
        s1 AS (
          SELECT a.sub, a.cid, p.pos,
            cast(sum(e.qv[cast(a.sub * 8 + p.pos as int)]) as bigint)
              // cast(count(*) as bigint) AS c
          FROM a1 a JOIN e ON e.vec_id = a.vec_id,
            (SELECT unnest(range(1, 9)) AS pos) p
          GROUP BY a.sub, a.cid, p.pos),
        c1l AS (SELECT sub, cid, list(c ORDER BY pos) AS cv
          FROM s1 GROUP BY sub, cid),
        cb AS MATERIALIZED (
          SELECT cb0.sub, cb0.cid, coalesce(l.cv, cb0.cv) AS cv
          FROM cb0 LEFT JOIN c1l l
            ON l.sub = cb0.sub AND l.cid = cb0.cid),
        codes AS MATERIALIZED (
          SELECT vec_id, sub, cid AS code FROM (
            SELECT e.vec_id, c.sub, c.cid,
              row_number() OVER (PARTITION BY e.vec_id, c.sub ORDER BY
                list_sum(list_transform(range(1, 9), j ->
                  (e.qv[cast(c.sub * 8 + j as int)] - c.cv[cast(j as int)]) *
                  (e.qv[cast(c.sub * 8 + j as int)] - c.cv[cast(j as int)]))),
                c.cid) AS rn
            FROM e, cb c) x WHERE rn = 1),
        lut AS MATERIALIZED (
          SELECT c.sub, c.cid,
            list_sum(list_transform(range(1, 9), j ->
              (q.quv[cast(c.sub * 8 + j as int)] - c.cv[cast(j as int)]) *
              (q.quv[cast(c.sub * 8 + j as int)] - c.cv[cast(j as int)])))
              AS d
          FROM cb c, q),
        ad AS (
          SELECT codes.vec_id, cast(sum(l.d) as bigint) AS approx_dist
          FROM codes JOIN lut l
            ON l.sub = codes.sub AND l.cid = codes.code
          GROUP BY codes.vec_id),
        ex AS (
          SELECT e.vec_id,
            cast(list_sum(list_transform(range(1, 65), p ->
              (e.qv[p] - q.quv[p]) * (e.qv[p] - q.quv[p]))) as bigint)
              AS exact_dist
          FROM e, q)
        SELECT a.vec_id, a.approx_dist, x.exact_dist
        FROM ad a JOIN ex x ON x.vec_id = a.vec_id
        WHERE a.vec_id <> 0
        ORDER BY a.approx_dist, a.vec_id LIMIT 10""")),

    // ------------------------------------------------------------------
    // k-NN classification eval — the first consumer of the embeddings
    // table's `label` column: 20 held-out query vectors, each
    // predicted as the majority label of its k=5 nearest labeled
    // neighbors (cosine), scored against the true label per class.
    // This is the eval loop a labeled-embedding pipeline runs after
    // every index build (s02/s03/s06/s08 all change the neighbor set;
    // this measures whether they change the DECISION). Scale shape:
    // the 20-query batch broadcasts (s04's pattern), the corpus side
    // is one scan; per-query top-k is a 20-partition window (bounded
    // by queries, not corpus); the vote argmax is max_by with a
    // unique (c, −label) tie key — the g04 lesson, no sort shuffle.
    // ------------------------------------------------------------------
    "s09_knn_classify" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val nq = 20
        val k = 5
        val base = emb(s, d)
        val queries = base.filter(col("vec_id") < nq)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
            col("label").as("true_label"))
        val top = base.filter(col("vec_id") >= nq)
          .crossJoin(broadcast(queries))
          .withColumn("cos", cosine(col("embedding"), col("qe")))
          .withColumn("rn", row_number().over(Window
            .partitionBy(col("q_id"))
            .orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rn") <= k)
        val pred = top
          .groupBy(col("q_id"), col("true_label"), col("label"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("q_id"), col("true_label"))
          .agg(max_by(col("label"),
            struct(col("c"), (-col("label")).as("nl"))).as("pred"))
        pred.groupBy(col("true_label").as("label"))
          .agg(count(lit(1)).as("n_queries"),
            count(when(col("pred") === col("true_label"), 1))
              .as("n_correct"))
          .orderBy(col("label"))
      },
      Some("""WITH e AS MATERIALIZED (
          SELECT vec_id, label,
            list_transform(embedding, x -> cast(x as double)) AS v
          FROM embeddings),
        n AS (SELECT vec_id, label, v,
          sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        q AS (SELECT vec_id AS q_id, label AS true_label, v AS qv,
          nrm AS qnrm FROM n WHERE vec_id < 20),
        top AS (
          SELECT q.q_id, q.true_label, c.label
          FROM n c, q WHERE c.vec_id >= 20
          QUALIFY row_number() OVER (PARTITION BY q.q_id
            ORDER BY list_dot_product(c.v, q.qv) / c.nrm / q.qnrm DESC,
              c.vec_id) <= 5),
        votes AS (
          SELECT q_id, true_label, label, count(*) AS c
          FROM top GROUP BY 1, 2, 3),
        pred AS (
          SELECT q_id, true_label, label AS pred FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY c DESC, label) AS rn
            FROM votes) x WHERE rn = 1)
        SELECT true_label AS label, cast(count(*) as bigint) AS n_queries,
          cast(count(*) FILTER (WHERE pred = true_label) as bigint)
            AS n_correct
        FROM pred GROUP BY 1
        ORDER BY label""")),

    // ------------------------------------------------------------------
    // Diversity-aware retrieval: Maximal Marginal Relevance (Carbonell
    // & Goldstein, SIGIR'98) — what a RAG / eval-set builder actually
    // wants from "top-k": not the 5 MOST similar docs (often 5 copies
    // of the same thing) but 5 similar-yet-mutually-different ones.
    // Two stages with very different scale shapes, deliberately split:
    // stage 1 is s01's distributed top-20 cosine scan (the corpus-
    // sized work, one pass, TakeOrdered); stage 2 is the greedy MMR
    // loop over those 20 candidates — metadata-scale by construction
    // (20 rows, 380 pairwise sims), which is WHY greedy reranking is
    // affordable at 100 TB: the sequential part never touches the
    // corpus. score(d) = 0.7·rel(q,d) − 0.3·max_{s∈S} sim(d,s), five
    // rounds, ties by vec_id. Every double comes from the same
    // sequential fold both engines use (s01's ⊕ convention), so the
    // greedy argmax — and therefore the SELECTION — hash-matches.
    // ------------------------------------------------------------------
    "s07_mmr_rerank" -> Q(
      (s, d) => {
        val base = emb(s, d)
        val query = base.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        val cand = base.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(query))
          .withColumn("rel", cosine(col("embedding"), col("qe")))
          .select(col("vec_id"), col("embedding"), col("rel"))
          .orderBy(col("rel").desc, col("vec_id"))
          .limit(20)
          .localCheckpoint()
        val sims = cand.select(col("vec_id").as("a"),
            col("embedding").as("ea"))
          .join(cand.select(col("vec_id").as("b"),
            col("embedding").as("eb")), col("a") =!= col("b"))
          .select(col("a"), col("b"),
            cosine(col("ea"), col("eb")).as("sim"))
          .localCheckpoint()
        def pickNext(selected: org.apache.spark.sql.DataFrame, rank: Int) = {
          val pen = sims
            .join(selected.select(col("vec_id").as("b")), "b")
            .groupBy(col("a")).agg(max(col("sim")).as("pen"))
            .withColumnRenamed("a", "vec_id")
          cand.join(selected.select(col("vec_id")), Seq("vec_id"),
              "left_anti")
            .join(pen, "vec_id")
            .withColumn("score",
              lit(0.7) * col("rel") - lit(0.3) * col("pen"))
            .orderBy(col("score").desc, col("vec_id"))
            .limit(1)
            .select(lit(rank).as("rank"), col("vec_id"),
              col("score").as("mmr_score"))
        }
        var sel = cand.orderBy(col("rel").desc, col("vec_id")).limit(1)
          .select(lit(1).as("rank"), col("vec_id"),
            (lit(0.7) * col("rel")).as("mmr_score"))
          .localCheckpoint()
        for (r <- 2 to 5)
          sel = sel.unionAll(pickNext(sel, r)).localCheckpoint()
        sel.orderBy(col("rank"))
      },
      Some("""WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> cast(x as double))
            AS v FROM embeddings),
        n AS (SELECT vec_id, v,
          sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        q AS (SELECT v AS qv, nrm AS qnrm FROM n WHERE vec_id = 0),
        cand AS MATERIALIZED (
          SELECT n.vec_id, n.v, n.nrm,
            list_dot_product(n.v, q.qv) / n.nrm / q.qnrm AS rel
          FROM n, q WHERE n.vec_id <> 0
          ORDER BY rel DESC, n.vec_id LIMIT 20),
        sims AS MATERIALIZED (
          SELECT a.vec_id AS a, b.vec_id AS b,
            list_dot_product(a.v, b.v) / a.nrm / b.nrm AS sim
          FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
        s1 AS (SELECT 1 AS rank, vec_id,
            cast(0.7 as double) * rel AS mmr_score
          FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
        sel1 AS (SELECT vec_id FROM s1),
        s2 AS (SELECT 2 AS rank, c.vec_id,
            cast(0.7 as double) * c.rel - cast(0.3 as double) * p.pen
              AS mmr_score
          FROM cand c JOIN (SELECT a, max(sim) AS pen FROM sims
            JOIN sel1 ON sims.b = sel1.vec_id GROUP BY a) p
            ON p.a = c.vec_id
          WHERE c.vec_id NOT IN (SELECT vec_id FROM sel1)
          ORDER BY mmr_score DESC, c.vec_id LIMIT 1),
        sel2 AS (SELECT vec_id FROM sel1
          UNION ALL SELECT vec_id FROM s2),
        s3 AS (SELECT 3 AS rank, c.vec_id,
            cast(0.7 as double) * c.rel - cast(0.3 as double) * p.pen
              AS mmr_score
          FROM cand c JOIN (SELECT a, max(sim) AS pen FROM sims
            JOIN sel2 ON sims.b = sel2.vec_id GROUP BY a) p
            ON p.a = c.vec_id
          WHERE c.vec_id NOT IN (SELECT vec_id FROM sel2)
          ORDER BY mmr_score DESC, c.vec_id LIMIT 1),
        sel3 AS (SELECT vec_id FROM sel2
          UNION ALL SELECT vec_id FROM s3),
        s4 AS (SELECT 4 AS rank, c.vec_id,
            cast(0.7 as double) * c.rel - cast(0.3 as double) * p.pen
              AS mmr_score
          FROM cand c JOIN (SELECT a, max(sim) AS pen FROM sims
            JOIN sel3 ON sims.b = sel3.vec_id GROUP BY a) p
            ON p.a = c.vec_id
          WHERE c.vec_id NOT IN (SELECT vec_id FROM sel3)
          ORDER BY mmr_score DESC, c.vec_id LIMIT 1),
        sel4 AS (SELECT vec_id FROM sel3
          UNION ALL SELECT vec_id FROM s4),
        s5 AS (SELECT 5 AS rank, c.vec_id,
            cast(0.7 as double) * c.rel - cast(0.3 as double) * p.pen
              AS mmr_score
          FROM cand c JOIN (SELECT a, max(sim) AS pen FROM sims
            JOIN sel4 ON sims.b = sel4.vec_id GROUP BY a) p
            ON p.a = c.vec_id
          WHERE c.vec_id NOT IN (SELECT vec_id FROM sel4)
          ORDER BY mmr_score DESC, c.vec_id LIMIT 1)
        SELECT * FROM (
          SELECT * FROM s1 UNION ALL SELECT * FROM s2
          UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
          UNION ALL SELECT * FROM s5) u
        ORDER BY rank""")),

    // ------------------------------------------------------------------
    // Johnson-Lindenstrauss random projection — embedding COMPRESSION
    // for the ANN stack (s02 buckets, s03 partitions, s06 quantizes;
    // this shrinks the vectors themselves): 64 dims → 16 via the
    // sparse Achlioptas projection (entries +1/−1/0 w.p. 1/6, 1/6,
    // 2/3 — "Database-friendly random projections", PODS'01), with
    // the matrix derived from h60 so both engines build the IDENTICAL
    // projection from nothing but the seed strings. The constant
    // sqrt(3/16) scale factor is dropped deliberately: cosine is
    // scale-invariant, so it cancels. Output: the projected-space
    // top-10 with an in_exact flag against the full-dimension top-10
    // — the recall readout (s04's harness pattern). Scale shape: the
    // 16×64 matrix is a driver literal (data-independent); projection
    // is one row-local map (4× smaller vectors = 4× less ANN memory
    // and shuffle); the exact full-dim leg exists for evaluation, as
    // in s04 — production scans only the projected column.
    // ------------------------------------------------------------------
    "s08_jl_recall" -> Q(
      (s, d) => {
        val target = 16
        val base0 = emb(s, d)
        val dim = base0.select(size(col("embedding"))).head.getInt(0)
        val signs: Seq[Seq[Double]] = (0 until target).map(j =>
          (0 until dim).map { i =>
            graft.functions.PortableHash.h60(s"jl_${j}_${i}") % 6L match {
              case 0L => 1.0
              case 1L => -1.0
              case _ => 0.0
            }
          })
        val signsC = typedLit(signs)
        val proj = base0.withColumn("pv",
          transform(sequence(lit(0), lit(target - 1)), j =>
            graft.functions.VectorDot.dot(col("embedding"),
              element_at(signsC, j + 1))))
          .select(col("vec_id"), col("pv"))
        val q = proj.filter(col("vec_id") === 0)
          .select(col("pv").as("qpv"))
        val proj10 = proj.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .withColumn("cos_proj", cosine(col("pv"), col("qpv")))
          .select(col("vec_id"), col("cos_proj"))
          .orderBy(col("cos_proj").desc, col("vec_id"))
          .limit(10)
        val qe = base0.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        val ex10 = base0.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qe))
          .withColumn("cos", cosine(col("embedding"), col("qe")))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
          .select(col("vec_id"), lit(true).as("in_exact"))
        proj10.join(ex10, Seq("vec_id"), "left")
          .withColumn("in_exact", coalesce(col("in_exact"), lit(false)))
          .orderBy(col("cos_proj").desc, col("vec_id"))
      },
      Some("""WITH e AS MATERIALIZED (
          SELECT vec_id, list_transform(embedding, x -> cast(x as double))
            AS v FROM embeddings),
        dim AS (SELECT max(len(v)) AS d FROM e),
        signs AS (
          SELECT j, list_transform(range(0, d), i ->
            CASE ('0x' || substr(md5('jl_' || j || '_' || i), 1, 15))
                ::BIGINT % 6
              WHEN 0 THEN cast(1 as double)
              WHEN 1 THEN cast(-1 as double)
              ELSE cast(0 as double) END) AS sv
          FROM range(0, 16) t(j), dim),
        sg AS (SELECT list(sv ORDER BY j) AS svs FROM signs),
        p AS (SELECT vec_id,
            list_transform(range(0, 16), j -> list_dot_product(v, svs[j+1]))
              AS pv
          FROM e, sg),
        np AS (SELECT vec_id, pv,
          sqrt(list_sum(list_transform(pv, x -> x * x))) AS nrm FROM p),
        q AS (SELECT pv AS qpv, nrm AS qnrm FROM np WHERE vec_id = 0),
        proj10 AS (
          SELECT np.vec_id,
            list_dot_product(np.pv, q.qpv) / np.nrm / q.qnrm AS cos_proj
          FROM np, q WHERE np.vec_id <> 0
          ORDER BY cos_proj DESC, np.vec_id LIMIT 10),
        n2 AS (SELECT vec_id, v,
          sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        q2 AS (SELECT v AS qv, nrm AS qnrm FROM n2 WHERE vec_id = 0),
        ex10 AS (
          SELECT n2.vec_id FROM n2, q2 WHERE n2.vec_id <> 0
          ORDER BY list_dot_product(n2.v, q2.qv) / n2.nrm / q2.qnrm DESC,
            n2.vec_id
          LIMIT 10)
        SELECT p.vec_id, p.cos_proj,
          p.vec_id IN (SELECT vec_id FROM ex10) AS in_exact
        FROM proj10 p
        ORDER BY p.cos_proj DESC, p.vec_id""")),

    // ------------------------------------------------------------------
    // Heaps-law vocabulary-growth census over the bigram vocabulary —
    // the corpus statistic that answers "is more data still adding new
    // language?" (vocab growth flattening is the classic
    // diminishing-returns signal for a training corpus; the word-level
    // vocabulary here is synthetic-tiny at 31 types, the bigram
    // vocabulary at ~900 types actually grows). Every bigram position
    // gets a GLOBAL stream index (doc offset = running sum of per-doc
    // bigram counts in doc_id order + position in doc); a type's first
    // occurrence is min(global index); the census buckets first
    // occurrences per 2000-position stretch with a cumulative vocab
    // size. Buckets where no new type appears are absent (documented,
    // mirrored). The offset prefix-sum is TWO-LEVEL: per-doc bigram
    // counts (metadata-scale, checkpointed) get a within-block
    // exclusive prefix via a window PARTITIONED by blk = doc_id div
    // 512 (parallel across blocks), block totals get the global
    // prefix in a second window over one row PER BLOCK (N/512 rows —
    // the only single-task step, metadata-scale by construction), and
    // the two add up to the global stream offset. The token stream
    // itself never passes through an unpartitioned window; it meets
    // its offset in one doc_id-keyed join (sort-merge at scale).
    // Tokenize runs twice — once array-free for counts, once for the
    // bigram explode — a linear second scan traded for removing the
    // corpus-wide single-task sort. Everything downstream is the one
    // bigram-keyed min-aggregation.
    // ------------------------------------------------------------------
    "x22_vocab_growth" -> Q(
      (s, d) => {
        val B = 2000L
        // level 0: per-doc counts, array dropped immediately; the
        // checkpoint stops the prefix consumers re-tokenizing
        val counts = docs(s, d)
          .select(col("doc_id"),
            greatest(size(words(col("text"))).cast("long") - 1L, lit(0L))
              .as("n"))
          .localCheckpoint()
        val offs = streamOffsets(counts)
        val tokd = docs(s, d)
          .select(col("doc_id"), words(col("text")).as("toks"))
        val bigramArr =
          when(size(col("toks")) >= 2,
            transform(sequence(lit(1), size(col("toks")) - 1), i =>
              concat_ws(" ", element_at(col("toks"), i),
                element_at(col("toks"), i + 1))))
            .otherwise(array().cast("array<string>"))
        val cumW = org.apache.spark.sql.expressions.Window
          .orderBy(col("bucket"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        tokd.join(offs, Seq("doc_id"))
          .select(col("off"), posexplode(bigramArr).as(Seq("pos", "bg")))
          .select(col("bg"), (col("off") + col("pos")).as("gpos"))
          .groupBy(col("bg")).agg(min(col("gpos")).as("first_pos"))
          .groupBy(expr(s"first_pos div $B").as("bucket"))
          .agg(count(lit(1)).as("n_new_types"))
          .withColumn("bucket_start", col("bucket") * lit(B))
          .withColumn("vocab_size", sum(col("n_new_types")).over(cumW))
          .select(col("bucket"), col("bucket_start"),
            col("n_new_types"), col("vocab_size"))
          .orderBy(col("bucket"))
      },
      Some("""WITH t AS (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks
          FROM documents),
        n AS (SELECT doc_id, toks,
            greatest(cast(len(toks) as bigint) - 1, 0) AS n FROM t),
        o AS (SELECT doc_id, toks,
            cast(coalesce(sum(n) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              as bigint) AS off
          FROM n),
        p AS (
          SELECT unnest(list_transform(
            range(1, greatest(cast(len(toks) as int), 1)), i ->
              struct_pack(gpos := off + i - 1,
                bg := toks[cast(i as int)] || ' ' ||
                  toks[cast(i as int) + 1]))) AS u
          FROM o WHERE len(toks) >= 2),
        f AS (SELECT u.bg AS bg, min(u.gpos) AS first_pos
          FROM p GROUP BY u.bg),
        b AS (SELECT first_pos // 2000 AS bucket,
            cast(count(*) as bigint) AS n_new_types
          FROM f GROUP BY 1)
        SELECT bucket, bucket * 2000 AS bucket_start, n_new_types,
          cast(sum(n_new_types) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint)
            AS vocab_size
        FROM b ORDER BY bucket""")),

    // ------------------------------------------------------------------
    // Sequence packing census — the step between curation and training:
    // documents concatenate into a global token stream that is cut into
    // fixed-length context windows (L = 512 here), and the census
    // reports, per sequence, how many documents contribute, how many
    // tokens land in it, and how many of its documents CROSS a sequence
    // boundary (the attention-masking / document-bleed statistic a
    // packing strategy is judged on). Position arithmetic is the same
    // two-level block prefix sum as x22 (streamOffsets — the corpus
    // never passes an unpartitioned window); each doc then expands
    // ROW-LOCALLY to the ≤ n/L + 1 sequences it touches (explode of a
    // sequence() range — never a token explode: packing needs counts,
    // not tokens), and one seq_id-keyed aggregation closes it. At
    // 100 TB: one metadata-scale prefix sum + one well-distributed
    // shuffle on seq_id.
    // ------------------------------------------------------------------
    "x23_sequence_pack" -> Q(
      (s, d) => {
        val L = 512L
        val counts = docs(s, d)
          .select(col("doc_id"),
            size(words(col("text"))).cast("long").as("n"))
          .localCheckpoint()
        val offs = streamOffsets(counts)
        val spans = counts.filter(col("n") > 0)
          .join(offs, Seq("doc_id"))
          .select(col("doc_id"), col("n"), col("off"),
            expr(s"off div $L").as("seq_first"),
            expr(s"(off + n - 1) div $L").as("seq_last"))
        spans
          .select(col("n"), col("off"),
            col("seq_first"), col("seq_last"),
            explode(sequence(col("seq_first"), col("seq_last")))
              .as("seq_id"))
          .groupBy(col("seq_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(least(col("off") + col("n"), (col("seq_id") + 1) * L) -
              greatest(col("off"), col("seq_id") * L)).as("n_tokens"),
            count(when(col("seq_first") =!= col("seq_last"), 1))
              .as("n_spanning"))
          .orderBy(col("seq_id"))
      },
      Some("""WITH t AS (
          SELECT doc_id,
            cast(len(string_split_regex(
              regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
              as bigint) AS n
          FROM documents),
        o AS (SELECT doc_id, n,
            cast(coalesce(sum(n) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              as bigint) AS off
          FROM t),
        s AS (SELECT doc_id, n, off,
            off // 512 AS sf, (off + n - 1) // 512 AS sl
          FROM o WHERE n > 0),
        x AS (SELECT s.n, s.off, s.sf, s.sl, u.seq_id
          FROM s, LATERAL (SELECT unnest(generate_series(s.sf, s.sl))
            AS seq_id) u)
        SELECT seq_id, cast(count(*) as bigint) AS n_docs,
          cast(sum(least(off + n, (seq_id + 1) * 512) -
            greatest(off, seq_id * 512)) as bigint) AS n_tokens,
          cast(count(*) FILTER (WHERE sf <> sl) as bigint) AS n_spanning
        FROM x GROUP BY seq_id
        ORDER BY seq_id""")),

    // ------------------------------------------------------------------
    // Incremental dedup (d14: in-session index; d16: index persisted
    // to parquet and probed from DISK) — the shape a recurring crawl
    // actually runs: dedup TODAY'S batch (sources src16-19) against
    // the HISTORICAL index (src0-15), not the whole corpus against
    // itself. The
    // mechanism is d03's MinHash-LSH band table, recast as a persisted
    // INDEX: at 100 TB the (band, band_hash, doc_id) table for history
    // is stored once (16 rows × 16 bytes per doc — it never re-scans
    // or re-shingles old text), and each day's batch probes it with a
    // band-keyed join whose left side is only the new docs. Here both
    // sides derive from one localCheckpointed band frame (computing
    // the signatures once, standing in for the stored index); the
    // probe join is candidates-only, and exact Jaccard over shingles
    // verifies, exactly as d03. Output is the admit/drop verdict per
    // incoming doc: n_matches = 0 means genuinely new; otherwise
    // best_idx/best_jaccard name the historical duplicate (argmax by
    // jaccard, doc_id tiebreak — a window over the ≤ |candidates|
    // verified pairs, metadata-scale). Hash-verified end to end: the
    // oracle re-derives signatures, bands, candidates, and verdicts.
    // ------------------------------------------------------------------
    "d14_incremental_dedup" -> Q(
      (s, d) => {
        val bands = 16
        val rowsPerBand = 4
        val incomingSrcs = Seq("src16", "src17", "src18", "src19")
        val incoming = col("source").isin(incomingSrcs: _*)
        // one signature pass over the corpus, checkpointed = the
        // stored band index (history side) + the day's probe rows
        val banded = Catalog.mat(docs(s, d)
          .select(col("doc_id"), incoming.as("inc"),
            words(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
          .withColumn("sig",
            graft.functions.ShingleMinHash.shingleMinhash(col("toks")))
          .select(col("doc_id"), col("inc"),
            posexplode(bandHashes(col("sig"), bands, rowsPerBand)))
          .select(col("doc_id"), col("inc"), col("pos").as("band"),
            col("col").as("band_hash"))
          // corpus-scale multi-consumer frame → the shared disk dial
          // (Catalog.mat), not a bare MEMORY_AND_DISK checkpoint
          )
        val cand = banded.filter(col("inc"))
          .select(col("band"), col("band_hash"), col("doc_id").as("doc_new"))
          .join(banded.filter(!col("inc"))
              .select(col("band"), col("band_hash"),
                col("doc_id").as("doc_idx")),
            Seq("band", "band_hash"))
          .select(col("doc_new"), col("doc_idx"))
          .distinct()
        lshIncrementalVerdicts(s, d, cand, incoming)
      },
      Some(incrementalDedupOracle),
      bench = true),

    // ------------------------------------------------------------------
    // d14's day-N production posture, END-TO-END: the history band
    // index is WRITTEN TO PARQUET in a day-0 step (one shingle pass
    // over src0-15, never repeated) and the day's batch probes the
    // STORED table read back from disk — proving the 16 rows × 16 B
    // per-doc storage claim with a real write/read boundary instead of
    // a session checkpoint. Day-0 cost is the index build + one
    // columnar write; day-N cost is shingling ONLY the new docs plus a
    // band-keyed join against a parquet scan of the index (at 100 TB:
    // partition the stored index BY BAND and the probe join prunes to
    // matching band partitions — partitionBy("band") below writes
    // exactly that layout, and the filter pushdown is visible in the
    // scan). Semantics are identical to d14 by construction (shared
    // bandIndex + verdict tail), so the same oracle hash-verifies both
    // postures; the overwrite-mode write keeps the query idempotent
    // (run-twice safe).
    // ------------------------------------------------------------------
    "d16_stored_index_dedup" -> Q(
      (s, d) => {
        val bands = 16
        val rowsPerBand = 4
        val incomingSrcs = Seq("src16", "src17", "src18", "src19")
        val incoming = col("source").isin(incomingSrcs: _*)
        val idxPath = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR",
          sys.props("java.io.tmpdir") + "/graft-index") +
          "/d16-band-index-" + new java.io.File(d).getName
        // day-0: build + store the history index (band-partitioned:
        // the layout that lets a day-N probe prune to its bands)
        bandIndex(docs(s, d).filter(!incoming), bands, rowsPerBand)
          .write.mode("overwrite").partitionBy("band").parquet(idxPath)
        // day-N: ONLY the new docs shingle themselves; history comes
        // back as a columnar scan of the stored (band, hash, id) table
        val stored = s.read.parquet(idxPath)
          .select(col("band"), col("band_hash"),
            col("doc_id").as("doc_idx"))
        val cand = bandIndex(docs(s, d).filter(incoming), bands,
            rowsPerBand)
          .select(col("band"), col("band_hash"),
            col("doc_id").as("doc_new"))
          .join(stored, Seq("band", "band_hash"))
          .select(col("doc_new"), col("doc_idx"))
          .distinct()
        lshIncrementalVerdicts(s, d, cand, incoming)
      },
      Some(incrementalDedupOracle),
      bench = true),

    // ------------------------------------------------------------------
    // LSH band-config tuning harness — s04's role, for dedup: measure
    // the precision/recall of two banding schemes against exact
    // ground truth instead of trusting the S-curve folklore. Both
    // configs derive from ONE 64-perm signature pass (checkpointed):
    // 16 bands × 4 rows (collision threshold ≈ (1/16)^(1/4) ≈ 0.45),
    // 8 bands × 8 rows (≈ 0.77, precision-leaning), and a
    // deliberately too-loose 32 bands × 2 rows (≈ 0.18) — which on
    // this corpus buys ZERO extra recall while multiplying the
    // candidate (verification) bill 2.6× (65 vs 25 candidates;
    // background collisions grow quadratically with corpus size, so
    // the gap widens at scale): exactly the waste the harness
    // exists to expose before a 100 TB run. Ground truth is
    // the bounded
    // all-pairs exact-Jaccard set (the d02-class harness twin — at
    // 100 TB you'd ground-truth a SAMPLE, same harness). Output per
    // config: candidates, true pairs, tp, integer-permille precision
    // and recall — the numbers that pick a config for a given
    // dedup-quality SLA.
    // ------------------------------------------------------------------
    "d15_lsh_tuning" -> Q(
      (s, d) => {
        val base = docs(s, d)
          .select(col("doc_id"), words(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
          .withColumn("sig",
            graft.functions.ShingleMinHash.shingleMinhash(col("toks")))
          .select(col("doc_id"), col("sig"))
          .localCheckpoint()
        def candsOf(bands: Int, rowsPerBand: Int, tag: String) = {
          val banded = base.select(col("doc_id"),
            posexplode(transform(sequence(lit(0), lit(bands - 1)), bi =>
              aggregate(
                slice(col("sig"), bi * rowsPerBand + 1, lit(rowsPerBand)),
                lit(0L),
                (acc, v) => pmod(
                  acc * graft.functions.PortableHash.FoldBase + v,
                  lit(graft.functions.PortableHash.P))))))
            .select(col("doc_id"), col("pos").as("band"),
              col("col").as("band_hash"))
          banded.as("l").join(banded.as("r"), Seq("band", "band_hash"))
            .select(col("l.doc_id").as("doc_a"),
              col("r.doc_id").as("doc_b"))
            .filter(col("doc_a") < col("doc_b"))
            .distinct()
            .select(lit(tag).as("config"), col("doc_a"), col("doc_b"))
        }
        val cands = candsOf(16, 4, "b16r4")
          .unionAll(candsOf(8, 8, "b8r8"))
          .unionAll(candsOf(32, 2, "b32r2"))
        val sh = docShingles(s, d)
        val truth = sh.select(col("doc_id").as("doc_a"), col("w").as("wa"))
          .join(sh.select(col("doc_id").as("doc_b"), col("w").as("wb")),
            col("doc_a") < col("doc_b"))
          .filter(size(array_intersect(col("wa"), col("wb")))
            .cast("double") /
            size(array_union(col("wa"), col("wb"))).cast("double")
            >= 0.5)
          .select(col("doc_a"), col("doc_b"))
          .localCheckpoint()
        cands
          .join(truth.withColumn("is_tp", lit(true)),
            Seq("doc_a", "doc_b"), "left")
          .groupBy(col("config"))
          .agg(count(lit(1)).as("n_cand"),
            count(when(col("is_tp"), 1)).as("tp"))
          .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
          .select(col("config"), col("n_cand"), col("n_truth"), col("tp"),
            expr("tp * 1000 div n_cand").as("precision_pm"),
            expr("tp * 1000 div n_truth").as("recall_pm"))
          .orderBy(col("config"))
      },
      Some("""WITH perms AS (
          SELECT
            list_transform(range(0, 64), i ->
              ('0x' || substr(md5('perm_a_' || i), 1, 15))::BIGINT
                % 2147483646 + 1) AS pa,
            list_transform(range(0, 64), i ->
              ('0x' || substr(md5('perm_b_' || i), 1, 15))::BIGINT
                % 2147483647) AS pb),
        t0 AS (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'),
              '\s+') AS w
          FROM documents),
        sh AS MATERIALIZED (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS w
          FROM t0 WHERE len(w) >= 3),
        hs AS (
          SELECT doc_id,
            list_transform(w, s ->
              ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS h
          FROM sh),
        sig AS MATERIALIZED (
          SELECT doc_id,
            list_transform(range(0, 64), i ->
              list_min(list_transform(h, x ->
                (pa[i+1] * x + pb[i+1]) % 2147483647))) AS sig
          FROM hs, perms),
        b16 AS (
          SELECT doc_id, b AS band,
            list_reduce(list_prepend(0::BIGINT, sig[b*4+1 : b*4+4]),
              (acc, v) -> (acc * 1000003 + v) % 2147483647) AS band_hash
          FROM sig, range(0, 16) t(b)),
        b8 AS (
          SELECT doc_id, b AS band,
            list_reduce(list_prepend(0::BIGINT, sig[b*8+1 : b*8+8]),
              (acc, v) -> (acc * 1000003 + v) % 2147483647) AS band_hash
          FROM sig, range(0, 8) t(b)),
        b32 AS (
          SELECT doc_id, b AS band,
            list_reduce(list_prepend(0::BIGINT, sig[b*2+1 : b*2+2]),
              (acc, v) -> (acc * 1000003 + v) % 2147483647) AS band_hash
          FROM sig, range(0, 32) t(b)),
        cand AS (
          SELECT DISTINCT 'b16r4' AS config, l.doc_id AS doc_a,
            r.doc_id AS doc_b
          FROM b16 l JOIN b16 r
            ON l.band = r.band AND l.band_hash = r.band_hash
              AND l.doc_id < r.doc_id
          UNION ALL
          SELECT DISTINCT 'b8r8', l.doc_id, r.doc_id
          FROM b8 l JOIN b8 r
            ON l.band = r.band AND l.band_hash = r.band_hash
              AND l.doc_id < r.doc_id
          UNION ALL
          SELECT DISTINCT 'b32r2', l.doc_id, r.doc_id
          FROM b32 l JOIN b32 r
            ON l.band = r.band AND l.band_hash = r.band_hash
              AND l.doc_id < r.doc_id),
        truth AS MATERIALIZED (
          SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
          FROM sh x JOIN sh y ON x.doc_id < y.doc_id
          WHERE cast(len(list_intersect(x.w, y.w)) as double) /
                cast(len(list_distinct(list_concat(x.w, y.w))) as double)
                >= 0.5),
        nt AS (SELECT cast(count(*) as bigint) AS n_truth FROM truth),
        agg AS (
          SELECT config, cast(count(*) as bigint) AS n_cand,
            cast(count(t.doc_a) as bigint) AS tp
          FROM cand LEFT JOIN truth t
            ON t.doc_a = cand.doc_a AND t.doc_b = cand.doc_b
          GROUP BY 1)
        SELECT config, n_cand, nt.n_truth, tp,
          cast(tp * 1000 // n_cand as bigint) AS precision_pm,
          cast(tp * 1000 // nt.n_truth as bigint) AS recall_pm
        FROM agg, nt ORDER BY config""")),

    // ------------------------------------------------------------------
    // Importance-weighted data selection (the DSIR recipe, Xie et al.
    // 2023, arXiv:2302.03169): score every corpus doc by how much its
    // hashed n-gram distribution looks like a TARGET domain (here the
    // 'de' slice stands in for "high-quality target corpus"), select
    // the top-k. Features are bigrams hashed into 256 buckets with h60
    // — the hashing both bounds the model (two 256-row tables, always
    // broadcastable, however large the corpus) and is what makes the
    // score engine-portable. The likelihood ratio is an integer
    // fixed-point proxy: w[b] = 1e6·(target[b]+1) div (corpus[b]+1)
    // (add-1 smoothed), doc score = occurrence-weighted mean of w.
    // Scale shape: one tokenize+explode pass to per-(doc,bucket)
    // counts (localCheckpointed — both the global census and the
    // scoring consume it, the x21 lesson), bucket census ≤ 256 rows,
    // weights broadcast back, top-k is TakeOrdered (never a global
    // sort). The lang column rides along to make the selection visible
    // (the top-100 should be dominated by the target language).
    // ------------------------------------------------------------------
    "x25_dsir_select" -> Q(
      (s, d) => {
        val k = 100
        val nBuckets = 256L
        val bigrams =
          when(size(col("toks")) >= 2,
            transform(sequence(lit(1), size(col("toks")) - 1), i =>
              concat_ws(" ", element_at(col("toks"), i),
                element_at(col("toks"), i + 1))))
            .otherwise(array().cast("array<string>"))
        val occ = docs(s, d)
          .select(col("doc_id"), col("lang"), words(col("text")).as("toks"))
          .select(col("doc_id"), col("lang"), explode(bigrams).as("bg"))
          .select(col("doc_id"), col("lang"),
            pmod(graft.functions.PortableHash.h60col(
              concat(lit("dsir_"), col("bg"))), lit(nBuckets)).as("b"))
          .groupBy(col("doc_id"), col("lang"), col("b"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint()
        val corpus = occ.groupBy(col("b")).agg(sum(col("n")).as("cc"))
        val target = occ.filter(col("lang") === "de")
          .groupBy(col("b")).agg(sum(col("n")).as("ct"))
        val weights = corpus.join(target, Seq("b"), "left")
          .select(col("b"),
            expr("(1000000 * (coalesce(ct, 0) + 1)) div (cc + 1)").as("w"))
        occ.join(broadcast(weights), Seq("b"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(sum(col("n")).as("n_bigrams"),
            sum(col("n") * col("w")).as("tw"))
          .select(col("doc_id"), col("lang"), col("n_bigrams"),
            expr("tw div n_bigrams").as("dsir_score"))
          .orderBy(col("dsir_score").desc, col("doc_id"))
          .limit(k)
      },
      Some("""WITH t AS MATERIALIZED (
          SELECT doc_id, lang,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks
          FROM documents),
        occ AS MATERIALIZED (
          SELECT doc_id, lang, b, cast(count(*) as bigint) AS n FROM (
            SELECT doc_id, lang,
              ('0x' || substr(md5('dsir_' || bg), 1, 15))::BIGINT % 256 AS b
            FROM (
              SELECT doc_id, lang,
                unnest(list_transform(range(1, len(toks)), i ->
                  toks[i] || ' ' || toks[i+1])) AS bg
              FROM t WHERE len(toks) >= 2) u) v
          GROUP BY doc_id, lang, b),
        corpus AS (
          SELECT b, cast(sum(n) as bigint) AS cc FROM occ GROUP BY b),
        target AS (
          SELECT b, cast(sum(n) as bigint) AS ct FROM occ
          WHERE lang = 'de' GROUP BY b),
        weights AS (
          SELECT corpus.b,
            (1000000 * (coalesce(target.ct, 0) + 1)) // (corpus.cc + 1)
              AS w
          FROM corpus LEFT JOIN target ON corpus.b = target.b)
        SELECT doc_id, lang, cast(sum(n) as bigint) AS n_bigrams,
          cast(sum(n * w) // sum(n) as bigint) AS dsir_score
        FROM occ JOIN weights USING (b)
        GROUP BY doc_id, lang
        ORDER BY dsir_score DESC, doc_id
        LIMIT 100""")),

    // ------------------------------------------------------------------
    // Deterministic epoch shuffle + shard assignment — the last step
    // before a training run reads the corpus: give every doc a
    // pseudo-random position (h60("ep1_" + doc_id)) and cut the stream
    // into shards (position mod 32). The census per shard — docs,
    // tokens, distinct sources and languages, min position — is the
    // balance/mixing audit a 100 TB handoff needs: hash sharding is
    // ONE map-side projection and one 32-group aggregate (map-side
    // partials; no global sort, no repartition of the data itself —
    // contrast a random-sort shuffle, which at 100 TB is the most
    // expensive operation in the pipeline). Token totals land within a
    // few percent across shards and every shard sees every source —
    // the well-mixed property SGD sharding actually requires. The same
    // h with a different epoch tag re-deals the corpus for epoch 2;
    // the oracle re-derives everything from md5.
    // ------------------------------------------------------------------
    "x26_epoch_shard" -> Q(
      (s, d) => {
        val nShards = 32L
        docs(s, d)
          .select(col("source"), col("lang"),
            size(words(col("text"))).cast("long").as("n"),
            pmod(graft.functions.PortableHash.h60col(
              concat(lit("ep1_"), col("doc_id"))), lit(nShards)).as("shard"),
            graft.functions.PortableHash.h60col(
              concat(lit("ep1_"), col("doc_id"))).as("h"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n")).as("n_tokens"),
            countDistinct(col("source")).as("n_sources"),
            countDistinct(col("lang")).as("n_langs"),
            min(col("h")).as("h_min"))
          .orderBy(col("shard"))
      },
      Some("""WITH t AS (
          SELECT source, lang,
            cast(len(string_split_regex(
              regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
              as bigint) AS n,
            ('0x' || substr(md5('ep1_' || doc_id), 1, 15))::BIGINT % 32
              AS shard,
            ('0x' || substr(md5('ep1_' || doc_id), 1, 15))::BIGINT AS h
          FROM documents)
        SELECT shard, cast(count(*) as bigint) AS n_docs,
          cast(sum(n) as bigint) AS n_tokens,
          cast(count(DISTINCT source) as bigint) AS n_sources,
          cast(count(DISTINCT lang) as bigint) AS n_langs,
          min(h) AS h_min
        FROM t GROUP BY shard
        ORDER BY shard""")),

    // ------------------------------------------------------------------
    // Quality-classifier TRAINING in the engine — batch perceptron
    // over hashed bigram features, the trainable counterpart of x25's
    // fixed likelihood-ratio (FineWeb-Edu-style pipelines filter with
    // a TRAINED classifier; this is that training loop, distributed).
    // Integer-exact by construction: features are bucket counts,
    // weights are longs, and the BATCH update (w += Σ_misclassified
    // y·x per epoch, synchronous) is order-independent — unlike
    // per-example SGD, whose result depends on visit order and could
    // never hash-match an oracle. Three epochs; bias rides as feature
    // 256 with n=1. Scale shape: the (doc, bucket) feature frame is
    // built once and localCheckpointed (every epoch consumes it);
    // each epoch is one 257-row broadcast join + a doc-keyed score
    // agg + a bucket-keyed gradient agg — the canonical distributed
    // full-batch gradient step; the weight vector never exceeds 257
    // rows. Honest readout on this synthetic corpus (whose language
    // labels are realized only as word-FREQUENCY mixes — same shared
    // vocabulary, so the classes are not linearly separable): the
    // hard 0-threshold never fires (n_pred_target = 0 — perceptron
    // thresholds are uncalibrated on non-separable data), but the
    // length-normalized score RANKING is where the learning shows —
    // the trained selector's top-100 is 54% target at a 14% base
    // rate (3.9× lift), matching x25's fixed likelihood-ratio
    // selector. Trained-vs-derived, same selection power, and the
    // whole loop hash-verifies.
    // ------------------------------------------------------------------
    "x27_perceptron_classifier" -> Q(
      (s, d) => {
        val nBuckets = 256L
        val bigrams =
          when(size(col("toks")) >= 2,
            transform(sequence(lit(1), size(col("toks")) - 1), i =>
              concat_ws(" ", element_at(col("toks"), i),
                element_at(col("toks"), i + 1))))
            .otherwise(array().cast("array<string>"))
        val feats = docs(s, d)
          .select(col("doc_id"), col("lang"), words(col("text")).as("toks"))
          .select(col("doc_id"), col("lang"), explode(bigrams).as("bg"))
          .select(col("doc_id"), col("lang"),
            pmod(graft.functions.PortableHash.h60col(
              concat(lit("pc_"), col("bg"))), lit(nBuckets)).as("b"))
          .groupBy(col("doc_id"), col("lang"), col("b"))
          .agg(count(lit(1)).as("n"))
        val withBias = feats
          .unionAll(feats.select(col("doc_id"), col("lang")).distinct()
            .select(col("doc_id"), col("lang"), lit(256L).as("b"),
              lit(1L).as("n")))
          .withColumn("y",
            when(col("lang") === "de", 1L).otherwise(-1L))
          .localCheckpoint()
        // class-balanced update weights (70 target vs 430 rest at
        // sf0.01 — unit weights would let the majority class swamp
        // every epoch's gradient): each class's errors weigh as the
        // OTHER class's size, so total positive and negative gradient
        // mass can balance. Two metadata-scale scalars.
        val cc = withBias.select(col("doc_id"), col("y")).distinct()
          .groupBy(col("y")).agg(count(lit(1)).as("c"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val nPos = cc.getOrElse(1L, 0L)
        val nNeg = cc.getOrElse(-1L, 0L)
        val cw = when(col("y") === 1L, lit(nNeg)).otherwise(lit(nPos))
        var w = s.range(257).select(col("id").as("b"), lit(0L).as("w"))
        def scores(wDF: org.apache.spark.sql.DataFrame) = withBias
          .join(broadcast(wDF), "b")
          .groupBy(col("doc_id"), col("lang"), col("y"))
          .agg(sum(col("n") * col("w")).as("score"),
            sum(col("n")).as("tn"))
        for (_ <- 1 to 3) {
          val mis = scores(w)
            .filter(col("y") * col("score") <= 0)
            .select(col("doc_id"))
          val grad = withBias
            .join(mis, "doc_id")
            .groupBy(col("b"))
            .agg(sum(col("y") * col("n") * cw).as("g"))
          w = w.join(grad, Seq("b"), "left")
            .select(col("b"), (col("w") + coalesce(col("g"), lit(0L)))
              .as("w"))
            .localCheckpoint()
        }
        val finalScores = scores(w).localCheckpoint()
        // rank by the length-normalized score (integer mean, DSIR's
        // occurrence-weighted form): the raw sum rewards long docs
        val top100 = finalScores
          .withColumn("ns", expr("score div tn"))
          .orderBy(col("ns").desc, col("doc_id"))
          .limit(100)
          .select(col("doc_id"), lit(true).as("in_top"))
        finalScores.join(top100, Seq("doc_id"), "left")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("score") > 0, 1)).as("n_pred_target"),
            count(when(col("in_top"), 1)).as("n_top100"))
          .orderBy(col("lang"))
      },
      Some("""WITH t AS MATERIALIZED (
          SELECT doc_id, lang,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'),
              '\s+') AS toks
          FROM documents),
        f0 AS MATERIALIZED (
          SELECT doc_id, lang, b, cast(count(*) as bigint) AS n FROM (
            SELECT doc_id, lang,
              ('0x' || substr(md5('pc_' || bg), 1, 15))::BIGINT % 256 AS b
            FROM (
              SELECT doc_id, lang,
                unnest(list_transform(range(1, len(toks)), i ->
                  toks[i] || ' ' || toks[i+1])) AS bg
              FROM t WHERE len(toks) >= 2) u) v
          GROUP BY doc_id, lang, b),
        fb AS MATERIALIZED (
          SELECT doc_id, lang, b, n,
            CASE WHEN lang = 'de' THEN 1 ELSE -1 END AS y
          FROM (
            SELECT doc_id, lang, b, n FROM f0
            UNION ALL
            SELECT DISTINCT doc_id, lang, cast(256 as bigint),
              cast(1 as bigint)
            FROM f0) z),
        cc AS (SELECT
            count(DISTINCT CASE WHEN y = 1 THEN doc_id END) AS np,
            count(DISTINCT CASE WHEN y = -1 THEN doc_id END) AS nn
          FROM fb),
        w0 AS (SELECT cast(range as bigint) AS b, cast(0 as bigint) AS w
          FROM range(0, 257)),
        s1 AS (SELECT fb.doc_id, fb.lang, fb.y,
            cast(sum(fb.n * w0.w) as bigint) AS score
          FROM fb JOIN w0 ON w0.b = fb.b
          GROUP BY 1, 2, 3),
        g1 AS (SELECT fb.b,
            cast(sum(fb.y * fb.n *
              CASE WHEN fb.y = 1 THEN cc.nn ELSE cc.np END) as bigint) AS g
          FROM fb CROSS JOIN cc
          JOIN (SELECT doc_id FROM s1 WHERE y * score <= 0) m
            ON m.doc_id = fb.doc_id
          GROUP BY 1),
        w1 AS MATERIALIZED (
          SELECT w0.b, w0.w + coalesce(g1.g, 0) AS w
          FROM w0 LEFT JOIN g1 ON g1.b = w0.b),
        s2 AS (SELECT fb.doc_id, fb.lang, fb.y,
            cast(sum(fb.n * w1.w) as bigint) AS score
          FROM fb JOIN w1 ON w1.b = fb.b
          GROUP BY 1, 2, 3),
        g2 AS (SELECT fb.b,
            cast(sum(fb.y * fb.n *
              CASE WHEN fb.y = 1 THEN cc.nn ELSE cc.np END) as bigint) AS g
          FROM fb CROSS JOIN cc
          JOIN (SELECT doc_id FROM s2 WHERE y * score <= 0) m
            ON m.doc_id = fb.doc_id
          GROUP BY 1),
        w2 AS MATERIALIZED (
          SELECT w1.b, w1.w + coalesce(g2.g, 0) AS w
          FROM w1 LEFT JOIN g2 ON g2.b = w1.b),
        s3 AS (SELECT fb.doc_id, fb.lang, fb.y,
            cast(sum(fb.n * w2.w) as bigint) AS score
          FROM fb JOIN w2 ON w2.b = fb.b
          GROUP BY 1, 2, 3),
        g3 AS (SELECT fb.b,
            cast(sum(fb.y * fb.n *
              CASE WHEN fb.y = 1 THEN cc.nn ELSE cc.np END) as bigint) AS g
          FROM fb CROSS JOIN cc
          JOIN (SELECT doc_id FROM s3 WHERE y * score <= 0) m
            ON m.doc_id = fb.doc_id
          GROUP BY 1),
        w3 AS MATERIALIZED (
          SELECT w2.b, w2.w + coalesce(g3.g, 0) AS w
          FROM w2 LEFT JOIN g3 ON g3.b = w2.b),
        sf AS MATERIALIZED (SELECT fb.doc_id, fb.lang,
            cast(sum(fb.n * w3.w) as bigint) AS score,
            cast(sum(fb.n) as bigint) AS tn
          FROM fb JOIN w3 ON w3.b = fb.b
          GROUP BY 1, 2),
        top100 AS (SELECT doc_id FROM sf
          ORDER BY score // tn DESC, doc_id LIMIT 100)
        SELECT lang, cast(count(*) as bigint) AS n_docs,
          cast(count(*) FILTER (WHERE score > 0) as bigint)
            AS n_pred_target,
          cast(count(*) FILTER (WHERE doc_id IN (SELECT doc_id
            FROM top100)) as bigint) AS n_top100
        FROM sf GROUP BY 1
        ORDER BY lang""")),

    // ------------------------------------------------------------------
    // BPE merge-pair induction — tokenizer TRAINING in-engine
    // (Sennrich et al. 2016, the byte-pair-encoding loop every LLM
    // tokenizer pipeline runs over its corpus before training starts).
    // The scale split is the whole point: the corpus is touched by
    // exactly ONE tokenize+explode word-census pass (data-scale, one
    // shuffle with map-side partials); every merge round after that
    // operates on the VOCABULARY-scale (word, count) table — adjacent
    // symbol-pair counts weighted by word frequency, global argmax
    // (count desc, pair asc — the deterministic tie Sennrich's
    // reference impl leaves unspecified), then a leftmost-greedy
    // non-overlapping merge, which is exactly the semantics of
    // `replace(seq, 'l r', 'lr')` in BOTH engines (and of the
    // reference Python's word.replace). Per-round argmax is a 1-row
    // driver collect (g01's iterative-action convention; the merge
    // table IS metadata). Pair counts use the standard overlapping
    // census (e.g. 'a a a' counts (a,a) twice but merges once), so
    // tokens_after is measured from the data, not derived from the
    // count. Output: the 3-rule merge table + corpus token total
    // after each rule — what you'd ship to the tokenizer.
    // ------------------------------------------------------------------
    "x28_bpe_train" -> Q(
      (s, d) => {
        import s.implicits._
        val census = docs(s, d)
          .select(explode(words(col("text"))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
          .localCheckpoint()
        var seqs = census.select(col("cnt"),
          rtrim(regexp_replace(col("word"), "(.)", "$1 ")).as("seq"))
        val merges =
          scala.collection.mutable.ArrayBuffer[(Int, String, String,
            Long, Long)]()
        for (rank <- 1 to 3) {
          val arrs = seqs
            .select(col("cnt"), split(col("seq"), " ").as("t"))
            .select(col("cnt"),
              slice(col("t"), lit(1), size(col("t")) - 1).as("la"),
              slice(col("t"), lit(2), size(col("t")) - 1).as("ra"))
          val best = arrs
            .select(col("cnt"),
              explode(arrays_zip(col("la"), col("ra"))).as("p"))
            .select(col("p.la").as("l"), col("p.ra").as("r"), col("cnt"))
            .groupBy(col("l"), col("r")).agg(sum(col("cnt")).as("c"))
            .orderBy(col("c").desc, col("l"), col("r"))
            .limit(1).head()
          val (bl, br, bc) =
            (best.getString(0), best.getString(1), best.getLong(2))
          seqs = seqs.select(col("cnt"),
            replace(col("seq"), lit(bl + " " + br), lit(bl + br))
              .as("seq"))
            .localCheckpoint()
          val tokensAfter = seqs
            .select(sum(col("cnt") * size(split(col("seq"), " ")))
              .as("ta"))
            .head().getLong(0)
          merges += ((rank, bl, br, bc, tokensAfter))
        }
        merges.toSeq
          .toDF("merge_rank", "lhs", "rhs", "pair_count", "tokens_after")
          .orderBy(col("merge_rank"))
      },
      Some("""WITH census AS MATERIALIZED (
          SELECT w AS word, cast(count(*) as bigint) AS cnt FROM (
            SELECT unnest(string_split_regex(
              regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS w
            FROM documents) GROUP BY 1),
        s0 AS (SELECT cnt,
            rtrim(regexp_replace(word, '(.)', '\1 ', 'g')) AS seq
          FROM census),
        p1 AS (SELECT s.cnt, s.t[u.g] AS lhs, s.t[u.g + 1] AS rhs
          FROM (SELECT cnt, string_split(seq, ' ') AS t FROM s0) s,
            unnest(generate_series(1, len(s.t) - 1)) AS u(g)),
        b1 AS (SELECT lhs, rhs, cast(sum(cnt) as bigint) AS c
          FROM p1 GROUP BY 1, 2 ORDER BY c DESC, lhs, rhs LIMIT 1),
        s1 AS MATERIALIZED (SELECT s0.cnt,
            replace(s0.seq, b1.lhs || ' ' || b1.rhs, b1.lhs || b1.rhs)
              AS seq
          FROM s0, b1),
        t1 AS (SELECT cast(sum(cnt * len(string_split(seq, ' ')))
            as bigint) AS tokens_after FROM s1),
        p2 AS (SELECT s.cnt, s.t[u.g] AS lhs, s.t[u.g + 1] AS rhs
          FROM (SELECT cnt, string_split(seq, ' ') AS t FROM s1) s,
            unnest(generate_series(1, len(s.t) - 1)) AS u(g)),
        b2 AS (SELECT lhs, rhs, cast(sum(cnt) as bigint) AS c
          FROM p2 GROUP BY 1, 2 ORDER BY c DESC, lhs, rhs LIMIT 1),
        s2 AS MATERIALIZED (SELECT s1.cnt,
            replace(s1.seq, b2.lhs || ' ' || b2.rhs, b2.lhs || b2.rhs)
              AS seq
          FROM s1, b2),
        t2 AS (SELECT cast(sum(cnt * len(string_split(seq, ' ')))
            as bigint) AS tokens_after FROM s2),
        p3 AS (SELECT s.cnt, s.t[u.g] AS lhs, s.t[u.g + 1] AS rhs
          FROM (SELECT cnt, string_split(seq, ' ') AS t FROM s2) s,
            unnest(generate_series(1, len(s.t) - 1)) AS u(g)),
        b3 AS (SELECT lhs, rhs, cast(sum(cnt) as bigint) AS c
          FROM p3 GROUP BY 1, 2 ORDER BY c DESC, lhs, rhs LIMIT 1),
        s3 AS MATERIALIZED (SELECT s2.cnt,
            replace(s2.seq, b3.lhs || ' ' || b3.rhs, b3.lhs || b3.rhs)
              AS seq
          FROM s2, b3),
        t3 AS (SELECT cast(sum(cnt * len(string_split(seq, ' ')))
            as bigint) AS tokens_after FROM s3)
        SELECT * FROM (
          SELECT cast(1 as integer) AS merge_rank, b1.lhs, b1.rhs,
            b1.c AS pair_count, t1.tokens_after FROM b1, t1
          UNION ALL
          SELECT cast(2 as integer), b2.lhs, b2.rhs, b2.c,
            t2.tokens_after FROM b2, t2
          UNION ALL
          SELECT cast(3 as integer), b3.lhs, b3.rhs, b3.c,
            t3.tokens_after FROM b3, t3)
        ORDER BY merge_rank""")),

    // ------------------------------------------------------------------
    // BPE ENCODE — the consumer of x28's training: apply the learned
    // merge rules to the corpus and report per-language token budgets
    // (the number every pretraining-data plan is denominated in). The
    // corpus is tokenized ONCE into a per-language (lang, word, cnt)
    // census; the global census x28 trains on is its lang-rollup, so
    // train and encode share one corpus scan. The 3 learned merges are
    // driver literals (x28's 1-row-collect convention) applied to the
    // VOCABULARY-scale census as chained leftmost-greedy replace()
    // calls — identical semantics in Spark, DuckDB, and reference BPE's
    // word.replace — and token counts roll up weighted by cnt. At
    // 100 TB: encode cost is merges × vocabulary (Heaps-law sublinear),
    // never merges × corpus; the per-lang budget report is what decides
    // mixture weights (x16) BEFORE anyone pays for full tokenization.
    // ------------------------------------------------------------------
    "x29_bpe_encode" -> Q(
      (s, d) => {
        val perLang = docs(s, d)
          .select(col("lang"), explode(words(col("text"))).as("word"))
          .groupBy(col("lang"), col("word"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint()
        var seqs = perLang.groupBy(col("word"))
          .agg(sum(col("cnt")).as("cnt"))
          .select(col("cnt"),
            rtrim(regexp_replace(col("word"), "(.)", "$1 ")).as("seq"))
        val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
        for (_ <- 1 to 3) {
          val arrs = seqs
            .select(col("cnt"), split(col("seq"), " ").as("t"))
            .select(col("cnt"),
              slice(col("t"), lit(1), size(col("t")) - 1).as("la"),
              slice(col("t"), lit(2), size(col("t")) - 1).as("ra"))
          val best = arrs
            .select(col("cnt"),
              explode(arrays_zip(col("la"), col("ra"))).as("p"))
            .select(col("p.la").as("l"), col("p.ra").as("r"), col("cnt"))
            .groupBy(col("l"), col("r")).agg(sum(col("cnt")).as("c"))
            .orderBy(col("c").desc, col("l"), col("r"))
            .limit(1).head()
          val (bl, br) = (best.getString(0), best.getString(1))
          merges += ((bl, br))
          seqs = seqs.select(col("cnt"),
            replace(col("seq"), lit(bl + " " + br), lit(bl + br))
              .as("seq"))
            .localCheckpoint()
        }
        val spaced = perLang.select(col("lang"), col("cnt"),
          length(col("word")).as("chars"),
          rtrim(regexp_replace(col("word"), "(.)", "$1 ")).as("seq"))
        val encoded = merges.foldLeft(spaced) { case (df, (bl, br)) =>
          df.withColumn("seq",
            replace(col("seq"), lit(bl + " " + br), lit(bl + br)))
        }
        encoded
          .select(col("lang"), col("cnt"), col("chars"),
            size(split(col("seq"), " ")).as("toks"))
          .groupBy(col("lang"))
          .agg(sum(col("cnt")).as("n_words"),
            sum(col("cnt") * col("chars")).as("n_chars"),
            sum(col("cnt") * col("toks")).as("n_tokens"))
          .withColumn("compression", col("n_chars").cast("double") /
            col("n_tokens").cast("double"))
          .orderBy(col("lang"))
      },
      Some("""WITH pl AS MATERIALIZED (
          SELECT lang, w AS word, cast(count(*) as bigint) AS cnt FROM (
            SELECT lang, unnest(string_split_regex(
              regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS w
            FROM documents) GROUP BY 1, 2),
        census AS (SELECT word, sum(cnt) AS cnt FROM pl GROUP BY 1),
        s0 AS (SELECT cnt,
            rtrim(regexp_replace(word, '(.)', '\1 ', 'g')) AS seq
          FROM census),
        p1 AS (SELECT s.cnt, s.t[u.g] AS lhs, s.t[u.g + 1] AS rhs
          FROM (SELECT cnt, string_split(seq, ' ') AS t FROM s0) s,
            unnest(generate_series(1, len(s.t) - 1)) AS u(g)),
        b1 AS (SELECT lhs, rhs FROM p1 GROUP BY 1, 2
          ORDER BY sum(cnt) DESC, lhs, rhs LIMIT 1),
        s1 AS MATERIALIZED (SELECT s0.cnt,
            replace(s0.seq, b1.lhs || ' ' || b1.rhs, b1.lhs || b1.rhs)
              AS seq
          FROM s0, b1),
        p2 AS (SELECT s.cnt, s.t[u.g] AS lhs, s.t[u.g + 1] AS rhs
          FROM (SELECT cnt, string_split(seq, ' ') AS t FROM s1) s,
            unnest(generate_series(1, len(s.t) - 1)) AS u(g)),
        b2 AS (SELECT lhs, rhs FROM p2 GROUP BY 1, 2
          ORDER BY sum(cnt) DESC, lhs, rhs LIMIT 1),
        s2 AS MATERIALIZED (SELECT s1.cnt,
            replace(s1.seq, b2.lhs || ' ' || b2.rhs, b2.lhs || b2.rhs)
              AS seq
          FROM s1, b2),
        p3 AS (SELECT s.cnt, s.t[u.g] AS lhs, s.t[u.g + 1] AS rhs
          FROM (SELECT cnt, string_split(seq, ' ') AS t FROM s2) s,
            unnest(generate_series(1, len(s.t) - 1)) AS u(g)),
        b3 AS (SELECT lhs, rhs FROM p3 GROUP BY 1, 2
          ORDER BY sum(cnt) DESC, lhs, rhs LIMIT 1),
        enc AS (
          SELECT pl.lang, pl.cnt,
            cast(strlen(pl.word) as int) AS chars,
            len(string_split(
              replace(
                replace(
                  replace(
                    rtrim(regexp_replace(pl.word, '(.)', '\1 ', 'g')),
                    b1.lhs || ' ' || b1.rhs, b1.lhs || b1.rhs),
                  b2.lhs || ' ' || b2.rhs, b2.lhs || b2.rhs),
                b3.lhs || ' ' || b3.rhs, b3.lhs || b3.rhs),
              ' ')) AS toks
          FROM pl, b1, b2, b3)
        SELECT lang, cast(sum(cnt) as bigint) AS n_words,
          cast(sum(cnt * chars) as bigint) AS n_chars,
          cast(sum(cnt * toks) as bigint) AS n_tokens,
          cast(cast(sum(cnt * chars) as bigint) as double) /
            cast(cast(sum(cnt * toks) as bigint) as double)
            AS compression
        FROM enc GROUP BY lang
        ORDER BY lang""")),

    // ------------------------------------------------------------------
    // Deterministic stratified sampling — a fixed-size per-language
    // sample (k = 20) for eval sets / inspection, where the sample IS a
    // KMV min-set: the k smallest h60("smp_" + doc_id) per language.
    // That identity is the scale story: the per-language "sort" never
    // happens — KmvMinSet aggregates with a bounded ≤k buffer and
    // map-side partials, so the lang-keyed exchange carries k·8 bytes
    // per partition per language no matter how skewed the language
    // distribution is (contrast a row_number window, which ships every
    // row of the hot language to one partition). Membership joins back
    // via a broadcast of the per-language min-sets (n_langs rows);
    // rank is a window over the ≤ k·n_langs survivors — metadata. Same
    // property as x17/x20: the sample is stable under corpus regrowth
    // except for hash displacement, and any engine can re-derive it.
    // ------------------------------------------------------------------
    "x24_stratified_sample" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val k = 20
        val kmvset = udaf(new graft.functions.KmvMinSet(k),
          org.apache.spark.sql.Encoders.scalaLong)
        val hashed = docs(s, d).select(col("lang"), col("doc_id"),
          graft.functions.PortableHash.h60col(
            concat(lit("smp_"), col("doc_id"))).as("h"))
        val mins = hashed.groupBy(col("lang"))
          .agg(kmvset(col("h")).as("mins"))
        hashed.join(broadcast(mins), Seq("lang"))
          .filter(array_contains(col("mins"), col("h")))
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("lang"))
              .orderBy(col("h"), col("doc_id"))))
          // rnk ≤ k re-filter: under an h-collision the min-set's k
          // DISTINCT values could admit k+1 docs; the rank cut makes
          // both engines emit the identical k rows regardless
          .filter(col("rnk") <= k)
          .select(col("lang"), col("rnk"), col("doc_id"), col("h"))
          .orderBy(col("lang"), col("rnk"))
      },
      Some("""WITH h AS (
          SELECT lang, doc_id,
            ('0x' || substr(md5('smp_' || doc_id), 1, 15))::BIGINT AS h
          FROM documents),
        r AS (SELECT lang, doc_id, h,
            cast(row_number() OVER (PARTITION BY lang
              ORDER BY h, doc_id) as integer) AS rnk
          FROM h)
        SELECT lang, rnk, doc_id, h FROM r WHERE rnk <= 20
        ORDER BY lang, rnk""")),

    // ------------------------------------------------------------------
    // IVF-PQ hybrid ANN — the production index layout (FAISS IVFPQ;
    // Jégou et al. TPAMI 2011): coarse inverted-file cells prune the
    // scan, product quantization on the RESIDUAL (v − cell centroid)
    // compresses what remains. Composition of proven pieces: s03's
    // literal-codebook cell argmin, s05's ·1000 integer quantization
    // (residuals of quantized longs are exact integers — the whole
    // query is integer arithmetic until nothing), s06's trained-PQ ADC
    // scan — but trained on the residual frame, which is WHY IVF-PQ
    // beats flat PQ: residuals concentrate near zero, so the same 16
    // codewords spend their resolution on a much smaller ball. The
    // residual identity also gives exact distances for free: within a
    // probed cell, v − q = rv − rq(cell) (the centroid cancels), so
    // the ride-along exact column never needs the original vectors.
    // Scale shape: assignment/residual/codes are row-local folds over
    // literals (zero shuffle); training is s06's one distributed pass;
    // the ADC scan touches only the 2 probed cells' rows and the
    // per-query LUT is 8×16 driver integers.
    // ------------------------------------------------------------------
    "s11_ivfpq_ann" -> Q(
      (s, d) => {
        val nSub = 8; val subDim = 8; val kCent = 16; val kCells = 8
        val dim = nSub * subDim
        val quant = transform(col("embedding"),
          x => floor(x.cast("double") * lit(1000.0)).cast("long"))
        val base = emb(s, d).select(col("vec_id"), quant.as("qv"))
        val cellVecs = base.filter(col("vec_id") < kCells)
          .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq))
          .sortBy(_._1).toIndexedSeq
        val qVec = base.filter(col("vec_id") === 0)
          .head().getSeq[Long](1).toIndexedSeq
        def l2(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long = {
          var s2 = 0L; var j = 0
          while (j < dim) { val d0 = a(j) - b(j); s2 += d0 * d0; j += 1 }
          s2
        }
        // strict < keeps the first (smallest cid) on ties — the same
        // rule as the column-side fold and the oracle's row_number
        def assignLocal(v: IndexedSeq[Long]): Int = {
          var bd = Long.MaxValue; var bc = -1
          cellVecs.foreach { case (cid, cv) =>
            val s2 = l2(v, cv)
            if (s2 < bd) { bd = s2; bc = cid.toInt }
          }
          bc
        }
        val cellArr = array(cellVecs.map { case (id, v) =>
          struct(lit(id).as("cid"),
            array(v.map(lit(_)): _*).as("cv"))
        }: _*)
        val cellCvArr = array(cellVecs.map { case (_, v) =>
          array(v.map(lit(_)): _*)
        }: _*)
        val cellOf = aggregate(cellArr,
          struct(lit(Long.MaxValue).as("dist"), lit(-1L).as("cid")),
          (acc, c) => {
            val dist = aggregate(zip_with(col("qv"), c.getField("cv"),
              (a, b) => (a - b) * (a - b)), lit(0L), (s2, x) => s2 + x)
            when(dist < acc.getField("dist"),
              struct(dist.as("dist"), c.getField("cid").as("cid")))
              .otherwise(acc)
          }).getField("cid")
        val resid = base.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("qv"), cellOf.as("cell"))
          .select(col("vec_id"), col("cell"),
            zip_with(col("qv"),
              element_at(cellCvArr, (col("cell") + 1).cast("int")),
              (a, b) => a - b).as("rv"))
          .localCheckpoint()
        // PQ seeds = residuals of vectors 8..23 (driver-derived, cid
        // = vec_id − 8); trained one Lloyd step on the residual frame
        val seeds = base
          .filter(col("vec_id") >= kCells &&
            col("vec_id") < kCells + kCent)
          .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq))
          .sortBy(_._1).toIndexedSeq
          .map { case (id, v) =>
            val c = assignLocal(v)
            (id - kCells,
              IndexedSeq.tabulate(dim)(j => v(j) - cellVecs(c)._2(j)): Seq[Long])
          }
        val trained = trainPqCodebooks(
          resid.select(col("rv").as("qv")), nSub, subDim, seeds)
        // the query's 2 nearest cells + its residual in each
        val probes = cellVecs.map { case (cid, cv) => (l2(qVec, cv), cid) }
          .sorted.take(2).map(_._2)
        val rq: Map[Long, IndexedSeq[Long]] = probes.map { cid =>
          cid -> IndexedSeq.tabulate(dim)(j =>
            qVec(j) - cellVecs(cid.toInt)._2(j))
        }.toMap
        def lutFor(cid: Long): IndexedSeq[IndexedSeq[Long]] =
          IndexedSeq.tabulate(nSub) { sub =>
            trained(sub).map { case (_, cv) =>
              var s2 = 0L; var j = 0
              while (j < subDim) {
                val d0 = rq(cid)(sub * subDim + j) - cv(j)
                s2 += d0 * d0; j += 1
              }
              s2
            }.toIndexedSeq
          }
        val luts = probes.map(cid => cid -> lutFor(cid)).toMap
        val codeCols = (0 until nSub).map { sub =>
          val centSlices = array(trained(sub).map { case (cid, cv) =>
            struct(lit(cid).as("cid"),
              array(cv.map(lit(_)): _*).as("cv"))
          }: _*)
          val rSlice = array((0 until subDim).map(j =>
            col("rv").getItem(sub * subDim + j)).toIndexedSeq: _*)
          aggregate(centSlices,
            struct(lit(Long.MaxValue).as("dist"), lit(-1L).as("cid")),
            (acc, c) => {
              val dist = aggregate(zip_with(rSlice, c.getField("cv"),
                (a, b) => (a - b) * (a - b)), lit(0L), (s2, x) => s2 + x)
              when(dist < acc.getField("dist"),
                struct(dist.as("dist"), c.getField("cid").as("cid")))
                .otherwise(acc)
            }).getField("cid").as(s"code$sub")
        }
        def approxFor(cid: Long): Column = (0 until nSub).map { sub =>
          element_at(array(luts(cid)(sub).map(lit(_)): _*),
            (col(s"code$sub") + 1).cast("int"))
        }.reduce(_ + _)
        def exactFor(cid: Long): Column = {
          val rqArr = array(rq(cid).map(lit(_)): _*)
          aggregate(zip_with(col("rv"), rqArr,
            (a, b) => (a - b) * (a - b)), lit(0L), (s2, x) => s2 + x)
        }
        resid.filter(col("cell").isin(probes: _*))
          .select(col("vec_id") +: col("cell") +: col("rv") +:
            codeCols: _*)
          .select(col("vec_id"), col("cell"),
            when(col("cell") === probes(0), approxFor(probes(0)))
              .otherwise(approxFor(probes(1))).as("approx_dist"),
            when(col("cell") === probes(0), exactFor(probes(0)))
              .otherwise(exactFor(probes(1))).as("exact_dist"))
          .orderBy(col("approx_dist"), col("vec_id"))
          .limit(10)
      },
      Some("""WITH e AS MATERIALIZED (
          SELECT vec_id,
            list_transform(embedding, x ->
              cast(floor(cast(x as double) * 1000) as bigint)) AS qv
          FROM embeddings),
        cells AS MATERIALIZED (
          SELECT vec_id AS ccid, qv AS ccv FROM e WHERE vec_id < 8),
        asgn AS (
          SELECT vec_id, ccid AS cell FROM (
            SELECT e.vec_id, c.ccid,
              row_number() OVER (PARTITION BY e.vec_id ORDER BY
                list_sum(list_transform(range(1, 65), j ->
                  (e.qv[cast(j as int)] - c.ccv[cast(j as int)]) *
                  (e.qv[cast(j as int)] - c.ccv[cast(j as int)]))),
                c.ccid) AS rn
            FROM e, cells c WHERE e.vec_id <> 0) x WHERE rn = 1),
        resid AS MATERIALIZED (
          SELECT e.vec_id, a.cell,
            list_transform(range(1, 65), j ->
              e.qv[cast(j as int)] - c.ccv[cast(j as int)]) AS rv
          FROM e JOIN asgn a ON a.vec_id = e.vec_id
          JOIN cells c ON c.ccid = a.cell),
        q AS (SELECT qv AS quv FROM e WHERE vec_id = 0),
        qp AS (
          SELECT c.ccid AS pcell,
            list_transform(range(1, 65), j ->
              q.quv[cast(j as int)] - c.ccv[cast(j as int)]) AS rq,
            row_number() OVER (ORDER BY
              list_sum(list_transform(range(1, 65), j ->
                (q.quv[cast(j as int)] - c.ccv[cast(j as int)]) *
                (q.quv[cast(j as int)] - c.ccv[cast(j as int)]))),
              c.ccid) AS prn
          FROM cells c, q),
        probes AS MATERIALIZED (SELECT pcell, rq FROM qp WHERE prn <= 2),
        subs AS (SELECT unnest(range(0, 8)) AS sub),
        sa AS (
          SELECT e.vec_id AS sid, a.cell, e.qv
          FROM e JOIN asgn a ON a.vec_id = e.vec_id
          WHERE e.vec_id >= 8 AND e.vec_id < 24),
        cb0 AS MATERIALIZED (
          SELECT s.sub, sa.sid - 8 AS cid,
            list_transform(range(1, 9), j ->
              (sa.qv[cast(s.sub * 8 + j as int)] -
               c.ccv[cast(s.sub * 8 + j as int)])) AS cv
          FROM sa JOIN cells c ON c.ccid = sa.cell, subs s),
        a1 AS MATERIALIZED (
          SELECT vec_id, sub, cid FROM (
            SELECT r.vec_id, c.sub, c.cid,
              row_number() OVER (PARTITION BY r.vec_id, c.sub ORDER BY
                list_sum(list_transform(range(1, 9), j ->
                  (r.rv[cast(c.sub * 8 + j as int)] - c.cv[cast(j as int)]) *
                  (r.rv[cast(c.sub * 8 + j as int)] - c.cv[cast(j as int)]))),
                c.cid) AS rn
            FROM resid r, cb0 c) x WHERE rn = 1),
        s1 AS (
          SELECT a.sub, a.cid, p.pos,
            cast(sum(r.rv[cast(a.sub * 8 + p.pos as int)]) as bigint)
              // cast(count(*) as bigint) AS c
          FROM a1 a JOIN resid r ON r.vec_id = a.vec_id,
            (SELECT unnest(range(1, 9)) AS pos) p
          GROUP BY a.sub, a.cid, p.pos),
        c1l AS (SELECT sub, cid, list(c ORDER BY pos) AS cv
          FROM s1 GROUP BY sub, cid),
        cb AS MATERIALIZED (
          SELECT cb0.sub, cb0.cid, coalesce(l.cv, cb0.cv) AS cv
          FROM cb0 LEFT JOIN c1l l
            ON l.sub = cb0.sub AND l.cid = cb0.cid),
        codes AS MATERIALIZED (
          SELECT vec_id, cell, sub, cid AS code FROM (
            SELECT r.vec_id, r.cell, c.sub, c.cid,
              row_number() OVER (PARTITION BY r.vec_id, c.sub ORDER BY
                list_sum(list_transform(range(1, 9), j ->
                  (r.rv[cast(c.sub * 8 + j as int)] - c.cv[cast(j as int)]) *
                  (r.rv[cast(c.sub * 8 + j as int)] - c.cv[cast(j as int)]))),
                c.cid) AS rn
            FROM resid r, cb c
            WHERE r.cell IN (SELECT pcell FROM probes)) x WHERE rn = 1),
        lut AS MATERIALIZED (
          SELECT p.pcell, c.sub, c.cid,
            list_sum(list_transform(range(1, 9), j ->
              (p.rq[cast(c.sub * 8 + j as int)] - c.cv[cast(j as int)]) *
              (p.rq[cast(c.sub * 8 + j as int)] - c.cv[cast(j as int)])))
              AS d
          FROM cb c, probes p),
        ad AS (
          SELECT codes.vec_id, codes.cell,
            cast(sum(l.d) as bigint) AS approx_dist
          FROM codes JOIN lut l ON l.pcell = codes.cell
            AND l.sub = codes.sub AND l.cid = codes.code
          GROUP BY 1, 2),
        ex AS (
          SELECT r.vec_id,
            cast(list_sum(list_transform(range(1, 65), j ->
              (r.rv[cast(j as int)] - p.rq[cast(j as int)]) *
              (r.rv[cast(j as int)] - p.rq[cast(j as int)])))
              as bigint) AS exact_dist
          FROM resid r JOIN probes p ON p.pcell = r.cell)
        SELECT ad.vec_id, ad.cell, ad.approx_dist, ex.exact_dist
        FROM ad JOIN ex ON ex.vec_id = ad.vec_id
        ORDER BY ad.approx_dist, ad.vec_id LIMIT 10""")),

    // ------------------------------------------------------------------
    // Scalar quantization (SQ8) ANN — FAISS's other compression family
    // (per-DIMENSION affine int8, vs PQ's per-SUBSPACE codebooks):
    // train = ONE distributed per-dim min/max pass (map-side partial
    // min/max, a dim-keyed shuffle of 64 rows per partition); encode =
    // row-local c_i = ((x_i − mn_i)·255) div rg_i against the 2×64
    // literal arrays — integer-exact in both engines via the
    // (a − a mod b)/b identity (no float rounding anywhere near the
    // codes). 4× compression (64 bytes/vector vs 256 as float32,
    // codes are 0..255), distance = Σ Δcode² in pure int arithmetic.
    // Recall harness is s08's: SQ top-10 vs full-precision (quantized-
    // long) L2 top-10 with in_exact flags. Scale shape: the scan is
    // zero-shuffle row-local folds + TakeOrdered; SQ8 is what you use
    // when PQ's codebook training is not worth it but the index must
    // fit in memory.
    // ------------------------------------------------------------------
    "s12_sq8_recall" -> Q(
      (s, d) => {
        val base0 = emb(s, d)
        val quant = transform(col("embedding"),
          x => floor(x.cast("double") * lit(1000.0)).cast("long"))
        val base = base0.select(col("vec_id"), quant.as("qv"))
          .localCheckpoint()
        val mm = base
          .select(posexplode(col("qv")))
          .groupBy(col("pos"))
          .agg(min(col("col")).as("mn"), max(col("col")).as("mx"))
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1)
        val mnArr = array(mm.map(t => lit(t._2)).toIndexedSeq: _*)
        val rgArr = array(mm.map(t =>
          lit(math.max(t._3 - t._2, 1L))).toIndexedSeq: _*)
        val codes = base.select(col("vec_id"),
          transform(col("qv"), (x, i) => {
            val num = (x - element_at(mnArr, i + 1)) * 255
            val rg = element_at(rgArr, i + 1)
            ((num - pmod(num, rg)) / rg).cast("long")
          }).as("c"))
        val sqd = aggregate(
          zip_with(col("c"), col("qc"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, v) => acc + v)
        val q = codes.filter(col("vec_id") === 0).select(col("c").as("qc"))
        val sq10 = codes.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .withColumn("sq_dist", sqd)
          .select(col("vec_id"), col("sq_dist"))
          .orderBy(col("sq_dist"), col("vec_id")).limit(10)
        val exd = aggregate(
          zip_with(col("qv"), col("qq"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, v) => acc + v)
        val qe = base.filter(col("vec_id") === 0).select(col("qv").as("qq"))
        val ex10 = base.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qe))
          .withColumn("d2", exd)
          .orderBy(col("d2"), col("vec_id")).limit(10)
          .select(col("vec_id"), lit(true).as("in_exact"))
        sq10.join(ex10, Seq("vec_id"), "left")
          .withColumn("in_exact", coalesce(col("in_exact"), lit(false)))
          .orderBy(col("sq_dist"), col("vec_id"))
      },
      Some("""WITH e AS MATERIALIZED (
          SELECT vec_id, list_transform(embedding, x ->
            cast(floor(cast(x as double) * 1000.0) as bigint)) AS qv
          FROM embeddings),
        dims AS (SELECT unnest(range(0,
            (SELECT max(len(qv)) FROM e))) AS i),
        mm AS (
          SELECT i, min(qv[cast(i + 1 as int)]) AS mn,
            greatest(max(qv[cast(i + 1 as int)]) -
              min(qv[cast(i + 1 as int)]), 1) AS rg
          FROM e, dims GROUP BY i),
        mml AS (SELECT list(mn ORDER BY i) AS mns,
            list(rg ORDER BY i) AS rgs FROM mm),
        c AS MATERIALIZED (
          SELECT vec_id, list_transform(range(0, len(qv)), i ->
              ((qv[i + 1] - mns[i + 1]) * 255) // rgs[i + 1]) AS c
          FROM e, mml),
        q AS (SELECT c AS qc FROM c WHERE vec_id = 0),
        sq AS (
          SELECT c.vec_id,
            cast(list_sum(list_transform(range(0, len(c.c)), i ->
              (c.c[i + 1] - q.qc[i + 1]) * (c.c[i + 1] - q.qc[i + 1])))
              as bigint) AS sq_dist
          FROM c, q WHERE c.vec_id <> 0),
        top10 AS (SELECT vec_id, sq_dist FROM sq
          ORDER BY sq_dist, vec_id LIMIT 10),
        qe AS (SELECT qv AS qq FROM e WHERE vec_id = 0),
        ex AS (
          SELECT e.vec_id,
            list_sum(list_transform(range(0, len(e.qv)), i ->
              (e.qv[i + 1] - qe.qq[i + 1]) * (e.qv[i + 1] - qe.qq[i + 1])))
              AS d2
          FROM e, qe WHERE e.vec_id <> 0),
        ex10 AS (SELECT vec_id FROM ex ORDER BY d2, vec_id LIMIT 10)
        SELECT t.vec_id, t.sq_dist,
          t.vec_id IN (SELECT vec_id FROM ex10) AS in_exact
        FROM top10 t ORDER BY t.sq_dist, t.vec_id""")),

    // ------------------------------------------------------------------
    // FILTERED vector search (hybrid search) — the production ANN
    // problem every vector store actually faces: top-k under a
    // metadata predicate (label = 1 here). The scale-correct shape is
    // PRE-filtering: the predicate reaches the parquet scan
    // (PushedFilters in QProf), so the distance pass touches only
    // qualifying rows — at 100 TB with a 10% selective predicate
    // that is 10× less scan AND a guaranteed-full result. The
    // in_unfiltered_topk ride-along quantifies why the tempting
    // alternative — post-filtering a plain top-k — is WRONG: only the
    // flagged rows would survive post-filtering a k=10 unfiltered
    // search, the rest starve (you'd need k/selectivity ≈ 100 to fill
    // 10). Same argument drives IVF probing: cells × selectivity
    // decides probes, which is why real systems store per-cell label
    // histograms (s03's cells compose with this filter unchanged).
    // ------------------------------------------------------------------
    "s13_filtered_ann" -> Q(
      (s, d) => {
        val base = emb(s, d)
        val q = base.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        def scored = base.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .withColumn("cos", cosine(col("embedding"), col("qe")))
        val filtered10 = scored.filter(col("label") === 1)
          .select(col("vec_id"), col("label"), col("cos"))
          .orderBy(col("cos").desc, col("vec_id")).limit(10)
        val plain10 = scored
          .orderBy(col("cos").desc, col("vec_id")).limit(10)
          .select(col("vec_id"), lit(true).as("in_unfiltered_topk"))
        filtered10.join(plain10, Seq("vec_id"), "left")
          .withColumn("in_unfiltered_topk",
            coalesce(col("in_unfiltered_topk"), lit(false)))
          .orderBy(col("cos").desc, col("vec_id"))
      },
      Some("""WITH e AS (
          SELECT vec_id, label,
            list_transform(embedding, x -> cast(x as double)) AS v
          FROM embeddings),
        n AS (SELECT vec_id, label, v,
          sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        q AS (SELECT v AS qv, nrm AS qnrm FROM n WHERE vec_id = 0),
        f10 AS (
          SELECT n.vec_id, n.label,
            list_dot_product(n.v, q.qv) / n.nrm / q.qnrm AS cos
          FROM n, q
          WHERE n.vec_id <> 0 AND n.label = 1
          ORDER BY cos DESC, n.vec_id LIMIT 10),
        p10 AS (
          SELECT n.vec_id
          FROM n, q WHERE n.vec_id <> 0
          ORDER BY list_dot_product(n.v, q.qv) / n.nrm / q.qnrm DESC,
            n.vec_id
          LIMIT 10)
        SELECT f.vec_id, f.label, f.cos,
          f.vec_id IN (SELECT vec_id FROM p10) AS in_unfiltered_topk
        FROM f10 f
        ORDER BY f.cos DESC, f.vec_id""")),

    // ------------------------------------------------------------------
    // Cluster-balanced sample selection (the SemDeDup / cluster-pruning
    // family, Abbas et al. 2023): pick a fixed-size per-CLUSTER sample
    // instead of a global one, so the subset preserves the corpus's
    // semantic diversity — a global top-k or uniform sample
    // over-represents the dense clusters that dedup exists to thin.
    // Composition of two proven bounded shapes: s03's row-local
    // literal-codebook argmax assigns every vector to its nearest of
    // k=8 centroids with ZERO shuffle, then x24's KMV min-set trick
    // takes the per-cluster k-sample as the k smallest h60 hashes —
    // bounded ≤k·8-byte map-side buffers per cluster, never a
    // per-cluster row_number sort over the corpus. At 100 TB the only
    // data-scale work is one scan (assignment is row-local, the
    // sample aggregation is additive); the rank window below runs over
    // ≤ k·n_clusters survivors.
    // ------------------------------------------------------------------
    "s10_cluster_sample" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val kSample = 10
        val kmvset = udaf(new graft.functions.KmvMinSet(kSample),
          org.apache.spark.sql.Encoders.scalaLong)
        val assigned = assignToCodebook(s, d)
          .select(col("vec_id"), col("cent_id"),
            graft.functions.PortableHash.h60col(
              concat(lit("cbs_"), col("vec_id"))).as("h"))
        val cells = assigned.groupBy(col("cent_id"))
          .agg(count(lit(1)).as("n_members"),
            kmvset(col("h")).as("mins"))
        assigned.join(broadcast(cells), Seq("cent_id"))
          .filter(array_contains(col("mins"), col("h")))
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("cent_id"))
              .orderBy(col("h"), col("vec_id"))))
          // x24's collision guard: the k DISTINCT min-hashes could
          // admit k+1 vectors; the rank cut pins identical rows
          .filter(col("rnk") <= kSample)
          .select(col("cent_id").as("cluster"), col("n_members"),
            col("rnk"), col("vec_id"))
          .orderBy(col("cluster"), col("rnk"))
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> cast(x as double)) AS v FROM embeddings),
        n AS (SELECT vec_id, v,
          sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
          FROM n WHERE vec_id < 8),
        asgn AS (
          SELECT vec_id, cent_id FROM (
            SELECT n.vec_id, c.cent_id,
              row_number() OVER (PARTITION BY n.vec_id
                ORDER BY list_dot_product(n.v, c.cv) / n.nrm / c.cnrm
                  DESC, c.cent_id) AS rn
            FROM n, c) x WHERE rn = 1),
        h AS (SELECT cent_id, vec_id,
            ('0x' || substr(md5('cbs_' || vec_id), 1, 15))::BIGINT AS h
          FROM asgn),
        sz AS (SELECT cent_id, cast(count(*) as bigint) AS n_members
          FROM h GROUP BY 1),
        r AS (SELECT cent_id, vec_id, h,
            cast(row_number() OVER (PARTITION BY cent_id
              ORDER BY h, vec_id) as integer) AS rnk
          FROM h)
        SELECT r.cent_id AS cluster, sz.n_members, r.rnk, r.vec_id
        FROM r JOIN sz USING (cent_id) WHERE rnk <= 10
        ORDER BY cluster, rnk""")),

    // ------------------------------------------------------------------
    // Semantic decontamination — the embedding-level twin of x15's
    // n-gram benchmark-overlap gate (the check that catches PARAPHRASED
    // benchmark leakage an n-gram match misses). The benchmark set is
    // vec_id < 20 — FIXED-SIZE by construction at any corpus scale (a
    // real benchmark is a constant, not a corpus fraction) — and is
    // collected into a row-local literal batch exactly like s03's
    // codebook, so the corpus side is ONE zero-shuffle scan computing
    // max-cosine-vs-any-benchmark per vector; no join, no broadcast
    // exchange, nothing that grows with the corpus. Because the
    // synthetic vectors are near-uniform (corpus-vs-benchmark cosines
    // top out ~0.49), five PLANTED leak rows — benchmark vectors
    // shifted +0.02 per component, the m07 inject-the-defect
    // convention — make the gate provably bite: each leak must come
    // back flagged at the 0.95 threshold AND attributed to its true
    // source benchmark (best_bench recovers b_id). Output is the
    // top-30 most-benchmark-similar corpus vectors (a fixed top-k
    // report is robust to testdata regeneration).
    // ------------------------------------------------------------------
    "d17_semantic_decontam" -> Q(
      (s, d) => {
        val nb = 20
        val base = emb(s, d)
        // everything in array<double> from the scan: the planted
        // perturbation must be the same IEEE op in both engines, and
        // (cast to double) + 0.02 is exactly DuckDB's
        // list_transform(v, x -> cast(x as double) + 0.02)
        val corpus = base.filter(col("vec_id") >= nb)
          .select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("v"))
          .unionAll(base.filter(col("vec_id") < 5)
            .select((col("vec_id") + 100000L).as("vec_id"),
              transform(col("embedding"),
                x => x.cast("double") + lit(0.02)).as("v")))
        val benchArr = array(
          base.filter(col("vec_id") < nb)
            .select(col("vec_id"), col("embedding")).collect()
            .map(r => (r.getLong(0), r.getSeq[Float](1)))
            .sortBy(_._1)
            .map { case (id, v) =>
              struct(lit(id).as("b_id"),
                array(v.map(lit(_)).toIndexedSeq: _*).as("be"))
            }.toIndexedSeq: _*)
        corpus
          .select(col("vec_id"),
            aggregate(benchArr,
              struct(lit(-2.0).as("sim"), lit(-1L).as("b_id")),
              (acc, b) => {
                val sim = cosine(col("v"), b.getField("be"))
                // strict > keeps the FIRST (smallest b_id) on a tie —
                // matching the oracle's (cos DESC, b_id) row_number
                when(sim > acc.getField("sim"),
                  struct(sim.as("sim"), b.getField("b_id").as("b_id")))
                  .otherwise(acc)
              }).as("best"))
          .select(col("vec_id"), col("best.b_id").as("best_bench"),
            col("best.sim").as("max_cos"))
          .withColumn("contaminated", col("max_cos") >= 0.95)
          .orderBy(col("max_cos").desc, col("vec_id"))
          .limit(30)
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> cast(x as double)) AS v FROM embeddings),
        corpus AS (
          SELECT vec_id, v FROM e WHERE vec_id >= 20
          UNION ALL
          SELECT vec_id + 100000, list_transform(v, x -> x + 0.02)
          FROM e WHERE vec_id < 5),
        n AS (SELECT vec_id, v,
          sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM corpus),
        b AS (SELECT vec_id AS b_id, v AS bv,
          sqrt(list_sum(list_transform(v, x -> x * x))) AS bnrm
          FROM e WHERE vec_id < 20),
        best AS (
          SELECT vec_id, b_id AS best_bench, cos AS max_cos FROM (
            SELECT c.vec_id, b.b_id,
              list_dot_product(c.v, b.bv) / c.nrm / b.bnrm AS cos,
              row_number() OVER (PARTITION BY c.vec_id
                ORDER BY list_dot_product(c.v, b.bv) / c.nrm / b.bnrm
                  DESC, b.b_id) AS rn
            FROM n c, b) x WHERE rn = 1)
        SELECT vec_id, best_bench, max_cos, max_cos >= 0.95 AS contaminated
        FROM best ORDER BY max_cos DESC, vec_id LIMIT 30""")),

    // ------------------------------------------------------------------
    // Cross-source corpus-overlap audit — m08's sketch-matrix idea
    // applied to CONTENT: per SOURCE, one bounded KMV min-set sketch
    // over the h60s of every document's distinct 3-shingles (k·8 bytes
    // of additive state per source, map-side partials — the hot source
    // never ships its shingles), then the n_sources² overlap matrix is
    // pure list arithmetic over 20 metadata rows (Beyer et al.
    // shared-fraction Jaccard, q71/m08's estimator). This is the audit
    // a mixture plan (x16) runs FIRST at 100 TB: two sources with high
    // shingle overlap are double-counting the same content, and
    // weighting them independently over-samples it — the corpus-level
    // complement of d03's doc-level dedup, at sketch cost instead of
    // pair cost. Top-20 source pairs by estimated Jaccard.
    // ------------------------------------------------------------------
    "d18_source_overlap" -> Q(
      (s, d) => {
        val k = 128
        val kmvset = udaf(new graft.functions.KmvMinSet(k),
          org.apache.spark.sql.Encoders.scalaLong)
        val sh = docs(s, d)
          .select(col("source"), words(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("source"), explode(shingles3(col("toks"))).as("sgl"))
          .select(col("source"), graft.functions.PortableHash.h60col(
            concat(lit("sov_"), col("sgl"))).as("h"))
        val sk = sh.groupBy(col("source")).agg(kmvset(col("h")).as("sk"))
        val a = sk.select(col("source").as("src_a"), col("sk").as("ska"))
        val b = sk.select(col("source").as("src_b"), col("sk").as("skb"))
        a.crossJoin(b).filter(col("src_a") < col("src_b"))
          .withColumn("m", slice(
            array_sort(array_distinct(concat(col("ska"), col("skb")))),
            1, k))
          .withColumn("shared", size(filter(col("m"), x =>
            array_contains(col("ska"), x) &&
              array_contains(col("skb"), x))))
          .withColumn("jacc_est", col("shared").cast("double") /
            size(col("m")).cast("double"))
          .select(col("src_a"), col("src_b"),
            col("shared").cast("bigint").as("n_shared"), col("jacc_est"))
          .orderBy(col("jacc_est").desc, col("src_a"), col("src_b"))
          .limit(20)
      },
      Some("""WITH t0 AS (
          SELECT source, string_split_regex(
            regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents),
        sh AS (
          SELECT source, unnest(list_distinct(list_transform(
            range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sgl
          FROM t0 WHERE len(w) >= 3),
        hs AS (
          SELECT DISTINCT source,
            ('0x' || substr(md5('sov_' || sgl), 1, 15))::BIGINT AS h
          FROM sh),
        rk AS (
          SELECT source, h,
            row_number() OVER (PARTITION BY source ORDER BY h) AS rn
          FROM hs),
        sk AS (
          SELECT source, list(h ORDER BY h) AS sk
          FROM rk WHERE rn <= 128 GROUP BY source),
        pairs AS (
          SELECT a.source AS src_a, b.source AS src_b,
            a.sk AS ska, b.sk AS skb,
            list_sort(list_distinct(list_concat(a.sk, b.sk)))[1:128] AS m
          FROM sk a, sk b WHERE a.source < b.source),
        scored AS (
          SELECT src_a, src_b,
            len(list_filter(m, x -> list_contains(ska, x)
              AND list_contains(skb, x))) AS shared,
            cast(len(list_filter(m, x -> list_contains(ska, x)
              AND list_contains(skb, x))) as double) /
              cast(len(m) as double) AS jacc_est
          FROM pairs)
        SELECT src_a, src_b, cast(shared as bigint) AS n_shared,
          jacc_est
        FROM scored
        ORDER BY jacc_est DESC, src_a, src_b LIMIT 20""")),

    // ------------------------------------------------------------------
    // INCREMENTAL ADMISSION PIPELINE — p01's day-N face: what a
    // production corpus runs on EVERY new data drop, composed from the
    // proven incremental pieces so the batch (src16-19, d16's split)
    // is admitted without ever re-reading day-0 text:
    //   1. quality gate (p01's x02 arithmetic) on the INCOMING docs
    //      only;
    //   2. near-dup admission: quality survivors band themselves once
    //      and probe (a) the STORED day-0 band index from parquet
    //      (d16's layout — history never re-shingles) and (b) the
    //      earlier-id survivors of the SAME batch (a drop can
    //      self-duplicate); candidates verify by exact Jaccard ≥ 0.4
    //      over candidate-only shingles. Batch convention, stated
    //      honestly: a doc matching ANY earlier-id batch survivor is
    //      rejected even if that doc was itself rejected — the batch
    //      cluster collapses to its min-id representative, which must
    //      itself be novel vs history; deterministic in one pass, the
    //      same over-rejection a sequential one-at-a-time ingest
    //      produces;
    //   3. decontamination (x15's gram-8 rule, thresholds as p01
    //      stage 3) + benchmark-member exclusion.
    // Output: the per-(stage, lang) admission funnel — the report an
    // ingest service logs per drop. Scale shape: every stage touches
    // ONLY the incoming batch (plus index probes and candidate
    // shingle lookups); day-0 cost was paid once at index-build time.
    // ------------------------------------------------------------------
    // ------------------------------------------------------------------
    // RELEASE DATASHEET — the per-language data card a corpus release
    // ships (Gebru et al.'s datasheets, in engine form): one row per
    // language with the numbers every downstream consumer asks first.
    // n_dup_docs from the AT-SCALE posting-index clusters (x30's path
    // — the keeper is the cluster min, duplicates counted against
    // their language); n_contaminated via the 4-gram benchmark screen
    // (the 8-gram production screen of x15 finds zero on this corpus —
    // a structurally-empty column reports nothing, so the datasheet
    // uses the sensitive variant and says so); n_fail_quality is
    // x33's 4-rule stack, any-fail. ONE tokenize feeds all four
    // families; the only corpus-scale joins are the doc-keyed cluster
    // /contamination attachments.
    // ------------------------------------------------------------------
    "p03_release_datasheet" -> Q(
      (s, d) => {
        val base = docs(s, d)
          .select(col("doc_id"), col("lang"), col("text"),
            words(col("text")).as("w"))
          .localCheckpoint()
        // dup clusters over the full corpus (x30's machinery)
        val pairs = postingJaccardPairsFrom(
          base.filter(size(col("w")) >= 3)
            .select(col("doc_id"), col("w").as("toks")))
          .select(col("doc_a"), col("doc_b"))
        val cc = graft.operators.ConnectedComponents.components(pairs)
        // 4-gram benchmark contamination screen
        def grams4(toks: Column): Column =
          when(size(toks) >= 4,
            array_distinct(transform(sequence(lit(0), size(toks) - 4),
              i => concat_ws(" ", (0 until 4).map(o =>
                element_at(toks, i + o + 1)): _*))))
            .otherwise(array().cast("array<string>"))
        val g4 = base.select(col("doc_id"),
          explode(grams4(col("w"))).as("ng"))
        val benchNg = g4.filter(col("doc_id") % 97 === 0)
          .select(col("ng")).distinct()
        val contam = g4.filter(col("doc_id") % 97 =!= 0)
          .join(benchNg, Seq("ng"), "left_semi")
          .select(col("doc_id")).distinct()
          .withColumn("is_contam", lit(true))
        // x33's quality stack, any-fail
        val g2d = base.select(col("doc_id"), col("text"), col("w"),
          when(size(col("w")) >= 2,
            transform(sequence(lit(1), size(col("w")) - 1), i =>
              concat_ws(" ", element_at(col("w"), i),
                element_at(col("w"), i + 1))))
            .otherwise(array().cast("array<string>")).as("g2"))
        val nTok = size(col("w")).cast("double")
        val top2 = when(size(col("g2")) > 0,
          array_max(transform(col("g2"), g =>
            size(filter(col("g2"), x => x === g)))).cast("double") /
            size(col("g2")).cast("double"))
          .otherwise(lit(0.0))
        val mwl = length(regexp_replace(col("text"), "\\s+", ""))
          .cast("double") / nTok
        val ttr = size(array_distinct(col("w"))).cast("double") / nTok
        val failQ = g2d.select(col("doc_id"),
          ((mwl < 4.2) || (size(col("w")) < 25) || (top2 >= 0.1) ||
            (ttr < 0.55)).as("fail_q"))
        base
          .join(cc.select(col("id").as("doc_id"),
            col("cluster")), Seq("doc_id"), "left")
          .join(contam, Seq("doc_id"), "left")
          .join(failQ, Seq("doc_id"), "left")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(size(col("w"))).cast("long").as("n_tokens"),
            count(when(coalesce(col("cluster"), col("doc_id")) =!=
              col("doc_id"), 1)).as("n_dup_docs"),
            count(when(col("is_contam"), 1)).as("n_contaminated"),
            count(when(col("fail_q"), 1)).as("n_fail_quality"))
          .orderBy(col("lang"))
      },
      Some("""WITH RECURSIVE t0 AS (
          SELECT doc_id, lang, text,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'),
              '\s+') AS w
          FROM documents),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sw
          FROM t0 WHERE len(w) >= 3),
        dposts AS (SELECT doc_id, unnest(sw) AS fp FROM sh),
        dfc AS (SELECT fp, count(*) AS df FROM dposts GROUP BY fp),
        okposts AS (
          SELECT p.doc_id, p.fp FROM dposts p
          JOIN dfc ON dfc.fp = p.fp AND dfc.df <= 50),
        dsizes AS (SELECT doc_id, cast(count(*) as bigint) AS sz
          FROM okposts GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            cast(count(*) as bigint) AS shared_fps
          FROM okposts a
          JOIN okposts b ON b.fp = a.fp AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
        prs AS (
          SELECT s.doc_a, s.doc_b FROM shared s
          JOIN dsizes x ON x.doc_id = s.doc_a
          JOIN dsizes y ON y.doc_id = s.doc_b
          WHERE cast(s.shared_fps as double) /
                cast(x.sz + y.sz - s.shared_fps as double) >= 0.4),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM prs
          UNION SELECT doc_b, doc_a FROM prs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        ccx AS (
          SELECT src AS doc_id, least(src, min(dst)) AS cluster
          FROM reach GROUP BY src),
        g4 AS (
          SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(w) >= 4 THEN
              list_transform(range(1, len(w) - 2), i ->
                w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
            ELSE [] END)) AS ng
          FROM t0),
        bench AS (SELECT DISTINCT ng FROM g4 WHERE doc_id % 97 = 0),
        contam AS (
          SELECT DISTINCT g4.doc_id FROM g4
          JOIN bench USING (ng) WHERE g4.doc_id % 97 <> 0),
        gm AS (
          SELECT doc_id, text, w,
            list_transform(range(1, len(w)), i ->
              w[i] || ' ' || w[i+1]) AS g2
          FROM t0),
        qm AS (
          SELECT doc_id,
            cast(length(regexp_replace(text, '\s+', '', 'g')) as double)
              / len(w) AS mwl,
            len(w) AS nt,
            cast(len(list_distinct(w)) as double) / len(w) AS ttr,
            CASE WHEN len(g2) > 0 THEN
              cast(list_max(list_transform(g2, y ->
                len(list_filter(g2, x -> x = y)))) as double) / len(g2)
            ELSE 0.0 END AS tb
          FROM gm),
        flagged AS (
          SELECT doc_id,
            (mwl < 4.2 OR nt < 25 OR tb >= 0.1 OR ttr < 0.55) AS fail_q
          FROM qm)
        SELECT t0.lang,
          cast(count(*) as bigint) AS n_docs,
          cast(sum(len(t0.w)) as bigint) AS n_tokens,
          cast(count(*) FILTER (WHERE
            coalesce(ccx.cluster, t0.doc_id) <> t0.doc_id) as bigint)
            AS n_dup_docs,
          cast(count(*) FILTER (WHERE contam.doc_id IS NOT NULL)
            as bigint) AS n_contaminated,
          cast(count(*) FILTER (WHERE f.fail_q) as bigint)
            AS n_fail_quality
        FROM t0
        LEFT JOIN ccx ON ccx.doc_id = t0.doc_id
        LEFT JOIN contam ON contam.doc_id = t0.doc_id
        LEFT JOIN flagged f ON f.doc_id = t0.doc_id
        GROUP BY t0.lang ORDER BY t0.lang""")),

    "p02_incremental_admission" -> Q(
      (s, d) => {
        val bands = 16; val rowsPerBand = 4
        val incomingSrcs = Seq("src16", "src17", "src18", "src19")
        val incoming = col("source").isin(incomingSrcs: _*)
        val idxPath = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR",
          sys.props("java.io.tmpdir") + "/graft-index") +
          "/p02-band-index-" + new java.io.File(d).getName
        bandIndex(docs(s, d).filter(!incoming), bands, rowsPerBand)
          .write.mode("overwrite").partitionBy("band").parquet(idxPath)

        // stage 1: quality gate on incoming only (p01's arithmetic)
        val tokd = docs(s, d).filter(incoming)
          .select(col("doc_id"), col("lang"), col("text"),
            words(col("text")).as("w"))
        val nTok = size(col("w")).cast("double")
        val nChars = length(col("text")).cast("double")
        val punct = (length(col("text")) -
          length(regexp_replace(col("text"), "[.,!?;:]", "")))
          .cast("double")
        val stops = size(filter(col("w"), x =>
          x.isin("the", "a", "of", "and", "to", "in"))).cast("double")
        val avgWordLen = length(regexp_replace(col("text"), "\\s+", ""))
          .cast("double") / nTok
        val inc0 = tokd.withColumn("quality",
          (stops / nTok) * 0.4 +
            (lit(1.0) - punct / nChars) * 0.3 +
            when(avgWordLen >= 3 && avgWordLen <= 8, 0.3).otherwise(0.0))
          .select(col("doc_id"), col("lang"), col("w"), col("quality"))
          .localCheckpoint()
        val q1 = inc0.filter(col("quality") >= 0.62)

        // stage 2: probe stored index + earlier-id batch survivors
        val q1docs = docs(s, d).filter(incoming)
          .join(q1.select(col("doc_id")), Seq("doc_id"), "left_semi")
        val qb = bandIndex(q1docs, bands, rowsPerBand).localCheckpoint()
        val stored = s.read.parquet(idxPath)
          .select(col("band"), col("band_hash"),
            col("doc_id").as("doc_idx"))
        val candHist = qb
          .select(col("band"), col("band_hash"),
            col("doc_id").as("doc_new"))
          .join(stored, Seq("band", "band_hash"))
          .select(col("doc_new"), col("doc_idx"))
        val candBatch = qb.as("l").join(qb.as("r"),
            Seq("band", "band_hash"))
          .select(col("l.doc_id").as("doc_new"),
            col("r.doc_id").as("doc_idx"))
          .filter(col("doc_idx") < col("doc_new"))
        val cand = candHist.unionAll(candBatch).distinct()
        val candIds = cand
          .select(explode(array(col("doc_new"), col("doc_idx")))
            .as("doc_id")).distinct()
        val sh = docShingles(s, d)
          .join(candIds, Seq("doc_id"), "left_semi")
          .localCheckpoint()
        val rejected = cand
          .join(sh.select(col("doc_id").as("doc_new"),
            col("w").as("wa")), Seq("doc_new"))
          .join(sh.select(col("doc_id").as("doc_idx"),
            col("w").as("wb")), Seq("doc_idx"))
          .filter(size(array_intersect(col("wa"), col("wb")))
            .cast("double") /
            size(array_union(col("wa"), col("wb"))).cast("double")
            >= 0.4)
          .select(col("doc_new").as("doc_id")).distinct()
        val q2 = q1.join(rejected, Seq("doc_id"), "left_anti")

        // stage 3: decontamination (p01 stage-3 thresholds) + bench-
        // member exclusion
        def grams8(toks: Column): Column =
          when(size(toks) >= 8,
            array_distinct(transform(sequence(lit(0), size(toks) - 8),
              i => concat_ws(" ", (0 until 8).map(o =>
                element_at(toks, i + o + 1)): _*))))
            .otherwise(array().cast("array<string>"))
        val benchNg = docs(s, d).filter(col("doc_id") % 97 === 0)
          .select(words(col("text")).as("toks"))
          .select(explode(grams8(col("toks"))).as("ng"))
          .distinct()
        val posts = q2.select(col("doc_id"),
          explode(grams8(col("w"))).as("ng"))
        val perDoc = posts.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_ngrams"))
        val contam = posts.join(benchNg, "ng").groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_contaminated"))
        val q3 = q2.filter(col("doc_id") % 97 =!= 0)
          .join(perDoc, Seq("doc_id"), "left")
          .join(contam, Seq("doc_id"), "left")
          .withColumn("ngc", coalesce(col("n_ngrams"), lit(0L)))
          .withColumn("cnc", coalesce(col("n_contaminated"), lit(0L)))
          .filter(!(col("cnc") >= 5 ||
            (col("ngc") > 0 && col("cnc").cast("double") /
              col("ngc").cast("double") > 0.1)))

        def census(df: DataFrame, stage: String) =
          df.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
            .select(lit(stage).as("stage"), col("lang"), col("n_docs"))
        census(inc0, "0_incoming")
          .unionAll(census(q1, "1_quality"))
          .unionAll(census(q2, "2_dedup"))
          .unionAll(census(q3, "3_admitted"))
          .orderBy(col("stage"), col("lang"))
      },
      Some("""WITH perms AS (
          SELECT
            list_transform(range(0, 64), i ->
              ('0x' || substr(md5('perm_a_' || i), 1, 15))::BIGINT
                % 2147483646 + 1) AS pa,
            list_transform(range(0, 64), i ->
              ('0x' || substr(md5('perm_b_' || i), 1, 15))::BIGINT
                % 2147483647) AS pb),
        t0 AS (
          SELECT doc_id, lang, text,
            source IN ('src16','src17','src18','src19') AS inc,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'),
              '\s+') AS w
          FROM documents),
        inc0 AS (
          SELECT doc_id, lang, w,
            (cast(len(list_filter(w, x -> x IN
              ('the','a','of','and','to','in'))) as double) /
              cast(len(w) as double)) * 0.4 +
            (1.0 - cast(length(text) - length(regexp_replace(text,
              '[.,!?;:]', '', 'g')) as double) /
              cast(length(text) as double)) * 0.3 +
            CASE WHEN (cast(length(regexp_replace(text, '\s+', '', 'g'))
                as double) / cast(len(w) as double)) >= 3
              AND (cast(length(regexp_replace(text, '\s+', '', 'g'))
                as double) / cast(len(w) as double)) <= 8
              THEN 0.3 ELSE 0.0 END AS quality
          FROM t0 WHERE inc),
        q1 AS (SELECT doc_id, lang, w FROM inc0 WHERE quality >= 0.62),
        eligible AS (
          SELECT doc_id, false AS inc, w FROM t0 WHERE NOT inc
          UNION ALL
          SELECT doc_id, true, w FROM q1),
        shl AS (
          SELECT doc_id, inc,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sw
          FROM eligible WHERE len(w) >= 3),
        hs AS (
          SELECT doc_id, inc,
            list_transform(sw, x ->
              ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647) AS h
          FROM shl),
        sig AS (
          SELECT doc_id, inc,
            list_transform(range(0, 64), i ->
              list_min(list_transform(h, x ->
                (pa[i+1] * x + pb[i+1]) % 2147483647))) AS sig
          FROM hs, perms),
        banded AS (
          SELECT doc_id, inc, b AS band,
            list_reduce(list_prepend(0::BIGINT, sig[b*4+1 : b*4+4]),
              (acc, v) -> (acc * 1000003 + v) % 2147483647) AS band_hash
          FROM sig, range(0, 16) t(b)),
        cand AS (
          SELECT DISTINCT l.doc_id AS doc_new, r.doc_id AS doc_idx
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.band_hash = r.band_hash
          WHERE l.inc AND (NOT r.inc OR r.doc_id < l.doc_id)),
        shd AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS w
          FROM t0 WHERE len(w) >= 3),
        rejected AS (
          SELECT DISTINCT c.doc_new AS doc_id
          FROM cand c
          JOIN shd x ON x.doc_id = c.doc_new
          JOIN shd y ON y.doc_id = c.doc_idx
          WHERE cast(len(list_intersect(x.w, y.w)) as double) /
                cast(len(list_distinct(list_concat(x.w, y.w)))
                  as double) >= 0.4),
        q2 AS (
          SELECT q1.* FROM q1
          WHERE q1.doc_id NOT IN (SELECT doc_id FROM rejected)),
        ng AS (
          SELECT doc_id,
            CASE WHEN len(w) >= 8 THEN
              list_distinct(list_transform(range(1, len(w) - 6),
                i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3],
                  w[i+4], w[i+5], w[i+6], w[i+7])))
            ELSE [] END AS ngs
          FROM q2),
        benchng AS (
          SELECT DISTINCT unnest(
            CASE WHEN len(w) >= 8 THEN
              list_distinct(list_transform(range(1, len(w) - 6),
                i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3],
                  w[i+4], w[i+5], w[i+6], w[i+7])))
            ELSE [] END) AS ng
          FROM (SELECT string_split_regex(regexp_replace(text,
              '^\s+|\s+$', '', 'g'), '\s+') AS w
            FROM documents WHERE doc_id % 97 = 0)),
        posts AS (SELECT doc_id, unnest(ngs) AS ng FROM ng),
        per_doc AS (
          SELECT doc_id, cast(count(*) as bigint) AS n_ngrams
          FROM posts GROUP BY doc_id),
        contam AS (
          SELECT p.doc_id, cast(count(*) as bigint) AS n_contaminated
          FROM posts p JOIN benchng b ON p.ng = b.ng GROUP BY p.doc_id),
        q3 AS (
          SELECT q2.doc_id, q2.lang FROM q2
          LEFT JOIN per_doc pd ON pd.doc_id = q2.doc_id
          LEFT JOIN contam cn ON cn.doc_id = q2.doc_id
          WHERE q2.doc_id % 97 <> 0
            AND NOT (coalesce(cn.n_contaminated, 0) >= 5 OR
              (coalesce(pd.n_ngrams, 0) > 0 AND
                cast(coalesce(cn.n_contaminated, 0) as double) /
                cast(coalesce(pd.n_ngrams, 0) as double) > 0.1)))
        SELECT * FROM (
          SELECT '0_incoming' AS stage, lang,
            cast(count(*) as bigint) AS n_docs
          FROM inc0 GROUP BY lang
          UNION ALL
          SELECT '1_quality', lang, cast(count(*) as bigint)
          FROM q1 GROUP BY lang
          UNION ALL
          SELECT '2_dedup', lang, cast(count(*) as bigint)
          FROM q2 GROUP BY lang
          UNION ALL
          SELECT '3_admitted', lang, cast(count(*) as bigint)
          FROM q3 GROUP BY lang) u
        ORDER BY stage, lang""")),

    // ------------------------------------------------------------------
    // Deterministic per-stratum reservoir sample — the "pull k docs
    // per (lang, source) cell for eval/inspection" pipeline staple, as
    // rank-by-portable-hash: keep the 5 docs per stratum with the
    // smallest h60('rsv_' || doc_id). Statistically this IS reservoir
    // sampling (uniform without replacement, any k, any stream order)
    // but deterministic and rerun-stable — the property a lineage-
    // audited pipeline needs that Math.random() reservoirs can't give.
    //
    // Executed through the custom TopKPerKey PHYSICAL operator (its
    // second catalog consumer after q78, on a different key shape:
    // 100 string-pair strata vs thousands of bigint orderkeys): the
    // map side keeps a bounded 5-row heap per stratum, so the exchange
    // ships ≤ 5 rows per (stratum, input partition) — at 100 TB the
    // sample job's shuffle is a trickle while the row_number window
    // formulation would sort the corpus. The oracle IS that window
    // formulation — the equivalence proof doubling as the spec.
    // ------------------------------------------------------------------
    "x36_stratified_reservoir" -> Q(
      (s, d) => {
        graft.plans.TopKPerKey.install(s)
        val keyed = docs(s, d)
          .select(col("lang"), col("source"), col("doc_id"),
            graft.functions.PortableHash.h60col(
              concat(lit("rsv_"), col("doc_id"))).as("sample_key"))
        graft.plans.TopKPerKey(keyed, Seq("lang", "source"),
          Seq(("sample_key", false), ("doc_id", false)), 5)
          .orderBy(col("lang"), col("source"), col("sample_key"),
            col("doc_id"))
      },
      Some("""WITH k AS (
          SELECT lang, source, doc_id,
            ('0x' || substr(md5('rsv_' || doc_id), 1, 15))::BIGINT
              AS sample_key
          FROM documents),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY lang, source
            ORDER BY sample_key, doc_id) AS rn
          FROM k)
        SELECT lang, source, doc_id, sample_key
        FROM r WHERE rn <= 5
        ORDER BY lang, source, sample_key, doc_id""")),

    // ------------------------------------------------------------------
    // A/B experiment readout — deterministic arm assignment (h60
    // parity per user: the x17 hash-split discipline applied to
    // EXPERIMENTS — stable across reruns and engines, no assignment
    // table to store) joined to the customer dimension for a
    // per-segment lift table: control vs treatment signup→purchase
    // conversion, integer permille, and the per-segment delta. All
    // counting arithmetic integer-exact; the only shuffles are one
    // user-level groupBy of events (data-scale, unavoidable) and a
    // users×customer equi-join — segment pivot and lift run on the
    // user-scale frame. Conditional aggregation (count FILTER) does
    // the arm pivot — no self-join of the two arms.
    // ------------------------------------------------------------------
    "x37_ab_lift" -> Q(
      (s, d) => {
        val users = t(s, d, "events")
          .groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase", 1)
            .otherwise(0)).as("converted"))
          .withColumn("arm",
            pmod(graft.functions.PortableHash.h60col(
              concat(lit("ab_"), col("user_id"))), lit(2L)))
        val seg = users.join(t(s, d, "customer")
            .select(col("c_custkey").as("user_id"),
              col("c_mktsegment").as("segment")),
          Seq("user_id"))
        seg.groupBy(col("segment"))
          .agg(
            count(when(col("arm") === 0, 1)).as("ctrl_users"),
            count(when(col("arm") === 0 && col("converted") === 1, 1))
              .as("ctrl_conv"),
            count(when(col("arm") === 1, 1)).as("trt_users"),
            count(when(col("arm") === 1 && col("converted") === 1, 1))
              .as("trt_conv"))
          .select(col("segment"), col("ctrl_users"), col("ctrl_conv"),
            col("trt_users"), col("trt_conv"),
            (expr("trt_conv * 1000 div trt_users") -
              expr("ctrl_conv * 1000 div ctrl_users")).as("lift_pm"))
          .orderBy(col("segment"))
      },
      Some("""WITH u AS (
          SELECT user_id,
            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS converted,
            ('0x' || substr(md5('ab_' || user_id), 1, 15))::BIGINT
              % 2 AS arm
          FROM events GROUP BY user_id),
        s AS (
          SELECT c.c_mktsegment AS segment, u.arm, u.converted
          FROM u JOIN customer c ON c.c_custkey = u.user_id)
        SELECT segment,
          cast(count(*) FILTER (WHERE arm = 0) as bigint) AS ctrl_users,
          cast(count(*) FILTER (WHERE arm = 0 AND converted = 1)
            as bigint) AS ctrl_conv,
          cast(count(*) FILTER (WHERE arm = 1) as bigint) AS trt_users,
          cast(count(*) FILTER (WHERE arm = 1 AND converted = 1)
            as bigint) AS trt_conv,
          cast(count(*) FILTER (WHERE arm = 1 AND converted = 1) * 1000
            // count(*) FILTER (WHERE arm = 1) -
            count(*) FILTER (WHERE arm = 0 AND converted = 1) * 1000
            // count(*) FILTER (WHERE arm = 0) as bigint) AS lift_pm
        FROM s GROUP BY segment
        ORDER BY segment""")),

    // ------------------------------------------------------------------
    // Scalar quantization (SQ8, the FAISS ScalarQuantizer shape) — the
    // third vector-compression posture next to s06's PQ and the
    // full-precision scan: per-DIMENSION affine [min, max] → uint8
    // codes (4× memory vs float32, 8× vs the double working set;
    // at 100 TB the scan's byte volume IS the query cost, so SQ is
    // the first dial a vector store turns). Scoring follows the
    // production recipe: RECONSTRUCT each code to its cell midpoint
    // (mn + (q + 0.5)·span/255) and rank by reconstructed cosine —
    // NOT by raw integer dot, whose affine shift destroys the ranking
    // (measured: 0/10 recall vs 10/10 for reconstruct-and-score on
    // this corpus; the delta is the whole point of the midpoint
    // dequantization step).
    //
    // The 64 (mn, span) pairs are one posexplode agg collected to
    // LITERAL arrays (metadata-scale, the codebook precedent), so
    // quantize→reconstruct→cosine is a row-local zero-shuffle
    // projection over the corpus; top-10 + recall flag against the
    // full-precision ranking (s01's formulation) in one output.
    // Every double expression is written with identical operation
    // order in both engines — floor/quantize/reconstruct/cosine all
    // hash-match bit-for-bit.
    // ------------------------------------------------------------------
    "s17_sq_int8" -> Q(
      (s, d) => {
        val base = emb(s, d).select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        val stats = base
          .select(posexplode(col("v")).as(Seq("i", "x")))
          .groupBy(col("i"))
          .agg(min(col("x")).as("mn"),
            (max(col("x")) - min(col("x"))).as("span"))
          .orderBy(col("i")).collect()
        val mns = array(stats.map(r =>
          lit(r.getDouble(1))).toIndexedSeq: _*)
        val sps = array(stats.map(r =>
          lit(r.getDouble(2))).toIndexedSeq: _*)
        def quantize(v: Column): Column =
          transform(v, (x, j) =>
            when(element_at(sps, j + 1) === 0d, lit(0L))
              .otherwise(floor((x - element_at(mns, j + 1)) * lit(255.0) /
                element_at(sps, j + 1))))
        def reconstruct(qv: Column): Column =
          transform(qv, (q, j) =>
            element_at(mns, j + 1) + (q.cast("double") + lit(0.5)) *
              element_at(sps, j + 1) / lit(255.0))
        val rec = base.select(col("vec_id"),
          reconstruct(quantize(col("v"))).as("rv"))
        val qrow = rec.filter(col("vec_id") === 0)
          .select(col("rv").as("qrv"))
        val topQ = rec.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qrow))
          .withColumn("qcos", cosine(col("rv"), col("qrv")))
          .select(col("vec_id"), col("qcos"))
          .orderBy(col("qcos").desc, col("vec_id")).limit(10)
        val qx = base.filter(col("vec_id") === 0)
          .select(col("v").as("qe"))
        val topE = base.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qx))
          .withColumn("cos", cosine(col("v"), col("qe")))
          .orderBy(col("cos").desc, col("vec_id")).limit(10)
          .select(col("vec_id"), lit(true).as("flag"))
        topQ.join(topE, Seq("vec_id"), "left")
          .select(col("vec_id"), col("qcos"),
            coalesce(col("flag"), lit(false)).as("in_exact"))
          .orderBy(col("qcos").desc, col("vec_id"))
      },
      Some("""WITH e AS (
          SELECT vec_id,
            list_transform(embedding, x -> cast(x as double)) AS v
          FROM embeddings),
        st AS (
          SELECT j.i, min(v[j.i + 1]) AS mn,
            max(v[j.i + 1]) - min(v[j.i + 1]) AS span
          FROM e, LATERAL (SELECT unnest(range(0, len(v))) AS i) j
          GROUP BY j.i),
        arrs AS (
          SELECT list(mn ORDER BY i) AS mns,
            list(span ORDER BY i) AS sps FROM st),
        q0 AS (
          SELECT vec_id,
            list_transform(range(0, len(v)), j ->
              CASE WHEN sps[j+1] = 0 THEN cast(0 as bigint)
                ELSE cast(floor((v[j+1] - mns[j+1]) * 255.0 / sps[j+1])
                  as bigint)
              END) AS qv
          FROM e, arrs),
        rec AS (
          SELECT vec_id,
            list_transform(range(0, len(qv)), j ->
              mns[j+1] + (cast(qv[j+1] as double) + 0.5) * sps[j+1]
                / 255.0) AS rv
          FROM q0, arrs),
        rn AS (SELECT vec_id, rv,
            sqrt(list_sum(list_transform(rv, x -> x * x))) AS nrm
          FROM rec),
        rq AS (SELECT rv AS qrv, nrm AS qnrm FROM rn WHERE vec_id = 0),
        top_q AS (
          SELECT rn.vec_id,
            list_dot_product(rn.rv, rq.qrv) / rn.nrm / rq.qnrm AS qcos
          FROM rn, rq WHERE rn.vec_id <> 0
          ORDER BY qcos DESC, rn.vec_id LIMIT 10),
        n AS (SELECT vec_id, v,
            sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM e),
        qx AS (SELECT v AS qv2, nrm AS qnrm FROM n WHERE vec_id = 0),
        top_e AS (
          SELECT n.vec_id FROM n, qx WHERE n.vec_id <> 0
          ORDER BY list_dot_product(n.v, qx.qv2) / n.nrm / qx.qnrm DESC,
            n.vec_id LIMIT 10)
        SELECT t.vec_id, t.qcos,
          t.vec_id IN (SELECT vec_id FROM top_e) AS in_exact
        FROM top_q t ORDER BY t.qcos DESC, t.vec_id""")),

    // ------------------------------------------------------------------
    // Zipf-law fit — the corpus-health regression every dataset report
    // quotes: OLS slope of ln(frequency) on ln(rank) over the top-100
    // types per language (natural text ≈ −1; this synthetic corpus's
    // 31-type vocabulary reads ≈ −0.2, honestly flat). The fit is
    // hash-exact cross-engine because every irrational enters through
    // the x35 discipline: the four regression sums are ORDERED left
    // folds over the rank-sorted count list (Spark aggregate() ≡
    // DuckDB list_reduce — never an unordered double SUM), and the
    // final slope/intercept are single expressions over those four
    // scalars written in identical operation order. Data-scale work is
    // one tokenize + one (lang, word) groupBy; the ranked top-100 per
    // lang is a lang-keyed window, and the folds run on 5 rows of
    // ≤ 100-element lists — metadata-scale.
    // ------------------------------------------------------------------
    "x39_zipf_fit" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val counts = docs(s, d)
          .select(col("lang"), explode(words(col("text"))).as("w"))
          .groupBy(col("lang"), col("w"))
          .agg(count(lit(1)).as("cnt"))
        val ranked = counts
          .withColumn("rk", row_number().over(Window.partitionBy(col("lang"))
            .orderBy(col("cnt").desc, col("w"))))
          .filter(col("rk") <= 100)
        val top = ranked.groupBy(col("lang"))
          .agg(transform(array_sort(collect_list(struct(col("rk"),
            col("cnt")))), x => x.getField("cnt")).as("cs"))
        val withSums = top
          .withColumn("n", size(col("cs")))
          .withColumn("sx", aggregate(sequence(lit(1), col("n")),
            lit(0.0), (a, r) => a + log(r.cast("double"))))
          .withColumn("sxx", aggregate(sequence(lit(1), col("n")),
            lit(0.0), (a, r) =>
              a + log(r.cast("double")) * log(r.cast("double"))))
          .withColumn("sy", aggregate(col("cs"), lit(0.0),
            (a, c) => a + log(c.cast("double"))))
          .withColumn("sxy", aggregate(sequence(lit(1), col("n")),
            lit(0.0), (a, r) => a + log(r.cast("double")) *
              log(element_at(col("cs"), r).cast("double"))))
        withSums
          .withColumn("zipf_slope",
            (col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx")))
          .select(col("lang"), col("n").cast("long").as("n_ranks"),
            col("zipf_slope"),
            ((col("sy") - col("zipf_slope") * col("sx")) / col("n"))
              .as("intercept"))
          .orderBy(col("lang"))
      },
      Some("""WITH tok AS (
          SELECT lang,
            unnest(string_split_regex(regexp_replace(text,
              '^\s+|\s+$', '', 'g'), '\s+')) AS w
          FROM documents),
        counts AS (
          SELECT lang, w, cast(count(*) as bigint) AS cnt
          FROM tok GROUP BY 1, 2),
        ranked AS (
          SELECT lang, cnt, row_number() OVER (PARTITION BY lang
            ORDER BY cnt DESC, w) AS rk
          FROM counts),
        top AS (
          SELECT lang, list(cnt ORDER BY rk) AS cs
          FROM ranked WHERE rk <= 100 GROUP BY lang),
        f AS (
          SELECT lang, len(cs) AS n,
            list_reduce(list_prepend(0.0, list_transform(
              range(1, len(cs)+1), r -> ln(cast(r as double)))),
              (a, b) -> a + b) AS sx,
            list_reduce(list_prepend(0.0, list_transform(
              range(1, len(cs)+1), r ->
                ln(cast(r as double)) * ln(cast(r as double)))),
              (a, b) -> a + b) AS sxx,
            list_reduce(list_prepend(0.0, list_transform(cs,
              c -> ln(cast(c as double)))), (a, b) -> a + b) AS sy,
            list_reduce(list_prepend(0.0, list_transform(
              range(1, len(cs)+1), r -> ln(cast(r as double)) *
                ln(cast(cs[r] as double)))), (a, b) -> a + b) AS sxy
          FROM top),
        sl AS (
          SELECT lang, n, sx, sy,
            (n * sxy - sx * sy) / (n * sxx - sx * sx) AS zipf_slope
          FROM f)
        SELECT lang, cast(n as bigint) AS n_ranks, zipf_slope,
          (sy - zipf_slope * sx) / n AS intercept
        FROM sl ORDER BY lang""")),

    // ------------------------------------------------------------------
    // HTML main-content extraction — the step upstream of the whole
    // quality stack that documents.parquet arrives pre-extracted from:
    // real pretraining corpora start as HTML. The corpus is first
    // re-rendered as a deterministic HTML page (title/script/style
    // head, nav + footer + per-3rd-paragraph share blocks carrying
    // links, body text chunked into 12-word <p> paragraphs — all pure
    // string construction both engines re-derive byte-identically),
    // then the extraction operator runs: strip script/style blocks,
    // pull <p> block contents as main text, strip all tags for the
    // visible-text layer, and measure the trafilatura-class signals —
    // link density (anchor chars / visible chars) and text density
    // (main chars / html chars). `roundtrip_ok` proves the extraction
    // exactly recovers the original (normalized) document from the
    // markup; `ext_quality` is x02's quality formula computed ON THE
    // EXTRACTED text (the extraction feeding the quality stack).
    // Everything is row-local codegen'd string/regex work — one scan,
    // no shuffle until the final sort.
    // ------------------------------------------------------------------
    "x40_html_extract" -> Q(
      (s, d) => {
        val d1 = docs(s, d)
          .select(col("doc_id"), words(col("text")).as("toks"))
          .select(col("doc_id"), col("toks"),
            concat_ws(" ", col("toks")).as("t"),
            ((size(col("toks")) + 11) / 12).cast("bigint").as("np"))
        val paras = when(col("np") >= 1, array_join(
          transform(sequence(lit(1L), col("np")), k =>
            concat(lit("<p>"),
              concat_ws(" ", slice(col("toks"),
                ((k - 1) * 12 + 1).cast("int"), lit(12))),
              lit("</p>"),
              when(k % 3 === 0,
                concat(lit("<div class=\"share\"><a href=\"/share/"),
                  k.cast("string"), lit("\">Share this</a></div>")))
                .otherwise(lit("")))), ""))
          .otherwise(lit(""))
        val syn = d1.select(col("doc_id"), col("t"), col("np"),
          concat(
            lit("<html><head><title>Doc "), col("doc_id").cast("string"),
            lit("</title>"),
            lit("<script>function f(){return 1;}</script>"),
            lit("<style>.nav{color:red}</style></head><body>"),
            lit("<div class=\"nav\"><a href=\"/\">Home</a> " +
              "<a href=\"/about\">About</a></div>"),
            paras,
            lit("<div class=\"footer\"><a href=\"/contact\">Contact</a> " +
              "Copyright 2026 ExampleCorp</div>"),
            lit("</body></html>")).as("html"))
        val ext0 = syn.select(col("doc_id"), col("t"), col("np"),
          col("html"),
          regexp_replace(col("html"),
            "<script>[^<]*</script>|<style>[^<]*</style>", "").as("nos"))
        val ext1 = ext0.select(col("doc_id"), col("t"), col("np"),
          col("html"),
          array_join(regexp_extract_all(col("nos"),
            lit("<p>([^<]*)</p>"), lit(1)), " ").as("main_text"),
          regexp_replace(regexp_replace(
            regexp_replace(col("nos"), "<[^>]*>", " "),
            "\\s+", " "), "^\\s+|\\s+$", "").as("visible"),
          regexp_extract_all(col("nos"),
            lit("<a href=\"[^\"]*\">([^<]*)</a>"), lit(1)).as("anchors"))
        val ext2 = ext1.withColumn("mw", split(col("main_text"), "\\s+"))
        val nTok = size(col("mw")).cast("double")
        val mChars = length(col("main_text")).cast("double")
        val punct = (length(col("main_text")) -
          length(regexp_replace(col("main_text"), "[.,!?;:]", "")))
          .cast("double")
        val stops = size(filter(col("mw"), x =>
          x.isin("the", "a", "of", "and", "to", "in"))).cast("double")
        val awl = length(regexp_replace(col("main_text"), "\\s+", ""))
          .cast("double") / nTok
        val linkChars = coalesce(aggregate(col("anchors"), lit(0L),
          (a, x) => a + length(x).cast("bigint")), lit(0L))
        ext2.select(col("doc_id"),
          col("np").as("n_paragraphs"),
          size(col("anchors")).cast("bigint").as("n_links"),
          length(col("html")).cast("bigint").as("html_len"),
          length(col("visible")).cast("bigint").as("visible_len"),
          length(col("main_text")).cast("bigint").as("main_len"),
          linkChars.as("link_chars"),
          (linkChars.cast("double") /
            length(col("visible")).cast("double")).as("link_density"),
          (length(col("main_text")).cast("double") /
            length(col("html")).cast("double")).as("text_density"),
          (col("main_text") === col("t")).as("roundtrip_ok"),
          md5(col("main_text")).as("extracted_md5"),
          ((stops / nTok) * 0.4 + (lit(1.0) - punct / mChars) * 0.3 +
            when(awl >= 3 && awl <= 8, 0.3).otherwise(0.0))
            .as("ext_quality"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d0 AS (
          SELECT doc_id,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'),
              '\s+') AS w
          FROM documents),
        d1 AS (
          SELECT doc_id, w, array_to_string(w, ' ') AS t,
            cast((len(w) + 11) // 12 as bigint) AS np
          FROM d0),
        syn AS (
          SELECT doc_id, t, np,
            '<html><head><title>Doc ' || doc_id || '</title>' ||
            '<script>function f(){return 1;}</script>' ||
            '<style>.nav{color:red}</style></head><body>' ||
            '<div class="nav"><a href="/">Home</a> <a href="/about">About</a></div>' ||
            CASE WHEN np >= 1 THEN array_to_string(
              list_transform(range(1, np + 1), k ->
                '<p>' || array_to_string(w[((k-1)*12+1):(k*12)], ' ') ||
                '</p>' ||
                CASE WHEN k % 3 = 0
                  THEN '<div class="share"><a href="/share/' || k ||
                    '">Share this</a></div>'
                  ELSE '' END), '')
              ELSE '' END ||
            '<div class="footer"><a href="/contact">Contact</a> Copyright 2026 ExampleCorp</div>' ||
            '</body></html>' AS html
          FROM d1),
        ext0 AS (
          SELECT doc_id, t, np, html,
            regexp_replace(html,
              '<script>[^<]*</script>|<style>[^<]*</style>', '', 'g') AS nos
          FROM syn),
        ext1 AS (
          SELECT doc_id, t, np, html,
            array_to_string(regexp_extract_all(nos, '<p>([^<]*)</p>', 1),
              ' ') AS main_text,
            regexp_replace(regexp_replace(
              regexp_replace(nos, '<[^>]*>', ' ', 'g'),
              '\s+', ' ', 'g'), '^\s+|\s+$', '', 'g') AS visible,
            regexp_extract_all(nos, '<a href="[^"]*">([^<]*)</a>', 1)
              AS anchors
          FROM ext0),
        ext2 AS (
          SELECT *, string_split_regex(main_text, '\s+') AS mw
          FROM ext1)
        SELECT doc_id,
          np AS n_paragraphs,
          cast(len(anchors) as bigint) AS n_links,
          cast(length(html) as bigint) AS html_len,
          cast(length(visible) as bigint) AS visible_len,
          cast(length(main_text) as bigint) AS main_len,
          cast(coalesce(list_sum(list_transform(anchors, a -> length(a))),
            0) as bigint) AS link_chars,
          cast(coalesce(list_sum(list_transform(anchors, a -> length(a))),
            0) as double) / cast(length(visible) as double) AS link_density,
          cast(length(main_text) as double) / cast(length(html) as double)
            AS text_density,
          main_text = t AS roundtrip_ok,
          md5(main_text) AS extracted_md5,
          (cast(len(list_filter(mw, x ->
              x IN ('the','a','of','and','to','in'))) as double) /
            cast(len(mw) as double)) * 0.4 +
          (1.0 - cast(length(main_text) - length(regexp_replace(main_text,
              '[.,!?;:]', '', 'g')) as double) /
            cast(length(main_text) as double)) * 0.3 +
          CASE WHEN cast(length(regexp_replace(main_text, '\s+', '', 'g'))
                 as double) / cast(len(mw) as double) >= 3
             AND cast(length(regexp_replace(main_text, '\s+', '', 'g'))
                 as double) / cast(len(mw) as double) <= 8
            THEN 0.3 ELSE 0.0 END AS ext_quality
        FROM ext2
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // DEEP BPE merge schedule — x28 run to tokenizer depth: 50 merge
    // rounds over the vocabulary-scale word census, emitting the full
    // merge table plus the compression curve (chars per token after
    // each rule) — the curve a tokenizer team reads to pick its merge
    // budget (the knee is visible: rank-1 compression vs rank-50). The
    // corpus is touched by exactly ONE tokenize+explode census pass;
    // all 50 rounds after that are vocabulary-scale (pair census →
    // 1-row argmax collect → replace — g01's iterative-action
    // convention, x28's exact per-round dataflow and its documented
    // plain-replace merge semantics, deterministic argmax tie-break
    // (count desc, pair asc)). n_chars is merge-invariant, so the
    // curve's numerator is computed once. At 100 TB the loop's cost is
    // merges × VOCABULARY (Heaps-law sublinear in corpus size), never
    // merges × corpus — the decade row measures exactly that. The
    // DuckDB oracle is a generated 50-level chained CTE (pair census,
    // argmax, materialized replace, token count per level) — same
    // shape as x28's hand-written 3 levels, scripted.
    // ------------------------------------------------------------------
    "x41_bpe_deep" -> Q(
      (s, d) => {
        import s.implicits._
        val nMerges = 50
        val census = docs(s, d)
          .select(explode(words(col("text"))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
          .localCheckpoint()
        val nChars = census
          .agg(sum(col("cnt") * length(col("word"))).as("nc"))
          .head().getLong(0)
        var seqs = census.select(col("cnt"),
          rtrim(regexp_replace(col("word"), "(.)", "$1 ")).as("seq"))
        val merges =
          scala.collection.mutable.ArrayBuffer[(Int, String, String,
            Long, Long, Double)]()
        for (rank <- 1 to nMerges) {
          val arrs = seqs
            .select(col("cnt"), split(col("seq"), " ").as("t"))
            .select(col("cnt"),
              slice(col("t"), lit(1), size(col("t")) - 1).as("la"),
              slice(col("t"), lit(2), size(col("t")) - 1).as("ra"))
          val best = arrs
            .select(col("cnt"),
              explode(arrays_zip(col("la"), col("ra"))).as("p"))
            .select(col("p.la").as("l"), col("p.ra").as("r"), col("cnt"))
            .groupBy(col("l"), col("r")).agg(sum(col("cnt")).as("c"))
            .orderBy(col("c").desc, col("l"), col("r"))
            .limit(1).head()
          val (bl, br, bc) =
            (best.getString(0), best.getString(1), best.getLong(2))
          seqs = seqs.select(col("cnt"),
            replace(col("seq"), lit(bl + " " + br), lit(bl + br))
              .as("seq"))
            .localCheckpoint()
          val tokensAfter = seqs
            .select(sum(col("cnt") * size(split(col("seq"), " ")))
              .as("ta"))
            .head().getLong(0)
          merges += ((rank, bl, br, bc, tokensAfter,
            nChars.toDouble / tokensAfter.toDouble))
        }
        merges.toSeq
          .toDF("merge_rank", "lhs", "rhs", "pair_count", "tokens_after",
            "compression")
          .orderBy(col("merge_rank"))
      },
      Some {
        val nMerges = 50
        val levels = (1 to nMerges).map { k =>
          val prev = if (k == 1) "s0" else s"s${k - 1}"
          s"""p$k AS (SELECT s.cnt, s.t[u.g] AS lhs, s.t[u.g + 1] AS rhs
          FROM (SELECT cnt, string_split(seq, ' ') AS t FROM $prev) s,
            unnest(generate_series(1, len(s.t) - 1)) AS u(g)),
        b$k AS (SELECT lhs, rhs, cast(sum(cnt) as bigint) AS c
          FROM p$k GROUP BY 1, 2 ORDER BY c DESC, lhs, rhs LIMIT 1),
        s$k AS MATERIALIZED (SELECT $prev.cnt,
            replace($prev.seq, b$k.lhs || ' ' || b$k.rhs,
              b$k.lhs || b$k.rhs) AS seq
          FROM $prev, b$k),
        t$k AS (SELECT cast(sum(cnt * len(string_split(seq, ' ')))
            as bigint) AS tokens_after FROM s$k)"""
        }.mkString(",\n        ")
        val branches = (1 to nMerges).map { k =>
          s"""SELECT cast($k as integer) AS merge_rank, b$k.lhs, b$k.rhs,
            b$k.c AS pair_count, t$k.tokens_after,
            (SELECT nc FROM ch) / cast(t$k.tokens_after as double)
              AS compression
          FROM b$k, t$k"""
        }.mkString("\n          UNION ALL\n          ")
        s"""WITH census AS MATERIALIZED (
          SELECT w AS word, cast(count(*) as bigint) AS cnt FROM (
            SELECT unnest(string_split_regex(
              regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+')) AS w
            FROM documents) GROUP BY 1),
        ch AS MATERIALIZED (SELECT cast(sum(cnt * strlen(word))
            as double) AS nc FROM census),
        s0 AS (SELECT cnt,
            rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
          FROM census),
        $levels
        SELECT * FROM (
          $branches)
        ORDER BY merge_rank"""
      }),

    // ------------------------------------------------------------------
    // Document CHUNKING for retrieval — the RAG-ingestion staple x23's
    // sequence packing stops short of: fixed-token chunks (16 tokens)
    // with overlap (stride 12 → 4 shared tokens between neighbors, so
    // no retrieval query straddles a blind boundary), expanded
    // row-locally (explode over a cheap index sequence; the expensive
    // token array is aliased once — the d08 explode discipline) with
    // chunk ids stable under rerun: h60(doc_id:chunk_idx), so a
    // re-ingest maps every unchanged chunk to the same id and
    // downstream vector stores upsert instead of duplicating. Chunk
    // count = max(1, ceil((n_tokens - overlap) / stride)), truncated
    // tail chunk kept — every token lands in ≥ 1 chunk. Output is the
    // chunk table (id, doc, idx, size, content md5); d24 consumes it
    // for chunk-level near-dup. One scan, no shuffle before the sort.
    // ------------------------------------------------------------------
    "x42_doc_chunking" -> Q(
      (s, d) => {
        docs(s, d)
          .select(col("doc_id"), words(col("text")).as("toks"))
          .select(col("doc_id"), col("toks"),
            explode(sequence(lit(0L),
              greatest(lit(1L), expr("(size(toks) + 7) div 12")) - 1))
              .as("k"))
          .select(col("doc_id"), col("k").as("chunk_idx"),
            graft.functions.PortableHash.h60col(
              concat(col("doc_id").cast("string"), lit(":"),
                col("k").cast("string"))).as("chunk_id"),
            slice(col("toks"), (col("k") * 12 + 1).cast("int"), lit(16))
              .as("ct"))
          .select(col("chunk_id"), col("doc_id"), col("chunk_idx"),
            size(col("ct")).cast("bigint").as("n_tokens"),
            md5(concat_ws(" ", col("ct"))).as("chunk_md5"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""WITH t0 AS (
          SELECT doc_id, string_split_regex(
            regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents),
        ck AS (
          SELECT doc_id, u.k, w[(u.k*12+1):(u.k*12+16)] AS ct
          FROM t0, unnest(generate_series(0,
            greatest(1, (len(w) + 7) // 12) - 1)) AS u(k))
        SELECT ('0x' || substr(md5(doc_id || ':' || k), 1, 15))::BIGINT
            AS chunk_id,
          doc_id, cast(k as bigint) AS chunk_idx,
          cast(len(ct) as bigint) AS n_tokens,
          md5(array_to_string(ct, ' ')) AS chunk_md5
        FROM ck
        ORDER BY doc_id, chunk_idx""")),

    // ------------------------------------------------------------------
    // CHUNK-level near-dup — x42's chunks through the d03 band
    // pipeline: per-chunk 3-shingle MinHash (the fast ShingleMinHash
    // expression over the chunk's token slice), 16 bands × 4 rows,
    // band-bucket candidate join restricted to CROSS-document pairs
    // (same-doc neighbors share only the 4-token overlap, Jaccard
    // ~0.14, and are excluded outright — they are the chunking's
    // design, not duplication), exact-Jaccard verification at 0.8
    // (chunks are 16 tokens, so near-dup means near-identical). This
    // is what dedup looks like at RETRIEVAL granularity: two documents
    // sharing one boilerplate paragraph collide chunk-to-chunk without
    // being document-level near-dups. Same linear-shuffle posture as
    // d03 — candidates come from band buckets, never all-pairs.
    // ------------------------------------------------------------------
    "d24_chunk_neardup" -> Q(
      (s, d) => {
        def chunks = docs(s, d)
          .select(col("doc_id"), words(col("text")).as("toks"))
          .select(col("doc_id"), col("toks"),
            explode(sequence(lit(0L),
              greatest(lit(1L), expr("(size(toks) + 7) div 12")) - 1))
              .as("k"))
          .select(col("doc_id"),
            graft.functions.PortableHash.h60col(
              concat(col("doc_id").cast("string"), lit(":"),
                col("k").cast("string"))).as("cid"),
            slice(col("toks"), (col("k") * 12 + 1).cast("int"), lit(16))
              .as("ct"))
          .filter(size(col("ct")) >= 3)
        val banded = chunks
          .withColumn("sig",
            graft.functions.ShingleMinHash.shingleMinhash(col("ct")))
          .select(col("doc_id"), col("cid"),
            posexplode(bandHashes(col("sig"), 16, 4)))
          .select(col("doc_id"), col("cid"), col("pos").as("band"),
            col("col").as("band_hash"))
        val cand = banded.as("l")
          .join(banded.as("r"), Seq("band", "band_hash"))
          .filter(col("l.cid") < col("r.cid") &&
            col("l.doc_id") =!= col("r.doc_id"))
          .select(col("l.cid").as("chunk_a"), col("r.cid").as("chunk_b"),
            col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
          .distinct()
        val sh = chunks.select(col("cid"), shingles3(col("ct")).as("w"))
        cand
          .join(sh.select(col("cid").as("chunk_a"), col("w").as("wa")),
            Seq("chunk_a"))
          .join(sh.select(col("cid").as("chunk_b"), col("w").as("wb")),
            Seq("chunk_b"))
          .withColumn("jaccard",
            size(array_intersect(col("wa"), col("wb"))).cast("double") /
              size(array_union(col("wa"), col("wb"))).cast("double"))
          .filter(col("jaccard") >= 0.8)
          .select(col("chunk_a"), col("chunk_b"), col("doc_a"),
            col("doc_b"), col("jaccard"))
          .orderBy(col("chunk_a"), col("chunk_b"))
      },
      Some("""WITH perms AS (
          SELECT
            list_transform(range(0, 64), i ->
              ('0x' || substr(md5('perm_a_' || i), 1, 15))::BIGINT % 2147483646 + 1) AS pa,
            list_transform(range(0, 64), i ->
              ('0x' || substr(md5('perm_b_' || i), 1, 15))::BIGINT % 2147483647) AS pb),
        t0 AS (
          SELECT doc_id, string_split_regex(
            regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents),
        ck AS (
          SELECT doc_id,
            ('0x' || substr(md5(doc_id || ':' || u.k), 1, 15))::BIGINT
              AS cid,
            w[(u.k*12+1):(u.k*12+16)] AS ct
          FROM t0, unnest(generate_series(0,
            greatest(1, (len(w) + 7) // 12) - 1)) AS u(k)
          WHERE len(w[(u.k*12+1):(u.k*12+16)]) >= 3),
        sh AS (
          SELECT doc_id, cid,
            list_distinct(list_transform(range(1, len(ct) - 1),
              i -> ct[i] || ' ' || ct[i+1] || ' ' || ct[i+2])) AS w
          FROM ck),
        hs AS (
          SELECT doc_id, cid,
            list_transform(w, s ->
              ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS h
          FROM sh),
        sig AS (
          SELECT doc_id, cid,
            list_transform(range(0, 64), i ->
              list_min(list_transform(h, x ->
                (pa[i+1] * x + pb[i+1]) % 2147483647))) AS sig
          FROM hs, perms),
        banded AS (
          SELECT doc_id, cid, b AS band,
            list_reduce(list_prepend(0::BIGINT, sig[b*4+1 : b*4+4]),
              (acc, v) -> (acc * 1000003 + v) % 2147483647) AS band_hash
          FROM sig, range(0, 16) t(b)),
        cand AS (
          SELECT DISTINCT l.cid AS chunk_a, r.cid AS chunk_b,
            l.doc_id AS doc_a, r.doc_id AS doc_b
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.band_hash = r.band_hash
              AND l.cid < r.cid AND l.doc_id <> r.doc_id)
        SELECT c.chunk_a, c.chunk_b, c.doc_a, c.doc_b,
          cast(len(list_intersect(x.w, y.w)) as double) /
            cast(len(list_distinct(list_concat(x.w, y.w))) as double)
            AS jaccard
        FROM cand c
        JOIN sh x ON x.cid = c.chunk_a
        JOIN sh y ON y.cid = c.chunk_b
        WHERE cast(len(list_intersect(x.w, y.w)) as double) /
              cast(len(list_distinct(list_concat(x.w, y.w))) as double)
              >= 0.8
        ORDER BY chunk_a, chunk_b""")),

    // ------------------------------------------------------------------
    // Curriculum schedule — the quality-phased training order
    // (curriculum learning / quality annealing: low-quality phases
    // first, highest-quality data last, each phase a token budget the
    // trainer anneals through). Phases cut x02's exact quality score
    // at its stable quartile boundaries (0.616 / 0.625 / 0.634 —
    // sf-invariant because the synthesis is; fixed literal cuts, the
    // practice curricula actually use, and comparisons of
    // bit-identical doubles against literals are cross-engine safe
    // where interpolated quantiles of doubles would not be). Per
    // phase: docs, token budget, quality range (min/max are
    // order-independent — no double SUMS), and the cumulative token
    // schedule (a 4-row running sum). One tokenize pass, one groupBy;
    // the schedule frame is phase-cardinality, metadata-scale.
    // ------------------------------------------------------------------
    "x38_curriculum_schedule" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = words(col("text"))
        val nTok = size(w).cast("double")
        val nChars = length(col("text")).cast("double")
        val punct = (length(col("text")) -
          length(regexp_replace(col("text"), "[.,!?;:]", "")))
          .cast("double")
        val stops = size(filter(w, x =>
          x.isin("the", "a", "of", "and", "to", "in"))).cast("double")
        val avgWordLen =
          length(regexp_replace(col("text"), "\\s+", ""))
            .cast("double") / nTok
        val scored = docs(s, d).select(
          size(words(col("text"))).cast("long").as("toks"),
          ((stops / nTok) * 0.4 +
            (lit(1.0) - punct / nChars) * 0.3 +
            when(avgWordLen >= 3 && avgWordLen <= 8, 0.3)
              .otherwise(0.0)).as("quality"))
          .withColumn("phase",
            when(col("quality") < 0.616, 1)
              .when(col("quality") < 0.625, 2)
              .when(col("quality") < 0.634, 3)
              .otherwise(4))
        scored.groupBy(col("phase"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("toks")).as("n_tokens"),
            min(col("quality")).as("min_quality"),
            max(col("quality")).as("max_quality"))
          .withColumn("cum_tokens",
            sum(col("n_tokens")).over(Window.orderBy(col("phase"))
              .rowsBetween(Window.unboundedPreceding, 0)))
          .orderBy(col("phase"))
      },
      Some("""WITH d AS (
          SELECT doc_id, text,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'),
              '\s+') AS w
          FROM documents),
        m AS (
          SELECT cast(len(w) as bigint) AS toks,
            cast(len(w) as double) AS n_tok,
            cast(length(text) as double) AS n_chars,
            cast(length(text) - length(regexp_replace(text,
              '[.,!?;:]', '', 'g')) as double) AS punct,
            cast(len(list_filter(w, x ->
              x IN ('the','a','of','and','to','in'))) as double) AS stops,
            cast(length(regexp_replace(text, '\s+', '', 'g')) as double)
              / cast(len(w) as double) AS awl
          FROM d),
        qv AS (
          SELECT toks,
            (stops / n_tok) * 0.4 + (1.0 - punct / n_chars) * 0.3 +
              CASE WHEN awl >= 3 AND awl <= 8 THEN 0.3 ELSE 0.0 END
              AS quality
          FROM m),
        ph AS (
          SELECT toks, quality,
            CASE WHEN quality < 0.616 THEN 1
                 WHEN quality < 0.625 THEN 2
                 WHEN quality < 0.634 THEN 3
                 ELSE 4 END AS phase
          FROM qv),
        agg AS (
          SELECT phase, cast(count(*) as bigint) AS n_docs,
            cast(sum(toks) as bigint) AS n_tokens,
            min(quality) AS min_quality,
            max(quality) AS max_quality
          FROM ph GROUP BY phase)
        SELECT phase, n_docs, n_tokens, min_quality, max_quality,
          cast(sum(n_tokens) OVER (ORDER BY phase
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            as bigint) AS cum_tokens
        FROM agg ORDER BY phase""")),

    // ------------------------------------------------------------------
    // ANN method-comparison harness — d15's role for the VECTOR index
    // family: the same query (vec 0, k = 10) through all four retrieval
    // postures, each leg the EXACT formulation of its sibling query,
    // with the two axes a deployment prices side by side: candidates
    // scored (cost) and recall@10 vs exact (quality).
    //   a_exact — s01's full scan: n−1 candidates, recall 10 by def.
    //   b_lsh6  — s02's 6-hyperplane 64-bucket probe: 8 candidates,
    //             recall 0/10 here — the honest "this config is too
    //             aggressive for this corpus" readout (64 buckets over
    //             near-uniform vectors leave ~n/64 per bucket and the
    //             true neighbors elsewhere), exactly what the harness
    //             exists to catch BEFORE a production rollout.
    //   c_ivf2  — s03's 8-cell codebook, 2 probes: ~n/4 candidates,
    //             recall 10/10.
    //   d_sq8   — s17's reconstructed-SQ8 full scan: all candidates at
    //             a quarter the bytes, recall 10/10.
    // One exact top-10 (localCheckpointed — 10 rows) serves as ground
    // truth for every leg; counts are in-plan scalar aggregates
    // (1-row frames, allowlisted), never driver loops.
    // ------------------------------------------------------------------
    "s18_ann_harness" -> Q(
      (s, d) => {
        val base = emb(s, d)
        val q1 = base.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        def top10(cands: DataFrame): DataFrame = cands
          .filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q1))
          .withColumn("cos", cosine(col("embedding"), col("qe")))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10).select(col("vec_id"))
        val truth = top10(base).localCheckpoint()
        def legRow(tag: String, nCand: DataFrame,
            top: DataFrame): DataFrame =
          nCand.crossJoin(
            top.join(truth, Seq("vec_id"), "left_semi")
              .agg(count(lit(1)).as("recall_10")))
            .select(lit(tag).as("method"), col("n_candidates"),
              col("recall_10"))
        // a_exact
        val nAll = base.filter(col("vec_id") =!= 0)
          .agg(count(lit(1)).as("n_candidates"))
        // b_lsh6 — s02's bucket expression verbatim
        val planes = 6
        val dim = base.select(size(col("embedding"))).head.getInt(0)
        val mat: Seq[Seq[Double]] = (0 until planes).map(p =>
          (0 until dim).map(i =>
            (graft.functions.PortableHash.h60(s"${p}_${i}") % 1000L)
              .toDouble / 500.0 - 1.0))
        val matC = typedLit(mat)
        def bucket(v: Column): Column =
          aggregate(sequence(lit(0), lit(planes - 1)), lit(0L),
            (acc, p) => {
              val proj = graft.functions.VectorDot.dot(v,
                element_at(matC, p + 1))
              acc.bitwiseOR(when(proj > 0, shl(lit(1L), p))
                .otherwise(0L))
            })
        val bkts = base.withColumn("bkt", bucket(col("embedding")))
        val qbkt = bkts.filter(col("vec_id") === 0)
          .select(col("bkt").as("qbkt"))
        val lshCand = bkts.join(broadcast(qbkt),
            col("bkt") === col("qbkt"))
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("embedding"))
        // c_ivf2 — s03's probe verbatim
        val cents = base.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
        val probe = cents.crossJoin(broadcast(q1))
          .withColumn("qsim", cosine(col("ce"), col("qe")))
          .orderBy(col("qsim").desc, col("cent_id"))
          .limit(2)
          .select(col("cent_id").as("probe_cent"))
        val ivfCand = assignToCodebook(s, d)
          .join(broadcast(probe), col("cent_id") === col("probe_cent"))
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id"), col("embedding"))
        // d_sq8 — s17's reconstruct path verbatim (double arrays)
        val dbl = base.select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        val stats = dbl
          .select(posexplode(col("v")).as(Seq("i", "x")))
          .groupBy(col("i"))
          .agg(min(col("x")).as("mn"),
            (max(col("x")) - min(col("x"))).as("span"))
          .orderBy(col("i")).collect()
        val mns = array(stats.map(r =>
          lit(r.getDouble(1))).toIndexedSeq: _*)
        val sps = array(stats.map(r =>
          lit(r.getDouble(2))).toIndexedSeq: _*)
        val rec = dbl.select(col("vec_id"),
          transform(
            transform(col("v"), (x, j) =>
              when(element_at(sps, j + 1) === 0d, lit(0L))
                .otherwise(floor((x - element_at(mns, j + 1)) *
                  lit(255.0) / element_at(sps, j + 1)))),
            (qv, j) =>
              element_at(mns, j + 1) + (qv.cast("double") + lit(0.5)) *
                element_at(sps, j + 1) / lit(255.0)).as("embedding"))
        val rq = rec.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        val sqTop = rec.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(rq))
          .withColumn("cos", cosine(col("embedding"), col("qe")))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10).select(col("vec_id"))
        legRow("a_exact", nAll, truth)
          .unionAll(legRow("b_lsh6",
            lshCand.agg(count(lit(1)).as("n_candidates")),
            top10(lshCand)))
          .unionAll(legRow("c_ivf2",
            ivfCand.agg(count(lit(1)).as("n_candidates")),
            top10(ivfCand)))
          .unionAll(legRow("d_sq8", nAll, sqTop))
          .orderBy(col("method"))
      },
      Some("""WITH e AS (
          SELECT vec_id,
            list_transform(embedding, x -> cast(x as double)) AS v
          FROM embeddings),
        n AS (SELECT vec_id, v,
            sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
          FROM e),
        q AS (SELECT v AS qv, nrm AS qnrm FROM n WHERE vec_id = 0),
        truth AS MATERIALIZED (
          SELECT n.vec_id FROM n, q WHERE n.vec_id <> 0
          ORDER BY list_dot_product(n.v, q.qv) / n.nrm / q.qnrm DESC,
            n.vec_id LIMIT 10),
        dim AS (SELECT max(len(v)) AS d FROM e),
        planes AS (
          SELECT p, list_transform(range(0, d), i ->
            cast(('0x' || substr(md5(p || '_' || i), 1, 15))::BIGINT
              % 1000 as double) / 500.0 - 1.0) AS pv
          FROM range(0, 6) t(p), dim),
        pl AS (SELECT list(pv ORDER BY p) AS pvs FROM planes),
        b AS (
          SELECT vec_id, v, nrm,
            cast(list_sum(list_transform(range(0, 6), p ->
              CASE WHEN list_dot_product(v, pvs[p+1]) > 0
                THEN (1::BIGINT << p) ELSE 0::BIGINT END)) as bigint)
              AS bkt
          FROM n, pl),
        qb AS (SELECT bkt AS qbkt FROM b WHERE vec_id = 0),
        lsh_cand AS MATERIALIZED (
          SELECT b.vec_id, b.v, b.nrm FROM b, qb
          WHERE b.bkt = qb.qbkt AND b.vec_id <> 0),
        lsh_top AS MATERIALIZED (
          SELECT c.vec_id FROM lsh_cand c, q
          ORDER BY list_dot_product(c.v, q.qv) / c.nrm / q.qnrm DESC,
            c.vec_id LIMIT 10),
        c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
          FROM n WHERE vec_id < 8),
        asgn AS (
          SELECT vec_id, v, nrm, cent_id,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY list_dot_product(v, cv) / nrm / cnrm DESC,
                cent_id) AS rn
          FROM n, c),
        assigned AS (
          SELECT vec_id, v, nrm, cent_id FROM asgn WHERE rn = 1),
        probe AS (
          SELECT cent_id FROM c, q
          ORDER BY list_dot_product(cv, qv) / cnrm / qnrm DESC, cent_id
          LIMIT 2),
        ivf_cand AS MATERIALIZED (
          SELECT a.vec_id, a.v, a.nrm FROM assigned a
          JOIN probe p ON a.cent_id = p.cent_id
          WHERE a.vec_id <> 0),
        ivf_top AS MATERIALIZED (
          SELECT c2.vec_id FROM ivf_cand c2, q
          ORDER BY list_dot_product(c2.v, q.qv) / c2.nrm / q.qnrm DESC,
            c2.vec_id LIMIT 10),
        st AS (
          SELECT j.i, min(v[j.i + 1]) AS mn,
            max(v[j.i + 1]) - min(v[j.i + 1]) AS span
          FROM e, LATERAL (SELECT unnest(range(0, len(v))) AS i) j
          GROUP BY j.i),
        arrs AS (SELECT list(mn ORDER BY i) AS mns,
          list(span ORDER BY i) AS sps FROM st),
        q0 AS (
          SELECT vec_id,
            list_transform(range(0, len(v)), j ->
              CASE WHEN sps[j+1] = 0 THEN cast(0 as bigint)
                ELSE cast(floor((v[j+1] - mns[j+1]) * 255.0 / sps[j+1])
                  as bigint) END) AS qv
          FROM e, arrs),
        rec AS (
          SELECT vec_id, list_transform(range(0, len(qv)), j ->
            mns[j+1] + (cast(qv[j+1] as double) + 0.5) * sps[j+1]
              / 255.0) AS rv
          FROM q0, arrs),
        rn2 AS (SELECT vec_id, rv,
            sqrt(list_sum(list_transform(rv, x -> x * x))) AS nrm
          FROM rec),
        rq AS (SELECT rv AS qrv, nrm AS qnrm FROM rn2 WHERE vec_id = 0),
        sq_top AS MATERIALIZED (
          SELECT rn2.vec_id FROM rn2, rq WHERE rn2.vec_id <> 0
          ORDER BY list_dot_product(rn2.rv, rq.qrv) / rn2.nrm / rq.qnrm
            DESC, rn2.vec_id LIMIT 10),
        tot AS (SELECT cast(count(*) as bigint) - 1 AS nall FROM e)
        SELECT * FROM (
          SELECT 'a_exact' AS method,
            (SELECT nall FROM tot) AS n_candidates,
            cast(10 as bigint) AS recall_10
          UNION ALL
          SELECT 'b_lsh6',
            (SELECT cast(count(*) as bigint) FROM lsh_cand),
            (SELECT cast(count(*) as bigint) FROM lsh_top
             WHERE vec_id IN (SELECT vec_id FROM truth))
          UNION ALL
          SELECT 'c_ivf2',
            (SELECT cast(count(*) as bigint) FROM ivf_cand),
            (SELECT cast(count(*) as bigint) FROM ivf_top
             WHERE vec_id IN (SELECT vec_id FROM truth))
          UNION ALL
          SELECT 'd_sq8', (SELECT nall FROM tot),
            (SELECT cast(count(*) as bigint) FROM sq_top
             WHERE vec_id IN (SELECT vec_id FROM truth))
        ) ORDER BY method""")),

    // ------------------------------------------------------------------
    // END-TO-END CURATION PIPELINE — the five stages a real 100 TB run
    // chains, composed in ONE query with ONE oracle (each stage is
    // individually ⊕ as x02/d09/x15/x20/x17; this proves they COMPOSE:
    // every stage consumes the previous stage's survivors, not the raw
    // corpus):
    //   1. x02 quality gate (keep quality ≥ 0.62 — inside the corpus's
    //      0.60-0.69 score range, so the gate actually bites: ~60%
    //      survive; the cut is safe to compare cross-engine because
    //      x02's score doubles are bit-identical),
    //   2. dedup keep-list over d08's posting-index candidate pairs —
    //      NOT the bounded all-pairs oracle twin: the whole pipeline
    //      runs on the full corpus with no window and no data×data
    //      join, because the detector itself is the at-scale one (the
    //      df-capped inverted index). CC clusters the pairs; cluster
    //      representatives (min doc_id) survive,
    //   3. x15 decontamination (drop benchmark-overlapping docs; the
    //      benchmark n-gram set comes from the FULL corpus, and bench
    //      members are excluded from training),
    //   4. x20 mixture gate — with sampling rates derived from the
    //      SURVIVING corpus (the composition point: a rate computed on
    //      the raw corpus would over-sample languages the earlier
    //      stages depleted),
    //   5. x17 deterministic hash split.
    // Output: the per-(split, lang) census of what a training run would
    // actually read. Everything rides h60, so the oracle re-derives all
    // five stages bit-for-bit.
    // ------------------------------------------------------------------
    "p01_curation_pipeline" -> Q(
      (s, d) => {
        import s.implicits._
        // stage 1: quality gate (x02's exact arithmetic); tokens
        // aliased once behind their own projection
        val tokd = docs(s, d)
          .select(col("doc_id"), col("lang"), col("text"),
            words(col("text")).as("w"))
        val nTok = size(col("w")).cast("double")
        val nChars = length(col("text")).cast("double")
        val punct = (length(col("text")) -
          length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("double")
        val stops = size(filter(col("w"), x =>
          x.isin("the", "a", "of", "and", "to", "in"))).cast("double")
        val avgWordLen =
          length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nTok
        val q1 = tokd.withColumn("quality",
          (stops / nTok) * 0.4 +
            (lit(1.0) - punct / nChars) * 0.3 +
            when(avgWordLen >= 3 && avgWordLen <= 8, 0.3).otherwise(0.0))
          .filter(col("quality") >= 0.62)
          .select(col("doc_id"), col("lang"), col("w"))

        // stage 2: dedup keep-list on stage-1 survivors, candidates
        // from d08's df-capped posting index (no all-pairs, no window)
        val dupPairs = postingJaccardPairsFrom(
          q1.select(col("doc_id"), col("w").as("toks")))
          .select(col("doc_a"), col("doc_b"))
        val cc = graft.operators.ConnectedComponents.components(dupPairs)
        val q2 = q1.join(cc, col("doc_id") === col("id"), "left")
          .filter(coalesce(col("cluster"), col("doc_id")) === col("doc_id"))
          // bench members never train (x15's corpus-side exclusion)
          .filter(col("doc_id") % 97 =!= 0)
          .select(col("doc_id"), col("lang"), col("w"))

        // stage 3: decontamination of stage-2 survivors vs the full
        // corpus's benchmark docs (x15's gram-8 overlap rule)
        def grams8(toks: Column): Column =
          when(size(toks) >= 8,
            array_distinct(transform(sequence(lit(0), size(toks) - 8), i =>
              concat_ws(" ", (0 until 8).map(o =>
                element_at(toks, i + o + 1)): _*))))
            .otherwise(array().cast("array<string>"))
        val benchNg = docs(s, d).filter(col("doc_id") % 97 === 0)
          .select(words(col("text")).as("toks"))
          .select(explode(grams8(col("toks"))).as("ng"))
          .distinct()
        val posts = q2.select(col("doc_id"),
          explode(grams8(col("w"))).as("ng"))
        val perDoc = posts.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_ngrams"))
        val contam = posts.join(benchNg, "ng").groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_contaminated"))
        val q3 = q2.select(col("doc_id"), col("lang"))
          .join(perDoc, Seq("doc_id"), "left")
          .join(contam, Seq("doc_id"), "left")
          .withColumn("ngc", coalesce(col("n_ngrams"), lit(0L)))
          .withColumn("cnc", coalesce(col("n_contaminated"), lit(0L)))
          .filter(!(col("cnc") >= 5 ||
            (col("ngc") > 0 && col("cnc").cast("double") /
              col("ngc").cast("double") > 0.1)))
          .select(col("doc_id"), col("lang"))

        // stage 4: mixture gate with rates from the SURVIVING corpus
        val targets = Seq(("en", 0.5), ("zh", 0.2), ("de", 0.1),
          ("fr", 0.1), ("es", 0.1)).toDF("lang", "target_share")
        val counts = q3.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"))
        val total = counts.agg(sum(col("n_docs")).as("n_total"))
        val rates = counts.join(targets, "lang")
          .crossJoin(broadcast(total))
          .withColumn("rate",
            least(lit(1.0), col("target_share") *
              (col("n_total").cast("double") * 0.5) /
              col("n_docs").cast("double")))
          .select(col("lang"), col("rate"))
        val q4 = q3.join(broadcast(rates), "lang")
          .filter(pmod(graft.functions.PortableHash.h60col(
            concat(lit("mix_"), col("doc_id"))), lit(1000000L)) <
            floor(col("rate") * 1000000))

        // stage 5: deterministic split + census (x17)
        val bucket = pmod(graft.functions.PortableHash.h60col(
          concat(lit("split_"), col("doc_id"))), lit(100L))
        q4.withColumn("split",
          when(bucket < 90, "train").when(bucket < 95, "val")
            .otherwise("test"))
          .groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("split"), col("lang"))
      },
      Some("""WITH RECURSIVE w0 AS (
          SELECT doc_id, lang, text,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents),
        q1 AS (
          SELECT doc_id, lang, w FROM (
            SELECT doc_id, lang, w,
              (cast(len(list_filter(w, x -> x IN ('the','a','of','and','to','in'))) as double) / cast(len(w) as double)) * 0.4 +
              (1.0 - cast(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) as double) / cast(length(text) as double)) * 0.3 +
              CASE WHEN (cast(length(regexp_replace(text, '\s+', '', 'g')) as double) / cast(len(w) as double)) >= 3
                    AND (cast(length(regexp_replace(text, '\s+', '', 'g')) as double) / cast(len(w) as double)) <= 8
                   THEN 0.3 ELSE 0.0 END AS quality
            FROM w0) WHERE quality >= 0.62),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sw
          FROM q1 WHERE len(w) >= 3),
        dposts AS (SELECT doc_id, unnest(sw) AS fp FROM sh),
        dfc AS (SELECT fp, count(*) AS df FROM dposts GROUP BY fp),
        okposts AS (
          SELECT p.doc_id, p.fp FROM dposts p
          JOIN dfc ON dfc.fp = p.fp AND dfc.df <= 50),
        dsizes AS (
          SELECT doc_id, cast(count(*) as bigint) AS sz
          FROM okposts GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            cast(count(*) as bigint) AS shared_fps
          FROM okposts a
          JOIN okposts b ON b.fp = a.fp AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
        prs AS (
          SELECT s.doc_a, s.doc_b
          FROM shared s
          JOIN dsizes x ON x.doc_id = s.doc_a
          JOIN dsizes y ON y.doc_id = s.doc_b
          WHERE cast(s.shared_fps as double) /
                cast(x.sz + y.sz - s.shared_fps as double) >= 0.4),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM prs
          UNION SELECT doc_b, doc_a FROM prs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        ccx AS (
          SELECT src AS doc_id, least(src, min(dst)) AS cluster
          FROM reach GROUP BY src),
        q2 AS (
          SELECT q1.doc_id, q1.lang, q1.w FROM q1
          LEFT JOIN ccx ON ccx.doc_id = q1.doc_id
          WHERE coalesce(ccx.cluster, q1.doc_id) = q1.doc_id
            AND q1.doc_id % 97 <> 0),
        ng AS (
          SELECT doc_id,
            CASE WHEN len(w) >= 8 THEN
              list_distinct(list_transform(range(1, len(w) - 6),
                i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3],
                  w[i+4], w[i+5], w[i+6], w[i+7])))
            ELSE [] END AS ngs
          FROM q2),
        benchng AS (
          SELECT DISTINCT unnest(
            CASE WHEN len(w) >= 8 THEN
              list_distinct(list_transform(range(1, len(w) - 6),
                i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3],
                  w[i+4], w[i+5], w[i+6], w[i+7])))
            ELSE [] END) AS ng
          FROM (SELECT string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
                FROM documents WHERE doc_id % 97 = 0)),
        posts AS (SELECT doc_id, unnest(ngs) AS ng FROM ng),
        per_doc AS (
          SELECT doc_id, cast(count(*) as bigint) AS n_ngrams
          FROM posts GROUP BY doc_id),
        contam AS (
          SELECT p.doc_id, cast(count(*) as bigint) AS n_contaminated
          FROM posts p JOIN benchng b ON p.ng = b.ng GROUP BY p.doc_id),
        q3 AS (
          SELECT q2.doc_id, q2.lang FROM q2
          LEFT JOIN per_doc pd ON pd.doc_id = q2.doc_id
          LEFT JOIN contam c ON c.doc_id = q2.doc_id
          WHERE NOT (coalesce(c.n_contaminated, 0) >= 5 OR
            (coalesce(pd.n_ngrams, 0) > 0 AND
             cast(coalesce(c.n_contaminated, 0) as double) /
               cast(pd.n_ngrams as double) > 0.1))),
        targets(lang, target_share) AS (VALUES
          ('en', 0.5), ('zh', 0.2), ('de', 0.1), ('fr', 0.1), ('es', 0.1)),
        counts AS (
          SELECT lang, cast(count(*) as bigint) AS n_docs
          FROM q3 GROUP BY lang),
        total AS (SELECT cast(sum(n_docs) as bigint) AS n_total FROM counts),
        rates AS (
          SELECT c.lang,
            least(1.0, cast(t.target_share as double) *
              (cast(n_total as double) * 0.5) / cast(c.n_docs as double))
              AS rate
          FROM counts c JOIN targets t USING (lang), total),
        q4 AS (
          SELECT q3.doc_id, q3.lang FROM q3 JOIN rates r ON r.lang = q3.lang
          WHERE ('0x' || substr(md5('mix_' || q3.doc_id), 1, 15))::BIGINT
              % 1000000 < cast(floor(r.rate * 1000000) as bigint)),
        b AS (
          SELECT lang,
            ('0x' || substr(md5('split_' || doc_id), 1, 15))::BIGINT % 100
              AS bucket
          FROM q4)
        SELECT CASE WHEN bucket < 90 THEN 'train'
                    WHEN bucket < 95 THEN 'val'
                    ELSE 'test' END AS split,
          lang, cast(count(*) as bigint) AS n_docs
        FROM b
        GROUP BY 1, 2
        ORDER BY split, lang"""),
      bench = true))

  /** Synthetic-PII fixture rows for x14: one per pattern class, mixed
    * and multi-match cases, and near-miss negatives that probe exactly
    * where Java regex and RE2 could diverge (`\b` adjacency, dot
    * semantics inside classes, bounded repetition).
    */
  val piiFixture: Seq[(Long, String)] = Seq(
    1L -> "contact alice.smith+tag@ex-ample.co.uk or bob@x.io today",
    2L -> "call 555-123-4567 or 555.987.6543 now",
    3L -> "hosts 192.168.0.1 10.0.255.13 and 8.8.8.8",
    4L -> "ssn 123-45-6789 on file",
    5L -> "mixed: a@b.co, 111-222-3333, 1.2.3.4, 999-88-7777 done",
    6L -> "near misses: not@an@email 12-345-6789 1234-56-7890 1.2.3 555-12-34567",
    7L -> "boundaries:x123-45-6789y 123-45-6789. (555-123-4567)",
    8L -> "no pii here, just words and 42")
}

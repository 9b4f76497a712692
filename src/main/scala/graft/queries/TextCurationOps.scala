package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Catalog._
import TextOps._

/** Text-analysis / curation operators (x01-x42) and the end-to-end
  * pipelines (p01-p03) over `documents`: token stats, quality, lang-id,
  * BPE train/encode/deep, winnowing, TF-IDF, mixtures, splits, DSIR,
  * packing, chunking, HTML extraction, and the five-stage curation
  * pipeline. Split out of [[TextOps]] by family (round 10); shared
  * helpers live in TextOps and are imported wholesale — behavior is
  * unchanged.
  */
object TextCurationOps {

  /** The shared BPE training loop (x41's exact per-round dataflow:
    * vocabulary-scale pair census → 1-row argmax collect → plain
    * replace, deterministic tie-break count desc then pair asc).
    * `census` is a (word, cnt) frame; returns the rank-ordered merge
    * table and the final (word, cnt, seq) frame. Early-stops when no
    * pair remains — BPE's natural termination, only reachable on tiny
    * fixtures (the verified corpora carry > nMerges distinct pairs,
    * which is what lets the oracles unroll a fixed 50-level chain).
    * Used by x47 (full-corpus encode), x48 (frozen-tokenizer
    * training) and p06 (token-priced packing).
    */
  private[graft] def bpeTrain(census: DataFrame, nMerges: Int)
      : (Seq[(Int, String, String)], DataFrame) = {
    // Round-16 optimization (guide §1.2 step 1 — fix the distributed
    // algorithm): the merge loop is inherently sequential and the
    // census is vocabulary-scale, so the 50-round Spark loop (2
    // vocabulary-scale jobs per round: pair-census collect +
    // localCheckpoint — ~100 jobs of pure scheduling overhead) is
    // replaced by ONE task running graft.text.BpeTrainer, bit-exact to
    // the old dataflow (parity asserted in QueriesSpec; semantics
    // documented on the kernel). repartition(1) — not coalesce(1) —
    // so the corpus-scale census computation upstream stays parallel.
    val spark = census.sparkSession
    import spark.implicits._
    val one = census
      .select(col("word").as("_1"), col("cnt").cast("long").as("_2"))
      .repartition(1)
      .as[(String, Long)]
    val trained = one
      .mapPartitions(it => graft.text.BpeTrainer.train(it, nMerges))
      .toDF()
      .localCheckpoint()
    val merges = trained.filter(col("kind") === 1)
      .select(col("rank"), col("word"), col("seq"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
      .toSeq
    val seqs = trained.filter(col("kind") === 0)
      .select(col("word"), col("cnt"), col("seq"))
    (merges, seqs)
  }

  /** x48's day-N encode against a FROZEN tokenizer, frame-agnostic:
    * `(doc_id, text)` rows in, one census row per doc out (word/token/
    * char counts, OOV count, md5 of the ordered token-id sequence,
    * milli-fertility). `merges` is the stored rank-ordered merge
    * table (a 50-row driver list); `vocab` the stored (tok, id)
    * frame, shipped as ONE broadcast map row. Stateless — which is
    * the point: a frozen tokenizer streams (TokenizeStream runs this
    * per micro-batch, bit-identical to the batch x48 on the same
    * slice, StreamingSpec).
    */
  private[graft] def encodeWithStoredTokenizer(docFrame: DataFrame,
      merges: Seq[(String, String)], vocab: DataFrame): DataFrame = {
    val vmap = vocab.agg(map_from_entries(array_sort(
      collect_list(struct(col("tok"), col("id"))))).as("vmap"))
    val dw = mat(docFrame.select(col("doc_id"),
      posexplode(words(col("text"))).as(Seq("pos", "word"))))
    val encoded = dw.select(col("word")).distinct()
      .select(col("word"),
        merges.foldLeft(
          rtrim(regexp_replace(col("word"), "(.)", "$1 ")): Column) {
          case (c, (l, r)) => replace(c, lit(l + " " + r), lit(l + r))
        }.as("seq"))
      .select(col("word"), split(col("seq"), " ").as("toks"))
    val wid = encoded.crossJoin(broadcast(vmap))
      .select(col("word"),
        size(col("toks")).cast("bigint").as("n_toks"),
        length(col("word")).cast("bigint").as("n_chars"),
        size(filter(transform(col("toks"),
          t => element_at(col("vmap"), t)), x => x.isNull))
          .cast("bigint").as("n_unk"),
        array_join(transform(col("toks"),
          t => coalesce(element_at(col("vmap"), t), lit(0L))
            .cast("string")), ",").as("idstr"))
    dw.join(wid, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_unk")).as("n_unk"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("idstr")))),
          x => x.getField("idstr")), ",")).as("ids_md5"))
      .withColumn("fert_milli",
        expr("(1000 * n_chars) div n_tokens"))
  }

  /** x44's synthesize → detect → redact frame, factored for reuse
    * (x44 = the per-doc census; p05 = the scrubbed-release pipeline):
    * (doc_id, source, s, n_email, n_ip, n_phone, n_ssn, red) with
    * deterministic (doc_id, k)-derived PII injected at token strides
    * 17/23/29/31 and a fixed 4-stage redaction chain. Patterns are
    * RE2∩Java-portable; every expensive column is aliased behind its
    * own projection (the synthesized text feeds five regex consumers).
    */
  private def piiRedacted(s: SparkSession, d: String): DataFrame = {
    val reEmail = "[a-z0-9]+@[a-z0-9]+\\.[a-z]{2,3}"
    val reIp = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
    val rePhone = "555-\\d{3}-\\d{4}"
    val reSsn = "\\d{3}-\\d{2}-\\d{4}"
    val d0 = docs(s, d).select(col("doc_id"), col("source"),
      words(col("text")).as("w"))
    val syn = d0.select(col("doc_id"), col("source"),
      array_join(transform(sequence(lit(1), size(col("w"))), k =>
        concat(element_at(col("w"), k),
          when(k % 17 === 0, concat(lit(" user"),
            col("doc_id").cast("string"), lit("x"), k.cast("string"),
            lit("@example"), (k % 7).cast("string"), lit(".com")))
            .otherwise(lit("")),
          when(k % 23 === 0, concat(lit(" 10."),
            (k % 256).cast("string"), lit("."),
            (col("doc_id") % 256).cast("string"), lit("."),
            ((k * 7) % 256).cast("string"))).otherwise(lit("")),
          when(k % 29 === 0, concat(lit(" 555-"),
            lpad((k % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(k % 31 === 0, concat(lit(" 987-65-"),
            lpad(((col("doc_id") + k) % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")))), " ").as("s"))
    syn.select(col("doc_id"), col("source"), col("s"),
      size(regexp_extract_all(col("s"), lit(reEmail), lit(0)))
        .cast("bigint").as("n_email"),
      size(regexp_extract_all(col("s"), lit(reIp), lit(0)))
        .cast("bigint").as("n_ip"),
      size(regexp_extract_all(col("s"), lit(rePhone), lit(0)))
        .cast("bigint").as("n_phone"),
      size(regexp_extract_all(col("s"), lit(reSsn), lit(0)))
        .cast("bigint").as("n_ssn"),
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        col("s"), lit(reEmail), lit("[EMAIL]")),
        lit(reIp), lit("[IP]")),
        lit(rePhone), lit("[PHONE]")),
        lit(reSsn), lit("[SSN]")).as("red"))
  }

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
            cast(length(pl.word) as int) AS chars,
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
    // ------------------------------------------------------------------
    // RAG ingestion pipeline census — the retrieval-side end-to-end
    // composition (p01 is the TRAINING-side one): x42's fixed-token
    // chunking → d24's chunk-level near-dup (band-bucketed, never
    // all-pairs) → a deterministic drop rule (every verified pair
    // drops its LARGER chunk id — rerun-stable because chunk ids are
    // h60(doc:idx)) → the per-source index-admission census: docs,
    // chunks, dropped/kept chunks, and the token mass actually
    // entering the vector/BM25 index. Shapes: chunking is row-local
    // expansion; pair discovery is the d03 band pipeline at chunk
    // granularity; the drop rule is one distinct + one chunk-keyed
    // left join; the census one groupBy(source). Sub-3-token chunks
    // cannot shingle, are never dropped, and stay in the census —
    // index admission includes them.
    // ------------------------------------------------------------------
    "p04_rag_ingest" -> Q(
      (s, d) => {
        val chunks = TextDedupOps.docChunksTok(s, d)
        val losers = TextDedupOps.chunkNeardupPairs(s, d)
          .select(col("chunk_b").as("cid")).distinct()
          .withColumn("dropped", lit(true))
        chunks
          .join(losers, Seq("cid"), "left")
          .select(col("source"), col("doc_id"), col("cid"),
            size(col("ct")).cast("long").as("n_tokens"),
            coalesce(col("dropped"), lit(false)).as("dropped"))
          .groupBy(col("source"))
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_chunks"),
            count(when(col("dropped"), 1)).as("n_dropped"),
            count(when(!col("dropped"), 1)).as("n_kept"),
            sum(when(!col("dropped"), col("n_tokens"))).as("kept_tokens"))
          .orderBy(col("source"))
      },
      Some("""WITH perms AS (
          SELECT
            list_transform(range(0, 64), i ->
              ('0x' || substr(md5('perm_a_' || i), 1, 15))::BIGINT % 2147483646 + 1) AS pa,
            list_transform(range(0, 64), i ->
              ('0x' || substr(md5('perm_b_' || i), 1, 15))::BIGINT % 2147483647) AS pb),
        t0 AS (
          SELECT doc_id, source, string_split_regex(
            regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents),
        ck AS (
          SELECT doc_id, source,
            ('0x' || substr(md5(doc_id || ':' || u.k), 1, 15))::BIGINT
              AS cid,
            w[(u.k*12+1):(u.k*12+16)] AS ct
          FROM t0, unnest(generate_series(0,
            greatest(1, (len(w) + 7) // 12) - 1)) AS u(k)),
        ck3 AS (SELECT * FROM ck WHERE len(ct) >= 3),
        sh AS (
          SELECT doc_id, cid,
            list_distinct(list_transform(range(1, len(ct) - 1),
              i -> ct[i] || ' ' || ct[i+1] || ' ' || ct[i+2])) AS w
          FROM ck3),
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
          SELECT DISTINCT l.cid AS chunk_a, r.cid AS chunk_b
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.band_hash = r.band_hash
              AND l.cid < r.cid AND l.doc_id <> r.doc_id),
        pairs AS (
          SELECT c.chunk_a, c.chunk_b
          FROM cand c
          JOIN sh x ON x.cid = c.chunk_a
          JOIN sh y ON y.cid = c.chunk_b
          WHERE cast(len(list_intersect(x.w, y.w)) as double) /
                cast(len(list_distinct(list_concat(x.w, y.w))) as double)
                >= 0.8),
        losers AS (SELECT DISTINCT chunk_b AS cid FROM pairs),
        marked AS (
          SELECT ck.source, ck.doc_id, ck.cid, len(ck.ct) AS n_tokens,
            l.cid IS NOT NULL AS dropped
          FROM ck LEFT JOIN losers l ON l.cid = ck.cid)
        SELECT source,
          cast(count(DISTINCT doc_id) as bigint) AS n_docs,
          cast(count(*) as bigint) AS n_chunks,
          cast(count(*) FILTER (WHERE dropped) as bigint) AS n_dropped,
          cast(count(*) FILTER (WHERE NOT dropped) as bigint) AS n_kept,
          cast(sum(n_tokens) FILTER (WHERE NOT dropped) as bigint)
            AS kept_tokens
        FROM marked GROUP BY source ORDER BY source""")),


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
        // appId-keyed: day-0 is rebuilt in-run, and concurrent
        // sessions on one sf dir must not interleave write/read-back
        val idxPath = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR",
          sys.props("java.io.tmpdir") + "/graft-index") +
          "/p02-band-index-" + new java.io.File(d).getName +
          "-" + s.sparkContext.applicationId
        bandIndex(docs(s, d).filter(!incoming), bands, rowsPerBand)
          .write.mode("overwrite").partitionBy("band").parquet(idxPath)

        // stage 0+1: URL-layer admission on the INCOMING slice only
        // (the stored history index was admitted when it was built),
        // then the quality gate (p01's arithmetic)
        val tokd = docs(s, d).filter(incoming)
          .join(urlAdmitted(s, d), Seq("doc_id"), "left_semi")
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
      Some("WITH " + urlAdmittedCte + """,
        perms AS (
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
          FROM t0 WHERE inc
            AND doc_id IN (SELECT doc_id FROM admitted)),
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
        ch AS MATERIALIZED (SELECT cast(sum(cnt * length(word))
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
    // Feature-hashed CHUNK VECTORS + retrieval — x42's vector-side
    // consumer (the d24 near-dup is the set-side one): each chunk's
    // token bag projects to a 16-dim INTEGER vector, component j =
    // Σ over tokens t of ((Aⱼ·(h60(t) mod P) + Bⱼ) mod P mod 2001 −
    // 1000) — the hashing-trick / random-projection embedding
    // (Weinberger et al.; no training, no model artifact), built on
    // the minhashSig perm substrate so each token is md5-hashed ONCE
    // and the 16 per-dim values are cheap modular arithmetic (the
    // per-(token,dim)-md5 + nested-lambda formulation measured 6.9 s
    // vs this form's 2.0 s at sf0.1). Bag overlap is preserved: shared
    // contribute identical pseudo-random components, so near-dup
    // chunks land at cosine ≈ 1. Query = doc 0's first chunk;
    // brute-force cosine top-20 over CROSS-doc chunks (the s01
    // posture at chunk granularity — the s-family's IVF/LSH legs are
    // the documented scale path). Integer dot and norms are exact;
    // cosine = dot / (sqrt(na)·sqrt(nb)) is the same single
    // expression in both engines (na·nb would overflow Long — the
    // factored sqrt keeps every operand < 2^63). One scan to vectors,
    // 1-row query broadcast, TakeOrdered top-20.
    // ------------------------------------------------------------------
    "x43_chunk_vectors" -> Q(
      (s, d) => {
        import graft.functions.PortableHash.{P, h60col, permA, permB}
        val dims = 16
        val vecs = docs(s, d)
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
          // hash each token ONCE (its own projection — the expensive-
          // alias discipline), then 16 cheap modular perms per hash.
          // The per-dim sums are UNROLLED as 16 single-level aggregate
          // expressions with literal perm constants: the nested
          // transform(dims, j => aggregate(...)) form doesn't codegen
          // (the d03 ShingleMinHash lesson) and measured 3× slower.
          .select(col("doc_id"), col("cid"),
            transform(col("ct"), t => pmod(h60col(t), lit(P))).as("ht"))
          .select(Seq(col("doc_id"), col("cid")) ++
            (0 until dims).map { j =>
              aggregate(col("ht"), lit(0L), (acc, x) =>
                acc + (pmod(lit(permA(j)) * x + lit(permB(j)), lit(P))
                  % 2001 - 1000)).as(s"v$j")
            }: _*)
          .select(col("doc_id"), col("cid"),
            array((0 until dims).map(j => col(s"v$j")): _*).as("v"))
        val dot = (a: Column, b: Column) =>
          aggregate(zip_with(a, b, (x, y) => x * y), lit(0L),
            (acc, x) => acc + x)
        val withNorm = vecs.withColumn("n2", dot(col("v"), col("v")))
        val query = withNorm
          .filter(col("doc_id") === 0 &&
            col("cid") === graft.functions.PortableHash.h60("0:0"))
          .select(col("v").as("qv"), col("n2").as("qn2"))
        withNorm.filter(col("doc_id") =!= 0)
          .crossJoin(broadcast(query))
          .withColumn("dot", dot(col("v"), col("qv")))
          .withColumn("cosine", col("dot").cast("double") /
            (sqrt(col("n2").cast("double")) *
              sqrt(col("qn2").cast("double"))))
          .select(col("cid").as("chunk_b"), col("doc_id").as("doc_b"),
            col("dot"), col("cosine"))
          .orderBy(col("cosine").desc, col("chunk_b"))
          .limit(20)
      },
      Some("""WITH t0 AS (
          SELECT doc_id, string_split_regex(
            regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents),
        ck AS (
          SELECT doc_id,
            ('0x' || substr(md5(doc_id || ':' || u.k), 1, 15))::BIGINT
              AS cid,
            w[(u.k*12+1):(u.k*12+16)] AS ct
          FROM t0, unnest(generate_series(0,
            greatest(1, (len(w) + 7) // 12) - 1)) AS u(k)),
        perms AS (
          SELECT
            list_transform(range(0, 16), i ->
              ('0x' || substr(md5('perm_a_' || i), 1, 15))::BIGINT % 2147483646 + 1) AS pa,
            list_transform(range(0, 16), i ->
              ('0x' || substr(md5('perm_b_' || i), 1, 15))::BIGINT % 2147483647) AS pb),
        hck AS (
          SELECT doc_id, cid,
            list_transform(ct, t ->
              ('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647)
              AS ht
          FROM ck),
        vecs AS (
          SELECT doc_id, cid,
            list_transform(range(0, 16), j ->
              coalesce(list_sum(list_transform(ht, x ->
                ((pa[j+1] * x + pb[j+1]) % 2147483647 % 2001) - 1000)),
                0)) AS v
          FROM hck, perms),
        wn AS (
          SELECT doc_id, cid, v,
            cast(list_sum(list_transform(v, x -> x * x)) as bigint)
              AS n2
          FROM vecs),
        q AS (
          SELECT v AS qv, n2 AS qn2 FROM wn
          WHERE doc_id = 0
            AND cid = ('0x' || substr(md5('0:0'), 1, 15))::BIGINT)
        SELECT wn.cid AS chunk_b, wn.doc_id AS doc_b,
          cast(list_dot_product(wn.v, q.qv) as bigint) AS dot,
          cast(list_dot_product(wn.v, q.qv) as double) /
            (sqrt(cast(wn.n2 as double)) * sqrt(cast(q.qn2 as double)))
            AS cosine
        FROM wn, q
        WHERE wn.doc_id <> 0
        ORDER BY cosine DESC, chunk_b
        LIMIT 20""")),


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
        // stage 0: URL-layer admission (round 12) — domain blocklist
        // + one-doc-per-canonical-URL, the web-pipeline cut that
        // happens BEFORE any text is read. Broadcast-anti + key-
        // partitioned window; see urlAdmitted.
        // stage 1: quality gate (x02's exact arithmetic); tokens
        // aliased once behind their own projection
        val tokd = docs(s, d)
          .join(urlAdmitted(s, d), Seq("doc_id"), "left_semi")
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
        // round 16: stage-1 survivors MATERIALIZED (Catalog.mat) — q1
        // feeds the posting-index detector (via CC's edge cache fill),
        // q2's keep-list join, and transitively every later stage;
        // those consumers sit behind non-identical exchanges, so
        // unmaterialized the URL-gate + tokenize + quality subtree
        // (two corpus-scale regexp_replace + split + filter lambda)
        // re-executed once per consumer (guide §5 caching rule:
        // reused AND expensive to recompute). Measured 8.10 → ~5.4 s
        // at sf0.1 together with the one-pass decontam below.
        val q1 = mat(tokd.withColumn("quality",
          (stops / nTok) * 0.4 +
            (lit(1.0) - punct / nChars) * 0.3 +
            when(avgWordLen >= 3 && avgWordLen <= 8, 0.3).otherwise(0.0))
          .filter(col("quality") >= 0.62)
          .select(col("doc_id"), col("lang"), col("w")))

        // stage 2: dedup keep-list on stage-1 survivors, candidates
        // from d08's df-capped posting index (no all-pairs, no window)
        // round 16: candidate pairs materialized (pair-scale — tiny)
        // before CC: CC's edge build unions the pair frame with its
        // mirror, and the two union branches re-ran the posting
        // pipeline's post-exchange half (pair aggregation + size
        // joins + jaccard) once each during the edge-cache fill.
        val dupPairs = mat(postingJaccardPairsFrom(
          q1.select(col("doc_id"), col("w").as("toks")))
          .select(col("doc_a"), col("doc_b")))
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
        // round 16: ONE pass instead of two — the old shape aggregated
        // posts twice (per-doc total, and per-doc contaminated after an
        // inner join), so the gram-8 explode ran once per consumer. A
        // LEFT join against the distinct benchmark-gram set marks hits
        // in-line; count(1) vs count(hit) of the SAME aggregation give
        // both totals (count of a null-on-miss column ≡ the old inner-
        // join count because benchNg is distinct — multiplicity 1).
        val posts = q2.select(col("doc_id"),
          explode(grams8(col("w"))).as("ng"))
        val perDoc = posts
          .join(benchNg.withColumn("hit", lit(1)), Seq("ng"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_ngrams"),
            count(col("hit")).as("n_contaminated"))
        val q3 = q2.select(col("doc_id"), col("lang"))
          .join(perDoc, Seq("doc_id"), "left")
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
      Some("WITH RECURSIVE " + urlAdmittedCte + """,
        w0 AS (
          SELECT doc_id, lang, text,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
          FROM documents
          WHERE doc_id IN (SELECT doc_id FROM admitted)),
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
      bench = true),


    // ------------------------------------------------------------------
    // PII detection + REDACTION census — the scrubbing stage every
    // pretraining corpus passes before release (emails, IPv4s, phone
    // numbers, SSN-shaped ids → typed placeholders). The raw corpus
    // carries no PII, so the query first SYNTHESIZES it
    // deterministically (the x40 HTML-synthesis discipline): after
    // token k it injects an email at k % 17, an IPv4 at k % 23, a
    // 555-phone at k % 29 and an SSN-shaped id at k % 31, every digit
    // derived from (doc_id, k) so DuckDB re-derives the identical
    // corpus. Detection counts each pattern class, redaction is a
    // fixed 4-stage regexp_replace chain (email → IP → phone → SSN;
    // the patterns are disjoint by construction — the 3-2-4 SSN shape
    // cannot match inside a 3-3-4 phone), and the per-doc census
    // hash-verifies the REDACTED text itself (md5) plus the char
    // deltas. Regexes use only RE2∩Java-portable constructs (char
    // classes, bounded repetition — no lookaround, no word
    // boundaries). Scale shape: entirely row-local (synthesize →
    // scan → rewrite in one pass per doc, the x40 class); each
    // expensive column (synthesized text, redacted text, each count)
    // is aliased behind its own projection so nothing re-evaluates.
    // ------------------------------------------------------------------
    "x44_pii_redaction" -> Q(
      (s, d) =>
        piiRedacted(s, d).select(col("doc_id"), col("source"),
          col("n_email"), col("n_ip"), col("n_phone"), col("n_ssn"),
          (col("n_email") + col("n_ip") + col("n_phone") + col("n_ssn"))
            .as("pii_total"),
          length(col("s")).cast("bigint").as("len_synth"),
          length(col("red")).cast("bigint").as("len_redacted"),
          md5(col("red")).as("redacted_md5"))
          .orderBy(col("doc_id")),
      Some("""WITH d0 AS (
          SELECT doc_id, source,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'),
              '\s+') AS w
          FROM documents),
        syn AS (
          SELECT doc_id, source,
            array_to_string(list_transform(range(1, len(w) + 1), k ->
              w[k] ||
              CASE WHEN k % 17 = 0 THEN ' user' || doc_id || 'x' || k ||
                   '@example' || (k % 7) || '.com' ELSE '' END ||
              CASE WHEN k % 23 = 0 THEN ' 10.' || (k % 256) || '.' ||
                   (doc_id % 256) || '.' || ((k * 7) % 256) ELSE '' END ||
              CASE WHEN k % 29 = 0 THEN ' 555-' ||
                   lpad(cast(k % 1000 as varchar), 3, '0') || '-' ||
                   lpad(cast(doc_id % 10000 as varchar), 4, '0')
                 ELSE '' END ||
              CASE WHEN k % 31 = 0 THEN ' 987-65-' ||
                   lpad(cast((doc_id + k) % 10000 as varchar), 4, '0')
                 ELSE '' END
              ), ' ') AS s
          FROM d0),
        det AS (
          SELECT doc_id, source, s,
            len(regexp_extract_all(s, '[a-z0-9]+@[a-z0-9]+\.[a-z]{2,3}'))
              AS n_email,
            len(regexp_extract_all(s,
              '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS n_ip,
            len(regexp_extract_all(s, '555-\d{3}-\d{4}')) AS n_phone,
            len(regexp_extract_all(s, '\d{3}-\d{2}-\d{4}')) AS n_ssn
          FROM syn),
        red AS (
          SELECT *, regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(s,
                    '[a-z0-9]+@[a-z0-9]+\.[a-z]{2,3}', '[EMAIL]', 'g'),
                  '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '[IP]', 'g'),
                '555-\d{3}-\d{4}', '[PHONE]', 'g'),
              '\d{3}-\d{2}-\d{4}', '[SSN]', 'g') AS red
          FROM det)
        SELECT doc_id, source,
          cast(n_email as bigint) AS n_email, cast(n_ip as bigint) AS n_ip,
          cast(n_phone as bigint) AS n_phone, cast(n_ssn as bigint) AS n_ssn,
          cast(n_email + n_ip + n_phone + n_ssn as bigint) AS pii_total,
          cast(length(s) as bigint) AS len_synth,
          cast(length(red) as bigint) AS len_redacted,
          md5(red) AS redacted_md5
        FROM red ORDER BY doc_id""")),


    // ------------------------------------------------------------------
    // Vocabulary MASS-COVERAGE curve — the tokenizer-truncation census
    // between x22 (vocab growth vs corpus size) and x39 (Zipf
    // exponent): what fraction of the corpus token mass does a top-k
    // vocabulary cover, for k on a doubling ladder? A tokenizer
    // designer reads the OOV rate of a size-k word vocab straight off
    // 1 − coverage(k). Honest readout on this flat synthetic Zipf:
    // 16 words cover only 55% (real text covers ~90%+). Scale shape:
    // ONE corpus tokenize → vocab census; the ladder needs only the
    // global TOP-64 rows (sort-limit = TakeOrdered, never a
    // vocab-wide window — the x22 single-task lesson) + a 1-row
    // totals broadcast; the 64-row window below runs on 64 rows.
    // ------------------------------------------------------------------
    "x45_vocab_coverage" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val census = mat(docs(s, d)
          .select(explode(words(col("text"))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt")))
        val tot = census.agg(sum(col("cnt")).as("total_tokens"),
          count(lit(1)).as("n_vocab"))
        val top64 = census.orderBy(col("cnt").desc, col("word")).limit(64)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("cnt").desc, col("word"))).cast("long"))
        val ks = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L).toDF("k")
        ks.join(broadcast(top64), col("rk") <= col("k"))
          .crossJoin(broadcast(tot))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n_in_top"),
            max(when(col("rk") === col("k"), col("word")))
              .as("boundary_word"),
            max(when(col("rk") === col("k"), col("cnt")))
              .as("boundary_cnt"),
            sum(col("cnt")).as("covered"),
            max(col("total_tokens")).as("total_tokens"),
            max(col("n_vocab")).as("n_vocab"))
          .withColumn("coverage", col("covered").cast("double") /
            col("total_tokens").cast("double"))
          .orderBy(col("k"))
      },
      Some("""WITH census AS (
          SELECT w AS word, cast(count(*) as bigint) AS cnt FROM (
            SELECT unnest(string_split_regex(
              regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS w
            FROM documents) GROUP BY 1),
        tot AS (
          SELECT cast(sum(cnt) as bigint) AS total_tokens,
            cast(count(*) as bigint) AS n_vocab FROM census),
        top64 AS (
          SELECT word, cnt,
            cast(row_number() OVER (ORDER BY cnt DESC, word) as bigint)
              AS rk
          FROM census ORDER BY cnt DESC, word LIMIT 64),
        ks AS (SELECT cast(unnest([1, 2, 4, 8, 16, 32, 64]) as bigint)
               AS k)
        SELECT ks.k,
          cast(count(*) as bigint) AS n_in_top,
          max(CASE WHEN t.rk = ks.k THEN t.word END) AS boundary_word,
          cast(max(CASE WHEN t.rk = ks.k THEN t.cnt END) as bigint)
            AS boundary_cnt,
          cast(sum(t.cnt) as bigint) AS covered,
          max(tot.total_tokens) AS total_tokens,
          max(tot.n_vocab) AS n_vocab,
          cast(sum(t.cnt) as double) / cast(max(tot.total_tokens) as double)
            AS coverage
        FROM ks JOIN top64 t ON t.rk <= ks.k, tot
        GROUP BY ks.k ORDER BY ks.k""")),


    // ------------------------------------------------------------------
    // Scrubbed-release pipeline census — the composition a privacy
    // review actually signs off on: x44's synthesize → detect → redact
    // stage feeding the x02 quality gate, with the admission decision
    // evaluated on BOTH sides of the scrub. Per source: docs, PII
    // incidence/total, char and token mass before/after redaction, and
    // the quality-gate (> 0.65) pass counts before/after — including
    // the FLIP censuses (fail→pass and pass→fail), the honest readout
    // that scrubbing changes downstream curation decisions (3 docs
    // flip in at sf0.01: replacing sprawling emails/IPs with [EMAIL]/
    // [IP] placeholder tokens nudges the mean-word-length bonus).
    // Everything emitted is an integer; the quality doubles exist only
    // inside per-row gate comparisons against a decimal literal
    // (cross-engine safe). Scale shape: row-local synth/redact/score
    // (x44's class), one source-keyed aggregation.
    // ------------------------------------------------------------------
    "p05_scrubbed_release" -> Q(
      (s, d) => {
        def qOf(c: Column): Column = {
          val wv = split(c, "\\s+")
          val nTok = size(wv).cast("double")
          val nChars = length(c).cast("double")
          val punct = (length(c) -
            length(regexp_replace(c, "[.,!?;:]", ""))).cast("double")
          val stops = size(filter(wv, x =>
            x.isin("the", "a", "of", "and", "to", "in"))).cast("double")
          val awl = length(regexp_replace(c, "\\s+", ""))
            .cast("double") / nTok
          (stops / nTok) * 0.4 + (lit(1.0) - punct / nChars) * 0.3 +
            when(awl >= 3 && awl <= 8, 0.3).otherwise(0.0)
        }
        val per = piiRedacted(s, d).select(col("source"),
          (col("n_email") + col("n_ip") + col("n_phone") + col("n_ssn"))
            .as("pii"),
          length(col("s")).cast("long").as("len_s"),
          length(col("red")).cast("long").as("len_r"),
          size(split(col("s"), "\\s+")).cast("long").as("tok_s"),
          size(split(col("red"), "\\s+")).cast("long").as("tok_r"),
          qOf(col("s")).as("qs"), qOf(col("red")).as("qr"))
        per.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("pii") > 0, 1L).otherwise(0L))
              .as("docs_with_pii"),
            sum(col("pii")).as("pii_total"),
            sum(col("len_s")).as("chars_before"),
            sum(col("len_r")).as("chars_after"),
            sum(col("tok_s")).as("tokens_before"),
            sum(col("tok_r")).as("tokens_after"),
            sum(when(col("qs") > 0.65, 1L).otherwise(0L))
              .as("pass_before"),
            sum(when(col("qr") > 0.65, 1L).otherwise(0L))
              .as("pass_after"),
            sum(when(!(col("qs") > 0.65) && col("qr") > 0.65, 1L)
              .otherwise(0L)).as("flip_in"),
            sum(when(col("qs") > 0.65 && !(col("qr") > 0.65), 1L)
              .otherwise(0L)).as("flip_out"))
          .orderBy(col("source"))
      },
      Some("""WITH d0 AS (
          SELECT doc_id, source,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'),
              '\s+') AS w
          FROM documents),
        syn AS (
          SELECT doc_id, source,
            array_to_string(list_transform(range(1, len(w) + 1), k ->
              w[k] ||
              CASE WHEN k % 17 = 0 THEN ' user' || doc_id || 'x' || k ||
                   '@example' || (k % 7) || '.com' ELSE '' END ||
              CASE WHEN k % 23 = 0 THEN ' 10.' || (k % 256) || '.' ||
                   (doc_id % 256) || '.' || ((k * 7) % 256) ELSE '' END ||
              CASE WHEN k % 29 = 0 THEN ' 555-' ||
                   lpad(cast(k % 1000 as varchar), 3, '0') || '-' ||
                   lpad(cast(doc_id % 10000 as varchar), 4, '0')
                 ELSE '' END ||
              CASE WHEN k % 31 = 0 THEN ' 987-65-' ||
                   lpad(cast((doc_id + k) % 10000 as varchar), 4, '0')
                 ELSE '' END
              ), ' ') AS s
          FROM d0),
        red AS (
          SELECT doc_id, source, s,
            cast(len(regexp_extract_all(s,
              '[a-z0-9]+@[a-z0-9]+\.[a-z]{2,3}')) as bigint)
              + cast(len(regexp_extract_all(s,
              '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) as bigint)
              + cast(len(regexp_extract_all(s,
              '555-\d{3}-\d{4}')) as bigint)
              + cast(len(regexp_extract_all(s,
              '\d{3}-\d{2}-\d{4}')) as bigint) AS pii,
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(s,
              '[a-z0-9]+@[a-z0-9]+\.[a-z]{2,3}', '[EMAIL]', 'g'),
              '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '[IP]', 'g'),
              '555-\d{3}-\d{4}', '[PHONE]', 'g'),
              '\d{3}-\d{2}-\d{4}', '[SSN]', 'g') AS r
          FROM syn),
        q AS (
          SELECT source, pii,
            cast(length(s) as bigint) AS len_s,
            cast(length(r) as bigint) AS len_r,
            cast(len(string_split_regex(s, '\s+')) as bigint) AS tok_s,
            cast(len(string_split_regex(r, '\s+')) as bigint) AS tok_r,
            (cast(len(list_filter(string_split_regex(s, '\s+'), x ->
                x IN ('the','a','of','and','to','in'))) as double) /
              cast(len(string_split_regex(s, '\s+')) as double)) * 0.4 +
              (1.0 - cast(length(s) - length(regexp_replace(s,
                '[.,!?;:]', '', 'g')) as double) /
                cast(length(s) as double)) * 0.3 +
              CASE WHEN cast(length(regexp_replace(s, '\s+', '', 'g'))
                     as double) /
                   cast(len(string_split_regex(s, '\s+')) as double) >= 3
                 AND cast(length(regexp_replace(s, '\s+', '', 'g'))
                     as double) /
                   cast(len(string_split_regex(s, '\s+')) as double) <= 8
                THEN 0.3 ELSE 0.0 END AS qs,
            (cast(len(list_filter(string_split_regex(r, '\s+'), x ->
                x IN ('the','a','of','and','to','in'))) as double) /
              cast(len(string_split_regex(r, '\s+')) as double)) * 0.4 +
              (1.0 - cast(length(r) - length(regexp_replace(r,
                '[.,!?;:]', '', 'g')) as double) /
                cast(length(r) as double)) * 0.3 +
              CASE WHEN cast(length(regexp_replace(r, '\s+', '', 'g'))
                     as double) /
                   cast(len(string_split_regex(r, '\s+')) as double) >= 3
                 AND cast(length(regexp_replace(r, '\s+', '', 'g'))
                     as double) /
                   cast(len(string_split_regex(r, '\s+')) as double) <= 8
                THEN 0.3 ELSE 0.0 END AS qr
          FROM red)
        SELECT source,
          cast(count(*) as bigint) AS n_docs,
          cast(count(*) FILTER (WHERE pii > 0) as bigint) AS docs_with_pii,
          cast(sum(pii) as bigint) AS pii_total,
          cast(sum(len_s) as bigint) AS chars_before,
          cast(sum(len_r) as bigint) AS chars_after,
          cast(sum(tok_s) as bigint) AS tokens_before,
          cast(sum(tok_r) as bigint) AS tokens_after,
          cast(count(*) FILTER (WHERE qs > 0.65) as bigint) AS pass_before,
          cast(count(*) FILTER (WHERE qr > 0.65) as bigint) AS pass_after,
          cast(count(*) FILTER (WHERE NOT (qs > 0.65) AND qr > 0.65)
            as bigint) AS flip_in,
          cast(count(*) FILTER (WHERE qs > 0.65 AND NOT (qr > 0.65))
            as bigint) AS flip_out
        FROM q GROUP BY source ORDER BY source""")),


    // ------------------------------------------------------------------
    // Per-source HELLINGER divergence from the corpus unigram
    // distribution — the mixture-design diagnostic behind x16's plan
    // (a source whose word distribution diverges needs its own
    // sampling rate; near-zero distance says the sources are
    // exchangeable — the honest readout here, with one source missing
    // a vocabulary word). Hellinger over KL/JS is an EXACTNESS
    // decision, found the hard way: ln() is NOT correctly rounded and
    // Java vs DuckDB libm differ by 1 ulp on some inputs (a JS
    // formulation hash-mismatched at 8.7e-19), while the Bhattacharyya
    // coefficient BC = Σ √(p·q) uses only correctly-rounded IEEE ops
    // (divide, multiply, sqrt) over identical inputs plus a
    // WORD-SORTED ordered fold (the x35 rule) — bit-identical by
    // construction. Absent words contribute exactly 0 to BC, so only
    // PRESENT words are ever enumerated: no source × vocabulary
    // expansion, which at a billions-word web vocabulary is the
    // difference between a census join and a cross product. ONE
    // tokenize feeds the (source, word) census; everything downstream
    // is vocab/census-scale. H² = 1 − BC; H = √(1 − BC).
    // ------------------------------------------------------------------
    "x46_source_divergence" -> Q(
      (s, d) => {
        val tok = docs(s, d).select(col("source"),
          explode(words(col("text"))).as("w"))
        val sc = mat(tok.groupBy(col("source"), col("w"))
          .agg(count(lit(1)).as("cs")))
        val cc = sc.groupBy(col("w")).agg(sum(col("cs")).as("c"))
        val ns = sc.groupBy(col("source"))
          .agg(sum(col("cs")).as("n_s"), count(lit(1)).as("v_s"))
        val nt = cc.agg(sum(col("c")).as("n"))
        val ser = sc.join(cc, "w")
          .groupBy(col("source"))
          .agg(transform(array_sort(collect_list(struct(col("w"),
            col("cs"), col("c")))), x =>
            struct(x.getField("cs").cast("double").as("cs"),
              x.getField("c").cast("double").as("c"))).as("lst"))
        ser.join(ns, "source").crossJoin(broadcast(nt))
          .withColumn("st", aggregate(col("lst"),
            array(lit(0.0), lit(0.0)),
            (acc, x) => {
              // one Column val = one expression tree, repeated
              // verbatim — identical op order to the oracle's
              // spelled-out subexpressions
              val p = x.getField("cs") / col("n_s").cast("double")
              val q = x.getField("c") / col("n").cast("double")
              array(
                element_at(acc, 1) + sqrt(p * q),
                element_at(acc, 2) + q)
            }))
          .select(col("source"), col("n_s").as("n_tokens"),
            col("v_s").as("n_vocab"), col("n").as("corpus_tokens"),
            element_at(col("st"), 2).as("q_covered"),
            element_at(col("st"), 1).as("bhattacharyya"),
            (lit(1.0) - element_at(col("st"), 1)).as("hellinger_sq"),
            sqrt(lit(1.0) - element_at(col("st"), 1)).as("hellinger"))
          .orderBy(col("source"))
      },
      Some("""WITH tok AS (
          SELECT source, unnest(string_split_regex(
            regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS w
          FROM documents),
        sc AS (SELECT source, w, cast(count(*) as bigint) AS cs
               FROM tok GROUP BY 1, 2),
        cc AS (SELECT w, cast(sum(cs) as bigint) AS c
               FROM sc GROUP BY 1),
        ns AS (SELECT source, cast(sum(cs) as bigint) AS n_s,
               cast(count(*) as bigint) AS v_s FROM sc GROUP BY source),
        nt AS (SELECT cast(sum(c) as bigint) AS n FROM cc),
        ser AS (
          SELECT sc.source,
            list(sc.cs ORDER BY sc.w) AS csl,
            list(cc.c ORDER BY sc.w) AS cl
          FROM sc JOIN cc ON cc.w = sc.w GROUP BY sc.source),
        f AS (
          SELECT ser.source, ns.n_s, ns.v_s, nt.n,
            list_reduce(list_prepend([0.0, 0.0],
              list_transform(range(1, len(csl) + 1), i ->
                [cast(csl[cast(i as int)] as double),
                 cast(cl[cast(i as int)] as double)])),
              (acc, x) -> [
                acc[1] + sqrt((x[1] / cast(ns.n_s as double)) *
                  (x[2] / cast(nt.n as double))),
                acc[2] + x[2] / cast(nt.n as double)]) AS st
          FROM ser JOIN ns ON ns.source = ser.source, nt)
        SELECT source, n_s AS n_tokens, v_s AS n_vocab,
          n AS corpus_tokens,
          st[2] AS q_covered,
          st[1] AS bhattacharyya,
          1.0 - st[1] AS hellinger_sq,
          sqrt(1.0 - st[1]) AS hellinger
        FROM f ORDER BY source""")),


    // ------------------------------------------------------------------
    // FULL-CORPUS BPE encode — x41's 50-merge table applied to EVERY
    // document (the most-used LLM-pipeline operator: the tokenizer run
    // that prices a corpus in tokens). The scale discipline is that
    // merges never touch the corpus: the 50 training rounds and the
    // 50-chained-replace encode both run on the VOCABULARY-scale word
    // census (Heaps-law sublinear in corpus size), token ids come from
    // a vocabulary-scale dense-rank, and the token→id map rides as ONE
    // broadcast row (d12's codebook-as-data posture) so id assignment
    // is a row-local array transform. The corpus is touched exactly
    // twice, both single passes: one tokenize+posexplode (materialized,
    // shared by census and reassembly) and one word-keyed hash join +
    // per-doc aggregation. Never merges × corpus re-scans. Per doc:
    // word/token counts and md5 of the comma-joined token-id sequence
    // (hash-verifying the exact ids in order); corpus token mass rides
    // a 1-row broadcast. x29's per-lang token budgets are this query's
    // cheap preview (census-only, no per-doc sequences).
    // ------------------------------------------------------------------
    "x47_bpe_corpus_encode" -> Q(
      (s, d) => {
        val nMerges = 50
        // ONE tokenize pass, materialized: census + reassembly share it
        val dw = mat(docs(s, d).select(col("doc_id"),
          posexplode(words(col("text"))).as(Seq("pos", "word"))))
        val census = dw.groupBy(col("word"))
          .agg(count(lit(1)).as("cnt")).localCheckpoint()
        // x41's exact training dataflow (shared bpeTrain helper),
        // without the compression-curve actions
        val (_, seqs) = bpeTrain(census, nMerges)
        val wt = seqs.select(col("word"), split(col("seq"), " ")
          .as("toks")).localCheckpoint()
        // dense token ids: vocabulary-scale global rank (the single-
        // partition window is metadata-sized by Heaps' law)
        val vocab = wt.select(explode(col("toks")).as("tok")).distinct()
          .withColumn("id", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy(col("tok")))
            .cast("long"))
        // token→id as ONE broadcast map row: id assignment is then a
        // row-local transform, no per-token explode/join at any scale
        val vmap = vocab.agg(map_from_entries(array_sort(
          collect_list(struct(col("tok"), col("id"))))).as("vmap"))
        val wid = wt.crossJoin(broadcast(vmap))
          .select(col("word"),
            size(col("toks")).cast("bigint").as("n_toks"),
            array_join(transform(col("toks"),
              t => element_at(col("vmap"), t).cast("string")), ",")
              .as("idstr"))
        val perDoc = dw.join(wid, Seq("word"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("n_toks")).as("n_tokens"),
            md5(array_join(transform(
              array_sort(collect_list(struct(col("pos"), col("idstr")))),
              x => x.getField("idstr")), ",")).as("ids_md5"))
        val mass = perDoc.agg(sum(col("n_tokens")).as("corpus_tokens"))
        perDoc.crossJoin(broadcast(mass))
          .select(col("doc_id"), col("n_words"), col("n_tokens"),
            col("ids_md5"), col("corpus_tokens"))
          .orderBy(col("doc_id"))
      },
      Some {
        val nMerges = 50
        // x41's generated level chain, carrying the word through the
        // replaces (x41 needs only (cnt, seq); the encode needs the
        // word → final-seq mapping)
        val levels = (1 to nMerges).map { k =>
          val prev = if (k == 1) "s0" else s"s${k - 1}"
          s"""p$k AS (SELECT s.cnt, s.t[u.g] AS lhs, s.t[u.g + 1] AS rhs
          FROM (SELECT cnt, string_split(seq, ' ') AS t FROM $prev) s,
            unnest(generate_series(1, len(s.t) - 1)) AS u(g)),
        b$k AS (SELECT lhs, rhs, cast(sum(cnt) as bigint) AS c
          FROM p$k GROUP BY 1, 2 ORDER BY c DESC, lhs, rhs LIMIT 1),
        s$k AS MATERIALIZED (SELECT $prev.word, $prev.cnt,
            replace($prev.seq, b$k.lhs || ' ' || b$k.rhs,
              b$k.lhs || b$k.rhs) AS seq
          FROM $prev, b$k)"""
        }.mkString(",\n        ")
        s"""WITH census AS MATERIALIZED (
          SELECT w AS word, cast(count(*) as bigint) AS cnt FROM (
            SELECT unnest(string_split_regex(
              regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+')) AS w
            FROM documents) GROUP BY 1),
        s0 AS (SELECT word, cnt,
            rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
          FROM census),
        $levels,
        wt AS MATERIALIZED (
          SELECT word, string_split(seq, ' ') AS toks FROM s$nMerges),
        vocab AS MATERIALIZED (
          SELECT tok, cast(row_number() OVER (ORDER BY tok) as bigint)
            AS id
          FROM (SELECT DISTINCT unnest(toks) AS tok FROM wt)),
        wid AS MATERIALIZED (
          SELECT e.word, cast(len(any_value(e.toks)) as bigint) AS n_toks,
            string_agg(v.id, ',' ORDER BY e.tp) AS idstr
          FROM (SELECT word, toks, toks[u.tp] AS tok, u.tp
                FROM wt, LATERAL (SELECT unnest(range(1, len(toks) + 1))
                  AS tp) u) e
          JOIN vocab v ON v.tok = e.tok
          GROUP BY e.word),
        dw AS (
          SELECT d.doc_id, u.pos, d.w[u.pos] AS word
          FROM (SELECT doc_id, string_split_regex(
              regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+') AS w
            FROM documents) d,
          LATERAL (SELECT unnest(range(1, len(d.w) + 1)) AS pos) u),
        per_doc AS (
          SELECT dw.doc_id,
            cast(count(*) as bigint) AS n_words,
            cast(sum(wid.n_toks) as bigint) AS n_tokens,
            md5(string_agg(wid.idstr, ',' ORDER BY dw.pos)) AS ids_md5
          FROM dw JOIN wid ON wid.word = dw.word
          GROUP BY dw.doc_id),
        mass AS (SELECT cast(sum(n_tokens) as bigint) AS corpus_tokens
          FROM per_doc)
        SELECT p.doc_id, p.n_words, p.n_tokens, p.ids_md5,
          m.corpus_tokens
        FROM per_doc p, mass m
        ORDER BY p.doc_id"""
      },
      bench = true),


    // ------------------------------------------------------------------
    // FROZEN-tokenizer incremental encode — the operational other half
    // of x47 (d16/p02's stored-artifact posture applied to the
    // tokenizer): day-0 trains the 50-merge table on the BASE corpus
    // (sources src01-15) and FREEZES merge table + vocab to parquet;
    // day-N encodes ONLY the arriving slice (src16-19) from the stored
    // artifacts — the base text is never re-read, so incremental cost
    // is O(new slice + vocab), exactly how a production tokenizer is
    // deployed. OOV accounting is live (stored-vocab misses map to id
    // 0 and are counted per doc) but n_unk = 0 on this corpus is
    // itself the finding: a character-level base vocab covers any new
    // text whose alphabet was seen — the no-OOV property byte-level
    // BPE exists for; the OOV path fires for real on an out-of-
    // alphabet fixture in QueriesSpec. The drift signal that DOES
    // move per doc is fertility (milli-chars per token, integer-exact
    // 1505-2785 here): new-slice words get less merge benefit than
    // the data the merges were trained on. Oracle: x47's generated
    // chain trains on the old slice while a PARALLEL chain applies
    // each rank's merge to the new-slice word census.
    // ------------------------------------------------------------------
    "x48_bpe_incremental_encode" -> Q(
      (s, d) => {
        val nMerges = 50
        val newSrcs = Seq("src16", "src17", "src18", "src19")
        val oldDocs = docs(s, d).filter(!col("source").isin(newSrcs: _*))
        val newDocs = docs(s, d).filter(col("source").isin(newSrcs: _*))
        // day-0: train on the BASE corpus only (shared bpeTrain)
        val census = oldDocs.select(explode(words(col("text"))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
          .localCheckpoint()
        val (merges, seqs) = bpeTrain(census, nMerges)
        // FREEZE the tokenizer: merge table + vocab persisted, then
        // read BACK — the artifacts on disk are the deployment unit
        import s.implicits._
        // per-dataset suffix (the d16/d25 discipline): concurrent
        // Verify runs on different sf dirs must not share artifacts
        val tokDir =
          s"${System.getProperty("java.io.tmpdir")}/graft_x48_tokenizer_" +
            new java.io.File(d).getName
        merges.toDF("rank", "lhs", "rhs").coalesce(1)
          .write.mode("overwrite").parquet(s"$tokDir/merges.parquet")
        seqs.select(explode(split(col("seq"), " ")).as("tok")).distinct()
          .withColumn("id", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy(col("tok")))
            .cast("long"))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$tokDir/vocab.parquet")
        // day-N: encode ONLY the new slice from the STORED artifacts
        val storedMerges = s.read.parquet(s"$tokDir/merges.parquet")
          .orderBy(col("rank")).collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        encodeWithStoredTokenizer(newDocs, storedMerges,
          s.read.parquet(s"$tokDir/vocab.parquet"))
          .orderBy(col("doc_id"))
      },
      Some {
        val nMerges = 50
        // training chain on the OLD census + a PARALLEL chain applying
        // each rank's winning merge to the NEW-slice word census
        val levels = (1 to nMerges).map { k =>
          val prev = if (k == 1) "s0" else s"s${k - 1}"
          val nprev = if (k == 1) "n0" else s"n${k - 1}"
          s"""p$k AS (SELECT s.cnt, s.t[u.g] AS lhs, s.t[u.g + 1] AS rhs
          FROM (SELECT cnt, string_split(seq, ' ') AS t FROM $prev) s,
            unnest(generate_series(1, len(s.t) - 1)) AS u(g)),
        b$k AS (SELECT lhs, rhs, cast(sum(cnt) as bigint) AS c
          FROM p$k GROUP BY 1, 2 ORDER BY c DESC, lhs, rhs LIMIT 1),
        s$k AS MATERIALIZED (SELECT $prev.cnt,
            replace($prev.seq, b$k.lhs || ' ' || b$k.rhs,
              b$k.lhs || b$k.rhs) AS seq
          FROM $prev, b$k),
        n$k AS MATERIALIZED (SELECT $nprev.word,
            replace($nprev.seq, b$k.lhs || ' ' || b$k.rhs,
              b$k.lhs || b$k.rhs) AS seq
          FROM $nprev, b$k)"""
        }.mkString(",\n        ")
        s"""WITH oldcensus AS MATERIALIZED (
          SELECT w AS word, cast(count(*) as bigint) AS cnt FROM (
            SELECT unnest(string_split_regex(
              regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+')) AS w
            FROM documents
            WHERE source NOT IN ('src16','src17','src18','src19'))
          GROUP BY 1),
        newwords AS MATERIALIZED (
          SELECT DISTINCT w AS word FROM (
            SELECT unnest(string_split_regex(
              regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+')) AS w
            FROM documents
            WHERE source IN ('src16','src17','src18','src19'))),
        s0 AS (SELECT cnt,
            rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
          FROM oldcensus),
        n0 AS (SELECT word,
            rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
          FROM newwords),
        $levels,
        vocab AS MATERIALIZED (
          SELECT tok, cast(row_number() OVER (ORDER BY tok) as bigint)
            AS id
          FROM (SELECT DISTINCT unnest(string_split(seq, ' ')) AS tok
                FROM s$nMerges)),
        wid AS MATERIALIZED (
          SELECT e.word, cast(len(any_value(e.toks)) as bigint) AS n_toks,
            cast(length(any_value(e.word)) as bigint) AS n_chars,
            cast(count(*) FILTER (WHERE v.id IS NULL) as bigint) AS n_unk,
            string_agg(coalesce(v.id, 0), ',' ORDER BY e.tp) AS idstr
          FROM (SELECT word, toks, toks[u.tp] AS tok, u.tp
                FROM (SELECT word, string_split(seq, ' ') AS toks
                      FROM n$nMerges) w0,
                LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS tp) u) e
          LEFT JOIN vocab v ON v.tok = e.tok
          GROUP BY e.word),
        dw AS (
          SELECT d.doc_id, u.pos, d.w[u.pos] AS word
          FROM (SELECT doc_id, string_split_regex(
              regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+') AS w
            FROM documents
            WHERE source IN ('src16','src17','src18','src19')) d,
          LATERAL (SELECT unnest(range(1, len(d.w) + 1)) AS pos) u)
        SELECT dw.doc_id,
          cast(count(*) as bigint) AS n_words,
          cast(sum(wid.n_toks) as bigint) AS n_tokens,
          cast(sum(wid.n_chars) as bigint) AS n_chars,
          cast(sum(wid.n_unk) as bigint) AS n_unk,
          md5(string_agg(wid.idstr, ',' ORDER BY dw.pos)) AS ids_md5,
          cast((1000 * sum(wid.n_chars)) // sum(wid.n_toks) as bigint)
            AS fert_milli
        FROM dw JOIN wid ON wid.word = dw.word
        GROUP BY dw.doc_id
        ORDER BY dw.doc_id"""
      }),


    // ------------------------------------------------------------------
    // Token-priced packing bill — x47's exact BPE counts driving x23's
    // packing arithmetic, side by side with the whitespace-word
    // pricing: the decision table a training run reads before
    // committing compute (context windows are budgeted in TOKENS; a
    // whitespace count under-prices the corpus by the fertility
    // factor, here ~2.2×). Per pricing unit: docs, total units, 512-
    // unit context windows consumed, docs crossing a window boundary
    // (the attention-bleed statistic), and the fill of the final
    // partial window. Both legs ride the x22/x23 two-level block
    // prefix sum (no corpus-wide window); the BPE leg's counts come
    // from the vocabulary-scale trained word encodings joined back to
    // one tokenize pass — no per-token materialization anywhere.
    // ------------------------------------------------------------------
    "p06_token_budget_pack" -> Q(
      (s, d) => {
        val L = 512L
        val nMerges = 50
        val dw = mat(docs(s, d).select(col("doc_id"),
          explode(words(col("text"))).as("word")))
        val wcounts = dw.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n")).localCheckpoint()
        val census = dw.groupBy(col("word"))
          .agg(count(lit(1)).as("cnt")).localCheckpoint()
        val (_, seqs) = bpeTrain(census, nMerges)
        val wlen = seqs.select(col("word"),
          size(split(col("seq"), " ")).cast("long").as("n_toks"))
        val bcounts = dw.join(wlen, Seq("word"))
          .groupBy(col("doc_id")).agg(sum(col("n_toks")).as("n"))
          .localCheckpoint()
        def bill(counts: DataFrame, unit: String): DataFrame =
          counts.filter(col("n") > 0)
            .join(streamOffsets(counts), Seq("doc_id"))
            .select(col("n"), col("off"),
              expr(s"off div $L").as("sf"),
              expr(s"(off + n - 1) div $L").as("sl"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n")).as("n_units"),
              (max(col("sl")) + 1).as("n_seqs"),
              count(when(col("sf") =!= col("sl"), 1))
                .as("docs_spanning"))
            .select(lit(unit).as("unit"), col("n_docs"),
              col("n_units"), col("n_seqs"), col("docs_spanning"),
              expr(s"(1000 * (n_units - (n_seqs - 1) * $L)) div $L")
                .as("tail_fill_milli"))
        // byte-regex leg (round 12, x52's tokenizer): GPT-2 pretokens
        // with the Ġ space marker, trained with the same dataflow —
        // the bill a production tokenizer would actually charge
        val re = "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"
        val pdw = mat(docs(s, d).select(col("doc_id"),
            explode(regexp_extract_all(col("text"), lit(re), lit(0)))
              .as("pt"))
          .select(col("doc_id"),
            regexp_replace(col("pt"), "^ ", "Ġ").as("word")))
        val ptCensus = pdw.groupBy(col("word"))
          .agg(count(lit(1)).as("cnt")).localCheckpoint()
        val (_, yseqs) = bpeTrain(ptCensus, nMerges)
        val ylen = yseqs.select(col("word"),
          size(split(col("seq"), " ")).cast("long").as("n_toks"))
        val ycounts = pdw.join(ylen, Seq("word"))
          .groupBy(col("doc_id")).agg(sum(col("n_toks")).as("n"))
          .localCheckpoint()
        bill(wcounts, "words").unionAll(bill(bcounts, "bpe"))
          .unionAll(bill(ycounts, "bpe_byte"))
          .orderBy(col("unit"))
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
        s$k AS MATERIALIZED (SELECT $prev.word, $prev.cnt,
            replace($prev.seq, b$k.lhs || ' ' || b$k.rhs,
              b$k.lhs || b$k.rhs) AS seq
          FROM $prev, b$k)"""
        }.mkString(",\n        ")
        val ylevels = (1 to nMerges).map { k =>
          val prev = s"ys${k - 1}"
          s"""yp$k AS (SELECT s.cnt, s.t[u.g] AS lhs, s.t[u.g + 1] AS rhs
          FROM (SELECT cnt, string_split(seq, ' ') AS t FROM $prev) s,
            unnest(generate_series(1, len(s.t) - 1)) AS u(g)),
        yb$k AS (SELECT lhs, rhs, cast(sum(cnt) as bigint) AS c
          FROM yp$k GROUP BY 1, 2 ORDER BY c DESC, lhs, rhs LIMIT 1),
        ys$k AS MATERIALIZED (SELECT $prev.word, $prev.cnt,
            replace($prev.seq, yb$k.lhs || ' ' || yb$k.rhs,
              yb$k.lhs || yb$k.rhs) AS seq
          FROM $prev, yb$k)"""
        }.mkString(",\n        ")
        s"""WITH dwords AS MATERIALIZED (
          SELECT doc_id, unnest(string_split_regex(
            regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+')) AS word
          FROM documents),
        census AS MATERIALIZED (
          SELECT word, cast(count(*) as bigint) AS cnt
          FROM dwords GROUP BY 1),
        s0 AS (SELECT word, cnt,
            rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
          FROM census),
        $levels,
        wlen AS MATERIALIZED (
          SELECT word, cast(len(string_split(seq, ' ')) as bigint)
            AS n_toks
          FROM s$nMerges),
        wct AS (SELECT doc_id, cast(count(*) as bigint) AS n
          FROM dwords GROUP BY 1),
        bct AS (SELECT d.doc_id, cast(sum(w.n_toks) as bigint) AS n
          FROM dwords d JOIN wlen w ON w.word = d.word GROUP BY 1),
        wo AS (SELECT doc_id, n,
            cast(coalesce(sum(n) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              as bigint) AS off
          FROM wct),
        bo AS (SELECT doc_id, n,
            cast(coalesce(sum(n) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              as bigint) AS off
          FROM bct),
        wbill AS (SELECT 'words' AS unit,
            cast(count(*) as bigint) AS n_docs,
            cast(sum(n) as bigint) AS n_units,
            cast(max((off + n - 1) // 512) + 1 as bigint) AS n_seqs,
            cast(count(*) FILTER (WHERE off // 512 <>
              (off + n - 1) // 512) as bigint) AS docs_spanning
          FROM wo WHERE n > 0),
        bbill AS (SELECT 'bpe' AS unit,
            cast(count(*) as bigint) AS n_docs,
            cast(sum(n) as bigint) AS n_units,
            cast(max((off + n - 1) // 512) + 1 as bigint) AS n_seqs,
            cast(count(*) FILTER (WHERE off // 512 <>
              (off + n - 1) // 512) as bigint) AS docs_spanning
          FROM bo WHERE n > 0),
        pdw AS MATERIALIZED (
          SELECT doc_id, regexp_replace(pt, '^ ', 'Ġ') AS word
          FROM (SELECT doc_id, unnest(regexp_extract_all(text,
              '''(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'))
              AS pt FROM documents) u),
        ycensus AS MATERIALIZED (
          SELECT word, cast(count(*) as bigint) AS cnt
          FROM pdw GROUP BY 1),
        ys0 AS (SELECT word, cnt,
            rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
          FROM ycensus),
        $ylevels,
        ylen AS MATERIALIZED (
          SELECT word, cast(len(string_split(seq, ' ')) as bigint)
            AS n_toks
          FROM ys$nMerges),
        yct AS (SELECT d.doc_id, cast(sum(w.n_toks) as bigint) AS n
          FROM pdw d JOIN ylen w ON w.word = d.word GROUP BY 1),
        yo AS (SELECT doc_id, n,
            cast(coalesce(sum(n) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              as bigint) AS off
          FROM yct),
        ybill AS (SELECT 'bpe_byte' AS unit,
            cast(count(*) as bigint) AS n_docs,
            cast(sum(n) as bigint) AS n_units,
            cast(max((off + n - 1) // 512) + 1 as bigint) AS n_seqs,
            cast(count(*) FILTER (WHERE off // 512 <>
              (off + n - 1) // 512) as bigint) AS docs_spanning
          FROM yo WHERE n > 0)
        SELECT unit, n_docs, n_units, n_seqs, docs_spanning,
          cast((1000 * (n_units - (n_seqs - 1) * 512)) // 512 as bigint)
            AS tail_fill_milli
        FROM (SELECT * FROM wbill UNION ALL SELECT * FROM bbill
              UNION ALL SELECT * FROM ybill) u
        ORDER BY unit"""
      }),


    // ------------------------------------------------------------------
    // TRAINED language identifier — char-trigram rate-profile model
    // (Cavnar–Trenkle-family), trained IN-ENGINE and evaluated on a
    // held-out split with a full confusion census. Two findings, one
    // entry:
    //   (1) The corpus's stored `lang` label is INDEPENDENT of its
    //       text: every label shares one vocabulary at one frequency
    //       profile (measured: held-out NB accuracy 37% vs 44%
    //       majority class; even train-on-all scores 47%). x34's
    //       off-diagonal census is a property of this synthetic data,
    //       not of any classifier — no trained model can dominate the
    //       diagonal on the raw text.
    //   (2) So, per the x40 synthesis discipline, the label signal is
    //       injected deterministically: after every word position p
    //       with h60('loc_'||doc_id||'_'||p)%3==0, one language-marker
    //       function word (5 per label, h60-chosen) is inserted —
    //       modeling real multilingual text, where function words
    //       carry exactly this signal. Training on EVEN doc_ids
    //       computes per-(gram,lang) integer rates-per-billion
    //       (cnt*1e9 div total — integer-exact, no ln, no doubles);
    //       held-out ODD docs score by the rate-profile dot product,
    //       argmax with deterministic tiebreak. Diagonal-dominant:
    //       249/250 at sf0.01.
    // Scale: one tokenize+explode pass; the model is a vocabulary-
    // scale (gram × 5 langs) broadcast; corpus-scale aggregations are
    // hash-partitioned; the argmax window partitions by doc_id. The
    // rate numerator goes through a 128-bit decimal(38,0)
    // intermediate before the integer div, so it cannot wrap at any
    // per-label gram count; the div still yields BIGINT.
    // ------------------------------------------------------------------
    "x49_langid_train" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val pred = langidPred(s, d, injectMarkers = true,
            scoreHoldoutOnly = true)
          .select(col("lang").as("true_lang"), col("pred_lang"))
        pred.groupBy(col("true_lang"), col("pred_lang"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("label_total", sum(col("n_docs")).over(
            Window.partitionBy(col("true_lang"))))
          .withColumn("correct", col("true_lang") === col("pred_lang"))
          .orderBy(col("true_lang"), col("pred_lang"))
      },
      Some("""WITH base AS (
          SELECT doc_id, lang,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'),
              '\s+') AS ws
          FROM documents),
        pos AS (
          SELECT doc_id, lang, ws[u.p] AS word, u.p
          FROM base, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS p) u),
        mk AS (
          SELECT doc_id, lang,
            (CASE lang
              WHEN 'en' THEN ['the','of','and','to','in']
              WHEN 'de' THEN ['der','und','nicht','ist','das']
              WHEN 'es' THEN ['el','que','los','para','una']
              WHEN 'fr' THEN ['le','les','des','une','est']
              ELSE ['de5','shi4','bu4','le5','zai4'] END)[
                1 + ('0x' || substr(md5('locw_' || doc_id || '_' || p), 1, 15))::BIGINT % 5]
              AS word
          FROM pos
          WHERE ('0x' || substr(md5('loc_' || doc_id || '_' || p), 1, 15))::BIGINT % 3 = 0),
        loc AS (
          SELECT doc_id, lang, word FROM pos
          UNION ALL
          SELECT doc_id, lang, word FROM mk),
        grams AS MATERIALIZED (
          SELECT doc_id, lang, substr('_' || word || '_', g.i, 3) AS gram
          FROM loc, LATERAL (SELECT unnest(range(1, length(word) + 1)) AS i) g),
        langs AS (SELECT DISTINCT lang FROM documents),
        cnt AS MATERIALIZED (
          SELECT gram, lang, cast(count(*) as bigint) AS c
          FROM grams WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        tot AS (SELECT lang, cast(sum(c) as bigint) AS t FROM cnt GROUP BY 1),
        vocab AS (SELECT DISTINCT gram FROM cnt),
        w AS (
          SELECT v.gram, l.lang AS cand,
            coalesce(c.c, 0) * 1000000000 // t.t AS w
          FROM vocab v CROSS JOIN langs l
          JOIN tot t ON t.lang = l.lang
          LEFT JOIN cnt c ON c.gram = v.gram AND c.lang = l.lang),
        dg AS (
          SELECT doc_id, lang, gram, cast(count(*) as bigint) AS n
          FROM grams WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3),
        sc AS (
          SELECT dg.doc_id, dg.lang, w.cand,
            cast(sum(dg.n * w.w) as bigint) AS score
          FROM dg JOIN w ON w.gram = dg.gram
          GROUP BY 1, 2, 3),
        pred AS (
          SELECT lang AS true_lang, cand AS pred_lang
          FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, cand) AS rn FROM sc)
          WHERE rn = 1),
        conf AS (
          SELECT true_lang, pred_lang, cast(count(*) as bigint) AS n_docs
          FROM pred GROUP BY 1, 2)
        SELECT true_lang, pred_lang, n_docs,
          cast(sum(n_docs) OVER (PARTITION BY true_lang) as bigint)
            AS label_total,
          true_lang = pred_lang AS correct
        FROM conf
        ORDER BY true_lang, pred_lang""")),


    // ------------------------------------------------------------------
    // URL CANONICALIZATION + per-domain census — the first stage of a
    // RefinedWeb/CCNet-class web pipeline, which starts at the URL
    // layer before any text op. URLs are synthesized deterministically
    // per doc (the x40 discipline: h60-keyed subdomain / host case /
    // scheme / :443 port / trailing slash / utm+ref tracking params /
    // fragment noise; docs in groups of 3 share a page identity), then
    // canonicalized by PARSING the raw string — lower host, strip
    // default port, strip www., normalize scheme, drop fragment, drop
    // tracking params (keeping real ones), strip trailing slash. The
    // census reports per registered domain how much the canonical key
    // collapses (dup_milli) — the number a crawl dedup plans against.
    // Scale: row-local regex parsing, one hash-partitioned groupBy on
    // domain; no joins. The raw_url/host are aliased behind their own
    // projections before multi-reference (expression-inlining rule).
    // ------------------------------------------------------------------
    "x50_url_canonicalize" -> Q(
      (s, d) =>
        urlCanon(s, d)
          .groupBy(col("domain"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("raw_url")).as("n_raw_urls"),
            countDistinct(col("canon_url")).as("n_canon_urls"),
            sum(col("n_toks")).as("n_tokens"))
          .withColumn("dup_milli",
            expr("1000 * (n_docs - n_canon_urls) div n_docs"))
          .orderBy(col("domain")),
      Some(s"""WITH $urlCanonCte
        SELECT domain, cast(count(*) as bigint) AS n_docs,
          cast(count(DISTINCT raw_url) as bigint) AS n_raw_urls,
          cast(count(DISTINCT canon_url) as bigint) AS n_canon_urls,
          cast(sum(n_toks) as bigint) AS n_tokens,
          cast(1000 * (count(*) - count(DISTINCT canon_url)) //
            count(*) as bigint) AS dup_milli
        FROM canon GROUP BY domain ORDER BY domain""")),


    // ------------------------------------------------------------------
    // DOMAIN BLOCKLIST GATE + two-level URL dedup funnel — the rest of
    // the URL-layer stage: (1) anti-join the canonical registered
    // domain against a blocklist, (2) URL-exact dedup on the canonical
    // URL (min doc_id survives), (3) host-path near-dup collapse on
    // (registered domain, path) — catching m./blog. mirror variants
    // the exact key keeps apart. Output is the stage funnel a pipeline
    // operator reads before committing crawl budget: docs, tokens and
    // distinct domains surviving each stage.
    // Scale: the blocklist is a broadcast anti-join; both dedup levels
    // are key-partitioned row_number windows (no global ordering, no
    // all-pairs anything).
    // ------------------------------------------------------------------
    "x51_url_gate_dedup" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val canon = mat(urlCanon(s, d))
        val bl = Seq("site1.com", "site5.com", "site9.com").toDF("domain")
        val gated = mat(canon.join(broadcast(bl), Seq("domain"),
          "left_anti"))
        val ud = mat(gated.withColumn("rn", row_number().over(
            Window.partitionBy(col("canon_url")).orderBy(col("doc_id"))))
          .filter(col("rn") === 1).drop("rn"))
        val hp = ud.withColumn("rn2", row_number().over(
            Window.partitionBy(col("domain"), col("path"))
              .orderBy(col("doc_id"))))
          .filter(col("rn2") === 1).drop("rn2")
        def stage(df: DataFrame, name: String) = df
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_toks")).as("n_tokens"),
            countDistinct(col("domain")).as("n_domains"))
          .select(lit(name).as("stage"), col("n_docs"),
            col("n_tokens"), col("n_domains"))
        def frs(df: DataFrame) =
          df.select(df.columns.map(c => col(c).as(c)): _*)
        frs(stage(canon, "1_raw"))
          .unionAll(frs(stage(gated, "2_domain_gate")))
          .unionAll(frs(stage(ud, "3_url_exact")))
          .unionAll(frs(stage(hp, "4_host_path")))
          .orderBy(col("stage"))
      },
      Some(s"""WITH $urlCanonCte,
        bl AS (SELECT unnest(['site1.com','site5.com','site9.com'])
          AS domain),
        gated AS (SELECT c.* FROM canon c
          WHERE domain NOT IN (SELECT domain FROM bl)),
        ud AS (SELECT * FROM (SELECT *, row_number() OVER (
            PARTITION BY canon_url ORDER BY doc_id) AS rn FROM gated)
          WHERE rn = 1),
        hp AS (SELECT * FROM (SELECT *, row_number() OVER (
            PARTITION BY domain, path ORDER BY doc_id) AS rn2 FROM ud)
          WHERE rn2 = 1),
        stages AS (
          SELECT '1_raw' AS stage, cast(count(*) as bigint) AS n_docs,
            cast(sum(n_toks) as bigint) AS n_tokens,
            cast(count(DISTINCT domain) as bigint) AS n_domains
          FROM canon
          UNION ALL SELECT '2_domain_gate', cast(count(*) as bigint),
            cast(sum(n_toks) as bigint),
            cast(count(DISTINCT domain) as bigint) FROM gated
          UNION ALL SELECT '3_url_exact', cast(count(*) as bigint),
            cast(sum(n_toks) as bigint),
            cast(count(DISTINCT domain) as bigint) FROM ud
          UNION ALL SELECT '4_host_path', cast(count(*) as bigint),
            cast(sum(n_toks) as bigint),
            cast(count(DISTINCT domain) as bigint) FROM hp)
        SELECT * FROM stages ORDER BY stage""")),


    // ------------------------------------------------------------------
    // BYTE-LEVEL BPE with regex pre-tokenization — GPT-2-class
    // tokenizer fidelity. x47/x48 train word-internal char BPE over
    // whitespace-split words; production tokenizers first pre-tokenize
    // with the GPT-2 regex (contractions | ' ?letters' | ' ?digits' |
    // ' ?punct-runs') and merge over BYTES, so the leading space
    // becomes part of the token (the Ġ marker) — which changes
    // fertility materially. This entry trains BOTH schemes on the
    // same corpus with the shared bpeTrain dataflow (50 merges each)
    // and reports them side by side: units, tokens, fertility per
    // whitespace word (common denominator), and vocabulary size.
    // The corpus is ASCII, so bytes ≡ chars and the Ġ-marked char
    // merge IS the byte-level merge; on non-ASCII data the same
    // dataflow runs over a bytes→latin1-chars transcription.
    // Scale: x47's posture — two tokenize passes (regex + whitespace),
    // training at vocabulary scale (Heaps' law), merges applied as
    // row-local replaces; final stats are 1-row frames.
    // ------------------------------------------------------------------
    "x52_bpe_byte_level" -> Q(
      (s, d) => {
        val nMerges = 50
        val re = "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"
        val ptCensus = docs(s, d)
          .select(explode(regexp_extract_all(col("text"), lit(re),
            lit(0))).as("pt"))
          .select(regexp_replace(col("pt"), "^ ", "Ġ").as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
          .localCheckpoint()
        val wCensus = docs(s, d)
          .select(explode(words(col("text"))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
          .localCheckpoint()
        val (_, bSeqs) = bpeTrain(ptCensus, nMerges)
        val (_, cSeqs) = bpeTrain(wCensus, nMerges)
        val nWords = wCensus.agg(sum(col("cnt")).as("n_words"))
          .localCheckpoint()
        def leg(seqs: DataFrame, scheme: String): DataFrame = {
          val stats = seqs.agg(sum(col("cnt")).as("n_units"),
            sum(col("cnt") * size(split(col("seq"), " ")))
              .as("n_tokens"))
          val vs = seqs.select(explode(split(col("seq"), " ")).as("tok"))
            .agg(countDistinct(col("tok")).as("vocab_size"))
          stats.crossJoin(vs).crossJoin(broadcast(nWords))
            .select(lit(scheme).as("scheme"), col("n_units"),
              col("n_tokens"), col("n_words"),
              expr("1000 * n_tokens div n_words").as("fert_milli"),
              col("vocab_size"))
        }
        def frb(df: DataFrame) =
          df.select(df.columns.map(c => col(c).as(c)): _*)
        frb(leg(bSeqs, "byte_regex"))
          .unionAll(frb(leg(cSeqs, "char_ws")))
          .orderBy(col("scheme"))
      },
      Some {
        val nMerges = 50
        def chain(p: String) = (1 to nMerges).map { k =>
          val prev = s"$p${k - 1}"
          s"""${p}p$k AS (SELECT s.cnt, s.t[u.g] AS lhs, s.t[u.g + 1] AS rhs
          FROM (SELECT cnt, string_split(seq, ' ') AS t FROM $prev) s,
            unnest(generate_series(1, len(s.t) - 1)) AS u(g)),
        ${p}b$k AS (SELECT lhs, rhs, cast(sum(cnt) as bigint) AS c
          FROM ${p}p$k GROUP BY 1, 2 ORDER BY c DESC, lhs, rhs LIMIT 1),
        $p$k AS MATERIALIZED (SELECT $prev.word, $prev.cnt,
            replace($prev.seq, ${p}b$k.lhs || ' ' || ${p}b$k.rhs,
              ${p}b$k.lhs || ${p}b$k.rhs) AS seq
          FROM $prev, ${p}b$k)"""
        }.mkString(",\n        ")
        s"""WITH bc AS MATERIALIZED (
          SELECT regexp_replace(pt, '^ ', 'Ġ') AS word,
            cast(count(*) as bigint) AS cnt
          FROM (SELECT unnest(regexp_extract_all(text,
              '''(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'))
              AS pt FROM documents) u
          GROUP BY 1),
        cc AS MATERIALIZED (
          SELECT w AS word, cast(count(*) as bigint) AS cnt FROM (
            SELECT unnest(string_split_regex(
              regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+')) AS w
            FROM documents) u
          GROUP BY 1),
        bs0 AS (SELECT word, cnt,
            rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
          FROM bc),
        cs0 AS (SELECT word, cnt,
            rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
          FROM cc),
        ${chain("bs")},
        ${chain("cs")},
        nw AS (SELECT cast(sum(cnt) as bigint) AS n_words FROM cc),
        bstat AS (SELECT cast(sum(cnt) as bigint) AS n_units,
            cast(sum(cnt * len(string_split(seq, ' '))) as bigint)
              AS n_tokens
          FROM bs$nMerges),
        cstat AS (SELECT cast(sum(cnt) as bigint) AS n_units,
            cast(sum(cnt * len(string_split(seq, ' '))) as bigint)
              AS n_tokens
          FROM cs$nMerges),
        bvoc AS (SELECT cast(count(DISTINCT tok) as bigint) AS vocab_size
          FROM (SELECT unnest(string_split(seq, ' ')) AS tok
                FROM bs$nMerges) v),
        cvoc AS (SELECT cast(count(DISTINCT tok) as bigint) AS vocab_size
          FROM (SELECT unnest(string_split(seq, ' ')) AS tok
                FROM cs$nMerges) v)
        SELECT * FROM (
          SELECT 'byte_regex' AS scheme, n_units, n_tokens, nw.n_words,
            cast(1000 * n_tokens // n_words as bigint) AS fert_milli,
            vocab_size
          FROM bstat, bvoc, nw
          UNION ALL
          SELECT 'char_ws', n_units, n_tokens, nw.n_words,
            cast(1000 * n_tokens // n_words as bigint), vocab_size
          FROM cstat, cvoc, nw) u
        ORDER BY scheme"""
      }),


    // ------------------------------------------------------------------
    // LANG-ID DRIFT CENSUS — the trained model's downstream CONSUMER
    // (x49 proved the harness; this wires it into a decision). The
    // x16 mixture plan is computed TWICE from the same per-doc frame:
    // once keyed on the STORED lang label, once on the lang PREDICTED
    // by a model trained on the raw text (x49's dataflow WITHOUT the
    // marker injection — i.e. the model an operator would actually
    // train on this corpus). Because the stored label is independent
    // of the text (the r12 finding), the raw-text model's predictions
    // collapse away from the label distribution and the two mixture
    // plans diverge — shift_milli per lang, alarm at |shift| ≥ 5% —
    // turning the label-vs-content discrepancy into an operational
    // alarm instead of a scaladoc note: a sampling plan built on the
    // stored label would mix utterly different content than one built
    // on predicted language.
    // Scale: x49's posture (one tokenize+explode pass, vocabulary-
    // scale broadcast model, doc_id-partitioned argmax window) plus
    // two 5-row plan frames joined on lang.
    // ------------------------------------------------------------------
    // ------------------------------------------------------------------
    // x54: TEMPERATURE-weighted mixture (T = 2) — the multilingual /
    // multi-source sampling law LLM training actually uses (weight
    // count^(1/T) flattens the distribution: high-resource languages
    // downsample, low-resource languages REPEAT), where x16/x20 take
    // hand-set target shares. All math is bit-portable: the only
    // transcendental is sqrt (IEEE correctly-rounded in both engines),
    // immediately frozen to an integer weight floor(sqrt(n)·2^20) —
    // shares, quotas, and epochs are then pure integer div. Admission
    // is a ROW-LOCAL h60 rate gate (h60 mod n < quota), not a per-lang
    // rank window (5 language partitions at 100 TB would be 5 giant
    // sort tasks): quota div n full epochs of every doc plus a gated
    // tail — the with-repetition sampling plan a data loader executes.
    // The gate hits its tail quota in EXPECTATION (sf0.01: en tail
    // 173 admitted vs 152 planned — binomial variance; exact-quota
    // selection would need the per-lang rank this shape deliberately
    // avoids, the x17/x20 trade). At budget = corpus size both
    // directions exercise: en (218 docs, quota 152) downsamples,
    // fr/de/es/zh repeat (1 full epoch + a gated tail). Two hash
    // aggregations, one broadcast totals row; the gate scan is one
    // pass.
    // ------------------------------------------------------------------
    // ------------------------------------------------------------------
    // x55: LM-style quality filter — the CCNet/Gopher "perplexity
    // against a reference LM" stage, re-expressed portably: a doc's
    // score is the mean CONDITIONAL BIGRAM PROBABILITY of its word
    // sequence under the corpus's own bigram model, in integer ppm
    // (p(w2|w1) = 1e6·c(w1w2) div c(w1·) — log/perplexity itself is
    // libm and not bit-portable; the ppm mean ranks docs the same
    // direction: boilerplate text scores HIGH (predictable
    // transitions), garbled or rare text scores LOW — the two tails a
    // curation run clips). One tokenize pass feeds both the model
    // counts and the scoring (the bigram explode is the x22 shape:
    // explode over a once-aliased input); model joins are
    // bigram-/word-keyed hash joins, corpus-linear. Census: docs per
    // score decile-bucket with char mass and the score extremes.
    // c(w1·) counts bigram STARTS (not raw unigrams), so Σp(·|w1) is
    // exactly 1e6 per w1 and the mean is a true probability mean.
    // ------------------------------------------------------------------
    "x55_lm_quality_filter" -> Q(
      (s, d) => {
        val toked = mat(docs(s, d)
          .select(col("doc_id"), col("n_chars"), words(col("text")).as("toks"))
          .filter(size(col("toks")) >= 2))
        val bigrams = toked
          .select(col("doc_id"), col("n_chars"),
            explode(transform(sequence(lit(1), size(col("toks")) - 1),
              i => struct(element_at(col("toks"), i).as("w1"),
                element_at(col("toks"), i + 1).as("w2")))).as("bg"))
          .select(col("doc_id"), col("n_chars"),
            col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        val big = Catalog.mat(bigrams)
        val cW1 = big.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
        val cBg = big.groupBy(col("w1"), col("w2"))
          .agg(count(lit(1)).as("c12"))
        val scored = big
          .join(cBg, Seq("w1", "w2")).join(cW1, Seq("w1"))
          .withColumn("p_ppm", expr("1000000 * c12 div c1"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            max(col("n_chars")).as("n_chars"),
            expr("sum(p_ppm) div count(1)").as("mean_ppm"))
        scored
          .groupBy(expr("mean_ppm div 2000").as("score_bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars_total"),
            min(col("mean_ppm")).as("min_ppm"),
            max(col("mean_ppm")).as("max_ppm"))
          .orderBy(col("score_bucket"))
      },
      Some("""WITH toked AS (
          SELECT doc_id, n_chars,
            string_split_regex(
              regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks
          FROM documents
          WHERE len(string_split_regex(
            regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) >= 2),
        bigrams AS (
          SELECT doc_id, n_chars,
            toks[i] AS w1, toks[i + 1] AS w2
          FROM toked, LATERAL (
            SELECT unnest(range(1, len(toks))) AS i) r),
        c1 AS (SELECT w1, cast(count(*) as bigint) AS c1
          FROM bigrams GROUP BY 1),
        c12 AS (SELECT w1, w2, cast(count(*) as bigint) AS c12
          FROM bigrams GROUP BY 1, 2),
        scored AS (
          SELECT b.doc_id,
            cast(count(*) as bigint) AS n_bigrams,
            max(b.n_chars) AS n_chars,
            cast(sum(1000000 * c.c12 // u.c1) // count(*) as bigint)
              AS mean_ppm
          FROM bigrams b
          JOIN c12 c ON b.w1 = c.w1 AND b.w2 = c.w2
          JOIN c1 u ON b.w1 = u.w1
          GROUP BY b.doc_id)
        SELECT cast(mean_ppm // 2000 as bigint) AS score_bucket,
          cast(count(*) as bigint) AS n_docs,
          cast(sum(n_chars) as bigint) AS chars_total,
          cast(min(mean_ppm) as bigint) AS min_ppm,
          cast(max(mean_ppm) as bigint) AS max_ppm
        FROM scored GROUP BY 1
        ORDER BY score_bucket""")),

    // ------------------------------------------------------------------
    // x56: LEAKAGE-FREE train/val/test split — x17 assigns by document
    // hash, which puts near-duplicate docs on OPPOSITE sides of the
    // split and silently inflates eval scores (the benchmark-leakage
    // failure x15 decontaminates against, self-inflicted). The fix:
    // split by DUP-CLUSTER representative — every member of a
    // connected near-dup component (d08's df-capped posting pairs →
    // d07's CC loop) inherits its cluster-min doc's h60 assignment, so
    // a cluster can never straddle splits. The census PROVES it (0
    // cross-split near-dup pairs per split) and keeps the alarm
    // non-vacuous by reporting the naive doc-hash split's leakage
    // beside it (>0 — the m10 all-green-proves-nothing convention).
    // Scale: pair gen is the df-capped posting pipeline (no
    // all-pairs), CC is the doc-keyed iterative loop, assignment is
    // row-local h60, the audit two hash joins.
    // ------------------------------------------------------------------
    "x56_leakage_free_split" -> Q(
      (s, d) => {
        val pairs = mat(postingJaccardPairs(s, d)
          .select(col("doc_a"), col("doc_b")))
        val comps = graft.operators.ConnectedComponents.components(pairs)
          .select(col("id").as("doc_id"), col("cluster"))
        def splitOf(c: Column): Column = {
          val h = pmod(graft.functions.PortableHash.h60col(
            concat(lit("x56_"), c)), lit(100L))
          when(h < 90, "train").when(h < 95, "val").otherwise("test")
        }
        val assigned = mat(docs(s, d)
          .select(col("doc_id"), col("n_chars"))
          .join(comps, Seq("doc_id"), "left")
          .withColumn("rep", coalesce(col("cluster"), col("doc_id")))
          .withColumn("split", splitOf(col("rep")))
          .withColumn("naive_split", splitOf(col("doc_id"))))
        val sd = assigned.select(col("doc_id"), col("split"),
          col("naive_split"))
        val audited = pairs
          .join(sd.select(col("doc_id").as("doc_a"),
            col("split").as("sa"), col("naive_split").as("na")), Seq("doc_a"))
          .join(sd.select(col("doc_id").as("doc_b"),
            col("split").as("sb"), col("naive_split").as("nb")), Seq("doc_b"))
        val leakC = audited.groupBy(col("sa").as("split"))
          .agg(count(when(col("sa") =!= col("sb"), 1)).as("leak_pairs"))
        val leakN = audited.groupBy(col("na").as("split"))
          .agg(count(when(col("na") =!= col("nb"), 1))
            .as("naive_leak_pairs"))
        assigned.groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("rep")).as("n_clusters"),
            sum(col("n_chars")).as("chars_total"))
          .join(leakC, Seq("split"), "left")
          .join(leakN, Seq("split"), "left")
          .select(col("split"), col("n_docs"), col("n_clusters"),
            col("chars_total"),
            coalesce(col("leak_pairs"), lit(0L)).as("leak_pairs"),
            coalesce(col("naive_leak_pairs"), lit(0L))
              .as("naive_leak_pairs"))
          .orderBy(col("split"))
      },
      Some("""WITH RECURSIVE t0 AS (
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
        prs AS (
          SELECT s.doc_a, s.doc_b
          FROM shared s
          JOIN sizes x ON x.doc_id = s.doc_a
          JOIN sizes y ON y.doc_id = s.doc_b
          WHERE cast(s.shared_fps as double) /
                cast(x.sz + y.sz - s.shared_fps as double) >= 0.4),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM prs
          UNION SELECT doc_b, doc_a FROM prs),
        reach AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (
          SELECT src AS doc_id, least(src, min(dst)) AS cluster
          FROM reach GROUP BY src),
        assigned AS (
          SELECT d.doc_id, d.n_chars,
            coalesce(c.cluster, d.doc_id) AS rep,
            CASE WHEN ('0x' || substr(md5('x56_' ||
                coalesce(c.cluster, d.doc_id)), 1, 15))::BIGINT
                % 100 < 90 THEN 'train'
              WHEN ('0x' || substr(md5('x56_' ||
                coalesce(c.cluster, d.doc_id)), 1, 15))::BIGINT
                % 100 < 95 THEN 'val'
              ELSE 'test' END AS split,
            CASE WHEN ('0x' || substr(md5('x56_' || d.doc_id), 1, 15))
                ::BIGINT % 100 < 90 THEN 'train'
              WHEN ('0x' || substr(md5('x56_' || d.doc_id), 1, 15))
                ::BIGINT % 100 < 95 THEN 'val'
              ELSE 'test' END AS naive_split
          FROM documents d LEFT JOIN comp c USING (doc_id)),
        audited AS (
          SELECT a.split AS sa, b.split AS sb,
            a.naive_split AS na, b.naive_split AS nb
          FROM prs
          JOIN assigned a ON a.doc_id = prs.doc_a
          JOIN assigned b ON b.doc_id = prs.doc_b),
        leakc AS (
          SELECT sa AS split,
            cast(count(*) FILTER (WHERE sa <> sb) as bigint)
              AS leak_pairs
          FROM audited GROUP BY 1),
        leakn AS (
          SELECT na AS split,
            cast(count(*) FILTER (WHERE na <> nb) as bigint)
              AS naive_leak_pairs
          FROM audited GROUP BY 1)
        SELECT g.split, g.n_docs, g.n_clusters, g.chars_total,
          coalesce(lc.leak_pairs, 0) AS leak_pairs,
          coalesce(ln.naive_leak_pairs, 0) AS naive_leak_pairs
        FROM (
          SELECT split, cast(count(*) as bigint) AS n_docs,
            cast(count(DISTINCT rep) as bigint) AS n_clusters,
            cast(sum(n_chars) as bigint) AS chars_total
          FROM assigned GROUP BY 1) g
        LEFT JOIN leakc lc USING (split)
        LEFT JOIN leakn ln USING (split)
        ORDER BY split""")),

    // ------------------------------------------------------------------
    // x57: benchmark DECONTAMINATION — the pre-training hygiene step
    // every published pipeline runs (GPT-3 appendix C / PaLM / Llama:
    // drop a training document that shares an n-gram with an eval
    // example). The eval set is a deterministic 10% doc-hash holdout
    // (h60, DuckDB-rederivable); contamination = sharing any distinct
    // 8-word-gram with ANY eval doc. Scale shape: eval grams are a
    // DISTINCT probe set bounded by eval-set bytes (2% of corpus), the
    // train side joins GRAM-KEYED against it — one tokenize pass, one
    // hash join, no all-pairs, no corpus-scale broadcast (at 100 TB
    // the probe set shards like any dimension). Non-vacuous by
    // measurement: the corpus's organic clone structure contaminates
    // 5 train docs at sf0.01 / 37 at sf0.1 under the canonical 8-gram
    // rule. Census: corpus split
    // sizes, probe-set size, the per-doc hit distribution (bucketed),
    // and the removal decision priced in docs + chars + ppm.
    // ------------------------------------------------------------------
    "x57_eval_decontamination" -> Q(
      (s, d) => {
        val base = mat(docs(s, d)
          .select(col("doc_id"),
            length(col("text")).cast("long").as("nchars"),
            graft.queries.TextOps.words(col("text")).as("toks"))
          .withColumn("is_eval",
            graft.queries.TextOps.evalHoldout(col("doc_id"))))
        val grams = base.filter(size(col("toks")) >= 8)
          .select(col("doc_id"), col("is_eval"), col("nchars"),
            explode(graft.queries.TextOps.grams8(col("toks"))).as("g"))
        val evalGrams = mat(grams.filter(col("is_eval"))
          .select(col("g")).distinct())
        val hitsC = mat(grams.filter(!col("is_eval"))
          .join(evalGrams, "g")
          .groupBy(col("doc_id"), col("nchars"))
          .agg(count(lit(1)).as("hits")))
        val trainTot = base.filter(!col("is_eval"))
          .agg(count(lit(1)).as("tn"),
            coalesce(sum(col("nchars")), lit(0L)).as("tc"))
        val aRow = trainTot
          .crossJoin(base.filter(col("is_eval"))
            .agg(count(lit(1)).as("en")))
          .select(lit("a_corpus").as("kind"), lit(0L).as("bucket"),
            col("tn").as("n_docs"), col("en").as("n2"),
            col("tc").as("chars"), lit(0L).as("ppm"))
        val bRow = evalGrams.agg(count(lit(1)).as("ng"))
          .select(lit("b_eval_grams").as("kind"), lit(0L).as("bucket"),
            col("ng").as("n_docs"), lit(0L).as("n2"),
            lit(0L).as("chars"), lit(0L).as("ppm"))
        val cRows = hitsC
          .groupBy(expr("cast(least(hits div 10, 10) as bigint)")
            .as("bucket"))
          .agg(count(lit(1)).as("n_docs"), sum(col("hits")).as("n2"),
            sum(col("nchars")).as("chars"))
          .select(lit("c_hits").as("kind"), col("bucket"),
            col("n_docs"), col("n2"), col("chars"), lit(0L).as("ppm"))
        val dRow = hitsC
          .agg(count(lit(1)).as("cd"),
            coalesce(sum(col("hits")), lit(0L)).as("th"),
            coalesce(sum(col("nchars")), lit(0L)).as("cc"))
          .crossJoin(trainTot)
          .select(lit("d_decision").as("kind"), lit(0L).as("bucket"),
            col("cd").as("n_docs"), col("th").as("n2"),
            col("cc").as("chars"),
            expr("1000000 * cd div greatest(tn, 1)").as("ppm"))
        aRow.unionByName(bRow).unionByName(cRows).unionByName(dRow)
          .orderBy(col("kind"), col("bucket"))
      },
      Some("""WITH t0 AS (
          SELECT doc_id, cast(length(text) as bigint) AS nchars,
            string_split_regex(
              regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w,
            ('0x' || substr(md5('x57_' || doc_id), 1, 15))::BIGINT
              % 100 >= 90 AS is_eval
          FROM documents),
        g8 AS (
          SELECT doc_id, is_eval, nchars,
            unnest(list_distinct(list_transform(range(1, len(w) - 6),
              i -> array_to_string(w[i:i+7], ' ')))) AS g
          FROM t0 WHERE len(w) >= 8),
        eg AS (SELECT DISTINCT g FROM g8 WHERE is_eval),
        hc AS (
          SELECT doc_id, any_value(nchars) AS nchars,
            cast(count(*) as bigint) AS hits
          FROM g8 JOIN eg USING (g) WHERE NOT is_eval
          GROUP BY doc_id),
        tt AS (
          SELECT cast(count(*) as bigint) AS tn,
            cast(coalesce(sum(nchars), 0) as bigint) AS tc
          FROM t0 WHERE NOT is_eval),
        et AS (SELECT cast(count(*) as bigint) AS en
          FROM t0 WHERE is_eval),
        ngc AS (SELECT cast(count(*) as bigint) AS ng FROM eg)
        SELECT kind, bucket, n_docs, n2, chars, ppm FROM (
          SELECT 'a_corpus' AS kind, cast(0 as bigint) AS bucket,
            tn AS n_docs, en AS n2, tc AS chars, cast(0 as bigint) AS ppm
          FROM tt, et
          UNION ALL
          SELECT 'b_eval_grams', 0, ng, 0, 0, 0 FROM ngc
          UNION ALL
          SELECT 'c_hits', cast(least(hits // 10, 10) as bigint),
            cast(count(*) as bigint), cast(sum(hits) as bigint),
            cast(sum(nchars) as bigint), 0
          FROM hc GROUP BY 2
          UNION ALL
          SELECT 'd_decision', 0, cast(count(*) as bigint),
            cast(coalesce(sum(hits), 0) as bigint),
            cast(coalesce(sum(nchars), 0) as bigint),
            1000000 * cast(count(*) as bigint)
              // greatest((SELECT tn FROM tt), 1)
          FROM hc)
        ORDER BY kind, bucket""")),

    "x54_temperature_mixture" -> Q(
      (s, d) => {
        val counts = docs(s, d).groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("w", floor(sqrt(col("n_docs").cast("double")) *
            lit(1048576.0)).cast("long"))
        val tot = counts.agg(sum(col("n_docs")).as("n_total"),
          sum(col("w")).as("w_total"))
        val plan = counts.crossJoin(broadcast(tot))
          .withColumn("prop_share_ppm",
            expr("1000000 * n_docs div n_total"))
          .withColumn("temp_share_ppm", expr("1000000 * w div w_total"))
          .withColumn("quota", expr("n_total * w div w_total"))
          .withColumn("full_epochs", expr("quota div n_docs"))
          .withColumn("tail_quota", expr("quota % n_docs"))
        val gated = docs(s, d).select(col("lang"), col("doc_id"))
          .join(broadcast(plan.select(col("lang"), col("n_docs"),
            col("tail_quota"))), "lang")
          .filter(pmod(graft.functions.PortableHash.h60col(
            concat(lit("x54_"), col("doc_id"))), col("n_docs"))
            < col("tail_quota"))
          .groupBy(col("lang")).agg(count(lit(1)).as("tail_admitted"))
        plan.join(gated, Seq("lang"), "left")
          .select(col("lang"), col("n_docs"), col("prop_share_ppm"),
            col("temp_share_ppm"), col("quota"), col("full_epochs"),
            coalesce(col("tail_admitted"), lit(0L)).as("tail_admitted"))
          .withColumn("total_admitted",
            expr("n_docs * full_epochs") + col("tail_admitted"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH counts AS (
          SELECT lang, cast(count(*) as bigint) AS n_docs,
            cast(floor(sqrt(cast(count(*) as double)) * 1048576.0)
              as bigint) AS w
          FROM documents GROUP BY lang),
        tot AS (
          SELECT cast(sum(n_docs) as bigint) AS n_total,
            cast(sum(w) as bigint) AS w_total
          FROM counts),
        plan AS (
          SELECT lang, n_docs,
            1000000 * n_docs // n_total AS prop_share_ppm,
            1000000 * w // w_total AS temp_share_ppm,
            n_total * w // w_total AS quota,
            (n_total * w // w_total) // n_docs AS full_epochs,
            (n_total * w // w_total) % n_docs AS tail_quota
          FROM counts, tot),
        gated AS (
          SELECT d.lang, cast(count(*) as bigint) AS tail_admitted
          FROM documents d JOIN plan p USING (lang)
          WHERE ${graft.functions.PortableHash.h60Sql("'x54_' || doc_id")}
            % p.n_docs < p.tail_quota
          GROUP BY d.lang)
        SELECT p.lang, p.n_docs, p.prop_share_ppm, p.temp_share_ppm,
          p.quota, p.full_epochs,
          coalesce(g.tail_admitted, 0) AS tail_admitted,
          p.n_docs * p.full_epochs + coalesce(g.tail_admitted, 0)
            AS total_admitted
        FROM plan p LEFT JOIN gated g USING (lang)
        ORDER BY p.lang""")),

    "x53_langid_drift_census" -> Q(
      (s, d) => {
        import s.implicits._
        val preds = mat(langidPred(s, d, injectMarkers = false,
          scoreHoldoutOnly = false)) // two census consumers below
        val targets = Seq(("en", 0.5), ("zh", 0.2), ("de", 0.1),
          ("fr", 0.1), ("es", 0.1)).toDF("lang", "target_share")
        val total = preds.agg(count(lit(1)).as("n_total"))
        def plan(counts: DataFrame) =
          counts.join(targets, "lang")
            .crossJoin(broadcast(total))
            .withColumn("budget", col("n_total").cast("double") * 0.5)
            .withColumn("rate",
              least(lit(1.0), col("target_share") * col("budget") /
                col("n_docs").cast("double")))
            .withColumn("expected_docs",
              floor(col("rate") * col("n_docs").cast("double"))
                .cast("bigint"))
            .select(col("lang"), col("n_docs"), col("expected_docs"))
        val stored = plan(preds.groupBy(col("lang"))
            .agg(count(lit(1)).as("n_docs")))
          .select(col("lang"), col("n_docs").as("n_stored"),
            col("expected_docs").as("exp_stored"))
        val predicted = plan(preds.groupBy(col("pred_lang").as("lang"))
            .agg(count(lit(1)).as("n_docs")))
          .select(col("lang"), col("n_docs").as("n_pred"),
            col("expected_docs").as("exp_pred"))
        stored.join(predicted, Seq("lang"), "left")
          .select(col("lang"), col("n_stored"),
            coalesce(col("n_pred"), lit(0L)).as("n_pred"),
            col("exp_stored"),
            coalesce(col("exp_pred"), lit(0L)).as("exp_pred"))
          .withColumn("shift_milli",
            expr("1000 * n_pred div n_stored - 1000"))
          .withColumn("alarm", abs(col("shift_milli")) >= 50)
          .orderBy(col("lang"))
      },
      Some("""WITH base AS (
          SELECT doc_id, lang,
            string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'),
              '\s+') AS ws
          FROM documents),
        pos AS (
          SELECT doc_id, lang, ws[u.p] AS word
          FROM base, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS p) u),
        grams AS MATERIALIZED (
          SELECT doc_id, lang, substr('_' || word || '_', g.i, 3) AS gram
          FROM pos, LATERAL (SELECT unnest(range(1, length(word) + 1)) AS i) g),
        langs AS (SELECT DISTINCT lang FROM documents),
        cnt AS MATERIALIZED (
          SELECT gram, lang, cast(count(*) as bigint) AS c
          FROM grams WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        tot AS (SELECT lang, cast(sum(c) as bigint) AS t FROM cnt GROUP BY 1),
        vocab AS (SELECT DISTINCT gram FROM cnt),
        w AS (
          SELECT v.gram, l.lang AS cand,
            coalesce(c.c, 0) * 1000000000 // t.t AS w
          FROM vocab v CROSS JOIN langs l
          JOIN tot t ON t.lang = l.lang
          LEFT JOIN cnt c ON c.gram = v.gram AND c.lang = l.lang),
        dg AS (
          SELECT doc_id, lang, gram, cast(count(*) as bigint) AS n
          FROM grams GROUP BY 1, 2, 3),
        sc AS (
          SELECT dg.doc_id, dg.lang, w.cand,
            cast(sum(dg.n * w.w) as bigint) AS score
          FROM dg JOIN w ON w.gram = dg.gram
          GROUP BY 1, 2, 3),
        pred AS (
          SELECT doc_id, lang, cand AS pred_lang
          FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, cand) AS rn FROM sc)
          WHERE rn = 1),
        targets(lang, target_share) AS (VALUES
          ('en', 0.5), ('zh', 0.2), ('de', 0.1), ('fr', 0.1), ('es', 0.1)),
        total AS (SELECT cast(count(*) as bigint) AS n_total FROM pred),
        cs AS (SELECT lang, cast(count(*) as bigint) AS n_docs
          FROM pred GROUP BY 1),
        cp AS (SELECT pred_lang AS lang, cast(count(*) as bigint) AS n_docs
          FROM pred GROUP BY 1),
        ps AS (
          SELECT c.lang, c.n_docs,
            cast(floor(least(1.0, cast(t.target_share as double) *
              (cast(n_total as double) * 0.5) / cast(c.n_docs as double)) *
              cast(c.n_docs as double)) as bigint) AS expected_docs
          FROM cs c JOIN targets t USING (lang), total),
        pp AS (
          SELECT c.lang, c.n_docs,
            cast(floor(least(1.0, cast(t.target_share as double) *
              (cast(n_total as double) * 0.5) / cast(c.n_docs as double)) *
              cast(c.n_docs as double)) as bigint) AS expected_docs
          FROM cp c JOIN targets t USING (lang), total)
        SELECT s.lang, s.n_docs AS n_stored,
          coalesce(p.n_docs, 0) AS n_pred,
          s.expected_docs AS exp_stored,
          coalesce(p.expected_docs, 0) AS exp_pred,
          1000 * coalesce(p.n_docs, 0) // s.n_docs - 1000 AS shift_milli,
          abs(1000 * coalesce(p.n_docs, 0) // s.n_docs - 1000) >= 50
            AS alarm
        FROM ps s LEFT JOIN pp p USING (lang)
        ORDER BY s.lang"""))
  )

  // --- trigram language-id dataflow (x49/x53 shared) --------------------

  /** Per-doc language prediction from the char-trigram rate-profile
    * model (x49's dataflow, factored for reuse): train per-(gram,lang)
    * integer rates-per-billion on EVEN doc_ids, score by rate-profile
    * dot product, argmax with deterministic tiebreak. Returns
    * (doc_id, lang, pred_lang).
    *
    * `injectMarkers` — add the h60-keyed language-marker function
    * words (x49's localized corpus, where the label signal is real);
    * false trains/scores on the RAW text, whose stored `lang` label is
    * content-independent (the r12 finding) — that model is what an
    * operator would actually train, and its predictions drifting from
    * the stored label is the x53 alarm.
    * `scoreHoldoutOnly` — score only ODD doc_ids (x49's held-out
    * eval) vs the whole corpus (x53's labeling pass).
    */
  private def langidPred(s: SparkSession, d: String,
      injectMarkers: Boolean, scoreHoldoutOnly: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def h(c: Column) = graft.functions.PortableHash.h60col(c)
    def arr(ws: String*) = array(ws.map(lit): _*)
    val base = docs(s, d).select(col("doc_id"), col("lang"),
        posexplode(words(col("text"))).as(Seq("p0", "word")))
      .select(col("doc_id"), col("lang"), col("word"),
        (col("p0") + 1).cast("long").as("p"))
    val mkArr = when(col("lang") === "en",
        arr("the", "of", "and", "to", "in"))
      .when(col("lang") === "de", arr("der", "und", "nicht", "ist", "das"))
      .when(col("lang") === "es", arr("el", "que", "los", "para", "una"))
      .when(col("lang") === "fr", arr("le", "les", "des", "une", "est"))
      .otherwise(arr("de5", "shi4", "bu4", "le5", "zai4"))
    val mk = base.filter(
        pmod(h(concat(lit("loc_"), col("doc_id").cast("string"),
          lit("_"), col("p").cast("string"))), lit(3L)) === 0L)
      .select(col("doc_id"), col("lang"),
        element_at(mkArr,
          (pmod(h(concat(lit("locw_"), col("doc_id").cast("string"),
            lit("_"), col("p").cast("string"))), lit(5L)) + 1L)
            .cast("int")).as("word"))
    // fresh aliases on both union inputs (shared-exprId workaround)
    def fr(df: DataFrame) =
      df.select(df.columns.map(c => col(c).as(c)): _*)
    val loc =
      if (injectMarkers)
        fr(base.select(col("doc_id"), col("lang"), col("word")))
          .unionAll(fr(mk))
      else base.select(col("doc_id"), col("lang"), col("word"))
    // char trigrams of the '_'-padded word; the array expression
    // feeds explode directly (never explode an aliased expensive
    // array). Two consumers (train/test) → materialize once.
    val grams = mat(loc.select(col("doc_id"), col("lang"),
      explode(transform(sequence(lit(1), length(col("word"))), i =>
        concat(lit("_"), col("word"), lit("_")).substr(i, lit(3))))
        .as("gram")))
    val cnt = grams.filter(pmod(col("doc_id"), lit(2L)) === 0L)
      .groupBy(col("gram"), col("lang")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // vocabulary-scale; 3 consumers below
    val tot = cnt.groupBy(col("lang")).agg(sum(col("c")).as("t"))
    val vocab = cnt.select(col("gram")).distinct()
    val langs = docs(s, d).select(col("lang")).distinct()
    val w = vocab.crossJoin(broadcast(langs))
      .join(broadcast(tot), Seq("lang"))
      .join(cnt, Seq("gram", "lang"), "left")
      .select(col("gram"), col("lang").as("cand"),
        // 128-bit decimal intermediate: cnt*1e9 would wrap a long
        // past ~9.2e9 grams per label; decimal(38,0) never does,
        // and IntegralDivide still returns BIGINT — same values,
        // same schema at every scale
        expr("cast(coalesce(c, cast(0 as bigint)) as decimal(38,0))" +
          " * 1000000000 div t")
          .as("w"))
    val dg = (if (scoreHoldoutOnly)
        grams.filter(pmod(col("doc_id"), lit(2L)) === 1L)
      else grams)
      .groupBy(col("doc_id"), col("lang"), col("gram"))
      .agg(count(lit(1)).as("n"))
    val sc = dg.join(broadcast(w), Seq("gram"))
      .groupBy(col("doc_id"), col("lang"), col("cand"))
      .agg(sum(col("n") * col("w")).as("score"))
    sc.withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("cand"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("cand").as("pred_lang"))
  }

  // --- URL-layer synthesis + canonicalization (x50/x51 shared) ----------

  /** Deterministic raw URL per doc + its parsed canonical form.
    *
    * Synthesis (h60-keyed, DuckDB-rederivable): docs in groups of
    * `doc_id div 3` share a page identity (domain + path); each doc's
    * raw URL then varies by subdomain ('' / www. / m. / blog.), host
    * case, scheme (http 1-in-7), an explicit :443 on https, a trailing
    * slash, up to two tracking params (utm_source, ref), one REAL
    * param (id, kept by canonicalization), and a #top fragment.
    *
    * Canonicalization parses the raw string (regex, row-local):
    * host → lower, strip :443, strip leading www.; path → strip
    * trailing slash; query → drop utm_* and ref params, keep the
    * rest in order; scheme normalized to https; fragment dropped.
    * Output: doc_id, lang, source, n_toks, raw_url, canon_url,
    * domain (registered: last two host labels), path.
    */
  private def urlCanon(s: SparkSession, d: String): DataFrame =
    canonicalizeUrls(urlRaw(s, d))

  /** The synthesis half of [[urlCanon]]: deterministic raw URL per doc
    * (doc_id, lang, source, n_toks, raw_url). Public so the streaming
    * admission twin (`streaming/UrlAdmitStream`) can stage raw rows
    * and canonicalize per micro-batch.
    */
  private[graft] def urlRaw(s: SparkSession, d: String): DataFrame = {
    def h(c: Column) = graft.functions.PortableHash.h60col(c)
    def tag(t: String, k: Column) =
      h(concat(lit(t), k.cast("string")))
    val u0 = docs(s, d).select(col("doc_id"), col("lang"), col("source"),
      size(words(col("text"))).cast("long").as("n_toks"),
      expr("doc_id div 3").as("g"))
    val u1 = u0.select(col("doc_id"), col("lang"), col("source"),
      col("n_toks"), col("g"),
      pmod(tag("udom_", col("g")), lit(12L)).as("dom_idx"),
      element_at(array(lit(""), lit("www."), lit("m."), lit("blog.")),
        (pmod(tag("usub_", col("doc_id")), lit(4L)) + 1).cast("int"))
        .as("sub"),
      (pmod(tag("ucase_", col("doc_id")), lit(5L)) === 0).as("upcase"),
      when(pmod(tag("usch_", col("doc_id")), lit(7L)) === 0, "http")
        .otherwise("https").as("scheme"),
      (pmod(tag("uport_", col("doc_id")), lit(6L)) === 0).as("withport"),
      (pmod(tag("usl_", col("doc_id")), lit(3L)) === 0).as("slash"),
      (pmod(tag("ufr_", col("doc_id")), lit(5L)) === 0).as("frag"),
      (pmod(tag("uq1_", col("doc_id")), lit(2L)) === 0).as("q1"),
      (pmod(tag("uq2_", col("doc_id")), lit(3L)) === 0).as("q2"),
      (pmod(tag("uq3_", col("doc_id")), lit(4L)) === 0).as("q3"),
      pmod(tag("uqv_", col("doc_id")), lit(4L)).as("qv1"),
      pmod(tag("uqw_", col("doc_id")), lit(3L)).as("qv2"))
    val host0 = concat(col("sub"), lit("site"),
      col("dom_idx").cast("string"), lit(".com"))
    val qp = filter(array(
      when(col("q1"), concat(lit("utm_source=s"), col("qv1").cast("string"))),
      when(col("q2"), concat(lit("ref=r"), col("qv2").cast("string"))),
      when(col("q3"), concat(lit("id="), col("g").cast("string")))),
      x => x.isNotNull)
    val u2 = u1.select(col("doc_id"), col("lang"), col("source"),
      col("n_toks"),
      concat(col("scheme"), lit("://"),
        when(col("upcase"), upper(host0)).otherwise(host0),
        when(col("scheme") === "https" && col("withport"), ":443")
          .otherwise(""),
        lit("/a/p"), col("g").cast("string"),
        when(col("slash"), "/").otherwise(""),
        when(size(qp) > 0, concat(lit("?"), array_join(qp, "&")))
          .otherwise(lit("")),
        when(col("frag"), "#top").otherwise("")).as("raw_url"))
    u2
  }

  /** The parsing half of [[urlCanon]]: canonicalize any frame holding
    * a `raw_url` column (other columns pass through) — host → lower /
    * strip :443 / strip www., path → strip trailing slash, query →
    * drop utm_*+ref keep the rest, scheme → https, fragment dropped.
    * Row-local (regex only, no shuffles), so it runs unchanged over a
    * micro-batch; each regex layer is aliased behind its own
    * projection before multi-reference (expression-inlining rule).
    * Adds canon_url, domain (registered: last two labels), path.
    */
  private[graft] def canonicalizeUrls(raw: DataFrame): DataFrame = {
    val pass = raw.columns.filterNot(_ == "raw_url").map(col).toSeq
    val u3 = raw.select(pass ++ Seq(col("raw_url"),
      regexp_replace(regexp_replace(
        lower(regexp_extract(col("raw_url"), "^[a-z]+://([^/?#]+)", 1)),
        ":443$", ""), "^www\\.", "").as("host_c"),
      regexp_extract(col("raw_url"), "^[a-z]+://[^/?#]+([^?#]*)", 1)
        .as("p0"),
      filter(split(regexp_extract(col("raw_url"), "\\?([^#]*)", 1), "&"),
        x => x =!= "" && !x.rlike("^(utm_[a-z]+|ref)=")).as("keep")): _*)
    val u4 = u3.select(pass ++ Seq(col("raw_url"), col("host_c"),
      col("keep"),
      when(col("p0") =!= "/", regexp_replace(col("p0"), "/$", ""))
        .otherwise(col("p0")).as("path")): _*)
    u4.select(pass ++ Seq(col("raw_url"),
      concat(lit("https://"), col("host_c"), col("path"),
        when(size(col("keep")) > 0,
          concat(lit("?"), array_join(col("keep"), "&")))
          .otherwise(lit(""))).as("canon_url"),
      regexp_extract(col("host_c"), "([^.]+\\.[^.]+)$", 1).as("domain"),
      col("path")): _*)
  }

  /** URL-layer admission — the pipeline (p01/p02) form of the x51
    * funnel's first two cuts: blocklist-gate the registered domain,
    * then admit ONE doc per canonical URL (min doc_id). The host-path
    * mirror collapse (x51 stage 4) is a policy knob deliberately left
    * out of default admission — m./blog. variants are distinct pages
    * unless an operator opts into mirror folding.
    */
  private def urlAdmitted(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val bl = Seq("site1.com", "site5.com", "site9.com").toDF("domain")
    urlCanon(s, d).join(broadcast(bl), Seq("domain"), "left_anti")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("canon_url")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"))
  }

  /** DuckDB twin of [[urlAdmitted]] — CTEs ending in `admitted`. */
  private def urlAdmittedCte: String =
    urlCanonCte + """,
        bl AS (SELECT unnest(['site1.com','site5.com','site9.com'])
          AS domain),
        gated AS (SELECT c.* FROM canon c
          WHERE domain NOT IN (SELECT domain FROM bl)),
        admitted AS (SELECT doc_id FROM (
            SELECT doc_id, row_number() OVER (
              PARTITION BY canon_url ORDER BY doc_id) AS rn FROM gated)
          WHERE rn = 1)"""

  /** DuckDB twin of [[urlCanon]] — CTEs ending in `canon`. */
  private def urlCanonCte: String = {
    def H(x: String) = graft.functions.PortableHash.h60Sql(x)
    s"""u0 AS (
          SELECT doc_id, lang, source,
            cast(len(string_split_regex(
              regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+'))
              as bigint) AS n_toks,
            doc_id // 3 AS g
          FROM documents),
        u1 AS (
          SELECT *, ${H("'udom_' || g")} % 12 AS dom_idx,
            ['','www.','m.','blog.'][
              1 + ${H("'usub_' || doc_id")} % 4] AS sub,
            ${H("'ucase_' || doc_id")} % 5 = 0 AS upcase,
            CASE WHEN ${H("'usch_' || doc_id")} % 7 = 0
              THEN 'http' ELSE 'https' END AS scheme,
            ${H("'uport_' || doc_id")} % 6 = 0 AS withport,
            ${H("'usl_' || doc_id")} % 3 = 0 AS slash,
            ${H("'ufr_' || doc_id")} % 5 = 0 AS frag,
            ${H("'uq1_' || doc_id")} % 2 = 0 AS q1,
            ${H("'uq2_' || doc_id")} % 3 = 0 AS q2,
            ${H("'uq3_' || doc_id")} % 4 = 0 AS q3,
            ${H("'uqv_' || doc_id")} % 4 AS qv1,
            ${H("'uqw_' || doc_id")} % 3 AS qv2
          FROM u0),
        u2 AS (
          SELECT doc_id, lang, source, n_toks, g,
            scheme || '://' ||
            (CASE WHEN upcase THEN upper(sub || 'site' || dom_idx || '.com')
                  ELSE sub || 'site' || dom_idx || '.com' END) ||
            (CASE WHEN scheme = 'https' AND withport
              THEN ':443' ELSE '' END) ||
            '/a/p' || g || (CASE WHEN slash THEN '/' ELSE '' END) ||
            (CASE WHEN len(qp) > 0
              THEN '?' || array_to_string(qp, '&') ELSE '' END) ||
            (CASE WHEN frag THEN '#top' ELSE '' END) AS raw_url
          FROM (SELECT *, list_filter([
              CASE WHEN q1 THEN 'utm_source=s' || qv1 END,
              CASE WHEN q2 THEN 'ref=r' || qv2 END,
              CASE WHEN q3 THEN 'id=' || g END],
              x -> x IS NOT NULL) AS qp
            FROM u1) z),
        canon AS (
          SELECT doc_id, lang, source, n_toks, raw_url,
            'https://' || host_c || path_c ||
              (CASE WHEN len(keep) > 0
                THEN '?' || array_to_string(keep, '&') ELSE '' END)
              AS canon_url,
            regexp_extract(host_c, '([^.]+\\.[^.]+)$$', 1) AS domain,
            path_c AS path
          FROM (
            SELECT *,
              regexp_replace(regexp_replace(
                lower(regexp_extract(raw_url, '^[a-z]+://([^/?#]+)', 1)),
                ':443$$', ''), '^www\\.', '') AS host_c,
              CASE WHEN p0 <> '/' THEN regexp_replace(p0, '/$$', '')
                ELSE p0 END AS path_c,
              list_filter(string_split(
                  regexp_extract(raw_url, '\\?([^#]*)', 1), '&'),
                x -> x <> '' AND
                  NOT regexp_matches(x, '^(utm_[a-z]+|ref)=')) AS keep
            FROM (SELECT *, regexp_extract(raw_url,
                '^[a-z]+://[^/?#]+([^?#]*)', 1) AS p0
              FROM u2) y) z)"""
  }
}

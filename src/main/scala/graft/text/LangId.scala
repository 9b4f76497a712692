package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Heuristic language identification: function-word hits + charset
  * ranges, highest score wins (deterministic; ties break by fixed
  * language order). Designed for pipeline filtering, not linguistic
  * accuracy — the standard n-gram-profile approach scaled down to a
  * dependency-free scorer.
  *
  * Two forms: [[detect]] (plain Scala, for driver-side use and as the
  * test reference) and [[tokens]]/[[detectFromTokens]] (built-in
  * Catalyst expressions — no typed Dataset.map, so the scan stays in
  * the columnar/codegen path with no serialize/deserialize boundary).
  */
object LangId extends Serializable {

  private val profiles: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "for",
      "was", "with", "on", "as", "are", "this"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit",
      "auf", "sich", "den", "von", "für", "im", "zu"),
    "fr" -> Set("le", "la", "les", "de", "et", "est", "un", "une", "dans",
      "que", "pour", "pas", "des", "du", "avec"),
    "es" -> Set("el", "la", "los", "las", "de", "que", "es", "en", "un",
      "una", "por", "con", "para", "no", "se"))

  /** Exactly the characters Java-regex `\s` matches (space, \t, \n,
    * vertical tab, \f, \r). Both [[detect]] and [[detectFromTokens]] count
    * whitespace with THIS class — not `Character.isWhitespace`, whose
    * extra members (U+001C-1F, U+2028/29, U+3000, …) would let the two
    * forms disagree on the CJK-ratio denominator near the 0.3 zh
    * threshold. The DuckDB oracle's `\s` (RE2) also lacks those, so
    * regex-\s is the one definition all three engines share.
    */
  @inline private def isRegexSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Detect the language of `text`. Returns a 2-letter code or "und". */
  def detect(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    // charset shortcut: CJK-dominant text → zh
    var cjk = 0
    var total = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (!isRegexSpace(c)) {
        total += 1
        val block = Character.UnicodeBlock.of(c)
        if (block == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
            block == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS_EXTENSION_A)
          cjk += 1
      }
      i += 1
    }
    if (total > 0 && cjk.toDouble / total > 0.3) return "zh"
    val tokens = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (tokens.isEmpty) return "und"
    var best = "und"
    var bestScore = 0
    profiles.foreach { case (lang, stops) =>
      val score = tokens.count(stops.contains)
      if (score > bestScore) { best = lang; bestScore = score }
    }
    best
  }

  /** Lowercased whitespace tokens of `text` as an array column. Alias
    * this behind its OWN projection before passing it to
    * [[detectFromTokens]] — it is referenced once per language profile,
    * and an inlined split would re-tokenize per reference.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= lit(""))

  /** Expression form of [[detect]]: same CJK-charset shortcut, same
    * per-profile function-word counts, same strictly-greater /
    * first-language-wins tie-break (the when-chain tests languages in
    * profile order against the running max, which is exactly the
    * sequential `score > bestScore` fold).
    */
  def detectFromTokens(text: Column, toks: Column): Column = {
    val total = length(regexp_replace(text, "\\s+", "")).cast("double")
    // CJK_UNIFIED_IDEOGRAPHS (U+4E00-U+9FFF) + EXTENSION_A
    // (U+3400-U+4DBF), the two blocks detect() tests
    val cjk = size(regexp_extract_all(text,
      lit("[\\u3400-\\u4dbf\\u4e00-\\u9fff]"), lit(0))).cast("double")
    val scores = profiles.map { case (lang, stops) =>
      lang -> size(filter(toks, t => t.isin(stops.toSeq.sorted: _*)))
    }
    val m = greatest(scores.map(_._2): _*)
    val byScore = scores.init.foldLeft(
      when(m.isNull || m <= 0, "und")) { case (acc, (lang, sc)) =>
        acc.when(sc === m, lang)
      }.otherwise(scores.last._1)
    when(total > 0 && cjk / total > 0.3, "zh").otherwise(byScore)
  }
}

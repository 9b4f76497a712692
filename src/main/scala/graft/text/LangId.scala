package graft.text

/** Heuristic language identification: function-word hits + charset
  * ranges, highest score wins (deterministic; ties break by fixed
  * language order). Designed for pipeline filtering, not linguistic
  * accuracy — the standard n-gram-profile approach scaled down to a
  * dependency-free scorer usable inside Dataset.map.
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

  /** Detect the language of `text`. Returns a 2-letter code or "und". */
  def detect(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    // charset shortcut: CJK-dominant text → zh
    var cjk = 0
    var total = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (!c.isWhitespace) {
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
}

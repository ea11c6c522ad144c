package graft.kernel

/** N-gram/function-word language identification heuristic — the
  * text-pipeline analog of the reference's template-classification argmax
  * (`/root/reference/src/controller/idcardprocesser.py:133-137`: score the
  * payload against each of a small set of broadcast "templates", pick the
  * best, gate on a minimum score).
  *
  * Deterministic spec:
  *  - tokenize on whitespace, ASCII-lowercase;
  *  - score(lang) = 2·(function-word hits) + (char-trigram hits), where the
  *    profiles below are fixed dimension data (broadcastable);
  *  - predicted = argmax; ties broken by language code ascending;
  *  - score 0 for every language → "und" (undetermined), the analog of the
  *    classify-score gate (`score < 0.3 → reject`).
  */
object LangId {

  final case class Profile(lang: String, words: Set[String], trigrams: Set[String])

  /** Small built-in profiles (public linguistic common knowledge). */
  val Profiles: Seq[Profile] = Seq(
    Profile("de",
      Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "von", "zu", "den", "im", "auf"),
      Set("sch", "ein", "ich", "der", "und", "cht")),
    Profile("en",
      Set("the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "his", "are", "this"),
      Set("th ", " th", "ing", "ion", "and", "ent")),
    Profile("es",
      Set("el", "la", "de", "que", "los", "en", "un", "una", "por", "con", "las", "del", "se", "es"),
      Set("de ", "la ", "ión", "que", "os ", "ent")),
    Profile("fr",
      Set("le", "la", "les", "des", "et", "est", "une", "dans", "que", "pour", "qui", "sur", "pas", "ce"),
      Set("le ", "es ", "ent", "que", "ais", "eur")),
    Profile("it",
      Set("il", "di", "che", "la", "per", "con", "del", "una", "non", "sono", "le", "gli", "nel", "come"),
      Set("di ", "to ", "che", "ion", "lla", "re "))
  )

  private def asciiLower(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
    sb.toString
  }

  def score(text: String, p: Profile): Int = {
    val lower = asciiLower(text)
    var s = 0
    // function-word hits (weight 2)
    var start = 0
    val n = lower.length
    var i = 0
    while (i <= n) {
      val atEnd = i == n
      if (atEnd || Character.isWhitespace(lower.charAt(i))) {
        if (i > start) {
          val w = lower.substring(start, i)
          if (p.words.contains(w)) s += 2
        }
        start = i + 1
      }
      i += 1
    }
    // char-trigram hits (weight 1)
    var j = 0
    while (j + 3 <= n) {
      if (p.trigrams.contains(lower.substring(j, j + 3))) s += 1
      j += 1
    }
    s
  }

  /** @return (lang, score) — "und" with score 0 if no profile matches. */
  def detect(text: String): (String, Int) = {
    if (text == null || text.isEmpty) return ("und", 0)
    var bestLang = "und"
    var bestScore = 0
    // Profiles are sorted by lang code; strict > keeps the first (tie → asc)
    Profiles.foreach { p =>
      val s = score(text, p)
      if (s > bestScore) { bestScore = s; bestLang = p.lang }
    }
    (bestLang, bestScore)
  }
}

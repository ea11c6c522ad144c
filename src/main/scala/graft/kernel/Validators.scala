package graft.kernel

/** Field cleaners / validators — direct semantic ports of the reference's
  * corrector surface (SURVEY §2.7), kept as pure functions so they can run
  * both inside mapPartitions kernels and (registered) as UDFs.
  */
object Validators {

  /** Exact char-substitution table of the reference `_clean`
    * (`/root/reference/src/controller/idcardprocesser.py:51-59` plus the
    * variant at `src/cmnd/cmnd_info.py:251-254`), extended with nbsp.
    * Applied BEFORE whitespace collapsing.
    */
  final val CharSubs: Map[Char, Char] = Map(
    '—' -> '-', // — em dash
    '–' -> '-', // – en dash
    '²' -> '2', // ²
    '×' -> '.', // ×
    '¥' -> 'Y', // ¥
    'ï' -> 'i', // ï
    'º' -> 'o', // º
    '»' -> '-', // »
    ' ' -> ' '  // nbsp
  )

  /** `_clean` analog: substitute chars per table, turn commas/semicolons into
    * spaces, collapse whitespace runs to one space, trim.
    * (Reference also whitelists per-field charsets; that is [[charsetFilter]].)
    */
  def clean(raw: String): String = {
    val sb = new java.lang.StringBuilder(raw.length)
    var pendingSpace = false
    var i = 0
    while (i < raw.length) {
      val c0 = raw.charAt(i)
      val c = CharSubs.getOrElse(c0, c0)
      if (Character.isWhitespace(c) || c == ',' || c == ';') {
        if (sb.length() > 0) pendingSpace = true
      } else {
        if (pendingSpace) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Charset projection (reference keep-symbols filter,
    * `idcardprocesser.py:51-59`): keep only chars in `keep`. */
  def charsetFilter(s: String, keep: Set[Char]): String =
    s.filter(keep.contains)

  /** `correctID` (`idcardprocesser.py:61-66`): strip non-digits; valid iff
    * 9 or 12 digits remain. @return Some(digits) or None. */
  def correctId(raw: String): Option[String] = {
    val digits = raw.filter(c => c >= '0' && c <= '9')
    if (digits.length == 9 || digits.length == 12) Some(digits) else None
  }

  /** `correctDOB` (`idcardprocesser.py:21-23,68-78`): full date
    * `d[-/. ]m[-/. ]y` (day 1-31, month 1-12, year 1950-2009) → "d-m-y";
    * else a bare year 19xx/200x → "y"; else None. */
  private val DateRe =
    """(?s).*?\b([012]?\d|3[01])[-/. ]?(0?\d|1[012])[-/. ]?((?:19[5-9]|200)\d)\b.*""".r
  private val YearRe = """(?s).*?\b((?:19[5-9]|200)\d)\b.*""".r

  def correctDob(raw: String): Option[String] = raw match {
    case DateRe(d, m, y) => Some(s"$d-$m-$y")
    case YearRe(y)       => Some(y)
    case _               => None
  }

  /** Levenshtein distance (reference uses the `editdistance` lib,
    * `idcardprocesser.py:44,163`); pure impl for kernel-side use. */
  def levenshtein(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }

  /** `correctName` (reference `idcardprocesser.py:83-99` + `_correctWord`
    * `:26-49`): word-wise dictionary correction against a broadcast wordlist:
    *  1. exact dictionary hit → keep;
    *  2. OCR-confusion retry: 't'→'i' substitution, accept on dictionary hit
    *     (the reference's T→I retry);
    *  3. nearest dictionary suggestion accepted iff
    *     levenshtein/len < 0.34 (the reference's editdist-ratio gate);
    *  4. otherwise the word stays as-is and is "meaningless".
    * Score = longest run of meaningful words / word count (the reference's
    * quality score for the name field).
    * @return (score, corrected text) */
  def correctName(raw: String, dict: Set[String]): (Double, String) = {
    val words = clean(raw).split(' ').filter(_.nonEmpty)
    if (words.isEmpty) return (0.0, "")
    val corrected = words.map { w =>
      val lw = w.toLowerCase
      if (dict.contains(lw)) (true, lw)
      else {
        val ti = lw.replace('t', 'i')
        if (dict.contains(ti)) (true, ti)
        else {
          // nearest suggestion with deterministic tie-break (distance, word);
          // materialized once (an Iterator must not be used after isEmpty)
          val cands = dict.iterator
            .map(d => (levenshtein(lw, d), d))
            .filter { case (dist, _) => dist.toDouble / math.max(1, lw.length) < 0.34 }
            .toVector
          cands.minOption match {
            case Some((_, best)) => (true, best)
            case None            => (false, lw)
          }
        }
      }
    }
    var bestRun = 0
    var run = 0
    corrected.foreach { case (ok, _) =>
      if (ok) { run += 1; bestRun = math.max(bestRun, run) } else run = 0
    }
    (bestRun.toDouble / words.length, corrected.map(_._2).mkString(" "))
  }

  /** Accent decomposition dimension (reference diacritics CSV,
    * `/root/reference/src/algorithm/looptess.py:21-37`,
    * `temp/diacritics2.csv` rows like `1,à,a,0,2`): char → base char.
    * Small built-in table (Vietnamese/Latin vowels subset) — in the engine
    * this is a broadcast map, the moral equivalent of a tiny dimension-table
    * broadcast join. */
  final val AccentBase: Map[Char, Char] = {
    val groups = Seq(
      'a' -> "àáảãạăằắẳẵặâầấẩẫậ", 'e' -> "èéẻẽẹêềếểễệ",
      'i' -> "ìíỉĩị", 'o' -> "òóỏõọôồốổỗộơờớởỡợ",
      'u' -> "ùúủũụưừứửữự", 'y' -> "ỳýỷỹỵ", 'd' -> "đ"
    )
    val m = Map.newBuilder[Char, Char]
    for ((base, accented) <- groups; c <- accented) {
      m += c -> base
      m += Character.toUpperCase(c) -> Character.toUpperCase(base)
    }
    m.result()
  }

  def stripAccents(s: String): String = s.map(c => AccentBase.getOrElse(c, c))
}

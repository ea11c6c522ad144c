package graft.kernel

/** Streaming, allocation-light HTML tokenizer (single forward pass, char FSM).
  *
  * Plays the role of the reference's signal/background separation kernel
  * (Sauvola adaptive threshold, `/root/reference/src/utils/common.py:177-191`):
  * it splits the raw payload into tag-tokens ("background") and text-tokens
  * ("ink"), which the [[BlockBuilder]] then assembles into blocks.
  *
  * Spec (locked; goldens depend on it):
  *  - `<` followed by an ASCII letter, or by `/` + letter, starts a tag; the
  *    tag runs to the first `>` that is NOT inside a single- or double-quoted
  *    attribute value (so `<a title="a>b">` parses correctly).
  *  - A tag whose last non-whitespace char before `>` is `/` is self-closing.
  *  - Tag names are ASCII-lowercased; `</...>` emits a close event.
  *  - `<!--` starts a comment, dropped through the first `-->` (unterminated
  *    comment drops the rest of the input).
  *  - `<!` (doctype) and `<?` (PI) are dropped through the next `>`.
  *  - `<script>` and `<style>` contents are raw text: dropped entirely until
  *    the case-insensitive matching `</script` / `</style` (reference analog:
  *    decoration/noise removal, `src/utils/removedot.py:34-56`).
  *  - Any other `<` is a literal text character.
  *  - Character entities in text are decoded: `&amp; &lt; &gt; &quot; &apos;`
  *    → `& < > " '`, `&nbsp;` → regular space, `&#NN;` and `&#xHH;` →
  *    code point (astral-plane code points ≤ 0x10FFFF are emitted as a
  *    surrogate pair — two onText events carrying the whole entity's source
  *    offsets). An `&` not followed by a well-formed entity (terminator `;`
  *    within 12 chars) is a literal `&`. Entities inside tags are NOT decoded.
  *
  *  Text is delivered per decoded char with [srcStart, srcEnd) offsets into
  *  the ORIGINAL payload (an entity's decoded char carries the offsets of the
  *  whole entity), which is how block spans keep exact source offsets.
  */
object HtmlTokenizer {

  trait Sink {
    def onText(c: Char, srcStart: Int, srcEnd: Int): Unit
    def onTagOpen(name: String, selfClosing: Boolean, pos: Int): Unit
    def onTagClose(name: String, pos: Int): Unit
  }

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def toLower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Case-insensitive check that s starts with the ASCII-lowercase `prefix`
    * at `from`. */
  private def startsWithIC(s: String, from: Int, prefix: String): Boolean = {
    if (from + prefix.length > s.length) return false
    var i = 0
    while (i < prefix.length) {
      if (toLower(s.charAt(from + i)) != prefix.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Decode the entity starting at `amp` (s(amp) == '&').
    * @return decoded code point in the low 32 bits and the END offset
    *         (exclusive) in the upper bits, or -1 if not a well-formed entity.
    */
  private def decodeEntity(s: String, amp: Int): Long = {
    val n = s.length
    var semi = -1
    var i = amp + 1
    val limit = math.min(n, amp + 12)
    while (i < limit && semi < 0) {
      if (s.charAt(i) == ';') semi = i
      i += 1
    }
    if (semi < 0 || semi == amp + 1) return -1L
    val body = s.substring(amp + 1, semi)
    val decoded: Int = body match {
      case "amp"  => '&'
      case "lt"   => '<'
      case "gt"   => '>'
      case "quot" => '"'
      case "apos" => '\''
      case "nbsp" => ' '
      case _ =>
        if (body.length > 1 && body.charAt(0) == '#') {
          try {
            val cp =
              if (body.charAt(1) == 'x' || body.charAt(1) == 'X')
                Integer.parseInt(body.substring(2), 16)
              else Integer.parseInt(body.substring(1))
            if (cp >= 0 && cp <= 0x10FFFF) cp else -1
          } catch { case _: NumberFormatException => -1 }
        } else -1
    }
    if (decoded < 0) -1L
    else (semi + 1).toLong << 32 | decoded.toLong
  }

  def tokenize(s: String, sink: Sink): Unit = {
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        if (isAsciiLetter(c1) || (c1 == '/' && i + 2 < n && isAsciiLetter(s.charAt(i + 2)))) {
          i = parseTag(s, i, sink)
        } else if (startsWithIC(s, i, "<!--")) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (c1 == '!' || c1 == '?') {
          val end = s.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else {
          sink.onText('<', i, i + 1); i += 1
        }
      } else if (c == '&') {
        val e = decodeEntity(s, i)
        if (e >= 0) {
          val end = (e >>> 32).toInt
          val cp = (e & 0xFFFFFFFFL).toInt
          if (cp <= 0xFFFF) sink.onText(cp.toChar, i, end)
          else Character.toChars(cp).foreach(sink.onText(_, i, end))
          i = end
        } else { sink.onText('&', i, i + 1); i += 1 }
      } else {
        sink.onText(c, i, i + 1); i += 1
      }
    }
  }

  /** Parse the tag at `lt` (s(lt)=='<'); emits the event; returns the index
    * just past the tag (or past the raw-text island for script/style). */
  private def parseTag(s: String, lt: Int, sink: Sink): Int = {
    val n = s.length
    var i = lt + 1
    val closing = s.charAt(i) == '/'
    if (closing) i += 1
    val nameStart = i
    while (i < n && (isAsciiLetter(s.charAt(i)) || (s.charAt(i) >= '0' && s.charAt(i) <= '9'))) i += 1
    val name = {
      val sb = new java.lang.StringBuilder(i - nameStart)
      var k = nameStart
      while (k < i) { sb.append(toLower(s.charAt(k))); k += 1 }
      sb.toString
    }
    // Scan to the closing '>' honoring quoted attribute values.
    var quote: Char = 0
    var lastNonWs: Char = 0
    var end = -1
    while (i < n && end < 0) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') end = i
      if (end < 0 && !Character.isWhitespace(c)) lastNonWs = c
      i += 1
    }
    if (end < 0) return n // unterminated tag: drop the rest (spec)
    if (closing) { sink.onTagClose(name, lt); return end + 1 }
    val selfClosing = lastNonWs == '/'
    sink.onTagOpen(name, selfClosing, lt)
    var next = end + 1
    if (!selfClosing && (name == "script" || name == "style")) {
      // Raw-text island: skip to the matching close tag.
      val closeTag = "</" + name
      var j = next
      var found = -1
      while (j < n && found < 0) {
        if (s.charAt(j) == '<' && startsWithIC(s, j, closeTag)) found = j
        j += 1
      }
      if (found < 0) next = n
      else {
        val gt = s.indexOf('>', found)
        sink.onTagClose(name, found)
        next = if (gt < 0) n else gt + 1
      }
    }
    next
  }
}

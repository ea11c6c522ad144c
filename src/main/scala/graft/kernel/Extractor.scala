package graft.kernel

import graft.model.{ExtractConfig, ExtractedTurn, Span, Turn}

/** Per-dialect extraction strategy — the analog of the reference's pluggable
  * recognizer interface (`TesseractRecognizer.read` / `TensorFlowRecognizer
  * .read`, selected per document type at
  * `/root/reference/src/cmnd/cmnd_info.py:166-172`).
  */
/** Per-task reusable kernel state: avoids per-row builder allocation inside
  * mapPartitions (the analog of the reference's per-daemon model reuse,
  * `/root/reference/src/extras/weinman/interface/server_so.py:100-103`). */
final class ExtractorContext {
  val blockBuilder = new BlockBuilder
}

sealed trait TurnExtractor {
  /** @return (extracted text, spans, blocksKept, blocksDropped) */
  def extract(payload: String, cfg: ExtractConfig, ctx: ExtractorContext): (String, Vector[Span], Int, Int)

  final def extract(payload: String, cfg: ExtractConfig): (String, Vector[Span], Int, Int) =
    extract(payload, cfg, new ExtractorContext)
}

/** HTML boilerplate-strip dialect: tokenizer → block builder → keep/drop
  * classifier; kept blocks joined with "\n". */
object HtmlExtractor extends TurnExtractor {
  def extract(payload: String, cfg: ExtractConfig, ctx: ExtractorContext): (String, Vector[Span], Int, Int) = {
    val blocks = BlockBuilder.build(payload, ctx.blockBuilder)
    var kept = 0
    var dropped = 0
    val spans = Vector.newBuilder[Span]
    val sb = new java.lang.StringBuilder(payload.length / 2)
    var i = 0
    while (i < blocks.length) {
      val b = blocks(i)
      if (BlockClassifier.keep(b, cfg)) {
        if (kept > 0) sb.append('\n')
        sb.append(b.text)
        spans += Span(kept, b.start, b.end, b.kind, b.text)
        kept += 1
      } else dropped += 1
      i += 1
    }
    (sb.toString, spans.result(), kept, dropped)
  }
}

/** PDF-like layout-span dialect: parse `x y text` spans, reading-order
  * restore per [[LayoutParser]]. */
object LayoutExtractor extends TurnExtractor {
  def extract(payload: String, cfg: ExtractConfig, ctx: ExtractorContext): (String, Vector[Span], Int, Int) = {
    val parsed = LayoutParser.parse(payload, cfg)
    val text = parsed.lines.iterator.map(_.text).mkString("\n")
    (text, parsed.lines, parsed.lines.length, parsed.dropped)
  }
}

/** Pass-through dialect with normalization only (the `_clean` substitution
  * table). One span covering the content extent of the original payload. */
object PlainExtractor extends TurnExtractor {
  def extract(payload: String, cfg: ExtractConfig, ctx: ExtractorContext): (String, Vector[Span], Int, Int) = {
    val cleaned = Validators.clean(payload)
    if (cleaned.isEmpty) ("", Vector.empty, 0, 1)
    else {
      var s = 0
      while (s < payload.length && Character.isWhitespace(payload.charAt(s))) s += 1
      var e = payload.length
      while (e > s && Character.isWhitespace(payload.charAt(e - 1))) e -= 1
      (cleaned, Vector(Span(0, s, e, "plain", cleaned)), 1, 0)
    }
  }
}

/** Dialect dispatch by `tool` — the analog of the reference's template
  * classification argmax (`/root/reference/src/controller/idcardprocesser.py:
  * 133-137` picks one of 3 card templates per document). Here the `tool`
  * column IS the discriminator; unknown tools fall back to content sniffing
  * (score each dialect, pick best — the same shape as the score-join J1).
  */
object Extractor {

  def forTool(tool: String): Option[TurnExtractor] = tool match {
    case "html"   => Some(HtmlExtractor)
    case "layout" => Some(LayoutExtractor)
    case "plain"  => Some(PlainExtractor)
    case _        => None
  }

  /** Scored dialect sniffing for unknown `tool` values: a cheap confidence
    * per dialect over a bounded prefix (compute-on-sample, analog of the
    * center-crop skew estimate `pagepredictor.py:262`), argmax with fixed
    * precedence html > layout > plain on ties. The score is the F2 gate's
    * input (reference emits a classify score and gates `< 0.3`,
    * `idcardprocesser.py:133-137`). Spec (locked):
    *  - html: chosen when ≥ 2 tag-like `<` in the prefix; score
    *    min(1, tags/4) — so always ≥ 0.5;
    *  - layout: chosen when > half the non-blank lines start with two ints;
    *    score = layoutish/lines ∈ (0.5, 1];
    *  - plain fallback: score 0.4 if the prefix has any non-whitespace
    *    content, else 0.0 (gated out).
    */
  def sniffScored(payload: String): (TurnExtractor, Double) = {
    val sample = if (payload.length > 2048) payload.substring(0, 2048) else payload
    var tags = 0
    var i = sample.indexOf('<')
    while (i >= 0 && i < sample.length - 1) {
      val c = sample.charAt(i + 1)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '/') tags += 1
      i = sample.indexOf('<', i + 1)
    }
    if (tags >= 2) return (HtmlExtractor, math.min(1.0, tags / 4.0))
    // layout: most non-blank lines start with two ints
    var layoutish = 0
    var lines = 0
    for (line <- sample.linesIterator if line.trim.nonEmpty) {
      lines += 1
      val t = line.trim
      val firstTok = t.takeWhile(_.isDigit)
      if (firstTok.nonEmpty && t.length > firstTok.length && t.charAt(firstTok.length) == ' ')
        layoutish += 1
    }
    if (lines > 0 && layoutish * 2 > lines) (LayoutExtractor, layoutish.toDouble / lines)
    else (PlainExtractor, if (sample.exists(!Character.isWhitespace(_))) 0.4 else 0.0)
  }

  def sniff(payload: String): TurnExtractor = sniffScored(payload)._1

  def extractTurn(t: Turn, cfg: ExtractConfig): ExtractedTurn =
    extractTurn(t, cfg, new ExtractorContext)

  def extractTurn(t: Turn, cfg: ExtractConfig, ctx: ExtractorContext): ExtractedTurn = {
    val payload = if (t.text == null) "" else t.text
    val (ex, score) = forTool(t.tool) match {
      case Some(e) => (e, 1.0) // tool column named the dialect: full confidence
      case None    => sniffScored(payload)
    }
    val (text, spans, kept, dropped) = ex.extract(payload, cfg, ctx)
    ExtractedTurn(t.conv_id, t.turn_idx, t.role, t.tool, t.ts,
      text, spans, kept, dropped, text.length, score)
  }
}

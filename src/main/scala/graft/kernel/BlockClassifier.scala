package graft.kernel

import graft.model.ExtractConfig

/** Keep/drop block classifier — the jusText (Pomikálek 2011) / boilerpipe
  * (Kohlschütter et al., WSDM 2010) style analog of the
  * reference's line pre-check gates
  * (`/root/reference/src/controller/pagepredictor.py:131-148`: height, aspect,
  * density rejects) and small-object/decoration removal
  * (`/root/reference/src/utils/removedot.py:34-56`).
  *
  * Rules, applied IN ORDER (first match wins; locked — goldens depend on it):
  *  1. DROP "empty"      — text empty after trim (builder already trims).
  *  2. DROP "separator"  — every char is one of `-=_.*~|+ ` (dotted leaders /
  *                         horizontal rules, e.g. "----", "...."). Analog of
  *                         the ellipsis-map subtraction
  *                         (`doubleextractbinarize.py:72`).
  *  3. DROP "boilerplate"— kind ∈ {nav, header, footer, aside} (structural
  *                         boilerplate containers).
  *  4. DROP "link-dense" — linkDensity ≥ cfg.maxLinkDensity (default 0.5).
  *  5. DROP "short"      — text.length < cfg.minBlockLen (default 15), the
  *                         size-gate analog of the CC area/height predicates
  *                         (`pagepredictor.py:157-175`).
  *  6. KEEP otherwise.
  */
object BlockClassifier {

  final val BoilerplateKinds: Set[String] = Set("nav", "header", "footer", "aside")

  private def isSeparatorChar(c: Char): Boolean =
    c == '-' || c == '=' || c == '_' || c == '.' || c == '*' ||
      c == '~' || c == '|' || c == '+' || c == ' '

  def isSeparator(text: String): Boolean = {
    var i = 0
    while (i < text.length) {
      if (!isSeparatorChar(text.charAt(i))) return false
      i += 1
    }
    text.nonEmpty
  }

  /** @return None if kept, Some(reason) if dropped. */
  def dropReason(b: Block, cfg: ExtractConfig): Option[String] = {
    if (b.text.isEmpty) Some("empty")
    else if (isSeparator(b.text)) Some("separator")
    else if (BoilerplateKinds.contains(b.kind)) Some("boilerplate")
    else if (b.linkDensity >= cfg.maxLinkDensity) Some("link-dense")
    else if (b.text.length < cfg.minBlockLen) Some("short")
    else None
  }

  def keep(b: Block, cfg: ExtractConfig): Boolean = dropReason(b, cfg).isEmpty
}

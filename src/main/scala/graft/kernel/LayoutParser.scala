package graft.kernel

import graft.model.{ExtractConfig, Span}
import scala.collection.mutable.ArrayBuffer

/** Parser for the PDF-like "layout" tool dialect: the payload is a list of
  * positioned text spans, one per line, formatted `x y text...` with integer
  * coordinates (x in character cells, y in layout units), in ARBITRARY order.
  *
  * Reimplements (text-domain) the reference's reading-order restore — the
  * 2-pass sort + greedy same-line merge of
  * `/root/reference/src/controller/pagepredictor.py:349-386`:
  * sort by x, greedily merge each record with its nearest right neighbor on
  * the same band (`|Δy| < 0.5·h` and `gap > −h`, cost `Δy² + gap²`), then sort
  * the merged lines top-to-bottom. The reference breaks cost ties by list
  * order (`pagepredictor.py:365-366`), which is nondeterministic under
  * shuffles — here every comparison has a TOTAL order (SURVEY §7.4 #2):
  *
  * Spec (locked; goldens depend on it):
  *  - Input lines that do not start with two non-negative ints are dropped
  *    (counted in blocksDropped). Empty/blank lines are ignored silently.
  *  - width(span) = text.length; right(span) = x + width. h = cfg.lineHeight.
  *  - Records are processed in (x, y, text) ascending order. For the current
  *    record, the merge candidate is the unconsumed record minimizing
  *    cost = Δy² + gap², with Δy = |y_cand − y_cur| < 0.5·h and
  *    gap = x_cand − right_cur > −h; ties broken by (x, y, text) order.
  *    Merge: text += " " + cand.text; right = cand.right; y unchanged.
  *  - Output lines sorted by (y, x, text); joined with "\n".
  *  - Span offsets are LAYOUT coordinates (not payload offsets): start = x of
  *    the line's first span, end = right edge of its last span; kind "line".
  */
object LayoutParser {

  private final class Rec(val x: Int, val y: Int, var text: String) {
    var right: Int = x + text.length
    var consumed: Boolean = false
  }

  final case class Parsed(lines: Vector[Span], dropped: Int)

  def parse(payload: String, cfg: ExtractConfig): Parsed = {
    val recs = ArrayBuffer.empty[Rec]
    var dropped = 0
    var from = 0
    val n = payload.length
    while (from <= n) {
      val nl = payload.indexOf('\n', from)
      val end = if (nl < 0) n else nl
      if (end > from) {
        val line = payload.substring(from, end)
        parseLine(line) match {
          case null => if (line.trim.nonEmpty) dropped += 1
          case r    => recs += r
        }
      }
      from = end + 1
      if (nl < 0) from = n + 1
    }

    val h = cfg.lineHeight
    val half = 0.5 * h
    val sorted = recs.toArray
    java.util.Arrays.sort(sorted, recOrder)

    var i = 0
    while (i < sorted.length) {
      val cur = sorted(i)
      if (!cur.consumed) {
        var merged = true
        while (merged) {
          merged = false
          var best: Rec = null
          var bestCost = Double.MaxValue
          var j = 0
          while (j < sorted.length) {
            val cand = sorted(j)
            if (!cand.consumed && (cand ne cur)) {
              val dy = math.abs(cand.y - cur.y)
              val gap = cand.x - cur.right
              if (dy < half && gap > -h) {
                val cost = dy.toDouble * dy + gap.toDouble * gap
                // strict < keeps the earliest (x,y,text)-ordered candidate on ties
                if (cost < bestCost) { bestCost = cost; best = cand }
              }
            }
            j += 1
          }
          if (best != null) {
            cur.text = cur.text + " " + best.text
            cur.right = best.right
            best.consumed = true
            merged = true
          }
        }
      }
      i += 1
    }

    val lines = sorted.filter(!_.consumed)
    java.util.Arrays.sort(lines, lineOrder)
    val spans = Vector.tabulate(lines.length) { k =>
      val r = lines(k)
      Span(k, r.x, r.right, "line", r.text)
    }
    Parsed(spans, dropped)
  }

  private val recOrder = new java.util.Comparator[Rec] {
    def compare(a: Rec, b: Rec): Int = {
      if (a.x != b.x) return Integer.compare(a.x, b.x)
      if (a.y != b.y) return Integer.compare(a.y, b.y)
      a.text.compareTo(b.text)
    }
  }
  private val lineOrder = new java.util.Comparator[Rec] {
    def compare(a: Rec, b: Rec): Int = {
      if (a.y != b.y) return Integer.compare(a.y, b.y)
      if (a.x != b.x) return Integer.compare(a.x, b.x)
      a.text.compareTo(b.text)
    }
  }

  /** `x y text...` → Rec, or null if the line is not a span. */
  private def parseLine(line: String): Rec = {
    var i = 0
    val n = line.length
    while (i < n && line.charAt(i) == ' ') i += 1
    val x = parseInt(line, i)
    if (x < 0) return null
    i = skipInt(line, i)
    while (i < n && line.charAt(i) == ' ') i += 1
    val y = parseInt(line, i)
    if (y < 0) return null
    i = skipInt(line, i)
    if (i < n && line.charAt(i) != ' ') return null
    while (i < n && line.charAt(i) == ' ') i += 1
    val text = line.substring(i).trim
    if (text.isEmpty) null else new Rec(x, y, text)
  }

  private def parseInt(s: String, from: Int): Int = {
    var i = from; var v = 0; var any = false
    while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
      v = v * 10 + (s.charAt(i) - '0'); any = true; i += 1
      if (v > 100000000) return -1
    }
    if (any) v else -1
  }
  private def skipInt(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
    i
  }
}

package graft.kernel

/** Named-field extraction from ordered layout lines — the reference's actual
  * end product: a field dictionary like
  * `{'idNumber', 'dateOfBirth', 'fullName', ...}` assembled from positioned
  * lines (`/root/reference/src/cmnd/cmnd_info.py:204-256` keyed by line
  * positions; `src/cmnd/main.py:35-44` `addLineDesc({'idNumber':(...)})`).
  *
  * Semantics reproduced:
  *  - line-interval field assignment (J5): each field owns a [from,to] range
  *    of the reading-ordered lines;
  *  - ordered multi-line concatenation per field (A6): `hoten1+hoten2`,
  *    `quequan1+quequan2` (`idcardprocesser.py:149-165`);
  *  - near-duplicate line suppression inside a field (J7): if the second
  *    line is within levenshtein < 4 of the first, drop it
  *    (`idcardprocesser.py:163-165`);
  *  - per-field validators (C1-C3): id → 9/12 digits, date → d-m-y regex,
  *    name/text → clean-table normalization;
  *  - total-char sanity gate (A4): emit nothing if fewer than 6 chars of
  *    field content survived (`idcardprocesser.py:170-176`).
  *
  * The template is data (a broadcast value in the pipeline), not code —
  * mirroring the template-XML-as-dimension design (`src/cmnd/template.py`).
  */
object FieldExtractor {

  /** kind ∈ {"id", "date", "name", "text"} selects the validator.
    * `charset`, when set, is the field's output alphabet (reference per-field
    * charsets, e.g. digits-only `out_charset_so`,
    * `/root/reference/src/extras/weinman/mjsynth.py:23-25`): chars outside it
    * are projected away AFTER validation; a field whose value empties out is
    * dropped. */
  final case class FieldSpec(name: String, lineFrom: Int, lineTo: Int, kind: String,
      charset: Option[String] = None)

  /** A receipt/ID-card-shaped default template over reading-ordered lines.
    * The data form of the same template is [[TemplateStore.DefaultJson]]
    * (kept in lockstep by TemplateStoreSpec) — deployments load templates
    * as broadcast data, this constant is the in-code twin for kernels and
    * tests. */
  val DefaultTemplate: Seq[FieldSpec] = Seq(
    FieldSpec("title", 0, 0, "text"),
    FieldSpec("idNumber", 1, 1, "id", Some("0123456789")),
    FieldSpec("fullName", 2, 3, "name"),
    FieldSpec("dateOfBirth", 4, 4, "date", Some("0123456789-")),
    FieldSpec("address", 5, 7, "text")
  )

  def extract(lines: IndexedSeq[String],
      template: Seq[FieldSpec] = DefaultTemplate): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var totalChars = 0
    template.foreach { spec =>
      val owned0 = lines.slice(spec.lineFrom, spec.lineTo + 1).filter(_.nonEmpty)
      // near-dup suppression within the field's lines: keep a line only if
      // it is not within distance 4 of the PREVIOUS kept line
      val owned = owned0.foldLeft(Vector.empty[String]) { (acc, l) =>
        if (acc.nonEmpty && Validators.levenshtein(acc.last, l) < 4) acc else acc :+ l
      }
      if (owned.nonEmpty) {
        val joined = owned.mkString(" ")
        val validated: Option[String] = spec.kind match {
          case "id"   => Validators.correctId(joined)
          case "date" => Validators.correctDob(joined)
          case "name" => Some(Validators.clean(joined)).filter(_.nonEmpty)
          case _      => Some(Validators.clean(joined)).filter(_.nonEmpty)
        }
        // per-field output alphabet (C8): project to the allowed charset
        val projected = spec.charset match {
          case Some(cs) => validated.map(Validators.charsetFilter(_, cs.toSet)).filter(_.nonEmpty)
          case None     => validated
        }
        projected.foreach { v =>
          out += spec.name -> v
          totalChars += v.length
        }
      }
    }
    // total-char sanity gate: a result with ≤5 chars of content is noise
    if (totalChars <= 5) Map.empty else out.result()
  }
}

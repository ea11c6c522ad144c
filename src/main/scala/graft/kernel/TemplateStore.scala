package graft.kernel

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.kernel.FieldExtractor.FieldSpec
import scala.jdk.CollectionConverters._

/** Field templates as DATA, not code — the engine analog of the reference's
  * per-document-type template files (`/root/reference/src/cmnd/template.py:
  * 23-42` loads VOC-XML field boxes into a dict; `src/cmnd/main.py:35-44`
  * registers per-type `addLineDesc` schemas). A deployment broadcasts the
  * parsed `Map[tool → Seq[FieldSpec]]` (a tiny dimension, S9) and the kernel
  * looks its template up per turn; adding a document type is a data change.
  *
  * JSON shape (one key per `tool` dialect):
  * {{{
  * { "layout": [ {"name":"idNumber","lineFrom":1,"lineTo":1,"kind":"id",
  *                "charset":"0123456789"}, ... ] }
  * }}}
  * `charset` is optional (per-field output alphabet, C8). Jackson is used
  * for parsing — it ships with Spark, so this adds no dependency.
  */
object TemplateStore {

  /** The built-in default: the receipt/ID-card-shaped template for `layout`
    * payloads, expressed as the data format (kept in sync with
    * [[FieldExtractor.DefaultTemplate]] by TemplateStoreSpec). */
  val DefaultJson: String =
    """{
      |  "layout": [
      |    {"name": "title",       "lineFrom": 0, "lineTo": 0, "kind": "text"},
      |    {"name": "idNumber",    "lineFrom": 1, "lineTo": 1, "kind": "id",
      |     "charset": "0123456789"},
      |    {"name": "fullName",    "lineFrom": 2, "lineTo": 3, "kind": "name"},
      |    {"name": "dateOfBirth", "lineFrom": 4, "lineTo": 4, "kind": "date",
      |     "charset": "0123456789-"},
      |    {"name": "address",     "lineFrom": 5, "lineTo": 7, "kind": "text"}
      |  ]
      |}""".stripMargin

  private val mapper = new ObjectMapper

  /** Parse `{tool: [FieldSpec...]}`. Fails fast on malformed specs — a bad
    * template must die at broadcast time, not per-row in executors. */
  def parse(json: String): Map[String, Seq[FieldSpec]] = {
    val root = mapper.readTree(json)
    require(root != null && root.isObject, "template JSON must be an object of tool -> [fields]")
    root.properties().asScala.map { e =>
      val tool = e.getKey
      val arr = e.getValue
      require(arr.isArray, s"template for tool '$tool' must be an array")
      val specs = arr.elements().asScala.map(parseSpec(tool, _)).toVector
      tool -> (specs: Seq[FieldSpec])
    }.toMap
  }

  private def parseSpec(tool: String, n: JsonNode): FieldSpec = {
    def req(field: String): JsonNode = {
      val v = n.get(field)
      require(v != null, s"template '$tool': field entry missing '$field' in $n")
      v
    }
    val kind = req("kind").asText()
    require(Set("id", "date", "name", "text").contains(kind),
      s"template '$tool': unknown kind '$kind'")
    val from = req("lineFrom").asInt()
    val to = req("lineTo").asInt()
    require(from >= 0 && to >= from, s"template '$tool': bad line range [$from,$to]")
    FieldSpec(req("name").asText(), from, to, kind,
      Option(n.get("charset")).map(_.asText()))
  }
}

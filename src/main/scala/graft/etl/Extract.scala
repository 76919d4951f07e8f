package graft.etl

import com.fasterxml.jackson.databind.JsonNode

/** Per-block extraction (SURVEY §2.3 E1–E6).
  *
  * Each detected block becomes one record, serialized as a single JSON object
  * string — the heterogeneous pre-pivot payload representation (SURVEY §1.1).
  * The Spark pipeline then infers one dynamic schema across all records
  * (spark.read.json-style) and pivots to the wide frame, which is exactly the
  * reference's infer_schema + normalize collapse.
  *
  * Pure Scala: runs inside a `flatMap` on executors, no driver involvement.
  */
object Extract {

  /** One extracted record: kind, per-kind ordinal, and the record payload as
    * a JSON object string (contains `type` and `source_index`). */
  final case class Record(kind: String, ordinal: Int, sourceIndex: String, json: String)

  /** Python str.split() semantics: split on any whitespace run, no empties. */
  private[etl] def wordCount(s: String): Int = {
    val t = s.trim
    if (t.isEmpty) 0 else t.split("\\s+").length
  }

  private val titleRe =
    java.util.regex.Pattern.compile("<title[^>]*>(.*?)</title>",
      java.util.regex.Pattern.DOTALL | java.util.regex.Pattern.CASE_INSENSITIVE)
  private val tagRe = java.util.regex.Pattern.compile("<[^>]+>")
  private val entityRe =
    java.util.regex.Pattern.compile("&(#[xX]?[0-9a-fA-F]+|[a-zA-Z]+);")
  private val namedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** Decode the common HTML entities the way bs4's html.parser surfaces them
    * in text nodes (named subset + numeric); unknown named entities pass
    * through unchanged. `&nbsp;` becomes a PLAIN space so the whitespace
    * word count splits on it like Python's `str.split()` does on U+00A0. */
  private[etl] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val m = entityRe.matcher(s)
    val sb = new StringBuffer
    while (m.find()) {
      val e = m.group(1)
      val rep =
        try {
          if (e.startsWith("#x") || e.startsWith("#X"))
            new String(Character.toChars(Integer.parseInt(e.substring(2), 16)))
          else if (e.startsWith("#"))
            new String(Character.toChars(e.substring(1).toInt))
          else namedEntities.getOrElse(e, m.group(0))
        } catch { case _: Exception => m.group(0) }
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(rep))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** E1 — HTML: title text + word count of the extracted text. Both fields
    * are later pruned (N1, etl_pipeline.py:226-230) and only feed the
    * schema-stats artifact, but the word count mirrors bs4's
    * `get_text().split()` (etl_pipeline.py:117-124): text nodes concatenate
    * with NO separator — tags are REMOVED, not replaced by spaces — and
    * entities are decoded before splitting. */
  private def extractHtml(html: String): JsonNode = {
    val m = titleRe.matcher(html)
    val title = if (m.find()) decodeEntities(m.group(1)) else ""
    val text = decodeEntities(tagRe.matcher(html).replaceAll(""))
    val o = Json.mapper.createObjectNode()
    o.put("type", "html")
    o.put("title", title)
    o.put("word_count", wordCount(text))
    o
  }

  /** E2 — JSON: parse, flatten (E3), then clobber any user field named
    * `type` with 'json' (SURVEY D-2; etl_pipeline.py:134 behavior). */
  private def extractJson(jsonStr: String): JsonNode = {
    val flat = Json.flatten(Json.parseObject(jsonStr))
    flat.put("type", "json")
    flat
  }

  /** E4 — text: first-50-chars title + whitespace word count. */
  private def extractText(text: String): JsonNode = {
    val o = Json.mapper.createObjectNode()
    o.put("type", "text")
    o.put("title", if (text.length > 50) text.substring(0, 50) else text)
    o.put("word_count", wordCount(text))
    o
  }

  /** E5 — media: constant record, payload discarded (etl_pipeline.py:161-167). */
  private def extractMedia(): JsonNode = {
    val o = Json.mapper.createObjectNode()
    o.put("type", "media")
    o.put("title", "Base64 Media")
    o.put("word_count", 0)
    o
  }

  /** Extract ONE detected block into its record (E1–E5 dispatch by kind)
    * with the given per-kind ordinal. `source_index` is set last so it
    * clobbers any user field of that name, as the reference's dict
    * assignment does. Used by the whole-file path and by the chunked
    * large-file path (where ordinals are assigned globally after dedup). */
  def extractRecord(kind: String, payload: String, ordinal: Int): Record = {
    val node = (kind match {
      case "html" => extractHtml(payload)
      case "json" => extractJson(payload)
      case "text" => extractText(payload)
      case _ => extractMedia()
    }).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val si = s"${kind}_$ordinal"
    node.put("source_index", si)
    Record(kind, ordinal, si, Json.mapper.writeValueAsString(node))
  }

  /** E6 — dispatcher: fixed kind order html→json→text→media, per-kind
    * ordinals within the document. */
  def extractRecords(content: String): Seq[Record] = {
    val d = Detector.detect(content)
    def emit(kind: String, payloads: Seq[String]): Seq[Record] =
      payloads.zipWithIndex.map { case (p, idx) => extractRecord(kind, p, idx) }
    emit("html", d.html) ++ emit("json", d.json) ++
      emit("text", d.text) ++ emit("media", d.media)
  }
}

package graft.etl

import java.util.regex.Pattern
import scala.collection.mutable

/** Deterministic mixed-content block detector.
  *
  * Re-expresses the reference's content-type detection (SURVEY §2.2 D1–D4;
  * reference behavior at etl_pipeline.py:57-115) with the determinism fix of
  * SURVEY §7.4 D-1: the reference de-duplicates HTML/base64 matches through an
  * unordered set, which makes block order — and, transitively, the residual
  * text split — nondeterministic. Our spec: de-duplicate by value, order by
  * (first-occurrence position, −length), and remove blocks from the residual
  * outermost-first, so every input has exactly one output.
  *
  * Pure Scala, no Spark dependency: this is the highest-risk parity code
  * (SURVEY §7.1 step 2) and is unit/property-tested without a SparkSession.
  * In the Spark plan it runs inside a `flatMap` over one-row-per-file input,
  * so it parallelizes across files on a cluster with no shuffle.
  */
object Detector {

  /** A detected block: discriminator kind ∈ {html, json, text, media}. */
  final case class Block(kind: String, payload: String)

  final case class Detected(
      html: Seq[String],
      json: Seq[String],
      text: Seq[String],
      media: Seq[String]) {
    /** Blocks in the reference's fixed emission order html→json→text→media
      * (etl_pipeline.py:169-195). */
    def ordered: Seq[Block] =
      html.map(Block("html", _)) ++ json.map(Block("json", _)) ++
        text.map(Block("text", _)) ++ media.map(Block("media", _))
  }

  // The reference's 5 HTML patterns (etl_pipeline.py:66-72), DOTALL+IGNORECASE.
  private val htmlPatterns: Seq[Pattern] = Seq(
    "<html[^>]*>.*?</html>",
    "<!DOCTYPE[^>]*>.*?</html>",
    "<div[^>]*>.*?</div>",
    "<p[^>]*>.*?</p>",
    "<body[^>]*>.*?</body>"
  ).map(Pattern.compile(_, Pattern.DOTALL | Pattern.CASE_INSENSITIVE))

  // Max one nesting level (etl_pipeline.py:82) — deeper objects match only an
  // inner fragment; top-level arrays are detected element-wise (SURVEY D2).
  private val jsonPattern: Pattern =
    Pattern.compile("\\{(?:[^{}]|(?:\\{[^{}]*\\}))*\\}", Pattern.DOTALL)

  // Base64 patterns (etl_pipeline.py:92-97); the generic ≥64-char pattern is
  // reproduced faithfully including its false positives (SURVEY D-6).
  private val base64Patterns: Seq[Pattern] = Seq(
    "data:image/[^;]+;base64,([A-Za-z0-9+/=]+)",
    "data:text/[^;]+;base64,([A-Za-z0-9+/=]+)",
    "([A-Za-z0-9+/]{64,}={0,2})"
  ).map(Pattern.compile(_))

  private final case class Found(value: String, pos: Int)

  private def findAll(p: Pattern, content: String, group: Int = 0): Seq[Found] = {
    val m = p.matcher(content)
    val buf = mutable.ArrayBuffer.empty[Found]
    while (m.find()) buf += Found(m.group(group), m.start(group))
    buf.toSeq
  }

  /** Dedup by value; keep each value's earliest position; order by
    * (position, −length) — the D-1 deterministic spec. */
  private def dedupPositional(ms: Seq[Found]): Seq[String] =
    ms.groupBy(_.value)
      .map { case (v, occ) => Found(v, occ.map(_.pos).min) }
      .toSeq
      .sortBy(f => (f.pos, -f.value.length))
      .map(_.value)

  def detect(content: String): Detected = {
    val html = dedupPositional(htmlPatterns.flatMap(findAll(_, content)))

    // JSON: candidates validated like json.loads; dedup keeps first
    // occurrence (the reference's list-membership dedup is already stable).
    val json = {
      val seen = mutable.LinkedHashSet.empty[String]
      findAll(jsonPattern, content)
        .filter(f => Json.isValidObject(f.value))
        .foreach(f => seen += f.value)
      seen.toSeq
    }

    val media = dedupPositional(
      base64Patterns.flatMap(findAll(_, content, group = 1)))

    // Residual text: strip detected blocks (outermost-first thanks to the
    // (pos, −length) order — an inner <p> inside an already-removed <body>
    // is a no-op replace), then keep trimmed lines longer than 5 chars
    // (etl_pipeline.py:104-113).
    var remaining = content
    html.foreach(h => remaining = remaining.replace(h, ""))
    json.foreach(j => remaining = remaining.replace(j, ""))
    val text = remaining
      .split("\n", -1)
      .iterator
      .map(_.trim)
      .filter(_.length > 5)
      .toSeq

    Detected(html, json, text, media)
  }
}

package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Pure-Scala detector/extractor parity tests — fixtures F6–F10 from
  * FIXTURES.md (empirically probed reference semantics). No SparkSession. */
class DetectorSpec extends AnyFunSuite {

  test("F6: depth-2+ JSON matches only the inner 1-nesting fragment") {
    val in = """{"user": {"name": "Al", "addr": {"city": "NYC"}}, "tags": ["a","b"], "n": 5}"""
    val d = Detector.detect(in)
    assert(d.json == Seq("""{"name": "Al", "addr": {"city": "NYC"}}"""))
  }

  test("F6b: depth-3 object yields only the deepest 1-nesting fragment") {
    val d = Detector.detect("""{"a":{"b":{"c":{"d":1}}}}""")
    assert(d.json == Seq("""{"c":{"d":1}}"""))
  }

  test("F7: user field named `type` is clobbered to 'json'") {
    val recs = Extract.extractRecords("""{"type": "scheduled", "id": 1}""")
    val json = recs.find(_.kind == "json").get.json
    val node = Json.parseObject(json)
    assert(node.get("type").asText() == "json")
    assert(node.get("id").asInt() == 1)
  }

  test("F8: duplicate JSON blocks dedup to one record, first occurrence wins") {
    val d = Detector.detect("""{"x": 1} and again {"x": 1} and {"y": 2}""")
    assert(d.json == Seq("""{"x": 1}""", """{"y": 2}"""))
  }

  test("F9: base64 data-URI and generic >=64-char run both become media") {
    val uri = "data:image/png;base64," + "iVBORw0KGgo" * 8
    val bare = "A" * 70
    val d = Detector.detect(s"$uri\nsome text line here\n$bare")
    // the data-URI payload also matches the generic pattern → both dedup by value
    assert(d.media.nonEmpty && d.media.contains(bare))
  }

  test("F10: paragraph filter keeps len>5 only (trimmed)") {
    val d = Detector.detect("12345\n123456\n   \n  padded line  ")
    assert(d.text == Seq("123456", "padded line"))
  }

  test("JSON arrays are detected element-wise, never as arrays") {
    val d = Detector.detect("""[ {"a": 1}, {"b": 2} ]""")
    assert(d.json == Seq("""{"a": 1}""", """{"b": 2}"""))
  }

  test("invalid JSON candidates are rejected by validation") {
    val d = Detector.detect("""{not json at all} {"ok": true}""")
    assert(d.json == Seq("""{"ok": true}"""))
  }

  test("deterministic HTML order: (position, -length), outermost first") {
    val html = "<html><body><p>hi there</p></body></html>"
    val d = Detector.detect(html)
    // full doc (pos 0) sorts before <body> (pos 6) before <p> (pos 12)
    assert(d.html.head == html)
    assert(d.html.map(_.length) == d.html.map(_.length).sorted.reverse)
    // all three removed from residual → no text rows
    assert(d.text.isEmpty)
  }

  test("word_count matches Python str.split() semantics") {
    assert(Extract.wordCount("") == 0)
    assert(Extract.wordCount("   ") == 0)
    assert(Extract.wordCount(" a  b\t c\n") == 3)
  }

  test("html word_count matches bs4 get_text().split() semantics") {
    def wc(html: String): Int = {
      val r = Extract.extractRecord("html", html, 0)
      Json.parseObject(r.json).get("word_count").asInt()
    }
    // bs4 get_text() joins text nodes with NO separator: tags vanish, so
    // "Title" and "text" fuse into one token across the element boundary
    assert(wc("<p>Hello <b>World</b></p>") == 2)
    assert(wc("<div><h1>Title</h1><p>text</p></div>") == 1) // "Titletext"
    // entities decode before the split; &nbsp; is whitespace to Python
    assert(wc("<p>a &amp; b</p>") == 3)
    assert(wc("<p>a&nbsp;b</p>") == 2)
    assert(wc("<p>x&#65;y</p>") == 1) // "xAy"
    // title captures decoded entity text
    val t = Extract.extractRecord("html",
      "<html><title>My &quot;Page&quot;</title><body>hi</body></html>", 0)
    assert(Json.parseObject(t.json).get("title").asText() == "My \"Page\"")
  }

  test("flatten: nested dicts join with _, arrays kept as-is") {
    val flat = Json.flatten(Json.parseObject(
      """{"a": {"b": {"c": 1}}, "tags": ["x","y"], "n": 5}"""))
    assert(flat.get("a_b_c").asInt() == 1)
    assert(flat.get("tags").isArray)
    assert(flat.get("n").asInt() == 5)
  }
}

package graft.etl

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property tests for the deterministic detector (SURVEY §5.6):
  * pinned invariants hold for ALL inputs, not just fixtures. */
object DetectorPropSpec extends Properties("Detector") {

  // Constructive generators: pick a length, then exactly that many chars.
  // (A `suchThat` filter over alphaLowerStr discards most values and makes
  // ScalaCheck give up once the filters compound inside listOfN.)
  private def boundedWord(maxLen: Int): Gen[String] =
    Gen.choose(1, maxLen).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
  private val key = boundedWord(8)
  private val word = boundedWord(10)

  /** Flat JSON objects: {"k": 1, "k2": "v"} — at most one nesting level is
    * the detector's contract; flat objects must always be found. */
  private val flatJson: Gen[String] = for {
    n <- Gen.choose(1, 4)
    keys <- Gen.listOfN(n, key).map(_.distinct)
    vals <- Gen.listOfN(keys.length, Gen.oneOf(
      Gen.choose(0, 99999).map(_.toString),
      word.map(w => s""""$w"""")))
  } yield keys.zip(vals).map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")

  // alphaLower words can never contain '{' or '<', so no filter is needed.
  private val textLine: Gen[String] =
    Gen.listOfN(4, word).map(_.mkString(" "))

  property("every distinct flat JSON object interleaved with text is detected exactly once") =
    forAll(Gen.listOfN(3, flatJson), Gen.listOfN(3, textLine)) { (js, lines) =>
      val distinctJs = js.distinct
      val content = distinctJs.zipAll(lines.take(distinctJs.length), "", "")
        .flatMap { case (j, l) => Seq(l, j) }.filter(_.nonEmpty).mkString("\n")
      val d = Detector.detect(content)
      d.json == distinctJs
    }

  property("duplicate JSON blocks are reported once, first occurrence order") =
    forAll(flatJson) { j =>
      Detector.detect(s"$j\nfiller text line\n$j").json == Seq(j)
    }

  property("text residual keeps exactly the >5-char trimmed non-block lines") =
    forAll(Gen.listOfN(5, textLine)) { lines =>
      val d = Detector.detect(lines.mkString("\n"))
      d.text == lines.map(_.trim).filter(_.length > 5)
    }

  property("detection is deterministic: same input → same output") =
    forAll(Gen.listOfN(2, flatJson), Gen.listOfN(2, textLine)) { (js, lines) =>
      val content = (js ++ lines).mkString("\n")
      Detector.detect(content) == Detector.detect(content)
    }

  property("wordCount matches whitespace-token semantics for arbitrary strings") =
    forAll(Gen.listOf(Gen.oneOf(word, Gen.const(" "), Gen.const("\t"), Gen.const("\n")))) {
      parts =>
        val s = parts.mkString
        val expected = s.split("\\s+").count(_.nonEmpty)
        Extract.wordCount(s) == expected
    }

  property("rolling hash equals BigInt reference model") = {
    import graft.functions.RollingHash
    forAll(Gen.asciiPrintableStr) { s =>
      val expr = RollingHash(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s)))
      val got = expr.eval(null).asInstanceOf[Long]
      val ref = s.foldLeft(BigInt(0)) { (acc, c) =>
        (acc * 31 + c.toInt) % BigInt(1000000007L)
      }
      got == ref.toLong
    }
  }
}

package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The reference's request-rejection matrix, asserted case by case:
  * POST /data (data.py:39-68, exercised by scripts/test_all.sh steps
  * 3.2-3.3) and GET /data parameter validation (data.py:89-102).
  * [[Serve.postData]] / [[Serve.range]] are the engine-side twins of the
  * Flask envelope — Left == `{"success": false}`.
  */
class ServeEnvelopeSpec extends AnyFunSuite {

  private val ValidBody =
    """1649941817 Voltage 1.34
      |1649941818 Voltage 1.35
      |1649941817 Current 12.0
      |1649941818 Current 14.0""".stripMargin

  test("valid text/plain batch is accepted with all lines kept (test_all.sh 3.2)") {
    val got = Serve.postData(Some("text/plain"), Some(ValidBody))
    assert(got == Right(ValidBody.linesIterator.toSeq))
  }

  test("charset-qualified content type is accepted (startswith check, data.py:42)") {
    assert(Serve.postData(Some("text/plain; charset=utf-8"), Some(ValidBody)).isRight)
  }

  test("missing or non-text/plain content type is rejected (data.py:42-44)") {
    assert(Serve.postData(None, Some(ValidBody)).isLeft)
    assert(Serve.postData(Some("application/json"), Some(ValidBody)).isLeft)
    assert(Serve.postData(Some("text/html"), Some(ValidBody)).isLeft)
  }

  test("missing, empty, or whitespace-only body is rejected (data.py:46-48)") {
    assert(Serve.postData(Some("text/plain"), None).isLeft)
    assert(Serve.postData(Some("text/plain"), Some("")).isLeft)
    assert(Serve.postData(Some("text/plain"), Some("  \n\t\n ")).isLeft)
  }

  test("one bad line rejects the whole batch — all-or-nothing (test_all.sh 3.3)") {
    // the exact payload test_all.sh posts: second line has value/name swapped
    val got = Serve.postData(
      Some("text/plain"),
      Some("1649941817 Voltage 1.34\n1649941818 1.35 Voltage"))
    assert(got.isLeft, "nothing is appended when any line fails to parse")
  }

  test("per-line reject causes mirror parse_line (data.py:70-87)") {
    def rejected(line: String) =
      Serve.postData(Some("text/plain"), Some(line)).isLeft
    assert(rejected("1649941817 Voltage"), "2 tokens")
    assert(rejected("1649941817 Voltage 1.34 extra"), "4 tokens")
    assert(rejected("-5 Voltage 1.34"), "negative timestamp")
    assert(rejected("notanum Voltage 1.34"), "non-integer timestamp")
    assert(rejected("1649941817 9Volt 1.34"), "name must start alphabetic")
    assert(rejected("1649941817 Voltage abc"), "non-numeric value")
  }

  test("blank interior lines are skipped, not rejected, and not appended (readings.py:14-16)") {
    val got = Serve.postData(
      Some("text/plain"),
      Some("1649941817 Voltage 1.34\n\n   \n1649941817 Current 12.0\n"))
    assert(got == Right(Seq("1649941817 Voltage 1.34", "1649941817 Current 12.0")))
  }

  test("lines are stripped before append, exactly as save_to_bronze stores them") {
    val got = Serve.postData(Some("text/plain"), Some("  1649941817 Voltage 1.34  "))
    assert(got == Right(Seq("1649941817 Voltage 1.34")))
  }

  test("GET /data rejects missing params and unparseable dates (data.py:92-102)") {
    // Left is decided before either frame is touched — null stands in for
    // the layers exactly because the reference rejects before querying
    assert(Serve.range(null, null, None, Some("2022-04-14")).isLeft)
    assert(Serve.range(null, null, Some("2022-04-14"), None).isLeft)
    assert(Serve.range(null, null, Some("not-a-date"), Some("2022-04-14")).isLeft)
    assert(Serve.range(null, null, Some("2022-04-14"), Some("14/04/2022")).isLeft)
  }
}

package graft.parse

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Models.ParsedReading

/** Port of the reference's pure-function unit tests:
  * tests/unit/test_parsing.py (28 cases over parse_line),
  * tests/unit/test_validation.py (date parse + timestamp format).
  */
class LineParserSpec extends AnyFunSuite {
  import LineParser._

  // --- valid lines (test_parsing.py:10-52) ---
  test("parses the four canonical valid lines") {
    assert(parseLine("1649941817 Voltage 1.34").contains(ParsedReading(1649941817L, "Voltage", 1.34)))
    assert(parseLine("1649941818 Voltage 1.35").contains(ParsedReading(1649941818L, "Voltage", 1.35)))
    assert(parseLine("1649941817 Current 12.0").contains(ParsedReading(1649941817L, "Current", 12.0)))
    assert(parseLine("1649941818 Current 14.0").contains(ParsedReading(1649941818L, "Current", 14.0)))
  }

  test("valid edge cases: int value, negative value, zero ts, large ts, underscore name, single-char name, surrounding whitespace") {
    assert(parseLine("1649941817 Voltage 5").contains(ParsedReading(1649941817L, "Voltage", 5.0)))
    assert(parseLine("1649941817 Voltage -10.5").contains(ParsedReading(1649941817L, "Voltage", -10.5)))
    assert(parseLine("0 Voltage 1.0").contains(ParsedReading(0L, "Voltage", 1.0)))
    assert(parseLine("9999999999 Voltage 1.0").contains(ParsedReading(9999999999L, "Voltage", 1.0)))
    assert(parseLine("1649941817 Voltage_RMS 1.0").contains(ParsedReading(1649941817L, "Voltage_RMS", 1.0)))
    assert(parseLine("1649941817 V 1.0").contains(ParsedReading(1649941817L, "V", 1.0)))
    assert(parseLine("  1649941817 Voltage 1.34  ").contains(ParsedReading(1649941817L, "Voltage", 1.34)))
  }

  // --- invalid lines (test_parsing.py:54-99, conftest.py:21-34) ---
  test("rejects the invalid-line catalog") {
    val invalid = Seq(
      "", "   ",
      "1649941817 Voltage", // missing value
      "1649941817", // missing name+value
      "Voltage 1.34", // missing ts
      "1649941817 Voltage 1.34 extra", // 4 tokens
      "-123 Voltage 1.34", // negative ts
      "1649941817.5 Voltage 1.34", // non-integer ts
      "notanumber Voltage 1.34", // non-numeric ts
      "1649941817 123Voltage 1.34", // digit-leading name
      "1649941817 _Voltage 1.34", // underscore-leading name
      "1649941817 Voltage abc") // non-numeric value
    invalid.foreach(l => assert(parseLine(l).isEmpty, s"should reject: '$l'"))
  }

  // --- API-edge vs silver divergence (SURVEY §7.3) ---
  test("python-style parse accepts what silver SQL semantics reject") {
    // float() accepts these; the silver regexes drop them
    assert(parseLine("1649941817 Voltage 1e5").contains(ParsedReading(1649941817L, "Voltage", 100000.0)))
    assert(parseLine("1649941817 Voltage .5").contains(ParsedReading(1649941817L, "Voltage", 0.5)))
    assert(parseLine("1649941817 Voltage inf").exists(_.value.isPosInfinity))
    assert(!validStrict("1649941817", "Voltage", "1e5"))
    assert(!validStrict("1649941817", "Voltage", ".5"))
    assert(!validStrict("1649941817", "Voltage", "inf"))
    assert(!validStrict("+5", "Voltage", "1.0"))
    assert(validStrict("1649941817", "Voltage", "-10.5"))
    assert(validStrict("1649941817", "Voltage", "5."))
  }

  // --- multi-format date parse (test_validation.py:12-77) ---
  test("parses all five reference timestamp formats, UTC-attached") {
    val expected = Instant.parse("2022-04-14T13:10:17Z")
    assert(parseIsoDate("2022-04-14T13:10:17.000Z").contains(expected))
    assert(parseIsoDate("2022-04-14T13:10:17Z").contains(expected))
    assert(parseIsoDate("2022-04-14T13:10:17.000").contains(expected))
    assert(parseIsoDate("2022-04-14T13:10:17").contains(expected))
    assert(parseIsoDate("2022-04-14").contains(Instant.parse("2022-04-14T00:00:00Z")))
    // Python %f accepts 1-6 fractional digits, not just 3
    assert(parseIsoDate("2022-04-14T13:10:17.123456Z")
      .contains(Instant.parse("2022-04-14T13:10:17.123456Z")))
    assert(parseIsoDate("2022-04-14T13:10:17.5Z")
      .contains(Instant.parse("2022-04-14T13:10:17.500Z")))
  }

  test("rejects malformed dates") {
    Seq("14-04-2022", "2022-13-45", "1649941817", "not a date", "",
      // impossible calendar dates: the SMART resolver would clamp these
      // (2024-02-31 -> Feb 29); Python strptime — and so the reference —
      // rejects them, hence STRICT resolution
      "2024-02-31", "2024-04-31", "2023-02-29").foreach { s =>
      assert(parseIsoDate(s).isEmpty, s"should reject: '$s'")
    }
  }

  // --- formatter golden strings (test_validation.py:80-104) ---
  test("formats ms-truncated ISO-8601 Z") {
    assert(formatTimestampMillis(Instant.parse("2022-04-14T13:10:17Z")) == "2022-04-14T13:10:17.000Z")
    assert(formatTimestampMillis(Instant.parse("2022-04-14T13:10:17.123456Z")) == "2022-04-14T13:10:17.123Z")
  }

  // --- range normalization (data.py:104-108) ---
  test("date-only `to` is inclusive (+1 day); datetime `to` is truncated") {
    val r1 = normalizeRange("2022-04-14", "2022-04-15")
    assert(r1.exists { case (f, t) => f.toString == "2022-04-14" && t.toString == "2022-04-16" })
    val r2 = normalizeRange("2022-04-14T05:00:00Z", "2022-04-15T13:10:17Z")
    assert(r2.exists { case (f, t) => f.toString == "2022-04-14" && t.toString == "2022-04-15" })
  }
}

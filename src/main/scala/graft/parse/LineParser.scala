package graft.parse

import java.time.{Instant, LocalDate, OffsetDateTime, ZoneOffset, ZonedDateTime}
import java.time.format.DateTimeFormatter

import graft.model.Models.ParsedReading

/** Pure line/date parse + format functions — the reference's API-edge
  * "UDF" surface, kept as plain Scala so it is unit-testable exactly like
  * the reference's pytest suite.
  *
  * Reference: parse_line src/api/routes/data.py:71-87, parse_iso_date
  * data.py:129-147, format_timestamp data.py:150-153.
  *
  * The SQL-side (columnar) twins of these functions live in
  * [[graft.ops.SensorQueries]] as Catalyst expressions (split/rlike/casts)
  * so the hot path stays inside whole-stage codegen; these driver-side
  * versions are only used at the API edge and in tests.
  */
object LineParser {

  /** Parse one `"{unix_ts} {metric} {value}"` line; None on any failure
    * (reference data.py:71-87). Python semantics: split on whitespace,
    * exactly 3 tokens, int ts >= 0, name starts alphabetic, float value.
    */
  def parseLine(line: String): Option[ParsedReading] = {
    val tokens = line.trim.split("\\s+").filter(_.nonEmpty)
    if (tokens.length != 3) return None
    val Array(tsStr, name, valueStr) = tokens
    for {
      ts <- tsStr.toLongOption.filter(_ >= 0)
      _ <- Option.when(name.nonEmpty && name.head.isLetter)(())
      v <- parseDouble(valueStr)
    } yield ParsedReading(ts, name, v)
  }

  /** Python float() accepts inf/nan/1e5/.5; reference relies on float()
    * (data.py:84). We mirror that at the API edge; the silver layer applies
    * the stricter SQL regex (see SURVEY §7.3 divergence note).
    */
  private def parseDouble(s: String): Option[Double] =
    try {
      val t = s.trim
      if (t.isEmpty) None
      else
        t.toLowerCase match {
          case "inf" | "+inf" | "infinity" | "+infinity" => Some(Double.PositiveInfinity)
          case "-inf" | "-infinity" => Some(Double.NegativeInfinity)
          case "nan" | "+nan" | "-nan" => Some(Double.NaN)
          // Java's toDouble additionally accepts f/d suffixes and hex
          // floats ('1.5f', '0x1.8p1') that Python float() rejects
          case v if v.exists(c => "fdx".indexOf(c) >= 0) => None
          // PEP 515: Python float() accepts underscores BETWEEN digits
          // ('1_000.5'); Java's toDouble rejects them
          case v if v.contains('_') =>
            if (v.matches("[+-]?\\d(_?\\d)*(\\.(\\d(_?\\d)*)?)?([eE][+-]?\\d(_?\\d)*)?") ||
              v.matches("[+-]?\\.\\d(_?\\d)*([eE][+-]?\\d(_?\\d)*)?"))
              Some(v.replace("_", "").toDouble)
            else None
          case _ => Some(t.toDouble)
        }
    } catch { case _: NumberFormatException => None }

  /** Strict silver-side validation (SQL regex semantics,
    * dbt/models/staging/stg_readings.sql:66-72): ts `^\d+$`,
    * name `^[A-Za-z]`, value `^-?\d+\.?\d*$`.
    */
  val TsRe = "^\\d+$".r
  val NameRe = "^[A-Za-z]".r
  val ValueRe = "^-?\\d+\\.?\\d*$".r

  def validStrict(tsStr: String, name: String, valueStr: String): Boolean =
    TsRe.matches(tsStr) && NameRe.findPrefixOf(name).isDefined && ValueRe.matches(valueStr)

  // Python strptime's %f accepts 1-6 fractional digits (data.py:131-133)
  // — a fixed 'SSS' pattern would reject '.5' and '.123456'; build the
  // fractional formats with a variable-width fraction instead. STRICT
  // resolution throughout ('uuuu'): the default SMART resolver silently
  // clamps impossible dates (2024-02-31 → Feb 29) that Python's strptime
  // — and therefore the reference API — rejects.
  private def strict(pattern: String): DateTimeFormatter =
    DateTimeFormatter.ofPattern(pattern)
      .withResolverStyle(java.time.format.ResolverStyle.STRICT)

  private def fractionalFmt(suffixZ: Boolean): DateTimeFormatter = {
    val b = new java.time.format.DateTimeFormatterBuilder()
      .appendPattern("uuuu-MM-dd'T'HH:mm:ss")
      .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 1, 6, true)
    (if (suffixZ) b.appendLiteral('Z') else b)
      .toFormatter.withResolverStyle(java.time.format.ResolverStyle.STRICT)
  }

  private val isoFormats: Seq[DateTimeFormatter] = Seq(
    // reference order (data.py:133-140): fractional+Z, Z, fractional, bare, date-only
    fractionalFmt(suffixZ = true),
    strict("uuuu-MM-dd'T'HH:mm:ss'Z'"),
    fractionalFmt(suffixZ = false),
    strict("uuuu-MM-dd'T'HH:mm:ss"),
    strict("uuuu-MM-dd"))

  /** Multi-format ISO-8601 parse, UTC-attached; None if nothing matches
    * (reference data.py:129-147).
    */
  def parseIsoDate(s: String): Option[Instant] = {
    val t = s.trim
    isoFormats.view.zipWithIndex.flatMap { case (f, i) =>
      try {
        if (i == 4) Some(LocalDate.parse(t, f).atStartOfDay(ZoneOffset.UTC).toInstant)
        else Some(java.time.LocalDateTime.parse(t, f).toInstant(ZoneOffset.UTC))
      } catch { case _: java.time.format.DateTimeParseException => None }
    }.headOption
  }

  private val isoMillisFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").withZone(ZoneOffset.UTC)

  /** ms-truncated ISO-8601 Zulu formatter (reference data.py:150-153). */
  def formatTimestampMillis(i: Instant): String = isoMillisFmt.format(i)

  /** GET /data range normalization (reference data.py:89-108): both bounds
    * truncated to midnight UTC; a date-only `to` (no 'T') is inclusive →
    * +1 day; resulting range is half-open [fromDay, toBound).
    */
  def normalizeRange(fromStr: String, toStr: String): Option[(LocalDate, LocalDate)] =
    for {
      from <- parseIsoDate(fromStr)
      to <- parseIsoDate(toStr)
    } yield {
      val fromDay = from.atZone(ZoneOffset.UTC).toLocalDate
      val toDay = to.atZone(ZoneOffset.UTC).toLocalDate
      val toBound = if (!toStr.contains("T")) toDay.plusDays(1) else toDay
      (fromDay, toBound)
    }
}

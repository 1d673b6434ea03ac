package graft.pipeline

import org.apache.spark.sql.DataFrame

import graft.parse.LineParser

/** The GET /data entry point (reference src/api/routes/data.py:89-126 +
  * src/db/repositories/readings.py:25-49) as a library facade: parse and
  * normalize the range parameters exactly like the reference (multi-format
  * ISO parse, truncate-to-midnight, date-only `to` inclusive), run the
  * serve plan, format the response rows.
  *
  * Error paths return Left(message) — the engine-side twin of the
  * reference's `{"success": false}` responses (data.py:92-102).
  */
object Serve {

  def range(
      silver: DataFrame,
      gold: DataFrame,
      fromStr: Option[String],
      toStr: Option[String]): Either[String, DataFrame] =
    (fromStr, toStr) match {
      case (None, _) | (_, None) =>
        Left("Missing required parameters: from, to") // data.py:92-96
      case (Some(f), Some(t)) =>
        LineParser.normalizeRange(f, t) match {
          case None => Left(s"Invalid date format") // data.py:98-102
          case Some((fromDay, toBound)) =>
            Right(
              SensorPipeline.formatResponse(
                SensorPipeline.serve(silver, gold, fromDay.toString, toBound.toString)))
        }
    }
}

package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bronze → Silver → Gold → Serve transforms — the reference's two dbt
  * models and the serve query, re-expressed as composable
  * `DataFrame => DataFrame` plan fragments.
  *
  * All transforms are pure plan builders (no actions) so Catalyst can push
  * filters/prune columns across the whole pipeline, and so the identical
  * logic serves batch, incremental (see [[Incremental]]) and streaming
  * (see [[graft.streaming.StreamingPipeline]]) execution.
  *
  * Reference semantics: dbt/models/staging/stg_readings.sql (silver),
  * dbt/models/marts/mart_daily_power.sql (gold),
  * src/db/repositories/readings.py:25-49 (serve).
  */
object SensorPipeline {

  /** Columnar twin of the SQL line parse+validate
    * (stg_readings.sql:48-99): whitespace tokenize via SPLIT_PART
    * equivalents, blank filter, the three validation regexes, casts,
    * epoch→timestamp, date extraction.
    *
    * Stays entirely inside whole-stage codegen: split/element_at/rlike/
    * cast are all codegen'd Catalyst expressions — no UDFs.
    */
  def bronzeToSilver(bronze: DataFrame, processedAt: Column = current_timestamp()): DataFrame = {
    // EXACT stg_readings.sql semantics (the layer of record, SURVEY
    // §7.3): SPLIT_PART on a single space — no trim, no token-count
    // check. Extra trailing tokens are ignored (fields 1-3 decide);
    // a doubled space yields an empty field that fails its regex. The
    // stricter Python rules (exactly 3 tokens, \s+ split) live at the
    // API edge in LineParser.parseLine, as in the reference.
    val toks = split(col("raw_line"), " ")
    // try_element_at ≡ SPLIT_PART's missing-field behavior (returns null
    // here, '' in SQL — both fail the validation regexes identically).
    def tok(i: Int) = coalesce(try_element_at(toks, lit(i)), lit(""))
    bronze
      // P2: blank/null filter (stg_readings.sql:52-54)
      .filter(col("raw_line").isNotNull && length(trim(col("raw_line"))) > 0)
      .select(
        col("id").as("raw_id"),
        tok(1).as("timestamp_str"),
        tok(2).as("metric_name"),
        tok(3).as("value_str"),
        col("ingested_at"))
      // P3: validation regexes (stg_readings.sql:57-74). The extra bound
      // is ours: a long-enough digit string passes ^\d+$ but overflows
      // the timestamp — TimestampType is MICROSECOND-backed, so
      // timestamp_seconds throws past Long.MaxValue/1e6 ≈ 9.22e12 s
      // (≈ year 294,247; an 18-digit value fits a Long but not ×1e6).
      // try_cast + numeric bound (not a string-length check, which would
      // also reject numerically-small values written with leading zeros
      // that Postgres's ::bigint accepts). Postgres would abort the whole
      // dbt run on overflow; we drop the row instead of killing the job
      // (documented divergence).
      .filter(
        col("timestamp_str").rlike("^\\d+$") &&
          expr("try_cast(timestamp_str AS BIGINT)").isNotNull &&
          expr("try_cast(timestamp_str AS BIGINT)") <= lit(Long.MaxValue / 1000000L) &&
          col("metric_name").rlike("^[A-Za-z]") &&
          col("value_str").rlike("^-?\\d+\\.?\\d*$"))
      // P5-P7: casts, epoch→ts, date (stg_readings.sql:84-93)
      .select(
        col("raw_id"),
        timestamp_seconds(col("timestamp_str").cast(LongType)).as("reading_time"),
        col("metric_name"),
        col("value_str").cast(DoubleType).as("metric_value"),
        to_date(timestamp_seconds(col("timestamp_str").cast(LongType))).as("reading_date"),
        processedAt.as("processed_at"))
  }

  /** Gold daily Power mart (mart_daily_power.sql:30-87): filter to the two
    * input metrics, pivot via conditional aggregation (join-elimination —
    * ONE shuffle on reading_date instead of two aggregates + a join),
    * require both metrics present, project Power = avg(V) * avg(I).
    */
  def silverToGold(silver: DataFrame, calculatedAt: Column = current_timestamp()): DataFrame =
    silver
      .filter(col("metric_name").isin("Voltage", "Current")) // F2 (mart:34)
      .groupBy(col("reading_date"))
      .agg(
        // A1/P11: AVG over CASE WHEN, null-skipping (mart:49-56)
        avg(when(col("metric_name") === "Voltage", col("metric_value"))).as("avg_voltage"),
        avg(when(col("metric_name") === "Current", col("metric_value"))).as("avg_current"))
      // F5: both-sides-present guard (mart:65-68)
      .filter(col("avg_voltage").isNotNull && col("avg_current").isNotNull)
      .select(
        lit("Power").as("metric_name"), // P9 (mart:73)
        (col("avg_voltage") * col("avg_current")).as("metric_value"), // P10 (mart:63)
        col("reading_date"),
        // P12: date → midnight-UTC timestamp (mart:82)
        col("reading_date").cast(TimestampType).as("reading_time"),
        calculatedAt.as("calculated_at"))

  /** Serve query (readings.py:25-49): identical half-open date-range
    * predicate on both layers, 3-column projection, UNION ALL, total order
    * by (reading_time, metric_name). Partition pruning on reading_date
    * replaces the reference's btree indexes.
    */
  def serve(silver: DataFrame, gold: DataFrame, fromDate: String, toDate: String): DataFrame = {
    def branch(df: DataFrame): DataFrame =
      df.filter(col("reading_date") >= lit(fromDate) && col("reading_date") < lit(toDate)) // F1
        .select(col("reading_time"), col("metric_name"), col("metric_value"))
    branch(silver)
      .unionByName(branch(gold)) // O1
      .orderBy(col("reading_time"), col("metric_name")) // O2
  }

  /** JSON-response projection (data.py:110-126 + format_timestamp
    * data.py:150-153): ms-truncated ISO-8601 Z strings.
    */
  def formatResponse(served: DataFrame): DataFrame =
    served.select(
      date_format(col("reading_time"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("time"), // P15
      col("metric_name").as("name"),
      col("metric_value").as("value"))
}

/** dbt-style merge/upsert (incremental_strategy='merge' on unique_key;
  * stg_readings.sql:15-17, mart_daily_power.sql:17-19) without a
  * Delta/Iceberg jar: (target ANTI source-keys) ∪ source, with an explicit
  * deterministic within-batch tie-break the reference leaves to Postgres
  * MERGE (SURVEY §4.3).
  */
object Merge {

  /** Deduplicate `updates` to one row per key: highest orderCol wins
    * (last-writer-wins by ingest time, id as tie-break).
    */
  def dedupeLatest(updates: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    updates
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Logical merge: rows of `target` whose key has no update, plus the
    * deduped updates. Caller writes the result (see [[Incremental]] for the
    * partition-overwrite variant used at scale).
    */
  def merge(target: DataFrame, updates: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val deduped = dedupeLatest(updates, keys, order)
    target.join(deduped.select(keys.map(col): _*), keys, "left_anti").unionByName(deduped)
  }
}

/** Incremental runner — the reference's two hand-rolled "optimizer rules"
  * (SURVEY §4.1): processing-time watermark pruning of Bronze
  * (stg_readings.sql:32-38) and affected-day reselect for Gold
  * (mart_daily_power.sql:36-46). Both are application-level in the
  * reference and stay application-level here; the physical win at scale is
  * that silver/gold are written partitioned by reading_date, so the
  * affected-day recompute + dynamic partition overwrite touches only the
  * changed partitions.
  */
object Incremental {
  import SensorPipeline._

  val epoch0 = new Timestamp(0L)

  /** Scalar watermark: COALESCE(MAX(processed_at), epoch) over the target
    * (stg_readings.sql:35; mart_daily_power.sql:42). A driver-side scalar
    * (one tiny agg job) — identical shape to the reference's scalar
    * subquery.
    */
  def watermark(target: Option[DataFrame], tsCol: String): Timestamp =
    target match {
      case None => epoch0
      case Some(df) =>
        Option(df.agg(max(col(tsCol))).head().getTimestamp(0)).getOrElse(epoch0)
    }

  /** One Silver increment: bronze rows newer than the watermark, parsed,
    * merged into target on raw_id.
    */
  def silverIncrement(
      bronze: DataFrame,
      silverTarget: Option[DataFrame],
      processedAt: Column = current_timestamp()): DataFrame = {
    val wm = watermark(silverTarget, "processed_at")
    val fresh = bronzeToSilver(bronze.filter(col("ingested_at") > lit(wm)), processedAt) // F3
    silverTarget match {
      case None => fresh
      case Some(t) =>
        Merge.merge(t, fresh, Seq("raw_id"), Seq(col("processed_at").desc, col("reading_time").desc))
    }
  }

  /** The recomputed affected-day Gold rows only — the FULL new content
    * of every day that received new silver since the target's watermark.
    * This is the partition-granular unit both merge styles consume:
    * [[goldIncrement]] anti-join-merges it into a flat table, and the
    * TxTable path publishes it as an atomic partition commit (gold's
    * unique_key = reading_date IS its partition key).
    */
  def goldAffectedDays(
      silver: DataFrame,
      goldTarget: Option[DataFrame],
      calculatedAt: Column = current_timestamp()): DataFrame = {
    val wm = watermark(goldTarget, "calculated_at")
    val affectedDays =
      silver.filter(col("processed_at") > lit(wm)).select("reading_date").distinct()
    // Semi join (Catalyst rewrites the reference's IN-subquery to exactly
    // this); at scale this prunes silver partitions dynamically. The day
    // side is bounded by the calendar, so BROADCAST it — without the hint
    // the semi join would hash-exchange the full silver table on
    // reading_date just to drop most of it.
    val affected = silver.join(broadcast(affectedDays), Seq("reading_date"), "left_semi")
    silverToGold(affected, calculatedAt)
  }

  /** One Gold increment: recompute whole days that received new silver
    * rows (semi-join reselect, F4/J1) and merge on reading_date.
    */
  def goldIncrement(
      silver: DataFrame,
      goldTarget: Option[DataFrame],
      calculatedAt: Column = current_timestamp()): DataFrame = {
    val fresh = goldAffectedDays(silver, goldTarget, calculatedAt)
    goldTarget match {
      case None => fresh
      case Some(t) => Merge.merge(t, fresh, Seq("reading_date"), Seq(col("calculated_at").desc))
    }
  }
}

/** Data-quality assertion operators — the dbt yml test surface
  * (_staging.yml:13-46, _marts.yml:15-48) as a tiny ADT evaluated in ONE
  * pass over the table via conditional-sum aggregation (SURVEY §2.8), not
  * one scan per rule.
  */
object Quality {
  /** dbt severity semantics (_marts.yml:32-37): `error` fails the
    * pipeline, `warn` is reported but non-fatal.
    */
  sealed trait Severity
  case object Error extends Severity
  case object Warn extends Severity

  sealed trait Check {
    def name: String; def violation: Column
    def severity: Severity = Error
  }
  final case class NotNull(column: String) extends Check {
    val name = s"not_null_$column"
    val violation: Column = col(column).isNull
  }
  final case class AcceptedValues(column: String, values: Seq[String]) extends Check {
    val name = s"accepted_values_$column"
    val violation: Column = !col(column).isin(values: _*) || col(column).isNull
  }
  final case class ExpressionIsTrue(
      name: String, expr: Column, override val severity: Severity = Error) extends Check {
    val violation: Column = !expr
  }
  // `unique` needs a grouped pass; evaluated separately below.
  final case class Unique(column: String) extends Check {
    val name = s"unique_$column"
    val violation: Column = lit(false)
  }

  final case class QualityFailure(failing: Seq[(String, Long)])
    extends RuntimeException(
      s"quality checks failed: ${failing.map { case (n, v) => s"$n=$v" }.mkString(", ")}")

  /** The in-pipeline gate (DbtTestOperator analog,
    * sensor_data_pipeline.py:93-96): throws on error-level violations,
    * returns warn-level ones.
    */
  def assertAll(df: DataFrame, checks: Seq[Check]): Seq[(String, Long)] = {
    val bySeverity = checks.map(c => c.name -> c.severity).toMap
    val violations = run(df, checks).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .filter(_._2 > 0)
    val (errors, warns) = violations.partition { case (n, _) =>
      bySeverity.getOrElse(n, Error) == Error
    }
    if (errors.nonEmpty) throw QualityFailure(errors.toSeq)
    warns.toSeq
  }

  /** One row: (check_name, violations). All scalar checks fold into a
    * single aggregate (single scan); each unique check adds one grouped
    * aggregate over just its key column.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val (uniques, scalars) = checks.partition(_.isInstanceOf[Unique])
    // coalesce: sum over ZERO rows is NULL — an empty table must report
    // 0 violations (dbt tests pass on empty models), not NPE downstream
    val scalarAggs = scalars.map(c =>
      coalesce(sum(when(c.violation, 1L).otherwise(0L)), lit(0L)).as(c.name))
    val base =
      if (scalarAggs.nonEmpty) {
        val row = df.agg(scalarAggs.head, scalarAggs.tail: _*)
        // unpivot to (check_name, violations); names are user-supplied,
        // so backtick-quote the identifier and escape quotes in the
        // literal — an unquoted name with a space/quote would otherwise
        // fail to parse (or break out of the string)
        val exprs = scalars.map { c =>
          val lit = c.name.replace("'", "\\'")
          val ident = c.name.replace("`", "``")
          s"'$lit', `$ident`"
        }.mkString(", ")
        row.selectExpr(s"stack(${scalars.size}, $exprs) as (check_name, violations)")
      } else df.sparkSession.emptyDataFrame
        .selectExpr("'' as check_name", "0L as violations").limit(0)
    uniques.foldLeft(base) { (acc, u) =>
      val c = u.asInstanceOf[Unique].column
      val dup = df.groupBy(col(c)).count().filter(col("count") > 1)
        .agg(coalesce(sum(col("count")), lit(0L)).as("violations"))
        .select(lit(s"unique_$c").as("check_name"), col("violations"))
      acc.unionByName(dup)
    }
  }

  /** The reference's full declared test surface for silver + gold. */
  def silverChecks: Seq[Check] =
    Seq("raw_id", "reading_time", "metric_name", "metric_value", "reading_date", "processed_at")
      .map(NotNull.apply) ++
      Seq(AcceptedValues("metric_name", Seq("Voltage", "Current")), Unique("raw_id"))

  def goldChecks: Seq[Check] =
    Seq("metric_name", "metric_value", "reading_date", "reading_time", "calculated_at")
      .map(NotNull.apply) ++
      Seq(
        AcceptedValues("metric_name", Seq("Power")),
        // severity warn in the reference (_marts.yml:32-37)
        ExpressionIsTrue("power_non_negative", col("metric_value") >= 0, Warn),
        Unique("reading_date"))
}

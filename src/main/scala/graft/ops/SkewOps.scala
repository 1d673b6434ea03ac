package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-resistant per-key rank selection (SURVEY §2.6 hardening).
  *
  * A plain `Window.partitionBy(key)` funnels EVERY row of a hot key
  * through one task — the window analog of the skewed-join problem
  * `saltedJoin` solves (TextOps2). Two shapes fix it:
  *
  *   - [[topKPerKeySalted]]: the q_join_salted pattern applied to
  *     windows. Phase 1 ranks within (key, salt) — the hot key's rows
  *     split across `salts` parallel tasks — and keeps each bucket's
  *     top-k; phase 2 re-ranks the <= salts*k survivors per key, a
  *     bounded set regardless of how hot the key is. Correct for any k
  *     under a total (tie-broken) ordering: a row in the global top-k is
  *     in its bucket's top-k, so phase 1 never discards a winner.
  *   - [[argMinPerKey]]/[[argMaxPerKey]]: for k=1, rank-then-filter is
  *     just an argmin/argmax — `min_by`/`max_by` aggregation gets
  *     map-side partial combine for free, so the hot key arrives at the
  *     reducer already reduced to one row per map partition. Cleaner
  *     plan (one shuffle, no sort) and the preferred form wherever the
  *     semantics allow.
  *
  * Both are registered as oracle queries whose DuckDB SQL is the PLAIN
  * row_number formulation — identical results prove the skew rewrites
  * are semantics-free, exactly like q_join_salted vs its plain join.
  */
object SkewOps {

  private val IsoMs = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

  /** Columns of `df` that xxhash64 accepts — MapType (even nested inside
    * arrays/structs) is unhashable and fails analysis, so salting must
    * hash a stable subset rather than the whole row.
    */
  def hashableCols(df: DataFrame): Seq[Column] = {
    import org.apache.spark.sql.types._
    def ok(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case ArrayType(e, _) => ok(e)
      case StructType(fs) => fs.forall(f => ok(f.dataType))
      case _ => true
    }
    df.schema.fields.filter(f => ok(f.dataType)).map(f => col(f.name)).toSeq
  }

  /** Deterministic row salt in [0, salts) from the hashable columns;
    * falls back to a partition-id-based spread when nothing is hashable.
    */
  def rowSalt(df: DataFrame, salts: Int): Column = {
    val cols = hashableCols(df)
    if (cols.nonEmpty) pmod(xxhash64(cols: _*), lit(salts.toLong))
    else pmod(spark_partition_id().cast("long"), lit(salts.toLong))
  }

  /** A helper-column name guaranteed absent from `df` — `withColumn`
    * silently REPLACES a same-named input column, which would corrupt
    * results and drop the user's column from the output. Shared with
    * every helper that adds-then-drops a working column
    * (TableLayout.zOrderWrite).
    */
  private[graft] def freshName(df: DataFrame, base: String): String = {
    val have = df.columns.toSet
    if (!have(base)) base
    else Iterator.from(1).map(i => s"$base~$i").find(n => !have(n)).get
  }

  /** Per-key top-k via salted two-phase windows. `order` must be a total
    * order (include a unique tie-break) or the survivor choice is
    * nondeterministic — same contract as the plain window it replaces.
    */
  def topKPerKeySalted(
      df: DataFrame,
      keys: Seq[Column],
      order: Seq[Column],
      k: Int,
      salts: Int): DataFrame = {
    // salt from the row hash (hashable columns only — maps would fail
    // analysis): spreads a hot key's rows evenly and deterministically,
    // no RNG in the plan
    val (cSalt, cRn1, cRn2) =
      (freshName(df, "_salt"), freshName(df, "_rn1"), freshName(df, "_rn2"))
    val salted = df.withColumn(cSalt, rowSalt(df, salts))
    val w1 = Window.partitionBy(keys :+ col(cSalt): _*).orderBy(order: _*)
    val w2 = Window.partitionBy(keys: _*).orderBy(order: _*)
    salted
      .withColumn(cRn1, row_number().over(w1))
      .filter(col(cRn1) <= k)
      .withColumn(cRn2, row_number().over(w2))
      .filter(col(cRn2) <= k)
      .drop(cSalt, cRn1, cRn2)
  }

  /** First row per key under `order` (min_by over an order struct): one
    * shuffle, hot keys pre-reduced map-side.
    */
  def argMinPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = freshName(df, "_w")
    df.groupBy(keys: _*)
      .agg(min_by(struct(df.columns.map(col): _*), struct(order: _*)).as(w))
      .select(col(s"$w.*"))
  }

  /** Last row per key under `order` (max_by). */
  def argMaxPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = freshName(df, "_w")
    df.groupBy(keys: _*)
      .agg(max_by(struct(df.columns.map(col): _*), struct(order: _*)).as(w))
      .select(col(s"$w.*"))
  }

  val all: Seq[QueryDef] = Seq(

    // W1 hardened: latest event per user through the salted two-phase
    // window. Oracle = the PLAIN row_number SQL (same as
    // q_window_rownum) — hash-equality proves the rewrite changes
    // nothing but the physical shape.
    QueryDef(
      "q_window_rownum_salted",
      """SELECT user_id, event_id, event_type,
        |  strftime(ts::TIMESTAMP, '%Y-%m-%dT%H:%M:%S.%gZ') AS time
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      topKPerKeySalted(
        Tables.events(s, d),
        keys = Seq(col("user_id")),
        order = Seq(col("ts").desc, col("event_id").desc),
        k = 1, salts = 8)
        .select(
          col("user_id"), col("event_id"), col("event_type"),
          date_format(col("ts"), IsoMs).as("time"))
        .orderBy("user_id")
    },

    // A5 hardened: first-writer-wins dedup as an argmin aggregation —
    // one shuffle, map-side combine absorbs the hot key. Oracle = the
    // plain q_dedup_firstwin SQL.
    QueryDef(
      "q_dedup_firstwin_agg",
      """SELECT user_id, event_type, event_id, value
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts::TIMESTAMP, event_id) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      argMinPerKey(
        Tables.events(s, d),
        keys = Seq(col("user_id"), col("event_type")),
        order = Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
        .orderBy("user_id", "event_type")
    })
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) clustering: multi-column data locality for write
  * layouts, so 2-D (or N-D) box predicates prune files/row groups by
  * parquet min/max statistics alone.
  *
  * Why this is a 100 TB feature and not a micro-optimization: a table
  * range-partitioned on ONE column answers 1-D range scans with O(box)
  * file reads but degrades to a full scan the moment the predicate
  * constrains a DIFFERENT column. Interleaving the bits of k columns
  * into one sort key bounds every k-D box scan at roughly
  * O(N^((k-1)/k)) of the files (the classic Morton-curve bound) — at a
  * 1000-executor scale that is the difference between reading ~3% and
  * reading 100% of 100 TB for a `tenant × day` box. The write-side cost
  * is ONE extra range exchange, amortized over every subsequent scan.
  *
  * Spark-first shape: the z-key is pure long arithmetic built from
  * `shiftright`/`bitwiseAND`/`shiftleft` — whole-stage codegen keeps it
  * inside the generated loop (no UDF); the layout is
  * `repartitionByRange(zkey)` + `sortWithinPartitions(zkey)`, i.e.
  * exactly the two primitives Spark already distributes well. The
  * kernel itself is oracle-certified (`q_zorder_key`); the locality
  * effect (file skipping) is measured at the parquet-footer level in
  * `ZOrderSpec`.
  */
object ZOrderOps {

  /** Bit-interleave the low `bits` bits of each column (non-negative
    * longs) into one z-key: bit i of column j lands at position
    * `i * ncols + j`. Total bits must fit a positive long.
    */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "interleave of zero columns")
    require(bits * cols.size <= 62, s"${bits}b x ${cols.size} cols overflows a long")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * cols.size + j)
    terms.reduce(_.bitwiseOR(_)).cast(LongType)
  }

  /** The same interleave as ANSI SQL text (for the DuckDB oracle):
    * generated from one term list so the two engines cannot drift.
    */
  def interleaveSql(exprs: Seq[String], bits: Int): String = {
    val terms = for {
      i <- 0 until bits
      (e, j) <- exprs.zipWithIndex
    } yield s"(((($e) >> $i) & 1) << ${i * exprs.size + j})"
    terms.mkString("(", " | ", ")")
  }

  /** Add a `_z` key column: each input column min/max-normalized to
    * [0, 2^bits) then interleaved. The per-column ranges come from ONE
    * aggregate pass broadcast back as a 1-row cross join — no driver
    * collect, no second scan of a cached frame.
    */
  def withZKey(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    val maxVal = (1L << bits) - 1
    val rangeAggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).cast("double").as(s"_mn$i"),
        max(col(c)).cast("double").as(s"_mx$i"))
    }
    val ranges = df.agg(rangeAggs.head, rangeAggs.tail: _*)
    val joined = df.crossJoin(broadcast(ranges))
    val normed = cols.zipWithIndex.map { case (c, i) =>
      val mn = col(s"_mn$i"); val mx = col(s"_mx$i")
      // constant column ⇒ zero contribution (guard the 0-width divide)
      when(mx === mn, lit(0L)).otherwise(
        floor((col(c).cast("double") - mn) / (mx - mn) * maxVal).cast(LongType))
    }
    joined
      .withColumn("_z", interleave(normed, bits))
      .drop((0 until cols.size).flatMap(i => Seq(s"_mn$i", s"_mx$i")): _*)
  }

  /** Z-order-clustered parquet write: range-partition on the z-key into
    * `numFiles` files, sort inside each, drop the key, write. Files end
    * up covering compact Morton-curve segments, so every clustered
    * column's min/max footer stats are tight.
    */
  def clusterWrite(
      df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 16, numFiles: Int = 64): Unit = {
    withZKey(df, cols, bits)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  // oracle surface: the kernel on raw low bits of two fact FKs — pure
  // integer math, so the DuckDB twin is bit-exact by construction
  private val zBits = 8
  private val zCols = Seq("l_partkey & 255", "l_suppkey & 255")

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q_zorder_key",
      s"""SELECT l_orderkey, l_linenumber,
         |  ${interleaveSql(zCols, zBits)} AS zkey
         |FROM lineitem
         |ORDER BY zkey, l_orderkey, l_linenumber LIMIT 500""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          interleave(
            Seq(col("l_partkey").bitwiseAND(lit(255L)),
              col("l_suppkey").bitwiseAND(lit(255L))),
            zBits).as("zkey"))
        .orderBy("zkey", "l_orderkey", "l_linenumber")
        .limit(500)
    })
}

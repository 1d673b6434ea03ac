package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing — the step between a curated corpus and a training
  * run: concatenate documents in a stable order and slice the token
  * stream into fixed-budget context windows. Every doc gets its global
  * token start offset, its window id (`start div budget`) and its
  * offset inside the window — exactly what a loader needs to pack
  * batches without re-tokenizing.
  *
  * The core is a DISTRIBUTED PREFIX SUM (the textbook two-phase scan):
  * range-partition by the order column, per-partition partial sums, a
  * driver-side cumulative offset table (numPartitions entries — O(1)
  * data per partition, broadcast back), then one partition-local window
  * pass. A naive `sum().over(Window.orderBy(...))` with no partition
  * clause would drag the whole table through ONE task — the classic
  * global-window scale trap this operator exists to avoid; here no
  * stage ever sees more than its own partition plus a numPartitions-row
  * table, so the shape survives 100 TB unchanged.
  */
object PackOps {

  /** `df` plus column `acc`: the exclusive prefix sum of `valueCol` in
    * `orderCol` order (the sum of all values STRICTLY before the row).
    * `orderCol` must be unique — it is the deterministic concatenation
    * order. Two jobs: one to size the partitions, one to scan them.
    */
  def exclusivePrefixSum(
      df: DataFrame, orderCol: String, valueCol: String, acc: String): DataFrame = {
    val pid = SkewOps.freshName(df, "pid")
    // The offsets job and the scan job both derive from this ONE plan:
    // RangePartitioner's bound sampling is seeded per partition index
    // (byteswap32), so identical lineage + identical input yields the
    // SAME split in both jobs — no cache pin needed to keep the pid
    // assignment consistent.
    val parted = df
      .repartitionByRange(col(orderCol))
      .withColumn(pid, spark_partition_id())
    val totals = parted.groupBy(col(pid)).agg(sum(col(valueCol)).as("t"))
        .collect().flatMap(r => Option(r.get(1)).map(t => r.getInt(0) -> t.asInstanceOf[Long]))
        .toMap
      val nParts = if (totals.isEmpty) 0 else totals.keys.max + 1
      val offsets = new Array[Long](nParts + 1)
      (0 until nParts).foreach { p =>
        offsets(p + 1) = offsets(p) + totals.getOrElse(p, 0L)
      }
      // per-partition base offsets ride back as a broadcast join with a
      // numPartitions-row table — never a numPartitions-deep expression
      val spark = df.sparkSession
      val base = SkewOps.freshName(parted, "base_off")
      import spark.implicits._
      val offDf = (0 until nParts).map(p => (p, offsets(p))).toDF(pid, base)
      val w = Window.partitionBy(col(pid)).orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      parted
        .join(broadcast(offDf), pid)
        .withColumn(acc, coalesce(sum(col(valueCol)).over(w), lit(0L)) + col(base))
        .drop(pid, base)
  }

  val all: Seq[QueryDef] = Seq(

    // Pack the corpus token stream into 256-token context windows in
    // doc_id order: global start offset (distributed prefix sum),
    // window id, offset within window.
    QueryDef(
      "q_seq_pack",
      """WITH t AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
        |  FROM t)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, start_off,
        |  start_off // 256 AS window_id, start_off % 256 AS off_in_window
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val budget = 256
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      exclusivePrefixSum(toks, "doc_id", "n_tokens", "start_off")
        .withColumn("window_id", expr(s"start_off div $budget"))
        .withColumn("off_in_window", col("start_off") % budget)
        .orderBy("doc_id")
    })
}

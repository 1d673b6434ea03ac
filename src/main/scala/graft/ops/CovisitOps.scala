package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Item-item co-visitation similarity — the collaborative-filtering
  * candidate generator: items are similar when the same users touch
  * both. The canonical "self-join on user" workload, and the canonical
  * SKEW trap: a power user with u distinct items contributes u² pairs,
  * so one crawler/bot account can dominate the whole shuffle. The
  * standard fix is a deterministic per-user item cap BEFORE the join
  * (the [[DedupOps]] maxBucket discipline): cap order is a per-(user,
  * item) HASH, not item order, so no item is systematically dropped
  * across users; the cap is mirrored in the oracle SQL, keeping the
  * whole skew-controlled pipeline under the hash check.
  *
  * Shape: distinct (user, item) one shuffle; cap via per-user
  * row_number (bounded groups); pair explode via self-join on user —
  * quadratic ONLY within a user's capped list (≤ cap²); final count is
  * a hash agg on (item_a, item_b). No all-pairs product over items.
  */
object CovisitOps {

  private val Cap = 32 // max items per user entering the pair join

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q_covisitation",
      s"""WITH ui AS (
         |  SELECT DISTINCT user_id, CAST(props->>'$$.k' AS BIGINT) AS item
         |  FROM events
         |  WHERE event_type = 'view' AND (props->>'$$.k') IS NOT NULL),
         |capped AS (
         |  SELECT user_id, item FROM (
         |    SELECT user_id, item, row_number() OVER (
         |      PARTITION BY user_id
         |      ORDER BY md5(CAST(user_id AS VARCHAR) || '#' || CAST(item AS VARCHAR)), item) AS rn
         |    FROM ui)
         |  WHERE rn <= $Cap)
         |SELECT a.item AS item_a, b.item AS item_b,
         |  CAST(count(*) AS BIGINT) AS users
         |FROM capped a JOIN capped b
         |  ON a.user_id = b.user_id AND a.item < b.item
         |GROUP BY 1, 2
         |HAVING count(*) >= 3
         |ORDER BY users DESC, item_a, item_b
         |LIMIT 100""".stripMargin) { (s, d) =>
      // null guard BEFORE the cap window: a props row without 'k' would
      // otherwise rank NULLS FIRST in Spark but NULLS LAST in DuckDB,
      // shifting which items survive the cap
      val ui = Tables.events(s, d)
        .filter(col("event_type") === "view")
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("item"))
        .filter(col("item").isNotNull)
        .distinct()
      val w = Window.partitionBy("user_id").orderBy(
        md5(concat(col("user_id").cast(StringType), lit("#"), col("item").cast(StringType))),
        col("item"))
      val capped = ui.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= Cap)
        .select("user_id", "item")
      val a = capped.select(col("user_id"), col("item").as("item_a"))
      val b = capped.select(col("user_id").as("u2"), col("item").as("item_b"))
      a.join(b, col("user_id") === col("u2") && col("item_a") < col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(count(lit(1)).as("users"))
        .filter(col("users") >= 3)
        .orderBy(col("users").desc, col("item_a"), col("item_b"))
        .limit(100)
    })
}

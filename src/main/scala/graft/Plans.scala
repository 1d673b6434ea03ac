package graft
import org.apache.spark.sql.SparkSession
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq(
        "q_scan_project", "q_agg_stats", "q_daily_power", "q_join_inner", "q_topk",
        "q_filter_range",
        // round 2: broadcast semi join (fact side never shuffles), salted
        // two-phase window, partial min_by dedup, broadcast contamination
        "q_incremental_semi", "q_window_rownum_salted", "q_dedup_firstwin_agg",
        "q_contamination",
        // round 3: bloom prefilter BEFORE the join, one-exchange window
        // battery, keyset page as TakeOrderedAndProject, shuffle-free
        // bigram pairing, EXISTS decorrelated to left-semi
        "q_bloom_join", "q_window_funcs", "q_serve_page", "q_bigram_mine",
        "q_exists_corr",
        // round-3 continuation: the custom AsOfJoinExec between its two
        // per-side exchanges+sorts, the bucketed distributed prefix sum
        // (no global window), the SpaceSaving/TopK typed aggregates as
        // partial ObjectHashAggregates, the one-pass repetition kernel
        "q_asof_native", "q_seq_pack", "q_heavy_hitters", "q_topk_per_key",
        "q_repetition_filter",
        // round 4: the interval-join batch twins (pushed type filters,
        // equi-join on user_id with the time range as join residual —
        // the same plan family the streaming state machine partitions)
        "q_interval_join", "q_interval_join_left",
        // round 5/6: ExactSubstr recurring-window counting as a true
        // map-side partial aggregate + streaming left-semi (the
        // WindowExec group-buffer form is gone), and the multi-table
        // random-hyperplane LSH oracle twin's constant-folded planes
        "q_substr_dedup", "q_ann_lsh_md5",
        // round 7: the scrub action (span stitch stays per-doc/map-shaped
        // after the dup-window semi-join) — the plan evidence the round-6
        // verdict asked for alongside the regenerated native-timestamp
        // events scans (pushed ts predicates visible in q_filter_range /
        // q_serve_page above)
        "q_substr_scrub",
        // round 7 TPC-H completion: Q21's EXISTS + NOT-EXISTS dual
        // self-join (semi + anti probes against the same lineitem
        // projection; broadcast at this SF, same-key SMJ with exchange
        // reuse once the fact outgrows the broadcast threshold) and
        // Q2's decorrelated scalar-min (one bridge×supplier join feeds
        // both the candidates and the per-part min)
        "q_tpch_q21", "q_tpch_q2",
        // round-7 graph/export additions: the degree-ordered triangle
        // wedge join (shipdate slice pushed to the lineitem scan, the
        // orientation filter below the self-joins) and the shard
        // manifest's bucketed prefix sum feeding an exchange-free
        // distinct-free single agg on the shard key. (q_pagerank has no
        // capturable plan: its result is an eager checkpoint scan — the
        // loop's per-round shape is documented in SCALE.md instead.)
        "q_triangle_count", "q_shard_manifest",
        // round-7 hybrid retrieval: both rank windows sit on bounded
        // ≤100-row frames (TakeOrderedAndProject feeds the lexical
        // window; the cosine leg partitions by q_id), idf broadcast,
        // full-outer fusion join
        "q_hybrid_rrf",
        // round 9: the trained-embedding knn — the retrieval operator
        // over the SGNS checkpoint (training's per-batch shape is an
        // iterative loop like pagerank, documented in SCALE.md §12g):
        // broadcast 10-row query frame, codegen'd fold dot products,
        // bounded per-query rank window over the checkpoint scan.
        // (q_node2vec_capped's sampling plan is likewise per-hop inside
        // the loop — the TopKAgg partial/merge pair shows in any single
        // hop; its evidence is the hub soak, SCALE.md §12f.)
        "q_sgns_knn",
        // round-9 continuation: exact hard-negative mining — the
        // bounded query batch broadcast into a BNLJ against one
        // streamed corpus pass, both roles ranked in a single window
        // keyed (q_id, role) over the rounded cosine. (The unigram-LM
        // trainer is EM-iterative like pagerank — its scale evidence
        // is TokSoak/SCALE.md §13b; the tokenize application plan is
        // a broadcast-model flatMap, nothing to capture.)
        "q_hard_negatives",
        // round 10: the bounded exact-top-k baseline (TopKAgg partial/
        // final ObjectHashAggregate over the broadcast BNLJ — no
        // per-query window sort: the shape that replaced the r9 recall
        // soak's spill), and the composed pretrain-export flagship
        // (quality scan → LSH band join → CC'd canonical semi-join →
        // broadcast-vocab rendering → two distributed prefix sums →
        // one hash agg on the stripe id)
        "q_cosine_topk_agg", "q_pretrain_export",
        // round 11: materialized pack windows (one hash exchange on
        // window_id, bucketed prefix sum, no global window) and the
        // BPE-rendered export twin (shared composed chain)
        "q_pack_windows", "q_pretrain_export_bpe",
        // round 12: the window-shard manifest (shard = pure map over
        // the dense window_id — the only exchange is packWindows' own
        // hash exchange, then partial→final agg on the shard key).
        // (q_pretrain_export_incr's plan is the pipeline's own stages —
        // the append path is profiled in SCALE.md; its RESULT is a
        // TxTable scan like q_pagerank's checkpoint, nothing to
        // capture.)
        "q_shard_windows")) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}

package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: formatted physical plans for headline operators,
  * with the scale-relevant features to look for. Run:
  * `runMain graft.PlanDump /root/testdata/sf0.01`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val picks: Seq[(String, String)] = Seq(
      "flagship" -> ("scan pushdown on 3 tables, broadcast customer dim, " +
        "shuffled fact join, partial+final agg, TakeOrdered top-10"),
      "sort_topk" -> "TakeOrderedAndProject: per-partition heaps, no global sort",
      "agg_hash_group" -> "two HashAggregate levels = automatic combiner",
      "agg_cube" -> ("CUBE over pre-aggregated partials: the Expand x4 " +
        "multiplies ~25 base cells, not the joined fact table"),
      "llm_bm25" -> ("BM25 retrieval: one tf aggregation over the corpus; " +
        "df/avgdl side collapses to a broadcast of |query| rows; " +
        "order-free integer micro-score sum"),
      "llm_ingest_dedup" -> ("incremental-ingest admission: batch shingles " +
        "broadcast into one map-side pass over corpus shingles; exact check " +
        "is a digest hash join — O(batch), never corpus squared"),
      "llm_quality_classifier" -> ("deployed linear classifier: the model " +
        "is an expression of the bucket id — one wordcount-shaped " +
        "aggregation, exact bigint dot product"),
      "join_broadcast" -> "BroadcastHashJoin from explicit broadcast()",
      "join_multiway" -> ("6-table Q5 shape, dimension-first: the " +
        "region-nation-supplier chain collapses to one broadcast that cuts " +
        "lineitem to the ASIA fraction BEFORE the single shuffled fact join " +
        "(shuffle_hash, no sort passes); customer-orders is the other " +
        "broadcast side; partial+final agg on top"),
      "join_asof" -> ("single sort-partitioned window pass over the tagged " +
        "union — no range self-join"),
      "join_asof_merge" -> ("the custom Catalyst spelling: MergeAsofExec " +
        "with planner-inserted hash exchanges + (key, time) sorts from its " +
        "declared requirements, streaming two-pointer merge — each side " +
        "shuffles only its own columns, no union null-padding, no window " +
        "frame buffer"),
      "dq_profile_approx" -> ("single-pass profile: all six HLL sketches " +
        "fuse into the one scan+aggregate alongside the count/min/max " +
        "battery — no Expand, no per-column distinct branches, no joins"),
      "events_funnel" -> ("ordered funnel: filtered events shuffle once on " +
        "user_id; every later stage joins + re-aggregates on that same key " +
        "(co-partitioned, no new exchange on the fact side), and the " +
        "shrinking per-stage tables are broadcast-eligible under AQE"),
      "events_anomaly" -> ("hourly z-score anomalies: wordcount-shaped " +
        "(type, hour) rollup, per-type moments re-aggregated from " +
        "rows-per-hour, stats broadcast back — the raw event log is " +
        "scanned exactly once"),
      "events_attribution" -> ("session attribution: ONE sort-partitioned " +
        "user_id exchange serves the gap-flag window, the running session " +
        "index, and the per-session rollup (co-partitioned) — no second " +
        "data-sized exchange"),
      "dq_constraints" -> ("constraint battery: same-table checks fused " +
        "into one aggregation pass per table (lineitem uniqueness + range " +
        "share a scan), the FK edge an anti join, 5 one-row verdicts " +
        "unioned map-side"),
      "llm_simsearch_topk" -> ("BroadcastNestedLoopJoin streaming candidates " +
        "past the broadcast query set; graft_dot codegen kernel in the projection"),
      "llm_neardup_pairs" -> ("prefix-filtered candidate join (short prefixes " +
        "only) followed by exact verification joins"),
      "skew_salted_join" -> ("shuffled hash join keyed on BOTH (key, salt) — " +
        "the shuffle_hash hint keeps AQE from broadcasting the exploded " +
        "build side, so the salt split actually materializes"),
      "join_bloom_prefilter" -> ("bloom_filter_agg scalar subquery evaluated " +
        "once; codegen might_contain probe prunes the fact side before the " +
        "shuffle — no per-row Scala UDF anywhere in the plan"),
      "llm_knn_graph" -> ("blocked exact kNN candidates: corpus grouped " +
        "into B hash blocks (collect_list), B x B block-pair cross join " +
        "(B^2 bounded rows, the blocked-GEMM shape), per-(node, block) " +
        "exact top-5 exploded out — candidate volume n*B*5, and no n^2-row " +
        "pair join (no `src =!= dst` theta join) anywhere; downstream " +
        "re-rank is plain equi joins, mutuality one count window over the " +
        "unordered pair key (the former reverse-edge self-join evaluated " +
        "the whole pipeline twice)"),
      "llm_simsearch_ivf" -> ("IVF ANN: broadcast centroid codebook for " +
        "assignment + probe, equi-join on cell id replaces the all-pairs " +
        "cross join"),
      "llm_neardup_embedding" -> ("min-id-leader cosine dedup: candidates " +
        "from the blocked exact threshold kernel (B x B block-pair cross, " +
        "graft_cos_thresh_pairs emits only qualifying ordered pairs — no " +
        "n^2-row theta join), distinct drop-set resolved by a left join " +
        "back to the corpus"),
      "llm_simjoin_threshold" -> ("exact cosine-threshold self-join via the " +
        "blocked kernel: the only cross join pairs the B-row block " +
        "relations, never the corpus with itself; emitted pairs are " +
        "already id-ordered and tau-filtered"),
      "llm_pipeline_e2e" -> ("dedup agg joined back to the corpus via an " +
        "equi join on doc_id (Spark MAY broadcast the survivor keys at " +
        "fixture scale, but the keys are corpus-sized at 100 TB — the " +
        "invariant is the equi join, which degrades to a hash-partitioned " +
        "shuffle join, never a cross), fused with the quality filter and " +
        "final rollup in one pipelined plan"),
      "llm_dedup_clusters" -> ("connected-component resolution: the final " +
        "round's label join + size aggregation (per-round plans are " +
        "truncated by localCheckpoint, so this shows the converged state)"),
      "llm_corpus_shuffle" -> ("deterministic shuffle/shard: map-side md5 " +
        "shard assignment, single hash-partitioned window for per-shard " +
        "positions — no global single-partition sort"),
      "llm_decontaminate" -> ("benchmark decontamination: the (small) " +
        "benchmark shingle set broadcast into the candidate join, " +
        "aggregation + size joins on the survivors only"),
      "sql_exists_correlated" -> ("correlated EXISTS decorrelated by " +
        "Catalyst into a broadcast left-semi join — no per-row subquery " +
        "execution"),
      "sql_scalar_subquery" -> ("both scalar subqueries planned as one-row " +
        "Subquery subplans evaluated once and fed into the scan filter"),
      "llm_embedding_quantize" -> ("pure map-side quantization: scan → " +
        "project (HOF transforms) → sort for output determinism; no " +
        "exchange before the sort"),
      "llm_simsearch_quantized" -> ("quantized-scan kNN: int8 shortlist " +
        "from the blocked kernel (B x B block cross, per-(query, block) " +
        "top-20 WITH scores on the struct — no |Q|*n theta join, no " +
        "score-recompute join), one merge window, exact-cosine re-rank " +
        "only on the top-20 survivors"),
      "mr_teravalidate" -> ("sort validation the TeraValidate way: range " +
        "repartition + per-partition lag window + boundary check over the " +
        "<=32 partition summaries — no unpartitioned (single-task) window " +
        "over the fact table"),
      "window_gap_fill" -> ("hourly resample + forward fill: per-hour " +
        "representative via ONE max_by aggregation (no ranking-window " +
        "sort pass over events), map-side grid explode, per-user fill " +
        "window — every exchange hash-partitioned on user_id"),
      "llm_repetition_filter" -> ("map-side HOF bigram stats fused with the " +
        "scan; one wordcount-shaped aggregation for the top-token share; " +
        "no other exchange"),
      "llm_curation_e2e" -> ("the curation composite's final stage: " +
        "exact-dedup keepers anti-joined with CC non-survivors, gated by " +
        "the repetition keepers, map-side shard assignment, per-shard agg " +
        "(the CC iteration itself is localCheckpoint-truncated upstream)"),
    )

    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans for headline operators\n\n")
    sb.append(s"Generated by `graft.PlanDump` at `$sfDir`. Regenerate after plan-affecting changes.\n")
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name\n\n$why\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${picks.size} plans)")
    spark.stop()
  }
}

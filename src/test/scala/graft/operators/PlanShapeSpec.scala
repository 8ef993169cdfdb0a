package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Physical-plan regression gates for the scale-critical queries: the
  * point is not that they run, but that they run with the plan a
  * 1000-executor cluster needs — equality joins instead of cartesian
  * products, broadcasts on dim sides, map-side partial aggregation.
  * A refactor that silently degrades one of these shapes fails here
  * long before a benchmark would catch it.
  */
class PlanShapeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Formatted mode keeps full scan metadata (PushedFilters/ReadSchema)
    * that the simple plan string truncates. */
  private def formattedPlan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("blocked embedding dedup joins by block keys — no cartesian, no nested loop") {
    val p = plan("dedup_embedding_blocked")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("banded simhash pairs join on segment equality — no cartesian, no nested loop") {
    val p = plan("dedup_simhash_pairs_banded")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("minhash LSH pairs join on band keys — no cartesian, no nested loop") {
    val p = plan("dedup_minhash_pairs")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("ANN embedding dedup joins on bucket equality — no cartesian, no nested loop") {
    val p = plan("dedup_embedding_ann_pairs")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("banded ngram Jaccard joins on shingle fingerprints — no cartesian, no nested loop") {
    val p = plan("dedup_ngram_jaccard_banded")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("repeated-spans scoring joins on span fingerprints — no cartesian, no nested loop") {
    val p = plan("llm_repeated_spans")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("stratified sample reads documents with a broadcast rate lookup") {
    val p = plan("llm_stratified_sample")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("brand dim join broadcasts the part table") {
    plan("q_dim_join_brand") should include("BroadcastHashJoin")
  }

  test("exact dedup aggregates with a map-side partial phase") {
    plan("dedup_exact") should include("partial_min")
  }

  test("skew top-k aggregator combines map-side (partial aggregation)") {
    val p = plan("q_topk_skew_aggregate")
    p.toLowerCase should include("objecthashaggregate")
  }

  test("TPC-H q5 keeps small dims on broadcast joins") {
    // supplier/nation/region broadcast; the fact-fact joins may shuffle
    plan("q5_local_supplier") should include("BroadcastHashJoin")
  }

  test("q6 range predicates push down to the parquet scan") {
    val p = formattedPlan("q6_revenue_forecast")
    p should include("PushedFilters")
    p should include("GreaterThanOrEqual(l_shipdate")
    p should include("LessThan(l_quantity")
  }

  test("q_orderby_limit prunes unused lineitem columns at the scan") {
    val p = formattedPlan("q_orderby_limit")
    // reads only (l_orderkey, l_linenumber, l_extendedprice): columns the
    // query never touches must not survive into the scan schema
    p should not include "l_returnflag"
    p should not include "l_tax"
    p should not include "l_partkey"
  }

  test("domain mix is a broadcast-gated map scan that never reads text") {
    val p = plan("llm_domain_mix")
    // the rate lookup rides on broadcasts; the corpus is never shuffled
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    // the gate needs only (doc_id, source): the text column must be
    // pruned from the main scan (at 100 TB text IS the table)
    val f = formattedPlan("llm_domain_mix")
    f should not include "string>) text"
    f should not include "text#"
  }

  test("contamination joins grams by equality — no cartesian, no nested loop") {
    val p = plan("llm_contamination")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("seq packing is one window over the language partitioning") {
    // a single hashpartitioning exchange on lang feeds the cumulative
    // window; no join, no extra shuffle
    val p = plan("llm_seq_packing")
    p should include("Window")
    p should not include "Join"
    "hashpartitioning\\(lang".r.findAllIn(p).size shouldBe 1
  }

  test("verified minhash pairs join on band keys — no cartesian, no nested loop") {
    val p = plan("dedup_minhash_verified")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("dedup recall eval never re-reads a corpus: zero parquet scans in the executed plan") {
    // every base-table read is behind a localCheckpoint barrier shared by
    // truth and found sides (shingleFps once, embeddings once); a
    // refactor that drops a checkpoint re-inlines the corpus scan per
    // consumer and fails here
    val p = plan("dedup_ann_recall")
    "Scan parquet".r.findAllIn(p).size shouldBe 0
  }

  test("winnowing reads only (doc_id, text) and windows per document") {
    val f = formattedPlan("llm_winnowing")
    f should not include "lang#"
    f should not include "source#"
    plan("llm_winnowing") should include("Window")
  }

  test("bigram surprisal scans the corpus once: zero parquet scans in the executed plan") {
    // the tokenized frame is checkpointed; unigram and bigram branches
    // both derive from it — a dropped checkpoint re-inlines the scan
    val p = plan("llm_bigram_surprisal")
    "Scan parquet".r.findAllIn(p).size shouldBe 0
  }

  test("similarity queries scan the embeddings table once (checkpoint barriers)") {
    // query sides derive from the same frame the candidates stream
    // from; at 10^9 vectors a re-inlined scan doubles the query's IO
    for (q <- Seq("sim_topk_bruteforce", "sim_ann_lsh",
        "sim_knn_classify", "dedup_embedding_cosine", "dedup_embedding_blocked",
        "dedup_embedding_ann_pairs")) {
      withClue(q) { "Scan parquet".r.findAllIn(plan(q)).size shouldBe 0 }
    }
    // sim_ann_ivf reads the PERSISTED IVF artifact (round 13): its two
    // parquet scans are the assigned/cents index tables — the design —
    // and the embeddings table itself still never re-inlines
    val p = plan("sim_ann_ivf")
    "Scan parquet".r.findAllIn(p).size shouldBe 2
    p should not include "embeddings.parquet"
  }

  test("global ntile is rank-by-projection — no window, no re-shuffle, no single partition") {
    val p = plan("q_ntile_global")
    // the range sort happened inside the checkpoint job; the visible
    // plan must be pure projection (the pid-indexed offset ARRAY
    // LITERAL, r17) + the tiny 10-group aggregate. A naive global
    // ntile would show Exchange SinglePartition + Window; a
    // row_number formulation would show Exchange hashpartitioning(pid…)
    // re-shuffling the whole table; the pre-r17 shape joined a
    // broadcast offset table (one broadcast-build job per consumer).
    p should not include "SinglePartition"
    p should not include "Window"
    p should not include "hashpartitioning(pid"
    p should not include "BroadcastHashJoin"
    p should include("element_at")
  }

  test("anomaly z-score broadcasts the per-type moments — no fact-fact shuffle join") {
    val p = plan("evt_anomaly")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("lateral top-n decorrelates to a ranked join — no per-outer-row re-execution") {
    val p = plan("q_lateral_topn")
    // Catalyst rewrites the correlated LIMIT into a per-key ranking
    // joined back to the outer side; a dependent-join execution would
    // show a nested loop re-running the subquery per nation
    p should include("Window")
    p should not include "CartesianProduct"
  }

  test("retention and anomaly scan events once: zero parquet scans in the executed plan") {
    // cohort/moments side and probe side share one checkpointed
    // projection; a dropped checkpoint re-inlines the events scan per
    // consumer and fails here
    for (q <- Seq("evt_retention", "evt_anomaly")) {
      withClue(q) { "Scan parquet".r.findAllIn(plan(q)).size shouldBe 0 }
    }
  }

  test("PQ ADC search is broadcast-LUT + aggregate: no shuffle join, no parquet re-scan") {
    val p = plan("sim_ann_pq_adc")
    // the query-time path joins candidate CODES against the broadcast
    // lookup table — a sort-merge join here would mean the corpus is
    // being shuffled per query
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    // everything derives from the checkpointed embedding frame
    "Scan parquet".r.findAllIn(p).size shouldBe 0
  }

  test("PQ artifact search reads codes, not embeddings: query-side scan is vec_id-pushed") {
    // the LUT derivation is the only PQ-search plan that touches the
    // embeddings table, and its scan must be the 5 query vectors with
    // the predicate pushed to parquet — candidates only ever read the
    // codes artifact
    val (_, books) = Similarity.pqPersistedModel(spark, sf)
    val lutPlan = Similarity.pqQueryLut(spark, sf, books).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    lutPlan should include("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,5)]")
    lutPlan should not include "SortMergeJoin"
    // the search plan itself: the codes artifact is its ONLY table scan
    // (the collected LUT arrives as a broadcast local relation) —
    // count on the simple plan string, where each scan prints once
    val p = plan("sim_ann_pq_search")
    p should not include "SortMergeJoin"
    "Scan parquet".r.findAllIn(p).size shouldBe 1
  }

  test("PQ artifact search is map-only over the codes scan: candidates meet the " +
      "LUT in a broadcast nested-loop, and no exchange carries candidate rows") {
    val p = plan("sim_ann_pq_search")
    // the per-query LUT (5 rows wide) reaches every candidate via a
    // broadcast cross join; the PqAdcSum fold computes the whole ADC
    // distance in-place, so the codes scan flows straight into the
    // top-k partial aggregate with no join on (sub, code) and no
    // (query, vec) re-grouping exchange
    p should include("BroadcastNestedLoopJoin")
    p should not include "SortMergeJoin"
    // exactly ONE hash exchange, and it never carries candidates: the
    // bounded top-k aggregation (≤k rows per query after the partial
    // agg); the LUT is assembled coordinator-side like a real ADC
    // server, so no exchange exists just to regroup 160 rows
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
  }

  test("exact top-k and kNN rank via the bounded-buffer aggregator — no full-candidate window") {
    // the window form would sort O(candidates) rows in one task per
    // query partition; the aggregator path must show a (partial)
    // object-hash aggregate and zero WindowExec nodes
    for (q <- Seq("sim_topk_bruteforce", "sim_knn_classify")) withClue(q) {
      val p = plan(q)
      p should not include "Window"
      p.toLowerCase should include("objecthashaggregate")
    }
    // the equality-proof twins keep the window formulation
    for (q <- Seq("sim_topk_window", "sim_knn_window")) withClue(q) {
      plan(q) should include("Window")
    }
  }

  test("PII redaction is a map-only scan — no shuffle, no join") {
    val p = plan("llm_pii_redact")
    p should not include "Join"
    // the only exchange allowed is the output ordering's range partition
    p should not include "hashpartitioning"
  }

  test("hash classifier inference is a map-only scan — no join, no hash exchange") {
    // the fastText-at-scale claim: the literal weight table lives
    // inside the projection (element_at on an array literal), so the
    // classifier pass is embarrassingly parallel; only the output
    // ordering's range partition may shuffle
    val p = plan("llm_hash_classifier")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("heavy hitters: sketch pass and exact recount share one checkpointed token frame") {
    val p = plan("llm_heavy_hitters")
    // both passes read the checkpoint, never parquet twice
    "Scan parquet".r.findAllIn(p).size shouldBe 0
    // the ≤cap candidate set reaches the recount as a broadcast — a
    // sort-merge join here would shuffle the token stream
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("bottom-k sample ranks via the bounded-buffer aggregator — no window") {
    val p = plan("llm_bottomk_sample")
    p should not include "Window"
    p.toLowerCase should include("objecthashaggregate")
  }

  test("DSIR weights: bucket stats broadcast back, the corpus never shuffle-joins") {
    val p = plan("llm_dsir_weights")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    // every consumer derives from the checkpointed token frame
    "Scan parquet".r.findAllIn(p).size shouldBe 0
  }

  test("count-min: probes meet the tiny counter table by broadcast, never a window") {
    val p = plan("llm_count_min")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "Window"
  }

  test("bloom skipping: the index and verdicts ride broadcasts — no shuffle join, no cartesian product") {
    val p = plan("q_bloom_skipping")
    p should not include "CartesianProduct"
    p should not include "SortMergeJoin"
    p should include("BroadcastHashJoin")
  }

  test("textrank: each power-iteration round is an equality join, never a cartesian or window") {
    val p = plan("llm_textrank")
    p should not include "CartesianProduct"
    p should not include "Window"
  }

  test("bpe apply: the corpus meets the applied vocabulary by broadcast, never a shuffle join") {
    val p = plan("llm_bpe_apply")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("weighted sample ranks via the bounded-buffer aggregator — no window") {
    val p = plan("llm_weighted_sample")
    p should not include "Window"
    p.toLowerCase should include("objecthashaggregate")
  }

  test("CDC chunk dedup joins on chunk fingerprints — no cartesian, no nested loop") {
    val p = plan("dedup_cdc_chunks")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("residual IVFADC: candidates meet probes and LUTs by broadcast — no cartesian, no shuffle join") {
    val p = plan("sim_ann_ivfpq_residual")
    // (the plan's nested-loop joins are all crossJoins against the
    // broadcast 8-row centroid table — the k-means/probe pattern)
    p should not include "CartesianProduct"
    // probe list and per-cell LUTs reach the candidates by broadcast;
    // the one shuffle join in the plan is the build-side
    // assignment ⋈ codes equality join on vec_id — exactly what the
    // deployment artifact (ivfpqPersistedModel) materializes offline,
    // so the SEARCH pays only broadcasts plus the bounded top-k
    p should include("BroadcastHashJoin")
    // ranking rides the bounded-buffer aggregator (the only windows in
    // the plan are the Q×8-row probe ranking and the k-means argmins,
    // all on broadcast-sized or per-vector-bounded groups)
    p.toLowerCase should include("objecthashaggregate")
  }

  test("BM25: query-term filter reaches below the tf aggregation; idf and corpus " +
      "stats broadcast; ranking rides the bounded-buffer aggregator — no window") {
    val p = plan("llm_bm25_topk")
    // the score side joins tf→dl (equality) and meets idf + stats by
    // broadcast — no cartesian anywhere (the stats crossJoin is a
    // 1-row broadcast)
    p should not include "CartesianProduct"
    p should include("BroadcastHashJoin")
    // top-k is the aggregator, not a global window sort
    p should not include "Window"
    p.toLowerCase should include("objecthashaggregate")
  }

  test("binary rerank: stage-2 reads embeddings map-only behind broadcast id/query " +
      "lists — no shuffle join, no window") {
    val p = plan("sim_binary_rerank")
    p should not include "CartesianProduct"
    p should not include "SortMergeJoin"
    p should not include "ShuffledHashJoin"
    p should not include "Window"
    p should include("BroadcastHashJoin")
  }

  test("SCD2 merge: the dimension meets the change batch by broadcast and is " +
      "scanned once in the join branch") {
    val p = plan("q_scd2_merge")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
  }

  test("fuzzy edit dedup: candidates join on window fingerprints — no cartesian, " +
      "no nested loop") {
    val p = plan("dedup_fuzzy_edit")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("prefix-filter join: prefix-token equality joins only — no cartesian, " +
      "no nested loop") {
    val p = plan("dedup_prefix_filter_join")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("sorted-neighborhood: the ±w adjacency is a block-EQUALITY join — no " +
      "cartesian, no nested loop, no range join") {
    val p = plan("dedup_sorted_neighborhood")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("triangle count: wedge + closing edge are equality joins — no cartesian, " +
      "no nested loop") {
    val p = plan("q_triangle_count")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("snapshot diff: one co-partitioned full-outer join on the key — no " +
      "broadcast of a snapshot-sized side") {
    val p = plan("q_snapshot_diff")
    p should include("FullOuter")
    p should not include "BroadcastHashJoin"
    p should not include "CartesianProduct"
  }

  test("per-user OLS trend: one map-side-combined aggregate, no window, no join") {
    val p = plan("evt_trend_ols")
    p should not include "Window"
    p should not include "Join"
    p should include("partial_sum")
  }

  test("item CF: co-occurrence joins on customer equality — no cartesian, " +
      "no nested loop") {
    val p = plan("q_item_cf")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("resample: interleave-and-fill runs JOIN-FREE — one union + per-user " +
      "window passes, never per-grid-point as-of joins") {
    val p = plan("evt_resample")
    p should not include "Join"
    p should include("Window")
    p should include("Union")
  }

  test("hybrid RRF: both rankings ride the bounded top-k aggregator, and the " +
      "fuse join is k-row-sized — no full-candidate window sort") {
    val p = plan("llm_hybrid_rrf")
    p should not include "CartesianProduct"
    // rankings come from the TopKAggregator posexplode, never a
    // row_number window over the full candidate set
    p should not include "Window"
  }

  test("JL projection is map-only: no joins, and the only exchange is " +
      "the output ordering") {
    val p = plan("sim_jl_project")
    // one scan, the literal-matrix projection, the explode, the final
    // output sort — nothing joins, nothing shuffles except that sort
    p should not include "Join"
    countOccurrences(p, "Exchange") should be <= 1
  }

  test("negative-pair generation resolves candidates by an id-equality " +
      "join — no cartesian; the only nested-loop is the broadcast " +
      "corpus-size scalar") {
    val p = plan("llm_negative_pairs")
    p should not include "CartesianProduct"
    countOccurrences(p, "BroadcastNestedLoopJoin") should be <= 1
    (p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin")) shouldBe true
  }

  test("SCD2 point-in-time join keys on custkey equality — the timeline " +
      "band is a filter, never a range/nested-loop join over facts") {
    val p = plan("q_scd2_pit_join")
    p should not include "CartesianProduct"
    // the dim build broadcasts a max-key scalar (one nested loop);
    // the fact join itself must be an equality join
    countOccurrences(p, "BroadcastNestedLoopJoin") should be <= 1
    (p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin")) shouldBe true
  }

  test("association rules join baskets and supports by equality — " +
      "no cartesian; only the basket-count scalar rides a nested loop") {
    val p = plan("q_assoc_rules")
    p should not include "CartesianProduct"
    countOccurrences(p, "BroadcastNestedLoopJoin") should be <= 1
  }

  test("AMS F2 sketch aggregates map-side: partial aggregation on the " +
      "sign sums") {
    val p = plan("agg_f2_sketch")
    p should include ("partial_sum") // map-side combine of the counters
  }

  test("dup-span removal applies via the native span-cut sweep — the ONLY " +
      "generator is the window-fingerprint posexplode, never a per-token " +
      "explode on the apply side") {
    val p = plan("llm_dup_spans_apply")
    // ZERO Generate nodes in the apply plan: the window-fingerprint
    // posexplode runs once inside the checkpointed wfp branch, and the
    // APPLY side is the compiled graft_span_cut sweep over the
    // doc-keyed span join — any Generate here would mean the cleaned
    // corpus is being built by exploding every token, the shape the
    // operator exists to avoid (the oracle restates it that way; the
    // Spark side must not). The HOF transform/filter/exists chain it
    // replaced was CodegenFallback (interpreted, O(tokens × spans));
    // asserting its ABSENCE pins the A/B outcome
    countOccurrences(p, "Generate") shouldBe 0
    p should include ("graft_span_cut")
    p should not include "exists"
  }

  test("token budget runs zero Window nodes — the per-lang running sum " +
      "is the keyed prefix sum, never a single-task-per-lang window") {
    val p = plan("llm_token_budget")
    countOccurrences(p, "Window") shouldBe 0
  }

  test("curation ledger's final plan runs zero Window nodes — the " +
      "per-lang budget sum is the keyed prefix sum, never a whole-lang " +
      "window") {
    // the only window in the ledger is min(doc_id) over the sha256
    // groups (per-duplicate-set, ~1-2 rows per group — shuffled on a
    // high-cardinality key, no single-task funnel), and it executes
    // inside keyedPrefixSum's checkpointed scan job; the FINAL plan —
    // where the per-lang budget window lived through round 9 — must
    // carry no Window node at all
    countOccurrences(plan("llm_curation_pipeline"), "Window") shouldBe 0
  }

  test("weighted median runs zero Window nodes — the per-flag running " +
      "weight is the keyed prefix sum, and the crossing pick is a " +
      "struct-min aggregate") {
    val p = plan("q_weighted_median")
    countOccurrences(p, "Window") shouldBe 0
    p should not include "SinglePartition"
  }

  test("Mann-Whitney's distributed phase runs zero Window nodes — the " +
      "cumulative count rides globalPrefixSum, the verdict is one " +
      "driver row") {
    // the query's fn collects its single aggregate row and returns a
    // literal frame, so gate the heavy phase directly: the per-value
    // count table + prefix sum + one aggregate, as the real fn builds
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, expr, lit}
    val cnt = graft.Tables.events(spark, sf)
      .select(expr("cast(cast(value as decimal(18,2)) * 100 as bigint)")
        .as("y"))
      .groupBy($"y").agg(count(lit(1)).as("ct"))
    val cum = Relational.globalPrefixSum(spark, cnt, Seq($"y"), "ct")
    val p = cum.queryExecution.executedPlan.toString
    countOccurrences(p, "Window") shouldBe 0
    p should not include "SinglePartition"
  }

  test("graph community trio (LPA / modularity / HITS) plans: equality " +
      "joins only — no cartesian, no window, no single partition") {
    // each round/half-update is an edges-table equality join + map-side
    // aggregates with checkpoint barriers; the 1-row maxima and m ride
    // broadcasts. A Window here would mean a rank/normalization fell
    // back to a single task; a CartesianProduct would mean a join lost
    // its key. (SinglePartition DOES legitimately appear — the final
    // stage of the 1-row scalar aggregates (m, per-round maxima)
    // carries O(partitions) partial rows, the standard global-agg
    // shape — so it is deliberately not asserted against.)
    Seq("q_label_prop", "q_modularity", "q_hits").foreach { q =>
      val p = plan(q)
      withClue(s"$q:") {
        p should not include "CartesianProduct"
        countOccurrences(p, "Window") shouldBe 0
      }
    }
  }

  test("OHLC candles are ONE map-side-combined aggregate — no window, " +
      "no join, first/last as partial struct extremes") {
    val p = plan("evt_ohlc")
    p should not include "Window"
    p should not include "Join"
    p should include("partial_min")
  }

  test("SAX symbolization runs zero Window nodes — breakpoints come off " +
      "the bounded-driver order statistic, day words off a slot-sorted " +
      "collect_list") {
    val p = plan("evt_sax")
    countOccurrences(p, "Window") shouldBe 0
    p should not include "CartesianProduct"
  }

  test("FIM reordering is a map-only scan — no join, no hash exchange") {
    val p = plan("llm_fim")
    p should not include "Join"
    p should not include "hashpartitioning"
  }

  test("WAV decode and frame analysis are map-only typed passes — no " +
      "join, no hash exchange, only the output ordering shuffles") {
    Seq("mm_wav_decode", "mm_wav_frames").foreach { q =>
      val p = plan(q)
      withClue(s"$q:") {
        p should not include "Join"
        p should not include "hashpartitioning"
      }
    }
  }

  test("graph additions (k-truss / closeness / link prediction) join by " +
      "equality only — no cartesian, no nested loop, no window") {
    Seq("q_ktruss", "q_closeness", "q_link_predict").foreach { q =>
      val p = plan(q)
      withClue(s"$q:") {
        p should not include "CartesianProduct"
        p should not include "BroadcastNestedLoopJoin"
        countOccurrences(p, "Window") shouldBe 0
      }
    }
  }

  test("cross-correlation pairs by day-shift equality joins and " +
      "aggregates map-side — no cartesian, no window") {
    val p = plan("evt_cross_corr")
    p should not include "CartesianProduct"
    p should not include "Window"
    p should include("partial_sum")
  }

  test("hierarchy rollup: every closure round joins on node equality — " +
      "no cartesian, no nested loop, map-side subtree aggregation") {
    val p = plan("q_hierarchy_rollup")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("partial_count")
  }

  test("random walks: hop joins are rank-equality against the adjacency " +
      "— no cartesian, no nested loop") {
    val p = plan("q_random_walks")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("interval overlap join binds on the week key — the only " +
      "non-equality operators are the broadcast scalar spine") {
    val p = plan("evt_overlap_join")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("bootstrap CI folds all 32 replicate partials map-side in one " +
      "aggregate — no join in the hot path, no window") {
    val p = plan("evt_bootstrap_ci")
    p should include("partial_sum")
    p should not include "Window"
    // the only joins sit AFTER the aggregation (the 16-row unpivot),
    // never against the events scan
    p should not include "CartesianProduct"
  }

  test("quantile digest probe joins stay equality-shaped (the histogram " +
      "explode itself sits behind the checkpoint barrier)") {
    val p = plan("agg_qdigest_ranks")
    p should not include "CartesianProduct"
    // the probe-side non-equi join (idx < j) is legal ONLY because
    // both sides are probe/digest-sized: every such join must be a
    // broadcast, never a shuffled nested loop
    p should not include "ShuffledHashJoin( BuildSide: none"
  }

  private def countOccurrences(s: String, sub: String): Int =
    s.sliding(sub.length).count(_ == sub)

  test("round-13 shapes: filtered searches join on cell/graph keys (no " +
      "cartesian), rendezvous routing is one scan + census aggregates " +
      "(no window, no corpus shuffle), shard decode is map-only") {
    for (q <- Seq("sim_ann_graph_filtered", "sim_range_search_filtered")) {
      val p = plan(q)
      withClue(q) {
        p should not include "CartesianProduct"
        // the only nested-loop joins allowed are broadcast ones over
        // index metadata (centroids, probe tables) — never shuffled
        p should not include "ShuffledHashJoin( BuildSide: none"
      }
    }
    val r = plan("ref_rendezvous_route")
    r should not include "Window" // the argmax is a per-row HOF
    r should not include "CartesianProduct"
    val m = plan("mm_shard_decode")
    // decode is typed map partitions over the tar scan; the only
    // exchange is the deterministic output ordering
    m should not include "Window"
    m should not include "CartesianProduct"
    countOccurrences(m, "Exchange") should be <= 2
  }

  test("value-domain order statistics never funnel through a single-task " +
      "window: tukey fences and the dataset-card median ride the " +
      "distributed prefix sum") {
    // the distinct value/length domains reach millions of rows at
    // 100 TB — a Window.orderBy(v) without partitioning would funnel
    // the whole frequency table through ONE task's Window operator
    // (round-12 verdict #5); the globalPrefixSum path shows no Window
    // at all (its range sort happens inside the checkpoint job). The
    // final SCALAR aggregate's Exchange SinglePartition is fine: only
    // map-side partials cross it, one row per partition.
    for (q <- Seq("q_tukey_outliers", "llm_dataset_card")) {
      val p = plan(q)
      withClue(q) { p should not include "Window" }
    }
  }

  test("skip-gram negative sampling ranks the node census distributed: " +
      "no single-task window over the vocabulary") {
    // the node census is vocabulary-sized — tens of millions at
    // 100 TB — so the rank must come from globalRank (range sort
    // inside its checkpoint job + broadcast offset join), never a
    // Window.orderBy over everything in one task (round-13 verdict
    // #6). The per-node ADJACENCY window (bounded by max degree)
    // inside the walk build is fine and runs before the checkpoint,
    // so the executed plan shows no Window and no SinglePartition
    // exchange on the census path.
    val p = plan("q_walk_skipgrams")
    p should not include "Window"
    p should not include "SinglePartition"
  }

  test("table profiles scan the corpus once: one parquet scan in the " +
      "executed plan, quantiles ride the checkpointed value histogram, " +
      "no Window anywhere") {
    // the census is ONE map-side-combined aggregate over the table
    // (multi-DISTINCT plans via Expand, still one scan); the exact
    // p50/p99 come from a column-pruned histogram whose range sort ran
    // inside exactPctlReprs' checkpoint job — so the visible plan has
    // exactly one corpus scan and no Window operator at any scale
    for (q <- Seq("q_profile_table", "q_profile_events",
        "q_profile_documents", "q_profile_embeddings")) {
      val p = plan(q)
      withClue(q) {
        "Scan parquet".r.findAllIn(p).size shouldBe 1
        p should not include "Window"
      }
    }
  }

  test("the SKETCHED profile pass is one scan with NO Expand: HLL " +
      "sketches and the approx percentile ride a single map-side-" +
      "combined aggregate (the 100 TB dataset-card path)") {
    // the exact faces pay an Expand that multiplies scanned rows by
    // column count — the honest oracle contract, not the production
    // pass; the sketched helper must never regress into it. All four
    // pipeline tables ride the same generic pass (round-15 stretch),
    // so all four plans are gated.
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val passes: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "orders" -> Relational.approxOrdersProfile(spark, sf),
      "events" -> Relational.approxTableProfile(
        graft.Tables.events(spark, sf).select(
          $"event_id", expr("ts div 1000").as("ts_us"),
          $"user_id", $"event_type",
          expr("cast(cast(value as decimal(18,2)) * 100 as bigint)")
            .as("value_cents")),
        Seq("event_id", "ts_us", "user_id", "event_type", "value_cents"),
        "value_cents"),
      "documents" -> Relational.approxTableProfile(
        graft.Tables.documents(spark, sf)
          .select($"doc_id", $"lang", $"source", $"n_chars"),
        Seq("doc_id", "lang", "source", "n_chars"), "n_chars"),
      "embeddings" -> Relational.approxTableProfile(
        graft.Tables.embeddings(spark, sf).select(
          $"vec_id", org.apache.spark.sql.functions.size($"embedding")
            .cast("long").as("emb_dim"),
          $"label".cast("long").as("label")),
        Seq("vec_id", "emb_dim", "label"), "label"))
    for ((name, df) <- passes) withClue(s"sketched pass over $name: ") {
      val p = df.queryExecution.executedPlan.toString
      "Scan parquet".r.findAllIn(p).size shouldBe 1
      p should not include "Expand"
      p should not include "Window"
    }
  }

  test("the post-append serving view keeps partition pruning through " +
      "the union: both base-artifact scans still prune to the probed " +
      "cells, no cartesian (the extension side is data-filtered — it " +
      "has no partitions to prune)") {
    val m = formattedPlan("sim_ann_ivfpq_extended")
    val pruned = "PartitionFilters: \\[[^\\]]*centroid_id[^\\]]*IN".r
      .findAllIn(m).size
    pruned should be >= 2
    m should not include "CartesianProduct"
    m should not include "ShuffledNestedLoop"
  }

  test("filtered IVFADC carries the probe restriction as a partition " +
      "filter and the attribute predicate as a data filter — no " +
      "cartesian, no shuffled nested loop (static and planner-driven " +
      "budgets alike)") {
    for (q <- Seq("sim_ann_ivfpq_filtered", "sim_ann_ivfpq_adaptive"))
    withClue(q) {
    val m = formattedPlan(q)
    // cells prune at the scan (metadata), label filters in the scan
    // stage (codegen'd data predicate on the STORED column — never a
    // corpus join to fetch the attribute)
    m should include regex "PartitionFilters.*centroid_id"
    m should include regex "(?i)label.*% 7\\)? = 3"
    m should not include "CartesianProduct"
    m should not include "ShuffledNestedLoop"
    m should not include "SortMergeJoin"
    // BOTH artifact scans prune to the probed cells — the candidate
    // scan and the label re-attach scan (round-14 verdict #5: the
    // re-attach used to read every inverted-list partition to label
    // ≤k×Q rows). Every non-empty PartitionFilters in this plan names
    // centroid_id IN (...), and there are at least two of them.
    val pruned = "PartitionFilters: \\[[^\\]]*centroid_id[^\\]]*IN".r
      .findAllIn(m).size
    pruned should be >= 2
    }
  }
}

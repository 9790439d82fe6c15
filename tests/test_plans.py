"""Physical-plan shape tests — the 100 TB design contract.

Results being right is necessary; these pin that the plans are the ones we
designed: pushdown reaching scans, column pruning, broadcast joins for
small dimensions, bounded shuffle counts.
"""

from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.plans import (
    broadcast_join_count,
    file_scan_count,
    formatted_plan,
    has_pushed_filter,
    scan_read_columns,
    shuffle_count,
)
from emr_on_eks_hudi_iceberg_delta_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def test_point_lookup_pushes_filter(spark):
    df = REGISTRY["point_lookup"].fn(spark, SF_DIR)
    assert has_pushed_filter(df, "EqualTo(o_orderkey,103)")


def test_q1_pushdown_and_pruning(spark):
    df = REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR)
    assert has_pushed_filter(df, "LessThanOrEqual(l_shipdate")
    (cols,) = scan_read_columns(df)
    # 7 of 11 lineitem columns read — projection pruned to what q1 needs
    assert cols == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }
    # single shuffle: the group-by exchange
    assert shuffle_count(df) == 1


def test_q3_broadcasts_dimensions(spark):
    df = REGISTRY["q3_shipping_priority"].fn(spark, SF_DIR)
    assert broadcast_join_count(df) >= 1
    assert has_pushed_filter(df, "EqualTo(c_mktsegment,BUILDING)")


def test_q5_single_shuffle(spark):
    df = REGISTRY["q5_local_supplier"].fn(spark, SF_DIR)
    # all five dimension joins broadcast at this SF; the only exchange is
    # the final group-by
    assert broadcast_join_count(df) == 5
    assert shuffle_count(df) <= 2


def test_text_stats_no_shuffle(spark):
    df = REGISTRY["text_quality_stats"].fn(spark, SF_DIR)
    assert shuffle_count(df) == 0  # pure per-row map: scan-speed at 100 TB


def test_minhash_no_shuffle(spark):
    # the signature computation itself is a pure per-row map; the only
    # allowed exchange is _ensure_parallelism's round-robin repartition,
    # which fires exclusively when the input has fewer splits than cores
    # (single small test file) and is a no-op at scale
    df = REGISTRY["minhash_signatures"].fn(spark, SF_DIR)
    assert shuffle_count(df) <= 1


def test_topk_broadcasts_queries(spark):
    df = REGISTRY["embedding_topk"].fn(spark, SF_DIR)
    assert broadcast_join_count(df) >= 1


def test_scd2_merge_bounded_shuffles(spark):
    df = REGISTRY["scd2_merge_hudi"].fn(spark, SF_DIR)
    # change-detection join + upsert window; must not blow up into many
    # exchanges of the big side
    assert shuffle_count(df) <= 4


def test_bucketed_join_no_shuffle(spark):
    """Bucketed tables co-locate join keys: the SMJ needs no exchange —
    the 100 TB co-located-join discipline (SURVEY.md §2.1 S7 scale note)."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode("overwrite").saveAsTable("orders_bkt")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey").mode("overwrite").saveAsTable("customer_bkt")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("orders_bkt").join(
            spark.table("customer_bkt"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert shuffle_count(j) == 0
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partitioned_write_prunes(spark):
    df = REGISTRY["partitioned_write_prune"].fn(spark, SF_DIR)
    plan = __import__(
        "emr_on_eks_hudi_iceberg_delta_spark.plans.explain", fromlist=["formatted_plan"]
    ).formatted_plan(df)
    assert "PartitionFilters" in plan and "order_year" in plan


def test_q9_broadcasts_all_dimensions(spark):
    """Batch-10 TPC-H: q9's four dimension joins (part/supplier/nation and
    the revenue-side orders join stays shuffled) must broadcast — lineitem
    is the only 100 TB-sized input, so it must never be exchanged for a
    dimension join."""
    df = REGISTRY["q9_product_type_profit"].fn(spark, SF_DIR)
    assert broadcast_join_count(df) >= 3
    assert has_pushed_filter(df, "StringContains(p_name,red)")


def test_q16_anti_join_broadcasts(spark):
    """q16's NOT IN denylist is a broadcast left-anti join (never a
    shuffled anti join of the fact table against 6 rows)."""
    df = REGISTRY["q16_supplier_count"].fn(spark, SF_DIR)
    assert broadcast_join_count(df) >= 2


def test_q15_single_fact_shuffle(spark):
    """q15 reads lineitem once: one group-by exchange; the scalar MAX and
    the supplier join are broadcasts."""
    df = REGISTRY["q15_top_supplier"].fn(spark, SF_DIR)
    assert has_pushed_filter(df, "GreaterThanOrEqual(l_shipdate")
    assert broadcast_join_count(df) >= 2


def test_sampling_and_chunking_zero_shuffle(spark):
    """Hash-bucket sampling is a per-row filter and chunking a per-row
    flatMap — both must stay in the scan stage (scan-speed at 100 TB)."""
    assert shuffle_count(REGISTRY["deterministic_sample"].fn(spark, SF_DIR)) == 0
    assert shuffle_count(REGISTRY["doc_chunking"].fn(spark, SF_DIR)) == 0


def test_packing_bounded_shuffles(spark):
    """Sequence packing: the window cumsum exchanges on the pack key; the
    bin rollup reuses at most one more exchange."""
    assert shuffle_count(REGISTRY["token_packing"].fn(spark, SF_DIR)) <= 2


def test_pipeline_composition_fuses_per_row_stages(spark):
    """The capstone pipeline (quality->sample->dedup->chunk->pack) must
    not cost more than its stateful members: dedup groupBy + pack window
    (+1 semi-join exchange when the keep-set is too big to broadcast)."""
    assert shuffle_count(REGISTRY["training_pipeline_end_to_end"].fn(spark, SF_DIR)) <= 3


def test_join_strategy_hints_are_honored(spark):
    """The three physical join strategies are selectable per join-side
    hint — the control surface for overriding AQE when runtime stats
    mislead (tiny-but-exploding build side, known-skewed probe side)."""
    from emr_on_eks_hudi_iceberg_delta_spark.plans.explain import formatted_plan
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    cond = o.o_custkey == c.c_custkey
    assert "SortMergeJoin" in formatted_plan(o.join(c.hint("merge"), cond))
    assert "ShuffledHashJoin" in formatted_plan(o.join(c.hint("shuffle_hash"), cond))
    assert "BroadcastHashJoin" in formatted_plan(o.join(c.hint("broadcast"), cond))


def test_runtime_bloom_filter_injected(spark):
    """Spark's runtime-filter rule plants a bloom filter from a selective
    dimension side into the fact scan — the 100 TB substitute for static
    partition pruning when the filter column isn't the layout column.
    Thresholds are lowered to fire at test scale; at real scale the
    defaults (10 MB creation side) take over."""
    from emr_on_eks_hudi_iceberg_delta_spark.plans.explain import formatted_plan
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        assert "bloom_filter_agg" in formatted_plan(j).lower() or "BloomFilter" in formatted_plan(j)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dsv2_write_to_create(spark):
    """S8: DataFrameWriterV2 against the session catalog
    (iceberg/iceberg_scd_script.py:34-37 shape). The stock V1 session
    catalog supports CTAS (`create`) but not atomic RTAS
    (`createOrReplace`) — that capability is exactly what the reference's
    Iceberg/Delta catalog plugins add; our VersionedTable.create_or_replace
    provides the equivalent atomic swap on plain parquet."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

    n = load_table(spark, SF_DIR, "nation")
    spark.sql("DROP TABLE IF EXISTS nation_v2")
    n.writeTo("nation_v2").using("parquet").create()
    assert spark.table("nation_v2").count() == n.count()
    # replace = drop + recreate on the V1 catalog (non-atomic; the atomic
    # path is VersionedTable.create_or_replace's pointer flip)
    spark.sql("DROP TABLE nation_v2")
    n.select("n_nationkey", "n_name").writeTo("nation_v2").using("parquet").create()
    assert len(spark.table("nation_v2").columns) == 2


def test_tfidf_bounded_shuffles_and_broadcasts(spark):
    """The vocabulary (df) and the one-row corpus count must come back as
    broadcasts — the corpus-sized tf side is never re-shuffled for a join
    (no SortMergeJoin anywhere). Every aggregate is partial-combine first
    (skew-safe on hot terms: a window count over term would hot-spot).
    The tf subtree is recomputed for the vocabulary derivation (<= 5
    exchanges); at 100 TB you checkpoint tf instead — see the operator
    docstring."""
    from emr_on_eks_hudi_iceberg_delta_spark.plans import formatted_plan

    df = REGISTRY["tfidf_top_terms"].fn(spark, SF_DIR)
    assert broadcast_join_count(df) >= 2
    assert "SortMergeJoin" not in formatted_plan(df)
    assert shuffle_count(df) <= 5


def test_repetition_stats_no_shuffle(spark):
    df = REGISTRY["repetition_stats"].fn(spark, SF_DIR)
    assert shuffle_count(df) == 0  # per-row shingle map: scan speed


def test_contamination_broadcasts_benchmark(spark):
    """The benchmark shingle set must broadcast; the corpus side gets one
    aggregate exchange on doc_id. Benchmark-side dedup may shuffle the
    (tiny) benchmark only."""
    df = REGISTRY["contamination_ngram_overlap"].fn(spark, SF_DIR)
    assert broadcast_join_count(df) >= 1
    assert shuffle_count(df) <= 3


def test_quantize_no_shuffle(spark):
    df = REGISTRY["embedding_quantize_int8"].fn(spark, SF_DIR)
    assert shuffle_count(df) == 0  # per-row arithmetic at scan speed


def test_resample_single_key_shuffle(spark):
    """Grid generation broadcasts bounds; the only corpus-sized exchange is
    the key window (plus the tiny distinct-keys aggregate)."""
    df = REGISTRY["events_resample_ffill"].fn(spark, SF_DIR)
    assert shuffle_count(df) <= 3
    assert broadcast_join_count(df) >= 1


def test_trailing_window_single_shuffle(spark):
    df = REGISTRY["events_trailing_hour_window"].fn(spark, SF_DIR)
    assert shuffle_count(df) == 1  # the user_id window exchange only


def test_higher_order_functions_no_shuffle(spark):
    df = REGISTRY["higher_order_array_functions"].fn(spark, SF_DIR)
    assert shuffle_count(df) == 0


def test_quality_gate_broadcasts_thresholds(spark):
    """The two-value percentile aggregate must broadcast back; the corpus
    is scanned, never re-shuffled for the threshold join."""
    df = REGISTRY["quality_gate_percentile"].fn(spark, SF_DIR)
    assert broadcast_join_count(df) >= 1
    from emr_on_eks_hudi_iceberg_delta_spark.plans import formatted_plan

    assert "SortMergeJoin" not in formatted_plan(df)

def test_map_functions_two_shuffles_pruned_scan(spark):
    """map_column_functions: two aggregate exchanges (segment+nation, then
    segment) and a scan pruned to exactly the two grouping columns — the
    map construction itself is JVM lambdas on bounded per-segment state."""
    df = REGISTRY["map_column_functions"].fn(spark, SF_DIR)
    assert shuffle_count(df) == 2
    (cols,) = scan_read_columns(df)
    assert cols == {"c_mktsegment", "c_nationkey"}


def test_repeated_span_removal_no_forced_broadcast(spark):
    """repeated_span_removal: the span-frequency relation is corpus-sized,
    so the operator must not FORCE a broadcast (AQE may still choose one at
    tiny SF); span totals come off the base scan without a third explode."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.text import (
        remove_repeated_spans,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

    df = remove_repeated_spans(load_table(spark, SF_DIR, "documents"))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # no ResolvedHint/broadcast hint in the logical plan (AQE physical
    # broadcasts are fine and scale-dependent; a hard hint would not be)
    assert "broadcast" not in plan.lower()
    # exactly two Generate (posexplode) nodes: frequency + reassembly
    # sides; the totals side must not re-explode
    assert plan.count("Generate ") <= 2


def test_aqe_splits_skewed_join(spark):
    """The runtime half of the skew story (operators/scale.py salting is
    the manual half): with AQE skew-join on, a hot key whose partition
    dwarfs the advisory size is split into parallel sub-partitions instead
    of serializing one reducer — the mechanism that absorbs power-law keys
    at 100 TB. Thresholds are lowered so the test corpus trips the same
    code path production sizes would."""
    keys = [
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    old = {}
    for k in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "131072"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = (
            spark.range(0, 300_000)
            .withColumn(
                "k",
                F.when(F.col("id") % 100 < 99, F.lit(0)).otherwise(
                    F.col("id") % 1000
                ),
            )
            .withColumn("pad", F.md5(F.col("id").cast("string")))
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k2"), F.md5(F.col("id").cast("string")).alias("val")
        )
        j = left.join(right, F.col("k") == F.col("k2"))
        # execute j's own plan (count() would spawn a separate QueryExecution
        # and leave this one un-finalized)
        assert len(j.collect()) == 300_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_weighted_sample_scan_speed(spark):
    """Weighted sampling must be a broadcast scalar + per-row filter —
    the data itself never shuffles (the 100 TB contract)."""
    df = REGISTRY["weighted_sample_docs"].fn(spark, SF_DIR)
    assert broadcast_join_count(df) >= 1
    # the only exchange feeds the single-row SUM(w) aggregate, never the
    # document rows themselves
    assert shuffle_count(df) <= 2


def test_retention_bounded_shuffles(spark):
    """Cohort retention: first-seen agg + distinct-day agg + final agg —
    all keyed, no data explosion beyond the user_id exchanges."""
    df = REGISTRY["events_retention_cohorts"].fn(spark, SF_DIR)
    assert shuffle_count(df) <= 4


def test_transition_matrix_single_sequence_shuffle(spark):
    """The event stream shuffles once on user_id for the LAG window; the
    (prev,next) aggregate and the normalizing window run on a relation
    bounded by the event-type vocabulary squared."""
    df = REGISTRY["events_transition_matrix"].fn(spark, SF_DIR)
    assert shuffle_count(df) <= 3


def test_pq_topk_zero_shuffle_scoring(spark):
    """PQ: encode is a per-row literal-codebook expression and queries are
    broadcast, so the only exchange is the per-query top-k window — the
    corpus rows shuffle once at most."""
    df = REGISTRY["embedding_pq_topk"].fn(spark, SF_DIR)
    assert broadcast_join_count(df) >= 1
    assert shuffle_count(df) <= 2


def test_peak_concurrency_two_exchanges_no_subtree_duplication(spark):
    # one user_id exchange (sessionize) + one day exchange (sweep); the
    # delta emission must be the single-explode form — a start/end
    # self-union would duplicate the sessionize subtree (two user_id
    # exchanges and two scans)
    from emr_on_eks_hudi_iceberg_delta_spark.plans.explain import formatted_plan

    df = REGISTRY["events_peak_concurrency"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert plan.count("hashpartitioning(user_id") == 1
    assert plan.count("hashpartitioning(__day") == 1


def test_streaks_single_entity_exchange(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.plans.explain import formatted_plan

    df = REGISTRY["events_activity_streaks"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    # distinct, island window, and streak aggregate all hash on user_id;
    # AQE may stage them but no other partitioning key may appear
    assert plan.count("hashpartitioning(__day") == 0


def test_corpus_operators_single_token_aggregate_branch(spark):
    # the token-level explode may appear at most twice in the TVD plan
    # (main branch + the corpus-total rollup branch, documented; one with
    # persist=True) and the vocab join in OOV must be broadcast
    from emr_on_eks_hudi_iceberg_delta_spark.plans.explain import formatted_plan

    tvd = formatted_plan(REGISTRY["corpus_slice_divergence"].fn(spark, SF_DIR))
    assert tvd.count("explode") <= 2
    oov = formatted_plan(REGISTRY["vocab_oov_rate"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in oov
    assert "TakeOrderedAndProject" in oov  # distributed top-K vocab, not a global sort


def test_round5_text_operators_zero_shuffle(spark):
    """PII redaction and the Gopher battery are pure per-row column
    expressions — scan speed at 100 TB, zero exchanges."""
    assert shuffle_count(REGISTRY["pii_redaction"].fn(spark, SF_DIR)) == 0
    assert shuffle_count(REGISTRY["gopher_quality_flags"].fn(spark, SF_DIR)) == 0
    # PQ BLAS encode: mapInPandas over the scan, no exchange either
    assert shuffle_count(REGISTRY["embedding_pq_codes_blas"].fn(spark, SF_DIR)) == 0


def test_round5_dsir_single_rollup_shuffle(spark):
    """DSIR: bucket-count tables broadcast; the data-sized shuffles are
    the two per-corpus bucket aggregates plus one rollup on the document
    id — the other two exchanges carry the one-row corpus totals."""
    df = REGISTRY["dsir_importance_diagnostics"].fn(spark, SF_DIR)
    assert shuffle_count(df) <= 5
    assert broadcast_join_count(df) >= 2  # raw + target count tables


def test_trailing_hour_window_single_shuffle(spark):
    """The interval RANGE window costs exactly one shuffle (user_id)."""
    df = REGISTRY["events_trailing_hour_window"].fn(spark, SF_DIR)
    assert shuffle_count(df) == 1


def test_fuzzy_match_shuffles_on_block_key_only(spark):
    """Blocked fuzzy matching joins on the blocking key; Levenshtein is
    a residual filter, never a join condition (no nested-loop plan)."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
        fuzzy_match_pairs,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.plans import formatted_plan
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

    out = fuzzy_match_pairs(
        load_table(spark, SF_DIR, "part"), "p_partkey", "p_name", max_distance=3
    )
    plan = formatted_plan(out)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "levenshtein" in plan.lower()


def test_ewma_single_entity_exchange(spark):
    """EWMA folds in-row after one entity-key shuffle."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sequence import (
        ewma_scores,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

    assert shuffle_count(ewma_scores(load_table(spark, SF_DIR, "events"))) == 1


def test_approx_bucketing_no_sort_no_window(spark):
    """VERDICT r5 task 2: the approx-quantile bucketing twins must carry
    no total-order sort, no window, and no single-partition exchange —
    assignment is a scan-speed comparison against broadcast cut
    literals. (The exact NTILE variants keep their documented
    single-ordering cost as the small-scale exactness baseline.)"""
    for name in ("decile_bucketing_approx", "ccnet_perplexity_buckets_approx"):
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Sort" not in plan, f"{name}: unexpected sort\n{plan}"
        assert "Window" not in plan, f"{name}: unexpected window\n{plan}"
    # the decile twin is a pure scan + comparison — not even the scalar
    # two-counter aggregate the perplexity scorer legitimately carries
    # (partial map-side combine + one final reduce of 32 tiny rows)
    df = REGISTRY["decile_bucketing_approx"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    assert "Exchange" not in plan, plan


def test_sketch_aggregates_plan_shapes(spark):
    """Sketch aggregates keep the mergeable-partial shape: one
    group-keyed exchange of sketch-sized partials for the grouped HLL,
    one exchange per scalar sketch reduce for KLL, partials+rollup = 2
    for the re-aggregation path, and the Theta set algebra joins two
    one-row sketches via broadcast — never a distinct-key shuffle."""
    df = REGISTRY["hll_distinct_types_by_brand"].fn(spark, SF_DIR)
    assert shuffle_count(df) == 1
    df = REGISTRY["kll_nchars_quantiles"].fn(spark, SF_DIR)
    assert shuffle_count(df) == 1
    df = REGISTRY["hll_rollup_distinct_parts"].fn(spark, SF_DIR)
    assert shuffle_count(df) == 2  # per-supplier partials + global union
    df = REGISTRY["theta_custkey_halfyear_overlap"].fn(spark, SF_DIR)
    assert shuffle_count(df) == 2  # one scalar-agg reduce per cohort side
    assert broadcast_join_count(df) == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


def test_quality_classifier_zero_shuffle(spark):
    df = REGISTRY["quality_classifier_scores"].fn(spark, SF_DIR)
    assert shuffle_count(df) == 0  # pure per-row scoring at scan speed


def test_shard_balance_single_data_shuffle(spark):
    df = REGISTRY["shard_assignment_balance"].fn(spark, SF_DIR)
    # ONE corpus pass: the shard aggregate's exchange plus the 8-row
    # single-partition exchange for the mean window — and exactly one
    # scan (the mean must not double-reference the corpus subtree)
    assert shuffle_count(df) <= 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_table_digest_single_pass(spark):
    df = REGISTRY["table_content_digest"].fn(spark, SF_DIR)
    # global agg of per-row hashes: map-side partials + one-row exchange
    assert shuffle_count(df) <= 1
    (cols,) = scan_read_columns(df)
    assert cols == {
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
    }  # digest projection pruned to the digested columns


def test_perplexity_buckets_persist_scores_once(spark):
    """Round-7 task 2: perplexity_buckets_approx(persist=True) must serve
    BOTH the quantile action and the returned assignment plan from one
    materialization of the scoring subtree — the returned plan reads the
    cache (>=1 InMemoryTableScan) and executes ZERO file scans, i.e. the
    corpus is scored once, not twice. Values must equal the stateless
    path exactly (same GK summary, same cut literals)."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.text import (
        perplexity_buckets_approx,
        unigram_logprob,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.plans import (
        file_scan_count,
        in_memory_scan_count,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")
    scored = unigram_logprob(docs).select("doc_id", "ppl")
    out = perplexity_buckets_approx(scored, n_buckets=3, relative_error=0.001,
                                    persist=True)
    try:
        assert in_memory_scan_count(out) >= 1
        assert file_scan_count(out) == 0
        got = {r["doc_id"]: r["ppl_bucket"] for r in out.collect()}
    finally:
        scored.unpersist()
    ref_out = perplexity_buckets_approx(
        unigram_logprob(docs).select("doc_id", "ppl"),
        n_buckets=3, relative_error=0.001,
    )
    ref = {r["doc_id"]: r["ppl_bucket"] for r in ref_out.collect()}
    assert got == ref


def test_bucketed_join_registry_query_single_shuffle(spark):
    """The registry's bucketed_join_no_shuffle query: the SMJ consumes the
    bucketed scans directly, so the only exchange in the whole plan is the
    final group-by — the co-located-join contract, driver-gate visible."""
    df = REGISTRY["bucketed_join_no_shuffle"].fn(spark, SF_DIR)
    assert shuffle_count(df) <= 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan


def test_interval_overlap_join_is_hash_join_not_nested_loop(spark):
    """interval_overlap_join must plan as an equi hash/merge join on
    (key, bin) — never BroadcastNestedLoopJoin/CartesianProduct."""
    df = REGISTRY["interval_overlap_join"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_autocorrelation_single_shuffle(spark):
    """LAG window and moment aggregate share the user_id partitioning:
    one exchange total."""
    df = REGISTRY["events_autocorrelation"].fn(spark, SF_DIR)
    assert shuffle_count(df) == 1


def test_hamming_join_is_equi_join_not_nested_loop(spark):
    """The pigeonhole band join must plan as a shuffle/broadcast EQUI
    join on (band_idx, band_val) — never the nested loop a raw
    bit_count(xor) <= r theta join produces — and must carry no
    Deduplicate (first-shared-band makes output duplicate-free)."""
    df = REGISTRY["simhash_hamming_join"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Deduplicate" not in plan and "HashAggregate" not in plan.split(
        "Join"
    )[0]


def test_reconcile_shuffles_digests_not_payload(spark):
    """reconcile_tables: the full-outer join consumes per-key digest
    aggregates — the payload (c_name/c_mktsegment) is hashed inside the
    map-side partial aggregate and never appears above it."""
    df = REGISTRY["table_reconcile_diff"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    join_at = plan.find("SortMergeJoin")
    assert join_at > 0
    # above the join: only keys + digest columns
    head = plan[:join_at]
    assert "src_sum" in plan and "tgt_sum" in plan
    assert "c_name" not in head.split("Aggregate")[0]


def test_containment_join_no_cross_product(spark):
    df = REGISTRY["containment_superset_join"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_bootstrap_single_aggregate_pass(spark):
    """All 32 bootstrap replicates ride one explode + one (group, rep)
    aggregate: exactly one scan of events on the replicate path (the
    point-estimate aggregate adds its own — 2 total), and no join back
    to the raw events."""
    df = REGISTRY["bootstrap_group_mean_ci"].fn(spark, SF_DIR)
    assert file_scan_count(df) == 2


def test_column_stats_exact_mode_single_scan(spark):
    df = REGISTRY["table_column_stats"].fn(spark, SF_DIR)
    assert file_scan_count(df) == 1


def test_bq_index_screen_scans_signature_table_only(spark):
    """The persisted-BQ claim: the Hamming screen reads the 8-byte/row
    signature parquet (vec_id, sig) — the float embedding column
    appears only in the rerank branch, fetched for screen survivors."""
    df = REGISTRY["embedding_bq_index_topk"].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "struct<vec_id:bigint,sig:bigint>" in plan


def test_dv_read_is_one_broadcast_antijoin(spark, tmp_path):
    """The deletion-vector read path must stay a single broadcast
    anti-join over the (file, position) pairs — never a shuffle join
    against the data, never per-file joins."""
    from emr_on_eks_hudi_iceberg_delta_spark.sources import DeltaLogTable

    dt = DeltaLogTable(spark, str(tmp_path / "dvplan"))
    dt.overwrite(
        spark.range(2000).selectExpr("id AS k", "id % 7 AS g")
        .repartition(4)
    )
    dt.delete("g = 3", mode="dv")
    df = dt.read()
    plan = formatted_plan(df)
    # Catalyst pushes the anti-join through the union: one broadcast
    # LeftAnti per DV'd file, each against the file's own constant-
    # folded pair slice — broadcast everywhere, zero shuffles, never a
    # sort-merge join
    assert broadcast_join_count(df) >= 1
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert shuffle_count(df) == 0


def test_iceberg_posdelete_read_is_one_broadcast_antijoin(
    spark, tmp_path
):
    from emr_on_eks_hudi_iceberg_delta_spark.sources import IcebergTable

    t = IcebergTable(spark, str(tmp_path / "iceplan"))
    t.overwrite(
        spark.range(2000).selectExpr("id AS k", "id % 7 AS g")
        .repartition(4)
    )
    t.delete("g = 3")
    df = t.read()
    plan = formatted_plan(df)
    assert broadcast_join_count(df) >= 1
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert shuffle_count(df) == 0

"""Invariants for the deterministic sampling / splitting / chunking /
packing operators (batch 11) — properties the oracle parity test can't
see: nestedness, disjointness, reconstruction, capacity bounds, and
layout-independence.
"""

import pytest
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    stratified_sample,
)
from emr_on_eks_hudi_iceberg_delta_spark.operators.text import (
    chunk_documents,
    pack_documents,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").cache()


def test_sample_rates_are_nested(docs):
    """A hash-threshold sample at a lower rate is a strict subset of the
    same-salt sample at a higher rate — lets a pipeline grow its sample
    without resampling everything."""
    small = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.05).collect()}
    large = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.20).collect()}
    assert small and small < large


def test_sample_salt_decorrelates(docs):
    a = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2, salt="a").collect()}
    b = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2, salt="b").collect()}
    n = docs.count()
    overlap = len(a & b)
    # independent 20% samples overlap ~4%; same-salt would overlap 100%
    assert overlap < 0.12 * n


def test_sample_is_layout_independent(docs):
    base = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.1).collect()}
    shuffled = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(17), "doc_id", 0.1).collect()
    }
    assert base == shuffled


def test_hash_split_partitions_every_row(docs):
    split = hash_split(docs, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n  # total partition, no row lost
    assert set(counts) == {"train", "valid", "test"}
    assert counts["train"] > counts["valid"] and counts["train"] > counts["test"]
    # rates hold to within a few points at n≈1e3
    assert abs(counts["train"] / n - 0.8) < 0.08


def test_stratified_keeps_default_strata_whole(docs):
    sampled = stratified_sample(docs, "doc_id", "lang", {"en": 0.2}, default_rate=1.0)
    full = docs.filter(F.col("lang") != "en").count()
    kept = sampled.filter(F.col("lang") != "en").count()
    assert kept == full
    en_full = docs.filter(F.col("lang") == "en").count()
    en_kept = sampled.filter(F.col("lang") == "en").count()
    assert 0 < en_kept < en_full


def test_chunks_reconstruct_document(docs):
    """With stride == chunk_size (no overlap), concatenating chunks in
    order rebuilds the exact document text."""
    chunks = chunk_documents(docs, chunk_size=100, stride=100)
    rebuilt = chunks.groupBy("doc_id").agg(
        F.concat_ws(
            "", F.transform(F.array_sort(F.collect_list(F.struct("chunk_id", "chunk"))),
                            lambda s: s.chunk)
        ).alias("rebuilt")
    )
    joined = docs.join(rebuilt, "doc_id")
    assert joined.filter(F.col("text") != F.col("rebuilt")).count() == 0


def test_chunk_overlap_and_bounds(docs):
    chunks = chunk_documents(docs, chunk_size=200, stride=150)
    assert chunks.filter(F.length("chunk") > 200).count() == 0
    assert chunks.filter(F.length("chunk") < 1).count() == 0
    # every doc yields ceil(max(len,1)/150) chunks — the last one starts
    # within the text
    per_doc = chunks.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    expected = docs.select(
        "doc_id",
        (F.floor((F.greatest(F.length("text"), F.lit(1)) - 1) / 150) + 1).alias("want"),
    )
    assert per_doc.join(expected, "doc_id").filter(
        F.col("n_chunks") != F.col("want")
    ).count() == 0


def test_packing_respects_capacity_slack(docs):
    """Cumsum binning: a bin's content is < capacity + the size of its one
    straddling document; bin ids per source are dense from 0."""
    packed = pack_documents(docs, "n_chars", 4000, "source", "doc_id")
    max_doc = docs.agg(F.max("n_chars")).collect()[0][0]
    bins = packed.groupBy("source", "bin").agg(F.sum("n_chars").alias("sz"))
    assert bins.filter(F.col("sz") >= 4000 + max_doc).count() == 0
    firsts = packed.groupBy("source").agg(F.min("bin").alias("b0"))
    assert firsts.filter(F.col("b0") != 0).count() == 0


def test_connected_components_transitive_exactness(spark):
    """Edges (1,3),(2,3): single-pass canonical keeps both 1 and 2 (local
    minima); connected components collapses the whole cluster to min=1."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
        connected_components,
        dedup_keep_canonical,
    )

    pairs = spark.createDataFrame([(1, 3), (2, 3), (10, 11)], ["id_a", "id_b"])
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], ["doc_id"])
    cc = {r.doc_id: r.component for r in connected_components(pairs, ids, "doc_id").collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}
    survivors = {r.doc_id for r in dedup_keep_canonical(pairs, ids, "doc_id").collect()}
    assert survivors == {1, 2, 10, 99}  # the documented over-retention


# -- weighted (Poisson) sampling -------------------------------------------


def test_weighted_sample_is_deterministic_and_layout_independent(docs):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sampling import (
        weighted_sample,
    )

    a = {r.doc_id for r in weighted_sample(docs, "doc_id", "n_chars", 100).collect()}
    b = {
        r.doc_id
        for r in weighted_sample(
            docs.repartition(7), "doc_id", "n_chars", 100
        ).collect()
    }
    assert a == b and a  # same sample under any partitioning


def test_weighted_sample_expected_size_and_weight_bias(docs):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sampling import (
        weighted_sample,
    )

    n_total = docs.count()
    sampled = weighted_sample(docs, "doc_id", "n_chars", 100)
    n = sampled.count()
    # expected size = 100; Poisson spread at n=100 is ~±30 at 3 sigma
    assert 60 <= n <= 140
    # weight-proportional: the sample's mean weight exceeds the corpus mean
    mean_all = docs.agg(F.avg("n_chars")).first()[0]
    mean_sample = sampled.agg(F.avg("n_chars")).first()[0]
    assert mean_sample > mean_all
    assert n < n_total


def test_weighted_sample_zero_weight_never_kept(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(i, 0 if i % 2 == 0 else 1000) for i in range(200)], "id long, w long"
    )
    kept = weighted_sample(df, "id", "w", target_rows=50)
    assert kept.filter(F.col("w") == 0).count() == 0


def test_exact_k_per_stratum_counts_and_determinism(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sampling import (
        exact_k_per_stratum,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang"
    )
    out = exact_k_per_stratum(docs, "lang", "doc_id", k=5)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(5, sizes[lang]), lang
    # deterministic across runs and repartitionings
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, exact_k_per_stratum(docs.repartition(7), "lang", "doc_id", k=5).collect()))
    assert a == b
    # a different salt picks a different (still deterministic) subset
    c = sorted(map(tuple, exact_k_per_stratum(docs, "lang", "doc_id", k=5, salt="v2").collect()))
    assert c != a


def test_leakage_safe_split_keeps_clusters_whole(spark):
    """No near-dup component may span train and test — the invariant the
    operator exists for; and singleton docs must split at the configured
    rates (roughly)."""
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = ngram_jaccard_pairs(
        docs, lsh_candidate_pairs(minhash_signatures(docs)), threshold=0.5
    )
    out = leakage_safe_split(
        docs, pairs, "doc_id", {"train": 0.8, "test": 0.2}, salt="t:"
    )
    spans = (
        out.groupBy("component")
        .agg(F.count_distinct("split").alias("k"))
        .filter("k > 1")
        .count()
    )
    assert spans == 0
    assert out.count() == docs.count()
    # a naive per-doc split DOES leak on this corpus (the trap is real):
    # some verified near-dup pair crosses the naive boundary
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sampling import (
        hash_split,
    )

    naive = hash_split(docs, "doc_id", {"train": 0.8, "test": 0.2}, salt="t:")
    crossed = (
        pairs.join(
            naive.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")),
            "id_a",
        )
        .join(
            naive.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")),
            "id_b",
        )
        .filter("sa != sb")
        .count()
    )
    assert crossed > 0
    rates = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert rates.get("train", 0) > rates.get("test", 0) > 0


# ------------------------- poisson_bootstrap_ci -----------------------------

def test_bootstrap_ci_brackets_mean_and_is_layout_independent(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sampling import (
        poisson_bootstrap_ci,
    )

    # deterministic synthetic: values 0..999 in one group, true mean 499.5
    df = spark.range(1000).select(
        F.lit("g").alias("grp"),
        F.col("id").cast("double").alias("v"),
        F.col("id").alias("rid"),
    )
    row = poisson_bootstrap_ci(df, "grp", "v", "rid", reps=32).collect()[0]
    assert row["ci_lo"] < row["mean"] < row["ci_hi"]
    assert row["mean"] == 499.5
    # a 90% CI of the mean of U(0,1000) at n=1000 is ~±15; sanity band
    assert 450 < row["ci_lo"] < 499.5 < row["ci_hi"] < 550
    # identical endpoints under a different physical layout
    row2 = poisson_bootstrap_ci(
        df.repartition(13).sortWithinPartitions(F.desc("rid")),
        "grp", "v", "rid", reps=32,
    ).collect()[0]
    assert (row["ci_lo"], row["ci_hi"]) == (row2["ci_lo"], row2["ci_hi"])


def test_bootstrap_weights_are_poisson1_shaped(spark):
    """Mean replicate weight ~= 1 (Poisson(1)): total resampled mass per
    replicate stays within 10% of n at n=2000."""
    from emr_on_eks_hudi_iceberg_delta_spark.functions.hashing import (
        md5_hash64,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sampling import (
        POISSON1_THRESHOLDS_2_60,
    )

    n = 2000
    df = spark.range(n).select(F.col("id").cast("string").alias("rid"))
    h = md5_hash64(F.concat(F.lit("boot0:"), F.col("rid")))
    w = sum((h >= F.lit(t)).cast("int") for t in POISSON1_THRESHOLDS_2_60)
    tot = df.select(w.alias("w")).agg(F.sum("w")).collect()[0][0]
    assert 0.9 * n < tot < 1.1 * n


# ------------------------ class_balanced_sample -----------------------------

def test_class_balanced_auto_cap_balances_to_minority(spark):
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sampling import (
        class_balanced_sample,
    )

    df = spark.createDataFrame(
        [(i, "big") for i in range(90)] + [(100 + i, "small") for i in range(7)],
        "id bigint, label string",
    )
    out = class_balanced_sample(df, "id", "label")
    counts = {
        r["label"]: r["n"]
        for r in out.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"big": 7, "small": 7}


def test_class_balanced_fixed_matches_exact_k(spark):
    """per_class=k delegates to exact_k_per_stratum with the same salt
    contract — identical selections."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sampling import (
        class_balanced_sample,
        exact_k_per_stratum,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(60)],
        "id bigint, label string",
    )
    a = {
        (r["id"], r["label"])
        for r in class_balanced_sample(df, "id", "label", per_class=5).collect()
    }
    b = {
        (r["id"], r["label"])
        for r in exact_k_per_stratum(df, "label", "id", 5, salt="bal:").collect()
    }
    assert a == b and len(a) == 10


def test_bootstrap_diff_ci_detects_planted_effect(spark):
    """Two groups with a real mean gap -> CI excludes 0; identical
    groups -> CI straddles 0 and significant = 0."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sampling import (
        poisson_bootstrap_diff_ci,
    )

    base = spark.range(2000)
    df = base.select(
        F.when(F.col("id") % 2 == 0, F.lit("A")).otherwise(F.lit("B"))
        .alias("g"),
        (
            F.col("id") % 100
            + F.when(F.col("id") % 2 == 0, F.lit(50)).otherwise(F.lit(0))
        ).cast("double").alias("v"),
        F.col("id").alias("rid"),
    )
    row = poisson_bootstrap_diff_ci(
        df, "g", "A", "B", "v", "rid", reps=32
    ).collect()[0]
    assert row["significant"] == 1 and row["ci_lo"] > 30
    assert abs(row["diff"] - 50.0) < 5

    null = base.select(
        F.when(F.col("id") % 2 == 0, F.lit("A")).otherwise(F.lit("B"))
        .alias("g"),
        (F.col("id") % 100).cast("double").alias("v"),
        F.col("id").alias("rid"),
    )
    row0 = poisson_bootstrap_diff_ci(
        null, "g", "A", "B", "v", "rid", reps=32
    ).collect()[0]
    assert row0["significant"] == 0
    assert row0["ci_lo"] < 0 < row0["ci_hi"]


def test_bootstrap_small_groups_drop_empty_resamples(spark):
    """ADVICE r8: a (group, replicate) whose every row draws Poisson
    weight 0 must be DROPPED, not divide by zero (ANSI mode throws).
    A 1-row group empties ~37% of replicates — the crash repro."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sampling import (
        bootstrap_replicate_means,
        poisson_bootstrap_ci,
    )

    df = spark.createDataFrame(
        [("solo", 7.0, "r1")]
        + [("big", float(i % 10), f"b{i}") for i in range(200)],
        "g string, v double, rid string",
    )
    reps = bootstrap_replicate_means(df, "g", "v", "rid", reps=32)
    rows = reps.collect()
    solo = [r for r in rows if r["__g"] == "solo"]
    # survivors only, and every survivor's mean is the single value
    assert 0 < len(solo) < 32
    assert all(r["__mean_b"] == 7.0 for r in solo)

    out = {r["g"]: r for r in poisson_bootstrap_ci(
        df, "g", "v", "rid", reps=32
    ).collect()}
    assert out["solo"]["mean"] == 7.0
    # big group keeps all 32 replicates -> proper CI brackets the mean
    big = out["big"]
    assert big["ci_lo"] <= big["mean"] <= big["ci_hi"]


def test_bootstrap_diff_ci_single_row_groups_do_not_crash(spark):
    """The paired diff CI inner-joins surviving replicates; 1-row
    groups must yield a row (possibly NULL bounds), never an error."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sampling import (
        poisson_bootstrap_diff_ci,
    )

    df = spark.createDataFrame(
        [("A", 3.0, "a1"), ("B", 1.0, "b1")],
        "g string, v double, rid string",
    )
    row = poisson_bootstrap_diff_ci(
        df, "g", "A", "B", "v", "rid", reps=32
    ).collect()[0]
    assert row["mean_a"] == 3.0 and row["mean_b"] == 1.0
    assert row["diff"] == 2.0


def test_wide_bootstrap_bit_equals_tall(spark):
    """r10: the no-explode twin must be BIT-equal to the tall path —
    same draws, same decimal sums, same closing division."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.sampling import (
        poisson_bootstrap_ci,
        poisson_bootstrap_ci_wide,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    tall = sorted(
        map(
            tuple,
            poisson_bootstrap_ci(
                ev, "event_type", "value", "event_id", reps=32
            ).collect(),
        )
    )
    wide = sorted(
        map(
            tuple,
            poisson_bootstrap_ci_wide(
                ev, "event_type", "value", "event_id", reps=32
            ).collect(),
        )
    )
    assert tall == wide and len(tall) >= 1


def test_wide_bootstrap_single_scan_no_explode(spark):
    """r10 plan pin: the wide twin reads events ONCE and its plan has
    no explode/generate node."""
    from emr_on_eks_hudi_iceberg_delta_spark.plans import (
        file_scan_count,
        formatted_plan,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.queries import REGISTRY

    df = REGISTRY["bootstrap_group_mean_ci_wide"].fn(
        spark, "/root/testdata/sf0.001"
    )
    assert file_scan_count(df) == 1
    assert "Generate" not in formatted_plan(df)

"""Shard export (operators/sharding.py): stable assignment, exact
round-trip through the shard dirs, manifest agreement, bounded file
counts, and layout-independence of the assignment."""

import glob
import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.operators.sharding import (
    assign_shards,
    export_shards,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )


def test_assignment_stable_across_layouts(spark):
    docs = _docs(spark)
    a = {
        r["doc_id"]: r["shard_id"]
        for r in assign_shards(docs, "doc_id", 8).collect()
    }
    b = {
        r["doc_id"]: r["shard_id"]
        for r in assign_shards(docs.repartition(17), "doc_id", 8).collect()
    }
    assert a == b
    assert set(a.values()) == set(range(8))


def test_export_roundtrip_and_manifest(spark):
    docs = _docs(spark)
    out = tempfile.mkdtemp(prefix="shards_")
    manifest = export_shards(docs, out, "doc_id", n_shards=4)
    m = {r["shard_id"]: r for r in manifest.collect()}
    assert set(m) == set(range(4))
    assert sum(r["n_rows"] for r in m.values()) == docs.count()
    # one task per shard -> one data file per shard
    for s, r in m.items():
        assert r["n_files"] == 1 and r["n_bytes"] > 0
        files = glob.glob(os.path.join(out, f"shard_id={s}", "*.parquet"))
        assert len(files) == 1
    # round-trip: the union of shard dirs is exactly the input
    back = spark.read.parquet(out)
    got = sorted(r["doc_id"] for r in back.collect())
    want = sorted(r["doc_id"] for r in docs.collect())
    assert got == want
    # every row sits in the shard its key hashes to
    expected = assign_shards(docs, "doc_id", 4)
    mismatch = (
        back.select("doc_id", F.col("shard_id").cast("int").alias("s"))
        .join(expected.select("doc_id", "shard_id"), "doc_id")
        .filter(F.col("s") != F.col("shard_id"))
        .count()
    )
    assert mismatch == 0
    # the persisted manifest file is engine-readable and matches
    mf = spark.read.json(os.path.join(out, "_shard_manifest.json"))
    assert sorted(
        (r["shard_id"], r["n_rows"]) for r in mf.collect()
    ) == sorted((s, r["n_rows"]) for s, r in m.items())


def test_files_per_shard_bounds_file_count(spark):
    docs = _docs(spark)
    out = tempfile.mkdtemp(prefix="shards_multi_")
    manifest = export_shards(
        docs, out, "doc_id", n_shards=2, files_per_shard=3
    )
    for r in manifest.collect():
        assert 1 <= r["n_files"] <= 3  # a file salt bucket can be empty
    assert spark.read.parquet(out).count() == docs.count()


def test_manifest_digest_verifies_loader_side(spark):
    """The loader contract: recompute the digest triple from a shard dir
    and compare with the manifest; corrupt delivery (a dropped row) must
    mismatch on count and hash_sum."""
    import tempfile

    from emr_on_eks_hudi_iceberg_delta_spark.operators.validate import (
        row_hash_expr,
    )

    docs = _docs(spark)
    out = tempfile.mkdtemp(prefix="shards_digest_")
    manifest = {r["shard_id"]: r for r in export_shards(
        docs, out, "doc_id", n_shards=3
    ).collect()}
    cols = sorted(docs.columns)

    def digest(frame):
        r = frame.select(row_hash_expr(cols).alias("__h")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("__h").cast("decimal(38,0)"))
            .cast("decimal(38,0)").cast("string").alias("hs"),
            F.bit_xor("__h").alias("hx"),
        ).collect()[0]
        return (r["n"], r["hs"], r["hx"])

    shard0 = spark.read.parquet(f"{out}/shard_id=0")
    n, hs, hx = digest(shard0)
    m = manifest[0]
    assert (n, hs, hx) == (m["n_rows"], m["hash_sum"], m["hash_xor"])

    # simulate corruption: drop one row -> digest disagrees
    n2, hs2, _ = digest(shard0.limit(n - 1))
    assert n2 != m["n_rows"] and hs2 != m["hash_sum"]


def test_ordered_export_sorts_within_files(spark):
    import glob
    import tempfile

    docs = _docs(spark)
    out = tempfile.mkdtemp(prefix="shards_ord_")
    manifest = export_shards(
        docs, out, "doc_id", n_shards=2, order_by=["n_chars"]
    )
    assert {r["shard_id"] for r in manifest.collect()} == {0, 1}
    for s in (0, 1):
        (f,) = glob.glob(f"{out}/shard_id={s}/*.parquet")
        vals = [r["n_chars"] for r in spark.read.parquet(f).collect()]
        assert vals == sorted(vals) and len(vals) > 0

"""Stable dataset sharding and shard export — the delivery stage of a
training-data pipeline: a curated corpus leaves the lakehouse as N
addressable shards that (a) assign every row deterministically (same key
-> same shard on every run, any cluster layout, any engine — the
md5-derived hash the sampling/split operators already use), (b) are
size-balanced, and (c) carry a manifest a downstream loader can verify
against.

Scale contract: assignment is a pure per-row map (zero shuffle);
``export_shards`` moves every row exactly ONCE — a single hash
repartition on the shard id into ``partitionBy`` dirs (each shard is one
write task, so file counts stay O(shards), not O(shards x input
partitions)); balance stats are one map-side-combined aggregate. At
100 TB raise ``files_per_shard`` so single shard files stay near the
128-512 MiB sweet spot instead of one giant file per shard.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64


def shard_id_expr(key: Column, n_shards: int, salt: str = "") -> Column:
    """Deterministic shard in ``[0, n_shards)`` from a key column.
    DuckDB oracle twin:
    ``CAST(concat('0x', substr(md5(<salted key>),1,15)) AS BIGINT) % n``.
    ``salt`` decouples shard layout from other hash decisions (a row's
    shard must not correlate with its sample/split bucket)."""
    keyed = (
        F.concat(F.lit(salt), key.cast("string")) if salt else key.cast("string")
    )
    return (md5_hash64(keyed) % n_shards).cast("int")


def assign_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Label every row with its stable shard id — a zero-shuffle map."""
    return df.withColumn(
        shard_col, shard_id_expr(F.col(key_col), n_shards, salt)
    )


def shard_balance_stats(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-shard row counts (and optional weight sums, e.g. chars or
    tokens — the balance a loader actually cares about) plus each shard's
    ratio to the mean load. One aggregate pass; exact oracle."""
    from pyspark.sql import Window

    sharded = assign_shards(df, key_col, n_shards, salt)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    if weight_col is not None:
        aggs.append(
            F.sum(F.col(weight_col).cast("bigint")).alias("total_weight")
        )
    counts = sharded.groupBy("shard_id").agg(*aggs)
    # mean load via an unpartitioned window OVER THE AGGREGATE — the
    # relation here is n_shards rows, so the single-task window is free,
    # and unlike a separate mean-aggregate branch it does NOT double-
    # reference (and therefore double-SCAN) the corpus subtree; avg of
    # BIGINTs is exact-integer-sum / count, replayable cross-engine
    mean = F.avg("n_rows").over(Window.partitionBy())
    return counts.select(
        "shard_id",
        "n_rows",
        *(["total_weight"] if weight_col is not None else []),
        (F.col("n_rows").cast("double") / mean).alias("load_ratio"),
    )


def export_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    salt: str = "",
    files_per_shard: int = 1,
    file_format: str = "parquet",
    verify: bool = True,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Write ``df`` as ``path/shard_id=K/`` dirs and return the manifest
    DataFrame ``(shard_id, n_rows, n_files, n_bytes, hash_sum,
    hash_xor)``, also persisted as ``path/_shard_manifest.json``
    (single JSON-lines file, written via Spark so the manifest itself
    is engine-readable).

    One data movement total: rows hash-repartition on (shard_id, a
    within-shard file salt) so each output file is one task's write —
    ``n_shards x files_per_shard`` files regardless of input layout.

    ``order_by`` sorts rows WITHIN each output file (length-grouped
    loading); the multiset digests below are order-independent, so the
    integrity contract is unchanged.

    The manifest carries each shard's order-independent CONTENT DIGEST
    (operators/validate.py triple over the data columns, sorted by name
    to pin the encoding): a downstream loader re-derives the digest of
    what it read and compares — tamper/truncation detection per shard
    with one aggregate, no row-by-row compare. With ``verify=True`` the
    export ALSO recomputes the digests from the files just written and
    raises if any shard's digest disagrees with the input's (a
    self-verifying delivery: one extra read of the written data).
    """
    sharded = assign_shards(df, key_col, n_shards, salt)
    file_in_shard = (
        md5_hash64(F.concat(F.lit("file:"), F.col(key_col).cast("string")))
        % files_per_shard
    ).cast("int")
    writer = sharded.repartition(
        n_shards * files_per_shard, F.col("shard_id"), file_in_shard
    )
    if order_by:
        # within-file ordering (e.g. by token count): sequence-length-
        # grouped batching at load time without a loader-side sort —
        # each write task holds one (shard, file) group, so
        # sortWithinPartitions IS the file order; digests are
        # order-independent, so verification is unaffected
        # shard_id leads the sort: the partitioned file writer requires
        # input ordered by its partition columns and injects its own
        # sort otherwise — which would DESTROY the secondary order
        writer = writer.sortWithinPartitions("shard_id", *order_by)
    (
        writer.write.mode("overwrite")
        .partitionBy("shard_id")
        .format(file_format)
        .save(path)
    )
    spark = df.sparkSession
    digest_cols = sorted(c for c in df.columns)

    def _shard_digests(frame: DataFrame) -> dict[int, tuple]:
        from .validate import row_hash_expr

        agg = (
            frame.select(
                F.col("shard_id").cast("int").alias("shard_id"),
                row_hash_expr(digest_cols).alias("__h"),
            )
            .groupBy("shard_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.col("__h").cast("decimal(38,0)"))
                .cast("decimal(38,0)")
                .cast("string")
                .alias("hs"),
                F.bit_xor("__h").cast("bigint").alias("hx"),
            )
        )
        return {r["shard_id"]: (r["n"], r["hs"], r["hx"]) for r in agg.collect()}

    back = spark.read.format(file_format).load(path)
    got = _shard_digests(back)
    if verify:
        # the input-side digests cost a full second scan of the source —
        # computed (and compared) only when verification is requested
        # (ADVICE r6: verify=False exports pay one write + one read-back)
        want = _shard_digests(sharded)
        if got != want:
            bad = sorted(
                k for k in set(want) | set(got) if want.get(k) != got.get(k)
            )
            raise IOError(
                f"export_shards: digest mismatch on shards {bad} at {path}"
            )

    rows = []
    for entry in sorted(os.listdir(path)):
        if not entry.startswith("shard_id="):
            continue
        shard = int(entry.split("=", 1)[1])
        files = [
            os.path.join(path, entry, f)
            for f in os.listdir(os.path.join(path, entry))
            if not f.startswith(("_", "."))
        ]
        n, hs, hx = got[shard]
        rows.append(
            (shard, n, len(files), sum(os.path.getsize(f) for f in files), hs, hx)
        )
    manifest = spark.createDataFrame(
        rows,
        schema="shard_id int, n_rows bigint, n_files int, n_bytes bigint, "
        "hash_sum string, hash_xor bigint",
    )
    manifest.coalesce(1).write.mode("overwrite").json(
        os.path.join(path, "_shard_manifest.json")
    )
    return manifest

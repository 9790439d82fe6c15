"""stream_minibatch_kmeans (streaming/ml.py): the centroid/count
trajectory over replayed micro-batches must exactly equal a
same-convention numpy host replay of the same batch sequence, and the
optional history table must version one commit per batch."""

import os
import sys
import tempfile

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.streaming.ml import (
    stream_minibatch_kmeans,
)

SF = "/root/testdata/sf0.001"
K = 8


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _host_replay(slices, seeds):
    C = np.round(np.asarray(seeds, dtype=np.float64), 9)
    n = np.zeros(K, dtype=np.int64)
    for V in slices:
        d = (V * V).sum(axis=1, keepdims=True) - 2.0 * (V @ C.T) + (C * C).sum(
            axis=1
        )
        cell = d.argmin(axis=1)
        newC = C.copy()
        for c in range(K):
            m = cell == c
            if m.sum():
                s = V[m].sum(axis=0)
                newC[c] = (newC[c] * n[c] + s) / (n[c] + m.sum())
                n[c] += m.sum()
        C = np.round(newC, 9)
    return C, n


def test_matches_host_replay_and_versions_history(spark, tmp_path):
    from emr_on_eks_hudi_iceberg_delta_spark.sources.tables import (
        VersionedTable,
    )

    emb = _emb(spark)
    stage = tempfile.mkdtemp(prefix="mbk_test_")
    slices = []
    for i in range(4):
        sl = emb.filter(F.col("vec_id") % 4 == i)
        sl.coalesce(1).write.mode("append").parquet(stage)
        rows = sorted(
            sl.select("vec_id", emb.embedding.cast("array<double>")).collect(),
            key=lambda r: r[0],
        )
        slices.append(
            np.vstack([np.asarray(r[1], dtype=np.float64) for r in rows])
        )
    seeds = [
        list(r["e"])
        for r in emb.select(
            F.col("embedding").cast("array<double>").alias("e")
        ).orderBy("vec_id").limit(K).collect()
    ]
    hist = VersionedTable(spark, str(tmp_path / "mbk_hist"))
    hist.overwrite(
        spark.createDataFrame([], "batch_id long, cell int, ce array<double>")
    )
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    C, counts, n_batches = stream_minibatch_kmeans(
        stream, seeds, history_table=hist
    )
    assert n_batches == 4
    wc, wn = _host_replay(slices, seeds)
    # NOTE: batch order == slice write order (file source sorts backlog
    # by modification time; the four sequential writes are seconds apart)
    np.testing.assert_allclose(C, wc, rtol=0, atol=0)
    assert counts == wn.tolist()
    assert sum(counts) == emb.count()
    # one history commit per batch (plus the seed overwrite at v0)
    assert len(hist.history()) == 1 + n_batches
    final = hist.read().filter(F.col("batch_id") == 3)
    got = np.vstack(
        [r["ce"] for r in sorted(final.collect(), key=lambda r: r["cell"])]
    )
    np.testing.assert_allclose(got, wc, rtol=0, atol=0)


def test_streaming_state_metrics_exposed(spark):
    """StreamingQuery progress observability: the state-store metrics a
    production runbook watches (rows in state, updated rows, watermark)
    are present and sane on a windowed aggregate replay."""
    import tempfile
    import uuid

    from emr_on_eks_hudi_iceberg_delta_spark.sources.parquet import (
        load_table,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.streaming.events import (
        EVENTS_SCHEMA,
        stream_tumbling_counts,
    )

    stage = tempfile.mkdtemp(prefix="obs_stage_")
    load_table(spark, SF, "events").coalesce(2).write.mode("append").parquet(
        stage
    )
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(stage)
    name = f"obs_{uuid.uuid4().hex[:8]}"
    q = (
        stream_tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="obs_ckpt_")
        )
        .start()
    )
    q.awaitTermination()
    progresses = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert progresses, "no progress with input rows recorded"
    state = progresses[-1]["stateOperators"][0]
    n_windows = spark.table(name).count()
    assert state["numRowsTotal"] == n_windows > 0
    assert state["numRowsUpdated"] > 0

"""Streaming machine-learning operators: incremental model state folded
over micro-batches via ``foreachBatch``.

``stream_minibatch_kmeans`` is the streaming twin of
``operators/similarity.kmeans_lloyd`` — the running-mean ("streaming
k-means", MLlib's decay=1 formulation; the aggregated form of Sculley's
mini-batch updates): per micro-batch, assign every arriving vector to
its nearest centroid and fold the batch's per-cell sums into the
per-cell RUNNING means,

    C_c' = (C_c * n_c + sum_batch_c) / (n_c + cnt_batch_c)

so each centroid is always the exact mean of every vector ever assigned
to it AT THE TIME it was assigned (order-dependent, as streaming
learning is; deterministic given the batch sequence — pinned by a host
replay test).

Scale/state contract mirrors the batch operator: the per-batch work is
ONE mapInPandas scan of the batch (gemm argmin fused with per-cell
partial sums — only batches x k partial rows leave the executors);
driver state is k centroids + k counts (KBs); 1e-9 centroid rounding
after every fold keeps run-to-run determinism. Each fold appends the
post-batch centroids to a ``VersionedTable`` when given one — model
checkpointing as table commits, time-travel over training history.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_minibatch_kmeans(
    vec_stream: DataFrame,
    seeds: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    history_table=None,
):
    """Run the streaming fold to completion (AvailableNow) and return
    ``(centroids ndarray, counts list, n_batches)``. ``seeds`` fixes the
    initial centroids (take the first k corpus vectors by id for parity
    with the batch operator). ``history_table`` (a ``VersionedTable``)
    receives one commit per micro-batch with the post-fold centroids.
    """
    import pandas as pd
    from pyspark.sql import types as T

    state = {
        "C": np.round(
            np.asarray(seeds, dtype=np.float64), 9
        ),
        "n": np.zeros(len(seeds), dtype=np.int64),
        "batches": 0,
    }
    k = state["C"].shape[0]

    partial_schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("sumvec", T.ArrayType(T.DoubleType())),
        ]
    )

    def fold_batch(batch_df, batch_id):
        C = state["C"]
        c_sq = (C * C).sum(axis=1)

        def partials(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                V = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
                d = (
                    (V * V).sum(axis=1, keepdims=True)
                    - 2.0 * (V @ C.T)
                    + c_sq
                )
                cell = d.argmin(axis=1)
                rows = []
                for c in np.unique(cell):
                    m = cell == c
                    rows.append(
                        {
                            "cell": int(c),
                            "n": int(m.sum()),
                            "sumvec": V[m].sum(axis=0).tolist(),
                        }
                    )
                yield pd.DataFrame(rows)

        e = batch_df.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("e")
        )
        folded = (
            e.mapInPandas(partials, partial_schema)
            .groupBy("cell")
            .agg(
                F.sum("n").alias("n"),
                F.aggregate(
                    F.collect_list("sumvec"),
                    F.array_repeat(F.lit(0.0), int(C.shape[1])),
                    lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
                ).alias("sumvec"),
            )
        )
        newC, newN = state["C"].copy(), state["n"].copy()
        for r in folded.collect():
            c = r["cell"]
            cnt = r["n"]
            s = np.asarray(r["sumvec"])
            newC[c] = (newC[c] * newN[c] + s) / (newN[c] + cnt)
            newN[c] += cnt
        state["C"] = np.round(newC, 9)
        state["n"] = newN
        state["batches"] += 1
        if history_table is not None:
            spark = batch_df.sparkSession
            history_table.append(
                spark.createDataFrame(
                    [
                        (int(batch_id), int(i), state["C"][i].tolist())
                        for i in range(k)
                    ],
                    schema="batch_id long, cell int, ce array<double>",
                )
            )

    q = (
        vec_stream.writeStream.foreachBatch(fold_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            __import__("tempfile").mkdtemp(prefix="mbk_ckpt_"),
        )
        .start()
    )
    q.awaitTermination()
    return state["C"], state["n"].tolist(), state["batches"]

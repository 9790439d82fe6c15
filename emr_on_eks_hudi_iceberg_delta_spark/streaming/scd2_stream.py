"""Streaming SCD2 ingestion — the reference's incremental merge, continuous.

The reference runs SCD2 "incrementally" by hand-launching a second batch
job over an update file (hudi/hudi_scd_script.py:72-74). The natural
100 TB-scale generalization is a stream of update batches applied through
``foreachBatch``: each micro-batch runs the same merge operator against the
versioned table, giving exactly-once table evolution with the identical
semantics contract (the §2.11 invariant holds after every batch).

``foreachBatch`` is the right tool (not a streaming agg): the merge needs
the *current table state* per batch — a batch-side join the streaming
engine cannot express as incremental state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.merge import scd2_merge_hudi_style
from ..sources.tables import VersionedTable


def stream_scd2_into(
    table: VersionedTable,
    updates_stream: DataFrame,
    key_col: str,
    checksum_cols: list[str],
    checkpoint_dir: str,
    as_of_fn=None,
):
    """Apply a stream of raw update rows to an SCD2 ``VersionedTable``.

    Each micro-batch: read current snapshot -> hudi-style merge -> commit a
    new snapshot. ``as_of_fn(batch_id)`` injects deterministic batch
    timestamps for tests; production leaves it None (load-time stamping,
    like the reference).

    Returns the StreamingQuery (caller awaits termination).
    """

    app_id = f"scd2_stream:{checkpoint_dir}"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # foreachBatch replays a batch when the stream restarts after a
        # commit succeeded but the checkpoint write did not. The Delta
        # txnAppId/txnVersion pattern makes the sink exactly-once: the
        # batch id is recorded in the commit, and an already-applied id
        # is skipped instead of re-merged.
        if batch_id <= table.txn_version(app_id):
            return
        as_of = as_of_fn(batch_id) if as_of_fn else None
        merged = scd2_merge_hudi_style(
            table.read(), batch_df, key_col, checksum_cols, as_of=as_of
        )
        table._commit(merged, txn=(app_id, batch_id))

    return (
        updates_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_upsert_partitioned(
    table,
    updates_stream: DataFrame,
    key_cols: list[str],
    precombine_col: str,
    checkpoint_dir: str,
):
    """Streaming keyed upsert into a ``PartitionedTable`` — the 100 TB
    streaming write path: each micro-batch rewrites ONLY the partitions it
    touches (partition-scoped CoW), so sink cost tracks batch size, not
    table size. The batch-id guard in the manifest makes replays
    idempotent after checkpoint races (same exactly-once pattern as
    ``stream_scd2_into``)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        versions = table.history()
        applied = versions[-1].get("txn_batch", -1) if versions else -1
        if batch_id <= applied:
            return
        table.upsert(batch_df, key_cols, precombine_col)
        # record the applied batch id on the new manifest version
        doc = table._doc()
        doc["versions"][-1]["txn_batch"] = batch_id
        table._write_doc(doc)

    return (
        updates_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_incremental_mv(
    updates_stream: DataFrame,
    mv_table: VersionedTable,
    group_cols: list[str],
    sum_specs: dict[str, str],
    checkpoint_dir: str,
):
    """Streaming materialized-view maintenance: fold each micro-batch of an
    append-only stream into a stored COUNT+SUM aggregate table — the
    streaming twin of ``operators.materialized.refresh_aggregate_view``.

    Each batch is a pure insert delta (append-only source), so the fold
    adds the batch's partial aggregate to the stored view; DECIMAL
    accumulation keeps the result bit-identical to a from-scratch batch
    aggregate of everything ingested, after any number of micro-batches.
    The Delta txnAppId/txnVersion pattern (``txn_version``) makes replayed
    batches no-ops, so the sink is exactly-once under restart races.

    Scale: per batch, one aggregate of the batch on the view key + one
    key-partitioned join against the stored view — refresh cost tracks
    batch size, never total ingested volume. That is the entire reason to
    maintain the view incrementally instead of recomputing it."""
    from ..operators.materialized import aggregate_view, refresh_aggregate_view

    app_id = f"mv_stream:{checkpoint_dir}"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if batch_id <= mv_table.txn_version(app_id):
            return
        try:
            mv = mv_table.read()
        except FileNotFoundError:
            mv = None
        if mv is None:
            refreshed = aggregate_view(batch_df, group_cols, sum_specs)
        else:
            delta = batch_df.withColumn(
                "_change_type", F.lit("insert")
            )
            refreshed = refresh_aggregate_view(mv, delta, group_cols, sum_specs)
        mv_table._commit(refreshed, txn=(app_id, batch_id))

    return (
        updates_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

"""Versioned table store — the lake-format write surface, on plain parquet.

Reproduces the write capabilities the reference gets from format plugins:

* bulk insert / overwrite  (Hudi ``operation=insert`` + ``mode("overwrite")``,
  hudi/hudi_scd_script.py:66-70; Delta overwrite, delta/delta_scd_script.py:37-39)
* keyed upsert with precombine dedup  (Hudi ``operation=upsert`` with record
  key ``id,checksum`` and precombine field ``ts``, hudi/hudi_scd_script.py:32-36,
  115-119)
* create-or-replace via DataFrameWriterV2 semantics (iceberg_scd_script.py:34-37)
* catalog registration (Glue hive-sync, hudi/hudi_scd_script.py:37-40 —
  locally a temp/catalog view)

Copy-on-write semantics: every commit rewrites the table directory into a
fresh snapshot dir and flips a pointer file, so readers never observe a
half-written table and old snapshots remain for time travel (the parquet
analog of a Hudi CoW commit / Iceberg snapshot / Delta log entry). This is
single-writer by design — the reference's DynamoDB OCC lock
(hudi/hudi_scd_script.py:41-48) is multi-writer infrastructure out of local
scope (SURVEY.md §7).

Scale note: upsert rewrites are shuffle-on-key operations; at 100 TB the
key columns should be the table's partition/bucket columns so the
row_number window and the final write share one exchange.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_POINTER = "_current_snapshot.json"


class ConstraintViolationError(ValueError):
    """A CHECK constraint evaluated to FALSE for at least one row."""


class AppendOnlyViolationError(ValueError):
    """A rewrite was attempted on a ``delta.appendOnly=true`` table."""


class ConcurrentCommitError(RuntimeError):
    """Another writer committed between this writer's read and its commit
    (the local analog of a failed Hudi/Iceberg OCC lock acquisition —
    hudi/hudi_scd_script.py:42-48 uses DynamoDB for the same check)."""


from contextlib import contextmanager as _module_contextmanager


@_module_contextmanager
def file_lock(
    path: str,
    timeout: float = 30.0,
    poll: float = 0.05,
    stale_after: float = 300.0,
):
    """Cross-process mutual exclusion via an ``O_CREAT|O_EXCL`` lockfile
    with bounded retry and stale-lease breaking — the shared primitive
    behind ``VersionedTable.locked()`` and ``LakeCatalog`` document
    mutations (sources/catalog.py). On acquisition timeout raises
    ``ConcurrentCommitError``; a lock older than ``stale_after`` seconds
    (a crashed holder) is broken and re-acquired."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    deadline = time.time() + timeout
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            try:
                if time.time() - os.path.getmtime(path) > stale_after:
                    os.unlink(path)  # stale holder: break the lease
                    continue
            except FileNotFoundError:
                continue  # holder released between check and stat
            if time.time() > deadline:
                raise ConcurrentCommitError(
                    f"writer lock at {path} held past {timeout}s"
                )
            time.sleep(poll)
    try:
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        yield
    finally:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass


class VersionedTable:
    """A snapshot-versioned parquet table with keyed-upsert support."""

    def __init__(self, spark: SparkSession, location: str, name: str | None = None):
        self.spark = spark
        self.location = location.rstrip("/")
        self.name = name

    # -- snapshot plumbing ------------------------------------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.location, _POINTER)

    def _meta(self) -> dict:
        """Whole pointer document: {"snapshots": [...], "constraints":
        {...}} — every writer must round-trip unknown keys."""
        if not os.path.exists(self._pointer_path()):
            return {"snapshots": []}
        with open(self._pointer_path()) as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        os.makedirs(self.location, exist_ok=True)
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._pointer_path())  # atomic pointer flip

    def _snapshots(self) -> list[dict]:
        return self._meta()["snapshots"]

    def _current_snapshot(self, snaps: list[dict] | None = None) -> dict:
        """The newest NON-staged snapshot — the head ``read()`` serves.

        Every maintenance/read-side path (stats, bloom, file pruning,
        deferred deletes, auto-compaction, file listings, tagging) resolves
        the head through this helper, so a staged write-audit-publish
        snapshot can never leak unaudited data into them (mirror of
        Iceberg WAP semantics — a staged snapshot is durable and
        addressable by version, but is not the table until published)."""
        snaps = self._snapshots() if snaps is None else snaps
        snap = next((s for s in reversed(snaps) if not s.get("staged")), None)
        if snap is None:
            raise FileNotFoundError(
                f"no published snapshot at {self.location}"
            )
        return snap

    @staticmethod
    def _next_version(snaps: list[dict]) -> int:
        """Next free version id. max+1, NOT ``snaps[-1]+1``: ``publish()``
        keeps staged ids stable and only reorders the list, so the tail
        entry's version need not be the largest ever allocated."""
        return (max(s["version"] for s in snaps) + 1) if snaps else 0

    def current_snapshot_dir(self) -> str | None:
        snaps = self._snapshots()
        if not snaps:
            return None
        return self._current_snapshot(snaps)["dir"]

    def txn_version(self, app_id: str) -> int:
        """Highest transaction version committed by ``app_id`` (-1 if
        none) — the Delta ``txnVersion`` lookup an idempotent writer checks
        before re-applying a batch."""
        best = -1
        for s in self._snapshots():
            txn = s.get("txn")
            if txn and txn["app_id"] == app_id:
                best = max(best, txn["version"])
        return best

    def _commit(
        self,
        df: DataFrame,
        expected_version: int | None = None,
        txn: tuple[str, int] | None = None,
        op: str = "WRITE",
    ) -> None:
        """Write a snapshot and flip the pointer. ``expected_version`` is
        the optimistic-concurrency check: if another writer committed since
        this writer read that version, raise instead of silently clobbering
        (compare-and-swap on the snapshot version). ``txn`` is the Delta
        ``txnAppId``/``txnVersion`` idempotent-writer pattern: the
        (app_id, txn_version) pair is recorded in the commit so a replayed
        write can be detected and skipped (see ``txn_version``)."""
        meta = self._meta()
        snaps = meta["snapshots"]
        current = snaps[-1]["version"] if snaps else None
        if expected_version is not None and current != expected_version:
            raise ConcurrentCommitError(
                f"expected version {expected_version} but table is at {current}"
            )
        if (
            str(meta.get("properties", {}).get("delta.appendOnly", "")).lower()
            == "true"
            and snaps
            and op
            in ("WRITE", "DELETE", "UPDATE", "REPLACE WHERE", "MERGE",
                "RESTORE", "REVERT", "CHERRYPICK", "FAST-FORWARD")
        ):
            # Delta delta.appendOnly enforcement: once set, only APPEND
            # (and layout-preserving maintenance like OPTIMIZE) may
            # commit — rewrites that could drop or alter rows refuse.
            # The audit-log / event-archive contract; clear the property
            # to re-enable rewrites.
            raise AppendOnlyViolationError(
                f"table at {self.location} is delta.appendOnly=true — "
                f"{op} would rewrite rows; unset the property first"
            )
        for cname, cexpr in meta.get("constraints", {}).items():
            # Delta CHECK semantics: a row violates only when the
            # expression is FALSE (NULL/unknown passes)
            bad = df.filter(F.coalesce(F.expr(cexpr).cast("boolean"), F.lit(True)) == False)  # noqa: E712
            if not bad.isEmpty():
                raise ConstraintViolationError(
                    f"CHECK constraint {cname} ({cexpr}) violated by incoming rows"
                )
        for nn in meta.get("not_null", []):
            # Delta NOT NULL column constraints: validated at every
            # commit; a column absent from this snapshot's schema (post
            # drop/evolution) has nothing to validate
            if nn in df.columns and not df.filter(F.col(nn).isNull()).isEmpty():
                raise ConstraintViolationError(
                    f"NOT NULL constraint on {nn} violated by incoming rows"
                )
        for gname, gexpr in meta.get("generated", {}).items():
            # Delta generated-column semantics: an omitted column is
            # computed from its expression; a supplied one must MATCH the
            # expression (null-safe), else the commit is rejected
            if gname not in df.columns:
                df = df.withColumn(gname, F.expr(gexpr))
            else:
                bad = df.filter(~F.col(gname).eqNullSafe(F.expr(gexpr)))
                if not bad.isEmpty():
                    raise ConstraintViolationError(
                        f"generated column {gname} ({gexpr}) supplied with "
                        f"non-matching values"
                    )
        track = bool(meta.get("properties", {}).get("rowTracking.enabled"))
        hwm = int(meta.get("row_id_hwm", 0))
        if track:
            # Delta row-tracking analog: rows that already carry a
            # __row_id keep it (stability across CoW rewrites); rows
            # without one get fresh ids >= the high-water mark.
            # monotonically_increasing_id is unique within this plan and
            # evaluated exactly once (the write below is the only
            # action), so the persisted ids are consistent; ids are
            # sparse, never reused — uniqueness, not density, is the
            # contract (same trade Delta makes with per-file base ids).
            if "__row_id" not in df.columns:
                df = df.withColumn("__row_id", F.lit(None).cast("bigint"))
            df = df.withColumn(
                "__row_id",
                F.coalesce(
                    F.col("__row_id").cast("bigint"),
                    (F.lit(hwm) + F.monotonically_increasing_id()).cast(
                        "bigint"
                    ),
                ),
            )
        version = self._next_version(snaps)
        snap_dir = os.path.join(self.location, f"snapshot-{version:05d}")
        writer = df.write.mode("overwrite")
        codec = meta.get("properties", {}).get("write.compression")
        if codec:
            # per-table codec property (Delta/Iceberg write.* analog):
            # e.g. zstd trades ~2x CPU for ~30% smaller files — the right
            # default for cold corpus tables at 100 TB
            writer = writer.option("compression", str(codec))
        writer.parquet(snap_dir)
        if track:
            # advance the high-water mark from the WRITTEN files (one
            # column-pruned scan of the new snapshot — the ids the plan
            # materialized, not a re-evaluation)
            mx = (
                self.spark.read.parquet(snap_dir)
                .agg(F.max("__row_id"))
                .first()[0]
            )
            meta["row_id_hwm"] = max(hwm, (mx if mx is not None else -1) + 1)
        entry = {
            "version": version,
            "dir": snap_dir,
            "committed_at": time.time(),
            "operation": op,
        }
        if txn is not None:
            entry["txn"] = {"app_id": txn[0], "version": txn[1]}
        snaps.append(entry)
        self._write_meta(meta)
        if meta.get("properties", {}).get("symlinkFormatManifest.enabled"):
            # the table-property contract: every published commit refreshes
            # the external-engine manifest (delta_scd_script.py:44)
            self.generate_symlink_manifest()
        if self.name:
            self.read().createOrReplaceTempView(self.name)

    from contextlib import contextmanager as _contextmanager

    @_contextmanager
    def locked(
        self,
        timeout: float = 30.0,
        poll: float = 0.05,
        stale_after: float = 300.0,
    ):
        """Cross-PROCESS writer mutual exclusion — the local analog of
        the reference's DynamoDB lock provider (hudi/hudi_scd_script.py:
        41-48; iceberg_submit.sh:33-34 uses the same DynamoDB table):
        an ``O_CREAT|O_EXCL`` lockfile under the table root, acquired
        with bounded retry. Compose with the commit-level CAS
        (``expected_version``): the lock serializes writers, the CAS
        catches anyone who bypassed it.

        ``with table.locked(): table.upsert(...)`` — on timeout raises
        ``ConcurrentCommitError`` (the same failure a lost DynamoDB lock
        race surfaces). Crash-staleness: a lock older than
        ``stale_after`` seconds is broken and re-acquired, mirroring
        lock-provider lease expiry — deliberately a SEPARATE, much longer
        knob than the acquisition ``timeout`` (using one value would let
        an impatient waiter break a live holder's lock)."""
        with file_lock(
            os.path.join(self.location, "_writer.lock"),
            timeout=timeout,
            poll=poll,
            stale_after=stale_after,
        ):
            yield self

    # -- public write surface ---------------------------------------------

    def overwrite(self, df: DataFrame) -> "VersionedTable":
        """Bulk insert/overwrite (S6/S9) — a fresh snapshot of ``df``."""
        self._commit(df)
        return self

    def append(self, df: DataFrame, merge_schema: bool = False) -> "VersionedTable":
        """Delta ``INSERT INTO`` analog: commit current ∪ incoming as a new
        snapshot (by-name column resolution, no dedup — appends are appends;
        use ``upsert`` for keyed semantics).

        ``merge_schema=True`` is Delta's ``mergeSchema`` write option: the
        committed schema is the by-name union of the current and incoming
        schemas — columns new to the table backfill existing rows with NULL,
        columns the batch omits fill incoming rows with NULL, and columns
        present on both sides widen to the common Spark union type
        (int→bigint etc.). Without it a schema mismatch raises, matching
        Delta's default schema enforcement. Prior snapshots keep their
        original schema for time travel; evolution is metadata-free here
        because every snapshot is a full CoW rewrite."""
        # generated columns a batch omits are computed per-row BEFORE the
        # union (the committed table always carries them; _commit still
        # validates any batch that supplies its own values)
        for gname, gexpr in self._meta().get("generated", {}).items():
            if gname not in df.columns:
                df = df.withColumn(gname, F.expr(gexpr))
        current = self.read(with_row_ids=True)
        if "__row_id" in current.columns and "__row_id" not in df.columns:
            # appended rows get fresh ids in _commit; existing keep theirs
            df = df.withColumn("__row_id", F.lit(None).cast("bigint"))
        self._commit(
            current.unionByName(df, allowMissingColumns=merge_schema),
            op="APPEND",
        )
        return self

    def append_with_identity(
        self, df: DataFrame, id_col: str, order_by: list[str]
    ) -> "VersionedTable":
        """Delta ``GENERATED ALWAYS AS IDENTITY`` analog: the batch gets
        dense ids continuing from the table's current MAX(id) + 1,
        assigned in ``order_by`` order (an explicit total order makes the
        assignment deterministic and replayable — engines that hand out
        identity values by task order are not reproducible, which is why
        Delta documents identity as non-deterministic; this variant
        trades that for exactness). First append on an id-less table
        starts at 1.

        Scale: one scalar MAX + one global sort of the BATCH (not the
        table) — identity assignment is inherently a sequential contract,
        so the batch-sized sort is the honest minimum."""
        snaps = self._snapshots()
        if snaps and id_col in self.read().columns:
            start = self.read().agg(F.max(id_col)).first()[0] or 0
            current = self.read(with_row_ids=True)
        elif snaps:
            # a bare `_commit(new)` here would silently REPLACE the
            # table (current rows lost) — refuse loudly instead
            raise ValueError(
                f"append_with_identity: table at {self.location} has no "
                f"{id_col!r} column — identity must be established on the "
                "first append (backfill the column explicitly to migrate)"
            )
        else:
            start = 0
            current = None
        w = Window.orderBy(*[F.col(c) for c in order_by])
        new = df.withColumn(
            id_col, (F.row_number().over(w) + F.lit(int(start))).cast("bigint")
        )
        # identity assignment is still an APPEND (existing rows are
        # carried bit-for-bit) — commit as one so delta.appendOnly
        # tables accept it
        if current is None:
            self._commit(new, op="APPEND")
        else:
            if "__row_id" in current.columns:
                new = new.withColumn("__row_id", F.lit(None).cast("bigint"))
            self._commit(current.unionByName(new), op="APPEND")
        return self

    create_or_replace = overwrite  # DataFrameWriterV2 semantics (S8)

    def upsert(
        self,
        updates: DataFrame,
        key_cols: list[str],
        precombine_col: str,
        max_retries: int = 3,
    ) -> "VersionedTable":
        """Hudi-style keyed upsert (S7): union target with incoming rows,
        keep the max-``precombine_col`` row per key, rewrite (CoW).

        Optimistically concurrent: the commit CAS-checks the version read;
        on conflict the merge re-derives from the new current snapshot and
        retries (lazy retry, the same recovery the reference configures via
        ``hoodie.cleaner.policy.failed.writes=LAZY`` + DynamoDB locks).
        """
        from ..operators.merge import upsert_by_key

        last_err: ConcurrentCommitError | None = None
        for _ in range(max_retries + 1):
            snaps = self._snapshots()
            base_version = snaps[-1]["version"] if snaps else None
            target = self.read()
            merged = upsert_by_key(target, updates, key_cols, precombine_col)
            tracked = self.read(with_row_ids=True)
            if "__row_id" in tracked.columns:
                # Delta row-tracking MERGE semantics: a key that existed
                # keeps its row id (update-in-place lineage); brand-new
                # keys get fresh ids in _commit. min() guards against a
                # pre-tracking table holding duplicate keys.
                id_map = tracked.groupBy(*key_cols).agg(
                    F.min("__row_id").alias("__row_id")
                )
                merged = merged.join(id_map, key_cols, "left")
            try:
                self._commit(merged, expected_version=base_version, op="MERGE")
                return self
            except ConcurrentCommitError as e:
                last_err = e
        raise last_err

    # -- read surface -------------------------------------------------------

    def read(
        self,
        version: int | None = None,
        with_meta: bool = False,
        with_row_ids: bool = False,
    ) -> DataFrame:
        """Snapshot scan (S2); ``version`` gives time travel.

        ``with_meta=True`` adds commit-lineage columns ``_commit_version``
        and ``_commit_time`` — the engine's analog of Hudi's ``_hoodie_*``
        metadata columns (the reason the reference needs
        ``unionByName(allowMissingColumns=True)`` at
        hudi/hudi_scd_script.py:111; SURVEY.md §7 hard-point 4).

        ``with_row_ids=True`` exposes the hidden ``__row_id`` column when
        row tracking is enabled (``enable_row_tracking``) — stable row
        identity across CoW rewrites, hidden from plain reads like
        Delta's row-tracking metadata column."""
        snaps = self._snapshots()
        if not snaps:
            raise FileNotFoundError(f"no snapshot at {self.location}")
        snap = None
        if version is None:
            # staged (write-audit-publish) snapshots are invisible until
            # published; current = newest non-staged entry
            snap = self._current_snapshot(snaps)
        else:
            for s in snaps:
                if s["version"] == version:
                    snap = s
                    break
        if snap is None:
            raise ValueError(f"version {version} not found at {self.location}")
        df = self._apply_tombstones(self.spark.read.parquet(snap["dir"]), snap)
        if not with_row_ids and "__row_id" in df.columns:
            df = df.drop("__row_id")
        if with_meta:
            df = df.withColumn(
                "_commit_version", F.lit(snap["version"]).cast("int")
            ).withColumn(
                "_commit_time",
                F.lit(
                    time.strftime(
                        "%Y-%m-%d %H:%M:%S", time.gmtime(snap["committed_at"])
                    )
                ).cast("timestamp_ntz"),
            )
        return df

    def changes(self, from_version: int, to_version: int) -> DataFrame:
        """Incremental read: row-level changes between two snapshots
        (Hudi incremental view / Delta CDF capability on plain parquet)."""
        return table_changes(
            self.spark,
            self.read(version=from_version),
            self.read(version=to_version),
        )

    def changes_per_commit(
        self, from_version: int, to_version: int, persist: bool = False
    ) -> DataFrame:
        """True Delta CDF range semantics: one diff PER COMMIT in
        (from, to], each tagged ``_commit_version`` — intermediate churn
        (a row inserted then deleted inside the range) is visible,
        unlike ``changes``' endpoint diff which nets it out. Cost: one
        multiset diff per commit step, bounded by history depth —
        consumers that only need the net state keep using ``changes``."""
        snaps = [
            s["version"]
            for s in self._snapshots()
            if not s.get("staged")
            and from_version <= s["version"] <= to_version
        ]
        if from_version not in snaps or to_version not in snaps:
            raise ValueError(
                f"versions {from_version}..{to_version} not all present at "
                f"{self.location}"
            )
        out = None
        for lo, hi in zip(snaps, snaps[1:]):
            step = table_changes(
                self.spark,
                self.read(version=lo),
                self.read(version=hi),
                persist=persist,
            ).withColumn("_commit_version", F.lit(hi).cast("int"))
            out = step if out is None else out.unionByName(step)
        if out is None:
            empty = self.read(version=from_version).filter(F.lit(False))
            return empty.withColumn(
                "_change_type", F.lit(None).cast("string")
            ).withColumn("_commit_version", F.lit(None).cast("int"))
        return out

    def changes_cdf(
        self,
        from_version: int,
        to_version: int,
        key_cols: list[str],
        persist: bool = True,
    ) -> DataFrame:
        """Delta Change Data Feed-flavored incremental read: like
        ``changes``, but a delete and an insert sharing ``key_cols`` are
        paired into ``update_preimage`` (old values) + ``update_postimage``
        (new values) rows — the 4-valued ``_change_type`` Delta CDF
        consumers (downstream MERGE replication, incremental MVs keyed on
        business keys) expect.

        ``persist=True`` (the default) caches the shared diff relation —
        the pairing references it from four branches, and a plan audit
        showed the uncached form re-evaluating both snapshot aggregates
        per branch. The cache entry lives until Spark's LRU evicts it
        (MEMORY_AND_DISK), so loop-heavy incremental consumers that
        manage their own memory should pass ``persist=False`` or
        ``unpersist`` the returned plan's relation themselves."""
        return table_changes_keyed(
            self.spark,
            self.read(version=from_version),
            self.read(version=to_version),
            key_cols,
            persist=persist,
        )

    def diff_summary(
        self, from_version: int, to_version: int, key_cols: list[str]
    ) -> dict:
        """Change-volume summary between two snapshots: row counts per
        CDF change type (inserts, deletes, updates) — the one-line
        answer to "what did that commit do", driver-cheap (one aggregate
        over the diff, four small numbers back)."""
        counts = {
            r["_change_type"]: r["n"]
            for r in self.changes_cdf(from_version, to_version, key_cols)
            .groupBy("_change_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        return {
            "inserted": int(counts.get("insert", 0)),
            "deleted": int(counts.get("delete", 0)),
            "updated": int(counts.get("update_postimage", 0)),
        }

    def compact(
        self,
        target_partitions: int | None = None,
        cluster_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        zorder_buckets: int = 16,
        refresh_stats: bool = True,
        target_file_size_bytes: int | None = None,
    ) -> "VersionedTable":
        """OPTIMIZE/compaction: rewrite the current snapshot into
        ``target_partitions`` files (small-file compaction — the Hudi
        compaction / Delta OPTIMIZE capability). Data is unchanged; the
        commit is a new snapshot so readers stay consistent.
        ``target_file_size_bytes`` instead derives the file count from
        the current snapshot's total bytes (ceil(bytes/target) — Delta's
        OPTIMIZE maxFileSize knob), mutually exclusive with an explicit
        ``target_partitions``.

        ``cluster_by`` sort-clusters the rewrite on a column list
        (lexicographic): perfect file-level min/max selectivity on the
        FIRST column, none on later ones.

        ``zorder_by`` interleaves the columns on a Z-curve instead (Delta
        ``OPTIMIZE ZORDER`` analog): each column is bucketed by its
        approx-quantile boundaries (skew-proof — equal-population buckets,
        the same sampling approach Delta uses), the bucket ids'
        bits are interleaved into one sort key, and files get a compact
        hyper-rectangle of EVERY dimension — so min/max skipping works for
        predicates on any Z-column, at the cost of coarser first-column
        clustering. The interleave is pure column arithmetic (shift/or),
        JVM-side.

        Scale: either layout costs one range-exchange + in-partition sort
        of the snapshot — exactly what any OPTIMIZE rewrite costs; the
        quantile pass for Z-order is a sampled aggregate, not a full sort.

        File min/max stats do not carry across a rewrite (new files), so
        when the prior snapshot had ``compute_stats`` columns recorded,
        compaction re-collects them on the new layout (``refresh_stats``)
        — improved skipping is the point of clustering; silently dropping
        the stats would leave ``read_pruned`` scanning everything. The
        cluster/Z-order columns are added to the refreshed set.
        """
        if target_partitions is not None and target_file_size_bytes is not None:
            raise ValueError(
                "compact: pass target_partitions OR target_file_size_bytes"
            )
        if target_file_size_bytes is not None:
            # bin-pack by SIZE (Delta OPTIMIZE's maxFileSize /
            # spark.databricks.delta.optimize.maxFileSize analog): derive
            # the file count from the CURRENT snapshot's bytes so output
            # files land near the 128-512 MiB scan sweet spot without the
            # caller knowing the table's size. Post-compaction size can
            # differ (re-encoding changes compression), so this is a
            # target, not a bound — same contract as Delta's.
            total = sum(f["size_bytes"] for f in self.files())
            target_partitions = max(
                1, -(-total // int(target_file_size_bytes))
            )
        elif target_partitions is None:
            target_partitions = 1
        prior_stats_cols = list(
            self._current_snapshot().get("stats_cols", [])
        )
        df = self.read(with_row_ids=True)
        if zorder_by:
            zkey = self._zorder_key(df, zorder_by, zorder_buckets)
            df = (
                df.withColumn("__zkey", zkey)
                .repartitionByRange(target_partitions, F.col("__zkey"))
                .sortWithinPartitions("__zkey")
                .drop("__zkey")
            )
        elif cluster_by:
            cols = [F.col(c) for c in cluster_by]
            df = df.repartitionByRange(target_partitions, *cols).sortWithinPartitions(
                *cols
            )
        else:
            df = df.coalesce(target_partitions)
        self._commit(df, op="OPTIMIZE")
        if refresh_stats:
            stat_cols = list(
                dict.fromkeys(
                    prior_stats_cols + (zorder_by or cluster_by or [])
                )
            )
            if stat_cols:
                self.compute_stats(stat_cols)
        return self

    @staticmethod
    def _zorder_key(df: DataFrame, cols: list[str], buckets: int):
        """Z-curve key: per-column approx-quantile bucket ids, bits
        interleaved. ``buckets`` must be a power of two."""
        bits = max(1, (buckets - 1).bit_length())
        n = len(cols)
        key = F.lit(0).cast("bigint")
        for i, c in enumerate(cols):
            qs = [j / buckets for j in range(1, buckets)]
            bounds = df.stat.approxQuantile(c, qs, 0.001)
            bucket = F.lit(0)
            for b, bound in enumerate(bounds):
                bucket = F.when(F.col(c) > F.lit(bound), F.lit(b + 1)).otherwise(bucket)
            # NULLs sort first (bucket 0), matching NULLS FIRST ordering
            bucket = F.coalesce(bucket, F.lit(0)).cast("bigint")
            for j in range(bits):
                key = key + (
                    F.shiftright(bucket, j).bitwiseAND(F.lit(1))
                    * F.lit(1 << (j * n + i)).cast("bigint")
                )
        return key

    # -- file statistics + data skipping ------------------------------------

    @staticmethod
    def _stat_value(v):
        """JSON-safe stat encoding. Timestamps/dates serialize to ISO
        strings — fixed-width, so lexicographic compare == temporal
        compare and pruning stays correct after a metadata round-trip."""
        import datetime

        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        return v

    def compute_stats(self, cols: list[str]) -> "VersionedTable":
        """Collect per-FILE min/max for ``cols`` on the current snapshot and
        record them in the snapshot entry — the Delta ``stats`` / Iceberg
        manifest-metrics analog, and the input ``read_pruned`` skips files
        with.

        One distributed aggregate keyed by ``input_file_name()`` (as many
        groups as files — trivially small); no driver-side row data.
        """
        snap = self._current_snapshot()
        stats = self._collect_file_stats(snap["dir"], cols)
        meta = self._meta()
        entry = next(
            s for s in meta["snapshots"] if s["version"] == snap["version"]
        )
        entry["stats"] = stats
        entry["stats_cols"] = list(cols)
        self._write_meta(meta)
        return self

    def _collect_file_stats(self, data_dir: str, cols: list[str]) -> dict:
        """Per-file min/max stats for one data dir (shared by
        ``compute_stats`` and the post-purge rebuild)."""
        df = self.spark.read.parquet(data_dir)
        aggs = []
        for c in cols:
            aggs.append(F.min(c).alias(f"__mn_{c}"))
            aggs.append(F.max(c).alias(f"__mx_{c}"))
        rows = (
            df.withColumn("__file", F.input_file_name())
            .groupBy("__file")
            .agg(*aggs)
            .collect()
        )
        stats = {}
        for r in rows:
            # input_file_name returns a file URI; files() paths are plain
            path = r["__file"].removeprefix("file://").removeprefix("file:")
            stats[path] = {
                c: [
                    self._stat_value(r[f"__mn_{c}"]),
                    self._stat_value(r[f"__mx_{c}"]),
                ]
                for c in cols
            }
        return stats

    _BLOOM_BITS = 4096

    # Bloom skipping is restricted to types whose Python ``str(value)``
    # probe is byte-identical to Spark's ``CAST(col AS STRING)`` build:
    # strings and integrals. double/float/decimal/boolean representations
    # diverge ('1.0E-7'/'true' JVM-side vs '1e-07'/'True' Python-side), so
    # a probe could miss a set bit and PRUNE a file that contains the
    # value — violating the "false positives only ever KEEP" invariant.
    _BLOOM_TYPES = ("string", "tinyint", "smallint", "int", "bigint")

    @staticmethod
    def _bloom_positions(value, bits: int = _BLOOM_BITS) -> list[int]:
        """Two md5-derived bit positions per value — the driver-side twin
        of the distributed expression in ``compute_bloom`` (same
        ``md5_hash64`` semantics: first 15 md5 hex digits as int).
        Only called for str/int probes (see ``_BLOOM_TYPES``)."""
        import hashlib

        out = []
        for salt in ("b1:", "b2:"):
            h = hashlib.md5((salt + str(value)).encode()).hexdigest()
            out.append(int(h[:15], 16) % bits)
        return out

    @staticmethod
    def _bloom_probe_ok(value) -> bool:
        """True when ``str(value)`` is guaranteed to match the JVM cast
        used at build time (bool is an int subclass — excluded first)."""
        return not isinstance(value, bool) and isinstance(value, (str, int))

    def compute_bloom(self, cols: list[str]) -> "VersionedTable":
        """Per-file Bloom filters for equality skipping (Hudi bloom-index /
        parquet bloom-filter analog): min/max stats cannot prune a point
        lookup on a column the files are NOT clustered by; a 4096-bit
        2-hash bloom per (file, column) can. Stored as sorted bit-position
        lists in the snapshot pointer — the set saturates at 4096 entries,
        so metadata stays bounded no matter the file's cardinality.

        One distributed aggregate keyed by file (collect_set of positions
        — bounded by the bit width); false positives only ever KEEP a file
        (correctness never depends on the bloom). Restricted to
        string/integral columns (``_BLOOM_TYPES``) — the only types whose
        probe-side ``str(value)`` matches the build-side JVM string cast
        bit-for-bit."""
        snap = self._current_snapshot()
        from ..functions.hashing import md5_hash64

        df = self.spark.read.parquet(snap["dir"]).withColumn(
            "__file", F.input_file_name()
        )
        dtypes = dict(df.dtypes)
        for c in cols:
            if dtypes.get(c) not in self._BLOOM_TYPES:
                raise ValueError(
                    f"bloom skipping requires a string/integral column; "
                    f"{c!r} is {dtypes.get(c)!r} (float/decimal/boolean "
                    f"string forms differ between probe and build sides)"
                )
        aggs = []
        for c in cols:
            for salt in ("b1:", "b2:"):
                pos = (
                    md5_hash64(F.concat(F.lit(salt), F.col(c).cast("string")))
                    % self._BLOOM_BITS
                )
                aggs.append(
                    F.collect_set(pos).alias(f"__{salt[:-1]}_{c}")
                )
        rows = df.groupBy("__file").agg(*aggs).collect()
        bloom = {}
        for r in rows:
            path = r["__file"].removeprefix("file://").removeprefix("file:")
            bloom[path] = {
                c: sorted(
                    set(r[f"__b1_{c}"] or []) | set(r[f"__b2_{c}"] or [])
                )
                for c in cols
            }
        meta = self._meta()
        entry = next(
            s for s in meta["snapshots"] if s["version"] == snap["version"]
        )
        entry["bloom"] = bloom
        self._write_meta(meta)
        return self

    @staticmethod
    def _file_may_match(bounds, op: str, value) -> bool:
        """Can any row in a file with [min, max] = bounds satisfy
        ``col op value``? min/max ignore NULLs, so an all-NULL file has
        NULL bounds and no row can satisfy a comparison — prune it
        (same rule Delta data skipping applies)."""
        mn, mx = bounds
        if mn is None and mx is None:
            return False
        if op == "=":
            return mn <= value <= mx
        if op == "<":
            return mn < value
        if op == "<=":
            return mn <= value
        if op == ">":
            return mx > value
        if op == ">=":
            return mx >= value
        raise ValueError(f"unsupported pruning operator {op!r}")

    def pruned_files(self, filters: list[tuple]) -> list[str]:
        """Files of the current snapshot that survive min/max skipping for
        a conjunction of ``(col, op, value)`` filters (op in
        <, <=, =, >=, >). Columns without collected stats never prune."""
        snap = self._current_snapshot()
        stats = snap.get("stats", {})
        bloom = snap.get("bloom", {})
        all_files = [f["path"] for f in self.files()]
        out = []
        for path in all_files:
            fstats = stats.get(path)
            fbloom = bloom.get(path)
            keep = True
            for col, op, value in filters:
                if (
                    fstats is not None
                    and col in fstats
                    and not self._file_may_match(
                        fstats[col], op, self._stat_value(value)
                    )
                ):
                    keep = False
                    break
                # equality predicates additionally consult the bloom —
                # the skip path for point lookups on non-clustered columns
                # (str/int probes only; other types' string forms are not
                # probe-safe, see _BLOOM_TYPES)
                if (
                    op == "="
                    and fbloom is not None
                    and col in fbloom
                    and self._bloom_probe_ok(value)
                ):
                    positions = set(fbloom[col])
                    if not all(
                        p in positions for p in self._bloom_positions(value)
                    ):
                        keep = False
                        break
            if keep:
                out.append(path)
        return out

    def read_pruned(self, filters: list[tuple]) -> DataFrame:
        """Data-skipping scan: open only the files whose min/max admit the
        conjunctive ``(col, op, value)`` filters, then apply the full
        residual predicate row-level — so results are EXACTLY the filtered
        table regardless of how coarse the stats are. This is the scan-side
        payoff of clustering (``compact(cluster_by=...)`` / Z-order): at
        100 TB the pointer metadata eliminates whole files before the
        scheduler ever sees them, the same mechanism as Delta/Iceberg
        data skipping."""
        files = self.pruned_files(filters)
        ops = {
            "=": lambda c, v: F.col(c) == v,
            "<": lambda c, v: F.col(c) < v,
            "<=": lambda c, v: F.col(c) <= v,
            ">": lambda c, v: F.col(c) > v,
            ">=": lambda c, v: F.col(c) >= v,
        }
        residual = F.lit(True)
        for col, op, value in filters:
            residual = residual & ops[op](col, value)
        if not files:
            # empty result, full snapshot schema
            return self.read().filter(F.lit(False))
        df = self._apply_tombstones(
            self.spark.read.parquet(*files), self._current_snapshot()
        ).filter(residual)
        return df.drop("__row_id") if "__row_id" in df.columns else df

    def _apply_tombstones(self, df: DataFrame, snap: dict) -> DataFrame:
        """Anti-join any tombstone files recorded on the snapshot — the
        read-side half of merge-on-read deletes. Two flavors:
        keyed (``tombstones``: record-key batches) and positional
        (``dv``: (file, row-index) batches, Delta deletion-vector /
        Iceberg positional-delete analog)."""
        dvs = snap.get("dv", [])
        if dvs:
            # _metadata is only resolvable on the file-scan relation
            # itself, so project (file, pos) BEFORE any keyed anti-join
            # reshapes the plan — a keyed tombstone followed by a
            # positional delete is a legal commit sequence
            df = df.withColumn(
                "__file", F.col("_metadata.file_path")
            ).withColumn("__pos", F.col("_metadata.row_index"))
        for t in snap.get("tombstones", []):
            keys = self.spark.read.parquet(t["dir"])
            df = df.join(keys, on=t["key_cols"], how="left_anti")
        if dvs:
            dv = self.spark.read.parquet(*[d["dir"] for d in dvs])
            df = df.join(
                F.broadcast(dv), on=["__file", "__pos"], how="left_anti"
            ).drop("__file", "__pos")
        return df

    def delete_where_positional(self, condition) -> "VersionedTable":
        """Positional merge-on-read DELETE — the true Delta deletion-vector
        / Iceberg positional-delete analog: tombstones are (file,
        row-index) pairs from the parquet ``_metadata`` hidden column, so
        it works on tables with NO record key (the keyed variant,
        ``delete_where_deferred``, needs one). Parquet files are immutable,
        so (file_path, row_index) is a stable row id until a rewrite —
        and any rewrite (``compact``/``overwrite``) materializes the
        deletes first because ``read()`` applies them.

        Write cost O(matched rows), zero data files rewritten; read cost
        one broadcast anti-join on (file, pos) until compaction folds it.
        SQL NULL semantics: only predicate-TRUE rows are deleted."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        hit = F.coalesce(cond.cast("boolean"), F.lit(False))
        if self._symlink_autogen():
            raise ValueError(
                "merge-on-read deletes are incompatible with an enabled "
                "symlink manifest (the file-list manifest would resurrect "
                "deleted rows externally) — disable_symlink_manifest() or "
                "use the CoW delete_where()"
            )
        meta = self._meta()
        snaps = meta["snapshots"]
        if not snaps:
            raise FileNotFoundError(f"no snapshot at {self.location}")
        cur = self._current_snapshot(snaps)
        version = self._next_version(snaps)
        dv_dir = os.path.join(self.location, f"dv-{version:05d}")
        # _metadata is only resolvable on the file-scan relation itself, so
        # project (file, pos) FIRST, then replay the head's existing
        # tombstones/DVs on top — already-deleted rows can't re-match, so
        # re-deleting is a no-op, not a duplicate position
        scan = self.spark.read.parquet(cur["dir"]).select(
            "*",
            F.col("_metadata.file_path").alias("__file"),
            F.col("_metadata.row_index").alias("__pos"),
        )
        for t in cur.get("tombstones", []):
            keys = self.spark.read.parquet(t["dir"])
            scan = scan.join(keys, on=t["key_cols"], how="left_anti")
        dvs = cur.get("dv", [])
        if dvs:
            dv = self.spark.read.parquet(*[d["dir"] for d in dvs])
            scan = scan.join(
                F.broadcast(dv), on=["__file", "__pos"], how="left_anti"
            )
        scan.filter(hit).select("__file", "__pos").write.mode(
            "overwrite"
        ).parquet(dv_dir)
        snaps.append(
            {
                "version": version,
                "dir": cur["dir"],  # metadata-only commit: data files shared
                "committed_at": time.time(),
                "operation": "DELETE",
                "tombstones": cur.get("tombstones", []),
                "dv": cur.get("dv", []) + [{"dir": dv_dir}],
            }
        )
        self._write_meta(meta)
        return self

    def delete_where_deferred(self, condition, key_cols: list[str]) -> "VersionedTable":
        """Merge-on-read DELETE (Delta deletion-vector / Hudi delete-log
        analog, keyed rather than positional): instead of a CoW rewrite of
        every touched file, commit a small tombstone file holding the
        matching record keys; reads anti-join it, and the next
        ``compact()``/``overwrite()`` materializes the deletion and clears
        the tombstones (read() already applies them, so any rewrite path
        materializes for free).

        Write cost is O(matched keys) — the reason deletion vectors exist:
        a 100 TB table takes a GDPR delete of one key without rewriting a
        single data file. Read cost is one broadcast-sized anti-join per
        tombstone batch until compaction folds them. SQL NULL semantics:
        only rows where the predicate is TRUE are deleted."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        hit = F.coalesce(cond.cast("boolean"), F.lit(False))
        if self._symlink_autogen():
            raise ValueError(
                "merge-on-read deletes are incompatible with an enabled "
                "symlink manifest (the file-list manifest would resurrect "
                "deleted rows externally) — disable_symlink_manifest() or "
                "use the CoW delete_where()"
            )
        meta = self._meta()
        snaps = meta["snapshots"]
        if not snaps:
            raise FileNotFoundError(f"no snapshot at {self.location}")
        # chain off the published head, never a staged snapshot — a
        # deferred delete must not make unaudited staged data readable
        cur = self._current_snapshot(snaps)
        version = self._next_version(snaps)
        ts_dir = os.path.join(self.location, f"tombstones-{version:05d}")
        self.read().filter(hit).select(*key_cols).distinct().write.mode(
            "overwrite"
        ).parquet(ts_dir)
        snaps.append(
            {
                "version": version,
                "dir": cur["dir"],  # metadata-only commit: data files shared
                "committed_at": time.time(),
                "operation": "DELETE",
                "tombstones": cur.get("tombstones", [])
                + [{"dir": ts_dir, "key_cols": list(key_cols)}],
            }
        )
        self._write_meta(meta)
        return self

    def replace_where(self, condition, df: DataFrame) -> "VersionedTable":
        """Delta ``INSERT INTO t REPLACE WHERE cond SELECT ...`` /
        ``option("replaceWhere", ...)`` analog: ONE atomic commit that
        swaps exactly the predicate-matching slice for ``df`` — the
        partition-backfill primitive (recompute one day, replace it,
        leave every other row untouched, readers never see a gap).

        Delta's validation applies: every incoming row must itself match
        the predicate, otherwise the commit is rejected — a backfill that
        writes outside its declared slice is a bug, not an overwrite.
        SQL NULL semantics on the keep side: rows where the predicate is
        NULL are kept (only predicate-TRUE rows are replaced). The
        incoming frame is evaluated twice (validation scan + commit);
        persist it first if it is expensive to recompute."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        hit = F.coalesce(cond.cast("boolean"), F.lit(False))
        bad = df.filter(~F.coalesce(cond.cast("boolean"), F.lit(False)))
        if not bad.isEmpty():
            raise ConstraintViolationError(
                f"replace_where: incoming rows do not all match the "
                f"predicate {condition!r}"
            )
        kept = self.read(with_row_ids=True).filter(~hit)
        if "__row_id" in kept.columns and "__row_id" not in df.columns:
            df = df.withColumn("__row_id", F.lit(None).cast("bigint"))
        self._commit(
            kept.unionByName(df.select(*kept.columns)), op="REPLACE WHERE"
        )
        return self

    def delete_where(self, condition) -> "VersionedTable":
        """Delta ``DELETE FROM t WHERE cond`` analog: copy-on-write rewrite
        of the current snapshot without the matching rows, committed as a
        new snapshot (time travel still sees them; ``vacuum`` reclaims).
        SQL semantics: only rows where the predicate is TRUE are deleted —
        NULL-predicate rows are kept (a bare ``filter(~cond)`` would drop
        them)."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        keep = ~F.coalesce(cond.cast("boolean"), F.lit(False))
        self._commit(self.read(with_row_ids=True).filter(keep), op="DELETE")
        return self

    def update_where(self, condition, assignments: dict) -> "VersionedTable":
        """Delta ``UPDATE t SET ... WHERE cond`` analog: conditional
        column rewrite (CASE WHEN per assigned column), full CoW snapshot
        commit. ``assignments`` maps column name -> Column or SQL string;
        non-matching rows pass through byte-identical."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        hit = F.coalesce(cond.cast("boolean"), F.lit(False))
        df = self.read(with_row_ids=True)
        for name, value in assignments.items():
            expr = F.expr(value) if isinstance(value, str) else value
            df = df.withColumn(name, F.when(hit, expr).otherwise(F.col(name)))
        self._commit(df, op="UPDATE")
        return self

    # -- schema evolution DDL ----------------------------------------------

    def add_column(
        self, name: str, dtype: str, default=None
    ) -> "VersionedTable":
        """Delta ``ALTER TABLE ... ADD COLUMNS`` analog: commit a new
        snapshot with the column appended (``default`` backfills existing
        rows; NULL otherwise). Time travel still serves the old schema from
        old snapshots — schema is per-snapshot, like Delta's per-version
        metadata."""
        value = F.lit(default).cast(dtype)
        self._commit(self.read(with_row_ids=True).withColumn(name, value))
        return self

    def rename_column(self, old: str, new: str) -> "VersionedTable":
        """Delta ``RENAME COLUMN`` (column-mapping) analog, realized as a
        CoW projection rewrite — data unchanged, one snapshot commit.
        A NOT NULL marker follows the column, and a generated column's
        own registration is re-keyed; a rename REFUSES while any CHECK
        constraint or generated-column EXPRESSION still references the
        old name (the commit would otherwise fail mid-flight or silently
        resurrect the old column) — drop and re-add those first, the
        same order Delta requires."""
        import re as _re

        meta = self._meta()
        ref = _re.compile(rf"\b{_re.escape(old)}\b")
        for cname, cexpr in meta.get("constraints", {}).items():
            if ref.search(cexpr):
                raise ValueError(
                    f"rename_column: constraint {cname!r} references "
                    f"{old!r}; drop and re-add it against {new!r} first"
                )
        for gname, gexpr in meta.get("generated", {}).items():
            if gname != old and ref.search(gexpr):
                raise ValueError(
                    f"rename_column: generated column {gname!r} references "
                    f"{old!r}; drop and re-add it against {new!r} first"
                )
        if old in meta.get("generated", {}):
            # renaming the generated column itself: re-key BEFORE the
            # commit, else _commit would recompute+resurrect the old name
            meta["generated"][new] = meta["generated"].pop(old)
        if old in meta.get("not_null", []):
            meta["not_null"] = [
                new if c == old else c for c in meta["not_null"]
            ]
        self._write_meta(meta)
        df = self.read(with_row_ids=True)
        self._commit(
            df.select(*[F.col(c).alias(new) if c == old else F.col(c) for c in df.columns])
        )
        return self

    def drop_column(self, name: str) -> "VersionedTable":
        """Delta ``DROP COLUMN`` analog: CoW rewrite without the column;
        historical snapshots keep it for time travel. A NOT NULL marker
        on the column goes with it."""
        self._commit(self.read(with_row_ids=True).drop(name))
        self.drop_not_null(name)
        return self

    def set_property(self, key: str, value) -> "VersionedTable":
        """``ALTER TABLE ... SET TBLPROPERTIES`` analog: a durable
        key→value on the table metadata. Behavior-bearing keys
        (``symlinkFormatManifest.enabled``, ``rowTracking.enabled``) take
        effect from the next commit; ``enable_row_tracking()`` is the
        backfilling wrapper for the latter."""
        meta = self._meta()
        meta.setdefault("properties", {})[key] = value
        self._write_meta(meta)
        return self

    def unset_property(self, key: str) -> "VersionedTable":
        meta = self._meta()
        meta.get("properties", {}).pop(key, None)
        self._write_meta(meta)
        return self

    def properties(self) -> dict:
        """SHOW TBLPROPERTIES: the current property map (a copy)."""
        return dict(self._meta().get("properties", {}))

    def set_not_null(self, col: str) -> "VersionedTable":
        """``ALTER TABLE ... ALTER COLUMN c SET NOT NULL`` analog:
        existing rows are validated now, every future commit is validated
        at write time (unlike CHECK, a NULL here REJECTS — that is the
        point of the constraint)."""
        if not self.read().filter(F.col(col).isNull()).isEmpty():
            raise ConstraintViolationError(
                f"cannot SET NOT NULL on {col}: existing rows hold NULLs"
            )
        meta = self._meta()
        nn = meta.setdefault("not_null", [])
        if col not in nn:
            nn.append(col)
        self._write_meta(meta)
        return self

    def drop_not_null(self, col: str) -> "VersionedTable":
        meta = self._meta()
        if col in meta.get("not_null", []):
            meta["not_null"].remove(col)
            self._write_meta(meta)
        return self

    def enable_row_tracking(self) -> "VersionedTable":
        """Delta row-tracking analog (``delta.enableRowTracking``): every
        row gets a stable hidden ``__row_id`` that survives CoW rewrites —
        UPDATE/DELETE/compact/OPTIMIZE/RESTORE keep ids, keyed ``upsert``
        carries the id of the matched key onto the new row version, and
        appended/inserted rows draw fresh ids above a metadata high-water
        mark. ``read(with_row_ids=True)`` exposes the column; plain reads
        never see it. Ids are sparse (uniqueness, not density, is the
        contract). WAP ``stage()`` writes bypass assignment until the
        next tracked commit, and MoR deferred deletes are unaffected
        (tombstones are keyed, not positional)."""
        meta = self._meta()
        if meta.get("properties", {}).get("rowTracking.enabled"):
            return self  # idempotent: ids already live, never reassign
        meta.setdefault("properties", {})["rowTracking.enabled"] = True
        meta.setdefault("row_id_hwm", 0)
        self._write_meta(meta)
        if meta.get("snapshots") and any(
            not s.get("staged") for s in meta["snapshots"]
        ):
            # backfill: materialize ids for the existing rows (reading
            # WITH row ids so a re-enable after property juggling can
            # never reassign ids that already exist)
            self._commit(
                self.read(with_row_ids=True), op="ENABLE ROW TRACKING"
            )
        return self

    def add_constraint(self, name: str, expr: str) -> "VersionedTable":
        """Delta ``ALTER TABLE ... ADD CONSTRAINT ... CHECK`` analog: the
        SQL expression must not be FALSE for any existing row (validated
        now) or any future written row (validated at every commit; NULL
        passes, per SQL CHECK semantics)."""
        bad = self.read().filter(
            F.coalesce(F.expr(expr).cast("boolean"), F.lit(True)) == False  # noqa: E712
        )
        if not bad.isEmpty():
            raise ConstraintViolationError(
                f"CHECK constraint {name} ({expr}) violated by existing rows"
            )
        meta = self._meta()
        meta.setdefault("constraints", {})[name] = expr
        self._write_meta(meta)
        return self

    def drop_constraint(self, name: str) -> "VersionedTable":
        meta = self._meta()
        meta.get("constraints", {}).pop(name, None)
        self._write_meta(meta)
        return self

    def add_generated_column(self, name: str, expr: str) -> "VersionedTable":
        """Delta generated-column analog (``GENERATED ALWAYS AS (expr)``):
        the column's value is defined by a SQL expression over the row's
        other columns. Registered in table metadata and enforced at EVERY
        commit — writers that omit the column get it computed; writers
        that supply it must supply matching values (null-safe compare),
        mirroring Delta's validate-on-write. Existing rows backfill via
        one CoW commit. Derived partition keys (date from timestamp) are
        the canonical use."""
        meta = self._meta()
        meta.setdefault("generated", {})[name] = expr
        self._write_meta(meta)
        df = self.read(with_row_ids=True)
        if name in df.columns:
            df = df.drop(name)
        self._commit(df)  # _commit computes the column
        return self

    def drop_generated_column(self, name: str) -> "VersionedTable":
        """Remove the generation rule (the column itself stays, now
        freely writable — same as Delta dropping the generation
        expression via column replacement)."""
        meta = self._meta()
        meta.get("generated", {}).pop(name, None)
        self._write_meta(meta)
        return self

    def shallow_clone(self, target_location: str) -> "VersionedTable":
        """Shallow clone (Delta ``CREATE TABLE ... SHALLOW CLONE`` analog):
        a METADATA-ONLY fork — the clone's v0 references the source's
        current snapshot directory (and inherits its pending tombstones /
        deletion vectors), zero data copied. Writes to the clone are CoW
        commits under the clone's own location, so the source is never
        touched; the snapshot entry is marked ``external`` so the clone's
        ``vacuum`` will never delete source-owned files. The instant
        dev/test fork for 100 TB tables — ``clone`` is the deep copy."""
        snaps = self._snapshots()
        cur = self._current_snapshot(snaps)
        out = VersionedTable(self.spark, target_location, name=None)
        out._write_meta(
            {
                "snapshots": [
                    {
                        "version": 0,
                        "dir": cur["dir"],
                        "committed_at": time.time(),
                        "external": True,
                        "tombstones": cur.get("tombstones", []),
                        "dv": cur.get("dv", []),
                    }
                ]
            }
        )
        return out

    def restore(self, version: int) -> "VersionedTable":
        """Delta ``RESTORE TABLE ... TO VERSION AS OF`` analog: re-commit
        an old snapshot's data as the NEW current version — a roll-forward
        rollback, so history is never rewritten and concurrent readers of
        the bad version stay consistent."""
        self._commit(
            self.read(version=version, with_row_ids=True), op="RESTORE"
        )
        return self

    def copy_into(
        self,
        source_path: str,
        file_format: str = "parquet",
        pattern: str | None = None,
        merge_schema: bool = False,
    ) -> list[str]:
        """``COPY INTO`` analog: idempotent FILE-granular ingestion. Each
        source file under ``source_path`` (optionally filtered by the
        glob ``pattern``) is loaded AT MOST ONCE — loaded file names are
        recorded in table metadata, so re-running after a partial load,
        a retry, or new files arriving appends exactly the not-yet-seen
        files. The retryable-ingest contract that makes scheduled loads
        safe without an external bookkeeping table.

        Returns the list of files loaded by THIS call (empty = no-op,
        no empty commit). One commit per call covering all new files.
        Scale: the file listing is metadata-sized; the read is an exact
        file list (no re-scan of already-loaded data); state grows one
        path string per file — compact well past millions of files.
        Wrap in ``locked()`` when multiple loaders race one table."""
        import fnmatch
        import glob as _glob

        root = source_path.rstrip("/")
        found = sorted(
            p
            for p in _glob.glob(os.path.join(root, "**", "*"), recursive=True)
            if os.path.isfile(p)
            and not os.path.basename(p).startswith(("_", "."))
            and (pattern is None or fnmatch.fnmatch(os.path.basename(p), pattern))
        )
        meta = self._meta()
        seen = set(meta.get("copy_into_loaded", []))
        new_files = [p for p in found if p not in seen]
        if not new_files:
            return []
        df = self.spark.read.format(file_format).load(new_files)
        self.append(df, merge_schema=merge_schema)
        # record AFTER the commit succeeds: a failed load retries its
        # files, a replayed success is screened by the recorded names
        meta = self._meta()
        meta["copy_into_loaded"] = sorted(seen | set(new_files))
        self._write_meta(meta)
        return new_files

    def _commit_delta(self, version: int) -> tuple[DataFrame, DataFrame]:
        """(added, removed) multiset row diff a commit introduced over
        its predecessor in published order (the empty table for the
        first commit) — the unit ``revert``/``cherry_pick`` operate on.
        Staged (WAP) snapshots diff against the newest published
        snapshot before them, which is the base they were staged on."""
        snaps = self._snapshots()
        if not any(s["version"] == version for s in snaps):
            raise ValueError(f"version {version} not found at {self.location}")
        prior_version = None
        for s in snaps:
            if s["version"] == version:
                break
            if not s.get("staged"):
                prior_version = s["version"]
        at = self.read(version=version)
        if prior_version is None:
            prior = at.limit(0)
        else:
            prior = self.read(version=prior_version)
        return at.exceptAll(prior), prior.exceptAll(at)

    def revert(self, version: int) -> "VersionedTable":
        """Git-revert analog (no lake format ships this; composed here
        from the CDF multiset algebra): commit the INVERSE of what
        ``version`` changed — current ∖ rowsAdded(v) ⊎ rowsRemoved(v) —
        as a new snapshot. Unlike ``restore`` (which rolls the whole
        table back, discarding every later commit's effect), revert
        surgically unpicks ONE commit while keeping everything after it.
        Multiset semantics throughout (``exceptAll``), so duplicate-row
        multiplicities survive; rows of v already deleted by later
        commits subtract nothing (exceptAll is a saturating diff).
        Schema must be union-compatible with the current snapshot
        (unionByName raises otherwise). On row-tracked tables the commit
        sees id-less rows (multiset algebra and stable ids are mutually
        exclusive — ids make every row distinct), so ALL row ids are
        reassigned: a revert is a rewrite, not a time warp."""
        added, removed = self._commit_delta(version)
        self._commit(
            self.read().exceptAll(added).unionByName(removed), op="REVERT"
        )
        return self

    def cherry_pick(self, version: int) -> "VersionedTable":
        """Iceberg cherry-pick analog: re-apply what ``version`` changed
        onto the CURRENT head — current ∖ rowsRemoved(v) ⊎ rowsAdded(v)
        — as a new commit. The WAP workflow this exists for: a snapshot
        staged against an older base (write-audit-publish) whose base
        has since advanced can be picked onto the new head instead of
        re-running the job; also replays a commit from a restored-away
        lineage. Same multiset/schema/row-id contract as ``revert``."""
        added, removed = self._commit_delta(version)
        self._commit(
            self.read().exceptAll(removed).unionByName(added),
            op="CHERRYPICK",
        )
        return self

    def clone(self, target_location: str) -> "VersionedTable":
        """Deep clone (Delta ``CREATE TABLE ... CLONE`` analog): copy the
        current snapshot's data into a fresh single-version table at
        ``target_location``. Writers on the clone never touch the source
        (dev/test forks of production tables)."""
        out = VersionedTable(self.spark, target_location, name=None)
        out.overwrite(self.read())
        return out

    def _ref_protected_versions(self, meta: dict) -> set[int]:
        """Snapshot versions that NO retention path may expire — the
        lake-format rule that retention cannot break a reference:
        tag-referenced snapshots (Iceberg ``expire_snapshots`` never drops
        a tagged ref) and staged-but-unpublished WAP snapshots (expiring
        one silently breaks the pending ``publish(version)``)."""
        protected = set(meta.get("tags", {}).values())
        protected |= {
            s["version"] for s in meta["snapshots"] if s.get("staged")
        }
        return protected

    def _reclaim_dropped(
        self, meta: dict, keep: list[dict], dry_run: bool = False
    ) -> list[str]:
        """Shared retention reclaim for both vacuum flavors: install
        ``keep`` as the snapshot list and delete dropped snapshots' data
        dirs AND their now-unreferenced tombstone / deletion-vector dirs.
        Directory deletion is keyed on the KEPT set's dirs (metadata-only
        commits share their parent's data dir, so dropped ENTRIES may
        still reference live DIRS); live branches protect main-owned dirs
        through their shallow-clone v0 entries; external dirs belong to
        another table (shallow_clone source) and are never reclaimed from
        the clone side. ``dry_run`` reports the would-be-deleted dirs and
        changes NOTHING (Delta ``VACUUM ... DRY RUN``). Returns the
        (would-be) deleted directories."""
        import shutil

        removed: list[str] = []
        snaps = meta["snapshots"]
        keep_dirs = {s["dir"] for s in keep}
        # tombstone/DV dirs still referenced by a kept snapshot must
        # survive even when the commit that introduced them is dropped
        keep_aux = {
            d["dir"]
            for s in keep
            for d in s.get("tombstones", []) + s.get("dv", [])
        }
        # record-level index dirs persist RAW key values: a dropped
        # snapshot's index must go with its data (else vacuum deletes the
        # rows but their keys survive on disk — the purge_rows lesson)
        keep_idx = {
            s["record_index"]["dir"] for s in keep if s.get("record_index")
        }
        for entry in meta.get("branches", {}).values():
            try:
                bsnaps = VersionedTable(
                    self.spark, entry["location"]
                )._snapshots()
            except FileNotFoundError:
                continue
            keep_dirs |= {s["dir"] for s in bsnaps}
            keep_aux |= {
                d["dir"]
                for s in bsnaps
                for d in s.get("tombstones", []) + s.get("dv", [])
            }
            keep_idx |= {
                s["record_index"]["dir"]
                for s in bsnaps
                if s.get("record_index")
            }
        kept_versions = {s["version"] for s in keep}
        for s in snaps:
            if s["version"] in kept_versions:
                continue
            if s["dir"] not in keep_dirs and not s.get("external"):
                removed.append(s["dir"])
                if not dry_run:
                    shutil.rmtree(s["dir"], ignore_errors=True)
            # dv/tombstone dirs referenced only by dropped metadata-only
            # DELETE commits would otherwise leak on disk forever
            for d in s.get("tombstones", []) + s.get("dv", []):
                if d["dir"] not in keep_aux:
                    removed.append(d["dir"])
                    if not dry_run:
                        shutil.rmtree(d["dir"], ignore_errors=True)
            idx = s.get("record_index")
            if idx and idx["dir"] not in keep_idx:
                removed.append(idx["dir"])
                if not dry_run:
                    shutil.rmtree(idx["dir"], ignore_errors=True)
        if not dry_run:
            meta["snapshots"] = keep
            self._write_meta(meta)
        return removed

    def vacuum(self, keep_last: int = 1, dry_run: bool = False):
        """Drop all but the last ``keep_last`` snapshots and delete their
        directories (Delta VACUUM / Hudi cleaner). Time travel to vacuumed
        versions stops working, matching lake-format semantics.

        References are never broken, matching ``vacuum_older_than``'s
        contract: tag-referenced and staged (pending-publish WAP)
        snapshots survive even outside the keep window, and with
        ``keep_last > 0`` the published head survives even when staged
        entries occupy the positional tail.

        ``keep_last <= 0`` empties the table — except ref-protected
        snapshots — with metadata and directories consistent (every
        dropped entry removed, every unreferenced directory deleted);
        Python's ``snaps[-0:]`` is the WHOLE list, so the keep-list must
        be special-cased rather than sliced.

        ``dry_run=True`` returns the directories that WOULD be deleted
        without touching metadata or disk (Delta ``VACUUM ... DRY RUN``).
        """
        meta = self._meta()
        snaps = meta["snapshots"]
        window = {s["version"] for s in (snaps[-keep_last:] if keep_last > 0 else [])}
        protected = self._ref_protected_versions(meta)
        if keep_last > 0 and snaps:
            protected.add(self._current_snapshot(snaps)["version"])
        keep = [
            s
            for s in snaps
            if s["version"] in window or s["version"] in protected
        ]
        removed = self._reclaim_dropped(meta, keep, dry_run=dry_run)
        return removed if dry_run else self

    def remove_orphan_files(
        self, older_than_seconds: float = 86400.0, dry_run: bool = False
    ) -> list[str]:
        """Iceberg ``CALL system.remove_orphan_files`` analog: delete
        table-artifact directories under the table location that NO
        metadata references — debris from crashed writes (a staged dir
        whose commit never landed, vacuum interrupted between dir delete
        and metadata write, leftover ``*.__purge_tmp``). Complements
        retention: vacuum removes what metadata says to drop; this
        removes what metadata does not know about.

        Safety model, in order:
        * runs under the writer lock, so no in-flight local commit's
          fresh dir can be mistaken for an orphan mid-write;
        * ``older_than_seconds`` (default 24 h) is the Iceberg-style
          grace window against OTHER processes between their dir write
          and their metadata commit — set 0 only when no writer can be
          active;
        * only entries matching the store's own artifact patterns
          (``snapshot-* / dv-* / tombstones-* / record_index-* /
          *.__purge_tmp``) are candidates; metadata, locks, manifests,
          ``branches/`` (their own tables — recurse explicitly if
          wanted), and anything unrecognized are never touched.

        Returns the (would-be) deleted paths; ``dry_run`` reports only.
        """
        import re as _re
        import shutil

        pat = _re.compile(
            r"^(snapshot|dv|tombstones|record_index)-\d+$"
        )
        with self.locked():
            meta = self._meta()
            refs: set[str] = set()
            for s in meta.get("snapshots", []):
                refs.add(os.path.abspath(s["dir"]))
                for d in s.get("tombstones", []) + s.get("dv", []):
                    refs.add(os.path.abspath(d["dir"]))
                idx = s.get("record_index")
                if idx:
                    refs.add(os.path.abspath(idx["dir"]))
            now = time.time()
            orphans: list[str] = []
            for entry in sorted(os.listdir(self.location)):
                full = os.path.join(self.location, entry)
                if not os.path.isdir(full):
                    continue
                if not (pat.match(entry) or entry.endswith(".__purge_tmp")):
                    continue
                if os.path.abspath(full) in refs:
                    continue
                try:
                    age = now - os.path.getmtime(full)
                except FileNotFoundError:
                    continue
                if age < float(older_than_seconds):
                    continue
                orphans.append(full)
                if not dry_run:
                    shutil.rmtree(full, ignore_errors=True)
        return orphans

    def vacuum_older_than(self, timestamp: str) -> "VersionedTable":
        """Time-based retention (Delta ``VACUUM ... RETAIN n HOURS`` /
        Iceberg ``expire_snapshots(older_than)`` analog): drop snapshots
        committed strictly before ``timestamp`` ('YYYY-MM-DD HH:MM:SS',
        UTC) and delete their directories. Refs are NEVER expired,
        matching the lake-format rule that retention cannot break a
        reference: the published head, tag-referenced snapshots, staged
        (pending-publish WAP) snapshots, and any snapshot whose directory
        a live branch or a kept snapshot still shares (metadata-only
        commits reuse their parent's data dir, so directory deletion is
        keyed on the KEPT set's dirs, not the dropped entries)."""
        import calendar

        cut = calendar.timegm(time.strptime(timestamp, "%Y-%m-%d %H:%M:%S"))
        meta = self._meta()
        snaps = meta["snapshots"]
        head = self._current_snapshot(snaps)
        protected = self._ref_protected_versions(meta)
        protected.add(head["version"])
        keep = [
            s
            for s in snaps
            if s["committed_at"] >= cut or s["version"] in protected
        ]
        self._reclaim_dropped(meta, keep)
        return self

    def cleanup_orphans(self, older_than_seconds: float = 3600.0) -> list[str]:
        """Remove snapshot / tombstone / deletion-vector directories that
        NO metadata entry references — the debris of a writer that
        crashed between its data write and its metadata commit. The
        commit protocol (data first, meta last) makes such orphans
        harmless to readers (metadata is the source of truth), but they
        leak storage until reclaimed; this is the local analog of Delta's
        VACUUM pass over unreferenced files / Iceberg's
        ``remove_orphan_files``. Branch subtrees are the branches' own
        concern and are skipped.

        ``older_than_seconds`` (default 1 h) is the same race guard
        Iceberg's remove_orphan_files uses: a LIVE concurrent writer's
        data lands on disk moments before its metadata commit, so only
        dirs older than any plausible in-flight commit are candidates.
        Returns the removed paths."""
        import glob as _glob
        import shutil

        meta = self._meta()
        referenced: set[str] = set()
        for s in meta["snapshots"]:
            referenced.add(s["dir"])
            for d in s.get("tombstones", []) + s.get("dv", []):
                referenced.add(d["dir"])
        cutoff = time.time() - older_than_seconds
        removed = []
        for pat in ("snapshot-*", "tombstones-*", "dv-*"):
            for d in sorted(_glob.glob(os.path.join(self.location, pat))):
                if (
                    os.path.isdir(d)
                    and d not in referenced
                    and os.path.getmtime(d) < cutoff
                ):
                    shutil.rmtree(d, ignore_errors=True)
                    removed.append(d)
        return removed

    def auto_compact(
        self,
        max_files: int = 64,
        target_file_bytes: int = 128 * 1024 * 1024,
        max_tombstone_batches: int = 4,
    ) -> bool:
        """Compaction POLICY (Hudi inline-compaction / Delta auto-optimize
        analog): rewrite only when the small-file problem is real — file
        count over ``max_files``, or pending deletion-vector batches over
        ``max_tombstone_batches``. Target partition count = total bytes /
        ``target_file_bytes`` (the 128 MB default matches parquet split
        size, so post-compaction scans get full-split parallelism).
        Returns True when a compaction ran — callers loop this after
        streaming/batch commits instead of compacting blindly."""
        snaps = self._snapshots()
        if not snaps:
            return False
        fs = self.files()
        head = self._current_snapshot(snaps)
        # keyed and positional tombstone batches both count as MoR debt
        n_tomb = len(head.get("tombstones", [])) + len(head.get("dv", []))
        if len(fs) <= max_files and n_tomb <= max_tombstone_batches:
            return False
        total = sum(f["size_bytes"] for f in fs)
        parts = max(1, -(-total // target_file_bytes))  # ceil div
        self.compact(target_partitions=int(parts))
        return True

    # -- tags + write-audit-publish -----------------------------------------

    def tag(self, name: str, version: int | None = None) -> "VersionedTable":
        """Iceberg tag analog: a named pointer to a snapshot version
        (defaults to current). Tags survive later commits — 'the exact
        table state training run X read' stays addressable forever
        (vacuum permitting)."""
        meta = self._meta()
        snaps = meta["snapshots"]
        if not snaps:
            raise FileNotFoundError(f"no snapshot at {self.location}")
        # default = published head; an explicit version may tag a staged
        # snapshot (pinning the audit input is legitimate WAP practice)
        v = (
            self._current_snapshot(snaps)["version"]
            if version is None
            else version
        )
        if not any(s["version"] == v for s in snaps):
            raise ValueError(f"version {v} not found at {self.location}")
        meta.setdefault("tags", {})[name] = v
        self._write_meta(meta)
        return self

    def read_tag(self, name: str) -> DataFrame:
        tags = self._meta().get("tags", {})
        if name not in tags:
            raise ValueError(f"tag {name!r} not found at {self.location}")
        return self.read(version=tags[name])

    def audit_staged(self, version: int, checks: dict[str, str]) -> dict:
        """WAP step 2: run named data-quality expectations against a
        staged snapshot (the audit between ``stage`` and ``publish`` —
        dbt tests / Great Expectations shape). Each check is a SQL
        predicate; the result maps check name → violating-row count
        (NULL predicates count as violations here, unlike CHECK
        constraints — an audit wants unknowns surfaced, not waved
        through). One aggregate pass computes every check."""
        snaps = self._snapshots()
        if not any(s["version"] == version and s.get("staged") for s in snaps):
            raise ValueError(
                f"no staged snapshot {version} at {self.location}"
            )
        df = self.read(version=version)
        aggs = [
            F.sum(
                F.when(
                    F.coalesce(F.expr(expr).cast("boolean"), F.lit(False)),
                    F.lit(0),
                ).otherwise(F.lit(1))
            ).alias(name)
            for name, expr in checks.items()
        ]
        row = df.agg(*aggs).first()
        return {name: int(row[name] or 0) for name in checks}

    def publish_if_clean(
        self, version: int, checks: dict[str, str]
    ) -> "VersionedTable":
        """WAP steps 2+3 fused: publish the staged snapshot only when
        every expectation passes; otherwise drop it and raise with the
        per-check violation counts — unaudited data can never become the
        table, and a failed audit leaves no staged debris."""
        violations = {
            k: v for k, v in self.audit_staged(version, checks).items() if v
        }
        if violations:
            self.drop_staged(version)
            raise ConstraintViolationError(
                f"staged snapshot {version} failed audit: {violations}"
            )
        return self.publish(version)

    def stage(self, df: DataFrame) -> int:
        """Write-audit-publish, step 1 (Iceberg WAP analog): write ``df``
        as a STAGED snapshot — durable and readable by version for audit
        queries, but invisible to ``read()`` until published. Returns the
        staged version id."""
        meta = self._meta()
        snaps = meta["snapshots"]
        version = self._next_version(snaps)
        snap_dir = os.path.join(self.location, f"snapshot-{version:05d}")
        df.write.mode("overwrite").parquet(snap_dir)
        snaps.append(
            {
                "version": version,
                "dir": snap_dir,
                "committed_at": time.time(),
                "operation": "STAGE",
                "staged": True,
            }
        )
        self._write_meta(meta)
        return version

    def publish(self, version: int) -> "VersionedTable":
        """WAP step 3 (after auditing with ``read(version=...)``): make the
        staged snapshot current by moving it to the head — readers that
        never audited cannot observe unvalidated data.

        The staged version id is STABLE across publish: the id returned by
        ``stage()`` (and any tag pointing at it) keeps addressing the same
        data afterwards. List position, not version id, defines recency —
        which is why ``_next_version`` allocates max+1, and why
        ``committed_at`` is refreshed here so ``read_as_of`` sees the
        publish time, not the stage time."""
        meta = self._meta()
        for s in meta["snapshots"]:
            if s["version"] == version and s.get("staged"):
                s["staged"] = False
                s["committed_at"] = time.time()
                s["operation"] = "PUBLISH"
                # move to head so read() serves it; id unchanged
                meta["snapshots"].remove(s)
                meta["snapshots"].append(s)
                self._write_meta(meta)
                # publish changes the published head, so an enabled symlink
                # manifest must follow it — otherwise the external engine
                # silently keeps serving the pre-publish state. A staged
                # snapshot is always a full snapshot (stage() writes data,
                # never tombstones/DVs), so the MoR-pending refusal in
                # generate_symlink_manifest cannot fire here.
                if self._symlink_autogen():
                    self.generate_symlink_manifest()
                return self
        raise ValueError(f"no staged snapshot {version} at {self.location}")

    def drop_staged(self, version: int) -> "VersionedTable":
        """WAP abort: discard a staged snapshot that failed its audit."""
        import shutil

        meta = self._meta()
        for s in list(meta["snapshots"]):
            if s["version"] == version and s.get("staged"):
                meta["snapshots"].remove(s)
                shutil.rmtree(s["dir"], ignore_errors=True)
                self._write_meta(meta)
                return self
        raise ValueError(f"no staged snapshot {version} at {self.location}")

    def build_record_index(self, key_cols: list[str]) -> "VersionedTable":
        """Record-level index (Hudi RLI analog, metadata-table
        ``record_index`` partition): persist an exact key -> data-file
        mapping for the CURRENT snapshot, so a point lookup opens ONE
        file instead of bloom-maybe-several or stats-range-many — the
        third and sharpest tier of the skipping stack (min/max stats <
        bloom < exact index). Stored as parquet beside the snapshot
        (``record_index-<version>``); one scan of the snapshot builds
        it (distributed write, no driver state). Stale by design after
        the next commit — rebuild per published snapshot the way Hudi's
        indexer table service does; lookups through a stale index raise.
        """
        snap = self._current_snapshot()
        idx_dir = os.path.join(
            self.location, f"record_index-{snap['version']:05d}"
        )
        (
            self.spark.read.parquet(snap["dir"])
            .select(
                *key_cols,
                F.col("_metadata.file_path").alias("__file"),
            )
            .write.mode("overwrite")
            .parquet(idx_dir)
        )
        meta = self._meta()
        entry = next(
            x for x in meta["snapshots"] if x["version"] == snap["version"]
        )
        entry["record_index"] = {"dir": idx_dir, "key_cols": list(key_cols)}
        self._write_meta(meta)
        return self

    def index_lookup(self, key_values: dict) -> DataFrame:
        """Point lookup through the record-level index: resolve the
        key's data file(s) from the index (an index-only scan — the
        data files are untouched), then read ONLY those files with the
        key predicate applied. Raises when the HEAD has no index (a
        stale index from an older snapshot never serves silently).

        Scale: the index scan is itself min/max-prunable parquet of
        (key, file) pairs; the data read is one file per matching key —
        the same two-hop path a Hudi RLI point read takes.
        """
        snap = self._current_snapshot()
        idx = snap.get("record_index")
        if idx is None:
            raise ValueError(
                f"no record index on snapshot {snap['version']} at "
                f"{self.location} — build_record_index() after each "
                "published commit"
            )
        missing = set(key_values) - set(idx["key_cols"])
        if missing:
            raise ValueError(
                f"index covers {idx['key_cols']}, not {sorted(missing)}"
            )
        idx_df = self.spark.read.parquet(idx["dir"])
        for col, val in key_values.items():
            idx_df = idx_df.filter(F.col(col) == F.lit(val))
        files = [r["__file"] for r in idx_df.select("__file").distinct().collect()]
        if not files:
            return self.read().filter(F.lit(False))
        df = self.spark.read.parquet(*[f.replace("file:", "") for f in files])
        for col, val in key_values.items():
            df = df.filter(F.col(col) == F.lit(val))
        return df

    def purge_rows(self, condition) -> dict:
        """GDPR / right-to-be-forgotten purge: physically remove
        predicate-TRUE rows from EVERY snapshot — published history,
        staged WAP snapshots, and branch-referenced data dirs alike —
        so no time-travel read, CDF diff, or branch head can resurrect
        the subject. This is the one deliberate HISTORY REWRITE in the
        store (Delta's REORG ... APPLY (PURGE) + VACUUM reaches only the
        current snapshot; regulators reach all of them). Version ids,
        commit lineage, tags, and non-matching rows are preserved
        bit-for-bit; only matching rows vanish.

        Preconditions (refused loudly otherwise):
        * no snapshot may carry positional deletion vectors or keyed
          tombstones — (file, row-index) ids die on rewrite and
          tombstone files can themselves hold the subject's keys; run
          ``compact()`` (materializes MoR state at the head) and expire
          MoR history first;
        * every data dir must live under this table's location (a
          shallow clone must not rewrite its SOURCE table's files —
          purge the source instead).

        Mechanics: ONE observe()-metered filtered write per UNIQUE data
        dir (shared metadata-only dirs rewrite once) — the removed-row
        count rides the write as an observation, so each dir is scanned
        ONCE, not count-then-rewrite twice (round-7 task 3); a dir the
        predicate missed discards its tmp output and keeps the original
        files (and their stats) untouched. Swap-in is tmp-dir rename
        under the cross-process writer lock; a ``purges`` audit entry
        (predicate, rows removed, timestamp) lands in table metadata.

        Record-level indexes persist the RAW key column values —
        typically the exact PII being purged — so EVERY
        ``record_index-*`` dir on disk is deleted and every snapshot's
        ``record_index`` metadata entry popped (same invalidation
        discipline as stats/bloom, but unconditional: an index built on
        any snapshot may hold pre-purge keys). If the HEAD had an index
        it is rebuilt from the purged data after the lock releases, so
        ``index_lookup`` keeps working and never reads stale paths.

        Per-dir min/max file stats are REBUILT (not just dropped) for
        rewritten dirs whose snapshots recorded ``stats_cols`` — purge
        leaves the skipping stack as functional as it found it.

        Scale: cost is one scan+write of live history — the same cost
        class as the compaction every lake format requires for this.

        Returns ``{"dirs_rewritten": n, "rows_removed": n}`` where
        ``dirs_rewritten`` counts dirs actually swapped (hit dirs only).
        """
        import glob as globmod
        import shutil

        from pyspark.sql import Observation

        cond = F.expr(condition) if isinstance(condition, str) else condition
        hit = F.coalesce(cond.cast("boolean"), F.lit(False))
        head_index_cols: list[str] | None = None
        with self.locked():
            meta = self._meta()
            snaps = meta["snapshots"]
            loc = os.path.abspath(self.location)
            for snap in snaps:
                if snap.get("tombstones") or snap.get("dv"):
                    raise ValueError(
                        "purge_rows: snapshot "
                        f"{snap['version']} carries MoR tombstones/deletion "
                        "vectors — compact() and expire MoR history before "
                        "purging (positional ids die on rewrite; tombstone "
                        "files can hold the subject's keys)"
                    )
                if not os.path.abspath(snap["dir"]).startswith(loc):
                    raise ValueError(
                        f"purge_rows: snapshot {snap['version']} references "
                        f"external data at {snap['dir']} (shallow clone?) — "
                        "purge the owning table instead"
                    )
            dirs = sorted({s["dir"] for s in snaps})
            # crash debris: a killed earlier purge can leave *.__purge_tmp
            # dirs; under the lock they are stale by construction
            for stale in globmod.glob(
                os.path.join(self.location, "**", "*.__purge_tmp"),
                recursive=True,
            ):
                shutil.rmtree(stale, ignore_errors=True)
            rows_removed = 0
            dirs_rewritten = 0
            for d in dirs:
                df = self.spark.read.parquet(d)
                obs = Observation()
                tmp = d + ".__purge_tmp"
                (
                    df.observe(obs, F.sum(hit.cast("long")).alias("removed"))
                    .filter(~hit)
                    .write.mode("overwrite")
                    .parquet(tmp)
                )
                removed = int(obs.get["removed"] or 0)
                if removed == 0:
                    # predicate missed this dir: keep the original files
                    # (and their stats) bit-for-bit
                    shutil.rmtree(tmp, ignore_errors=True)
                    continue
                rows_removed += removed
                dirs_rewritten += 1
                shutil.rmtree(d)
                os.rename(tmp, d)
                # file-keyed skipping metadata is now stale (paths AND
                # contents changed) — rebuild stats where the snapshot
                # recorded its stat columns; bloom filters drop (their
                # rebuild is an explicit, costed maintenance call)
                for snap in snaps:
                    if snap["dir"] == d:
                        snap.pop("bloom", None)
                        if snap.get("stats_cols"):
                            snap["stats"] = self._collect_file_stats(
                                d, snap["stats_cols"]
                            )
                        else:
                            snap.pop("stats", None)
            # record-level indexes store raw key values (the PII being
            # purged) and pre-purge file paths: remove every index dir
            # and metadata entry, remembering the head's key set for the
            # post-lock rebuild
            head = snaps[-1] if snaps else None
            for snap in snaps:
                idx = snap.pop("record_index", None)
                if idx is not None and head is not None and snap is head:
                    head_index_cols = list(idx["key_cols"])
            for p in globmod.glob(os.path.join(self.location, "record_index-*")):
                shutil.rmtree(p, ignore_errors=True)
            meta.setdefault("purges", []).append(
                {
                    "at": time.time(),
                    "condition": str(condition),
                    "rows_removed": rows_removed,
                    "dirs": len(dirs),
                }
            )
            self._write_meta(meta)
            if self._symlink_autogen():
                self.generate_symlink_manifest()
        if head_index_cols is not None:
            # restore the head's point-lookup surface over purged data
            self.build_record_index(head_index_cols)
        return {"dirs_rewritten": dirs_rewritten, "rows_removed": rows_removed}

    # -- branches (Iceberg branch / audit-branch WAP analog) ----------------

    def create_branch(self, name: str) -> "VersionedTable":
        """Iceberg branch analog: a named WRITABLE fork of the current
        table state (tags are the read-only flavor). Starts as a shallow
        clone under ``<location>/branches/<name>`` — metadata-only, zero
        data copied — then accumulates its own snapshot lineage; main
        never sees branch commits until ``fast_forward``. The
        write-audit-publish pattern at branch granularity (multi-commit
        audits, vs ``stage()``'s single-snapshot WAP)."""
        if "/" in name:
            raise ValueError(f"invalid branch name {name!r}")
        meta = self._meta()
        branches = meta.setdefault("branches", {})
        if name in branches:
            raise ValueError(f"branch {name!r} already exists")
        loc = os.path.join(self.location, "branches", name)
        self.shallow_clone(loc)
        branches[name] = {
            "location": loc,
            # the fork point: fast_forward refuses if main moved past it
            "forked_at": self._current_snapshot()["version"],
        }
        self._write_meta(meta)
        return self.branch(name)

    def branch(self, name: str) -> "VersionedTable":
        branches = self._meta().get("branches", {})
        if name not in branches:
            raise ValueError(f"branch {name!r} not found at {self.location}")
        return VersionedTable(self.spark, branches[name]["location"], name=None)

    def fast_forward(self, name: str) -> "VersionedTable":
        """Publish a branch back to main: commit the branch's current
        state as main's next snapshot (a CoW rewrite — data files stay
        single-owner, so branch and main lifecycles never entangle; the
        rewrite is the price of that simplicity, and any audit fixes the
        branch accumulated are folded in atomically).

        TRUE fast-forward semantics (the Iceberg contract): if main has
        advanced past the branch's fork point, the publish is refused —
        silently clobbering main's newer commits would be a merge, and
        merging divergent table histories needs a human (rebase the
        branch: fork anew and replay)."""
        entry = self._meta().get("branches", {}).get(name)
        if entry is None:
            raise ValueError(f"branch {name!r} not found at {self.location}")
        head = self._current_snapshot()["version"]
        if head != entry["forked_at"]:
            raise ConcurrentCommitError(
                f"main advanced (v{entry['forked_at']} -> v{head}) since "
                f"branch {name!r} forked; fast-forward would discard those "
                f"commits — re-fork and replay the branch instead"
            )
        self._commit(
            self.branch(name).read(with_row_ids=True), op="FAST-FORWARD"
        )
        # the published snapshot IS the branch's current state, so the
        # branch is trivially up to date with the new head: advance its
        # fork point so the branch stays usable (commit -> publish ->
        # commit -> publish), instead of refusing every later
        # fast-forward because "main moved" — when the only move was this
        # publish itself. _commit rewrote meta, so re-read before editing.
        meta = self._meta()
        meta["branches"][name]["forked_at"] = self._current_snapshot(
            meta["snapshots"]
        )["version"]
        self._write_meta(meta)
        return self

    def drop_branch(self, name: str) -> "VersionedTable":
        """Delete a branch and its (branch-owned) snapshots. Safe at any
        point: branch dirs hold only branch-committed data — the v0
        shallow-clone entry references main's files, which the external
        marker protects from the branch's own vacuum, and ``fast_forward``
        copies rather than adopts."""
        import shutil

        meta = self._meta()
        entry = meta.get("branches", {}).pop(name, None)
        if entry is None:
            raise ValueError(f"branch {name!r} not found at {self.location}")
        loc = entry["location"]
        # only remove branch-owned snapshot dirs (v0 is external/main-owned)
        b = VersionedTable(self.spark, loc)
        for s in b._snapshots():
            if not s.get("external"):
                shutil.rmtree(s["dir"], ignore_errors=True)
        shutil.rmtree(loc, ignore_errors=True)
        self._write_meta(meta)
        return self

    def history(self) -> list[dict]:
        return self._snapshots()

    def read_as_of(self, timestamp: str) -> DataFrame:
        """Delta ``TIMESTAMP AS OF`` / Hudi commit-time query analog: read
        the newest snapshot committed at or before ``timestamp``
        ('YYYY-MM-DD HH:MM:SS', UTC)."""
        import calendar

        cut = calendar.timegm(time.strptime(timestamp, "%Y-%m-%d %H:%M:%S"))
        eligible = [
            s
            for s in self._snapshots()
            if s["committed_at"] <= cut and not s.get("staged")
        ]
        if not eligible:
            raise ValueError(
                f"no snapshot at or before {timestamp} at {self.location}"
            )
        return self.read(version=eligible[-1]["version"])

    def history_df(self, with_file_stats: bool = False) -> DataFrame:
        """The history as a queryable DataFrame (Iceberg ``.history`` /
        Delta ``DESCRIBE HISTORY`` metadata-table analog).
        ``with_file_stats=True`` adds per-version file counts and bytes
        (Iceberg ``.snapshots`` summary flavor) — one directory listing
        per version, no data files opened."""
        import glob as _glob

        rows = []
        for s in self._snapshots():
            base = (
                s["version"],
                s["dir"],
                s.get("operation", "WRITE"),
                float(s["committed_at"]),
                bool(s.get("staged", False)),
                len(s.get("tombstones", [])),
            )
            if with_file_stats:
                files = sorted(
                    _glob.glob(os.path.join(s["dir"], "*.parquet"))
                )
                base = base + (
                    len(files),
                    sum(os.path.getsize(f) for f in files),
                )
            rows.append(base)
        schema = (
            "version int, dir string, operation string, committed_at double, "
            "staged boolean, n_tombstone_batches int"
        )
        if with_file_stats:
            schema += ", n_files int, size_bytes long"
        return self.spark.createDataFrame(rows, schema)

    def files_df(self, version: int | None = None) -> DataFrame:
        """The file list as a queryable DataFrame (Iceberg ``.files``)."""
        rows = [(f["path"], f["size_bytes"]) for f in self.files(version)]
        return self.spark.createDataFrame(rows, "path string, size_bytes long")

    def refs_df(self) -> DataFrame:
        """Named references as a queryable DataFrame (Iceberg ``.refs``
        metadata-table analog): the published head, every tag, and every
        writable branch with the snapshot version each one addresses.
        ``forked_at`` is the branch fork point (NULL for head/tags) —
        the same version ``fast_forward`` validates against."""
        meta = self._meta()
        rows: list[tuple] = []
        head = next(
            (
                s
                for s in reversed(meta.get("snapshots", []))
                if not s.get("staged")
            ),
            None,
        )
        if head is not None:
            rows.append(("main", "HEAD", head["version"], None))
        for name in sorted(meta.get("tags", {})):
            rows.append((name, "TAG", meta["tags"][name], None))
        for name in sorted(meta.get("branches", {})):
            info = meta["branches"][name]
            bt = VersionedTable(self.spark, info["location"])
            rows.append(
                (
                    name,
                    "BRANCH",
                    bt._current_snapshot()["version"],
                    info["forked_at"],
                )
            )
        return self.spark.createDataFrame(
            rows, "name string, type string, version int, forked_at int"
        )

    def files(self, version: int | None = None) -> list[dict]:
        """Data files of a snapshot (Delta ``DESCRIBE DETAIL`` / Iceberg
        ``.files`` metadata-table analog): path + size per parquet file —
        what compaction planners and vacuum audits read."""
        import glob as _glob

        snaps = self._snapshots()
        snap = self._current_snapshot(snaps) if version is None else next(
            s for s in snaps if s["version"] == version
        )
        return [
            {"path": p, "size_bytes": os.path.getsize(p)}
            for p in sorted(_glob.glob(os.path.join(snap["dir"], "*.parquet")))
        ]

    def detail(self) -> dict:
        """DESCRIBE DETAIL: location, version, file count/bytes,
        constraints — the operational summary."""
        snaps = self._snapshots()
        fs = self.files() if snaps else []
        return {
            "location": self.location,
            "version": self._current_snapshot(snaps)["version"] if snaps else None,
            "num_snapshots": len(snaps),
            "num_files": len(fs),
            "size_bytes": sum(f["size_bytes"] for f in fs),
            "constraints": dict(self._meta().get("constraints", {})),
        }

    # -- symlink-format manifest (external-engine interop, S13/S14) ---------

    _SYMLINK_DIR = "_symlink_format_manifest"

    def generate_symlink_manifest(self) -> str:
        """S14 — ``GENERATE symlink_format_manifest FOR TABLE`` analog
        (delta/delta_scd_script.py:42): write a plain-text manifest listing
        the published head's data files, one ``file:`` URI per line, under
        ``<location>/_symlink_format_manifest/manifest``. That file is the
        entire interop contract: any engine that can read a file list and
        scan parquet (Hive/Trino/Athena's SymlinkTextInputFormat — the DDL
        at delta_scd_script.py:47-60) can now serve the table without
        understanding snapshot metadata. The write is tmp+rename atomic, so
        an external reader never sees a half-written manifest.

        Refuses while merge-on-read tombstones or deletion vectors are
        pending: a file LIST cannot express row-level deletes, so a
        manifest would resurrect deleted rows in the external engine (the
        same reason Delta blocks symlink manifests on DV-enabled tables).
        ``compact()`` first — it materializes the deletes.
        """
        snap = self._current_snapshot()
        if snap.get("tombstones") or snap.get("dv"):
            raise ValueError(
                "symlink manifest cannot express pending merge-on-read "
                "deletes (tombstones/deletion vectors) — run compact() to "
                "materialize them first"
            )
        mdir = os.path.join(self.location, self._SYMLINK_DIR)
        os.makedirs(mdir, exist_ok=True)
        manifest = os.path.join(mdir, "manifest")
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            for entry in self.files():
                f.write("file:" + entry["path"] + "\n")
        os.replace(tmp, manifest)
        return manifest

    def read_symlink_manifest(self) -> DataFrame:
        """Scan the table THROUGH the symlink manifest — exactly what the
        external engine does (resolve the file list, scan those parquet
        files, nothing else). Proves the manifest is sufficient to
        reconstruct the published table state."""
        manifest = os.path.join(self.location, self._SYMLINK_DIR, "manifest")
        if not os.path.exists(manifest):
            raise FileNotFoundError(f"no symlink manifest at {manifest}")
        with open(manifest) as f:
            paths = [line.strip().removeprefix("file:") for line in f if line.strip()]
        if not paths:
            return self.read().filter(F.lit(False))
        return self.spark.read.parquet(*paths)

    def enable_symlink_manifest(self) -> "VersionedTable":
        """S13's table-property half —
        ``delta.compatibility.symlinkFormatManifest.enabled=true``
        (delta_scd_script.py:44): regenerate the manifest automatically on
        every full-snapshot commit, so the external engine always sees the
        latest published state. Merge-on-read deletes are refused while
        enabled (they would silently strand the manifest on a stale file
        list — the commit raises instead, mirroring Delta's DV/manifest
        incompatibility)."""
        meta = self._meta()
        meta.setdefault("properties", {})["symlinkFormatManifest.enabled"] = True
        self._write_meta(meta)
        self.generate_symlink_manifest()
        return self

    def disable_symlink_manifest(self) -> "VersionedTable":
        meta = self._meta()
        meta.get("properties", {}).pop("symlinkFormatManifest.enabled", None)
        self._write_meta(meta)
        return self

    def _symlink_autogen(self) -> bool:
        return bool(
            self._meta().get("properties", {}).get("symlinkFormatManifest.enabled")
        )


def table_changes(
    spark, old: DataFrame, new: DataFrame, persist: bool = False
) -> DataFrame:
    """CDC between two snapshots (Delta CDF / Hudi incremental-query
    analog): MULTISET row diff — rows are compared with per-row counts
    (``EXCEPT ALL`` semantics), so duplicate-row multiplicity changes are
    reported row-level, matching Delta CDF (a plain anti-join would be
    set-semantics and miss e.g. 2 identical old rows collapsing to 1).

    Returns new-or-changed rows tagged ``_change_type`` in
    {'insert', 'delete'} — an 'update' appears as delete(old)+insert(new),
    the same convention Delta CDF uses for its pre/post images.

    Scale: one shuffle per side (groupBy all columns — a hash of already-
    distinct snapshot rows, so partial aggregation collapses nothing but
    costs nothing extra) + one shuffle-join on the row tuple; count deltas
    re-explode to row-level without a driver round-trip.
    """
    all_cols = list(new.columns)
    old_n = old.groupBy(*all_cols).agg(F.count(F.lit(1)).alias("__old_n"))
    new_n = new.groupBy(*all_cols).agg(F.count(F.lit(1)).alias("__new_n"))
    joined = old_n.join(new_n, on=all_cols, how="full_outer").select(
        *all_cols,
        (
            F.coalesce("__new_n", F.lit(0)) - F.coalesce("__old_n", F.lit(0))
        ).alias("__delta"),
    )
    if persist:
        # the insert and delete branches both read `joined`; without
        # caching Catalyst re-evaluates BOTH snapshot aggregates and the
        # full-outer join once per branch — the production switch for
        # large diffs (same convention as tfidf's persist_tf)
        joined = joined.persist()
    inserted = (
        joined.filter(F.col("__delta") > 0)
        .withColumn("__i", F.explode(F.sequence(F.lit(1), F.col("__delta"))))
        .select(*all_cols)
        .withColumn("_change_type", F.lit("insert"))
    )
    deleted = (
        joined.filter(F.col("__delta") < 0)
        .withColumn("__i", F.explode(F.sequence(F.lit(1), -F.col("__delta"))))
        .select(*all_cols)
        .withColumn("_change_type", F.lit("delete"))
    )
    return inserted.unionByName(deleted)


def table_changes_keyed(
    spark,
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    persist: bool = False,
) -> DataFrame:
    """Keyed CDC (Delta Change Data Feed analog): the multiset row diff of
    ``table_changes``, with delete+insert pairs that share ``key_cols``
    re-labeled ``update_preimage`` (old values) / ``update_postimage``
    (new values). Pairing is positional per key: each side's rows are
    numbered by a deterministic sort over the non-key columns, and rows
    with the same (key, position) pair up — so a key with 2 deletes and
    1 insert yields one update pair plus one plain delete (the convention
    that keeps multiplicity changes visible instead of swallowing them).

    Scale: the diff is the two snapshot aggregates + one full-outer join
    of ``table_changes``; the pairing adds two key-partitioned window
    numberings and one key-positional full-outer join. Every exchange is
    on the key columns — no global sort, no driver round-trips.
    """
    from pyspark.sql import Window

    # one cache layer is enough: diff's branches are filters over the
    # persisted `joined` relation inside table_changes, so persisting
    # diff again would store the rows twice
    diff = table_changes(spark, old, new, persist=persist)
    value_cols = [c for c in new.columns if c not in key_cols]
    if not value_cols:
        # key-only rows: identical rows net out in the multiset diff, so
        # no key can appear on both sides — nothing can pair up
        return diff
    order = [F.col(c).asc_nulls_first() for c in value_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    ins = (
        diff.filter(F.col("_change_type") == "insert")
        .withColumn("__pos", F.row_number().over(w))
        .drop("_change_type")
    )
    dele = (
        diff.filter(F.col("_change_type") == "delete")
        .withColumn("__pos", F.row_number().over(w))
        .drop("_change_type")
    )
    on = [*key_cols, "__pos"]
    ins_r = ins.select(
        *on, F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__new")
    )
    del_r = dele.select(
        *on, F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__old")
    )
    paired = ins_r.join(del_r, on=on, how="full_outer")
    both = F.col("__new").isNotNull() & F.col("__old").isNotNull()
    pre = paired.filter(both).select(
        *key_cols,
        *[F.col(f"__old.{c}").alias(c) for c in value_cols],
        F.lit("update_preimage").alias("_change_type"),
    )
    post = paired.filter(both).select(
        *key_cols,
        *[F.col(f"__new.{c}").alias(c) for c in value_cols],
        F.lit("update_postimage").alias("_change_type"),
    )
    plain_ins = paired.filter(F.col("__old").isNull()).select(
        *key_cols,
        *[F.col(f"__new.{c}").alias(c) for c in value_cols],
        F.lit("insert").alias("_change_type"),
    )
    plain_del = paired.filter(F.col("__new").isNull()).select(
        *key_cols,
        *[F.col(f"__old.{c}").alias(c) for c in value_cols],
        F.lit("delete").alias("_change_type"),
    )
    cols = [*new.columns, "_change_type"]
    return (
        pre.unionByName(post)
        .unionByName(plain_ins)
        .unionByName(plain_del)
        .select(*cols)
    )


def export_snapshot(
    table: VersionedTable,
    export_dir: str,
    version: int | None = None,
    digest_cols: list[str] | None = None,
) -> dict:
    """Portable snapshot export for DR / cross-site replication: one
    self-describing directory holding the snapshot's rows as plain
    parquet (``data/``) plus ``manifest.json`` with the source
    location, version, schema, and the anti-entropy content digest
    (operators/validate.table_digest). Unlike ``clone`` (same-site dev
    fork, no verification), an export is built to survive a network
    hop: ``import_snapshot`` refuses to materialize a table whose
    content or schema no longer matches the manifest.

    ``digest_cols`` defaults to every non-float, non-timestamp column
    (the engine-stable digest surface — validate.py's documented
    cross-engine caveat applied automatically)."""
    from ..operators.validate import table_digest

    df = table.read(version=version)
    if digest_cols is None:
        digest_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString()
            not in ("float", "double", "timestamp", "timestamp_ntz")
        ]
    os.makedirs(export_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(export_dir, "data"))
    back = table.spark.read.parquet(os.path.join(export_dir, "data"))
    d = table_digest(back, digest_cols).collect()[0]
    manifest = {
        "source_location": table.location,
        "source_version": version
        if version is not None
        else table.history()[-1]["version"],
        "schema": df.schema.json(),
        "digest_cols": digest_cols,
        "n_rows": d["n_rows"],
        "hash_sum": d["hash_sum"],
        "hash_xor": d["hash_xor"],
        "exported_unix": int(time.time()),
    }
    tmp = os.path.join(export_dir, ".manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(export_dir, "manifest.json"))
    return manifest


def import_snapshot(
    spark: SparkSession, export_dir: str, location: str
) -> VersionedTable:
    """Materialize an exported snapshot as a fresh single-version
    table, VERIFYING the manifest first: schema must match exactly and
    the recomputed content digest must equal the exported one —
    a torn / tampered / partially-copied export refuses loudly instead
    of becoming a silently-wrong table."""
    from pyspark.sql.types import StructType

    from ..operators.validate import table_digest

    with open(os.path.join(export_dir, "manifest.json")) as f:
        manifest = json.load(f)
    df = spark.read.schema(
        StructType.fromJson(json.loads(manifest["schema"]))
    ).parquet(os.path.join(export_dir, "data"))
    d = table_digest(df, manifest["digest_cols"]).collect()[0]
    got = (d["n_rows"], d["hash_sum"], d["hash_xor"])
    want = (manifest["n_rows"], manifest["hash_sum"], manifest["hash_xor"])
    if got != want:
        raise ValueError(
            f"snapshot import digest mismatch: manifest {want}, data {got} "
            f"— the export at {export_dir!r} is incomplete or modified"
        )
    out = VersionedTable(spark, location)
    out.overwrite(df)
    return out

"""Hudi copy-on-write table in Hudi's OWN storage layout — timeline
replay, snapshot/time-travel/incremental reads, and keyed upserts that
write new file slices, all with Spark built-ins (no Hudi runtime).

Why: the reference's Hudi leg (``hudi/hudi_scd_script.py:30-48``) writes
COPY_ON_WRITE tables whose on-disk format is open and documented
(https://hudi.apache.org/docs/concepts): a ``.hoodie/`` timeline of
instant files (``<instantTime>.commit`` holding HoodieCommitMetadata
JSON with ``partitionToWriteStats``), base parquet files named
``<fileId>_<writeToken>_<instantTime>.parquet`` forming FILE GROUPS
(every write to a group lays a NEW file slice beside the old — that IS
copy-on-write), and the ``_hoodie_*`` meta columns inside every data
file. All of that is JSON + parquet + naming conventions — perfectly
expressible Spark-first, like the sibling ``delta_log`` module.

Semantics implemented (the reference's actual usage):

* ``bulk_insert`` — first load; records hash-assigned to
  ``n_file_groups`` file groups per partition by record key.
* ``upsert`` — Hudi's defining op: per touched file group, merge the
  update batch into the CURRENT slice by record key with
  ``precombine_field`` picking the newest version of a key, then write
  the merged rows as a NEW slice under a NEW instant. Untouched file
  groups keep their old slice — the read path never sees torn state
  because the commit file lands last (atomic rename).
* ``read(instant=None)`` — snapshot: latest slice per file group at or
  before ``instant`` (time travel = pass an older instant).
* ``read_incremental(begin_instant)`` — Hudi's incremental pull: only
  rows whose ``_hoodie_commit_time`` is strictly greater, read from
  only the file slices those commits wrote (the commit metadata lists
  them — no full-table scan).

Scale shape: the timeline is metadata (one JSON per commit); snapshot
planning is a driver-side replay into a {(partition, fileId) -> path}
dict, the same manifest-sized state every Hudi reader holds; upserts
rewrite only touched file groups (measured per-group file counts in
tests). MoR log-file slices live in ``HudiMorTable`` below; CLEANING
is ``clean()``; CLUSTERING (replacecommit re-bucketing), SAVEPOINT /
RESTORE, and the timeline/file-slice inspection DataFrames (the
metadata-table query surface) live in hudi_maintenance.py (r10). Log
files here are parquet-encoded (Hudi's own log blocks are an
avro-framed container; the SLICE/timeline semantics are what the
engine models — documented representation trade, not a gap a reader
of this layout would silently miss).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

META_COLS = [
    "_hoodie_commit_time",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_name",
]


class HudiCowTable:
    """Copy-on-write table at ``location`` (single writer, like the
    sibling stores; Hudi's OCC lock providers — the reference wires
    DynamoDB — coordinate multi-writer, out of scope in-container)."""

    #: written to hoodie.properties; MERGE_ON_READ in the subclass
    TABLE_TYPE = "COPY_ON_WRITE"

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        record_key: str | None = None,
        precombine_field: str | None = None,
        n_file_groups: int = 4,
        cdc_enabled: bool = False,
    ):
        self.spark = spark
        self.location = location
        self.hoodie = os.path.join(location, ".hoodie")
        os.makedirs(self.hoodie, exist_ok=True)
        props = os.path.join(self.hoodie, "hoodie.properties")
        if os.path.exists(props):
            stored = dict(
                line.strip().split("=", 1)
                for line in open(props)
                if "=" in line
            )
            stored_type = stored.get("hoodie.table.type",
                                     "COPY_ON_WRITE")
            if stored_type != self.TABLE_TYPE:
                raise ValueError(
                    f"table at {location} is {stored_type}; open it "
                    f"with the matching class (this is {self.TABLE_TYPE})"
                )
            self.record_key = stored["hoodie.table.recordkey.fields"]
            self.precombine_field = stored["hoodie.table.precombine.field"]
            self.n_file_groups = int(stored["n.file.groups"])
            # table config, like real Hudi: the stored flag wins over
            # the constructor arg — CDC is a property of the TABLE
            # (every writer must honor it), not of one writer session
            self.cdc_enabled = (
                stored.get("hoodie.table.cdc.enabled", "false") == "true"
            )
            # self-heal the routing count (r11): cluster() records
            # newFileGroupCount IN the replacecommit, so a crash
            # between that atomic commit and the properties rewrite
            # can never leave a stale count — the timeline is the
            # truth; a mismatch repairs hoodie.properties here
            try:
                committed = self._committed_group_count()
                if (
                    committed is not None
                    and committed != self.n_file_groups
                ):
                    self.n_file_groups = committed
                    from .hudi_maintenance import _rewrite_properties

                    _rewrite_properties(self)
            except Exception:
                pass  # unparseable timeline: fsck's territory
        else:
            if record_key is None or precombine_field is None:
                raise ValueError(
                    "new table needs record_key and precombine_field"
                )
            self.record_key = record_key
            self.precombine_field = precombine_field
            self.n_file_groups = n_file_groups
            self.cdc_enabled = bool(cdc_enabled)
            with open(props, "w") as f:
                f.write(f"hoodie.table.type={self.TABLE_TYPE}\n")
                f.write(f"hoodie.table.recordkey.fields={record_key}\n")
                f.write(
                    f"hoodie.table.precombine.field={precombine_field}\n"
                )
                f.write(f"n.file.groups={n_file_groups}\n")
                if cdc_enabled:
                    f.write("hoodie.table.cdc.enabled=true\n")
                    f.write(
                        "hoodie.table.cdc.supplemental.logging.mode="
                        "data_before_after\n"
                    )

    # ----------------------------- timeline -----------------------------

    #: timeline actions this table replays (MoR adds .deltacommit;
    #: .replacecommit is clustering — hudi_maintenance.py)
    INSTANT_SUFFIXES = (".commit", ".replacecommit")

    def _committed_group_count(self) -> int | None:
        """The routing count the LATEST clustering replacecommit
        recorded (newFileGroupCount), or None when no clustering ever
        ran — the timeline-side truth hoodie.properties mirrors."""
        for t in reversed(self.instants()):
            p = os.path.join(self.hoodie, f"{t}.replacecommit")
            if not os.path.exists(p):
                continue
            with open(p) as f:
                meta = json.load(f)
            n = meta.get("newFileGroupCount")
            if n is not None:
                return int(n)
        return None

    def instants(self) -> list[str]:
        out = []
        for f in os.listdir(self.hoodie):
            for suf in self.INSTANT_SUFFIXES:
                if f.endswith(suf):
                    out.append(f[: -len(suf)])
                    break
        return sorted(out)

    def _next_instant(self) -> str:
        ts = time.strftime("%Y%m%d%H%M%S", time.gmtime()) + "000"
        prior = self.instants()
        if prior and ts <= prior[-1]:
            ts = str(int(prior[-1]) + 1).zfill(17)
        return ts

    def _commit_meta(self, instant: str) -> dict:
        for suf in self.INSTANT_SUFFIXES:
            path = os.path.join(self.hoodie, f"{instant}{suf}")
            if os.path.exists(path):
                with open(path) as f:
                    return json.load(f)
        raise FileNotFoundError(f"no instant file for {instant}")

    def _file_slices(self, instant: str | None = None) -> dict:
        """Replay the timeline: {(partition, fileId) -> relative path of
        the LATEST base file at or before ``instant``} — instants sort
        lexicographically because they are fixed-width timestamps, the
        property Hudi's instant format exists for."""
        live: dict[tuple, str] = {}
        for t in self.instants():
            if instant is not None and t > instant:
                break
            meta = self._commit_meta(t)
            # clustering (replacecommit) retires whole file groups —
            # drop them BEFORE applying the commit's own writes, so a
            # re-bucketing that reuses a group id keeps the new file
            for part, fid in meta.get("replacedFileGroups", []):
                live.pop((part, fid), None)
            for part, stats in meta["partitionToWriteStats"].items():
                for st in stats:
                    live[(part, st["fileId"])] = st["path"]
        return live

    # ------------------------------ writes ------------------------------

    def _with_meta(
        self, df: DataFrame, instant: str, file_group: F.Column
    ) -> DataFrame:
        key = F.col(self.record_key).cast("string")
        return (
            df.withColumn("_hoodie_commit_time", F.lit(instant))
            .withColumn("_hoodie_record_key", key)
            .withColumn("_hoodie_partition_path", F.lit(""))
            .withColumn("__fg", file_group)
        )

    def _file_group_expr(self) -> F.Column:
        # deterministic key -> file group assignment (layout only; any
        # stable hash works — md5 keeps it engine-replayable like the
        # rest of the repo)
        from ..functions.hashing import md5_hash64

        return (
            F.pmod(
                md5_hash64(F.col(self.record_key).cast("string")),
                F.lit(self.n_file_groups),
            )
        ).cast("int")

    # two fixed 16-byte seeds for the double-hash bloom scheme
    _BLOOM_SEED1 = "0123456789123456"
    _BLOOM_SEED2 = "fedcba9876543210"
    _BLOOM_K = 5

    def _group_key_stats(self, df: DataFrame) -> dict[int, dict]:
        """Per-file-group record-key index metadata — Hudi's BLOOM
        index: (minKey, maxKey, bloom bitset) per group, computed
        EXECUTOR-side with one applyInPandas pass (numpy double-hash
        bloom, deterministic seeds). Returned keyed by group number;
        stored in commit write stats so upsert tagging can skip the
        merge join for groups that provably hold none of a batch's
        keys."""
        import base64

        import numpy as np
        import pandas as pd

        key_col, k = self.record_key, self._BLOOM_K
        s1, s2 = self._BLOOM_SEED1, self._BLOOM_SEED2

        def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
            keys = pdf[key_col].astype(str).to_numpy(dtype=object)
            uniq = np.unique(keys)
            # bitset capped at 2^16 bits (8 KB/group): commit metadata
            # stays O(groups), never O(keys) — real Hudi bounds its
            # blooms the same way (hoodie.index.bloom.num_entries).
            # Oversized groups just see a higher false-positive rate,
            # which costs an unnecessary merge join, never correctness.
            m = min(1 << 16, max(64, int(8 * len(uniq))))
            m += (-m) % 8
            bits = np.zeros(m // 8, dtype=np.uint8)
            h1 = pd.util.hash_array(uniq, hash_key=s1)
            h2 = pd.util.hash_array(uniq, hash_key=s2) | 1
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
                np.bitwise_or.at(
                    bits,
                    (pos // 8).astype(np.int64),
                    np.left_shift(
                        np.uint8(1), (pos % 8).astype(np.uint8)
                    ),
                )
            return pd.DataFrame(
                {
                    "fg": [int(pdf["__fg"].iloc[0])],
                    "min_key": [str(uniq.min())],
                    "max_key": [str(uniq.max())],
                    "bloom": [
                        base64.b64encode(bits.tobytes()).decode()
                    ],
                    "bloom_m": [m],
                }
            )

        rows = (
            # only the two columns the bloom builder reads cross the
            # JVM->Python boundary (and the groupBy shuffle): shipping
            # the full row width through Arrow was pure overhead (r12;
            # guide: project before opaque functions)
            df.select("__fg", key_col)
            .groupBy("__fg")
            .applyInPandas(
                build,
                "fg int, min_key string, max_key string, "
                "bloom string, bloom_m bigint",
            )
            .collect()
        )
        return {
            r["fg"]: {
                "minKey": r["min_key"],
                "maxKey": r["max_key"],
                "bloom": r["bloom"],
                "bloomM": r["bloom_m"],
                "bloomK": k,
            }
            for r in rows
        }

    def _write_groups(
        self,
        df: DataFrame,
        instant: str,
        groups: list[int],
        namer=None,
        sort_within: list[str] | None = None,
    ) -> list[dict]:
        """Write one base file per file group (repartition by the group
        column so each parquet file holds exactly one group;
        ``sort_within`` orders rows inside each group's file — sort
        clustering). Base-file writes (default namer) also record the
        group's key-range + bloom index metadata in the write stats."""
        key_stats = (
            self._group_key_stats(df) if namer is None else {}
        )
        stats = []
        staging = os.path.join(self.location, f"_staging_{uuid.uuid4().hex}")
        w = df.repartition(len(groups) or 1, "__fg")
        if sort_within:
            # __fg must lead the sort: the partitioned-file writer
            # requires ordering by partition columns and would insert
            # its own (k-order-destroying) sort otherwise
            w = w.sortWithinPartitions("__fg", *sort_within)
        (
            w.write.mode("overwrite")
            .partitionBy("__fg")
            .parquet(staging)
        )
        for fg in groups:
            fg_dir = os.path.join(staging, f"__fg={fg}")
            files = (
                [f for f in os.listdir(fg_dir) if f.endswith(".parquet")]
                if os.path.isdir(fg_dir)
                else []
            )
            file_id = f"fg-{fg}"
            name = (
                namer(file_id) if namer is not None
                else f"{file_id}_0-0-0_{instant}.parquet"
            )
            dst = os.path.join(self.location, name)
            if len(files) == 1:
                os.replace(os.path.join(fg_dir, files[0]), dst)
            else:
                # group emptied (or split) — materialize via a single-
                # file rewrite so a slice is always exactly one file
                part = self.spark.read.parquet(fg_dir) if files else None
                tmp2 = os.path.join(
                    self.location, f"_one_{uuid.uuid4().hex}"
                )
                if part is None:
                    continue
                part.coalesce(1).write.mode("overwrite").parquet(tmp2)
                one = [
                    f for f in os.listdir(tmp2) if f.endswith(".parquet")
                ][0]
                os.replace(os.path.join(tmp2, one), dst)
                for leftover in os.listdir(tmp2):
                    os.remove(os.path.join(tmp2, leftover))
                os.rmdir(tmp2)
            entry = {
                "fileId": file_id,
                "path": name,
                "numWrites": None,
                "fileSizeInBytes": os.path.getsize(dst),
            }
            if fg in key_stats:
                entry["keyStats"] = key_stats[fg]
            # per-file column min/max from the parquet footer — the
            # metadata-table column_stats partition re-derived (one
            # footer read per written file, beside the getsize above);
            # read_pruned skips whole slices on these ranges
            from .delta_log import _collect_file_stats

            cs = _collect_file_stats(dst)
            if cs is not None:
                entry["columnStats"] = json.loads(cs)
            stats.append(entry)
        for root, dirs, files in os.walk(staging, topdown=False):
            for fname in files:
                os.remove(os.path.join(root, fname))
            for d in dirs:
                os.rmdir(os.path.join(root, d))
        os.rmdir(staging)
        return stats

    def _commit(
        self,
        instant: str,
        stats: list[dict],
        suffix: str = ".commit",
        operation: str = "UPSERT",
        top_level: dict | None = None,
    ) -> None:
        meta = {
            "operationType": operation,
            "partitionToWriteStats": {"": stats},
        }
        if top_level:
            meta.update(top_level)  # e.g. replacedFileGroups (cluster)
        extra = getattr(self, "_extra_metadata", None)
        if extra:
            meta["extraMetadata"] = dict(extra)
        path = os.path.join(self.hoodie, f"{instant}{suffix}")
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        try:
            os.link(tmp, path)  # atomic put-if-absent: the commit
        except FileExistsError:
            from .tables import ConcurrentCommitError

            raise ConcurrentCommitError(
                f"instant {instant} was committed by another writer — "
                "Hudi resolves multi-writer via a lock provider (the "
                "reference wires DynamoDB); re-read and retry"
            ) from None
        finally:
            os.remove(tmp)

    def bulk_insert(self, df: DataFrame) -> str:
        instant = self._next_instant()
        prepared = self._with_meta(df, instant, self._file_group_expr())
        stats = self._write_groups(
            prepared, instant, list(range(self.n_file_groups))
        )
        self._commit(instant, stats)
        return instant

    @staticmethod
    def _fg_of(file_id: str) -> int:
        return int(file_id.split("-", 1)[1])

    def _latest_key_stats(self) -> dict[int, dict]:
        """Newest per-group key-range + bloom metadata from the
        timeline (write stats carry it since r10); groups without it
        are simply absent — consumers treat that as 'may contain'."""
        out: dict[int, dict] = {}
        for t in self.instants():
            meta = self._commit_meta(t)
            for _part, stats in meta["partitionToWriteStats"].items():
                for st in stats:
                    if "keyStats" in st:
                        out[self._fg_of(st["fileId"])] = st["keyStats"]
                    else:
                        # a newer base write without index metadata
                        # invalidates any older entry for the group
                        out.pop(self._fg_of(st["fileId"]), None)
        return out

    def _consult_index(
        self, upd: DataFrame, key_stats: dict[int, dict]
    ) -> dict[int, bool]:
        """Hudi's bloom-index TAGGING step: test the batch's record
        keys against each candidate group's key range + bloom filter
        (broadcast, executor-side; one tiny per-group boolean comes
        back). False = the group PROVABLY contains none of the batch's
        keys (bloom has no false negatives), so the merge join is
        skipped for it."""
        import base64

        import numpy as np
        import pandas as pd

        key_col, k = self.record_key, self._BLOOM_K
        s1, s2 = self._BLOOM_SEED1, self._BLOOM_SEED2
        packed = {
            fg: (
                st["minKey"],
                st["maxKey"],
                np.frombuffer(
                    base64.b64decode(st["bloom"]), dtype=np.uint8
                ),
                int(st["bloomM"]),
            )
            for fg, st in key_stats.items()
        }

        def probe(batches):
            for pdf in batches:
                for fg, grp in pdf.groupby("__fg"):
                    fg = int(fg)
                    if fg not in packed:
                        yield pd.DataFrame(
                            {"fg": [fg], "may": [True]}
                        )
                        continue
                    lo, hi, bits, m = packed[fg]
                    keys = np.unique(
                        grp[key_col].astype(str).to_numpy(dtype=object)
                    )
                    inr = (keys >= lo) & (keys <= hi)
                    keys = keys[inr]
                    may = False
                    if len(keys):
                        h1 = pd.util.hash_array(keys, hash_key=s1)
                        h2 = pd.util.hash_array(keys, hash_key=s2) | 1
                        hit = np.ones(len(keys), dtype=bool)
                        for i in range(k):
                            pos = (
                                h1 + np.uint64(i) * h2
                            ) % np.uint64(m)
                            byte = bits[(pos // 8).astype(np.int64)]
                            bit = np.left_shift(
                                np.uint8(1), (pos % 8).astype(np.uint8)
                            )
                            hit &= (byte & bit) != 0
                        may = bool(hit.any())
                    yield pd.DataFrame({"fg": [fg], "may": [may]})

        rows = (
            upd.select("__fg", key_col)
            .repartition("__fg")
            .mapInPandas(probe, "fg int, may boolean")
            .groupBy("fg")
            .agg(F.max("may").alias("may"))
            .collect()
        )
        return {r["fg"]: bool(r["may"]) for r in rows}

    def upsert(self, updates: DataFrame) -> str:
        """Copy-on-write upsert: only the file groups the update keys
        hash into are merged and rewritten as new slices; every other
        group keeps its current file untouched.

        Tagging reads ONLY the touched groups' base files (file-level
        pruning off the timeline — an upsert touching one group reads
        one group, pinned by test), and the bloom index splits the
        touched set: groups whose key range + bloom PROVE the batch
        holds no existing key skip the merge join entirely (their new
        rows union in after a batch-local precombine dedup); only
        bloom-positive groups pay the key-shuffle merge."""
        from pyspark.sql import Window

        from ..operators.merge import upsert_by_key

        instant = self._next_instant()
        upd = self._with_meta(updates, instant, self._file_group_expr())
        # ONE pass over the batch answers both tagging questions: the
        # bloom-index probe emits a row per file group present in the
        # batch, so the touched set IS its key set — the former
        # separate distinct().collect() job is gone (r12)
        may = self._consult_index(
            upd, self._latest_key_stats()
        )
        touched = sorted(may)
        slices = self._file_slices()
        touched_slices = {
            key: p
            for key, p in slices.items()
            if self._fg_of(key[1]) in touched
        }
        cur_touched = (
            self._read_slices(touched_slices, with_fg=True)
            if touched_slices
            else None
        )
        existing_fgs = {
            self._fg_of(key[1]) for key in touched_slices
        }
        hit = [
            fg
            for fg in touched
            if fg in existing_fgs and may.get(fg, True)
        ]
        miss = [fg for fg in touched if fg not in hit]
        parts = []
        if hit:
            parts.append(
                upsert_by_key(
                    cur_touched.filter(F.col("__fg").isin(hit)),
                    upd.filter(F.col("__fg").isin(hit)),
                    [self.record_key],
                    self.precombine_field,
                )
            )
        if miss:
            # bloom-negative groups: no key can collide with the base,
            # so old rows union with the batch (deduped per key by
            # precombine, the same winner upsert_by_key would pick)
            w = Window.partitionBy(self.record_key).orderBy(
                F.col(self.precombine_field).desc()
            )
            fresh = (
                upd.filter(F.col("__fg").isin(miss))
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            if cur_touched is not None:
                old = cur_touched.filter(F.col("__fg").isin(miss))
                fresh = old.unionByName(
                    fresh, allowMissingColumns=True
                )
            parts.append(fresh)
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p, allowMissingColumns=True)
        # rows kept from the old slice keep their original commit time;
        # upsert_by_key picks the newest version per key by precombine.
        # _write_groups consumes the merge TWICE (key-stats pass +
        # write); an eager localCheckpoint computes the merge join once
        # and serves both passes from the block manager (r12)
        merged = merged.localCheckpoint(eager=True)
        stats = self._write_groups(merged, instant, touched)
        self._commit(instant, stats)
        return instant

    # ------------------------------- reads -------------------------------

    def _read_slices(
        self, slices: dict, with_fg: bool = False, merge_schema: bool = False
    ) -> DataFrame:
        paths = [
            os.path.join(self.location, p) for p in sorted(slices.values())
        ]
        if not paths:
            raise ValueError("empty table")
        reader = self.spark.read
        if merge_schema:
            # log files drift by one column: tombstone logs carry
            # _hoodie_is_deleted, data logs don't — without footer
            # merging the column survives only when the first
            # (lexicographic) file happens to be a tombstone log
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*paths).withColumn(
            "_hoodie_file_name", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
        if with_fg:
            df = df.withColumn("__fg", self._file_group_expr())
        return df

    def read(self, instant: str | None = None) -> DataFrame:
        return self._read_slices(self._file_slices(instant)).drop("__fg")

    def _latest_column_stats(
        self, instant: str | None = None
    ) -> dict[str, dict]:
        """{relative slice path -> footer column stats} from the
        commit write stats (recorded at write since r12) — timeline
        metadata only, no file touched."""
        out: dict[str, dict] = {}
        for t in self.instants():
            if instant is not None and t > instant:
                break
            meta = self._commit_meta(t)
            for _part, stats in meta["partitionToWriteStats"].items():
                for st in stats:
                    if "columnStats" in st:
                        out[st["path"]] = st["columnStats"]
        return out

    @staticmethod
    def _stats_miss(st: dict | None, filters: list) -> bool:
        """True when the slice's [min,max] ranges PROVABLY miss every
        row for the conjunction — missing stats (old commits, log
        files, unreliable footer types) never prune."""
        if not st:
            return False
        mins = st.get("minValues") or {}
        maxs = st.get("maxValues") or {}
        for col, op, lit in filters:
            if col not in mins or col not in maxs:
                continue
            lo, hi = mins[col], maxs[col]
            try:
                if op == "=" and (lit < lo or lit > hi):
                    return True
                if op == "<" and lo >= lit:
                    return True
                if op == "<=" and lo > lit:
                    return True
                if op == ">" and hi <= lit:
                    return True
                if op == ">=" and hi < lit:
                    return True
            except TypeError:
                continue  # incomparable literal/stat types: keep
        return False

    @staticmethod
    def _residual_expr(filters: list):
        ops = {
            "=": lambda c, v: c == v,
            "<": lambda c, v: c < v,
            "<=": lambda c, v: c <= v,
            ">": lambda c, v: c > v,
            ">=": lambda c, v: c >= v,
        }
        cond = None
        for col, op, lit in filters:
            if op not in ops:
                raise ValueError(f"unsupported pruning operator {op!r}")
            piece = ops[op](F.col(col), F.lit(lit))
            cond = piece if cond is None else (cond & piece)
        return cond if cond is not None else F.lit(True)

    def _host_fg(self, key) -> int:
        """Host-side twin of ``_file_group_expr`` (md5 first 15 hex
        digits mod group count over the key's string form) — a point
        lookup can route to its group WITHOUT a Spark job."""
        import hashlib

        h = int(
            hashlib.md5(str(key).encode()).hexdigest()[:15], 16
        )
        return h % self.n_file_groups

    def _key_may_exist(self, st: dict, key: str) -> bool:
        """Key-range + bloom membership against one group's recorded
        index metadata (the upsert-tagging math, host-side; bloom has
        no false negatives, so False PROVES absence)."""
        import base64

        import numpy as np
        import pandas as pd

        if not (st["minKey"] <= key <= st["maxKey"]):
            return False
        bits = np.frombuffer(
            base64.b64decode(st["bloom"]), dtype=np.uint8
        )
        m = int(st["bloomM"])
        keys = np.array([key], dtype=object)
        h1 = pd.util.hash_array(keys, hash_key=self._BLOOM_SEED1)
        h2 = pd.util.hash_array(keys, hash_key=self._BLOOM_SEED2) | 1
        for i in range(self._BLOOM_K):
            pos = int((h1 + np.uint64(i) * h2)[0] % np.uint64(m))
            if not (bits[pos // 8] & (1 << (pos % 8))):
                return False
        return True

    def _routed_groups(self, keys: list) -> set[int]:
        """Distinct file groups the keys hash into, minus groups whose
        key-range + bloom index PROVES hold none of them."""
        ks = self._latest_key_stats()
        out: set[int] = set()
        for key in keys:
            fg = self._host_fg(key)
            st = ks.get(fg)
            if st is not None and not self._key_may_exist(
                st, str(key)
            ):
                continue
            out.add(fg)
        return out

    def read_by_key(self, keys: list) -> DataFrame:
        """POINT LOOKUPS at file-read cost O(distinct routed groups),
        never a table scan: each key routes to its hash group
        host-side (the writer's own md5 assignment), and a routed
        group whose key-range + bloom metadata proves absence drops
        too — Hudi's write-side tagging index serving reads. The plan
        lists one slice per surviving group; the exact key filter
        applies on top (bloom false positives resolve to zero rows,
        never wrong rows)."""
        fgs = self._routed_groups(keys)
        slices = {
            (part, fid): p
            for (part, fid), p in self._file_slices().items()
            if self._fg_of(fid) in fgs
        }
        if not slices:
            return self.read().filter(F.lit(False))
        return (
            self._read_slices(slices)
            .drop("__fg")
            .filter(F.col(self.record_key).isin(list(keys)))
        )

    def read_pruned(
        self, filters: list, instant: str | None = None
    ) -> DataFrame:
        """Snapshot read with FILE-LEVEL data skipping — Hudi's
        metadata-table ``column_stats`` partition re-derived:
        ``filters`` is a list of ``(column, op, literal)`` conjuncts
        (op ∈ =, <, <=, >, >=); slices whose recorded footer ranges
        provably miss every conjunct are never listed in the plan, and
        the residual filter applies exactly on the survivors. Planning
        is timeline metadata only; CoW slices refresh their stats on
        every rewrite, so pruning is always against current state."""
        slices = self._file_slices(instant)
        cs = self._latest_column_stats(instant)
        keep = {
            k: p
            for k, p in slices.items()
            if not self._stats_miss(cs.get(p), filters)
        }
        residual = self._residual_expr(filters)
        if not keep:
            return self.read(instant).filter(F.lit(False))
        return (
            self._read_slices(keep).drop("__fg").filter(residual)
        )

    def read_incremental(self, begin_instant: str) -> DataFrame:
        """Rows committed strictly AFTER ``begin_instant``: reads only
        the file slices written by later commits (the commit metadata
        lists them) and keeps rows stamped with a later commit time —
        carried-over rows in a rewritten slice keep their old stamp and
        are filtered out, exactly Hudi's incremental-query contract."""
        later = [t for t in self.instants() if t > begin_instant]
        slices: dict[tuple, str] = {}
        for t in later:
            meta = self._commit_meta(t)
            # a clustering replacecommit in the range RETIRES groups:
            # their in-range rows ride the new slices (original stamps
            # kept), so keeping the old slice too would double-count
            for part, fid in meta.get("replacedFileGroups", []):
                slices.pop((part, fid), None)
            for part, stats in meta["partitionToWriteStats"].items():
                for st in stats:
                    slices[(part, st["fileId"])] = st["path"]
        if not slices:
            base = self.read()
            return base.filter(F.lit(False))
        return self._read_slices(slices).filter(
            F.col("_hoodie_commit_time") > begin_instant
        )


class HudiMorTable(HudiCowTable):
    """MERGE_ON_READ table in Hudi's layout — the OTHER
    ``hoodie.datasource.write.table.type`` the reference selects per
    run (hudi/hudi_scd_script.py:13-18,33) and queries through the
    ``_rt`` / ``_ro`` views (README.md:157-160).

    Layout semantics (https://hudi.apache.org/docs/concepts):

    * ``bulk_insert`` writes base file slices under a ``.deltacommit``
      (every MoR write is a deltacommit; compactions are commits).
    * ``upsert`` appends one LOG FILE per touched file group
      (``{fileId}_{instant}.log.{version}_{instant}.parquet``) and
      commits a ``.deltacommit`` — NO base file is rewritten; the write
      cost is O(batch), Hudi's defining MoR trade.
    * ``read_optimized()`` (the ``_ro`` view) scans base files only —
      stale but log-free.
    * ``read()`` (the ``_rt`` view / snapshot) merges base + logs by
      record key: precombine picks the newest version, commit-time
      breaks ties toward the latest writer — ``upsert_by_key`` with
      ``_hoodie_commit_time`` as the priority column, one key shuffle.
    * ``compact()`` folds each log-bearing file group's merged rows
      into a NEW base slice under a ``.commit``; timeline replay then
      ignores pre-compaction logs for that group, so ``_ro == _rt``.

    Honest scoping: log files here are parquet named with Hudi's
    ``.log.N`` infix but WITHOUT the leading dot (Spark's datasource
    hard-filters hidden file names, so dot-named logs would be
    unreadable without a custom reader — which is exactly why real
    Hudi ships one); the timeline, file-slice, and merge semantics are
    layout-faithful, while the HoodieLogFormat binary block encoding
    itself (magic + avro data blocks) stays out of contract like the
    other runtime-gated encodings.
    """

    TABLE_TYPE = "MERGE_ON_READ"
    INSTANT_SUFFIXES = (".commit", ".deltacommit", ".replacecommit")

    # -------------------------- timeline replay --------------------------

    def _mor_slices(self, instant: str | None = None) -> dict:
        """{(partition, fileId) -> {"base": path|None, "logs": [paths]}}
        — a base write (compaction or insert) starts a fresh slice and
        retires that group's earlier logs; log files (``.log.``
        infix names) stack onto the current slice in timeline order."""
        slices: dict[tuple, dict] = {}
        for t in self.instants():
            if instant is not None and t > instant:
                break
            meta = self._commit_meta(t)
            for part, fid in meta.get("replacedFileGroups", []):
                slices.pop((part, fid), None)
            for part, stats in meta["partitionToWriteStats"].items():
                for st in stats:
                    key = (part, st["fileId"])
                    if ".log." in os.path.basename(st["path"]):
                        slices.setdefault(
                            key, {"base": None, "logs": []}
                        )["logs"].append(st["path"])
                    else:
                        slices[key] = {"base": st["path"], "logs": []}
        return slices

    # ------------------------------ writes ------------------------------

    def bulk_insert(self, df: DataFrame) -> str:
        instant = self._next_instant()
        prepared = self._with_meta(df, instant, self._file_group_expr())
        stats = self._write_groups(
            prepared, instant, list(range(self.n_file_groups))
        )
        self._commit(
            instant, stats, suffix=".deltacommit",
            operation="BULK_INSERT",
        )
        return instant

    def upsert(self, updates: DataFrame) -> str:
        """Append-only MoR upsert: the raw update batch lands as one
        log file per touched file group; nothing merges until read
        time (or compaction)."""
        instant = self._next_instant()
        upd = self._with_meta(updates, instant, self._file_group_expr())
        touched = sorted(
            r["__fg"] for r in upd.select("__fg").distinct().collect()
        )
        slices = self._mor_slices()

        def namer(file_id: str) -> str:
            version = len(
                slices.get(("", file_id), {"logs": []})["logs"]
            ) + 1
            return f"{file_id}_{instant}.log.{version}_{instant}.parquet"

        stats = self._write_groups(
            upd.filter(F.col("__fg").isin(touched)),
            instant,
            touched,
            namer=namer,
        )
        self._commit(instant, stats, suffix=".deltacommit")
        return instant

    def compact(self) -> str | None:
        """Fold every log-bearing file group into a fresh base slice
        (one ``.commit``); groups without logs keep their base
        untouched. Returns the compaction instant, or None when there
        is nothing to compact."""
        slices = self._mor_slices()
        log_fids = [
            fid for (_p, fid), s in slices.items() if s["logs"]
        ]
        if not log_fids:
            return None
        instant = self._next_instant()
        fgs = sorted(int(f.split("-", 1)[1]) for f in log_fids)
        snap = self.read().withColumn("__fg", self._file_group_expr())
        stats = self._write_groups(
            snap.filter(F.col("__fg").isin(fgs)), instant, fgs
        )
        self._commit(instant, stats, operation="COMPACT")
        return instant

    # ------------------------------- reads -------------------------------

    def read_optimized(self, instant: str | None = None) -> DataFrame:
        """The ``_ro`` view: base files only (log data invisible until
        compaction) — Hudi's scan-fast/stale trade."""
        slices = self._mor_slices(instant)
        bases = {
            k: s["base"] for k, s in slices.items() if s["base"]
        }
        return self._read_slices(bases)

    def read(self, instant: str | None = None) -> DataFrame:
        """The ``_rt`` view / snapshot: base ∪ logs merged by record
        key (max precombine, commit-time tiebreak to the latest
        writer). Only LOG-BEARING file groups pay the key-shuffle
        merge — log-less groups' base files pass through untouched
        (real Hudi's per-file-group realtime merge), so the read
        shuffle is O(hot groups), not O(table)."""
        return self._merged_read(self._mor_slices(instant))

    def _merged_read(self, slices: dict) -> DataFrame:
        """The snapshot merge over an arbitrary slices dict — read()
        passes the full table; scoped consumers (hudi_cdc's per-commit
        group state) pass only the touched groups, so their scans are
        bounded by what the commit touched."""
        from ..operators.merge import upsert_by_key

        bases = {k: s["base"] for k, s in slices.items() if s["base"]}
        logs = [p for s in slices.values() for p in s["logs"]]
        if not bases and not logs:
            raise ValueError("empty table")
        if not logs:
            return self._read_slices(bases)
        hot = {
            k: s["base"]
            for k, s in slices.items()
            if s["logs"] and s["base"]
        }
        cold = {k: p for k, p in bases.items() if k not in hot}
        log_df = self._read_slices(
            {("", f"log-{i}"): p for i, p in enumerate(logs)},
            merge_schema=True,
        )
        hot_base = self._read_slices(hot) if hot else None
        target = (
            hot_base if hot_base is not None else log_df.limit(0)
        )
        merged = upsert_by_key(
            target,
            log_df,
            [self.record_key],
            self.precombine_field,
            priority_col="_hoodie_commit_time",
        )
        # a winning tombstone (delete()) removes the key; the marker
        # column never leaves the read path
        if HOODIE_IS_DELETED in merged.columns:
            merged = merged.filter(
                ~F.coalesce(F.col(HOODIE_IS_DELETED), F.lit(False))
            ).drop(HOODIE_IS_DELETED)
        if cold:
            merged = self._read_slices(cold).unionByName(
                merged, allowMissingColumns=True
            )
        return merged

    def read_by_key(self, keys: list) -> DataFrame:
        """MoR point lookups: keys route to their hash groups like
        CoW; a routed group reads MERGED (its log stack may hold the
        key even when the base's bloom does not — but log writes
        already invalidate the group's index metadata, so bloom
        skipping only ever fires on log-less groups)."""
        fgs = self._routed_groups(keys)
        slices = {
            k: s
            for k, s in self._mor_slices().items()
            if self._fg_of(k[1]) in fgs
        }
        if not slices:
            return self.read().filter(F.lit(False))
        return self._merged_read(slices).filter(
            F.col(self.record_key).isin(list(keys))
        )

    def read_pruned(
        self, filters: list, instant: str | None = None
    ) -> DataFrame:
        """MoR data skipping: only LOG-LESS groups prune by their base
        stats — a group with live log files can hold matching rows its
        base footer knows nothing about, so it always pays the merge;
        the residual filter applies exactly either way. Pruning power
        returns as compaction retires log stacks (the MoR bargain)."""
        slices = self._mor_slices(instant)
        cs = self._latest_column_stats(instant)
        keep = {
            k: s
            for k, s in slices.items()
            if s["logs"]
            or not self._stats_miss(
                cs.get(s["base"]) if s["base"] else None, filters
            )
        }
        residual = self._residual_expr(filters)
        if not keep:
            return self.read(instant).filter(F.lit(False))
        return self._merged_read(keep).filter(residual)

    def read_incremental(self, begin_instant: str) -> DataFrame:
        """Changed records (current values) committed strictly after
        ``begin_instant``: only file groups the later delta/commits
        touched are merged — the timeline names them, so untouched
        groups cost nothing."""
        later = [t for t in self.instants() if t > begin_instant]
        if not later:
            return self.read().filter(F.lit(False))
        fids = set()
        for t in later:
            meta = self._commit_meta(t)
            for _part, stats in meta["partitionToWriteStats"].items():
                fids.update(st["fileId"] for st in stats)
        fgs = [int(f.split("-", 1)[1]) for f in fids]
        snap = self.read().withColumn("__fg", self._file_group_expr())
        return (
            snap.filter(F.col("__fg").isin(fgs))
            .filter(F.col("_hoodie_commit_time") > begin_instant)
            .drop("__fg")
        )


def _upsert_idempotent(
    self, updates, app_id: str, epoch: int
) -> bool:
    """Exactly-once upsert: commit metadata carries (app-id, epoch)
    in ``extraMetadata`` — exactly where Hudi's DeltaStreamer stores
    its source checkpoint — and a replayed epoch is skipped. Returns
    True if the commit happened."""
    seen = -1
    for t in self.instants():
        em = self._commit_meta(t).get("extraMetadata") or {}
        if em.get("app-id") == app_id and "epoch" in em:
            seen = max(seen, int(em["epoch"]))
    if epoch <= seen:
        return False
    self._extra_metadata = {"app-id": app_id, "epoch": str(epoch)}
    try:
        if self.instants():
            self.upsert(updates)
        else:
            self.bulk_insert(updates)
    finally:
        self._extra_metadata = None
    return True


def stream_to_hudi(
    stream_df,
    location: str,
    checkpoint_dir: str,
    record_key: str,
    precombine_field: str,
    app_id: str = "hudi-sink",
    table_cls=None,
):
    """Exactly-once foreachBatch streaming UPSERT sink into the Hudi
    layout (CoW by default; pass ``table_cls=HudiMorTable`` for
    log-append MoR ingestion) — the Hudi twin of stream_to_delta_log /
    stream_to_iceberg."""
    from pyspark.sql import SparkSession

    cls = table_cls or HudiCowTable

    def write_batch(batch_df, batch_id: int) -> None:
        spark = SparkSession.getActiveSession()
        t = cls(
            spark, location,
            record_key=record_key, precombine_field=precombine_field,
        )
        t.upsert_idempotent(batch_df, app_id, int(batch_id))

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )


HudiCowTable.upsert_idempotent = _upsert_idempotent


def _clean(self, retain_slices: int = 1, dry_run: bool = False) -> list[str]:
    """Hudi's CLEANER: physically delete file slices older than the
    newest ``retain_slices`` per file group (plus, for MoR, log files
    already folded by a later compaction). Time travel to instants
    whose slices were cleaned fails loudly afterwards — the same
    retention trade as Delta's VACUUM; ``retain_slices`` is the audit
    window knob. Dry run lists without deleting. Returns relative
    paths (deleted, or would-be)."""
    # replay the FULL timeline: per (partition, fileId), every base
    # slice in commit order + the log files attached to each; a
    # replacecommit retires a group entirely — ALL its prior slices
    # become cleanable (reads of the current state never touch them)
    history: dict[tuple, list[dict]] = {}
    retired: list[dict] = []
    for t in self.instants():
        meta = self._commit_meta(t)
        for part, fid in meta.get("replacedFileGroups", []):
            retired.extend(history.pop((part, fid), []))
        for part, stats in meta["partitionToWriteStats"].items():
            for st in stats:
                key = (part, st["fileId"])
                is_log = ".log." in os.path.basename(st["path"])
                slices = history.setdefault(key, [])
                if is_log:
                    if not slices:
                        slices.append({"base": None, "logs": []})
                    slices[-1]["logs"].append(st["path"])
                else:
                    slices.append({"base": st["path"], "logs": []})
    doomed: list[str] = []
    for slices in history.values():
        for sl in slices[:-retain_slices] if retain_slices else slices:
            if sl["base"]:
                doomed.append(sl["base"])
            doomed.extend(sl["logs"])
        # retained slices keep their logs (still needed by _rt reads)
    for sl in retired:
        if sl["base"]:
            doomed.append(sl["base"])
        doomed.extend(sl["logs"])
    # savepoints pin their instant's whole file set (restore targets)
    preserved: set[str] = set()
    for sp in getattr(self, "savepoints", lambda: [])():
        preserved.update(
            self._savepoint_meta(sp).get("preservedFiles", [])
        )
    out = sorted(set(doomed) - preserved)
    if not dry_run:
        for rel in out:
            full = os.path.join(self.location, rel)
            if os.path.exists(full):
                os.remove(full)
    return out


HudiCowTable.clean = _clean


#: Hudi's soft-delete marker column (the payload flag DeltaStreamer
#: and the DataSource writer honor)
HOODIE_IS_DELETED = "_hoodie_is_deleted"


def _cow_delete(self, condition) -> str | None:
    """DELETE FROM the CoW table: only file groups holding a matching
    row rewrite (the same blast-radius bound as upsert); groups
    emptied by the delete get an explicit EMPTY slice so timeline
    replay never resurrects the old one. Returns the instant, or None
    when nothing matched (no empty commit). NULL predicates keep the
    row (SQL DML semantics)."""
    import uuid as _uuid

    cond = F.expr(condition) if isinstance(condition, str) else condition
    current = self._read_slices(self._file_slices(), with_fg=True)
    touched = sorted(
        r["__fg"]
        for r in current.filter(cond).select("__fg").distinct().collect()
    )
    if not touched:
        return None
    instant = self._next_instant()
    scoped = current.filter(F.col("__fg").isin(touched))
    keep = scoped.filter(~F.coalesce(cond, F.lit(False)))
    stats = self._write_groups(keep, instant, touched)
    written = {int(s["fileId"].split("-", 1)[1]) for s in stats}
    for fg in touched:
        if fg in written:
            continue
        # group fully emptied: publish an explicit empty slice
        empty = keep.filter(F.lit(False)).drop("__fg")
        tmp = os.path.join(self.location, f"_empty_{_uuid.uuid4().hex}")
        empty.coalesce(1).write.mode("overwrite").parquet(tmp)
        one = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        name = f"fg-{fg}_0-0-0_{instant}.parquet"
        os.replace(os.path.join(tmp, one), os.path.join(self.location, name))
        for leftover in os.listdir(tmp):
            os.remove(os.path.join(tmp, leftover))
        os.rmdir(tmp)
        stats.append(
            {
                "fileId": f"fg-{fg}",
                "path": name,
                "numWrites": 0,
                "fileSizeInBytes": os.path.getsize(
                    os.path.join(self.location, name)
                ),
            }
        )
    self._commit(instant, stats, operation="DELETE")
    return instant


def _mor_delete(self, condition) -> str | None:
    """MoR DELETE via log TOMBSTONES — Hudi's ``_hoodie_is_deleted``
    payload flag: matching rows land in log files marked deleted (no
    base rewrite, O(matches) write cost); the realtime merge drops a
    key whose winning version is a tombstone, and compaction folds the
    tombstones away physically. A later upsert of the same key
    resurrects it (latest writer wins), exactly Hudi's semantics."""
    cond = F.expr(condition) if isinstance(condition, str) else condition
    instant = self._next_instant()
    doomed = (
        self.read()
        .filter(cond)
        .withColumn(HOODIE_IS_DELETED, F.lit(True))
        .withColumn("_hoodie_commit_time", F.lit(instant))
        .withColumn("__fg", self._file_group_expr())
    )
    touched = sorted(
        r["__fg"] for r in doomed.select("__fg").distinct().collect()
    )
    if not touched:
        return None
    slices = self._mor_slices()

    def namer(file_id: str) -> str:
        version = len(
            slices.get(("", file_id), {"logs": []})["logs"]
        ) + 1
        return f"{file_id}_{instant}.log.{version}_{instant}.parquet"

    stats = self._write_groups(doomed, instant, touched, namer=namer)
    self._commit(
        instant, stats, suffix=".deltacommit", operation="DELETE"
    )
    return instant


HudiCowTable.delete = _cow_delete
HudiMorTable.delete = _mor_delete

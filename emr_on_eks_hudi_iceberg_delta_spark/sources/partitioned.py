"""Partition-scoped versioned table — the 100 TB CoW write path.

``VersionedTable`` rewrites the whole table per commit (fine locally,
matching the reference's table sizes). At 100 TB a CoW upsert must rewrite
only the partitions the update batch touches — this is exactly what
Hudi/Iceberg/Delta do with file-level manifests; here the unit of rewrite
is a hive partition.

Layout::

    <location>/files/commit-<n>/<pcol>=<val>/*.parquet
    <location>/_manifest.json        # versions: {pval: commit_id}

Each commit writes ONLY the touched partitions under a fresh ``commit-<n>``
dir (``partitionBy`` write), then publishes a new manifest mapping every
live partition value to the commit that last rewrote it. Reads group the
manifest by commit dir — one parquet scan per referenced commit (bounded by
history depth, not partition count), each with ``basePath`` so the
partition column and partition pruning work natively. Old manifests remain
readable: snapshot isolation + time travel at partition granularity.

The scan cost of an upsert is |touched partitions|, not |table| — the
property that makes SCD2 ingestion feasible when the dimension is 100 TB
and the daily batch touches 0.1% of keys.
"""

from __future__ import annotations

import json
import os
import time
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_manifest.json"

# hive's directory name for a NULL partition value — partitionBy writes
# null-keyed rows under it, so manifest keys must use the same sentinel
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


class PartitionedTable:
    """Partition values must render identically through ``str(value)``
    and hive's directory naming — plain strings (no ``/ : %`` etc.) and
    integers. Values hive percent-escapes (timestamps, special chars)
    or renders differently (booleans: ``True`` vs ``true``) would break
    the manifest-key ↔ directory-name equality every read path relies
    on; derive a clean partition column first (the generated-column
    pattern)."""

    def __init__(self, spark: SparkSession, location: str, partition_col: str):
        self.spark = spark
        self.location = location.rstrip("/")
        self._initial_partition_col = partition_col

    # -- manifest plumbing --------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.location, _MANIFEST)

    def _doc(self) -> dict:
        if not os.path.exists(self._manifest_path()):
            return {"versions": [], "commit_specs": {}}
        with open(self._manifest_path()) as f:
            doc = json.load(f)
        doc.setdefault("commit_specs", {})
        return doc

    def _versions(self) -> list[dict]:
        return self._doc()["versions"]

    @property
    def partition_col(self) -> str:
        """The CURRENT partition spec — new commits partition by this.
        Older commits keep the spec they were written under (recorded in
        the manifest's ``commit_specs``), Iceberg partition-evolution
        style."""
        return self._doc().get("spec", self._initial_partition_col)

    def _commit_spec(self, commit_id: int) -> str:
        return self._doc()["commit_specs"].get(
            str(commit_id), self._initial_partition_col
        )

    def evolve_partition_spec(self, new_col: str) -> "PartitionedTable":
        """Iceberg-style partition evolution: commits from now on partition
        by ``new_col``; data already written stays in its old layout and
        remains readable (each commit records its own spec). No rewrite
        happens here — with ``upsert(..., global_index=True)`` old keys
        migrate to the new layout lazily as their partitions are touched.

        Manifest keys are composite "<spec column>=<value>" strings, so
        specs never collide in the manifest even when their value domains
        overlap (the per-spec-manifest property Iceberg gets from spec
        ids)."""
        doc = self._doc()
        doc["spec"] = new_col
        self._write_doc(doc)
        return self

    def _write_doc(self, doc: dict) -> None:
        os.makedirs(self.location, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, self._manifest_path())  # atomic manifest flip

    def _publish(self, partitions: dict[str, int], commit_id: int | None = None) -> None:
        doc = self._doc()
        versions = doc["versions"]
        version = (versions[-1]["version"] + 1) if versions else 0
        versions.append(
            {"version": version, "partitions": partitions, "committed_at": time.time()}
        )
        if commit_id is not None:
            doc["commit_specs"][str(commit_id)] = self.partition_col
        self._write_doc(doc)

    def _commit_dir(self, commit_id: int) -> str:
        return os.path.join(self.location, "files", f"commit-{commit_id}")

    @staticmethod
    def _pkey(spec: str, value) -> str:
        """Composite manifest key ``<spec>=<value>`` for a COLLECTED
        partition value. A NULL value uses hive's
        ``__HIVE_DEFAULT_PARTITION__`` sentinel so the key is always
        byte-identical to the hive dir name ``partitionBy`` writes —
        a bare f-string would render ``spec=None`` and never match,
        orphaning the null partition's prior rows on upsert."""
        return f"{spec}={_HIVE_NULL if value is None else value}"

    @staticmethod
    def _pkey_col(spec: str):
        """Column-expression twin of ``_pkey`` (same NULL sentinel)."""
        return F.concat(
            F.lit(f"{spec}="),
            F.coalesce(F.col(spec).cast("string"), F.lit(_HIVE_NULL)),
        )

    def _write_commit(self, df: DataFrame, commit_id: int) -> None:
        df.write.mode("overwrite").partitionBy(self.partition_col).parquet(
            self._commit_dir(commit_id)
        )

    # -- write surface ------------------------------------------------------

    def overwrite(self, df: DataFrame) -> "PartitionedTable":
        """Full overwrite: every live partition points at the new commit."""
        versions = self._versions()
        commit_id = (versions[-1]["version"] + 1) if versions else 0
        self._write_commit(df, commit_id)
        spec = self.partition_col
        pvals = [
            self._pkey(spec, r[0])
            for r in df.select(spec).distinct().collect()
        ]
        self._publish({v: commit_id for v in pvals}, commit_id=commit_id)
        return self

    def overwrite_partitions(self, df: DataFrame) -> "PartitionedTable":
        """Dynamic partition overwrite (Spark's
        ``partitionOverwriteMode=dynamic`` / Hive ``INSERT OVERWRITE ...
        PARTITION``): replace EXACTLY the partitions present in the
        incoming batch; untouched partitions keep their prior commit
        pointers. No key merge — the batch IS the new content of its
        partitions (the partition-granular sibling of ``replace_where``).

        Scale: one partitioned write of the batch + a metadata-sized
        distinct-partition collect; untouched partitions cost nothing."""
        versions = self._versions()
        if not versions:
            return self.overwrite(df)
        current = dict(versions[-1]["partitions"])
        commit_id = versions[-1]["version"] + 1
        self._write_commit(df, commit_id)
        # the incoming partition set comes from the hive dirs ACTUALLY
        # written (one directory listing), not a re-evaluation of df — a
        # nondeterministic batch would otherwise publish pointers that
        # diverge from the files on disk (same written-state discipline
        # as _commit's row-id high-water mark)
        cdir = self._commit_dir(commit_id)
        incoming = {
            d
            for d in os.listdir(cdir)
            if "=" in d and os.path.isdir(os.path.join(cdir, d))
        }
        current.update({k: commit_id for k in incoming})
        self._publish(current, commit_id=commit_id)
        return self

    def drop_partitions_where(self, predicate) -> list[str]:
        """Partition-granular retention (Hive ``ALTER TABLE ... DROP
        PARTITION`` / the time-based retention job every event table
        runs): publish a new version WITHOUT the live partitions whose
        VALUE passes ``predicate`` (a host callable over the partition
        value string, same contract as ``read_partitions_where`` —
        e.g. ``lambda d: d < "2024-01-10"`` on a day layout).

        Metadata-only: dropped partitions' files stay on disk serving
        older versions (time travel still reads them); reclaim happens
        when history retention expires those versions — the same
        two-phase delete discipline as row-level retention. Returns the
        dropped partition keys. Mixed-spec manifests (post-evolution)
        refuse, like value-pruned reads."""
        versions = self._versions()
        if not versions:
            raise FileNotFoundError(f"no commit at {self.location}")
        current = dict(versions[-1]["partitions"])
        prefix = f"{self.partition_col}="
        foreign = [k for k in current if not k.startswith(prefix)]
        if foreign:
            raise ValueError(
                f"drop_partitions_where: manifest holds partitions under "
                f"other specs ({foreign[:3]}...); compact or upsert to "
                f"migrate before value-predicated drops"
            )
        dropped = sorted(
            k for k in current if predicate(k[len(prefix):])
        )
        if not dropped:
            return []
        for k in dropped:
            del current[k]
        self._publish(current)
        return dropped

    def upsert(
        self,
        updates: DataFrame,
        key_cols: list[str],
        precombine_col: str,
        global_index: bool = False,
    ) -> "PartitionedTable":
        """Partition-scoped keyed upsert: read ONLY the partitions the
        update batch touches, merge, rewrite those partitions; untouched
        partitions keep pointing at their previous commit dirs.

        ``global_index=False`` (default) is Hudi's non-global-index
        behavior: a key must not change its partition value — an update
        that moves a key would leave the old row behind.

        ``global_index=True`` maintains a key->partition index
        (``<location>/index/commit-<n>``): updates join the index to find
        keys whose partition changed; the moved keys' OLD partitions join
        the touched set, the merge drops their old rows there, and the
        index is rewritten. The Hudi GLOBAL_BLOOM/GLOBAL_SIMPLE trade:
        correct cross-partition moves for an index-maintenance cost per
        commit.
        """
        from ..operators.merge import upsert_by_key

        versions = self._versions()
        if not versions:
            return self.overwrite(updates)
        current = versions[-1]["partitions"]
        commit_id = versions[-1]["version"] + 1

        spec = self.partition_col
        # manifest keys are composite "<spec column>=<value>" — unambiguous
        # across partition-spec evolution (no value-domain collisions) and
        # identical to the hive directory name under the commit dir
        touched = {
            self._pkey(spec, r[0])
            for r in updates.select(spec).distinct().collect()
        }
        if global_index:
            idx = self._read_index(versions[-1]["version"])
            if idx is not None:
                # the index stores the partition value under the fixed name
                # __part, so it survives partition-spec evolution (after an
                # evolve, every indexed key reads as "moved" — its old-spec
                # partition joins the touched set and the key migrates to
                # the new layout: lazy Iceberg-style migration)
                moved = (
                    updates.select(*key_cols, self.partition_col)
                    .join(idx, key_cols)
                    .filter(self._pkey_col(spec) != F.col("__part"))
                    .select("__part")
                    .distinct()
                )
                touched |= {str(r[0]) for r in moved.collect()}

        def merge_touched(touched_set: set[str]) -> DataFrame:
            existing = [v for v in touched_set if v in current]
            if not existing:
                return updates
            target = self._read_partitions(current, existing)
            # a moved key's old-partition row shares the record key with
            # its update row, so precombine already replaced it; what
            # remains is rows now carrying a partition OUTSIDE the old
            # set — partitionBy routes them to their new partition and
            # the old partition's rewrite simply no longer contains them.
            return upsert_by_key(target, updates, key_cols, precombine_col)

        merged = merge_touched(touched)
        # Under partition evolution, rewriting an old-spec partition
        # migrates ALL its co-located rows to the new spec; their
        # destination partitions can (a) already exist under the new spec
        # without being in the touched set — those must be read-merged too,
        # or publishing would orphan their prior rows — and (b) be brand
        # new. One expansion converges: the extra partitions' own rows are
        # already in their final new-spec partitions.
        dest = {
            self._pkey(spec, r[0])
            for r in merged.select(spec).distinct().collect()
        }
        extra = {v for v in dest if v in current} - touched
        if extra:
            touched |= extra
            merged = merge_touched(touched)
        self._write_commit(merged, commit_id)
        # Manifest entries come from the hive dirs the commit ACTUALLY
        # wrote (not the touched set): under partition evolution the
        # rewrite emits new-spec dirs for every co-located row of a touched
        # old-spec partition — dirs the touched set never names, whose rows
        # would otherwise silently vanish from read().
        commit_dir = self._commit_dir(commit_id)
        written = {
            d
            for d in os.listdir(commit_dir)
            if "=" in d and not d.startswith((".", "_"))
        }
        new_partitions = dict(current)
        for v in written:
            new_partitions[v] = commit_id
        for v in touched - written:
            # a touched partition with zero surviving rows (every key moved
            # away, or all rows migrated to the new spec) produces no dir —
            # drop it from the manifest instead of pointing at a missing path
            new_partitions.pop(v, None)
        self._publish(new_partitions, commit_id=commit_id)
        if global_index:
            self._write_index(commit_id, key_cols)
        return self

    # -- global index --------------------------------------------------------

    def _index_dir(self, commit_id: int) -> str:
        return os.path.join(self.location, "index", f"commit-{commit_id}")

    def _write_index(self, commit_id: int, key_cols: list[str]) -> None:
        """Full key->partition index snapshot, partition value under the
        spec-independent name ``__part`` (at 100 TB: partition the index by
        key hash and rewrite incrementally; full rewrite here).

        ``__part`` must record where each row ACTUALLY lives — under mixed
        layouts (partition evolution) that is the spec of the commit that
        wrote the row, not the table's current spec. Projecting every row
        through the current spec would mark un-migrated old-layout keys as
        already living in their new-spec partition, so a later update would
        not read (and expire) their old-partition rows — duplicate keys."""
        current = self._versions()[-1]["partitions"]
        by_commit: dict[int, list[str]] = {}
        for pval, cid in current.items():
            by_commit.setdefault(cid, []).append(pval)
        scans = []
        for cid, vals in sorted(by_commit.items()):
            spec = self._commit_spec(cid)
            base = self._commit_dir(cid)
            paths = [os.path.join(base, v) for v in vals]
            scan = self.spark.read.option("basePath", base).parquet(*paths)
            scans.append(
                scan.select(*key_cols, self._pkey_col(spec).alias("__part"))
            )
        if scans:
            idx = reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=False), scans
            )
        else:
            # every partition was dropped (all keys moved/migrated away in
            # a prior upsert): write an EMPTY index with the right schema
            # instead of crashing reduce() on an empty list
            idx = self._read_partitions(current).select(
                *key_cols, F.lit(None).cast("string").alias("__part")
            )
        idx.write.mode("overwrite").parquet(self._index_dir(commit_id))

    def _read_index(self, commit_id: int):
        path = self._index_dir(commit_id)
        if not os.path.exists(path):
            return None
        return self.spark.read.parquet(path)

    def build_index(self, key_cols: list[str]) -> "PartitionedTable":
        """Bootstrap the global index from the current table state."""
        self._write_index(self._versions()[-1]["version"], key_cols)
        return self

    # -- read surface --------------------------------------------------------

    def _read_partitions(
        self, partitions: dict[str, int], pvals: list[str] | None = None
    ) -> DataFrame:
        """One scan per referenced commit dir (basePath keeps the partition
        column + pruning), unioned. Scan count is bounded by history depth."""
        wanted = partitions if pvals is None else {v: partitions[v] for v in pvals}
        if not wanted:
            # empty table state (every partition dropped): recover the
            # schema from any surviving commit dir and return zero rows
            files_root = os.path.join(self.location, "files")
            commits = (
                sorted(os.listdir(files_root), reverse=True)
                if os.path.isdir(files_root)
                else []
            )
            for d in commits:
                base = os.path.join(files_root, d)
                try:
                    return (
                        self.spark.read.option("basePath", base)
                        .parquet(base)
                        .filter(F.lit(False))
                    )
                except Exception:
                    continue
            raise FileNotFoundError(f"no data files at {self.location}")
        by_commit: dict[int, list[str]] = {}
        for pval, cid in wanted.items():
            by_commit.setdefault(cid, []).append(pval)
        scans = []
        for cid, vals in sorted(by_commit.items()):
            # composite manifest keys ARE the hive dir names, so mixed-
            # layout reads (partition evolution) need no spec lookup
            base = self._commit_dir(cid)
            paths = [os.path.join(base, v) for v in vals]
            scans.append(self.spark.read.option("basePath", base).parquet(*paths))
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=False), scans
        )

    def read(self, version: int | None = None) -> DataFrame:
        versions = self._versions()
        if not versions:
            raise FileNotFoundError(f"no commit at {self.location}")
        if version is None:
            return self._read_partitions(versions[-1]["partitions"])
        for v in versions:
            if v["version"] == version:
                return self._read_partitions(v["partitions"])
        raise ValueError(f"version {version} not found at {self.location}")

    def read_partition(self, pval) -> DataFrame:
        current = self._versions()[-1]["partitions"]
        return self._read_partitions(
            current, [self._pkey(self.partition_col, pval)]
        )

    def read_partitions_where(self, predicate) -> DataFrame:
        """Manifest-level partition pruning: scan ONLY the live
        partitions whose VALUE passes ``predicate`` (a host callable
        over the partition value string; NULL partitions pass the hive
        sentinel). The planner never sees the pruned partitions' files —
        the same mechanism hidden-partitioning engines use for
        time-range scans over day-partitioned tables (e.g.
        ``lambda d: d >= "2024-01-10"`` on a ``days(ts)`` layout).

        Metadata-only selection: the manifest holds |partitions|
        entries; no data files are listed or opened for pruned
        partitions."""
        versions = self._versions()
        if not versions:
            raise FileNotFoundError(f"no commit at {self.location}")
        current = versions[-1]["partitions"]
        prefix = f"{self.partition_col}="
        foreign = [k for k in current if not k.startswith(prefix)]
        if foreign:
            # post-evolution mixed layout: a value predicate over the
            # CURRENT spec is ill-defined for old-spec partitions —
            # refuse loudly rather than silently skipping them
            raise ValueError(
                f"read_partitions_where: manifest holds partitions under "
                f"other specs ({foreign[:3]}...); compact or upsert to "
                f"migrate before value-pruned reads"
            )
        chosen = [k for k in current if predicate(k[len(prefix) :])]
        if not chosen:
            return self.read().filter(F.lit(False))
        return self._read_partitions(current, chosen)

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Version retention for the partitioned store — the reclaim half
        of the two-phase delete ``drop_partitions_where`` documents:
        keep the newest ``keep_last`` manifest versions and delete every
        commit directory no KEPT version references (a dropped
        partition's files survive exactly as long as a kept version can
        still time-travel to them, then go). Mirrors
        ``VersionedTable.vacuum``'s referenced-dirs discipline: reclaim
        is keyed on the kept set's commit ids, never on the dropped
        entries, so shared commits stay live. Returns the deleted
        commit-dir paths."""
        import shutil

        doc = self._doc()
        versions = doc["versions"]
        if keep_last < 1:
            raise ValueError("vacuum: keep_last must be >= 1")
        if len(versions) <= keep_last:
            return []
        kept = versions[-keep_last:]
        referenced = {
            cid for v in kept for cid in v["partitions"].values()
        }
        files_root = os.path.join(self.location, "files")
        deleted = []
        if os.path.isdir(files_root):
            for entry in sorted(os.listdir(files_root)):
                if not entry.startswith("commit-"):
                    continue
                cid = int(entry.split("-", 1)[1])
                if cid not in referenced:
                    path = os.path.join(files_root, entry)
                    shutil.rmtree(path, ignore_errors=True)
                    deleted.append(path)
        doc["versions"] = kept
        # commit_specs for reclaimed commits are dead weight; keep only
        # specs of commits any kept version references
        doc["commit_specs"] = {
            k: v
            for k, v in doc["commit_specs"].items()
            if int(k) in referenced
        }
        self._write_doc(doc)
        return deleted

    def history(self) -> list[dict]:
        return self._versions()

    def history_df(self) -> DataFrame:
        """The manifest history as a queryable DataFrame: per version the
        live-partition count and how many partitions that commit
        (re)wrote — the partition-granular DESCRIBE HISTORY. Pure
        manifest metadata."""
        rows = []
        prev: dict[str, int] = {}
        for v in self._versions():
            parts = v["partitions"]
            touched = sum(
                1
                for k, cid in parts.items()
                if prev.get(k) != cid
            ) + sum(1 for k in prev if k not in parts)
            rows.append(
                (
                    v["version"],
                    float(v["committed_at"]),
                    len(parts),
                    touched,
                )
            )
            prev = parts
        return self.spark.createDataFrame(
            rows,
            "version int, committed_at double, n_partitions int, "
            "n_touched int",
        )

    def partitions_df(self) -> DataFrame:
        """The Iceberg ``.partitions`` metadata-table analog: one row per
        live partition with its hive key, owning commit, file count, and
        byte size — what a planner or a small-file audit reads. Pure
        manifest + directory-listing metadata: no data files are opened,
        so it stays driver-cheap at any table size (the listing touches
        |partitions| directories, the same order as the manifest itself)."""
        import glob as _glob

        versions = self._versions()
        if not versions:
            raise FileNotFoundError(f"no commit at {self.location}")
        current = versions[-1]["partitions"]
        rows = []
        for pval, cid in sorted(current.items()):
            pdir = os.path.join(self._commit_dir(cid), pval)
            files = _glob.glob(os.path.join(pdir, "*.parquet"))
            rows.append(
                (
                    pval,
                    cid,
                    len(files),
                    sum(os.path.getsize(f) for f in files),
                )
            )
        return self.spark.createDataFrame(
            rows,
            "partition string, commit_id int, n_files int, size_bytes long",
        )

    def touched_partition_counts(self) -> list[tuple[int, int]]:
        """(version, number of partitions rewritten by that commit) — the
        observable proof that upserts rewrite only what they touch."""
        out = []
        for v in self._versions():
            n = sum(1 for cid in v["partitions"].values() if cid == v["version"])
            out.append((v["version"], n))
        return out


    # -- symlink-format manifest (S13/S14, partitioned flavor) ---------------
    # Delta generates ONE manifest per hive partition under
    # _symlink_format_manifest/<pcol>=<val>/manifest, mirroring the
    # partition directory layout so the external table's partition DDL maps
    # one-to-one. The unpartitioned flavor lives on VersionedTable
    # (sources/tables.py).

    def generate_symlink_manifest(self) -> str:
        """Write per-partition file-list manifests for the CURRENT version.
        Each partition's manifest is tmp+rename atomic; stale partition
        manifest dirs (partitions dropped since the last generation) are
        removed afterwards, so a reader that lists partitions through the
        manifest tree never resurrects a dropped partition."""
        import glob as _glob
        import shutil as _shutil

        versions = self._versions()
        if not versions:
            raise FileNotFoundError(f"no commit at {self.location}")
        parts = versions[-1]["partitions"]
        mroot = os.path.join(self.location, "_symlink_format_manifest")
        os.makedirs(mroot, exist_ok=True)
        for pkey, cid in parts.items():
            pdir = os.path.join(self._commit_dir(cid), pkey)
            files = sorted(_glob.glob(os.path.join(pdir, "*.parquet")))
            mdir = os.path.join(mroot, pkey)
            os.makedirs(mdir, exist_ok=True)
            manifest = os.path.join(mdir, "manifest")
            tmp = manifest + ".tmp"
            with open(tmp, "w") as f:
                for path in files:
                    f.write("file:" + path + "\n")
            os.replace(tmp, manifest)
        for d in os.listdir(mroot):
            full = os.path.join(mroot, d)
            if os.path.isdir(full) and d not in parts:
                _shutil.rmtree(full, ignore_errors=True)
        return mroot

    def read_symlink_manifest(self) -> DataFrame:
        """Scan the table exclusively through the manifest tree (what the
        external engine does): resolve every partition's file list, then
        scan per owning commit dir with ``basePath`` so the hive partition
        column is reconstructed from the directory names — the same
        mechanism the external table's partition mapping uses."""
        import glob as _glob

        mroot = os.path.join(self.location, "_symlink_format_manifest")
        manifests = sorted(_glob.glob(os.path.join(mroot, "*", "manifest")))
        if not manifests:
            raise FileNotFoundError(f"no symlink manifests under {mroot}")
        paths = []
        for m in manifests:
            with open(m) as f:
                paths.extend(
                    line.strip().removeprefix("file:")
                    for line in f
                    if line.strip()
                )
        # group by commit dir (files/commit-<n>/<pkey>/part.parquet) so
        # each scan gets the right basePath for partition-column recovery
        by_base: dict[str, list[str]] = {}
        for p in paths:
            base = os.path.dirname(os.path.dirname(p))
            by_base.setdefault(base, []).append(p)
        scans = [
            self.spark.read.option("basePath", base).parquet(*sorted(ps))
            for base, ps in sorted(by_base.items())
        ]
        if not scans:
            # every partition manifest lists zero files (all partitions
            # dropped since generation): mirror _read_partitions' empty-state
            # contract — zero rows with the table schema recovered from a
            # surviving commit dir — instead of a bare reduce() TypeError
            return self._read_partitions({})
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=False), scans
        )


class HiddenPartitionedTable:
    """Iceberg-style HIDDEN partitioning over ``PartitionedTable``
    (iceberg_scd_script.py's table format is v2 Iceberg — hidden
    partition transforms are the feature that distinguishes Iceberg's
    layout model from hive's): the table is physically laid out by a
    TRANSFORM of a source column (``days(ts)``, ``bucket(8, user_id)``,
    ``truncate(4, code)``), writers never materialize the partition
    column, and readers filter on the SOURCE column — the store
    translates those predicates into partition-value predicates and
    prunes at the manifest, then applies the original filter as the
    exact residual.

    Transforms (Iceberg spec names):

    * ``days`` / ``hours`` / ``months`` on a timestamp — partition value
      is the ``yyyy-MM-dd`` (etc.) string, whose lexicographic order is
      chronological, so range predicates on the source prune directly.
    * ``bucket`` (param ``n``) on an int/string key — value is
      ``crc32(str(key)) % n``; CRC32 is bit-identical between the JVM
      (``F.crc32``) and the host (``zlib.crc32``), so an equality
      literal's bucket is computed WITHOUT a Spark job. Only equality
      prunes (hash destroys order) — other predicates scan all buckets
      with the residual filter, never wrong, just unpruned.
    * ``truncate`` (param ``w``) — string prefix / int floor-to-multiple
      (Iceberg semantics); order-preserving, so ranges prune.
    * ``identity`` — plain value passthrough.

    Scale: pruning is metadata-only (|partitions| manifest entries);
    the derived column costs one JVM expression per row at write time
    and is dropped from every read, so consumers see exactly the
    logical schema. All write paths (overwrite / partition-scoped
    upsert / dynamic partition overwrite) delegate to the underlying
    manifest store and inherit its snapshot isolation and time travel.
    """

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        transform: str,
        source_col: str,
        n: int | None = None,
    ):
        if transform not in ("days", "hours", "months", "bucket", "truncate", "identity"):
            raise ValueError(f"unknown partition transform {transform!r}")
        if transform in ("bucket", "truncate") and not n:
            raise ValueError(f"{transform} transform requires n")
        self.transform = transform
        self.source_col = source_col
        self.n = n
        self.pcol = (
            f"hp_{transform}_{source_col}"
            if transform in ("days", "hours", "months", "identity")
            else f"hp_{transform}{n}_{source_col}"
        )
        self.inner = PartitionedTable(spark, location, self.pcol)
        self.spark = spark

    # -- transform expression (JVM side) ------------------------------------

    _TIME_FMT = {"days": "yyyy-MM-dd", "hours": "yyyy-MM-dd-HH", "months": "yyyy-MM"}

    def _derive(self, df: DataFrame) -> DataFrame:
        c = F.col(self.source_col)
        if self.transform in self._TIME_FMT:
            expr = F.date_format(c, self._TIME_FMT[self.transform])
        elif self.transform == "bucket":
            expr = F.pmod(F.crc32(c.cast("string")), F.lit(self.n)).cast("int")
        elif self.transform == "truncate":
            dt = df.schema[self.source_col].dataType.simpleString()
            if dt in ("int", "bigint", "smallint", "tinyint"):
                expr = (c - F.pmod(c, F.lit(self.n))).cast("bigint")
            else:
                expr = F.substring(c, 1, self.n)
        else:  # identity
            expr = c
        return df.withColumn(self.pcol, expr)

    # -- host twin of the transform (for literal translation) ---------------

    def _host_transform(self, value):
        import zlib

        if self.transform in self._TIME_FMT:
            s = str(value)
            # accept 'YYYY-MM-DD[ HH:MM:SS[.ffffff]]' strings / datetimes
            s = s.replace("T", " ")
            if self.transform == "days":
                return s[:10]
            if self.transform == "months":
                return s[:7]
            return s[:10] + "-" + s[11:13]
        if self.transform == "bucket":
            return zlib.crc32(str(value).encode()) % self.n
        if self.transform == "truncate":
            if isinstance(value, int):
                return value - (value % self.n)
            return str(value)[: self.n]
        return value

    def _parse_pval(self, s: str, like=None):
        """Manifest partition-value string -> comparable host value.

        ``like`` is the host-transformed predicate literal: the parse
        target type comes from IT, not from the string's shape. A
        digit-looking manifest value for a STRING column (zero-padded
        code '0123', truncate w=2 -> partition '01') must stay a str —
        int-parsing it would make ``1 == '01'`` False (silent wrong
        prune) and range ops TypeError. Only when the host literal is
        an int (bucket ids, int truncate/identity) do we parse to int.
        With no source-col predicate (``like is None``) no comparison
        happens, so the value is returned as-is."""
        if self.transform == "bucket" or isinstance(like, int):
            try:
                return int(s)
            except ValueError:
                return s
        return s

    # -- writes --------------------------------------------------------------

    def overwrite(self, df: DataFrame) -> "HiddenPartitionedTable":
        self.inner.overwrite(self._derive(df))
        return self

    def overwrite_partitions(self, df: DataFrame) -> "HiddenPartitionedTable":
        self.inner.overwrite_partitions(self._derive(df))
        return self

    def upsert(
        self,
        updates: DataFrame,
        key_cols: list[str],
        precombine_col: str,
        global_index: bool = False,
    ) -> "HiddenPartitionedTable":
        self.inner.upsert(
            self._derive(updates), key_cols, precombine_col, global_index
        )
        return self

    # -- reads ---------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        return self.inner.read(version).drop(self.pcol)

    def read_filtered(self, filters: list[tuple]) -> DataFrame:
        """Read with predicates ``[(col, op, value), ...]`` (ops: ``==``
        ``>=`` ``>`` ``<=`` ``<``), conjunctive. Predicates on the source
        column prune partitions through the transform; every predicate is
        then applied exactly as a residual filter. Predicates on other
        columns never prune (they can't — the layout doesn't know them)
        but still filter."""
        preds = []
        exemplar = None
        for col, op, value in filters:
            if col != self.source_col:
                continue
            t = self._host_transform(value)
            if exemplar is None:
                exemplar = t
            order_preserving = self.transform in (
                "days", "hours", "months", "truncate", "identity",
            )
            if op == "==":
                preds.append(lambda p, t=t: p == t)
            elif not order_preserving:
                continue  # bucket: only equality prunes
            elif op in (">=", ">"):
                # ts > v  =>  t(ts) >= t(v): boundary partition kept,
                # residual trims it
                preds.append(lambda p, t=t: p >= t)
            elif op in ("<=", "<"):
                preds.append(lambda p, t=t: p <= t)
            else:
                raise ValueError(f"unsupported op {op!r}")
        df = self.inner.read_partitions_where(
            lambda s, preds=preds, like=exemplar: all(
                pred(self._parse_pval(s, like)) for pred in preds
            )
        )
        ops = {
            "==": lambda c, v: c == v,
            ">=": lambda c, v: c >= v,
            ">": lambda c, v: c > v,
            "<=": lambda c, v: c <= v,
            "<": lambda c, v: c < v,
        }
        for col, op, value in filters:
            df = df.filter(ops[op](F.col(col), F.lit(value)))
        return df.drop(self.pcol)

    def scanned_partitions(self, filters: list[tuple]) -> list[str]:
        """Metadata-only: which live partitions a ``read_filtered`` with
        these predicates would scan (for pruning tests/diagnostics)."""
        live = self.inner._versions()[-1]["partitions"]
        prefix = f"{self.pcol}="
        preds = []
        exemplar = None
        for col, op, value in filters:
            if col != self.source_col:
                continue
            t = self._host_transform(value)
            if exemplar is None:
                exemplar = t
            order_preserving = self.transform != "bucket"
            if op == "==":
                preds.append(lambda p, t=t: p == t)
            elif order_preserving and op in (">=", ">"):
                preds.append(lambda p, t=t: p >= t)
            elif order_preserving and op in ("<=", "<"):
                preds.append(lambda p, t=t: p <= t)
        return sorted(
            k
            for k in live
            if k.startswith(prefix)
            and all(
                p(self._parse_pval(k[len(prefix):], exemplar))
                for p in preds
            )
        )

    # -- manifest delegation (streaming sink + history surfaces) -------------

    def history(self) -> list[dict]:
        return self.inner.history()

    def _doc(self) -> dict:
        return self.inner._doc()

    def _write_doc(self, doc: dict) -> None:
        self.inner._write_doc(doc)

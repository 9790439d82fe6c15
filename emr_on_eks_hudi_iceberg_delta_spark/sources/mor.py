"""Merge-on-read (MoR) table — the Hudi MERGE_ON_READ emulation.

The reference selects CoW vs MoR per run (`hudi/hudi_scd_script.py:13-18`,
``hoodie.datasource.write.table.type`` at :33) and queries the MoR table
through its real-time view (``hudi_contact_mor_rt``, README.md:157-160).
Semantics reproduced here on plain parquet:

* ``append_log(updates)`` — cheap write: the update batch lands in an
  append-only log dir; the base snapshot is NOT rewritten (Hudi's Avro log
  files; parquet here — the read-merge semantics are what matter).
* ``read_optimized()`` — base files only: stale but scan-fast
  (the ``_ro`` view).
* ``read_realtime()`` — base + logs merged by record key with precombine
  dedup at read time (the ``_rt`` view): exactly ``upsert_by_key`` over
  base ∪ logs, so a reader always sees upsert semantics without a write
  amplification.
* ``compact()`` — folds accumulated logs into a new base snapshot (Hudi's
  compaction), after which ``_ro`` == ``_rt``.

Scale: append_log is O(batch); the read-time merge costs one shuffle on
the record key over base ∪ logs — the classic MoR trade (cheap writes,
dearer reads) and the reason compaction exists.
"""

from __future__ import annotations

import json
import os
import time
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import upsert_by_key

_META = "_mor_meta.json"


class MorTable:
    def __init__(
        self,
        spark: SparkSession,
        location: str,
        key_cols: list[str],
        precombine_col: str,
    ):
        self.spark = spark
        self.location = location.rstrip("/")
        self.key_cols = key_cols
        self.precombine_col = precombine_col

    # -- metadata -----------------------------------------------------------

    def _meta_path(self) -> str:
        return os.path.join(self.location, _META)

    def _meta(self) -> dict:
        if not os.path.exists(self._meta_path()):
            return {"base": None, "logs": [], "commits": 0}
        with open(self._meta_path()) as f:
            return json.load(f)

    def _publish(self, meta: dict) -> None:
        os.makedirs(self.location, exist_ok=True)
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())

    # -- writes -------------------------------------------------------------

    def bootstrap(self, df: DataFrame) -> "MorTable":
        """Initial bulk insert -> base files (hudi 'insert' + overwrite)."""
        meta = self._meta()
        base = os.path.join(self.location, f"base-{meta['commits']:05d}")
        df.write.mode("overwrite").parquet(base)
        self._publish({"base": base, "logs": [], "commits": meta["commits"] + 1})
        return self

    def append_log(self, updates: DataFrame) -> "MorTable":
        """Upsert the MoR way: append the batch as a log file group; no
        base rewrite. Readers merge at read time."""
        meta = self._meta()
        if meta["base"] is None:
            return self.bootstrap(updates)
        log = os.path.join(self.location, f"log-{meta['commits']:05d}")
        updates.write.mode("overwrite").parquet(log)
        meta["logs"].append({"dir": log, "committed_at": time.time()})
        meta["commits"] += 1
        self._publish(meta)
        return self

    def compact(self) -> "MorTable":
        """Fold logs into a new base snapshot (Hudi compaction). After
        compaction read_optimized() == read_realtime()."""
        meta = self._meta()
        merged = self.read_realtime()
        base = os.path.join(self.location, f"base-{meta['commits']:05d}")
        merged.write.mode("overwrite").parquet(base)
        self._publish({"base": base, "logs": [], "commits": meta["commits"] + 1})
        return self

    # -- reads --------------------------------------------------------------

    def read_optimized(self) -> DataFrame:
        """The ``_ro`` view: base files only (fast, possibly stale)."""
        meta = self._meta()
        if meta["base"] is None:
            raise FileNotFoundError(f"no base at {self.location}")
        return self.spark.read.parquet(meta["base"])

    def read_realtime(self) -> DataFrame:
        """The ``_rt`` view: base ∪ logs with precombine dedup per record
        key — current upsert semantics without write amplification.

        Precombine ties resolve to the LATEST log batch (base=0, log i=i+1
        as the writer-sequence passed to ``upsert_by_key``) — Hudi's
        deterministic newest-writer-wins, independent of partition layout.
        """
        meta = self._meta()
        base = self.read_optimized()
        if not meta["logs"]:
            return base
        logs = reduce(
            lambda a, b: a.unionByName(b),
            [
                self.spark.read.parquet(entry["dir"]).withColumn(
                    "__writer_seq", F.lit(i + 1)
                )
                for i, entry in enumerate(meta["logs"])
            ],
        )
        return upsert_by_key(
            base.withColumn("__writer_seq", F.lit(0)),
            logs,
            self.key_cols,
            self.precombine_col,
            priority_col="__writer_seq",
        ).drop("__writer_seq")

    def log_depth(self) -> int:
        return len(self._meta()["logs"])

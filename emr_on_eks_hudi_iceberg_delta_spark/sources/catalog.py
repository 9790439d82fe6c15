"""Named-table catalog over the versioned table store.

The local analog of the reference's Glue Data Catalog integration (Hudi
hive-sync options hudi/hudi_scd_script.py:37-40; Iceberg ``GlueCatalog``
iceberg/iceberg_submit.sh:33-34; Delta Glue DDL delta/delta_scd_script.py:
42-56): a durable name -> table-location mapping plus SQL registration, so
``spark.sql("SELECT ... FROM <name>")`` resolves catalog tables by name.

The catalog document is a json file under the catalog root with the same
atomic-replace discipline as table pointers. Registration materializes each
table's CURRENT published snapshot as a temp view — re-run ``sync()`` (or
read through ``table(name)``) after external commits; views are
session-scoped, the catalog itself is durable.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .tables import VersionedTable

_CATALOG = "_catalog.json"


class LakeCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    def _path(self) -> str:
        return os.path.join(self.root, _CATALOG)

    def _doc(self) -> dict:
        if not os.path.exists(self._path()):
            return {"tables": {}}
        with open(self._path()) as f:
            return json.load(f)

    def _write_doc(self, doc: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, self._path())

    def create_table(
        self, name: str, df: DataFrame | None = None, location: str | None = None
    ) -> VersionedTable:
        """Register a table name (optionally with initial data). A name
        maps to a VersionedTable location — by default a directory under
        the catalog root; ``location`` registers an EXISTING table
        elsewhere (the external-table flavor)."""
        if not name.isidentifier():
            raise ValueError(f"invalid table name {name!r}")
        doc = self._doc()
        if name in doc["tables"]:
            raise ValueError(f"table {name!r} already exists in catalog")
        loc = location or os.path.join(self.root, name)
        doc["tables"][name] = loc
        self._write_doc(doc)
        vt = VersionedTable(self.spark, loc, name=name)
        if df is not None:
            vt.overwrite(df)  # also registers the temp view (name set)
        return vt

    def table(self, name: str) -> VersionedTable:
        tables = self._doc()["tables"]
        if name not in tables:
            raise ValueError(f"table {name!r} not found in catalog")
        return VersionedTable(self.spark, tables[name], name=name)

    def list_tables(self) -> list[str]:
        return sorted(self._doc()["tables"])

    def sync(self) -> "LakeCatalog":
        """(Re-)register every catalog table's current snapshot as a temp
        view so ``spark.sql`` resolves them by name — the hive-sync step,
        run per session or after external commits."""
        for name, loc in self._doc()["tables"].items():
            VersionedTable(self.spark, loc).read().createOrReplaceTempView(name)
        return self

    def drop_table(self, name: str, purge: bool = False) -> "LakeCatalog":
        """Remove the name from the catalog (Glue DROP TABLE). ``purge``
        also deletes the table data — default keeps it, matching
        external-table drop semantics."""
        import shutil

        doc = self._doc()
        loc = doc["tables"].pop(name, None)
        if loc is None:
            raise ValueError(f"table {name!r} not found in catalog")
        self._write_doc(doc)
        self.spark.catalog.dropTempView(name)
        if purge:
            shutil.rmtree(loc, ignore_errors=True)
        return self

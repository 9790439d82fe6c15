"""In-place conversions (sources/convert.py): metadata-only adoption —
zero data copy, pinned by inode identity."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_on_eks_hudi_iceberg_delta_spark.sources.convert import (
    convert_delta_to_iceberg,
    convert_parquet_dir_to_delta,
)
from emr_on_eks_hudi_iceberg_delta_spark.sources.delta_log import DeltaLogTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _parquet_inodes(root):
    return {
        os.stat(os.path.join(r, f)).st_ino
        for r, _, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet") and "_delta_log" not in r
    }


def test_convert_plain_parquet_dir(spark, tmp_path):
    loc = str(tmp_path / "plain")
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    df.repartition(4).write.parquet(loc)
    inodes = _parquet_inodes(loc)
    dt = convert_parquet_dir_to_delta(spark, loc)
    assert _rows(dt.read()) == _rows(df)
    assert _parquet_inodes(loc) == inodes  # zero bytes copied or moved
    assert dt.history()[0]["operation"] == "CONVERT"
    # the adopted table is a normal Delta table: appends work
    dt.append(spark.range(100, 105).selectExpr("id", "id * 2 AS v"))
    assert dt.read().count() == 105


def test_convert_hive_partitioned_dir(spark, tmp_path):
    loc = str(tmp_path / "hive")
    df = spark.range(60).selectExpr("id", "CAST(id % 3 AS INT) AS p")
    df.write.partitionBy("p").parquet(loc)
    inodes = _parquet_inodes(loc)
    dt = convert_parquet_dir_to_delta(spark, loc)
    got = dt.read()
    assert got.count() == 60 and dict(got.dtypes)["p"] == "int"
    assert _parquet_inodes(loc) == inodes
    pruned = dt.read_where(lambda pv: pv["p"] == "1")
    assert pruned.count() == 20


def test_convert_refuses_double_adoption(spark, tmp_path):
    import pytest

    loc = str(tmp_path / "dl")
    DeltaLogTable(spark, loc).overwrite(spark.range(3).selectExpr("id"))
    with pytest.raises(ValueError, match="already has"):
        convert_parquet_dir_to_delta(spark, loc)


def test_convert_delta_to_iceberg_adopts_files(spark, tmp_path):
    dloc = str(tmp_path / "d2i_src")
    dt = DeltaLogTable(spark, dloc)
    dt.overwrite(spark.range(50).selectExpr("id", "id AS v").repartition(3))
    inodes = _parquet_inodes(dloc)
    iloc = str(tmp_path / "d2i_dst")
    it = convert_delta_to_iceberg(spark, dloc, iloc)
    assert _rows(it.read()) == _rows(dt.read())
    assert _parquet_inodes(dloc) == inodes
    # iceberg data dir holds NO copies; manifests point into the delta dir
    assert _parquet_inodes(os.path.join(iloc, "data")) == set()
    for f in it.added_files(it.history()[0]["snapshot_id"]) or []:
        pass
    entries = it._entries()
    assert all(
        e["data_file"]["file_path"].startswith(dloc) for e in entries
    )


def test_convert_partitioned_delta_to_iceberg_refuses(spark, tmp_path):
    import pytest

    dloc = str(tmp_path / "d2i_part")
    dt = DeltaLogTable(spark, dloc)
    dt.overwrite(
        spark.range(10).selectExpr("id", "CAST(id % 2 AS INT) AS p"),
        partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partitioned"):
        convert_delta_to_iceberg(spark, dloc, str(tmp_path / "x"))


def test_convert_iceberg_to_delta(spark, tmp_path):
    """r11: the reverse adoption — Iceberg table gains a _delta_log
    over the same files (inode-pinned), manifest record counts ride
    as Delta stats, delete-bearing and renamed tables refuse."""
    import pytest

    from emr_on_eks_hudi_iceberg_delta_spark.sources.convert import (
        convert_iceberg_to_delta,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources import iceberg_deletes  # noqa: F401
    from emr_on_eks_hudi_iceberg_delta_spark.sources.iceberg_layout import (
        IcebergTable,
    )

    loc = str(tmp_path / "ice2d")
    t = IcebergTable(spark, loc)
    df = spark.range(80).selectExpr("id AS k", "id * 3 AS v")
    t.overwrite(df.repartition(4))
    t.append(spark.range(80, 100).selectExpr("id AS k", "id * 3 AS v"))
    inodes = _parquet_inodes(loc)
    dt = convert_iceberg_to_delta(spark, loc)
    assert _rows(dt.read()) == _rows(
        spark.range(100).selectExpr("id AS k", "id * 3 AS v")
    )
    assert _parquet_inodes(loc) == inodes  # zero bytes copied
    assert dt.history()[0]["operation"] == "CONVERT"
    # manifest record counts rode in as Delta stats
    live, _, _ = dt._replay()
    import json as _json

    assert sum(
        _json.loads(a["stats"])["numRecords"] for a in live.values()
    ) == 100
    # the adopted table is a normal Delta table: DML works
    dt.delete("k < 10")
    assert dt.read().count() == 90

    # delete-bearing iceberg refuses
    t2 = IcebergTable(spark, str(tmp_path / "icedel"))
    t2.overwrite(df.repartition(2))
    t2.delete("k % 2 = 0")
    with pytest.raises(ValueError, match="delete files"):
        convert_iceberg_to_delta(spark, str(tmp_path / "icedel"))

    # renamed-history iceberg refuses (Delta resolves by name)
    t3 = IcebergTable(spark, str(tmp_path / "iceren"))
    t3.overwrite(df.repartition(2))
    t3.rename_column("v", "val")
    t3.append(spark.range(100, 110).selectExpr("id AS k", "id * 3 AS val"))
    with pytest.raises(ValueError, match="resolves by NAME"):
        convert_iceberg_to_delta(spark, str(tmp_path / "iceren"))


def test_convert_hudi_to_delta(spark, tmp_path):
    """r11: migrate-off-Hudi adoption — _delta_log beside .hoodie over
    the same live slices (inode-pinned); _hoodie_* meta columns stay
    in the files unread; MoR with unfolded logs refuses until
    compact()."""
    import pytest
    from pyspark.sql import functions as F

    from emr_on_eks_hudi_iceberg_delta_spark.sources.convert import (
        convert_hudi_to_delta,
    )
    from emr_on_eks_hudi_iceberg_delta_spark.sources.hudi_layout import (
        HudiCowTable,
        HudiMorTable,
    )

    loc = str(tmp_path / "hudi2d")
    t = HudiCowTable(
        spark, loc, record_key="k", precombine_field="ver",
    )
    base = spark.range(60).selectExpr(
        "id AS k", "id % 5 AS g", "1 AS ver"
    )
    t.bulk_insert(base)
    t.upsert(
        spark.range(10).selectExpr("id AS k", "99 AS g", "2 AS ver")
    )
    want = _rows(
        t.read().select("k", "g", "ver")
    )
    inodes = _parquet_inodes(loc)
    dt = convert_hudi_to_delta(spark, loc)
    assert sorted(dt.read().columns) == ["g", "k", "ver"]  # no _hoodie_*
    assert _rows(dt.read().select("k", "g", "ver")) == want
    assert _parquet_inodes(loc) == inodes  # zero bytes copied
    # post-adoption DML through the Delta layer
    dt.delete("g = 99")
    assert dt.read().count() == 50

    # MoR with unfolded logs refuses; after compact() it adopts
    mloc = str(tmp_path / "mor2d")
    m = HudiMorTable(
        spark, mloc, record_key="k", precombine_field="ver",
    )
    m.bulk_insert(base)
    m.upsert(
        spark.range(5).selectExpr("id AS k", "77 AS g", "2 AS ver")
    )
    with pytest.raises(ValueError, match="compact"):
        convert_hudi_to_delta(spark, mloc)
    m.compact()
    dm = convert_hudi_to_delta(spark, mloc)
    assert dm.read().count() == 60
    assert dm.read().filter("g = 77").count() == 5


def test_convert_parquet_explicit_partition_schema(spark, tmp_path):
    """r12: partition_by declares the layout like CONVERT TO DELTA's
    PARTITIONED BY; a mixed or mismatched hive layout refuses LOUDLY
    instead of silently producing inconsistent partitionValues."""
    import pytest

    src = str(tmp_path / "pq")
    spark.range(20).selectExpr(
        "id AS k", "CAST(id % 3 AS INT) AS g"
    ).write.partitionBy("g").parquet(src)
    dt = convert_parquet_dir_to_delta(spark, src, partition_by=["g"])
    got = sorted(r["k"] for r in dt.read().filter("g = 1").collect())
    assert got == [i for i in range(20) if i % 3 == 1]
    # wrong declared keys refuse
    src2 = str(tmp_path / "pq2")
    spark.range(6).selectExpr(
        "id AS k", "CAST(id % 2 AS INT) AS g"
    ).write.partitionBy("g").parquet(src2)
    with pytest.raises(ValueError, match="expected \\['h'\\]"):
        convert_parquet_dir_to_delta(spark, src2, partition_by=["h"])
    # declaring a partition on a FLAT directory refuses
    src3 = str(tmp_path / "pq3")
    spark.range(4).selectExpr("id AS k").write.parquet(src3)
    with pytest.raises(ValueError, match="expected \\['g'\\]"):
        convert_parquet_dir_to_delta(spark, src3, partition_by=["g"])


def test_convert_parquet_mixed_layout_refuses(spark, tmp_path):
    """Even under inference, a directory mixing partitioned and flat
    files (or different key sets) refuses — the pre-r12 first-file-wins
    hazard is closed."""
    import os as _os
    import shutil

    import pytest

    src = str(tmp_path / "mix")
    spark.range(10).selectExpr(
        "id AS k", "CAST(id % 2 AS INT) AS g"
    ).write.partitionBy("g").parquet(src)
    # drop a FLAT parquet file beside the hive dirs
    flat = str(tmp_path / "flat")
    spark.range(3).selectExpr("id AS k").coalesce(1).write.parquet(flat)
    stray = [f for f in _os.listdir(flat) if f.endswith(".parquet")][0]
    shutil.copy(
        _os.path.join(flat, stray), _os.path.join(src, "stray.parquet")
    )
    with pytest.raises(ValueError, match="mixed layout"):
        convert_parquet_dir_to_delta(spark, src)

"""SCD2 golden test — the §2.11 convergent invariant on reference-shaped
fixtures (FIXTURES.md §1): 1000 initial rows; update batch of 1100 =
908 unchanged + 92 changed + 100 new. After the incremental merge, every
variant must hold 1192 rows: 1100 current, 92 expired with
``valid_to = update batch valid_from``.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from emr_on_eks_hudi_iceberg_delta_spark.functions.scd2 import with_scd2_columns
from emr_on_eks_hudi_iceberg_delta_spark.operators.merge import (
    scd2_merge_delta_style,
    scd2_merge_hudi_style,
    scd2_merge_iceberg_style,
    upsert_by_key,
)

T1 = "2024-01-01 00:00:00"
T2 = "2024-02-01 00:00:00"
CHECKSUM_COLS = ["name", "email", "state"]
STATES = ["CA", "NY", "TX", "WA", "GA", "IL", "FL", "OH", "PA", "MI"]


def _contact(i, changed=False):
    return Row(
        id=i,
        name=f"name{i}",
        email=f"user{i}@{'new' if changed else 'example'}.com",
        state=STATES[(i + (3 if changed else 0)) % len(STATES)],
    )


@pytest.fixture(scope="module")
def batches(spark):
    initial = spark.createDataFrame([_contact(i) for i in range(1, 1001)])
    update = spark.createDataFrame(
        # 92 changed (ids 1..92), 908 unchanged, 100 new (1001..1100)
        [_contact(i, changed=i <= 92) for i in range(1, 1101)]
    )
    return initial, update


def _assert_invariant(result, update_count=1100, changed_count=92):
    rows = result.count()
    assert rows == update_count + changed_count, f"total rows {rows}"
    current = result.filter(F.col("iscurrent") == 1)
    expired = result.filter(F.col("iscurrent") == 0)
    assert current.count() == update_count
    assert expired.count() == changed_count
    # every expired row's valid_to equals the update batch's valid_from (T2)
    bad = expired.filter(F.col("valid_to") != F.lit(T2).cast("timestamp_ntz")).count()
    assert bad == 0
    # exactly one current row per live id
    dup = current.groupBy("id").count().filter("count > 1").count()
    assert dup == 0
    # point lookup (P6 analog): a changed id has full history
    hist = result.filter(F.col("id") == 50).orderBy("iscurrent").collect()
    assert len(hist) == 2
    assert hist[0]["iscurrent"] == 0 and hist[1]["iscurrent"] == 1


@pytest.mark.parametrize("variant", ["hudi", "iceberg", "delta"])
def test_scd2_merge_invariant(spark, batches, variant):
    initial, update = batches
    target = with_scd2_columns(
        initial, CHECKSUM_COLS, as_of=T1, include_ts=(variant != "delta")
    )
    fn = {
        "hudi": scd2_merge_hudi_style,
        "iceberg": scd2_merge_iceberg_style,
        "delta": scd2_merge_delta_style,
    }[variant]
    result = fn(target, update, "id", CHECKSUM_COLS, as_of=T2)
    _assert_invariant(result)

    if variant == "delta":
        # unchanged rows keep their original (T1) timestamps — the Delta
        # pipeline's conditional MATCHED clause preserves them
        unchanged_cur = result.filter((F.col("iscurrent") == 1) & (F.col("id") == 500))
        assert unchanged_cur.collect()[0]["valid_from"].isoformat() == "2024-01-01T00:00:00"
    else:
        # hudi/iceberg variants rewrite unchanged rows at T2
        unchanged_cur = result.filter((F.col("iscurrent") == 1) & (F.col("id") == 500))
        assert unchanged_cur.collect()[0]["valid_from"].isoformat() == "2024-02-01T00:00:00"


def test_upsert_by_key_precombine(spark):
    target = spark.createDataFrame(
        [Row(id=1, checksum="a", ts="2024-01-01", v="old"),
         Row(id=2, checksum="b", ts="2024-01-01", v="keep")]
    )
    updates = spark.createDataFrame(
        [Row(id=1, checksum="a", ts="2024-02-01", v="new"),
         Row(id=3, checksum="c", ts="2024-02-01", v="ins")]
    )
    out = {r["id"]: r["v"] for r in upsert_by_key(target, updates, ["id", "checksum"], "ts").collect()}
    assert out == {1: "new", 2: "keep", 3: "ins"}


def test_upsert_by_key_tie_prefers_incoming(spark):
    """ADVICE r1: equal precombine values used to resolve by partition
    order. Hudi deterministically prefers the incoming record on ties —
    now enforced via the writer-sequence secondary sort."""
    target = spark.createDataFrame(
        [Row(id=1, checksum="a", ts="2024-01-01", v="stored")]
    )
    updates = spark.createDataFrame(
        [Row(id=1, checksum="a", ts="2024-01-01", v="incoming")]
    )
    for _ in range(3):  # stable across repeated plans, not partition-lucky
        out = upsert_by_key(target, updates, ["id", "checksum"], "ts").collect()
        assert [r["v"] for r in out] == ["incoming"]


def test_scd2_delta_keeps_reverted_history_row(spark):
    """ADVICE r1: a value reverting A->B->A leaves an EXPIRED history row
    with the same (key, checksum) as the current row. The reference MERGE's
    matched-but-clause-failed branch keeps it; the anti-join used to delete
    it silently."""
    T3 = "2024-03-01 00:00:00"
    base = spark.createDataFrame([Row(id=1, name="n", email="A@x.com", state="CA")])
    to_b = spark.createDataFrame([Row(id=1, name="n", email="B@x.com", state="CA")])
    back_to_a = spark.createDataFrame([Row(id=1, name="n", email="A@x.com", state="CA")])

    t0 = with_scd2_columns(base, CHECKSUM_COLS, as_of=T1, include_ts=False)
    t1 = scd2_merge_delta_style(t0, to_b, "id", CHECKSUM_COLS, as_of=T2)
    t2 = scd2_merge_delta_style(t1, back_to_a, "id", CHECKSUM_COLS, as_of=T3)
    # A(expired) + B(expired) + A(current) = 3 rows; the expired A row and
    # the new current A row share (id, checksum)
    rows = sorted(t2.collect(), key=lambda r: (r["iscurrent"], str(r["valid_from"])))
    assert len(rows) == 3
    assert [r["iscurrent"] for r in rows] == [0, 0, 1]
    assert rows[0]["email"] == "A@x.com" and rows[0]["valid_to"].isoformat() == "2024-02-01T00:00:00"
    assert rows[1]["email"] == "B@x.com" and rows[1]["valid_to"].isoformat() == "2024-03-01T00:00:00"
    assert rows[2]["email"] == "A@x.com" and rows[2]["valid_to"] is None


# ---------------------------------------------------------------------------
# The reference's OWN MERGE statements, replayed through the SQL front-end
# (operators/merge_sql.py) — text verbatim up to catalog names and the
# engine's TIMESTAMP_NTZ convention. Proves a reference user's statements
# run unchanged and still converge to the golden invariant.
# ---------------------------------------------------------------------------


def test_scd2_delta_via_reference_sql(spark, batches):
    """delta/delta_scd_script.py:66-95 — NULL-mergeKey dual-row source +
    conditional expire UPDATE + INSERT *."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import (
        merge_into_sql,
    )

    initial, update = batches
    with_scd2_columns(
        initial, CHECKSUM_COLS, as_of=T1, include_ts=False
    ).createOrReplaceTempView("delta_table_contact")
    with_scd2_columns(
        update, CHECKSUM_COLS, as_of=T2, include_ts=False
    ).createOrReplaceTempView("staged_update")
    contact_update_qry = """
        SELECT NULL AS mergeKey, source.*
        FROM delta_table_contact AS target
        INNER JOIN staged_update as source
        ON target.id = source.id
        WHERE target.checksum != source.checksum
          AND target.iscurrent = 1
      UNION
        SELECT id AS mergeKey, *
        FROM staged_update
    """
    result = merge_into_sql(
        spark,
        f"""
        MERGE INTO delta_table_contact tgt
        USING ({contact_update_qry}) src
        ON tgt.id = src.mergeKey
        WHEN MATCHED AND src.checksum != tgt.checksum AND tgt.iscurrent = 1
          THEN UPDATE SET valid_to = src.valid_from, iscurrent = 0
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    _assert_invariant(result)
    # unchanged current rows pass through with their original T1 envelope
    row = result.filter((F.col("iscurrent") == 1) & (F.col("id") == 500)).collect()[0]
    assert row["valid_from"].isoformat() == "2024-01-01T00:00:00"


def test_scd2_iceberg_via_reference_sql(spark, batches):
    """iceberg/iceberg_scd_script.py:54-82 — union + LEAD window source,
    compound (id, checksum) merge key, UPDATE SET * / INSERT *."""
    from emr_on_eks_hudi_iceberg_delta_spark.operators.merge_sql import (
        merge_into_sql,
    )

    initial, update = batches
    with_scd2_columns(
        initial, CHECKSUM_COLS, as_of=T1, include_ts=True
    ).createOrReplaceTempView("iceberg_contact")
    with_scd2_columns(
        update, CHECKSUM_COLS, as_of=T2, include_ts=True
    ).createOrReplaceTempView("iceberg_contact_update")
    contact_update_qry = """
        WITH contact_to_update AS (
              SELECT target.*
              FROM iceberg_contact AS target
              JOIN iceberg_contact_update AS source
              ON target.id = source.id
              WHERE target.checksum != source.checksum
                AND target.iscurrent = 1
            UNION
              SELECT * FROM iceberg_contact_update
        ),contact_updated AS (
            SELECT *, LEAD(valid_from) OVER (PARTITION BY id ORDER BY valid_from) AS eff_from
            FROM contact_to_update
        )
        SELECT id,name,email,state,ts,valid_from,
            CAST(COALESCE(eff_from, null) AS TIMESTAMP_NTZ) AS valid_to,
            CASE WHEN eff_from IS NULL THEN 1 ELSE 0 END AS iscurrent,
            checksum
        FROM contact_updated
    """
    result = merge_into_sql(
        spark,
        f"""
        MERGE INTO iceberg_contact tgt
        USING ({contact_update_qry}) src
        ON tgt.id = src.id
        AND tgt.checksum = src.checksum
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    _assert_invariant(result)
    # hudi/iceberg variants rewrite unchanged rows at T2
    row = result.filter((F.col("iscurrent") == 1) & (F.col("id") == 500)).collect()[0]
    assert row["valid_from"].isoformat() == "2024-02-01T00:00:00"


def test_delta_native_gate_raises_clearly():
    """Round-6 close-out of the jar-gated Delta path (NOTES.md known-gaps
    #1): this container provably cannot load delta-spark (no module, no
    jar on disk, no network for Ivy), so the gate must (a) report
    unavailable and (b) point callers at the oracle-proven DataFrame
    decomposition."""
    import pytest

    from emr_on_eks_hudi_iceberg_delta_spark.operators.delta_backend import (
        delta_available,
        scd2_merge_delta_native,
    )

    assert delta_available() is False
    with pytest.raises(ModuleNotFoundError, match="scd2_merge_delta_style"):
        scd2_merge_delta_native(None, "/tmp/nowhere", None)


@pytest.mark.parametrize("variant", ["hudi", "iceberg", "delta"])
def test_scd2_merge_invariant_on_reference_csvs(spark, variant):
    """Round-7 task 4: the golden invariant on the ACTUAL reference
    fixtures (/root/reference/data/*.csv, public data, read-only) — the
    tightest parity anchor to hudi/hudi_scd_script.py:77,90,110,112's
    printed cardinalities. The changed/new split is derived EMPIRICALLY
    from the files (not assumed): 1000 initial, 1100 update = 908
    unchanged + 92 changed + 100 new -> 1192 rows post-merge."""
    import os

    from pyspark.sql.types import StringType, StructField, StructType

    from emr_on_eks_hudi_iceberg_delta_spark.sources.csv import (
        read_csv_with_schema,
    )

    ref = "/root/reference/data"
    if not os.path.exists(os.path.join(ref, "initial_contacts.csv")):
        pytest.skip("reference fixtures not mounted")
    # the reference's explicit headerless schema (hudi_scd_script.py:55-58)
    schema = StructType(
        [
            StructField("id", StringType()),
            StructField("name", StringType()),
            StructField("email", StringType()),
            StructField("state", StringType()),
        ]
    )
    initial = read_csv_with_schema(
        spark, os.path.join(ref, "initial_contacts.csv"), schema
    )
    update = read_csv_with_schema(
        spark, os.path.join(ref, "update_contacts.csv"), schema
    )

    # empirically derive the split from the data itself
    n_initial, n_update = initial.count(), update.count()
    joined = initial.alias("a").join(update.alias("b"), "id")
    n_changed = joined.filter(
        (F.col("a.name") != F.col("b.name"))
        | (F.col("a.email") != F.col("b.email"))
        | (F.col("a.state") != F.col("b.state"))
    ).count()
    n_new = update.join(initial, "id", "left_anti").count()
    assert (n_initial, n_update, n_changed, n_new) == (1000, 1100, 92, 100)

    target = with_scd2_columns(
        initial, CHECKSUM_COLS, as_of=T1, include_ts=(variant != "delta")
    )
    fn = {
        "hudi": scd2_merge_hudi_style,
        "iceberg": scd2_merge_iceberg_style,
        "delta": scd2_merge_delta_style,
    }[variant]
    result = fn(target, update, "id", CHECKSUM_COLS, as_of=T2)

    # the reference scripts' printed cardinalities: 1192 total,
    # 1100 current, 92 expired at the update batch's valid_from
    assert result.count() == n_update + n_changed == 1192
    current = result.filter(F.col("iscurrent") == 1)
    expired = result.filter(F.col("iscurrent") == 0)
    assert current.count() == 1100
    assert expired.count() == 92
    assert expired.filter(
        F.col("valid_to") != F.lit(T2).cast("timestamp_ntz")
    ).count() == 0
    # the expired ids are exactly the empirically-changed ids
    changed_ids = {r["id"] for r in joined.filter(
        (F.col("a.name") != F.col("b.name"))
        | (F.col("a.email") != F.col("b.email"))
        | (F.col("a.state") != F.col("b.state"))
    ).select("id").collect()}
    expired_ids = {r["id"] for r in expired.select("id").collect()}
    assert expired_ids == changed_ids
    assert current.groupBy("id").count().filter("count > 1").count() == 0

"""Query registry — every operator from SURVEY.md §2 (and the capability
extensions) as a named (Spark callable, DuckDB oracle SQL) pair.

Contract (driver harness, __spark_entry__.py): each Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle is ANSI SQL DuckDB
runs over the same parquet tables. Results are compared by row count +
schema + order-insensitive value hash, so:

* every computed column is aliased identically on both sides;
* float aggregates are summed as DECIMAL (exact, order-independent) and
  cast back to DOUBLE — bit-identical across engines, no rounding-boundary
  risk;
* all timestamps are TIMESTAMP_NTZ / naive TIMESTAMP;
* rankings order by the measure plus a unique tie-break key.

SCD2 queries use a deterministic derived update batch over ``customer``
(the ``contacts`` analog, FIXTURES.md §2): every 13th key changes its
``c_mktsegment``, every 17th key reappears as a brand-new key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.scd2 import with_scd2_columns
from .operators.merge import (
    MergeIntoBuilder,
    scd2_merge_delta_style,
    scd2_merge_hudi_style,
    scd2_merge_iceberg_style,
    upsert_by_key,
)
from .session import configure
from .sources.parquet import load_table


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = f"query_{name}"
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(wrapped, oracle, tags)
        return wrapped

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# shared SCD2 fixtures: deterministic timestamps + derived update batch
# --------------------------------------------------------------------------

T1 = "2024-01-01 00:00:00"
T2 = "2024-02-01 00:00:00"
CHECKSUM_COLS = ["c_name", "c_mktsegment"]

# derived update batch (Spark) — every 13th key changes segment, every 17th
# key cloned as a new key
def customer_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    changed = cust.withColumn(
        "c_mktsegment",
        F.when(
            F.col("c_custkey") % 13 == 0, F.concat(F.col("c_mktsegment"), F.lit("_v2"))
        ).otherwise(F.col("c_mktsegment")),
    )
    new = cust.filter(F.col("c_custkey") % 17 == 0).withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(1000000)
    )
    return changed.unionByName(new)


def scd2_target(spark: SparkSession, sf_dir: str, include_ts: bool = True) -> DataFrame:
    return with_scd2_columns(
        _t(spark, sf_dir, "customer"), CHECKSUM_COLS, as_of=T1, include_ts=include_ts
    )


# the same fixtures in DuckDB SQL (used inside oracle CTEs)
_SQL_UPDATES = """
    SELECT c_custkey, c_name, c_nationkey, c_acctbal,
           CASE WHEN c_custkey % 13 = 0 THEN c_mktsegment || '_v2'
                ELSE c_mktsegment END AS c_mktsegment
    FROM customer
    UNION ALL
    SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_custkey % 17 = 0
"""


def _sql_envelope(src: str, ts_lit: str, include_ts: bool = True) -> str:
    ts_col = f"TIMESTAMP '{ts_lit}' AS ts," if include_ts else ""
    return f"""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           {ts_col}
           TIMESTAMP '{ts_lit}' AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to,
           CAST(1 AS INTEGER) AS iscurrent,
           md5(c_name || c_mktsegment) AS checksum
    FROM ({src})
    """


_SQL_TGT9 = _sql_envelope("SELECT * FROM customer", T1)
_SQL_UPD9 = _sql_envelope(_SQL_UPDATES, T2)
_SQL_TGT8 = _sql_envelope("SELECT * FROM customer", T1, include_ts=False)
_SQL_UPD8 = _sql_envelope(_SQL_UPDATES, T2, include_ts=False)


# --------------------------------------------------------------------------
# S-series: scans / sources / sinks
# --------------------------------------------------------------------------

@register(
    "point_lookup",
    oracle="SELECT * FROM orders WHERE o_orderkey = 103",
    tags=("P6", "scan"),
)
def point_lookup(spark, sf_dir):
    """Point lookup (P6): the reference's consumption query
    ``select * from <tbl> where id=103`` (README.md:153). The filter is
    pushed to the parquet scan (PushedFilters in .explain)."""
    return _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") == 103)


@register(
    "temp_view_sql",
    oracle="SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus",
    tags=("S5", "S3"),
)
def temp_view_sql(spark, sf_dir):
    """Temp-view registration bridging DataFrame->SQL (S5,
    iceberg/iceberg_scd_script.py:51) + catalog-table scan in SQL (S3/S4)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("SELECT o_orderstatus, COUNT(*) AS n FROM orders_v GROUP BY o_orderstatus")


# --------------------------------------------------------------------------
# P-series: projections / filters
# --------------------------------------------------------------------------

@register(
    "projection_rename",
    oracle="""SELECT c_custkey AS id, c_name AS name, c_acctbal AS balance
              FROM customer""",
    tags=("P2", "F7"),
)
def projection_rename(spark, sf_dir):
    """Qualified multi-column projection + rename (P2,
    hudi/hudi_scd_script.py:98-106)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        c.c_custkey.alias("id"), c.c_name.alias("name"), c.c_acctbal.alias("balance")
    )


@register(
    "filter_predicates",
    oracle="""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
              WHERE l_returnflag <> l_linestatus AND l_linenumber = 1""",
    tags=("P5",),
)
def filter_predicates(spark, sf_dir):
    """Conjunctive filter predicates (P5): ``checksum != checksum AND
    iscurrent = 1`` shape (iceberg/iceberg_scd_script.py:60-61)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") != F.col("l_linestatus")) & (F.col("l_linenumber") == F.lit(1))
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "constant_projection",
    oracle="""SELECT CAST(NULL AS BIGINT) AS mergeKey, c_custkey, c_name
              FROM customer WHERE c_custkey % 13 = 0""",
    tags=("P3", "P4"),
)
def constant_projection(spark, sf_dir):
    """NULL constant projection (P3): ``SELECT NULL AS mergeKey, source.*``
    (delta/delta_scd_script.py:77)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 13 == 0)
    return c.select(
        F.lit(None).cast("bigint").alias("mergeKey"), "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# J-series: joins
# --------------------------------------------------------------------------

@register(
    "join_mixed_condition",
    oracle=f"""
    WITH tgt AS ({_SQL_TGT9}), upd AS ({_SQL_UPD9})
    SELECT t.c_custkey, t.c_mktsegment AS old_segment, u.c_mktsegment AS new_segment
    FROM tgt t JOIN upd u
      ON t.c_custkey = u.c_custkey AND t.checksum <> u.checksum AND t.iscurrent = 1
    """,
    tags=("J1",),
)
def join_mixed_condition(spark, sf_dir):
    """Inner join with mixed equi + theta + literal condition list (J1,
    hudi/hudi_scd_script.py:94-97). Catalyst plans the equi key as the join
    key and the rest as join filters."""
    t = scd2_target(spark, sf_dir).alias("t")
    u = with_scd2_columns(customer_updates(spark, sf_dir), CHECKSUM_COLS, as_of=T2).alias("u")
    cond = (
        (F.col("t.c_custkey") == F.col("u.c_custkey"))
        & (F.col("t.checksum") != F.col("u.checksum"))
        & (F.col("t.iscurrent") == F.lit(1))
    )
    return t.join(u, cond, "inner").select(
        F.col("t.c_custkey").alias("c_custkey"),
        F.col("t.c_mktsegment").alias("old_segment"),
        F.col("u.c_mktsegment").alias("new_segment"),
    )


@register(
    "join_equi_sql",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_totalprice > 400000
    """,
    tags=("J2",),
)
def join_equi_sql(spark, sf_dir):
    """Inner equi join with WHERE (J2, iceberg/iceberg_scd_script.py:58-61)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "inner").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


# --------------------------------------------------------------------------
# W-series: windows
# --------------------------------------------------------------------------

@register(
    "lead_window",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS next_order_date
    FROM orders
    """,
    tags=("W1",),
)
def lead_window(spark, sf_dir):
    """LEAD over partition (W1, iceberg/iceberg_scd_script.py:65) — the
    load-bearing analytic of the Iceberg pipeline, re-grounded on orders
    (next order date per customer). Unique tie-break key keeps it
    deterministic."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lead("o_orderdate").over(w).alias("next_order_date"),
    )


@register(
    "top_n_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) t
    WHERE rn <= 3
    """,
    tags=("window", "extension"),
)
def top_n_per_group(spark, sf_dir):
    """Top-N per group via ranked window — the standard Spark idiom the
    reference's LEAD pattern generalizes to."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        _t(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
    )


# --------------------------------------------------------------------------
# O-series: set operations
# --------------------------------------------------------------------------

@register(
    "union_by_name",
    oracle="""
    SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderstatus
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderstatus
    FROM orders WHERE o_orderkey % 2 = 1
    """,
    tags=("O1",),
)
def union_by_name(spark, sf_dir):
    """Schema-tolerant union by name (O1): ``unionByName(...,
    allowMissingColumns=True)`` null-fills missing columns
    (hudi/hudi_scd_script.py:111)."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    b = o.filter(F.col("o_orderkey") % 2 == 1).select("o_orderkey", "o_orderstatus")
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "union_distinct",
    oracle="""
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 0
    UNION
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_custkey % 2 = 0
    """,
    tags=("O2",),
)
def union_distinct(spark, sf_dir):
    """SQL UNION = deduplicating union (O2, iceberg/iceberg_scd_script.py:62)
    — ``union().distinct()``, NOT bare ``union()`` (which is UNION ALL)."""
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 0).select("c_nationkey", "c_mktsegment")
    b = c.filter(F.col("c_custkey") % 2 == 0).select("c_nationkey", "c_mktsegment")
    return a.union(b).distinct()


# --------------------------------------------------------------------------
# A-series: aggregations (the reference has only count; we add the standard
# shapes a complete engine needs, each with an exact oracle)
# --------------------------------------------------------------------------

@register(
    "count_star",
    oracle="SELECT COUNT(*) AS n_rows FROM lineitem",
    tags=("A1",),
)
def count_star(spark, sf_dir):
    """Full-table count (A1, hudi/hudi_scd_script.py:77,90,110,112)."""
    return _t(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_rows"))


_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def _dsum(col, scale: int = 4):
    """Order-independent float sum: exact DECIMAL accumulation, DOUBLE out."""
    c = F.expr(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


@register("q1_pricing_summary", oracle=_Q1_ORACLE, tags=("agg", "bench"))
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the headline scan+aggregate benchmark query.
    Partial (map-side) aggregation + single shuffle on the 6-value group
    key; decimal accumulation keeps results order-independent."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    )
    disc_price = F.expr("l_extendedprice * (1 - l_discount)")
    charge = F.expr("l_extendedprice * (1 - l_discount) * (1 + l_tax)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum("l_quantity").alias("sum_qty"),
        _dsum("l_extendedprice").alias("sum_base_price"),
        _dsum(disc_price, 6).alias("sum_disc_price"),
        _dsum(charge, 6).alias("sum_charge"),
        (_dsum("l_quantity") / F.count("*")).alias("avg_qty"),
        (_dsum("l_extendedprice") / F.count("*")).alias("avg_price"),
        (_dsum("l_discount", 6) / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey, o_orderdate, o_orderpriority, revenue FROM (
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        ROW_NUMBER() OVER (
          ORDER BY CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) DESC,
                   l_orderkey) AS rn
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority) t
    WHERE rn <= 10
    """,
    tags=("join", "agg", "bench"),
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dimension filter -> fact join -> top-10.
    customer is small relative to lineitem — AQE broadcasts it; the top-k
    uses a ranked window with a unique tie-break, not a global sort."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    joined = (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        _dsum(F.expr("l_extendedprice * (1 - l_discount)"), 6).alias("revenue")
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("l_orderkey", "o_orderdate", "o_orderpriority", "revenue")
    )


@register(
    "q5_local_supplier",
    oracle="""
    SELECT n_name,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "agg", "bench"),
)
def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: 6-way star join + group-agg. Dimension tables
    (region/nation/supplier/customer) broadcast; the only large shuffle is
    the lineitem<->orders equi join."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        _dsum(F.expr("l_extendedprice * (1 - l_discount)"), 6).alias("revenue")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "bench"),
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan + selective filter + scalar agg — all
    predicates push to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(_dsum(F.expr("l_extendedprice * l_discount"), 6).alias("revenue"))


@register(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def rollup_agg(spark, sf_dir):
    """Hierarchical ROLLUP aggregate (engine-completeness beyond A1)."""
    return _t(spark, sf_dir, "lineitem").rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), _dsum("l_quantity").alias("sum_qty")
    )


@register(
    "distinct_agg",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def distinct_agg(spark, sf_dir):
    """Multi distinct-aggregate (expand-based plan in Spark)."""
    return _t(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


# --------------------------------------------------------------------------
# SCD2 composite operators (§2.11) — the reference-defining capability
# --------------------------------------------------------------------------

@register(
    "scd2_envelope",
    oracle=_SQL_TGT9,
    tags=("P1", "F1-F10"),
)
def scd2_envelope(spark, sf_dir):
    """SCD2 envelope derivation (P1 + F1-F10): ts/valid_from/valid_to/
    iscurrent/checksum over the customer dimension, deterministic as-of
    timestamp (hudi/hudi_scd_script.py:59-63)."""
    return scd2_target(spark, sf_dir)


# Final-state oracle for the hudi-style merge: expired copies of changed
# rows (ts = batch T2, wins precombine) UNION ALL every update row current
# at T2. All stored rows collide on the (key, checksum) record key.
_SQL_MERGE_HUDI = f"""
WITH tgt AS ({_SQL_TGT9}), upd AS ({_SQL_UPD9})
SELECT t.c_custkey, t.c_name, t.c_nationkey, t.c_acctbal, t.c_mktsegment,
       u.ts AS ts, t.valid_from AS valid_from, u.valid_from AS valid_to,
       CAST(0 AS INTEGER) AS iscurrent, t.checksum AS checksum
FROM tgt t JOIN upd u
  ON t.c_custkey = u.c_custkey AND t.checksum <> u.checksum AND t.iscurrent = 1
UNION ALL
SELECT * FROM upd
"""


@register("scd2_merge_hudi", oracle=_SQL_MERGE_HUDI, tags=("S7", "scd2", "bench"))
def q_scd2_merge_hudi(spark, sf_dir):
    """SCD2 merge, Hudi variant: join-expire-union-upsert
    (hudi/hudi_scd_script.py:93-119). Unchanged rows rewritten at T2."""
    return scd2_merge_hudi_style(
        scd2_target(spark, sf_dir),
        customer_updates(spark, sf_dir),
        "c_custkey",
        CHECKSUM_COLS,
        as_of=T2,
    )


@register(
    "scd2_merge_hudi_vtable",
    oracle=_SQL_MERGE_HUDI,
    tags=("S7", "S2", "scd2", "extension"),
)
def q_scd2_merge_hudi_vtable(spark, sf_dir):
    """The vtable DataSource composed with the Hudi SCD2 merge on the
    real pipeline path, not just isolated format tests: the target
    envelope is written through ``df.write.format("vtable")`` and read
    back through ``spark.read.format("vtable")`` before the
    join-expire-union-upsert — the format-based snapshot read the
    reference's merge consumes (hudi/hudi_scd_script.py:76
    ``spark.read.format("hudi").load(path)``). Same oracle as
    ``scd2_merge_hudi``: the format hop must be lossless (schema,
    timestamps, checksums) for the hash to match."""
    import tempfile

    from .sources.datasource import register_vtable_source

    register_vtable_source(spark)
    loc = tempfile.mkdtemp(prefix="vtable_scd2_")
    scd2_target(spark, sf_dir).write.format("vtable").option(
        "location", loc
    ).mode("overwrite").save()
    target = spark.read.format("vtable").option("location", loc).load()
    return scd2_merge_hudi_style(
        target,
        customer_updates(spark, sf_dir),
        "c_custkey",
        CHECKSUM_COLS,
        as_of=T2,
    )


# Iceberg variant differs from Hudi only in the expired copies' ts: the
# MERGE updates the stored row in place, so ts stays T1.
_SQL_MERGE_ICEBERG = f"""
WITH tgt AS ({_SQL_TGT9}), upd AS ({_SQL_UPD9})
SELECT t.c_custkey, t.c_name, t.c_nationkey, t.c_acctbal, t.c_mktsegment,
       t.ts AS ts, t.valid_from AS valid_from, u.valid_from AS valid_to,
       CAST(0 AS INTEGER) AS iscurrent, t.checksum AS checksum
FROM tgt t JOIN upd u
  ON t.c_custkey = u.c_custkey AND t.checksum <> u.checksum AND t.iscurrent = 1
UNION ALL
SELECT * FROM upd
"""


@register("scd2_merge_iceberg", oracle=_SQL_MERGE_ICEBERG, tags=("S10", "scd2"))
def q_scd2_merge_iceberg(spark, sf_dir):
    """SCD2 merge, Iceberg variant: union-distinct + LEAD window + 2-key
    MERGE (iceberg/iceberg_scd_script.py:54-82)."""
    return scd2_merge_iceberg_style(
        scd2_target(spark, sf_dir),
        customer_updates(spark, sf_dir),
        "c_custkey",
        CHECKSUM_COLS,
        as_of=T2,
    )


# Delta variant: 8-column envelope (no ts); unchanged target rows preserved
# at T1; changed rows expired in place; inserts = changed new versions + new keys.
_SQL_MERGE_DELTA = f"""
WITH tgt AS ({_SQL_TGT8}), upd AS ({_SQL_UPD8})
SELECT t.c_custkey, t.c_name, t.c_nationkey, t.c_acctbal, t.c_mktsegment,
       t.valid_from AS valid_from, u.valid_from AS valid_to,
       CAST(0 AS INTEGER) AS iscurrent, t.checksum AS checksum
FROM tgt t JOIN upd u
  ON t.c_custkey = u.c_custkey AND t.checksum <> u.checksum AND t.iscurrent = 1
UNION ALL
SELECT t.* FROM tgt t
WHERE NOT EXISTS (SELECT 1 FROM upd u
                  WHERE u.c_custkey = t.c_custkey AND u.checksum <> t.checksum
                    AND t.iscurrent = 1)
UNION ALL
SELECT u.* FROM upd u JOIN tgt t
  ON t.c_custkey = u.c_custkey AND t.checksum <> u.checksum AND t.iscurrent = 1
UNION ALL
SELECT u.* FROM upd u WHERE NOT EXISTS
  (SELECT 1 FROM tgt t WHERE t.c_custkey = u.c_custkey)
"""


@register("scd2_merge_delta", oracle=_SQL_MERGE_DELTA, tags=("S11", "J4", "scd2"))
def q_scd2_merge_delta(spark, sf_dir):
    """SCD2 merge, Delta variant: NULL-mergeKey dual-row MERGE decomposition
    (delta/delta_scd_script.py:76-95). Unchanged rows keep T1 timestamps."""
    return scd2_merge_delta_style(
        scd2_target(spark, sf_dir, include_ts=False),
        customer_updates(spark, sf_dir),
        "c_custkey",
        CHECKSUM_COLS,
        as_of=T2,
    )


@register(
    "upsert_by_key",
    oracle=f"""
    WITH tgt AS ({_SQL_TGT9}), upd AS ({_SQL_UPD9}),
    unioned AS (SELECT * FROM tgt UNION ALL SELECT * FROM upd)
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           ts, valid_from, valid_to, iscurrent, checksum
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey, checksum
                                       ORDER BY ts DESC) AS rn
          FROM unioned) t
    WHERE rn = 1
    """,
    tags=("S7",),
)
def q_upsert_by_key(spark, sf_dir):
    """Keyed upsert with precombine dedup (S7): record key (key, checksum),
    precombine ts — Hudi writer semantics (hudi/hudi_scd_script.py:32-36)."""
    return upsert_by_key(
        scd2_target(spark, sf_dir),
        with_scd2_columns(customer_updates(spark, sf_dir), CHECKSUM_COLS, as_of=T2),
        ["c_custkey", "checksum"],
        "ts",
    )


@register(
    "merge_into_generic",
    oracle="""
    WITH src AS (
      SELECT n_nationkey, n_name || '_x' AS n_name, n_regionkey
      FROM nation WHERE n_nationkey % 3 = 0
      UNION ALL
      SELECT n_nationkey + 100, n_name, n_regionkey FROM nation)
    SELECT t.n_nationkey, COALESCE(s.n_name, t.n_name) AS n_name, t.n_regionkey
    FROM nation t LEFT JOIN src s ON t.n_nationkey = s.n_nationkey
    UNION ALL
    SELECT s.n_nationkey, s.n_name, s.n_regionkey
    FROM src s WHERE NOT EXISTS
      (SELECT 1 FROM nation t WHERE t.n_nationkey = s.n_nationkey)
    """,
    tags=("S10", "S11"),
)
def merge_into_generic(spark, sf_dir):
    """Generic MERGE INTO via MergeIntoBuilder (S10/S11 without the format
    plugin): WHEN MATCHED UPDATE SET / WHEN NOT MATCHED INSERT *."""
    n = _t(spark, sf_dir, "nation")
    src = (
        n.filter(F.col("n_nationkey") % 3 == 0)
        .withColumn("n_name", F.concat(F.col("n_name"), F.lit("_x")))
        .unionByName(n.withColumn("n_nationkey", F.col("n_nationkey") + 100))
    )
    return (
        MergeIntoBuilder(n, src, F.col("t.n_nationkey") == F.col("s.n_nationkey"))
        .when_matched_update(set={"n_name": F.col("s.n_name")})
        .when_not_matched_insert_all()
        .execute()
    )


@register(
    "merge_into_sql_star",
    oracle="""
    WITH src AS (
      SELECT n_nationkey, n_name || '_u' AS n_name,
             n_regionkey + 1 AS n_regionkey
      FROM nation WHERE n_nationkey % 4 = 0
      UNION ALL
      SELECT n_nationkey + 200, n_name, n_regionkey
      FROM nation WHERE n_nationkey % 5 = 0)
    SELECT t.n_nationkey,
           CASE WHEN s.n_nationkey IS NOT NULL THEN s.n_name
                ELSE t.n_name END AS n_name,
           CASE WHEN s.n_nationkey IS NOT NULL THEN s.n_regionkey
                ELSE t.n_regionkey END AS n_regionkey
    FROM nation t LEFT JOIN src s USING (n_nationkey)
    UNION ALL
    SELECT s.n_nationkey, s.n_name, s.n_regionkey FROM src s
    WHERE NOT EXISTS
      (SELECT 1 FROM nation t WHERE t.n_nationkey = s.n_nationkey)
    """,
    tags=("S10", "S11", "extension"),
)
def q_merge_into_sql_star(spark, sf_dir):
    """SQL MERGE front-end replaying the reference's Iceberg statement
    shape verbatim (iceberg_scd_script.py:76-82 — ``USING (<subquery>) src
    ... UPDATE SET * ... INSERT *``): parsed by operators/merge_sql.py and
    lowered onto the oracle-proven MergeIntoBuilder join decomposition, so
    a reference user's MERGE string runs unchanged on plain DataFrames."""
    from .operators.merge_sql import merge_into_sql

    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    n.createOrReplaceTempView("merge_sql_nation")
    return merge_into_sql(
        spark,
        """
        MERGE INTO merge_sql_nation tgt
        USING (SELECT n_nationkey, n_name || '_u' AS n_name,
                      n_regionkey + 1 AS n_regionkey
               FROM merge_sql_nation WHERE n_nationkey % 4 = 0
               UNION ALL
               SELECT n_nationkey + 200, n_name, n_regionkey
               FROM merge_sql_nation WHERE n_nationkey % 5 = 0) src
        ON tgt.n_nationkey = src.n_nationkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """,
    )


@register(
    "merge_into_sql_conditional",
    oracle="""
    WITH src AS (
      SELECT n_nationkey, n_name, (n_regionkey + 2) % 5 AS n_regionkey
      FROM nation WHERE n_nationkey % 3 = 0
      UNION ALL
      SELECT n_nationkey + 300, n_name, n_regionkey
      FROM nation WHERE n_nationkey % 7 = 0)
    SELECT t.n_nationkey, t.n_name,
           CASE WHEN s.n_nationkey IS NOT NULL
                     AND s.n_regionkey <> t.n_regionkey
                THEN s.n_regionkey ELSE t.n_regionkey END AS n_regionkey
    FROM nation t LEFT JOIN src s USING (n_nationkey)
    UNION ALL
    SELECT s.n_nationkey, lower(s.n_name) AS n_name, s.n_regionkey
    FROM src s
    WHERE NOT EXISTS
      (SELECT 1 FROM nation t WHERE t.n_nationkey = s.n_nationkey)
    """,
    tags=("S11", "extension"),
)
def q_merge_into_sql_conditional(spark, sf_dir):
    """SQL MERGE front-end, Delta statement shape
    (delta_scd_script.py:89-95 — conditional ``WHEN MATCHED AND <cond>
    THEN UPDATE SET col = expr``) plus the explicit
    ``INSERT (cols) VALUES (exprs)`` surface: insert expressions evaluate
    over the unmatched source row (lower() here), matched rows update only
    when the condition holds."""
    from .operators.merge_sql import merge_into_sql

    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    n.createOrReplaceTempView("merge_sql_nation2")
    return merge_into_sql(
        spark,
        """
        MERGE INTO merge_sql_nation2 tgt
        USING (SELECT n_nationkey, n_name,
                      (n_regionkey + 2) % 5 AS n_regionkey
               FROM merge_sql_nation2 WHERE n_nationkey % 3 = 0
               UNION ALL
               SELECT n_nationkey + 300, n_name, n_regionkey
               FROM merge_sql_nation2 WHERE n_nationkey % 7 = 0) src
        ON tgt.n_nationkey = src.n_nationkey
        WHEN MATCHED AND src.n_regionkey <> tgt.n_regionkey
          THEN UPDATE SET n_regionkey = src.n_regionkey
        WHEN NOT MATCHED THEN
          INSERT (n_nationkey, n_name, n_regionkey)
          VALUES (src.n_nationkey, lower(src.n_name), src.n_regionkey)
        """,
    )


# --------------------------------------------------------------------------
# Event-time queries (batch equivalents of the streaming module — §2.9 is
# empty in the reference; these are the capability extension)
# --------------------------------------------------------------------------

_EV_SQL = "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events"


@register(
    "events_tumbling_hourly",
    oracle=f"""
    WITH ev AS ({_EV_SQL})
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM ev GROUP BY 1, 2
    """,
    tags=("events", "streaming", "bench"),
)
def events_tumbling_hourly(spark, sf_dir):
    """Tumbling event-time window aggregate (F.window) — the batch twin of
    the Structured Streaming windowed agg in streaming/events.py."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), _dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value"
        )
    )


@register(
    "events_sliding_windows",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    ex AS (
      SELECT TIMESTAMP '1970-01-01 00:00:00'
             + to_seconds(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)) AS ws, value
      FROM ev
      UNION ALL
      SELECT TIMESTAMP '1970-01-01 00:00:00'
             + to_seconds(CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT)) AS ws, value
      FROM ev)
    SELECT ws AS window_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM ex GROUP BY ws
    """,
    tags=("events", "streaming"),
)
def events_sliding_windows(spark, sf_dir):
    """Sliding window (1 h length, 30 min slide): every event lands in two
    overlapping windows — F.window handles the expansion."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), _dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@register(
    "events_sessionize",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    g AS (
      SELECT user_id, ts, event_id,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS new_sess
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts,
        CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM g)
    SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
    tags=("events", "streaming"),
)
def events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30 min inactivity): lag -> new-session flag
    -> running sum, all window functions — one shuffle on user_id shared by
    both windows and the final aggregate."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "__us", F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_us = F.lag("__us").over(w)
    new_sess = F.when(
        lag_us.isNull() | (F.col("__us") - lag_us > 1800 * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


# --------------------------------------------------------------------------
# Training-data pipeline extensions: dedup / similarity / text / multimodal
# --------------------------------------------------------------------------

from .operators.dedup import (  # noqa: E402
    embedding_near_dup_pairs,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from .operators.multimodal import (  # noqa: E402
    attach_binary_payload,
    decode_image_stub,
    extract_binary_features,
    sample_frames_stub,
)
from .operators.similarity import (  # noqa: E402
    DEFAULT_MAX_BUCKET_SIZE,
    cosine_topk,
    lsh_ann_pairs,
    lsh_ann_topk,
)
from .operators.text import (  # noqa: E402
    LANG_STOPWORDS,
    with_fingerprints,
    with_lang_id,
    with_text_stats,
    with_token_count,
)


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS digest, MIN(doc_id) AS keep_id,
           COUNT(*) AS dup_count
    FROM documents GROUP BY md5(text)
    """,
    tags=("dedup", "extension", "bench"),
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on the content digest, lowest id wins."""
    return exact_dedup(_t(spark, sf_dir, "documents"), ["text"], "doc_id")


# MinHash signature SQL shared by the minhash/LSH/jaccard oracles
# Carter-Wegman minhash family mirrored in SQL: h_i = (a + i*b) mod p with
# a, b md5-derived per shingle (must stay in lockstep with
# operators.dedup.minhash_signatures).
_MINHASH_P = (1 << 31) - 1
_SQL_MINHASH = f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
    shng AS (
      SELECT doc_id,
             list_transform(range(1, len(t) - 1),
                            i -> array_to_string(t[i:i+2], ' ')) AS s
      FROM toks WHERE len(t) >= 3),
    ab AS (
      SELECT doc_id, list_transform(s, x -> struct_pack(
        a := CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % {_MINHASH_P},
        b := CAST(concat('0x', substr(md5(concat('b:', x)), 1, 15)) AS BIGINT) % {_MINHASH_P}
      )) AS ab FROM shng),
    sig AS (
      SELECT doc_id,
""" + ",\n".join(
    f"        list_min(list_transform(ab, x -> (x.a + {i} * x.b) % {_MINHASH_P})) AS h{i}"
    for i in range(8)
) + """
      FROM ab)
"""


@register(
    "minhash_signatures",
    oracle=_SQL_MINHASH + "SELECT * FROM sig",
    tags=("dedup", "extension", "bench"),
)
def q_minhash_signatures(spark, sf_dir):
    """MinHash signatures (8 seeded hashes over token 3-gram shingles) —
    per-row map at scan speed, exact cross-engine oracle via md5 hashing."""
    return minhash_signatures(_t(spark, sf_dir, "documents"))


# bucket cap interpolated from the shared operator-default constant —
# changing DEFAULT_MAX_BUCKET_SIZE keeps oracle and engine in lockstep
_SQL_LSH_BANDS = _SQL_MINHASH + f""",
    bands0 AS (
      SELECT doc_id, 0 AS band, md5(concat_ws('_', h0, h1)) AS key FROM sig
      UNION ALL SELECT doc_id, 1, md5(concat_ws('_', h2, h3)) FROM sig
      UNION ALL SELECT doc_id, 2, md5(concat_ws('_', h4, h5)) FROM sig
      UNION ALL SELECT doc_id, 3, md5(concat_ws('_', h6, h7)) FROM sig),
    bands AS (
      SELECT doc_id, band, key FROM (
        SELECT doc_id, band, key, COUNT(*) OVER (PARTITION BY band, key) AS bsz
        FROM bands0) t
      WHERE bsz <= {DEFAULT_MAX_BUCKET_SIZE}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
"""


@register(
    "lsh_candidate_pairs",
    oracle=_SQL_LSH_BANDS + "SELECT id_a, id_b FROM cand",
    tags=("dedup", "extension"),
)
def q_lsh_candidate_pairs(spark, sf_dir):
    """MinHash-LSH banding (4 bands x 2 hashes): candidate near-dup pairs
    sharing any band bucket — the sub-quadratic shuffle-on-bucket-key step."""
    sigs = minhash_signatures(_t(spark, sf_dir, "documents"))
    return lsh_candidate_pairs(sigs)


@register(
    "ngram_jaccard_pairs",
    oracle=_SQL_LSH_BANDS + """,
    shd AS (SELECT doc_id, list_distinct(s) AS sh FROM shng),
    scored AS (
      SELECT c.id_a, c.id_b,
             len(list_intersect(a.sh, b.sh)) /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      FROM cand c
      JOIN shd a ON a.doc_id = c.id_a
      JOIN shd b ON b.doc_id = c.id_b)
    SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.5
    """,
    tags=("dedup", "extension"),
)
def q_ngram_jaccard_pairs(spark, sf_dir):
    """Exact n-gram Jaccard verification over the LSH candidates — the
    find->verify near-dup pipeline end-to-end."""
    docs = _t(spark, sf_dir, "documents")
    cands = lsh_candidate_pairs(minhash_signatures(docs))
    return ngram_jaccard_pairs(docs, cands, threshold=0.5)


_SQL_SIMHASH = r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents),
    h AS (SELECT doc_id,
                 CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS hv
          FROM toks),
    acc AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (hv >> (b % 60)) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h, UNNEST(generate_series(0, 63)) AS t(b)
      GROUP BY doc_id, b),
    unsigned_sig AS (
      SELECT doc_id,
             SUM(CASE WHEN s > 0 THEN CAST(1 AS HUGEINT) << b ELSE 0 END) AS u
      FROM acc GROUP BY doc_id)
    SELECT doc_id,
           CAST(CASE WHEN u >= CAST(1 AS HUGEINT) << 63
                     THEN u - (CAST(1 AS HUGEINT) << 64)
                     ELSE u END AS BIGINT) AS simhash
    FROM unsigned_sig
"""


@register("simhash_fingerprints", oracle=_SQL_SIMHASH, tags=("dedup", "extension", "udf"))
def q_simhash(spark, sf_dir):
    """SimHash fingerprints via Arrow-batched pandas UDF — exact oracle:
    the md5-derived per-token 60-bit hash and sign-of-weighted-sum bit
    logic are replayed in SQL (per-bit lateral sum + HUGEINT bit
    assembly), so even the bit-twiddling UDF is engine-verified."""
    return simhash(_t(spark, sf_dir, "documents"))


_SQL_EMB_NORM = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
"""


@register(
    "embedding_topk",
    oracle=_SQL_EMB_NORM + """
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
                        c.vec_id) AS INTEGER) AS rank
      FROM n q JOIN n c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 10) t
    WHERE rank <= 5
    """,
    tags=("similarity", "extension", "bench"),
)
def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-k (exact ANN baseline): broadcast queries,
    one corpus scan, ranked window with deterministic tie-break."""
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "embedding_near_dup",
    oracle=_SQL_EMB_NORM + """
    SELECT id_a, id_b, cosine FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
      FROM n a JOIN n b ON a.vec_id < b.vec_id) t
    WHERE cosine >= 0.35
    """,
    tags=("similarity", "dedup", "extension"),
)
def q_embedding_near_dup(spark, sf_dir):
    """Exact embedding near-dup pairs (cosine >= 0.35) — correctness
    baseline for the LSH scale path."""
    return embedding_near_dup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.35)


from .operators.similarity import signature_sql as _signature_sql  # noqa: E402

# Shared CTE prefix replaying hyperplane_signatures + banding + the bucket
# cap in DuckDB: signature = sum over planes of (list_dot_product(v, plane)
# > 0) << j with the plane coefficients inlined as exact binary64 literals
# — the same sequential fold Spark's zip_with+aggregate performs, so sign
# bits (and therefore every LSH bucket) are bit-identical cross-engine.
_SQL_LSH_BUCKETS = (
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    sig AS (SELECT vec_id, """
    + _signature_sql("v")
    + f""" AS signature FROM e),
    bands(band) AS (VALUES (0), (1), (2), (3)),
    buckets0 AS (
      SELECT vec_id, band, (signature >> (band * 4)) & 15 AS key
      FROM sig CROSS JOIN bands),
    buckets AS (
      SELECT vec_id, band, key FROM (
        SELECT vec_id, band, key,
               COUNT(*) OVER (PARTITION BY band, key) AS bsz
        FROM buckets0) t
      WHERE bsz <= {DEFAULT_MAX_BUCKET_SIZE})
"""
)


@register(
    "embedding_ann_lsh_pairs",
    oracle=_SQL_LSH_BUCKETS
    + """
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
    """,
    tags=("similarity", "extension"),
)
def q_embedding_ann_lsh(spark, sf_dir):
    """Random-hyperplane LSH candidate pairs — the sub-quadratic ANN path.
    Exact oracle: the literal-plane sequential-fold signature (see
    operators/similarity.signature_sql) makes every bucket — and therefore
    the candidate pair set — DuckDB-replayable bit-for-bit."""
    return lsh_ann_pairs(_t(spark, sf_dir, "embeddings"))


@register(
    "embedding_ann_lsh_topk",
    oracle=_SQL_LSH_BUCKETS
    + """
    , qb0 AS (
      SELECT vec_id AS query_id, band, (signature >> (band * 4)) & 15 AS key
      FROM sig CROSS JOIN bands WHERE vec_id < 10),
    probes AS (
      SELECT query_id, band, key FROM qb0
      UNION
      SELECT query_id, band, xor(key, 1 << f.j) AS key
      FROM qb0 CROSS JOIN (VALUES (0), (1), (2), (3)) AS f(j)),
    cand AS (
      SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
      FROM probes p JOIN buckets c ON p.band = c.band AND p.key = c.key
      WHERE p.query_id <> c.vec_id)
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT cand.query_id, cand.neighbor_id,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY cand.query_id
               ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
                        cand.neighbor_id) AS INTEGER) AS rank
      FROM cand
      JOIN n q ON q.vec_id = cand.query_id
      JOIN n c ON c.vec_id = cand.neighbor_id) t
    WHERE rank <= 5
    """,
    tags=("similarity", "extension"),
)
def q_embedding_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed approximate top-k with multi-probe (1-bit-flip
    neighbor buckets on the query side: measured recall 0.92 vs 0.46
    single-probe at sf0.01), exact rescoring of candidates only. Exact
    oracle via the literal-plane signature replay (signature_sql)."""
    emb = _t(spark, sf_dir, "embeddings")
    return lsh_ann_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, multi_probe=True)


@register(
    "embedding_ann_lsh_blas_pairs", oracle=None, tags=("similarity", "extension")
)
def q_embedding_ann_lsh_blas_pairs(spark, sf_dir):
    """Production-dim ANN path: BLAS (one-matmul-per-Arrow-batch)
    hyperplane band keys at n_planes=64 x 8 bands over a widened 256-dim
    embedding — the parameterization recommended_lsh_params picks for
    large corpora, where the literal-fold path's O(n_planes x dim) plan
    would be a driver bottleneck. Rows-only: matmul accumulation order is
    not the sequential fold, so bits near zero are not oracle-replayable
    (the literal-fold queries above keep exact parity at test dims)."""
    from .operators.similarity import lsh_ann_pairs_blas

    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    # widen 64 -> 256 dims with rotations: permutations of the same vector
    # stay unit-scale and decorrelate under independent random planes (a
    # constant-shifted widening would point every vector the same way and
    # collapse all rows into one bucket)
    rot = lambda k: F.concat(F.slice(e, k + 1, 64 - k), F.slice(e, 1, k))  # noqa: E731
    wide = emb.select(
        "vec_id", F.concat(e, rot(16), rot(32), rot(48)).alias("embedding")
    )
    return lsh_ann_pairs_blas(wide, n_planes=64, bands=8)


@register(
    "embedding_ann_lsh_autoparams",
    oracle=None,
    tags=("similarity", "extension", "scale"),
)
def q_embedding_ann_lsh_autoparams(spark, sf_dir):
    """recommended_lsh_params exercised END-TO-END at realistic corpus
    scale: the 500-vector embeddings table is widened to a 64,000-vector
    corpus (128 deterministic directional variants per vector — rotation
    x reversal, which decorrelate under random hyperplanes where a
    scaled copy would not), the sizing function picks the band-key width
    for that corpus, and the output is the per-band bucket DISTRIBUTION
    of the BLAS signature path — the observable proof that auto-sized
    keys keep every bucket under the self-join cap, where the test-dim
    4-bit default would collapse (16 buckets/band -> every bucket over
    the cap -> zero candidates). Rows-only: bucket stats depend on BLAS
    signatures (not SQL-replayable); the cap assertion itself lives in
    tests/test_lsh_caps.py."""
    from .operators.similarity import (
        hyperplane_band_keys_blas,
        recommended_lsh_params,
    )

    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    dim = 64
    n_variants = 128
    # JVM-side variant fan-out: posexplode over rotation index, then an
    # optional reversal — zero Python until the signature matmul
    rots = emb.select(
        "vec_id", e.alias("e"), F.posexplode(F.sequence(F.lit(0), F.lit(63))).alias("r", "_")
    ).select(
        "vec_id",
        "r",
        F.concat(
            F.slice("e", F.col("r") + 1, F.lit(dim) - F.col("r")),
            F.slice("e", 1, F.col("r")),
        ).alias("v"),
    )
    corpus = rots.select(
        (F.col("vec_id") * n_variants + F.col("r") * 2).alias("vec_id"),
        F.col("v").alias("embedding"),
    ).unionAll(
        rots.select(
            (F.col("vec_id") * n_variants + F.col("r") * 2 + 1).alias("vec_id"),
            F.reverse("v").alias("embedding"),
        )
    )
    params = recommended_lsh_params(500 * n_variants)
    keys = hyperplane_band_keys_blas(
        corpus, n_planes=params["n_planes"], bands=params["bands"]
    )
    return (
        keys.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("bucket_size").alias("max_bucket_size"),
            F.sum("bucket_size").alias("n_rows"),
        )
    )


@register(
    "text_quality_stats",
    oracle="""
    SELECT doc_id, lang, source,
      CAST(length(text) AS BIGINT) AS n_chars,
      CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
      (CAST(length(text) AS BIGINT) - (len(string_split_regex(trim(text), '\\s+')) - 1))
        / len(string_split_regex(trim(text), '\\s+')) AS avg_token_len,
      CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT)
        / CAST(length(text) AS BIGINT) AS punct_ratio,
      CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|in|to)\\b')) AS BIGINT)
        / CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS stopword_ratio,
      CAST(len(string_split_regex(trim(text), '\\s+')) >= 5 AND length(text) >= 20
           AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT)
               / CAST(length(text) AS BIGINT) < 0.3 AS INTEGER) AS quality_ok
    FROM documents
    """,
    tags=("text", "extension", "bench"),
)
def q_text_quality_stats(spark, sf_dir):
    """Quality-scoring features (length/token/punctuation/stopword ratios)
    — pure column expressions, zero shuffle, scan-speed at 100 TB."""
    return with_text_stats(_t(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "source", "n_chars", "n_tokens", "avg_token_len",
        "punct_ratio", "stopword_ratio", "quality_ok",
    )


def _lang_id_oracle() -> str:
    langs = sorted(LANG_STOPWORDS)
    score_cols = []
    for lang in langs:
        pat = "\\b(" + "|".join(LANG_STOPWORDS[lang]) + ")\\b"
        score_cols.append(
            f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS score_{lang}"
        )
    cases = []
    for i, lang in enumerate(langs):
        conds = []
        for j, other in enumerate(langs):
            if i == j:
                continue
            op = ">=" if j > i else ">"
            conds.append(f"score_{lang} {op} score_{other}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"""
    WITH scored AS (
      SELECT doc_id, lang, {', '.join(score_cols)} FROM documents)
    SELECT doc_id, lang, {', '.join('score_' + l for l in langs)},
           COALESCE(CASE {' '.join(cases)} END, '{langs[0]}') AS predicted_lang
    FROM scored
    """


@register("lang_id", oracle=_lang_id_oracle(), tags=("text", "extension"))
def q_lang_id(spark, sf_dir):
    """Heuristic language ID (distinctive-stopword argmax, deterministic
    tie-break) — the n-gram-free classifier shape."""
    return with_lang_id(_t(spark, sf_dir, "documents")).select(
        "doc_id", "lang",
        *[f"score_{lang}" for lang in sorted(LANG_STOPWORDS)],
        "predicted_lang",
    )


@register(
    "token_count",
    oracle="""
    SELECT doc_id,
      CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
        AS bpe_tokens
    FROM documents
    """,
    tags=("text", "extension"),
)
def q_token_count(spark, sf_dir):
    """Token counting: whitespace and BPE-ish regex pre-tokenizer counts."""
    return with_token_count(_t(spark, sf_dir, "documents")).select(
        "doc_id", "ws_tokens", "bpe_tokens"
    )


@register(
    "doc_fingerprint",
    oracle="""
    WITH n AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nrm
      FROM documents)
    SELECT doc_id, md5(nrm) AS content_fingerprint,
      CASE WHEN length(nrm) >= 5 THEN
        list_min(list_transform(range(1, length(nrm) - 3),
          i -> CAST(concat('0x', substr(md5(substr(nrm, i, 5)), 1, 15)) AS BIGINT)))
      ELSE NULL END AS rolling_fingerprint
    FROM n
    """,
    tags=("text", "extension"),
)
def q_doc_fingerprint(spark, sf_dir):
    """Document fingerprints: exact md5 of normalized text + min-shingle
    rolling hash (1-min-sketch winnowing)."""
    return with_fingerprints(_t(spark, sf_dir, "documents")).select(
        "doc_id", "content_fingerprint", "rolling_fingerprint"
    )


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
    tags=("multimodal", "extension", "udf"),
)
def q_multimodal_features(spark, sf_dir):
    """Binary-column plumbing: payload attach + Arrow-batched pandas-UDF
    feature extraction (byte length, content digest) — the real decode
    pipeline shape with an exact oracle."""
    docs = attach_binary_payload(_t(spark, sf_dir, "documents"))
    return extract_binary_features(docs)


@register(
    "multimodal_decode_stub",
    oracle="""
    SELECT doc_id,
      64 + CAST(concat('0x', substr(md5(text), 1, 2)) AS INTEGER) % 192 AS width,
      64 + CAST(concat('0x', substr(md5(text), 3, 2)) AS INTEGER) % 192 AS height,
      1 + CAST(concat('0x', substr(md5(text), 5, 2)) AS INTEGER) % 3 AS channels
    FROM documents
    """,
    tags=("multimodal", "extension", "udf"),
)
def q_multimodal_decode(spark, sf_dir):
    """STUB image decode over binary payloads (no imaging library in this
    container): fake dims derive from the payload's md5 digest bytes, so
    the oracle replays them in SQL — the mapInPandas plumbing (schema,
    batching, select-late) is verified exactly; swapping in PIL changes
    only the marked block."""
    docs = attach_binary_payload(_t(spark, sf_dir, "documents"))
    return decode_image_stub(docs)


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH hx AS (
      SELECT doc_id, hex(encode(text)) AS hs,
             octet_length(encode(text)) AS nb
      FROM documents WHERE doc_id < 50)
    SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
      CAST(concat('0x', substr(hs, CAST(i AS INTEGER) * 20 + 1, 2))
        AS INTEGER) AS frame_byte
    FROM hx,
         UNNEST(generate_series(0,
           CAST(floor((nb - 1) / 10.0) AS INTEGER))) AS t(i)
    """,
    tags=("multimodal", "extension", "udf"),
)
def q_multimodal_frames(spark, sf_dir):
    """STUB video frame sampling (explode-shaped mapInPandas, one row per
    10-byte stride): frame bytes are payload bytes at the stride offsets,
    replayed exactly in SQL over the UTF-8 encoding. Deterministic doc
    subset (doc_id < 50, not LIMIT — a bare limit is layout-dependent)."""
    docs = attach_binary_payload(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    )
    return sample_frames_stub(docs)


# --------------------------------------------------------------------------
# Structured Streaming (replayed via file source + AvailableNow; the
# streaming twins of the events_* batch queries)
# --------------------------------------------------------------------------

import tempfile  # noqa: E402

from .streaming.events import (  # noqa: E402
    run_stream_to_memory,
    stage_events_as_stream_source,
    stream_distinct_users,
    stream_session_windows,
    stream_tumbling_counts,
    stream_user_running_totals,
)


def _events_stream(spark, sf_dir):
    return stage_events_as_stream_source(
        spark, sf_dir, tempfile.mkdtemp(prefix="evstream_")
    )


@register(
    "streaming_tumbling_hourly",
    oracle=f"""
    WITH ev AS ({_EV_SQL})
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM ev GROUP BY 1, 2
    """,
    tags=("streaming", "extension"),
)
def q_streaming_tumbling(spark, sf_dir):
    """Structured Streaming tumbling window (complete mode, AvailableNow
    replay) — exact-matches the batch oracle: same code path serves batch
    backfill and live ingestion."""
    return run_stream_to_memory(stream_tumbling_counts(_events_stream(spark, sf_dir)))


@register(
    "streaming_distinct_users",
    oracle="SELECT DISTINCT user_id FROM events",
    tags=("streaming", "extension"),
)
def q_streaming_distinct_users(spark, sf_dir):
    """Streaming dedup (dropDuplicates state per key, append mode)."""
    return run_stream_to_memory(
        stream_distinct_users(_events_stream(spark, sf_dir)), output_mode="append"
    )


@register(
    "streaming_session_windows",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    g AS (
      SELECT user_id, ts, event_id,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
             THEN 1 ELSE 0 END AS new_sess
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts,
        CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM g),
    sess AS (
      SELECT user_id, MIN(ts) AS session_start,
             MAX(ts) + INTERVAL 30 MINUTE AS session_end,
             COUNT(*) AS n_events
      FROM s GROUP BY user_id, sid),
    wm AS (SELECT make_timestamp(epoch_ms(MAX(ts)) * 1000) - INTERVAL 1 HOUR AS w
           FROM ev)
    SELECT user_id, session_start, session_end, n_events FROM sess, wm
    WHERE session_end <= wm.w
    """,
    tags=("streaming", "extension"),
)
def q_streaming_session_windows(spark, sf_dir):
    """Native streaming session windows with watermark (append mode).

    EXACT oracle (upgraded from rows-only in round 2) by replaying Spark's
    append-mode semantics in SQL: (1) session split at inactivity >= gap
    (``session_window`` intervals are half-open ``[start, last+gap)``, so an
    event landing exactly at the previous end opens a NEW session — note the
    batch ``events_sessionize`` splits at > gap, the other defensible
    convention); (2) ``session_end = last event + gap``; (3) append mode
    emits only sessions the final watermark closed:
    ``session_end <= floor_ms(max event time) - delay`` (Spark tracks event
    time for watermarks at millisecond precision)."""
    return run_stream_to_memory(
        stream_session_windows(_events_stream(spark, sf_dir)), output_mode="append"
    )


@register(
    "streaming_user_running_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "extension", "udf"),
)
def q_streaming_running_totals(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user running
    (count, max) in explicit GroupState — single-batch replay makes the
    final emission equal the batch aggregate."""
    return run_stream_to_memory(
        stream_user_running_totals(_events_stream(spark, sf_dir)), output_mode="update"
    )


@register(
    "streaming_cusum_scores",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    g AS (SELECT user_id,
                 list_transform(
                   list_sort(list(struct_pack(
                     t := ts, e := event_id, v := CAST(value AS DOUBLE)))),
                   x -> x.v) AS vals
          FROM ev GROUP BY user_id),
    m AS (SELECT user_id, vals,
                 list_max(list_transform(generate_series(1, len(vals)),
                   i -> list_reduce(list_prepend(0.0, list_slice(vals, 1, i)),
                                    (a, b) -> greatest(a + b - 55.0, 0.0))))
                 AS cmax
          FROM g)
    SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
           CAST(list_reduce(list_prepend(0.0, vals),
                            (a, b) -> greatest(a + b - 55.0, 0.0))
                AS DOUBLE) AS cusum_final,
           CAST(cmax AS DOUBLE) AS cusum_max,
           CAST(cmax > 300.0 AS BOOLEAN) AS alert
    FROM m
    """,
    tags=("streaming", "sequence", "extension", "udf"),
)
def q_streaming_cusum_scores(spark, sf_dir):
    """Streaming latched CUSUM (streaming/events.stream_cusum_scores) —
    the UNBOUNDED-KEY path of the round-7 change-detection family:
    per-user state is three GroupState scalars (n, s, max), so infinite
    streams carry bytes, not history. Single-batch replay folds in the
    exact IEEE order of the batch engine, so the oracle is the same
    per-prefix-replay SQL as events_cusum_alerts_latched; the
    cross-batch state carry is pinned in tests/test_streaming.py."""
    from .streaming.events import stream_cusum_scores

    return run_stream_to_memory(
        stream_cusum_scores(_events_stream(spark, sf_dir)), output_mode="update"
    )


@register(
    "streaming_ewma_scores",
    # same SQL as events_ewma_scores' oracle (that entry registers later
    # in this module, so the text is inlined rather than referenced)
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    g AS (SELECT user_id,
                 list_transform(
                   list_sort(list(struct_pack(
                     t := ts, e := event_id, v := CAST(value AS DOUBLE)))),
                   x -> x.v) AS vals
          FROM ev GROUP BY user_id)
    SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
           CAST(list_reduce(vals, (a, b) -> a * 0.5 + b * 0.5) AS DOUBLE)
             AS ewma_score
    FROM g
    """,
    tags=("streaming", "sequence", "extension", "udf"),
)
def q_streaming_ewma_scores(spark, sf_dir):
    """Streaming EWMA (streaming/events.stream_ewma_scores): the
    recency-score sibling of streaming_cusum_scores — two GroupState
    scalars per user, exact IEEE replay of the batch recursion on
    ordered ingest, so single-batch replay shares events_ewma_scores'
    exact oracle."""
    from .streaming.events import stream_ewma_scores

    return run_stream_to_memory(
        stream_ewma_scores(_events_stream(spark, sf_dir)), output_mode="update"
    )


# --------------------------------------------------------------------------
# Batch 2: CSV source (S1), reference golden pipeline, write-path roundtrip,
# join-type completeness, more window/pivot shapes
# --------------------------------------------------------------------------

import os  # noqa: E402

from pyspark.sql.types import (  # noqa: E402
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .sources.csv import read_csv_with_schema  # noqa: E402

_FIXTURES = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
)
_CONTACTS_SCHEMA = StructType(
    [
        StructField("id", IntegerType(), True),
        StructField("name", StringType(), True),
        StructField("email", StringType(), True),
        StructField("state", StringType(), True),
    ]
)
_SQL_CONTACTS_COLS = "columns={'id':'INTEGER','name':'VARCHAR','email':'VARCHAR','state':'VARCHAR'}"
_SQL_READ_INITIAL = (
    f"SELECT * FROM read_csv('{_FIXTURES}/initial_contacts.csv', header=false, "
    f"{_SQL_CONTACTS_COLS})"
)
_SQL_READ_UPDATE = (
    f"SELECT * FROM read_csv('{_FIXTURES}/update_contacts.csv', header=false, "
    f"{_SQL_CONTACTS_COLS})"
)


@register("csv_scan_schema", oracle=_SQL_READ_INITIAL, tags=("S1",))
def q_csv_scan_schema(spark, sf_dir):
    """Schema-declared headerless CSV scan (S1): the reference's input path
    (hudi/hudi_scd_script.py:55-58), on a checked-in fixture mirroring
    data/initial_contacts.csv."""
    return read_csv_with_schema(
        spark, f"{_FIXTURES}/initial_contacts.csv", _CONTACTS_SCHEMA
    )


def _sql_contact_envelope(src: str, ts_lit: str) -> str:
    return f"""
    SELECT id, name, email, state,
           TIMESTAMP '{ts_lit}' AS ts, TIMESTAMP '{ts_lit}' AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to, CAST(1 AS INTEGER) AS iscurrent,
           md5(name || email || state) AS checksum
    FROM ({src})
    """


@register(
    "scd2_contacts_golden",
    oracle=f"""
    WITH tgt AS ({_sql_contact_envelope(_SQL_READ_INITIAL, T1)}),
         upd AS ({_sql_contact_envelope(_SQL_READ_UPDATE, T2)})
    SELECT t.id, t.name, t.email, t.state, u.ts AS ts, t.valid_from AS valid_from,
           u.valid_from AS valid_to, CAST(0 AS INTEGER) AS iscurrent,
           t.checksum AS checksum
    FROM tgt t JOIN upd u
      ON t.id = u.id AND t.checksum <> u.checksum AND t.iscurrent = 1
    UNION ALL
    SELECT * FROM upd
    """,
    tags=("scd2", "S1", "S7", "golden"),
)
def q_scd2_contacts_golden(spark, sf_dir):
    """The reference pipeline end-to-end on reference-shaped CSV fixtures:
    CSV scan -> SCD2 envelope (checksum over name/email/state, exactly
    hudi/hudi_scd_script.py:63) -> incremental hudi-style merge. Satisfies
    the §2.11 golden invariant: 1192 rows = 1100 current + 92 expired with
    valid_to = the update batch's valid_from."""
    initial = read_csv_with_schema(
        spark, f"{_FIXTURES}/initial_contacts.csv", _CONTACTS_SCHEMA
    )
    update = read_csv_with_schema(
        spark, f"{_FIXTURES}/update_contacts.csv", _CONTACTS_SCHEMA
    )
    target = with_scd2_columns(initial, ["name", "email", "state"], as_of=T1)
    return scd2_merge_hudi_style(target, update, "id", ["name", "email", "state"], as_of=T2)


@register(
    "versioned_table_upsert",
    oracle=f"""
    WITH tgt AS ({_SQL_TGT9}), upd AS ({_SQL_UPD9}),
    unioned AS (SELECT * FROM tgt UNION ALL SELECT * FROM upd)
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           ts, valid_from, valid_to, iscurrent, checksum
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey, checksum
                                       ORDER BY ts DESC) AS rn
          FROM unioned) t
    WHERE rn = 1
    """,
    tags=("S2", "S6", "S7", "sink"),
)
def q_versioned_table_upsert(spark, sf_dir):
    """Write path end-to-end: bulk overwrite (S6) into a snapshot-versioned
    parquet table, keyed upsert commit (S7), snapshot scan back (S2) — the
    lake-format write/read cycle on plain parquet."""
    import tempfile

    from .sources.tables import VersionedTable

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_q_"))
    vt.overwrite(scd2_target(spark, sf_dir))
    vt.upsert(
        with_scd2_columns(customer_updates(spark, sf_dir), CHECKSUM_COLS, as_of=T2),
        ["c_custkey", "checksum"],
        "ts",
    )
    return vt.read()


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    tags=("join",),
)
def q_join_left_outer(spark, sf_dir):
    """Left outer join + count (engine completeness: the reference has no
    outer joins — SURVEY.md §2.3 note)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    tags=("join",),
)
def q_join_left_semi(spark, sf_dir):
    """Left semi join (EXISTS) — the matched-branch primitive our merge
    decomposition uses (SURVEY.md J4 fallback)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def q_join_left_anti(spark, sf_dir):
    """Left anti join (NOT EXISTS) — the not-matched-branch primitive of the
    merge decomposition."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "running_total_window",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
    FROM orders
    """,
    tags=("window",),
)
def q_running_total_window(spark, sf_dir):
    """Running total per key (rows frame, unique tie-break) — decimal
    accumulation keeps every prefix exact across engines."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@register(
    "pivot_status_by_year",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS O,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS F,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS P
    FROM orders GROUP BY 1
    """,
    tags=("agg",),
)
def q_pivot_status_by_year(spark, sf_dir):
    """Pivot aggregate (groupBy().pivot() with explicit value list — avoids
    the extra distinct-values job at scale)."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("int")
    )
    return (
        o.groupBy("order_year")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double"))
    )


# --------------------------------------------------------------------------
# Batch 3: scalar-function breadth (strings, datetime, JSON, arrays),
# quantiles, conditional aggregates, skew-handling scale operators
# --------------------------------------------------------------------------

from .operators.scale import salted_join, two_phase_agg  # noqa: E402


@register(
    "string_functions",
    oracle="""
    SELECT c_custkey,
      upper(c_name) AS name_upper,
      lower(c_mktsegment) AS seg_lower,
      substr(c_name, 1, 8) AS name_prefix,
      replace(c_name, '#', '-') AS name_clean,
      lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
      concat_ws('|', c_name, c_mktsegment) AS name_seg,
      CAST(length(c_name) AS INTEGER) AS name_len,
      CAST(c_name LIKE '%0%' AS INTEGER) AS has_zero
    FROM customer
    """,
    tags=("functions",),
)
def q_string_functions(spark, sf_dir):
    """Scalar string-function surface (F-series breadth): upper/lower/
    substr/replace/lpad/concat_ws/length/like — all codegen built-ins."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_clean"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("name_seg"),
        F.length("c_name").cast("int").alias("name_len"),
        F.col("c_name").like("%0%").cast("int").alias("has_zero"),
    )


@register(
    "datetime_functions",
    oracle="""
    SELECT o_orderkey,
      CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
      CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month,
      CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS order_day,
      CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS order_quarter,
      CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS order_dow,
      date_trunc('month', o_orderdate) AS month_start,
      o_orderdate + INTERVAL 30 DAY AS due_date,
      CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER)
        AS days_since_epoch_start
    FROM orders
    """,
    tags=("functions",),
)
def q_datetime_functions(spark, sf_dir):
    """Datetime-function surface: extract fields, truncation, interval
    arithmetic, day difference. (DuckDB dayofweek is 0=Sunday while Spark
    dayofweek is 1=Sunday — the oracle aligns explicitly.)"""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.dayofweek("o_orderdate").cast("int").alias("order_dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.expr("o_orderdate + INTERVAL 30 DAY").alias("due_date"),
        F.expr(
            "timestampdiff(DAY, TIMESTAMP_NTZ '1995-01-01 00:00:00', o_orderdate)"
        ).cast("int").alias("days_since_epoch_start"),
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
    tags=("functions", "extension"),
)
def q_json_extract(spark, sf_dir):
    """JSON field extraction from the events props column
    (get_json_object — the semi-structured column surface)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


@register(
    "collect_sorted_arrays",
    oracle="""
    SELECT o_custkey, list_sort(list(o_orderkey)) AS order_keys,
           CAST(len(list(o_orderkey)) AS INTEGER) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
    tags=("agg", "functions"),
)
def q_collect_sorted_arrays(spark, sf_dir):
    """Array aggregation: collect_list + sort_array (sorted so the result
    is deterministic under any partitioning — bare collect_list is not)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.sort_array(F.collect_list("o_orderkey")).alias("order_keys"),
        F.count("o_orderkey").cast("int").alias("n_orders"),
    )


@register(
    "explode_array",
    oracle="""
    WITH arrs AS (
      SELECT o_custkey, list_sort(list(o_orderkey)) AS order_keys
      FROM orders GROUP BY o_custkey)
    SELECT o_custkey, unnest(order_keys) AS o_orderkey FROM arrs
    """,
    tags=("functions",),
)
def q_explode_array(spark, sf_dir):
    """explode / unnest round trip of the collected arrays (lateral view
    shape)."""
    o = _t(spark, sf_dir, "orders")
    arrs = o.groupBy("o_custkey").agg(
        F.sort_array(F.collect_list("o_orderkey")).alias("order_keys")
    )
    return arrs.select("o_custkey", F.explode("order_keys").alias("o_orderkey"))


@register(
    "conditional_agg",
    oracle="""
    SELECT o_custkey,
      COUNT(*) AS n_orders,
      COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
      CAST(SUM(CASE WHEN o_totalprice > 200000
                    THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
        AS big_order_total
    FROM orders GROUP BY o_custkey
    """,
    tags=("agg",),
)
def q_conditional_agg(spark, sf_dir):
    """Conditional aggregation (count_if / filtered sum) — one pass instead
    of self-joins."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.sum(
            F.when(
                F.col("o_totalprice") > 200000,
                F.col("o_totalprice").cast("decimal(18,4)"),
            )
        ).cast("double").alias("big_order_total"),
    )


@register(
    "exact_quantiles",
    oracle="""
    SELECT l_returnflag,
      quantile_cont(l_quantity, 0.5) AS median_qty,
      quantile_cont(l_quantity, 0.9) AS p90_qty,
      MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def q_exact_quantiles(spark, sf_dir):
    """Exact quantiles per group (median/p90, linear interpolation — the
    same definition in Spark percentile and DuckDB quantile_cont). At
    100 TB swap for approx_percentile and accept the epsilon."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "salted_join",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    tags=("scale", "join"),
)
def q_salted_join(spark, sf_dir):
    """Skew-handling salted join: build side replicated per salt bucket,
    probe side scattered — result exactly equals the plain join (the oracle
    IS the plain join)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    return salted_join(o, c, "o_custkey", salt_buckets=8).select(
        "o_orderkey", "o_custkey", "c_name"
    )


@register(
    "two_phase_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events, MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
    tags=("scale", "agg"),
)
def q_two_phase_agg(spark, sf_dir):
    """Skew-handling two-phase aggregate on a low-cardinality hot key
    (event_type: 5 values across everything) — partial agg on (key, salt)
    spreads each hot key over 16 reducers; exact for algebraic aggregates."""
    ev = _t(spark, sf_dir, "events")
    return two_phase_agg(
        ev.select("event_type", "value"),
        "event_type",
        {"n_events": ("sum", F.count("*")), "max_value": ("max", F.max("value"))},
    )


# --------------------------------------------------------------------------
# Batch 4: more TPC-H-shaped join/agg benchmarks + partitioned-write pruning
# --------------------------------------------------------------------------

@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
        AS revenue,
      n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    """,
    tags=("join", "agg", "bench"),
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: who returned goods last quarter — selective fact
    filter, 4-way join, customer-grain aggregate."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(F.expr("l_extendedprice * (1 - l_discount)"), 6).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@register(
    "q14_promo_effect",
    oracle="""
    SELECT
      100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) END)
               AS DOUBLE)
            / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
               AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
    tags=("join", "agg", "bench"),
)
def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share — broadcast dimension join +
    conditional aggregate in one pass."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part")
    disc = F.expr("l_extendedprice * (1 - l_discount)")
    promo = F.when(F.col("p_type").like("PROMO%"), disc.cast("decimal(18,6)"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc.cast("decimal(18,6)")).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150)
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
    tags=("join", "agg", "bench"),
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: large-volume orders — aggregate-derived semi-join
    filter (HAVING subquery) then order-grain totals. The HAVING aggregate
    already holds the per-order quantity sum, so it is joined back directly
    instead of re-joining + re-aggregating raw lineitem: one lineitem
    shuffle instead of two — the dominant cost at 100 TB (the naive
    IN-subquery plan scans/shuffles the fact table twice)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey", F.col("q").cast("double").alias("total_qty"))
    )
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
    )


@register(
    "partitioned_write_prune",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) = 1997
    """,
    tags=("sink", "scale"),
)
def q_partitioned_write_prune(spark, sf_dir):
    """Hive-style partitioned write + partition-pruned read: orders written
    partitionBy(order_year), read back with a partition filter — the scan
    touches one directory (PartitionFilters in .explain), the 100 TB layout
    discipline the reference never set up (SURVEY.md §4: unpartitioned)."""
    import tempfile

    out = tempfile.mkdtemp(prefix="part_orders_")
    o = _t(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("int")
    )
    o.select("o_orderkey", "o_totalprice", "order_year").write.mode(
        "overwrite"
    ).partitionBy("order_year").parquet(out)
    return spark.read.parquet(out).filter(F.col("order_year") == 1997).select(
        "o_orderkey", "o_totalprice", "order_year"
    )


# --------------------------------------------------------------------------
# Batch 5: streaming SCD2 ingestion + time travel in the gate
# --------------------------------------------------------------------------

@register(
    "streaming_scd2_ingest",
    oracle=_SQL_MERGE_HUDI,
    tags=("streaming", "scd2", "extension"),
)
def q_streaming_scd2_ingest(spark, sf_dir):
    """Streaming SCD2 ingestion: the update batch replayed through a file
    stream, merged into the versioned table via foreachBatch — final table
    state must equal the batch merge exactly (same oracle)."""
    from .sources.tables import VersionedTable
    from .streaming.scd2_stream import stream_scd2_into

    stage = tempfile.mkdtemp(prefix="scd2_ingest_")
    upd = customer_updates(spark, sf_dir)
    upd.coalesce(1).write.mode("overwrite").parquet(stage)

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_ingest_"))
    vt.overwrite(scd2_target(spark, sf_dir))
    stream = spark.readStream.schema(upd.schema).parquet(stage)
    q = stream_scd2_into(
        vt,
        stream,
        "c_custkey",
        CHECKSUM_COLS,
        tempfile.mkdtemp(prefix="ckpt_ingest_"),
        as_of_fn=lambda bid: T2,
    )
    q.awaitTermination()
    return vt.read()


@register(
    "time_travel_snapshot",
    oracle=_SQL_TGT9,
    tags=("S2", "extension"),
)
def q_time_travel_snapshot(spark, sf_dir):
    """Snapshot time travel: after an incremental merge commit, reading
    version 0 still returns the exact initial load (the Hudi-timeline /
    Iceberg-snapshot / Delta-version capability on plain parquet)."""
    from .sources.tables import VersionedTable

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_tt_"))
    vt.overwrite(scd2_target(spark, sf_dir))
    vt.overwrite(
        scd2_merge_hudi_style(
            vt.read(), customer_updates(spark, sf_dir), "c_custkey", CHECKSUM_COLS, as_of=T2
        )
    )
    return vt.read(version=0)


@register(
    "table_changes_cdc",
    oracle=f"""
    WITH t AS ({_SQL_TGT9}), m AS ({_SQL_MERGE_HUDI})
    SELECT *, 'insert' AS _change_type FROM (SELECT * FROM m EXCEPT ALL SELECT * FROM t)
    UNION ALL
    SELECT *, 'delete' AS _change_type FROM (SELECT * FROM t EXCEPT ALL SELECT * FROM m)
    """,
    tags=("S2", "extension", "cdc"),
)
def q_table_changes_cdc(spark, sf_dir):
    """Incremental/CDC read between snapshots (Hudi incremental view /
    Delta CDF analog): after a merge commit, ``changes(v0, v1)`` yields the
    inserted and deleted row images."""
    from .sources.tables import VersionedTable

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_cdc_"))
    vt.overwrite(scd2_target(spark, sf_dir))
    vt.overwrite(
        scd2_merge_hudi_style(
            vt.read(), customer_updates(spark, sf_dir), "c_custkey", CHECKSUM_COLS, as_of=T2
        )
    )
    return vt.changes(0, 1)


# --------------------------------------------------------------------------
# Batch 6: temporal joins (as-of, range) — custom operators composed from
# built-ins (operators/temporal.py)
# --------------------------------------------------------------------------

from .operators.temporal import asof_join, range_join_binned  # noqa: E402


@register(
    "asof_join_events",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    purchases AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'purchase')
    SELECT e.event_id, e.user_id, e.ts,
           p.ts AS ts_asof, p.value AS value_asof
    FROM ev e ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    tags=("temporal", "extension"),
)
def q_asof_join_events(spark, sf_dir):
    """Backward as-of join: every event picks up the user's most recent
    purchase (ts + value) at or before it. Union-and-window implementation:
    one shuffle on user_id, no range explosion — oracle is DuckDB's native
    ASOF JOIN."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["value"],
    ).select("event_id", "user_id", "ts", "ts_asof", "value_asof")


@register(
    "range_join_events",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    iv AS (SELECT event_id AS interval_id, ts AS start_ts,
                  ts + INTERVAL 2 HOUR AS end_ts
           FROM ev WHERE event_type = 'purchase')
    SELECT e.event_id, i.interval_id
    FROM ev e JOIN iv i ON e.ts >= i.start_ts AND e.ts < i.end_ts
    """,
    tags=("temporal", "extension"),
)
def q_range_join_events(spark, sf_dir):
    """Range (interval-containment) join: events falling inside the 2-hour
    window after each purchase. Binned equi-join + residual filter — a hash
    join instead of the nested-loop Spark would otherwise plan."""
    ev = _t(spark, sf_dir, "events")
    iv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("start_ts"),
        F.expr("ts + INTERVAL 2 HOUR").alias("end_ts"),
    )
    return range_join_binned(
        ev.select("event_id", "ts"), iv, "ts", "start_ts", "end_ts"
    ).select("event_id", "interval_id")


# --------------------------------------------------------------------------
# Batch 7: global sort/limit (§2.6), canonical near-dup dedup, approx stats
# --------------------------------------------------------------------------

@register(
    "global_topk_sort",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    tags=("sort",),
)
def q_global_topk_sort(spark, sf_dir):
    """Global ORDER BY + LIMIT (§2.6 — absent from the reference): Catalyst
    plans TakeOrderedAndProject (per-partition top-k + driver merge), never
    a full global sort."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "dedup_near_keep_canonical",
    oracle=_SQL_LSH_BANDS + """,
    shd AS (SELECT doc_id, list_distinct(s) AS sh FROM shng),
    scored AS (
      SELECT c.id_a, c.id_b,
             len(list_intersect(a.sh, b.sh)) /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      FROM cand c
      JOIN shd a ON a.doc_id = c.id_a
      JOIN shd b ON b.doc_id = c.id_b),
    dropped AS (SELECT DISTINCT id_b FROM scored WHERE jaccard >= 0.5)
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT id_b FROM dropped)
    """,
    tags=("dedup", "extension"),
)
def q_dedup_near_keep_canonical(spark, sf_dir):
    """The full near-dup dedup pipeline end-to-end: MinHash -> LSH ->
    Jaccard verify -> drop the higher id of every surviving pair (lowest id
    canonical). The surviving document set is what a training-data pipeline
    actually ships."""
    from .operators.dedup import dedup_keep_canonical

    docs = _t(spark, sf_dir, "documents")
    cands = lsh_candidate_pairs(minhash_signatures(docs))
    pairs = ngram_jaccard_pairs(docs, cands, threshold=0.5)
    return dedup_keep_canonical(pairs, docs.select("doc_id"), "doc_id")


@register("approx_stats", oracle=None, tags=("agg", "scale", "extension"))
def q_approx_stats(spark, sf_dir):
    """The 100 TB-realistic approximate variants of the exact aggregates:
    HLL distinct counts + approximate percentiles (rows-only check — sketch
    results are engine-specific by design; exact twins are distinct_agg and
    exact_quantiles)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey").alias("approx_suppliers"),
        F.percentile_approx("l_quantity", 0.5).alias("approx_median_qty"),
    )


@register(
    "partitioned_upsert",
    oracle=f"""
    WITH tgt AS ({_SQL_TGT9}), upd AS ({_SQL_UPD9}),
    unioned AS (SELECT * FROM tgt UNION ALL SELECT * FROM upd)
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           ts, valid_from, valid_to, iscurrent, checksum
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey, checksum
                                       ORDER BY ts DESC) AS rn
          FROM unioned) t
    WHERE rn = 1
    """,
    tags=("S7", "scale", "sink"),
)
def q_partitioned_upsert(spark, sf_dir):
    """Partition-scoped CoW upsert (sources/partitioned.py): the update
    batch rewrites only the hive partitions it touches — the scan/write
    cost that makes 100 TB SCD2 feasible. Final state must equal the
    full-table upsert exactly (same oracle as upsert_by_key; keys never
    move partitions here)."""
    from .sources.partitioned import PartitionedTable

    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_q_"), partition_col="c_nationkey"
    )
    pt.overwrite(scd2_target(spark, sf_dir))
    pt.upsert(
        with_scd2_columns(customer_updates(spark, sf_dir), CHECKSUM_COLS, as_of=T2),
        ["c_custkey", "checksum"],
        "ts",
    )
    return pt.read().select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        "ts", "valid_from", "valid_to", "iscurrent", "checksum",
    )


# --------------------------------------------------------------------------
# Batch 8: adapted TPC-H depth — EXISTS aggregates, nation-pair volumes,
# market share, distributions, scalar-subquery filters, disjunctive
# predicates, anti-join analytics (schema-adapted: no partsupp/shipmode)
# --------------------------------------------------------------------------

@register(
    "q4_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("join", "agg"),
)
def q4_priority_check(spark, sf_dir):
    """TPC-H Q4 shape: orders with any late-shipped line (EXISTS ->
    left-semi join on a correlated date predicate), counted by priority."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 90 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q7_nation_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
      CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS ship_year,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
        AS volume
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
        OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
    GROUP BY cn.n_name, sn.n_name, 3
    """,
    tags=("join", "agg"),
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations per year
    — double nation join with a disjunctive pair filter."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .filter(
            (
                (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
            )
            | (
                (F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1")
            )
        )
    )
    return joined.groupBy(
        "cust_nation", "supp_nation", F.year("l_shipdate").cast("int").alias("ship_year")
    ).agg(_dsum(F.expr("l_extendedprice * (1 - l_discount)"), 6).alias("volume"))


@register(
    "q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
        CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS v,
        sn.n_name AS supp_nation
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA')
    SELECT order_year,
      CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN v END) AS DOUBLE)
        / CAST(SUM(v) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY order_year
    """,
    tags=("join", "agg"),
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one supplier nation's share of a region's customer
    volume per year — conditional share-of-total in a single aggregate."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    v = F.expr("l_extendedprice * (1 - l_discount)").cast("decimal(18,6)")
    vol = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            v.alias("v"),
            "supp_nation",
        )
    )
    return vol.groupBy("order_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("v"))).cast("double")
            / F.sum("v").cast("double")
        ).alias("mkt_share")
    )


@register(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
    tags=("join", "agg"),
)
def q13_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: customer-order-count histogram — outer join with a
    join-side filter, then a second aggregate over the first."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q17_small_quantity",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
      AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN (SELECT l_partkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*) AS avg_qty
          FROM lineitem GROUP BY l_partkey) a
      ON l.l_partkey = a.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < 0.5 * a.avg_qty
    """,
    tags=("join", "agg"),
)
def q17_small_quantity(spark, sf_dir):
    """TPC-H Q17 shape: below-half-average-quantity revenue — correlated
    per-group scalar (avg per part) expressed as an aggregate join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_q = li.groupBy("l_partkey").agg(
        (_dsum("l_quantity") / F.count("*")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_q, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg((_dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q19_disjunctive",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
      AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    tags=("join", "agg"),
)
def q19_disjunctive(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-conjunctions across both join sides — the
    predicate shape that stresses filter pushdown through a join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(_dsum(F.expr("l_extendedprice * (1 - l_discount)"), 6).alias("revenue"))
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c_nationkey, COUNT(*) AS numcust,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    tags=("join", "agg"),
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: rich customers who never ordered — global scalar
    subquery (broadcast 1-row cross join) + anti join + aggregate."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (_dsum("c_acctbal") / F.count("*")).alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            _dsum("c_acctbal").alias("totacctbal"),
        )
    )


def _l2_sql(a: str, b: str, dim: int = 64) -> str:
    """Explicit left-associated sum of squared differences — replays
    Spark's ``aggregate(zip_with(e, ce, (x,y)->(x-y)*(x-y)), 0.0, +)``
    sequential fold bit-for-bit in DuckDB (SQL ``+`` is left-assoc, the
    0.0 seed is exact for non-negative terms), without leaning on
    ``list_dot_product``'s fold order for the distance."""
    terms = [
        f"(({a}[{i}]-{b}[{i}])*({a}[{i}]-{b}[{i}]))" for i in range(1, dim + 1)
    ]
    return "(" + " + ".join(terms) + ")"


# IVF at refine_iters=0 is fully deterministic: seed centroids are the
# first n_centroids vectors by id and assignment is argmin sequential-fold
# L2 (ties broken by cell id) — so the whole pipeline, not just the final
# rescore, replays exactly in DuckDB.
_SQL_IVF_TOPK = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    cents AS (SELECT vec_id AS cell, v AS cv FROM e ORDER BY vec_id LIMIT 16),
    asg AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_l2_sql('e.v', 'c.cv')}, c.cell) AS rn
        FROM e CROSS JOIN cents c) t
      WHERE rn = 1),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT q.vec_id AS query_id, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_l2_sql('q.v', 'c.cv')}, c.cell) AS rn
        FROM e q CROSS JOIN cents c WHERE q.vec_id < 10) t
      WHERE rn <= 4),
    cand AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN asg a ON a.cell = p.cell
      WHERE p.query_id <> a.vec_id)
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT cand.query_id, cand.neighbor_id,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY cand.query_id
               ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
                        cand.neighbor_id) AS INTEGER) AS rank
      FROM cand
      JOIN n q ON q.vec_id = cand.query_id
      JOIN n c ON c.vec_id = cand.neighbor_id) t
    WHERE rank <= 5
    """


@register(
    "embedding_ann_ivf_topk", oracle=_SQL_IVF_TOPK, tags=("similarity", "extension")
)
def q_embedding_ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-k (coarse quantizer + nprobe cells + exact
    rescore) — the inverted-file ANN pattern beside the LSH one. EXACT
    oracle at refine_iters=0: centroids are the first 16 vectors by id,
    assignment/probing replay as argmin over an explicit left-assoc
    squared-difference sum (_l2_sql), rescore via list_dot_product —
    the same cross-engine fold convention as the LSH oracles."""
    from .operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


# semantic dedup replays exactly like the IVF oracle: same seed-centroid
# assignment CTE, same sequential-fold cosine; the corpus seeds exact
# duplicates (every 5th vector re-ingested under id+100000) so the drop
# rule visibly fires alongside natural near-neighbors above the threshold.
_SQL_SEMANTIC_DEDUP = f"""
    WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    e AS (SELECT * FROM e0
          UNION ALL
          SELECT vec_id + 100000, v FROM e0 WHERE vec_id % 5 = 0),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    cents AS (SELECT vec_id AS cell, v AS cv FROM e ORDER BY vec_id LIMIT 16),
    asg AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_l2_sql('e.v', 'c.cv')}, c.cell) AS rn
        FROM e CROSS JOIN cents c) t
      WHERE rn = 1),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM asg a JOIN asg b ON b.cell = a.cell AND a.vec_id < b.vec_id
      JOIN n na ON na.vec_id = a.vec_id
      JOIN n nb ON nb.vec_id = b.vec_id
      WHERE list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) > 0.35)
    SELECT a.vec_id, a.cell, d.vec_id IS NULL AS is_kept
    FROM asg a LEFT JOIN dropped d ON d.vec_id = a.vec_id
    """


@register(
    "semantic_dedup",
    oracle=_SQL_SEMANTIC_DEDUP,
    tags=("dedup", "similarity", "extension", "corpus"),
)
def q_semantic_dedup(spark, sf_dir):
    """Embedding-space semantic dedup (SemDeDup, Abbas et al. 2023 —
    operators/dedup.semantic_dedup): IVF-cluster the corpus, drop every
    vector with a lower-id within-cell neighbor above the cosine
    threshold — near-duplicate MEANINGS no lexical dedup sees. The
    corpus seeds exact duplicates (every 5th vector re-ingested under
    id+100000) so the keep-lowest-id rule observably fires; EXACT oracle
    via the same deterministic-seed assignment + sequential-fold cosine
    as the IVF/LSH oracles."""
    from .operators.dedup import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    dup = emb.filter(F.col("vec_id") % 5 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    return semantic_dedup(
        emb.unionByName(dup), n_centroids=16, threshold=0.35
    )


@register(
    "events_funnel",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    s1 AS (SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
           FROM ev GROUP BY user_id),
    s2 AS (SELECT e.user_id, s1.t_view,
                  MIN(CASE WHEN e.event_type = 'click' AND e.ts > s1.t_view
                           THEN e.ts END) AS t_click
           FROM ev e JOIN s1 ON e.user_id = s1.user_id
           GROUP BY e.user_id, s1.t_view),
    s3 AS (SELECT e.user_id, s2.t_view, s2.t_click,
                  MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > s2.t_click
                           THEN e.ts END) AS t_purchase
           FROM ev e JOIN s2 ON e.user_id = s2.user_id
           GROUP BY e.user_id, s2.t_view, s2.t_click)
    SELECT COUNT(t_view) AS n_viewed,
           COUNT(t_click) AS n_clicked_after_view,
           COUNT(t_purchase) AS n_purchased_after_click
    FROM s3
    """,
    tags=("events", "agg", "extension"),
)
def q_events_funnel(spark, sf_dir):
    """Ordered funnel (view -> click -> purchase): per-user first-event
    chaining via conditional MIN aggregates — three grouped passes sharing
    one user_id partitioning."""
    ev = _t(spark, sf_dir, "events")
    s1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    s2 = (
        ev.join(s1, "user_id")
        .groupBy("user_id", "t_view")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).alias("t_click")
        )
    )
    s3 = (
        ev.join(s2, "user_id")
        .groupBy("user_id", "t_view", "t_click")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).alias("t_purchase")
        )
    )
    return s3.agg(
        F.count("t_view").alias("n_viewed"),
        F.count("t_click").alias("n_clicked_after_view"),
        F.count("t_purchase").alias("n_purchased_after_click"),
    )


@register(
    "mor_realtime_view",
    oracle=f"""
    WITH tgt AS ({_SQL_TGT9}), upd AS ({_SQL_UPD9}),
    unioned AS (SELECT * FROM tgt UNION ALL SELECT * FROM upd)
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           ts, valid_from, valid_to, iscurrent, checksum
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey, checksum
                                       ORDER BY ts DESC) AS rn
          FROM unioned) t
    WHERE rn = 1
    """,
    tags=("S2", "S7", "mor", "extension"),
)
def q_mor_realtime_view(spark, sf_dir):
    """Hudi MERGE_ON_READ emulation in the gate: bootstrap base, append the
    update batch as a log (no base rewrite), read the real-time view —
    precombine merge at read time must equal the CoW upsert exactly
    (hudi_scd_script.py:33 MoR table type; README.md:157-160 _rt query)."""
    from .sources.mor import MorTable

    mor = MorTable(
        spark, tempfile.mkdtemp(prefix="mor_q_"), ["c_custkey", "checksum"], "ts"
    )
    mor.bootstrap(scd2_target(spark, sf_dir))
    mor.append_log(
        with_scd2_columns(customer_updates(spark, sf_dir), CHECKSUM_COLS, as_of=T2)
    )
    return mor.read_realtime().select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        "ts", "valid_from", "valid_to", "iscurrent", "checksum",
    )


# --------------------------------------------------------------------------
# Batch 9: cube/grouping sets, null-safe join, window-function breadth,
# exact moment statistics
# --------------------------------------------------------------------------

@register(
    "cube_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def q_cube_agg(spark, sf_dir):
    """CUBE aggregate (all grouping-set combinations)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
    )


@register(
    "grouping_sets_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg",),
)
def q_grouping_sets_agg(spark, sf_dir):
    """Explicit GROUPING SETS (subset of cube, via SQL — the DataFrame API
    gains groupingSets in 4.x but SQL is the portable surface)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "null_safe_join",
    oracle="""
    WITH a AS (SELECT event_id, CASE WHEN event_id % 3 = 0 THEN NULL
                                     ELSE event_id % 7 END AS k FROM events),
         b AS (SELECT CASE WHEN event_id % 5 = 0 THEN NULL
                           ELSE event_id % 7 END AS k,
                      COUNT(*) AS n FROM events GROUP BY 1)
    SELECT a.event_id, a.k, b.n
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    tags=("join",),
)
def q_null_safe_join(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other — the opposite of the J4 never-match semantics, both
    of which a complete merge engine needs."""
    ev = _t(spark, sf_dir, "events")
    k_a = F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(
        F.col("event_id") % 7
    )
    k_b = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
        F.col("event_id") % 7
    )
    a = ev.select("event_id", k_a.alias("k"))
    b = ev.select(k_b.alias("k")).groupBy("k").agg(F.count("*").alias("n"))
    return a.join(b, a.k.eqNullSafe(b.k)).select(a.event_id, a.k, b.n)


@register(
    "window_function_breadth",
    oracle="""
    SELECT o_orderkey, o_custkey,
      FIRST_VALUE(o_orderkey) OVER w AS first_key,
      LAST_VALUE(o_orderkey) OVER w AS last_key_so_far,
      NTH_VALUE(o_orderkey, 2) OVER w AS second_key,
      LAG(o_orderkey, 1) OVER w AS prev_key,
      CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
      CAST(RANK() OVER w AS BIGINT) AS rnk,
      CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def q_window_function_breadth(spark, sf_dir):
    """first/last/nth value, lag, ntile, rank, dense_rank over an explicit
    ROWS frame with a unique tie-break ordering (the frame and tie-break
    are what make every one of these deterministic)."""
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    framed = base.rowsBetween(Window.unboundedPreceding, 0)
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(framed).alias("first_key"),
        F.last("o_orderkey").over(framed).alias("last_key_so_far"),
        F.nth_value("o_orderkey", 2).over(framed).alias("second_key"),
        F.lag("o_orderkey", 1).over(base).alias("prev_key"),
        F.ntile(4).over(base).cast("int").alias("quartile"),
        F.rank().over(base).alias("rnk"),
        F.dense_rank().over(base).alias("drnk"),
    )


@register(
    "exact_moment_stats",
    oracle="""
    SELECT l_returnflag,
      COUNT(*) AS n,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s1,
      CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,8)))
                AS DECIMAL(28,2)) AS DOUBLE) AS s2,
      (CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,8)))
            AS DECIMAL(28,2)) AS DOUBLE)
       - CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
         * CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*))
      / (COUNT(*) - 1) AS variance_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def q_exact_moment_stats(spark, sf_dir):
    """Order-independent variance: exact decimal moments (sum, sum of
    squares) combined in one deterministic double expression — built-in
    stddev/var use merge formulas whose float error depends on partitioning,
    so they can never be bit-reproducible across engines; this is."""
    li = _t(spark, sf_dir, "lineitem")
    s1 = F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
    # narrow the sum to scale 2 (exact — quantities are integral, so the
    # squares carry no decimals) before the double cast: keeps the scaled
    # mantissa under 2^53, where DuckDB's decimal->double double-rounding
    # can otherwise land 1 ulp off Spark's correctly-rounded cast
    s2 = (
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(28,8)"))
        .cast("decimal(28,2)")
        .cast("double")
    )
    n = F.count("*")
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        s1.alias("s1"),
        s2.alias("s2"),
        ((s2 - s1 * s1 / n) / (n - F.lit(1))).alias("variance_qty"),
    )


@register(
    "scd2_soft_delete",
    oracle=f"""
    WITH tgt AS ({_SQL_TGT9}),
    dk AS (SELECT DISTINCT c_custkey FROM customer WHERE c_custkey % 19 = 0)
    SELECT t.c_custkey, t.c_name, t.c_nationkey, t.c_acctbal, t.c_mktsegment,
           t.ts,
           t.valid_from,
           CASE WHEN t.iscurrent = 1 AND dk.c_custkey IS NOT NULL
                THEN TIMESTAMP '{T2}' ELSE t.valid_to END AS valid_to,
           CAST(CASE WHEN t.iscurrent = 1 AND dk.c_custkey IS NOT NULL
                     THEN 0 ELSE t.iscurrent END AS INTEGER) AS iscurrent,
           t.checksum
    FROM tgt t LEFT JOIN dk ON t.c_custkey = dk.c_custkey
    """,
    tags=("scd2", "extension"),
)
def q_scd2_soft_delete(spark, sf_dir):
    """SCD2 soft delete: expire current versions of a key set without
    successors — the WHEN MATCHED DELETE capability the reference's merges
    lack, history-preserving."""
    from .operators.merge import scd2_apply_deletes

    target = scd2_target(spark, sf_dir)
    dk = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 19 == 0)
    return scd2_apply_deletes(target, dk, "c_custkey", as_of=T2)


# --------------------------------------------------------------------------
# Batch 10: the remaining TPC-H shapes (q2/q9/q11/q12/q15/q16/q20/q21),
# schema-adapted — lineitem stands in for partsupp as the part<->supplier
# relation (no partsupp table), l_linestatus for l_shipmode, and
# shipdate-vs-orderdate lag for the missing commit/receipt dates.
# With batch 8 this completes all 22 TPC-H query shapes.
# --------------------------------------------------------------------------

@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH rs AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'),
    cost AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem JOIN rs ON l_suppkey = rs.s_suppkey
      GROUP BY l_partkey, l_suppkey),
    best AS (SELECT l_partkey, MIN(unit_cost) AS min_cost FROM cost GROUP BY 1)
    SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
           cost.unit_cost AS supply_cost
    FROM part
    JOIN cost ON p_partkey = cost.l_partkey
    JOIN best ON cost.l_partkey = best.l_partkey
             AND cost.unit_cost = best.min_cost
    JOIN rs ON cost.l_suppkey = rs.s_suppkey
    WHERE p_size = 5 AND p_type = 'STANDARD'
    """,
    tags=("join", "agg"),
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: cheapest regional supplier per part — correlated
    MIN subquery (min unit cost per part over one region's suppliers)
    joined back on equality. lineitem plays partsupp; unit cost =
    min(extendedprice/quantity) per (part, supplier). MIN over doubles is
    order-independent, so the equality join is engine-exact."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rs = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = _t(spark, sf_dir, "lineitem")
    cost = (
        li.join(F.broadcast(rs.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = cost.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 5) & (F.col("p_type") == "STANDARD")
    )
    # cost and best share hash-partitioning on l_partkey from their
    # groupBys — the join reuses it (no new exchange, and best is never
    # broadcast: it has one row per part, dimension-scale only in TPC-H,
    # fact-scale in a 100 TB catalog)
    return (
        cost.join(best, ["l_partkey"])
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(rs), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey", "p_name", "s_name", "n_name", "s_acctbal",
            F.col("unit_cost").alias("supply_cost"),
        )
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation,
      CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    - 0.6 * p_retailprice * l_quantity
               AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    """,
    tags=("join", "agg"),
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation and order year for one
    product line — 5-way join with an arithmetic profit expression
    (supply cost proxied by 0.6 * p_retailprice, no partsupp table).
    Dimension sides broadcast; the lineitem<->orders join is the only
    large shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    amount = F.expr(
        "l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity"
    )
    # part/supplier are NOT force-broadcast: at TPC-H ratios part is
    # lineitem/30 — fact-scale at 100 TB. AQE broadcasts them when runtime
    # sizes actually allow (they do at test SFs); nation is always tiny.
    joined = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("int").alias("o_year"),
    ).agg(_dsum(amount, 6).alias("sum_profit"))


@register(
    "q11_important_stock",
    oracle="""
    WITH nat AS (
      SELECT l_partkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_1'
      GROUP BY l_partkey)
    SELECT l_partkey, value FROM nat
    WHERE value > (SELECT SUM(value) * 0.001 FROM nat)
    """,
    tags=("join", "agg"),
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: parts whose one-nation inventory value exceeds a
    fraction of the nation's total — grouped aggregate reused both as the
    output and (re-aggregated) as a broadcast scalar threshold. DECIMAL
    per-part sums make both the values and the total engine-exact; only
    the final fraction multiply is float, identically on both sides."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    nat = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(_dsum("l_extendedprice").alias("value"))
    )
    total = nat.agg((F.sum("value") * F.lit(0.001)).alias("threshold"))
    return (
        nat.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
    )


@register(
    "q12_shipping_delay",
    oracle="""
    SELECT l_linestatus,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
      AND l_shipdate <  o_orderdate + INTERVAL 120 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    tags=("join", "agg"),
)
def q12_shipping_delay(spark, sf_dir):
    """TPC-H Q12 shape: late-shipment priority split — join with a
    cross-table date-lag predicate and two conditional counts.
    l_linestatus stands in for the missing l_shipmode; shipdate-vs-
    orderdate lag for the missing commit/receipt dates."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.expr("o_orderdate + INTERVAL 30 DAY"))
            & (F.col("l_shipdate") < F.expr("o_orderdate + INTERVAL 120 DAY"))
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
             AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("join", "agg"),
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the quarter's top-revenue supplier — a grouped
    revenue view consumed twice: once re-aggregated to a broadcast scalar
    MAX, once equality-filtered against it. DECIMAL revenue sums make the
    MAX-equality engine-exact."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(F.expr("l_extendedprice * (1 - l_discount)"), 6).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "agg"),
)
def q16_supplier_count(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per part attribute combo,
    excluding a supplier denylist — NOT IN over non-null keys is a
    left-anti join (negative s_acctbal plays the 'customer complaints'
    exclusion). lineitem plays partsupp."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    # the denylist (a handful of suppliers) is force-broadcast; the part
    # side is size-filtered but still ~13% of part — AQE decides
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q20_potential_promotion",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 50.0)
    """,
    tags=("join", "agg"),
)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape: one nation's suppliers who moved enough of a
    promoted part line — nested aggregate-HAVING subquery consumed through
    a left-semi join (the IN). DECIMAL quantity sums make the HAVING
    threshold engine-exact."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    qualified = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(_dsum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50.0)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualified.hint("broadcast"), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "q21_late_shippers",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders ON l1.l_orderkey = o_orderkey
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_1'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
    tags=("join", "agg"),
)
def q21_late_shippers(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the sole late shipper on a
    multi-supplier finished order — EXISTS (left-semi self-join) plus
    NOT EXISTS (left-anti against a precomputed late-lines set), both on
    the order key with a supplier-inequality residual. Late = shipped
    more than 60 days after order date (no commit/receipt dates in this
    schema)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY"))
        .select("l_orderkey", "l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    l1 = (
        li.join(o.filter(F.col("o_orderstatus") == "F"), li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("k2")
    )
    l3 = late.select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("k3"))
    return (
        l1.join(
            l2, (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.k2), "left_semi"
        )
        .join(l3, (l1.l_orderkey == l3.o3) & (l1.l_suppkey != l3.k3), "left_anti")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "streaming_stream_join",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    c AS (SELECT user_id, ts AS click_ts, event_id AS click_id
          FROM ev WHERE event_type = 'click'),
    p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id,
                 value AS purchase_value
          FROM ev WHERE event_type = 'purchase')
    SELECT c.user_id, c.click_ts, p.purchase_ts, c.click_id, p.purchase_id,
           p.purchase_value
    FROM c JOIN p ON c.user_id = p.user_id
                 AND p.purchase_ts >= c.click_ts
                 AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
    """,
    tags=("streaming", "join", "extension"),
)
def q_streaming_stream_join(spark, sf_dir):
    """Stream-stream interval join (click -> purchase attribution within
    1 h, watermarked on both sides for bounded state) — replayed via
    AvailableNow, exact-matches the batch interval join."""
    from .streaming.events import stream_stream_join

    ev = _events_stream(spark, sf_dir)
    out = stream_stream_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    return run_stream_to_memory(out, output_mode="append")


# --------------------------------------------------------------------------
# Batch 11: deterministic sampling / splitting / chunking / packing — the
# reproducible-dataset-construction layer of a training-data pipeline.
# Sampling decisions are md5-hash-derived (operators/sampling.py), so the
# same row lands in the same split on any cluster layout AND in DuckDB —
# every query here has an exact oracle despite being "random" sampling.
# --------------------------------------------------------------------------

# the hash-bucket expression shared by the sampling oracles
_SQL_BUCKET = (
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    " % 10000"
)


@register(
    "deterministic_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE {_SQL_BUCKET} < 500
    """,
    tags=("sampling", "extension"),
)
def q_deterministic_sample(spark, sf_dir):
    """Reproducible 5% sample by content-hash bucket — unlike df.sample(),
    the decision is a pure function of the key: stable across runs,
    repartitioning, and engines (zero shuffle, scan-speed at 100 TB)."""
    from .operators.sampling import deterministic_sample

    docs = _t(spark, sf_dir, "documents")
    return deterministic_sample(docs, "doc_id", 0.05).select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "train_test_split",
    oracle=f"""
    SELECT CASE WHEN {_SQL_BUCKET} < 8000 THEN 'train'
                WHEN {_SQL_BUCKET} < 9000 THEN 'valid'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY split
    """,
    tags=("sampling", "agg", "extension"),
)
def q_train_test_split(spark, sf_dir):
    """Leakage-safe 80/10/10 train/valid/test split by key hash range —
    the same doc_id always lands in the same split, even across dataset
    versions; summarized per split."""
    from .operators.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    split = hash_split(docs, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1})
    return split.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "stratified_sample",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_sampled FROM documents
    WHERE {_SQL_BUCKET} < CASE lang WHEN 'en' THEN 2000
                                    WHEN 'de' THEN 5000
                                    ELSE 10000 END
    GROUP BY lang
    """,
    tags=("sampling", "agg", "extension"),
)
def q_stratified_sample(spark, sf_dir):
    """Language-rebalancing stratified sample: keep 20% of English, 50% of
    German, 100% of everything else — per-stratum hash thresholds, counted
    per language."""
    from .operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return (
        stratified_sample(docs, "doc_id", "lang", {"en": 0.2, "de": 0.5},
                          default_rate=1.0)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )


@register(
    "doc_chunking",
    oracle="""
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
           substr(text, 1 + CAST(i AS INTEGER) * 150, 200) AS chunk
    FROM documents,
         UNNEST(generate_series(0,
                CAST(floor((greatest(length(text), 1) - 1) / 150) AS INTEGER)))
           AS t(i)
    """,
    tags=("text", "extension"),
)
def q_doc_chunking(spark, sf_dir):
    """Overlapping character chunking (200-char window, 150-char stride) —
    the context-window split before embedding; sequence+posexplode, pure
    codegen, one output row per chunk."""
    from .operators.text import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_size=200, stride=150).select(
        "doc_id", "chunk_id", "chunk"
    )


@register(
    "token_packing",
    oracle="""
    WITH cum AS (
      SELECT source, doc_id, n_chars,
             COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM documents)
    SELECT source, CAST(FLOOR(before / 4000) AS BIGINT) AS bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS bin_chars
    FROM cum GROUP BY source, bin
    """,
    tags=("text", "agg", "window", "extension"),
)
def q_token_packing(spark, sf_dir):
    """Sequence packing: assign docs to ~4000-char sequential bins per
    source (exclusive prefix-sum / capacity) — the batching step that fills
    training context windows; one shuffle on the partition key."""
    from .operators.text import pack_documents

    docs = _t(spark, sf_dir, "documents")
    packed = pack_documents(docs, "n_chars", 4000, "source", "doc_id")
    return packed.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("bin_chars"),
    )


# --------------------------------------------------------------------------
# Batch 12: source-format breadth (sources/formats.py) — ORC and JSON-lines
# round-trips. The reference's only file source is headerless CSV (S1);
# these prove the other in-box formats preserve values end-to-end through
# a write+schema-declared-read+aggregate pipeline.
# --------------------------------------------------------------------------

@register(
    "orc_roundtrip",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
      CAST(MIN(o_orderdate) AS TIMESTAMP) AS first_order
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("source", "extension"),
)
def q_orc_roundtrip(spark, sf_dir):
    """ORC write -> schema-declared read -> aggregate: values (including
    NTZ timestamps) survive the other columnar format bit-exactly; same
    pushdown/pruning path as parquet."""
    from .sources.formats import read_orc, write_orc

    o = _t(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="orc_q_")
    write_orc(o, path)
    back = read_orc(spark, path, o.schema)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        _dsum("o_totalprice").alias("total"),
        F.min("o_orderdate").alias("first_order"),
    )


@register(
    "json_lines_roundtrip",
    oracle="""
    SELECT lang, COUNT(*) AS n,
      CAST(SUM(n_chars) AS BIGINT) AS chars,
      md5(string_agg(text, '' ORDER BY doc_id)) AS content_md5
    FROM documents GROUP BY lang
    """,
    tags=("source", "extension"),
)
def q_json_lines_roundtrip(spark, sf_dir):
    """JSON-lines write -> schema-declared read -> per-language content
    digest: unicode text survives JSON escaping exactly (md5 over the
    doc_id-ordered concatenation proves byte fidelity, not just counts)."""
    from .sources.formats import read_json_lines, write_json_lines

    docs = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="jsonl_q_")
    write_json_lines(docs, path)
    back = read_json_lines(spark, path, docs.schema)
    ordered_concat = F.concat_ws(
        "",
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
            lambda s: s.text,
        ),
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").cast("bigint").alias("chars"),
        F.md5(ordered_concat).alias("content_md5"),
    )


# --------------------------------------------------------------------------
# Batch 13: set-operation and reshape completeness — INTERSECT / EXCEPT
# (the §2.7 family beyond UNION) and UNPIVOT (wide->long reshape).
# --------------------------------------------------------------------------

@register(
    "intersect_except_customers",
    oracle="""
    SELECT 'both_years' AS cohort, o_custkey FROM (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      INTERSECT
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    UNION ALL
    SELECT 'only_1996' AS cohort, o_custkey FROM (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      EXCEPT
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    """,
    tags=("setop",),
)
def q_intersect_except_customers(spark, sf_dir):
    """INTERSECT / EXCEPT (distinct set semantics — Catalyst plans both as
    aggregated semi/anti joins): customers active in both 1996 and 1997 vs
    only-1996, tagged and unioned."""
    o = _t(spark, sf_dir, "orders")

    def active(year: int):
        return o.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01 00:00:00").cast("timestamp_ntz"))
        ).select("o_custkey")

    both = active(1996).intersect(active(1997)).select(
        F.lit("both_years").alias("cohort"), "o_custkey"
    )
    only96 = active(1996).subtract(active(1997)).select(
        F.lit("only_1996").alias("cohort"), "o_custkey"
    )
    return both.unionByName(only96)


@register(
    "unpivot_measures",
    oracle="""
    SELECT l_returnflag, 'sum_qty' AS measure,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS value
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 'sum_base_price' AS measure,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS value
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 'sum_tax' AS measure,
      CAST(SUM(CAST(l_tax AS DECIMAL(18,4))) AS DOUBLE) AS value
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "setop"),
)
def q_unpivot_measures(spark, sf_dir):
    """UNPIVOT (melt): one grouped pass computes three measures wide, then
    unpivot reshapes to (group, measure, value) long form — one scan +
    one shuffle vs the oracle's three (the reshape is why)."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        _dsum("l_quantity").alias("sum_qty"),
        _dsum("l_extendedprice").alias("sum_base_price"),
        _dsum("l_tax").alias("sum_tax"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_base_price", "sum_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "streaming_dedup_within_watermark",
    oracle="SELECT event_id, user_id, event_type FROM events",
    tags=("streaming", "dedup", "extension"),
)
def q_streaming_dedup_within_watermark(spark, sf_dir):
    """Bounded-state streaming dedup: the stream is unioned with itself
    (every event duplicated — the at-least-once-delivery case), then
    dropDuplicatesWithinWatermark collapses the duplicates while evicting
    state past the watermark; exact-matches each event appearing once."""
    from .streaming.events import stream_dedup_within_watermark

    ev = _events_stream(spark, sf_dir)
    duplicated = ev.union(ev)
    return run_stream_to_memory(
        stream_dedup_within_watermark(duplicated), output_mode="append"
    )


_SQL_CC = _SQL_LSH_BANDS.replace("WITH toks", "WITH RECURSIVE toks", 1) + """,
    shd AS (SELECT doc_id, list_distinct(s) AS sh FROM shng),
    scored AS (
      SELECT c.id_a, c.id_b,
             len(list_intersect(a.sh, b.sh)) /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      FROM cand c
      JOIN shd a ON a.doc_id = c.id_a
      JOIN shd b ON b.doc_id = c.id_b),
    und AS (SELECT id_a AS a, id_b AS b FROM scored WHERE jaccard >= 0.5
            UNION SELECT id_b, id_a FROM scored WHERE jaccard >= 0.5),
    reach(id, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT u.b, r.label FROM reach r JOIN und u ON u.a = r.id
      WHERE r.label < u.b)
    SELECT id AS doc_id, MIN(label) AS component FROM reach GROUP BY id
"""


@register(
    "dedup_connected_components",
    oracle=_SQL_CC,
    tags=("dedup", "extension"),
)
def q_dedup_connected_components(spark, sf_dir):
    """Exact transitive near-dup clustering: MinHash -> LSH -> Jaccard
    pairs, then connected components by iterative min-label propagation
    (one shuffle per round, rounds = cluster diameter). component = the
    cluster's min doc_id; oracle is a recursive CTE over the same pairs —
    the one iterative algorithm in the registry with an exact oracle."""
    from .operators.dedup import connected_components

    docs = _t(spark, sf_dir, "documents")
    cands = lsh_candidate_pairs(minhash_signatures(docs))
    pairs = ngram_jaccard_pairs(docs, cands, threshold=0.5)
    return connected_components(pairs, docs.select("doc_id"), "doc_id")


@register(
    "grouped_regression_slope",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    pts AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS x,
             CAST(floor(value * 100) AS BIGINT) AS y
      FROM ev),
    sums AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM pts GROUP BY user_id)
    SELECT user_id, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
    FROM sums WHERE n >= 2 AND n * sxx - sx * sx != 0
    """,
    tags=("udf", "agg", "extension"),
)
def q_grouped_regression_slope(spark, sf_dir):
    """Custom grouped-map UDAF via batch applyInPandas (the guide's
    fallback path for operators Spark lacks): per-user OLS slope of value
    cents over event time. All moments accumulate as arbitrary-precision
    Python ints (order-independent, overflow-free), mirrored by HUGEINT
    sums in the oracle — so even this Python-side operator is engine-exact.
    One shuffle on the group key; Arrow-batched, never row-at-a-time."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("x"),
        F.floor(F.col("value") * 100).cast("long").alias("y"),
    )

    def slope(pdf: "pd.DataFrame") -> "pd.DataFrame":
        xs = [int(v) for v in pdf["x"]]
        ys = [int(v) for v in pdf["y"]]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        den = n * sxx - sx * sx
        if n < 2 or den == 0:
            return pd.DataFrame(columns=["user_id", "n", "slope"])
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n": [n],
                "slope": [float(n * sxy - sx * sy) / float(den)],
            }
        )

    return pts.groupBy("user_id").applyInPandas(
        slope, schema="user_id bigint, n bigint, slope double"
    )


@register(
    "training_pipeline_end_to_end",
    oracle=r"""
    WITH q AS (
      SELECT doc_id, lang, text FROM documents
      WHERE len(string_split_regex(trim(text), '\s+')) >= 5
        AND length(text) >= 20
        AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT)
            / CAST(length(text) AS BIGINT) < 0.3),
    s AS (
      SELECT * FROM q
      WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) % 10000
            < CASE lang WHEN 'en' THEN 5000 ELSE 10000 END),
    d AS (
      SELECT * FROM s WHERE doc_id IN
        (SELECT MIN(doc_id) FROM s GROUP BY md5(text))),
    ch AS (
      SELECT doc_id, lang, CAST(i AS INTEGER) AS chunk_id,
             CAST(length(substr(text, 1 + CAST(i AS INTEGER) * 200, 200))
                  AS INTEGER) AS chunk_chars
      FROM d,
           UNNEST(generate_series(0,
             CAST(floor((greatest(length(text), 1) - 1) / 200) AS INTEGER)))
             AS t(i)),
    p AS (
      SELECT lang, chunk_chars,
             COALESCE(SUM(chunk_chars) OVER (
               PARTITION BY lang ORDER BY doc_id * 1000 + chunk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM ch)
    SELECT lang, CAST(FLOOR(before / 2000) AS BIGINT) AS bin,
           COUNT(*) AS n_chunks,
           CAST(SUM(chunk_chars) AS BIGINT) AS bin_chars
    FROM p GROUP BY lang, bin
    """,
    tags=("text", "sampling", "dedup", "extension"),
)
def q_training_pipeline_end_to_end(spark, sf_dir):
    """The capstone composition: quality filter -> language-stratified
    sample -> exact dedup -> chunk -> pack, in ONE lazy DAG with ONE exact
    oracle. Catalyst fuses the per-row stages (filter/sample/chunk) into
    the scan; the only shuffles are the dedup groupBy and the pack window
    — the whole training-data preprocessing pipeline is two exchanges."""
    from .operators.dedup import exact_dedup
    from .operators.sampling import stratified_sample
    from .operators.text import chunk_documents, pack_documents, with_text_stats

    docs = _t(spark, sf_dir, "documents")
    quality = with_text_stats(docs).filter(F.col("quality_ok") == 1).select(
        "doc_id", "lang", "text"
    )
    sampled = stratified_sample(quality, "doc_id", "lang", {"en": 0.5},
                                default_rate=1.0)
    # keep-set cardinality ~= unique docs: never broadcast — the semi join
    # shuffles on doc_id (AQE may still broadcast at small SFs)
    keep = exact_dedup(sampled, ["text"], "doc_id").select("keep_id")
    deduped = sampled.join(keep, sampled.doc_id == keep.keep_id, "left_semi")
    chunks = chunk_documents(deduped, chunk_size=200, stride=200).select(
        "doc_id", "lang", "chunk_id", F.length("chunk").alias("chunk_chars"),
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("ord"),
    )
    packed = pack_documents(chunks, "chunk_chars", 2000, "lang", "ord")
    return packed.groupBy("lang", "bin").agg(
        F.count("*").alias("n_chunks"),
        F.sum("chunk_chars").cast("bigint").alias("bin_chars"),
    )


@register(
    "label_centroids",
    oracle="""
    SELECT label, CAST(i AS INTEGER) AS pos,
           CAST(SUM(CAST(CAST(embedding[CAST(i AS INTEGER) + 1] AS DOUBLE)
                         AS DECIMAL(18,8))) AS DOUBLE)
             / COUNT(*) AS c
    FROM embeddings, UNNEST(generate_series(0, 63)) AS t(i)
    GROUP BY label, pos
    """,
    tags=("similarity", "agg", "extension"),
)
def q_label_centroids(spark, sf_dir):
    """Per-label embedding centroids position-wise (posexplode + grouped
    decimal mean) — the scalable vector-aggregation pattern: no
    collect_list of whole vectors, state per group is one scalar per
    dimension; one shuffle on (label, pos). Feeds IVF seeding and
    class-prototype similarity."""
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    return ex.groupBy("label", "pos").agg(
        (_dsum(F.col("v").cast("double"), 8) / F.count("*")).alias("c")
    )


@register(
    "table_delete_where",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE NOT COALESCE(c_acctbal < 0, FALSE)
    """,
    tags=("sink", "dml", "extension"),
)
def q_table_delete_where(spark, sf_dir):
    """Delta DELETE analog: CoW rewrite dropping matching rows as a new
    snapshot (time travel keeps the old one). SQL NULL semantics: only
    predicate-TRUE rows are deleted."""
    from .sources.tables import VersionedTable

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_del_"))
    vt.overwrite(_t(spark, sf_dir, "customer"))
    vt.delete_where(F.col("c_acctbal") < 0)
    return vt.read()


@register(
    "table_update_where",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
                ELSE c_acctbal END AS c_acctbal,
           CASE WHEN c_custkey % 10 = 0 THEN 'PROMOTED'
                ELSE c_mktsegment END AS c_mktsegment
    FROM customer
    """,
    tags=("sink", "dml", "extension"),
)
def q_table_update_where(spark, sf_dir):
    """Delta UPDATE analog: conditional multi-column rewrite (CASE WHEN
    per assignment), full CoW snapshot commit; non-matching rows pass
    through byte-identical."""
    from .sources.tables import VersionedTable

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_upd_"))
    vt.overwrite(_t(spark, sf_dir, "customer"))
    vt.update_where(
        F.col("c_custkey") % 10 == 0,
        {"c_acctbal": F.col("c_acctbal") + 100.0, "c_mktsegment": F.lit("PROMOTED")},
    )
    return vt.read()


@register(
    "merge_full_sync",
    oracle="""
    WITH src AS (SELECT * FROM customer WHERE c_custkey % 3 <> 0)
    SELECT c.c_custkey, c.c_name, c.c_nationkey,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
                ELSE c.c_acctbal END AS c_acctbal,
           CASE WHEN s.c_custkey IS NOT NULL THEN c.c_mktsegment
                WHEN c.c_acctbal >= 5000 THEN 'DORMANT'
                ELSE NULL END AS c_mktsegment
    FROM customer c LEFT JOIN src s ON c.c_custkey = s.c_custkey
    WHERE s.c_custkey IS NOT NULL
       OR c.c_acctbal >= 5000
    """,
    tags=("S10", "S11", "join", "dml", "extension"),
)
def q_merge_full_sync(spark, sf_dir):
    """Full-snapshot-sync MERGE (the Delta 2.3+ WHEN NOT MATCHED BY SOURCE
    surface the reference's merges predate): matched rows refresh from the
    source, disappeared high-value rows are marked DORMANT, the remaining
    disappeared rows are deleted — one merge, three fates."""
    c = _t(spark, sf_dir, "customer")
    src = c.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").alias("s_key"), F.col("c_acctbal").alias("s_bal")
    )
    return (
        MergeIntoBuilder(c, src, on=F.col("t.c_custkey") == F.col("s.s_key"))
        .when_matched_update(set={"c_acctbal": F.col("s.s_bal")})
        .when_not_matched_by_source_update(
            condition=F.col("c_acctbal") >= 5000,
            set={"c_mktsegment": F.lit("DORMANT")},
        )
        .when_not_matched_by_source_delete()
        .execute()
    )


@register(
    "string_distance_and_redaction",
    oracle=r"""
    SELECT doc_id,
           levenshtein(substr(text, 1, 20), 'the quick brown fox') AS edit_dist,
           regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                            '<EMAIL>', 'g'),
             '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b', '<PHONE>', 'g') AS redacted
    FROM (SELECT doc_id, text FROM documents)
    """,
    tags=("text", "functions", "extension"),
)
def q_string_distance_and_redaction(spark, sf_dir):
    """Edit distance (fuzzy matching primitive) + PII redaction (email and
    phone regexp_replace — the scrubbing pass every training pipeline runs
    before shipping text). Both built-in JVM expressions, zero shuffle;
    patterns chosen to parse identically in Java and RE2 regex dialects."""
    docs = _t(spark, sf_dir, "documents")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"
    return docs.select(
        "doc_id",
        F.levenshtein(
            F.substring("text", 1, 20), F.lit("the quick brown fox")
        ).alias("edit_dist"),
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email, "<EMAIL>"), phone, "<PHONE>"
        ).alias("redacted"),
    )


# --------------------------------------------------------------------------
# Batch 12 (round 2): corpus-level text analysis — TF-IDF keywords,
# repetition quality filter, benchmark decontamination (operators/text.py)
# --------------------------------------------------------------------------

_SQL_TOKS = r"""
    toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
    shng AS (
      SELECT doc_id,
             list_transform(range(1, len(t) - 1),
                            i -> array_to_string(t[i:i+2], ' ')) AS s
      FROM toks WHERE len(t) >= 3)
"""


@register(
    "tfidf_top_terms",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf
           FROM toks WHERE term <> '' GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.term, t.tf, d.df,
             CAST(t.tf AS DOUBLE) * ((n.n_docs + 1.0) / (d.df + 1.0)) AS tfidf
      FROM tf t JOIN dfreq d USING (term) CROSS JOIN n),
    r AS (SELECT *, CAST(row_number() OVER (
              PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS INT)
              AS term_rank
          FROM scored)
    SELECT doc_id, term, tf, df, tfidf, term_rank FROM r WHERE term_rank <= 1
    """,
    tags=("text", "extension", "corpus"),
)
def q_tfidf_top_terms(spark, sf_dir):
    """Per-document top TF-IDF term (corpus keyword extraction). IDF is the
    smoothed RATIO (N+1)/(df+1), not its log — same ranking (log is
    monotonic) but bit-identical cross-engine (+,*,/ are IEEE-exact;
    libm log is not). tf shuffle has map-side combine; the vocabulary
    (df) and corpus count broadcast back; top-1 is one doc_id window."""
    from .operators.text import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=1)


@register(
    "repetition_stats",
    oracle="WITH " + _SQL_TOKS + """
    SELECT doc_id, len(s) AS n_shingles, len(list_distinct(s)) AS n_distinct,
           1.0 - CAST(len(list_distinct(s)) AS DOUBLE) / len(s) AS dup_ratio
    FROM shng
    """,
    tags=("text", "extension", "corpus"),
)
def q_repetition_stats(spark, sf_dir):
    """Within-document duplicate-3-gram ratio (Gopher/C4 repetition quality
    filter): boilerplate and looping text score high. Zero shuffle —
    per-row shingle + array_distinct at scan speed."""
    from .operators.text import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


@register(
    "contamination_ngram_overlap",
    oracle="WITH " + _SQL_TOKS + """,
    docsh AS (SELECT doc_id, unnest(list_distinct(s)) AS sh FROM shng),
    bench AS (SELECT DISTINCT sh FROM docsh WHERE doc_id % 97 = 0),
    train AS (SELECT * FROM docsh WHERE doc_id % 97 <> 0)
    SELECT t.doc_id, count(*) AS n_shingles,
           CAST(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           CAST(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS contamination
    FROM train t LEFT JOIN bench b USING (sh)
    GROUP BY t.doc_id
    """,
    tags=("text", "extension", "corpus"),
)
def q_contamination_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination: per training document, the fraction of its
    distinct 3-gram shingles appearing anywhere in the benchmark split
    (doc_id % 97 == 0 as the deterministic pseudo-benchmark). The deduped
    benchmark shingle set broadcasts; the corpus side is one scan + one
    doc_id aggregate — no corpus-vs-corpus join at any scale."""
    from .operators.text import contamination_overlap

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_overlap(train, bench)


@register(
    "repeated_span_removal",
    oracle=r"""
    WITH tk AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    ix AS (
      SELECT doc_id, toks,
             unnest(range(0, CAST(ceil(len(toks) / 4.0) AS BIGINT))) AS i
      FROM tk),
    sp AS (
      SELECT doc_id, i AS pos,
             array_to_string(toks[i * 4 + 1 : i * 4 + 4], ' ') AS span
      FROM ix),
    freq AS (
      SELECT span, count(DISTINCT doc_id) AS span_docs FROM sp GROUP BY span),
    kept AS (
      SELECT sp.doc_id, sp.pos, sp.span FROM sp JOIN freq USING (span)
      WHERE span_docs <= 2),
    reb AS (
      SELECT doc_id, string_agg(span, ' ' ORDER BY pos) AS cleaned_text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id),
    tot AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY doc_id)
    SELECT tot.doc_id, coalesce(cleaned_text, '') AS cleaned_text,
           CAST(n_spans AS BIGINT) AS n_spans,
           CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept
    FROM tot LEFT JOIN reb USING (doc_id)
    """,
    tags=("dedup", "extension", "corpus"),
)
def q_repeated_span_removal(spark, sf_dir):
    """Corpus-level repeated-span removal (Lee et al. 2022 exact-substring
    dedup, approximated by non-overlapping 4-token spans): spans occurring
    in more than 2 distinct documents are boilerplate and get cut; each
    document is reassembled from its surviving spans in original order.
    Two span-key shuffles (distinct doc-frequency) + one doc-id shuffle to
    reassemble — no broadcast of the corpus-sized frequency table, no skewed
    window over hot spans."""
    from .operators.text import remove_repeated_spans

    return remove_repeated_spans(_t(spark, sf_dir, "documents"))


@register(
    "boilerplate_span_scrub",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents),
    sh AS (
      SELECT doc_id, u.i AS p, array_to_string(t[u.i:u.i+2], ' ') AS s
      FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)),
    dfreq AS (
      SELECT s, count(*) AS df
      FROM (SELECT DISTINCT s, doc_id FROM sh) GROUP BY s),
    boiler AS (SELECT s FROM dfreq WHERE df >= 3),
    covered AS (
      SELECT DISTINCT sh.doc_id, c.p
      FROM sh JOIN boiler USING (s),
           UNNEST(generate_series(sh.p, sh.p + 2)) AS c(p)),
    pos AS (
      SELECT doc_id, u.p, t[u.p] AS tok
      FROM toks, UNNEST(generate_series(1, len(t))) AS u(p)),
    flagged AS (
      SELECT pos.doc_id, pos.p, pos.tok, covered.p IS NOT NULL AS rm
      FROM pos LEFT JOIN covered
        ON pos.doc_id = covered.doc_id AND pos.p = covered.p)
    SELECT doc_id,
           COALESCE(string_agg(tok, ' ' ORDER BY p) FILTER (WHERE NOT rm),
                    '') AS clean_text,
           CAST(count(*) FILTER (WHERE rm) AS BIGINT) AS n_removed
    FROM flagged GROUP BY doc_id
    """,
    tags=("dedup", "text", "extension", "corpus"),
)
def q_boilerplate_span_scrub(spark, sf_dir):
    """SLIDING-window boilerplate scrub (operators/dedup.
    boilerplate_span_scrub) — the alignment-insensitive complement of
    ``repeated_span_removal``: that operator cuts NON-OVERLAPPING
    4-token blocks (fast, but a shared phrase straddling a block
    boundary escapes); this one marks every position covered by ANY
    occurrence of a >=3-doc 3-gram, so boilerplate is caught at any
    offset — the CCNet/RefinedWeb line-dedup step re-expressed for
    token streams. Exact oracle: integer document frequencies, a
    position-set union, order-preserving reassembly."""
    from .operators.dedup import boilerplate_span_scrub

    return boilerplate_span_scrub(_t(spark, sf_dir, "documents"))


@register(
    "table_stats_pruned_read",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_custkey <= 150 AND o_orderkey <= 1500
    """,
    tags=("S2", "extension", "lake", "skipping"),
)
def q_table_stats_pruned_read(spark, sf_dir):
    """Data-skipping scan end-to-end (Delta stats / Iceberg manifest-metrics
    analog): Z-order-compact orders on (o_custkey, o_orderkey), collect
    per-file min/max into the snapshot metadata, then serve a conjunctive
    range predicate via ``read_pruned`` — files whose stats exclude the
    predicate are never opened, and the residual row-level filter makes the
    result EXACTLY the filtered table (the oracle is the plain WHERE)."""
    from .sources.tables import VersionedTable

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_skip_"))
    vt.overwrite(_t(spark, sf_dir, "orders").select(*cols).repartition(16))
    vt.compact(target_partitions=16, zorder_by=["o_custkey", "o_orderkey"])
    vt.compute_stats(["o_custkey", "o_orderkey"])
    return vt.read_pruned(
        [("o_custkey", "<=", 150), ("o_orderkey", "<=", 1500)]
    ).select(*cols)


@register(
    "table_dml_sql",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey <= 2000),
    upd AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderstatus = 'F'
                  THEN o_totalprice + CAST(5.0 AS DOUBLE)
                  ELSE o_totalprice END AS o_totalprice
      FROM base),
    del AS (SELECT * FROM upd WHERE NOT (o_orderkey % 10 = 0))
    SELECT * FROM del
    UNION ALL
    SELECT o_orderkey + 1000000 AS o_orderkey, o_orderstatus, o_totalprice
    FROM del WHERE o_orderkey <= 100
    """,
    tags=("S2", "extension", "lake", "dml"),
)
def q_table_dml_sql(spark, sf_dir):
    """SQL DML strings end-to-end on a VersionedTable (the Delta/Iceberg
    DML surface as literal statements): UPDATE ... SET ... WHERE, DELETE
    FROM ... WHERE, INSERT INTO ... SELECT — each parsed by
    operators/merge_sql.run_dml and committed through the table's own CoW
    path, so every statement is one time-travelable snapshot (4 versions
    after this sequence)."""
    from .operators.merge_sql import run_dml
    from .sources.tables import VersionedTable

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_dml_"))
    vt.overwrite(
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    run_dml(
        spark,
        "UPDATE t SET o_totalprice = o_totalprice + 5.0 WHERE o_orderstatus = 'F'",
        {"t": vt},
    )
    run_dml(spark, "DELETE FROM t WHERE o_orderkey % 10 = 0", {"t": vt})
    vt.read().filter("o_orderkey <= 100").createOrReplaceTempView("dml_tail_src")
    run_dml(
        spark,
        "INSERT INTO t SELECT o_orderkey + 1000000 AS o_orderkey, "
        "o_orderstatus, o_totalprice FROM dml_tail_src",
        {"t": vt},
    )
    return vt.read()


@register(
    "binary_file_scan",
    oracle="""
    SELECT concat('doc_', lpad(CAST(doc_id AS VARCHAR), 6, '0'), '.bin')
             AS file_name,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents WHERE doc_id < 200
    """,
    tags=("S1", "sources", "extension", "multimodal"),
)
def q_binary_file_scan(spark, sf_dir):
    """``binaryFile`` ingest — the entry point of the multimodal pipeline:
    scan a directory of opaque payload files into (path, length, content)
    rows, derive file name / byte size / content digest. The fixture stages
    the first 200 documents as .bin files (driver-side, metadata-sized test
    plumbing — production points the same reader at object storage);
    pathGlobFilter prunes non-matching files at listing time. One file =
    one task input, so the oracle-checked digest proves payload bytes
    survive the source unmodified — the property every downstream decode
    step (multimodal_decode_stub) relies on."""
    import os

    from .sources.formats import read_binary_files

    rows = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
        .collect()
    )
    d = tempfile.mkdtemp(prefix="binfiles_")
    for r in rows:
        with open(os.path.join(d, f"doc_{r['doc_id']:06d}.bin"), "wb") as f:
            f.write(r["text"].encode("utf-8"))
    bf = read_binary_files(spark, d, glob="*.bin")
    return bf.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


@register(
    "table_restore_vacuum",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderstatus = 'O'
                THEN o_totalprice + CAST(10.0 AS DOUBLE)
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey <= 3000
    """,
    tags=("S2", "extension", "lake", "lifecycle"),
)
def q_table_restore_vacuum(spark, sf_dir):
    """Rollback + retention lifecycle end-to-end (Delta RESTORE + VACUUM /
    Hudi cleaner analog): load, legitimate UPDATE, then a bad DELETE that is
    rolled back by ``restore`` — a roll-forward re-commit of the good
    version, so history is never rewritten and concurrent readers of the
    bad snapshot stay consistent — then ``vacuum(keep_last=2)`` reclaims
    every pre-rollback snapshot's files. The final read must serve exactly
    the post-UPDATE state (the oracle), proving vacuum never touches the
    live snapshot's files."""
    from .sources.tables import VersionedTable

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_life_"))
    vt.overwrite(
        _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000).select(*cols)
    )
    vt.update_where(
        F.col("o_orderstatus") == "O",
        {"o_totalprice": F.col("o_totalprice") + F.lit(10.0)},
    )
    good = vt.history()[-1]["version"]
    vt.delete_where(F.col("o_orderkey") % 7 == 0)  # the bad write
    vt.restore(good)  # roll-forward rollback
    vt.vacuum(keep_last=2)  # reclaim everything before the rollback
    return vt.read().select(*cols)


@register(
    "table_replace_where",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey <= 3000 AND o_orderstatus <> 'O'
    UNION ALL
    SELECT o_orderkey, o_orderstatus,
           CAST(0.0 AS DOUBLE) AS o_totalprice
    FROM orders WHERE o_orderkey <= 3000 AND o_orderstatus = 'O'
    """,
    tags=("S2", "extension", "lake", "lifecycle"),
)
def q_table_replace_where(spark, sf_dir):
    """Selective overwrite lifecycle (Delta ``INSERT INTO ... REPLACE
    WHERE`` / ``replaceWhere`` — sources/tables.replace_where): one
    atomic commit swaps exactly the predicate slice (open orders,
    re-derived with zeroed totals) while every other row is untouched —
    the partition-backfill primitive. The oracle is keep-side UNION
    replacement-side; the commit also validates that no incoming row
    falls outside the declared slice."""
    from .sources.tables import VersionedTable

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 3000)
        .select(*cols)
    )
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_rw_"))
    vt.overwrite(base)
    vt.replace_where(
        "o_orderstatus = 'O'",
        base.filter(F.col("o_orderstatus") == "O").withColumn(
            "o_totalprice", F.lit(0.0)
        ),
    )
    return vt.read().select(*cols)


@register(
    "schema_evolution_append",
    oracle="""
    SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal
    FROM customer WHERE c_custkey <= 500
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal
    FROM customer WHERE c_custkey > 500 AND c_custkey <= 1000
    UNION ALL
    SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name, c_acctbal
    FROM customer WHERE c_custkey > 1000 AND c_custkey <= 1200
    """,
    tags=("S2", "extension", "lake", "lifecycle"),
)
def q_schema_evolution_append(spark, sf_dir):
    """Schema evolution on write (Delta ``mergeSchema`` / Iceberg schema
    update analog): the table starts with 2 columns, a later append carries
    a NEW column (``c_acctbal`` — existing rows backfill NULL), and a third
    append OMITS an existing column (``c_name`` — incoming rows fill NULL).
    Default behavior without ``merge_schema=True`` stays strict Delta-style
    enforcement (mismatch raises — pytest-covered). Evolution is a pure
    by-name union at commit time, so at 100 TB it adds no shuffle and no
    rewrite beyond the append's own CoW snapshot; prior snapshots keep their
    original schema for time travel."""
    from .sources.tables import VersionedTable

    cust = _t(spark, sf_dir, "customer")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_evo_"))
    vt.overwrite(
        cust.filter(F.col("c_custkey") <= 500).select("c_custkey", "c_name")
    )
    vt.append(
        cust.filter((F.col("c_custkey") > 500) & (F.col("c_custkey") <= 1000))
        .select("c_custkey", "c_name", "c_acctbal"),
        merge_schema=True,
    )
    vt.append(
        cust.filter((F.col("c_custkey") > 1000) & (F.col("c_custkey") <= 1200))
        .select("c_custkey", "c_acctbal"),
        merge_schema=True,
    )
    return vt.read()


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (
      SELECT vec_id, v,
             CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
                  THEN list_max(list_transform(v, x -> abs(x))) / 127.0
                  ELSE 1.0 END AS scale
      FROM e)
    SELECT vec_id, scale,
           list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT)) AS qvec,
           list_max(list_transform(
             v, x -> abs(x - floor(x / scale + 0.5) * scale))) AS max_abs_err
    FROM s
    """,
    tags=("similarity", "extension", "scale"),
)
def q_embedding_quantize_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization of the embedding table (the
    compression step of a scale ANN index): scale, quantized vector, max
    reconstruction error — floor(x+0.5) rounding so the ints are
    bit-identical cross-engine. Zero shuffle."""
    from .operators.similarity import quantize_embeddings

    return quantize_embeddings(_t(spark, sf_dir, "embeddings"))


@register(
    "events_resample_ffill",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    b AS (SELECT date_trunc('hour', MIN(ts)) AS t0, MAX(ts) AS t1 FROM ev),
    k AS (SELECT DISTINCT user_id FROM ev),
    grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 60 MINUTE)) AS ts
      FROM k, b),
    u AS (
      SELECT user_id, ts, value AS v, 0 AS is_grid, event_id FROM ev
      UNION ALL
      SELECT user_id, ts, NULL, 1, NULL FROM grid),
    f AS (
      SELECT user_id, ts, is_grid,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts, is_grid, event_id ASC NULLS FIRST
               ROWS UNBOUNDED PRECEDING) AS value_ffill
      FROM u)
    SELECT user_id, ts AS grid_ts, value_ffill FROM f WHERE is_grid = 1
    """,
    tags=("temporal", "events", "extension"),
)
def q_events_resample_ffill(spark, sf_dir):
    """Hourly resample + forward-fill of each user's event value (time-series
    feature grid): one row per user per hour carrying the newest value at or
    before the grid instant, NULL before the first event. Union-and-window —
    one shuffle on user_id, no range join."""
    from .operators.temporal import resample_ffill

    return resample_ffill(
        _t(spark, sf_dir, "events"),
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        order_col="event_id",
        step_minutes=60,
    )


@register(
    "mixture_sample",
    oracle=f"""
    WITH n AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    w AS (SELECT * FROM (VALUES
            ('src0', CAST(0.5 AS DOUBLE)),
            ('src1', CAST(0.3 AS DOUBLE)),
            ('src2', CAST(0.2 AS DOUBLE))) AS t(source, wt)),
    th AS (SELECT n.source,
                  CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE), (40 * wt) / n) * 10000)
                       AS INT) AS thr
           FROM n JOIN w USING (source))
    SELECT d.doc_id, d.source FROM documents d
    JOIN th ON d.source = th.source
    WHERE {_SQL_BUCKET} < th.thr
    """,
    tags=("sampling", "extension", "corpus"),
)
def q_mixture_sample(spark, sf_dir):
    """Domain mixing: downsample sources toward a 50/30/20 target mixture
    with a 40-row budget (sources outside the mixture drop to weight 0).
    Per-source keep rates derive from one k-row count aggregate; the
    sampling pass is the zero-shuffle deterministic hash filter, so the
    oracle reproduces the 'random' sample exactly."""
    from .operators.sampling import sample_to_mixture

    docs = _t(spark, sf_dir, "documents")
    return sample_to_mixture(
        docs, "doc_id", "source",
        weights={"src0": 0.5, "src1": 0.3, "src2": 0.2}, total_rows=40,
    ).select("doc_id", "source")


@register(
    "events_trailing_hour_window",
    oracle=f"""
    WITH ev AS ({_EV_SQL})
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing,
           MAX(value) OVER w AS max_trailing,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_trailing
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "events", "extension"),
)
def q_events_trailing_hour_window(spark, sf_dir):
    """Trailing-1h sliding aggregate per event (RANGE interval frame — the
    event-level feature window, distinct from bucketed tumbling/sliding
    windows): every event sees the count/max/decimal-exact sum of its
    user's events in the preceding hour. The frame is value-based
    (epoch microseconds), so results are independent of tie order; one
    shuffle on user_id."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "__us", F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("__us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", "ts",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.max("value").over(w).alias("max_trailing"),
        F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double").alias("sum_trailing"),
    )


@register(
    "higher_order_array_functions",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)
    SELECT doc_id,
           CAST(len(list_filter(t, x -> length(x) > 4)) AS INT) AS n_long_tokens,
           CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS total_token_chars,
           list_contains(t, 'the') AS has_the,
           list_sort(list_transform(t, x -> CAST(length(x) AS INT)))[1:3] AS shortest3_lens
    FROM toks
    """,
    tags=("functions", "text", "extension"),
)
def q_higher_order_array_functions(spark, sf_dir):
    """Higher-order array function surface (transform / filter / exists /
    aggregate + sort/slice) — all codegen'd JVM lambdas, zero shuffle,
    mirrored by DuckDB's list_* family for the exact oracle."""
    docs = _t(spark, sf_dir, "documents")
    t = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.size(F.filter(t, lambda x: F.length(x) > 4)).cast("int").alias("n_long_tokens"),
        F.aggregate(
            t, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("total_token_chars"),
        F.exists(t, lambda x: x == F.lit("the")).alias("has_the"),
        F.slice(
            F.sort_array(F.transform(t, lambda x: F.length(x).cast("int"))), 1, 3
        ).alias("shortest3_lens"),
    )


@register(
    "map_column_functions",
    oracle="""
    WITH per AS (
      SELECT c_mktsegment, CAST(c_nationkey AS VARCHAR) AS map_key,
             count(*) AS cnt
      FROM customer GROUP BY 1, 2),
    tot AS (
      SELECT c_mktsegment, CAST(SUM(cnt) AS BIGINT) AS total
      FROM per GROUP BY 1),
    big AS (
      SELECT c_mktsegment, map_key, CAST(cnt * 2 AS BIGINT) AS map_value
      FROM per WHERE cnt >= 10),
    nbig AS (SELECT c_mktsegment, count(*) AS n_big FROM big GROUP BY 1),
    un AS (
      SELECT * FROM big
      UNION ALL
      SELECT c_mktsegment, '__total', total FROM tot)
    SELECT un.c_mktsegment, map_key, map_value,
           CAST(coalesce(n_big, 0) + 1 AS INT) AS n_keys
    FROM un LEFT JOIN nbig USING (c_mktsegment)
    """,
    tags=("functions", "extension"),
)
def q_map_column_functions(spark, sf_dir):
    """Map-typed column surface: per market segment, build a nationkey ->
    customer-count map (map_from_entries over sorted collected entries),
    then map_filter (keep counts >= 10), transform_values (double them),
    map_concat (append a '__total' entry computed by aggregate() over
    map_values of the ORIGINAL map), size(), and explode() back to rows.
    All map lambdas are JVM-side; the exploded row output is what makes the
    exact relational oracle possible (cross-engine map comparison is the
    blocker QUERIES.md used to note — exploding sidesteps it). Per-segment
    maps are nation-cardinality-sized (bounded metadata, not data), so
    collect_list here is safe at any corpus scale."""
    per = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    m = per.groupBy("c_mktsegment").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("c_nationkey").cast("string").alias("k"),
                        F.col("cnt").alias("v"),
                    )
                )
            )
        ).alias("m")
    )
    m = (
        m.withColumn("m_big", F.map_filter("m", lambda _k, v: v >= 10))
        .withColumn("m_scaled", F.transform_values("m_big", lambda _k, v: v * 2))
        .withColumn(
            "m_all",
            F.map_concat(
                "m_scaled",
                F.create_map(
                    F.lit("__total"),
                    F.aggregate(
                        F.map_values("m"), F.lit(0).cast("bigint"), lambda a, x: a + x
                    ),
                ),
            ),
        )
    )
    return m.select(
        "c_mktsegment",
        F.explode("m_all").alias("map_key", "map_value"),
        F.size(F.col("m_all")).cast("int").alias("n_keys"),
    )


@register(
    "quality_gate_percentile",
    oracle="""
    WITH q AS (
      SELECT quantile_cont(n_chars, 0.05) AS p05,
             quantile_cont(n_chars, 0.95) AS p95
      FROM documents)
    SELECT d.doc_id, d.n_chars, d.source
    FROM documents d, q
    WHERE d.n_chars >= q.p05 AND d.n_chars <= q.p95
    """,
    tags=("text", "sampling", "extension", "corpus"),
)
def q_quality_gate_percentile(spark, sf_dir):
    """Corpus-relative quality gate: keep documents inside the [p05, p95]
    length band (outlier trimming by corpus distribution, not fixed
    thresholds — the filter adapts as the corpus shifts). Exact percentile
    (linear interpolation, identical in Spark percentile and DuckDB
    quantile_cont); the two-row threshold aggregate broadcasts back, so
    the corpus side is one scan + one tiny agg. At 100 TB swap in
    approx_percentile and accept the epsilon."""
    docs = _t(spark, sf_dir, "documents")
    q = docs.agg(
        F.percentile("n_chars", 0.05).alias("p05"),
        F.percentile("n_chars", 0.95).alias("p95"),
    )
    return (
        docs.crossJoin(F.broadcast(q))
        .filter((F.col("n_chars") >= F.col("p05")) & (F.col("n_chars") <= F.col("p95")))
        .select("doc_id", "n_chars", "source")
    )


@register(
    "table_deferred_delete",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 100000)
    """,
    tags=("S2", "extension", "lake"),
)
def q_table_deferred_delete(spark, sf_dir):
    """Merge-on-read DELETE end-to-end (deletion-vector analog): commit a
    tombstone of matching keys instead of rewriting files; the read-side
    anti-join must equal the plain CoW WHERE NOT — O(matched keys) write
    cost at any table size."""
    from .sources.tables import VersionedTable

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_dd_"))
    vt.overwrite(_t(spark, sf_dir, "orders").select(*cols))
    vt.delete_where_deferred(
        "o_orderstatus = 'F' AND o_totalprice < 100000", key_cols=["o_orderkey"]
    )
    return vt.read().select(*cols)


@register(
    "positional_delete_vectors",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 100000)
    """,
    tags=("S2", "extension", "lake"),
)
def q_positional_delete_vectors(spark, sf_dir):
    """POSITIONAL merge-on-read DELETE (the true Delta deletion-vector /
    Iceberg positional-delete analog): tombstones are (file, row-index)
    pairs from parquet's ``_metadata`` hidden column — no record key
    required, O(matched rows) write cost, one broadcast anti-join at read
    until compaction materializes. Must equal the plain CoW WHERE NOT."""
    from .sources.tables import VersionedTable

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_pdv_"))
    vt.overwrite(_t(spark, sf_dir, "orders").select(*cols))
    vt.delete_where_positional("o_orderstatus = 'F' AND o_totalprice < 100000")
    return vt.read().select(*cols)


# --------------------------------------------------------------------------
# Batch 12 (round 4, second half): cohort retention, event transition
# matrix, weighted sampling, incremental materialized-view maintenance
# --------------------------------------------------------------------------

@register(
    "events_retention_cohorts",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    first_seen AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
                   FROM ev GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_day FROM ev)
    SELECT CAST(f.cohort_day AS TIMESTAMP) AS cohort_day,
           CAST(date_diff('day', f.cohort_day, a.act_day) AS INTEGER)
             AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM act a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    tags=("events", "agg", "extension"),
)
def q_events_retention_cohorts(spark, sf_dir):
    """Cohort retention: users grouped by first-seen day, counted on each
    later active day as an offset from the cohort day — the standard
    product-analytics retention triangle.

    Scale shape: both the first-seen aggregate and the distinct-activity
    projection shuffle on ``user_id`` (one exchange reused across the
    join), then one final aggregate on the small (cohort, offset) key
    space. No driver-side data."""
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    act = ev.select("user_id", F.to_date("ts").alias("act_day")).distinct()
    return (
        act.join(first_seen, "user_id")
        .groupBy(
            # DATE round-trips inconsistently across engines' pandas
            # bridges; the repo-wide convention is naive TIMESTAMP output
            F.col("cohort_day").cast("timestamp_ntz").alias("cohort_day"),
            F.datediff("act_day", "cohort_day").cast("int").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "events_transition_matrix",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    pairs AS (SELECT LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_type,
                     event_type AS next_type
              FROM ev),
    counts AS (SELECT prev_type, next_type, COUNT(*) AS n_transitions
               FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2)
    SELECT prev_type, next_type, n_transitions,
           CAST(n_transitions AS DOUBLE)
             / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type) AS DOUBLE)
             AS p_transition
    FROM counts
    """,
    tags=("events", "window", "extension"),
)
def q_events_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences:
    LAG pairs each event with its predecessor (deterministic (ts, event_id)
    ordering), then transition counts normalize to row-stochastic
    probabilities via a windowed sum — session-flow analysis.

    Scale shape: one shuffle on ``user_id`` for the sequence window, one
    tiny aggregate on the (prev, next) type pairs (bounded by the event
    vocabulary squared), and the normalizing window runs on that tiny
    relation. Integer counts divide as doubles — deterministic IEEE
    division, oracle-exact."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .select("prev_type", F.col("event_type").alias("next_type"))
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wp = Window.partitionBy("prev_type")
    return counts.withColumn(
        "p_transition",
        F.col("n_transitions").cast("double")
        / F.sum("n_transitions").over(wp).cast("double"),
    )


@register(
    "weighted_sample_docs",
    oracle="""
    WITH w AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS w_total FROM documents)
    SELECT doc_id, source, n_chars
    FROM documents, w
    WHERE CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS DOUBLE)
          * CAST(w_total AS DOUBLE)
        < 100.0 * CAST(n_chars AS DOUBLE) * 1152921504606846976.0
    """,
    tags=("sampling", "extension", "corpus"),
)
def q_weighted_sample_docs(spark, sf_dir):
    """Weight-proportional (Poisson) document sampling, weight = n_chars:
    each doc kept with probability min(1, k*w/W) — the quality/length-
    weighted selection step in corpus curation. The keep decision is a
    portable md5 hash compared in exactly-replayable IEEE-double
    arithmetic, so the sample is identical across runs, layouts, and
    engines (no RNG). One scalar aggregate + one scan-speed filter."""
    from .operators.sampling import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    return weighted_sample(docs, "doc_id", "n_chars", target_rows=100).select(
        "doc_id", "source", "n_chars"
    )


@register(
    "materialized_view_refresh",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM orders GROUP BY 1
    """,
    tags=("agg", "lake", "extension"),
)
def q_materialized_view_refresh(spark, sf_dir):
    """Incremental materialized-view maintenance: build a COUNT+SUM view on
    a stale table state (every 3rd order carries a doubled price), diff the
    states with the CDC operator (``table_changes``), and fold the
    insert/delete delta into the stored view — refresh cost O(changed
    rows), not O(table). The refreshed view must equal a from-scratch
    aggregate of the current state bit-for-bit (DECIMAL accumulation),
    which is exactly what the oracle computes — exercising both the add
    (insert) and subtract (delete) maintenance paths."""
    from .operators.materialized import aggregate_view, refresh_aggregate_view
    from .sources.tables import table_changes

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    stale_mod = orders.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    old = orders.filter(F.col("o_orderkey") % 3 != 0).unionByName(stale_mod)
    mv0 = aggregate_view(old, ["o_orderstatus"], {"sum_price": "o_totalprice"})
    changes = table_changes(spark, old, orders)
    mv1 = refresh_aggregate_view(
        mv0, changes, ["o_orderstatus"], {"sum_price": "o_totalprice"}
    )
    return mv1.select(
        "o_orderstatus",
        F.col("mv_n").alias("n_orders"),
        F.col("sum_price").cast("double").alias("sum_price"),
    )


@register(
    "streaming_mv_refresh",
    oracle=f"""
    WITH ev AS ({_EV_SQL})
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM ev GROUP BY 1
    """,
    tags=("streaming", "lake", "agg", "extension"),
)
def q_streaming_mv_refresh(spark, sf_dir):
    """Streaming materialized-view maintenance: the events table replays as
    a 4-file stream (maxFilesPerTrigger=1, so FOUR separate micro-batches),
    and ``foreachBatch`` folds each batch's partial aggregate into a stored
    COUNT+SUM ``VersionedTable`` — exactly-once via the txn pattern. After
    the replay, the incrementally-maintained view must equal a from-scratch
    batch aggregate of the whole table bit-for-bit (DECIMAL folds) — the
    multi-generation streaming twin of ``materialized_view_refresh``."""
    from .sources.tables import VersionedTable
    from .streaming.scd2_stream import stream_incremental_mv

    stage_dir = tempfile.mkdtemp(prefix="mvstream_")
    ev = _t(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(stage_dir)
    from .streaming.events import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    mv = VersionedTable(spark, tempfile.mkdtemp(prefix="mvtbl_"))
    q = stream_incremental_mv(
        stream,
        mv,
        ["event_type"],
        {"sum_value": "value"},
        tempfile.mkdtemp(prefix="mvckpt_"),
    )
    q.awaitTermination()
    return mv.read().select(
        "event_type",
        F.col("mv_n").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
    )


def _l2_off_sql(a: str, off: int, b: str, sub: int = 16) -> str:
    """Subspace variant of ``_l2_sql``: left-assoc sum of squared diffs of
    ``a[off+1..off+sub]`` against ``b[1..sub]`` — replays the Spark
    ``slice`` + ``zip_with`` + sequential-fold subspace distance."""
    terms = [
        f"(({a}[{off + i}]-{b}[{i}])*({a}[{off + i}]-{b}[{i}]))"
        for i in range(1, sub + 1)
    ]
    return "(" + " + ".join(terms) + ")"


# PQ is fully deterministic end-to-end: codebooks are subspace slices of
# the first 16 vectors by id, per-subspace assignment is first-minimum
# argmin over sequential-fold L2 (ties -> lowest codeword position,
# matching Spark's array_position-of-array_min), and ADC scores the
# 64-dim fold against the concatenated reconstruction.
_PQ_CB = "\n".join(
    f"    cb{j} AS (SELECT pos, v[{j * 16 + 1}:{(j + 1) * 16}] AS cw FROM seeds),"
    for j in range(4)
)
_PQ_ASG = "\n".join(
    f"""    asg{j} AS (
      SELECT vec_id, pos AS code FROM (
        SELECT e.vec_id, c.pos,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_l2_off_sql('e.v', j * 16, 'c.cw')}, c.pos) AS rn
        FROM e CROSS JOIN cb{j} c) t
      WHERE rn = 1),"""
    for j in range(4)
)
_SQL_PQ_TOPK = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    seeds AS (SELECT v, ROW_NUMBER() OVER (ORDER BY vec_id) AS pos
              FROM e ORDER BY vec_id LIMIT 16),
{_PQ_CB}
{_PQ_ASG}
    rec AS (
      SELECT a0.vec_id, cb0.cw || cb1.cw || cb2.cw || cb3.cw AS r
      FROM asg0 a0
      JOIN asg1 a1 ON a1.vec_id = a0.vec_id
      JOIN asg2 a2 ON a2.vec_id = a0.vec_id
      JOIN asg3 a3 ON a3.vec_id = a0.vec_id
      JOIN cb0 ON cb0.pos = a0.code
      JOIN cb1 ON cb1.pos = a1.code
      JOIN cb2 ON cb2.pos = a2.code
      JOIN cb3 ON cb3.pos = a3.code)
    SELECT query_id, neighbor_id, adc_dist, rank FROM (
      SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
             {_l2_sql('q.v', 'r.r')} AS adc_dist,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_l2_sql('q.v', 'r.r')}, r.vec_id) AS INTEGER) AS rank
      FROM e q CROSS JOIN rec r
      WHERE q.vec_id < 10 AND r.vec_id <> q.vec_id) t
    WHERE rank <= 5
    """


@register(
    "embedding_pq_topk", oracle=_SQL_PQ_TOPK, tags=("similarity", "extension")
)
def q_embedding_pq_topk(spark, sf_dir):
    """Product-quantization ANN top-k (the third ANN family beside
    hyperplane LSH and IVF): vectors compress to 4 subspace codeword ids
    (16 ints -> 4 bytes against 64 doubles), queries score against codebook
    reconstructions with asymmetric distance (ADC). Deterministic seed
    codebooks (first 16 vectors by id, zero k-means iterations) make the
    whole pipeline — encode, argmin tie-breaks, ADC folds — replay
    bit-for-bit in DuckDB, the same convention as the IVF/LSH oracles."""
    from .operators.similarity import pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return pq_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "embedding_pq_codes_blas",
    oracle=None,
    tags=("similarity", "extension", "scale"),
)
def q_embedding_pq_codes_blas(spark, sf_dir):
    """Production-dim PQ encoder: codes computed by one BLAS gemm per
    subspace per Arrow batch over a widened 256-dim embedding, with the
    codebooks riding in the task closure so the plan carries zero
    codebook literals — the pq analog of embedding_ann_lsh_blas_pairs,
    closing the last literal-plan scale gap the round-4 verdict flagged.
    Rows-only: the gemm's accumulation order is not the sequential fold,
    so argmin at float-precision ties is not SQL-replayable by design;
    tests/test_ann_blas.py pins BLAS==literal code-for-code on the raw
    embeddings at both SFs."""
    from .operators.similarity import pq_encode_blas

    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    rot = lambda k: F.concat(F.slice(e, k + 1, 64 - k), F.slice(e, 1, k))  # noqa: E731
    wide = emb.select(
        "vec_id", F.concat(e, rot(16), rot(32), rot(48)).alias("embedding")
    )
    codes, _ = pq_encode_blas(wide, m=8, k_codes=32, dim=256)
    return codes


@register(
    "embedding_pq_topk_blas",
    oracle=None,
    tags=("similarity", "extension", "scale"),
)
def q_embedding_pq_topk_blas(spark, sf_dir):
    """Production-dim PQ top-k via precomputed ADC tables
    (operators/similarity.pq_topk_blas): driver-side (m x k_codes)
    distance tables per query, scored as a vectorized gather per Arrow
    batch with per-batch partial top-k, so the shuffle is bounded at
    (batches x queries x k) rows regardless of corpus size — the
    query-side half of the PQ literal-to-BLAS swap. Rows-only (numpy
    accumulation order); tests/test_ann_blas.py pins neighbor-set parity
    against the oracle-exact pq_topk."""
    from .operators.similarity import pq_topk_blas

    emb = _t(spark, sf_dir, "embeddings")
    return pq_topk_blas(emb, emb.filter(F.col("vec_id") < 10), k=5)


from .operators.text import PII_PATTERNS as _PII  # noqa: E402

# The oracle mirrors redact_pii's fixed application order (email, phone,
# ipv4), counting each kind on the text as redacted so far — DuckDB's
# regexp_replace needs the 'g' flag for Spark's replace-all semantics, and
# len(regexp_extract_all(...)) stands in for regexp_count (absent in
# DuckDB 1.0). Patterns are the shared engine-portable PII_PATTERNS.
_SQL_PII = f"""
    WITH d AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or 555-'
                  || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
               AS text
      FROM documents),
    r1 AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{_PII["email"]}')) AS INTEGER)
               AS n_email,
             regexp_replace(text, '{_PII["email"]}', '<EMAIL>', 'g') AS t1
      FROM d),
    r2 AS (
      SELECT doc_id, n_email,
             CAST(len(regexp_extract_all(t1, '{_PII["phone"]}')) AS INTEGER)
               AS n_phone,
             regexp_replace(t1, '{_PII["phone"]}', '<PHONE>', 'g') AS t2
      FROM r1)
    SELECT doc_id, n_email, n_phone,
           CAST(len(regexp_extract_all(t2, '{_PII["ipv4"]}')) AS INTEGER)
             AS n_ipv4,
           regexp_replace(t2, '{_PII["ipv4"]}', '<IPV4>', 'g')
             AS redacted_text
    FROM r2
    """


@register(
    "variant_extract_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("functions", "agg", "extension"),
)
def q_variant_extract_agg(spark, sf_dir):
    """The Spark 4 VARIANT type surface: ``parse_json`` converts the
    events props JSON strings into the binary variant encoding once, and
    ``variant_get`` extracts a typed path — the open-format
    semi-structured column type (also Delta/Iceberg v3's variant),
    complementing the string-re-parse ``get_json_object`` path the
    ``json_extract`` query covers. Aggregated per event type; exact
    oracle via DuckDB's JSON extraction."""
    ev = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "udtf_sentence_split",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             string_split(regexp_replace(text, ' table ', '. ', 'g'), '. ')
               AS s
      FROM documents)
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS sent_id, s[i] AS sentence
    FROM d, LATERAL (SELECT unnest(generate_series(1, len(s))) AS i) g
    WHERE trim(s[i]) <> ''
    """,
    tags=("functions", "text", "extension"),
)
def q_udtf_sentence_split(spark, sf_dir):
    """The Spark 4 Python UDTF API surface (functions/udtf_ops.py): a
    table function lateral-joined per document, one output row per
    sentence with its segment index. Sentence boundaries are seeded
    deterministically (the corpus word-soup has none) by rewriting a
    frequent token to '. '. The UDTF is the API-coverage path — the
    JVM-native posexplode twin is the production path, pinned
    row-identical in tests — and the oracle replays the split in SQL."""
    from .functions.udtf_ops import split_sentences_udtf

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace("text", " table ", ". ").alias("text"),
    )
    return split_sentences_udtf(spark, docs)


# gopher flags replay: same tokenization (regex whitespace split of
# trimmed text), integer aggregates, one IEEE division per ratio. The
# stopword term sums per-word \b regex hits exactly as the Spark side.
_SQL_GOPHER_STOP = " + ".join(
    f"(CASE WHEN regexp_matches(text, '\\b{w}\\b') THEN 1 ELSE 0 END)"
    for w in ("the", "be", "to", "of", "and", "that", "have", "with")
)
_SQL_GOPHER = f"""
    WITH feat AS (
      SELECT doc_id, text,
             string_split_regex(trim(text), '\\s+') AS toks,
             string_split(text, chr(10)) AS lines
      FROM documents),
    agg AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
               AS sum_len,
             CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
               AS BIGINT) AS n_alpha,
             CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS BIGINT)
               AS n_symbols,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(list_filter(lines, x -> regexp_matches(x, '^ *[-*]')))
               AS BIGINT) AS n_bullet,
             CAST(len(list_filter(lines, x -> regexp_matches(x, '\\.\\.\\.$')))
               AS BIGINT) AS n_ellipsis,
             CAST({_SQL_GOPHER_STOP} AS INTEGER) AS n_stopwords
      FROM feat)
    SELECT doc_id, n_words,
           CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
           CAST(n_symbols AS DOUBLE) / CAST(n_words AS DOUBLE) AS symbol_ratio,
           CAST(n_bullet AS DOUBLE) / CAST(n_lines AS DOUBLE)
             AS bullet_line_frac,
           CAST(n_ellipsis AS DOUBLE) / CAST(n_lines AS DOUBLE)
             AS ellipsis_line_frac,
           CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE)
             AS alpha_word_frac,
           n_stopwords,
           (n_words >= 30 AND n_words <= 90
            AND CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE) >= 3.0
            AND CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE) <= 10.0
            AND CAST(n_symbols AS DOUBLE) / CAST(n_words AS DOUBLE) <= 0.1
            AND CAST(n_bullet AS DOUBLE) / CAST(n_lines AS DOUBLE) <= 0.9
            AND CAST(n_ellipsis AS DOUBLE) / CAST(n_lines AS DOUBLE) <= 0.3
            AND CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.8
            AND n_stopwords >= 1) AS gopher_ok
    FROM agg
    """


# DSIR exact-diagnostic replay: same tokenization, same md5-derived
# bucket hash (functions/hashing.md5_hash64's documented DuckDB twin),
# same left-join-and-sum. The float log_weight column is intentionally
# NOT in the gated projection (log() is not cross-engine bit-exact).
_SQL_DSIR = """
    WITH tok AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t
      FROM documents),
    bg AS (
      SELECT doc_id, lang,
             unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i + 1])) AS ng
      FROM tok WHERE len(t) >= 2),
    bk AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substr(md5(ng), 1, 15)) AS BIGINT) % 1024 AS b
      FROM bg),
    raw AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM bk GROUP BY b),
    tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct
            FROM bk WHERE lang = 'en' GROUP BY b)
    SELECT bk.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_ngrams,
           CAST(SUM(COALESCE(ct, 0)) AS BIGINT) AS sum_target_count,
           CAST(SUM(COALESCE(cr, 0)) AS BIGINT) AS sum_raw_count
    FROM bk
    LEFT JOIN raw ON raw.b = bk.b
    LEFT JOIN tgt ON tgt.b = bk.b
    GROUP BY bk.doc_id
    """


@register(
    "dsir_importance_diagnostics",
    oracle=_SQL_DSIR,
    tags=("text", "corpus", "sampling", "extension"),
)
def q_dsir_importance_diagnostics(spark, sf_dir):
    """DSIR hashed-bigram importance weighting (Xie et al. 2023 —
    operators/text.dsir_importance_weights) with the English slice as the
    selection target: every document scored by how much its hashed-bigram
    mass sits in target-corpus buckets vs raw-corpus buckets. The gated
    projection keeps the exact BIGINT diagnostics (bucket-count masses);
    the float log_weight rides on the same operator and is rank-checked
    in tests (log() is not cross-engine bit-exact)."""
    from .operators.text import dsir_importance_weights

    docs = _t(spark, sf_dir, "documents")
    out = dsir_importance_weights(
        docs, docs.filter(F.col("lang") == "en"), n_buckets=1024
    )
    return out.select(
        "doc_id", "n_ngrams", "sum_target_count", "sum_raw_count"
    )


@register(
    "gopher_quality_flags",
    oracle=_SQL_GOPHER,
    tags=("text", "corpus", "extension"),
)
def q_gopher_quality_flags(spark, sf_dir):
    """The Gopher heuristic quality battery (Rae et al. 2021 A1.1 —
    operators/text.gopher_quality_flags): word-count and mean-word-length
    bounds, symbol ratio, bullet/ellipsis line fractions, alphabetic-word
    fraction, distinct-stopword presence, and their conjunction — the
    rule set most pre-training corpora reuse, emitted per-document so
    single rules are tunable. Bounds calibrated to the synthetic docs
    (30-90 words; min_stopwords=1 — the word-soup vocabulary carries only
    'the' from Gopher's list) so the flag varies; EXACT oracle (integer
    aggregates, one IEEE division per ratio)."""
    from .operators.text import gopher_quality_flags

    return gopher_quality_flags(
        _t(spark, sf_dir, "documents"), min_stopwords=1
    )


@register(
    "pii_redaction",
    oracle=_SQL_PII,
    tags=("text", "corpus", "extension"),
)
def q_pii_redaction(spark, sf_dir):
    """PII scrubbing (operators/text.redact_pii): emails, phone numbers,
    and IPv4 addresses replaced with typed placeholder tags, per-document
    match counts reported for PII-density filtering. The query seeds
    deterministic PII into each document (synthetic corpus text carries
    none) so every pattern observably fires; EXACT oracle because the
    patterns are restricted to the Java-regex/RE2-common subset."""
    from .operators.text import redact_pii

    docs = _t(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1"),
    )
    return redact_pii(
        docs.select("doc_id", pii_text.alias("text"))
    ).select("doc_id", "n_email", "n_phone", "n_ipv4", "redacted_text")


@register(
    "hierarchy_subtree_rollup",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT c_custkey AS node, c_custkey // 2 AS parent
      FROM customer WHERE c_custkey > 1),
    a(node, anc, depth) AS (
      SELECT node, parent, 1 FROM edges
      UNION ALL
      SELECT a.node, e.parent, a.depth + 1
      FROM a JOIN edges e ON e.node = a.anc)
    SELECT a.anc AS c_custkey,
           COUNT(*) AS n_descendants,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DECIMAL(28,4))
                AS DOUBLE) AS sum_acctbal
    FROM a JOIN customer c ON c.c_custkey = a.node
    GROUP BY a.anc
    """,
    tags=("recursive", "agg", "extension"),
)
def q_hierarchy_subtree_rollup(spark, sf_dir):
    """Recursive-CTE capability: per-ancestor subtree rollup over the
    implicit binary tree ``parent(k) = k DIV 2`` on customer keys. the
    closure here is the iterative self-join loop
    (``operators/hierarchy.py`` — log-depth rounds, shrinking frontier);
    the oracle runs the textbook recursive CTE, pinning the loop against
    real recursive semantics. Since Spark 4.0 a native WITH RECURSIVE
    exists too — exercised by ``recursive_cte_native``; this loop stays
    as the scale path with tunable rounds/frontier."""
    from .operators.hierarchy import ancestor_closure, subtree_rollup

    cust = _t(spark, sf_dir, "customer")
    edges = cust.filter(F.col("c_custkey") > 1).select(
        F.col("c_custkey").alias("node"),
        F.expr("c_custkey DIV 2").alias("parent"),
    )
    closure = ancestor_closure(edges)
    roll = subtree_rollup(cust, closure, "c_custkey", "c_acctbal")
    return roll.select(
        "c_custkey",
        "n_descendants",
        F.col("sum_value").cast("double").alias("sum_acctbal"),
    )


@register(
    "zscore_normalize",
    oracle="""
    WITH m AS (
      SELECT c_nationkey,
             COUNT(*) AS n,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))
                           * CAST(c_acctbal AS DECIMAL(18,4)))
                       AS DECIMAL(28,4)) AS DOUBLE) AS sx2
      FROM customer GROUP BY c_nationkey)
    SELECT c.c_custkey, c.c_nationkey,
           (c.c_acctbal - m.sx / m.n)
             / sqrt((m.sx2 - m.sx * (m.sx / m.n)) / (m.n - 1)) AS zscore
    FROM customer c JOIN m ON m.c_nationkey = c.c_nationkey
    WHERE m.n > 1
    """,
    tags=("agg", "functions", "extension", "corpus"),
)
def q_zscore_normalize(spark, sf_dir):
    """Per-group z-score feature normalization — the standardization step
    in front of ML features. Moments accumulate as exact DECIMAL sums
    (order-independent — a naive double SUM would be partition-order
    dependent and engine-divergent), then the normalization arithmetic is
    a fixed IEEE expression tree replayed verbatim by the oracle. One
    grouped aggregate + one broadcastable join back to rows.

    The sum of squares re-casts to DECIMAL(28,4) BEFORE the double cast:
    the values carry only 4 real decimal digits, so the narrowing is
    exact, and it keeps the scaled mantissa under 2^53 — above that,
    DuckDB's decimal->double conversion (int128 mantissa to double, then
    a 10^-scale divide) double-rounds and can land 1 ulp away from
    Spark's correctly-rounded BigDecimal cast."""
    cust = _t(spark, sf_dir, "customer")
    dec = F.col("c_acctbal").cast("decimal(18,4)")
    m = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("sx"),
        F.sum(dec * dec).cast("decimal(28,4)").cast("double").alias("sx2"),
    )
    j = cust.join(F.broadcast(m), "c_nationkey").filter(F.col("n") > 1)
    mean = F.col("sx") / F.col("n")
    var = (F.col("sx2") - F.col("sx") * mean) / (F.col("n") - 1)
    return j.select(
        "c_custkey",
        "c_nationkey",
        ((F.col("c_acctbal") - mean) / F.sqrt(var)).alias("zscore"),
    )


@register(
    "histogram_binned",
    oracle="""
    WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
    SELECT CAST(LEAST(19, CAST(FLOOR((e.value - b.lo)
                                     / ((b.hi - b.lo) / 20.0)) AS BIGINT))
                AS INTEGER) AS bin,
           COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events e, b
    GROUP BY 1
    """,
    tags=("agg", "extension"),
)
def q_histogram_binned(spark, sf_dir):
    """Equi-width histogram with data-derived bounds: one scalar min/max
    aggregate broadcast back, then per-row binning (floor arithmetic —
    deterministic IEEE, unlike round()) and a 20-group aggregate. The
    top edge folds into the last bin (LEAST), matching width_bucket
    conventions. Scan + two tiny exchanges at any scale."""
    ev = _t(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(20.0)
    bin_ = F.least(
        F.lit(19).cast("bigint"),
        F.floor((F.col("value") - F.col("lo")) / width),
    ).cast("int")
    return (
        ev.crossJoin(F.broadcast(b))
        .groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
    )


_SQL_IVFPQ_TOPK = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    seeds AS (SELECT v, ROW_NUMBER() OVER (ORDER BY vec_id) AS pos
              FROM e ORDER BY vec_id LIMIT 16),
{_PQ_CB}
{_PQ_ASG}
    rec AS (
      SELECT a0.vec_id, cb0.cw || cb1.cw || cb2.cw || cb3.cw AS r
      FROM asg0 a0
      JOIN asg1 a1 ON a1.vec_id = a0.vec_id
      JOIN asg2 a2 ON a2.vec_id = a0.vec_id
      JOIN asg3 a3 ON a3.vec_id = a0.vec_id
      JOIN cb0 ON cb0.pos = a0.code
      JOIN cb1 ON cb1.pos = a1.code
      JOIN cb2 ON cb2.pos = a2.code
      JOIN cb3 ON cb3.pos = a3.code),
    cents AS (SELECT vec_id AS cell, v AS cv FROM e ORDER BY vec_id LIMIT 16),
    iasg AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_l2_sql('e.v', 'c.cv')}, c.cell) AS rn
        FROM e CROSS JOIN cents c) t
      WHERE rn = 1),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT q.vec_id AS query_id, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_l2_sql('q.v', 'c.cv')}, c.cell) AS rn
        FROM e q CROSS JOIN cents c WHERE q.vec_id < 10) t
      WHERE rn <= 4),
    cand AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN iasg a ON a.cell = p.cell
      WHERE p.query_id <> a.vec_id)
    SELECT query_id, neighbor_id, adc_dist, rank FROM (
      SELECT c.query_id, c.neighbor_id,
             {_l2_sql('q.v', 'r.r')} AS adc_dist,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY c.query_id
               ORDER BY {_l2_sql('q.v', 'r.r')}, c.neighbor_id) AS INTEGER) AS rank
      FROM cand c
      JOIN e q ON q.vec_id = c.query_id
      JOIN rec r ON r.vec_id = c.neighbor_id) t
    WHERE rank <= 5
    """


@register(
    "embedding_ann_ivfpq_topk", oracle=_SQL_IVFPQ_TOPK, tags=("similarity", "extension")
)
def q_embedding_ann_ivfpq_topk(spark, sf_dir):
    """IVF-PQ composed index (the FAISS IVFPQ layout, no-residual variant):
    coarse cells prune candidates, PQ reconstructions score them via ADC —
    the two approximations' savings multiply. Deterministic seed centroids
    and codebooks keep the whole composition oracle-exact, same convention
    as the standalone IVF and PQ queries."""
    from .operators.similarity import ivf_pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_pq_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "chi_square_contingency",
    oracle="""
    WITH cells AS (SELECT c_mktsegment, c_nationkey, COUNT(*) AS o
                   FROM customer GROUP BY 1, 2),
    rt AS (SELECT c_mktsegment, COUNT(*) AS r FROM customer GROUP BY 1),
    ct AS (SELECT c_nationkey, COUNT(*) AS c FROM customer GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM customer)
    SELECT cells.c_mktsegment, cells.c_nationkey, cells.o AS observed,
           CAST(rt.r AS DOUBLE) * ct.c / n.n AS expected,
           (cells.o - CAST(rt.r AS DOUBLE) * ct.c / n.n)
             * (cells.o - CAST(rt.r AS DOUBLE) * ct.c / n.n)
             / (CAST(rt.r AS DOUBLE) * ct.c / n.n) AS contribution
    FROM cells
    JOIN rt ON rt.c_mktsegment = cells.c_mktsegment
    JOIN ct ON ct.c_nationkey = cells.c_nationkey
    CROSS JOIN n
    """,
    tags=("agg", "extension"),
)
def q_chi_square_contingency(spark, sf_dir):
    """Chi-square contingency analysis (segment x nation): per-cell
    observed vs expected counts and chi-square contributions. Emitted
    PER CELL deliberately — a global SUM of double contributions would be
    accumulation-order dependent and never cross-engine exact; the caller
    sums the tiny cell relation however it likes. Counts are integers, so
    every double op here is a fixed deterministic expression. Three small
    aggregates (cells, row totals, column totals) + one scalar, all
    broadcast-sized."""
    cust = _t(spark, sf_dir, "customer")
    cells = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("observed")
    )
    rt = cust.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("r"))
    ct = cust.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("c"))
    n = cust.agg(F.count(F.lit(1)).alias("n"))
    expected = F.col("r").cast("double") * F.col("c") / F.col("n")
    return (
        cells.join(F.broadcast(rt), "c_mktsegment")
        .join(F.broadcast(ct), "c_nationkey")
        .crossJoin(F.broadcast(n))
        .select(
            "c_mktsegment",
            "c_nationkey",
            "observed",
            expected.alias("expected"),
            (
                (F.col("observed") - expected)
                * (F.col("observed") - expected)
                / expected
            ).alias("contribution"),
        )
    )


@register(
    "decile_bucketing",
    oracle="""
    SELECT doc_id, n_chars,
           CAST(NTILE(10) OVER (ORDER BY n_chars, doc_id) AS INTEGER) AS decile
    FROM documents
    """,
    tags=("window", "extension", "corpus"),
)
def q_decile_bucketing(spark, sf_dir):
    """Decile bucketing of documents by length — the percentile-bin
    labeling step of quality stratification. NTILE over a TOTAL order
    (tie-break on doc_id) is deterministic and engine-portable; without
    the tie-break, equal-length docs could land in different deciles per
    engine. One global sort — at 100 TB swap NTILE for the histogram/
    approx-quantile bin edges (``histogram_binned``) to avoid the
    single-ordering bottleneck; this is the exact small-to-mid-scale
    form."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id", "n_chars", F.ntile(10).over(w).cast("int").alias("decile")
    )


@register(
    "decile_bucketing_approx", oracle=None, tags=("window", "extension", "corpus")
)
def q_decile_bucketing_approx(spark, sf_dir):
    """The 100 TB twin of ``decile_bucketing``: deciles cut on
    approx-quantile boundaries (operators/text.perplexity_buckets_approx
    with n_buckets=10 over ``n_chars``) instead of NTILE's global total
    order. Plan shape: one Greenwald-Khanna summary pass driver-side for
    the 9 cut literals, then a scan-speed comparison — NO sort, NO
    window, NO single-partition exchange (asserted in
    tests/test_plans.py). Rows-only: bucket POPULATIONS match NTILE only
    to within the summary's relative error (ties on n_chars land whole
    tie-groups in one bucket, which is the semantically honest behavior
    at scale); membership stays exactly monotone in n_chars.
    Tolerance vs the exact NTILE edges: tests/test_text_ops.py."""
    from .operators.text import perplexity_buckets_approx

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return perplexity_buckets_approx(
        docs,
        n_buckets=10,
        ppl_col="n_chars",
        relative_error=0.001,
        bucket_col="decile",
    )


@register(
    "dedup_incremental_batch",
    oracle=_SQL_LSH_BANDS.replace(
        "    cand AS (\n"
        "      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b\n"
        "      FROM bands a JOIN bands b\n"
        "        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)\n",
        "    cand AS (\n"
        "      SELECT DISTINCT n.doc_id AS id_a, o.doc_id AS id_b\n"
        "      FROM bands n JOIN bands o\n"
        "        ON n.band = o.band AND n.key = o.key\n"
        "      WHERE n.doc_id % 3 = 0 AND o.doc_id % 3 <> 0)\n",
    )
    + """,
    shd AS (SELECT doc_id, list_distinct(s) AS sh FROM shng),
    near AS (
      SELECT DISTINCT c.id_a AS doc_id FROM cand c
      JOIN shd a ON a.doc_id = c.id_a
      JOIN shd b ON b.doc_id = c.id_b
      WHERE len(list_intersect(a.sh, b.sh))
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
    old_dg AS (SELECT DISTINCT md5(text) AS dg FROM documents
               WHERE doc_id % 3 <> 0)
    SELECT d.doc_id, d.source, d.n_chars FROM documents d
    WHERE d.doc_id % 3 = 0
      AND md5(d.text) NOT IN (SELECT dg FROM old_dg)
      AND d.doc_id NOT IN (SELECT doc_id FROM near)
    """,
    tags=("dedup", "extension", "corpus"),
)
def q_dedup_incremental_batch(spark, sf_dir):
    """Incremental ingestion dedup: the new batch (every 3rd doc) screens
    against the existing corpus (the rest) — exact digest anti-join plus
    LSH-candidate + Jaccard-verified near-dup kill, NEW x OLD pairs only.
    The continuous-corpus-building shape: the historical corpus is never
    re-deduplicated, per-batch cost tracks batch size (see
    ``dedup_against_corpus`` scale notes on persisting corpus
    signatures)."""
    from .operators.dedup import dedup_against_corpus

    docs = _t(spark, sf_dir, "documents")
    new_batch = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    return dedup_against_corpus(new_batch, corpus).select(
        "doc_id", "source", "n_chars"
    )


@register(
    "table_generated_column_clone",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus))
             AS checksum
    FROM orders
    """,
    tags=("S2", "lake", "extension"),
)
def q_table_generated_column_clone(spark, sf_dir):
    """Generated column + shallow clone end-to-end: a checksum column
    GENERATED ALWAYS AS md5(key|status) — the reference's own
    change-detection idiom (hudi/hudi_scd_script.py:63) enforced by the
    table instead of each writer — is backfilled on the initial 2/3 of
    orders, computed automatically for an appended batch that omits it,
    and finally read through a METADATA-ONLY shallow clone (zero data
    copied; the clone's snapshot marks the source dir external so clone
    vacuum can never reclaim it). Result must equal projecting the
    expression over all orders."""
    from .sources.tables import VersionedTable

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_gen_"))
    vt.overwrite(orders.filter(F.col("o_orderkey") % 3 != 0))
    vt.add_generated_column(
        "checksum",
        "md5(concat_ws('|', CAST(o_orderkey AS STRING), o_orderstatus))",
    )
    vt.append(orders.filter(F.col("o_orderkey") % 3 == 0))
    clone = vt.shallow_clone(tempfile.mkdtemp(prefix="vt_genclone_"))
    return clone.read().select("o_orderkey", "o_orderstatus", "checksum")


@register(
    "table_identity_column",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           ROW_NUMBER() OVER (ORDER BY o_orderkey) AS row_id
    FROM orders
    """,
    tags=("S2", "lake", "extension"),
)
def q_table_identity_column(spark, sf_dir):
    """Identity column (GENERATED ALWAYS AS IDENTITY analog) across two
    append batches: dense bigint ids continue from the table's MAX,
    assigned in an explicit total order so the result is deterministic
    (Delta documents its identity as non-reproducible; this variant
    trades gap-freedom under concurrency for exact replayability). The
    two batches (orders split 2/3-1/3 by key thirds, appended in key
    order) must reproduce ROW_NUMBER over the whole table."""
    from .sources.tables import VersionedTable

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    n = orders.count()
    cut = orders.orderBy("o_orderkey").limit(2 * n // 3).agg(
        F.max("o_orderkey")
    ).first()[0]
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_ident_"))
    vt.append_with_identity(
        orders.filter(F.col("o_orderkey") <= cut), "row_id", ["o_orderkey"]
    )
    vt.append_with_identity(
        orders.filter(F.col("o_orderkey") > cut), "row_id", ["o_orderkey"]
    )
    return vt.read().select(
        "o_orderkey", "o_orderstatus", F.col("row_id").cast("bigint").alias("row_id")
    )


@register(
    "table_branch_workflow",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 50000)
    """,
    tags=("S2", "lake", "extension"),
)
def q_table_branch_workflow(spark, sf_dir):
    """Iceberg-branch write-audit-publish at branch granularity: fork a
    writable branch (metadata-only shallow clone), run the cleanup DELETE
    on the branch while main stays untouched, then fast-forward main to
    the audited branch state — the multi-commit generalization of the
    single-snapshot stage/publish WAP (iceberg_scd_script.py:36 format-v2
    being the reference's audit-capable table). Result must equal the
    plain CoW DELETE applied directly."""
    from .sources.tables import VersionedTable

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_br_"))
    vt.overwrite(_t(spark, sf_dir, "orders").select(*cols))
    audit = vt.create_branch("audit")
    audit.delete_where("o_orderstatus = 'F' AND o_totalprice < 50000")
    vt.fast_forward("audit")
    vt.drop_branch("audit")
    return vt.read().select(*cols)


@register(
    "vtable_datasource_scan",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders
    """,
    tags=("S2", "sources", "extension"),
)
def q_vtable_datasource_scan(spark, sf_dir):
    """Spark 4 Python DataSource surface: the versioned table store read
    through ``spark.read.format("vtable")`` — the format-name integration
    the reference gets from its plugin DataSources
    (hudi/hudi_scd_script.py:66-70 ``format("hudi")``). Arrow-batched
    (pyarrow iter_batches into Spark's Arrow ingestion, one partition per
    file, zero per-row Python); serves raw snapshot files only and
    REFUSES pending MoR state rather than mis-reading it. Must round-trip
    orders exactly, timestamps included."""
    from .sources.datasource import register_vtable_source
    from .sources.tables import VersionedTable

    register_vtable_source(spark)
    loc = tempfile.mkdtemp(prefix="vt_dsq_")
    VersionedTable(spark, loc).overwrite(
        _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
        )
    )
    return spark.read.format("vtable").option("location", loc).load()


@register(
    "vtable_datasource_write_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    """,
    tags=("S6", "sources", "lake", "extension"),
)
def q_vtable_datasource_write_roundtrip(spark, sf_dir):
    """Writer half of the Spark 4 Python DataSource: orders lands through
    ``df.write.format("vtable")`` — an overwrite commit (2/3 of rows) then
    an append commit (hard-linking prior files, zero copy) — and reads
    back through the same format. Per-task Arrow->parquet staging + one
    atomic driver-side pointer flip = the CoW commit protocol expressed
    through Spark's writer API (the reference's ``format(...).save()``
    write path, hudi/hudi_scd_script.py:66-70, re-expressed natively).
    Must round-trip all orders exactly."""
    from .sources.datasource import register_vtable_source

    register_vtable_source(spark)
    loc = tempfile.mkdtemp(prefix="vt_dsw_")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    orders.filter(F.col("o_orderkey") % 3 != 0).write.format("vtable").option(
        "location", loc
    ).mode("overwrite").save()
    orders.filter(F.col("o_orderkey") % 3 == 0).write.format("vtable").option(
        "location", loc
    ).mode("append").save()
    return spark.read.format("vtable").option("location", loc).load()


@register(
    "vtable_stream_source",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    """,
    tags=("streaming", "sources", "lake", "extension"),
)
def q_vtable_stream_source(spark, sf_dir):
    """Streaming half of the Python DataSource: orders lands in the table
    store across THREE commits (overwrite + two hard-link appends), then
    ``spark.readStream.format("vtable")`` replays them — offsets are
    snapshot versions, each commit's batch is exactly its added files
    (observable because appends hard-link prior files), and non-append
    commits are refused rather than mis-streamed. Drained with
    AvailableNow into a parquet sink; the result must equal the batch
    table exactly — the kappa-architecture contract (same table, batch
    or stream)."""
    from .sources.datasource import register_vtable_source

    register_vtable_source(spark)
    loc = tempfile.mkdtemp(prefix="vt_ss_")
    out = tempfile.mkdtemp(prefix="vt_ss_out_")
    ckpt = tempfile.mkdtemp(prefix="vt_ss_ckpt_")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    orders.filter(F.col("o_orderkey") % 3 == 0).write.format("vtable").option(
        "location", loc
    ).mode("overwrite").save()
    for r in (1, 2):
        orders.filter(F.col("o_orderkey") % 3 == r).write.format(
            "vtable"
        ).option("location", loc).mode("append").save()
    q = (
        spark.readStream.format("vtable")
        .option("location", loc)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


@register(
    "vtable_stream_sink",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    """,
    tags=("streaming", "sources", "lake", "extension"),
)
def q_vtable_stream_sink(spark, sf_dir):
    """Streaming WRITER of the Python DataSource: orders replays as a
    3-file stream and lands in the table store through
    ``writeStream.format("vtable")`` — one hard-link append commit per
    micro-batch, each carrying its exactly-once batch id (the Delta
    txnAppId/txnVersion pattern at the sink API level). Reading the
    resulting table back must equal the batch input — closing the kappa
    loop entirely inside the format: stream in, versioned table out,
    same rows."""
    from .sources.datasource import register_vtable_source
    from .sources.tables import VersionedTable

    register_vtable_source(spark)
    src = tempfile.mkdtemp(prefix="vt_sk_src_")
    loc = tempfile.mkdtemp(prefix="vt_sk_")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    orders.repartition(3).write.mode("overwrite").parquet(src)
    q = (
        spark.readStream.schema(
            "o_orderkey bigint, o_orderstatus string, o_totalprice double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.format("vtable")
        .option("location", loc)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="vt_sk_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return VersionedTable(spark, loc).read()


@register(
    "catalog_table_sql",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_price
    FROM orders GROUP BY 1
    """,
    tags=("S3", "S4", "sources", "lake", "extension"),
)
def q_catalog_table_sql(spark, sf_dir):
    """Catalog layer (Glue Data Catalog analog — hive-sync options
    hudi/hudi_scd_script.py:37-40, GlueCatalog iceberg_submit.sh:33-34):
    orders registers under a durable catalog name backed by a
    VersionedTable, a second batch lands through the catalog handle (the
    view stays fresh), and plain ``spark.sql`` aggregates it BY NAME —
    the name-resolution path the reference's SQL statements depend on.
    Must equal aggregating the raw table."""
    from .sources.catalog import LakeCatalog

    cat = LakeCatalog(spark, tempfile.mkdtemp(prefix="cat_"))
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    cat.create_table("catalog_orders", orders.filter(F.col("o_orderkey") % 2 == 0))
    cat.table("catalog_orders").append(orders.filter(F.col("o_orderkey") % 2 != 0))
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS total_price
        FROM catalog_orders GROUP BY o_orderstatus
        """
    )


@register(
    "tpch_refresh_functions",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 11 <> 0
    UNION ALL
    SELECT o_orderkey + 10000000, 'N', o_totalprice
    FROM orders WHERE o_orderkey % 13 = 0
    """,
    tags=("S6", "S7", "lake", "extension"),
)
def q_tpch_refresh_functions(spark, sf_dir):
    """TPC-H refresh functions over the versioned store: RF1 (new-sales
    INSERT — every 13th order re-keyed as a fresh arrival, status 'N')
    lands as an append commit, RF2 (old-sales DELETE — every 11th order)
    as a CoW delete commit. The benchmark's ACID-maintenance pair, run
    through the same snapshot/commit machinery as everything else; the
    final state must equal set arithmetic over the base table, and both
    intermediate states stay time-travelable."""
    from .sources.tables import VersionedTable

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_rf_"))
    vt.overwrite(orders)
    rf1 = (
        orders.filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10000000))
        .withColumn("o_orderstatus", F.lit("N"))
    )
    vt.append(rf1)
    # RF2 deletes a key LIST drawn from the original orders (the delete
    # file) — the re-keyed RF1 arrivals are never in it
    vt.delete_where("o_orderkey % 11 = 0 AND o_orderkey < 10000000")
    return vt.read()


# int8 quantization replay (the quantize_embeddings contract):
# scale = max|v|/127 (1.0 when the vector is all zeros), q_i = floor(v/scale
# + 0.5) — floor, not round: round-half-even vs half-up differs between
# engines. Integer dot products then rescale by the two scales.
_SQL_QUANT_TOPK = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    qz AS (
      SELECT vec_id,
             CASE WHEN mx > 0 THEN mx / 127.0 ELSE 1.0 END AS scale,
             list_transform(
               v, x -> CAST(floor(x / (CASE WHEN mx > 0 THEN mx / 127.0
                                            ELSE 1.0 END) + 0.5) AS BIGINT)
             ) AS q
      FROM (SELECT vec_id, v,
                   list_max(list_transform(v, x -> abs(x))) AS mx FROM e) t)
    SELECT query_id, neighbor_id, score, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(list_dot_product(q.q, c.q) AS DOUBLE) * q.scale * c.scale
               AS score,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY CAST(list_dot_product(q.q, c.q) AS DOUBLE)
                        * q.scale * c.scale DESC,
                        c.vec_id) AS INTEGER) AS rank
      FROM qz q CROSS JOIN qz c
      WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) t
    WHERE rank <= 5
    """


@register(
    "embedding_quantized_topk", oracle=_SQL_QUANT_TOPK, tags=("similarity", "extension")
)
def q_embedding_quantized_topk(spark, sf_dir):
    """Quantized-serving retrieval: top-k scored on int8 codes with
    EXACT int64 dot products (no float accumulation anywhere in the
    score), rescaled by the two per-vector scales — the memory-bound
    serving path quantization exists for, and the only ANN scoring that
    is bit-reproducible by construction. Integer dots replay in DuckDB
    via list_dot_product over BIGINT lists (exact, order-free)."""
    from .operators.similarity import quantized_topk

    emb = _t(spark, sf_dir, "embeddings")
    return quantized_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "grouped_quantiles",
    oracle="""
    SELECT source,
           quantile_cont(n_chars, 0.25) AS p25,
           quantile_cont(n_chars, 0.50) AS p50,
           quantile_cont(n_chars, 0.75) AS p75
    FROM documents GROUP BY source
    """,
    tags=("agg", "extension", "corpus"),
)
def q_grouped_quantiles(spark, sf_dir):
    """Per-group exact quantiles (quartiles of document length by
    source): Spark ``percentile`` and DuckDB ``quantile_cont`` share the
    linear-interpolation definition, so grouped medians are cross-engine
    exact. One shuffle on the group key; at 100 TB swap for
    approx_percentile and accept the documented epsilon (the bound-check
    test pins how much)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.percentile("n_chars", 0.25).alias("p25"),
        F.percentile("n_chars", 0.50).alias("p50"),
        F.percentile("n_chars", 0.75).alias("p75"),
    )


@register(
    "events_rolling_anomaly",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    w AS (
      SELECT event_id, user_id, ts, value,
             COUNT(*) OVER win AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER win AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))
                           * CAST(value AS DECIMAL(18,4))) OVER win
                       AS DECIMAL(28,4)) AS DOUBLE) AS sx2
      FROM ev
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING))
    SELECT event_id, user_id, value,
           (value - sx / n)
             / sqrt((sx2 - sx * (sx / n)) / (n - 1)) AS rolling_z
    FROM w WHERE n >= 5
    """,
    tags=("events", "window", "extension"),
)
def q_events_rolling_anomaly(spark, sf_dir):
    """Rolling anomaly score: each event's value standardized against the
    user's PRECEDING 19 events (the window excludes the current row — a
    point must not influence its own baseline). Rolling moments
    accumulate as DECIMAL window sums (order-independent; a double
    running sum would drift with partition order), then one fixed IEEE
    expression — same 2^53-safe cast discipline as ``zscore_normalize``.
    One shuffle on user_id shared by all three window aggregates."""
    ev = _t(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, -1)
    )
    dec = F.col("value").cast("decimal(18,4)")
    n = F.count(F.lit(1)).over(win)
    sx = F.sum(dec).over(win).cast("double")
    sx2 = F.sum(dec * dec).over(win).cast("decimal(28,4)").cast("double")
    mean = sx / n
    z = (F.col("value") - mean) / F.sqrt((sx2 - sx * mean) / (n - 1))
    return (
        ev.select(
            "event_id",
            "user_id",
            "value",
            n.alias("n"),
            z.alias("rolling_z"),
        )
        .filter(F.col("n") >= 5)
        .drop("n")
    )


# --------------------------------------------------------------------------
# Sequence analytics: gaps-and-islands + sweep-line concurrency
# --------------------------------------------------------------------------


@register(
    "events_activity_streaks",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM ev),
    r AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                        AS INTEGER) AS island
      FROM d)
    SELECT user_id, CAST(MIN(day) AS TIMESTAMP) AS streak_start,
           CAST(MAX(day) AS TIMESTAMP) AS streak_end,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM r GROUP BY user_id, island
    """,
    tags=("events", "window", "extension"),
)
def q_events_activity_streaks(spark, sf_dir):
    """Gaps-and-islands: maximal consecutive-active-day streaks per user
    (operators/sequence.activity_streaks). The island key day-row_number
    turns run detection into one window + one aggregate sharing a single
    user_id exchange — no self-join, no iteration. DATE round-trips
    inconsistently across engines' pandas bridges, so the day columns go
    out as naive TIMESTAMP (repo-wide convention)."""
    from .operators.sequence import activity_streaks

    out = activity_streaks(_t(spark, sf_dir, "events"))
    return out.select(
        "user_id",
        F.col("streak_start").cast("timestamp_ntz").alias("streak_start"),
        F.col("streak_end").cast("timestamp_ntz").alias("streak_end"),
        "n_days",
    )


@register(
    "events_peak_concurrency",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    g AS (
      SELECT user_id, ts, event_id,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS new_sess
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts,
        CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM g),
    iv AS (
      SELECT user_id, sid, MIN(ts) AS session_start, MAX(ts) AS session_end
      FROM s GROUP BY user_id, sid),
    seg AS (
      SELECT CAST(u.day AS DATE) AS day,
             greatest(session_start, CAST(CAST(u.day AS DATE) AS TIMESTAMP)) AS seg_start,
             least(session_end,
                   CAST(CAST(u.day AS DATE) AS TIMESTAMP) + INTERVAL 1 DAY) AS seg_end
      FROM iv, unnest(generate_series(CAST(session_start AS DATE),
                                      CAST(session_end AS DATE),
                                      INTERVAL 1 DAY)) AS u(day)
      ),
    segs AS (SELECT * FROM seg WHERE seg_start < seg_end),
    deltas AS (
      SELECT day, seg_start AS t, 1 AS delta FROM segs
      UNION ALL
      SELECT day, seg_end AS t, -1 AS delta FROM segs),
    sweep AS (
      SELECT day,
             SUM(delta) OVER (PARTITION BY day ORDER BY t, delta
                              ROWS UNBOUNDED PRECEDING) AS open
      FROM deltas)
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(MAX(open) AS BIGINT) AS peak_concurrency
    FROM sweep GROUP BY day
    """,
    tags=("events", "window", "extension"),
)
def q_events_peak_concurrency(spark, sf_dir):
    """Sweep-line concurrency: peak simultaneously-open sessions per day
    (operators/sequence.daily_peak_concurrency over 30-min gap sessions).
    Sessions are clipped to day segments so the running-sum window
    partitions by day — the move that keeps a global-total-order sweep
    parallelizable at 100 TB (module docstring has the full argument).
    The day column goes out as naive TIMESTAMP (repo-wide DATE
    convention)."""
    from .operators.sequence import daily_peak_concurrency, sessions_from_events

    sessions = sessions_from_events(_t(spark, sf_dir, "events"))
    return daily_peak_concurrency(sessions).select(
        F.col("day").cast("timestamp_ntz").alias("day"), "peak_concurrency"
    )


# --------------------------------------------------------------------------
# Corpus-level distribution analytics
# --------------------------------------------------------------------------


@register(
    "corpus_slice_divergence",
    oracle="""
    WITH tok AS (
      SELECT source AS slice,
             unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents),
    st AS (SELECT slice, tok, CAST(COUNT(*) AS BIGINT) AS c_s
           FROM tok GROUP BY slice, tok),
    ct AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c_g FROM tok GROUP BY tok),
    stot AS (SELECT slice, CAST(COUNT(*) AS BIGINT) AS t_s FROM tok GROUP BY slice),
    ctot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_g FROM tok),
    grid AS (
      SELECT stot.slice, stot.t_s, ct.tok, ct.c_g, COALESCE(st.c_s, 0) AS c_s
      FROM stot CROSS JOIN ct
      LEFT JOIN st ON st.slice = stot.slice AND st.tok = ct.tok)
    SELECT g.slice, g.t_s AS n_tokens,
           CAST(CAST(SUM(abs(g.c_s * ctot.t_g - g.c_g * g.t_s)) AS BIGINT) AS DOUBLE)
             / CAST(2 * g.t_s * ctot.t_g AS DOUBLE) AS tv_distance
    FROM grid g CROSS JOIN ctot
    GROUP BY g.slice, g.t_s, ctot.t_g
    """,
    tags=("text", "corpus", "agg", "extension"),
)
def q_corpus_slice_divergence(spark, sf_dir):
    """Unigram total-variation distance of each source slice vs the whole
    corpus (operators/text.slice_token_divergence) — the source-mixing
    drift check. Probabilities never materialize as floats: exact BIGINT
    cross products, one closing IEEE division per slice."""
    from .operators.text import slice_token_divergence

    return slice_token_divergence(_t(spark, sf_dir, "documents"))


@register(
    "doc_commonness_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents),
    dfreq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
      FROM (SELECT DISTINCT doc_id, tok FROM tok) GROUP BY tok),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(CAST(SUM(f.df) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) * MAX(nd.n_docs) AS DOUBLE) AS commonness
    FROM tok t JOIN dfreq f ON t.tok = f.tok CROSS JOIN nd
    GROUP BY t.doc_id
    """,
    tags=("text", "corpus", "agg", "extension"),
)
def q_doc_commonness_score(spark, sf_dir):
    """Per-document commonness (mean normalized document frequency of its
    tokens, operators/text.with_commonness_score) — the log-free exact
    stand-in for unigram-LM quality scoring: boilerplate scores high,
    rare-token noise scores low."""
    from .operators.text import with_commonness_score

    return with_commonness_score(_t(spark, sf_dir, "documents"))


@register(
    "vocab_oov_rate",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents),
    v AS (
      SELECT tok FROM (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok)
      ORDER BY cnt DESC, tok LIMIT 16)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS oov_rate
    FROM tok t LEFT JOIN v ON t.tok = v.tok
    GROUP BY t.doc_id
    """,
    tags=("text", "corpus", "agg", "extension"),
)
def q_vocab_oov_rate(spark, sf_dir):
    """Per-document out-of-vocabulary rate against the corpus's own
    deterministic top-16 vocabulary (operators/text.with_oov_rate) — the
    tokenizer-coverage curation filter. Top-K vocab via distributed
    TakeOrdered with a lexicographic tie-break, scoring via broadcast
    left join."""
    from .operators.text import with_oov_rate

    return with_oov_rate(_t(spark, sf_dir, "documents"), vocab_size=16)


@register(
    "cross_source_duplication",
    oracle="""
    WITH d AS (SELECT source AS src,
                array_to_string(string_split_regex(trim(text), '\\s+')[1:8], ' ') AS dg
           FROM documents),
    per AS (SELECT dg, src, CAST(COUNT(*) AS BIGINT) AS n
            FROM d GROUP BY dg, src),
    totals AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS total_docs
               FROM d GROUP BY src),
    pairs AS (
      SELECT a.src AS src_a, b.src AS src_b, a.n AS n_a
      FROM per a JOIN per b ON a.dg = b.dg
      WHERE a.src <> b.src OR a.n >= 2)
    SELECT p.src_a, p.src_b,
           CAST(SUM(p.n_a) AS BIGINT) AS dup_docs,
           t.total_docs,
           CAST(CAST(SUM(p.n_a) AS BIGINT) AS DOUBLE)
             / CAST(t.total_docs AS DOUBLE) AS dup_rate
    FROM pairs p JOIN totals t ON t.src = p.src_a
    GROUP BY p.src_a, p.src_b, t.total_docs
    """,
    tags=("dedup", "corpus", "agg", "extension"),
)
def q_cross_source_duplication(spark, sf_dir):
    """Inter-source duplication matrix (operators/dedup.
    cross_source_duplication): per ordered source pair, the share of the
    first source's documents whose fingerprint also appears in the second
    (diagonal = internal duplication, n >= 2). The gate query fingerprints
    on the 8-token prefix — the templated-boilerplate detector — since the
    synthetic corpus has no byte-identical pairs; digest granularity
    before the self-join keeps the join distinct-sized."""
    from .operators.dedup import cross_source_duplication
    from .operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    prefix_fp = F.array_join(F.slice(tokens_expr("text"), 1, 8), " ")
    return cross_source_duplication(docs, fingerprint=prefix_fp)


@register(
    "symlink_manifest_roundtrip",
    oracle=f"""
    WITH tgt AS ({_SQL_TGT9}), upd AS ({_SQL_UPD9}),
    unioned AS (SELECT * FROM tgt UNION ALL SELECT * FROM upd)
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           ts, valid_from, valid_to, iscurrent, checksum
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey, checksum
                                       ORDER BY ts DESC) AS rn
          FROM unioned) t
    WHERE rn = 1
    """,
    tags=("S13", "S14", "lake", "sink"),
)
def q_symlink_manifest_roundtrip(spark, sf_dir):
    """S13/S14 — symlink-format manifest interop
    (delta/delta_scd_script.py:42-60): bulk load + keyed upsert into the
    versioned store with the auto-manifest property enabled, then read the
    table back EXCLUSIVELY through the manifest file list via a SQL view —
    the local equivalent of Athena's SymlinkTextInputFormat external
    table. Result must equal the versioned_table_upsert state, proving the
    manifest alone reconstructs the published head."""
    import tempfile

    from .sources.tables import VersionedTable

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_symlink_"))
    vt.overwrite(scd2_target(spark, sf_dir))
    vt.enable_symlink_manifest()
    vt.upsert(
        with_scd2_columns(customer_updates(spark, sf_dir), CHECKSUM_COLS, as_of=T2),
        ["c_custkey", "checksum"],
        "ts",
    )
    # the "external engine" path: manifest -> file list -> parquet scan,
    # exposed as a SQL-addressable view (the CREATE EXTERNAL TABLE analog)
    vt.read_symlink_manifest().createOrReplaceTempView("symlink_contact_external")
    return spark.sql("SELECT * FROM symlink_contact_external")


@register(
    "mad_outliers",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM ev GROUP BY event_type),
    mad AS (SELECT e.event_type,
                   quantile_cont(abs(e.value - m.med), 0.5) AS mad
            FROM ev e JOIN med m ON e.event_type = m.event_type
            GROUP BY e.event_type)
    SELECT e.event_id, e.event_type, e.value, m.med, d.mad,
           abs(e.value - m.med) AS deviation
    FROM ev e
    JOIN med m ON e.event_type = m.event_type
    JOIN mad d ON e.event_type = d.event_type
    WHERE abs(e.value - m.med) > 2 * d.mad
    """,
    tags=("events", "agg", "extension"),
)
def q_mad_outliers(spark, sf_dir):
    """Robust outlier detection: events whose value deviates from their
    type's MEDIAN by more than 2x the median absolute deviation — the
    rank-based complement to the z-score queries (immune to the outliers
    it hunts, unlike mean/stddev). Two grouped percentile passes (Spark
    ``percentile`` == DuckDB ``quantile_cont`` interpolation, the
    ``grouped_quantiles`` parity) + broadcast joins of the tiny per-type
    stats back onto the stream; |value - med| and the 2*mad threshold are
    single IEEE ops, so the filter is cross-engine exact."""
    ev = _t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias("mad"))
    )
    dev = F.abs(F.col("value") - F.col("med"))
    return (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .withColumn("deviation", dev)
        .filter(F.col("deviation") > F.lit(2) * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad", "deviation")
    )


@register(
    "trimmed_winsorized_means",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    bounds AS (SELECT event_type,
                      quantile_cont(value, 0.05) AS p05,
                      quantile_cont(value, 0.95) AS p95
               FROM ev GROUP BY event_type),
    j AS (SELECT e.event_type, e.value, b.p05, b.p95
          FROM ev e JOIN bounds b ON e.event_type = b.event_type),
    agg AS (
      SELECT event_type, p05, p95,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN value >= p05 AND value <= p95
                           THEN CAST(value AS DECIMAL(18,4)) END)
                  AS DOUBLE) AS tsum,
             CAST(SUM(CASE WHEN value >= p05 AND value <= p95
                           THEN 1 ELSE 0 END) AS BIGINT) AS tn,
             CAST(SUM(CASE WHEN value < p05 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             CAST(SUM(CASE WHEN value > p95 THEN 1 ELSE 0 END) AS BIGINT) AS na
      FROM j GROUP BY event_type, p05, p95)
    SELECT event_type, p05, p95, n,
           tsum / tn AS trimmed_mean,
           ((tsum + nb * p05) + na * p95) / n AS winsorized_mean
    FROM agg
    """,
    tags=("events", "agg", "extension"),
)
def q_trimmed_winsorized_means(spark, sf_dir):
    """Robust per-group location estimates: the mean of values inside the
    [p05, p95] band (trimmed) and the mean with tail values clipped TO the
    band edges (winsorized) — the standard outlier-resistant aggregates
    for metric pipelines. Exactness discipline: the in-band sum
    accumulates as DECIMAL (order-independent), the clipped tails enter as
    count x boundary products, and the closing arithmetic is a FIXED
    parenthesization of single IEEE ops — identical on any engine. One
    grouped percentile pass + one broadcast-join + one conditional
    aggregate; no row data leaves the executors."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("p05"),
        F.percentile("value", 0.95).alias("p95"),
    )
    j = ev.join(F.broadcast(bounds), "event_type")
    in_band = (F.col("value") >= F.col("p05")) & (F.col("value") <= F.col("p95"))
    agg = j.groupBy("event_type", "p05", "p95").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(in_band, F.col("value").cast("decimal(18,4)")))
        .cast("double")
        .alias("tsum"),
        F.sum(F.when(in_band, 1).otherwise(0)).alias("tn"),
        F.sum(F.when(F.col("value") < F.col("p05"), 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("value") > F.col("p95"), 1).otherwise(0)).alias("na"),
    )
    return agg.select(
        "event_type",
        "p05",
        "p95",
        "n",
        (F.col("tsum") / F.col("tn")).alias("trimmed_mean"),
        (
            ((F.col("tsum") + F.col("nb") * F.col("p05")) + F.col("na") * F.col("p95"))
            / F.col("n")
        ).alias("winsorized_mean"),
    )


@register(
    "corpus_bigram_topk",
    oracle="""
    WITH tok AS (
      SELECT string_split_regex(trim(text), '\\s+') AS t FROM documents),
    bg AS (
      SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM tok WHERE len(t) >= 2)
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM bg GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 20
    """,
    tags=("text", "corpus", "agg", "extension"),
)
def q_corpus_bigram_topk(spark, sf_dir):
    """Corpus-level top-20 token bigrams — the n-gram frequency table a
    BPE-style tokenizer-training pass starts from. Bigrams materialize
    inside codegen (transform over the token array, no UDF), one hash
    aggregate on the bigram key with map-side partial combine, and the
    top-K is a distributed TakeOrdered with a lexicographic tie-break —
    never a global sort of the bigram table."""
    from .operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents").withColumn("__t", tokens_expr("text"))
    bg = docs.filter(F.size("__t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(__t) - 1), "
                "i -> concat(element_at(__t, i), ' ', element_at(__t, i + 1)))"
            )
        ).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Round-5 second batch: LM-based quality scoring, mixture reweighting,
# exact heavy hitters, BPE merge candidates
# --------------------------------------------------------------------------

_SQL_UNIGRAM = r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
      FROM documents),
    tf AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY t),
    dt AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM tok GROUP BY doc_id, t)
    SELECT dt.doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * CAST(tf.tf AS DECIMAL(38,0)))
                AS BIGINT) AS sum_tf
    FROM dt JOIN tf USING (t)
    GROUP BY dt.doc_id
    """


@register(
    "unigram_lm_diagnostics",
    oracle=_SQL_UNIGRAM,
    tags=("text", "corpus", "extension"),
)
def q_unigram_lm_diagnostics(spark, sf_dir):
    """Unigram-LM perplexity scoring for CCNet-style quality filtering
    (operators/text.unigram_logprob): every document scored under the
    corpus's own smoothed unigram model. The gated projection keeps the
    exact columns (token counts + corpus-frequency mass); the
    float ``logprob``/``ppl`` ride on the same operator and are checked
    against a numpy reference and rank-tested in
    tests/test_text_ops.py (log/exp are not cross-engine bit-exact —
    same convention as ``dsir_importance_diagnostics``)."""
    from .operators.text import unigram_logprob

    return unigram_logprob(_t(spark, sf_dir, "documents")).select(
        "doc_id", "n_tokens", "n_distinct", "sum_tf"
    )


@register(
    "ccnet_perplexity_buckets_approx",
    oracle=None,
    tags=("text", "corpus", "extension"),
)
def q_ccnet_perplexity_buckets_approx(spark, sf_dir):
    """CCNet's head/middle/tail split on the scale path: perplexity
    buckets cut on approx-quantile boundaries
    (operators/text.perplexity_buckets_approx) rather than the exact
    global NTILE of ``perplexity_buckets`` — this is the form a real
    100 TB curation run executes (CCNet itself cuts on sampled
    quantiles). One GK summary pass for 2 cut literals, then scan-speed
    assignment: no total-order sort anywhere in the plan (asserted in
    tests/test_plans.py). Rows-only: ``ppl`` is transcendental-derived
    so the cuts are not cross-engine bit-exact; population tolerance and
    membership monotonicity vs the exact NTILE are pinned in
    tests/test_text_ops.py."""
    from .operators.text import perplexity_buckets_approx, unigram_logprob

    scored = unigram_logprob(_t(spark, sf_dir, "documents")).select(
        "doc_id", "ppl"
    )
    return perplexity_buckets_approx(scored, n_buckets=3, relative_error=0.001)


_SQL_MIXTURE = """
    WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS domain_count
               FROM documents GROUP BY source),
    t AS (SELECT CAST(SUM(domain_count) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS k FROM c),
    w AS (SELECT source, domain_count,
                 CAST(domain_count AS DOUBLE) / CAST(total AS DOUBLE)
                   AS corpus_share,
                 1.0 / CAST(k AS DOUBLE) AS target_share,
                 (1.0 / CAST(k AS DOUBLE)) * CAST(total AS DOUBLE)
                   / CAST(domain_count AS DOUBLE) AS mix_weight
          FROM c, t)
    SELECT d.doc_id, d.source, w.domain_count, w.corpus_share,
           w.target_share, w.mix_weight
    FROM documents d JOIN w USING (source)
    """


@register(
    "domain_mixture_weights",
    oracle=_SQL_MIXTURE,
    tags=("text", "sampling", "extension"),
)
def q_domain_mixture_weights(spark, sf_dir):
    """Domain-mixture reweighting toward a uniform target distribution
    (operators/text.domain_mixture_weights — the DoReMi / Pile mixture
    recipe shape): per-document sampling weight = target_share × total ÷
    domain_count. EXACT oracle — counts stay BIGINT and every float
    column is the same fixed sequence of correctly-rounded IEEE ops on
    both engines (no transcendentals). Explicit target dictionaries are
    covered in tests/test_text_ops.py."""
    from .operators.text import domain_mixture_weights

    return domain_mixture_weights(_t(spark, sf_dir, "documents"))


_SQL_HEAVY = r"""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
      FROM documents),
    c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM tok GROUP BY token),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c)
    SELECT token, cnt,
           CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share
    FROM c, t WHERE cnt * 1000000 >= total * 33000
    """


@register(
    "token_heavy_hitters",
    oracle=_SQL_HEAVY,
    tags=("text", "agg", "extension"),
)
def q_token_heavy_hitters(spark, sf_dir):
    """Exact corpus heavy hitters at a 3.3% frequency threshold
    (operators/text.heavy_hitters) — the exact two-aggregate form of a
    Misra-Gries sketch. The threshold cut stays in integer arithmetic on
    both engines; ``share`` is one closing IEEE division."""
    from .operators.text import heavy_hitters

    return heavy_hitters(_t(spark, sf_dir, "documents"), min_ppm=33000)


_SQL_BPE = r"""
    WITH w AS (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
      FROM documents),
    p AS (SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                                       i -> substr(w, i, 2))) AS pair
          FROM w WHERE length(w) >= 2),
    c AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt FROM p GROUP BY pair),
    r AS (SELECT pair, cnt,
                 CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair ASC) AS INT)
                   AS rank
          FROM c)
    SELECT pair, cnt, rank FROM r WHERE rank <= 20
    """


@register(
    "bpe_pair_merges",
    oracle=_SQL_BPE,
    tags=("text", "agg", "extension"),
)
def q_bpe_pair_merges(spark, sf_dir):
    """First BPE tokenizer-training step (Sennrich et al. 2016 —
    operators/text.bpe_pair_counts): corpus-wide adjacent character-pair
    counts inside whitespace words, top-20 merge candidates with a
    lexicographic tie-break. Pairs materialize inside codegen (transform
    over a sequence, no UDF); the pair alphabet is tiny so the aggregate
    collapses map-side."""
    from .operators.text import bpe_pair_counts

    return bpe_pair_counts(_t(spark, sf_dir, "documents"), top_k=20)


# --------------------------------------------------------------------------
# Keyed CDF (Delta Change Data Feed pre/post images)
# --------------------------------------------------------------------------

_CDF_VALS = (
    "c_name, c_nationkey, c_acctbal, c_mktsegment, ts, valid_from, "
    "valid_to, iscurrent, checksum"
)
_CDF_ORD = ", ".join(
    f"{c} ASC NULLS FIRST"
    for c in (
        "c_name c_nationkey c_acctbal c_mktsegment ts valid_from "
        "valid_to iscurrent checksum"
    ).split()
)

_SQL_CDF = f"""
    WITH t AS ({_SQL_TGT9}), m AS ({_SQL_MERGE_HUDI}),
    ins AS (SELECT * FROM m EXCEPT ALL SELECT * FROM t),
    del AS (SELECT * FROM t EXCEPT ALL SELECT * FROM m),
    ins_n AS (SELECT *, ROW_NUMBER() OVER
                (PARTITION BY c_custkey ORDER BY {_CDF_ORD}) AS pos FROM ins),
    del_n AS (SELECT *, ROW_NUMBER() OVER
                (PARTITION BY c_custkey ORDER BY {_CDF_ORD}) AS pos FROM del)
    SELECT d.c_custkey, d.c_name, d.c_nationkey, d.c_acctbal, d.c_mktsegment,
           d.ts, d.valid_from, d.valid_to, d.iscurrent, d.checksum,
           'update_preimage' AS _change_type
    FROM ins_n i JOIN del_n d ON i.c_custkey = d.c_custkey AND i.pos = d.pos
    UNION ALL
    SELECT i.c_custkey, i.c_name, i.c_nationkey, i.c_acctbal, i.c_mktsegment,
           i.ts, i.valid_from, i.valid_to, i.iscurrent, i.checksum,
           'update_postimage' AS _change_type
    FROM ins_n i JOIN del_n d ON i.c_custkey = d.c_custkey AND i.pos = d.pos
    UNION ALL
    SELECT i.c_custkey, i.c_name, i.c_nationkey, i.c_acctbal, i.c_mktsegment,
           i.ts, i.valid_from, i.valid_to, i.iscurrent, i.checksum,
           'insert' AS _change_type
    FROM ins_n i WHERE NOT EXISTS
      (SELECT 1 FROM del_n d
       WHERE d.c_custkey = i.c_custkey AND d.pos = i.pos)
    UNION ALL
    SELECT d.c_custkey, d.c_name, d.c_nationkey, d.c_acctbal, d.c_mktsegment,
           d.ts, d.valid_from, d.valid_to, d.iscurrent, d.checksum,
           'delete' AS _change_type
    FROM del_n d WHERE NOT EXISTS
      (SELECT 1 FROM ins_n i
       WHERE i.c_custkey = d.c_custkey AND i.pos = d.pos)
    """


@register(
    "table_changes_cdf_images",
    oracle=_SQL_CDF,
    tags=("S2", "extension", "cdc"),
)
def q_table_changes_cdf_images(spark, sf_dir):
    """Delta Change Data Feed-flavored incremental read
    (``VersionedTable.changes_cdf`` / ``table_changes_keyed``): the
    multiset diff of ``table_changes`` with delete+insert pairs sharing
    the business key re-labeled ``update_preimage``/``update_postimage``
    — the 4-valued ``_change_type`` CDF consumers expect. The SCD2 hudi
    merge rewrites every row at T2, so every key pairs at least once;
    changed keys additionally insert their new current row."""
    from .sources.tables import VersionedTable

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_cdf_"))
    vt.overwrite(scd2_target(spark, sf_dir))
    vt.overwrite(
        scd2_merge_hudi_style(
            vt.read(), customer_updates(spark, sf_dir), "c_custkey", CHECKSUM_COLS, as_of=T2
        )
    )
    return vt.changes_cdf(0, 1, ["c_custkey"])


# --------------------------------------------------------------------------
# Round-5 third batch: interval-range windows, deterministic mode,
# positional explode, k-center diversity sampling
# --------------------------------------------------------------------------


@register(
    "events_trailing_hour_window",
    oracle=f"""
    WITH ev AS ({_EV_SQL})
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    tags=("events", "window", "extension"),
)
def q_events_trailing_hour_window(spark, sf_dir):
    """Time-interval window frame (RANGE BETWEEN INTERVAL '1' HOUR
    PRECEDING): per event, the same user's event count and value sum over
    the trailing hour INCLUDING peers at the same instant — RANGE frames
    are peer-inclusive on both engines, which is what makes the result
    deterministic where a ROWS frame would be tie-order-dependent. The
    sum accumulates as DECIMAL (order-independent) with one closing
    cast. One shuffle on user_id."""
    ev = _t(spark, sf_dir, "events")
    secs = F.unix_timestamp(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(secs)
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("sum_1h"),
    )


@register(
    "modal_event_type",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM ev GROUP BY 1, 2),
    r AS (SELECT user_id, event_type AS modal_event_type, cnt,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY cnt DESC, event_type ASC) AS rn
          FROM c)
    SELECT user_id, modal_event_type, cnt FROM r WHERE rn = 1
    """,
    tags=("events", "agg", "window", "extension"),
)
def q_modal_event_type(spark, sf_dir):
    """Deterministic per-group mode: each user's most frequent event type
    with a lexicographic tie-break (Spark's ``F.mode`` is
    tie-nondeterministic, so the portable idiom is count + ranked window
    — the same plan an exact MODE() would need anyway). Two exchanges:
    the (user, type) aggregate collapses map-side, then one user-keyed
    window."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", F.col("event_type").alias("modal_event_type"), "cnt"
        )
    )


@register(
    "posexplode_token_positions",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents WHERE doc_id % 10 = 0)
    SELECT doc_id,
           CAST(unnest(generate_series(1, len(t))) AS INT) AS pos,
           unnest(t) AS token
    FROM tok
    """,
    tags=("text", "functions", "extension"),
)
def q_posexplode_token_positions(spark, sf_dir):
    """Positional explode (LATERAL VIEW posexplode): tokens with their
    1-based in-document position — the ordinality-preserving flatten
    every sequence-labeling / n-gram-position pipeline starts from.
    DuckDB zips the two same-length unnests; Spark's posexplode emits
    (pos, value) pairs natively. Pure codegen, zero shuffle."""
    from .operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return docs.select(
        "doc_id", F.posexplode(tokens_expr("text")).alias("pos0", "token")
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "token"
    )


@register(
    "embedding_kcenter_sample",
    tags=("similarity", "sampling", "extension"),
)
def q_embedding_kcenter_sample(spark, sf_dir):
    """Greedy k-center (farthest-point) diversity sample of the embedding
    corpus (operators/similarity.kcenter_sample): 8 maximally-spread
    vectors with their coverage-radius diagnostics. Rows-only gate (the
    greedy argmax chain is iterative, not SQL-expressible); the exact
    selection sequence is pinned against a same-IEEE-op-order host
    reference in tests/test_kcenter.py."""
    from .operators.similarity import kcenter_sample

    return kcenter_sample(_t(spark, sf_dir, "embeddings"), k=8)


@register(
    "streaming_static_enrich",
    oracle=f"""
    WITH ev AS ({_EV_SQL})
    SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM ev JOIN customer c ON ev.user_id = c.c_custkey
    GROUP BY 1
    """,
    tags=("streaming", "join", "extension"),
)
def q_streaming_static_enrich(spark, sf_dir):
    """Stream-static join (streaming/events.stream_static_enrich): the
    event stream enriched per micro-batch against the static customer
    dimension (broadcast, zero stream-side shuffle), then aggregated per
    market segment in complete mode — exact-matches the batch join+agg
    oracle. The one streaming join flavor the suite lacked beside the
    stream-stream interval join."""
    from .streaming.events import stream_static_enrich

    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = stream_static_enrich(_events_stream(spark, sf_dir), dim)
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_value"),
    )
    return run_stream_to_memory(agg)


@register(
    "temperature_mixture_weights",
    oracle="""
    WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS domain_count
               FROM documents GROUP BY source),
    t AS (SELECT CAST(SUM(domain_count) AS BIGINT) AS total FROM c),
    w AS (SELECT source, domain_count,
                 CAST(domain_count AS DOUBLE) / CAST(total AS DOUBLE)
                   AS corpus_share,
                 sqrt(CAST(domain_count AS DOUBLE) / CAST(total AS DOUBLE))
                   AS wr,
                 total
          FROM c, t),
    z AS (SELECT list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(s := source, w := wr))),
                     x -> x.w),
                   (a, b) -> a + b) AS z
          FROM w)
    SELECT d.doc_id, d.source, w.domain_count, w.corpus_share,
           w.wr / z.z AS temp_share,
           (w.wr / z.z) * CAST(w.total AS DOUBLE)
             / CAST(w.domain_count AS DOUBLE) AS mix_weight
    FROM documents d JOIN w USING (source), z
    """,
    tags=("text", "sampling", "extension"),
)
def q_temperature_mixture_weights(spark, sf_dir):
    """Temperature-scaled domain sampling at alpha = 0.5
    (operators/text.temperature_mixture_weights — the mBERT/XLM-R/T5
    low-resource up-weighting recipe): per-doc sampling weight toward
    the sqrt-scaled domain distribution. EXACT oracle: sqrt is correctly
    rounded IEEE and the normalizer folds per-domain terms in
    sorted-domain order on both engines."""
    from .operators.text import temperature_mixture_weights

    return temperature_mixture_weights(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# MoR read views as driver-gated queries (previously pytest-only)
# --------------------------------------------------------------------------

_SQL_MOR_RT = f"""
    WITH u AS (SELECT * FROM ({_SQL_UPDATES}) WHERE c_custkey % 3 = 0)
    SELECT * FROM u
    UNION ALL
    SELECT c.* FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.c_custkey = c.c_custkey)
    """


@register(
    "mor_realtime_view",
    oracle=_SQL_MOR_RT,
    tags=("S7", "lake", "extension"),
)
def q_mor_realtime_view(spark, sf_dir):
    """Merge-on-read real-time view (sources/mor.MorTable — the Hudi
    MERGE_ON_READ ``_rt`` table, hudi_scd_script.py:33): a log batch of
    updated/new customers lands WITHOUT a base rewrite, and the read-time
    key merge (precombine + newest-writer-wins) serves exact upsert
    semantics. One record-key shuffle over base ∪ logs — the classic MoR
    cheap-write/dearer-read trade."""
    from .sources.mor import MorTable

    mor = MorTable(
        spark, tempfile.mkdtemp(prefix="mor_rt_"), ["c_custkey"], "c_acctbal"
    )
    mor.bootstrap(_t(spark, sf_dir, "customer"))
    mor.append_log(
        customer_updates(spark, sf_dir).filter(F.col("c_custkey") % 3 == 0)
    )
    return mor.read_realtime()


@register(
    "mor_compaction_converges",
    oracle=_SQL_MOR_RT,
    tags=("S7", "lake", "extension"),
)
def q_mor_compaction_converges(spark, sf_dir):
    """MoR compaction (Hudi compaction service): after folding the logs
    into a new base, the READ-OPTIMIZED view serves exactly what the
    real-time view served before — same oracle as ``mor_realtime_view``,
    read through ``read_optimized()`` post-compact."""
    from .sources.mor import MorTable

    mor = MorTable(
        spark, tempfile.mkdtemp(prefix="mor_c_"), ["c_custkey"], "c_acctbal"
    )
    mor.bootstrap(_t(spark, sf_dir, "customer"))
    mor.append_log(
        customer_updates(spark, sf_dir).filter(F.col("c_custkey") % 3 == 0)
    )
    mor.compact()
    return mor.read_optimized()


# --------------------------------------------------------------------------
# Round-5 fourth batch: point-in-time SCD2 lookup, funnel analysis,
# column profiling
# --------------------------------------------------------------------------


@register(
    "scd2_point_in_time_lookup",
    oracle=f"""
    WITH ev AS ({_EV_SQL}), m AS ({_SQL_MERGE_DELTA})
    SELECT ev.event_id, ev.user_id, ev.ts, m.c_mktsegment, m.valid_from,
           m.iscurrent
    FROM ev JOIN m
      ON ev.user_id = m.c_custkey
     AND ev.ts >= m.valid_from
     AND (m.valid_to IS NULL OR ev.ts < m.valid_to)
    """,
    tags=("scd2", "temporal", "join", "extension"),
)
def q_scd2_point_in_time_lookup(spark, sf_dir):
    """Point-in-time dimension lookup (operators/temporal.
    scd2_asof_lookup): every event joins the SCD2 customer version valid
    AT its timestamp — the read-side purpose of the envelope the
    reference's merges maintain. The dimension is the DELTA-style merge
    (unchanged rows keep their original validity, so in-window events
    resolve to a version; the hudi variant re-stamps every current row
    at T2 and would match only expired rows). Equi-shuffle on the key
    with the validity range as a residual filter (the key bounds the
    match set, so no interval explosion)."""
    from .operators.temporal import scd2_asof_lookup

    ev = _t(spark, sf_dir, "events")
    dim = scd2_merge_delta_style(
        scd2_target(spark, sf_dir, include_ts=False),
        customer_updates(spark, sf_dir),
        "c_custkey",
        CHECKSUM_COLS,
        as_of=T2,
    )
    return scd2_asof_lookup(
        ev, dim, "user_id", "c_custkey", "ts"
    ).select(
        "event_id", "user_id", ev["ts"], "c_mktsegment", "valid_from", "iscurrent"
    )


@register(
    "events_funnel_stages",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    st AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER w AS seen_view
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)),
    st2 AS (
      SELECT *, CASE WHEN event_type = 'click' AND seen_view IS NOT NULL
                          AND ts > seen_view THEN ts END AS click_ok
      FROM st),
    st3 AS (
      SELECT *, MIN(click_ok) OVER (PARTITION BY user_id ORDER BY ts, event_type
                                    ROWS UNBOUNDED PRECEDING) AS seen_click
      FROM st2),
    st4 AS (
      SELECT *, CASE WHEN event_type = 'purchase' AND seen_click IS NOT NULL
                          AND ts > seen_click THEN ts END AS purchase_ok
      FROM st3)
    SELECT user_id,
           MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
           MIN(click_ok) AS t_click,
           MIN(purchase_ok) AS t_purchase
    FROM st4 GROUP BY user_id
    """,
    tags=("events", "window", "sequence", "extension"),
)
def q_events_funnel_stages(spark, sf_dir):
    """Ordered funnel analysis (view → click-after-view →
    purchase-after-that-click): per user the first completion timestamp
    of each stage, where a stage only counts when it happens strictly
    after the previous stage's first completion — the order-dependent
    semantics a bare conditional min would get wrong. One user-keyed
    window pass feeds a same-partitioning aggregate (no second
    exchange). A row-pattern engine (MATCH_RECOGNIZE) is the generalized
    form; running conditional minima cover the fixed 3-stage funnel."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    st = ev.withColumn(
        "seen_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    ).withColumn(
        "click_ok",
        F.when(
            (F.col("event_type") == "click")
            & F.col("seen_view").isNotNull()
            & (F.col("ts") > F.col("seen_view")),
            F.col("ts"),
        ),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_type")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    st = st.withColumn("seen_click", F.min("click_ok").over(w2)).withColumn(
        "purchase_ok",
        F.when(
            (F.col("event_type") == "purchase")
            & F.col("seen_click").isNotNull()
            & (F.col("ts") > F.col("seen_click")),
            F.col("ts"),
        ),
    )
    return st.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.min("click_ok").alias("t_click"),
        F.min("purchase_ok").alias("t_purchase"),
    )


@register(
    "column_profile",
    oracle="""
    SELECT 'c_custkey' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(c_custkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
           CAST(MIN(c_custkey) AS DOUBLE) AS min_num,
           CAST(MAX(c_custkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM customer
    UNION ALL
    SELECT 'c_acctbal', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(c_acctbal) AS BIGINT),
           CAST(COUNT(DISTINCT c_acctbal) AS BIGINT),
           CAST(MIN(c_acctbal) AS DOUBLE), CAST(MAX(c_acctbal) AS DOUBLE),
           NULL, NULL
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(c_mktsegment) AS BIGINT),
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
           NULL, NULL, MIN(c_mktsegment), MAX(c_mktsegment)
    FROM customer
    UNION ALL
    SELECT 'c_name', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(c_name) AS BIGINT),
           CAST(COUNT(DISTINCT c_name) AS BIGINT),
           NULL, NULL, MIN(c_name), MAX(c_name)
    FROM customer
    """,
    tags=("agg", "extension"),
)
def q_column_profile(spark, sf_dir):
    """Single-pass column profiling (the data-quality summary every
    ingestion pipeline runs first): per column — row/null/distinct
    counts and typed min/max (numeric as double, strings in binary
    collation, so both engines agree exactly). ONE aggregate computes
    every column's stats; the per-column rows unpivot from that single
    row — the table is scanned once, not once per column."""
    cust = _t(spark, sf_dir, "customer")
    num_cols = ["c_custkey", "c_acctbal"]
    str_cols = ["c_mktsegment", "c_name"]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in num_cols + str_cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).alias(f"__min_{c}"),
            F.max(F.col(c)).alias(f"__max_{c}"),
        ]
    one = cust.agg(*aggs)
    rows = []
    for c in num_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").cast("bigint").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).cast("bigint").alias("n_nulls"),
                F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"__min_{c}").cast("double").alias("min_num"),
                F.col(f"__max_{c}").cast("double").alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for c in str_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").cast("bigint").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).cast("bigint").alias("n_nulls"),
                F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.col(f"__min_{c}").alias("min_str"),
                F.col(f"__max_{c}").alias("max_str"),
            )
        )
    return one.select(
        F.explode(F.array(*rows)).alias("p")
    ).select("p.*")


# --------------------------------------------------------------------------
# Round-5 fifth batch: fuzzy matching, EWMA, array/calendar breadth
# --------------------------------------------------------------------------


@register(
    "fuzzy_name_matches",
    oracle="""
    WITH a AS (SELECT p_partkey, p_name, split_part(p_name, ' ', 1) AS blk
               FROM part)
    SELECT x.p_partkey AS id_a, y.p_partkey AS id_b,
           x.p_name AS text_a, y.p_name AS text_b,
           CAST(levenshtein(x.p_name, y.p_name) AS INT) AS distance
    FROM a x JOIN a y ON x.blk = y.blk AND x.p_partkey < y.p_partkey
    WHERE x.p_name <> y.p_name
      AND levenshtein(x.p_name, y.p_name) <= 3
    """,
    tags=("dedup", "join", "extension"),
)
def q_fuzzy_name_matches(spark, sf_dir):
    """Blocked edit-distance entity resolution (operators/dedup.
    fuzzy_match_pairs): part names sharing a first-word block, verified
    by Levenshtein ≤ 3, exact-equal names excluded — the record-linkage
    recipe (block → verify) beside the shingle/MinHash family. Both
    engines implement classic Levenshtein, so the oracle is exact."""
    from .operators.dedup import fuzzy_match_pairs

    return fuzzy_match_pairs(
        _t(spark, sf_dir, "part"),
        "p_partkey",
        "p_name",
        max_distance=3,
        exclude_identical=True,
    )


@register(
    "events_ewma_scores",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    g AS (SELECT user_id,
                 list_transform(
                   list_sort(list(struct_pack(
                     t := ts, e := event_id, v := CAST(value AS DOUBLE)))),
                   x -> x.v) AS vals
          FROM ev GROUP BY user_id)
    SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
           CAST(list_reduce(vals, (a, b) -> a * 0.5 + b * 0.5) AS DOUBLE)
             AS ewma_score
    FROM g
    """,
    tags=("events", "sequence", "agg", "extension"),
)
def q_events_ewma_scores(spark, sf_dir):
    """Per-user exponentially weighted moving average of event values
    (operators/sequence.ewma_scores, alpha = 0.5) — the order-dependent
    recency-weighted recursion (pandas ``ewm(adjust=False)``) expressed
    as one key shuffle + an in-row sorted sequential fold. EXACT oracle:
    the fold seeds from the first element and replays left-to-right on
    both engines (DuckDB ``list_reduce`` contract)."""
    from .operators.sequence import ewma_scores

    return ewma_scores(_t(spark, sf_dir, "events"))


@register(
    "array_functions",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           CAST(list_reduce(list_transform(embedding,
                                           x -> CAST(x AS DOUBLE)),
                            (a, b) -> a + b) AS DOUBLE) AS sum_all,
           CAST(list_max(embedding) AS DOUBLE) AS max_val,
           CAST(len(embedding) > 0
                AND len(list_filter(embedding, x -> x < 0)) > 0 AS BOOLEAN)
             AS has_neg,
           CAST(len(list_filter(embedding, x -> abs(x) >= 10)) = 0
                AS BOOLEAN) AS all_small
    FROM embeddings
    """,
    tags=("functions", "similarity", "extension"),
)
def q_array_functions(spark, sf_dir):
    """Higher-order array function surface (transform / filter / exists /
    forall / aggregate / array_max) over the embedding column — the
    in-row vector algebra used across the similarity stack, here as an
    explicit oracle-gated API query. The sum folds sequentially (exact
    cross-engine); everything stays in codegen, zero shuffle."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).cast("int").alias("n_pos"),
        F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x).alias("sum_all"),
        F.array_max(e).alias("max_val"),
        F.exists(e, lambda x: x < 0).alias("has_neg"),
        F.forall(e, lambda x: F.abs(x) < 10).alias("all_small"),
    )


@register(
    "calendar_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP)
             AS due_date,
           CAST(CASE WHEN dayofweek(o_orderdate) IN (0, 6)
                     THEN 1 ELSE 0 END AS INT) AS is_weekend
    FROM orders WHERE o_orderkey % 7 = 0
    """,
    tags=("functions", "extension"),
)
def q_calendar_functions(spark, sf_dir):
    """Calendar/date function surface: year/quarter/month, ISO week,
    month end, date arithmetic, weekend flag — normalized to the shared
    cross-engine definitions (Spark's ``dayofweek`` is 1=Sunday,
    DuckDB's 0=Sunday; the weekend predicate names both). Pure per-row
    projection, zero shuffle."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("int").alias("y"),
        F.quarter(d).cast("int").alias("q"),
        F.month(d).cast("int").alias("m"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.last_day(d.cast("date")).cast("timestamp_ntz").alias("month_end"),
        F.date_add(d.cast("date"), 30).cast("timestamp_ntz").alias("due_date"),
        F.when(F.dayofweek(d).isin(1, 7), 1).otherwise(0).cast("int").alias(
            "is_weekend"
        ),
    )


@register(
    "partitioned_dynamic_overwrite",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    repl AS (SELECT event_id, ts, user_id, event_type,
                    CAST(value * 2 AS DOUBLE) AS value
             FROM ev WHERE event_type = 'click')
    SELECT event_id, ts, user_id, event_type, value
    FROM ev WHERE event_type <> 'click'
    UNION ALL
    SELECT * FROM repl
    """,
    tags=("S6", "lake", "extension"),
)
def q_partitioned_dynamic_overwrite(spark, sf_dir):
    """Dynamic partition overwrite (PartitionedTable.overwrite_partitions
    — Spark's ``partitionOverwriteMode=dynamic`` / Hive ``INSERT
    OVERWRITE ... PARTITION``): a batch containing only the 'click'
    partition replaces exactly that partition; the other four keep their
    prior commit pointers untouched. One partitioned write of the batch,
    metadata-only for everything else."""
    from .sources.partitioned import PartitionedTable

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    pt = PartitionedTable(
        spark, tempfile.mkdtemp(prefix="pt_dyn_"), "event_type"
    )
    pt.overwrite(ev)
    batch = ev.filter(F.col("event_type") == "click").withColumn(
        "value", (F.col("value") * 2).cast("double")
    )
    pt.overwrite_partitions(batch)
    return pt.read().select("event_id", "ts", "user_id", "event_type", "value")


@register(
    "grouped_correlation",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    b AS (SELECT event_type,
                 CAST(CAST(value AS DECIMAL(18,4)) * 10000
                      AS DECIMAL(38,0)) AS xi,
                 CAST(hour(ts) AS DECIMAL(38,0)) AS yi
          FROM ev),
    m AS (SELECT event_type,
                 CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
                 CAST(SUM(xi) AS DECIMAL(38,0)) AS sx,
                 CAST(SUM(yi) AS DECIMAL(38,0)) AS sy,
                 CAST(SUM(xi * xi) AS DECIMAL(38,0)) AS sxx,
                 CAST(SUM(yi * yi) AS DECIMAL(38,0)) AS syy,
                 CAST(SUM(xi * yi) AS DECIMAL(38,0)) AS sxy
          FROM b GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0)) AS DOUBLE)
             / (sqrt(CAST(CAST(n * sxx - sx * sx AS DECIMAL(38,0)) AS DOUBLE))
                * sqrt(CAST(CAST(n * syy - sy * sy AS DECIMAL(38,0)) AS DOUBLE)))
             AS corr
    FROM m
    """,
    tags=("events", "agg", "extension"),
)
def q_grouped_correlation(spark, sf_dir):
    """Exact distributed Pearson correlation (value vs hour-of-day per
    event type). Spark's ``F.corr`` accumulates floats in task order
    (non-deterministic at scale); here every moment accumulates as an
    integer-valued DECIMAL(38,0) — order-independent and exact — and the
    close is a fixed sequence of single correctly-rounded casts, sqrt,
    and one division, so the result is bit-identical cross-engine. The
    scale-0 trick matters: a scaled DECIMAL→DOUBLE cast diverges between
    engines once the scaled mantissa exceeds 2^53 (NOTES.md), while
    scale-0 is one conversion on both. One shuffle on the group key."""
    ev = _t(spark, sf_dir, "events")
    xi = (F.col("value").cast("decimal(18,4)") * F.lit(10000)).cast(
        "decimal(38,0)"
    )
    yi = F.hour("ts").cast("decimal(38,0)")
    b = ev.select("event_type", xi.alias("xi"), yi.alias("yi"))
    m = b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("xi").cast("decimal(38,0)").alias("sx"),
        F.sum("yi").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("xi") * F.col("xi")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("yi") * F.col("yi")).cast("decimal(38,0)").alias("syy"),
        F.sum(F.col("xi") * F.col("yi")).cast("decimal(38,0)").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "decimal(38,0)"
    )
    den1 = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "decimal(38,0)"
    )
    den2 = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "decimal(38,0)"
    )
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        (
            num.cast("double")
            / (F.sqrt(den1.cast("double")) * F.sqrt(den2.cast("double")))
        ).alias("corr"),
    )


@register(
    "session_event_patterns",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    g AS (
      SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS ini,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS new_sess
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts, event_id, ini,
        CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
          AS session_id
      FROM g)
    SELECT user_id, session_id,
           string_agg(ini, '' ORDER BY ts, event_id) AS event_string,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(string_agg(ini, '' ORDER BY ts, event_id) LIKE '%pe%'
                AS BOOLEAN) AS purchase_then_error,
           CAST(regexp_matches(string_agg(ini, '' ORDER BY ts, event_id),
                               'v.*c.*p') AS BOOLEAN) AS funnel_in_session
    FROM s GROUP BY user_id, session_id
    """,
    tags=("events", "sequence", "window", "extension"),
)
def q_session_event_patterns(spark, sf_dir):
    """MATCH_RECOGNIZE-lite sequence pattern detection: each 30-min
    session's events collapse to an ordered initial-letter string (one
    character per event), and patterns become plain string/regex
    predicates — adjacency ('pe': an error immediately after a
    purchase) and in-session subsequence funnels ('v.*c.*p'). The
    ordered string builds from a sorted in-row array (deterministic,
    exact cross-engine); one user-keyed exchange shared by the
    sessionize windows and the rollup."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "__us",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ),
    ).withColumn("ini", F.substring("event_type", 1, 1))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_us = F.lag("__us").over(w)
    new_sess = F.when(
        lag_us.isNull() | (F.col("__us") - lag_us > 1800 * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "session_id",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"),
    )
    estr = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("ts").alias("t"),
                        F.col("event_id").alias("e"),
                        F.col("ini").alias("i"),
                    )
                )
            ),
            lambda x: x["i"],
        ),
        "",
    )
    return sess.groupBy("user_id", "session_id").agg(
        estr.alias("event_string"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        estr.contains("pe").alias("purchase_then_error"),
        estr.rlike("v.*c.*p").alias("funnel_in_session"),
    )


@register(
    "streaming_stream_left_join",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    c AS (SELECT user_id, ts AS click_ts, event_id AS click_id
          FROM ev WHERE event_type = 'click'),
    p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id,
                 value AS purchase_value
          FROM ev WHERE event_type = 'purchase')
    SELECT c.user_id, c.click_ts, p.purchase_ts, c.click_id, p.purchase_id,
           p.purchase_value
    FROM c LEFT JOIN p ON c.user_id = p.user_id
                      AND p.purchase_ts >= c.click_ts
                      AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
    """,
    tags=("streaming", "join", "extension"),
)
def q_streaming_stream_left_join(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join with watermark-driven
    NULL-padding (streaming/events.stream_stream_left_join): outer rows
    only emit when the combined watermark passes their window, so the
    replay stages the real events as batch 1 and two far-future
    sentinel files as batches 2-3 (maxFilesPerTrigger=1) — the sentinel
    advances the watermark past all real data and flushes every
    unmatched click; sentinel rows (user_id = -1) are filtered from the
    gated output. Exact-matches the batch LEFT interval join — the
    eviction semantics every production outer stream join depends on."""
    from .sources.parquet import load_table
    from .streaming.events import (
        EVENTS_SCHEMA,
        stream_stream_left_join,
    )

    stage_dir = tempfile.mkdtemp(prefix="evstream_lj_")
    ev = load_table(spark, sf_dir, "events")
    ev.coalesce(1).write.mode("append").parquet(stage_dir)
    sentinel_cols = ["event_id", "ts", "user_id", "event_type", "value"]
    for i, ts in enumerate(["2024-02-10 00:00:00", "2024-02-11 00:00:00"]):
        spark.createDataFrame(
            [
                (-(2 * i + 1), ts, -1, "click", 0.0),
                (-(2 * i + 2), ts, -1, "purchase", 0.0),
            ],
            "event_id long, ts string, user_id long, event_type string, "
            "value double",
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz")).select(
            *sentinel_cols
        ).coalesce(1).write.mode("append").parquet(stage_dir)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    out = stream_stream_left_join(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    res = run_stream_to_memory(out, output_mode="append")
    return res.filter(F.col("user_id") >= 0)


@register(
    "embedding_group_spectrum",
    tags=("similarity", "udf", "extension"),
)
def q_embedding_group_spectrum(spark, sf_dir):
    """Per-label covariance spectrum of the embedding corpus
    (operators/similarity.grouped_top_eigen): top eigenvalue +
    explained-variance ratio per label via an Arrow-batched grouped-map
    (applyInPandas). Rows-only gate (eigendecomposition is not
    SQL-expressible); pinned against a numpy host reference in
    tests/test_kcenter.py."""
    from .operators.similarity import grouped_top_eigen

    return grouped_top_eigen(_t(spark, sf_dir, "embeddings"))


@register(
    "table_zorder_compaction_lossless",
    oracle="SELECT c_custkey, c_nationkey, c_acctbal FROM customer",
    tags=("S6", "lake", "extension"),
)
def q_table_zorder_compaction_lossless(spark, sf_dir):
    """OPTIMIZE ZORDER as a driver-gated query (previously pytest-only):
    multi-dimensional Z-curve compaction re-clusters the physical layout
    for min/max skipping on every Z-column while the logical content
    stays byte-identical — the oracle is simply the original table.
    The rewrite costs one range exchange + in-partition sort; the
    quantile pass for the Z-buckets is a sampled aggregate."""
    from .sources.tables import VersionedTable

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_z_"))
    vt.overwrite(
        _t(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey", "c_acctbal"
        )
    )
    vt.compact(
        target_partitions=4, zorder_by=["c_nationkey", "c_acctbal"]
    )
    return vt.read()


@register(
    "xml_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE c_custkey % 11 = 0
    """,
    tags=("functions", "sources", "extension"),
)
def q_xml_roundtrip(spark, sf_dir):
    """Spark 4 native XML surface: each row serializes through
    ``to_xml(struct(...))`` and parses back with ``from_xml`` under an
    explicit schema — the oracle is the original projection, so the gate
    proves the XML codec is lossless for the typed columns (the same
    roundtrip-identity pattern as ``orc_roundtrip``). Per-row codec,
    zero shuffle."""
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 11 == 0)
        .select("c_custkey", "c_name", "c_mktsegment")
    )
    xml = cust.select(
        F.to_xml(F.struct("c_custkey", "c_name", "c_mktsegment")).alias("x")
    )
    return xml.select(
        F.from_xml(
            "x", "c_custkey bigint, c_name string, c_mktsegment string"
        ).alias("p")
    ).select("p.*")


@register(
    "parameterized_sql",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer WHERE c_acctbal > 1000.0 AND c_nationkey < 10
    GROUP BY c_mktsegment
    """,
    tags=("functions", "extension"),
)
def q_parameterized_sql(spark, sf_dir):
    """Spark 4 parameterized SQL (named-marker binding via
    ``spark.sql(..., args=...)``) — the injection-safe front door for
    templated analytics; markers bind as typed literals, so Catalyst
    constant-folds and pushes them down exactly like inline literals.
    The oracle inlines the same values."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_bal
        FROM customer WHERE c_acctbal > :min_bal AND c_nationkey < :max_nation
        GROUP BY c_mktsegment
        """,
        args={"min_bal": 1000.0, "max_nation": 10},
    )


@register(
    "key_skew_diagnosis",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM ev GROUP BY event_type),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
                 CAST(COUNT(*) AS BIGINT) AS n_keys FROM c),
    r AS (SELECT event_type, cnt,
                 CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, event_type ASC)
                      AS INT) AS rank,
                 CAST(cnt AS DOUBLE) / CAST(total_rows AS DOUBLE) AS share,
                 CAST(cnt AS DOUBLE)
                   / (CAST(total_rows AS DOUBLE) / CAST(n_keys AS DOUBLE))
                   AS skew_factor
          FROM c, t)
    SELECT event_type, cnt, rank, share, skew_factor FROM r WHERE rank <= 10
    """,
    tags=("scale", "agg", "extension"),
)
def q_key_skew_diagnosis(spark, sf_dir):
    """Shuffle-key skew diagnosis (operators/scale.key_skew_stats): the
    heaviest key values with their load share and ratio to the mean key
    load — the one-pass measurement behind salting fan-out and AQE
    skew-join decisions. EXACT oracle (BIGINT counts, fixed IEEE
    closes)."""
    from .operators.scale import key_skew_stats

    return key_skew_stats(_t(spark, sf_dir, "events"), "event_type")


@register(
    "curation_pipeline_round5",
    oracle=f"""
    WITH g AS ({_SQL_GOPHER}),
    kept AS (SELECT d.doc_id, d.source, d.text
             FROM documents d JOIN g ON g.doc_id = d.doc_id
             WHERE g.gopher_ok),
    c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS dn
          FROM kept GROUP BY source),
    t AS (SELECT CAST(SUM(dn) AS BIGINT) AS total FROM c),
    w AS (SELECT source, dn, total,
                 sqrt(CAST(dn AS DOUBLE) / CAST(total AS DOUBLE)) AS wr
          FROM c, t),
    z AS (SELECT list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(s := source, w := wr))),
                     x -> x.w),
                   (a, b) -> a + b) AS z
          FROM w),
    wt AS (SELECT source,
                  CAST(floor((wr / z.z) * CAST(total AS DOUBLE)
                             / CAST(dn AS DOUBLE) * 1000000.0) AS BIGINT)
                    AS wi
           FROM w, z),
    doc_w AS (SELECT kept.doc_id, kept.source, kept.text, wt.wi
              FROM kept JOIN wt USING (source)),
    wtot AS (SELECT CAST(SUM(wi) AS BIGINT) AS w_total FROM doc_w)
    SELECT doc_id, source, wi,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
             AS ws_tokens
    FROM doc_w, wtot
    WHERE CAST(CAST(concat('0x',
                           substr(md5('cap5' || CAST(doc_id AS VARCHAR)),
                                  1, 15)) AS BIGINT) AS DOUBLE)
          * CAST(w_total AS DOUBLE)
        < 200.0 * CAST(wi AS DOUBLE) * 1152921504606846976.0
    """,
    tags=("text", "sampling", "corpus", "extension", "pipeline"),
)
def q_curation_pipeline_round5(spark, sf_dir):
    """Round-5 curation capstone — the new operators composed end-to-end,
    every stage exact: Gopher quality gate → temperature-scaled domain
    mixture weights (alpha 0.5, sqrt-exact) → integerized per-doc
    weights → deterministic weight-proportional Poisson sample (salted
    portable hash) → token accounting on the survivors. Three tiny
    domain-level aggregates + one scan-speed filter; the corpus itself
    never shuffles. The whole chain replays in one oracle SQL — the
    composition, not just each stage, is verified."""
    from .operators.sampling import weighted_sample
    from .operators.text import (
        gopher_quality_flags,
        temperature_mixture_weights,
        with_token_count,
    )

    docs = _t(spark, sf_dir, "documents")
    flags = gopher_quality_flags(docs, min_stopwords=1).select(
        "doc_id", "gopher_ok"
    )
    # the filtered corpus feeds the mixture aggregate AND the weighted
    # join probe — cache it so the Gopher battery runs once per pipeline,
    # not once per downstream reference
    kept = docs.join(flags, "doc_id").filter(F.col("gopher_ok")).persist()
    weights = temperature_mixture_weights(kept).withColumn(
        "wi", F.floor(F.col("mix_weight") * F.lit(1000000.0)).cast("bigint")
    )
    doc_w = kept.select("doc_id", "text").join(
        weights.select("doc_id", "source", "wi"), "doc_id"
    )
    sampled = weighted_sample(
        doc_w, "doc_id", "wi", target_rows=200, salt="cap5"
    )
    return with_token_count(sampled).select(
        "doc_id", "source", "wi", "ws_tokens"
    )


@register(
    "referential_integrity_audit",
    oracle="""
    SELECT 'orders->customer' AS relationship,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_orphans,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'lineitem->orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'lineitem->part',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    """,
    tags=("agg", "join", "extension"),
)
def q_referential_integrity_audit(spark, sf_dir):
    """Referential-integrity audit across the star schema: orphan counts
    per foreign-key relationship via left-anti joins (the data-quality
    check lake formats cannot enforce natively — fact rows referencing
    missing dimension keys). Each relationship costs one anti-join with
    the dimension's key column broadcast; counts are exact."""
    checks = [
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ]
    out = None
    for name, fact, fk, dim, pk in checks:
        f = _t(spark, sf_dir, fact)
        d = _t(spark, sf_dir, dim).select(F.col(pk).alias(fk))
        orphans = f.join(F.broadcast(d), fk, "left_anti").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orphans")
        )
        row = orphans.crossJoin(
            f.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        ).select(
            F.lit(name).alias("relationship"), "n_orphans", "n_rows"
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "embedding_mrl_truncate",
    oracle="""
    WITH b AS (
      SELECT vec_id,
             list_transform(embedding[1:16], x -> CAST(x AS DOUBLE)) AS head
      FROM embeddings),
    n AS (
      SELECT vec_id, head,
             sqrt(list_reduce(list_transform(head, x -> x * x),
                              (a, b) -> a + b)) AS head_norm
      FROM b)
    SELECT vec_id, head_norm,
           list_transform(head, x -> x / head_norm) AS unit_head
    FROM n
    """,
    tags=("similarity", "functions", "extension"),
)
def q_embedding_mrl_truncate(spark, sf_dir):
    """Matryoshka-style dimension truncation (MRL): keep the first 16
    embedding dimensions and re-normalize to unit length — the
    storage/latency trade modern nested-representation models are
    trained for (coarse search on the prefix, full-dim re-rank). The
    norm is a sequential squared fold + sqrt (exact cross-engine) and
    each element divides by the identical norm, so the truncated unit
    vectors replay bit-for-bit. Per-row arithmetic, zero shuffle."""
    emb = _t(spark, sf_dir, "embeddings")
    head = F.transform(
        F.slice(F.col("embedding"), 1, 16), lambda x: x.cast("double")
    )
    b = emb.select("vec_id", head.alias("head"))
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("head"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    n = b.withColumn("head_norm", norm)
    return n.select(
        "vec_id",
        "head_norm",
        F.transform(
            F.col("head"), lambda x: x / F.col("head_norm")
        ).alias("unit_head"),
    )


_SQL_CMS = r"""
      SELECT CAST(d AS INT) AS depth,
             CAST(CAST(concat('0x', substr(md5(chr(CAST(65 + d AS INT)) || t), 1, 15))
                       AS BIGINT) % 256 AS INT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS t
            FROM documents) tok,
           UNNEST(generate_series(0, 3)) AS u(d)
      GROUP BY 1, 2
    """


@register(
    "count_min_sketch_rows",
    oracle=_SQL_CMS,
    tags=("agg", "scale", "extension"),
)
def q_count_min_sketch_rows(spark, sf_dir):
    """Count-Min sketch construction (operators/text.count_min_sketch,
    depth 4 × width 256): fixed-memory frequency summary whose state is
    depth×width counters regardless of vocabulary — the streaming
    complement to the exact heavy-hitters pass. The sketch is hash-
    deterministic, so the ENTIRE sketch (not just estimates) replays
    exactly in the oracle."""
    from .operators.text import count_min_sketch

    return count_min_sketch(_t(spark, sf_dir, "documents"))


@register(
    "count_min_estimates",
    oracle=f"""
    WITH sketch AS ({_SQL_CMS}),
    probes AS (SELECT unnest(['the', 'join', 'dup', 'qqqq']) AS token),
    pb AS (SELECT token, d,
                  CAST(CAST(concat('0x',
                                   substr(md5(chr(CAST(65 + d AS INT)) || token), 1, 15))
                            AS BIGINT) % 256 AS INT) AS bucket
           FROM probes, UNNEST(generate_series(0, 3)) AS u(d))
    SELECT token, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS estimate
    FROM pb LEFT JOIN sketch
      ON sketch.depth = pb.d AND sketch.bucket = pb.bucket
    GROUP BY token
    """,
    tags=("agg", "scale", "extension"),
)
def q_count_min_estimates(spark, sf_dir):
    """Count-Min point queries: per probe token the min counter across
    depth rows — always ≥ the true count, within eps·N whp. Probe
    buckets compute driver-side from the same portable hash; the
    deterministic sketch makes even the estimates oracle-exact."""
    from .operators.text import count_min_estimate, count_min_sketch

    from .operators.text import DEFAULT_CMS_DEPTH

    sketch = count_min_sketch(_t(spark, sf_dir, "documents"))
    return count_min_estimate(
        sketch, ["the", "join", "dup", "qqqq"], depth=DEFAULT_CMS_DEPTH
    )


@register(
    "join_full_outer",
    oracle="""
    WITH a AS (SELECT c_custkey, c_mktsegment FROM customer
               WHERE c_custkey % 2 = 0),
    b AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders WHERE o_custkey % 3 = 0 GROUP BY o_custkey)
    SELECT COALESCE(a.c_custkey, b.o_custkey) AS custkey,
           a.c_mktsegment, b.n_orders
    FROM a FULL OUTER JOIN b ON a.c_custkey = b.o_custkey
    """,
    tags=("join", "extension"),
)
def q_join_full_outer(spark, sf_dir):
    """FULL OUTER equi join (the one batch join flavor not yet a
    standalone gate — it anchors the CDF diff internally): customers on
    even keys vs order counts on keys divisible by 3; unmatched sides
    NULL-pad. One shuffle per side on the key."""
    a = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 2 == 0)
        .select("c_custkey", "c_mktsegment")
    )
    b = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 3 == 0)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    return a.join(b, a["c_custkey"] == b["o_custkey"], "full_outer").select(
        F.coalesce(a["c_custkey"], b["o_custkey"]).alias("custkey"),
        "c_mktsegment",
        "n_orders",
    )


@register(
    "skew_safe_top1",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    r AS (SELECT event_type, event_id, ts, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id ASC) AS rn
          FROM ev)
    SELECT event_type, event_id AS top_event_id, ts AS top_ts,
           value AS top_value
    FROM r WHERE rn = 1
    """,
    tags=("agg", "scale", "window", "extension"),
)
def q_skew_safe_top1(spark, sf_dir):
    """Skew-safe per-group argmax: the top-value event per type via ONE
    hash aggregate of an ordered struct (map-side combine keeps hot keys
    off a single task) instead of a ranked window (which funnels every
    hot-key row through one partition). The struct orders (value desc
    via negation-free compare, then LOWEST event_id) so ties are
    deterministic; the oracle states the same contract as a window. At
    100 TB this is the difference between a straggler-free aggregate
    and a hot-partition sort."""
    ev = _t(spark, sf_dir, "events")
    # struct comparison is lexicographic: maximize value, then prefer the
    # smallest event_id on ties -> maximize (value, -event_id)
    best = F.max(
        F.struct(
            F.col("value").alias("v"),
            (-F.col("event_id")).alias("neg_id"),
            F.col("ts").alias("t"),
        )
    )
    return (
        ev.groupBy("event_type")
        .agg(best.alias("b"))
        .select(
            "event_type",
            (-F.col("b.neg_id")).cast("bigint").alias("top_event_id"),
            F.col("b.t").alias("top_ts"),
            F.col("b.v").alias("top_value"),
        )
    )


@register(
    "csv_function_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
    tags=("functions", "sources", "extension"),
)
def q_csv_function_roundtrip(spark, sf_dir):
    """In-row CSV codec (``to_csv``/``from_csv`` FUNCTIONS, distinct
    from the S1 file source): each nation row serializes to a CSV line
    and parses back under an explicit schema — oracle = the original
    projection, so the codec must be lossless for the typed columns
    (the roundtrip-identity pattern of ``xml_roundtrip``/
    ``orc_roundtrip``). Per-row, zero shuffle."""
    nat = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    line = nat.select(
        F.to_csv(
            F.struct("n_nationkey", "n_name", "n_regionkey")
        ).alias("line")
    )
    return line.select(
        F.from_csv(
            "line", "n_nationkey bigint, n_name string, n_regionkey bigint"
        ).alias("p")
    ).select("p.*")


@register(
    "grouped_weighted_median",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    b AS (SELECT event_type, value,
                 CAST(event_id % 7 + 1 AS BIGINT) AS w, event_id
          FROM ev),
    c AS (SELECT event_type, value, w,
                 SUM(w) OVER (PARTITION BY event_type
                              ORDER BY value, event_id
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 SUM(w) OVER (PARTITION BY event_type) AS total
          FROM b)
    SELECT event_type,
           MIN(value) AS weighted_median,
           CAST(MIN(total) AS BIGINT) AS total_weight
    FROM c WHERE cum * 2 >= total
    GROUP BY event_type
    """,
    tags=("events", "agg", "window", "extension"),
)
def q_grouped_weighted_median(spark, sf_dir):
    """Exact lower weighted median per group: the smallest value whose
    cumulative weight reaches half the group's total — the
    survey-weighting / importance-weighted robust location estimate.
    Integer weights keep the crossing test exact (``2·cum ≥ total`` in
    BIGINT); the chosen VALUE is tie-order-independent even though
    per-row cumulative sums are not. One group-key shuffle shared by
    both windows and the final aggregate."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        "value",
        (F.col("event_id") % 7 + 1).cast("bigint").alias("w"),
        "event_id",
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    c = b.withColumn("cum", F.sum("w").over(w_cum)).withColumn(
        "total", F.sum("w").over(w_all)
    )
    return (
        c.filter(F.col("cum") * 2 >= F.col("total"))
        .groupBy("event_type")
        .agg(
            F.min("value").alias("weighted_median"),
            F.min("total").cast("bigint").alias("total_weight"),
        )
    )


@register(
    "events_activity_heatmap",
    oracle=f"""
    WITH ev AS ({_EV_SQL})
    SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM ev GROUP BY 1, 2
    """,
    tags=("events", "agg", "extension"),
)
def q_events_activity_heatmap(spark, sf_dir):
    """Day-of-week × hour-of-day activity heatmap — the operational
    traffic-shape matrix (at most 7×24 output rows however large the
    input). Spark's ``dayofweek`` is 1=Sunday vs DuckDB's 0=Sunday; the
    oracle normalizes, value sums stay DECIMAL. One map-side-combined
    aggregate on a 168-key space; the distinct-user count is the only
    non-collapsible term (exact here; swap to HLL at 100 TB — the
    approx_stats pattern)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour_of_day"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "exact_k_per_language",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang, source,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                      1, 15)) AS BIGINT) AS hv
      FROM documents),
    r AS (SELECT doc_id, lang, source,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY hv ASC, doc_id ASC) AS rk
          FROM h)
    SELECT doc_id, lang, source FROM r WHERE rk <= 10
    """,
    tags=("sampling", "extension"),
)
def q_exact_k_per_language(spark, sf_dir):
    """Exact-k stratified selection (operators/sampling.
    exact_k_per_stratum): exactly 10 documents per language, chosen by
    portable-hash rank — deterministic per-group reservoir sampling,
    identical on any engine or cluster layout. One stratum-key shuffle."""
    from .operators.sampling import exact_k_per_stratum

    return exact_k_per_stratum(
        _t(spark, sf_dir, "documents").select("doc_id", "lang", "source"),
        "lang",
        "doc_id",
        k=10,
    )


@register(
    "table_changes_per_commit",
    oracle=f"""
    WITH t AS ({_SQL_TGT9}), m AS ({_SQL_MERGE_HUDI}),
    step1 AS (
      SELECT *, 'insert' AS _change_type, CAST(1 AS INT) AS _commit_version
      FROM (SELECT * FROM m EXCEPT ALL SELECT * FROM t)
      UNION ALL
      SELECT *, 'delete', 1
      FROM (SELECT * FROM t EXCEPT ALL SELECT * FROM m)),
    step2 AS (
      SELECT *, 'insert' AS _change_type, CAST(2 AS INT) AS _commit_version
      FROM (SELECT * FROM t EXCEPT ALL SELECT * FROM m)
      UNION ALL
      SELECT *, 'delete', 2
      FROM (SELECT * FROM m EXCEPT ALL SELECT * FROM t))
    SELECT * FROM step1 UNION ALL SELECT * FROM step2
    """,
    tags=("S2", "cdc", "extension"),
)
def q_table_changes_per_commit(spark, sf_dir):
    """True Delta CDF range semantics (``changes_per_commit``): one
    multiset diff PER COMMIT, each tagged ``_commit_version`` — the
    fixture merges at v1 then RESTOREs the original at v2, so the range
    read shows both the churn and its reversal (an endpoint ``changes``
    would net the whole range to empty)."""
    from .sources.tables import VersionedTable

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_cdcpc_"))
    vt.overwrite(scd2_target(spark, sf_dir))
    vt.overwrite(
        scd2_merge_hudi_style(
            vt.read(), customer_updates(spark, sf_dir), "c_custkey", CHECKSUM_COLS, as_of=T2
        )
    )
    vt.restore(0)
    return vt.changes_per_commit(0, 2)


@register(
    "rank_distribution_functions",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk
    FROM customer
    WHERE c_custkey % 5 = 0
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window", "extension"),
)
def q_rank_distribution_functions(spark, sf_dir):
    """The rank-distribution window family (percent_rank, cume_dist,
    rank, dense_rank) over account balance within segment — both are
    exact rank arithmetic closed by one IEEE division, so the floats
    match bit-for-bit. The deterministic (balance, key) ordering keeps
    rank() and percent_rank() stable under ties."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 5 == 0)
        .select(
            "c_custkey",
            "c_mktsegment",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
        )
    )


@register(
    "try_arithmetic_functions",
    oracle="""
    SELECT o_orderkey,
           o_totalprice / nullif(CAST(o_orderkey % 10 AS DOUBLE), 0)
             AS safe_div,
           TRY_CAST(o_orderpriority AS BIGINT) AS bad_cast,
           TRY_CAST(split_part(o_orderpriority, '-', 1) AS BIGINT)
             AS prio_num
    FROM orders WHERE o_orderkey % 13 = 0
    """,
    tags=("functions", "extension"),
)
def q_try_arithmetic_functions(spark, sf_dir):
    """Error-safe arithmetic under ANSI mode (Spark 4 ``try_divide`` /
    ``try_cast``): division by zero and unparseable casts yield NULL
    instead of failing the job — the contract dirty-data pipelines rely
    on where strict ANSI would abort on one bad row. ``try_cast`` of
    the priority's numeric prefix exercises the parse-success path
    beside the parse-failure one."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    return o.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice"), (F.col("o_orderkey") % 10).cast("double")
        ).alias("safe_div"),
        F.col("o_orderpriority").try_cast("bigint").alias("bad_cast"),
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1))
        .try_cast("bigint")
        .alias("prio_num"),
    )


@register(
    "doc_novelty_scores",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                                   i -> array_to_string(t[i:i+2], ' ')))
               AS s
      FROM tok),
    df_t AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS sdf FROM sh GROUP BY s),
    per AS (
      SELECT sh.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN sdf = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique
      FROM sh JOIN df_t USING (s) GROUP BY sh.doc_id)
    SELECT d.doc_id,
           COALESCE(per.n_shingles, 0) AS n_shingles,
           COALESCE(per.n_unique, 0) AS n_unique,
           CAST(COALESCE(per.n_unique, 0) AS DOUBLE)
             / CAST(NULLIF(COALESCE(per.n_shingles, 0), 0) AS DOUBLE)
             AS novelty
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
    tags=("text", "dedup", "corpus", "extension"),
)
def q_doc_novelty_scores(spark, sf_dir):
    """Document novelty (operators/text.novelty_scores): the fraction
    of each document's distinct 3-token shingles appearing in NO other
    document — low novelty flags templated/duplicated content even when
    no pair crosses a dedup threshold, the inverse of the
    boilerplate-span signal. Exact BIGINT counts, one closing
    division; shingle-less docs (< 3 tokens — absent from this corpus)
    report NULL novelty, guarded inside the operator and via NULLIF in
    the oracle (never NaN)."""
    from .operators.text import novelty_scores

    return novelty_scores(_t(spark, sf_dir, "documents"))


@register(
    "abc_pareto_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS DECIMAL(38,2)) AS revenue
      FROM lineitem GROUP BY l_partkey),
    c AS (
      SELECT l_partkey, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(revenue) OVER () AS total
      FROM rev)
    SELECT l_partkey, CAST(revenue AS DOUBLE) AS revenue,
           CASE WHEN cum * 10 <= total * 7 THEN 'A'
                WHEN cum * 10 <= total * 9 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c
    """,
    tags=("agg", "window", "extension"),
)
def q_abc_pareto_classification(spark, sf_dir):
    """ABC/Pareto classification: parts ranked by revenue, classed A/B/C
    at 70%/90% cumulative share. The cumulative sums stay DECIMAL and
    the thresholds compare as integer-scaled DECIMAL products
    (``cum·10 ≤ total·7``) — the classification is exact, no float
    boundary rides. The global-order window is the inherent cost of a
    cumulative-share ranking (sort by one measure); the input is the
    part-level aggregate, not the fact table."""
    rev = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("revenue")
        )
    )
    w_cum = Window.orderBy(
        F.col("revenue").desc(), F.col("l_partkey")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    c = rev.withColumn("cum", F.sum("revenue").over(w_cum)).withColumn(
        "total", F.sum("revenue").over(w_all)
    )
    return c.select(
        "l_partkey",
        F.col("revenue").cast("double").alias("revenue"),
        F.when(F.col("cum") * 10 <= F.col("total") * 7, "A")
        .when(F.col("cum") * 10 <= F.col("total") * 9, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


# --------------------------------------------------------------------------
# round 6: mergeable sketch aggregates (DataSketches HLL / Theta / KLL)
# --------------------------------------------------------------------------


@register(
    "hll_distinct_types_by_brand",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(DISTINCT p_type) AS BIGINT) AS distinct_est
    FROM part GROUP BY p_brand
    """,
    tags=("agg", "sketch", "extension"),
)
def q_hll_distinct_types_by_brand(spark, sf_dir):
    """Per-group distinct count via a mergeable HLL sketch
    (operators/sketches.grouped_distinct_hll). EXACT oracle by the
    sparse-mode contract: a DataSketches HLL is exact below its coupon
    capacity, and gate-scale group cardinalities (≤ tens) sit far under
    lgk=12's threshold — at 100 TB the same one-shuffle plan degrades to
    ~0.8% RSE while the shuffle stays sketch-sized per group instead of
    carrying the distinct key set like COUNT(DISTINCT)."""
    from .operators.sketches import grouped_distinct_hll

    return grouped_distinct_hll(
        _t(spark, sf_dir, "part"), ["p_brand"], "p_type"
    )


@register(
    "theta_custkey_halfyear_overlap",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                 AND o_orderdate < TIMESTAMP '1995-07-01'),
    b AS (SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-07-01'
            AND o_orderdate < TIMESTAMP '1996-01-01')
    SELECT CAST((SELECT COUNT(*) FROM (SELECT o_custkey FROM a
                                       UNION SELECT o_custkey FROM b))
                AS BIGINT) AS union_est,
           CAST((SELECT COUNT(*) FROM (SELECT o_custkey FROM a
                                       INTERSECT SELECT o_custkey FROM b))
                AS BIGINT) AS intersection_est,
           CAST((SELECT COUNT(*) FROM (SELECT o_custkey FROM a
                                       EXCEPT SELECT o_custkey FROM b))
                AS BIGINT) AS difference_est
    """,
    tags=("agg", "sketch", "extension"),
)
def q_theta_custkey_halfyear_overlap(spark, sf_dir):
    """Customer-audience set algebra between two half-years via Theta
    sketches (operators/sketches.theta_set_cardinalities): |A∪B|,
    |A∩B|, |A\\B| computed from TWO sketch rows — the churn/overlap/
    contamination primitive. Each cohort reduces map-side to one
    bounded sketch; no distinct-key shuffle, no cohort join. EXACT
    oracle below the sketch's 2^12 retained-hash capacity (gate scale);
    ~1.6% RSE beyond."""
    from .operators.sketches import theta_set_cardinalities

    o = _t(spark, sf_dir, "orders")
    a = o.filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1995-07-01")
    )
    b = o.filter(
        (F.col("o_orderdate") >= "1995-07-01")
        & (F.col("o_orderdate") < "1996-01-01")
    )
    return theta_set_cardinalities(a, b, "o_custkey")


@register(
    "hll_rollup_distinct_parts", oracle=None, tags=("agg", "sketch", "extension")
)
def q_hll_rollup_distinct_parts(spark, sf_dir):
    """The sketch property COUNT(DISTINCT) cannot offer: per-supplier
    HLL partials re-aggregated to a GLOBAL distinct-part estimate
    without rescanning the fact table
    (operators/sketches.hll_partial_sketches + hll_rollup — the
    persisted-partials rollup a 100 TB lakehouse runs per day/source).
    Rows-only: the union path re-estimates from merged registers, which
    is not guaranteed integer-exact like the sparse direct path;
    tests/test_sketches.py pins the estimate within 2% of exact and the
    rollup equal to the direct whole-table sketch."""
    from .operators.sketches import hll_partial_sketches, hll_rollup

    li = _t(spark, sf_dir, "lineitem")
    partials = hll_partial_sketches(li, ["l_suppkey"], "l_partkey", lgk=14)
    return hll_rollup(partials, [])


@register(
    "kll_nchars_quantiles", oracle=None, tags=("agg", "sketch", "extension")
)
def q_kll_nchars_quantiles(spark, sf_dir):
    """Document-length quantile profile from a mergeable KLL sketch
    (operators/sketches.kll_quantile_profile): p10/p50/p90 of n_chars
    as one map-side-combined aggregate whose state is persistable and
    re-mergeable across snapshots — the streaming/rollup-friendly twin
    of approxQuantile's driver action. Rows-only by design: KLL
    compaction is randomized (rank-error contract, not bit-equality);
    tests/test_sketches.py bounds the rank error against exact
    quantiles."""
    from .operators.sketches import kll_quantile_profile

    return kll_quantile_profile(
        _t(spark, sf_dir, "documents"), "n_chars", [0.1, 0.5, 0.9]
    )


@register(
    "streaming_distinct_users_hll",
    oracle="""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events
    """,
    tags=("streaming", "sketch", "extension"),
)
def q_streaming_distinct_users_hll(spark, sf_dir):
    """Streaming running distinct-user count as an HLL sketch aggregate
    (streaming/events.stream_distinct_users_hll): bounded state for an
    unbounded key space — the composition point of the sketch layer and
    Structured Streaming. Single-batch replay makes the final
    complete-mode emission equal the batch COUNT(DISTINCT); EXACT oracle
    below the sketch's sparse capacity (gate-scale user counts)."""
    from .streaming.events import stream_distinct_users_hll

    return run_stream_to_memory(
        stream_distinct_users_hll(_events_stream(spark, sf_dir)),
        output_mode="complete",
    )


@register(
    "table_revert_commit",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0
    UNION ALL
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 7 = 0
    """,
    tags=("S2", "lake", "extension"),
)
def q_table_revert_commit(spark, sf_dir):
    """Git-revert for table commits (sources/tables.revert — composed
    from the CDF multiset algebra; restore's surgical sibling): base
    (÷3 keys) + append ÷5 keys + append ÷7 keys, then revert the ÷5
    commit — the final state must be EXACTLY base ⊎ ÷7 batch by
    multiset algebra (overlapping keys keep their multiplicities),
    which is what the UNION ALL oracle states. Later commits survive;
    history grows (no rewrite). cherry_pick (the same delta applied
    forward, Iceberg's WAP-race recovery) is exercised in
    tests/test_table_store.py."""
    import tempfile

    from .sources.tables import VersionedTable

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_revert_q_"))
    vt.overwrite(cust.filter(F.col("c_custkey") % 3 == 0))
    vt.append(cust.filter(F.col("c_custkey") % 5 == 0))
    vt.append(cust.filter(F.col("c_custkey") % 7 == 0))
    vt.revert(1)
    return vt.read()


@register(
    "time_travel_sql",
    oracle="""
    WITH v0 AS (SELECT c_custkey, c_mktsegment FROM customer
                WHERE c_custkey % 6 = 0),
    v1 AS (SELECT c_custkey, c_mktsegment FROM customer
           WHERE c_custkey % 9 = 0)
    SELECT v0.c_custkey, v0.c_mktsegment,
           CASE WHEN v1.c_custkey IS NULL THEN 0 ELSE 1 END AS still_present
    FROM v0 LEFT JOIN v1 USING (c_custkey, c_mktsegment)
    """,
    tags=("S2", "lake", "sql", "extension"),
)
def q_time_travel_sql(spark, sf_dir):
    """Delta time-travel SELECT syntax through the SQL front-end
    (operators/merge_sql.run_dml): each ``FROM t VERSION AS OF n``
    reference resolves independently via the table's snapshot plumbing,
    so ONE statement reads TWO versions of the same table — here v0
    rows annotated with whether they survived into v1 (the
    change-audit query time travel exists for). Exact oracle: the two
    versions are deterministic customer slices (÷6 and ÷9 keys)."""
    import tempfile

    from .sources.tables import VersionedTable

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_tt_q_"))
    vt.overwrite(cust.filter(F.col("c_custkey") % 6 == 0))   # v0
    vt.overwrite(cust.filter(F.col("c_custkey") % 9 == 0))   # v1
    from .operators.merge_sql import run_dml

    return run_dml(
        spark,
        "SELECT a.c_custkey, a.c_mktsegment, "
        "CASE WHEN b.c_custkey IS NULL THEN 0 ELSE 1 END AS still_present "
        "FROM t VERSION AS OF 0 a "
        "LEFT JOIN t VERSION AS OF 1 b "
        "ON a.c_custkey = b.c_custkey AND a.c_mktsegment = b.c_mktsegment",
        tables={"t": vt},
    )


@register(
    "bpe_tokenize_corpus", oracle=None, tags=("text", "corpus", "extension")
)
def q_bpe_tokenize_corpus(spark, sf_dir):
    """The tokenizer loop closed end-to-end: bpe_train learns 20 merge
    rules from the corpus word-frequency table (ONE distributed
    aggregate; the merge loop runs driver-side over the
    vocabulary-bounded dict, the same driver-state contract as PQ
    codebooks), then bpe_apply tokenizes every document with the rules
    in the task closure and a per-batch word→tokens memo (cost tracks
    DISTINCT words per batch). Rows-only: the merge loop is iterative
    and the tokenization per-word greedy — not SQL-expressible;
    tests/test_text_ops.py pins operator output exactly equal to a
    pure-Python reference implementation."""
    from .operators.text import bpe_apply, bpe_train

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=20)
    return bpe_apply(docs, merges)


@register(
    "lakehouse_lifecycle_round6",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 4 = 1
    UNION ALL
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 4 = 2
    """,
    tags=("S2", "lake", "sql", "extension"),
)
def q_lakehouse_lifecycle_round6(spark, sf_dir):
    """Round-6 lifecycle capstone, one exact oracle across the new
    surface: two landing files ingested via COPY INTO (file-granular
    idempotence — the second COPY is a no-op), a bad batch appended and
    surgically unpicked with CALL system.revert_commit, the table
    OPTIMIZE-compacted (stats auto-refresh), and the final state read
    back — which must equal exactly the two ingested slices, as the
    UNION ALL oracle states."""
    import tempfile

    from .operators.merge_sql import run_dml
    from .sources.tables import VersionedTable

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    landing = tempfile.mkdtemp(prefix="vt_landing_")
    cust.filter(F.col("c_custkey") % 4 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(landing + "/f1")
    cust.filter(F.col("c_custkey") % 4 == 2).coalesce(1).write.mode(
        "overwrite"
    ).parquet(landing + "/f2")

    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_life_"))
    vt.overwrite(cust.limit(0))                                   # v0 seed
    tables = {"t": vt}
    run_dml(
        spark,
        f"COPY INTO t FROM '{landing}' PATTERN = '*.parquet'",
        tables=tables,
    )                                                             # v1
    assert run_dml(
        spark,
        f"COPY INTO t FROM '{landing}' PATTERN = '*.parquet'",
        tables=tables,
    ).count() == 0  # idempotent re-run loads nothing
    vt.append(cust.filter(F.col("c_custkey") % 4 == 3))           # v2 bad
    run_dml(spark, "CALL system.revert_commit('t', 2)", tables=tables)  # v3
    run_dml(spark, "OPTIMIZE t", tables=tables)                   # v4
    return vt.read()


# --------------------------------------------------------------------------
# Round 6 (second half): scale-join strategies, data-quality expectations,
# clustering, classifier scoring, shard export
# --------------------------------------------------------------------------

@register(
    "bloom_prefilter_join",
    oracle="""
    SELECT l_returnflag,
      COUNT(*) AS n_items,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
    tags=("scale", "join", "extension"),
)
def q_bloom_prefilter_join(spark, sf_dir):
    """Bloom-prefiltered equi join (operators/scale.py): urgent orders are
    the build side (too big to broadcast as rows at 100 TB, but their key
    Bloom bitmap is ~16 KiB), lineitem the probe. The probe is cut by two
    chained broadcast semi joins against the <= 2^17 distinct Bloom
    positions BEFORE its shuffle; the exact join then drops false
    positives, so the result equals the plain join — the oracle IS the
    plain join + aggregate. Spark's AQE runtime Bloom pushdown is the
    automatic flavor of the same strategy; this one is explicit,
    deterministic (seeded xxhash64) and composable."""
    from .operators.scale import bloom_prefilter_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    joined = bloom_prefilter_join(li, urgent, "l_orderkey", how="inner")
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        _dsum(F.expr("l_extendedprice * (1 - l_discount)"), 6).alias("revenue"),
    )


_EXPECT_RULES_SQL = {
    "qty_le_30": "l_quantity <= 30",
    "discount_le_5pct": "l_discount <= 0.05",
    "tax_nonneg": "l_tax >= 0",
    "flag_enum": "l_returnflag IN ('A','N','R')",
}


@register(
    "expectations_report",
    oracle="""
    SELECT rank, rule, CAST(n_rows AS BIGINT) AS n_rows,
      CAST(n_pass AS BIGINT) AS n_pass,
      CAST(n_rows - n_pass AS BIGINT) AS n_fail,
      CAST(n_rows - n_pass AS DOUBLE) / CAST(n_rows AS DOUBLE) AS fail_rate
    FROM (
      SELECT 1 AS rank, 'qty_le_30' AS rule, COUNT(*) AS n_rows,
        SUM(CASE WHEN l_quantity <= 30 THEN 1 ELSE 0 END) AS n_pass
      FROM lineitem
      UNION ALL
      SELECT 2, 'discount_le_5pct', COUNT(*),
        SUM(CASE WHEN l_discount <= 0.05 THEN 1 ELSE 0 END)
      FROM lineitem
      UNION ALL
      SELECT 3, 'tax_nonneg', COUNT(*),
        SUM(CASE WHEN l_tax >= 0 THEN 1 ELSE 0 END)
      FROM lineitem
      UNION ALL
      SELECT 4, 'flag_enum', COUNT(*),
        SUM(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END)
      FROM lineitem
    )
    """,
    tags=("quality", "agg", "extension"),
)
def q_expectations_report(spark, sf_dir):
    """Data-quality expectations report (operators/expectations.py) — the
    DLT/dbt-tests shape: four named rules over lineitem fold into ONE
    aggregation pass (each rule is a conditional count inside a single
    agg; adding a rule adds a partial column, not a scan), exploded back
    to one row per rule with pass/fail counts and fail_rate. The oracle
    states the same counts as four UNION ALL legs."""
    from .operators.expectations import expectations_report

    li = _t(spark, sf_dir, "lineitem")
    return expectations_report(li, dict(_EXPECT_RULES_SQL))


@register(
    "expectations_quarantine",
    oracle="""
    SELECT l_orderkey, l_linenumber,
      concat_ws(',',
        CASE WHEN NOT (l_quantity <= 30) THEN 'qty_le_30' END,
        CASE WHEN NOT (l_discount <= 0.05) THEN 'discount_le_5pct' END,
        CASE WHEN NOT (l_tax >= 0) THEN 'tax_nonneg' END,
        CASE WHEN NOT (l_returnflag IN ('A','N','R')) THEN 'flag_enum' END
      ) AS failed_rules
    FROM lineitem
    WHERE NOT (l_quantity <= 30) OR NOT (l_discount <= 0.05)
       OR NOT (l_tax >= 0) OR NOT (l_returnflag IN ('A','N','R'))
    """,
    tags=("quality", "extension"),
)
def q_expectations_quarantine(spark, sf_dir):
    """Quarantine side of the expectations split: rows failing ANY rule,
    annotated with the comma-joined names of the rules they failed (in
    declaration order — concat_ws skips the NULLs of passed rules). Pure
    per-row projection, no shuffle; the valid side lands, this side goes
    to the quarantine table for triage."""
    from .operators.expectations import quarantine_split

    li = _t(spark, sf_dir, "lineitem")
    _valid, quarantined = quarantine_split(li, dict(_EXPECT_RULES_SQL))
    return quarantined.select("l_orderkey", "l_linenumber", "failed_rules")


@register(
    "embedding_kmeans_clusters",
    tags=("similarity", "clustering", "extension"),
)
def q_embedding_kmeans_clusters(spark, sf_dir):
    """Distributed Lloyd's k-means over the embedding corpus
    (operators/similarity.kmeans_lloyd) — the cluster stage of
    cluster-then-curate pipelines (SemDeDup, topic bucketing, IVF
    codebook training): deterministic first-k seeding, per-iteration
    fused assignment+partial-sums in one mapInPandas scan (only
    batches x k partial rows ever shuffle), driver-side k-row reduce
    with 1e-9 centroid rounding for run-to-run determinism, inertia
    early-stop. Rows-only gate (iterative, not SQL-expressible);
    tests/test_kmeans.py pins assignments and the inertia curve against
    a same-convention numpy host reference. Returns per-cluster sizes +
    mean within-cluster distance of the final model."""
    from .operators.similarity import kmeans_lloyd

    emb = _t(spark, sf_dir, "embeddings")
    assigns, _centroids, _hist = kmeans_lloyd(emb, k=8, max_iters=5)
    return (
        assigns.groupBy("cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .orderBy("cell")
    )


@register(
    "shard_assignment_balance",
    oracle="""
    WITH sharded AS (
      SELECT n_chars,
        CAST(CAST(concat('0x', substr(md5(concat('shardv1:',
             CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 8 AS INTEGER)
          AS shard_id
      FROM documents
    ),
    counts AS (
      SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(n_chars) AS BIGINT) AS total_weight
      FROM sharded GROUP BY shard_id
    )
    SELECT shard_id, n_rows, total_weight,
      CAST(n_rows AS DOUBLE) / (SELECT AVG(n_rows) FROM counts) AS load_ratio
    FROM counts
    """,
    tags=("sharding", "sampling", "extension"),
)
def q_shard_assignment_balance(spark, sf_dir):
    """Stable shard assignment + balance report (operators/sharding.py) —
    the delivery stage of the pipeline: every document lands in one of 8
    shards by salted md5 of its id (same key -> same shard on any run,
    any layout, any engine — the oracle replays the exact hash), with
    per-shard row counts, char weights, and load ratio vs the mean.
    Assignment is a zero-shuffle map; the report one aggregate pass."""
    from .operators.sharding import shard_balance_stats

    docs = _t(spark, sf_dir, "documents")
    return shard_balance_stats(
        docs, "doc_id", n_shards=8, salt="shardv1:", weight_col="n_chars"
    )


@register(
    "quality_classifier_scores",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
        CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
        CAST(least(CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT),
                   256) AS DOUBLE) / 256.0 AS len_norm,
        COALESCE((CAST(length(text) AS BIGINT)
                  - (len(string_split_regex(trim(text), '\\s+')) - 1))
                 / len(string_split_regex(trim(text), '\\s+')), 0.0)
          AS avg_token_len,
        COALESCE(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT)
                 / CAST(length(text) AS BIGINT), 0.0) AS punct_ratio,
        COALESCE(CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|in|to)\\b'))
                      AS BIGINT)
                 / CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT),
                 0.0) AS stopword_ratio
      FROM documents
    )
    SELECT doc_id, n_tokens,
      ((((-0.75 + 1.5 * len_norm) + 0.125 * avg_token_len)
        + -2.25 * punct_ratio) + 1.5 * stopword_ratio) AS quality_z,
      CAST(((((-0.75 + 1.5 * len_norm) + 0.125 * avg_token_len)
        + -2.25 * punct_ratio) + 1.5 * stopword_ratio) >= 0 AS INTEGER)
        AS quality_pass
    FROM feats
    """,
    tags=("text", "quality", "extension"),
)
def q_quality_classifier_scores(spark, sf_dir):
    """Fixed-weight linear quality classifier
    (operators/text.linear_quality_score) — the fastText-classifier
    shape of CCNet-style curation with trained weights as input. The
    gated projection carries the decision value ``quality_z`` (a fixed
    left-to-right IEEE fold of rational features with exact-binary-
    fraction weights — bit-identical cross-engine, replayed literally by
    the oracle) and the 0.5-boundary label; the sigmoid ``quality_prob``
    stays out of the gate (exp() is not cross-engine bit-exact, house
    rule) and is value-tested in tests/test_text_ops.py. Zero shuffle."""
    from .operators.text import linear_quality_score

    docs = _t(spark, sf_dir, "documents")
    return linear_quality_score(docs).select(
        "doc_id", "n_tokens", "quality_z", "quality_pass"
    )


@register(
    "streaming_stream_full_join",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    c AS (SELECT user_id, ts AS click_ts, event_id AS click_id
          FROM ev WHERE event_type = 'click'),
    p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id,
                 value AS purchase_value
          FROM ev WHERE event_type = 'purchase')
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           c.click_ts, p.purchase_ts, c.click_id, p.purchase_id,
           p.purchase_value
    FROM c FULL JOIN p ON c.user_id = p.user_id
                      AND p.purchase_ts >= c.click_ts
                      AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
    """,
    tags=("streaming", "join", "extension"),
)
def q_streaming_stream_full_join(spark, sf_dir):
    """Stream-stream FULL OUTER interval join
    (streaming/events.stream_stream_full_join) — both sides' unmatched
    rows emit NULL-padded once the watermark passes their window
    (unmatched clicks AND unmatched purchases), completing the
    inner/left/full outer family. Same far-future-sentinel replay
    harness as the left join (the sentinel batches advance the
    watermark past all real data to flush both state stores); exact-
    matches the batch FULL interval join."""
    from .sources.parquet import load_table
    from .streaming.events import (
        EVENTS_SCHEMA,
        stream_stream_full_join,
    )

    stage_dir = tempfile.mkdtemp(prefix="evstream_fj_")
    ev = load_table(spark, sf_dir, "events")
    ev.coalesce(1).write.mode("append").parquet(stage_dir)
    sentinel_cols = ["event_id", "ts", "user_id", "event_type", "value"]
    for i, ts in enumerate(["2024-02-10 00:00:00", "2024-02-11 00:00:00"]):
        spark.createDataFrame(
            [
                (-(2 * i + 1), ts, -1, "click", 0.0),
                (-(2 * i + 2), ts, -1, "purchase", 0.0),
            ],
            "event_id long, ts string, user_id long, event_type string, "
            "value double",
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz")).select(
            *sentinel_cols
        ).coalesce(1).write.mode("append").parquet(stage_dir)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    out = stream_stream_full_join(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    res = run_stream_to_memory(out, output_mode="append")
    return res.filter(F.col("user_id") >= 0)


@register(
    "incremental_join_mv_refresh",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_custkey % 7 != 3
    GROUP BY 1
    """,
    tags=("agg", "lake", "join", "extension"),
)
def q_incremental_join_mv_refresh(spark, sf_dir):
    """Incremental maintenance of a view over an EQUI JOIN
    (operators/materialized.refresh_join_aggregate_view) — the harder
    IVM case: V = γ_segment(orders ⋈ customer) is built on stale
    states (a third of the orders missing), then BOTH base tables
    change (order inserts AND customer deletes) and the stored view is
    refreshed via the delta-join identity ΔA⋈B + A⋈ΔB + ΔA⋈ΔB — the
    cross term live because inserted orders DO join deleted customers.
    The refreshed view must equal a from-scratch aggregate of the final
    join bit-for-bit (DECIMAL folds), which the oracle computes."""
    from .operators.materialized import (
        aggregate_view,
        refresh_join_aggregate_view,
    )
    from .sources.tables import table_changes

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        "o_totalprice",
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    a_old, a_new = orders.filter(F.col("o_orderkey") % 3 != 0), orders
    b_old, b_new = cust, cust.filter(F.col("c_custkey") % 7 != 3)

    mv0 = aggregate_view(
        a_old.join(b_old, "c_custkey"),
        ["c_mktsegment"],
        {"sum_price": "o_totalprice"},
    )
    mv1 = refresh_join_aggregate_view(
        mv0,
        a_old,
        table_changes(spark, a_old, a_new),
        b_old,
        table_changes(spark, b_old, b_new),
        on="c_custkey",
        group_cols=["c_mktsegment"],
        sum_specs={"sum_price": "o_totalprice"},
    )
    return mv1.select(
        "c_mktsegment",
        F.col("mv_n").alias("n_orders"),
        F.col("sum_price").cast("double").alias("sum_price"),
    )


@register(
    "graph_pagerank_fixedpoint",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (
      SELECT c AS src, s + 1000000 AS dst FROM raw
      UNION ALL
      SELECT s + 1000000 AS src, c AS dst FROM raw),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
               FROM e GROUP BY src),
    r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS rank FROM nodes),
    i1 AS (SELECT e.dst AS node,
                  CAST(SUM(r0.rank // o.outdeg) AS BIGINT) AS inbound
           FROM r0 JOIN outdeg o ON r0.node = o.src
                   JOIN e ON e.src = o.src
           GROUP BY e.dst),
    r1 AS (SELECT n.node,
                  CAST(150000000 + (85 * COALESCE(i1.inbound, 0)) // 100
                       AS BIGINT) AS rank
           FROM nodes n LEFT JOIN i1 ON n.node = i1.node),
    i2 AS (SELECT e.dst AS node,
                  CAST(SUM(r1.rank // o.outdeg) AS BIGINT) AS inbound
           FROM r1 JOIN outdeg o ON r1.node = o.src
                   JOIN e ON e.src = o.src
           GROUP BY e.dst),
    r2 AS (SELECT n.node,
                  CAST(150000000 + (85 * COALESCE(i2.inbound, 0)) // 100
                       AS BIGINT) AS rank
           FROM nodes n LEFT JOIN i2 ON n.node = i2.node)
    SELECT node, rank FROM r2
    """,
    tags=("graph", "extension"),
)
def q_graph_pagerank_fixedpoint(spark, sf_dir):
    """Fixed-point integer PageRank (operators/graph.pagerank_fixedpoint)
    over the symmetrized customer↔supplier bipartite graph (an edge per
    distinct (customer, supplier) trading pair from orders ⋈ lineitem;
    supplier nodes offset by 1e6 to share the id space). Ranks are
    BIGINT micro-units with integral-division damping, so TWO full
    iterations replay bit-identically in the oracle — the float-free
    answer to PageRank's order-dependent summation. One shuffle per
    iteration (contributions grouped on dst); symmetrization removes
    dangling sinks."""
    from .operators.graph import pagerank_fixedpoint

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    raw = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_suppkey") + 1000000).alias("s"),
        )
        .distinct()
    )
    edges = raw.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        raw.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    return pagerank_fixedpoint(edges, iters=2)


@register(
    "curation_pipeline_round6",
    oracle="""
    WITH feats AS (
      SELECT doc_id, n_chars,
        CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
        CAST(least(CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT),
                   256) AS DOUBLE) / 256.0 AS len_norm,
        COALESCE((CAST(length(text) AS BIGINT)
                  - (len(string_split_regex(trim(text), '\\s+')) - 1))
                 / len(string_split_regex(trim(text), '\\s+')), 0.0)
          AS avg_token_len,
        COALESCE(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT)
                 / CAST(length(text) AS BIGINT), 0.0) AS punct_ratio,
        COALESCE(CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|in|to)\\b'))
                      AS BIGINT)
                 / CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT),
                 0.0) AS stopword_ratio
      FROM documents
      WHERE n_chars >= 50 AND length(text) >= 50
    ),
    passed AS (
      SELECT doc_id, n_chars, n_tokens FROM feats
      WHERE ((((-0.75 + 1.5 * len_norm) + 0.125 * avg_token_len)
              + -2.25 * punct_ratio) + 1.5 * stopword_ratio) >= 0
    )
    SELECT
      CAST(CAST(concat('0x', substr(md5(concat('cur6:',
           CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 4 AS INTEGER)
        AS shard_id,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM passed
    GROUP BY 1
    """,
    tags=("text", "quality", "sharding", "extension"),
)
def q_curation_pipeline_round6(spark, sf_dir):
    """Round-6 second-half capstone, one exact oracle across the new
    surface: expectations gate (rules on raw size — rows failing any
    rule quarantine out), fixed-weight linear quality classifier (keep
    quality_pass docs), stable shard assignment (salted md5, 4 shards),
    per-shard delivery stats. Every stage is the REAL operator
    (quarantine_split -> linear_quality_score -> assign_shards) and the
    whole composition stays zero-shuffle until the final 4-group
    aggregate — the shape of an actual 100 TB curation run. The oracle
    replays features, decision fold, and shard hash bit-for-bit."""
    from .operators.expectations import quarantine_split
    from .operators.sharding import assign_shards
    from .operators.text import linear_quality_score

    docs = _t(spark, sf_dir, "documents")
    valid, _quarantined = quarantine_split(
        docs, {"min_chars_col": "n_chars >= 50", "min_text": "length(text) >= 50"}
    )
    scored = linear_quality_score(valid).filter(F.col("quality_pass") == 1)
    sharded = assign_shards(scored, "doc_id", n_shards=4, salt="cur6:")
    return sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


@register(
    "recursive_cte_native",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT c_custkey AS node, c_custkey // 2 AS parent
      FROM customer WHERE c_custkey > 1),
    a(node, anc, depth) AS (
      SELECT node, parent, 1 FROM edges
      UNION ALL
      SELECT a.node, e.parent, a.depth + 1
      FROM a JOIN edges e ON e.node = a.anc)
    SELECT anc, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MAX(depth) AS INT) AS max_depth
    FROM a GROUP BY anc
    """,
    tags=("recursive", "sql", "extension"),
)
def q_recursive_cte_native(spark, sf_dir):
    """NATIVE ``WITH RECURSIVE`` (new in Spark 4.0, SPARK-24497) — the
    ancestor closure of the implicit binary tree ``parent(k) = k DIV 2``
    computed by Spark's own recursive CTE executor, not the iterative
    self-join loop (``operators/hierarchy.py``, which remains the
    round-tunable scale path and is pinned against this same oracle in
    ``hierarchy_subtree_rollup``). The oracle is the identical recursive
    query in DuckDB; both engines run textbook linear recursion
    (UNION ALL semantics, frontier = previous step)."""
    cust = _t(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("customer_rc6")
    return spark.sql("""
        WITH RECURSIVE edges AS (
          SELECT c_custkey AS node, c_custkey DIV 2 AS parent
          FROM customer_rc6 WHERE c_custkey > 1),
        a(node, anc, depth) AS (
          SELECT node, parent, 1 FROM edges
          UNION ALL
          SELECT a.node, e.parent, a.depth + 1
          FROM a JOIN edges e ON e.node = a.anc)
        SELECT anc, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(MAX(depth) AS INT) AS max_depth
        FROM a GROUP BY anc
    """)


@register(
    "file_provenance_metadata",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(1 AS INT) AS n_files
    FROM documents GROUP BY lang
    """,
    tags=("lake", "sources", "extension"),
)
def q_file_provenance_metadata(spark, sf_dir):
    """File provenance via the hidden ``_metadata`` struct (Spark's
    per-row file lineage — the debugging surface behind 'which file did
    this bad row come from'): documents written hive-partitioned by lang
    (one file per partition), read back with ``_metadata.file_path``,
    and audited per PARTITION DIRECTORY parsed out of the physical path
    (regexp on 'lang=...'). The oracle states the invariant the audit
    must reproduce: per-lang row counts, exactly one file each. The
    _metadata column is populated at scan time from the reader's file
    split — zero extra I/O."""
    import tempfile

    docs = _t(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="prov_")
    docs.repartition("lang").write.mode("overwrite").partitionBy(
        "lang"
    ).parquet(out)
    back = spark.read.parquet(out).select(
        F.regexp_extract(
            F.col("_metadata.file_path"), r"lang=([^/]+)/", 1
        ).alias("lang"),
        F.col("_metadata.file_path").alias("fp"),
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct("fp").cast("int").alias("n_files"),
        )
    )


@register(
    "table_content_digest",
    oracle="""
    WITH h AS (
      SELECT CAST(concat('0x', substr(md5(
               concat(COALESCE(CAST(l_orderkey AS VARCHAR), chr(30) || 'N'),
                      chr(31),
                      COALESCE(CAST(l_linenumber AS VARCHAR), chr(30) || 'N'),
                      chr(31),
                      COALESCE(l_returnflag, chr(30) || 'N'),
                      chr(31),
                      COALESCE(l_linestatus, chr(30) || 'N'))
             ), 1, 15)) AS BIGINT) AS hv
      FROM lineitem)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(hv) AS DECIMAL(38,0)) AS VARCHAR) AS hash_sum,
           CAST(bit_xor(hv) AS BIGINT) AS hash_xor
    FROM h
    """,
    tags=("lake", "quality", "extension"),
)
def q_table_content_digest(spark, sf_dir):
    """Order-independent table content digest
    (operators/validate.table_digest) — the anti-entropy triple (count,
    exact DECIMAL hash sum, bit-xor) over the canonical row encoding of
    lineitem's engine-stable columns. Row order, partitioning, and
    engine cannot change the answer, which is the whole point: the
    DuckDB oracle computes the digest its own way and must land on the
    identical one-row triple — exactly how a 100 TB migration is
    validated without a sort or a row-by-row compare. One scan,
    map-side partials, one-row result."""
    from .operators.validate import table_digest

    li = _t(spark, sf_dir, "lineitem")
    return table_digest(
        li, ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"]
    )


@register(
    "streaming_expectations_gate",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    t AS (
      SELECT event_type, value,
        concat_ws(',',
          CASE WHEN NOT (value >= 0.5) THEN 'value_min' END,
          CASE WHEN NOT (user_id % 13 != 0) THEN 'user_alloc' END
        ) AS failed_rules
      FROM ev)
    SELECT failed_rules, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM t GROUP BY failed_rules, event_type
    """,
    tags=("streaming", "quality", "extension"),
)
def q_streaming_expectations_gate(spark, sf_dir):
    """Expectations gate INSIDE a streaming pipeline
    (operators/expectations.with_expectations composed into Structured
    Streaming): every event is tagged with the rules it failed as a
    stateless per-row projection on the stream, then aggregated per
    (failed_rules, event_type) in complete mode — the live ingestion
    monitor a DLT-style pipeline renders (valid row '' groups beside
    each quarantine reason). Exact-matches the batch replay of the same
    tagging; both failure rules fire on this corpus."""
    from .operators.expectations import with_expectations

    tagged = with_expectations(
        _events_stream(spark, sf_dir),
        {"value_min": "value >= 0.5", "user_alloc": "user_id % 13 != 0"},
    )
    agg = tagged.groupBy("failed_rules", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_value"),
    )
    return run_stream_to_memory(agg)


@register(
    "embedding_hard_negatives",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
               FROM embeddings WHERE label IS NOT NULL),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, label
          FROM e)
    SELECT query_id, query_label, neighbor_id, neighbor_label, cosine, rank
    FROM (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS neighbor_id, c.label AS neighbor_label,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
                        c.vec_id) AS INTEGER) AS rank
      FROM n q JOIN n c
        ON q.vec_id <> c.vec_id AND q.label <> c.label
      WHERE q.vec_id < 10) t
    WHERE rank <= 3
    """,
    tags=("similarity", "extension"),
)
def q_embedding_hard_negatives(spark, sf_dir):
    """Contrastive hard-negative mining
    (operators/similarity.hard_negative_topk): for each of the first 10
    vectors, the 3 most cosine-similar corpus vectors with a DIFFERENT
    label — near-but-wrong examples for triplet/contrastive training.
    Broadcast queries, one corpus scan, label inequality inside the join
    condition, deterministic tie-break; the oracle replays the exact
    same scoring and ranking."""
    from .operators.similarity import hard_negative_topk

    emb = _t(spark, sf_dir, "embeddings")
    return hard_negative_topk(emb, emb.filter(F.col("vec_id") < 10), k=3)


@register(
    "embedding_ann_ivf_index_topk",
    oracle=_SQL_IVF_TOPK,
    tags=("similarity", "lake", "extension"),
)
def q_embedding_ann_ivf_index_topk(spark, sf_dir):
    """IVF served from a PERSISTED index table
    (operators/similarity.build_ivf_index / ivf_index_topk): the corpus
    lands in a PartitionedTable partitioned BY CELL with the centroid
    codebook stored beside it; probing reads ONLY the nprobe cells'
    partition directories (manifest-level pruning — the other cells'
    files are never listed). Build once / serve many — the index
    lifecycle ivf_topk's transient clustering lacks. Same seeding,
    assignment, and operation order as the transient path, so this
    query shares _SQL_IVF_TOPK verbatim: the persisted index must give
    the identical answer."""
    import tempfile

    from .operators.similarity import build_ivf_index, ivf_index_topk

    emb = _t(spark, sf_dir, "embeddings")
    loc = tempfile.mkdtemp(prefix="ivf_idx_")
    build_ivf_index(emb, loc, n_centroids=16)
    return ivf_index_topk(
        spark, loc, emb.filter(F.col("vec_id") < 10), k=5, nprobe=4
    )


@register(
    "streaming_minibatch_kmeans",
    tags=("streaming", "similarity", "clustering", "extension"),
)
def q_streaming_minibatch_kmeans(spark, sf_dir):
    """Streaming mini-batch k-means (streaming/ml.py) — the running-mean
    fold of MLlib's streaming k-means (decay=1) driven by foreachBatch:
    the embedding corpus replays as FOUR micro-batches
    (maxFilesPerTrigger=1), each batch is ONE mapInPandas scan (gemm
    argmin fused with per-cell partial sums), and driver state is k
    centroids + k counts with 1e-9 rounding per fold. Rows-only gate
    (order-dependent online learning is not SQL-expressible); the exact
    centroid/count trajectory is pinned against a same-convention numpy
    host replay in tests/test_streaming_ml.py. Returns per-cell totals
    of vectors folded (deterministic)."""
    from .streaming.ml import stream_minibatch_kmeans

    emb = _t(spark, sf_dir, "embeddings")
    stage_dir = tempfile.mkdtemp(prefix="mbk_stage_")
    for i in range(4):
        emb.filter(F.col("vec_id") % 4 == i).coalesce(1).write.mode(
            "append"
        ).parquet(stage_dir)
    seeds = [
        list(r["e"])
        for r in emb.select(
            F.col("embedding").cast("array<double>").alias("e")
        )
        .orderBy("vec_id")
        .limit(8)
        .collect()
    ]
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    _C, counts, n_batches = stream_minibatch_kmeans(stream, seeds)
    assert n_batches == 4
    return spark.createDataFrame(
        [(int(i), int(c)) for i, c in enumerate(counts)],
        schema="cell int, n_seen bigint",
    )


@register(
    "catalog_multi_table_txn",
    oracle="""
    SELECT 'detail' AS side, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer WHERE c_custkey % 2 = 0
    UNION ALL
    SELECT 'summary_claim', CAST(COUNT(*) AS BIGINT)
    FROM customer WHERE c_custkey % 2 = 0
    """,
    tags=("lake", "catalog", "extension"),
)
def q_catalog_multi_table_txn(spark, sf_dir):
    """Multi-table ACID transaction (sources/catalog.CatalogTransaction
    — the catalog-level-commit capability single-table lake formats
    lack; local analog of Nessie / Iceberg-REST transactions): a detail
    table and its summary table change together under one atomic pin
    swap. The gate commits a consistent pair (even-custkey detail +
    its count), then ABORTS a second transaction that would have
    corrupted the pair (detail rewritten, summary not), and returns the
    pinned view of both sides — which must still be the committed
    consistent pair, as the oracle states (both rows the same count).
    Crash-window isolation and idempotent retry are pinned in
    tests/test_catalog_txn.py."""
    import tempfile

    from .sources.catalog import LakeCatalog

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cat = LakeCatalog(spark, tempfile.mkdtemp(prefix="cat_txn_"))
    cat.create_table("detail", cust.filter(F.col("c_custkey") % 3 != 0))
    cat.create_table(
        "summary",
        cust.filter(F.col("c_custkey") % 3 != 0)
        .agg(F.count(F.lit(1)).alias("n")),
    )
    even = cust.filter(F.col("c_custkey") % 2 == 0)
    with cat.transaction() as txn:
        txn.write("detail", even)
        txn.write("summary", even.agg(F.count(F.lit(1)).alias("n")))
    try:
        with cat.transaction() as txn:
            txn.write("detail", cust.limit(3))
            raise RuntimeError("audit failed — abort before summary")
    except RuntimeError:
        pass
    n_detail = cat.read_pinned("detail").count()
    claim = cat.read_pinned("summary").collect()[0]["n"]
    return spark.createDataFrame(
        [("detail", n_detail), ("summary_claim", claim)],
        schema="side string, n bigint",
    )


@register(
    "gdpr_purge_history",
    oracle="""
    SELECT 'head' AS at, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE c_custkey % 10 = 3) AS BIGINT)
             AS n_subject
    FROM customer
    WHERE c_custkey % 10 != 3
    UNION ALL
    SELECT 'v0', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE c_custkey % 10 = 3) AS BIGINT)
    FROM customer
    WHERE c_custkey % 2 = 0 AND c_custkey % 10 != 3
    """,
    tags=("lake", "quality", "extension"),
)
def q_gdpr_purge_history(spark, sf_dir):
    """GDPR right-to-be-forgotten purge
    (sources/tables.VersionedTable.purge_rows): the one deliberate
    HISTORY rewrite — the subject's rows (custkey % 10 = 3) are
    physically removed from EVERY snapshot, so neither the head nor a
    time-travel read of v0 can resurrect them, while all other rows of
    both versions survive bit-for-bit. The gate builds v0 (even keys)
    then v1 (all keys), purges the subject, and reports row/subject
    counts at head and at v0 — matching the oracle's filtered replay of
    both versions (n_subject must be 0 on both rows)."""
    import tempfile

    from .sources.tables import VersionedTable

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_gdpr_"))
    vt.overwrite(cust.filter(F.col("c_custkey") % 2 == 0))   # v0
    vt.overwrite(cust)                                       # v1 (head)
    vt.purge_rows("c_custkey % 10 = 3")
    subject = F.count_if(F.col("c_custkey") % 10 == 3).cast("bigint")
    head = vt.read().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        subject.alias("n_subject"),
    ).withColumn("at", F.lit("head"))
    v0 = vt.read(version=0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        subject.alias("n_subject"),
    ).withColumn("at", F.lit("v0"))
    return head.unionByName(v0).select("at", "n_rows", "n_subject")


@register(
    "catalog_materialized_view",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_price
    FROM orders WHERE o_orderkey % 4 != 0
    GROUP BY o_orderstatus
    """,
    tags=("lake", "catalog", "agg", "extension"),
)
def q_catalog_materialized_view(spark, sf_dir):
    """Catalog materialized view with SQL lifecycle
    (sources/catalog + merge_sql front-end): CREATE MATERIALIZED VIEW
    stores the defining SQL and materializes it as a versioned table;
    the base table then CHANGES (rows dropped); REFRESH MATERIALIZED
    VIEW recomputes as one more commit. The gate reads the refreshed MV
    — which must equal the oracle's aggregate of the FINAL base state —
    and asserts the refresh is visible as table history (2 snapshots)."""
    import tempfile

    from .operators.merge_sql import run_dml
    from .sources.catalog import LakeCatalog

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    cat = LakeCatalog(spark, tempfile.mkdtemp(prefix="cat_mv_"))
    cat.create_table("orders_base", orders)
    run_dml(
        spark,
        """CREATE MATERIALIZED VIEW order_stats AS
           SELECT o_orderstatus,
                  CAST(COUNT(*) AS BIGINT) AS n_orders,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                    AS sum_price
           FROM orders_base GROUP BY o_orderstatus""",
        catalog=cat,
    )
    cat.table("orders_base").overwrite(
        orders.filter(F.col("o_orderkey") % 4 != 0)
    )
    run_dml(spark, "REFRESH MATERIALIZED VIEW order_stats", catalog=cat)
    mv = cat.table("order_stats")
    assert len(mv.history()) == 2  # create + refresh, both versioned
    return mv.read()


@register(
    "record_index_point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders WHERE o_orderkey IN (103, 4000, 9999999)
    """,
    tags=("lake", "S2", "extension"),
)
def q_record_index_point_lookup(spark, sf_dir):
    """Record-level index point lookups
    (sources/tables.build_record_index / index_lookup — Hudi RLI
    analog): orders lands as an 8-file table, an exact key->file index
    is built in one scan, and three point lookups (two hits, one miss)
    each resolve their key's single data file from an index-only scan —
    the sharpest tier of the skipping stack (min/max < bloom < exact).
    The oracle replays the same keyed selection; the one-file-read
    property is pinned in tests/test_table_store.py."""
    import tempfile

    from .sources.tables import VersionedTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_rli_"))
    vt.overwrite(o.repartition(8))
    vt.build_record_index(["o_orderkey"])
    out = None
    for key in (103, 4000, 9999999):
        hit = vt.index_lookup({"o_orderkey": key})
        out = hit if out is None else out.unionByName(hit)
    return out


@register(
    "partition_retention_drop",
    oracle="""
    WITH ev AS (SELECT *, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
                FROM events)
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM ev
    WHERE day > (SELECT MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) FROM events)
    GROUP BY day
    """,
    tags=("lake", "scale", "extension"),
)
def q_partition_retention_drop(spark, sf_dir):
    """Partition-granular retention
    (sources/partitioned.drop_partitions_where — Hive DROP PARTITION /
    the nightly retention job of every day-partitioned event table):
    events land day-partitioned, the OLDEST day is dropped by value
    predicate (metadata-only — files stay for time travel; reclaim
    follows history retention), and the head is read back per day. The
    oracle replays the same cut over the raw events."""
    import tempfile

    from .sources.parquet import load_table
    from .sources.partitioned import PartitionedTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("date").cast("string").alias("day")
    )
    min_day = ev.agg(F.min("day")).collect()[0][0]
    pt = PartitionedTable(spark, tempfile.mkdtemp(prefix="pt_ret_"), "day")
    pt.overwrite(ev)
    pt.drop_partitions_where(lambda d: d <= min_day)
    # hive partition-type inference reads the day dir values back as
    # DATE; normalize to the written string type for the oracle compare
    return (
        pt.read()
        .withColumn("day", F.col("day").cast("string"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )


@register(
    "corpus_dataset_card",
    oracle="""
    WITH feats AS (
      SELECT text, lang, n_chars,
        CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
          AS n_tokens,
        ((((-0.75
          + 1.5 * (CAST(least(CAST(len(string_split_regex(trim(text),
                '\\s+')) AS BIGINT), 256) AS DOUBLE) / 256.0))
          + 0.125 * COALESCE((CAST(length(text) AS BIGINT)
              - (len(string_split_regex(trim(text), '\\s+')) - 1))
              / len(string_split_regex(trim(text), '\\s+')), 0.0))
          + -2.25 * COALESCE(CAST(len(regexp_extract_all(text,
              '[^A-Za-z0-9\\s]')) AS BIGINT)
              / CAST(length(text) AS BIGINT), 0.0))
          + 1.5 * COALESCE(CAST(len(regexp_extract_all(text,
              '\\b(the|a|of|and|in|to)\\b')) AS BIGINT)
              / CAST(len(string_split_regex(trim(text), '\\s+'))
                     AS BIGINT), 0.0)) AS z
      FROM documents)
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_docs,
      CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_en,
      CAST(COUNT(*) FILTER (WHERE z >= 0) AS BIGINT) AS n_quality_pass,
      quantile_cont(n_chars, 0.5) AS median_chars,
      quantile_cont(n_chars, 0.9) AS p90_chars
    FROM feats
    """,
    tags=("text", "corpus", "quality", "extension"),
)
def q_corpus_dataset_card(spark, sf_dir):
    """Dataset card in one pass — the numbers a published corpus card
    states (docs/chars/tokens, language spread, exact-dup uniqueness,
    quality-classifier pass count, length percentiles), computed as ONE
    aggregate over one scan (count-distincts expand to two-phase
    aggregates; percentiles use the same linear-interpolation
    definition in Spark and DuckDB — the exact_quantiles precedent; the
    classifier term is the bit-exact linear fold of
    quality_classifier_scores). At 100 TB the count-distincts swap for
    the HLL sketches (operators/sketches.py) and the percentiles for
    KLL — both registered separately; this is the exactness baseline."""
    from .operators.text import linear_quality_score

    docs = linear_quality_score(_t(spark, sf_dir, "documents"))
    return docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("n_chars")).cast("bigint").alias("n_chars"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct(F.md5("text")).cast("bigint").alias("n_unique_docs"),
        F.count_if(F.col("lang") == "en").cast("bigint").alias("n_en"),
        F.sum("quality_pass").cast("bigint").alias("n_quality_pass"),
        F.percentile("n_chars", 0.5).alias("median_chars"),
        F.percentile("n_chars", 0.9).alias("p90_chars"),
    )


@register(
    "dedup_incremental_index",
    oracle=REGISTRY["dedup_incremental_batch"].oracle,
    tags=("dedup", "lake", "extension", "corpus"),
)
def q_dedup_incremental_index(spark, sf_dir):
    """Incremental dedup against a PERSISTED LSH index
    (operators/dedup.build_lsh_index / lsh_index_dedup_batch) — the
    production loop dedup_against_corpus's scale note promises: corpus
    signatures/digests are built ONCE into a VersionedTable (band rows +
    band=-1 digest rows, parameters as validated table properties) and
    each batch screens against the index READ, dropping per-batch cost
    to O(batch + matched buckets). Same two screens, same semantics —
    this query shares dedup_incremental_batch's oracle verbatim: the
    persisted-index path must give the identical surviving rows."""
    import tempfile

    from .operators.dedup import build_lsh_index, lsh_index_dedup_batch

    docs = _t(spark, sf_dir, "documents")
    new_batch = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    vt = build_lsh_index(corpus, tempfile.mkdtemp(prefix="lsh_idx_"))
    return lsh_index_dedup_batch(
        vt, new_batch, corpus_text=corpus, threshold=0.5
    ).select("doc_id", "source", "n_chars")


@register(
    "streaming_scd2_enrich",
    oracle=REGISTRY["scd2_point_in_time_lookup"].oracle,
    tags=("streaming", "scd2", "temporal", "join", "extension"),
)
def q_streaming_scd2_enrich(spark, sf_dir):
    """STREAMING point-in-time SCD2 enrichment: the event stream joins
    the SCD2 customer dimension's version valid AT each event's
    timestamp, per micro-batch (stream-static inner equi join with the
    validity range as residual filter — stateless, no watermark, zero
    stream-side state; the dimension re-evaluates per batch, so a
    mid-stream dimension commit is picked up exactly as Delta's
    stream-static semantics). Shares scd2_point_in_time_lookup's oracle
    verbatim: the streamed replay must equal the batch lookup."""
    from .operators.temporal import scd2_asof_lookup

    dim = scd2_merge_delta_style(
        scd2_target(spark, sf_dir, include_ts=False),
        customer_updates(spark, sf_dir),
        "c_custkey",
        CHECKSUM_COLS,
        as_of=T2,
    )
    ev = _events_stream(spark, sf_dir)
    out = scd2_asof_lookup(ev, dim, "user_id", "c_custkey", "ts").select(
        "event_id", "user_id", ev["ts"], "c_mktsegment", "valid_from",
        "iscurrent",
    )
    return run_stream_to_memory(out, output_mode="append")


@register(
    "governance_masked_view",
    oracle="""
    SELECT c_custkey,
           substr(md5(c_name), 1, 12) AS name_token,
           c_mktsegment
    FROM customer
    WHERE c_mktsegment != 'AUTOMOBILE' AND c_custkey % 2 = 0
    """,
    tags=("lake", "catalog", "quality", "extension"),
)
def q_governance_masked_view(spark, sf_dir):
    """Governance through catalog views — column masking + row-level
    security as a stored view definition (the mechanism behind masked
    readers in every lakehouse governance layer): the raw customer
    table registers in the catalog, a view tokenizes the name column
    (md5 prefix — deterministic join-able token, never the cleartext)
    and filters out a protected segment, and the consumer reads ONLY
    through the view by name. The oracle replays mask and filter; the
    view definition survives in the catalog document (SHOW CREATE-able,
    session-independent)."""
    import tempfile

    from .sources.catalog import LakeCatalog

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    cat = LakeCatalog(spark, tempfile.mkdtemp(prefix="cat_gov_"))
    cat.create_table("customer_raw", cust.filter(F.col("c_custkey") % 2 == 0))
    cat.create_view(
        "customer_masked",
        """SELECT c_custkey, substr(md5(c_name), 1, 12) AS name_token,
                  c_mktsegment
           FROM customer_raw
           WHERE c_mktsegment != 'AUTOMOBILE'""",
    )
    return cat.view("customer_masked")


@register(
    "leakage_safe_split",
    oracle=_SQL_CC.replace(
        "    SELECT id AS doc_id, MIN(label) AS component FROM reach GROUP BY id",
        """,
    comp AS (
      SELECT id AS doc_id, MIN(label) AS component FROM reach GROUP BY id)
    SELECT doc_id, component,
      CASE WHEN CAST(concat('0x', substr(md5(concat('lsplit:',
               CAST(component AS VARCHAR))), 1, 15)) AS BIGINT)
               % 10000 < 8000
           THEN 'train' ELSE 'test' END AS split
    FROM comp""",
    ),
    tags=("sampling", "dedup", "extension"),
)
def q_leakage_safe_split(spark, sf_dir):
    """Leakage-safe train/test split
    (operators/sampling.leakage_safe_split): the split key is the
    near-dup CONNECTED COMPONENT, not the document id, so a whole
    near-duplicate family lands in one split — closing the
    eval-contamination hole where a test doc's near-twin sits in train.
    Pairs come from the standard MinHash->LSH->Jaccard verify; the
    oracle extends the recursive-CTE component oracle with the same
    salted-md5 80/20 cut on the component id."""
    from .operators.sampling import leakage_safe_split

    docs = _t(spark, sf_dir, "documents")
    cands = lsh_candidate_pairs(minhash_signatures(docs))
    pairs = ngram_jaccard_pairs(docs, cands, threshold=0.5)
    return leakage_safe_split(
        docs, pairs, "doc_id", {"train": 0.8, "test": 0.2}, salt="lsplit:"
    ).select("doc_id", "component", "split")


def _impl_events_hourly_anomalies(spark, sf_dir):
    """Seasonal-baseline anomaly scoring: each event's value z-scored
    against its (event_type, hour-of-day) population — the
    time-of-day-aware outlier detector (a 3 a.m. spike is anomalous even
    when the same value at noon is normal). EXACT oracle: moments
    accumulate as DECIMAL (order-independent), the variance closed form
    ``(sumsq - sum*sum/n) / (n-1)`` evaluates in doubles with the
    identical op sequence on both engines, sqrt is correctly rounded,
    and the top-50 ranking tie-breaks on event_id.

    Scale: one (type, hour)-keyed aggregate (288 groups — broadcast back
    to the scan), one rank window over the global top — executed as a
    full ordering here for oracle exactness; at 100 TB pre-filter with
    an approx |z| cutoff before ranking."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.hour("ts").alias("hr"),
        F.col("value").cast("double").alias("value"),
    )
    stats = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("s"),
        F.sum(
            (F.col("value").cast("decimal(18,6)"))
            * (F.col("value").cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("ss"),
    ).filter(F.col("n") >= 2)
    joined = ev.join(F.broadcast(stats), ["event_type", "hr"])
    mean = F.col("s") / F.col("n")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    scored = joined.withColumn("__mean", mean).withColumn("__var", var).filter(
        F.col("__var") > 0
    )
    z = (F.col("value") - F.col("__mean")) / F.sqrt(F.col("__var"))
    w = Window.orderBy(F.abs(z).desc(), F.col("event_id").asc())
    return (
        scored.withColumn("zscore", z)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 50)
        .select(
            "rank", "event_id", "event_type", "hr", "value",
            F.col("zscore").alias("zscore"),
        )
    )


_ANOMALY_ORACLE = f"""
    WITH ev AS (SELECT event_id, event_type,
                       CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hr,
                       CAST(value AS DOUBLE) AS value
                FROM events),
    st AS (SELECT event_type, hr, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
                  CAST(SUM(CAST(value AS DECIMAL(18,6))
                           * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS ss
           FROM ev GROUP BY event_type, hr
           HAVING COUNT(*) >= 2),
    sc AS (SELECT ev.*, s / n AS m,
                  (ss - s * s / n) / (n - 1) AS v
           FROM ev JOIN st USING (event_type, hr)
           WHERE (ss - s * s / n) / (n - 1) > 0),
    r AS (SELECT CAST(row_number() OVER (
                   ORDER BY abs((value - m) / sqrt(v)) DESC, event_id ASC)
                 AS INTEGER) AS rank,
                 event_id, event_type, hr, value,
                 (value - m) / sqrt(v) AS zscore
          FROM sc)
    SELECT rank, event_id, event_type, hr, value, zscore
    FROM r WHERE rank <= 50
    """


@register(
    "events_hourly_anomalies",
    oracle=_ANOMALY_ORACLE,
    tags=("events", "agg", "window", "extension"),
)
def q_events_hourly_anomalies(spark, sf_dir):
    """Seasonal-baseline (hour-of-day) anomaly z-scores; implementation
    and the exactness/scale discussion live in
    ``_impl_events_hourly_anomalies`` directly above (the oracle text is
    shared via ``_ANOMALY_ORACLE``)."""
    return _impl_events_hourly_anomalies(spark, sf_dir)


@register(
    "events_cusum_alerts",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    g AS (SELECT user_id,
                 list_transform(
                   list_sort(list(struct_pack(
                     t := ts, e := event_id, v := CAST(value AS DOUBLE)))),
                   x -> x.v) AS vals
          FROM ev GROUP BY user_id)
    SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
           CAST(list_reduce(list_prepend(0.0, vals),
                            (a, b) -> greatest(a + b - 55.0, 0.0))
                AS DOUBLE) AS cusum_final,
           CAST(list_reduce(list_prepend(0.0, vals),
                            (a, b) -> greatest(a + b - 55.0, 0.0)) > 300.0
                AS BOOLEAN) AS alert
    FROM g
    """,
    tags=("events", "sequence", "agg", "extension"),
)
def q_events_cusum_alerts(spark, sf_dir):
    """Per-user one-sided CUSUM change detection
    (operators/sequence.cusum_scores, drift 55 / threshold 300): the
    classic upward-shift statistic ``max(0, s + x - drift)`` folded over
    each user's time-ordered values — sustained high activity
    accumulates into an alert, normal fluctuation resets toward zero.
    EXACT oracle: the 0.0-seeded Spark fold equals DuckDB's list_reduce
    over the 0.0-prepended list, same IEEE sequence. Round 7: runs on the
    constant-memory streaming fold (operators/sequence.
    sequential_keyed_fold) — one key shuffle, per-partition time sort,
    one Arrow-batched pass; no executor holds a key's full history."""
    from .operators.sequence import cusum_scores

    return cusum_scores(_t(spark, sf_dir, "events"))


@register(
    "events_cusum_alerts_latched",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    g AS (SELECT user_id,
                 list_transform(
                   list_sort(list(struct_pack(
                     t := ts, e := event_id, v := CAST(value AS DOUBLE)))),
                   x -> x.v) AS vals
          FROM ev GROUP BY user_id),
    m AS (SELECT user_id, vals,
                 list_max(list_transform(generate_series(1, len(vals)),
                   i -> list_reduce(list_prepend(0.0, list_slice(vals, 1, i)),
                                    (a, b) -> greatest(a + b - 55.0, 0.0))))
                 AS cmax
          FROM g)
    SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
           CAST(list_reduce(list_prepend(0.0, vals),
                            (a, b) -> greatest(a + b - 55.0, 0.0))
                AS DOUBLE) AS cusum_final,
           CAST(cmax AS DOUBLE) AS cusum_max,
           CAST(cmax > 300.0 AS BOOLEAN) AS alert
    FROM m
    """,
    tags=("events", "sequence", "agg", "extension"),
)
def q_events_cusum_alerts_latched(spark, sf_dir):
    """LATCHED (any-time-alarm) CUSUM — the flavor the round-6 docstring
    scoped out: the streaming fold tracks ``max_i s_i`` beside the final
    statistic, so an excursion above the threshold alerts even after the
    statistic decays back. EXACT oracle despite the struct state:
    ``max_i s_i`` = max over prefix folds, which DuckDB replays by
    list-slicing each prefix and re-running the scalar list_reduce —
    O(n²) per key is fine at oracle scale, and each prefix fold is the
    identical IEEE sequence, so the max is bit-exact."""
    from .operators.sequence import cusum_scores

    return cusum_scores(_t(spark, sf_dir, "events"), latched=True)


@register(
    "events_holt_forecast",
    oracle=None,  # coupled (level, trend) recursion — DuckDB's scalar
    # list_reduce cannot carry the pair (no prefix trick applies: both
    # scalars feed every step); host-exact-pinned instead
    tags=("events", "sequence", "agg", "extension"),
)
def q_events_holt_forecast(spark, sf_dir):
    """Per-user Holt double exponential smoothing
    (operators/sequence.holt_scores, alpha 0.5 / beta 0.3 / horizon 1):
    level + trend recursion over the time-ordered values with a one-step
    forecast — the trend-following rung above EWMA, on the same
    constant-memory streaming fold engine. Rows-only by necessity (the
    coupled two-scalar state defeats scalar list_reduce replay);
    bit-exact host replay incl. forced tiny Arrow batches pinned in
    tests/test_sequence_scale.py."""
    from .operators.sequence import holt_scores

    return holt_scores(_t(spark, sf_dir, "events"))


@register(
    "events_cusum_segmented",
    oracle=None,  # composition reorders IEEE ops (ulp-level) — pinned
    # exact on dyadic inputs + 1e-9 on floats in tests/test_sequence_scale.py
    tags=("events", "sequence", "agg", "scale", "extension"),
)
def q_events_cusum_segmented(spark, sf_dir):
    """Hot-key-parallel CUSUM twin (operators/sequence.
    cusum_scores_segmented): range-partition on (key, ts, tiebreak) so a
    single hot key SPLITS across partitions, summarize each segment as
    the max-plus pair (total, clipped-max-suffix), compose per key in
    segment order — per-key state is one struct per touched partition,
    never the event array. Rows-only by design: the composed fold
    reorders IEEE ops vs the sequential oracle; equality is pinned exact
    on dyadic inputs and to 1e-9 on floats (tests/test_sequence_scale.py),
    and the algebra itself is hypothesis-tested on random splits."""
    from .operators.sequence import cusum_scores_segmented

    return cusum_scores_segmented(_t(spark, sf_dir, "events"))


@register(
    "events_ewma_segmented",
    oracle=None,  # same ulp-reorder rationale as events_cusum_segmented
    tags=("events", "sequence", "agg", "scale", "extension"),
)
def q_events_ewma_segmented(spark, sf_dir):
    """Hot-key-parallel EWMA twin (operators/sequence.
    ewma_scores_segmented): each element is the affine map
    ``s -> (1-a)s + ax``; segments compose as (m, b) pairs and the
    seeded recursion closes as ``m_total * x_first + b_total``. Same
    rows-only rationale and test pins as events_cusum_segmented."""
    from .operators.sequence import ewma_scores_segmented

    return ewma_scores_segmented(_t(spark, sf_dir, "events"))


@register(
    "streaming_partitioned_ingest",
    oracle=f"""
    WITH ev AS ({_EV_SQL})
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM ev GROUP BY 1
    """,
    tags=("streaming", "lake", "sink", "extension"),
)
def q_streaming_partitioned_ingest(spark, sf_dir):
    """Streaming ingestion into the day-partitioned store
    (streaming/scd2_stream.stream_upsert_partitioned — the Hudi
    streaming-upsert shape): the event stream replays as micro-batches
    (maxFilesPerTrigger=1), each folding via a partition-scoped keyed
    upsert that rewrites ONLY the touched days, with the manifest's
    txn-batch guard making checkpoint-race replays exactly-once on top
    of the keyed merge's idempotency. The final table must equal the
    batch per-day aggregate exactly — the oracle states it."""
    import tempfile

    from .sources.partitioned import PartitionedTable
    from .streaming.scd2_stream import stream_upsert_partitioned

    ev0 = _events_stream(spark, sf_dir)
    stream = ev0.withColumn(
        "day", F.col("ts").cast("date").cast("string")
    )
    pt = PartitionedTable(spark, tempfile.mkdtemp(prefix="pt_stream_"), "day")
    pt.overwrite(
        spark.createDataFrame(
            [], "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, day string"
        )
    )
    q = stream_upsert_partitioned(
        pt, stream, ["event_id"], "value",
        tempfile.mkdtemp(prefix="pt_stream_ckpt_"),
    )
    q.awaitTermination()
    return (
        pt.read()
        .withColumn("day", F.col("day").cast("string"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# Batch (round 8): interval algebra, bucketed physical layout, exact
# time-series statistics, graph closure, and a k-anonymity governance audit
# --------------------------------------------------------------------------

from .operators.temporal import interval_overlap_join  # noqa: E402


@register(
    "interval_overlap_join",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    v AS (SELECT user_id, event_id AS view_id, ts AS v_start,
                 ts + INTERVAL 30 MINUTE AS v_end
          FROM ev WHERE event_type = 'view'),
    p AS (SELECT user_id, event_id AS purchase_id, ts AS p_start,
                 ts + INTERVAL 2 HOUR AS p_end
          FROM ev WHERE event_type = 'purchase')
    SELECT v.view_id, p.purchase_id, v.user_id,
           CAST(epoch_us(least(v.v_end, p.p_end))
                - epoch_us(greatest(v.v_start, p.p_start)) AS BIGINT)
             AS overlap_us
    FROM v JOIN p ON v.user_id = p.user_id
                 AND v.v_start < p.p_end AND p.p_start < v.v_end
    """,
    tags=("temporal", "extension"),
)
def q_interval_overlap_join(spark, sf_dir):
    """Interval x interval overlap join (view sessions x purchase
    attribution windows of the same user): half-open overlap
    ``l_start < r_end AND r_start < l_end`` — the join shape neither the
    reference nor stock Spark has as a primitive (a raw theta join plans
    as a nested loop). Binned equi-join on (user_id, hour bin) with the
    FIRST-SHARED-BIN emission rule (operators/temporal.py:
    interval_overlap_join): each overlapping pair survives in exactly
    one bin — the one containing the later start — so there is no
    distinct/dedup shuffle at all. Oracle is the plain theta join."""
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_start"),
        F.expr("ts + INTERVAL 30 MINUTES").alias("v_end"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_start"),
        F.expr("ts + INTERVAL 2 HOURS").alias("p_end"),
    )
    return interval_overlap_join(
        v, p, ["user_id"], "v_start", "v_end", "p_start", "p_end"
    ).select(
        "view_id",
        "purchase_id",
        "user_id",
        F.expr(
            "timestampdiff(MICROSECOND, greatest(v_start, p_start),"
            " least(v_end, p_end))"
        )
        .cast("bigint")
        .alias("overlap_us"),
    )


@register(
    "bucketed_join_no_shuffle",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("join", "layout", "extension"),
)
def q_bucketed_join_no_shuffle(spark, sf_dir):
    """Bucketed physical layout (Hive bucketing — the lake-layout analog
    of Hudi's record-key file groups): both join sides are written
    ``bucketBy(8, key).sortBy(key)`` managed tables, so the SortMergeJoin
    consumes the scans' hash-partitioning directly and the join runs with
    ZERO Exchange on either side (pinned by tests/test_plans.py). At
    100 TB this is the co-located-join strategy: pay the shuffle once at
    write time, then every subsequent join on the bucket key is
    shuffle-free. The ``merge`` hint keeps the plan on SMJ (a broadcast
    would trivially also skip the shuffle and hide the point)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    orders.write.mode("overwrite").format("parquet").bucketBy(
        8, "o_custkey"
    ).sortBy("o_custkey").saveAsTable("bjoin_orders")
    cust.write.mode("overwrite").format("parquet").bucketBy(
        8, "c_custkey"
    ).sortBy("c_custkey").saveAsTable("bjoin_customer")
    bo = spark.table("bjoin_orders")
    bc = spark.table("bjoin_customer")
    joined = bo.hint("merge").join(bc, bo["o_custkey"] == bc["c_custkey"])
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "events_autocorrelation",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    b AS (SELECT user_id,
                 CAST(CAST(value AS DECIMAL(18,4)) * 10000
                      AS DECIMAL(38,0)) AS xi,
                 lag(CAST(CAST(value AS DECIMAL(18,4)) * 10000
                          AS DECIMAL(38,0)))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS yi
          FROM ev),
    p AS (SELECT user_id, xi, yi FROM b WHERE yi IS NOT NULL),
    m AS (SELECT user_id,
                 CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
                 CAST(SUM(xi) AS DECIMAL(38,0)) AS sx,
                 CAST(SUM(yi) AS DECIMAL(38,0)) AS sy,
                 CAST(SUM(xi * xi) AS DECIMAL(38,0)) AS sxx,
                 CAST(SUM(yi * yi) AS DECIMAL(38,0)) AS syy,
                 CAST(SUM(xi * yi) AS DECIMAL(38,0)) AS sxy
          FROM p GROUP BY user_id)
    SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
           CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0)) AS DOUBLE)
             / (sqrt(CAST(CAST(n * sxx - sx * sx AS DECIMAL(38,0)) AS DOUBLE))
                * sqrt(CAST(CAST(n * syy - sy * sy AS DECIMAL(38,0)) AS DOUBLE)))
             AS autocorr
    FROM m
    WHERE n >= 3 AND n * sxx - sx * sx != 0 AND n * syy - sy * sy != 0
    """,
    tags=("events", "agg", "timeseries", "extension"),
)
def q_events_autocorrelation(spark, sf_dir):
    """Per-user lag-1 autocorrelation of event values (the serial-
    correlation diagnostic behind change-detection tuning): pair each
    value with its predecessor via a keyed LAG window, then Pearson over
    the pairs with every moment accumulated as an integer DECIMAL(38,0)
    (order-independent, exact — the grouped_correlation discipline). The
    LAG window and the moment aggregate share the user_id hash
    partitioning, so the whole query is ONE shuffle: the aggregate reuses
    the window's exchange."""
    ev = _t(spark, sf_dir, "events")
    xi = (F.col("value").cast("decimal(18,4)") * F.lit(10000)).cast(
        "decimal(38,0)"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    b = ev.select("user_id", "ts", "event_id", xi.alias("xi")).withColumn(
        "yi", F.lag("xi").over(w)
    )
    m = (
        b.filter(F.col("yi").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum("xi").cast("decimal(38,0)").alias("sx"),
            F.sum("yi").cast("decimal(38,0)").alias("sy"),
            F.sum(F.col("xi") * F.col("xi")).cast("decimal(38,0)").alias("sxx"),
            F.sum(F.col("yi") * F.col("yi")).cast("decimal(38,0)").alias("syy"),
            F.sum(F.col("xi") * F.col("yi")).cast("decimal(38,0)").alias("sxy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "decimal(38,0)"
    )
    den1 = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "decimal(38,0)"
    )
    den2 = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "decimal(38,0)"
    )
    return (
        m.filter(
            (F.col("n") >= 3)
            & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0)
            & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") != 0)
        )
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_pairs"),
            (
                num.cast("double")
                / (F.sqrt(den1.cast("double")) * F.sqrt(den2.cast("double")))
            ).alias("autocorr"),
        )
    )


@register(
    "events_stl_decompose",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    h AS (SELECT date_trunc('hour', ts) AS hour_ts,
                 CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000
                               AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS v
          FROM ev GROUP BY 1),
    t AS (SELECT hour_ts, v,
                 CAST(SUM(v) OVER w25 AS DECIMAL(38,0)) AS trend_sum,
                 COUNT(*) OVER w25 AS wn
          FROM h
          WINDOW w25 AS (ORDER BY hour_ts
                         ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
    d AS (SELECT hour_ts, v, trend_sum,
                 CAST(25 * v - trend_sum AS DECIMAL(38,0)) AS det,
                 hour(hour_ts) AS hod
          FROM t WHERE wn = 25),
    s AS (SELECT hod, CAST(SUM(det) AS DECIMAL(38,0)) AS s_num,
                 CAST(COUNT(*) AS DECIMAL(38,0)) AS s_cnt
          FROM d GROUP BY hod)
    SELECT d.hour_ts,
           CAST(d.v AS DOUBLE) / 10000 AS value,
           CAST(d.trend_sum AS DOUBLE) / 250000 AS trend,
           CAST(s.s_num AS DOUBLE) / (CAST(s.s_cnt AS DOUBLE) * 250000)
             AS seasonal,
           CAST(d.v AS DOUBLE) / 10000 - CAST(d.trend_sum AS DOUBLE) / 250000
             - CAST(s.s_num AS DOUBLE) / (CAST(s.s_cnt AS DOUBLE) * 250000)
             AS residual
    FROM d JOIN s ON d.hod = s.hod
    """,
    tags=("events", "timeseries", "extension"),
)
def q_events_stl_decompose(spark, sf_dir):
    """STL-lite seasonal-trend decomposition of the hourly revenue
    series: trend = 25-hour centered moving sum (full windows only),
    seasonal = hour-of-day mean of the detrended series, residual = the
    rest. Exactness discipline: the series value is an integer
    DECIMAL(38,0) (value scaled 1e4, summed exactly); the detrended
    series is kept MULTIPLIED by the window width (25*v - trend_sum), so
    every accumulation is integer arithmetic and division happens only
    in the final fixed-shape double expression — bit-identical
    cross-engine. Scale: the windowed relation is the HOURLY AGGREGATE,
    whose length is timeline-bounded (8.8k rows/decade), not
    data-bounded, so the single-partition ordered window is safe by
    construction; the raw-event pass is one hash aggregate, and the
    seasonal join broadcasts 24 rows."""
    ev = _t(spark, sf_dir, "events")
    xi = (F.col("value").cast("decimal(18,4)") * F.lit(10000)).cast(
        "decimal(38,0)"
    )
    h = (
        ev.select(F.date_trunc("hour", "ts").alias("hour_ts"), xi.alias("xi"))
        .groupBy("hour_ts")
        .agg(F.sum("xi").cast("decimal(38,0)").alias("v"))
    )
    w25 = Window.orderBy("hour_ts").rowsBetween(-12, 12)
    t = h.select(
        "hour_ts",
        "v",
        F.sum("v").over(w25).cast("decimal(38,0)").alias("trend_sum"),
        F.count(F.lit(1)).over(w25).alias("wn"),
    )
    d = t.filter(F.col("wn") == 25).select(
        "hour_ts",
        "v",
        "trend_sum",
        (F.lit(25) * F.col("v") - F.col("trend_sum"))
        .cast("decimal(38,0)")
        .alias("det"),
        F.hour("hour_ts").alias("hod"),
    )
    s = d.groupBy("hod").agg(
        F.sum("det").cast("decimal(38,0)").alias("s_num"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("s_cnt"),
    )
    seasonal = F.col("s_num").cast("double") / (
        F.col("s_cnt").cast("double") * F.lit(250000)
    )
    value = F.col("v").cast("double") / F.lit(10000)
    trend = F.col("trend_sum").cast("double") / F.lit(250000)
    return d.join(F.broadcast(s), "hod").select(
        "hour_ts",
        value.alias("value"),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        (value - trend - seasonal).alias("residual"),
    )


@register(
    "grouped_multiple_regression",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             CAST(CAST(l_quantity AS DECIMAL(18,0)) AS HUGEINT) AS x1,
             CAST(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                       AS DECIMAL(18,0)) AS HUGEINT) AS x2,
             CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS DECIMAL(18,0)) AS HUGEINT) AS y
      FROM lineitem),
    m AS (SELECT l_returnflag,
                 CAST(COUNT(*) AS HUGEINT) AS n,
                 SUM(x1) AS s1, SUM(x2) AS s2, SUM(y) AS sy,
                 SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12,
                 SUM(x2 * x2) AS s22, SUM(x1 * y) AS s1y,
                 SUM(x2 * y) AS s2y
          FROM b GROUP BY l_returnflag),
    c AS (SELECT l_returnflag, n, s1, s2, sy, s11, s12, s22, s1y, s2y,
                 n * (s11 * s22 - s12 * s12)
                   - s1 * (s1 * s22 - s12 * s2)
                   + s2 * (s1 * s12 - s11 * s2) AS det,
                 sy * (s11 * s22 - s12 * s12)
                   - s1 * (s1y * s22 - s12 * s2y)
                   + s2 * (s1y * s12 - s11 * s2y) AS det0,
                 n * (s1y * s22 - s12 * s2y)
                   - sy * (s1 * s22 - s12 * s2)
                   + s2 * (s1 * s2y - s1y * s2) AS det1,
                 n * (s11 * s2y - s1y * s12)
                   - s1 * (s1 * s2y - s1y * s2)
                   + sy * (s1 * s12 - s11 * s2) AS det2
          FROM m)
    -- int->double via VARCHAR: DuckDB's direct HUGEINT/DECIMAL(38,0)->DOUBLE
    -- cast double-rounds through the 64-bit halves (1 ulp off beyond 2^53);
    -- the string parse is correctly rounded, matching Spark's BigDecimal path
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           CAST(CAST(det0 AS VARCHAR) AS DOUBLE)
             / CAST(CAST(det AS VARCHAR) AS DOUBLE) AS intercept_cents,
           CAST(CAST(det1 AS VARCHAR) AS DOUBLE)
             / CAST(CAST(det AS VARCHAR) AS DOUBLE) AS beta_quantity,
           CAST(CAST(det2 AS VARCHAR) AS DOUBLE)
             / CAST(CAST(det AS VARCHAR) AS DOUBLE) AS beta_discount
    FROM c WHERE det != 0
    """,
    tags=("agg", "ml", "extension"),
)
def q_grouped_multiple_regression(spark, sf_dir):
    """Distributed multiple linear regression by normal equations —
    price_cents ~ intercept + quantity + discount_pct per return flag —
    solved in closed form (Cramer's rule on the 3x3 Gram matrix). This
    is the one-pass GLM-training shape: ONE aggregate over the fact
    table accumulates the 9 moments, the solve is a scalar epilogue on
    k+1-sized groups — no iteration, no collect, no UDF. All features
    are integer-valued (quantity is integral; discount/price scale
    exactly to 2 decimals), so every moment is an exact DECIMAL(38,0)
    sum (HUGEINT in the oracle): the determinants (~1e28 at sf10) stay
    inside 38 digits and the only inexact step is the final fixed-shape
    int->double division, identical in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    b = li.select(
        "l_returnflag",
        d38(F.col("l_quantity").cast("decimal(18,0)")).alias("x1"),
        d38(
            (F.col("l_discount").cast("decimal(18,2)") * F.lit(100)).cast(
                "decimal(18,0)"
            )
        ).alias("x2"),
        d38(
            (F.col("l_extendedprice").cast("decimal(18,2)") * F.lit(100)).cast(
                "decimal(18,0)"
            )
        ).alias("y"),
    )
    m = b.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        d38(F.sum("x1")).alias("s1"),
        d38(F.sum("x2")).alias("s2"),
        d38(F.sum("y")).alias("sy"),
        d38(F.sum(F.col("x1") * F.col("x1"))).alias("s11"),
        d38(F.sum(F.col("x1") * F.col("x2"))).alias("s12"),
        d38(F.sum(F.col("x2") * F.col("x2"))).alias("s22"),
        d38(F.sum(F.col("x1") * F.col("y"))).alias("s1y"),
        d38(F.sum(F.col("x2") * F.col("y"))).alias("s2y"),
    )

    def _c(name):
        return F.col(name)

    def m2(a, bb):  # 2x2 minor: a*b products stay decimal(38,0)
        return d38(a * bb)

    def det3(r0, r1, r2):
        (a, bcol, c), (dd, e, f), (g, h, i) = r0, r1, r2
        return d38(
            d38(a * d38(e * i - f * h))
            - d38(bcol * d38(dd * i - f * g))
            + d38(c * d38(dd * h - e * g))
        )

    n, s1, s2, sy = _c("n"), _c("s1"), _c("s2"), _c("sy")
    s11, s12, s22, s1y, s2y = (
        _c("s11"), _c("s12"), _c("s22"), _c("s1y"), _c("s2y"),
    )
    det = det3((n, s1, s2), (s1, s11, s12), (s2, s12, s22))
    det0 = det3((sy, s1, s2), (s1y, s11, s12), (s2y, s12, s22))
    det1 = det3((n, sy, s2), (s1, s1y, s12), (s2, s2y, s22))
    det2 = det3((n, s1, sy), (s1, s11, s1y), (s2, s12, s2y))
    c = m.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        det.alias("det"),
        det0.alias("det0"),
        det1.alias("det1"),
        det2.alias("det2"),
    )
    return c.filter(F.col("det") != 0).select(
        "l_returnflag",
        "n",
        (F.col("det0").cast("double") / F.col("det").cast("double")).alias(
            "intercept_cents"
        ),
        (F.col("det1").cast("double") / F.col("det").cast("double")).alias(
            "beta_quantity"
        ),
        (F.col("det2").cast("double") / F.col("det").cast("double")).alias(
            "beta_discount"
        ),
    )


@register(
    "graph_triangle_count",
    oracle="""
    WITH e AS (
      SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
    tags=("graph", "extension", "bench_ext"),
)
def q_graph_triangle_count(spark, sf_dir):
    """Triangle counting on the co-purchase graph (parts are adjacent
    when some order contains both): the clustering-structure primitive
    for graph-shaped training data. Spark side runs the degree-oriented
    algorithm (operators/graph.py:triangle_count) whose wedge fan-out is
    m^1.5 worst case regardless of hub skew; the oracle counts the same
    canonical u<v<w closures with a plain 3-way self-join (equivalent by
    the orientation argument in the operator docstring)."""
    from .operators.graph import triangle_count

    return triangle_count(_copurchase_edges(spark, sf_dir))


@register(
    "k_anonymity_generalize",
    oracle="""
    WITH base AS (SELECT c_custkey, c_nationkey, c_mktsegment FROM customer),
    k1 AS (SELECT c_custkey, c_nationkey, c_mktsegment,
                  COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS k0
           FROM base),
    gen AS (SELECT c_nationkey,
                   CASE WHEN k0 < 5 THEN '*' ELSE c_mktsegment END AS segment
            FROM k1)
    SELECT c_nationkey, segment, CAST(COUNT(*) AS BIGINT) AS k,
           CAST(COUNT(*) >= 5 AS INTEGER) AS is_anonymous
    FROM gen GROUP BY c_nationkey, segment
    """,
    tags=("governance", "extension"),
)
def q_k_anonymity_generalize(spark, sf_dir):
    """k-anonymity audit with one generalization step (the
    training-data governance complement to the masked-view and PII
    operators): rows whose quasi-identifier class (nation, segment) has
    fewer than k=5 members get their segment suppressed to '*', then
    classes are re-formed and re-measured. Window-count + re-aggregate —
    two shuffles on the QI key, no join, no driver-side class list (the
    class census at 100 TB can itself be huge)."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey", "c_mktsegment")
    k1 = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.count(F.lit(1)).over(w).alias("k0"),
    )
    gen = k1.select(
        "c_nationkey",
        F.when(F.col("k0") < 5, F.lit("*"))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
    )
    return gen.groupBy("c_nationkey", "segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        (F.count(F.lit(1)) >= 5).cast("int").alias("is_anonymous"),
    )


@register(
    "hidden_partition_days_prune",
    oracle=f"""
    WITH ev AS ({_EV_SQL})
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM ev WHERE ts >= TIMESTAMP '2024-01-20 06:30:00'
    GROUP BY event_type
    """,
    tags=("lake", "layout", "extension"),
)
def q_hidden_partition_days_prune(spark, sf_dir):
    """Iceberg hidden partitioning, days(ts) transform
    (sources/partitioned.py:HiddenPartitionedTable): the table is laid
    out by day WITHOUT a user-visible day column; the reader filters on
    raw ``ts`` and the store prunes day partitions through the transform
    at the manifest (metadata-only), then applies the exact timestamp
    residual. The mid-day cutoff proves the boundary partition is kept
    and trimmed by the residual, not dropped. Pruning itself is pinned
    in tests/test_hidden_partition.py (scanned_partitions is the strict
    suffix of days)."""
    import tempfile

    from .sources.partitioned import HiddenPartitionedTable

    ev = _t(spark, sf_dir, "events")
    hp = HiddenPartitionedTable(
        spark, tempfile.mkdtemp(prefix="hp_days_"), "days", "ts"
    )
    hp.overwrite(ev.select("event_id", "ts", "event_type", "value"))
    got = hp.read_filtered([("ts", ">=", "2024-01-20 06:30:00")])
    return got.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "hidden_partition_bucket_prune",
    oracle=f"""
    WITH ev AS ({_EV_SQL})
    SELECT event_id, event_type,
           CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS value
    FROM ev WHERE user_id = 42
    """,
    tags=("lake", "layout", "extension"),
)
def q_hidden_partition_bucket_prune(spark, sf_dir):
    """Iceberg bucket(8, user_id) hidden partitioning: point reads on
    the key scan exactly one of 8 bucket partitions. The bucket of the
    literal is computed HOST-SIDE with zlib.crc32 — bit-identical to the
    JVM's F.crc32 — so pruning costs zero Spark jobs. Non-equality
    predicates on a bucketed key deliberately do not prune (hash
    destroys order); they fall back to the residual filter."""
    import tempfile

    from .sources.partitioned import HiddenPartitionedTable

    ev = _t(spark, sf_dir, "events")
    hp = HiddenPartitionedTable(
        spark, tempfile.mkdtemp(prefix="hp_bucket_"), "bucket", "user_id", n=8
    )
    hp.overwrite(ev.select("event_id", "user_id", "event_type", "value"))
    got = hp.read_filtered([("user_id", "==", 42)])
    return got.select(
        "event_id",
        "event_type",
        F.col("value").cast("decimal(18,4)").cast("double").alias("value"),
    )


@register(
    "events_holt_winters",
    oracle=None,  # coupled (level, trend, seasonal-vector) recursion —
    # no scalar SQL fold can replay it; host-exact-pinned instead
    tags=("events", "sequence", "agg", "timeseries", "extension"),
)
def q_events_holt_winters(spark, sf_dir):
    """Per-user Holt-Winters additive triple exponential smoothing
    (operators/sequence.holt_winters_scores, alpha 0.5 / beta 0.3 /
    gamma 0.2 / period 24 / horizon 1): level + trend + 24-slot seasonal
    vector over the time-ordered values — the seasonal rung above Holt,
    still on the constant-memory streaming fold engine (state is
    2 + period scalars per key, hot keys stream at O(arrow batch)).
    Rows-only by necessity (vector state defeats scalar list_reduce
    replay); bit-exact host replay incl. forced tiny Arrow batches
    pinned in tests/test_sequence_scale.py."""
    from .operators.sequence import holt_winters_scores

    return holt_winters_scores(_t(spark, sf_dir, "events"))


@register(
    "pareto_skyline_parts",
    oracle="""
    SELECT p.p_partkey, p.p_size, p.p_retailprice
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
        AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice))
    """,
    tags=("extension", "scale", "agg"),
)
def q_pareto_skyline_parts(spark, sf_dir):
    """2-D Pareto skyline over part (maximize size, minimize price —
    "the biggest parts at the lowest prices"): rows no other row
    strictly dominates. Runs the two-phase skyline operator
    (operators/scale.py:pareto_skyline) — per-partition local-frontier
    prefilter with zero shuffle, then an exact global pass whose ordered
    window sees only frontier-sized survivors. The oracle is the
    quadratic NOT EXISTS definition, so the algebraic two-phase
    decomposition is value-proven against the semantics directly."""
    from .operators.scale import pareto_skyline

    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    return pareto_skyline(part, "p_size", "p_retailprice", "max", "min")


@register(
    "observed_ingest_metrics",
    oracle=f"""
    WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                       event_type, value, props FROM events)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           CAST(COUNT(*) FILTER (WHERE props IS NULL) AS BIGINT)
             AS n_null_props,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
             AS n_purchases
    FROM ev
    """,
    tags=("lake", "quality", "extension"),
)
def q_observed_ingest_metrics(spark, sf_dir):
    """Single-pass ingest metrics via the Observation API (the
    ``observe()`` discipline purge_rows uses, surfaced as a first-class
    operator): quality counters ride the WRITE job itself — count, exact
    DECIMAL value sum, null-props count, purchase count (observed
    metrics reject DISTINCT aggregates by design — use the HLL sketch
    operators for distincts) — so the
    ingest produces its own dataset-card row with ZERO additional scans
    (the naive pattern scans once to write and once to measure). The
    returned metrics are exactly the oracle's aggregates over what was
    written."""
    import tempfile

    from pyspark.sql import Observation

    from .sources.tables import VersionedTable

    ev = _t(spark, sf_dir, "events")
    obs = Observation("ingest")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_value"),
        F.count_if(F.col("props").isNull()).cast("bigint").alias(
            "n_null_props"
        ),
        F.count_if(F.col("event_type") == "purchase").cast("bigint").alias(
            "n_purchases"
        ),
    )
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="vt_obs_"))
    vt.overwrite(observed)
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["sum_value"],
                m["n_null_props"],
                m["n_purchases"],
            )
        ],
        "n_rows bigint, sum_value double, n_null_props bigint, "
        "n_purchases bigint",
    )


@register(
    "streaming_hidden_partition_ingest",
    oracle=f"""
    WITH ev AS ({_EV_SQL})
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM ev WHERE ts >= TIMESTAMP '2024-01-20 06:30:00'
    GROUP BY event_type
    """,
    tags=("streaming", "lake", "layout", "extension"),
)
def q_streaming_hidden_partition_ingest(spark, sf_dir):
    """Streaming ingest into the Iceberg hidden-partitioned layout: the
    event stream replays as micro-batches through the partition-scoped
    keyed-upsert sink (streaming/scd2_stream.stream_upsert_partitioned —
    exactly-once via the manifest's txn-batch guard), with the days(ts)
    transform derived at write time per batch; each micro-batch rewrites
    only the DAYS it touches. The readback is a transform-pruned
    ts-range scan (same predicate as hidden_partition_days_prune), so
    the query proves the full streaming-write -> hidden-prune -> exact
    residual pipeline equals the batch aggregate."""
    import tempfile

    from .sources.partitioned import HiddenPartitionedTable
    from .streaming.scd2_stream import stream_upsert_partitioned

    ev0 = _events_stream(spark, sf_dir).select(
        "event_id", "ts", "event_type", "value"
    )
    hp = HiddenPartitionedTable(
        spark, tempfile.mkdtemp(prefix="hp_stream_"), "days", "ts"
    )
    hp.overwrite(
        spark.createDataFrame(
            [], "event_id long, ts timestamp_ntz, event_type string, "
            "value double"
        )
    )
    q = stream_upsert_partitioned(
        hp, ev0, ["event_id"], "value",
        tempfile.mkdtemp(prefix="hp_stream_ckpt_"),
    )
    q.awaitTermination()
    got = hp.read_filtered([("ts", ">=", "2024-01-20 06:30:00")])
    return got.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "embedding_group_spectrum_gram",
    oracle=None,  # eigendecomposition is not SQL-expressible; parity-
    # pinned against grouped_top_eigen at 1e-9 (tests/test_kcenter.py)
    tags=("similarity", "udf", "scale", "extension"),
)
def q_embedding_group_spectrum_gram(spark, sf_dir):
    """Scale twin of embedding_group_spectrum: the per-label covariance
    spectrum via associative PARTIAL Gram accumulation
    (operators/similarity.grouped_gram_spectrum) — no task ever holds a
    label's full vector matrix (the grouped-map version's documented
    100x caveat, now implemented): partial (n, sum, Gram) moments per
    arrow batch, a |labels| x (1+d+d²)-double shuffle, and a dim-sized
    eigensolve epilogue — on the driver up to max_driver_labels, as a
    bit-identical applyInPandas per label above it (round 9), so huge
    label cardinalities never build driver state."""
    from .operators.similarity import grouped_gram_spectrum

    return grouped_gram_spectrum(_t(spark, sf_dir, "embeddings"))


# --------------------------------------------------------------------------
# round-8 tranche 2: QUALIFY sugar, BFS reachability, TWAP, attribution,
# lossless edit-distance ε-join
# --------------------------------------------------------------------------

_QUALIFY_SQL = """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O'
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 2
"""


@register(
    "qualify_top_n_sql",
    oracle=_QUALIFY_SQL,
    tags=("sql", "window", "extension"),
)
def q_qualify_top_n_sql(spark, sf_dir):
    """Snowflake/DuckDB ``QUALIFY`` clause (filter on window results as
    one declarative clause) through the SQL front-end's literal-aware
    desugaring (operators/merge_sql.rewrite_qualify): the predicate is
    injected into the SELECT's own scope as a boolean column, filtered
    one level up, and dropped — Catalyst collapses it to the same
    Window + Filter plan as the hand-written subquery. The oracle is
    the IDENTICAL statement text run on DuckDB's native QUALIFY, so the
    desugaring is value-proven against a reference implementation of
    the clause itself."""
    from .operators.merge_sql import run_dml

    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return run_dml(spark, _QUALIFY_SQL)


@register(
    "graph_bfs_reachability",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
    sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
    seeds AS (SELECT DISTINCT p_partkey AS node FROM part
              WHERE p_size = 50),
    walk(node, hops) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT s.v, w.hops + 1 FROM walk w JOIN sym s ON s.u = w.node
      WHERE w.hops < 3)
    SELECT node, CAST(MIN(hops) AS INTEGER) AS hops
    FROM walk GROUP BY node
    """,
    tags=("graph", "extension"),
)
def q_graph_bfs_reachability(spark, sf_dir):
    """Multi-source BFS shortest hop distance (operators/graph.bfs_hops)
    on the co-purchase graph, seeds = parts of size 50, capped at 3
    hops — the contamination-blast-radius / "within k hops of a trusted
    source" reachability primitive. Spark runs level-synchronous
    frontier expansion (frontier-sized join + anti-join per round,
    localCheckpoint lineage truncation, no driver state beyond the
    stop test); the oracle is a depth-bounded recursive CTE taking MIN
    over walk lengths — equal because BFS's first discovery level IS
    the minimum walk length."""
    from .operators.graph import bfs_hops

    edges = _copurchase_edges(spark, sf_dir)
    seeds = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") == 50)
        .select(F.col("p_partkey").alias("node"))
    )
    return bfs_hops(edges, seeds, max_hops=3)


@register(
    "events_twap",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    seg AS (
      SELECT user_id,
             date_diff('second', ts,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id)) AS dt,
             CAST(value AS DECIMAL(18,4)) AS v
      FROM ev),
    agg AS (
      SELECT user_id,
             SUM(CAST(v * CAST(dt AS DECIMAL(10,0)) AS DECIMAL(29,4)))
               AS wsum,
             CAST(SUM(dt) AS BIGINT) AS total_seconds,
             CAST(COUNT(*) AS BIGINT) AS n_segments
      FROM seg WHERE dt IS NOT NULL GROUP BY user_id)
    SELECT user_id,
           CAST(wsum AS DOUBLE) / CAST(total_seconds AS DOUBLE)
             AS twap_value,
           total_seconds, n_segments
    FROM agg WHERE total_seconds > 0
    """,
    tags=("events", "window", "agg", "timeseries", "extension"),
)
def q_events_twap(spark, sf_dir):
    """Per-user TIME-WEIGHTED average value (TWAP — the telemetry/
    finance aggregate where each reading holds until the next one, so
    long-held values weigh more): weight = seconds until the user's
    next event (LEAD), last reading carries no weight. One window pass
    + one grouped aggregate — both shuffle on user_id and AQE merges
    them into a single exchange. Exactness: value as DECIMAL(18,4)
    times the integral duration accumulates as DECIMAL(29,4) (exact,
    order-independent); only the final division is DOUBLE, on
    bit-identical operands (both well under the 2^53 int->double
    conversion seam, NOTES.md)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("timestamp").cast("long")
    seg = ev.select(
        "user_id",
        (F.lead(sec).over(w) - sec).alias("dt"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    ).filter(F.col("dt").isNotNull())
    agg = seg.groupBy("user_id").agg(
        F.sum(
            (F.col("v") * F.col("dt").cast("decimal(10,0)")).cast(
                "decimal(29,4)"
            )
        ).alias("wsum"),
        F.sum("dt").cast("bigint").alias("total_seconds"),
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
    )
    return agg.filter(F.col("total_seconds") > 0).select(
        "user_id",
        (
            F.col("wsum").cast("double")
            / F.col("total_seconds").cast("double")
        ).alias("twap_value"),
        "total_seconds",
        "n_segments",
    )


@register(
    "attribution_first_last_touch",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    t AS (
      SELECT event_id, user_id, event_type,
             first_value(CASE WHEN event_type <> 'purchase'
                              THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS ft,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS lt
      FROM ev)
    SELECT event_id, user_id,
           COALESCE(ft, 'direct') AS first_touch,
           COALESCE(lt, 'direct') AS last_touch
    FROM t WHERE event_type = 'purchase'
    """,
    tags=("events", "window", "extension"),
)
def q_attribution_first_last_touch(spark, sf_dir):
    """First-/last-touch conversion attribution: for every purchase,
    the user's earliest and most recent preceding NON-purchase event
    types ('direct' when none) — the marketing-attribution primitive.
    Spark-first design: NOT the quadratic-fan-out range join
    (conversions x all earlier touches); a single window pass with an
    UNBOUNDED-PRECEDING..1-PRECEDING frame and ignorenulls first/last
    computes both credits in one user_id exchange, constant state per
    row. DuckDB replays the identical frames with IGNORE NULLS window
    aggregates."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            F.first(touch, ignorenulls=True).over(w).alias("ft"),
            F.last(touch, ignorenulls=True).over(w).alias("lt"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.coalesce("ft", F.lit("direct")).alias("first_touch"),
            F.coalesce("lt", F.lit("direct")).alias("last_touch"),
        )
    )


# deterministic near-duplicate fixture for the ε-join: one edit per part
# name, the edit KIND varying by key so string lengths spread across
# bands (delete / substitute / insert at position p_partkey % 7 + 1)
_PERTURB_SQL = """
    SELECT p_partkey + 1000000 AS cand_key,
           CASE p_partkey % 3
             WHEN 0 THEN substr(p_name, 1, p_partkey % 7)
                         || substr(p_name, p_partkey % 7 + 2)
             WHEN 1 THEN substr(p_name, 1, p_partkey % 7)
                         || 'x' || substr(p_name, p_partkey % 7 + 2)
             ELSE substr(p_name, 1, p_partkey % 7)
                  || 'x' || substr(p_name, p_partkey % 7 + 1)
           END AS cand_name
    FROM part
"""


@register(
    "edit_distance_epsilon_join",
    oracle=f"""
    WITH cand AS ({_PERTURB_SQL})
    SELECT p.p_partkey, c.cand_key, p.p_name, c.cand_name,
           CAST(levenshtein(p.p_name, c.cand_name) AS INTEGER) AS distance
    FROM part p CROSS JOIN cand c
    WHERE levenshtein(p.p_name, c.cand_name) <= 1
    """,
    tags=("dedup", "text", "scale", "extension"),
)
def q_edit_distance_epsilon_join(spark, sf_dir):
    """LOSSLESS Levenshtein ε-join (operators/dedup.levenshtein_join):
    part names against a derived single-edit candidate batch (delete/
    substitute/insert by key, so lengths spread), threshold 1. The
    band on |len(a)-len(b)| <= d is a true edit-distance invariant, so
    unlike fuzzy_name_matches' first-token blocking NOTHING is lost —
    the oracle is the full quadratic cross join, and the equi-join on
    the length band must reproduce it exactly. At 100 TB the plan is a
    shuffle-partitionable equi-join with fixed 2d+1 fan-out instead of
    the nested-loop cross product Spark plans for a raw
    ``levenshtein(a,b) <= d`` theta join."""
    from .operators.dedup import levenshtein_join

    part = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    head = F.expr("substr(p_name, 1, p_partkey % 7)")
    cand = part.select(
        (F.col("p_partkey") + 1000000).alias("cand_key"),
        F.when(
            F.col("p_partkey") % 3 == 0,
            F.concat(head, F.expr("substr(p_name, p_partkey % 7 + 2)")),
        )
        .when(
            F.col("p_partkey") % 3 == 1,
            F.concat(
                head,
                F.lit("x"),
                F.expr("substr(p_name, p_partkey % 7 + 2)"),
            ),
        )
        .otherwise(
            F.concat(
                head,
                F.lit("x"),
                F.expr("substr(p_name, p_partkey % 7 + 1)"),
            )
        )
        .alias("cand_name"),
    )
    out = levenshtein_join(
        part, cand, "p_partkey", "p_name", "cand_key", "cand_name",
        max_distance=1,
    )
    return out.select(
        "p_partkey",
        "cand_key",
        "p_name",
        "cand_name",
        F.col("distance").cast("int").alias("distance"),
    )


# --------------------------------------------------------------------------
# Batch: round-8 second tranche — reconciliation, lossless Hamming join,
# retrieval, vocabulary laws, bootstrap CIs, graph assortativity,
# balanced sampling, SCD2 calendarization, feature hashing
# --------------------------------------------------------------------------

_RECON_HASH = (
    "CAST(concat('0x', substr(md5(concat("
    "COALESCE(c_name, chr(30) || 'N'), chr(31), "
    "COALESCE(CAST(c_nationkey AS VARCHAR), chr(30) || 'N'), chr(31), "
    "COALESCE(c_mktsegment, chr(30) || 'N'))), 1, 15)) AS BIGINT)"
)


@register(
    "table_reconcile_diff",
    oracle=f"""
    WITH tgt AS (
      SELECT c_custkey, c_name, c_nationkey,
             CASE WHEN c_custkey % 13 = 0 THEN c_mktsegment || '_v2'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer WHERE c_custkey % 19 <> 0
      UNION ALL
      SELECT c_custkey + 1000000, c_name, c_nationkey, c_mktsegment
      FROM customer WHERE c_custkey % 17 = 0
    ),
    sh AS (
      SELECT c_custkey, CAST(COUNT(*) AS BIGINT) AS src_n,
             CAST(SUM({_RECON_HASH}) AS DECIMAL(38,0)) AS src_sum
      FROM customer GROUP BY c_custkey
    ),
    th AS (
      SELECT c_custkey, CAST(COUNT(*) AS BIGINT) AS tgt_n,
             CAST(SUM({_RECON_HASH}) AS DECIMAL(38,0)) AS tgt_sum
      FROM tgt GROUP BY c_custkey
    ),
    j AS (
      SELECT COALESCE(sh.c_custkey, th.c_custkey) AS c_custkey,
             src_n, src_sum, tgt_n, tgt_sum
      FROM sh FULL OUTER JOIN th ON sh.c_custkey = th.c_custkey
    )
    SELECT c_custkey,
           CASE WHEN tgt_n IS NULL THEN 'insert'
                WHEN src_n IS NULL THEN 'delete'
                WHEN src_n <> tgt_n OR src_sum <> tgt_sum THEN 'update'
           END AS change_type,
           CAST(COALESCE(src_n, 0) AS BIGINT) AS src_n,
           CAST(COALESCE(tgt_n, 0) AS BIGINT) AS tgt_n
    FROM j
    WHERE tgt_n IS NULL OR src_n IS NULL
       OR src_n <> tgt_n OR src_sum <> tgt_sum
    """,
    tags=("lake", "quality", "scale", "extension", "bench_ext"),
)
def q_table_reconcile_diff(spark, sf_dir):
    """Keyed reconciliation changeset (operators/validate.
    reconcile_tables): customer (truth) vs a drifted replica (every
    19th key lost, every 13th segment mutated, every 17th key
    spuriously duplicated under +1000000) — emits exactly the
    insert/delete/update worklist that repairs the replica. The
    100 TB argument: each side folds to a per-key (count, DECIMAL
    hash-sum) multiset digest in the MAP-SIDE partial aggregate, so
    the shuffle and the full-outer join carry keys + 16 bytes — never
    the payload — and repair reads back only flagged keys. The DuckDB
    oracle replays the identical md5 digest algebra and must produce
    the identical changeset."""
    from .operators.validate import reconcile_tables

    cust = _t(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]
    src = cust.select(*cols)
    changed = src.filter(F.col("c_custkey") % 19 != 0).withColumn(
        "c_mktsegment",
        F.when(
            F.col("c_custkey") % 13 == 0,
            F.concat(F.col("c_mktsegment"), F.lit("_v2")),
        ).otherwise(F.col("c_mktsegment")),
    )
    spurious = src.filter(F.col("c_custkey") % 17 == 0).withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(1000000)
    )
    tgt = changed.unionByName(spurious)
    return reconcile_tables(
        src, tgt, ["c_custkey"], ["c_name", "c_nationkey", "c_mktsegment"]
    )


@register(
    "simhash_hamming_join",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5('sig:' || CAST(doc_id AS VARCHAR)),
                                      1, 15)) AS BIGINT) AS sig
      FROM documents
    ),
    cand AS (
      SELECT doc_id + 1000000 AS cand_id,
             xor(sig, ((CAST(1 AS BIGINT) << CAST(doc_id % 4 AS INTEGER)) - 1)
                      << CAST(doc_id % 57 AS INTEGER)) AS csig
      FROM base
    )
    SELECT b.doc_id, c.cand_id,
           CAST(bit_count(xor(b.sig, c.csig)) AS INTEGER) AS distance
    FROM base b CROSS JOIN cand c
    WHERE bit_count(xor(b.sig, c.csig)) <= 2
    """,
    tags=("dedup", "scale", "extension", "bench_ext"),
)
def q_simhash_hamming_join(spark, sf_dir):
    """LOSSLESS Hamming <=2 join (operators/dedup.hamming_join) between
    the corpus's 60-bit fingerprints and a derived candidate batch whose
    signature differs by exactly ``doc_id % 4`` contiguous bits — so the
    ground truth spans distances 0..3 and the threshold must keep
    exactly the 0/1/2 subset. The oracle is the full quadratic cross
    join with ``bit_count(xor) <= 2``; the pigeonhole band join (3
    disjoint 20-bit bands, first-shared-band dedup, no distinct) must
    reproduce it bit-for-bit. This is the SimHash/pHash near-dup
    companion to the probabilistic MinHash LSH pipeline: same banded
    equi-join plan at 100 TB, but with a zero-false-negative guarantee."""
    from .operators.dedup import hamming_join

    from .functions.hashing import md5_hash64

    base = _t(spark, sf_dir, "documents").select(
        "doc_id",
        md5_hash64(
            F.concat(F.lit("sig:"), F.col("doc_id").cast("string"))
        ).alias("sig"),
    )
    cand = base.select(
        (F.col("doc_id") + 1000000).alias("cand_id"),
        F.col("sig")
        .bitwiseXOR(
            F.expr(
                "shiftleft(cast(shiftleft(1L, cast(doc_id % 4 as int)) - 1 "
                "as bigint), cast(doc_id % 57 as int))"
            )
        )
        .alias("csig"),
    )
    return hamming_join(
        base, cand, "doc_id", "sig", "cand_id", "csig",
        max_distance=2, sig_bits=60,
    )


@register(
    "inverted_index_search",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE tok IN ('merge', 'window', 'stream')
      GROUP BY doc_id, tok
    )
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS score
    FROM tf GROUP BY doc_id HAVING COUNT(*) = 3
    ORDER BY score DESC, doc_id LIMIT 50
    """,
    tags=("text", "retrieval", "extension", "bench_ext"),
)
def q_inverted_index_search(spark, sf_dir):
    """Conjunctive boolean retrieval over the corpus inverted index
    (operators/text.inverted_index + conjunctive_search): documents
    containing ALL of {merge, window, stream}, ranked by total matched
    term frequency (all-integer — engine-exact, see the operator
    docstring for why tf-ranking rather than float BM25 carries the
    oracle). The query-token IN filter sits below the postings
    aggregate, so only three tokens' postings are built; persisted
    token-bucketed postings turn this into bucket-pruned lookups at
    100 TB."""
    from .operators.text import conjunctive_search

    return conjunctive_search(
        _t(spark, sf_dir, "documents"), ["merge", "window", "stream"]
    )


@register(
    "zipf_rank_frequency",
    oracle=r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
      FROM documents
    ),
    freq AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
      FROM toks GROUP BY token
    ),
    tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total FROM freq)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS BIGINT)
             AS rank,
           token, freq,
           CAST(SUM(freq) OVER (ORDER BY freq DESC, token) AS BIGINT)
             AS cum_freq,
           CAST(CAST(SUM(freq) OVER (ORDER BY freq DESC, token) AS BIGINT)
                AS DOUBLE) / (SELECT total FROM tot) AS cum_share
    FROM freq
    ORDER BY rank LIMIT 100
    """,
    tags=("text", "stats", "extension"),
)
def q_zipf_rank_frequency(spark, sf_dir):
    """Zipf rank-frequency head of the corpus vocabulary: token rank
    (by frequency, token tie-break), frequency, cumulative frequency,
    and cumulative coverage share — the table behind tokenizer vocab
    sizing ('how many types cover 95% of tokens'). Exactness: counts
    and cumulative sums are all-integer; the single closing IEEE
    division per row is identical in both engines. Scale: one
    token-level aggregate; the ranking window runs over the VOCABULARY
    (types, not tokens), which is log-scale smaller than the corpus,
    and the LIMIT head is what production exports."""
    docs = _t(spark, sf_dir, "documents")
    from .operators.text import tokens_expr

    freq = (
        docs.select(F.explode(tokens_expr("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), "token")
    total = freq.agg(F.sum("freq").cast("bigint").alias("__total"))
    return (
        freq.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "cum_freq",
            F.sum("freq").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).cast("bigint"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "token",
            "freq",
            "cum_freq",
            (F.col("cum_freq").cast("double") / F.col("__total")).alias(
                "cum_share"
            ),
        )
        .orderBy("rank")
        .limit(100)
    )


@register(
    "heaps_vocabulary_growth",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents
    ),
    per_bin AS (
      SELECT doc_id // 100 AS bin, CAST(COUNT(*) AS BIGINT) AS n_toks
      FROM toks GROUP BY 1
    ),
    firsts AS (
      SELECT tok, MIN(doc_id) // 100 AS fbin FROM toks GROUP BY tok
    ),
    new_types AS (
      SELECT fbin AS bin, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM firsts GROUP BY fbin
    ),
    b AS (
      SELECT p.bin, p.n_toks, COALESCE(n.n_new, 0) AS n_new
      FROM per_bin p LEFT JOIN new_types n ON p.bin = n.bin
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(SUM(n_toks) OVER (ORDER BY bin) AS BIGINT) AS cum_tokens,
           CAST(SUM(n_new) OVER (ORDER BY bin) AS BIGINT) AS cum_vocab
    FROM b ORDER BY bin
    """,
    tags=("text", "stats", "extension"),
)
def q_heaps_vocabulary_growth(spark, sf_dir):
    """Heaps'-law vocabulary growth curve: cumulative token count vs
    cumulative distinct-type count as the corpus is consumed in doc_id
    order, reported at 100-doc bin boundaries — the diagnostic for 'is
    the corpus still contributing new vocabulary' during data mixing.
    Spark-first shape: a type's contribution point is MIN(doc_id) (one
    token-level aggregate — no per-prefix distinct-count blowup), both
    curves then fold per BIN so the serial prefix-sum window runs over
    n_docs/100 rows, not tokens; at larger scale the bin width is the
    knob that keeps the final window driver-trivial while the heavy
    aggregation stays fully parallel."""
    docs = _t(spark, sf_dir, "documents")
    from .operators.text import tokens_expr

    toks = docs.select(
        "doc_id", F.explode(tokens_expr("text")).alias("tok")
    )
    per_bin = (
        toks.groupBy(F.expr("doc_id div 100").alias("bin"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_toks"))
    )
    new_types = (
        toks.groupBy("tok")
        .agg(F.expr("div(min(doc_id), 100)").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new"))
    )
    b = per_bin.join(new_types, "bin", "left").select(
        "bin",
        "n_toks",
        F.coalesce("n_new", F.lit(0).cast("bigint")).alias("n_new"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    return (
        b.select(
            F.col("bin").cast("bigint").alias("bin"),
            F.sum("n_toks").over(w).cast("bigint").alias("cum_tokens"),
            F.sum("n_new").over(w).cast("bigint").alias("cum_vocab"),
        ).orderBy("bin")
    )


_BOOT_T = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
)
_BOOT_H = (
    "CAST(concat('0x', substr(md5(concat('boot', CAST(b AS VARCHAR), ':', "
    "CAST(event_id AS VARCHAR))), 1, 15)) AS BIGINT)"
)
_BOOT_W = " + ".join(
    f"CAST({_BOOT_H} >= {t} AS INTEGER)" for t in _BOOT_T
)


@register(
    "bootstrap_group_mean_ci",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    reps AS (
      SELECT event_type AS g, b,
             CAST(SUM(({_BOOT_W}) * CAST(value AS DECIMAL(18,4)))
                  AS DOUBLE)
             / CAST(SUM({_BOOT_W}) AS DOUBLE) AS mean_b
      FROM ev CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b)
      GROUP BY event_type, b
      HAVING SUM({_BOOT_W}) > 0
    ),
    ranked AS (
      SELECT g, mean_b,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY mean_b, b) AS rn
      FROM reps
    ),
    ci AS (
      SELECT g, MAX(CASE WHEN rn = 2 THEN mean_b END) AS ci_lo,
                MAX(CASE WHEN rn = 31 THEN mean_b END) AS ci_hi
      FROM ranked GROUP BY g
    ),
    pt AS (
      SELECT event_type AS g,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mean
      FROM ev GROUP BY event_type
    )
    SELECT pt.g AS event_type, mean, ci_lo, ci_hi,
           CAST(32 AS INTEGER) AS reps
    FROM pt JOIN ci ON pt.g = ci.g
    """,
    tags=("events", "stats", "scale", "extension", "bench_ext"),
)
def q_bootstrap_group_mean_ci(spark, sf_dir):
    """Deterministic Poisson-bootstrap 90% CI for the per-event-type
    mean of ``value`` (operators/sampling.poisson_bootstrap_ci, 32
    replicates). The Poisson(1) trick is what makes bootstrap feasible
    at 100 TB: every row draws its per-replicate weight LOCALLY from an
    integer md5-vs-CDF-threshold compare, so all 32 resamples ride one
    explode + one (group, rep) aggregate — no per-replicate shuffle, no
    resampling coordination — and the identical draws replay in any
    engine, which is why the oracle can demand bit-equality on the
    interval endpoints."""
    from .operators.sampling import poisson_bootstrap_ci

    ev = _t(spark, sf_dir, "events")
    return poisson_bootstrap_ci(
        ev, "event_type", "value", "event_id", reps=32
    )


@register(
    "bootstrap_group_mean_ci_wide",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    reps AS (
      SELECT event_type AS g, b,
             CAST(SUM(({_BOOT_W}) * CAST(value AS DECIMAL(18,4)))
                  AS DOUBLE)
             / CAST(SUM({_BOOT_W}) AS DOUBLE) AS mean_b
      FROM ev CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b)
      GROUP BY event_type, b
      HAVING SUM({_BOOT_W}) > 0
    ),
    ranked AS (
      SELECT g, mean_b,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY mean_b, b) AS rn
      FROM reps
    ),
    ci AS (
      SELECT g, MAX(CASE WHEN rn = 2 THEN mean_b END) AS ci_lo,
                MAX(CASE WHEN rn = 31 THEN mean_b END) AS ci_hi
      FROM ranked GROUP BY g
    ),
    pt AS (
      SELECT event_type AS g,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mean
      FROM ev GROUP BY event_type
    )
    SELECT pt.g AS event_type, mean, ci_lo, ci_hi,
           CAST(32 AS INTEGER) AS reps
    FROM pt JOIN ci ON pt.g = ci.g
    """,
    tags=("events", "stats", "scale", "extension"),
)
def q_bootstrap_group_mean_ci_wide(spark, sf_dir):
    """The NO-EXPLODE bootstrap twin
    (operators/sampling.poisson_bootstrap_ci_wide): the 32 replicates
    are 64 aggregate expressions over ONE pass of the base rows — no
    32x row fan-out — with the per-group order statistic as an
    array_sort inside one row. Bit-equal to the tall path (same md5
    draws, same DECIMAL sums, same closing division), hence the SAME
    oracle. Measured r10 at sf0.1: tall 1.0 s vs wide 2.9 s after the
    draw-stage CPU rebalance (the 64-buffer codegen outweighs the
    avoided explode at this group count), so the tall twin keeps the
    bench_ext tag; the trade flips when the explode's 32x rows no
    longer fit the shuffle comfortably."""
    from .operators.sampling import poisson_bootstrap_ci_wide

    ev = _t(spark, sf_dir, "events")
    return poisson_bootstrap_ci_wide(
        ev, "event_type", "value", "event_id", reps=32
    )


_COPURCHASE_E = """
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


def _copurchase_edges(spark, sf_dir):
    """Distinct canonical co-purchase edges (u < v share an order),
    derived WITHOUT the lineitem self-join (r12 optimization): one
    groupBy-order collect_set + an array pair expansion replaces the
    two-sided shuffle + join (the per-order item count is bounded, so
    the explode is a fixed small fan-out — the same set the oracle's
    self-join produces, since collect_set dedups within the order and
    the sorted array emits each u < v pair once). The lazy
    localCheckpoint matters because every graph consumer reads the
    edge set 3x (degrees twice via the incidence union, the
    orientation/contribution join once) — without the cut Spark
    re-derives the edges per consumer. Measured on the sf0.1 graph:
    triangle count 5.2 s -> ~2 s, identical result."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ps = (
        li.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        .select(F.array_sort("ps").alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    pairs = ps.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "transform(slice(ps, i + 2, size(ps) - i - 1), "
                "y -> struct(x AS u, y AS v))))"
            )
        ).alias("p")
    ).select("p.u", "p.v")
    return pairs.distinct().localCheckpoint(eager=False)


@register(
    "graph_degree_distribution",
    oracle=f"""
    WITH e AS ({_COPURCHASE_E}),
    inc AS (SELECT u AS node FROM e UNION ALL SELECT v FROM e),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM inc GROUP BY node)
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree
    """,
    tags=("graph", "stats", "extension"),
)
def q_graph_degree_distribution(spark, sf_dir):
    """Degree histogram of the co-purchase graph — the first thing one
    plots before joining on a graph at scale (a heavy tail here means
    the downstream joins need AQE skew splitting / salting). Two
    aggregates: incidences -> per-node degree (map-side combined),
    degree -> node count; output is max-degree-sized."""
    edges = _copurchase_edges(spark, sf_dir)
    inc = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = inc.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )


@register(
    "graph_degree_assortativity",
    oracle=f"""
    WITH e AS ({_COPURCHASE_E}),
    inc AS (SELECT u AS s, v AS t FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT s AS node, CAST(COUNT(*) AS DECIMAL(38,0)) AS degree
            FROM inc GROUP BY s),
    xy AS (SELECT ds.degree AS x, dt.degree AS y
           FROM inc JOIN deg ds ON inc.s = ds.node
                    JOIN deg dt ON inc.t = dt.node),
    m AS (SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
                 CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
                 CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
                 CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
                 CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy,
                 CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy
          FROM xy)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0)) AS DOUBLE)
             / (sqrt(CAST(CAST(n * sxx - sx * sx AS DECIMAL(38,0)) AS DOUBLE))
                * sqrt(CAST(CAST(n * syy - sy * sy AS DECIMAL(38,0))
                            AS DOUBLE)))
                END
             AS assortativity
    FROM m
    """,
    tags=("graph", "stats", "extension"),
)
def q_graph_degree_assortativity(spark, sf_dir):
    """Newman degree assortativity of the co-purchase graph
    (operators/graph.degree_assortativity): Pearson correlation of
    endpoint degrees over directed incidences, with every moment
    accumulated as integer DECIMAL(38,0) so the coefficient is
    bit-identical cross-engine (same discipline as
    grouped_correlation). One incidence aggregate + two degree joins +
    a one-row moment fold."""
    from .operators.graph import degree_assortativity

    return degree_assortativity(_copurchase_edges(spark, sf_dir))


@register(
    "class_balanced_sample",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    cap AS (SELECT MIN(n) AS cap FROM c),
    r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY CAST(concat('0x', substr(md5(
                          'bal:' || CAST(doc_id AS VARCHAR)), 1, 15))
                        AS BIGINT), doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang FROM r, cap WHERE rn <= cap.cap
    """,
    tags=("sampling", "text", "extension"),
)
def q_class_balanced_sample(spark, sf_dir):
    """Auto class-balanced downsample (operators/sampling.
    class_balanced_sample): every language keeps exactly the minority
    language's document count, selected by portable md5 rank — so the
    output is perfectly label-balanced, deterministic across engines
    and layouts, and the cap is part of the SAME lazy plan (a
    broadcast one-row min, no driver round trip). The oracle replays
    the rank and the min-cap verbatim."""
    from .operators.sampling import class_balanced_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return class_balanced_sample(docs, "doc_id", "lang")


@register(
    "scd2_daily_snapshots",
    oracle=f"""
    WITH m AS ({_SQL_MERGE_DELTA}),
    iv AS (
      SELECT c_mktsegment,
             GREATEST(CAST(valid_from AS DATE), DATE '2024-01-01') AS d0,
             LEAST(COALESCE(CAST(valid_to AS DATE) - 1, DATE '2024-02-01'),
                   DATE '2024-02-01') AS d1
      FROM m
    ),
    days AS (
      SELECT c_mktsegment,
             unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d
      FROM iv WHERE d0 <= d1
    )
    SELECT CAST(CAST(d AS DATE) AS TIMESTAMP) AS snapshot_date, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM days GROUP BY 1, 2
    """,
    tags=("scd2", "temporal", "extension"),
)
def q_scd2_daily_snapshots(spark, sf_dir):
    """Calendarized SCD2: explode each dimension row's validity
    interval [valid_from, valid_to) into the daily snapshots it was
    current for (clamped to the Jan-1..Feb-1 horizon) and count
    customers per segment per day — the 'as-of every day' reporting
    table BI layers build over slowly-changing dimensions. Fan-out is
    bounded by the horizon length (31 days here; retention_days in
    production), and the result partitions naturally by snapshot_date.
    Runs over the Delta-variant merge output because that variant
    preserves unchanged rows' original validity — the faithful
    history."""
    merged = scd2_merge_delta_style(
        scd2_target(spark, sf_dir, include_ts=False),
        customer_updates(spark, sf_dir),
        "c_custkey",
        CHECKSUM_COLS,
        as_of=T2,
    )
    d0 = F.greatest(F.to_date("valid_from"), F.lit("2024-01-01").cast("date"))
    d1 = F.least(
        F.coalesce(
            F.date_sub(F.to_date("valid_to"), 1),
            F.lit("2024-02-01").cast("date"),
        ),
        F.lit("2024-02-01").cast("date"),
    )
    iv = merged.select("c_mktsegment", d0.alias("d0"), d1.alias("d1"))
    days = iv.filter(F.col("d0") <= F.col("d1")).select(
        "c_mktsegment",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("snapshot_date"),
    )
    return days.groupBy(
        # repo convention: DATE round-trips inconsistently across
        # engines' pandas bridges — emit naive TIMESTAMP
        F.col("snapshot_date").cast("timestamp_ntz").alias("snapshot_date"),
        "c_mktsegment",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))


@register(
    "feature_hash_vectors",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             CAST(CAST(concat('0x', substr(md5('fh:' || tok), 1, 15))
                       AS BIGINT) % 64 AS INTEGER) AS bucket,
             CASE WHEN CAST(concat('0x', substr(md5('fhs:' || tok), 1, 15))
                        AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s
      FROM toks
    )
    SELECT doc_id, bucket, CAST(SUM(s) AS BIGINT) AS weight
    FROM f GROUP BY doc_id, bucket
    """,
    tags=("text", "ml", "extension"),
)
def q_feature_hash_vectors(spark, sf_dir):
    """Hashing-trick featurization (operators/text.feature_hash):
    64-bucket signed token counts per document — the vocabulary-free
    feature map (no fit step, no vocab broadcast, fixed width at any
    corpus size). All-integer signed weights keep the oracle exact;
    one explode + one (doc, bucket) map-side-combined aggregate."""
    from .operators.text import feature_hash

    return feature_hash(_t(spark, sf_dir, "documents"))


@register(
    "streaming_windowed_topk",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    wc AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             COUNT(*) AS n_events
      FROM ev GROUP BY 1, 2
    ),
    r AS (
      SELECT window_start, event_type, n_events,
             ROW_NUMBER() OVER (PARTITION BY window_start
                                ORDER BY n_events DESC, event_type) AS rnk
      FROM wc
    )
    SELECT window_start, event_type, CAST(n_events AS BIGINT) AS n_events,
           CAST(rnk AS INTEGER) AS rnk
    FROM r WHERE rnk <= 3
    """,
    tags=("streaming", "window", "extension"),
)
def q_streaming_windowed_topk(spark, sf_dir):
    """Streaming top-k: the live tumbling-hour counts (Structured
    Streaming, AvailableNow replay) post-ranked to the top-3 event
    types per window — the standard two-stage shape, because ranking
    is not an incremental streaming aggregate: the STREAM maintains
    the per-(window, type) counts (bounded state, watermark-evictable)
    and the cheap rank runs over the sink table, whose cardinality is
    windows x types, not events. Deterministic tie-break on
    event_type."""
    wc = run_stream_to_memory(
        stream_tumbling_counts(_events_stream(spark, sf_dir))
    )
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), "event_type"
    )
    return (
        wc.select("window_start", "event_type", "n_events")
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
    )


@register(
    "streaming_distribution_drift",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    wc AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY 1, 2
    ),
    ref AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS rn FROM wc
      GROUP BY event_type
    ),
    tot AS (SELECT CAST(SUM(rn) AS BIGINT) AS n_ref FROM ref),
    wtot AS (
      SELECT window_start, CAST(SUM(n) AS BIGINT) AS n_w FROM wc
      GROUP BY window_start
    ),
    grid AS (
      SELECT w.window_start, r.event_type, r.rn, w.n_w
      FROM wtot w CROSS JOIN ref r
    ),
    terms AS (
      SELECT g.window_start, g.n_w,
             CAST(abs(COALESCE(c.n, 0) * t.n_ref - g.rn * g.n_w)
                  AS DECIMAL(38,0)) AS num
      FROM grid g
      LEFT JOIN wc c
        ON c.window_start = g.window_start AND c.event_type = g.event_type
      CROSS JOIN tot t
    )
    SELECT window_start, CAST(n_w AS BIGINT) AS n_events,
           CAST(CAST(SUM(num) AS DECIMAL(38,0)) AS DOUBLE)
           / CAST(2 * n_w * (SELECT n_ref FROM tot) AS DOUBLE) AS tvd
    FROM terms GROUP BY window_start, n_w
    """,
    tags=("streaming", "stats", "quality", "extension"),
)
def q_streaming_distribution_drift(spark, sf_dir):
    """Streaming drift monitor: per tumbling hour, the total-variation
    distance between that window's event-type distribution and the
    whole stream's reference distribution — the data-drift alarm for a
    live ingest pipeline. The stream maintains the (window, type)
    counts; the monitor is a cheap batch pass over that windows x types
    sink. Exactness discipline (same as the corpus TVD operator):
    TVD = sum_t |n_wt*N_ref - ref_t*N_w| / (2*N_w*N_ref), so every
    accumulated term is an INTEGER (DECIMAL(38,0) — order-independent)
    and the single closing IEEE division is identical cross-engine.
    Missing types in a window contribute their full reference mass via
    the broadcast windows x types grid."""
    wc = (
        run_stream_to_memory(
            stream_tumbling_counts(_events_stream(spark, sf_dir))
        )
        .select("window_start", "event_type", F.col("n_events").alias("n"))
        # the memory-sink MemoryPlan leaf cannot deduplicate attribute
        # ids across a self-join (ref/wtot/wc all derive from it);
        # localCheckpoint materializes the windows x types sink once
        # (its natural size) and gives the monitor a joinable lineage
        .localCheckpoint()
    )
    ref = wc.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("rn")
    )
    tot = ref.agg(F.sum("rn").cast("bigint").alias("n_ref"))
    wtot = wc.groupBy("window_start").agg(
        F.sum("n").cast("bigint").alias("n_w")
    )
    grid = wtot.crossJoin(F.broadcast(ref))
    terms = (
        grid.join(wc, ["window_start", "event_type"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "window_start",
            "n_w",
            "n_ref",
            F.abs(
                F.coalesce("n", F.lit(0)) * F.col("n_ref")
                - F.col("rn") * F.col("n_w")
            )
            .cast("decimal(38,0)")
            .alias("num"),
        )
    )
    return terms.groupBy("window_start", "n_w", "n_ref").agg(
        F.sum("num").cast("decimal(38,0)").alias("__s")
    ).select(
        "window_start",
        F.col("n_w").alias("n_events"),
        (
            F.col("__s").cast("double")
            / (F.lit(2) * F.col("n_w") * F.col("n_ref")).cast("double")
        ).alias("tvd"),
    )


@register(
    "table_column_stats",
    oracle="""
    SELECT 'o_orderkey' AS "column",
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    """,
    tags=("lake", "stats", "extension"),
)
def q_table_column_stats(spark, sf_dir):
    """ANALYZE-TABLE column statistics (operators/tablestats.
    column_stats, exact mode): row/non-null/distinct counts and
    min/max per column of orders, computed as parallel aggregate
    expressions in ONE scan and unpivoted with stack() — the catalog
    numbers behind join-size estimation (estimate_equijoin_rows) and
    partition sizing. Exact NDV here so the oracle can replay it;
    production default is the HLL form (constant memory at 100 TB)."""
    from .operators.tablestats import column_stats

    return column_stats(
        _t(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus"],
        exact=True,
    )


@register(
    "curation_pipeline_round8",
    oracle=r"""
    WITH base AS (
      SELECT doc_id, lang, text,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             md5(text) AS digest
      FROM documents
    ),
    dedup AS (
      SELECT * FROM base
      QUALIFY ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id) = 1
    ),
    cap AS (
      SELECT MIN(n) AS cap FROM (
        SELECT lang, COUNT(*) AS n FROM dedup GROUP BY lang)
    ),
    bal AS (
      SELECT doc_id, lang, n_tokens FROM (
        SELECT doc_id, lang, n_tokens,
               ROW_NUMBER() OVER (
                 PARTITION BY lang
                 ORDER BY CAST(concat('0x', substr(md5(
                            'bal:' || CAST(doc_id AS VARCHAR)), 1, 15))
                          AS BIGINT), doc_id) AS rn
        FROM dedup), cap
      WHERE rn <= cap.cap
    ),
    staged AS (
      SELECT doc_id, lang, n_tokens,
             CAST(NTILE(4) OVER (ORDER BY n_tokens, doc_id) AS INTEGER)
               AS stage,
             CAST(CAST(concat('0x', substr(md5(
                    'shard8:' || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 8 AS INTEGER) AS shard
      FROM bal
    )
    SELECT shard, stage, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
    FROM staged GROUP BY shard, stage, lang
    """,
    tags=("text", "capstone", "extension"),
)
def q_curation_pipeline_round8(spark, sf_dir):
    """Round-8 curation capstone — the new operators composed on the
    real path: exact dedup (digest keep-first) -> AUTO class-balanced
    language rebalance (class_balanced_sample: minority-size cap as a
    broadcast aggregate, md5-rank selection) -> 4-stage LENGTH
    CURRICULUM (short-to-long NTILE over token counts; the approx-
    quantile twin is the documented 100x path, same as decile_
    bucketing_approx) -> salted shard assignment -> per-(shard, stage,
    lang) manifest counts. One oracle replays every stage, so a drift
    anywhere in the composition fails the gate — the property that
    makes the pipeline refactorable."""
    from .functions.hashing import md5_hash64
    from .operators.sampling import class_balanced_sample
    from .operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(tokens_expr("text")).cast("bigint").alias("n_tokens"),
        F.md5("text").alias("digest"),
    )
    keep_first = Window.partitionBy("digest").orderBy("doc_id")
    dedup = (
        docs.withColumn("__rn", F.row_number().over(keep_first))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    bal = class_balanced_sample(
        dedup.select("doc_id", "lang", "n_tokens"), "doc_id", "lang"
    )
    staged = bal.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.ntile(4)
        .over(Window.orderBy("n_tokens", "doc_id"))
        .cast("int")
        .alias("stage"),
        (
            md5_hash64(
                F.concat(F.lit("shard8:"), F.col("doc_id").cast("string"))
            )
            % 8
        )
        .cast("int")
        .alias("shard"),
    )
    return staged.groupBy("shard", "stage", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
    )


@register(
    "arrow_ipc_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_price
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("S1", "formats", "extension"),
)
def q_arrow_ipc_roundtrip(spark, sf_dir):
    """Arrow IPC (Feather v2) sink + source round-trip
    (sources/formats.write_arrow_ipc / read_arrow_ipc): orders written
    as per-partition ``.arrow`` files through mapInPandas, read back
    via binaryFile + the pyarrow IPC decoder, then aggregated — the
    hop must be lossless for the oracle (computed on the ORIGINAL
    table) to hash-match. This is the interchange edge for ML
    dataloaders that mmap Arrow directly; file count = partition
    count, the standard sizing knob."""
    import tempfile

    from .sources.formats import read_arrow_ipc, write_arrow_ipc

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    src = _t(spark, sf_dir, "orders").select(*cols).repartition(4)
    loc = tempfile.mkdtemp(prefix="arrow_ipc_")
    write_arrow_ipc(src, loc)
    back = read_arrow_ipc(
        spark, loc,
        src.schema,
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "dau_wau_mau_stickiness",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM ev),
    days AS (SELECT DISTINCT day FROM ud),
    dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
    wau AS (SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
            FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day),
    mau AS (SELECT d.day, COUNT(DISTINCT u.user_id) AS mau
            FROM days d JOIN ud u ON u.day BETWEEN d.day - 29 AND d.day
            GROUP BY d.day)
    SELECT CAST(dau.day AS TIMESTAMP) AS day,
           CAST(dau AS BIGINT) AS dau,
           CAST(wau AS BIGINT) AS wau,
           CAST(mau AS BIGINT) AS mau,
           CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day JOIN mau ON dau.day = mau.day
    """,
    tags=("events", "stats", "extension", "bench_ext"),
)
def q_dau_wau_mau_stickiness(spark, sf_dir):
    """DAU / WAU / MAU and the DAU/WAU stickiness ratio per day — the
    product-analytics vitals. Spark-first shape for the rolling
    distincts (distinct-over-window does not decompose), r13: per-user
    COVERAGE INTERVALS + delta running sums instead of the old
    window-day explode. A user active on day g is "active within w
    days" for every report day in [g, g+w-1]; consecutive active days
    g_i < g_{i+1} disjointize that union into
    [g_i, min(g_i + w - 1, g_{i+1} - 1)], so one lead() window per
    user emits +1/-1 boundary deltas for BOTH windows at once, a tiny
    per-day aggregate sums them, and a running sum over the (bounded,
    calendar-sized) day axis reconstructs the exact distinct counts.
    Replaces 7x + 30x row expansion plus two countDistinct
    dedup-shuffles with one |user-days| window shuffle (guide §2.3:
    shuffle fewer bytes; §2.4: the explode-free derivation) — exact
    distinct semantics, verified row-identical at sf0.01/sf0.1.
    The documented approximate path at 100 TB is the mergeable-HLL
    pane rollup (operators/sketches.hll_rollup) — this query is its
    exact twin. Stickiness is one closing IEEE division."""
    ev = _t(spark, sf_dir, "events")
    # the distinct (user, day) set feeds two consumers (dau + the
    # interval window) — a lazy localCheckpoint materializes it once
    ud = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct().localCheckpoint(eager=False)
    dau = ud.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    iv = ud.select("day", F.lead("day").over(w).alias("nxt"))

    def cov_end(win: int):
        # last report day this active day is responsible for: its own
        # w-window end, clipped before the user's next active day
        end = F.date_add(F.col("day"), win - 1)
        return F.when(
            F.col("nxt").isNotNull()
            & (F.date_add(F.col("nxt"), -1) < end),
            F.date_add(F.col("nxt"), -1),
        ).otherwise(end)

    deltas = iv.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("day").alias("d"),
                    F.lit(1).alias("dw"),
                    F.lit(1).alias("dm"),
                ),
                F.struct(
                    F.date_add(cov_end(7), 1).alias("d"),
                    F.lit(-1).alias("dw"),
                    F.lit(0).alias("dm"),
                ),
                F.struct(
                    F.date_add(cov_end(30), 1).alias("d"),
                    F.lit(0).alias("dw"),
                    F.lit(-1).alias("dm"),
                ),
            )
        ).alias("x")
    ).select("x.*")
    agg = deltas.groupBy("d").agg(
        F.sum("dw").alias("dw"), F.sum("dm").alias("dm")
    )
    # single-partition running sum over DISTINCT BOUNDARY DAYS — the
    # day axis is calendar-bounded (≤ span days + window), never data-
    # sized, so this window is scale-safe
    cw = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = agg.select(
        F.col("d").alias("day"),
        F.sum("dw").over(cw).cast("bigint").alias("wau"),
        F.sum("dm").over(cw).cast("bigint").alias("mau"),
    )
    # inner join restricts to OBSERVED days (every observed day has a
    # covering interval — its own dau ≥ 1 — so none is lost)
    out = dau.join(cum, "day")
    return out.select(
        F.col("day").cast("timestamp_ntz").alias("day"),
        "dau",
        "wau",
        "mau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )


@register(
    "events_resample_lerp",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    b AS (SELECT date_trunc('hour', MIN(ts)) AS t0, MAX(ts) AS t1 FROM ev),
    k AS (SELECT DISTINCT user_id FROM ev),
    grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 60 MINUTE)) AS ts
      FROM k, b),
    u AS (
      SELECT user_id, ts, value AS v, 0 AS is_grid, event_id FROM ev
      UNION ALL
      SELECT user_id, ts, NULL, 1, NULL FROM grid),
    f AS (
      SELECT user_id, ts, is_grid,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN is_grid = 0 THEN epoch_us(ts) END
                        IGNORE NULLS) OVER wp AS pt,
             first_value(v IGNORE NULLS) OVER wn AS nv,
             first_value(CASE WHEN is_grid = 0 THEN epoch_us(ts) END
                         IGNORE NULLS) OVER wn AS nt
      FROM u
      WINDOW wp AS (PARTITION BY user_id
                    ORDER BY ts, is_grid, event_id ASC NULLS FIRST
                    ROWS UNBOUNDED PRECEDING),
             wn AS (PARTITION BY user_id
                    ORDER BY ts, is_grid, event_id ASC NULLS FIRST
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, ts AS grid_ts,
           CASE WHEN pt = epoch_us(ts) THEN pv
                WHEN pt IS NULL OR nt IS NULL THEN NULL
                WHEN pt = nt THEN pv
                ELSE pv + (nv - pv) * (CAST(epoch_us(ts) - pt AS DOUBLE)
                                       / CAST(nt - pt AS DOUBLE))
           END AS value_lerp
    FROM f WHERE is_grid = 1
    """,
    tags=("temporal", "events", "extension"),
)
def q_events_resample_lerp(spark, sf_dir):
    """Hourly resample with LINEAR INTERPOLATION between each user's
    neighboring events (operators/temporal.resample_lerp) — the
    continuous-signal sibling of events_resample_ffill; NULL outside
    the observed range, exact event value on a grid hit. Same
    union-and-window plan (one user_id shuffle, two running windows
    over one sort, no range join); the lerp is a fixed IEEE operation
    sequence on epoch-microsecond integers, bit-identical
    cross-engine."""
    from .operators.temporal import resample_lerp

    return resample_lerp(
        _t(spark, sf_dir, "events"),
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        order_col="event_id",
        step_minutes=60,
    )


@register(
    "balance_gini_by_nation",
    oracle="""
    WITH b AS (
      SELECT c_nationkey,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))
               AS cents,
             c_custkey
      FROM customer WHERE c_acctbal > 0
    ),
    r AS (
      SELECT c_nationkey, cents,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                     ORDER BY cents, c_custkey)
                  AS DECIMAL(38,0)) AS i
      FROM b
    ),
    m AS (
      SELECT c_nationkey,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(cents) AS DECIMAL(38,0)) AS s,
             CAST(SUM(i * cents) AS DECIMAL(38,0)) AS s1
      FROM r GROUP BY c_nationkey
    )
    SELECT c_nationkey, CAST(n AS BIGINT) AS n_customers,
           CAST(CAST(2 * s1 - (n + 1) * s AS DECIMAL(38,0)) AS DOUBLE)
             / CAST(CAST(n * s AS DECIMAL(38,0)) AS DOUBLE) AS gini
    FROM m
    """,
    tags=("agg", "stats", "quality", "extension"),
)
def q_balance_gini_by_nation(spark, sf_dir):
    """Gini coefficient of positive account balances per nation — the
    inequality/concentration audit (the same statistic data-curation
    uses to ask 'how skewed is token mass across sources/shards').
    Exactness: balances become integer CENTS (DECIMAL 38,0), the
    rank-weighted sum S1 = sum(i * x_(i)) and the closing
    G = (2*S1 - (n+1)*S) / (n*S) stay integer until ONE double
    division — scale-0 so the DECIMAL->DOUBLE cast is a single
    correctly-rounded conversion on both engines (NOTES.md seam). One
    rank window + one aggregate, both on the nation key — a single
    exchange."""
    b = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(
            "c_nationkey",
            (F.col("c_acctbal").cast("decimal(18,2)") * 100)
            .cast("decimal(38,0)")
            .alias("cents"),
            "c_custkey",
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy("cents", "c_custkey")
    r = b.withColumn(
        "i", F.row_number().over(w).cast("decimal(38,0)")
    )
    m = r.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("i") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("s1"),
    )
    num = (
        F.lit(2) * F.col("s1") - (F.col("n") + 1) * F.col("s")
    ).cast("decimal(38,0)")
    den = (F.col("n") * F.col("s")).cast("decimal(38,0)")
    return m.select(
        "c_nationkey",
        F.col("n").cast("bigint").alias("n_customers"),
        (num.cast("double") / den.cast("double")).alias("gini"),
    )


@register(
    "rfm_segmentation",
    oracle="""
    WITH agg AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                  AS DECIMAL(38,4)) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, last_order, frequency,
             CAST(monetary AS DOUBLE) AS monetary,
             CAST(NTILE(4) OVER (ORDER BY last_order DESC, o_custkey)
                  AS INTEGER) AS r_quartile,
             CAST(NTILE(4) OVER (ORDER BY frequency DESC, o_custkey)
                  AS INTEGER) AS f_quartile,
             CAST(NTILE(4) OVER (ORDER BY monetary DESC, o_custkey)
                  AS INTEGER) AS m_quartile
      FROM agg
    )
    SELECT r_quartile, f_quartile, m_quartile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(CAST(CAST(monetary AS DECIMAL(18,4)) * 10000
                             AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE)
             / 10000.0 AS total_monetary
    FROM scored GROUP BY 1, 2, 3
    """,
    tags=("agg", "window", "extension"),
)
def q_rfm_segmentation(spark, sf_dir):
    """RFM (recency/frequency/monetary) segmentation: per-customer
    order aggregates scored into quartiles on each axis (deterministic
    NTILE with key tie-break, the exact form — decile_bucketing_approx
    documents the no-sort 100x twin), then the 64-cell segment grid
    with customer counts and exact segment revenue (DECIMAL until one
    closing division). One aggregate + three windows over the
    CUSTOMER-level table (log-scale smaller than orders) + the final
    cell aggregate."""
    agg = _t(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .alias("monetary_dec"),
    )
    scored = agg.select(
        "o_custkey",
        "frequency",
        F.col("monetary_dec").cast("double").alias("monetary"),
        F.ntile(4)
        .over(Window.orderBy(F.col("last_order").desc(), "o_custkey"))
        .cast("int")
        .alias("r_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency").desc(), "o_custkey"))
        .cast("int")
        .alias("f_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary_dec").desc(), "o_custkey"))
        .cast("int")
        .alias("m_quartile"),
    )
    return scored.groupBy("r_quartile", "f_quartile", "m_quartile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        (
            F.sum(
                (F.col("monetary").cast("decimal(18,4)") * 10000).cast(
                    "decimal(38,0)"
                )
            ).cast("decimal(38,0)")
            / F.lit(10000.0)
        ).alias("total_monetary"),
    )


@register(
    "market_basket_lift",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM li),
    item AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item
             FROM li GROUP BY l_partkey),
    pair AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v,
             CAST(COUNT(*) AS BIGINT) AS n_pair
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    scored AS (
      SELECT u, v, n_pair,
             CAST(n_pair * n.n_orders AS DOUBLE)
               / CAST(ia.n_item * ib.n_item AS DOUBLE) AS lift
      FROM pair, n
      JOIN item ia ON ia.l_partkey = u
      JOIN item ib ON ib.l_partkey = v
    )
    SELECT u, v, n_pair, lift FROM scored
    WHERE n_pair >= 2
    ORDER BY n_pair DESC, u, v LIMIT 100
    """,
    tags=("agg", "stats", "extension"),
)
def q_market_basket_lift(spark, sf_dir):
    """Market-basket pair mining with lift: co-purchased part pairs
    (support >= 2) scored by lift = P(uv) / (P(u)P(v)) — the
    recommendation / co-occurrence primitive, and the same shape that
    scores token co-occurrence (PMI) over a corpus. Exactness: all
    supports are integers; lift is two exact integer products and ONE
    IEEE division, identical cross-engine. The pair generation is the
    within-order self-join whose fan-out is basket_size^2 — bounded by
    the largest basket, the documented cap knob for 100 TB (cap or
    split mega-baskets exactly like LSH buckets)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    n = li.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    item = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_item")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("v")
    )
    pair = (
        li.join(
            l2,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_partkey") < F.col("v")),
        )
        .groupBy(F.col("l_partkey").alias("u"), "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
    )
    ia = item.select(F.col("l_partkey").alias("u"), F.col("n_item").alias("n_u"))
    ib = item.select(F.col("l_partkey").alias("v"), F.col("n_item").alias("n_v"))
    return (
        pair.join(ia, "u")
        .join(ib, "v")
        .crossJoin(F.broadcast(n))
        .filter(F.col("n_pair") >= 2)
        .select(
            "u",
            "v",
            "n_pair",
            (
                (F.col("n_pair") * F.col("n_orders")).cast("double")
                / (F.col("n_u") * F.col("n_v")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("n_pair").desc(), "u", "v")
        .limit(100)
    )


@register(
    "containment_superset_join",
    oracle=r"""
    WITH snip AS (
      SELECT doc_id + 1000000 AS sid,
             array_to_string(list_slice(
               string_split_regex(trim(text), '\s+'), 1, 15), ' ') AS stext
      FROM documents WHERE doc_id % 2 = 0
    ),
    lt AS (SELECT sid, string_split_regex(trim(stext), '\s+') AS toks
           FROM snip),
    ls0 AS (
      SELECT sid, unnest(list_distinct(list_transform(
               generate_series(1, len(toks) - 2),
               i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS sh
      FROM lt WHERE len(toks) >= 3
    ),
    rt AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
    rs0 AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(toks) - 2),
               i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS sh
      FROM rt WHERE len(toks) >= 3
    ),
    dfok AS (SELECT sh FROM rs0 GROUP BY sh HAVING COUNT(*) <= 50),
    rs AS (SELECT rs0.doc_id, rs0.sh FROM rs0 JOIN dfok USING (sh)),
    ls AS (SELECT ls0.sid, ls0.sh FROM ls0 JOIN dfok USING (sh)),
    lsz AS (SELECT sid, CAST(COUNT(*) AS BIGINT) AS n_left
            FROM ls GROUP BY sid),
    inter AS (SELECT sid, doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
              FROM ls JOIN rs USING (sh) GROUP BY sid, doc_id)
    SELECT sid AS snippet_id, doc_id, n_shared, n_left,
           CAST(n_shared AS DOUBLE) / CAST(n_left AS DOUBLE) AS containment
    FROM inter JOIN lsz USING (sid)
    WHERE CAST(n_shared AS DOUBLE) / CAST(n_left AS DOUBLE) >= 0.9
    """,
    tags=("dedup", "text", "scale", "extension", "bench_ext"),
)
def q_containment_superset_join(spark, sf_dir):
    """Asymmetric containment join (operators/dedup.containment_join):
    15-token snippets cut from every even doc must be detected INSIDE
    their source documents at containment 1.0 — the quote/excerpt
    near-dup class that Jaccard MinHash structurally misses (snippet
    vs article Jaccard ~ |snippet|/|article| -> 0, containment -> 1;
    this is how benchmark contamination hides in training corpora).
    Candidates come from the inverted shingle join with the
    right-side-df <= 50 boilerplate cap (part of the semantics, so the
    oracle replays it); one shingle equi-join + one pair aggregate,
    never |snippets| x |corpus|."""
    from .operators.dedup import containment_join
    from .operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    snip = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 1000000).alias("snippet_id"),
        F.array_join(F.slice(tokens_expr("text"), 1, 15), " ").alias(
            "stext"
        ),
    )
    return containment_join(
        snip, docs, "snippet_id", "stext", "doc_id", "text",
        shingle_n=3, min_containment=0.9, max_shingle_df=50,
    )


@register(
    "percentile_disc_profile",
    oracle=f"""
    WITH ev AS ({_EV_SQL})
    SELECT event_type,
           quantile_disc(value, 0.25) AS p25,
           quantile_disc(value, 0.50) AS p50,
           quantile_disc(value, 0.90) AS p90,
           MIN(value) AS vmin, MAX(value) AS vmax
    FROM ev GROUP BY event_type
    """,
    tags=("agg", "stats", "extension"),
)
def q_percentile_disc_profile(spark, sf_dir):
    """Discrete-percentile latency-style profile per event type:
    PERCENTILE_DISC picks ACTUAL data values (no interpolation
    arithmetic), so the profile is engine-exact by construction — the
    right percentile flavor for cross-engine SLO reporting (the
    continuous flavor's interpolation is two float ops whose
    association can differ between engines; the KLL sketch is the
    documented streaming/mergeable path). One group-by with sort-based
    percentile per group."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY value)"
        ).alias("p25"),
        F.expr(
            "percentile_disc(0.50) WITHIN GROUP (ORDER BY value)"
        ).alias("p50"),
        F.expr(
            "percentile_disc(0.90) WITHIN GROUP (ORDER BY value)"
        ).alias("p90"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


@register(
    "funnel_time_to_convert",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    v AS (SELECT user_id, MIN(ts) AS first_view FROM ev
          WHERE event_type = 'view' GROUP BY user_id),
    p AS (SELECT e.user_id, v.first_view, MIN(e.ts) AS first_purchase
          FROM ev e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'purchase' AND e.ts > v.first_view
          GROUP BY e.user_id, v.first_view),
    d AS (SELECT user_id,
                 CAST((epoch_us(first_purchase) - epoch_us(first_view))
                      // 1000000 AS BIGINT) AS secs
          FROM p)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converters,
           CAST(MIN(secs) AS BIGINT) AS min_secs,
           quantile_disc(secs, 0.5) AS median_secs,
           CAST(MAX(secs) AS BIGINT) AS max_secs
    FROM d
    """,
    tags=("events", "funnel", "extension"),
)
def q_funnel_time_to_convert(spark, sf_dir):
    """Funnel latency: per user, seconds from FIRST view to the first
    subsequent purchase; reported as converter count + min / discrete
    median / max — the time-to-convert panel next to the existing
    ordered-funnel counts. Two keyed aggregates sharing the user_id
    partitioning plus a one-row fold; integer seconds keep every
    statistic engine-exact (PERCENTILE_DISC — no interpolation)."""
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(F.min("ts").alias("first_purchase"))
    )
    # unix_micros rejects TIMESTAMP_NTZ; session tz is pinned UTC so the
    # cast is a pure relabel and the difference is tz-free anyway
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    d = p.select(
        "user_id",
        (
            (us("first_purchase") - us("first_view")).cast("bigint")
            / F.lit(1000000)
        ).cast("bigint").alias("secs"),
    )
    return d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converters"),
        F.min("secs").cast("bigint").alias("min_secs"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY secs)").alias(
            "median_secs"
        ),
        F.max("secs").cast("bigint").alias("max_secs"),
    )


@register(
    "benford_leading_digit_audit",
    oracle="""
    WITH d AS (
      SELECT substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS VARCHAR), 1, 1) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM d)
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(COUNT(*) AS DOUBLE) / (SELECT total FROM n) AS share
    FROM d GROUP BY digit
    """,
    tags=("quality", "stats", "extension"),
)
def q_benford_leading_digit_audit(spark, sf_dir):
    """Benford leading-digit audit of order totals — the classic
    fabricated-data screen (a synthetic or tampered money column shows
    a flat digit histogram where organic data follows log(1+1/d)).
    Digit extraction goes through integer CENTS then string head, so
    both engines see the identical digit (no float formatting); one
    aggregate + one broadcast total + one closing division."""
    d = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                .cast("bigint")
                .cast("string"),
                1,
                1,
            ).alias("digit")
        )
    )
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_values"))
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            "n_values",
            (F.col("n_values").cast("double") / F.col("total")).alias(
                "share"
            ),
        )
    )


@register(
    "embedding_bq_hamming_rerank",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    s AS (
      SELECT vec_id,
             CAST(list_sum(list_transform(generate_series(0, 62),
               j -> CASE WHEN v[j + 1] > 0 THEN (CAST(1 AS BIGINT) << j)
                         ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
      FROM e
    ),
    q AS (SELECT vec_id AS query_id, sig AS qsig FROM s WHERE vec_id < 5),
    scr AS (
      SELECT query_id, s.vec_id AS neighbor_id,
             CAST(bit_count(xor(qsig, s.sig)) AS INTEGER) AS hamming,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY bit_count(xor(qsig, s.sig)), s.vec_id) AS sr
      FROM q JOIN s ON s.vec_id <> query_id
    ),
    cand AS (SELECT query_id, neighbor_id, hamming FROM scr WHERE sr <= 50),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    rer AS (
      SELECT c.query_id, c.neighbor_id, c.hamming,
             list_dot_product(qn.v, cn.v) / (qn.nrm * cn.nrm) AS cosine
      FROM cand c
      JOIN n qn ON qn.vec_id = c.query_id
      JOIN n cn ON cn.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, hamming, cosine,
           CAST(rnk AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rnk FROM rer)
    WHERE rnk <= 5
    """,
    tags=("embedding", "ann", "scale", "extension"),
)
def q_embedding_bq_hamming_rerank(spark, sf_dir):
    """Binary-quantized ANN (operators/similarity.bq_topk): 63-bit
    sign signatures screened by XOR+popcount (an 8-byte-per-vector
    integer scan, ~64x lighter than the float corpus), top-50
    candidates per query reranked by EXACT cosine, top-5 kept. Sign
    bits have no rounding surface, so the whole pipeline — signature,
    Hamming screen, tie-breaks, fold-exact cosine — replays
    bit-identically in the oracle. Queries = vec_id < 5, broadcast;
    float vectors are fetched only for screen survivors (the BQ
    serving pattern at 100 TB)."""
    from .operators.similarity import bq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return bq_topk(emb, emb.filter(F.col("vec_id") < 5), k=5, screen_m=50)


@register(
    "group_by_all_sql",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue
    FROM orders GROUP BY ALL
    """,
    tags=("agg", "sql", "extension"),
)
def q_group_by_all_sql(spark, sf_dir):
    """GROUP BY ALL (the DuckDB-popularized sugar, native in Spark
    3.4+): every non-aggregate select item becomes a grouping key —
    the oracle runs the IDENTICAL statement on DuckDB's native GROUP
    BY ALL, pinning that both engines infer the same key set."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS revenue
        FROM orders_gba GROUP BY ALL
        """
    )


@register(
    "lateral_topk_per_group",
    oracle="""
    SELECT n.n_nationkey, n.n_name, t.c_custkey, t.c_acctbal
    FROM nation n,
    LATERAL (
      SELECT c_custkey, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 3
    ) t
    """,
    tags=("join", "sql", "extension"),
)
def q_lateral_topk_per_group(spark, sf_dir):
    """Correlated LATERAL subquery (SQL:1999 / Spark 3.2+ lateral
    join): per nation, the top-3 customers by balance — the
    set-returning correlated-join surface beside the QUALIFY/window
    formulation of the same question. The oracle is the IDENTICAL
    LATERAL statement on DuckDB. Catalyst decorrelates this into the
    window plan, which is exactly the point: the declarative surface
    is free."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql(
        """
        SELECT n.n_nationkey, n.n_name, t.c_custkey, t.c_acctbal
        FROM nation_lat n,
        LATERAL (
          SELECT c_custkey, c_acctbal FROM customer_lat c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 3
        ) t
        """
    )


@register(
    "kfold_split_audit",
    oracle="""
    WITH f AS (
      SELECT doc_id, lang,
             CAST(CAST(concat('0x', substr(md5(
                    'fold:' || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 5 AS INTEGER) AS fold
      FROM documents
    )
    SELECT fold, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM f GROUP BY fold, lang
    """,
    tags=("sampling", "ml", "extension"),
)
def q_kfold_split_audit(spark, sf_dir):
    """Deterministic k-fold assignment (md5 % k — same portable-hash
    contract as every split in operators/sampling.py) with the
    per-fold label-distribution audit that validates fold balance
    before cross-validation. Zero-shuffle assignment + one aggregate;
    the same row lands in the same fold on any engine, layout, or
    rerun — the reproducibility property RNG-based folds lack."""
    from .functions.hashing import md5_hash64

    docs = _t(spark, sf_dir, "documents")
    fold = (
        md5_hash64(
            F.concat(F.lit("fold:"), F.col("doc_id").cast("string"))
        )
        % 5
    ).cast("int")
    return (
        docs.select(fold.alias("fold"), "lang")
        .groupBy("fold", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


@register(
    "events_minmax_scaled",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    b AS (SELECT event_type, MIN(value) AS vmin, MAX(value) AS vmax
          FROM ev GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           CASE WHEN b.vmax = b.vmin THEN CAST(0.5 AS DOUBLE)
                ELSE (e.value - b.vmin) / (b.vmax - b.vmin) END AS scaled
    FROM ev e JOIN b ON e.event_type = b.event_type
    """,
    tags=("events", "ml", "extension"),
)
def q_events_minmax_scaled(spark, sf_dir):
    """Per-group min-max feature scaling to [0,1] (degenerate groups
    pin to 0.5) — the preprocessing twin of the DECIMAL-moment z-score
    battery. min/max are exact order statistics; the scale arithmetic
    is two IEEE subtractions and one division in fixed order, so every
    scaled value is bit-identical cross-engine. One tiny per-group
    aggregate broadcast back onto the scan — no window, no sort."""
    ev = _t(spark, sf_dir, "events")
    b = ev.groupBy("event_type").agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    return ev.join(F.broadcast(b), "event_type").select(
        "event_id",
        "event_type",
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0.5))
        .otherwise(
            (F.col("value") - F.col("vmin"))
            / (F.col("vmax") - F.col("vmin"))
        )
        .alias("scaled"),
    )


@register(
    "session_context_features",
    oracle=f"""
    WITH ev AS ({_EV_SQL})
    SELECT event_id, user_id, event_type,
           COALESCE(list(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), []) AS prev_types,
           CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT)
             AS us_since_prev
    FROM ev
    """,
    tags=("events", "window", "ml", "extension"),
)
def q_session_context_features(spark, sf_dir):
    """Sequence-model context features: for every event, the previous
    <=3 event types (ordered window list — empty for a user's first
    event) and microseconds since the previous event (NULL first) —
    the feature shape behind next-event prediction / behavioral
    tokenization. One user_id exchange; both features share the same
    window sort. Arrays compare exactly cross-engine (strings, order
    pinned by the frame)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.collect_list("event_type")
        .over(w.rowsBetween(-3, -1))
        .alias("prev_types"),
        (us - F.lag(us).over(w)).cast("bigint").alias("us_since_prev"),
    )


@register(
    "token_budget_mixture",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    st AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
           FROM d GROUP BY source),
    w AS (SELECT * FROM (VALUES
            ('src0', CAST(0.5 AS DOUBLE)),
            ('src1', CAST(0.3 AS DOUBLE)),
            ('src2', CAST(0.2 AS DOUBLE))) AS t(source, wt)),
    th AS (SELECT st.source,
                  CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE),
                       (20000 * wt) / src_tokens) * 10000) AS INT) AS thr
           FROM st JOIN w USING (source)),
    kept AS (
      SELECT d.doc_id, d.source, d.n_tokens FROM d
      JOIN th ON d.source = th.source
      WHERE {_SQL_BUCKET} < th.thr
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
    FROM kept GROUP BY source
    """,
    tags=("sampling", "corpus", "extension"),
)
def q_token_budget_mixture(spark, sf_dir):
    """TOKEN-budget domain mixing: keep rates are derived from each
    source's TOKEN mass (rate = budget*weight / source_tokens), not its
    document count — the form LLM data budgets actually take (a source
    of long documents must keep fewer docs for the same token share;
    the doc-count sibling is mixture_sample). Rates are computed inside
    the plan (one per-source aggregate joined back), the keep decision
    is the portable hash threshold, and the audit reports kept docs +
    kept tokens per source. Deterministic end to end; zero shuffle on
    the sampling pass itself."""
    from .operators.sampling import BUCKETS, hash_bucket
    from .operators.text import tokens_expr

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokens_expr("text")).cast("bigint").alias("n_tokens"),
    )
    st = d.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("src_tokens")
    )
    wts = F.create_map(
        F.lit("src0"), F.lit(0.5),
        F.lit("src1"), F.lit(0.3),
        F.lit("src2"), F.lit(0.2),
    )
    rate = (F.lit(20000) * wts[F.col("source")]) / F.col("src_tokens")
    th = st.select(
        "source",
        # NB: F.least IGNORES nulls (least(1.0, NULL) = 1.0), so a source
        # absent from the mixture must be dropped BEFORE the clamp or it
        # silently samples at 100%
        F.when(
            rate.isNotNull(),
            F.floor(F.least(F.lit(1.0), rate) * BUCKETS).cast("int"),
        ).alias("thr"),
    ).filter(F.col("thr").isNotNull())
    kept = d.join(F.broadcast(th), "source").filter(
        hash_bucket(F.col("doc_id")) < F.col("thr")
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("kept_tokens"),
    )


@register(
    "try_arithmetic_battery",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 0 THEN NULL
                ELSE CAST(o_totalprice / (o_orderkey % 10) AS DOUBLE)
           END AS safe_div,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS head_digit
    FROM orders WHERE o_orderkey <= 200
    """,
    tags=("sql", "functions", "extension"),
)
def q_try_arithmetic_battery(spark, sf_dir):
    """ANSI-mode error-safe function battery: under Spark 4's ANSI
    dialect, division by zero and bad casts THROW (the repo's
    engineering decisions doc) — the ``try_*`` family is the sanctioned
    NULL-on-error escape. try_divide(x, 0) -> NULL, try_cast of a
    non-numeric priority string -> NULL, try_cast of its leading digit
    -> the digit. The oracle expresses the same semantics with CASE /
    TRY_CAST (DuckDB never throws on /0 but the NULL contract is
    replayed exactly)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return o.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice"), F.col("o_orderkey") % 10
        ).alias("safe_div"),
        F.try_to_number(F.col("o_orderpriority"), F.lit("999")).cast(
            "int"
        ).alias("bad_cast"),
        F.expr("try_cast(substr(o_orderpriority, 1, 1) AS INT)").alias(
            "head_digit"
        ),
    )


@register(
    "pcm_frame_energy",
    oracle="""
    WITH chars AS (
      SELECT doc_id,
             unnest(generate_series(1, length(text))) AS pos
      FROM documents
    ),
    s AS (
      SELECT c.doc_id, (pos - 1) // 256 AS frame,
             ord(substr(d.text, CAST(pos AS INTEGER), 1)) AS v
      FROM chars c JOIN documents d ON c.doc_id = d.doc_id
    )
    SELECT doc_id, CAST(frame AS BIGINT) AS frame,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(v * v) AS BIGINT) AS sum_sq,
           sqrt(CAST(SUM(v * v) AS BIGINT) / CAST(COUNT(*) AS BIGINT))
             AS rms
    FROM s GROUP BY doc_id, frame
    """,
    tags=("multimodal", "udf", "extension"),
)
def q_pcm_frame_energy(spark, sf_dir):
    """Raw-PCM frame energy (operators/multimodal.pcm_frame_energy):
    the corpus text's UTF-8 bytes stand in for an int8 audio track
    (pure-ASCII corpus, so byte == code point and the oracle can
    replay the decode with ord()); 256-sample frames yield exact
    integer sum-of-squares plus RMS — a REAL decode through the
    Arrow-batched binary plumbing, not a stub. The oracle recomputes
    every frame from characters, so the numpy frombuffer path is
    engine-verified end to end."""
    from .operators.multimodal import attach_binary_payload, pcm_frame_energy

    docs = attach_binary_payload(_t(spark, sf_dir, "documents"))
    return pcm_frame_energy(docs)


@register(
    "streaming_pattern_alerts",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    err AS (SELECT user_id, event_id, ts FROM ev
            WHERE event_type = 'error'),
    p AS (SELECT user_id, ts, event_id FROM ev
          WHERE event_type = 'purchase'),
    m AS (
      SELECT e.user_id, e.event_id, e.ts,
             MAX(epoch_us(p.ts)) AS last_p
      FROM err e JOIN p ON p.user_id = e.user_id
        AND (p.ts < e.ts OR (p.ts = e.ts AND p.event_id < e.event_id))
      GROUP BY e.user_id, e.event_id, e.ts
    )
    SELECT user_id, event_id, ts,
           CAST(epoch_us(ts) - last_p AS BIGINT) AS gap_us
    FROM m WHERE epoch_us(ts) - last_p <= 30 * 60 * 1000000
    """,
    tags=("streaming", "events", "extension"),
)
def q_streaming_pattern_alerts(spark, sf_dir):
    """Streaming A-then-B CEP rule (streaming/events.
    stream_pattern_alerts): alert on every error within 30 minutes
    after the same user's most recent purchase — per-user state is ONE
    bigint (the nearest-preceding-A property makes last-A sufficient),
    so keys can live forever. The oracle replays the rule relationally
    (max preceding purchase per error, integer-microsecond gap);
    append-mode AvailableNow replay must reproduce it exactly."""
    from .streaming.events import stream_pattern_alerts

    return run_stream_to_memory(
        stream_pattern_alerts(_events_stream(spark, sf_dir)),
        output_mode="append",
    )


@register(
    "embedding_bq_index_topk",
    oracle=REGISTRY["embedding_bq_hamming_rerank"].oracle,
    tags=("embedding", "ann", "lake", "extension", "bench_ext"),
)
def q_embedding_bq_index_topk(spark, sf_dir):
    """BQ ANN served from the PERSISTED signature index
    (operators/similarity.build_bq_index / bq_index_topk): the 8-byte
    per-vector signature table is written to disk once and the Hamming
    screen scans IT — the float corpus is read only for the screen_m
    survivors. Shares the transient bq_topk oracle verbatim: the index
    hop must change nothing. This completes the persisted-index trio
    (LSH dedup index, IVF cell index, BQ sign index)."""
    import tempfile

    from .operators.similarity import bq_index_topk, build_bq_index

    emb = _t(spark, sf_dir, "embeddings")
    loc = tempfile.mkdtemp(prefix="bq_index_")
    build_bq_index(emb, loc)
    return bq_index_topk(
        emb, loc, emb.filter(F.col("vec_id") < 5), k=5, screen_m=50
    )


@register(
    "lang_id_confusion_matrix",
    oracle=f"""
    WITH pred AS ({_lang_id_oracle()}),
    n AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang FROM pred
          GROUP BY lang)
    SELECT p.lang, p.predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS DOUBLE) / n.n_lang AS share_of_lang
    FROM pred p JOIN n ON p.lang = n.lang
    GROUP BY p.lang, p.predicted_lang, n.n_lang
    """,
    tags=("text", "quality", "extension"),
)
def q_lang_id_confusion_matrix(spark, sf_dir):
    """Classifier audit: confusion matrix of the heuristic language ID
    against the labeled ``lang`` column, with each cell's share of its
    true-label row — the quality gate before trusting lang-id for
    mixture decisions. Pure composition over the oracle-proven lang_id
    scores; one aggregate + one broadcast per-label total + one
    closing division per cell."""
    pred = with_lang_id(_t(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "predicted_lang"
    )
    n = pred.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lang")
    )
    return (
        pred.join(F.broadcast(n), "lang")
        .groupBy("lang", "predicted_lang", "n_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .select(
            "lang",
            "predicted_lang",
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("n_lang")).alias(
                "share_of_lang"
            ),
        )
    )


@register(
    "churned_users_audit",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    horizon AS (SELECT MAX(ts) AS h FROM ev),
    u AS (
      SELECT user_id, MIN(ts) AS first_seen, MAX(ts) AS last_seen,
             CAST(COUNT(*) AS BIGINT) AS lifetime_events
      FROM ev GROUP BY user_id
    )
    SELECT user_id, first_seen, last_seen, lifetime_events,
           CAST((epoch_us(h) - epoch_us(last_seen)) // 86400000000
                AS BIGINT) AS days_inactive,
           CAST(last_seen <= h - INTERVAL 1 DAY AS INTEGER) AS is_churned
    FROM u, horizon
    """,
    tags=("events", "agg", "extension"),
)
def q_churned_users_audit(spark, sf_dir):
    """Churn audit: every user's lifetime stats, whole days inactive
    relative to the stream horizon, and a churn flag (>= 1 day dark) —
    the re-engagement scoring table. One user_id aggregate + a
    broadcast one-row horizon; integer-microsecond day arithmetic
    keeps it engine-exact."""
    ev = _t(spark, sf_dir, "events")
    horizon = ev.agg(F.max("ts").alias("h"))
    u = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.count(F.lit(1)).cast("bigint").alias("lifetime_events"),
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return u.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        "first_seen",
        "last_seen",
        "lifetime_events",
        F.floor((us("h") - us("last_seen")) / F.lit(86400000000))
        .cast("bigint")
        .alias("days_inactive"),
        (
            F.col("last_seen") <= F.col("h") - F.expr("INTERVAL 1 DAY")
        ).cast("int").alias("is_churned"),
    )


@register(
    "ab_test_bootstrap_diff",
    oracle=f"""
    WITH ev AS ({_EV_SQL}),
    sub AS (SELECT * FROM ev WHERE event_type IN ('purchase', 'click')),
    reps AS (
      SELECT event_type AS g, b,
             CAST(SUM(({_BOOT_W}) * CAST(value AS DECIMAL(18,4)))
                  AS DOUBLE)
             / CAST(SUM({_BOOT_W}) AS DOUBLE) AS mean_b
      FROM sub CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b)
      GROUP BY event_type, b
      HAVING SUM({_BOOT_W}) > 0
    ),
    d AS (
      SELECT a.b, a.mean_b - c.mean_b AS diff_b
      FROM reps a JOIN reps c ON a.b = c.b
      WHERE a.g = 'purchase' AND c.g = 'click'
    ),
    ranked AS (
      SELECT diff_b, ROW_NUMBER() OVER (ORDER BY diff_b, b) AS rn FROM d
    ),
    ci AS (
      SELECT MAX(CASE WHEN rn = 2 THEN diff_b END) AS ci_lo,
             MAX(CASE WHEN rn = 31 THEN diff_b END) AS ci_hi
      FROM ranked
    ),
    pt AS (
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS m
      FROM sub GROUP BY event_type
    )
    SELECT 'purchase' AS group_a, 'click' AS group_b,
           (SELECT m FROM pt WHERE event_type = 'purchase') AS mean_a,
           (SELECT m FROM pt WHERE event_type = 'click') AS mean_b,
           (SELECT m FROM pt WHERE event_type = 'purchase')
             - (SELECT m FROM pt WHERE event_type = 'click') AS diff,
           ci_lo, ci_hi,
           CAST(NOT (ci_lo <= 0 AND ci_hi >= 0) AS INTEGER) AS significant
    FROM ci
    """,
    tags=("events", "stats", "extension"),
)
def q_ab_test_bootstrap_diff(spark, sf_dir):
    """A/B-test contrast (operators/sampling.poisson_bootstrap_diff_ci):
    90% percentile-bootstrap CI for the difference of mean value
    between 'purchase' and 'click' events. The load-bearing detail is
    PAIRED replicates — both groups' means come from the same
    deterministic draw at the same replicate index before differencing
    (the correct bootstrap for a contrast); the oracle replays the
    identical pairing. ``significant`` = the CI excludes zero. Same
    single-explode cost model as the per-group CI."""
    from .operators.sampling import poisson_bootstrap_diff_ci

    return poisson_bootstrap_diff_ci(
        _t(spark, sf_dir, "events"),
        "event_type", "purchase", "click", "value", "event_id",
        reps=32,
    )


@register(
    "mv_rollup_containment_rewrite",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderstatus
    """,
    tags=("lake", "catalog", "agg", "extension"),
)
def q_mv_rollup_containment_rewrite(spark, sf_dir):
    """Containment-tier MV auto-rewrite (sources/catalog.
    _containment_rewrite, the round-9 extension of the exact-text
    tier): the stored view groups orders by (status, priority) with
    COUNT(*) + a DECIMAL SUM; the incoming dashboard query groups by
    status ONLY and filters on priority — a rollup whose groups are
    disjoint unions of view groups, so COUNT re-aggregates as SUM of
    partial counts and the DECIMAL SUM re-sums exactly. The rewrite is
    asserted to have fired (the gate fails if the tier regresses to
    pass-through) and the served plan reads the MV's materialized
    scan, never the base table (plan-pinned in
    tests/test_catalog.py). The 100 TB point: the dashboard query
    touches |view groups| rows instead of the fact table."""
    import tempfile

    from .sources.catalog import LakeCatalog

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,4)").alias("price_dec"),
    )
    cat = LakeCatalog(spark, tempfile.mkdtemp(prefix="cat_rollup_"))
    cat.create_table("orders_fact", orders)
    cat.create_materialized_view(
        "mv_status_priority",
        """SELECT o_orderstatus, o_orderpriority,
                  COUNT(*) AS n_rows, SUM(price_dec) AS sum_price_dec
           FROM orders_fact
           GROUP BY o_orderstatus, o_orderpriority""",
    )
    rollup = """SELECT o_orderstatus,
                       COUNT(*) AS n_orders,
                       SUM(price_dec) AS sum_price_raw
                FROM orders_fact
                WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
                GROUP BY o_orderstatus"""
    rewritten, used = cat.rewrite_with_materialized_views(rollup)
    assert used == "mv_status_priority", rewritten  # the tier must fire
    return cat.serve(rollup).select(
        "o_orderstatus",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("sum_price_raw").cast("double").alias("sum_price"),
    )


@register(
    "bm25_ranked_search",
    # rows-only by design: BM25's log-idf and float accumulation are
    # not SQL-engine-exact; the integer-tf conjunctive_search query
    # stays the oracle anchor and tests/test_text_ops.py replays this
    # ranking host-exactly in numpy
    tags=("text", "retrieval", "extension"),
)
def q_bm25_ranked_search(spark, sf_dir):
    """BM25-ranked retrieval (operators/text.bm25_search, k1=1.2
    b=0.75): documents matching ANY of {merge, window, stream}, ranked
    by the standard Robertson idf x saturated-tf weight. Twin of
    inverted_index_search — same query-token-pruned postings plan, one
    broadcast of the |q|-row document frequencies and the one-row
    corpus stats on top; the corpus is scanned once extra for doc
    lengths (a persisted index stores them as a sidecar at scale)."""
    from .operators.text import bm25_search

    return bm25_search(
        _t(spark, sf_dir, "documents"), ["merge", "window", "stream"]
    )


@register(
    "embedding_ivfpq_index_topk",
    oracle=REGISTRY["embedding_ann_ivfpq_topk"].oracle,
    tags=("similarity", "lake", "extension"),
)
def q_embedding_ivfpq_index_topk(spark, sf_dir):
    """IVF-PQ ANN served from the PERSISTED index
    (operators/similarity.build_ivf_pq_index / ivf_pq_index_topk): the
    m-small-int PQ codes live in a cell-partitioned table, probing
    reads only nprobe partition directories and ADC-scores against
    codebook reconstructions — the float corpus is never read. Shares
    the transient ivf_pq_topk oracle verbatim: the index hop must
    change nothing. This completes the persisted-index lifecycle set
    (LSH dedup index, IVF cell index, BQ sign index, PQ codes index);
    the append path (ivf_pq_index_append) re-encodes only the batch
    against the frozen quantizers, tested in tests/test_similarity.py."""
    import tempfile

    from .operators.similarity import build_ivf_pq_index, ivf_pq_index_topk

    emb = _t(spark, sf_dir, "embeddings")
    loc = tempfile.mkdtemp(prefix="ivfpq_index_")
    build_ivf_pq_index(emb, loc)
    return ivf_pq_index_topk(emb, loc, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "stats_advised_broadcast_join",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("agg", "stats", "scale", "extension"),
)
def q_stats_advised_broadcast_join(spark, sf_dir):
    """The ANALYZE layer driving a plan decision
    (operators/tablestats.plan_equijoin): one-scan column stats on both
    join inputs feed the size estimator, which hints the sub-threshold
    customer side broadcast — the fact table never shuffles — and
    carries the Selinger output-cardinality estimate alongside. The
    gate asserts the advisor chose to broadcast AND that the estimate
    is in range of the true PK-FK cardinality; results are the plain
    segment revenue rollup, oracle-exact. At 100 TB this is the
    catalog-stats path for derived/filtered build sides whose file
    sizes can't inform autoBroadcastJoinThreshold."""
    from .operators.tablestats import column_stats, plan_equijoin

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    o_stats = column_stats(orders, ["custkey"], exact=True)
    c_stats = column_stats(cust, ["custkey"], exact=True)
    joined, decision = plan_equijoin(
        orders, cust, "custkey", o_stats, c_stats
    )
    assert decision["broadcast"] == "right", decision
    assert decision["est_join_rows"] is not None
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "dau_wau_mau_stickiness_hll",
    # rows-only by design: the sliding unions re-estimate from merged
    # HLL registers (not integer-exact like the sparse direct path);
    # tests/test_sketches.py pins every pane exact at gate scale and
    # within the documented RSE band on a 20k-user synthetic
    tags=("events", "stats", "sketch", "scale", "extension"),
)
def q_dau_wau_mau_stickiness_hll(spark, sf_dir):
    """The 100 TB path dau_wau_mau_stickiness documents: one per-day
    HLL pane of user_id (map-side sketch aggregation — the only pass
    over the events table), then DAU/WAU/MAU from the PANES alone —
    each report day unions its trailing 7/30 pane sketches via a
    days-broadcast range join over the |days|-row pane table
    (metadata-scale; NO explode fan-out anywhere in the plan, unlike
    the exact twin's bounded contribution explode over every (user,
    day) row). Persisted panes make tomorrow's refresh one new sketch
    + |days| unions without rescanning history — the property
    COUNT(DISTINCT) cannot offer."""
    from .operators.sketches import hll_partial_sketches

    ev = _t(spark, sf_dir, "events")
    panes = hll_partial_sketches(
        ev.select(F.to_date("ts").alias("pane_day"), "user_id"),
        ["pane_day"],
        "user_id",
    ).localCheckpoint(eager=False)  # one corpus pass feeds all three
    days = panes.select(F.col("pane_day").alias("day"))

    def sliding(window_days: int, name: str) -> DataFrame:
        return (
            panes.join(
                F.broadcast(days),
                (F.col("pane_day") <= F.col("day"))
                & (
                    F.col("pane_day")
                    >= F.date_sub(F.col("day"), window_days - 1)
                ),
            )
            .groupBy("day")
            .agg(
                F.hll_sketch_estimate(
                    F.hll_union_agg("sketch", F.lit(True))
                ).cast("bigint").alias(name)
            )
        )

    dau = panes.select(
        F.col("pane_day").alias("day"),
        F.hll_sketch_estimate("sketch").cast("bigint").alias("dau"),
    )
    out = dau.join(sliding(7, "wau"), "day").join(sliding(30, "mau"), "day")
    return out.select(
        F.col("day").cast("timestamp_ntz").alias("day"),
        "dau",
        "wau",
        "mau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )


@register(
    "delta_log_table_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    WHERE o_orderkey % 7 = 0 OR o_orderkey % 11 = 0
    """,
    tags=("lake", "S9", "extension"),
)
def q_delta_log_table_roundtrip(spark, sf_dir):
    """Delta-protocol table WITHOUT the delta runtime
    (sources/delta_log.DeltaLogTable — the open _delta_log JSON action
    format, reference parity for delta/delta_scd_script.py:37-43 whose
    jar this container verifiably lacks): orders rows land as a REAL
    Delta table (protocol/metaData/add actions any v1 reader replays),
    a second commit appends a disjoint slice, and the snapshot read
    must equal the union — while version 0 still serves the pre-append
    state (asserted in-gate). The log is metadata: one JSON per commit,
    manifest-sized replay, partition values injected from the log, not
    the files."""
    import tempfile

    from .sources.delta_log import DeltaLogTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    first = o.filter(F.col("o_orderkey") % 7 == 0)
    second = o.filter(
        (F.col("o_orderkey") % 11 == 0) & (F.col("o_orderkey") % 7 != 0)
    )
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_log_"))
    dt.overwrite(first)
    dt.append(second)
    assert dt.read(version=0).count() == first.count()  # time travel
    assert [h["version"] for h in dt.history()] == [0, 1]
    return dt.read()


@register(
    "delta_log_partitioned_prune",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    """,
    tags=("lake", "S9", "extension"),
)
def q_delta_log_partitioned_prune(spark, sf_dir):
    """Partitioned Delta-protocol table with metadata pruning
    (sources/delta_log.DeltaLogTable.read_where): orders written
    partitioned by priority — the partition column lives ONLY in the
    log's partitionValues, never the data files, per the protocol —
    then a priority-filtered read prunes to one partition's files on
    the DRIVER's manifest before Spark lists anything (input-file set
    pinned in tests/test_delta_log.py). The typed partition column is
    re-injected from the log."""
    import tempfile

    from .sources.delta_log import DeltaLogTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_part_"))
    dt.overwrite(o, partition_by=["o_orderpriority"])
    return dt.read_where(
        lambda pv: pv["o_orderpriority"] == "1-URGENT"
    ).select("o_orderkey", "o_orderpriority", "price")


@register(
    "hudi_layout_upsert_roundtrip",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_name, c_mktsegment, 1 AS ver FROM customer
    ),
    upd AS (
      SELECT c_custkey, c_name, 'UPDATED' AS c_mktsegment, 2 AS ver
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 5000000, c_name, 'NEW', 2 FROM customer
      WHERE c_custkey % 97 = 0
    ),
    u AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
            ORDER BY ver DESC) AS rn FROM u)
    SELECT c_custkey, c_name, c_mktsegment,
           CAST(ver AS INTEGER) AS ver
    FROM r WHERE rn = 1
    """,
    tags=("lake", "S7", "extension", "bench_lake"),
)
def q_hudi_layout_upsert_roundtrip(spark, sf_dir):
    """Hudi copy-on-write in Hudi's OWN storage layout
    (sources/hudi_layout.HudiCowTable — timeline of .commit JSON
    instants, <fileId>_<token>_<instant>.parquet file slices, _hoodie_*
    meta columns; reference parity for hudi/hudi_scd_script.py's
    COPY_ON_WRITE writes, whose runtime this container lacks): bulk
    insert customer, then a keyed precombine upsert (every 10th segment
    mutated at ver=2, spurious +5M keys inserted) that rewrites ONLY
    the touched file groups — untouched groups keep serving their
    original files (pinned in tests/test_hudi_layout.py). The snapshot
    read must equal the SQL newest-version-per-key merge."""
    import tempfile

    from .sources.hudi_layout import HudiCowTable

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", F.lit(1).alias("ver")
    )
    upd = cust.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_mktsegment", F.lit("UPDATED")
    ).withColumn("ver", F.lit(2))
    new = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 5000000).alias("c_custkey"),
        "c_name",
        F.lit("NEW").alias("c_mktsegment"),
        F.lit(2).alias("ver"),
    )
    t = HudiCowTable(
        spark, tempfile.mkdtemp(prefix="hudi_cow_"),
        record_key="c_custkey", precombine_field="ver",
    )
    t.bulk_insert(cust)
    t.upsert(upd.unionByName(new))
    return t.read().select(
        "c_custkey", "c_name", "c_mktsegment", F.col("ver").cast("int")
    )


@register(
    "convert_hudi_to_delta_in_place",
    oracle="""
    WITH base AS (
      SELECT c_custkey AS k, c_mktsegment AS seg, 1 AS ver
      FROM customer
    ),
    upd AS (
      SELECT c_custkey, 'UPDATED', 2 FROM customer
      WHERE c_custkey % 10 = 0
    ),
    u AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY k
            ORDER BY ver DESC) AS rn FROM u)
    SELECT k, seg, CAST(ver AS INTEGER) AS ver
    FROM r WHERE rn = 1 AND NOT k % 9 = 0
    """,
    tags=("lake", "S6", "extension"),
)
def q_convert_hudi_to_delta_in_place(spark, sf_dir):
    """Migrate-off-Hudi adoption (r11, sources/convert.
    convert_hudi_to_delta): one metadata commit lays a ``_delta_log``
    beside ``.hoodie/`` over the SAME live file slices — the
    ``_hoodie_*`` meta columns stay in the files but never
    deserialize (Delta scans with the declared schema; parquet
    resolves columns by name). The gate proves the adopted table is a
    normal Delta table by running a CoW DELETE through the Delta
    layer after a Hudi bulk-insert + upsert lifecycle."""
    import tempfile

    from .sources.convert import convert_hudi_to_delta
    from .sources.hudi_layout import HudiCowTable

    cust = _t(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS k", "c_mktsegment AS seg", "1 AS ver"
    )
    t = HudiCowTable(
        spark, tempfile.mkdtemp(prefix="hudi2delta_"),
        record_key="k", precombine_field="ver",
    )
    t.bulk_insert(cust)
    t.upsert(
        cust.filter("k % 10 = 0").selectExpr(
            "k", "'UPDATED' AS seg", "2 AS ver"
        )
    )
    dt = convert_hudi_to_delta(spark, t.location)
    dt.delete("k % 9 = 0")
    return dt.read().select(
        "k", "seg", F.col("ver").cast("int").alias("ver")
    )


@register(
    "hudi_cdc_scan",
    oracle="""
    SELECT c_custkey AS cust_id, CAST(c_acctbal AS DOUBLE) AS balance,
           'update_before' AS change_type, 2 AS commit_seq
    FROM customer WHERE c_custkey % 10 = 3
    UNION ALL
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE) + 1000.0,
           'update_after', 2
    FROM customer WHERE c_custkey % 10 = 3
    UNION ALL
    SELECT c_custkey + 10000000, 0.0, 'insert', 2
    FROM customer WHERE c_custkey % 100 = 0
    UNION ALL
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE), 'delete', 3
    FROM customer WHERE c_custkey % 10 = 7
    """,
    tags=("lake", "S7", "extension"),
)
def q_hudi_cdc_scan(spark, sf_dir):
    """Hudi CHANGE DATA CAPTURE (r11, sources/hudi_cdc.py — Hudi
    0.13's CDC feature re-derived from the timeline + file slices, the
    data_before_after inference shape): cdc_scan emits one row per
    image — an UPDATE yields its old version as ``update_before`` and
    the new one as ``update_after``, a DELETE yields the before image
    — per commit, bounded by the file groups each commit touched.
    Matches Delta CDF / Iceberg changelog semantics, completing the
    trio's CDC surface. The gate replays bulk-insert → upsert
    (update + insert mix) → DELETE and checks the exact event rows;
    timeline instants map to deterministic commit ordinals."""
    import tempfile

    from .sources import hudi_cdc  # noqa: F401  (attaches cdc_scan)
    from .sources.hudi_layout import HudiCowTable

    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_acctbal").cast("double").alias("balance"),
    )
    t = HudiCowTable(
        spark, tempfile.mkdtemp(prefix="hudi_cdc_"),
        record_key="cust_id", precombine_field="balance",
    )
    i1 = t.bulk_insert(cust)
    upd = cust.filter("cust_id % 10 = 3").withColumn(
        "balance", F.col("balance") + 1000.0
    )
    new = cust.filter("cust_id % 100 = 0").select(
        (F.col("cust_id") + 10000000).alias("cust_id"),
        F.lit(0.0).alias("balance"),
    )
    i2 = t.upsert(upd.unionByName(new))
    i3 = t.delete("cust_id % 10 = 7")
    ev = t.cdc_scan(i1)
    return ev.select(
        "cust_id",
        "balance",
        F.col(hudi_cdc.CHANGE_TYPE).alias("change_type"),
        F.when(F.col(hudi_cdc.COMMIT_INSTANT) == i2, F.lit(2))
        .when(F.col(hudi_cdc.COMMIT_INSTANT) == i3, F.lit(3))
        .cast("int")
        .alias("commit_seq"),
    )


@register(
    "hudi_cdc_scan_persisted",
    oracle="""
    SELECT c_custkey AS cust_id, CAST(c_acctbal AS DOUBLE) AS balance,
           'update_before' AS change_type, 2 AS commit_seq
    FROM customer WHERE c_custkey % 10 = 3
    UNION ALL
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE) + 1000.0,
           'update_after', 2
    FROM customer WHERE c_custkey % 10 = 3
    UNION ALL
    SELECT c_custkey + 10000000, 0.0, 'insert', 2
    FROM customer WHERE c_custkey % 100 = 0
    UNION ALL
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE), 'delete', 3
    FROM customer WHERE c_custkey % 10 = 7
    """,
    tags=("lake", "S7", "extension"),
)
def q_hudi_cdc_scan_persisted(spark, sf_dir):
    """Hudi PERSISTED CDC (r12, sources/hudi_cdc.py — Hudi 0.13's
    ``hoodie.table.cdc.enabled`` supplemental-logging mode, the table
    config the reference's runtime ships, hudi/hudi_scd_script.py:33):
    the table is created with ``cdc_enabled=True``, so every
    row-changing commit materializes its change records ONCE at commit
    time into ``cdc/<instant>/``; the scan then reads those files
    directly — no per-commit before-state re-derivation, linear in
    changed rows over any range length. Same replay and oracle as
    ``hudi_cdc_scan`` (inference mode); the two modes share one
    derivation, and tests/test_hudi_cdc.py pins persisted == inferred
    plus the reads-only-cdc-files plan."""
    import tempfile

    from .sources import hudi_cdc  # noqa: F401  (attaches cdc_scan)
    from .sources.hudi_layout import HudiCowTable

    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_acctbal").cast("double").alias("balance"),
    )
    t = HudiCowTable(
        spark, tempfile.mkdtemp(prefix="hudi_cdcp_"),
        record_key="cust_id", precombine_field="balance",
        cdc_enabled=True,
    )
    i1 = t.bulk_insert(cust)
    upd = cust.filter("cust_id % 10 = 3").withColumn(
        "balance", F.col("balance") + 1000.0
    )
    new = cust.filter("cust_id % 100 = 0").select(
        (F.col("cust_id") + 10000000).alias("cust_id"),
        F.lit(0.0).alias("balance"),
    )
    i2 = t.upsert(upd.unionByName(new))
    i3 = t.delete("cust_id % 10 = 7")
    ev = t.cdc_scan(i1)
    return ev.select(
        "cust_id",
        "balance",
        F.col(hudi_cdc.CHANGE_TYPE).alias("change_type"),
        F.when(F.col(hudi_cdc.COMMIT_INSTANT) == i2, F.lit(2))
        .when(F.col(hudi_cdc.COMMIT_INSTANT) == i3, F.lit(3))
        .cast("int")
        .alias("commit_seq"),
    )


@register(
    "hudi_savepoint_restore",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, CAST(1 AS INTEGER) AS ver
    FROM customer
    """,
    tags=("lake", "S7", "extension"),
)
def q_hudi_savepoint_restore(spark, sf_dir):
    """Hudi SAVEPOINT + RESTORE on the from-scratch layout
    (sources/hudi_maintenance.py — the savepoint/restore procedures
    the reference's Hudi runtime bundle provides,
    hudi/hudi_submit.sh): the base bulk-insert is savepointed (its
    file set pinned against the cleaner), two later upserts mutate and
    grow the table, and restore(instant) rolls the TIMELINE back —
    later instants removed, their files deleted — so the snapshot read
    equals the original base exactly. Post-restore writability and
    cleaner protection are pinned in tests/test_hudi_maintenance.py."""
    import tempfile

    from .sources.hudi_layout import HudiCowTable
    from .sources import hudi_maintenance  # noqa: F401 — attaches

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", F.lit(1).alias("ver")
    )
    t = HudiCowTable(
        spark, tempfile.mkdtemp(prefix="hudi_sp_"),
        record_key="c_custkey", precombine_field="ver",
    )
    i0 = t.bulk_insert(cust)
    t.savepoint(i0)
    t.upsert(
        cust.filter(F.col("c_custkey") % 10 == 0)
        .withColumn("c_mktsegment", F.lit("MUTATED"))
        .withColumn("ver", F.lit(2))
    )
    t.upsert(
        cust.filter(F.col("c_custkey") % 97 == 0).select(
            (F.col("c_custkey") + 9000000).alias("c_custkey"),
            "c_name", F.lit("NEW").alias("c_mktsegment"),
            F.lit(3).alias("ver"),
        )
    )
    assert len(t.instants()) == 3
    t.restore(i0)
    assert t.instants() == [i0]
    return t.read().select(
        "c_custkey", "c_name", "c_mktsegment", F.col("ver").cast("int")
    )


@register(
    "hudi_clustering",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_name, c_mktsegment, 1 AS ver FROM customer
    ),
    upd AS (
      SELECT c_custkey, c_name, 'POSTCLUSTER' AS c_mktsegment, 2 AS ver
      FROM customer WHERE c_custkey % 13 = 0
    ),
    u AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
            ORDER BY ver DESC) AS rn FROM u)
    SELECT c_custkey, c_name, c_mktsegment, CAST(ver AS INTEGER) AS ver
    FROM r WHERE rn = 1
    """,
    tags=("lake", "S7", "extension"),
)
def q_hudi_clustering(spark, sf_dir):
    """Hudi CLUSTERING as a REPLACECOMMIT
    (sources/hudi_maintenance.py cluster()): the 6-group table
    re-buckets into 2 sorted file groups in one replacecommit whose
    ``replacedFileGroups`` retires every old group (replay drops them
    — time travel before the instant still sees the old layout,
    pinned in tests/test_hudi_maintenance.py), hoodie.properties
    adopts the new group count, and a POST-cluster keyed upsert routes
    by the new hashing — the snapshot read must equal the SQL
    newest-version-per-key merge. In-gate: exactly 2 live groups after
    clustering."""
    import tempfile

    from .sources.hudi_layout import HudiCowTable
    from .sources import hudi_maintenance  # noqa: F401 — attaches

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", F.lit(1).alias("ver")
    )
    t = HudiCowTable(
        spark, tempfile.mkdtemp(prefix="hudi_cluster_"),
        record_key="c_custkey", precombine_field="ver",
        n_file_groups=6,
    )
    t.bulk_insert(cust)
    t.cluster(2, sort_by=["c_custkey"])
    assert {fid for (_p, fid) in t._file_slices()} == {"fg-0", "fg-1"}
    t.upsert(
        cust.filter(F.col("c_custkey") % 13 == 0)
        .withColumn("c_mktsegment", F.lit("POSTCLUSTER"))
        .withColumn("ver", F.lit(2))
    )
    return t.read().select(
        "c_custkey", "c_name", "c_mktsegment", F.col("ver").cast("int")
    )


@register(
    "hudi_layout_incremental_pull",
    oracle="""
    SELECT c_custkey, 'UPDATED' AS c_mktsegment, CAST(2 AS INTEGER) AS ver
    FROM customer WHERE c_custkey % 10 = 0
    """,
    tags=("lake", "S2", "extension"),
)
def q_hudi_layout_incremental_pull(spark, sf_dir):
    """Hudi incremental query against the layout table
    (HudiCowTable.read_incremental): after a bulk insert and one
    upsert, pulling changes since the FIRST instant must return exactly
    the upserted rows — carried-over rows inside the rewritten file
    slices keep their original _hoodie_commit_time stamp and are
    filtered out, and only the slices the later commits wrote are read
    at all (the commit metadata lists them)."""
    import tempfile

    from .sources.hudi_layout import HudiCowTable

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.lit(1).alias("ver")
    )
    t = HudiCowTable(
        spark, tempfile.mkdtemp(prefix="hudi_inc_"),
        record_key="c_custkey", precombine_field="ver",
    )
    i0 = t.bulk_insert(cust)
    t.upsert(
        cust.filter(F.col("c_custkey") % 10 == 0)
        .withColumn("c_mktsegment", F.lit("UPDATED"))
        .withColumn("ver", F.lit(2))
    )
    return t.read_incremental(i0).select(
        "c_custkey", "c_mktsegment", F.col("ver").cast("int")
    )


@register(
    "wav_codec_frame_energy",
    oracle="""
    WITH v AS (
      SELECT l_orderkey AS doc_id,
             -- tie-break on the value itself: the synthetic lineitem
             -- has duplicate l_linenumber values, so a bare ORDER BY
             -- linenumber leaves tie order engine-dependent
             list(CAST(l_quantity AS INTEGER)
                  ORDER BY l_linenumber, CAST(l_quantity AS INTEGER))
               AS vals
      FROM lineitem WHERE l_orderkey <= 600
      GROUP BY l_orderkey
    ),
    f AS (
      SELECT doc_id, vals,
             unnest(generate_series(0,
               CAST(ceil(len(vals) / 4.0) AS INTEGER) - 1)) AS frame
      FROM v
    ),
    s AS (
      SELECT doc_id, frame,
             list_slice(vals, frame * 4 + 1, frame * 4 + 4) AS chunk
      FROM f
    )
    SELECT doc_id, CAST(0 AS INTEGER) AS channel,
           CAST(frame AS BIGINT) AS frame,
           CAST(len(chunk) AS BIGINT) AS n_samples,
           CAST(list_sum(list_transform(chunk,
                 x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS BIGINT)
             AS sum_sq,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(1 AS INTEGER) AS channels,
           sqrt(CAST(list_sum(list_transform(chunk,
                 x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS BIGINT)
                / CAST(len(chunk) AS BIGINT)) AS rms
    FROM s
    """,
    tags=("multimodal", "udf", "extension"),
)
def q_wav_codec_frame_energy(spark, sf_dir):
    """Round-trip WAV codec gate (operators/multimodal.
    synthesize_wav_pcm16 + wav_pcm16_features): per-order quantity
    sequences become REAL RIFF/WAVE PCM16 blobs (44-byte canonical
    header, little-endian samples — struct/numpy, zero external
    dependencies), then the parser walks the chunk structure and emits
    per-frame integer energies. The oracle recomputes the SAME frame
    metrics directly from the source integers in SQL, never touching
    bytes — so a pass proves decode(encode(x)) == direct(x) exactly,
    the contract that makes the binary plumbing trustworthy for
    payloads whose decode libraries this container lacks."""
    from .operators.multimodal import (
        synthesize_wav_pcm16,
        wav_pcm16_features,
    )

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 600)
    vals = li.groupBy(F.col("l_orderkey").alias("doc_id")).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("n"),
                        F.col("l_quantity").cast("int").alias("q"),
                    )
                )
            ),
            lambda s: s.q,
        ).alias("samples")
    )
    wav = synthesize_wav_pcm16(vals, values_col="samples", sample_rate=8000)
    return wav_pcm16_features(wav, frame_size=4)


@register(
    "scd2_merge_delta_on_log_table",
    oracle=REGISTRY["scd2_merge_delta"].oracle,
    tags=("S11", "J4", "scd2", "lake", "extension"),
)
def q_scd2_merge_delta_on_log_table(spark, sf_dir):
    """The reference's Delta leg END TO END on the protocol table
    (delta/delta_scd_script.py: write Delta -> MERGE INTO -> read):
    the SCD2 target lands in a DeltaLogTable (real _delta_log
    commits), the NULL-mergeKey dual-row MERGE decomposition computes
    the new state FROM the table's snapshot read, and the result is
    committed back as the next version. Shares scd2_merge_delta's
    oracle verbatim — the storage hop must change nothing — and the
    pre-merge snapshot stays readable at version 0 (time travel
    asserted in-gate), which is the operational property (audit /
    rollback) the reference gets from Delta and this table provides
    without the runtime."""
    import tempfile

    from .operators.merge import scd2_merge_delta_style
    from .sources.delta_log import DeltaLogTable

    tgt = scd2_target(spark, sf_dir, include_ts=False)
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_scd2_"))
    dt.overwrite(tgt)
    merged = scd2_merge_delta_style(
        dt.read(),
        customer_updates(spark, sf_dir),
        "c_custkey",
        CHECKSUM_COLS,
        as_of=T2,
    )
    dt.overwrite(merged)
    assert dt.read(version=0).count() == tgt.count()  # audit snapshot
    return dt.read()


@register(
    "iceberg_layout_snapshot_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    WHERE o_orderkey % 5 = 0 OR o_orderkey % 13 = 0
    """,
    tags=("lake", "S9", "extension"),
)
def q_iceberg_layout_snapshot_roundtrip(spark, sf_dir):
    """Iceberg v1 table in Iceberg's OWN metadata layout
    (sources/iceberg_layout.IcebergTable + the pure-Python avro_io
    codec — reference parity for iceberg/iceberg_submit.sh, whose
    runtime + spark-avro jars this container verifiably lacks): orders
    rows land as versioned metadata.json + avro manifest list +
    manifest + parquet data (field-ids per spec), a second snapshot
    appends a disjoint slice, and the snapshot read must equal the
    union while the FIRST snapshot still time-travels (asserted
    in-gate; snapshots are immutable, the version-hint swap is the
    commit). Completes the format trio beside delta_log and
    hudi_layout."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    first = o.filter(F.col("o_orderkey") % 5 == 0)
    second = o.filter(
        (F.col("o_orderkey") % 13 == 0) & (F.col("o_orderkey") % 5 != 0)
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="iceberg_"))
    s0 = t.append(first)
    t.append(second)
    assert t.read(snapshot_id=s0).count() == first.count()  # time travel
    assert len(t.history()) == 2
    return t.read()


@register(
    "iceberg_layout_incremental_read",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders WHERE o_orderkey % 17 = 0
    """,
    tags=("lake", "S2", "extension"),
)
def q_iceberg_layout_incremental_read(spark, sf_dir):
    """Iceberg incremental consumption (IcebergTable.
    read_appended_since): after a base snapshot and one append, reading
    files added since the base must return exactly the appended rows —
    attribution comes from each later snapshot's OWN manifest entries
    (the head manifest demotes carried files to EXISTING status;
    snapshot ids are random per spec, so 'after' resolves through the
    snapshot list's order, never numeric comparison — both pinned in
    tests/test_iceberg_layout.py)."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="iceberg_inc_"))
    s0 = t.append(o.filter(F.col("o_orderkey") % 17 != 0))
    t.append(o.filter(F.col("o_orderkey") % 17 == 0))
    return t.read_appended_since(s0)


@register(
    "scd2_merge_iceberg_on_layout_table",
    oracle=REGISTRY["scd2_merge_iceberg"].oracle,
    tags=("S10", "scd2", "lake", "extension"),
)
def q_scd2_merge_iceberg_on_layout_table(spark, sf_dir):
    """The reference's Iceberg leg END TO END on the layout table
    (iceberg/iceberg_scd_script.py: write Iceberg -> union+LEAD MERGE
    -> read): the SCD2 target lands as a real Iceberg v1 snapshot (avro
    manifests via the pure-Python codec), the union-distinct + LEAD +
    2-key MERGE decomposition computes the new state FROM the table's
    snapshot read, and the result commits as the next snapshot (an
    overwrite — Iceberg CoW). Shares scd2_merge_iceberg's oracle
    verbatim; the pre-merge snapshot stays readable by id (asserted
    in-gate), Iceberg's audit/rollback property."""
    import tempfile

    from .operators.merge import scd2_merge_iceberg_style
    from .sources.iceberg_layout import IcebergTable

    tgt = scd2_target(spark, sf_dir)
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="iceberg_scd2_"))
    s0 = t.append(tgt)
    merged = scd2_merge_iceberg_style(
        t.read(),
        customer_updates(spark, sf_dir),
        "c_custkey",
        CHECKSUM_COLS,
        as_of=T2,
    )
    t.overwrite(merged)
    assert t.read(snapshot_id=s0).count() == tgt.count()
    return t.read()


@register(
    "convert_parquet_to_delta_in_place",
    oracle="""
    SELECT p_partkey, p_type, CAST(p_retailprice AS DOUBLE) AS price
    FROM part
    """,
    tags=("lake", "S6", "extension"),
)
def q_convert_parquet_to_delta_in_place(spark, sf_dir):
    """CONVERT TO DELTA (sources/convert.convert_parquet_dir_to_delta):
    a plain parquet directory is adopted into a Delta-protocol table by
    ONE metadata commit — add actions reference the existing files in
    place, zero bytes copied (inode-pinned in tests/test_convert.py) —
    after which it versions, time-travels, and appends like any
    protocol table. The operational case: petabytes of legacy parquet
    need a transaction log without a rewrite. The snapshot read must
    equal the original data exactly."""
    import tempfile

    from .sources.convert import convert_parquet_dir_to_delta

    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_type",
        F.col("p_retailprice").cast("double").alias("price"),
    )
    loc = tempfile.mkdtemp(prefix="convert_")
    import os
    os.rmdir(loc)
    part.write.parquet(loc)
    dt = convert_parquet_dir_to_delta(spark, loc)
    assert dt.history()[0]["operation"] == "CONVERT"
    return dt.read()


@register(
    "convert_iceberg_to_delta_in_place",
    oracle="""
    SELECT p_partkey, p_type, CAST(p_retailprice AS DOUBLE) AS price
    FROM part
    WHERE NOT p_partkey % 7 = 0
    """,
    tags=("lake", "S6", "extension"),
)
def q_convert_iceberg_to_delta_in_place(spark, sf_dir):
    """Reverse adoption (r11, sources/convert.convert_iceberg_to_delta
    — completing the conversion matrix): an Iceberg table gains a
    ``_delta_log`` beside its ``metadata/`` in ONE metadata commit,
    add actions referencing the SAME live data files by relative path
    with manifest record counts carried as Delta ``stats`` (zero
    footer reads, zero bytes copied). The adopted table is a normal
    Delta table — the gate proves it by running a CoW DELETE through
    the Delta layer after adoption."""
    import tempfile

    from .sources.convert import convert_iceberg_to_delta
    from .sources.iceberg_layout import IcebergTable

    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_type",
        F.col("p_retailprice").cast("double").alias("price"),
    )
    loc = tempfile.mkdtemp(prefix="ice2delta_")
    t = IcebergTable(spark, loc)
    t.overwrite(part.repartition(4))
    dt = convert_iceberg_to_delta(spark, loc)
    assert dt.history()[0]["operation"] == "CONVERT"
    dt.delete("p_partkey % 7 = 0")  # DML through the adopting layer
    return dt.read()


@register(
    "deltalog_stream_tail",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    """,
    tags=("lake", "streaming", "extension"),
)
def q_deltalog_stream_tail(spark, sf_dir):
    """Log-tailing streaming source over the Delta-protocol table
    (sources/delta_source — spark.readStream.format('deltalog')):
    customer lands in three append commits, the stream replays them as
    micro-batches attributed EXACTLY from the log's add actions
    (offsets = commit versions, checkpointable), and the collected sink
    must equal the full table. The protocol makes append detection
    exact — dataChange=false OPTIMIZE commits are no-ops, data-removing
    commits refuse loudly (tests/test_delta_source.py). Arrow-batched
    per file; partition values typed-injected from the log."""
    import tempfile

    from .sources.delta_log import DeltaLogTable
    from .sources.delta_source import register_deltalog_source

    register_deltalog_source(spark)
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    loc = tempfile.mkdtemp(prefix="dl_stream_")
    dt = DeltaLogTable(spark, loc)
    dt.overwrite(cust.filter(F.col("c_custkey") % 3 == 0))
    dt.append(cust.filter(F.col("c_custkey") % 3 == 1))
    dt.append(cust.filter(F.col("c_custkey") % 3 == 2))
    out = tempfile.mkdtemp(prefix="dl_sink_")
    q = (
        spark.readStream.format("deltalog").option("location", loc).load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dl_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.schema("c_custkey bigint, c_mktsegment string").parquet(out)


@register(
    "delta_cdf_stream_tail",
    oracle="""
    SELECT c_custkey, c_mktsegment, 'insert' AS change_type,
           0 AS commit_version
    FROM customer WHERE c_custkey % 3 = 0
    UNION ALL
    SELECT c_custkey, c_mktsegment, 'insert', 2
    FROM customer WHERE c_custkey % 3 = 1
    UNION ALL
    SELECT c_custkey, c_mktsegment, 'delete', 3
    FROM customer
    WHERE c_custkey % 3 IN (0, 1) AND c_custkey % 5 = 0
    """,
    tags=("lake", "streaming", "S2", "extension"),
)
def q_delta_cdf_stream_tail(spark, sf_dir):
    """STREAMING Change Data Feed (r11, sources/delta_cdf_source.py —
    ``spark.readStream.format('deltacdf')``, Delta's
    readChangeFeed=true stream re-derived for the log-native table):
    offsets are commit versions, each micro-batch serves the commits'
    row-level change events with the batch table_changes attribution
    (appends as inserts, cdc-backed DML rows carrying their own
    _change_type), Arrow-batched per file, exactly-once through the
    checkpoint. The gate replays overwrite → enable-CDF → append →
    CoW DELETE and checks the full collected change history."""
    import tempfile

    from .sources import delta_dml  # noqa: F401
    from .sources import delta_cdf  # noqa: F401
    from .sources.delta_cdf_source import register_deltacdf_source
    from .sources.delta_log import DeltaLogTable

    register_deltacdf_source(spark)
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="cdf_stream_"))
    dt.overwrite(cust.filter(F.col("c_custkey") % 3 == 0))
    dt.set_table_properties({"delta.enableChangeDataFeed": "true"})
    dt.append(cust.filter(F.col("c_custkey") % 3 == 1))
    dt.delete("c_custkey % 5 = 0")
    out = tempfile.mkdtemp(prefix="cdf_sink_")
    q = (
        spark.readStream.format("deltacdf")
        .option("location", dt.location)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="cdf_ck_")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.read.schema(
            "c_custkey bigint, c_mktsegment string, "
            "_change_type string, _commit_version bigint, "
            "_commit_timestamp bigint"
        )
        .parquet(out)
        .select(
            "c_custkey",
            "c_mktsegment",
            F.col("_change_type").alias("change_type"),
            F.col("_commit_version").cast("int").alias("commit_version"),
        )
    )


@register(
    "hudi_incremental_stream_tail",
    oracle="""
    SELECT c_custkey AS cust_id, CAST(c_acctbal AS DOUBLE) AS balance,
           1 AS commit_seq
    FROM customer
    UNION ALL
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE) + 1000.0, 2
    FROM customer WHERE c_custkey % 10 = 3
    UNION ALL
    SELECT c_custkey + 10000000, 0.0, 3
    FROM customer WHERE c_custkey % 100 = 0
    """,
    tags=("lake", "streaming", "S7", "extension"),
)
def q_hudi_incremental_stream_tail(spark, sf_dir):
    """STREAMING Hudi incremental source (r12,
    sources/hudi_incr_source.py — ``spark.readStream.format(
    'hudiincr')``, hoodie.datasource.query.type=incremental as a
    stream, the consumption mode the reference's Hudi upsert pipeline
    feeds, hudi/hudi_scd_script.py:72-74): offsets are timeline
    instants checkpointed exactly-once; each micro-batch plans only
    the range's commits' file slices (latest per group) and filters
    carried rows out by commit stamp, Arrow-batched per file. The gate
    replays bulk-insert, streams it (full-history first batch), then
    upserts an update wave and an insert wave and streams the TAIL
    through the same checkpoint — the sink must hold each row exactly
    once per commit that changed it."""
    import tempfile

    from .sources.hudi_incr_source import register_hudiincr_source
    from .sources.hudi_layout import HudiCowTable

    register_hudiincr_source(spark)
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_acctbal").cast("double").alias("balance"),
    )
    t = HudiCowTable(
        spark, tempfile.mkdtemp(prefix="hudi_incr_"),
        record_key="cust_id", precombine_field="balance",
    )
    i1 = t.bulk_insert(cust)
    out = tempfile.mkdtemp(prefix="hincr_sink_")
    ck = tempfile.mkdtemp(prefix="hincr_ck_")

    def run():
        q = (
            spark.readStream.format("hudiincr")
            .option("location", t.location)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()  # batch 1: the full history (everything stamped i1)
    i2 = t.upsert(
        cust.filter("cust_id % 10 = 3").withColumn(
            "balance", F.col("balance") + 1000.0
        )
    )
    i3 = t.upsert(
        cust.filter("cust_id % 100 = 0").select(
            (F.col("cust_id") + 10000000).alias("cust_id"),
            F.lit(0.0).alias("balance"),
        )
    )
    run()  # batch 2: the checkpointed tail — commits i2 + i3 only
    sunk = spark.read.schema(
        "_hoodie_commit_time string, _hoodie_record_key string, "
        "_hoodie_partition_path string, cust_id bigint, "
        "balance double, _hoodie_file_name string"
    ).parquet(out)
    return sunk.select(
        "cust_id",
        "balance",
        F.when(F.col("_hoodie_commit_time") == i1, F.lit(1))
        .when(F.col("_hoodie_commit_time") == i2, F.lit(2))
        .when(F.col("_hoodie_commit_time") == i3, F.lit(3))
        .cast("int")
        .alias("commit_seq"),
    )


@register(
    "hudi_mor_incremental_stream_tail",
    oracle="""
    SELECT c_custkey AS cust_id, CAST(c_acctbal AS DOUBLE) AS balance,
           1 AS commit_seq
    FROM customer
    UNION ALL
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE) + 1000.0, 2
    FROM customer
    WHERE c_custkey % 10 = 3 AND NOT c_custkey % 20 = 3
    """,
    tags=("lake", "streaming", "S7", "extension"),
)
def q_hudi_mor_incremental_stream_tail(spark, sf_dir):
    """STREAMING MoR incremental (r12 second half,
    sources/hudi_incr_source.py): each micro-batch plans one task per
    file group the range's deltacommits touched and merges that
    group's base + log stack executor-side (max-precombine winner,
    commit-time tiebreak, winning tombstones dropped) — Hudi's
    realtime-reader shape as a stream. The gate streams the
    bulk-insert, then upserts an update wave AND tombstones a subset
    of the updated keys in a later deltacommit; the checkpointed tail
    must serve exactly the surviving updated rows (tombstone beats
    the earlier upsert — latest writer wins) and the deleted keys
    must not appear."""
    import tempfile

    from .sources.hudi_incr_source import register_hudiincr_source
    from .sources.hudi_layout import HudiMorTable

    register_hudiincr_source(spark)
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_acctbal").cast("double").alias("balance"),
    )
    t = HudiMorTable(
        spark, tempfile.mkdtemp(prefix="hudi_mor_incr_"),
        record_key="cust_id", precombine_field="balance",
    )
    i1 = t.bulk_insert(cust)
    out = tempfile.mkdtemp(prefix="morincr_sink_")
    ck = tempfile.mkdtemp(prefix="morincr_ck_")

    def run():
        q = (
            spark.readStream.format("hudiincr")
            .option("location", t.location)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()  # batch 1: the bulk-insert state
    t.upsert(
        cust.filter("cust_id % 10 = 3").withColumn(
            "balance", F.col("balance") + 1000.0
        )
    )
    t.delete("cust_id % 20 = 3")  # tombstones beat the upsert
    run()  # batch 2: the checkpointed tail
    sunk = spark.read.schema(
        "cust_id bigint, balance double, _hoodie_commit_time string, "
        "_hoodie_record_key string, _hoodie_partition_path string, "
        "_hoodie_file_name string"
    ).parquet(out)
    return sunk.select(
        "cust_id",
        "balance",
        F.when(F.col("_hoodie_commit_time") == i1, F.lit(1))
        .otherwise(F.lit(2))
        .cast("int")
        .alias("commit_seq"),
    )


@register(
    "iceberg_rewrite_manifests",
    oracle="""
    SELECT n_nationkey AS nk, n_name, r_name AS region
    FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    """,
    tags=("lake", "S14", "extension"),
)
def q_iceberg_rewrite_manifests(spark, sf_dir):
    """Iceberg rewrite_manifests maintenance (r12,
    iceberg_layout.py — the procedure the reference's Iceberg runtime
    ships as CALL system.rewrite_manifests): after per-region appends
    accumulate one manifest per commit (r12's manifest-reuse write
    path), the rewrite re-bins entries partition-SORTED into
    size-bounded manifests — metadata only, entry status/snapshot ids
    preserved, delete manifests by reference, maintenance-stamped.
    The gate appends region by region, compacts manifests, and
    returns the partition-PRUNED read off the consolidated summaries;
    in-gate pins: fewer manifests than appends, read identical."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable

    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    joined = nat.join(
        reg, nat.n_regionkey == reg.r_regionkey
    ).select(
        F.col("n_nationkey").alias("nk"),
        "n_name",
        F.col("r_name").alias("region"),
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_rwm_"))
    regions = [r["region"] for r in joined.select("region").distinct().collect()]
    for rname in sorted(regions):
        t.append(
            joined.filter(F.col("region") == rname).coalesce(1),
            partition_by=["region"],
        )
    stats = t.rewrite_manifests()
    assert stats["manifests_before"] == len(regions)
    assert stats["manifests_after"] == 1
    pruned = t.read_where(
        lambda pv: pv["region"] in ("ASIA", "EUROPE")
    )
    assert pruned.count() == t.read().filter(
        F.col("region").isin("ASIA", "EUROPE")
    ).count()
    return pruned


@register(
    "iceberg_changelog_stream_tail",
    oracle="""
    SELECT c_custkey AS cust_id, c_mktsegment AS segment,
           'insert' AS change_type, 1 AS commit_seq
    FROM customer WHERE c_custkey % 3 = 0
    UNION ALL
    SELECT c_custkey, c_mktsegment, 'insert', 2
    FROM customer WHERE c_custkey % 3 = 1
    UNION ALL
    SELECT c_custkey, c_mktsegment, 'delete', 3
    FROM customer
    WHERE c_custkey % 3 IN (0, 1) AND c_custkey % 5 = 0
    """,
    tags=("lake", "streaming", "S2", "extension"),
)
def q_iceberg_changelog_stream_tail(spark, sf_dir):
    """STREAMING Iceberg changelog (r12,
    sources/iceberg_changelog_source.py —
    ``spark.readStream.format('iceberglog')``, the streaming face of
    create_changelog_view): offsets are snapshot ids ordered by
    parent ancestry (WAP/branch snapshots off main's lineage never
    leak — pinned in tests), each micro-batch plans the range's
    manifest deltas driver-side and serves one Arrow partition per
    changed file; position-delete events ride row-position masks;
    field-id column maps keep renamed tables aligned. The gate
    replays append → stream → append + MoR DELETE → checkpointed
    stream tail and checks the full collected change history."""
    import tempfile

    from .sources import iceberg_deletes  # noqa: F401  (attaches)
    from .sources.iceberg_changelog_source import (
        register_iceberglog_source,
    )
    from .sources.iceberg_layout import IcebergTable

    register_iceberglog_source(spark)
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="icl_stream_"))
    s1 = t.append(cust.filter("cust_id % 3 = 0"))
    out = tempfile.mkdtemp(prefix="icl_sink_")
    ck = tempfile.mkdtemp(prefix="icl_ck_")

    def run():
        q = (
            spark.readStream.format("iceberglog")
            .option("location", t.location)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()  # batch 1: s1's inserts
    s2 = t.append(cust.filter("cust_id % 3 = 1"))
    s3 = t.delete("cust_id % 5 = 0")["snapshot_id"]
    run()  # batch 2: the checkpointed tail — s2 + s3 only
    sunk = spark.read.schema(
        "cust_id bigint, segment string, _change_type string, "
        "_commit_snapshot_id long"
    ).parquet(out)
    return sunk.select(
        "cust_id",
        "segment",
        F.col("_change_type").alias("change_type"),
        F.when(F.col("_commit_snapshot_id") == s1, F.lit(1))
        .when(F.col("_commit_snapshot_id") == s2, F.lit(2))
        .when(F.col("_commit_snapshot_id") == s3, F.lit(3))
        .cast("int")
        .alias("commit_seq"),
    )


@register(
    "iceberg_layout_partition_prune",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    tags=("lake", "S2", "extension"),
)
def q_iceberg_layout_partition_prune(spark, sf_dir):
    """Identity-partitioned Iceberg table with manifest pruning
    (IcebergTable.read_where): orders written under an identity spec on
    priority — the source column stays IN the data files per the
    Iceberg contract while typed partition values land in the manifest
    entries — then a priority-filtered read prunes to one partition's
    files on the DRIVER's manifest before Spark lists anything
    (input-file set pinned in tests/test_iceberg_layout.py)."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="iceberg_part_"))
    t.append(o, partition_by=["o_orderpriority"])
    return t.read_where(
        lambda p: p["o_orderpriority"] == "1-URGENT"
    ).select("o_orderkey", "o_orderpriority", "price")


@register(
    "iceberg_changelog_scan",
    oracle="""
    WITH appended AS (
      SELECT c_custkey + 8000000 AS c_custkey, c_name, c_mktsegment
      FROM customer WHERE c_custkey % 7 = 0
    ),
    state AS (
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      UNION ALL SELECT * FROM appended
    )
    SELECT c_custkey, c_name, c_mktsegment,
           'insert' AS _change_type
    FROM appended
    UNION ALL
    SELECT c_custkey, c_name, c_mktsegment, 'delete' AS _change_type
    FROM state WHERE c_mktsegment = 'BUILDING'
    """,
    tags=("lake", "S2", "extension"),
)
def q_iceberg_changelog_scan(spark, sf_dir):
    """Iceberg CHANGELOG scan (sources/iceberg_changelog.py — the
    row-level change events the reference's runtime serves via CALL
    system.create_changelog_view), completing the trio's CDC surface
    beside Delta CDF and Hudi incremental pull: after base(s1) ->
    append(s2) -> position-DELETE(s3), changes(s1) must report the
    appended rows as inserts and the delete's rows as deletes —
    derived entirely from MANIFEST deltas (added files scan
    themselves; the delete events read only the files the delete
    names via a pair semi-join), never a table diff. A compaction in
    the middle is stamped maintenance and contributes zero events
    (pinned in tests/test_iceberg_changelog.py)."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable
    from .sources import iceberg_changelog  # noqa: F401 — attaches
    from .sources import iceberg_deletes  # noqa: F401 — attaches DML

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_cdc_"))
    s1 = t.overwrite(c.repartition(4))
    t.append(
        c.filter(F.col("c_custkey") % 7 == 0).select(
            (F.col("c_custkey") + 8000000).alias("c_custkey"),
            "c_name", "c_mktsegment",
        )
    )
    t.delete("c_mktsegment = 'BUILDING'")
    return t.changes(s1).select(
        "c_custkey", "c_name", "c_mktsegment", "_change_type"
    )


@register(
    "iceberg_bounds_skipping",
    oracle="""
    SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    WHERE o_orderkey >= (
        SELECT CAST(MAX(o_orderkey) * 0.9 AS BIGINT) FROM orders
    )
    """,
    tags=("lake", "S2", "extension"),
)
def q_iceberg_bounds_skipping(spark, sf_dir):
    """Iceberg manifest COLUMN BOUNDS (sources/iceberg_bounds.py —
    the spec's lower_bounds/upper_bounds maps, single-value binary
    serialization keyed by field id): an UNPARTITIONED table whose
    files are range-laid-out on o_orderkey records per-file min/max
    from parquet footers at write time, and read_hidden's driver pass
    proves most files out on the key predicate before Spark lists
    anything (in-gate file-count assert) — min/max skipping on any
    column, Delta-stats-skipping parity for the Iceberg layout. The
    exact predicate re-applies as the residual, so the result equals
    the plain filter."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_bounds_"))
    t.append(o.repartitionByRange(8, "o_orderkey"))
    # SF-relative threshold (orderkeys scale with SF): top decile
    thr = int(o.agg(F.max("o_orderkey")).first()[0] * 0.9)
    got = t.read_hidden([("o_orderkey", ">=", thr)])
    assert 0 < len(got.inputFiles()) < 8
    return got.select("o_orderkey", "o_orderstatus", "price")


@register(
    "iceberg_wap_publish",
    oracle="""
    SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS bal
    FROM supplier
    UNION ALL
    SELECT s_suppkey + 7000000 AS s_suppkey, s_name,
           CAST(s_acctbal + 50 AS DOUBLE) AS bal
    FROM supplier WHERE s_suppkey % 3 = 0
    """,
    tags=("lake", "S2", "extension"),
)
def q_iceberg_wap_publish(spark, sf_dir):
    """Write-audit-publish through Iceberg REFS
    (sources/iceberg_refs.py — the spec's snapshot-references model
    the reference's runtime exposes as spark.wap.branch / CREATE
    BRANCH): the staged batch commits to branch ``audit`` — a real
    snapshot advancing ONLY the branch head (data + delete manifests
    carried from the branch, parent-snapshot-id recorded) — while
    main provably still reads the base (asserted in-gate); after the
    audit read, ``fast_forward`` verifies main is an ancestor of the
    branch head and publishes metadata-only. The returned read is
    main AFTER publish and must equal base UNION staged."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable
    from .sources import iceberg_refs  # noqa: F401 — attaches refs

    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name",
        F.col("s_acctbal").cast("double").alias("bal"),
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_wap_"))
    t.append(s)
    base_n = t.read().count()
    t.create_branch("audit")
    staged = s.filter(F.col("s_suppkey") % 3 == 0).select(
        (F.col("s_suppkey") + 7000000).alias("s_suppkey"),
        "s_name",
        (F.col("bal") + 50).alias("bal"),
    )
    t.append_to_branch(staged, "audit")
    assert t.read().count() == base_n  # WRITE: main is blind
    assert t.read_ref("audit").count() > base_n  # AUDIT
    t.fast_forward("audit")  # PUBLISH
    return t.read().select("s_suppkey", "s_name", "bal")


@register(
    "iceberg_hidden_partitioning",
    oracle="""
    SELECT event_id, ts, user_id, CAST(value AS DOUBLE) AS value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
      AND user_id = 7
    """,
    tags=("lake", "S2", "extension", "bench_lake"),
)
def q_iceberg_hidden_partitioning(spark, sf_dir):
    """HIDDEN partitioning on the Iceberg layout
    (IcebergTable.read_hidden + sources/iceberg_transforms.py — the
    spec's partition-transform model the reference gets from
    iceberg-spark-runtime, iceberg/iceberg_submit.sh:33): events are
    written under ``day(ts), bucket(8, user_id)`` — the day ordinal
    and the spec murmur3 bucket (seed-0 x86 32-bit, pinned to the
    spec's Appendix B vectors) are computed entirely JVM-side — and
    the read filters on the SOURCE columns only. The ts range prunes
    day partitions (order-preserving transform), the user equality
    prunes 7 of 8 buckets, both at the driver's manifest before any
    file is listed (file-count pins in
    tests/test_iceberg_transforms.py), and the exact predicates
    re-apply as residual row filters, so the result equals the plain
    filtered scan."""
    import datetime as _dt
    import tempfile

    from .sources.iceberg_layout import IcebergTable

    e = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id",
        F.col("value").cast("double").alias("value"),
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_hidden_"))
    t.append(e, partition_by=["day(ts)", "bucket(8, user_id)"])
    return t.read_hidden(
        [
            ("ts", ">=", _dt.datetime(2024, 1, 8)),
            ("ts", "<", _dt.datetime(2024, 1, 15)),
            ("user_id", "=", 7),
        ]
    ).select("event_id", "ts", "user_id", "value")


@register(
    "delta_generated_columns",
    oracle="""
    SELECT event_id, ts, user_id, CAST(value AS DOUBLE) AS value,
           CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
    """,
    tags=("lake", "S9", "extension"),
)
def q_delta_generated_columns(spark, sf_dir):
    """Delta GENERATED COLUMNS (sources/delta_gen.py —
    delta.generationExpression per PROTOCOL.md, the feature the
    reference's Delta runtime provides, delta/delta_submit.sh:27-32):
    the table declares ``event_date GENERATED ALWAYS AS
    (CAST(ts AS DATE))`` as its partition column; the write batch
    NEVER materializes it (computed JVM-side at write, protocol
    minWriterVersion 4), and the read filters only on ``ts`` — the
    ts range prunes event_date partitions through the recognized
    expression shape (strictly fewer files scheduled, asserted
    in-gate and pinned in tests/test_delta_gen.py) before the exact
    predicate re-applies as the residual."""
    import datetime as _dt
    import tempfile

    from .sources.delta_log import DeltaLogTable
    from .sources import delta_gen  # noqa: F401 — attaches the feature

    e = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id",
        F.col("value").cast("double").alias("value"),
    )
    t = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_gen_"))
    t.overwrite_generated(
        e,
        generated={"event_date": "CAST(ts AS DATE)"},
        partition_by=["event_date"],
    )
    lo = _dt.datetime(2024, 1, 8)
    hi = _dt.datetime(2024, 1, 15)
    flt = [("ts", ">=", lo), ("ts", "<", hi)]
    assert 0 < len(t.files_matching_generated(flt)) < len(
        t.files_matching([])
    )
    return t.read_generated(flt).select(
        "event_id", "ts", "user_id", "value",
        # DATE comparator convention: surface as TIMESTAMP both sides
        F.col("event_date").cast("timestamp").alias("event_date"),
    )


@register(
    "delta_identity_columns",
    oracle="""
    WITH c AS (SELECT COUNT(*) AS n FROM customer),
         m AS (SELECT COUNT(*) AS m FROM customer
               WHERE c_custkey % 11 = 0)
    SELECT CAST(c.n + m.m AS BIGINT) AS n_rows,
           CAST(c.n + m.m AS BIGINT) AS n_distinct_ids,
           CAST(1 AS BIGINT) AS min_rid,
           CAST(c.n + m.m AS BIGINT) AS max_rid
    FROM c, m
    """,
    tags=("lake", "S9", "extension"),
)
def q_delta_identity_columns(spark, sf_dir):
    """Delta IDENTITY columns (sources/delta_gen.py —
    GENERATED ALWAYS AS IDENTITY per PROTOCOL.md, writer version 6):
    the table allocates a DENSE id block per write — one count pass
    yields per-partition row counts, each partition numbers its rows
    inside a contiguous block (no global sort, no single-task window,
    the block-reservation shape real Delta writers use) — and the
    high watermark rides the same commit's metaData, so a second
    append continues strictly above it with zero reuse. The dense
    contract IS the oracle: after base + append, ids are exactly
    {1..N+M} — count, distinct count, min, max all pinned. Explicit
    writes to the column refuse (tests/test_delta_gen.py)."""
    import tempfile

    from .sources.delta_log import DeltaLogTable
    from .sources import delta_gen  # noqa: F401 — attaches identity

    c = _t(spark, sf_dir, "customer").select("c_name", "c_mktsegment")
    t = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_id_"))
    t.overwrite_identity(
        c, identity={"rid": {"start": 1, "step": 1}}
    )
    t.append(
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 11 == 0)
        .select("c_name", "c_mktsegment")
    )
    return t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("rid").alias("n_distinct_ids"),
        F.min("rid").alias("min_rid"),
        F.max("rid").alias("max_rid"),
    )


@register(
    "delta_dml_delete_update",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT'
                THEN CAST(o_totalprice * 1.1 AS DOUBLE)
                ELSE CAST(o_totalprice AS DOUBLE) END AS price,
           o_orderstatus, o_orderpriority
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 50000)
    """,
    tags=("lake", "S11", "extension", "bench_lake"),
)
def q_delta_dml_delete_update(spark, sf_dir):
    """DELETE + UPDATE DML on the Delta-protocol table
    (sources/delta_dml.py — the table operations the reference's Delta
    runtime provides over the table delta/delta_scd_script.py writes):
    orders land as a protocol table, a copy-on-write DELETE drops
    low-value finished orders rewriting ONLY files with hits
    (untouched add actions survive verbatim — tests/test_delta_dml.py),
    then an UPDATE raises urgent orders' price with every SET RHS
    evaluated against the OLD row. The final snapshot must equal the
    same DML applied in plain SQL."""
    import tempfile

    from .sources.delta_log import DeltaLogTable
    from .sources import delta_dml  # noqa: F401 — attaches DML

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("price"),
        "o_orderstatus",
        "o_orderpriority",
    )
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_dml_"))
    dt.overwrite(o.repartition(8))
    dt.delete("o_orderstatus = 'F' AND price < 50000")
    dt.update(
        "o_orderpriority = '1-URGENT'",
        {"price": "price * 1.1"},
    )
    return dt.read()


@register(
    "delta_deletion_vectors",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    WHERE NOT (o_orderstatus = 'O' AND o_orderkey % 5 = 0)
      AND NOT (o_orderstatus = 'F' AND o_orderkey % 7 = 0)
    """,
    tags=("lake", "S11", "extension", "bench_lake"),
)
def q_delta_deletion_vectors(spark, sf_dir):
    """Merge-on-read DELETE via real deletion vectors
    (sources/dv.py + sources/roaring.py — the protocol's
    RoaringBitmapArray portable format): two DV deletes attach bitmaps
    to the SAME physical files (no data file is rewritten — pinned in
    tests/test_delta_dml.py), the protocol upgrades to reader 3 /
    writer 7 with the deletionVectors feature, and the snapshot read
    applies the bitmaps through _metadata.row_index + one broadcast
    anti-join. Result must equal the plain-SQL double filter."""
    import tempfile

    from .sources.delta_log import DeltaLogTable
    from .sources import delta_dml  # noqa: F401 — attaches DML

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_dv_"))
    dt.overwrite(o.repartition(6))
    dt.delete("o_orderstatus = 'O' AND o_orderkey % 5 = 0", mode="dv")
    dt.delete("o_orderstatus = 'F' AND o_orderkey % 7 = 0", mode="dv")
    proto = dt.current_protocol()
    assert "deletionVectors" in proto["readerFeatures"], proto
    return dt.read()


@register(
    "delta_zorder_skipping",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    WHERE o_custkey >= 500 AND o_custkey < 600
      AND o_totalprice >= 100000 AND o_totalprice < 150000
    """,
    tags=("lake", "S9", "extension", "scale"),
)
def q_delta_zorder_skipping(spark, sf_dir):
    """OPTIMIZE ... ZORDER BY on the Delta-protocol table
    (delta_log._zvalue_column): orders are rewritten clustered on the
    Morton curve over (o_custkey, o_totalprice), so per-file min/max
    stats become selective on BOTH columns and read_filtered's
    stats-based skipping prunes files for the two-column range
    predicate (skipping efficacy vs the linear layout is pinned in
    tests/test_delta_dml.py; the in-gate assert keeps it honest).
    Results must equal the plain filter — skipping only ever removes
    files that cannot match."""
    import tempfile

    from .sources.delta_log import DeltaLogTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_z_"))
    dt.overwrite(o.repartition(16))
    dt.optimize(target_files=16, zorder_by=["o_custkey", "price"])
    filters = [
        ("o_custkey", ">=", 500),
        ("o_custkey", "<", 600),
        ("price", ">=", 100000.0),
        ("price", "<", 150000.0),
    ]
    assert len(dt.files_matching(filters)) < 16  # skipping engaged
    return dt.read_filtered(filters)


@register(
    "delta_column_mapping_rename",
    oracle="""
    SELECT c_custkey, c_mktsegment AS segment, c_name AS customer_name
    FROM customer
    UNION ALL
    SELECT c_custkey + 10000000, 'POST-RENAME' AS segment,
           c_name AS customer_name
    FROM customer
    WHERE c_custkey % 100 = 0
    """,
    tags=("lake", "S9", "extension"),
)
def q_delta_column_mapping_rename(spark, sf_dir):
    """Delta COLUMN MAPPING, name mode (sources/delta_colmap.py —
    PROTOCOL.md's rename/drop evolution): enable_column_mapping stamps
    field ids + physical names and upgrades the protocol to declare
    the columnMapping feature; RENAME COLUMN is then metadata-only —
    the gate asserts ZERO data files were rewritten while every
    pre-rename file serves under the new logical names, and an append
    AFTER the rename writes physical names so both generations read
    back identically."""
    import tempfile

    from .sources import DeltaLogTable

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_name"
    )
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_cm_"))
    dt.overwrite(c.repartition(4))
    live0, _, _ = dt._replay()
    dt.enable_column_mapping()
    dt.rename_column("c_mktsegment", "segment")
    dt.rename_column("c_name", "customer_name")
    live1, _, _ = dt._replay()
    assert set(live0) == set(live1)  # rename rewrote nothing
    dt.append(
        c.filter("c_custkey % 100 = 0").selectExpr(
            "c_custkey + 10000000 AS c_custkey",
            "'POST-RENAME' AS segment",
            "c_name AS customer_name",
        )
    )
    proto = dt.current_protocol()
    assert "columnMapping" in proto["readerFeatures"]
    return dt.read()


@register(
    "delta_colmap_evolved_overwrite",
    oracle="""
    SELECT c_custkey AS cust_id, c_name AS customer_name,
           c_custkey % 10 AS bucket
    FROM customer
    UNION ALL
    SELECT c_custkey + 10000000 AS cust_id,
           'POST' AS customer_name,
           (c_custkey + 10000000) % 10 AS bucket
    FROM customer
    WHERE c_custkey % 100 = 0
    """,
    tags=("lake", "S9", "extension"),
)
def q_delta_colmap_evolved_overwrite(spark, sf_dir):
    """Round-11 mapped-table completions (both were r10 refusals —
    sources/delta_colmap.py reconcile_mapped_schema + delta_gen.py):
    a SCHEMA-CHANGING overwrite of a column-mapped table reconciles
    by logical name (retained columns keep their ids/physical names,
    new ones mint fresh ids), and GENERATED columns can then be
    declared on the mapped table (protocol features union — the
    columnMapping feature is never downgraded). The gate exercises
    the full lifecycle: map → rename → schema-changing overwrite →
    rename again → declare generated → post-declaration append."""
    import json as _json
    import tempfile

    from .sources import DeltaLogTable

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_name"
    )
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_cmo_"))
    dt.overwrite(c.repartition(4))
    dt.enable_column_mapping()
    dt.rename_column("c_mktsegment", "segment")
    _, meta0, _ = dt._replay()
    phys0 = {
        f["name"]: f["metadata"]["delta.columnMapping.physicalName"]
        for f in _json.loads(meta0["schemaString"])["fields"]
    }
    # SCHEMA-CHANGING overwrite: drops segment/c_name, adds cust_id
    dt.overwrite(
        _t(spark, sf_dir, "customer").selectExpr(
            "c_custkey", "c_name AS customer_name"
        )
    )
    _, meta1, _ = dt._replay()
    phys1 = {
        f["name"]: f["metadata"]["delta.columnMapping.physicalName"]
        for f in _json.loads(meta1["schemaString"])["fields"]
    }
    assert phys1["c_custkey"] == phys0["c_custkey"]  # id retained
    assert phys1["customer_name"].startswith("col-")  # fresh mint
    dt.rename_column("c_custkey", "cust_id")  # mapping still alive
    # GENERATED column declared on the mapped table
    dt.overwrite_generated(
        _t(spark, sf_dir, "customer").selectExpr(
            "c_custkey AS cust_id", "c_name AS customer_name"
        ),
        generated={"bucket": "cust_id % 10"},
    )
    proto = dt.current_protocol()
    assert "generatedColumns" in proto["writerFeatures"]
    assert "columnMapping" in proto["writerFeatures"]
    dt.append(
        _t(spark, sf_dir, "customer")
        .filter("c_custkey % 100 = 0")
        .selectExpr(
            "c_custkey + 10000000 AS cust_id",
            "'POST' AS customer_name",
        )
    )
    return dt.read()


@register(
    "delta_uniform_iceberg_mirror",
    oracle="""
    SELECT c_custkey AS cust_id, c_mktsegment AS segment
    FROM customer
    WHERE NOT c_custkey % 10 = 4
    UNION ALL
    SELECT c_custkey + 10000000 AS cust_id, 'NEW' AS segment
    FROM customer
    WHERE c_custkey % 100 = 0
    """,
    tags=("lake", "S9", "extension"),
)
def q_delta_uniform_iceberg_mirror(spark, sf_dir):
    """Delta UniForm (r11, sources/uniform.py — real Delta's
    ``delta.universalFormat.enabledFormats=iceberg`` re-derived over
    the repo's own protocol layers): a continuously synced ICEBERG
    metadata mirror in the Delta table's own directory, referencing
    the same parquet files — zero bytes copied, each sync one
    metadata-only commit with O(changed files) footer reads (carried
    files reuse recorded record counts). The gate runs the full
    lifecycle — enable → append+sync → CoW DELETE+sync — and returns
    the ICEBERG read, which must equal the Delta state; the mirror's
    history time-travels across the Delta versions."""
    import tempfile

    from .sources import uniform  # noqa: F401  (attaches the methods)
    from .sources.delta_log import DeltaLogTable
    from .sources.iceberg_layout import IcebergTable

    c = _t(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS cust_id", "c_mktsegment AS segment"
    )
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_uf_"))
    dt.overwrite(c.repartition(4))
    dt.enable_uniform()
    dt.append(
        _t(spark, sf_dir, "customer")
        .filter("c_custkey % 100 = 0")
        .selectExpr(
            "c_custkey + 10000000 AS cust_id", "'NEW' AS segment"
        )
    )
    dt.sync_uniform()
    dt.delete("cust_id % 10 = 4")
    dt.sync_uniform()
    assert dt.sync_uniform() is None  # idempotent at head
    ice = IcebergTable(spark, dt.location)
    assert len(ice.history()) >= 3  # the mirror carries the lifecycle
    return ice.read()


@register(
    "delta_uniform_partitioned_mirror",
    oracle="""
    SELECT o_orderkey, o_orderpriority AS prio,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND NOT o_orderkey % 7 = 0
    """,
    tags=("lake", "S9", "extension"),
)
def q_delta_uniform_partitioned_mirror(spark, sf_dir):
    """UniForm over a HIVE-PARTITIONED + COLUMN-MAPPED Delta table
    (r12, sources/uniform.py — the two shapes the r11 mirror refused):
    manifest entries carry typed identity partition values parsed from
    the add actions (spec-507 summaries included), reads serve the
    file-absent partition columns as manifest constants (the spec's
    identity-partition rule, property-gated), and files' PHYSICAL
    column names resolve through Iceberg's own
    ``schema.name-mapping.default`` property — a rename stays
    metadata-only on both sides. The gate partitions orders by
    priority, enables mapping + UniForm, renames a column, deletes,
    syncs, and returns the ICEBERG mirror's PARTITION-PRUNED read —
    which must equal the Delta state exactly."""
    import tempfile

    from .sources import delta_colmap  # noqa: F401  (attaches)
    from .sources import delta_dml  # noqa: F401
    from .sources import uniform  # noqa: F401
    from .sources.delta_log import DeltaLogTable
    from .sources.iceberg_layout import IcebergTable

    o = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "o_orderpriority",
        "CAST(o_totalprice AS DOUBLE) AS price",
    )
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_ufp_"))
    dt.overwrite(o, partition_by=["o_orderpriority"])
    dt.enable_column_mapping()
    dt.enable_uniform()
    dt.rename_column("o_orderpriority", "prio")  # metadata-only
    dt.delete("o_orderkey % 7 = 0")
    dt.sync_uniform()
    assert dt.sync_uniform() is None  # idempotent at head
    ice = IcebergTable(spark, dt.location)
    pruned = ice.read_where(
        lambda pv: pv["prio"] in ("1-URGENT", "2-HIGH")
    )
    return pruned.select("o_orderkey", "prio", "price")


@register(
    "delta_update_dv",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderstatus = 'O'
                THEN CAST(o_totalprice AS DOUBLE) * 1.1
                ELSE CAST(o_totalprice AS DOUBLE) END AS price
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 5 = 0)
    """,
    tags=("lake", "S11", "extension"),
)
def q_delta_update_dv(spark, sf_dir):
    """Merge-on-read UPDATE via deletion vectors (r10,
    sources/delta_dml.py update mode='dv'): matched rows are DV'd in
    place — bitmaps built executor-side — and their SET-applied copies
    land as fresh files in the same commit, zero pre-update files
    rewritten (asserted in-gate). Composes with a DV DELETE in the
    same table; result equals the plain SQL expression."""
    import tempfile

    from .sources import DeltaLogTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_updv_"))
    dt.overwrite(o.repartition(5))
    files0 = set(dt._replay()[0])
    dt.delete("o_orderstatus = 'F' AND o_orderkey % 5 = 0", mode="dv")
    dt.update("o_orderstatus = 'O'", {"price": "price * 1.1"},
              mode="dv")
    live, _, _ = dt._replay()
    assert files0 <= set(live)  # zero pre-update files rewritten
    return dt.read()


@register(
    "delta_column_mapping_dml",
    oracle="""
    WITH renamed AS (
      SELECT c_custkey, c_mktsegment AS segment,
             CAST(c_acctbal AS DOUBLE) AS balance
      FROM customer
    )
    SELECT c_custkey, segment,
           CASE WHEN c_custkey % 10 = 0 THEN 0.0 ELSE balance END
             AS balance
    FROM renamed
    WHERE NOT (balance < 0)
      AND NOT (segment = 'MACHINERY' AND c_custkey % 3 = 0)
    """,
    tags=("lake", "S11", "extension"),
)
def q_delta_column_mapping_dml(spark, sf_dir):
    """Row-level DML on a COLUMN-MAPPED table (r10): after
    enable_column_mapping + renames, a CoW DELETE, a DV DELETE, and an
    UPDATE all run against the renamed logical names while the files
    keep their physical names — the scan maps physical→logical, the
    rewrites map back. Result equals plain SQL over the renamed
    projection."""
    import tempfile

    from .sources import DeltaLogTable

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
    )
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_cmdml_"))
    dt.overwrite(c.repartition(4))
    dt.enable_column_mapping()
    dt.rename_column("c_mktsegment", "segment")
    dt.rename_column("c_acctbal", "balance")
    dt.delete("balance < 0")                                   # CoW
    dt.delete("segment = 'MACHINERY' AND c_custkey % 3 = 0",
              mode="dv")                                       # MoR
    dt.update("c_custkey % 10 = 0", {"balance": "0.0"})
    return dt.read()


@register(
    "delta_schema_evolution",
    oracle="""
    SELECT c_custkey, c_name,
           CASE WHEN c_custkey % 10 = 0 THEN c_mktsegment END AS segment
    FROM customer
    """,
    tags=("lake", "S9", "extension"),
)
def q_delta_schema_evolution(spark, sf_dir):
    """mergeSchema append on the Delta-protocol table
    (DeltaLogTable.append(merge_schema=True)): the base write lacks the
    segment column; an evolved append adds it for a tenth of the
    customers by widening the metaData schema IN the append commit —
    no file rewrite — and the snapshot read serves typed NULLs for
    every pre-evolution file via the explicit-schema parquet scan."""
    import tempfile

    from .sources.delta_log import DeltaLogTable

    c = _t(spark, sf_dir, "customer")
    base = c.filter(F.col("c_custkey") % 10 != 0).select(
        "c_custkey", "c_name"
    )
    evolved = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", "c_name", F.col("c_mktsegment").alias("segment")
    )
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_evo_"))
    dt.overwrite(base)
    dt.append(evolved, merge_schema=True)
    return dt.read()


@register(
    "iceberg_position_deletes",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    WHERE NOT (o_orderstatus = 'O' AND o_orderkey % 4 = 0)
      AND NOT (o_orderstatus = 'F' AND o_orderkey % 9 = 0)
    """,
    tags=("lake", "S10", "extension", "bench_lake"),
)
def q_iceberg_position_deletes(spark, sf_dir):
    """Iceberg v2 merge-on-read DELETE (sources/iceberg_deletes.py —
    the DELETE FROM the reference's iceberg-spark-runtime provides):
    two deletes write real position-delete parquet files
    ((file_path, pos) pairs, spec field layout) tracked in delete
    manifests; NO data file is rewritten (pinned in
    tests/test_iceberg_deletes.py, asserted in-gate), format-version
    bumps to 2, and the snapshot read applies the pairs through
    _metadata.row_index + one broadcast anti-join. Result must equal
    the plain double filter."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable
    from .sources import iceberg_deletes  # noqa: F401 — attaches DELETE

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_posdel_"))
    t.overwrite(o.repartition(6))
    files0 = {e["data_file"]["file_path"] for e in t._entries()}
    t.delete("o_orderstatus = 'O' AND o_orderkey % 4 = 0")
    t.delete("o_orderstatus = 'F' AND o_orderkey % 9 = 0")
    files1 = {e["data_file"]["file_path"] for e in t._entries()}
    assert files0 == files1  # merge-on-read: zero rewrites
    assert t._metadata()["format-version"] == 2
    return t.read()


@register(
    "iceberg_equality_deletes",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_name
    FROM customer
    WHERE c_mktsegment NOT IN ('BUILDING', 'AUTOMOBILE')
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_name
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_custkey % 7 = 0
    """,
    tags=("lake", "S10", "extension"),
)
def q_iceberg_equality_deletes(spark, sf_dir):
    """Iceberg v2 EQUALITY deletes (sources/iceberg_deletes.py
    equality_delete — the spec's content=2 delete kind, keyed by
    equality field ids): delete-by-key masks every row written
    at-or-before the delete, and SEQUENCE-NUMBER applicability keeps
    rows appended AFTER it — gated here by re-inserting a slice of a
    deleted segment post-delete, which must survive while the
    original segment rows stay masked. The delete key set is written
    executor-side; appends carry the delete file forward."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable
    from .sources import iceberg_deletes  # noqa: F401

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_name"
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_eqdel_"))
    t.overwrite(c.repartition(4))
    t.equality_delete(
        spark.createDataFrame(
            [("BUILDING",), ("AUTOMOBILE",)], "c_mktsegment string"
        )
    )
    # post-delete append of a deleted key: sequence rules keep it
    t.append(c.filter("c_mktsegment = 'BUILDING' AND c_custkey % 7 = 0"))
    assert t._live_eq_delete_entries()  # carried, not materialized
    return t.read()


@register(
    "iceberg_streaming_upsert",
    oracle="""
    SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS bal
    FROM customer WHERE c_custkey % 7 <> 0
    UNION ALL
    SELECT c_custkey, UPPER(c_name) AS c_name,
           CAST(c_acctbal + 100 AS DOUBLE) AS bal
    FROM customer WHERE c_custkey % 7 = 0
    """,
    tags=("lake", "S7", "streaming", "extension"),
)
def q_iceberg_streaming_upsert(spark, sf_dir):
    """ONE-snapshot keyed upsert on the Iceberg layout
    (IcebergTable.upsert_by_key — the equality-delete CDC pattern
    real streaming writers emit): the batch's key set lands as a
    content=2 equality-delete file AND its rows as data files in the
    SAME snapshot; sequence applicability masks every older version
    of a batch key while the batch's own rows survive. Zero
    pre-existing files read or rewritten (write cost O(batch)). The
    gate also replays an epoch through upsert_idempotent and asserts
    the duplicate is skipped — the exactly-once streaming contract."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable
    from .sources import iceberg_deletes  # noqa: F401

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_upsert_"))
    t.overwrite(c.repartition(4))
    files0 = {e["data_file"]["file_path"] for e in t._entries()}
    batch = c.filter("c_custkey % 7 = 0").select(
        "c_custkey",
        F.upper("c_name").alias("c_name"),
        (F.col("bal") + 100).alias("bal"),
    )
    assert t.upsert_idempotent(batch, ["c_custkey"], "gate", 0)
    assert not t.upsert_idempotent(
        batch, ["c_custkey"], "gate", 0
    )  # replayed epoch skipped — exactly-once
    assert files0 <= {
        e["data_file"]["file_path"] for e in t._entries()
    }  # zero pre-existing files rewritten
    return t.read()


@register(
    "iceberg_rename_column_dml",
    oracle="""
    WITH renamed AS (
      SELECT c_custkey, c_mktsegment AS segment, c_name
      FROM customer
    )
    SELECT c_custkey, segment, c_name
    FROM renamed
    WHERE NOT (segment = 'FURNITURE' AND c_custkey % 2 = 0)
    UNION ALL
    SELECT c_custkey + 30000000, 'POST' AS segment, c_name
    FROM customer WHERE c_custkey % 50 = 0
    """,
    tags=("lake", "S12", "extension"),
)
def q_iceberg_rename_column_dml(spark, sf_dir):
    """Iceberg RENAME COLUMN (r10 — the spec's field-id evolution):
    metadata-only schema version bump; every pre-rename file keeps
    serving because reads resolve columns BY FIELD ID through each
    file's write-time schema (iceberg_layout._aligned_scan). The gate
    renames, runs a DELETE against the NEW name over OLD files,
    appends post-rename rows, and must equal plain SQL over the
    renamed projection — with zero data files rewritten by the rename
    (asserted in-gate)."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable
    from .sources import iceberg_deletes  # noqa: F401

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_name"
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_ren_"))
    t.overwrite(c.repartition(4))
    files0 = {e["data_file"]["file_path"] for e in t._entries()}
    t.rename_column("c_mktsegment", "segment")
    assert {
        e["data_file"]["file_path"] for e in t._entries()
    } == files0  # rename rewrote nothing
    t.delete("segment = 'FURNITURE' AND c_custkey % 2 = 0")
    t.append(
        c.filter("c_custkey % 50 = 0").selectExpr(
            "c_custkey + 30000000 AS c_custkey",
            "'POST' AS segment",
            "c_name",
        )
    )
    return t.read()


@register(
    "iceberg_rollback_after_compaction",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    """,
    tags=("lake", "S2", "extension"),
)
def q_iceberg_rollback_after_compaction(spark, sf_dir):
    """rollback_to_snapshot on the Iceberg layout
    (IcebergTable.rollback): a MoR delete and a rewrite_data_files
    compaction both land as snapshots, then a metadata-only rollback
    re-points current-snapshot-id at the ORIGINAL snapshot — the full
    table must come back byte-for-byte (nothing was rewritten by the
    rollback; the delete and compaction snapshots stay in history and
    the gate asserts a roll-FORWARD to the compacted state still
    works)."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable
    from .sources import iceberg_deletes  # noqa: F401

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_rb_"))
    s0 = t.overwrite(o.repartition(4))
    t.delete("o_orderpriority = '1-URGENT'")
    s_compact = t.rewrite_data_files(target_files=2)
    n_compact = t.read().count()
    t.rollback(s0)
    out = t.read()
    # roll-forward also works and serves the compacted state
    t.rollback(s_compact)
    assert t.read().count() == n_compact
    t.rollback(s0)
    return out


@register(
    "hudi_mor_realtime_view",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_name, c_mktsegment, 1 AS ver FROM customer
    ),
    upd AS (
      SELECT c_custkey, c_name, 'UPDATED' AS c_mktsegment, 2 AS ver
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 5000000, c_name, 'NEW', 2 FROM customer
      WHERE c_custkey % 97 = 0
    ),
    u AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
            ORDER BY ver DESC) AS rn FROM u)
    SELECT c_custkey, c_name, c_mktsegment,
           CAST(ver AS INTEGER) AS ver
    FROM r WHERE rn = 1
    """,
    tags=("lake", "S7", "extension"),
)
def q_hudi_mor_realtime_view(spark, sf_dir):
    """Hudi MERGE_ON_READ in Hudi's own layout
    (sources/hudi_layout.py:HudiMorTable — the OTHER table type
    hudi/hudi_scd_script.py:13-18 selects; queried through the _rt
    view, README.md:157-160): the upsert batch lands as LOG FILES
    under a .deltacommit (zero base rewrites — pinned in
    tests/test_hudi_mor_layout.py and asserted in-gate via the
    read-optimized view, which must still serve the PRE-upsert state),
    and the realtime view merges base ∪ logs by record key at read.
    Must equal the same upsert in plain SQL — and equal the CoW
    twin hudi_layout_upsert_roundtrip row-for-row."""
    import tempfile

    from .sources.hudi_layout import HudiMorTable

    c = _t(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey", "c_name", "c_mktsegment", F.lit(1).alias("ver")
    )
    upd = base.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_mktsegment", F.lit("UPDATED")
    ).withColumn("ver", F.lit(2)).unionByName(
        c.filter(F.col("c_custkey") % 97 == 0).select(
            (F.col("c_custkey") + 5000000).alias("c_custkey"),
            "c_name",
            F.lit("NEW").alias("c_mktsegment"),
            F.lit(2).alias("ver"),
        )
    )
    t = HudiMorTable(
        spark, tempfile.mkdtemp(prefix="hudi_mor_"),
        record_key="c_custkey", precombine_field="ver",
        n_file_groups=4,
    )
    t.bulk_insert(base)
    n_base = base.count()
    t.upsert(upd)
    # the _ro view is STALE by design: log data invisible pre-compaction
    assert t.read_optimized().count() == n_base
    return t.read().select("c_custkey", "c_name", "c_mktsegment", "ver")


@register(
    "iceberg_schema_evolution",
    oracle="""
    SELECT c_custkey, c_name,
           CASE WHEN c_custkey % 10 = 0 THEN c_mktsegment END AS segment
    FROM customer
    """,
    tags=("lake", "S10", "extension"),
)
def q_iceberg_schema_evolution(spark, sf_dir):
    """Add-column schema evolution on the Iceberg layout
    (IcebergTable.append(merge_schema=True)): the base write lacks the
    segment column; an evolved append adds it for a tenth of the
    customers, widening the table schema with a FRESH field id
    (last-column-id advances — the spec's never-reuse invariant,
    asserted in-gate) and zero file rewrites; the snapshot read scans
    with the current schema explicitly so every pre-evolution file
    serves typed NULLs."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable

    c = _t(spark, sf_dir, "customer")
    base = c.filter(F.col("c_custkey") % 10 != 0).select(
        "c_custkey", "c_name"
    )
    evolved = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", "c_name", F.col("c_mktsegment").alias("segment")
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_evo_"))
    t.overwrite(base)
    lcid0 = t._metadata()["last-column-id"]
    t.append(evolved, merge_schema=True)
    assert t._metadata()["last-column-id"] == lcid0 + 1
    return t.read()


@register(
    "delta_merge_into_protocol_table",
    oracle="""
    WITH t AS (
      SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price,
             o_orderstatus AS status
      FROM orders
    ),
    s AS (
      SELECT o_orderkey AS k,
             CAST(o_totalprice AS DOUBLE) AS price,
             'BUMP' AS action FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, 0.0, 'DROP' FROM orders
      WHERE o_orderkey % 5 = 0 AND o_orderkey % 3 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, CAST(o_totalprice AS DOUBLE),
             'NEW' FROM orders WHERE o_orderkey % 11 = 0
    )
    SELECT t.k,
           CASE WHEN s.k IS NOT NULL AND s.action = 'BUMP'
                THEN t.price + s.price ELSE t.price END AS price,
           t.status
    FROM t LEFT JOIN s ON t.k = s.k
    WHERE NOT (s.k IS NOT NULL AND s.action = 'DROP')
    UNION ALL
    SELECT s.k, s.price, CAST(NULL AS VARCHAR) AS status
    FROM s LEFT JOIN t ON s.k = t.k
    WHERE t.k IS NULL
    """,
    tags=("lake", "S11", "extension"),
)
def q_delta_merge_into_protocol_table(spark, sf_dir):
    """MERGE INTO directly on the Delta-protocol table
    (DeltaLogTable.merge_into — the conditional-clause MERGE the
    reference's Delta runtime executes, delta/delta_scd_script.py):
    one source carries update, delete, and insert intents; the matched
    DELETE clause fires first, the matched UPDATE's RHS reads the OLD
    target row plus source columns, unmatched source rows insert with
    absent target columns as typed NULLs, and ONLY files containing a
    matched row are rewritten (Delta's physical strategy). Must equal
    the same MERGE spelled as plain SQL."""
    import tempfile

    from .sources.delta_log import DeltaLogTable
    from .sources import delta_dml  # noqa: F401 — attaches merge_into

    o = _t(spark, sf_dir, "orders")
    target = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    source = (
        o.filter(F.col("o_orderkey") % 3 == 0).select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").cast("double").alias("price"),
            F.lit("BUMP").alias("action"),
        )
        .unionByName(
            o.filter(
                (F.col("o_orderkey") % 5 == 0)
                & (F.col("o_orderkey") % 3 != 0)
            ).select(
                F.col("o_orderkey").alias("k"),
                F.lit(0.0).alias("price"),
                F.lit("DROP").alias("action"),
            )
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 11 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("k"),
                F.col("o_totalprice").cast("double").alias("price"),
                F.lit("NEW").alias("action"),
            )
        )
    )
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_merge_"))
    dt.overwrite(target.repartition(8))
    rep = dt.merge_into(
        source,
        ["k"],
        when_matched_update={"price": "t.price + s.price"},
        when_matched_delete="s.action = 'DROP'",
        insert_unmatched=True,
    )
    assert rep["rows_deleted"] > 0 and rep["rows_inserted"] > 0
    return dt.read()


@register(
    "delta_change_data_feed",
    oracle="""
    WITH t AS (
      SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price
      FROM orders
    )
    SELECT k, price, 'delete' AS change_type,
           CAST(2 AS BIGINT) AS commit_version
    FROM t WHERE k % 7 = 0
    UNION ALL
    SELECT k, price, 'update_preimage', 3
    FROM t WHERE k % 7 <> 0 AND k % 5 = 0
    UNION ALL
    SELECT k, price * 2, 'update_postimage', 3
    FROM t WHERE k % 7 <> 0 AND k % 5 = 0
    """,
    tags=("lake", "S2", "extension"),
)
def q_delta_change_data_feed(spark, sf_dir):
    """Change Data Feed on the Delta-protocol table
    (sources/delta_cdf.py — the readChangeFeed surface the reference's
    Delta runtime exposes): CDF is enabled via SET TBLPROPERTIES
    (delta.enableChangeDataFeed, a metaData commit), a DELETE and an
    UPDATE then write real ``cdc`` change-data actions in their
    commits, and table_changes(2, 3) replays exactly those row-level
    changes — delete rows plus update pre/post images stamped with
    their commit versions. Must equal the change set spelled in plain
    SQL."""
    import tempfile

    from .sources.delta_log import DeltaLogTable
    from .sources import delta_cdf, delta_dml  # noqa: F401

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="delta_cdf_"))
    dt.overwrite(o.repartition(4))                                  # v0
    dt.set_table_properties({"delta.enableChangeDataFeed": "true"})  # v1
    dt.delete("k % 7 = 0")                                           # v2
    dt.update("k % 5 = 0", {"price": "price * 2"})                   # v3
    return dt.table_changes(2, 3).select(
        "k",
        "price",
        F.col("_change_type").alias("change_type"),
        F.col("_commit_version").alias("commit_version"),
    )


@register(
    "iceberg_files_metadata_table",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(*) AS record_count
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("lake", "S2", "extension"),
)
def q_iceberg_files_metadata_table(spark, sf_dir):
    """Iceberg metadata tables (sources/iceberg_inspect.py — the
    SELECT * FROM tbl.files / tbl.snapshots surface the reference's
    iceberg-spark-runtime exposes): orders written identity-partitioned
    by priority, then the FILES inspection table — built purely from
    manifest entries, no data file opened — aggregates record_count per
    partition and must equal counting the actual rows. The snapshots
    table is sanity-asserted in-gate."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable
    from .sources import iceberg_inspect  # noqa: F401 — attaches

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_insp_"))
    t.append(o, partition_by=["o_orderpriority"])
    assert t.inspect_snapshots().count() == 1
    files = t.inspect_files()
    return (
        files.select(
            F.get_json_object(
                F.col("partition"), "$.o_orderpriority"
            ).alias("priority"),
            "record_count",
        )
        .groupBy("priority")
        .agg(F.sum("record_count").alias("record_count"))
    )


@register(
    "iceberg_stream_sink_roundtrip",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_custkey % 3 = 0
    """,
    tags=("lake", "streaming", "extension"),
)
def q_iceberg_stream_sink_roundtrip(spark, sf_dir):
    """Exactly-once streaming sink into the Iceberg layout
    (iceberg_deletes.stream_to_iceberg — the structured-streaming
    ingestion the reference's iceberg-spark-runtime provides): a
    file-source stream lands in the table via foreachBatch appends
    whose snapshot summaries carry (app-id, epoch); the SAME stream is
    then re-run against the SAME checkpoint and the replayed epochs are
    skipped (asserted in-gate — count unchanged), so the final table
    equals the source selection exactly once."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable
    from .sources.iceberg_deletes import stream_to_iceberg

    src_rows = _t(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 3 == 0
    ).select("c_custkey", "c_mktsegment")
    src_dir = tempfile.mkdtemp(prefix="ice_sink_src_") + "/data"
    src_rows.coalesce(2).write.parquet(src_dir)
    sink = tempfile.mkdtemp(prefix="ice_sink_tbl_")
    ckpt = tempfile.mkdtemp(prefix="ice_sink_ckpt_")
    for _ in range(2):  # second run replays the checkpoint: no dups
        q = (
            stream_to_iceberg(
                spark.readStream.schema(
                    "c_custkey bigint, c_mktsegment string"
                ).parquet(src_dir),
                sink, ckpt, app_id="gate",
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    t = IcebergTable(spark, sink)
    n = t.read().count()
    assert n == src_rows.count(), (n, src_rows.count())
    return t.read()


@register(
    "hudi_cow_delete",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, CAST(1 AS INTEGER) AS ver
    FROM customer
    WHERE NOT (c_mktsegment = 'BUILDING' AND c_custkey % 2 = 0)
    """,
    tags=("lake", "S7", "extension"),
)
def q_hudi_cow_delete(spark, sf_dir):
    """DELETE on the Hudi CoW layout (hudi_layout._cow_delete — the
    hard-delete the reference's Hudi runtime runs via upserts of
    deleted payloads): only file groups holding a matching row rewrite
    (blast radius asserted in-gate vs the group count), groups emptied
    entirely publish explicit empty slices, and time travel to the
    pre-delete instant still serves every row."""
    import tempfile

    from .sources.hudi_layout import HudiCowTable

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", F.lit(1).alias("ver")
    )
    t = HudiCowTable(
        spark, tempfile.mkdtemp(prefix="hudi_del_"),
        record_key="c_custkey", precombine_field="ver",
        n_file_groups=4,
    )
    i0 = t.bulk_insert(c)
    n0 = c.count()
    t.delete("c_mktsegment = 'BUILDING' AND c_custkey % 2 = 0")
    assert t.read(instant=i0).count() == n0  # time travel intact
    return t.read().select("c_custkey", "c_name", "c_mktsegment", "ver")


@register(
    "hudi_mor_tombstone_delete",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, CAST(1 AS INTEGER) AS ver
    FROM customer
    WHERE NOT (c_custkey % 7 = 0)
    """,
    tags=("lake", "S7", "extension"),
)
def q_hudi_mor_tombstone_delete(spark, sf_dir):
    """MoR DELETE via log tombstones (hudi_layout._mor_delete —
    Hudi's _hoodie_is_deleted payload flag): matching rows land in log
    files marked deleted with ZERO base rewrites (the read-optimized
    view still serves the pre-delete count, asserted in-gate), and the
    realtime view drops every key whose winning version is a
    tombstone."""
    import tempfile

    from .sources.hudi_layout import HudiMorTable

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", F.lit(1).alias("ver")
    )
    t = HudiMorTable(
        spark, tempfile.mkdtemp(prefix="hudi_ts_"),
        record_key="c_custkey", precombine_field="ver",
        n_file_groups=4,
    )
    t.bulk_insert(c)
    n0 = c.count()
    t.delete("c_custkey % 7 = 0")
    assert t.read_optimized().count() == n0  # _ro stale by design
    return t.read().select("c_custkey", "c_name", "c_mktsegment", "ver")


@register(
    "iceberg_mor_update",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT'
                THEN CAST(o_totalprice * 2 AS DOUBLE)
                ELSE CAST(o_totalprice AS DOUBLE) END AS price,
           o_orderpriority
    FROM orders
    """,
    tags=("lake", "S10", "extension"),
)
def q_iceberg_mor_update(spark, sf_dir):
    """Merge-on-read UPDATE on the Iceberg layout
    (iceberg_deletes._update — Iceberg v2's UPDATE execution): matching
    rows become position deletes AND re-land as fresh data files with
    the SET expression applied against the OLD row, in ONE snapshot;
    every pre-update data file survives untouched (asserted in-gate).
    Result must equal the CASE-expression rewrite in plain SQL."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable
    from .sources import iceberg_deletes  # noqa: F401 — attaches UPDATE

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("price"),
        "o_orderpriority",
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_upd_"))
    t.overwrite(o.repartition(4))
    files0 = {e["data_file"]["file_path"] for e in t._entries()}
    rep = t.update("o_orderpriority = '1-URGENT'", {"price": "price * 2"})
    assert rep["rows_updated"] > 0
    files1 = {e["data_file"]["file_path"] for e in t._entries()}
    assert files0 <= files1  # zero pre-update files rewritten
    return t.read()


@register(
    "iceberg_merge_into_mor",
    oracle="""
    WITH t AS (
      SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price,
             o_orderstatus AS status
      FROM orders
    ),
    s AS (
      SELECT o_orderkey AS k,
             CAST(o_totalprice AS DOUBLE) AS price,
             'BUMP' AS action FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, 0.0, 'DROP' FROM orders
      WHERE o_orderkey % 5 = 0 AND o_orderkey % 3 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, CAST(o_totalprice AS DOUBLE),
             'NEW' FROM orders WHERE o_orderkey % 11 = 0
    )
    SELECT t.k,
           CASE WHEN s.k IS NOT NULL AND s.action = 'BUMP'
                THEN t.price + s.price ELSE t.price END AS price,
           t.status
    FROM t LEFT JOIN s ON t.k = s.k
    WHERE NOT (s.k IS NOT NULL AND s.action = 'DROP')
    UNION ALL
    SELECT s.k, s.price, CAST(NULL AS VARCHAR) AS status
    FROM s LEFT JOIN t ON s.k = t.k
    WHERE t.k IS NULL
    """,
    tags=("lake", "S10", "extension"),
)
def q_iceberg_merge_into_mor(spark, sf_dir):
    """MERGE INTO on the Iceberg layout, merge-on-read
    (iceberg_deletes._merge_into — the statement the reference's
    Iceberg job runs, S10, executed Iceberg-v2-style): matched rows
    become position deletes, matched updates re-land with RHS over the
    OLD row, unmatched source rows insert, all in ONE snapshot with
    zero pre-merge file rewrites (asserted in-gate). Same source shape
    and oracle as the Delta twin delta_merge_into_protocol_table — the
    two engines must agree."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable
    from .sources import iceberg_deletes  # noqa: F401

    o = _t(spark, sf_dir, "orders")
    target = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    source = (
        o.filter(F.col("o_orderkey") % 3 == 0).select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").cast("double").alias("price"),
            F.lit("BUMP").alias("action"),
        )
        .unionByName(
            o.filter(
                (F.col("o_orderkey") % 5 == 0)
                & (F.col("o_orderkey") % 3 != 0)
            ).select(
                F.col("o_orderkey").alias("k"),
                F.lit(0.0).alias("price"),
                F.lit("DROP").alias("action"),
            )
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 11 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("k"),
                F.col("o_totalprice").cast("double").alias("price"),
                F.lit("NEW").alias("action"),
            )
        )
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_mrg_"))
    t.overwrite(target.repartition(8))
    files0 = {e["data_file"]["file_path"] for e in t._entries()}
    rep = t.merge_into(
        source,
        ["k"],
        when_matched_update={"price": "t.price + s.price"},
        when_matched_delete="s.action = 'DROP'",
        insert_unmatched=True,
    )
    assert rep["rows_deleted"] > 0 and rep["rows_inserted"] > 0
    files1 = {e["data_file"]["file_path"] for e in t._entries()}
    assert files0 <= files1  # zero pre-merge rewrites
    return t.read()


@register(
    "iceberg_rewrite_partial",
    oracle="""
    SELECT n_nationkey AS nk, n_name, r_name AS region
    FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE n_nationkey % 7 <> 0
    """,
    tags=("lake", "S14", "extension"),
)
def q_iceberg_rewrite_partial(spark, sf_dir):
    """PARTIAL binpack compaction (r12,
    iceberg_deletes._rewrite_data_files_partial — Iceberg's actual
    RewriteDataFiles contract: file-group selection by partition
    filter + size threshold, never the whole table): per-region
    append chains build small-file debt, a MoR DELETE layers a
    position-delete on top, then
    ``rewrite_data_files(where="region = 'ASIA'")`` rewrites ONLY
    that partition's group with all deletes materialized. In-gate
    pins: one group, every other region's manifest-list rows carried
    verbatim (path-identical), other regions' data files untouched on
    disk, the logical read byte-identical pre/post, the snapshot
    maintenance-stamped (changelogs skip it)."""
    import tempfile

    from .sources import iceberg_deletes  # noqa: F401  (attaches)
    from .sources.avro_io import read_ocf
    from .sources.iceberg_layout import IcebergTable

    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    joined = nat.join(
        reg, nat.n_regionkey == reg.r_regionkey
    ).select(
        F.col("n_nationkey").alias("nk"),
        "n_name",
        F.col("r_name").alias("region"),
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_rwp_"))
    regions = sorted(
        r["region"] for r in joined.select("region").distinct().collect()
    )
    for rname in regions:  # two small files of debt per region
        part = joined.filter(F.col("region") == rname)
        t.append(part.filter("nk % 2 = 0").coalesce(1),
                 partition_by=["region"])
        t.append(part.filter("nk % 2 = 1").coalesce(1),
                 partition_by=["region"])
    t.delete("nk % 7 = 0")  # MoR: pos-delete debt across partitions

    def mlist(tbl):
        md = tbl._metadata()
        snap = next(
            s for s in md["snapshots"]
            if s["snapshot-id"] == md["current-snapshot-id"]
        )
        _, rows = read_ocf(snap["manifest-list"])
        return rows

    expect = t.read()
    expect_rows = sorted(tuple(r) for r in expect.collect())
    other_files = {
        e["data_file"]["file_path"]
        for e in t._entries()
        if e["data_file"]["partition"].get("region") != "ASIA"
    }
    before = {m["manifest_path"] for m in mlist(t)}
    rep = t.rewrite_data_files(where="region = 'ASIA'",
                               min_input_files=2)
    assert rep["groups"] == 1 and rep["rewritten_files"] >= 2
    after_rows = mlist(t)
    # every manifest that held no ASIA file carried verbatim
    carried = before & {m["manifest_path"] for m in after_rows}
    assert len(carried) >= 2 * (len(regions) - 1)
    assert other_files == {
        e["data_file"]["file_path"]
        for e in t._entries()
        if e["data_file"]["partition"].get("region") != "ASIA"
    }
    md = t._metadata()
    head = next(
        s for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    assert head["summary"]["maintenance"] == "rewrite-data-files"
    got = t.read()
    assert sorted(tuple(r) for r in got.collect()) == expect_rows
    return got


@register(
    "delta_uniform_dv_mirror",
    oracle="""
    SELECT c_custkey AS cust_id,
           CAST(c_acctbal AS DOUBLE) AS balance,
           c_mktsegment AS segment
    FROM customer
    WHERE c_custkey % 4 <> 1 AND c_custkey % 10 <> 6
    """,
    tags=("lake", "S9", "extension"),
)
def q_delta_uniform_dv_mirror(spark, sf_dir):
    """UniForm mirrors LIVE deletion vectors (r12,
    uniform._sync_dv_deletes): each sync translates changed Delta DVs
    into Iceberg v2 position-delete parquets (roaring expansion runs
    executor-side) committed in a delete manifest beside the data
    manifest — the Iceberg read of the mirror equals the Delta read
    with zero data files copied or rewritten. The gate layers TWO DV
    delete waves (the second merges into existing per-file bitmaps),
    syncs after each, and returns the ICEBERG-side read; in-gate pins:
    mirror == Delta after both waves, the mirror head is
    format-version 2 with real (file_path, pos) delete files, and no
    Delta data file was rewritten by either wave."""
    import tempfile

    from .sources import delta_dml, uniform  # noqa: F401  (attach)
    from .sources.delta_log import DeltaLogTable
    from .sources.iceberg_layout import IcebergTable

    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_acctbal").cast("double").alias("balance"),
        F.col("c_mktsegment").alias("segment"),
    )
    dt = DeltaLogTable(spark, tempfile.mkdtemp(prefix="uni_dv_"))
    dt.overwrite(cust.repartition(4))
    dt.enable_uniform()
    data_files0 = {
        p for p, _ in dt._replay()[0].items()
    }
    dt.delete("cust_id % 4 = 1", mode="dv")
    assert dt.sync_uniform() is not None
    ice = IcebergTable(spark, dt.location)
    assert sorted(map(tuple, ice.read().collect())) == sorted(
        map(tuple, dt.read().collect())
    )
    dt.delete("cust_id % 10 = 6", mode="dv")
    assert dt.sync_uniform() is not None
    live1, _, _ = dt._replay()
    assert data_files0 == set(live1)  # DV mode: zero files rewritten
    md = ice._metadata()
    assert md["format-version"] == 2
    dels = ice._live_delete_files()
    assert dels and all(d["content"] == 1 for d in dels)
    got = ice.read()
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, dt.read().collect())
    )
    return got


@register(
    "iceberg_changelog_stream_eq_deletes",
    oracle="""
    SELECT c_custkey AS cust_id,
           CAST(c_acctbal AS DOUBLE) AS balance,
           'insert' AS change_type, 1 AS commit_seq
    FROM customer WHERE c_custkey % 3 = 0
    UNION ALL
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE), 'delete', 2
    FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 5 = 0
    UNION ALL
    SELECT c_custkey, -1.0, 'insert', 2
    FROM customer WHERE c_custkey % 5 = 0
    """,
    tags=("lake", "streaming", "S2", "extension"),
)
def q_iceberg_changelog_stream_eq_deletes(spark, sf_dir):
    """STREAMING changelog over EQUALITY deletes (r12,
    iceberg_changelog_source — the refusal this round removed): an
    ``upsert_by_key`` commit (eq-delete + data files in ONE snapshot,
    the streaming-CDC write shape real Flink/Iceberg sinks emit)
    streams as delete events for the keys' PRIOR rows plus insert
    events for the batch's own rows — key sets ride the partition
    descriptors and apply as vectorized null-safe merges in the Arrow
    path; the batch's own files are exempt by the sequence-number
    rule. Checkpointed two-batch tail; events match batch
    ``changes()`` by construction (pinned in
    tests/test_iceberg_changelog_source.py)."""
    import tempfile

    from .sources import iceberg_deletes  # noqa: F401  (attaches)
    from .sources.iceberg_changelog_source import (
        register_iceberglog_source,
    )
    from .sources.iceberg_layout import IcebergTable

    register_iceberglog_source(spark)
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_acctbal").cast("double").alias("balance"),
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="icl_eq_"))
    s1 = t.append(cust.filter("cust_id % 3 = 0"))
    out = tempfile.mkdtemp(prefix="icl_eq_sink_")
    ck = tempfile.mkdtemp(prefix="icl_eq_ck_")

    def run():
        q = (
            spark.readStream.format("iceberglog")
            .option("location", t.location)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()  # batch 1: s1's inserts
    up = cust.filter("cust_id % 5 = 0").withColumn(
        "balance", F.lit(-1.0)
    )
    s2 = t.upsert_by_key(up, ["cust_id"])["snapshot_id"]
    run()  # batch 2: the upsert's delete + insert events
    sunk = spark.read.schema(
        "cust_id bigint, balance double, _change_type string, "
        "_commit_snapshot_id long"
    ).parquet(out)
    return sunk.select(
        "cust_id",
        "balance",
        F.col("_change_type").alias("change_type"),
        F.when(F.col("_commit_snapshot_id") == s1, F.lit(1))
        .otherwise(F.lit(2))
        .cast("int")
        .alias("commit_seq"),
    )


@register(
    "iceberg_rewrite_position_deletes",
    oracle="""
    SELECT n_nationkey AS nk, n_name, r_name AS region
    FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE n_nationkey % 5 <> 0
    """,
    tags=("lake", "S14", "extension"),
)
def q_iceberg_rewrite_position_deletes(spark, sf_dir):
    """rewrite_position_deletes maintenance (r12,
    iceberg_deletes._rewrite_position_deletes — the spec's cleanup op
    for position-delete debt): dangling pairs left by a partial
    compaction drop, surviving pairs merge spec-sorted into fewer
    files, provably-inapplicable equality-delete files drop whole,
    and every DATA manifest-list row carries verbatim. In-gate pins:
    pair counts shrink to exactly the surviving partition's, the
    maintenance stamp is present, and the logical read is
    byte-identical before and after both maintenance passes."""
    import tempfile

    from .sources import iceberg_deletes  # noqa: F401  (attaches)
    from .sources.iceberg_layout import IcebergTable

    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    joined = nat.join(
        reg, nat.n_regionkey == reg.r_regionkey
    ).select(
        F.col("n_nationkey").alias("nk"),
        "n_name",
        F.col("r_name").alias("region"),
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_rpd_"))
    regions = sorted(
        r["region"]
        for r in joined.select("region").distinct().collect()
    )
    for rname in regions:
        part = joined.filter(F.col("region") == rname)
        t.append(part.filter("nk % 2 = 0").coalesce(1),
                 partition_by=["region"])
        t.append(part.filter("nk % 2 = 1").coalesce(1),
                 partition_by=["region"])
    t.delete("nk % 5 = 0")
    expect_rows = sorted(tuple(r) for r in t.read().collect())
    t.rewrite_data_files(where="region = 'ASIA'", min_input_files=2)
    rep = t.rewrite_position_deletes()
    # exactly ASIA's pairs dangle after the partial compaction
    n_asia_deleted = joined.filter(
        (F.col("region") == "ASIA") & (F.col("nk") % 5 == 0)
    ).count()
    assert rep["pairs_after"] == rep["pairs_before"] - n_asia_deleted
    md = t._metadata()
    head = next(
        s for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    assert head["summary"]["maintenance"] == "rewrite-position-deletes"
    got = t.read()
    assert sorted(tuple(r) for r in got.collect()) == expect_rows
    return got


@register(
    "iceberg_add_files",
    oracle="""
    SELECT o_orderkey AS k,
           CAST(o_totalprice AS DOUBLE) AS price,
           o_orderstatus AS status
    FROM orders
    """,
    tags=("lake", "S12", "extension"),
)
def q_iceberg_add_files(spark, sf_dir):
    """CALL system.add_files (r12, iceberg_layout._add_files): adopt
    foreign parquet files into an existing Iceberg table BY REFERENCE
    — zero bytes copied, one manifest-reuse append commit, footer
    column bounds collected so data skipping works on adopted files.
    The gate seeds the table with the even order keys, writes the odd
    keys as a plain parquet directory, adopts it, and returns the
    merged read; in-gate pins: adopted entries reference the foreign
    inodes in place, duplicate adoption refuses."""
    import tempfile

    from .sources.iceberg_layout import IcebergTable

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    t = IcebergTable(spark, tempfile.mkdtemp(prefix="ice_addf_"))
    t.overwrite(o.filter("k % 2 = 0").repartition(4))
    foreign = tempfile.mkdtemp(prefix="ice_foreign_")
    o.filter("k % 2 = 1").repartition(2).write.mode(
        "overwrite"
    ).parquet(foreign)
    rep = t.add_files(foreign)
    assert rep["added_files"] >= 1
    import os as _os

    foreign_inodes = {
        _os.stat(_os.path.join(r, f)).st_ino
        for r, _, fs in _os.walk(foreign)
        for f in fs
        if f.endswith(".parquet")
    }
    adopted = {
        _os.stat(e["data_file"]["file_path"]).st_ino
        for e in t._entries()
        if foreign in e["data_file"]["file_path"]
    }
    assert adopted == foreign_inodes  # zero copy, in place
    try:
        t.add_files(foreign)
        raise AssertionError("duplicate adoption must refuse")
    except ValueError:
        pass
    return t.read()


@register(
    "delta_v2_checkpoint",
    oracle="""
    SELECT c_custkey AS cust_id,
           CAST(c_acctbal AS DOUBLE) AS balance
    FROM customer
    WHERE c_custkey % 6 <> 2
    """,
    tags=("lake", "S9", "extension"),
)
def q_delta_v2_checkpoint(spark, sf_dir):
    """V2 CHECKPOINTS (r12, delta_log._write_v2_checkpoint — the
    protocol's v2Checkpoint table feature): the checkpoint's add
    actions shard into content-addressed SIDECAR parquets under
    _delta_log/_sidecars/, the top file carries protocol/metaData/txn
    plus sidecar pointers, and re-checkpointing after a small commit
    rewrites only the churned buckets (bucket-count hysteresis keeps
    the path-hash sharding stable) — O(changed) checkpoint writes
    instead of the classic single file's O(live) rewrite. The gate
    checkpoints, EXPIRES the JSON log (clean_log), layers a DV delete
    on top, re-checkpoints and expires again; the returned read can
    only come from v2-checkpoint-seeded replay. In-gate pins: the
    bucket sharding held across checkpoints (hysteresis), the reader
    feature is stamped, replay after each clean is exact; per-bucket
    sidecar REUSE is pinned in tests/test_delta_log.py where the
    commit is bucket-local."""
    import json as _json
    import os as _os
    import tempfile

    from .sources import delta_dml  # noqa: F401  (attaches delete)
    from .sources.delta_log import DeltaLogTable

    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_acctbal").cast("double").alias("balance"),
    )
    t = DeltaLogTable(spark, tempfile.mkdtemp(prefix="v2ckpt_"))
    t.overwrite(cust.repartition(8))
    t.write_checkpoint(v2=True, sidecar_target_adds=2)
    lc1 = _json.load(
        open(_os.path.join(t.location, "_delta_log",
                           "_last_checkpoint"))
    )
    assert lc1["v2"] and lc1["sidecars"] >= 2
    t.clean_log()
    assert t.read().count() == cust.count()  # v2-seeded replay
    t.delete("cust_id % 6 = 2", mode="dv")
    t.write_checkpoint(v2=True, sidecar_target_adds=2)
    lc2 = _json.load(
        open(_os.path.join(t.location, "_delta_log",
                           "_last_checkpoint"))
    )
    assert lc2["buckets"] == lc1["buckets"]
    t.clean_log()
    assert "v2Checkpoint" in (
        t.current_protocol().get("readerFeatures") or []
    )
    return t.read()


@register(
    "hudi_cdc_stream_tail",
    oracle="""
    SELECT c_custkey AS cust_id, CAST(c_acctbal AS DOUBLE) AS balance,
           'insert' AS change_type, 1 AS commit_seq
    FROM customer
    UNION ALL
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE),
           'update_before', 2
    FROM customer WHERE c_custkey % 10 = 3
    UNION ALL
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE) + 1000.0,
           'update_after', 2
    FROM customer WHERE c_custkey % 10 = 3
    UNION ALL
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE), 'delete', 2
    FROM customer WHERE c_custkey % 10 = 7
    """,
    tags=("lake", "streaming", "S7", "extension"),
)
def q_hudi_cdc_stream_tail(spark, sf_dir):
    """STREAMING Hudi persisted CDC (r12,
    sources/hudi_cdc_source.py — ``readStream.format("hudicdc")``),
    the third streaming change-feed leg completing the symmetric trio
    beside "deltacdf" and "iceberglog": offsets are timeline instants
    (exactly-once via the streaming offset log), each micro-batch is
    a pure read of the commits' ``cdc/<instant>/`` files — one Arrow
    partition per change parquet, zero state derivation. The gate
    streams the bulk insert, then an upsert + DELETE wave through a
    checkpointed second batch; parity with batch cdc_scan and the
    unpersisted-commit refusal are pinned in
    tests/test_hudi_cdc_source.py."""
    import tempfile

    from .sources import hudi_cdc  # noqa: F401  (attaches)
    from .sources.hudi_cdc_source import register_hudicdc_source
    from .sources.hudi_layout import HudiCowTable

    register_hudicdc_source(spark)
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_acctbal").cast("double").alias("balance"),
    )
    t = HudiCowTable(
        spark, tempfile.mkdtemp(prefix="hudi_cdcs_"),
        record_key="cust_id", precombine_field="balance",
        cdc_enabled=True,
    )
    i1 = t.bulk_insert(cust)
    out = tempfile.mkdtemp(prefix="hcdc_sink_")
    ck = tempfile.mkdtemp(prefix="hcdc_ck_")

    def run():
        q = (
            spark.readStream.format("hudicdc")
            .option("location", t.location)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()  # batch 1: the bulk insert's insert events
    t.upsert(
        cust.filter("cust_id % 10 = 3").withColumn(
            "balance", F.col("balance") + 1000.0
        )
    )
    t.delete("cust_id % 10 = 7")
    run()  # batch 2: the checkpointed tail
    sunk = spark.read.schema(
        "cust_id bigint, balance double, _change_type string, "
        "_commit_instant string"
    ).parquet(out)
    return sunk.select(
        "cust_id",
        "balance",
        F.col("_change_type").alias("change_type"),
        F.when(F.col("_commit_instant") == i1, F.lit(1))
        .otherwise(F.lit(2))
        .cast("int")
        .alias("commit_seq"),
    )


@register(
    "hudi_point_lookup_by_key",
    oracle="""
    SELECT c_custkey AS cust_id,
           CAST(c_acctbal AS DOUBLE) AS balance
    FROM customer WHERE c_custkey IN (7, 20, 33)
    """,
    tags=("lake", "S7", "extension"),
)
def q_hudi_point_lookup_by_key(spark, sf_dir):
    """Hudi read-side point lookup (r12,
    hudi_layout.read_by_key): each key routes to its hash file group
    HOST-SIDE (the writer's own md5 assignment — no Spark job to
    plan), groups whose key-range + bloom index prove absence drop,
    and the plan lists one slice per surviving group — O(keys) file
    reads on any table size, the write-side tagging index serving
    reads. In-gate pins: the lookup scans at most as many files as
    distinct routed groups (never the table), and an absent key plans
    zero files."""
    import tempfile

    from .sources.hudi_layout import HudiCowTable

    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_acctbal").cast("double").alias("balance"),
    )
    t = HudiCowTable(
        spark, tempfile.mkdtemp(prefix="hudi_pk_"),
        record_key="cust_id", precombine_field="balance",
        n_file_groups=8,
    )
    t.bulk_insert(cust)
    assert len(set(t.read().inputFiles())) == 8
    keys = [7, 20, 33]
    got = t.read_by_key(keys)
    routed = {t._host_fg(k) for k in keys}
    assert len(set(got.inputFiles())) <= len(routed) < 8
    missing = t.read_by_key([10_000_000])
    assert missing.inputFiles() == [] and missing.count() == 0
    return got.select("cust_id", "balance")

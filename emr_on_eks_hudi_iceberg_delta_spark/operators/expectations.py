"""Data-quality expectations over a DataFrame — the DLT / dbt-tests /
Great-Expectations shape: declare a batch of named boolean rules, get
(a) a one-pass per-rule violation report and (b) a valid/quarantine row
split annotated with which rules each quarantined row failed.

Relation to the table-level CHECK constraints in ``sources/tables.py``
(which REJECT a whole commit on any violating row): expectations are the
tolerant flavor a 100 TB ingestion pipeline actually runs — land the
valid rows, quarantine the rest with a reason, and alert on the report.

Scale contract:
* ``expectations_report`` — every rule folds to one conditional count
  inside a SINGLE aggregate over one scan (map-side partials, one
  one-row exchange); the per-rule output is built driver-side from that
  one row. Adding a rule adds a column to the partial, not a pass.
* ``quarantine_split`` — pure per-row projection (no shuffle): the
  failed-rule list is ``concat_ws`` over per-rule ``when`` columns
  (concat_ws skips NULLs, so it is exactly the ordered list of failed
  rule names). The two returned frames share one lineage; persist the
  input when materializing both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_col(rule: Column | str) -> Column:
    return F.expr(rule) if isinstance(rule, str) else rule


def expectations_report(
    df: DataFrame, rules: dict[str, Column | str]
) -> DataFrame:
    """Per-rule pass/fail counts in ONE aggregation pass.

    Returns ``(rule, n_rows, n_pass, n_fail, fail_rate)`` with one row
    per rule, in rule-declaration order (``rank`` column carries it).
    NULL rule results count as failures (a rule that cannot evaluate did
    not pass — the SQL CHECK convention is the opposite, which is why
    constraints and expectations are separate operators).
    """
    if not rules:
        raise ValueError("expectations_report needs at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, rule in rules.items():
        aggs.append(
            F.sum(
                F.when(F.coalesce(_as_col(rule), F.lit(False)), 1).otherwise(0)
            ).alias(f"__pass_{name}")
        )
    totals = df.agg(*aggs)
    per_rule = totals.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("rank"),
                        F.lit(name).alias("rule"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__pass_{name}").alias("n_pass"),
                    )
                    for i, name in enumerate(rules)
                ]
            )
        ).alias("r")
    ).select("r.rank", "r.rule", "r.n_rows", "r.n_pass")
    return per_rule.select(
        "rank",
        "rule",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_pass").cast("bigint").alias("n_pass"),
        (F.col("n_rows") - F.col("n_pass")).cast("bigint").alias("n_fail"),
        (
            (F.col("n_rows") - F.col("n_pass")).cast("double")
            / F.col("n_rows").cast("double")
        ).alias("fail_rate"),
    )


def with_expectations(
    df: DataFrame, rules: dict[str, Column | str]
) -> DataFrame:
    """Tag every row with ``failed_rules`` — the comma-joined names of
    the rules it failed, in declaration order ('' = all passed; NULL
    evaluations fail). A stateless per-row projection, so it composes
    into Structured Streaming pipelines unchanged (the streaming
    ingestion gate) as well as the batch split below."""
    if not rules:
        raise ValueError("with_expectations needs at least one rule")
    failed = F.concat_ws(
        ",",
        *[
            F.when(
                ~F.coalesce(_as_col(rule), F.lit(False)), F.lit(name)
            )
            for name, rule in rules.items()
        ],
    )
    return df.withColumn("failed_rules", failed)


def quarantine_split(
    df: DataFrame, rules: dict[str, Column | str]
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (valid, quarantined): a row is quarantined iff
    it fails ANY rule (NULL = fail, matching ``expectations_report``).
    The quarantine frame gains ``failed_rules`` — the comma-joined rule
    names the row failed, in declaration order — the reason column a
    quarantine table needs for triage and later re-ingestion.
    """
    tagged = with_expectations(df, rules)
    valid = tagged.filter(F.col("failed_rules") == "").drop("failed_rules")
    quarantined = tagged.filter(F.col("failed_rules") != "")
    return valid, quarantined


class ExpectationFailure(ValueError):
    """Raised by ``expect_or_fail`` when any rule has a violating row."""


def expect_or_fail(
    df: DataFrame, rules: dict[str, Column | str]
) -> DataFrame:
    """DLT's ``expect_or_fail`` flavor, completing the triad (``warn`` =
    ``expectations_report`` alone, ``drop`` = ``quarantine_split``):
    evaluate the report and RAISE on the first rule with violations,
    naming every failing rule and its counts — the mode for invariants
    where landing any bad row is worse than halting the pipeline.
    Returns ``df`` unchanged when all rules pass, so it chains inline:
    ``expect_or_fail(batch, rules).write...``. One aggregation pass, as
    the report."""
    report = expectations_report(df, rules).collect()
    bad = [r for r in report if r["n_fail"] > 0]
    if bad:
        detail = ", ".join(
            f"{r['rule']}: {r['n_fail']}/{r['n_rows']} rows" for r in bad
        )
        raise ExpectationFailure(f"expectations violated — {detail}")
    return df

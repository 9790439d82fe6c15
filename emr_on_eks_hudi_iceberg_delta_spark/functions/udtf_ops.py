"""Python user-defined table functions (the Spark 4 UDTF API surface).

UDTFs are the table-valued cousin of UDFs: ``eval`` yields zero or more
output rows per input row, and the planner runs them as a lateral join.
Like row-at-a-time UDFs they are the SLOW path — everything here has a
JVM-native equivalent (``posexplode(split(...))``) that production
pipelines should prefer, and the tests pin row-for-row parity between the
two. The UDTF exists because the API family is part of the engine's
public surface: a user porting a UDTF-based pipeline needs the
registration + lateral-join plumbing to exist and be tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="sent_id int, sentence string")
class SentenceSplit:
    """Emit one row per '. '-delimited sentence of the input text,
    keeping each sentence's original segment index (blank segments are
    skipped but do not renumber the rest — deterministic, so the SQL
    replay agrees)."""

    def eval(self, text: str):  # noqa: D102
        for i, seg in enumerate((text or "").split(". ")):
            if seg.strip():
                yield i, seg


def register_sentence_split(spark: SparkSession) -> None:
    spark.udtf.register("sentence_split", SentenceSplit)


def split_sentences_udtf(
    spark: SparkSession,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Lateral-join the ``SentenceSplit`` UDTF against ``df`` — one row
    per (document, sentence)."""
    register_sentence_split(spark)
    df.createOrReplaceTempView("__udtf_input")
    return spark.sql(
        f"SELECT d.{id_col}, s.sent_id, s.sentence "
        f"FROM __udtf_input d, LATERAL sentence_split(d.{text_col}) s"
    )


def split_sentences_native(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The JVM-native twin (posexplode over split) — the production path;
    must match the UDTF row-for-row."""
    return (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), r"\. ")).alias(
                "sent_id", "sentence"
            ),
        )
        .filter(F.trim("sentence") != "")
        .select(F.col(id_col), F.col("sent_id").cast("int"), "sentence")
    )

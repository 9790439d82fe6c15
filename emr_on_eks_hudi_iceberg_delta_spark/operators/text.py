"""Text-analysis operators for training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs. Hashing goes through md5 so every
operator carries an exact cross-engine oracle (functions/hashing.py).

Scale notes: all operators here are embarrassingly parallel per-row maps —
no shuffle at all; they run at scan speed and scale linearly to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64

# BPE-ish token pattern: letter runs, digit runs, single punctuation —
# the shape of a byte-pair pre-tokenizer split (valid in both Java regex
# and RE2 so Spark and DuckDB agree).
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# language -> distinctive stopwords for the n-gram-free heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "nicht"),
    "en": ("the", "a", "of", "and"),
    "es": ("el", "los", "que", "y"),
    "fr": ("le", "les", "et", "une"),
    "zh": ("de5", "shi4", "le5", "bu4"),  # pinyin-romanized placeholders
}


def tokens_expr(text_col: str = "text") -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: lengths, token stats, punctuation ratio,
    stopword density — the standard pre-training quality filters."""
    toks = tokens_expr(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col)).cast("bigint")
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]")).cast("bigint")
    n_stop = F.regexp_count(F.col(text_col), F.lit(r"\b(the|a|of|and|in|to)\b")).cast(
        "bigint"
    )
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_tokens.cast("bigint"))
        .withColumn(
            "avg_token_len",
            F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(
                F.lit(None).cast("double")
            ),
        )
        .withColumn("punct_ratio", n_punct / n_chars)
        .withColumn("stopword_ratio", n_stop / n_tokens)
        .withColumn(
            "quality_ok",
            ((n_tokens >= 5) & (n_chars >= 20) & (n_punct / n_chars < 0.3)).cast("int"),
        )
    )


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways: whitespace tokens and BPE-ish regex tokens
    (the pre-tokenizer's upper bound on BPE token count)."""
    return df.withColumn(
        "ws_tokens", F.size(tokens_expr(text_col)).cast("bigint")
    ).withColumn(
        "bpe_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_PATTERN), F.lit(0))).cast(
            "bigint"
        ),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: per-language distinctive-stopword hit counts,
    argmax with fixed tie-break order (sorted language code). Deterministic
    and SQL-expressible — not a production model, but the right plumbing
    shape (pure column expressions, zero shuffle)."""
    scores = {}
    for lang, words in LANG_STOPWORDS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        scores[lang] = F.regexp_count(F.col(text_col), F.lit(pat))
        df = df.withColumn(f"score_{lang}", scores[lang].cast("bigint"))
    langs = sorted(LANG_STOPWORDS)  # tie-break: first lexicographic max
    pred = None
    for lang in langs:
        cond = F.lit(True)
        for other in langs:
            if other != lang:
                op = (
                    scores[lang] >= scores[other]
                    if langs.index(other) > langs.index(lang)
                    else scores[lang] > scores[other]
                )
                cond = cond & op
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return df.withColumn("predicted_lang", F.coalesce(pred, F.lit(langs[0])))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 200,
    stride: int = 150,
) -> DataFrame:
    """Split documents into overlapping character chunks (chunk_size window,
    stride step) — the context-window chunking step before embedding or
    tokenization. Pure built-ins: sequence + posexplode stays in codegen and
    multiplies rows ~len/stride×, which is why stride is a parameter — at
    100 TB you pick stride == chunk_size (no overlap) unless retrieval
    recall demands it. One row per chunk; chunk 0 starts at offset 1."""
    starts = F.expr(
        f"sequence(0, cast(floor((greatest(length({text_col}), 1) - 1) / {stride}) as int))"
    )
    return df.select(
        "*", F.posexplode(starts).alias("chunk_idx", "__start")
    ).select(
        df["*"],
        F.col("chunk_idx").cast("int").alias("chunk_id"),
        F.expr(f"substr({text_col}, 1 + chunk_idx * {stride}, {chunk_size})").alias(
            "chunk"
        ),
    ).drop("chunk_idx")


def pack_documents(
    df: DataFrame,
    size_col: str,
    capacity: int,
    partition_col: str,
    order_col: str,
) -> DataFrame:
    """Assign documents to fixed-capacity sequential bins (~capacity units
    per bin, per partition) — the sequence-packing step that batches
    variable-length documents into training context windows. Bin id =
    exclusive-prefix-sum(size) / capacity: a single window cumsum, one
    shuffle on the partition key, deterministic given the ordering. (True
    optimal bin packing is inherently sequential; fixed-capacity cumsum
    binning is the scalable approximation every large pipeline uses.)"""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.withColumn("bin", F.floor(before / F.lit(capacity)).cast("bigint"))


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 1,
    persist_tf: bool = False,
) -> DataFrame:
    """Per-document top-k terms by TF-IDF — the corpus-level keyword/
    topic-signal extraction step of a training-data pipeline.

    IDF uses the raw smoothed ratio ``(N + 1) / (df + 1)`` rather than its
    log: log() is not correctly-rounded and differs across libm
    implementations, while +, * and / are IEEE-exact — so the score is
    bit-identical cross-engine (same ranking either way: log is monotonic).

    Scale: term-frequency aggregates shuffle on (doc, term) with map-side
    partial combine; document frequency is a second aggregate over the
    (already-collapsed) tf rows; the vocabulary (df table) and the one-row
    corpus count broadcast back — no re-shuffle of the big side. Top-k is
    one window shuffle on the document id. Ties break alphabetically, so
    results are deterministic.

    Deliberate trade: in one lazy plan the tf subtree is evaluated twice
    (once as the join probe, once inside the vocabulary derivation) —
    Catalyst does not reuse the exchange across the differing aggregates.
    The skew-safe alternative (count() window over the term partition)
    would put every (doc, hot-term) row in one partition, which is worse at
    corpus scale. ``persist_tf=True`` caches the tf relation so both
    aggregates read one materialization (both plan references share the
    same InMemoryRelation; computed once, MEMORY_AND_DISK so wide corpora
    spill instead of OOMing) — the production setting; the default stays
    False so the single-pass oracle-checked plan is unchanged.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    if persist_tf:
        from pyspark import StorageLevel

        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("__n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * ((F.col("__n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "term_rank")
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Within-document repetition ratio: the fraction of duplicate token
    ``shingle_n``-grams (Gopher/C4-style quality filter — boilerplate and
    looping generations score high). Pure per-row column expressions
    (shingle + array_distinct), zero shuffle, scan-speed at any scale.
    Documents with fewer than ``shingle_n`` tokens are dropped, matching
    the MinHash shingle domain."""
    from ..functions.hashing import shingle_expr

    out = (
        df.withColumn("__t", tokens_expr(text_col))
        .filter(F.size("__t") >= shingle_n)
        .withColumn("__s", shingle_expr("__t", shingle_n))
    )
    n_sh = F.size("__s").cast("bigint")
    n_uniq = F.size(F.array_distinct("__s")).cast("bigint")
    return out.select(
        F.col(id_col),
        n_sh.alias("n_shingles"),
        n_uniq.alias("n_distinct"),
        (F.lit(1.0) - n_uniq.cast("double") / n_sh).alias("dup_ratio"),
    )


def contamination_overlap(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: for every training document, the fraction
    of its distinct token ``shingle_n``-grams that appear anywhere in the
    benchmark set — the standard eval-leakage check run before training.

    Scale: the benchmark shingle set is tiny next to the corpus (evals are
    thousands of documents, the corpus is billions) — it is deduped and
    broadcast, so the corpus side is a single scan + one aggregate shuffle
    on the document id; no corpus-vs-corpus join ever happens.
    """
    from ..functions.hashing import shingle_expr

    def distinct_shingles(d: DataFrame) -> DataFrame:
        return (
            d.withColumn("__t", tokens_expr(text_col))
            .filter(F.size("__t") >= shingle_n)
            .select(
                F.col(id_col),
                F.explode(F.array_distinct(shingle_expr("__t", shingle_n))).alias(
                    "sh"
                ),
            )
        )

    doc_sh = distinct_shingles(df)
    bench_sh = (
        distinct_shingles(benchmark).select("sh").distinct().withColumn(
            "__hit", F.lit(1)
        )
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), on="sh", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_contaminated"),
        )
        .withColumn(
            "contamination",
            F.col("n_contaminated").cast("double") / F.col("n_shingles"),
        )
    )


def remove_repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 4,
    max_docs: int = 2,
    persist_spans: bool = False,
) -> DataFrame:
    """Corpus-level repeated-span removal — the scalable approximation of
    exact-substring deduplication (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): boilerplate spans that recur across
    many documents (headers, license blocks, templates) are cut from every
    document while the surrounding unique text is kept.

    Each document is segmented into non-overlapping ``span_tokens``-token
    spans (position-tagged so order survives the shuffle); a corpus-wide
    aggregate counts how many DISTINCT documents each span occurs in; spans
    present in more than ``max_docs`` documents are dropped; the surviving
    spans are reassembled in original order. Documents whose every span was
    boilerplate come back with empty ``cleaned_text`` (not silently lost).

    Scale: two shuffles on the span key (distinct + count) and one back on
    the document id for reassembly — all key-partitioned, nothing collected
    to the driver. The span-frequency table is NOT force-broadcast (it is
    corpus-sized); the spans↔frequency join is a plain shuffle join on the
    span hash (AQE may still broadcast it at small scale). The
    window-over-span alternative would put every copy of a hot boilerplate
    span in one partition — exactly the skew this shape avoids. Per-doc
    span totals come straight off the base scan (``ceil(size/span_tokens)``)
    — no third explode of the corpus. The span relation is referenced twice
    (frequency + reassembly); ``persist_spans=True`` caches it so the
    corpus is tokenized once (MEMORY_AND_DISK — spills, never OOMs) — the
    production setting, left off by default so the oracle-checked plan is
    the pure single-pass one. True suffix-array substring dedup is
    inherently sequential; fixed-width span counting is the standard
    distributed approximation.

    Returns ``(id_col, cleaned_text, n_spans, n_kept)``.
    """
    base = df.select(F.col(id_col), tokens_expr(text_col).alias("__toks")).withColumn(
        "__nsp",
        F.ceil(F.size("__toks") / F.lit(span_tokens)).cast("int"),
    )
    spans = base.filter(F.col("__nsp") > 0).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("__nsp") - 1),
                lambda i: F.array_join(
                    F.slice("__toks", i * span_tokens + 1, span_tokens), " "
                ),
            )
        ).alias("pos", "span"),
    )
    if persist_spans:
        from pyspark import StorageLevel

        spans = spans.persist(StorageLevel.MEMORY_AND_DISK)
    freq = (
        spans.select("span", id_col)
        .distinct()
        .groupBy("span")
        .agg(F.count(F.lit(1)).alias("span_docs"))
    )
    kept = spans.join(freq, on="span").filter(F.col("span_docs") <= max_docs)
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("span")))),
                lambda s: s["span"],
            ),
            " ",
        ).alias("cleaned_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = base.filter(F.col("__nsp") > 0).select(
        F.col(id_col), F.col("__nsp").cast("bigint").alias("n_spans")
    )
    return totals.join(rebuilt, on=id_col, how="left").select(
        F.col(id_col),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        F.col("n_spans"),
        F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint")).alias("n_kept"),
    )


def normalized_text_expr(text_col: str = "text") -> Column:
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: md5 of normalized text (exact) and a
    min-shingle rolling fingerprint (min 64-bit hash over character
    5-grams — the 1-min-sketch special case of winnowing)."""
    norm = normalized_text_expr(text_col)
    df = df.withColumn("__norm", norm)
    rolling = F.array_min(
        F.expr(
            "transform(sequence(1, length(__norm) - 4), "
            "i -> cast(conv(substr(md5(substr(__norm, i, 5)), 1, 15), 16, 10) as bigint))"
        )
    )
    return (
        df.withColumn("content_fingerprint", F.md5(F.col("__norm")))
        .withColumn(
            "rolling_fingerprint",
            F.when(F.length("__norm") >= 5, rolling).otherwise(F.lit(None).cast("bigint")),
        )
        .drop("__norm")
    )


def slice_token_divergence(
    df: DataFrame,
    slice_col: str = "source",
    text_col: str = "text",
    persist: bool = False,
) -> DataFrame:
    """Total-variation distance between each corpus slice's unigram
    distribution and the whole corpus — the drift/imbalance check a
    training-data pipeline runs when mixing sources (is slice X's token
    mix representative?). TVD = 0.5 * sum_t |p_slice(t) - p_corpus(t)|,
    over the full corpus vocabulary (tokens absent from the slice count
    at p_slice = 0).

    Exactness design: probabilities are NEVER materialized as floats.
    With c_s = slice count of a token, T_s = slice total, c_g = corpus
    count, T_g = corpus total, each |p_s - p_g| term is
    |c_s*T_g - c_g*T_s| / (T_s*T_g) — the numerators are exact
    DECIMAL(38,0) products summed exactly (BIGINT would wrap silently in
    non-ANSI Spark at 100 TB corpus scale, where T_g ~ 1e13 makes
    c_s*T_g exceed 2^63), and only ONE final double division happens
    per slice, so Spark and any ANSI engine agree bit-for-bit (the same
    decimal-accumulate-then-cast convention as queries._dsum).

    Scale: ONE token-level hash aggregate (slice x token) is the only
    heavy operation; everything else is windows and rollups OVER that
    already-aggregated (slices x vocab)-sized relation. Tokens a slice is
    missing never materialize as grid rows — their contribution collapses
    algebraically to the closed form t_s * (t_g - sum of c_g over the
    slice's PRESENT tokens), since |0*t_g - c_g*t_s| = c_g*t_s.
    ``persist=True`` caches the (slice, token) counts so the derived
    rollup branch does not recompute the explode (same knob as
    ``tfidf_top_terms(persist_tf=...)``).
    """
    tok = df.select(
        F.col(slice_col).alias("slice"),
        F.explode(tokens_expr(text_col)).alias("tok"),
    )
    st = tok.groupBy("slice", "tok").agg(F.count(F.lit(1)).alias("c_s"))
    if persist:
        st = st.persist()
    from pyspark.sql import Window

    w_tok = Window.partitionBy("tok")
    w_slice = Window.partitionBy("slice")
    en = st.withColumn("c_g", F.sum("c_s").over(w_tok)).withColumn(
        "t_s", F.sum("c_s").over(w_slice)
    )
    # corpus total: rollup of the slices-sized per-slice totals (never a
    # single-partition global window over row data)
    t_g = (
        st.groupBy("slice")
        .agg(F.sum("c_s").alias("__t"))
        .agg(F.sum("__t").alias("t_g"))
    )
    dec = "decimal(38,0)"
    num_present = F.abs(
        F.col("c_s").cast(dec) * F.col("t_g")
        - F.col("c_g").cast(dec) * F.col("t_s")
    )
    per_slice = (
        en.crossJoin(F.broadcast(t_g))
        .withColumn("__num", num_present)
        .groupBy("slice", "t_s", "t_g")
        .agg(
            F.sum("__num").alias("__present"),
            F.sum("c_g").alias("__cg_present"),
        )
    )
    total = F.col("__present") + F.col("t_s").cast(dec) * (
        F.col("t_g") - F.col("__cg_present")
    )
    return per_slice.select(
        "slice",
        F.col("t_s").alias("n_tokens"),
        (
            total.cast("double")
            / (
                F.lit(2) * F.col("t_s").cast(dec) * F.col("t_g")
            ).cast("double")
        ).alias("tv_distance"),
    )


def with_commonness_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = False,
) -> DataFrame:
    """Per-document commonness score: the mean document-frequency of the
    document's tokens, normalized by corpus size — a log-free exact proxy
    for unigram-LM "perplexity" quality filters (rare-token-heavy docs
    score low, boilerplate scores high). score = sum_t df(t) /
    (n_tokens * n_docs), summing over the doc's tokens WITH multiplicity.

    Exactness: tf*df products and the n_tokens*n_docs denominator are
    accumulated as DECIMAL(38,0) (BIGINT wraps silently in non-ANSI Spark
    once corpus-scale counts multiply past 2^63); the single closing
    division of two exact integers is one IEEE double op — bit-identical
    across engines (same convention as slice_token_divergence).

    Scale: ONE token-level hash aggregate — per-document term frequencies
    (doc, token, tf) — is the only pass over exploded tokens; document
    frequency is a vocab-sized rollup OF that relation (count of docs per
    token), joined back broadcast. sum_t df(t) over tokens with
    multiplicity = sum over distinct doc terms of tf * df. In one lazy
    plan the tf relation is referenced twice (document-frequency
    derivation + scoring probe); ``persist=True`` caches it so the
    explode runs once (same knob as ``tfidf_top_terms(persist_tf=...)``).
    No driver-side data.
    """
    tf = (
        df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    if persist:
        tf = tf.persist()
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n_docs"))
    return (
        tf.join(F.broadcast(dfreq), on="tok")
        .groupBy(id_col)
        .agg(
            F.sum("__tf").alias("n_tokens"),
            F.sum(
                F.col("__tf").cast("decimal(38,0)") * F.col("__df")
            ).alias("__sum_df"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (
                F.col("__sum_df").cast("double")
                / (
                    F.col("n_tokens").cast("decimal(38,0)")
                    * F.col("__n_docs")
                ).cast("double")
            ).alias("commonness"),
        )
    )


def with_oov_rate(
    df: DataFrame,
    vocab_size: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = False,
) -> DataFrame:
    """Vocabulary coverage: per-document out-of-vocabulary token rate
    against the corpus's own top-``vocab_size`` tokens — the curation
    check for "will this document mostly map to known tokens" (high OOV
    = noise, non-target language, or encoding damage). Ties at the vocab
    boundary break lexicographically so the vocabulary is deterministic.

    Exactness: counts are BIGINT; ``oov_rate`` is the single closing
    IEEE division (same convention as the other corpus operators).

    Scale: one token-level aggregate for corpus counts; the top-K is a
    distributed TakeOrdered over the vocab-sized count relation (NOT a
    single-partition global window), and the vocabulary join back is a
    broadcast. One more token-level aggregate scores the docs.
    """
    tok = df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("tok"))
    if persist:
        # the token relation is referenced twice (vocabulary derivation +
        # scoring probe); persisting runs the explode once (same knob as
        # tfidf_top_terms)
        tok = tok.persist()
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy(F.col("__cnt").desc(), F.col("tok"))
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("__in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), on="tok", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_oov"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            "n_oov",
            (
                F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")
            ).alias("oov_rate"),
        )
    )


# PII patterns shared by the Spark operator and the DuckDB oracle: kept to
# the regex subset Java's engine and RE2 interpret identically (character
# classes, bounded repetition, \b word boundaries — no lookaround, no
# backreferences, nothing engine-specific).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """PII scrubbing — the redaction pass every training-data pipeline
    runs before text reaches a model: replace emails / phone numbers /
    IPv4 addresses with typed placeholder tags (``<EMAIL>`` etc.) and
    report per-document match counts, so downstream filters can drop
    PII-dense documents entirely rather than ship heavily-redacted text.

    Order matters and is fixed: email before ipv4 (an email's domain can
    contain digit runs; redacting emails first keeps the ipv4 pattern
    from matching inside an address it will never see). All patterns are
    applied via ``regexp_replace``/``regexp_count`` — JVM-side column
    expressions, zero shuffle, scan speed at any corpus size — and the
    pattern subset is engine-portable (see ``PII_PATTERNS``), so the
    whole operator replays exactly in the DuckDB oracle.

    Returns the input plus ``redacted_text`` and one ``n_<kind>`` count
    per pattern.
    """
    pats = patterns or PII_PATTERNS
    out = df
    red = F.col(text_col)
    for kind, pat in pats.items():
        out = out.withColumn(f"n_{kind}", F.regexp_count(red, F.lit(pat)))
        red = F.regexp_replace(red, pat, f"<{kind.upper()}>")
    return out.withColumn("redacted_text", red)


# the Gopher rules' distinctive-stopword set (Rae et al. 2021, table A1)
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 30,
    max_words: int = 90,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """The Gopher heuristic quality-filter battery (Rae et al. 2021,
    appendix A.1.1 — the rule set most subsequent pre-training corpora
    reuse): word-count bounds, mean-word-length bounds, symbol-to-word
    ratio, bullet-started and ellipsis-ended line fractions, fraction of
    words containing an alphabetic character, and distinct-stopword
    presence. Emits every individual measurement plus the conjunction
    (``gopher_ok``) so pipelines can tune single rules without
    re-deriving the features.

    Exactness: counts are integers; each ratio is a single IEEE division
    of exact integers; mean word length divides two integer aggregates —
    all replayable bit-for-bit in SQL. Per-row column expressions only:
    zero shuffle, scan speed at any corpus size. Default bounds are
    calibrated to the synthetic documents table (single-line ~10-99-word
    docs); production corpora use Gopher's published [50, 100k] word
    window.
    """
    toks = tokens_expr(text_col)
    n_words = F.size(toks).cast("bigint")
    sum_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    n_alpha = F.size(
        F.filter(toks, lambda x: x.rlike("[A-Za-z]"))
    ).cast("bigint")
    n_symbols = F.regexp_count(
        F.col(text_col), F.lit(r"#|\.\.\.")
    ).cast("bigint")
    lines = F.split(F.col(text_col), r"\n")
    n_lines = F.size(lines).cast("bigint")
    n_bullet = F.size(
        F.filter(lines, lambda x: x.rlike("^ *[-*]"))
    ).cast("bigint")
    n_ellipsis = F.size(
        F.filter(lines, lambda x: x.rlike(r"\.\.\.$"))
    ).cast("bigint")
    n_stop = None
    for w in GOPHER_STOPWORDS:
        hit = F.col(text_col).rlike(rf"\b{w}\b").cast("bigint")
        n_stop = hit if n_stop is None else n_stop + hit
    mean_len = sum_len.cast("double") / n_words.cast("double")
    symbol_ratio = n_symbols.cast("double") / n_words.cast("double")
    bullet_frac = n_bullet.cast("double") / n_lines.cast("double")
    ellipsis_frac = n_ellipsis.cast("double") / n_lines.cast("double")
    alpha_frac = n_alpha.cast("double") / n_words.cast("double")
    ok = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_frac)
        & (n_stop >= min_stopwords)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.cast("int").alias("n_stopwords"),
        ok.alias("gopher_ok"),
    )


def dsir_importance_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    smoothing: float = 1.0,
) -> DataFrame:
    """Hashed n-gram importance weights for data selection (DSIR, Xie et
    al. 2023, arXiv:2302.03169): score every raw document by how much its
    hashed-bigram distribution resembles a TARGET corpus (the domain you
    want more of) relative to the raw corpus —
    ``log w(x) = sum_over_doc_ngrams [log p_target(bucket) -
    log p_raw(bucket)]`` with add-``smoothing`` estimates over
    ``n_buckets`` hash buckets. Sampling raw data proportional to ``w``
    focuses pre-training on the target domain; this is the standard
    importance-resampling selection recipe.

    Output per document: ``n_ngrams``, ``sum_target_count`` /
    ``sum_raw_count`` (exact BIGINT diagnostics — the bucket-count mass
    the doc's ngrams touch in each corpus, SQL-replayable bit-for-bit)
    and ``log_weight`` (the DSIR score; float log-sums are not
    cross-engine bit-exact, so exactness-gated pipelines consume the
    integer columns and rank by ``log_weight`` downstream).

    Scale: bucket-count tables are ``n_buckets`` rows — broadcast; the
    corpus side is one bigram explode + one shuffle on the document id
    for the rollup (map-side combine). Hashing is the portable
    md5-derived ``md5_hash64`` so Spark/DuckDB/Python agree on buckets.
    """
    from ..functions.hashing import md5_hash64

    def bigram_buckets(frame: DataFrame, cols: list) -> DataFrame:
        t = frame.select(*cols, tokens_expr(text_col).alias("__t"))
        bg = t.filter(F.size("__t") >= 2).select(
            *cols,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__t) - 1), "
                    "i -> concat(element_at(__t, i), ' ', "
                    "element_at(__t, i + 1)))"
                )
            ).alias("__ng"),
        )
        return bg.withColumn(
            "__b", F.pmod(md5_hash64(F.col("__ng")), F.lit(n_buckets))
        )

    raw_counts = (
        bigram_buckets(df, [])
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__cr"))
    )
    tgt_counts = (
        bigram_buckets(target, [])
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__ct"))
    )
    totals = raw_counts.agg(F.sum("__cr").alias("__tr")).crossJoin(
        tgt_counts.agg(F.sum("__ct").alias("__tt"))
    )
    s = float(smoothing)
    docs = (
        bigram_buckets(df, [F.col(id_col)])
        .join(F.broadcast(raw_counts), "__b", "left")
        .join(F.broadcast(tgt_counts), "__b", "left")
    )
    ct = F.coalesce(F.col("__ct"), F.lit(0).cast("bigint"))
    cr = F.coalesce(F.col("__cr"), F.lit(0).cast("bigint"))
    per_doc = docs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum(ct).alias("sum_target_count"),
        F.sum(cr).alias("sum_raw_count"),
        F.sum(
            F.log(ct.cast("double") + F.lit(s))
            - F.log(cr.cast("double") + F.lit(s))
        ).alias("__lsum"),
    )
    return per_doc.crossJoin(F.broadcast(totals)).select(
        F.col(id_col),
        "n_ngrams",
        "sum_target_count",
        "sum_raw_count",
        (
            F.col("__lsum")
            + F.col("n_ngrams")
            * (
                F.log(F.col("__tr").cast("double") + F.lit(s * n_buckets))
                - F.log(F.col("__tt").cast("double") + F.lit(s * n_buckets))
            )
        ).alias("log_weight"),
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 0.5,
    persist_tf: bool = False,
) -> DataFrame:
    """Unigram language-model scoring for perplexity-based quality
    filtering (the CCNet recipe, Wenzek et al. 2020: score every document
    under a corpus LM and keep the low-perplexity head). The LM here is
    the corpus's own unigram MLE with add-``smoothing`` —
    ``p(t) = (tf_t + s) / (N + s*V)`` over whitespace tokens — so the
    operator is self-contained; swapping in an external LM is a different
    count table, same plan.

    Output per document: ``n_tokens`` / ``n_distinct`` (exact BIGINT),
    ``sum_tf`` (exact BIGINT — the corpus-frequency mass of the
    doc's tokens, the SQL-replayable diagnostic), ``logprob`` and ``ppl``
    (float; ``log``/``exp`` are not cross-engine bit-exact, so gated
    pipelines compare the integer columns and rank by ``ppl``
    downstream — same convention as ``dsir_importance_weights``).

    Scale: one explode + one token-keyed aggregate for the tf table, one
    token-keyed shuffle join (the vocabulary's heavy tail can exceed
    broadcast size at corpus scale — a shuffle join is the safe default),
    one doc-keyed rollup with map-side combine. No driver collect except
    the two scalar totals (N, V) folded in by broadcast cross-join.
    """
    s = float(smoothing)
    tok = df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("__t"))
    tf = tok.groupBy("__t").agg(F.count(F.lit(1)).alias("__tf"))
    if persist_tf:
        # the tf relation feeds BOTH the totals aggregate and the join
        # probe; without caching Catalyst re-evaluates the corpus
        # explode+aggregate per reference (the tfidf persist_tf trade)
        tf = tf.persist()
    totals = tf.agg(
        F.sum("__tf").alias("__n"), F.count(F.lit(1)).alias("__v")
    )
    doc_tok = tok.groupBy(id_col, "__t").agg(F.count(F.lit(1)).alias("__cnt"))
    per_doc = (
        doc_tok.join(tf, "__t")
        .groupBy(id_col)
        .agg(
            F.sum("__cnt").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            # DECIMAL accumulation (order-independent, no intermediate
            # wrap), BIGINT close: even at 100 TB (N ~ 2.5e13 tokens,
            # tf ~ 1e12, 1e4-token docs) sum_tf tops out ~1e19's far side
            # of nothing — well inside int64.
            F.sum(
                F.col("__cnt").cast("decimal(38,0)")
                * F.col("__tf").cast("decimal(38,0)")
            )
            .cast("bigint")
            .alias("sum_tf"),
            F.sum(
                F.col("__cnt") * F.log(F.col("__tf").cast("double") + F.lit(s))
            ).alias("__lsum"),
        )
    )
    out = per_doc.crossJoin(F.broadcast(totals)).select(
        F.col(id_col),
        "n_tokens",
        "n_distinct",
        "sum_tf",
        (
            F.col("__lsum")
            - F.col("n_tokens")
            * F.log(F.col("__n").cast("double") + F.lit(s) * F.col("__v").cast("double"))
        ).alias("logprob"),
    )
    return out.withColumn(
        "ppl", F.exp(-F.col("logprob") / F.col("n_tokens").cast("double"))
    )


def perplexity_buckets(
    scored: DataFrame, n_buckets: int = 3, ppl_col: str = "ppl"
) -> DataFrame:
    """CCNet's head/middle/tail split: rank documents by LM perplexity and
    cut into ``n_buckets`` equal-population buckets (bucket 1 = lowest
    perplexity = cleanest). NTILE over a total order — the same
    scale caveat as ``decile_bucketing``: exact global quantiles cost a
    total sort; at corpus scale swap to approx-quantile boundaries.
    Deterministic: ties broken by the first remaining column (the id)."""
    order = [F.col(ppl_col).asc(), F.col(scored.columns[0]).asc()]
    from pyspark.sql import Window

    return scored.withColumn(
        "ppl_bucket", F.ntile(n_buckets).over(Window.orderBy(*order))
    )


def domain_mixture_weights(
    df: DataFrame,
    source_col: str = "source",
    target_shares: dict[str, float] | None = None,
    id_col: str = "doc_id",
    persist_counts: bool = False,
) -> DataFrame:
    """Domain-mixture reweighting for pre-training data curation (the
    DoReMi / Pile recipe shape: each domain gets a sampling weight that
    moves the corpus toward a target distribution). For every document:
    its domain's corpus share (exact-integer counts, ONE closing IEEE
    division) and ``mix_weight = target_share * total / domain_count``
    — sampling proportional to ``mix_weight`` reproduces the target
    mixture in expectation. ``target_shares=None`` means uniform over
    the observed domains. NULL-source documents are excluded by the
    final equi-join (standard SQL null-key semantics); an explicit
    ``target_shares`` missing an observed NON-null domain fails at
    evaluation via a lazy ``raise_error`` rather than silently
    NULL-weighting its documents.

    Exactness: counts stay BIGINT; each float column is a fixed two-op
    sequence of correctly-rounded IEEE arithmetic on identical operands,
    so the oracle replays bit-for-bit (no transcendental functions).

    Scale: one domain-keyed aggregate (domains are few — map-side combine
    collapses everything), broadcast join back onto the corpus; zero
    wide shuffles of the document table itself.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__dn"))
    if persist_counts:
        # the domain aggregate is referenced by the totals, the domain
        # count, and the weight projection — cache the (tiny) relation so
        # the corpus is scanned once, not once per reference
        counts = counts.persist()
    total = counts.agg(F.sum("__dn").alias("__total"))
    counts = counts.crossJoin(F.broadcast(total))
    if target_shares is None:
        n_domains = counts.select(
            F.count(F.lit(1)).alias("__k")
        )
        counts = counts.crossJoin(F.broadcast(n_domains)).withColumn(
            "__tgt", F.lit(1.0) / F.col("__k").cast("double")
        )
    else:
        tgt = F.lit(None).cast("double")
        for dom in sorted(target_shares):
            tgt = F.when(F.col(source_col) == dom, F.lit(float(target_shares[dom]))).otherwise(tgt)
        # a corpus domain missing from the dict (including a NULL source)
        # would carry NULL weights and be silently dropped by downstream
        # weight filters — fail AT EVALUATION with a lazy raise_error
        # instead (no extra driver action, no eager corpus scan; the
        # same pattern as the MERGE cardinality check)
        counts = counts.withColumn(
            "__tgt",
            F.when(
                tgt.isNull(),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "domain_mixture_weights: corpus domain missing "
                            "from target_shares: "
                        ),
                        F.coalesce(
                            F.col(source_col).cast("string"), F.lit("NULL")
                        ),
                    )
                ).cast("double"),
            ).otherwise(tgt),
        )
    weighted = counts.select(
        source_col,
        F.col("__dn").cast("bigint").alias("domain_count"),
        (F.col("__dn").cast("double") / F.col("__total").cast("double")).alias(
            "corpus_share"
        ),
        F.col("__tgt").alias("target_share"),
        (
            F.col("__tgt") * F.col("__total").cast("double")
            / F.col("__dn").cast("double")
        ).alias("mix_weight"),
    )
    return df.select(id_col, source_col).join(
        F.broadcast(weighted), source_col
    )


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    min_ppm: int = 1000,
    persist_counts: bool = False,
) -> DataFrame:
    """Exact corpus heavy hitters: every token whose frequency is at
    least ``min_ppm`` parts-per-million of all tokens. The threshold
    comparison stays in integer arithmetic (``cnt * 1_000_000 >=
    total * min_ppm``) so the cut is exact on both engines; ``share`` is
    one closing IEEE division.

    This is the exact two-aggregate form of what a Misra-Gries /
    Space-Saving sketch approximates in one pass; at 100 TB the exact
    form still works because the token aggregate collapses map-side
    (combiner output is bounded by per-partition vocabulary, not rows).
    """
    tok = df.select(F.explode(tokens_expr(text_col)).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    if persist_counts:
        # both the threshold filter and the total derive from counts;
        # caching stops the corpus aggregate running once per reference
        counts = counts.persist()
    total = counts.agg(F.sum("cnt").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(
            F.col("cnt") * F.lit(1_000_000)
            >= F.col("__total") * F.lit(int(min_ppm))
        )
        .select(
            "token",
            F.col("cnt").cast("bigint").alias("cnt"),
            (F.col("cnt").cast("double") / F.col("__total").cast("double")).alias(
                "share"
            ),
        )
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """The first step of BPE tokenizer training: count adjacent
    character pairs inside whitespace words across the corpus and rank
    the merge candidates (Sennrich et al. 2016). Returns the ``top_k``
    pairs by count with a deterministic lexicographic tie-break — the
    highest-ranked pair is the first BPE merge.

    Scale: one explode to words, one in-row ``transform`` to pairs
    (codegen, no Python), one pair-keyed aggregate (map-side combine —
    the pair alphabet is tiny so combiners collapse almost everything),
    then a distributed TakeOrdered for the top-k. No driver data moves.
    """
    words = df.select(F.explode(tokens_expr(text_col)).alias("__w")).filter(
        F.length("__w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(__w) - 1), i -> substring(__w, i, 2))")
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    # TakeOrdered (orderBy+limit) bounds the set BEFORE the ranking
    # window runs — ranking the full counts table through one
    # unpartitioned window task would be the global sort the docstring
    # promises to avoid
    top = counts.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(
        int(top_k)
    )
    return top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("pair").asc())
        ),
    ).select("pair", F.col("cnt").cast("bigint").alias("cnt"), "rank")


def temperature_mixture_weights(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    id_col: str = "doc_id",
    persist_counts: bool = False,
) -> DataFrame:
    """Temperature-scaled domain sampling (the multilingual-pretraining
    recipe from mBERT/XLM-R and T5: sample domain ``d`` proportional to
    ``p_d^alpha``, ``alpha < 1`` up-weights low-resource domains).
    Per document: the domain's corpus share, its normalized
    ``temp_share = share^alpha / sum_d share^alpha``, and the per-doc
    sampling weight ``mix_weight = temp_share * total / count_d``.

    Exactness: at the default ``alpha = 0.5`` the power is ``sqrt`` —
    correctly rounded IEEE, so bit-exact cross-engine; the normalizer
    folds the per-domain terms in sorted-domain order (a sequential
    left fold both engines replay identically). Other alphas go through
    ``pow`` (not cross-engine bit-exact; ranking still correct).

    Scale: one tiny domain aggregate, a one-row normalizer fold,
    broadcast join back — the corpus never shuffles.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__dn"))
    if persist_counts:
        counts = counts.persist()
    total = counts.agg(F.sum("__dn").alias("__total"))
    counts = counts.crossJoin(F.broadcast(total))
    share = F.col("__dn").cast("double") / F.col("__total").cast("double")
    a = float(alpha)
    w_raw = F.sqrt(share) if a == 0.5 else F.pow(share, F.lit(a))
    counts = counts.withColumn("__w", w_raw)
    z = counts.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct(F.col(source_col), F.col("__w")))),
            F.lit(0.0),
            lambda acc, x: acc + x["__w"],
        ).alias("__z")
    )
    weighted = counts.crossJoin(F.broadcast(z)).select(
        source_col,
        F.col("__dn").cast("bigint").alias("domain_count"),
        share.alias("corpus_share"),
        (F.col("__w") / F.col("__z")).alias("temp_share"),
        (
            (F.col("__w") / F.col("__z"))
            * F.col("__total").cast("double")
            / F.col("__dn").cast("double")
        ).alias("mix_weight"),
    )
    return df.select(id_col, source_col).join(F.broadcast(weighted), source_col)


DEFAULT_CMS_DEPTH = 4
DEFAULT_CMS_WIDTH = 256


def count_min_sketch(
    df: DataFrame,
    text_col: str = "text",
    depth: int = DEFAULT_CMS_DEPTH,
    width: int = DEFAULT_CMS_WIDTH,
) -> DataFrame:
    """Count-Min sketch over corpus tokens: ``depth`` independent hash
    rows × ``width`` counters; estimate(token) = min over rows of its
    counter — always an OVERestimate, within ``eps·N`` of truth with
    probability 1−δ (eps = e/width, δ = e^−depth). The streaming-sketch
    complement to the exact ``heavy_hitters`` pass: fixed memory no
    matter the vocabulary.

    Deterministic by construction: row ``d``'s bucket is the portable
    ``md5_hash64(chr(d) ‖ token) mod width``, so the sketch — not just
    its estimates — replays exactly cross-engine (the same property as
    every hash-derived operator here; a production swap to xxhash64
    changes one helper).

    Scale: one explode + ONE aggregate on (depth, bucket) — at most
    ``depth × width`` result rows with map-side combine collapsing
    everything; no vocabulary-sized state anywhere.
    """
    tok = df.select(F.explode(tokens_expr(text_col)).alias("__t"))
    # ONE corpus explode: every depth row's (depth, bucket) pair
    # materializes from a single in-row struct array — a per-depth
    # union would tokenize and scan the corpus `depth` times
    structs = [
        F.struct(
            F.lit(d).alias("depth"),
            F.pmod(
                md5_hash64(F.concat(F.lit(chr(65 + d)), F.col("__t"))),
                F.lit(int(width)),
            ).cast("int").alias("bucket"),
        )
        for d in range(int(depth))
    ]
    all_rows = tok.select(F.explode(F.array(*structs)).alias("s")).select(
        "s.depth", "s.bucket"
    )
    return all_rows.groupBy("depth", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: list[str],
    width: int = DEFAULT_CMS_WIDTH,
    depth: int | None = None,
) -> DataFrame:
    """Point-query the Count-Min sketch for ``probes``: per token the
    min counter across depth rows. Probe buckets compute driver-side
    (the probe list is tiny); the sketch joins on (depth, bucket) —
    broadcast-sized by construction. Pass ``depth`` (the value the
    sketch was built with) to avoid an inference action that would
    re-evaluate an unpersisted sketch plan. ``depth``/``width`` MUST
    match the build parameters (share ``DEFAULT_CMS_DEPTH``/``_WIDTH``)
    — probing extra depth rows joins nothing and the min would silently
    report 0."""
    import hashlib

    spark = sketch.sparkSession
    rows = []
    if depth is None:
        mx = sketch.agg(F.max("depth")).first()[0]
        if mx is None:
            raise ValueError(
                "count_min_estimate: empty sketch and no depth given"
            )
        depth = mx + 1
    for t in probes:
        for d in range(depth):
            h = int(hashlib.md5((chr(65 + d) + t).encode()).hexdigest()[:15], 16)
            rows.append((t, d, h % int(width)))
    probe_df = spark.createDataFrame(rows, "token string, depth int, bucket int")
    joined = probe_df.join(F.broadcast(sketch), ["depth", "bucket"], "left")
    return joined.groupBy("token").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias(
            "estimate"
        )
    )


def perplexity_buckets_approx(
    scored: DataFrame,
    n_buckets: int = 3,
    ppl_col: str = "ppl",
    relative_error: float = 0.01,
    bucket_col: str = "ppl_bucket",
    persist: bool = False,
) -> DataFrame:
    """The 100 TB path for CCNet's head/middle/tail split: bucket by
    APPROXIMATE quantile boundaries (Greenwald-Khanna via
    ``approxQuantile`` — a driver-side list of ``n_buckets - 1``
    numbers) instead of ``perplexity_buckets``'s exact global NTILE,
    which costs a total sort through one ordering. Assignment is then a
    scan-speed comparison against broadcast literals — zero shuffle.

    The trade: bucket populations are equal only to within
    ``relative_error`` (CCNet itself cuts on sampled quantiles for the
    same reason); bucket MEMBERSHIP remains monotone in ``ppl`` exactly.

    The summary pass is an ACTION on ``scored``; the returned plan
    references ``scored`` again for the assignment scan. When the
    scoring plan is expensive (unigram_logprob's two token aggregates),
    ``persist=True`` caches ``scored`` (MEMORY_AND_DISK, same knob as
    ``tfidf_top_terms(persist_tf=True)``) so both the quantile action
    and the returned assignment plan read ONE materialization — the
    corpus is scored once, not twice (scan-count pinned in
    tests/test_plans.py). Default stays False so the stateless
    oracle-checked plan is unchanged.
    """
    if persist:
        from pyspark import StorageLevel

        scored = scored.persist(StorageLevel.MEMORY_AND_DISK)
    cuts = scored.approxQuantile(
        ppl_col,
        [i / n_buckets for i in range(1, int(n_buckets))],
        float(relative_error),
    )
    # bucket = 1 + number of cuts the row's ppl exceeds, so each row
    # lands in the highest bucket whose lower boundary it crossed
    crossings = [
        F.when(F.col(ppl_col) > F.lit(float(c)), 1).otherwise(0) for c in cuts
    ]
    total = F.lit(1)
    for c in crossings:
        total = total + c
    return scored.withColumn(bucket_col, total.cast("int"))


def novelty_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Document novelty: the fraction of a document's distinct n-token
    shingles that appear in NO other document (shingle document
    frequency 1) — the inverse signal of boilerplate/near-dup scoring:
    high novelty means the text is unlike the rest of the corpus, low
    novelty flags templated or duplicated content even when no single
    pair crosses a dedup threshold.

    Exactness: distinct-shingle counts are BIGINT, the score is one
    closing IEEE division. Zero-shingle docs (< n tokens) report NULL.

    Scale: one explode to (doc, shingle) distinct pairs, one
    shingle-keyed aggregate for df (map-side combine), one shuffle join
    back on the shingle, one doc rollup — the LSH-family cost shape
    without the pair enumeration.
    """
    from ..functions.hashing import shingle_expr

    # shingle_expr wants a named token column in scope
    pairs = (
        df.select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
        .select(
            F.col(id_col),
            F.explode(shingle_expr("__toks", shingle_n)).alias("__sh"),
        )
        .distinct()
    )
    sdf = pairs.groupBy("__sh").agg(F.count(F.lit(1)).alias("__df"))
    per_doc = (
        pairs.join(sdf, "__sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("__df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unique"),
        )
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_shingles", F.lit(0).cast("bigint")).alias("n_shingles"),
        F.coalesce("n_unique", F.lit(0).cast("bigint")).alias("n_unique"),
        # shingle-less docs (< n tokens) report NULL, never NaN: the
        # 0/0 case is guarded in the operator itself, not downstream
        F.when(
            F.col("n_shingles") > 0,
            F.col("n_unique").cast("double")
            / F.col("n_shingles").cast("double"),
        ).alias("novelty"),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Full BPE tokenizer training (Sennrich et al. 2016), the iterative
    closure of ``bpe_pair_counts``' single step: learn ``n_merges``
    merge rules from the corpus. The distributed part is ONE word-
    frequency aggregate (map-side combined; the classic formulation
    trains on the word-frequency table, never the raw corpus); the
    merge loop then runs driver-side over that vocabulary-bounded dict
    — the same driver-state contract as PQ codebooks and IVF centroids
    (vocabulary ≪ corpus; millions of entries at worst, one scan of
    them per merge). Deterministic: ties on pair count break
    lexicographically.

    Returns the ordered merge list [(left, right), ...] — feed to
    ``bpe_apply``.
    """
    word_freq = {
        r["__w"]: r["__n"]
        for r in df.select(F.explode(tokens_expr(text_col)).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    }
    # symbol-sequence representation per distinct word
    seqs: dict[str, list[str]] = {w: list(w) for w in word_freq if w}
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        counts: dict[tuple[str, str], int] = {}
        for w, seq in seqs.items():
            f = word_freq[w]
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # deterministic: max count, then lexicographically SMALLEST pair
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        merges.append(best)
        a, b = best
        ab = a + b
        for w, seq in seqs.items():
            i, out = 0, []
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    return merges


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply trained BPE merges to the corpus: per document, the BPE
    token sequence and its length. The merge list rides in the task
    closure (tokenizer models are KBs); each Arrow batch tokenizes with
    a per-batch word→tokens memo, so cost tracks DISTINCT words per
    batch, not token volume — the standard vocabulary-locality win.
    mapInPandas (not a per-row UDF): one Python call per Arrow batch.
    """
    import pandas as pd

    merge_list = [tuple(m) for m in merges]
    out_schema = f"{id_col} bigint, n_bpe_tokens bigint, bpe_head string"

    def run(batches):
        memo: dict[str, list[str]] = {}

        def word_tokens(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                seq = list(w)
                for a, b in merge_list:
                    ab = a + b
                    i, out = 0, []
                    while i < len(seq):
                        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                            out.append(ab)
                            i += 2
                        else:
                            out.append(seq[i])
                            i += 1
                    seq = out
                memo[w] = got = seq
            return got

        for pdf in batches:
            ids, counts, heads = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for w in (text or "").split():
                    toks.extend(word_tokens(w))
                ids.append(doc_id)
                counts.append(len(toks))
                heads.append(" ".join(toks[:8]))
            yield pd.DataFrame(
                {id_col: ids, "n_bpe_tokens": counts, "bpe_head": heads}
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


#: fastText-style quality-classifier weights — exact binary fractions so
#: the linear form replays bit-identically in any IEEE engine. Order
#: matters: the decision value folds left-to-right in THIS order.
DEFAULT_QUALITY_WEIGHTS: dict[str, float] = {
    "len_norm": 1.5,          # longer docs (clamped) look higher-quality
    "avg_token_len": 0.125,   # mild push toward real words over noise
    "punct_ratio": -2.25,     # symbol soup is the strongest negative
    "stopword_ratio": 1.5,    # natural prose carries function words
}
DEFAULT_QUALITY_BIAS: float = -0.75


def linear_quality_score(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    bias: float = DEFAULT_QUALITY_BIAS,
    text_col: str = "text",
    clamp_tokens: int = 256,
) -> DataFrame:
    """Fixed-weight linear quality classifier — the fastText-classifier
    shape every curation pipeline runs (CCNet's LM filter, quality
    classifiers distilled to linear scorers for the 100 TB pass) with
    the TRAINED WEIGHTS AS INPUT: featurize, dot with the weight vector,
    threshold. Adds

    * ``quality_z`` — the decision value ``bias + Σ w_i · f_i`` folded
      left-to-right in declaration order. Every feature is a pure
      rational of exact counts and the weights are exact binary
      fractions, so z is a fixed IEEE op sequence — bit-identical in any
      engine, which is what lets the gate compare it exactly;
    * ``quality_pass`` — ``z >= 0`` (the sigmoid's 0.5 boundary without
      the sigmoid);
    * ``quality_prob`` — ``1/(1+exp(-z))``. exp() is NOT cross-engine
      bit-exact; keep this column out of exact oracles (house rule, same
      as DSIR's log_weight) — it is value-tested in pytest instead.

    Features (all rational, NULL-guarded to 0): ``len_norm`` =
    least(n_tokens, clamp)/clamp, ``avg_token_len``, ``punct_ratio``,
    ``stopword_ratio`` from ``with_text_stats``. Zero shuffle —
    scan-speed scoring at any scale.
    """
    w = dict(DEFAULT_QUALITY_WEIGHTS) if weights is None else dict(weights)
    stats = with_text_stats(df, text_col)
    feats: dict[str, Column] = {
        "len_norm": (
            F.least(F.col("n_tokens"), F.lit(clamp_tokens)).cast("double")
            / float(clamp_tokens)
        ),
        "avg_token_len": F.coalesce(
            F.col("avg_token_len"), F.lit(0.0)
        ),
        "punct_ratio": F.coalesce(F.col("punct_ratio"), F.lit(0.0)),
        "stopword_ratio": F.coalesce(F.col("stopword_ratio"), F.lit(0.0)),
    }
    unknown = set(w) - set(feats)
    if unknown:
        raise ValueError(f"unknown classifier features: {sorted(unknown)}")
    z = F.lit(float(bias))
    for name, weight in w.items():
        z = z + F.lit(float(weight)) * feats[name]
    return (
        stats.withColumn("quality_z", z)
        .withColumn("quality_pass", (F.col("quality_z") >= 0).cast("int"))
        .withColumn(
            "quality_prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("quality_z")))
        )
    )


def inverted_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Postings table ``(token, doc_id, tf)`` — the retrieval-side dual
    of the corpus statistics operators. One explode + one (token,
    doc) aggregate with map-side partial counts.

    Scale contract: persist the result partitioned/bucketed BY TOKEN
    (``.write.bucketBy(n, 'token')``) and every conjunctive query
    becomes a union of n_query_tokens bucket-pruned posting scans — the
    classic sharded inverted index, expressed as a table layout."""
    toks = F.explode(tokens_expr(text_col)).alias("token")
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks)
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


def conjunctive_search(
    docs: DataFrame,
    query_tokens: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 50,
) -> DataFrame:
    """Boolean-AND retrieval ranked by total term frequency: documents
    containing EVERY query token, scored by the all-integer sum of the
    matched terms' tf — deterministic and engine-exact by construction
    (ratio-idf or BM25 weighting would put transcendentals/float
    accumulation order into the score; the integer rank keeps the
    oracle exact, and the tf components are returned for any
    downstream re-weighting).

    Plan: the token IN-list filter pushes into the postings aggregate's
    scan side, so only the query tokens' postings are ever built — at
    100 TB against a persisted token-bucketed index this is
    |query| bucket lookups, a per-doc count/sum, and a top-k."""
    q = [t for t in query_tokens]
    postings = inverted_index(
        docs.filter(F.col(text_col).isNotNull()), text_col, id_col
    ).filter(F.col("token").isin(q))
    return (
        postings.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("__matched"),
            F.sum("tf").cast("bigint").alias("score"),
        )
        .filter(F.col("__matched") == len(q))
        .select("doc_id", "score")
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(top_k)
    )


def bm25_search(
    docs: DataFrame,
    query_tokens: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 50,
    require_all: bool = False,
) -> DataFrame:
    """BM25-ranked retrieval over the inverted index — the float
    ranking twin of ``conjunctive_search`` (whose all-integer tf score
    stays the oracle anchor; BM25's log-idf and float accumulation are
    not engine-exact, so this operator is rows-only gated with a
    host-exact numpy replay test instead of a SQL oracle).

    Standard Robertson/Lucene formulation, per matched (doc, term)::

        idf(t) = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        w(t,d) = idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    summed over the query terms the document contains. ``require_all``
    switches to boolean-AND semantics (BM25-scored conjunctive).

    Plan shape: postings are built ONLY for the query tokens (the
    IN-list filter sits under the postings aggregate, exactly like
    conjunctive_search); per-token document frequencies fold from those
    postings and BROADCAST onto them (|q| rows); corpus size + average
    doc length are one broadcast scalar row; doc length joins on the
    id key. At 100 TB with a persisted token-bucketed index carrying a
    stored-doclen sidecar, this is |q| bucket lookups + one broadcast —
    the corpus is never rescanned per query; here both sidecars derive
    from one extra pass over ``docs``.

    Returns ``(doc_id, matched, score)`` ordered by score desc (ties:
    doc_id), limited to ``top_k``."""
    q = list(dict.fromkeys(query_tokens))
    base = docs.filter(F.col(text_col).isNotNull())
    postings = inverted_index(base, text_col, id_col).filter(
        F.col("token").isin(q)
    )
    doclen = base.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_expr(text_col)).cast("double").alias("dl"),
    )
    stats = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    dfreq = postings.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    tf = F.col("tf").cast("double")
    idf = F.log1p(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    w = idf * (
        tf
        * F.lit(k1 + 1.0)
        / (
            tf
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("dl") / F.col("avgdl")
            )
        )
    )
    scored = (
        postings.join(F.broadcast(dfreq), "token")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("matched"),
            F.sum("w").alias("score"),
        )
    )
    if require_all:
        scored = scored.filter(F.col("matched") == len(q))
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(top_k)


def feature_hash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
    salt: str = "fh",
) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al.): tokens map to
    ``num_buckets`` buckets via md5, with a second independent hash bit
    choosing the ±1 sign that makes collisions cancel in expectation —
    the fixed-width, vocabulary-free text feature map. Output is the
    sparse form ``(doc_id, bucket, weight)`` with all-integer weights
    (signed token counts), engine-exact and ready to pivot into a dense
    vector column when a model needs it.

    Scale: no vocabulary table, no fit step, no broadcast — one explode
    + one (doc, bucket) aggregate, the whole point of the hashing trick
    at corpus scale."""
    tok = F.explode(tokens_expr(text_col)).alias("tok")
    bucket = (
        md5_hash64(F.concat(F.lit(f"{salt}:"), F.col("tok")))
        % num_buckets
    ).cast("int")
    sign = F.when(
        md5_hash64(F.concat(F.lit(f"{salt}s:"), F.col("tok"))) % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        docs.select(F.col(id_col).alias("doc_id"), tok)
        .select("doc_id", bucket.alias("bucket"), sign.alias("__s"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("__s").cast("bigint").alias("weight"))
    )

"""Text analysis for training-data curation: token counting, quality
scoring, language ID, fingerprinting.

All hot-path expressions are JVM-side ``pyspark.sql.functions`` (whole
stage codegen, no Python workers). Where cross-engine determinism
matters (DuckDB oracle parity, resume-stable fingerprints) we use a
**portable hash**: the first 15 hex digits of md5 parsed as a 60-bit
int — identical in any engine with md5 + hex parsing, unlike
engine-specific murmur (Spark ``F.hash``) which is faster but not
portable. Use ``F.hash`` variants where only intra-Spark stability is
needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_SPLIT = r"\s+"
# whitespace tokens + punctuation split — a BPE-ish pre-tokenizer shape
BPE_ISH = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"

# tiny per-language stopword markers for the heuristic language ID
_LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "fr": [" le ", " la ", " et ", " les "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " los ", " que ", " y "],
}


def portable_hash64(col: Column) -> Column:
    """Deterministic 60-bit hash identical across Spark and DuckDB:
    ``CAST(conv(substr(md5(x),1,15),16,10) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def normalize_text(col: Column) -> Column:
    """Lowercase, trim, collapse whitespace — canonical form for exact
    dedup and fingerprinting."""
    return F.regexp_replace(F.trim(F.lower(col)), WORD_SPLIT, " ")


def word_tokens(col: Column) -> Column:
    """Whitespace word tokens, empty strings removed."""
    return F.filter(F.split(col, WORD_SPLIT), lambda x: x != "")


def token_count(col: Column, mode: str = "whitespace") -> Column:
    """Token count: ``whitespace`` (word split) or ``bpe`` (regex
    pre-tokenizer: alnum runs + individual punctuation)."""
    if mode == "whitespace":
        return F.size(word_tokens(col))
    if mode == "bpe":
        return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH), F.lit(0)))
    raise ValueError(f"unknown token mode {mode!r}")


def doc_fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 of the normalized text. Stable across
    runs/engines; the exact-dedup grouping key."""
    return F.md5(normalize_text(col))


def quality_features(
    df: DataFrame, text_col: str = "text", prefix: str = ""
) -> DataFrame:
    """Append heuristic quality-scoring columns (length / punctuation /
    stopword / digit ratios + a composite score). Pure built-ins —
    one codegen stage, no shuffle."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = word_tokens(t)
    n_words = F.size(words)
    safe_chars = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(1.0))
    safe_words = F.when(n_words > 0, n_words.cast("double")).otherwise(F.lit(1.0))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    stop_hits = F.size(
        F.filter(
            words,
            lambda w: F.lower(w).isin(
                "the", "and", "of", "a", "to", "in", "is", "that", "it", "for"
            ),
        )
    )
    mean_word_len = (n_chars.cast("double") - (n_words - 1).cast("double")) / safe_words

    out = (
        df.withColumn(f"{prefix}n_chars", n_chars)
        .withColumn(f"{prefix}n_words", n_words)
        .withColumn(f"{prefix}mean_word_len", F.round(mean_word_len, 6))
        .withColumn(f"{prefix}punct_ratio", F.round(punct / safe_chars, 6))
        .withColumn(f"{prefix}digit_ratio", F.round(digits / safe_chars, 6))
        .withColumn(f"{prefix}upper_ratio", F.round(upper / safe_chars, 6))
        .withColumn(f"{prefix}stopword_ratio", F.round(stop_hits / safe_words, 6))
    )
    score = (
        F.when((F.col(f"{prefix}n_words") >= 5) & (F.col(f"{prefix}n_words") <= 100000), 0.4)
        .otherwise(0.0)
        + F.when(F.col(f"{prefix}stopword_ratio") > 0.05, 0.3).otherwise(0.0)
        + F.when(F.col(f"{prefix}punct_ratio") < 0.2, 0.2).otherwise(0.0)
        + F.when(F.col(f"{prefix}digit_ratio") < 0.3, 0.1).otherwise(0.0)
    )
    return out.withColumn(f"{prefix}quality_score", F.round(score, 6))


def detect_language(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID via stopword markers with fixed priority
    (en > fr > de > es > unknown). Deterministic, SQL-portable —
    accuracy is secondary to plumbing here; swap in a real n-gram model
    via mapInPandas for production."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))

    def hits(markers: list[str]) -> Column:
        c = F.lit(0)
        for m in markers:
            c = c + F.when(padded.contains(m), 1).otherwise(0)
        return c

    en, fr, de, es = (hits(_LANG_MARKERS[k]) for k in ("en", "fr", "de", "es"))
    best = F.greatest(en, fr, de, es)
    pred = (
        F.when(best == 0, F.lit("unknown"))
        .when(en == best, F.lit("en"))
        .when(fr == best, F.lit("fr"))
        .when(de == best, F.lit("de"))
        .otherwise(F.lit("es"))
    )
    return df.withColumn(out_col, pred)


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(doc, word) TF-IDF over normalized whitespace words:
    ``tf * ln(N / df)`` (no smoothing). Plan: explode words (flatMap) →
    tf hash-aggregate on (doc, word) → document-frequency aggregate on
    word → broadcast-join idf back. Two shuffles, both map-side
    combinable; the df table is |vocab|-sized (broadcastable for
    natural-language vocabularies)."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_tokens(normalize_text(F.col(text_col)))).alias("word"),
    )
    tf = words.groupBy("id", "word").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(id_col).distinct().count()
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(F.broadcast(dfreq), "word")
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6),
        )
        .select("id", "word", F.col("tf").cast("long").alias("tf"), "tfidf")
    )


def winnowing_fingerprints(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every overlapping character k-gram of the
    normalized text with the portable hash (the per-k-gram hashes play
    the role a sequential Rabin rolling hash plays on a single CPU —
    a data-parallel engine computes them independently instead), then
    keep the MINIMUM hash of each sliding window of ``w`` consecutive
    positions. The
    selected set is position-robust — any match of length >= k + w - 1
    between two documents shares at least one fingerprint — which makes
    it the standard rolling-hash primitive for partial-overlap / clone
    detection (where whole-text md5 and word shingles both fail).

    Physical plan: one codegen ``regexp_extract_all`` with a zero-width
    lookahead emits all overlapping k-grams (same trick as
    dedup_text.word_shingles), posexplode keeps positions, a single
    running-min window (ROWS w-1 PRECEDING) selects winners, distinct
    dedups. One shuffle on doc id. Documents shorter than k produce no
    fingerprints; documents with fewer than ``w`` k-grams contribute the
    min over all their positions (the final partial window).

    Returns (id, fingerprint) rows — the inverted-index shape: equal
    fingerprints across docs are clone candidates.
    """
    from pyspark.sql import Window

    nt = normalize_text(F.col(text_col))
    grams = F.regexp_extract_all(nt, F.lit(f"(?=(.{{{k}}}))"), 1)
    ex = df.select(
        F.col(id_col).alias("id"), F.posexplode(grams).alias("pos", "__g")
    ).select("id", "pos", (portable_hash64(F.col("__g"))).alias("__h"))
    run = Window.partitionBy("id").orderBy("pos").rowsBetween(-(w - 1), 0)
    whole = Window.partitionBy("id")
    order = Window.partitionBy("id").orderBy("pos")
    sel = ex.select(
        "id",
        "pos",
        F.min("__h").over(run).alias("fingerprint"),
        F.max("pos").over(whole).alias("__pmax"),
    ).filter((F.col("pos") >= w - 1) | (F.col("pos") == F.col("__pmax")))
    # a window minimum repeats for ~w consecutive positions; dropping
    # consecutive duplicates with a lag (same partition/order -> same
    # window exec, no extra shuffle) cuts the distinct's shuffle volume
    # ~w-fold before the final dedup
    sel = sel.withColumn("__prev", F.lag("fingerprint").over(order)).filter(
        F.col("__prev").isNull() | (F.col("fingerprint") != F.col("__prev"))
    )
    return sel.select("id", "fingerprint").distinct()

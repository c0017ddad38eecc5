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

# Explicit whitespace class, NOT \s: Java regex \s includes \x0b,
# RE2/DuckDB \s does not — so a \s-based split silently diverges from
# every SQL oracle on documents containing a vertical tab. This class
# equals RE2's \s, so Spark and the oracles agree byte-for-byte
# (\x0b is a word character on both sides). Same rule as
# tokenize.PRETOKEN_PATTERN.
WORD_SPLIT = r"[ \t\n\f\r]+"
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


# --------------------------------------------------------------- curation ops
def gopher_quality_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    max_dup_line_ratio: float = 0.3,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1 — the
    repetition/format filter battery used by most LLM corpus pipelines;
    reimplemented from the published description):

    * word count in [min_words, max_words],
    * mean word length in [min, max],
    * symbol-to-word ratio (``#`` or ellipsis) ≤ max_symbol_word_ratio,
    * ≤ max_bullet_ratio of lines starting with a bullet,
    * ≤ max_ellipsis_ratio of lines ending with an ellipsis,
    * ≥ min_alpha_word_ratio of words containing ≥ 1 alphabetic char,
    * duplicate-line fraction ≤ max_dup_line_ratio.

    Appends one boolean per rule + ``gopher_pass`` (AND of all).
    Per-row only, no shuffle — a linear scan at any scale. The
    char-count hot path (mean word length) is whole-stage codegen
    (``regexp_replace`` char count — NOT a higher-order ``aggregate``,
    which is CodegenFallback/interpreted per element, the measured-7.6×
    trap from VERDICT r02); the line-level rules use array
    ``filter``/``transform`` expressions, which ARE interpreted per
    element but over per-document LINE arrays (tens of elements), not
    per-token — acceptable; revisit with ``(?m)`` regexp_count if a
    profile ever shows them hot. Thresholds are the paper's defaults;
    all keyword-tunable."""
    t = F.col(text_col)
    words = word_tokens(t)
    n_words = F.size(words)
    safe_words = F.when(n_words > 0, n_words.cast("double")).otherwise(F.lit(1.0))
    # sum of word lengths == count of non-whitespace chars: one codegen
    # regexp_replace instead of an interpreted per-element aggregate
    n_chars_in_words = F.length(F.regexp_replace(t, r"\s", ""))
    mean_wl = n_chars_in_words.cast("double") / safe_words
    # '#' occurrences + ellipsis occurrences ('...' or the unicode glyph)
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    n_ellipsis = F.size(F.split(t, r"\.\.\.|…")) - 1
    lines = F.filter(F.split(t, r"\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    safe_lines = F.when(n_lines > 0, n_lines.cast("double")).otherwise(F.lit(1.0))
    bullet_lines = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike(r"^([-*•]|\d+[.)])"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda x: F.rtrim(x).rlike(r"(\.\.\.|…)$"))
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]")))
    dup_lines = n_lines - F.size(F.array_distinct(F.transform(lines, F.trim)))

    checks = {
        "rule_word_count": (n_words >= min_words) & (n_words <= max_words),
        "rule_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "rule_symbol_ratio": ((n_hash + n_ellipsis) / safe_words)
        <= max_symbol_word_ratio,
        "rule_bullet_ratio": (bullet_lines / safe_lines) <= max_bullet_ratio,
        "rule_ellipsis_ratio": (ellipsis_lines / safe_lines) <= max_ellipsis_ratio,
        "rule_alpha_ratio": (alpha_words / safe_words) >= min_alpha_word_ratio,
        "rule_dup_line_ratio": (dup_lines / safe_lines) <= max_dup_line_ratio,
    }
    out = df
    overall = F.lit(True)
    for name, cond in checks.items():
        out = out.withColumn(name, cond)
        overall = overall & F.col(name)
    return out.withColumn("gopher_pass", overall)


# PII patterns — deliberately lookaround-free so the same regex runs in
# Java (Spark) and RE2 (DuckDB) with identical matches
_PII_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\+?[0-9]{1,3}[-. (]{0,2}[0-9]{3}[-. )]{0,2}[0-9]{3}[-. ]?[0-9]{4}", "[PHONE]"),
    "ipv4": (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    kinds: "Sequence[str] | None" = None,
) -> DataFrame:
    """Redact common PII (emails, phone numbers, IPv4, SSN-shaped ids)
    with typed placeholders and count replacements per kind — the
    standard pre-training scrub pass. Chained ``regexp_replace`` only:
    per-row codegen, no shuffle, no Python. Counts are computed BEFORE
    replacement (``regexp_count``) so ``pii_total`` reports true hits
    even when patterns overlap placeholders. Patterns avoid lookarounds
    so a DuckDB (RE2) oracle matches byte-for-byte."""
    kinds = list(kinds) if kinds is not None else list(_PII_PATTERNS)
    t = F.col(text_col)
    out = df
    total = F.lit(0)
    for k in kinds:
        pat, _ = _PII_PATTERNS[k]
        cnt = F.regexp_count(t, F.lit(pat))
        out = out.withColumn(f"pii_{k}_count", cnt)
        total = total + cnt
    scrubbed = t
    # order matters: scrub in declaration order; ipv4 after phone would
    # not collide because phone requires 10+ digits in groups
    for k in kinds:
        pat, repl = _PII_PATTERNS[k]
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.withColumn(out_col or f"{text_col}_scrubbed", scrubbed).withColumn(
        "pii_total", total
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word n-gram with a benchmark/eval set (the n-gram-overlap test-set
    contamination check used for LLM corpora).

    Physical plan for 100 TB: the BENCHMARK side is small (eval sets are
    thousands of rows) — its distinct shingle set is broadcast; the
    corpus is scanned once, shingles exploded (flatMap, no shuffle) and
    matched with a broadcast semi-ish join, then one map-side-combinable
    count per doc. Corpus never shuffles on shingle. Returns
    (id, n_hits, contaminated)."""
    from feast_spark.pipeline.dedup_text import word_shingles

    bcol = bench_text_col or text_col
    bench_shingles = (
        benchmark.select(F.explode(word_shingles(F.col(bcol), n)).alias("__s"))
        .distinct()
    )
    doc_shingles = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("__s"),
    )
    hits = (
        doc_shingles.join(F.broadcast(bench_shingles), on="__s", how="inner")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .distinct()
        .join(hits, on="id", how="left")
        .select(
            "id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def ngram_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Within-document n-gram repetition stats — the "duplicate n-gram
    fraction" battery from the Gopher rules (Rae et al. 2021 A1.1) that
    ``gopher_quality_rules`` does not cover (those are line-level;
    these are token-level):

    * ``total_ngrams`` / ``distinct_ngrams`` over the normalized word
      n-grams (ALL occurrences, not the deduplicated shingle set),
    * ``dup_ngram_fraction`` = 1 − distinct/total — how much of the
      document is re-tread,
    * ``top_ngram_fraction`` = occurrences of the single most frequent
      n-gram / total — boilerplate/template detector.

    Physical plan: explode n-grams (flatMap, keeps ALL occurrences) →
    one (id, gram) count aggregate → one id-level merge (sum / count /
    max — all map-side combinable). Two shuffles on narrow rows;
    per-doc work linear. Docs with < n words produce one whole-text
    gram (fractions well-defined); empty docs are returned with zero
    counts and NULL fractions."""
    nt = normalize_text(F.col(text_col))
    pat = r"(?:(?<= )|^)(?=(" + r"\S+ " * (n - 1) + r"\S+))"
    words = word_tokens(nt)
    nw = F.size(words)
    # ALL occurrences (word_shingles distincts — wrong here)
    grams = (
        F.when(nw >= n, F.regexp_extract_all(nt, F.lit(pat), 1))
        .when(nw > 0, F.array(F.concat_ws(" ", words)))
        .otherwise(F.array().cast("array<string>"))
    )
    exploded = df.select(F.col(id_col).alias("id"), F.explode(grams).alias("__g"))
    per_gram = exploded.groupBy("id", "__g").agg(F.count(F.lit(1)).alias("__c"))
    stats = per_gram.groupBy("id").agg(
        F.sum("__c").alias("total_ngrams"),
        F.count(F.lit(1)).alias("distinct_ngrams"),
        F.max("__c").alias("__top"),
    )
    all_ids = df.select(F.col(id_col).alias("id")).distinct()
    return (
        all_ids.join(stats, on="id", how="left")
        .select(
            "id",
            F.coalesce("total_ngrams", F.lit(0)).alias("total_ngrams"),
            F.coalesce("distinct_ngrams", F.lit(0)).alias("distinct_ngrams"),
            F.round(
                1.0 - F.col("distinct_ngrams") / F.col("total_ngrams"), 6
            ).alias("dup_ngram_fraction"),
            F.round(F.col("__top") / F.col("total_ngrams"), 6).alias(
                "top_ngram_fraction"
            ),
        )
    )


def unigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
) -> DataFrame:
    """Corpus-relative fluency score: mean unigram negative log2
    probability per word (the cheap stand-in for a KenLM perplexity
    filter — low scores ≈ made of common words, high ≈ rare-word soup;
    both tails are the usual cut candidates).

    Probabilities come from the corpus itself, fully LAZILY (no eager
    driver action at plan-build time): word counts (one
    map-side-combinable aggregate, PERSISTED — the totals aggregate and
    the per-word join both read it; the returned lazy plan keeps the
    reference, so batch drivers should ``spark.catalog.clearCache()``
    between jobs, same contract as the dedup-pipeline persists) →
    one-row totals frame broadcast-cross-joined into the plan (the
    same shape as the oracle's ``CROSS JOIN tot``); each document's
    words average −log2((c + smoothing) / (total + smoothing·V)).
    Deterministic, engine-portable arithmetic (round 6)."""
    nt = normalize_text(F.col(text_col))
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_tokens(nt)).alias("__w"),
    )
    freq = words.groupBy("__w").agg(F.count(F.lit(1)).alias("__c")).persist()
    totals = freq.agg(
        F.sum("__c").alias("__total"), F.count(F.lit(1)).alias("__vocab")
    )
    scored = (
        words.join(freq, on="__w")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "__nlp",
            -F.log2(
                (F.col("__c") + F.lit(smoothing))
                / (F.col("__total") + F.lit(smoothing) * F.col("__vocab"))
            ),
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.avg("__nlp"), 6).alias("mean_neg_log2p"),
        )
    )
    all_ids = df.select(F.col(id_col).alias("id")).distinct()
    return all_ids.join(scored, on="id", how="left").select(
        "id",
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        "mean_neg_log2p",
    )

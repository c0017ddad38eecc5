"""Byte-pair-encoding (BPE) subword tokenization: merge-table apply
and distributed merge learning.

Reference parity: like WordPiece (``tokenize.py``), the reference
pipelines hand tokenization to an external library driver-side
(no distributed tokenizer exists in ExpediaGroup/feast); this module
provides the distributed BPE analogue a training-data pipeline needs.
Semantics follow the published apply step (Sennrich et al. 2016 /
GPT-2's ``bpe()``): a word starts as its character sequence; while any
adjacent token pair appears in the merge table, merge ALL
non-overlapping occurrences (left-to-right) of the LOWEST-RANK such
pair; stop when no pair is mergeable.

Design for 100 TB:

* ``bpe_encode`` is ONE Arrow-batched pandas UDF pass — embarrassingly
  parallel, no shuffle, no driver hop. Merge ranks ship once per
  executor via a Spark broadcast (a real 50k-merge table is ~1 MB).
  Per-worker memoization over distinct words (Zipfian corpora →
  >99% hit rate) degrades the per-row cost to a dict lookup per word.
* ``bpe_learn`` runs the classical word-frequency BPE trainer
  distributed: pair statistics are computed over DISTINCT words
  weighted by corpus frequency (one map-side-combinable shuffle +
  a 1-row collect per merge), never over raw token streams — the
  distinct-word table is vocabulary-sized (millions of rows at web
  scale, not trillions), so each learning round is cheap and the
  corpus is scanned exactly once up front.

Pre-tokenization is shared with WordPiece (``PRETOKEN_PATTERN``):
lowercase, ``[a-z0-9]+`` runs and single non-alphanumeric characters.
Multi-character words therefore contain ONLY ``[a-z0-9]`` — the
property the DuckDB oracle's bracket-string replay relies on
(``__spark_entry__._bpe_oracle``). Words longer than ``max_word_len``
bypass merging and are emitted as a single literal token (keeps the
oracle's merge-step unroll bounded; BPE has no UNK — single chars are
always valid tokens). There is no detokenizer: a flat BPE token stream
carries no word-boundary markers (GPT-2 uses a leading-space glyph for
this; adding one would change merge semantics), so inversion is not
defined for this operator.
"""

from __future__ import annotations

import re
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from feast_spark.pipeline.tokenize import PRETOKEN_PATTERN

# Static default merge table, rank = list position (lower merges
# first). Deterministic literal on purpose — a fixed pretrained merge
# table is what production pipelines apply, and a literal is replayable
# verbatim by the DuckDB oracle. Every pair's sides are producible:
# single characters are always available and every multi-char side is
# created by an earlier-ranked merge.
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "u"), ("o", "r"),
    ("s", "t"), ("a", "t"), ("e", "n"), ("e", "s"), ("t", "o"),
    ("t", "i"), ("ti", "on"), ("in", "g"), ("e", "d"), ("a", "l"),
    ("a", "r"), ("s", "e"), ("l", "e"), ("m", "e"), ("d", "e"),
    ("c", "o"), ("u", "n"), ("i", "s"), ("i", "t"), ("o", "f"),
    ("a", "s"), ("h", "e"), ("l", "l"), ("o", "o"), ("s", "s"),
    ("e", "e"), ("r", "o"), ("l", "i"), ("n", "t"), ("f", "or"),
    ("w", "h"), ("v", "e"), ("c", "h"), ("s", "h"), ("p", "a"),
    ("p", "r"), ("t", "r"), ("c", "a"), ("m", "a"), ("d", "i"),
    ("e", "x"), ("co", "m"), ("com", "p"), ("p", "er"), ("q", "u"),
    ("0", "0"), ("1", "9"), ("2", "0"), ("s", "u"), ("su", "p"),
    ("c", "u"), ("cu", "st"), ("w", "in"), ("win", "d"),
)


def _learn_local(
    wf: list[tuple[str, int]], n_merges: int, min_freq: int, mwl: int
) -> tuple[list[tuple[str, str]], list[int]]:
    """Driver-side learning loop over a collected (word, freq) vocab —
    the vocab-gated fast path of ``bpe_learn``. Same inner tokenizer
    (``_bpe_word``), same pair statistics (ALL adjacent positions,
    freq-weighted), same argmax ordering (freq desc, then (l, r)
    lexicographic) and ``min_freq`` early stop as the distributed
    loop, so the two paths cannot disagree."""
    merges: list[tuple[str, str]] = []
    freqs: list[int] = []
    for _ in range(n_merges):
        ranks = {p: i for i, p in enumerate(merges)}
        stats: dict[tuple[str, str], int] = {}
        for w, f in wf:
            toks = _bpe_word(w, ranks, mwl)
            for pair in zip(toks, toks[1:]):
                stats[pair] = stats.get(pair, 0) + f
        if not stats:
            break
        pair, weight = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if weight < min_freq:
            break
        merges.append(pair)
        freqs.append(weight)
    return merges, freqs


def _bpe_word(
    word: str, ranks: dict[tuple[str, str], int], max_word_len: int
) -> list[str]:
    """Straight-line BPE apply for one word (the memoized inner step)."""
    if len(word) > max_word_len or len(word) < 2:
        return [word]
    toks = list(word)
    while len(toks) > 1:
        best_rank = None
        best = None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best = (toks[i], toks[i + 1])
        if best is None:
            break
        merged = best[0] + best[1]
        out: list[str] = []
        i = 0
        while i < len(toks):
            if i < len(toks) - 1 and toks[i] == best[0] and toks[i + 1] == best[1]:
                out.append(merged)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def bpe_encode(
    df: DataFrame,
    text_col: str = "text",
    merges: Sequence[tuple[str, str]] | None = None,
    max_word_len: int = 16,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Append ``tokens_col`` (array<string>): BPE-encode ``text_col``.

    One Arrow-batched UDF pass, merge ranks broadcast once, per-worker
    distinct-word memoization. Words are matched lowercased; words over
    ``max_word_len`` chars pass through as one literal token."""
    table = tuple(merges) if merges is not None else DEFAULT_MERGES
    for left, right in table:
        if not left or not right:
            raise ValueError(f"empty merge side in pair ({left!r}, {right!r})")
    ranks = {pair: i for i, pair in enumerate(table)}
    if len(ranks) != len(table):
        raise ValueError("duplicate pair in merge table (ranks would be ambiguous)")
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(ranks)
    pat = re.compile(PRETOKEN_PATTERN)
    mwl = int(max_word_len)

    # iterator-of-batches form: memo initialized once per task, shared
    # across all Arrow batches (same rationale as wordpiece_tokenize)
    def enc(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        rk = bc.value
        memo: dict[str, list[str]] = {}
        for texts in batches:
            out = []
            for text in texts:
                if text is None:
                    # NULL text ⇒ empty token list — matches the DuckDB
                    # oracle's coalesce convention (ADVICE r04); pinned
                    # by a unit fixture in tests/test_round5_fixes.py
                    out.append([])
                    continue
                toks: list[str] = []
                for word in pat.findall(text.lower()):
                    got = memo.get(word)
                    if got is None:
                        got = _bpe_word(word, rk, mwl)
                        memo[word] = got
                    toks.extend(got)
                out.append(toks)
            yield pd.Series(out)

    enc.__annotations__ = {
        "batches": Iterator[pd.Series],
        "return": Iterator[pd.Series],
    }
    udf = pandas_udf("array<string>")(enc)
    return df.withColumn(tokens_col, udf(F.col(text_col)))


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    min_freq: int = 2,
    max_word_len: int = 16,
    with_freqs: bool = False,
    driver_vocab_rows: int | None = 1_000_000,
) -> list[tuple[str, str]] | list[tuple[str, str, int]]:
    """Learn a BPE merge table from a corpus, Spark-side.

    The classical word-frequency trainer (Sennrich et al. 2016,
    ``learn_bpe``), distributed: ONE corpus scan builds the distinct
    (word, freq) table; each learning round re-tokenizes the distinct
    words under the merges found so far (memoized UDF — identical code
    path to ``bpe_encode``, so learn and apply can never disagree),
    extracts adjacent pairs with codegen array ops, and takes the
    max-frequency pair via one combinable shuffle + a 1-row collect.
    Ties break lexicographically (left asc, right asc) — deterministic
    on any engine. Stops early when the best pair's corpus frequency
    falls below ``min_freq``.

    Words longer than ``max_word_len`` are excluded from statistics
    (mirrors the apply-side bypass). ``with_freqs`` appends each
    merge's corpus pair frequency — the value the round's argmax was
    taken over — so a correctness oracle can check the statistics, not
    just the chosen pairs.

    Vocab-gated driver loop: the expensive distributed work is the ONE
    corpus scan that builds the distinct (word, freq) table; the
    learning loop itself only ever touches that vocabulary-sized
    table. When the vocab has ≤ ``driver_vocab_rows`` rows (default
    1M ≈ tens of MB — same byte-gating pattern as
    ``dedup_text._jaccard_gram``) it is collected once and the loop
    runs driver-side through the IDENTICAL ``_bpe_word`` +
    argmax-with-lex-tie-break code, eliminating ``n_merges`` Spark
    job round-trips (16 rounds: 8.3 s → ~1.5 s at sf0.1, which has a
    30-word vocab — the per-round cost was 100% scheduler/Arrow
    overhead). Above the gate (or ``driver_vocab_rows=None``) the
    per-round distributed loop runs: one combinable shuffle + a 1-row
    collect per merge. Both paths produce identical merges (pinned by
    a test); exact integer statistics and the same deterministic
    ordering on both."""
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    spark = df.sparkSession
    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(PRETOKEN_PATTERN), F.lit(0)
                )
            ).alias("word")
        )
        .filter(
            (F.length("word") >= 2) & (F.length("word") <= int(max_word_len))
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        # the distinct-word table is vocabulary-sized (≤ millions of
        # rows at web scale) but inherits the full shuffle-partition
        # fan-out; every learning round schedules a job over it, so
        # collapsing to a handful of partitions cuts the per-round task
        # overhead ~3× (measured at sf0.1) without changing the plan
        # above it. sparkContext.defaultParallelism keeps enough
        # parallelism for a genuinely huge vocabulary.
        .coalesce(max(2, df.sparkSession.sparkContext.defaultParallelism // 8))
        .persist()
    )
    merges: list[tuple[str, str]] = []
    freqs: list[int] = []
    try:
        if driver_vocab_rows is not None and words.count() <= int(driver_vocab_rows):
            wf = [(r["word"], int(r["freq"])) for r in words.collect()]
            merges, freqs = _learn_local(wf, int(n_merges), int(min_freq), int(max_word_len))
            if with_freqs:
                return [(lft, rgt, f) for (lft, rgt), f in zip(merges, freqs)]
            return merges
        for _ in range(int(n_merges)):
            ranks = {pair: i for i, pair in enumerate(merges)}
            bc = spark.sparkContext.broadcast(ranks)
            mwl = int(max_word_len)

            def tok(ws: pd.Series) -> pd.Series:
                rk = bc.value
                return pd.Series([_bpe_word(w, rk, mwl) for w in ws])

            tok.__annotations__ = {"ws": pd.Series, "return": pd.Series}
            udf = pandas_udf("array<string>")(tok)
            toked = words.withColumn("toks", udf(F.col("word")))
            # explode of the empty pair array drops fully-merged
            # (single-token) words — no separate filter needed
            pairs = toked.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("toks"), 1, F.greatest(F.size("toks") - 1, F.lit(0))),
                        F.slice(F.col("toks"), 2, F.greatest(F.size("toks") - 1, F.lit(0))),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("pair"),
            )
            best = (
                pairs.groupBy("pair")
                .agg(F.sum("freq").alias("w"))
                .orderBy(F.col("w").desc(), F.col("pair.l").asc(), F.col("pair.r").asc())
                .limit(1)
                .collect()
            )
            # the round's only job has consumed the broadcast — release
            # its executor blocks instead of leaking one per merge
            bc.unpersist()
            if not best or best[0]["w"] < int(min_freq):
                break
            merges.append((best[0]["pair"]["l"], best[0]["pair"]["r"]))
            freqs.append(int(best[0]["w"]))
    finally:
        words.unpersist()
    if with_freqs:
        return [(left, right, f) for (left, right), f in zip(merges, freqs)]
    return merges

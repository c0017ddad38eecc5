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
) -> list[tuple[str, str]]:
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
    (mirrors the apply-side bypass)."""
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
        .persist()
    )
    merges: list[tuple[str, str]] = []
    try:
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
    finally:
        words.unpersist()
    return merges

"""Text-analysis + dedup pipeline ops on the real documents table,
cross-checked against DuckDB (independent engine) and pandas."""

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F

from feast_spark.pipeline.dedup_text import (
    exact_dedup_docs,
    exact_dup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from feast_spark.pipeline.text import (
    detect_language,
    doc_fingerprint,
    portable_hash64,
    quality_features,
    token_count,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_portable_hash_matches_duckdb(spark, docs):
    got = (
        docs.select("doc_id", portable_hash64(F.col("text")).alias("h"))
        .orderBy("doc_id")
        .toPandas()
    )
    exp = duckdb.sql(
        f"""SELECT doc_id, CAST(concat('0x', substr(md5(text),1,15)) AS BIGINT) h
            FROM '{SF}/documents.parquet' ORDER BY doc_id"""
    ).df()
    assert np.array_equal(got["h"].values, exp["h"].values)


def test_token_count_matches_duckdb(spark, docs):
    got = (
        docs.select("doc_id", token_count(F.col("text")).alias("n"))
        .orderBy("doc_id")
        .toPandas()
    )
    exp = duckdb.sql(
        f"""SELECT doc_id,
              len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) n
            FROM '{SF}/documents.parquet' ORDER BY doc_id"""
    ).df()
    assert np.array_equal(got["n"].values, exp["n"].values)


def test_quality_features(spark, docs):
    got = quality_features(docs).toPandas()
    assert (got["n_chars"] == got["text"].str.len()).all()
    assert got["quality_score"].between(0, 1).all()
    assert got["punct_ratio"].between(0, 1).all()
    # spot-check stopword ratio on a constructed doc
    one = got.iloc[0]
    assert one["n_words"] == len(one["text"].split())


def test_detect_language_deterministic(spark, docs):
    a = detect_language(docs).toPandas().sort_values("doc_id")["lang_pred"]
    b = detect_language(docs).toPandas().sort_values("doc_id")["lang_pred"]
    assert (a.values == b.values).all()
    assert set(a.unique()) <= {"en", "fr", "de", "es", "unknown"}


def test_exact_dup_groups(spark, docs):
    groups = exact_dup_groups(docs).toPandas()
    # group sizes sum to corpus size
    assert groups["group_size"].sum() == docs.count()
    deduped = exact_dedup_docs(docs)
    assert deduped.count() == len(groups)
    # dedup is stable: representative == min doc_id per group
    again = exact_dedup_docs(docs).toPandas()
    assert sorted(again["doc_id"]) == sorted(
        exact_dedup_docs(docs).toPandas()["doc_id"]
    )


def test_minhash_signature_matches_duckdb(spark, docs):
    sigs = (
        minhash_signatures(docs, num_hashes=4, shingle_n=2)
        .filter(F.col("signature").isNotNull())
        .orderBy("id")
        .toPandas()
    )
    from feast_spark.pipeline.dedup_text import MERSENNE31, _affine_params

    params = _affine_params(4, 1)
    # independent DuckDB computation of the same signature
    sig_exprs = ", ".join(
        f"""list_min(list_transform(hashes, h -> ({a} * h + {b}) % {MERSENNE31})) s{i}"""
        for i, (a, b) in enumerate(params)
    )
    exp = duckdb.sql(
        f"""
        WITH norm AS (
          SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') nt
          FROM '{SF}/documents.parquet'
        ), words AS (
          SELECT doc_id, list_filter(string_split(nt, ' '), x -> x <> '') w FROM norm
        ), sh AS (
          SELECT doc_id,
            list_distinct(list_transform(
              generate_series(1, greatest(len(w) - 1, 1)),
              i -> concat(w[i], ' ', w[i+1]))) shingles
          FROM words WHERE len(w) >= 2
        ), hs AS (
          SELECT doc_id, list_transform(shingles,
            s -> CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT) % {MERSENNE31}) hashes
          FROM sh
        )
        SELECT doc_id, {sig_exprs} FROM hs ORDER BY doc_id
        """
    ).df()
    got_ids = sigs["id"].values
    # docs with >= 2 words only (both sides filter the same way)
    common = set(got_ids) & set(exp["doc_id"].values)
    assert len(common) > 100
    exp_idx = exp.set_index("doc_id")
    got_idx = sigs.set_index("id")
    for doc in sorted(common)[:200]:
        g = got_idx.loc[doc, "signature"]
        e = [exp_idx.loc[doc, f"s{i}"] for i in range(4)]
        assert list(g) == e, doc


def test_ngram_jaccard_pairs_vs_pandas(spark, docs):
    got = ngram_jaccard_pairs(docs, n=2, threshold=0.5).toPandas()
    # pandas oracle: brute-force all-pairs on normalized 2-gram shingles
    pdf = docs.select("doc_id", "text").toPandas()
    import re

    def shingles(t):
        w = [x for x in re.sub(r"\s+", " ", t.strip().lower()).split(" ") if x]
        return set(" ".join(w[i : i + 2]) for i in range(max(len(w) - 1, 1))) if w else set()

    sh = {r.doc_id: shingles(r.text) for r in pdf.itertuples()}
    ids = sorted(sh)
    exp_pairs = set()
    for i, a in enumerate(ids):
        if not sh[a]:
            continue
        for b in ids[i + 1 :]:
            if not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.5:
                exp_pairs.add((a, b))
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    assert got_pairs == exp_pairs


def test_lsh_superset_recall(spark, docs):
    """LSH candidates (verified) find the high-similarity pairs the
    exact index finds — at 0.8 threshold with 8 bands of 2 rows, the
    expected recall for j>=0.8 pairs is ~1."""
    exact = set(
        map(
            tuple,
            ngram_jaccard_pairs(docs, n=2, threshold=0.9)
            .select("id_a", "id_b")
            .toPandas()
            .values,
        )
    )
    lsh = set(
        map(
            tuple,
            lsh_candidate_pairs(
                docs, num_hashes=16, bands=8, shingle_n=2, threshold=0.9
            )
            .select("id_a", "id_b")
            .toPandas()
            .values,
        )
    )
    assert lsh <= exact or not exact  # verified candidates never exceed exact
    if exact:
        assert len(lsh & exact) / len(exact) >= 0.9


def test_simhash_matches_duckdb(spark, docs):
    got = simhash(docs).filter(F.col("simhash").isNotNull()).orderBy("id").toPandas()
    bit_exprs = " + ".join(
        f"""(CASE WHEN list_sum(list_transform(hashes,
             h -> CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END)) > 0
             THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"""
        for i in range(32)
    )
    exp = duckdb.sql(
        f"""
        WITH norm AS (
          SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') nt
          FROM '{SF}/documents.parquet'
        ), words AS (
          SELECT doc_id, list_filter(string_split(nt, ' '), x -> x <> '') w FROM norm
        ), hs AS (
          SELECT doc_id, list_transform(w,
            s -> CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)) hashes
          FROM words WHERE len(w) > 0
        )
        SELECT doc_id, {bit_exprs} sh FROM hs ORDER BY doc_id
        """
    ).df()
    merged = got.merge(exp, left_on="id", right_on="doc_id")
    assert len(merged) == len(got)
    assert np.array_equal(merged["simhash"].values, merged["sh"].values)


def test_simhash_pairs_sane(spark, docs):
    pairs = simhash_pairs(docs, max_hamming=3).toPandas()
    assert (pairs["hamming"] <= 3).all()
    assert (pairs["id_a"] < pairs["id_b"]).all()


def test_winnowing_fingerprints_properties(spark):
    """Winnowing guarantees: (a) deterministic, (b) any shared substring
    of length >= k + w - 1 yields at least one shared fingerprint, and
    (c) fingerprints are position-robust (a prefix insertion keeps most
    of the original fingerprint set)."""
    from feast_spark.pipeline.text import winnowing_fingerprints

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, "PREFIX INSERTED HERE " + base),
            (3, "completely different content about financial markets"),
            (4, "tiny"),  # shorter than k -> no fingerprints
        ],
        "doc_id long, text string",
    )
    fp = winnowing_fingerprints(docs, k=5, w=4).toPandas()
    sets = {i: set(g["fingerprint"]) for i, g in fp.groupby("id")}
    # determinism
    fp2 = winnowing_fingerprints(docs, k=5, w=4).toPandas()
    sets2 = {i: set(g["fingerprint"]) for i, g in fp2.groupby("id")}
    assert sets == sets2
    # shared-substring guarantee: docs 1 and 2 share the whole base text
    overlap = len(sets[1] & sets[2]) / len(sets[1])
    assert overlap > 0.8, overlap
    # unrelated docs share (almost) nothing
    assert len(sets[1] & sets[3]) <= 1
    # shorter than k: no fingerprints
    assert 4 not in sets


def test_gopher_quality_rules(spark):
    import pandas as pd

    from feast_spark.pipeline.text import gopher_quality_rules

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the quick brown fox jumps over the lazy dog " * 10,  # clean
                "- a\n- b\n- c",  # all bullets
                "####### " * 20,  # symbol soup, no alpha
                "same line\nsame line\nsame line\nother",  # dup lines
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    out = gopher_quality_rules(df, min_words=5).toPandas().set_index("doc_id")
    assert bool(out.loc[1, "gopher_pass"])
    assert not out.loc[2, "rule_bullet_ratio"]
    assert not out.loc[3, "rule_alpha_ratio"]
    assert not out.loc[3, "rule_symbol_ratio"]
    assert not out.loc[4, "rule_dup_line_ratio"]
    # empty text: no crash, word-count rule fails, ratios vacuous-pass
    empty = spark.createDataFrame(pd.DataFrame({"doc_id": [9], "text": [""]}))
    e = gopher_quality_rules(empty, min_words=5).toPandas().iloc[0]
    assert not e["rule_word_count"] and not e["gopher_pass"]


def test_pii_scrub_redacts_and_counts(spark):
    import pandas as pd

    from feast_spark.pipeline.text import pii_scrub

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "mail a.b+c@test.org and x@y.io; call +1 (555) 123-4567; "
                "host 10.0.0.255; id 123-45-6789",
                "no pii here",
            ],
        }
    )
    out = pii_scrub(spark.createDataFrame(pdf)).toPandas().set_index("doc_id")
    assert out.loc[1, "pii_email_count"] == 2
    assert out.loc[1, "pii_phone_count"] == 1
    assert out.loc[1, "pii_ipv4_count"] == 1
    assert out.loc[1, "pii_ssn_count"] == 1
    s = out.loc[1, "text_scrubbed"]
    assert "[EMAIL]" in s and "[PHONE]" in s and "[IP]" in s and "[SSN]" in s
    assert "@" not in s and "555" not in s
    assert out.loc[2, "pii_total"] == 0
    assert out.loc[2, "text_scrubbed"] == "no pii here"


def test_decontaminate_flags_overlap_only(spark):
    import pandas as pd

    from feast_spark.pipeline.text import decontaminate

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "alpha beta gamma delta epsilon",  # overlaps bench
                    "zeta eta theta iota kappa",  # disjoint
                    "",  # empty -> never contaminated
                ],
            }
        )
    )
    bench = spark.createDataFrame(
        pd.DataFrame({"text": ["the phrase alpha beta gamma appears here"]})
    )
    out = decontaminate(docs, bench, n=3).toPandas().set_index("id")
    assert bool(out.loc[1, "contaminated"]) and out.loc[1, "n_hits"] == 1
    assert not out.loc[2, "contaminated"]
    assert not out.loc[3, "contaminated"]


def test_ngram_repetition_detects_boilerplate(spark):
    import pandas as pd

    from feast_spark.pipeline.text import ngram_repetition

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "buy now " * 20,                    # one bigram repeated
                "all words here are fully unique",  # no repetition
                "",                                 # empty
            ],
        }
    )
    out = (
        ngram_repetition(spark.createDataFrame(pdf), n=2)
        .toPandas()
        .set_index("id")
    )
    assert out.loc[1, "top_ngram_fraction"] > 0.4  # 'buy now'/'now buy' dominate
    assert out.loc[1, "dup_ngram_fraction"] > 0.9
    assert out.loc[2, "dup_ngram_fraction"] == 0.0
    assert out.loc[2, "top_ngram_fraction"] == pd.Series([1 / 5]).round(6)[0]
    assert out.loc[3, "total_ngrams"] == 0 and pd.isna(out.loc[3, "dup_ngram_fraction"])


def test_unigram_logprob_orders_common_vs_rare(spark):
    import pandas as pd

    from feast_spark.pipeline.text import unigram_logprob_score

    # 'common' appears many times; 'xylophone...' words once each
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "common common common common",
                "xylophone quixotic zephyr",
                "",
            ],
        }
    )
    out = (
        unigram_logprob_score(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("id")
    )
    # common-word doc scores LOWER (more probable) than rare-word doc
    assert out.loc[1, "mean_neg_log2p"] < out.loc[2, "mean_neg_log2p"]
    assert out.loc[3, "n_words"] == 0 and pd.isna(out.loc[3, "mean_neg_log2p"])

"""Whitespace-stress parity: engine vs DuckDB oracle on documents
containing tabs, newlines, and runs of spaces.

Guards the bug class found in review pass 5: an ``rf``-string oracle
shipped ``'\\\\s+'`` to DuckDB — a regex for a literal backslash-s, so
its text normalization was a NO-OP that only passed the gate because
the generated testdata contains no unusual whitespace. This test makes
the whitespace path load-bearing for every text-normalizing oracle.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def stress_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stress")
    docs = pd.DataFrame(
        {
            "doc_id": list(range(10)),
            "text": [
                "plain simple text here",
                "tabbed\ttext\twith\ttabs here",
                "multi   space    run   text",
                "newline\nseparated\nwords here",
                "  leading and trailing  ",
                "MIXED \t Case\n  And   Gaps",
                "tabbed\ttext\twith\ttabs here",  # dup of doc 1 (after norm)
                "x",
                "mail a.b+c@test.org\tcall +1 (555) 123-4567\nip 10.0.0.1 ssn 123-45-6789",
                "- bullet\n- bullet\n1. numbered…\nsame\nsame\n###",
            ],
            "lang": ["en"] * 10,
            "source": ["s0"] * 10,
            "n_chars": [len(t) for t in [
                "plain simple text here",
                "tabbed\ttext\twith\ttabs here",
                "multi   space    run   text",
                "newline\nseparated\nwords here",
                "  leading and trailing  ",
                "MIXED \t Case\n  And   Gaps",
                "tabbed\ttext\twith\ttabs here",
                "x",
                "mail a.b+c@test.org\tcall +1 (555) 123-4567\nip 10.0.0.1 ssn 123-45-6789",
                "- bullet\n- bullet\n1. numbered…\nsame\nsame\n###",
            ]],
        }
    )
    # single parquet FILE (like the driver's testdata), not a Spark dir
    docs.to_parquet(str(d / "documents.parquet"), index=False)
    return str(d)


@pytest.mark.parametrize(
    "qname",
    [
        "minhash_signatures",
        "ngram_jaccard",
        "simhash",
        "exact_dup_groups",
        "token_counts",
        "winnowing",
        "pack_sequences",
        "gopher_rules",
        "pii_scrub",
        "decontaminate",
        "chunk_sequences",
        "ngram_repetition",
        "unigram_logprob",
    ],
)
def test_oracle_matches_on_hostile_whitespace(spark, stress_dir, qname):
    got = entry.queries()[qname](spark, stress_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{stress_dir}/documents.parquet'"
    )
    exp = con.execute(entry.oracle_sql()[qname]).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    g = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    e = exp[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    assert len(g) == len(e), f"{qname}: {len(g)} vs {len(e)} rows"
    for c in cols:
        a, b = g[c], e[c]
        if a.dtype.kind in "fc" or b.dtype.kind in "fc":
            av = a.astype(float).values
            bv = b.astype(float).values
            both_nan = np.isnan(av) & np.isnan(bv)
            assert ((av == bv) | both_nan).all(), f"{qname}.{c}"
        else:
            assert (a.astype(str).values == b.astype(str).values).all(), f"{qname}.{c}"

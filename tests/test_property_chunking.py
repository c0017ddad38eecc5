"""Property-based checks for chunk_sequences: every token covered,
overlap exact, chunk boundaries reproducible — against a brute-force
Python reference over randomized sequence lengths."""

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from feast_spark.pipeline.sampling import chunk_sequences


def _expected_chunks(tokens, max_len, stride):
    n = len(tokens)
    if n == 0:
        return []
    if n <= max_len:
        return [tokens]
    n_chunks = -(-(n - max_len) // stride) + 1  # ceil
    return [tokens[i * stride : i * stride + max_len] for i in range(n_chunks)]


@pytest.mark.slow
@settings(max_examples=15, deadline=None)
@given(
    lengths=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=8),
    max_len=st.integers(min_value=4, max_value=64),
    overlap_frac=st.integers(min_value=0, max_value=3),
)
def test_chunk_sequences_matches_reference(spark, lengths, max_len, overlap_frac):
    overlap = (max_len * overlap_frac) // 4  # 0 .. 3/4 of max_len
    stride = max_len - overlap
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(len(lengths))),
            "tokens": [list(range(n)) for n in lengths],
        }
    )
    df = spark.createDataFrame(pdf, "doc_id long, tokens array<int>")
    got = (
        chunk_sequences(df, max_len=max_len, overlap=overlap, n_tok_col=None)
        .toPandas()
        .sort_values(["id", "chunk_idx"])
    )
    for doc_id, n in enumerate(lengths):
        exp = _expected_chunks(list(range(n)), max_len, stride)
        g = got[got["id"] == doc_id]
        assert len(g) == len(exp), (doc_id, n, max_len, overlap)
        for (_, row), e in zip(g.iterrows(), exp):
            assert list(row["chunk_tokens"]) == e
            assert row["chunk_len"] == len(e)
        if n > 0:
            # full coverage + tail reached
            covered = {t for c in g["chunk_tokens"] for t in c}
            assert covered == set(range(n))

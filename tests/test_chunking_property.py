"""Property test: chunk_documents ≡ the brute-force token-window reference
for arbitrary token streams and any (max_tokens, overlap) config — the regex
formulation is an optimization, not a semantic variant."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tabbyld_spark.operators.chunking import chunk_documents

# tokens from a tiny alphabet so repeats/overlaps are common; sizes bracket
# the interesting boundaries (1 token, < max, == max, spanning many strides)
_token = st.text(alphabet="abz", min_size=1, max_size=3)
_doc = st.lists(_token, min_size=1, max_size=40)


def _brute(tokens, max_tokens, overlap):
    stride = max_tokens - overlap
    return [
        (k, " ".join(tokens[s : s + max_tokens]), min(s + max_tokens, len(tokens)) - s)
        for k, s in enumerate(range(0, len(tokens), stride))
    ]


@given(
    docs=st.lists(_doc, min_size=1, max_size=8),
    max_tokens=st.integers(min_value=2, max_value=12),
    data=st.data(),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_chunking_matches_reference(spark, docs, max_tokens, data):
    overlap = data.draw(st.integers(min_value=0, max_value=max_tokens - 1))
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(df, max_tokens, overlap).collect()
    )
    want = sorted(
        (i, k, txt, n)
        for i, toks in enumerate(docs)
        for k, txt, n in _brute(toks, max_tokens, overlap)
    )
    assert got == want

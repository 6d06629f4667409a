"""Property-based differential test: jaccard_pairs vs a pure-Python
reference on randomized documents (the reference's randomized-keys
pattern, SparkTestBase.scala:45-48, upgraded to hypothesis)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from celeborn_spark.operators import dedup as D

WORDS = ["spark", "scan", "join", "agg", "sort", "merge", "batch", "row", "col", "map"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=15),
    min_size=2,
    max_size=6,
)


def _py_jaccard_pairs(texts: list[str], n: int = 3) -> dict[tuple[int, int], float]:
    def shingles(t: str) -> set[str]:
        toks = t.split(" ")
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    out = {}
    sh = {i: shingles(t) for i, t in enumerate(texts)}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            if inter:
                out[(a, b)] = inter / len(sh[a] | sh[b])
    return out


@given(docs_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_jaccard_pairs_match_python_reference(spark, doc_lists):
    texts = [" ".join(words) for words in doc_lists]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.0).collect()
    }
    want = _py_jaccard_pairs(texts)
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-6, (k, got[k], v)

"""ROUGE-L (LCS F1) parity: the engine's prefix-max rolling-row LCS kernel
vs a naive full-table DP, and the Spark operator vs a pure-Python scorer."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geometric_aware_retrieval_v2_spark.operators.evalops import _lcs_len, rare_rouge


def _lcs_naive(a: list[str], b: list[str]) -> int:
    m, n = len(a), len(b)
    c = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            if a[i - 1] == b[j - 1]:
                c[i][j] = c[i - 1][j - 1] + 1
            else:
                c[i][j] = max(c[i - 1][j], c[i][j - 1])
    return c[m][n]


@given(
    st.lists(st.sampled_from("abcd"), max_size=24),
    st.lists(st.sampled_from("abcd"), max_size=24),
)
@settings(max_examples=200, deadline=None)
def test_lcs_kernel_matches_naive_dp(a, b):
    assert _lcs_len(a, np.asarray(b, dtype=object)) == _lcs_naive(a, b)


def test_lcs_edges():
    assert _lcs_len([], np.asarray([], dtype=object)) == 0
    assert _lcs_len(["x"], np.asarray([], dtype=object)) == 0
    assert _lcs_len(["x", "y"], np.asarray(["y", "x"], dtype=object)) == 1
    assert _lcs_len(list("abcbdab"), np.asarray(list("bdcaba"), dtype=object)) == 4


def _rouge_l_py(answer: str, reference: str, max_tokens=None) -> float:
    import re

    tok = lambda s: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
    a, b = tok(answer[:1000]), tok(reference)
    if max_tokens:
        a, b = a[:max_tokens], b[:max_tokens]
    lcs = _lcs_naive(a, b)
    return 2.0 * lcs / (len(a) + len(b)) if (len(a) + len(b)) and lcs else 0.0


def test_rare_rouge_operator_matches_python(spark):
    cases = [
        (0, ["the quick brown fox jumps"], "the lazy brown dog jumps high"),
        (1, ["alpha beta gamma"], "delta epsilon"),
        (2, ["Punctuation, splits; tokens!"], "punctuation splits tokens"),
        (3, [""], "nonempty reference"),
        (4, ["same text exactly"], "same text exactly"),
    ]
    df = spark.createDataFrame(
        cases, schema="case_id long, docs array<string>, reference string"
    )
    got = {r.case_id: r.rouge_l for r in rare_rouge(df, max_tokens=30).collect()}
    for cid, docs, ref in cases:
        want = round(_rouge_l_py(" ".join(docs), ref, max_tokens=30), 6)
        assert got[cid] == pytest.approx(want, abs=1e-9), cid

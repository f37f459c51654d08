"""Property-based cross-checks (hypothesis): the Catalyst expression
pipelines (normalize/tokens/shingles/jaccard) agree with independent
pure-Python mirrors on arbitrary text — catching expression-semantics bugs
(regex dialect, split-on-empty, slice bounds) the fixture corpus can't.

Budget-conscious: few examples, several rows per example, deadline off
(Spark job latency dominates, not the property)."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ethical_data_ingestion_spark.operators.text import (
    fingerprint,
    n_tokens,
    normalize_text,
    shingles,
)

# words over a small alphabet + spaces, echoing the fixture's vocabulary
# shape but letting hypothesis explore whitespace runs and short docs
_texts = st.lists(
    st.text(alphabet="ab c", min_size=1, max_size=40), min_size=1, max_size=6
)


def _py_norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower()).strip()


def _py_shingles(s: str, k: int = 3) -> list[str]:
    toks = _py_norm(s).split(" ")
    n = max(len(toks) - k + 1, 1)
    out, seen = [], set()
    for i in range(n):
        sh = " ".join(toks[i : i + k])
        if sh not in seen:
            seen.add(sh)
            out.append(sh)
    return out


@settings(max_examples=8, deadline=None)
@given(_texts)
def test_shingles_match_python_mirror(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {r.i: list(r.sh) for r in df.select("i", shingles("t", 3).alias("sh")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_shingles(t, 3), repr(t)


@settings(max_examples=8, deadline=None)
@given(_texts)
def test_token_count_matches_split(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {r.i: r.n for r in df.select("i", n_tokens("t").alias("n")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == len(t.split(" ")), repr(t)


@settings(max_examples=8, deadline=None)
@given(st.text(alphabet="xy z\t\n", min_size=0, max_size=60))
def test_fingerprint_whitespace_invariant(spark, text):
    messy = "  " + text.replace(" ", "   ") + "\t"
    df = spark.createDataFrame([(text, messy)], "a string, b string")
    row = df.select(
        fingerprint("a").alias("fa"), fingerprint("b").alias("fb")
    ).collect()[0]
    # fingerprints see through whitespace noise (same normalized form)
    assert row.fa == row.fb
    norm = df.select(normalize_text("a").alias("n")).collect()[0].n
    assert norm == _py_norm(text)

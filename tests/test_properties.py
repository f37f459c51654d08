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


_words = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6), min_size=2, max_size=30
)


@settings(max_examples=6, deadline=None)
@given(_words)
def test_fastss_editdist_join_matches_bruteforce(spark, words):
    """FastSS 2-deletion candidate generation + levenshtein verify must
    equal brute force on ARBITRARY short strings — the losslessness claim
    of editdist_name_pairs, explored beyond the fixture's vocabulary."""
    import itertools
    import os
    import tempfile

    from ethical_data_ingestion_spark.registry import QUERIES, _load_everything

    _load_everything()
    df = spark.createDataFrame([(w,) for w in words], "p_name string")
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "part.parquet"))
    got = {
        (r.name_a, r.name_b)
        for r in QUERIES["editdist_name_pairs"](spark, d).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(set(words)), 2)
        if lev(a, b) <= 2
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=1, max_value=5000), st.integers(min_value=2, max_value=10))
def test_ntile_closed_form_matches_spark_ntile(spark, n, k):
    """order_price_deciles computes NTILE(k) in closed form from global
    ranks; the formula must agree with Spark's own ntile() for arbitrary
    (n rows, k buckets) — including n < k and non-divisible cases."""
    from pyspark.sql import Window

    df = spark.range(n).select(F.col("id").alias("rn"))
    base, rem = divmod(n, k)
    big = base + 1
    cut = rem * big
    rn = F.col("rn")
    if base == 0:
        closed = (rn + 1).cast("int")
    else:
        closed = (
            F.when(rn < cut, F.floor(rn / big))
            .otherwise(rem + F.floor((rn - cut) / base))
            + 1
        ).cast("int")
    w = Window.orderBy("rn")
    out = df.select(
        closed.alias("closed"), F.ntile(k).over(w).alias("native")
    ).filter(F.col("closed") != F.col("native"))
    assert out.count() == 0


# --- hashed-projection embedder stand-in (operators/embed.py) ----------

_doc_texts = st.lists(
    st.text(alphabet="abcdef gh\t", min_size=0, max_size=80),
    min_size=1,
    max_size=8,
)


@settings(max_examples=50, deadline=None)
@given(_doc_texts)
def test_hashed_embedder_mass_conservation(texts):
    """Pure-Python properties of the stand-in model (no Spark needed):
    each token contributes exactly ±1 to exactly one bucket, so the sum
    of |components| is ≤ token count (cancellation only reduces it) and
    the L1 mass has token-count parity; nnz ≤ min(dim, tokens)."""
    import numpy as np

    from ethical_data_ingestion_spark.operators.embed import (
        hashed_projection_model,
    )

    model = hashed_projection_model(dim=16)
    out = model(texts)
    assert out.shape == (len(texts), 16)
    for t, vec in zip(texts, out):
        n_tok = len(t.lower().split())
        l1 = int(np.abs(vec).sum())
        assert l1 <= n_tok
        assert (n_tok - l1) % 2 == 0  # cancellation removes ±1 PAIRS
        assert int((vec != 0).sum()) <= min(16, n_tok)


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="abc d", min_size=1, max_size=60))
def test_hashed_embedder_batch_invariance(text):
    """A text's vector must not depend on its batch neighbors — the
    property that makes the Arrow-batched UDF deterministic under any
    partitioning."""
    from ethical_data_ingestion_spark.operators.embed import (
        hashed_projection_model,
    )

    model = hashed_projection_model(dim=32)
    alone = model([text])[0]
    batched = model(["padding one", text, "padding two"])[1]
    assert (alone == batched).all()


# PII-ish fragments interleaved with noise: hypothesis explores partial
# matches (truncated SSNs, digit runs straddling the card bounds, emails
# missing TLDs) where regex-dialect drift between Java and RE2/Python
# would first show up.
_pii_frags = st.lists(
    st.sampled_from(
        [
            "a@b.co",
            "a@b.c",          # TLD too short — must NOT match
            "x.y%z@mail.example.org",
            "555-123-4567",
            "555 123 4567",
            "5551234567",     # no separators — must NOT match (phone)
            "123-45-6789",
            "123-456-789",    # wrong grouping
            "4111 1111 1111 1111",
            "4111111111111",  # 13 bare digits — card matches
            "12 34",
            "plain words",
            "trailing@",
        ]
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=12, deadline=None)
@given(frags=_pii_frags)
def test_pii_counts_match_python_re(spark, frags):
    """Spark's regexp_count over the Java dialect agrees with Python re
    for every PII pattern on adversarial near-miss fragments (the same
    patterns the DuckDB oracle runs under RE2)."""
    from ethical_data_ingestion_spark.operators.text import (
        PII_PATTERNS,
        pii_counts,
    )

    text = " ".join(frags)
    row = (
        spark.createDataFrame([(text,)], "t string")
        .select(*pii_counts("t"))
        .first()
    )
    for name, pat, _tok in PII_PATTERNS:
        assert row[f"n_{name}"] == len(re.findall(pat, text)), (
            name,
            text,
        )


# --- UniMax water-filling: closed-form waterline vs iterative reference ---

@given(
    st.lists(st.integers(min_value=1, max_value=10_000), min_size=1,
             max_size=40),
    st.integers(min_value=1, max_value=200_000),
)
@settings(max_examples=200, deadline=None)
def test_unimax_waterline_closed_form_matches_iterative(caps, budget):
    """The one-pass prefix-sum cap test used by `unimax_allocation_stats`
    (sorted ascending: capped iff c_i*(n-i+1) + prefix_i < B) must agree
    with the obvious iterative water-filling on arbitrary capacities."""
    caps = sorted(caps)
    n = len(caps)

    # closed form (what the SQL window computes)
    prefix = 0
    closed = []
    for i, c in enumerate(caps):
        closed.append(c * (n - i) + prefix < budget)
        prefix += c
    capped_sum = sum(c for c, f in zip(caps, closed) if f)
    n_unc = n - sum(closed)
    fair = (budget - capped_sum) / n_unc if n_unc else None
    alloc_closed = [
        float(c) if f else fair for c, f in zip(caps, closed)
    ]

    # iterative reference: repeatedly cap any group whose equal share of
    # the remaining budget exceeds its capacity
    remaining = set(range(n))
    rem_budget = budget
    alloc_iter = [None] * n
    while remaining:
        share = rem_budget / len(remaining)
        newly = [i for i in remaining if caps[i] < share]
        if not newly:
            for i in remaining:
                alloc_iter[i] = share
            break
        for i in newly:
            alloc_iter[i] = float(caps[i])
            rem_budget -= caps[i]
            remaining.discard(i)
    assert all(a is not None for a in alloc_iter)

    for a, b in zip(alloc_closed, alloc_iter):
        assert abs(a - b) < 1e-6, (caps, budget, alloc_closed, alloc_iter)
    # conservation: min(total capacity, budget) is fully allocated
    assert abs(sum(alloc_closed) - min(sum(caps), budget)) < 1e-6

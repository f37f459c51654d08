"""Round-trip proofs for the materialized substring-dedup pass
(`substring_dedup_emit`): its accounting must equal the pricing panel's,
and — brute-forced from the raw corpus, independently of the SA/LCP
machinery — no duplicated window of >= threshold original tokens may
survive the cut."""

from __future__ import annotations

from collections import defaultdict

from ethical_data_ingestion_spark import registry
from ethical_data_ingestion_spark.io import load_table
from ethical_data_ingestion_spark.queries import spans_q

SF_DIR = "/root/testdata/sf0.001"
L = spans_q._EMIT_THRESHOLD


def test_emit_accounting_matches_pricing_panel(spark):
    """The emit pass's removed-token mass, affected-doc count, and corpus
    total must equal substring_dedup_removal_stats' row at the emit
    threshold — the two queries price the SAME pass."""
    emit = registry.QUERIES["substring_dedup_emit"](spark, SF_DIR).collect()
    stats = {
        r.span_threshold: r
        for r in registry.QUERIES["substring_dedup_removal_stats"](
            spark, SF_DIR
        ).collect()
    }
    s = stats[L]
    assert sum(r.removed_tokens for r in emit) == s.covered_tokens
    assert sum(1 for r in emit if r.removed_tokens > 0) == s.n_docs_affected
    assert sum(r.orig_tokens for r in emit) == s.total_tokens
    assert len(emit) == load_table(spark, SF_DIR, "documents").count()


def test_no_duplicated_window_survives(spark):
    """Brute force (third implementation, no suffix machinery): every
    occurrence of every L-token window appearing at >= 2 distinct
    (doc, pos) sites in the ORIGINAL corpus must be fully removed — the
    maxLCP >= L interval union covers each such position by the
    suffix-array neighbor property."""
    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    occ: dict[tuple, list] = defaultdict(list)
    for d, toks in docs.items():
        for p in range(len(toks) - L + 1):
            occ[tuple(toks[p : p + L])].append((d, p + 1))
    dup_positions = set()
    for sites in occ.values():
        if len(sites) >= 2:
            for d, p in sites:
                for j in range(p, p + L):
                    dup_positions.add((d, j))
    assert dup_positions, "fixture must contain duplicated windows"
    retained = {
        (r.doc_id, r.i)
        for r in spans_q._retained_tokens(spark, SF_DIR, L).collect()
    }
    survivors = dup_positions & retained
    assert not survivors, f"{len(survivors)} duplicated positions survived"


def test_emit_text_token_counts_consistent(spark):
    """The emitted text is exactly retained_tokens whitespace tokens, and
    the three counters always reconcile."""
    emit = registry.QUERIES["substring_dedup_emit"](spark, SF_DIR).collect()
    for r in emit:
        n = 0 if r.retained_text == "" else len(r.retained_text.split(" "))
        assert n == r.retained_tokens, r.doc_id
        assert r.orig_tokens == r.retained_tokens + r.removed_tokens, r.doc_id

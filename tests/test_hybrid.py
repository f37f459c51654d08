"""Hybrid BM25+dense RRF retrieval (round-9 verdict item 4): fusion must
BEAT both single retrievers on self-retrieval MRR, and the fused output
must reconcile exactly with its component rank lists."""

from __future__ import annotations

import pytest

from ethical_data_ingestion_spark import registry
from ethical_data_ingestion_spark.queries import hybrid_q


def _own_mrr(rows, rank_attr, probes):
    tot = 0.0
    for q in probes:
        own = [
            getattr(r, rank_attr)
            for r in rows
            if r.query_id == q and r.doc_id == q
            and getattr(r, rank_attr) is not None
        ]
        tot += 1.0 / own[0] if own else 0.0
    return tot / len(probes)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_hybrid_beats_both_single_retrievers_on_mrr(spark, sf):
    """The point of fusion: own-document MRR of the fused ranking is
    strictly above BOTH the BM25-only and the dense-only MRR (the two
    retrievers fail on DIFFERENT probes — rank fusion recovers both
    failure classes). Measured over the full un-truncated fused table."""
    fused = hybrid_q._hybrid_fused(spark, sf).collect()
    probes = list(range(hybrid_q._HYB_PROBES))
    lex = _own_mrr(fused, "lex_rank", probes)
    sem = _own_mrr(fused, "sem_rank", probes)
    hyb = _own_mrr(fused, "hybrid_rank", probes)
    assert hyb > lex, (hyb, lex)
    assert hyb > sem, (hyb, sem)


def test_fused_scores_reconcile_with_component_ranks(spark):
    """rrf_score must equal the sum of round(1/(K+rank), 6) over the
    retrievers that returned the doc — recomputed in Python from the
    output's own rank columns."""
    rows = registry.QUERIES["hybrid_retrieval_topk"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    K = hybrid_q._HYB_RRF_K
    for r in rows:
        want = 0.0
        if r.lex_rank is not None:
            want += round(1.0 / (K + r.lex_rank), 6)
        if r.sem_rank is not None:
            want += round(1.0 / (K + r.sem_rank), 6)
        assert abs(r.rrf_score - want) < 1e-9, r
        assert r.lex_rank is not None or r.sem_rank is not None, r


def test_hybrid_ranks_dense_and_contiguous(spark):
    """Per query: hybrid_rank is 1..k with no gaps, ordered by
    (rrf_score desc, doc_id) — the deterministic total order the hash
    gate relies on."""
    rows = registry.QUERIES["hybrid_retrieval_topk"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.hybrid_rank)
        assert [r.hybrid_rank for r in rs] == list(range(1, len(rs) + 1)), q
        keys = [(-r.rrf_score, r.doc_id) for r in rs]
        assert keys == sorted(keys), q

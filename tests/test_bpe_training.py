"""Invariants of the iterative BPE trainer (round 7, verdict item 4)."""

from __future__ import annotations

from ethical_data_ingestion_spark import registry

SF_DIR = "/root/testdata/sf0.001"


def test_bpe_training_rounds_invariants(spark):
    rows = (
        registry.QUERIES["bpe_training_rounds"](spark, SF_DIR)
        .orderBy("merge_round")
        .collect()
    )
    assert [r.merge_round for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) >= 5  # verdict contract: >= 5 real merge rounds

    # the merge list grows monotonically: every round adds a NEW symbol
    # (a concatenation that could not have existed before it was merged)
    merged = [r.merged for r in rows]
    assert len(set(merged)) == len(merged)
    for r in rows:
        assert r.merged == r.sym_a + r.sym_b

    # every picked pair had corpus support, and each merge collapses at
    # least one occurrence: corpus symbol count strictly decreases
    assert all(r.pair_weight >= 1 for r in rows)
    symbols = [r.corpus_symbols for r in rows]
    assert all(a > b for a, b in zip(symbols, symbols[1:]))

    # greedy non-overlap: a round removes at most pair_weight occurrences
    for prev, cur in zip(rows, rows[1:]):
        assert prev.corpus_symbols - cur.corpus_symbols <= cur.pair_weight


def test_bpe_first_round_matches_candidate_panel(spark):
    """Round 1's argmax must be the top row of bpe_merge_candidates (the
    single count step this loop generalizes) on the same corpus —
    character-level pairs before any merge exists."""
    top = (
        registry.QUERIES["bpe_merge_candidates"](spark, SF_DIR)
        .limit(1)
        .collect()[0]
    )
    r1 = (
        registry.QUERIES["bpe_training_rounds"](spark, SF_DIR)
        .filter("merge_round = 1")
        .collect()[0]
    )
    assert r1.merged == top.pair
    assert r1.pair_weight == top.weight

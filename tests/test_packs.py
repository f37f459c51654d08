"""Packing-strategy and mixing-weight panels: cross-strategy invariants,
a third (pure-Python) implementation of the greedy fold, and a bit-exact
replay of the temperature shares."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ethical_data_ingestion_spark.io import load_table
from ethical_data_ingestion_spark.queries import packs_q

SF_DIR = "/root/testdata/sf0.001"


def test_packing_strategy_invariants(spark):
    rows = {r.strategy: r for r in
            packs_q.packing_strategy_stats(spark, SF_DIR).collect()}
    assert set(rows) == {"concat_chunk", "doc_per_seq", "greedy_group"}
    cc, dps, gg = rows["concat_chunk"], rows["doc_per_seq"], rows["greedy_group"]
    # same payload everywhere; ordering of efficiency is forced:
    # concat >= greedy >= one-doc-per-sequence
    assert cc.payload_tokens == dps.payload_tokens == gg.payload_tokens > 0
    assert cc.n_sequences <= gg.n_sequences <= dps.n_sequences
    assert cc.pack_efficiency >= gg.pack_efficiency >= dps.pack_efficiency
    # only concat-chunk may split documents; it must split SOME on this
    # fixture (multi-doc sequences are the point)
    assert cc.n_docs_split > 0 and gg.n_docs_split == 0 == dps.n_docs_split
    # accounting identity
    for r in rows.values():
        assert r.n_pad_tokens == r.n_sequences * packs_q._SEQ_LEN - r.payload_tokens
        assert r.n_oversize == 0  # fixture docs are far under _SEQ_LEN


def test_greedy_fold_matches_python_replay(spark):
    """Third implementation: replay the greedy group fold in pure Python
    over the raw token counts."""
    counts = sorted(
        (r.doc_id, r.n_tok)
        for r in packs_q._counts(spark, SF_DIR).collect()
        if r.n_tok <= packs_q._SEQ_LEN
    )
    groups: dict[int, list[int]] = {}
    for doc_id, n in counts:
        groups.setdefault(doc_id // packs_q._PACK_G, []).append(n)
    total_seq = 0
    for g in groups.values():
        used, n_seq = 0, 0
        for n in g:
            if n_seq == 0 or used + n > packs_q._SEQ_LEN:
                n_seq += 1
                used = 0
            used += n
        total_seq += n_seq
    got = {r.strategy: r for r in
           packs_q.packing_strategy_stats(spark, SF_DIR).collect()}
    assert got["greedy_group"].n_sequences == total_seq


def test_mixing_shares_bit_exact_python_replay(spark):
    """Replay mass -> sqrt -> name-ordered left fold -> quotient in pure
    Python floats: every double must match BIT-EXACTLY (the panel's whole
    exactness claim)."""
    docs = load_table(spark, SF_DIR, "documents")
    mass = {
        r.source: r.m
        for r in docs.groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).cast("long").alias("m"))
        .collect()
    }
    denom = 0.0
    for s in sorted(mass):
        denom = denom + math.sqrt(float(mass[s]))
    total = sum(mass.values())
    rows = {r.source: r for r in
            packs_q.mixing_weights_stats(spark, SF_DIR).collect()}
    assert set(rows) == set(mass)
    for s, r in rows.items():
        assert r.mass_tokens == mass[s]
        share05 = math.sqrt(float(mass[s])) / denom
        assert r.share_a05 == share05, s                       # bit-exact
        ep = (packs_q._MIX_BUDGET_X * total) * share05 / float(mass[s])
        assert r.epochs_a05 == ep, s                           # bit-exact
        micro = (2 * mass[s] * 10**6 + total) // (2 * total)
        assert r.share_a1 == micro / 1_000_000, s
    # temperature flattens: smallest source gains share, largest loses
    lo = min(mass, key=mass.get)
    hi = max(mass, key=mass.get)
    assert rows[lo].share_a05 > rows[lo].share_a1
    assert rows[hi].share_a05 < rows[hi].share_a1


def test_duplicate_query_name_rejected():
    import pytest

    from ethical_data_ingestion_spark.registry import register

    with pytest.raises(ValueError, match="already registered"):
        @register("mixing_weights_stats")
        def mixing_weights_stats(spark, sf_dir):  # pragma: no cover
            raise AssertionError


def test_split_leakage_cluster_aware_is_leak_free(spark):
    """The audit's core claims: the naive doc-hash split leaks SOME
    near-dup pairs on this fixture (the panel exists because this
    happens), and the cluster-aware split leaks exactly ZERO on every
    tier (every near-dup edge is intra-cluster by construction)."""
    from ethical_data_ingestion_spark.queries.dedup_q import (
        split_leakage_tier_audit,
    )

    rows = split_leakage_tier_audit(spark, SF_DIR).collect()
    naive = [r for r in rows if r.scheme == "naive"]
    fixed = [r for r in rows if r.scheme == "cluster_aware"]
    assert naive and fixed and len(naive) == len(fixed)
    assert sum(r.n_cross_pairs for r in naive) > 0
    for r in fixed:
        assert r.n_cross_pairs == 0, r.tier
    # same pair universe under both schemes
    assert {(r.tier, r.n_pairs) for r in naive} == {
        (r.tier, r.n_pairs) for r in fixed
    }


def test_bpe_packing_diverges_from_whitespace_pricing(spark):
    """The round-12 currency-match panel: the same three strategies priced
    in trained-BPE tokens must KEEP the internal strategy invariants but
    DIVERGE from the whitespace panel exactly the way fertility > 1
    predicts — documents near the whitespace limit overflow it in BPE
    tokens (oversize appears), concat-chunk splits more documents, and
    the efficiency spread moves (greedy falls: the same documents fill
    BPE sequences less evenly; doc-per-seq rises: padding shrinks
    relative to fatter documents)."""
    ws = {r.strategy: r for r in
          packs_q.packing_strategy_stats(spark, SF_DIR).collect()}
    bp = {r.strategy: r for r in
          packs_q.packing_bpe_stats(spark, SF_DIR).collect()}
    assert set(bp) == set(ws) == {"concat_chunk", "doc_per_seq",
                                  "greedy_group"}
    cc, dps, gg = (bp["concat_chunk"], bp["doc_per_seq"],
                   bp["greedy_group"])
    # internal invariants hold in the BPE currency too
    assert cc.payload_tokens == dps.payload_tokens == gg.payload_tokens > 0
    assert cc.n_sequences <= gg.n_sequences <= dps.n_sequences
    assert cc.pack_efficiency >= gg.pack_efficiency >= dps.pack_efficiency
    assert cc.n_docs_split > 0 and gg.n_docs_split == 0 == dps.n_docs_split
    for r in bp.values():
        assert r.n_pad_tokens == (r.n_sequences * packs_q._SEQ_LEN
                                  - r.payload_tokens)
    # the currency divergence (fertility ~2.3 on the fixture)
    assert bp["concat_chunk"].n_oversize > ws["concat_chunk"].n_oversize
    assert cc.n_docs_split > ws["concat_chunk"].n_docs_split
    assert gg.pack_efficiency < ws["greedy_group"].pack_efficiency
    assert dps.pack_efficiency > ws["doc_per_seq"].pack_efficiency
    # conservation against the tokenizer-apply panel: the per-doc pricing
    # table must sum to the corpus BPE mass bpe_encode_stats reports
    from ethical_data_ingestion_spark.queries.strings_q import (
        bpe_encode_stats,
    )

    total_priced = packs_q._bpe_counts(spark, SF_DIR).agg(
        F.sum("n_tok")).collect()[0][0]
    total_encode = sum(
        r.bpe_tokens for r in bpe_encode_stats(spark, SF_DIR).collect())
    assert total_priced == total_encode

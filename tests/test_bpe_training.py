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


def test_bpe_encode_agrees_with_trainer_totals(spark):
    """The apply half must reproduce the trainer's own accounting: total
    BPE tokens across sources == the final round's corpus_symbols (the
    trainer's post-merge corpus total), and every per-word segmentation
    is bounded by 1..len(word) symbols (fertility >= 1, compression
    >= 1)."""
    enc = registry.QUERIES["bpe_encode_stats"](spark, SF_DIR).collect()
    train = (
        registry.QUERIES["bpe_training_rounds"](spark, SF_DIR)
        .orderBy("merge_round")
        .collect()
    )
    assert sum(r.bpe_tokens for r in enc) == train[-1].corpus_symbols
    for r in enc:
        assert r.whitespace_tokens <= r.bpe_tokens <= r.chars
        assert r.bpe_fertility >= 1.0
        assert r.chars_per_bpe_token >= 1.0


def test_bpe_word_segs_exact_greedy_replay(spark):
    """Python replay (third implementation): apply the trainer's merge
    list greedily, left-to-right non-overlapping, one merge per round,
    to every vocabulary word — symbol counts must match _bpe_word_segs
    exactly."""
    from ethical_data_ingestion_spark.io import load_table
    from ethical_data_ingestion_spark.queries import strings_q

    merges = [
        (r.sym_a, r.sym_b)
        for r in registry.QUERIES["bpe_training_rounds"](spark, SF_DIR)
        .orderBy("merge_round")
        .collect()
    ]
    got = {
        r.word: r.n_sym
        for r in strings_q._bpe_word_segs(spark, SF_DIR).collect()
    }
    words = {
        w
        for row in load_table(spark, SF_DIR, "documents").collect()
        for w in row.text.split(" ")
        if w != ""
    }
    assert set(got) == words
    for w in words:
        syms = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        assert got[w] == len(syms), w


def test_bpe_shard_manifest_consistent_with_encode(spark):
    """The BPE-priced manifest's total token mass equals the encode
    panel's corpus total; shards are id-contiguous and within budget
    (a shard may overshoot by at most one document's tokens)."""
    from ethical_data_ingestion_spark.queries.pipeline_q import _SHARD_TOKENS

    man = (
        registry.QUERIES["training_shard_manifest_bpe"](spark, SF_DIR)
        .orderBy("shard_id")
        .collect()
    )
    enc = registry.QUERIES["bpe_encode_stats"](spark, SF_DIR).collect()
    assert sum(r.n_tokens for r in man) == sum(r.bpe_tokens for r in enc)
    for prev, cur in zip(man, man[1:]):
        assert prev.last_doc < cur.first_doc  # contiguous id ranges
    # greedy definition: a shard's id is floor(start_offset / budget),
    # where start_offset is the cumulative token mass of earlier shards
    offset = 0
    for r in man:
        assert r.shard_id == offset // _SHARD_TOKENS, r.shard_id
        offset += r.n_tokens
    assert all(r.n_docs >= 1 for r in man)

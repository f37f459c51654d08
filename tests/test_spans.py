"""Span-level duplication detection (queries/spans_q.py).

Constructed corpora with KNOWN shared token spans — the query's fixture
run is oracle-checked by the driver/local gate; these tests pin the span
semantics on inputs where the right answer is computable by hand.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ethical_data_ingestion_spark.operators.text import shingles_with_pos
from ethical_data_ingestion_spark.queries.spans_q import ngram_span_overlap


def _write_docs(spark, path: str, texts: list[str]) -> None:
    rows = [
        (i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _uniq(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_known_shared_span_length(spark, tmp_path):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    texts = [
        _uniq("a", 6) + " " + shared + " " + _uniq("b", 6),
        _uniq("c", 4) + " " + shared + " " + _uniq("d", 8),
        _uniq("e", 20),  # no overlap with anyone
    ]
    _write_docs(spark, str(tmp_path), texts)
    out = ngram_span_overlap(spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0]
    assert (row.doc_a, row.doc_b) == (0, 1)
    assert row.max_span_tokens == 11  # the shared run, exactly
    assert row.n_spans == 1
    assert row.total_span_tokens == 11


def test_two_disjoint_spans_counted_separately(spark, tmp_path):
    s1 = "p1 p2 p3 p4 p5"
    s2 = "q1 q2 q3 q4 q5 q6 q7"
    texts = [
        s1 + " " + _uniq("x", 5) + " " + s2,
        s2 + " " + _uniq("y", 9) + " " + s1,
    ]
    _write_docs(spark, str(tmp_path), texts)
    out = ngram_span_overlap(spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0]
    assert row.max_span_tokens == 7  # the longer (q) span
    assert row.n_spans == 2
    assert row.total_span_tokens == 12  # 7 + 5


def test_docs_shorter_than_k_are_excluded_not_crashing(spark, tmp_path):
    # sub-k docs produce only a TRUNCATED shingle; matching on it would
    # claim a k-token span inside a 2-token document, so they are out of
    # scope entirely (exact dedup already covers identical short docs)
    _write_docs(spark, str(tmp_path), ["one two", "one two", "zz"])
    out = ngram_span_overlap(spark, str(tmp_path)).collect()
    assert out == []


def test_shingles_with_pos_positions_are_one_based_and_ordered(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    row = df.select(
        F.explode(shingles_with_pos("text", 3)).alias("ps")
    ).select("ps.pos", "ps.s").collect()
    assert [(r.pos, r.s) for r in row] == [(1, "a b c"), (2, "b c d")]


def _md5_bucket(doc_id: int) -> int:
    import hashlib

    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)


def test_incremental_dedup_classifies_planted_batch(spark, tmp_path):
    from ethical_data_ingestion_spark.queries.dedup_q import (
        _INC_SPLIT,
        incremental_dedup_stats,
    )

    batch_ids = [i for i in range(200) if _md5_bucket(i) < _INC_SPLIT]
    index_ids = [i for i in range(200) if _md5_bucket(i) >= _INC_SPLIT]
    assert len(batch_ids) >= 4 and len(index_ids) >= 2
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(("zzz" if i == 0 else f"w{i}") for i in range(40))
    rows = [
        # index: one doc with `base` text, one unrelated
        (index_ids[0], base, "en", "srcI", 1),
        (index_ids[1], " ".join(f"u{i}" for i in range(40)), "en", "srcI", 1),
        # batch: exact dup of index, near dup of index, two identical
        # batch-internal, one genuinely new
        (batch_ids[0], base, "en", "srcB", 1),
        (batch_ids[1], near, "en", "srcB", 1),
        (batch_ids[2], " ".join(f"x{i}" for i in range(40)), "en", "srcB", 1),
        (batch_ids[3], " ".join(f"x{i}" for i in range(40)), "en", "srcB", 1),
        (batch_ids[4], " ".join(f"y{i}" for i in range(40)), "en", "srcB", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r.source: r for r in incremental_dedup_stats(spark, str(tmp_path)).collect()}
    b = out["srcB"]
    assert b.n_batch == 5
    assert b.n_exact_vs_index == 1
    assert b.n_near_vs_index == 1
    # the LOWER-id twin of the internal pair counts as new; the later one
    # as internal (keep-first semantics)
    assert b.n_batch_internal == 1
    assert b.n_new_unique == 2
    assert "srcI" not in out  # index-only source has no batch rows


def test_span_match_volume_respects_occurrence_cap_budget(spark, sf_dir):
    """The occ-cap makes candidate volume provably linear: sum(occ^2) over
    kept shingles <= cap * total kept occurrences. A regression that drops
    the cap (or filters on doc-frequency instead of occurrences) breaks
    the bound and reintroduces the quadratic blowup at 100 TB."""
    from ethical_data_ingestion_spark.io import load_table
    from ethical_data_ingestion_spark.operators.text import shingles_with_pos
    from ethical_data_ingestion_spark.queries.spans_q import _OCC_CAP, _SPAN_K

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        F.explode(shingles_with_pos("text", _SPAN_K)).alias("ps")
    ).select(F.col("ps.s").alias("s"))
    occ = sh.groupBy("s").count().filter(F.col("count") <= _OCC_CAP)
    row = occ.agg(
        F.sum(F.col("count") * F.col("count")).alias("matches"),
        F.sum("count").alias("kept"),
    ).collect()[0]
    # self-join volume (ordered pairs incl. self) is sum(occ^2); the cap
    # bounds it by cap * kept occurrences
    assert row.matches <= _OCC_CAP * row.kept

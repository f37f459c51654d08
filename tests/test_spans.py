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


def test_docs_shorter_than_k_do_not_crash(spark, tmp_path):
    _write_docs(spark, str(tmp_path), ["one two", "one two", "zz"])
    out = ngram_span_overlap(spark, str(tmp_path)).collect()
    # the two identical 2-token docs share their single truncated shingle
    assert len(out) == 1
    assert (out[0].doc_a, out[0].doc_b) == (0, 1)


def test_shingles_with_pos_positions_are_one_based_and_ordered(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    row = df.select(
        F.explode(shingles_with_pos("text", 3)).alias("ps")
    ).select("ps.pos", "ps.s").collect()
    assert [(r.pos, r.s) for r in row] == [(1, "a b c"), (2, "b c d")]

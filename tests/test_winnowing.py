"""Invariant tests for the winnowing near-dup tier and the PII scrub
panel — the oracle gate checks cross-engine equality; these pin the
algorithmic guarantees the panels claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from ethical_data_ingestion_spark.registry import QUERIES  # noqa: I001 — must load first (registers all query modules)
from ethical_data_ingestion_spark.io import load_table
from ethical_data_ingestion_spark.operators import text as T
from ethical_data_ingestion_spark.queries import text_q
from ethical_data_ingestion_spark.queries.dedup_q import _WIN_K


def _kgrams(text: str) -> set[str]:
    t = text.split(" ")
    return {
        " ".join(t[i : i + _WIN_K]) for i in range(len(t) - _WIN_K + 1)
    }


def test_winnowing_pairs_are_backed_by_real_shared_kgrams(spark, sf_dir):
    """Every reported fingerprint is the min-hash of a token k-gram, so
    distinct shared fingerprints imply at least that many distinct shared
    k-grams (md5-collision-free at fixture scale). Verify against a pure-
    Python recomputation of the k-gram sets."""
    rows = QUERIES["winnowing_overlap_pairs"](spark, sf_dir).collect()
    assert rows, "fixture near-dups should surface winnowing pairs"
    ids = {r.doc_a for r in rows} | {r.doc_b for r in rows}
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(list(ids)))
        .select("doc_id", "text")
        .collect()
    }
    for r in rows:
        assert r.shared_fp >= 3
        assert r.containment >= 0.5 - 1e-9
        assert r.nfp_a > 0 and r.nfp_b > 0
        shared = _kgrams(texts[r.doc_a]) & _kgrams(texts[r.doc_b])
        assert len(shared) >= r.shared_fp, (r.doc_a, r.doc_b)


def test_pii_scrub_is_idempotent_on_injected_corpus(spark, sf_dir):
    """Redaction must consume every match the auditor counts: on the
    panel's injected corpus the pre-scrub count is positive and the
    post-scrub count is exactly zero."""
    docs = load_table(spark, sf_dir, "documents")
    aug = text_q._pii_augmented_text()
    total = [F.col(f"n_{n}") for n, _, _ in T.PII_PATTERNS]
    pre = docs.select(*T.pii_counts(aug)).agg(
        F.sum(sum(total, F.lit(0))).alias("n")
    ).first()["n"]
    post = docs.select(
        *[
            c.alias(f"n_{n}")
            for (n, _, _), c in zip(
                T.PII_PATTERNS,
                [
                    F.regexp_count(T.redact_pii(aug), F.lit(p))
                    for _, p, _ in T.PII_PATTERNS
                ],
            )
        ]
    ).agg(F.sum(sum(total, F.lit(0))).alias("n")).first()["n"]
    assert pre > 0
    assert post == 0


def test_winnowing_surfaces_a_planted_near_dup_and_skips_the_rest(
    spark, tmp_path
):
    """MOSS guarantee, panel-level: a planted pair sharing a long token
    run must surface with high containment; unrelated random-vocabulary
    docs must not pair at all."""
    import random

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(5000)]

    def _doc(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    base = _doc(40)
    near = base + " " + _doc(6)  # shares a 40-token run with doc 0
    rows = [(0, base, "en", "src1", len(base)), (1, near, "en", "src1", len(near))]
    rows += [(i, _doc(40), "en", "src2", 1) for i in range(2, 30)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = QUERIES["winnowing_overlap_pairs"](spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in out}
    assert (0, 1) in pairs, "planted near-dup pair missed"
    assert pairs[(0, 1)].containment >= 0.9
    assert len(pairs) == 1, f"spurious pairs: {set(pairs) - {(0, 1)}}"

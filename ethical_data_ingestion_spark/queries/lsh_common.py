"""Shared DuckDB LSH-pipeline mirror helpers.

A LEAF module (imports only the operators layer, never the registry) so
every oracle generator that needs the LSH CTE chain at MODULE-IMPORT time
(embed_q, streaming_q, hybrid_q) can take it without entering the
registry's load cycle — importing ``similarity_q`` directly as a
process's first package import used to raise, because its consumers'
from-imports ran against the partially initialized module (same fix as
``chunk_common``; the cold-start ANN test's fresh subprocess surfaced
the class). ``similarity_q`` re-exports these names unchanged.
"""

from __future__ import annotations

from ..operators import similarity as S

#: one shared cosine expression so every mirror rounds identically
_COS = (
    "ROUND(list_dot_product(qv, bv) / "
    "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(bv, bv))), 6)"
)

#: the ~20% md5-16-bit delta split shared by the ANN index/probe carvings
_ANN_SPLIT = 13107

def _lsh_pipeline_ctes(
    b_body: str = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS bv FROM embeddings",
    n_queries: int = 5,
    q_body: str | None = None,
    n_tables: int = 8,
    n_bits: int = 4,
) -> str:
    """Shared DuckDB mirror of the full LSH pipeline — the CTE chain from
    base vectors through ``lsh_scored`` (candidate cosine scores): the
    md5-derived hyperplanes are embedded as literal DOUBLE[] arrays,
    buckets are sign-bit sums of ``list_dot_product`` projections (a
    sequential fold, matching the UDF's strict dimension-order
    accumulation), candidates mirror the Spark (table, bucket) equi-join.
    Deterministic planes + fixed data ⇒ the 'approximate' path is exactly
    reproducible. Used by `knn_lsh_recall_stats` (recall tail),
    `knn_cosine_lsh` (top-k tail), and — with ``b_body`` pointing at the
    seam-produced document embeddings — `embed_knn_lsh` in embed_q.

    ``b_body``: SELECT yielding (vec_id, bv DOUBLE[]) base vectors;
    ``n_queries``: probes are vec_id < n_queries. ``q_body``: when given,
    probes come from this SEPARATE (vec_id, bv) relation instead of a
    vec_id prefix of ``b`` (the serving shape: a probe batch disjoint
    from the index), and ``n_queries`` is ignored. ``n_tables``/
    ``n_bits``: plane geometry — must match the Spark side's
    ``hyperplanes`` call (bits per table is the bucket-width knob a
    deployment grows with corpus size).

    ``b``/``sig`` (and ``qb``/``qsig``) are AS MATERIALIZED: the melt
    references ``sig`` once per table and ``lsh_scored`` re-reads ``b``,
    and DuckDB's default inlining re-evaluated the dense-reconstruction
    chain once per reference — at sf1 the concurrent inlined copies
    exhausted a 64 GB budget (the round-10 sf1 gate's one genuine OOM);
    materialized, each is computed once."""
    planes = S.hyperplanes(64, n_tables, n_bits)
    sig_cols = []
    for t, rows in enumerate(planes):
        bits = [
            f"(CASE WHEN list_dot_product(bv, "
            f"[{','.join(repr(c) for c in comps)}]) > 0 "
            f"THEN {1 << bidx} ELSE 0 END)"
            for bidx, comps in enumerate(rows)
        ]
        sig_cols.append(" + ".join(bits) + f" AS b{t}")
    melt = "\n      UNION ALL\n      ".join(
        f"SELECT vec_id, {t} AS t, b{t} AS bucket FROM sig"
        for t in range(len(planes))
    )
    if q_body is None:
        q_ctes = ""
        qm_body = (
            f"SELECT vec_id AS query_id, t, bucket FROM m "
            f"WHERE vec_id < {n_queries}"
        )
        q_sel = (
            f"SELECT vec_id AS query_id, bv AS qv FROM b "
            f"WHERE vec_id < {n_queries}"
        )
    else:
        qmelt = "\n      UNION ALL\n      ".join(
            f"SELECT vec_id, {t} AS t, b{t} AS bucket FROM qsig"
            for t in range(len(planes))
        )
        q_ctes = f"""qb AS MATERIALIZED ({q_body}),
    qsig AS MATERIALIZED (
      SELECT vec_id, bv, {", ".join(sig_cols)}
      FROM qb
    ),
    qmelt AS (
      {qmelt}
    ),"""
        qm_body = "SELECT vec_id AS query_id, t, bucket FROM qmelt"
        q_sel = "SELECT vec_id AS query_id, bv AS qv FROM qb"
    return f"""b AS MATERIALIZED ({b_body}),
    sig AS MATERIALIZED (
      SELECT vec_id, bv, {", ".join(sig_cols)}
      FROM b
    ),
    m AS (
      {melt}
    ),
    {q_ctes}
    qm AS ({qm_body}),
    cand AS (
      SELECT DISTINCT qm.query_id, m.vec_id
      FROM m JOIN qm ON m.t = qm.t AND m.bucket = qm.bucket
                    AND m.vec_id <> qm.query_id
    ),
    q AS ({q_sel}),
    lsh_scored AS (
      SELECT cand.query_id, cand.vec_id, {_COS} AS cos
      FROM cand
      JOIN q ON q.query_id = cand.query_id
      JOIN b ON b.vec_id = cand.vec_id
    )"""


"""Chunk-index geometry shared by ``embed_q`` and ``hybrid_q``.

A LEAF module — imports nothing from this package — so both consumers can
take these names at module-import time without touching the registry's
load cycle. (``hybrid_q`` importing them from ``embed_q`` made any direct
``import ethical_data_ingestion_spark.queries.embed_q`` as a process's
FIRST package import fail: embed_q's own ``from ..registry import
register`` triggers ``_load_everything`` while embed_q is still partially
initialized, and hybrid_q's from-import of its constants raised. The
cold-start ANN test's fresh-subprocess serve hit exactly that path.)

Values are the round-5 chunk-index geometry; ``embed_q`` re-exports them
under the same names so existing call sites read one source of truth.
"""

from __future__ import annotations

_DIM = 64          # hashed-projection embedding dimension
_CHUNK_SIZE = 32   # tokens per chunk
_CHUNK_STRIDE = 16 # sliding-window stride (50% overlap)
_CHUNK_KEYMUL = 1024  # ckey = doc_id*KEYMUL + chunk_idx; fixture docs ≤ 99
                      # tokens → chunk_idx ≤ 6, far under the KEYMUL bound
_CHUNK_QOFF = 1 << 40  # probe ids lifted out of the ckey space


def _dense_chunk_sql() -> str:
    """DENSE {_DIM}-dim double chunk vectors reconstructed from the sparse
    hashed counts (explicit dimension ORDER BY, zeros coalesced) — the
    LSH mirror's base-side b_body for the chunk index. Expects a ``ccnt``
    CTE (ckey, bucket, c) in scope."""
    return f"""
      SELECT n.ckey AS vec_id,
             list(CAST(COALESCE(c.c, 0) AS DOUBLE) ORDER BY dims.d) AS bv
      FROM (SELECT ckey FROM ccnt GROUP BY ckey HAVING SUM(c * c) > 0) n
      CROSS JOIN (SELECT unnest(generate_series(0, {_DIM - 1})) AS d) dims
      LEFT JOIN ccnt c ON c.ckey = n.ckey AND c.bucket = dims.d
      GROUP BY n.ckey
    """

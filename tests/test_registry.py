"""Registry invariants: the driver-contract surface stays well-formed."""

from __future__ import annotations

import inspect

from ethical_data_ingestion_spark import registry


def test_every_oracle_has_a_query():
    assert set(registry.ORACLE_SQL) <= set(registry.QUERIES)


def test_rows_only_set_is_intentional():
    rows_only = set(registry.QUERIES) - set(registry.ORACLE_SQL)
    # only genuinely estimate/bucket-dependent ops may skip the hash gate
    # (both LSH top-k paths; their recall is bounded in tests and the LSH
    # pipeline itself is hash-checked via knn_lsh_recall_stats)
    assert rows_only == {"knn_cosine_lsh", "embed_knn_lsh"}


def test_query_callables_take_spark_and_sfdir():
    for name, fn in registry.QUERIES.items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_oracle_sql_mentions_only_fixture_tables():
    import re

    known = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    for name, sql in registry.ORACLE_SQL.items():
        # (?!\.) skips EXTRACT(year FROM x.col)-style qualified columns
        for m in re.finditer(r"\bFROM\s+([a-z_][a-z0-9_]*)\b(?!\.)", sql, re.I):
            t = m.group(1).lower()
            # CTE names and derived tables are fine; raw identifiers that
            # look like tables must be fixture tables or CTEs defined above
            if t in known:
                continue
            assert (
                re.search(rf"\b{t}\b\s*(\(|AS\s*\()", sql, re.I)
                or re.search(rf"(WITH|,)\s*(RECURSIVE\s+)?{t}\s*(\(.*?\))?\s+AS", sql, re.I | re.S)
            ), f"{name}: unknown table '{t}'"

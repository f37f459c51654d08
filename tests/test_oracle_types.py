"""Engine-exactness guard: no oracle may emit a HUGEINT column.

DuckDB promotes ``SUM(BIGINT)`` (and MIN/MAX chains over such sums) to
HUGEINT (int128). Spark has no int128, so a HUGEINT column in an
oracle's FINAL projection reaches the driver's value-hasher as a
different physical type than Spark's int64 — and a hasher that
formats/casts through Arrow or numpy can flip the hash on identical
decimal values (this is exactly what made ``pagerank_trade_graph`` the
one red CORRECTNESS_r04 cell while being green on every local re-run).

The fix is always the same — ``CAST(... AS BIGINT)`` on the final
projection (lossless whenever the value fits 63 bits, which every
registered query guarantees by construction) — and this test makes the
trap structurally impossible to reintroduce: it binds every registered
oracle in DuckDB and asserts no result column resolves to HUGEINT,
UHUGEINT, or DECIMAL(38,0) (DuckDB's other int128 spelling).

Binding is lazy (``con.sql`` + ``.types``), so the whole sweep costs
seconds, not a gate run.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

_SF_DIR = "/root/testdata/sf0.001"
_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{_SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_no_oracle_emits_hugeint(duck):
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        rel = duck.sql(sql)
        hits = [
            (col, str(typ))
            for col, typ in zip(rel.columns, rel.types)
            if "HUGEINT" in str(typ) or str(typ).startswith("DECIMAL(38")
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "oracle final projections with int128-typed columns (wrap in "
        f"CAST(... AS BIGINT)): {offenders}"
    )

"""Fast driver-gate replica: every oracle_sql() query must hash-match
DuckDB at sf0.001 (the full sf0.01 sweep runs via tools/oracle_check.py)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def _hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest(), len(lines)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _contract():
    from medacy_spark import contract
    return contract.queries(), contract.oracle_sql()


QUERIES, ORACLES = _contract()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, ddb, name):
    sdf = QUERIES[name](spark, SF)
    shash, sn = _hash(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = ddb.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    ohash, on = _hash(ocols, res.fetchall())
    assert sorted(sdf.columns) == sorted(ocols)
    assert (sn, shash) == (on, ohash)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"pred", "n_triples"}

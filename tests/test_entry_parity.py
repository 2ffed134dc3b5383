"""Local replica of the driver's correctness gate: run every queries()
entry against its oracle_sql() in DuckDB at sf0.01 and compare row count,
schema (column names), and an order-insensitive value multiset."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
    return con


def _norm_cell(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # tolerate last-ulp noise after both sides' explicit rounding
        return round(v, 3)
    if isinstance(v, bool):
        return int(v)
    return v


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    )


from gloomy_spark.entry_queries import extra_parity

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
# exact twins kept out of the driver-capped registry (50-row limit) but
# still value-checked here — see entry_queries.registry's docstring
for _name, (_fn, _sql) in extra_parity().items():
    QUERIES[_name] = _fn
    ORACLES[_name] = _sql


def _dtype_kinds(pdf):
    """Column → numpy dtype kind, as the driver's pandas-level value hash
    sees it ('i' int, 'f' float, 'O' object, 'b' bool...). DuckDB HUGEINT
    fetches as float64, so an un-cast sum(tf) mismatches Spark's int64 here
    — exactly the driver's dtype sensitivity."""
    return {c: pdf[c].dtype.kind for c in pdf.columns}


@pytest.mark.spark
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    fn = QUERIES[name]
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_kinds = _dtype_kinds(sdf.limit(50).toPandas())

    con = _duck()
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_pdf = res.fetchdf()
    duck_rows = [tuple(r) for r in duck_pdf.itertuples(index=False, name=None)]
    duck_kinds = _dtype_kinds(duck_pdf)

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: schema mismatch"
    for c in spark_cols:
        sk, dk = spark_kinds[c], duck_kinds[c]
        # empty results fetch as object on both sides in different ways
        if len(duck_rows) == 0 or len(spark_rows) == 0:
            break
        assert sk == dk, (
            f"{name}: dtype-kind mismatch on {c!r}: spark {sk} vs oracle {dk} "
            "(driver value hash is dtype-sensitive — cast the oracle SQL)"
        )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    ms_s = _multiset(spark_rows, spark_cols)
    ms_d = _multiset(duck_rows, duck_cols)
    if ms_s != ms_d:
        diff_s = [r for r in ms_s if r not in ms_d][:5]
        diff_d = [r for r in ms_d if r not in ms_s][:5]
        pytest.fail(f"{name}: value mismatch\n spark-only: {diff_s}\n duck-only: {diff_d}")


def test_every_query_is_value_checked():
    """Since round 4 EVERY queries() entry carries an oracle (approximate
    ops are violation-gated) — no rows-only checks remain."""
    assert set(QUERIES) == set(ORACLES)


def test_registry_fits_driver_cap():
    """The driver's correctness gate records at most 50 rows (round 4:
    52 registered → first 50 recorded). Every registry entry must get a
    driver row, so the registry is pinned to exactly the cap; additional
    oracle-checked ops go in extra_parity()."""
    assert len(entrymod.queries()) == 50


@pytest.mark.spark
def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "score"}

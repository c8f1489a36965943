"""The driver's correctness gate, run locally at sf0.001: every
queries() entry with an oracle must hash-match DuckDB; rows-only entries
must at least execute and return a stable schema."""

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from lectura.compare import norm_rows, oracle_rows, spark_rows

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for tname in TABLES:
        p = f"{SF}/{tname}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{p}'")
    return con


ORACLES = entrymod.oracle_sql()
ALL = sorted(entrymod.queries().items())
SQL_CHECKED = [(n, f) for n, f in ALL if n in ORACLES]
ROWS_ONLY = [(n, f) for n, f in ALL if n not in ORACLES and n != "crawl_flagship"]


@pytest.mark.parametrize("name,fn", SQL_CHECKED, ids=[n for n, _ in SQL_CHECKED])
def test_sql_checked(spark, duck, name, fn):
    # strict driver-calibrated compare (pandas both sides, type-class-
    # sensitive cells, Arrow type audit) — the SAME comparator as
    # scripts/check_contract.py, via lectura/compare.py
    scols, srows = spark_rows(fn(spark, SF))
    dcols, drows, bad_types = oracle_rows(duck, ORACLES[name])
    assert not bad_types, f"pandas-unsafe oracle columns: {bad_types}"
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert norm_rows(scols, srows) == norm_rows(dcols, drows)


@pytest.mark.parametrize("name,fn", ROWS_ONLY, ids=[n for n, _ in ROWS_ONLY])
def test_rows_only_executes(spark, name, fn):
    df = fn(spark, SF)
    assert df.columns
    df.collect()  # must not raise

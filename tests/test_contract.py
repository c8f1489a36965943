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


def test_range_frame_value_semantics(spark):
    """RANGE frames bound by VALUES, not row counts: ties share a
    frame; a row 61 minutes back is outside; one 59 minutes back is
    inside regardless of how many rows sit between."""
    import datetime as dt

    import lectura.contract as C

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, base - dt.timedelta(minutes=61), 7, "e", 1.0, "{}"),
        (2, base - dt.timedelta(minutes=59), 7, "e", 2.0, "{}"),
        (3, base, 7, "e", 4.0, "{}"),
        (4, base, 7, "e", 8.0, "{}"),     # tie with row 3
        (5, base, 8, "e", 16.0, "{}"),    # other user unaffected
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    orig = C.t
    C.t = lambda spark, sf, name: df
    try:
        got = {r.event_id: (r.n_last_hour, r.cents_last_hour)
               for r in C.range_frame_f15(spark, "unused").collect()}
    finally:
        C.t = orig
    assert got[1] == (1, 100)
    # each frame is relative to ITS row's ts: row 1 sits 2 min before
    # row 2, well inside row 2's hour
    assert got[2] == (2, 300)
    # ties at `base` share one frame holding rows 2,3,4 — row 1 is 61
    # min back from base, OUTSIDE despite only 3 rows between
    assert got[3] == (3, 1400) and got[4] == (3, 1400)
    assert got[5] == (1, 1600)

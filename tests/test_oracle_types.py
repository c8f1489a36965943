"""Oracle result-type audit: every DuckDB oracle must produce only
pandas-safe column types.

Root cause of the only two red driver rows in round 2
(CORRECTNESS_r02.json `bucketed_join_s12`, `pivot_a8`): DuckDB types
``sum(BIGINT)`` as HUGEINT (int128); the driver fetches oracle results
through pandas, where HUGEINT degrades to float64, so the driver hashes
``"1537564.0"`` against Spark's ``"1537564"`` while row-count and
schema checks still pass.  This test runs every registered oracle
through ``.arrow()`` at sf0.001 and rejects any result column whose
Arrow type is outside the fidelity-preserving set — catching the whole
class before the driver can.

No SparkSession needed: this audits the oracle side only.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("LECTURA_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _oracles():
    import __spark_entry__ as entrymod

    return sorted(entrymod.oracle_sql().items())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for tname in TABLES:
        p = f"{SF_DIR}/{tname}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{p}'")
    return c


@pytest.mark.parametrize("name,sql", _oracles(), ids=[n for n, _ in _oracles()])
def test_oracle_result_types_pandas_safe(con, name, sql):
    from lectura.compare import arrow_type_ok

    schema = con.execute(sql).arrow().schema
    bad = [(f.name, str(f.type)) for f in schema if not arrow_type_ok(f.type)]
    assert not bad, (
        f"oracle {name!r} yields pandas-unsafe column types {bad}: the "
        f"driver's fetchdf() will degrade these (HUGEINT/DECIMAL → "
        f"float64) and hash-mismatch against Spark — CAST the aggregate "
        f"to BIGINT/DOUBLE in the SQL"
    )

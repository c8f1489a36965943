"""Local stand-in for the driver's DuckDB correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet, compare row-count + column names + order-insensitive values.

The comparison semantics (driver-calibrated strict cells, pandas on
both sides, Arrow type audit, lenient-diagnostic second pass) live in
lectura/compare.py — shared with tests/test_contract.py so the two
local gates can never diverge again (the r2 failure mode).

Usage: python scripts/check_contract.py [sf_dir] [name_filter]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from lectura.compare import lenient_cell, norm_rows, oracle_rows, spark_rows

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else None

    import __spark_entry__ as entrymod
    from lectura.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8,
                      app_name="contract-check")
    con = duckdb.connect()
    for tname in TABLES:
        p = f"{sf_dir}/{tname}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            scols, srows = spark_rows(fn(spark, sf_dir))
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows in {time.time()-t0:.1f}s")
            n_rows_only += 1
            continue
        try:
            dcols, drows, bad_types = oracle_rows(con, oracles[name])
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        if bad_types:
            print(f"FAIL {name}: oracle type audit — pandas-unsafe result "
                  f"columns {bad_types} (cast to BIGINT/DOUBLE in the SQL)")
            ok = False
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(dcols)}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(drows)}")
            ok = False
        else:
            a = norm_rows(scols, srows)
            b = norm_rows(dcols, drows)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                la = norm_rows(scols, srows, lenient_cell)
                lb = norm_rows(dcols, drows, lenient_cell)
                kind = ("TYPING ARTIFACT (lenient 6-dp compare passes)"
                        if la == lb else "REAL VALUE MISMATCH")
                print(f"FAIL {name}: strict value mismatch [{kind}]; "
                      f"first diffs: {diffs}")
                only_a = [r for r in a if r not in set(b)][:2]
                only_b = [r for r in b if r not in set(a)][:2]
                print(f"   only-spark: {only_a}\n   only-duck:  {only_b}")
                ok = False
        if ok:
            print(f"PASS {name}: {len(srows)} rows in {time.time()-t0:.1f}s")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

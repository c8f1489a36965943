"""Result comparison shared by scripts/check_contract.py and
tests/test_contract.py — the single local mirror of the driver's
order-insensitive row-count + column-name + value-hash comparison.
(Round-2 lesson: this repo shipped two red driver rows while its local
checker was green because the local normalizer was LAXER than the
driver; round 3 then briefly had two diverging copies of the fixed
comparator. One module, imported by both consumers, prevents both.)

Driver calibration (from CORRECTNESS_r01/r02 outcomes):

* BOTH sides go through pandas — so a nullable int64 degrades to
  float64 on both sides symmetrically (`window_ntile_f13` passed r2
  despite an int-vs-float column), while a DuckDB-only HUGEINT degrade
  shows up as int-vs-float and fails (the r2 red rows).
* floats hash at fixed ``%.6f`` precision (float32 oracles like
  `dedup_cosine_pairs` passed r2 against Spark doubles). Divergences
  BELOW 1e-6 are therefore invisible to the strict pass — by design,
  matching the driver, not an oversight.
* ints and floats render differently ('3' vs '3.000000').
* -0.0 formats as '-0.000000' ≠ '0.000000': queries must normalize
  negative zero at the source (frame_sample's ``+ 0.0``).

`lenient_cell` is the old r1/r2 normalizer, kept ONLY as a diagnostic:
when the strict pass fails it distinguishes a typing artifact (lenient
green) from a real value bug (lenient red too).
"""

from __future__ import annotations

import math

import numpy as np

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


def strict_cell(v) -> str:
    """Driver-equivalent hash unit: type-class-sensitive (int '3' never
    equals float '3.000000'), floats at fixed 6-dp, -0.0 NOT folded."""
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


def lenient_cell(v) -> str:
    """The old r1/r2 normalizer — 6-dp floats, ints-as-floats coerced.
    DIAGNOSTIC ONLY: tells typing artifact apart from real value bug."""
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


def norm_rows(cols: list[str], rows, cell=strict_cell) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def spark_rows(sdf):
    """(cols, rows) of a Spark result fetched the way the driver does
    (pandas) — a nullable int column must degrade to float64 here
    exactly as the oracle side's does."""
    pdf = sdf.toPandas()
    return list(pdf.columns), [
        tuple(r) for r in pdf.itertuples(index=False, name=None)
    ]


def oracle_rows(con, sql):
    """(cols, rows, bad_types) of a DuckDB oracle fetched via Arrow →
    pandas (the driver path), plus the Arrow type audit: any result
    column outside SAFE_ARROW_TYPES will degrade through pandas."""
    tbl = con.execute(sql).arrow()
    bad = [(f.name, str(f.type)) for f in tbl.schema
           if not arrow_type_ok(f.type)]
    pdf = tbl.to_pandas()
    cols = list(pdf.columns)
    rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    return cols, rows, bad

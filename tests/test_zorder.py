"""S18 Z-order clustering: key correctness (vs a pure-Python Morton
interleave) and the point of the layout — parquet footer min/max
envelopes tighten in BOTH dimensions, so box/single-column predicates
prune files a one-column sort cannot."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lectura.sources import write_zordered, zorder_key


def _py_spread(v: int) -> int:
    v &= 0x7FFFFFFF
    for s, m in ((16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
                 (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
                 (1, 0x5555555555555555)):
        v = (v | (v << s)) & m
    return v


def _py_zkey(x: int, y: int) -> int:
    return _py_spread(x) | (_py_spread(y) << 1)


def test_zorder_key_matches_python(spark):
    rows = [(0, 0), (1, 0), (0, 1), (2**31 - 1, 2**31 - 1),
            (123456789, 987654321), (2**30, 2**16), (7, 2**31 - 1),
            # negative / over-width inputs are masked to their low 31 bits
            (-1, 5), (2**40 + 3, 9)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.z for r in
           df.select("x", "y", zorder_key("x", "y").alias("z")).collect()}
    for x, y in rows:
        assert got[(x, y)] == _py_zkey(x & 0x7FFFFFFF, y & 0x7FFFFFFF)
        assert got[(x, y)] >= 0  # sign bit never set


def test_zorder_key_locality_monotone(spark):
    """Interleave order: the key sorts lexicographically by the bit-
    interleave — a point dominating another in both dims has the
    larger key (the envelope property pruning relies on)."""
    pts = [(x, y) for x in (0, 1, 5, 100) for y in (0, 2, 7, 50)]
    df = spark.createDataFrame(pts, "x long, y long")
    ks = {(r.x, r.y): r.z for r in
          df.select("x", "y", zorder_key("x", "y").alias("z")).collect()}
    for (x1, y1), k1 in ks.items():
        for (x2, y2), k2 in ks.items():
            if x1 <= x2 and y1 <= y2 and (x1, y1) != (x2, y2):
                assert k1 < k2


def _files_hit(paths, col_ranges):
    """Files whose footer min/max envelope intersects every (col, lo, hi)
    range — what a stats-based planner cannot skip."""
    hit = 0
    for p in paths:
        md = pq.read_metadata(p)
        schema_cols = {md.schema.column(i).name: i
                       for i in range(md.num_columns)}
        ok = True
        for col, lo, hi in col_ranges:
            mins, maxs = [], []
            ci = schema_cols[col]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                mins.append(st.min)
                maxs.append(st.max)
            if min(mins) > hi or max(maxs) < lo:
                ok = False
                break
        hit += ok
    return hit


@pytest.fixture(scope="module")
def grid_layouts(spark, tmp_path_factory):
    """64x64 uniform grid (one row per cell, 16 rows each) written two
    ways: z-ordered on (x, y) vs range-sorted on x alone."""
    base = tmp_path_factory.mktemp("zorder")
    n = 64
    df = (spark.range(n * n * 16)
          .select((F.col("id") % (n * n)).alias("cell"),
                  F.col("id").alias("row_id"))
          .select(((F.col("cell") % n)).alias("x"),
                  (F.floor(F.col("cell") / n)).cast("long").alias("y"),
                  "row_id"))
    zdir, ldir = str(base / "z"), str(base / "linear")
    write_zordered(df, "x", "y", zdir, n_files=16)
    (df.repartitionByRange(16, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(ldir))
    import glob
    return (sorted(glob.glob(f"{zdir}/part-*.parquet")),
            sorted(glob.glob(f"{ldir}/part-*.parquet")), df)


def test_zorder_prunes_both_dimensions(grid_layouts):
    zfiles, lfiles, _ = grid_layouts
    assert len(zfiles) == 16 and len(lfiles) == 16
    # y-only predicate: the x-sorted layout cannot prune AT ALL (every
    # file spans all y); the z-order layout skips most files
    y_band = [("y", 0, 7)]
    assert _files_hit(lfiles, y_band) == len(lfiles)
    assert _files_hit(zfiles, y_band) <= len(zfiles) // 2
    # box predicate: the [0,16)^2 quadrant is 1/16 of the space, so the
    # z-layout must confine it to a few files; the x-sorted layout needs
    # every file whose x-range touches [0,15]. Both counts wobble ±1
    # with repartitionByRange's sampled bounds (a strict < flaked when
    # both sampled to the same boundary value), so pin the absolute
    # z-side bound and never-worse relative to the linear layout.
    box = [("x", 0, 15), ("y", 0, 15)]
    z_hit, l_hit = _files_hit(zfiles, box), _files_hit(lfiles, box)
    assert z_hit <= l_hit
    assert z_hit <= len(zfiles) // 4
    # x-only predicate: the linear layout's home turf — z-order must
    # still prune (tight x envelopes survive the interleave)
    x_band = [("x", 0, 7)]
    assert _files_hit(zfiles, x_band) < len(zfiles)


def test_zorder_layout_preserves_content(spark, grid_layouts):
    zfiles, _, df = grid_layouts
    import os
    back = spark.read.parquet(os.path.dirname(zfiles[0]))
    assert back.columns == ["x", "y", "row_id"]  # _zkey dropped
    assert sorted(tuple(r) for r in back.collect()) == \
        sorted(tuple(r) for r in df.collect())
    # and Spark answers a box query identically off the clustered layout
    got = back.filter((F.col("x").between(3, 9))
                      & (F.col("y").between(20, 30))).count()
    want = df.filter((F.col("x").between(3, 9))
                     & (F.col("y").between(20, 30))).count()
    assert got == want

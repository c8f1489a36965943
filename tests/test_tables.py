"""Warehouse maintenance: compaction binpacks accumulated small files,
preserves rows/schema, keeps old snapshots readable (resume safety)."""

import pandas as pd
from pyspark.sql import functions as F

from lectura.tables import Warehouse


def _wh_with_appends(spark, tmp_path, n_appends=12, rows_per=50):
    wh = Warehouse(str(tmp_path / "wh"), spark)
    for i in range(n_appends):
        pdf = pd.DataFrame({
            "k": range(i * rows_per, (i + 1) * rows_per),
            "v": [f"row{i}-{j}" for j in range(rows_per)],
        })
        wh.append("t", spark.createDataFrame(pdf, schema="k long, v string")
                  .repartition(4))
    return wh


def test_compact_binpacks_and_preserves_rows(spark, tmp_path):
    wh = _wh_with_appends(spark, tmp_path)
    pre_files = len(wh._files("t"))
    pre_snap = wh.snapshot("t")
    want = sorted((r.k, r.v) for r in wh.read("t").collect())

    snap = wh.compact("t")  # 600 tiny rows -> 1 target file
    assert snap is not None and snap == pre_snap + 1
    post_files = wh._files("t")
    assert len(post_files) < pre_files and len(post_files) == 1
    assert sorted((r.k, r.v) for r in wh.read("t").collect()) == want
    # old snapshot still readable (resume may point before the compaction)
    assert sorted((r.k, r.v)
                  for r in wh.read("t", snapshot=pre_snap).collect()) == want
    # footer row count survives (broadcast-gate metadata path)
    assert wh.approx_rows("t") == len(want)


def test_compact_noop_when_already_compact(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"), spark)
    wh.append("t", spark.range(100).coalesce(1))
    assert wh.compact("t") is None  # 1 file, within 2x of target


def test_compact_cluster_by_recluster(spark, tmp_path):
    wh = _wh_with_appends(spark, tmp_path)
    want = sorted((r.k, r.v) for r in wh.read("t").collect())
    snap = wh.compact("t", cluster_by=("k",))
    assert snap is not None
    assert sorted((r.k, r.v) for r in wh.read("t").collect()) == want

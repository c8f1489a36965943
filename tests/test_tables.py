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


def test_source_format_roundtrips(spark, tmp_path):
    """S10 breadth: the engine must move tables through every format
    the runtime ships — ORC and line-text round-trips preserve values
    exactly (parquet/json/csv are covered by the S10 contract rows);
    the avro DATASOURCE is absent from this runtime (core avro jars
    only), asserted so a quiet environment change resurfaces it."""
    import pandas as pd
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "lang", "n_chars", "text")
    want = sorted((r.doc_id, r.lang, r.n_chars, r.text)
                  for r in docs.collect())

    orc_dir = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(orc_dir)
    got = sorted((r.doc_id, r.lang, r.n_chars, r.text)
                 for r in spark.read.orc(orc_dir).collect())
    assert got == want

    # line-text: one column named value; embed a record separator-free
    # projection (doc_id TAB lang) and parse back
    txt_dir = str(tmp_path / "docs_txt")
    docs.select(F.concat_ws("\t", F.col("doc_id").cast("string"),
                            "lang").alias("value")) \
        .write.mode("overwrite").text(txt_dir)
    back = (
        spark.read.text(txt_dir)
        .select(F.split("value", "\t").alias("p"))
        .select(F.element_at("p", 1).cast("long").alias("doc_id"),
                F.element_at("p", 2).alias("lang"))
    )
    assert sorted((r.doc_id, r.lang) for r in back.collect()) == \
        sorted((d, l) for d, l, _, _ in want)

    import pytest as _pytest
    from pyspark.errors import AnalysisException
    with _pytest.raises(AnalysisException):
        docs.limit(1).write.mode("overwrite") \
            .format("avro").save(str(tmp_path / "a"))


def test_merge_upsert_semantics_and_time_travel(spark, tmp_path):
    """MERGE INTO equivalence: matched keys replaced, unmatched base
    rows kept, new keys inserted — in ONE atomic snapshot; the
    pre-merge snapshot stays readable with pre-merge values (time
    travel across the merge); merging into a missing table creates
    it."""
    from lectura.tables import Warehouse

    wh = Warehouse(str(tmp_path / "wh"), spark)
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long")
    snap0 = wh.overwrite("t", base)
    upd = spark.createDataFrame(
        [(2, "B", 200), (9, "z", 900)], "k long, s string, v long")
    snap1 = wh.merge("t", upd, "k")
    assert snap1 == snap0 + 1

    got = sorted(tuple(r) for r in wh.read("t").collect())
    assert got == [(1, "a", 10), (2, "B", 200), (3, "c", 30), (9, "z", 900)]
    # time travel: the pre-merge snapshot is untouched
    old = sorted(tuple(r) for r in wh.read("t", snapshot=snap0).collect())
    assert old == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    # merge into a missing table == create
    wh.merge("t2", upd, "k")
    assert sorted(r.k for r in wh.read("t2").collect()) == [2, 9]
    # composite key: only the exact (k, s) pair is replaced
    wh2 = Warehouse(str(tmp_path / "wh2"), spark)
    wh2.overwrite("t", spark.createDataFrame(
        [(1, "a", 10), (1, "b", 11)], "k long, s string, v long"))
    wh2.merge("t", spark.createDataFrame(
        [(1, "a", 99)], "k long, s string, v long"), ["k", "s"])
    assert sorted(tuple(r) for r in wh2.read("t").collect()) == [
        (1, "a", 99), (1, "b", 11)]


def test_merge_rejects_duplicate_update_keys(spark, tmp_path):
    """Iceberg MERGE rejects multiple matches for one target row; the
    copy-on-write merge must raise on duplicate update keys instead of
    silently landing both rows (ADVICE r3). The table is untouched."""
    import pytest

    from lectura.tables import Warehouse

    wh = Warehouse(str(tmp_path / "wh"), spark)
    wh.overwrite("t", spark.createDataFrame(
        [(1, 10)], "k long, v long"))
    dup = spark.createDataFrame([(2, 20), (2, 21)], "k long, v long")
    with pytest.raises(ValueError, match="duplicate"):
        wh.merge("t", dup, "k")
    assert [tuple(r) for r in wh.read("t").collect()] == [(1, 10)]

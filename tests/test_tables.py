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


def _cl_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_changelog_diff_classes(spark, tmp_path):
    """Every change class between two overwrite snapshots: insert,
    delete, update before/after pair; unchanged rows emit NOTHING."""
    wh = Warehouse(str(tmp_path / "wh"), spark)
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string")
    v2 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d"), (5, "e")], "k long, v string")
    s1 = wh.overwrite("t", v1)
    s2 = wh.overwrite("t", v2)
    got = _cl_rows(wh.changelog("t", "k", from_snapshot=s1, to_snapshot=s2))
    assert got == sorted([
        ("insert", 5, "e"),
        ("delete", 3, "c"),
        ("update_before", 2, "b"),
        ("update_after", 2, "B"),
    ])
    # column order mirrors the table (fast path and join path agree)
    assert wh.changelog("t", "k", from_snapshot=s1).columns == \
        ["_change_type", "k", "v"]


def test_changelog_append_fast_path_zero_shuffle(spark, tmp_path):
    """Append-only range → incremental scan of ONLY the new files:
    no join/Exchange in the plan, and rows = exactly the appended set."""
    wh = Warehouse(str(tmp_path / "wh"), spark)
    s1 = wh.overwrite("t", spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")))
    wh.append("t", spark.range(100, 130).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")))
    wh.append("t", spark.range(130, 150).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")))
    cl = wh.changelog("t", "k", from_snapshot=s1)
    plan = cl._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    got = _cl_rows(cl)
    assert got == [("insert", k, 2 * k) for k in range(100, 150)]
    # baseline files are not even read: physical scan lists only the
    # files the range added
    scanned = [ln for ln in cl.inputFiles()]
    base_files = set(wh._files("t", s1))
    assert scanned and not (set(scanned) & base_files)


def test_changelog_compact_in_range_yields_no_changes(spark, tmp_path):
    """A compaction rewrites files but preserves content — the join path
    fires (file sets diverge) and must report ZERO row changes."""
    wh = Warehouse(str(tmp_path / "wh"), spark)
    s0 = None
    for i in range(6):
        df = spark.range(i * 20, (i + 1) * 20).select(
            F.col("id").alias("k"), F.col("id").cast("string").alias("v")
        ).repartition(3)
        snap = wh.append("t", df)
        if i == 0:
            s0 = snap
    assert wh.compact("t") is not None
    cl = wh.changelog("t", "k", from_snapshot=wh.snapshot("t") - 1)
    assert cl.count() == 0
    # and from s0 the join path still reports exactly the later appends
    got = _cl_rows(wh.changelog("t", "k", from_snapshot=s0))
    assert got == [("insert", k, str(k)) for k in range(20, 120)]


def test_changelog_duplicate_keys_raise(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"), spark)
    s1 = wh.overwrite("t", spark.createDataFrame(
        [(1, "a")], "k long, v string"))
    wh.overwrite("t", spark.createDataFrame(
        [(1, "a"), (1, "b")], "k long, v string"))
    import pytest as _pt
    with _pt.raises(ValueError, match="duplicate"):
        wh.changelog("t", "k", from_snapshot=s1).collect()


def test_changelog_edges(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"), spark)
    s1 = wh.overwrite("t", spark.createDataFrame(
        [(1, "a")], "k long, v string"))
    # same-snapshot range → typed empty frame, fast path
    empty = wh.changelog("t", "k", from_snapshot=s1, to_snapshot=s1)
    assert empty.count() == 0
    assert empty.columns == ["_change_type", "k", "v"]
    # inverted range raises
    import pytest as _pt
    wh.append("t", spark.createDataFrame([(2, "b")], "k long, v string"))
    with _pt.raises(ValueError, match="after"):
        wh.changelog("t", "k", from_snapshot=wh.snapshot("t"),
                     to_snapshot=s1)
    with _pt.raises(ValueError, match="key column"):
        wh.changelog("t", "missing", from_snapshot=s1)
    # key-only table: presence/absence semantics, no update class
    a = wh.overwrite("ko", spark.range(5).select(F.col("id").alias("k")))
    wh.overwrite("ko", spark.createDataFrame(
        [(3,), (4,), (5,)], "k long"))
    got = _cl_rows(wh.changelog("ko", "k", from_snapshot=a))
    assert got == sorted([
        ("delete", 0), ("delete", 1), ("delete", 2), ("insert", 5)])


def test_changelog_null_keys_and_schema_change_diagnosed(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"), spark)
    import pytest as _pt
    s1 = wh.overwrite("t", spark.createDataFrame(
        [(1, "a")], "k long, v string"))
    wh.overwrite("t", spark.createDataFrame(
        [(None, "x"), (2, "b")], "k long, v string"))
    with _pt.raises(ValueError, match="NULL"):
        wh.changelog("t", "k", from_snapshot=s1).collect()
    # schema evolution across the range is a clear error, not an
    # unresolved-column crash deep in analysis
    s2 = wh.overwrite("t", spark.createDataFrame(
        [(1, "a", 0)], "k long, v string, w long"))
    with _pt.raises(ValueError, match="schema changed"):
        wh.changelog("t", "k", from_snapshot=s1, to_snapshot=s2).collect()


def test_merge_null_update_keys_diagnosed(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"), spark)
    wh.overwrite("t", spark.createDataFrame([(1, "a")], "k long, v string"))
    import pytest as _pt
    with _pt.raises(ValueError, match="NULL"):
        wh.merge("t", spark.createDataFrame(
            [(None, "x")], "k long, v string"), "k")


def test_expire_snapshots_reclaims_history(spark, tmp_path):
    """S19: expiry drops old manifests + their unreferenced data files,
    keeps HEAD (and keep_from) readable, never touches files shared
    with kept snapshots."""
    import os
    wh = Warehouse(str(tmp_path / "wh"), spark)
    s0 = wh.overwrite("t", spark.range(100).select(
        F.col("id").alias("k")))
    s1 = wh.append("t", spark.range(100, 150).select(
        F.col("id").alias("k")))  # shares s0's files
    s2 = wh.overwrite("t", spark.range(50).select(F.col("id").alias("k")))
    s3 = wh.append("t", spark.range(50, 60).select(F.col("id").alias("k")))
    pre = sum(os.path.getsize(os.path.join(dp, f))
              for dp, _, fs in os.walk(wh._tdir("t")) for f in fs)
    stats = wh.expire_snapshots("t", keep_last=2)
    assert stats["expired"] == [s0, s1] and stats["kept"] == [s2, s3]
    assert stats["files_deleted"] > 0 and stats["bytes_freed"] > 0
    post = sum(os.path.getsize(os.path.join(dp, f))
               for dp, _, fs in os.walk(wh._tdir("t")) for f in fs)
    assert post < pre
    # survivors fully readable; expired time travel raises
    assert wh.read("t").count() == 60
    assert wh.read("t", snapshot=s2).count() == 50
    import pytest as _pt
    with _pt.raises(FileNotFoundError):
        wh.read("t", snapshot=s0).count()
    # keep_from extends retention below keep_last
    wh2 = Warehouse(str(tmp_path / "wh2"), spark)
    a = wh2.overwrite("t", spark.range(5))
    wh2.overwrite("t", spark.range(6))
    wh2.overwrite("t", spark.range(7))
    st = wh2.expire_snapshots("t", keep_last=1, keep_from=a)
    assert st["expired"] == [] and wh2.read("t", snapshot=a).count() == 5


def test_expire_snapshots_sweeps_orphans_not_external_files(spark, tmp_path):
    import os
    wh = Warehouse(str(tmp_path / "wh"), spark)
    wh.overwrite("t", spark.range(10))
    # orphan from a failed write attempt
    orphan_dir = os.path.join(wh._tdir("t"), "data", "deadbeef")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    # zero-copy registered external corpus file (outside the table dir)
    ext = str(tmp_path / "external")
    spark.range(3).coalesce(1).write.mode("overwrite").parquet(ext)
    ext_files = [os.path.join(ext, f) for f in os.listdir(ext)
                 if f.endswith(".parquet")]
    wh.register("ext_t", ext_files)
    stats = wh.expire_snapshots("t", keep_last=1)
    assert not os.path.exists(orphan) and not os.path.exists(orphan_dir)
    assert stats["files_deleted"] >= 1
    ext_stats = wh.expire_snapshots("ext_t", keep_last=1)
    assert ext_stats["files_deleted"] == 0
    assert all(os.path.exists(f) for f in ext_files)
    assert wh.read("ext_t").count() == 3


def test_expire_snapshots_drops_dangling_post_head_snapshots(spark, tmp_path):
    """A crashed round's commits survive as manifests PAST the
    rolled-back HEAD — expiry must reclaim them, not treat their junk
    files as referenced (review finding)."""
    import os
    wh = Warehouse(str(tmp_path / "wh"), spark)
    wh.overwrite("t", spark.range(10))
    keep = wh.overwrite("t", spark.range(20))
    dangling = wh.append("t", spark.range(1000, 2000))  # 'crashed' commit
    wh.rollback("t", keep)
    junk_files = set(wh._files("t", dangling)) - set(wh._files("t", keep))
    assert junk_files
    stats = wh.expire_snapshots("t", keep_last=1)
    assert dangling in stats["expired"]
    assert all(not os.path.exists(f) for f in junk_files)
    assert wh.read("t").count() == 20


def test_expire_snapshots_leaves_kept_sidecars_and_reports_truthfully(
        spark, tmp_path):
    """Kept staging dirs keep their _SUCCESS/.crc sidecars; a no-op
    expiry reports zero files deleted (review finding: sidecar sweep
    both mutated kept snapshots and inflated the stats)."""
    import glob
    import os
    wh = Warehouse(str(tmp_path / "wh"), spark)
    wh.overwrite("t", spark.range(10))
    side_pre = set(glob.glob(os.path.join(wh._tdir("t"), "data", "*", "_*"))
                   + glob.glob(os.path.join(wh._tdir("t"), "data", "*",
                                            ".*crc")))
    stats = wh.expire_snapshots("t", keep_last=5)
    assert stats["expired"] == [] and stats["files_deleted"] == 0 \
        and stats["bytes_freed"] == 0
    assert all(os.path.exists(p) for p in side_pre)

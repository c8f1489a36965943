"""Structured Streaming tests (SURVEY.md §5.7: ST2–ST8).

Micro-batch sequencing is driven by a file source with
maxFilesPerTrigger=1 over files whose mtimes force replay order, so
watermark eviction and cross-batch state are actually exercised (not
just single-batch degenerate runs).
"""

from __future__ import annotations

import os
import time
from datetime import datetime

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lectura import streaming


def _write_batch(watch_dir: str, seq: int, rows: list[dict], schema: pa.Schema):
    os.makedirs(watch_dir, exist_ok=True)
    tbl = pa.Table.from_pandas(pd.DataFrame(rows), schema=schema)
    path = os.path.join(watch_dir, f"{seq:02d}.parquet")
    pq.write_table(tbl, path)
    # file source orders by modification time: force strictly increasing
    t = time.time() - 1000 + seq * 10
    os.utime(path, (t, t))
    return path


EVENT_PA_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ]
)

FETCH_PA_SCHEMA = pa.schema(
    [("host", pa.string()), ("url", pa.string()), ("ts", pa.timestamp("us"))]
)


def _ev(eid, ts, etype="fetch", uid=1, value=1.0):
    return {
        "event_id": eid,
        "ts": datetime.fromisoformat(ts),
        "user_id": uid,
        "event_type": etype,
        "value": value,
        "props": "{}",
    }


def _fetch(host, url, ts):
    return {"host": host, "url": url, "ts": datetime.fromisoformat(ts)}


# --- ST2/ST3/ST4/ST7: streamed result == batch result on fixtures --------

SF0001 = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", [
    "stream_tumbling_st2", "stream_sliding_st3", "stream_session_st4",
    "stream_dedupe_st7",
])
def test_streamed_equals_batch(spark, name):
    from lectura import contract

    batch_twin = {
        "stream_tumbling_st2": "tumbling_st2",
        "stream_sliding_st3": "sliding_st3",
        "stream_session_st4": "session_st4",
    }
    qs = contract.queries()
    streamed = {tuple(r) for r in qs[name](spark, SF0001).collect()}
    if name == "stream_dedupe_st7":
        import pyspark.sql.functions as F

        expect = {
            tuple(r)
            for r in spark.read.parquet(f"{SF0001}/events.parquet")
            .select("event_type").distinct().collect()
        }
        del F
    else:
        expect = {tuple(r) for r in qs[batch_twin[name]](spark, SF0001).collect()}
    assert streamed == expect and len(streamed) > 0


# --- ST5: late rows beyond the watermark are dropped ----------------------

def test_watermark_drops_late_rows(spark, tmp_path):
    watch = str(tmp_path / "events_in")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    # Spark ≥3.4 filters late events with the PREVIOUS batch's watermark
    # and evicts state with the current one, so the sequence is:
    # batch 0: fill the 10:00 window; 12:30 advances the watermark to
    # 12:20 (takes effect from batch 1 on)
    _write_batch(watch, 0, [
        _ev(1, "2026-01-01 10:05:00"),
        _ev(2, "2026-01-01 10:10:00"),
        _ev(3, "2026-01-01 12:30:00"),
    ], EVENT_PA_SCHEMA)
    # batch 1: eviction watermark 12:20 finalizes+emits [10:00,11:00) with
    # n=2; 15:00 advances the late-event watermark to 14:50 for batch 2
    _write_batch(watch, 1, [_ev(5, "2026-01-01 15:00:00")], EVENT_PA_SCHEMA)
    # batch 2: a LATE row for the finalized 10:00 window → dropped by the
    # 14:50 watermark, never merged into state, never emitted
    _write_batch(watch, 2, [_ev(4, "2026-01-01 10:15:00")], EVENT_PA_SCHEMA)

    ev = streaming.read_event_stream(spark, watch, max_files_per_trigger=1)
    agg = streaming.tumbling_metrics(ev, size="1 hour", watermark="10 minutes")
    q = streaming.run_available_now(agg, sink, ckpt)

    out = {r["win_start"]: r["n"] for r in spark.read.parquet(sink).collect()}
    assert out["2026-01-01 10:00:00"] == 2  # late event_id=4 not counted
    dropped = sum(
        so["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    assert dropped == 1  # the state store explicitly dropped the late row


# --- ST6: stateful throttle carries last-fetch-ts across micro-batches ----

def test_host_throttle_state_across_batches(spark, tmp_path):
    watch = str(tmp_path / "fetch_in")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(watch, 0, [
        _fetch("a.example", "http://a.example/1", "2026-01-01 10:00:00"),
        _fetch("a.example", "http://a.example/2", "2026-01-01 10:00:30"),
        _fetch("b.example", "http://b.example/1", "2026-01-01 10:00:30"),
    ], FETCH_PA_SCHEMA)
    _write_batch(watch, 1, [
        # within 60s of a.example's last ADMITTED fetch (10:00:00) → reject;
        # without cross-batch state this would be admitted
        _fetch("a.example", "http://a.example/3", "2026-01-01 10:00:50"),
        _fetch("a.example", "http://a.example/4", "2026-01-01 10:02:00"),
    ], FETCH_PA_SCHEMA)

    fetches = (
        spark.readStream.schema(streaming.FETCH_SCHEMA)
        .option("maxFilesPerTrigger", "1").parquet(watch)
    )
    out = streaming.host_throttle(fetches, delay_s=60.0)
    streaming.run_available_now(out, sink, ckpt)

    rows = {r["url"]: r["admitted"] for r in spark.read.parquet(sink).collect()}
    assert rows == {
        "http://a.example/1": True,
        "http://a.example/2": False,   # 30s < 60s within batch 1
        "http://b.example/1": True,    # different host unaffected
        "http://a.example/3": False,   # cross-batch state: 50s < 60s
        "http://a.example/4": True,    # 120s ≥ 60s
    }


# --- ST8 (streaming face): foreachBatch is exactly-once per batch id ------

def test_foreach_batch_exactly_once(spark, tmp_path):
    watch = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    for i in range(3):
        _write_batch(watch, i, [_ev(i, f"2026-01-01 10:0{i}:00")],
                     EVENT_PA_SCHEMA)

    delivered: list[tuple[int, int]] = []

    def batch_fn(bdf, bid):
        delivered.append((bid, bdf.count()))

    ev = streaming.read_event_stream(spark, watch, max_files_per_trigger=1)
    streaming.run_foreach_batch(ev, batch_fn, ckpt)
    assert sorted(delivered) == [(0, 1), (1, 1), (2, 1)]

    # rerun against the SAME checkpoint: commit log says all batches done →
    # nothing is re-delivered (idempotent resume, B:14)
    rerun: list[tuple[int, int]] = []

    def batch_fn2(bdf, bid):
        rerun.append((bid, bdf.count()))

    ev2 = streaming.read_event_stream(spark, watch, max_files_per_trigger=1)
    streaming.run_foreach_batch(ev2, batch_fn2, ckpt)
    assert sum(n for _, n in rerun) == 0

    # new data after resume IS delivered exactly once
    _write_batch(watch, 3, [_ev(99, "2026-01-01 11:00:00")], EVENT_PA_SCHEMA)
    ev3 = streaming.read_event_stream(spark, watch, max_files_per_trigger=1)
    streaming.run_foreach_batch(ev3, batch_fn2, ckpt)
    assert sum(n for _, n in rerun) == 1


# --- ST9: stream-stream interval join — cross-batch state + watermark ----

def test_stream_join_state_across_batches_and_late_drop(spark, tmp_path):
    """A click in a LATER micro-batch must still join a view from an
    earlier one (join state retained until the watermark passes
    v_ts + horizon), and a click older than the watermark must be
    dropped, never joined."""
    watch = str(tmp_path / "events_in")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    # batch 0: view V1 + same-batch click C9 (pair 1), plus view V0
    # (user 2) whose only candidate click arrives too late in batch 2
    _write_batch(watch, 0, [
        _ev(1, "2026-01-01 10:00:00", etype="view", uid=1),
        _ev(9, "2026-01-01 10:05:00", etype="click", uid=1),
        _ev(6, "2026-01-01 09:25:00", etype="view", uid=2),
    ], EVENT_PA_SCHEMA)
    # batch 1: cross-batch click C2 at 10:20 joins V1 (pair 2). The
    # GLOBAL watermark is min over BOTH sides' watermarks
    # (multipleWatermarkPolicy=min), so the view side must advance too:
    # V8 at 11:00 (user 99, no clicks) pushes views to 10:50, clicks'
    # 10:20 pushes clicks to 10:10 → global watermark 10:10
    _write_batch(watch, 1, [
        _ev(2, "2026-01-01 10:20:00", etype="click", uid=1),
        _ev(8, "2026-01-01 11:00:00", etype="view", uid=99),
    ], EVENT_PA_SCHEMA)
    # batch 2: user 2's click at 09:30 is inside V0's horizon on paper,
    # but the click-side state watermark is global_wm − horizon = 09:40
    # (a 09:30 click can only match views with v_ts ≤ 09:30, and all
    # view state below 09:40 is evicted at wm 10:10) → the input row is
    # dropped, the (6, 3) pair never emitted. A click merely behind the
    # raw watermark but inside a live view's horizon (e.g. 10:06) is
    # NOT droppable and correctly joins — that's why the fixture uses
    # 09:30, not 10:06.
    _write_batch(watch, 2, [
        _ev(3, "2026-01-01 09:30:00", etype="click", uid=2),
    ], EVENT_PA_SCHEMA)

    ev = streaming.read_event_stream(spark, watch, max_files_per_trigger=1)
    joined = streaming.view_click_attribution(
        ev, horizon="30 minutes", watermark="10 minutes")
    q = streaming.run_available_now(joined, sink, ckpt)

    got = {(r.view_id, r.click_id, r.user_id, r.gap_us)
           for r in spark.read.parquet(sink).collect()}
    assert got == {(1, 9, 1, 5 * 60 * 1_000_000),
                   (1, 2, 1, 20 * 60 * 1_000_000)}
    dropped = sum(
        so["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    assert dropped >= 1


# --- ST10: stream-static join is stateless --------------------------------

def test_stream_static_join_stateless(spark, tmp_path):
    """Two micro-batches enriched against a static dim must equal the
    batch join, with ZERO stateful operators (stream-static inner
    joins keep no state — the whole point vs stream-stream)."""
    watch = str(tmp_path / "events_in")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(watch, 0, [
        _ev(1, "2026-01-01 10:00:00", etype="view", uid=1, value=3.0),
        _ev(2, "2026-01-01 10:01:00", etype="error", uid=1, value=9.0),
    ], EVENT_PA_SCHEMA)
    _write_batch(watch, 1, [
        _ev(3, "2026-01-01 10:02:00", etype="click", uid=2, value=2.5),
    ], EVENT_PA_SCHEMA)

    dim = spark.createDataFrame(
        [("view", "engage", 1.0), ("click", "engage", 2.0)],
        "event_type string, category string, weight double")
    ev = streaming.read_event_stream(spark, watch, max_files_per_trigger=1)
    q = streaming.run_available_now(
        streaming.enrich_events(ev, dim), sink, ckpt)

    got = sorted(tuple(r) for r in spark.read.parquet(sink).collect())
    # 'error' has no dim row → dropped by the inner join
    assert got == [(1, "view", "engage", 3.0), (3, "click", "engage", 5.0)]
    assert all(not p["stateOperators"] for p in q.recentProgress)


# --- ST11: streaming CMS registers — bounded state across batches ---------

DOC_PA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def _doc(i, text):
    return {"doc_id": i, "text": text, "lang": "en", "source": "s",
            "n_chars": len(text)}


def test_stream_cms_registers_across_batches(spark, tmp_path):
    """Registers accumulated over two micro-batches must equal the
    batch build over the union (associative counters), and state stays
    bounded at d*w rows."""
    from pyspark.sql import functions as F

    from lectura.textops import cms_estimates, cms_register_cells

    watch = str(tmp_path / "docs_in")
    _write_batch(watch, 0, [
        _doc(1, "spark spark window scan"),
        _doc(2, "the the the batch"),
    ], DOC_PA_SCHEMA)
    _write_batch(watch, 1, [
        _doc(3, "spark merge sort sort"),
        _doc(4, "window the spark"),
    ], DOC_PA_SCHEMA)

    d, w = 4, 64
    docs = (
        spark.readStream.schema(streaming.DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", "1").parquet(watch)
    )
    regs = streaming.collect_stream(
        streaming.stream_cms_registers(docs, d=d, w=w), spark)
    assert regs.count() <= d * w  # bounded sketch state

    batch = (
        cms_register_cells(spark.read.parquet(watch), d, w)
        .groupBy("r", "bucket").agg(F.count("*").alias("cnt"))
    )
    assert (sorted(map(tuple, regs.collect()))
            == sorted(map(tuple, batch.collect())))

    cands = ["spark", "the", "sort", "absentterm"]
    got = {r["term"]: r["est"]
           for r in cms_estimates(regs, cands, k=4, d=d, w=w).collect()}
    # w=64 may overestimate but never underestimates the true counts
    assert got["spark"] >= 4 and got["the"] >= 4 and got["sort"] >= 2

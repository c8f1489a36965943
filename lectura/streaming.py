"""Structured Streaming layer (SURVEY.md §2.8, ST1–ST8).

The crawl round loop itself is inherently iterative (round N's output
frontier is round N+1's input — a feedback loop Structured Streaming
cannot express as one query), so rounds stay a checkpointed batch loop
(lectura/crawl.py, ST1).  Streaming is used where it genuinely fits:
ingesting fetch-event telemetry and computing windowed crawl metrics —
URLs/sec rates, per-host sessions, late-data-tolerant counters — plus a
stateful per-host politeness throttle (ST6) and an idempotent
foreachBatch sink (ST8 streaming variant).

Every aggregation here has a batch-equivalent contract query with a
DuckDB SQL oracle (lectura/contract.py ST2/ST3/ST4), and the streamed
results are themselves contract-checked against the same SQL via a
complete-mode memory sink (contract.py stream_*): streaming and batch
must agree row-for-row on the same input.

Provenance: /root/reference was empty at survey time (SURVEY.md §0) —
semantics derive from BASELINE.json B:6 (windowed fetch metrics,
host-delay) and public Spark Structured Streaming docs.
"""

from __future__ import annotations

import tempfile
import uuid
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

FETCH_SCHEMA = "host string, url string, ts timestamp"


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: str = EVENT_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over parquet event files (ST2 input).

    `max_files_per_trigger=1` replays files one micro-batch at a time in
    modification-time order — the test harness for watermark/state
    semantics (§5.7)."""
    import os

    r = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(path):
        # the file source wants a directory; the fixture layout is a single
        # parquet FILE → stream the parent dir filtered to that filename
        d = os.path.dirname(os.path.abspath(path))
        r = r.option("pathGlobFilter", os.path.basename(path))
        return r.parquet(d)
    return r.parquet(path)


# --- ST2 + ST5: tumbling-window metrics under a watermark ----------------

def tumbling_metrics(
    events: DataFrame, size: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Fetch-event counts + value sums per tumbling window per event_type;
    rows later than `watermark` behind max seen ts are dropped (ST5)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --- ST3: sliding-window rates (the B:2 urls/sec metric shape) -----------

def sliding_rates(
    events: DataFrame,
    size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n",
        )
    )


# --- ST4: per-host/user fetch sessions (gap = politeness delay) ----------

def session_metrics(
    events: DataFrame,
    gap: str = "30 minutes",
    key: str = "user_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), key)
        .agg(F.count("*").alias("n_events"))
        .select(
            key,
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


# --- ST7: streaming dedupe (URL-seen semantics on the event feed) --------

def stream_dedupe(
    events: DataFrame, keys: list[str], watermark: str | None = None
) -> DataFrame:
    """First occurrence per key wins — the streaming analog of the
    URL-seen set (B:14).  With a watermark, state for keys older than the
    watermark is dropped (bounded state at 10^10 scale); without one the
    state grows like the exact seen set."""
    if watermark is not None:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


# --- ST6: stateful per-host politeness throttle ---------------------------

THROTTLE_OUT_SCHEMA = "host string, url string, ts timestamp, admitted boolean"
THROTTLE_STATE_SCHEMA = "last_ts double"


def _throttle_fn(delay_s: float) -> Callable:
    def fn(key: tuple, pdfs, state: GroupState):
        last: float | None = state.get[0] if state.exists else None
        rows: list[pd.DataFrame] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "url"], kind="mergesort")
            admitted = []
            for t in pdf["ts"]:
                ts = t.timestamp()
                ok = last is None or ts >= last + delay_s
                if ok:
                    last = ts
                admitted.append(ok)
            pdf = pdf.assign(admitted=admitted)
            rows.append(pdf[["host", "url", "ts", "admitted"]])
        if last is not None:
            state.update((float(last),))
        yield pd.concat(rows) if rows else pd.DataFrame(
            columns=["host", "url", "ts", "admitted"]
        )

    return fn


def host_throttle(fetches: DataFrame, delay_s: float) -> DataFrame:
    """Running last-fetch-ts per host across micro-batches
    (`applyInPandasWithState`): a fetch within `delay_s` of the previous
    admitted fetch for the same host is rejected.  Streaming variant of
    the batch F4 delay gate — state survives micro-batch boundaries, so a
    host throttled in batch 1 stays throttled into batch 2 (B:6
    host-delay).  The driver-side loop iterates rows *within one host's
    batch* only (politeness is inherently sequential per host); across
    hosts this is fully parallel, and per-host batches are politeness-
    budget-bounded (F3), so the loop is O(budget) not O(frontier)."""
    return fetches.groupBy("host").applyInPandasWithState(
        _throttle_fn(delay_s),
        outputStructType=THROTTLE_OUT_SCHEMA,
        stateStructType=THROTTLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- ST1/ST8: sinks -------------------------------------------------------

def run_available_now(
    df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """Drain all currently-available input into a parquet sink and stop.
    Re-running with the same checkpoint_dir replays nothing (exactly-once
    via the streaming commit log — the streaming face of ST8).  Returns
    the finished StreamingQuery so callers can inspect progress metrics
    (watermarks, numRowsDroppedByWatermark)."""
    q = (
        df.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_foreach_batch(
    df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """foreachBatch sink: each micro-batch is handed to `batch_fn(batch_df,
    batch_id)`; the checkpoint commit log guarantees a batch id is not
    re-delivered after success, and `batch_fn` must be idempotent per
    batch_id for crash-in-flight safety (same contract as the warehouse
    round commit, SURVEY.md ST8)."""
    q = (
        df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def view_click_attribution(events: DataFrame, horizon: str = "30 minutes",
                           watermark: str = "1 hour") -> DataFrame:
    """ST9 — stream-stream interval join (the canonical attribution
    shape, per the public Structured Streaming stream-stream-join
    semantics): each 'view' joins the same user's 'click's landing in
    [v_ts, v_ts + horizon], inclusive both ends. Watermarks on BOTH
    sides bound the join state Spark must retain (click state expires
    once watermark passes c_ts; view state once it passes
    v_ts + horizon) — without them an inner stream-stream join's state
    grows forever. Returns (view_id, click_id, user_id, gap_us) with
    the exact microsecond gap (unix_micros, integer — no float epoch).

    Scale shape: the join keys on user_id, so both sides hash-shuffle
    once on the SAME key and the range predicate evaluates inside the
    co-located stream-stream join operator; state size is bounded by
    events-per-watermark-window, not stream length."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"),
                F.col("ts").alias("v_ts"),
                F.col("event_id").alias("view_id"))
        .withWatermark("v_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
                F.col("event_id").alias("click_id"))
        .withWatermark("c_ts", watermark)
    )
    j = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {horizon}")),
    )
    return j.select(
        "view_id", "click_id", F.col("v_user").alias("user_id"),
        (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("gap_us"),
    )


def enrich_events(events: DataFrame, dim: DataFrame,
                  key: str = "event_type") -> DataFrame:
    """ST10 — stream-static enrichment join: the streaming side joins a
    static (batch) dimension — the lookup-table shape (event_type →
    category/weight here; url → robots verdict in the crawl). Stream-
    static inner joins are STATELESS (each micro-batch joins the
    current static snapshot; no watermark, no join state), so the
    static side can broadcast and the stream side never shuffles.
    INNER join: a stream row whose key has no dim entry is dropped —
    callers tracking row-count-preserving telemetry should pass a dim
    covering every key or switch the join to 'left' themselves. Emits
    one row per MATCHED stream row with the dim columns attached plus
    weighted_value = round(value * weight, 4)."""
    return (
        events.join(F.broadcast(dim), key)
        .select("event_id", key, "category",
                (F.round(F.col("value") * F.col("weight"), 4)
                 + F.lit(0.0)).alias("weighted_value"))
    )


def collect_stream(
    df: DataFrame, spark: SparkSession, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming aggregation to completion over the currently-
    available input via a memory sink and return the final result as a
    batch DataFrame.  Used by the contract stream_* queries so the
    DuckDB oracle can check the *streamed* result against the same SQL
    as the batch path."""
    name = "s" + uuid.uuid4().hex
    ckpt = tempfile.mkdtemp(prefix="lectura_stream_ckpt_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


DOCUMENT_SCHEMA = ("doc_id long, text string, lang string, "
                   "source string, n_chars long")


def stream_cms_registers(docs: DataFrame, d: int = 4, w: int = 64,
                         text_col: str = "text") -> DataFrame:
    """ST11 — streaming count-min-sketch maintenance: the CMS register
    table as a streaming aggregation over the document stream's token
    cells. State is BOUNDED at d·w rows no matter how long the stream
    runs — the streaming face of the D7 sketch (an exact groupBy(term)
    in complete mode would hold the whole unbounded vocabulary in
    state). Counter increments are associative and commutative, so
    micro-batch boundaries and arrival order cannot change the final
    registers: registers(stream) ≡ registers(batch union) — which is
    exactly what the contract oracle and the multi-batch pytest check.

    The token explode and cell hashing are narrow (scan-stage) ops from
    the shared cms_register_cells; only slim (r, bucket) cells reach
    the stateful exchange, and partial aggregation collapses each
    micro-batch task to ≤ d·w update rows before state lookup."""
    from lectura.textops import cms_register_cells

    cells = cms_register_cells(docs, d, w, text_col)
    return cells.groupBy("r", "bucket").agg(F.count("*").alias("cnt"))

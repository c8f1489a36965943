"""S16 — custom Python DataSource for the WARC packfile corpus
(the Spark 4 `pyspark.sql.datasource` V2 API): after registration,

    spark.dataSource.register(WarcDataSource)
    df = (spark.read.format("lectura_warc")
          .option("index", "<dir-or-file of the slim parquet index>")
          .load())

yields (url, warc_ts, lang, html) with bodies inflated from the
packfiles — the corpus becomes a first-class readable table instead of
an extraction-pipeline internal.

Scale shape: ONE InputPartition per packfile (each task reads its
segment sequentially — the locality/IO unit the writer laid down);
partition planning happens driver-side over the SLIM index only (url,
pointer, len — never bodies); `pushFilters` accepts EqualTo/In on
`lang` and `url`, so a pushed filter prunes index rows BEFORE any body
byte is read, and fully-filtered packfiles are never opened (the
partition list drops them). Unsupported filters are returned to Spark,
which evaluates them on top — pushdown is a pure IO saving, never a
semantics change.

Provenance: /root/reference was empty at survey time (SURVEY.md §0);
the packfile layout is this repo's own (synth_spark.py:
materialize_corpus_warc), the API is public PySpark 4.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    WriterCommitMessage,
)

SCHEMA = "url string, warc_ts timestamp, lang string, html binary"


@dataclass
class _Segment(InputPartition):
    """One packfile + its (already filter-pruned) slim index rows:
    (url, warc_ts, lang, offset, length), offset-sorted so the task
    reads the file front-to-back."""

    path: str
    rows: list


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.index = options.get("index")
        if not self.index:
            raise ValueError("lectura_warc requires .option('index', path)")
        # Relocatable-basename resolution assumes the writer's layout:
        # packfiles at <root>/seg-*.warc.gz with the index parquet ONE
        # level below at <root>/index/part-*.parquet (root is derived as
        # dirname(dirname(index_part))). For an index copied elsewhere —
        # or any non-standard layout — .option('root', dir) overrides the
        # derivation and basenames resolve against that directory
        # (ADVICE r4: a silently wrong derived root makes every read fail
        # with missing packfiles).
        self.root = options.get("root")
        self._pushed: list[Filter] = []

    def pushFilters(self, filters):  # noqa: N802 (API name)
        rest = []
        for f in filters:
            if (isinstance(f, (EqualTo, In))
                    and f.attribute in (("lang",), ("url",))):
                self._pushed.append(f)
            else:
                rest.append(f)
        return rest

    def _keep(self, url: str, lang: str) -> bool:
        for f in self._pushed:
            v = lang if f.attribute == ("lang",) else url
            if isinstance(f, EqualTo):
                if v != f.value:
                    return False
            else:
                # In.value is the tuple of accepted values
                if v not in f.value:
                    return False
        return True

    def partitions(self):
        import os

        import pyarrow.parquet as pq

        paths = [self.index]
        if os.path.isdir(self.index):
            paths = sorted(
                os.path.join(self.index, f)
                for f in os.listdir(self.index)
                if f.endswith(".parquet")
            )
        from datetime import timezone

        segs: dict[str, list] = {}
        for p in paths:
            # packfiles live beside the index dir (<root>/seg-*.warc.gz,
            # <root>/index/part-*.parquet): a bare-basename warc_file
            # (the relocatable layout the writer emits) resolves against
            # the table root derived from THIS index part's location, so
            # a moved corpus keeps reading. Absolute / path-bearing
            # values (pre-relocatable corpora) pass through verbatim;
            # .option('root', ...) overrides the derivation (see
            # __init__) when the index lives outside the standard
            # <root>/index/ layout.
            root = self.root or os.path.dirname(
                os.path.dirname(os.path.abspath(p)))
            t = pq.read_table(p, columns=["url", "warc_ts", "lang",
                                          "warc_file", "warc_offset",
                                          "warc_len"])
            for r in t.to_pylist():
                if not self._keep(r["url"], r["lang"]):
                    continue
                ts = r["warc_ts"]
                if ts is not None and ts.tzinfo is None:
                    # parquet stores UTC instants; the Arrow worker
                    # needs tz-aware values to convert back
                    ts = ts.replace(tzinfo=timezone.utc)
                wf = r["warc_file"]
                if os.sep not in wf and not os.path.isabs(wf):
                    wf = os.path.join(root, wf)
                segs.setdefault(wf, []).append(
                    (r["url"], ts, r["lang"],
                     r["warc_offset"], r["warc_len"]))
        return [
            _Segment(path, sorted(rows, key=lambda x: x[3]))
            for path, rows in sorted(segs.items())
        ]

    def read(self, partition: _Segment):
        import gzip

        if partition is None:
            # pyspark substitutes [None] when partitions() returns []
            # (every index row filter-pruned / empty index): zero rows,
            # not a crash
            return
        with open(partition.path, "rb") as f:
            for url, ts, lang, off, ln in partition.rows:
                f.seek(off)
                yield (url, ts, lang, gzip.decompress(f.read(ln)))


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lectura_warc"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> WarcReader:
        return WarcReader(dict(self.options))

    def writer(self, schema, overwrite: bool) -> "WarcWriter":
        return WarcWriter(dict(self.options), overwrite)


@dataclass
class _SegCommit(WriterCommitMessage):
    """One task's output: the packfile it wrote + the TEMP index part
    holding that packfile's slim rows. Only parts the driver receives
    here get promoted at commit — a failed/zombie attempt's files stay
    in the staging dir and are never read."""

    packfile: str
    index_tmp: str
    n_rows: int


class WarcWriter(DataSourceWriter):
    """`df.write.format("lectura_warc").option("path", dir).save()` —
    the sink half of S16: each task packs its rows' html as
    concatenated gzip members into one `seg-*.warc.gz` and stages a
    slim index part; the driver's `commit()` promotes exactly the
    staged parts of SUCCESSFUL attempts into `<dir>/index/` (the
    FileCommitProtocol shape: task attempts stage under unique
    attempt-ids, the driver publishes the chosen set, readers take the
    index as the source of truth, so orphan packfiles from failed
    attempts are unreachable rather than corrupting).

    SINGLE-WRITER CONTRACT (same as the Warehouse): one write job per
    table directory at a time. The `_MANIFEST.json` read-modify-write
    in `commit()` is not atomic across concurrent append jobs, and an
    overwrite job deletes every packfile not bearing its own job id —
    concurrent writers would lose manifest rows or each other's live
    packfiles (ADVICE r3). Coordinate externally (the crawl loop's
    RoundLog serializes all its writes)."""

    def __init__(self, options: dict, overwrite: bool):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("lectura_warc write requires "
                             ".option('path', dir)")
        self.overwrite = overwrite
        # one id per write job, fixed driver-side and pickled to every
        # task: append-mode part/packfile names can never collide with
        # an earlier write's, and overwrite knows which files are "ours"
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, rows):
        import gzip
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        tc = TaskContext.get()
        att = f"{self.job_id}-{tc.partitionId():05d}-{tc.taskAttemptId()}"
        os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)
        pack = os.path.join(self.path, f"seg-{att}.warc.gz")
        tmp = os.path.join(self.path, "_staging",
                           f"part-{att}-{uuid.uuid4().hex}.parquet")
        idx = {"url": [], "warc_ts": [], "lang": [], "warc_file": [],
               "warc_offset": [], "warc_len": []}
        off = 0
        with open(pack, "wb") as out:
            for r in rows:
                blob = gzip.compress(bytes(r.html), compresslevel=1)
                out.write(blob)
                idx["url"].append(r.url)
                idx["warc_ts"].append(r.warc_ts)
                idx["lang"].append(r.lang)
                # basename, not the constructed path: the corpus must be
                # RELOCATABLE (ADVICE r3 — an absolute/CWD-relative path
                # here breaks every read after a directory move). The
                # reader rejoins it against the table root derived from
                # the index location.
                idx["warc_file"].append(os.path.basename(pack))
                idx["warc_offset"].append(off)
                idx["warc_len"].append(len(blob))
                off += len(blob)
        pq.write_table(
            pa.table(idx, schema=pa.schema([
                ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
                ("lang", pa.string()), ("warc_file", pa.string()),
                ("warc_offset", pa.int64()), ("warc_len", pa.int32()),
            ])), tmp)
        return _SegCommit(pack, tmp, len(idx["url"]))

    def commit(self, messages):
        import json
        import os

        idx_dir = os.path.join(self.path, "index")
        os.makedirs(idx_dir, exist_ok=True)
        if self.overwrite:
            # overwrite = this job replaces the table: clear every
            # previously-committed index part and packfile BEFORE
            # promoting ours (readers take the index as truth, so the
            # part removal is the operative step)
            for f in os.listdir(idx_dir):
                if f.endswith(".parquet"):
                    os.remove(os.path.join(idx_dir, f))
            for f in os.listdir(self.path):
                if (f.startswith("seg-") and f.endswith(".warc.gz")
                        and not f.startswith(f"seg-{self.job_id}-")):
                    os.remove(os.path.join(self.path, f))
        n = 0
        packs = []
        for i, m in enumerate(messages):
            os.replace(
                m.index_tmp,
                os.path.join(idx_dir,
                             f"part-{self.job_id}-{i:05d}.parquet"))
            n += m.n_rows
            # manifest stores basenames too — same relocatability rule
            # as the index's warc_file column
            packs.append(os.path.basename(m.packfile))
        man_path = os.path.join(self.path, "_MANIFEST.json")
        if not self.overwrite and os.path.exists(man_path):
            with open(man_path) as f:
                old = json.load(f)
            n += old.get("n_rows", 0)
            packs.extend(old.get("packfiles", []))
        with open(man_path, "w") as f:
            json.dump({"n_rows": n, "packfiles": sorted(packs)}, f)
        # sweep THIS job's leftover staged parts (failed/zombie task
        # attempts whose index_tmp never reached `messages`) and their
        # orphan packfiles — previously only abort() drained _staging
        # (ADVICE r3). Other jobs' staging files are left alone.
        staging = os.path.join(self.path, "_staging")
        committed = {os.path.basename(p) for p in packs}
        if os.path.isdir(staging):
            for f in os.listdir(staging):
                if f.startswith(f"part-{self.job_id}-"):
                    os.remove(os.path.join(staging, f))
        for f in os.listdir(self.path):
            if (f.startswith(f"seg-{self.job_id}-")
                    and f.endswith(".warc.gz") and f not in committed):
                os.remove(os.path.join(self.path, f))

    def abort(self, messages):
        import os
        import shutil

        for m in messages:
            if m is not None:
                for p in (m.index_tmp, m.packfile):
                    if os.path.exists(p):
                        os.remove(p)
        shutil.rmtree(os.path.join(self.path, "_staging"),
                      ignore_errors=True)

"""Custom Python DataSource: Kafka-twin Debezium replay (SURVEY S1/S2/S6).

The reference's entry point is a Kafka consumer over one-or-many
Debezium topics (reference: `FlinkKafkaConsumer(String topic, ...)`
constructors at DebeziumTransactionReconstructor.java:53,65 and
...WithEventCorrelation.java:56 — the latter's "mysql-server.db_1.*"
string is a literal topic NAME in that overload, not a pattern; the
pattern-subscribe surface here comes from the Kafka consumer API's
`Pattern` overload, which the reference's topic naming implies but
never calls). The
Kafka connector jar is absent in this container, so the Kafka reader
itself (`streaming/sources.kafka_debezium_stream`) can never execute
here. This module closes that evidence gap with a REAL, runnable
source: a PySpark 4 `DataSource` (public API, SPARK-44076) that serves
newline-delimited Debezium envelopes from per-topic replay files with
the SAME surface semantics as the Kafka source:

- output schema mirrors Spark's Kafka source rows: (topic STRING,
  partition INT, offset LONG, value STRING, timestamp TIMESTAMP) —
  value kept as STRING (the reference consumes UTF-8
  SimpleStringSchema, not bytes);
- `subscribe` (comma-separated exact topics) XOR `subscribePattern`
  (regex) — the S2 row's semantics, executable at last;
- `startingOffsets` earliest|latest;
- streaming offsets are a `{topic: next_line}` dict; `read` between
  two offsets is deterministic replay, so checkpoint recovery
  re-produces identical micro-batches (S6);
- batch AND streaming readers share the topic/offset logic; reads run
  on executors with one `InputPartition` per topic slice, so a
  many-topic replay scales out instead of bottlenecking the driver
  (`SimpleDataSourceStreamReader` would funnel every record through
  the driver — deliberately avoided).

Topic layout: `<root>/<topic>.jsonl`, one envelope per line (a
single-partition topic, matching the reference's ordering assumption,
readme.md:1) — or the PARTITIONED form `<root>/<topic>.p<k>.jsonl`,
one file per Kafka-style partition. Line number == offset WITHIN the
partition; ordering holds per partition only (exactly Kafka's
contract). Readers plan one-or-more input slices per (topic,
partition), so a partitioned replay scales out across executors the
way a partitioned Kafka topic scales across consumers; streaming
offsets are per-partition (`{"topic@k": next_line}`, with bare-topic
keys from pre-partitioning checkpoints read as partition 0). Writers
route rows to partitions by an explicit `partition` column, else by
deterministic key hash (`key` column, md5-based — reproducible
cross-engine, unlike the JVM murmur2), else partition 0 (keyless
rows stay ordered; Kafka's round-robin would be nondeterministic
under replay).

At 100 TB scale the real deployment reads Kafka through the JVM
connector; this source is the hermetic twin for tests, local replay,
and CI — same plan surface downstream (the reconstruction pipeline
consumes (seq, value) regardless of which source produced it).
"""

from __future__ import annotations

import os
import re
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

KAFKA_TWIN_SCHEMA = StructType(
    [
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("value", StringType()),
        StructField("timestamp", TimestampType()),
    ]
)

_EPOCH = datetime(2020, 1, 1, tzinfo=timezone.utc)


_PART_RE = re.compile(r"^(?P<topic>.+)\.p(?P<part>\d+)\.jsonl$")


def _topic_files(root: str) -> dict[str, dict[int, str]]:
    """Map topic -> {partition -> file}. `<topic>.jsonl` is the
    single-partition form (partition 0); `<topic>.p<k>.jsonl` the
    partitioned form. Mixing both forms for one topic is rejected —
    it would make partition 0 ambiguous."""
    if not os.path.isdir(root):
        raise FileNotFoundError(f"debezium_replay path does not exist: {root}")
    out: dict[str, dict[int, str]] = {}
    flat: set[str] = set()
    for f in sorted(os.listdir(root)):
        if not f.endswith(".jsonl"):
            continue
        m = _PART_RE.match(f)
        if m:
            out.setdefault(m.group("topic"), {})[int(m.group("part"))] = os.path.join(
                root, f
            )
        else:
            t = f[: -len(".jsonl")]
            out.setdefault(t, {})[0] = os.path.join(root, f)
            flat.add(t)
    for t in flat:
        if len(out[t]) > 1:
            raise ValueError(
                f"topic {t!r} has both {t}.jsonl and {t}.p<k>.jsonl files; "
                "pick one layout"
            )
    return out


def _select_topics(options: dict) -> dict[str, dict[int, str]]:
    """Resolve subscribe/subscribePattern against the topic files
    (topic -> {partition -> file}).

    Mirrors the Kafka option contract: exactly one of the two.
    """
    root = options.get("path")
    if not root:
        raise ValueError("debezium_replay requires a 'path' option")
    subscribe = options.get("subscribe")
    pattern = options.get("subscribepattern") or options.get("subscribePattern")
    if bool(subscribe) == bool(pattern):
        raise ValueError("need exactly one of subscribe or subscribePattern")
    topics = _topic_files(root)
    if subscribe:
        wanted = [t.strip() for t in subscribe.split(",") if t.strip()]
        missing = [t for t in wanted if t not in topics]
        if missing:
            raise ValueError(f"unknown topic(s) {missing}; have {sorted(topics)}")
        return {t: topics[t] for t in wanted}
    rx = re.compile(pattern)
    chosen = {t: p for t, p in topics.items() if rx.fullmatch(t)}
    if not chosen:
        raise ValueError(f"subscribePattern {pattern!r} matched no topic in {sorted(topics)}")
    return chosen


def _line_count(path: str) -> int:
    n = 0
    with open(path, "rb") as fh:
        for _ in fh:
            n += 1
    return n


def _read_slice(topic: str, part: int, path: str, start: int, end: int):
    """Yield Kafka-twin rows for lines [start, end) of one topic
    partition file.

    Deterministic for a fixed (path, start, end) — the property that
    makes offset-range replay (checkpoint recovery) exact.
    """
    with open(path, "r", encoding="utf-8") as fh:
        for i, line in enumerate(fh):
            if i >= end:
                break
            if i >= start:
                ts = datetime.fromtimestamp(_EPOCH.timestamp() + i, tz=timezone.utc)
                yield (topic, part, i, line.rstrip("\n"), ts)


class _TopicSlice(InputPartition):
    def __init__(self, topic: str, part: int, path: str, start: int, end: int):
        self.topic = topic
        self.part = part
        self.path = path
        self.start = start
        self.end = end


def _iter_partition_files(topics: dict[str, dict[int, str]]):
    for t, parts in topics.items():
        for k, path in sorted(parts.items()):
            yield t, k, path


class _ReplayBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self._topics = _select_topics(options)
        self._rows_per_slice = int(options.get("rowsperslice", options.get("rowsPerSlice", 50_000)))

    def partitions(self):
        out = []
        for t, k, p in _iter_partition_files(self._topics):
            total = _line_count(p)
            step = max(1, self._rows_per_slice)
            for s in range(0, max(total, 1), step):
                out.append(_TopicSlice(t, k, p, s, min(s + step, total)))
        return out

    def read(self, partition: _TopicSlice):
        yield from _read_slice(
            partition.topic, partition.part, partition.path,
            partition.start, partition.end,
        )


def _offset_key(topic: str, part: int) -> str:
    return f"{topic}@{part}"


def _offset_get(offsets: dict, topic: str, part: int) -> int:
    """Read a per-partition offset; a bare-topic key (checkpoint
    written before the partitioned layout existed) counts as that
    topic's partition 0."""
    v = offsets.get(_offset_key(topic, part))
    if v is None and part == 0:
        v = offsets.get(topic)
    return int(v or 0)


class _ReplayStreamReader(DataSourceStreamReader):
    """Micro-batch reader: offset = {"topic@partition": next_line}."""

    def __init__(self, options: dict):
        self._topics = _select_topics(options)
        self._starting = (options.get("startingoffsets") or options.get("startingOffsets") or "earliest").lower()
        self._max_per_batch = int(
            options.get("maxrecordsperbatch", options.get("maxRecordsPerBatch", 10_000))
        )
        self._cursor: dict | None = None

    def initialOffset(self) -> dict:
        if self._starting == "latest":
            first = {
                _offset_key(t, k): _line_count(p)
                for t, k, p in _iter_partition_files(self._topics)
            }
        elif self._starting == "earliest":
            first = {
                _offset_key(t, k): 0
                for t, k, p in _iter_partition_files(self._topics)
            }
        else:
            raise ValueError(f"startingOffsets must be earliest|latest, got {self._starting}")
        self._cursor = dict(first)
        return first

    def latestOffset(self) -> dict:
        # Admission control lives HERE, not in partitions(): whatever
        # this returns is checkpointed as consumed, so clamping later
        # would silently skip records. Advance the planning cursor at
        # most max_per_batch lines per topic PARTITION per micro-batch
        # (the Kafka maxOffsetsPerTrigger analog). After a checkpoint
        # restart the cursor is unset (initialOffset not called) — the
        # first batch then takes everything available, which is safe:
        # replay is deterministic and bounded by the file length.
        counts = {
            _offset_key(t, k): _line_count(p)
            for t, k, p in _iter_partition_files(self._topics)
        }
        cur = getattr(self, "_cursor", None)
        if cur is None:
            self._cursor = dict(counts)
            return counts
        out = {
            key: min(n, int(cur.get(key, 0)) + self._max_per_batch)
            for key, n in counts.items()
        }
        self._cursor = dict(out)
        return out

    def partitions(self, start: dict, end: dict):
        parts = []
        for t, k, p in _iter_partition_files(self._topics):
            s = _offset_get(start, t, k)
            e = _offset_get(end, t, k)
            if e > s:
                parts.append(_TopicSlice(t, k, p, s, e))
        if not parts:
            # Spark requires >=1 partition per planned batch; emit an
            # empty slice of the first topic partition.
            t, k, p = next(_iter_partition_files(self._topics))
            parts.append(_TopicSlice(t, k, p, 0, 0))
        return parts

    def read(self, partition: _TopicSlice):
        yield from _read_slice(
            partition.topic, partition.part, partition.path,
            partition.start, partition.end,
        )

    def commit(self, end: dict) -> None:
        pass  # file replay holds no server-side state to release


class _StagedFile(WriterCommitMessage):
    """One task's staged output: (staging file, rows written)."""

    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


def _writer_target(options: dict) -> tuple[str, str | None, int | None]:
    root = options.get("path")
    if not root:
        raise ValueError("debezium_replay writer requires a 'path' option")
    n_parts = options.get("topicpartitions") or options.get("topicPartitions")
    if n_parts is not None:
        n_parts = int(n_parts)
        if n_parts < 1:
            raise ValueError(f"topicPartitions must be >= 1, got {n_parts}")
    return root, options.get("topic"), n_parts


def _route_partition(row, topic: str, n_parts: int | None) -> int | None:
    """Kafka producer routing, deterministically: explicit `partition`
    column wins (validated against topicPartitions when set); else a
    `key` column hashes to a partition (md5-based — reproducible
    cross-engine, unlike JVM murmur2); else partition 0 (Kafka would
    round-robin keyless rows, which is nondeterministic under replay).
    Returns None for the single-partition flat layout (no
    topicPartitions option and no explicit partition column)."""
    import hashlib

    explicit = getattr(row, "partition", None)
    if explicit is not None:
        explicit = int(explicit)
        if explicit < 0 or (n_parts is not None and explicit >= n_parts):
            raise ValueError(
                f"row partition {explicit} out of range for "
                f"topicPartitions={n_parts} (topic {topic!r})"
            )
        return explicit
    if n_parts is None:
        return None
    key = getattr(row, "key", None)
    if key is None:
        return 0
    digest = hashlib.md5(str(key).encode("utf-8")).hexdigest()
    return int(digest[:8], 16) % n_parts


def _stage_rows(
    root: str, default_topic: str | None, iterator, n_parts: int | None = None
) -> _StagedFile:
    """Executor side: append this task's rows to a private staging
    file as `filebase\\tvalue` lines, where filebase is the routed
    target log (`<topic>.jsonl` or `<topic>.p<k>.jsonl` — see
    _route_partition). Commit (driver side) folds staged files into
    those logs — the two-phase shape a Kafka producer's transactional
    send gives you for free."""
    import uuid

    staging = os.path.join(root, "_staging")
    os.makedirs(staging, exist_ok=True)
    path = os.path.join(staging, f"{uuid.uuid4().hex}.part")
    n = 0
    with open(path, "w", encoding="utf-8") as fh:
        for row in iterator:
            topic = getattr(row, "topic", None) or default_topic
            if not topic:
                raise ValueError(
                    "row has no 'topic' column and no 'topic' writer option"
                )
            value = row.value
            if value is None:
                raise ValueError("row 'value' must not be null")
            if "\n" in value:
                raise ValueError("envelope values must be single-line JSON")
            part = _route_partition(row, topic, n_parts)
            base = f"{topic}.jsonl" if part is None else f"{topic}.p{part}.jsonl"
            fh.write(f"{base}\t{value}\n")
            n += 1
    return _StagedFile(path, n)


def _fold_staged(root: str, messages) -> int:
    """Driver side: append staged lines into their routed log files
    (`filebase\tvalue` staged format) in task order (message list
    order), then drop the staging files. Append order across tasks is
    the message order, so a committed log replays deterministically."""
    total = 0
    sinks: dict[str, object] = {}
    try:
        for m in messages:
            if m is None:
                continue
            with open(m.path, "r", encoding="utf-8") as fh:
                for line in fh:
                    base, _, value = line.rstrip("\n").partition("\t")
                    out = sinks.get(base)
                    if out is None:
                        out = sinks[base] = open(
                            os.path.join(root, base), "a", encoding="utf-8"
                        )
                    out.write(value + "\n")
                    total += 1
    finally:
        for out in sinks.values():
            out.close()
    _drop_staged(messages)
    return total


def _drop_staged(messages) -> None:
    for m in messages:
        if m is not None and os.path.exists(m.path):
            os.remove(m.path)


class _ReplayBatchWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self._root, self._topic, self._n_parts = _writer_target(options)
        self._overwrite = overwrite
        os.makedirs(self._root, exist_ok=True)

    def write(self, iterator) -> _StagedFile:
        return _stage_rows(self._root, self._topic, iterator, self._n_parts)

    def commit(self, messages) -> None:
        if self._overwrite:
            # truncate exactly the partition logs this commit writes
            bases = set()
            for m in messages:
                if m is None:
                    continue
                with open(m.path, "r", encoding="utf-8") as fh:
                    bases.update(line.split("\t", 1)[0] for line in fh)
            for b in bases:
                open(os.path.join(self._root, b), "w").close()
        _fold_staged(self._root, messages)

    def abort(self, messages) -> None:
        _drop_staged(messages)


def _recover_pending_folds(root: str) -> None:
    """Roll back any fold whose commit never became durable. A
    ``_commits/<batchId>.pre`` journal records each target log file's
    byte length BEFORE that epoch's fold; the journal is atomically
    renamed to the commit marker after the fold, so a surviving
    ``.pre`` means the fold may have run partially (or fully) without
    committing — truncating every topic log back to the journaled
    length restores the exact pre-fold state, and the epoch's replay
    then re-folds cleanly."""
    import glob as _glob
    import json

    for jp in _glob.glob(os.path.join(root, "_commits", "*.pre")):
        with open(jp, "r", encoding="utf-8") as fh:
            offsets = json.load(fh)["offsets"]
        for base, off in offsets.items():
            p = os.path.join(root, base)
            if os.path.exists(p) and os.path.getsize(p) > off:
                with open(p, "r+b") as fh:
                    fh.truncate(off)
        os.remove(jp)


class _ReplayStreamWriter(DataSourceStreamWriter):
    """Micro-batch sink with epoch-idempotent, crash-atomic commits —
    the file-twin of Kafka's transactional producer + committed-read
    consumers (effectively exactly-once end to end).

    Commit protocol (all driver-side, one epoch at a time):
      1. journal the pre-fold byte length of every target topic log
         to ``_commits/<batchId>.pre`` (atomic tmp+replace);
      2. fold staged lines into the per-topic logs;
      3. ``os.replace`` the journal onto the commit marker — ONE
         atomic op, so the epoch is either journaled-uncommitted or
         marked-committed, never neither.
    A replayed batchId that finds its marker drops the staged data
    (crash after commit). A crash DURING the fold leaves the journal;
    the next commit truncates each log back to the journaled length
    before folding, so partially-appended lines never survive a
    replay (crash-in-commit, the window a bare append-then-marker
    scheme duplicates)."""

    def __init__(self, options: dict):
        self._root, self._topic, self._n_parts = _writer_target(options)
        os.makedirs(os.path.join(self._root, "_commits"), exist_ok=True)

    def write(self, iterator) -> _StagedFile:
        return _stage_rows(self._root, self._topic, iterator, self._n_parts)

    def commit(self, messages, batchId: int) -> None:
        import json

        marker = os.path.join(self._root, "_commits", str(batchId))
        if os.path.exists(marker):
            _drop_staged(messages)  # replayed epoch: already committed
            return
        _recover_pending_folds(self._root)
        bases = set()
        for m in messages:
            if m is None:
                continue
            with open(m.path, "r", encoding="utf-8") as fh:
                bases.update(line.split("\t", 1)[0] for line in fh)
        offsets = {}
        for b in bases:
            p = os.path.join(self._root, b)
            offsets[b] = os.path.getsize(p) if os.path.exists(p) else 0
        journal = marker + ".pre"
        with open(journal + ".tmp", "w", encoding="utf-8") as fh:
            json.dump({"offsets": offsets}, fh)
        os.replace(journal + ".tmp", journal)
        _fold_staged(self._root, messages)
        os.replace(journal, marker)  # atomic: committed iff marker exists

    def abort(self, messages, batchId: int) -> None:
        _drop_staged(messages)


class DebeziumReplayDataSource(DataSource):
    """`spark.read.format("debezium_replay")` / `spark.readStream...`
    plus the writer direction (`df.write` / `df.writeStream`), the
    Kafka-PRODUCER twin: rows with (value [, topic]) are appended to
    the per-topic replay logs through a stage-then-commit protocol
    (executor-staged part files, driver-ordered fold, per-epoch
    idempotency markers for streaming).

    Register once per session:
        spark.dataSource.register(DebeziumReplayDataSource)
    """

    @classmethod
    def name(cls) -> str:
        return "debezium_replay"

    def schema(self):
        return KAFKA_TWIN_SCHEMA

    def reader(self, schema):
        return _ReplayBatchReader(self.options)

    def streamReader(self, schema):
        return _ReplayStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        return _ReplayBatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return _ReplayStreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(DebeziumReplayDataSource)

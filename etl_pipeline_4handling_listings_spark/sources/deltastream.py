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
  from version ``n`` onward instead;
  ``.option("startingTimestamp", ts)`` resolves ``n`` as the
  earliest commit at or after ``ts`` via the authoritative commit
  time (``inCommitTimestamp`` when recorded, else entry mtime —
  the ``timestampAsOf`` resolver).
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
  analogue at commit granularity) and
  ``.option("maxBytesPerTrigger", n)`` is Delta's soft byte cap at
  FILE granularity: files are admitted in commit order until their
  cumulative sizes reach the budget (the file that crosses it is
  still admitted — soft cap, always at least one), and the cut may
  land INSIDE a commit — the offset then carries an intra-commit
  ``index``, exactly Delta's own ``(reservoirVersion, index)``
  model, so one giant backfill commit (50k files) streams as many
  bounded batches instead of one giant plan. In change-feed mode
  the sizes counted are the emitted units' (cdc files / derived
  insert+delete files), so delete-heavy cdc streams are capped
  too. The Python stream-reader API plans the first post-restart
  batch before the reader learns its checkpointed position, so that
  batch is uncapped UNLESS ``.option("offsetStateDir", dir)`` names
  a directory the reader may own: ``commit()`` then persists the
  last committed offset there and a cold start caps from it. One
  state dir per (table, checkpoint) pair — sharing it across
  queries only loosens/tightens the cap, never loses data (the
  checkpoint stays the source of truth for WHAT replays).
- **Schema changes stop the stream** (Delta-source behavior): a
  tailed commit whose ``metaData`` changes the field set/types
  raises a named error telling the user to restart; the restart
  re-resolves the (new) schema and pre-change files project with
  nulls for added columns.

Scale: offset planning and schema derivation use the pure-Python
metadata replay (``deltalog._py_actions`` — one dict per action,
the cardinality Spark's own file index holds); row reads happen on
EXECUTORS, one input partition per data file, emitted as pyarrow
RecordBatches (DV mask via ``take``, physical->logical projection,
partition values and CDF metadata as constant Arrow columns — no
per-row Python).
Exactly-once comes from Spark's offset checkpointing: offsets are
``{"version": n, "snap": bool}`` plus an optional intra-commit
``"index"`` (the count of version n's emitted units already
consumed; absent = the commit is fully consumed), and replay of a
committed range reproduces the same files — the per-commit unit
list is the deterministic order of the commit's log entry.

Column mapping: ``name`` mode projects fields from their physical
parquet names into logical ones (partitionValues key by physical
name); ``id`` mode resolves data columns by parquet field id
(``PARQUET:field_id`` metadata) with physical-name fallback for
pre-annotation files, mirroring the batch reader ``read_delta``.
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
    _first_version_at_or_after,
    _latest_log_version,
    _LOG_DIR,
    _py_actions,
    _py_check_protocol,
    DeltaProtocolError,
)

_STREAM_MAPPING_MODES = ("", "none", "name", "id")


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
            "streaming tail source"
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


def _field_ids(meta: dict) -> dict[str, int] | None:
    """logical field name -> column-mapping id, or None unless the
    table is in ``id`` mode (spec: ids are authoritative only
    there; name mode resolves by physicalName even when ids are
    also recorded)."""
    cm = dict(meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    if cm != "id":
        return None
    fields = json.loads(meta["schemaString"])["fields"]
    return {
        f["name"]: (f.get("metadata") or {}).get(
            "delta.columnMapping.id"
        )
        for f in fields
    }


def _schema_sig(meta: dict):
    """Order-insensitive (name, type) signature of the logical
    schema — the thing a mid-stream metaData action must not change
    (column-mapping metadata / nullability tweaks are not data
    changes and do not trip the gate)."""
    fields = json.loads(meta["schemaString"])["fields"]
    return frozenset(
        (f["name"], json.dumps(f["type"], sort_keys=True))
        for f in fields
    )


class _TailPartition(InputPartition):
    """One data file of one emitted commit: absolute path, the add's
    partitionValues (PHYSICAL names), its deletionVector descriptor
    (or None), the logical->physical name map, and (id mode) the
    logical->field-id map. In change-feed mode (``cdf``), ``ctype``
    labels derived rows ('insert' / 'delete'; None = the file itself
    carries ``_change_type``) and ``commit_version`` / ``ts_ms``
    feed the spec metadata columns."""

    def __init__(
        self,
        table_path,
        abs_path,
        pv,
        dv,
        phys,
        ids=None,
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
        self.ids = ids
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
    part = _TailPartition(
        table_path,
        abs_path,
        add.get("partitionValues"),
        dv,
        phys,
        **cdf_kw,
    )
    # planner metadata: the action's recorded file size feeds the
    # maxBytesPerTrigger walk. add/cdc carry it per spec; remove's
    # is OPTIONAL — writers that omit it would make delete-derived
    # units weigh 0, silently uncapping exactly the delete-heavy
    # backlog the option exists for, so fall back to stat()ing the
    # referenced data file (still on disk until vacuum; a already-
    # reclaimed file keeps 0 — the unit reads empty anyway)
    sz = add.get("size")
    if not sz:
        try:
            sz = os.path.getsize(abs_path)
        except OSError:
            sz = 0
    part.size = int(sz)
    return part


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
        sts = options.get(
            "startingtimestamp", options.get("startingTimestamp")
        )
        if sts is not None:
            if start is not None:
                raise ValueError(
                    "pass startingVersion OR startingTimestamp, "
                    "not both"
                )
            # Delta's streaming-source rule: earliest commit at or
            # after the timestamp (before-all -> earliest entry),
            # resolved through the inCommitTimestamp-aware commit
            # time; then behaves exactly like startingVersion
            start = _first_version_at_or_after(self.log_dir, sts)
        mct = options.get(
            "maxcommitspertrigger", options.get("maxCommitsPerTrigger")
        )
        mbt = options.get(
            "maxbytespertrigger", options.get("maxBytesPerTrigger")
        )
        self.max_bytes = int(mbt) if mbt is not None else None
        # rate limiting (Delta's maxFilesPerTrigger analogue, at
        # commit granularity): a restarted stream facing a 10,000-
        # commit backlog must not plan one giant batch — cap how far
        # latestOffset advances past the last COMMITTED offset. The
        # initial snapshot stays one batch (it is one log replay,
        # the same cost read_delta pays once).
        self.max_commits = int(mct) if mct is not None else None
        self.state_dir = options.get(
            "offsetstatedir", options.get("offsetStateDir")
        )
        target, meta, _unused = _py_snapshot(self.log_dir, None)
        self.phys = _phys_names(meta)
        self.ids = _field_ids(meta)
        self.pcols = list(meta.get("partitionColumns") or [])
        # schema-change gate state: the stream's resolved signature
        # and the version it was resolved at — metaData replayed at
        # or below _resolved_at is historical (tolerated; old files
        # project with nulls for later-added columns), a DIFFERING
        # metaData above it is a live change that must stop the
        # stream (Delta-source behavior: restart re-resolves)
        self._sig = _schema_sig(meta)
        self._resolved_at = target
        if start is not None:
            # tail-only from `start`: snapshot skipped, exactly
            # Delta's startingVersion contract
            self._initial = {"version": int(start) - 1, "snap": True}
        else:
            self._initial = {"version": target, "snap": False}
        self._committed = dict(self._initial)
        # cold-start rate limiting: the engine plans the first
        # post-restart batch before partitions() reveals the
        # checkpointed position — seed the cap from the sidecar the
        # last run's commit() left behind (absent/corrupt = the
        # documented uncapped first batch; a stale sidecar only
        # tightens the cap, the checkpoint still owns correctness)
        if self.state_dir:
            try:
                with open(
                    os.path.join(self.state_dir, "offset.json")
                ) as fh:
                    side = json.load(fh)
                self._committed = {
                    "version": int(side["version"]),
                    "snap": bool(side.get("snap", True)),
                }
                if side.get("index") is not None:
                    self._committed["index"] = int(side["index"])
            except (OSError, ValueError, KeyError, TypeError):
                pass

    def initialOffset(self) -> dict:
        return self._initial

    def latestOffset(self) -> dict:
        latest = _latest_log_version(self.log_dir)
        pos = self._committed["version"]
        pos_idx = self._committed.get("index")
        if self.max_commits is not None:
            cap = pos + self.max_commits
            if pos_idx is not None:
                # position is INSIDE commit `pos`: finishing it
                # counts as the first commit of the trigger budget
                cap -= 1
            # when the snapshot batch is still pending, the cap
            # budget is spent on it (version stays put)
            if not self._committed.get("snap", True):
                cap = pos
            latest = min(latest, max(cap, pos))
        if (
            self.max_bytes is not None
            and self._committed.get("snap", True)
            and (latest > pos or pos_idx is not None)
        ):
            # Delta's maxBytesPerTrigger: admit emitted units (add /
            # cdc / derived-delete files) in commit order until the
            # cumulative sizes reach the soft cap — the unit that
            # crosses it is still admitted, so there is always
            # progress, and the cut may land INSIDE a commit (the
            # offset then carries the intra-commit unit index,
            # Delta's own (reservoirVersion, index) model). Driver
            # cost: one JSON entry read per candidate commit,
            # bounded by the cap window — metadata-scale.
            budget = self.max_bytes
            v, idx = pos, pos_idx
            progressed = False
            while True:
                if idx is None:
                    if v >= latest:
                        break
                    v += 1
                    idx = 0
                sizes = [p.size for p in self._commit_parts(v)]
                while idx < len(sizes) and (
                    budget > 0 or not progressed
                ):
                    budget -= sizes[idx]
                    idx += 1
                    progressed = True
                if idx >= len(sizes):
                    idx = None  # commit fully admitted
                if budget <= 0 and progressed:
                    break
            if idx is not None:
                return {"version": v, "snap": True, "index": idx}
            return {"version": v, "snap": True}
        return {"version": latest, "snap": True}

    @staticmethod
    def _offset_key(o: dict):
        """Total order over offsets: higher version wins; at equal
        versions snap=True (snapshot consumed) is further; a
        complete commit (no index) is further than any partial
        index into the same version."""
        idx = o.get("index")
        return (
            o["version"],
            o.get("snap", True),
            float("inf") if idx is None else idx,
        )

    @classmethod
    def _further(cls, a: dict, b: dict) -> dict:
        """The more-advanced of two offsets."""
        return a if cls._offset_key(a) >= cls._offset_key(b) else b

    def commit(self, end: dict) -> None:
        # monotonic: a stale-sidecar cold start can produce an `end`
        # BELOW the checkpointed position partitions() adopted —
        # regressing to it would re-tighten the cap under the true
        # position and wedge the stream in empty batches
        self._committed = self._further(dict(end), self._committed)
        if self.state_dir:
            os.makedirs(self.state_dir, exist_ok=True)
            tmp = os.path.join(self.state_dir, "offset.json.tmp")
            with open(tmp, "w") as fh:
                json.dump(self._committed, fh)
            os.replace(
                tmp, os.path.join(self.state_dir, "offset.json")
            )

    def partitions(self, start: dict, end: dict):
        # `start` is authoritative committed progress (on restart it
        # comes from the checkpoint, which __init__ cannot see) —
        # adopt it so the NEXT latestOffset cap measures from the
        # true position. The first post-restart batch itself is
        # planned before this runs and is uncapped unless
        # offsetStateDir seeded the position.
        self._committed = dict(start)
        parts: list[_TailPartition] = []
        lo = start["version"]
        s_idx = start.get("index")
        if not start.get("snap", True):
            # clamp the snapshot to the batch's logged END: a fresh
            # checkpoint whose latestOffset was seeded by a STALE
            # sidecar can log end < the initial snapshot version —
            # snapshotting past the logged end would make the next
            # batches re-emit commits the snapshot already covered
            sv = min(start["version"], end["version"])
            lo = sv
            s_idx = None
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
                _add_partition(
                    self.path, a, self.phys, ids=self.ids, **kw
                )
                for a in adds
            )
        elif s_idx is not None:
            # finish the partially-drained commit `lo` first: its
            # units before s_idx were consumed by earlier batches
            if end["version"] < lo:
                return parts  # stale-sidecar guard: empty batch
            units = self._commit_parts(lo)
            hi = end.get("index") if end["version"] == lo else None
            stop = len(units) if hi is None else hi
            parts.extend(units[s_idx:stop])
            if end["version"] == lo:
                return parts
        for v in range(lo + 1, end["version"] + 1):
            units = self._commit_parts(v)
            if v == end["version"] and end.get("index") is not None:
                units = units[: end["index"]]
            parts.extend(units)
        return parts

    def _commit_parts(self, v: int) -> list[_TailPartition]:
        """One commit's emitted units, in the DETERMINISTIC order of
        its log entry — the sequence both the byte-cap planner and
        partitions() slice, so an intra-commit offset index always
        resolves to the same files across restarts."""
        return (
            self._commit_changes(v) if self.cdf else self._commit_adds(v)
        )

    def _gate_meta(self, meta: dict, v: int) -> None:
        """A replayed metaData action: always re-gate the mapping
        mode; a field-set/type change ABOVE the version the stream
        resolved its schema at stops the stream by name (restart
        re-resolves the new schema — silently projecting would drop
        the added/renamed column for every row after v)."""
        _logical_schema(meta)  # mapping-mode gate
        if v > self._resolved_at and _schema_sig(meta) != self._sig:
            raise DeltaProtocolError(
                f"schema changed at version {v}; the tail stream "
                "reads with the schema resolved at start — restart "
                "the stream to pick up the new schema"
            )

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
            if ci is not None:
                # spec: the inCommitTimestamps feature's monotonic
                # timestamp is THE commit time — prefer it over the
                # best-effort wall-clock timestamp
                if ci.get("inCommitTimestamp") is not None:
                    ts_ms = int(ci["inCommitTimestamp"])
                elif ci.get("timestamp") is not None:
                    ts_ms = int(ci["timestamp"])
            elif a.get("protocol") is not None:
                _py_check_protocol(a["protocol"])
            elif a.get("metaData") is not None:
                self._gate_meta(a["metaData"], v)
        if ts_ms is None:
            ts_ms = self._version_ts_ms(v)
        kw = dict(cdf=True, commit_version=v, ts_ms=ts_ms)
        cdcs = [a["cdc"] for a in acts if a.get("cdc")]
        if cdcs:
            return [
                _add_partition(
                    self.path, c, self.phys, ids=self.ids,
                    ctype=None, **kw
                )
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
                        self.path, add, self.phys,
                        ids=self.ids, ctype="insert", **kw
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
                        self.path, rem, self.phys,
                        ids=self.ids, ctype="delete", **kw
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
                self._gate_meta(a["metaData"], v)
        if not data_removes:
            return [
                _add_partition(self.path, a, self.phys, ids=self.ids)
                for a in adds
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
                _add_partition(self.path, a, self.phys, ids=self.ids)
                for a in adds
            ]
        raise DeltaProtocolError(
            f"commit {v} rewrites data (adds + removes); set "
            ".option('ignoreChanges','true') to re-emit rewritten "
            "files (downstream must tolerate duplicates)"
        )

    def read(self, partition: _TailPartition) -> Iterator:
        """Arrow data plane (no per-row Python): the file's record
        batches with the DV mask applied via ``take``, columns
        resolved physical->logical (field-id resolution in id mode,
        physical-name fallback for pre-annotation files), partition
        values and the CDF metadata columns injected as constant
        Arrow arrays, the whole batch cast to the stream schema."""
        if partition is None:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        from .dvcodec import load_dv_indexes

        doomed = None
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
        arrow_schema = to_arrow_schema(self.schema_)
        pf = pq.ParquetFile(partition.abs_path)
        # id mode: parquet field_id -> column name, once per file
        by_id = {}
        if partition.ids is not None:
            for f in pf.schema_arrow:
                fid = (f.metadata or {}).get(b"PARQUET:field_id")
                if fid is not None:
                    by_id[int(fid)] = f.name
        offset = 0
        for batch in pf.iter_batches():
            tbl = pa.Table.from_batches([batch])
            n_in = tbl.num_rows
            if doomed:
                keep = [
                    i
                    for i in range(n_in)
                    if (offset + i) not in doomed
                ]
                if len(keep) < n_in:
                    tbl = tbl.take(pa.array(keep, type=pa.int64()))
            offset += n_in
            yield from self._project_batch(
                tbl, partition, arrow_schema, by_id
            ).to_batches()

    def _project_batch(self, tbl, partition, arrow_schema, by_id):
        """One Arrow table -> the stream schema: resolve each
        logical field to a file column / partition-value constant /
        CDF constant / nulls (schema evolution)."""
        import pyarrow as pa

        n = tbl.num_rows
        cols = []
        for field in arrow_schema:
            name = field.name
            if name == "_commit_version":
                cols.append(
                    pa.array(
                        [partition.commit_version] * n,
                        type=pa.int64(),
                    ).cast(field.type)
                )
                continue
            if name == "_commit_timestamp":
                cols.append(
                    pa.array(
                        [partition.ts_ms] * n,
                        type=pa.timestamp("ms", tz="UTC"),
                    ).cast(field.type)
                )
                continue
            if name == "_change_type" and partition.ctype is not None:
                cols.append(
                    pa.array([partition.ctype] * n, type=pa.string())
                )
                continue
            # data column: id mode resolves by field id first (the
            # spec's authority there), physical name covers cdc/
            # pre-annotation files, logical name covers unmapped
            # tables and the _change_type column of _change_data
            phys = partition.phys.get(name, name)
            src = None
            if partition.ids is not None:
                src = by_id.get(partition.ids.get(name))
            if src is None or src not in tbl.column_names:
                src = (
                    phys
                    if phys in tbl.column_names
                    else (name if name in tbl.column_names else None)
                )
            if phys in partition.pv:
                v = _pv_convert_field(field, partition.pv[phys])
                cols.append(pa.array([v] * n).cast(field.type))
            elif src is not None:
                cols.append(tbl.column(src))
            else:  # pre-evolution file: later-added column as nulls
                cols.append(pa.nulls(n, type=field.type))
        return pa.table(
            cols, names=[f.name for f in arrow_schema]
        ).cast(arrow_schema)


def _pv_convert_field(arrow_field, raw):
    """Delta partitionValues serialization -> Python value for an
    ARROW field's type (spec: decimal strings for numbers, ISO
    dates, 'true'/'false'; null partition values are map nulls)."""
    import pyarrow.types as pt

    if raw is None:
        return None
    t = arrow_field.type
    if pt.is_integer(t):
        return int(raw)
    if pt.is_floating(t):
        return float(raw)
    if pt.is_boolean(t):
        return str(raw).lower() == "true"
    if pt.is_date(t):
        import datetime

        return datetime.date.fromisoformat(raw)
    if pt.is_timestamp(t):
        import datetime

        return datetime.datetime.fromisoformat(raw)
    return raw


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

"""SQL DML front-end for MergeStore — the reference's actual API.

The reference never calls a merge function: it renders Delta SQL
strings and runs ``spark.sql(...)`` (listings/mls_listings_curated.py
:340-353 M1, mls_listings_hist_curated.py:195-203 M2 with a DELETE
clause, mls_listings_curated_propid_backfill.py:206-212 M3 with a
changed-columns guard). A migrating job should keep those strings.
:func:`run_dml` accepts the same statements and routes them onto the
MergeStore engine:

    run_dml(spark, '''
        merge into destination using source
        on destination.mls = source.mls
           and destination.mls_listing_id = source.mls_listing_id
        when matched then update set *
        when not matched then insert *
    ''', tables={"destination": store})

Supported dialect (exactly the surface the reference exercises, plus
the obvious companions — anything outside it raises a NAMED error,
never a silent misparse):

- ``MERGE INTO <t> USING <view | (subquery)> ON <equi-conjunction>``
  with any mix of ``WHEN MATCHED [AND c] THEN UPDATE SET *``,
  ``WHEN MATCHED [AND c] THEN DELETE``,
  ``WHEN NOT MATCHED [AND c] THEN INSERT *``, and — on foreign
  Delta paths — ``WHEN NOT MATCHED BY SOURCE [AND c] THEN DELETE``
  (the sync-to-source idiom). Clause conditions may
  qualify columns with the destination/source names or aliases
  (rewritten onto the merge join's row structs). Clause ORDER is
  honored: a delete-before-update statement suppresses updates on
  rows the delete clause claims, exactly like Delta.
- ``DELETE FROM <t> [WHERE c]``
- ``UPDATE <t> SET a = e[, ...] [WHERE c]``
- ``INSERT INTO <t> <select ...>`` / ``INSERT INTO <t> TABLE <view>``
- ``VACUUM <t> [RETAIN <n> VERSIONS] [DRY RUN]``
- ``RESTORE TABLE <t> TO VERSION AS OF <n>`` /
  ``TO TIMESTAMP AS OF '<ts>'``
- ``OPTIMIZE <t> [ZORDER BY (cols)]`` /
  ``REORG TABLE <t> APPLY (PURGE)``
- ``CREATE TABLE <t2> CLONE <t>``
- ``ALTER TABLE <t> ADD COLUMNS (name type, ...)`` /
  ``DROP COLUMN <c>`` / ``RENAME COLUMN <a> TO <b>`` /
  ``ADD CONSTRAINT <n> CHECK (expr)`` / ``DROP CONSTRAINT <n>`` /
  ``CLUSTER BY (cols)`` / ``CLUSTER BY NONE``
- ``DESCRIBE HISTORY <t>`` / ``DESCRIBE DETAIL <t>``

``UPDATE SET *`` / ``INSERT *`` are the only merge assignment forms
(the only forms the reference uses); column-list assignments inside
MERGE raise with a pointer to ``MergeStore.update`` — partial
assignment is a different operation, not a parse nicety.

Handles in ``tables`` are :class:`MergeStore` objects OR path
strings naming a foreign (stock-owned) Delta table — the analogue
of delta-spark's ``delta.`/path``` spelling. With a path handle,
MERGE / DELETE / UPDATE / INSERT / RESTORE / VACUUM / OPTIMIZE /
REORG / DESCRIBE HISTORY / DESCRIBE DETAIL / CREATE TABLE ...
CLONE (both handles paths) route onto the foreign-DML engine
(``merge_into_delta`` / ``delete_from_delta`` /
``update_from_delta`` / ``append_to_delta`` / ``restore_delta`` /
``vacuum_delta`` / ``optimize_delta`` / ``describe_delta_*`` /
``clone_delta``; VACUUM retains by HOURS, delta's own form; ZORDER
refuses by name): the reference's verbatim SQL runs against a
table a stock deployment owns, through the same claim/OCC
protocol. ALTER stays MergeStore-only and refuses a path by name.

Scale note: this layer only PARSES; every statement lands on the
same engine paths as the Python API (one-shuffle merge_upsert, DV
delete/update, OCC commits), so the SQL surface adds zero plan cost.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.sources.store import MergeStore


class DMLParseError(ValueError):
    """The statement is outside the supported dialect — says what
    was expected, never guesses."""


def _norm(sql: str) -> str:
    return re.sub(r"\s+", " ", sql.strip().rstrip(";").strip())


def _get_table(tables: dict, name: str):
    """The handle for a statement table name: a :class:`MergeStore`,
    or a PATH STRING naming a foreign (stock-owned) Delta table —
    the analogue of delta-spark's ``delta.`/path```. MERGE / DELETE
    / UPDATE / INSERT / RESTORE / VACUUM / OPTIMIZE / REORG /
    DESCRIBE / CLONE (both handles paths) route onto the
    foreign-DML engine (``merge_into_delta`` & co.; ZORDER
    refuses); ALTER stays MergeStore-only and refuses a path by
    name."""
    if name not in tables:
        raise DMLParseError(
            f"unknown table {name!r}; known: {sorted(tables)}"
        )
    return tables[name]


def _get_store(tables: dict, name: str, verb: str) -> MergeStore:
    handle = _get_table(tables, name)
    if isinstance(handle, str):
        raise DMLParseError(
            f"{verb} targets a foreign Delta path ({handle!r}); "
            "only MERGE / DELETE / UPDATE / INSERT reach foreign "
            "tables — lifecycle statements need the owning engine"
        )
    return handle


def _resolve_source(spark: SparkSession, src: str) -> DataFrame:
    src = src.strip()
    if src.startswith("("):
        return spark.sql(src[1:-1])
    return spark.table(src)


def _mask_literals(s: str):
    """Replace single-quoted SQL literals with placeholders so the
    regex passes (alias rewriting, qualifier validation, keyword
    splitting) cannot corrupt or trip over literal TEXT — a value
    like ``'see destination.notes'`` must survive rewriting
    byte-identical, and ``'closed.by.agent'`` must not read as an
    unknown qualifier. Doubling (``''``) is the SQL escape and stays
    inside one literal."""
    out, lits, i, n = [], [], 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            lits.append(s[i : j + 1])
            out.append(f"\x00{len(lits) - 1}\x00")
            i = j + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out), lits


def _unmask_literals(s: str, lits: list) -> str:
    for idx, lit in enumerate(lits):
        s = s.replace(f"\x00{idx}\x00", lit)
    return s


def _rewrite_refs(
    cond: str,
    dst_names: list,
    src_names: list,
    t_tag: str = "_t.",
    s_tag: str = "_s.",
) -> str:
    """Qualify-rewrite a merge clause condition onto the engine's
    row scopes: ``destination.x`` -> ``_t.x``, ``source.y`` ->
    ``_s.y`` (MergeStore's join structs) or ``target.x`` /
    ``source.y`` (the foreign-DML engine's aliases). Literals are
    masked first (rewriting must never reach inside a string).
    Unqualified column references are rejected — inside a MERGE
    both rows are in scope, so a bare name is ambiguous (same rule
    Delta applies)."""
    out, lits = _mask_literals(cond)
    # two-phase via sentinels: a produced tag must never be caught
    # by a LATER alias pass (a source aliased literally "target"
    # would otherwise re-rewrite already-rewritten destination refs)
    for alias in dst_names:
        out = re.sub(
            rf"\b{re.escape(alias)}\s*\.", "\x01.", out, flags=re.I
        )
    for alias in src_names:
        out = re.sub(
            rf"\b{re.escape(alias)}\s*\.", "\x02.", out, flags=re.I
        )
    out = out.replace("\x01.", t_tag).replace("\x02.", s_tag)
    return _unmask_literals(out, lits)


_MERGE_RE = re.compile(
    r"^merge into (?P<dst>\w+)(?: as (?P<dsta>\w+))?"
    r" using (?P<src>\(.*\)|\w+)(?: as (?P<srca>\w+))?"
    r" on (?P<on>.*?)(?P<clauses> when .*)$",
    re.I,
)
_CLAUSE_RE = re.compile(
    r" when (?P<not>not )?matched(?P<bys> by source)?"
    r"(?: and (?P<cond>.*?))? then "
    r"(?P<action>update set \*|delete|insert \*"
    r"|update set .+?|insert \(.*?\) values \(.*?\))"
    r"(?= when |$)",
    re.I,
)


def _parse_on_keys(on: str, dst_names: list, src_names: list) -> list:
    """The ON clause must be a conjunction of cross-side equalities
    on the SAME column name — that is what makes it a keyed merge
    the store can execute (and what the reference renders)."""
    keys = []
    for part in re.split(r"\band\b", on, flags=re.I):
        m = re.match(
            r"^\s*(\w+)\s*\.\s*(\w+)\s*=\s*(\w+)\s*\.\s*(\w+)\s*$",
            part,
        )
        if not m:
            raise DMLParseError(
                f"ON clause term {part.strip()!r} is not "
                "`side.col = side.col`; only equi-join merges are "
                "keyed merges"
            )
        a_side, a_col, b_side, b_col = m.groups()
        sides = {a_side.lower(), b_side.lower()}
        dst_l = {n.lower() for n in dst_names}
        src_l = {n.lower() for n in src_names}
        if not (sides & dst_l and sides & src_l):
            raise DMLParseError(
                f"ON term {part.strip()!r} must compare destination "
                "to source"
            )
        if a_col.lower() != b_col.lower():
            # SQL identifiers are case-insensitive, like the rest of
            # this parser's keyword handling
            raise DMLParseError(
                f"ON term {part.strip()!r} joins different column "
                "names; the store's keyed merge requires same-name "
                "keys"
            )
        keys.append(a_col)
    return keys


def _merge(spark: SparkSession, sql: str, tables: dict, lits: list):
    """``sql`` arrives literal-MASKED (see :func:`_mask_literals`):
    every keyword split and regex here runs on placeholder text, so
    a string value containing ``when matched`` or an alias name can
    never derail the parse; captured fragments are unmasked before
    they reach Spark."""
    m = _MERGE_RE.match(sql)
    if not m:
        raise DMLParseError(
            "unsupported MERGE shape; expected: MERGE INTO <t> USING "
            "<view|(subquery)> ON <cond> WHEN [NOT] MATCHED ..."
        )
    store = _get_table(tables, m.group("dst"))
    is_foreign = isinstance(store, str)
    t_tag, s_tag = (
        ("target.", "source.") if is_foreign else ("_t.", "_s.")
    )
    ok_quals = (
        ("target", "source") if is_foreign else ("_t", "_s")
    )
    dst_names = [m.group("dst")] + (
        [m.group("dsta")] if m.group("dsta") else []
    )
    src_txt = m.group("src")
    src_names = ([src_txt] if not src_txt.startswith("(") else []) + (
        [m.group("srca")] if m.group("srca") else []
    )
    if not src_names:
        raise DMLParseError(
            "a subquery source needs an alias: USING (...) AS s"
        )
    source = _resolve_source(spark, _unmask_literals(src_txt, lits))

    if is_foreign:
        # the foreign engine takes the ON condition verbatim (its
        # planner extracts the equi-keys); qualifiers rewrite onto
        # its target/source aliases and validate the same way
        pass
    else:
        keys = _parse_on_keys(m.group("on"), dst_names, src_names)
        if store.keys and sorted(k.lower() for k in keys) != sorted(
            k.lower() for k in store.keys
        ):
            raise DMLParseError(
                f"ON keys {sorted(keys)} != store keys "
                f"{sorted(store.keys)} — a merge on other columns is "
                "not this table's keyed upsert"
            )

    def rewrite_validate(txt: str) -> str:
        rewritten = _rewrite_refs(
            txt, dst_names, src_names, t_tag, s_tag
        )
        # validate qualifiers on the MASKED text: dots inside string
        # literals ('closed.by.agent') are values, not references
        masked, _lits = _mask_literals(rewritten)
        leftover = re.findall(r"\b(\w+)\s*\.", masked)
        bad = {
            w
            for w in leftover
            if w not in ok_quals and not w.isdigit()
        }
        if bad:
            raise DMLParseError(
                f"condition references unknown qualifiers {sorted(bad)}"
            )
        return rewritten

    # Delta stops at the FIRST clause (per side) whose condition
    # holds, in statement order. Each clause's EFFECTIVE condition
    # is therefore its own condition AND NOT any earlier same-side
    # clause's — encoded here as rewritten condition text, so two
    # `UPDATE SET *` clauses OR together (earlier-clause precedence
    # intact across an interleaved DELETE) instead of silently
    # last-winning. The matched (UPDATE/DELETE) and not-matched
    # (INSERT) sides carry separate precedence chains.
    update_parts: list[str] = []
    delete_parts: list[str] = []
    insert_parts: list[str] = []
    bs_delete_parts: list[str] = []
    matched_prior: list[str] = []
    notmatched_prior: list[str] = []
    bys_prior: list[str] = []
    for c in _CLAUSE_RE.finditer(sql):
        action = c.group("action").lower().strip()
        is_not = bool(c.group("not"))
        is_bys = bool(c.group("bys"))
        cond_txt = c.group("cond")
        if cond_txt is not None:
            cond_txt = _unmask_literals(cond_txt, lits)
        if is_bys and not is_not:
            raise DMLParseError(
                "WHEN MATCHED BY SOURCE is not a merge clause "
                "(matched rows ARE matched by source)"
            )
        if is_bys and not is_foreign:
            raise DMLParseError(
                "WHEN NOT MATCHED BY SOURCE clauses run on foreign "
                "Delta paths only (MergeStore's keyed upsert has no "
                "by-source side)"
            )
        if is_bys and action != "delete":
            raise DMLParseError(
                "only WHEN NOT MATCHED BY SOURCE THEN DELETE is "
                "supported in SQL (a by-source UPDATE has no SET * "
                "form — no source row to take values from; use "
                "merge_into_delta's explicit mapping)"
            )
        if action == "update set *":
            if is_not:
                raise DMLParseError(
                    "WHEN NOT MATCHED THEN UPDATE is not a merge "
                    "clause (Delta has no such form)"
                )
            prior, parts = matched_prior, update_parts
        elif action == "delete":
            if is_bys:
                prior, parts = bys_prior, bs_delete_parts
            elif is_not:
                raise DMLParseError(
                    "WHEN NOT MATCHED THEN DELETE is not a merge "
                    "clause (nothing to delete; did you mean WHEN "
                    "NOT MATCHED BY SOURCE THEN DELETE?)"
                )
            else:
                prior, parts = matched_prior, delete_parts
        elif action == "insert *":
            if not is_not:
                raise DMLParseError(
                    "WHEN MATCHED THEN INSERT is not a merge clause"
                )
            prior, parts = notmatched_prior, insert_parts
        else:
            raise DMLParseError(
                f"merge assignment form {action!r} is unsupported: "
                "only UPDATE SET * / DELETE / INSERT * (the "
                "reference's forms); partial assignment is "
                "MergeStore.update()"
            )
        if "true" in prior:
            # Delta rejects this shape outright (only the LAST
            # clause of a side may omit its condition); a clause
            # shadowed by an earlier unconditional one can never
            # fire, and silently dropping it would be a misparse
            raise DMLParseError(
                "unreachable merge clause: an earlier unconditional "
                f"WHEN {'NOT ' if is_not else ''}MATCHED clause "
                "precedes it (only the last clause of a side may "
                "omit its condition)"
            )
        raw = (
            rewrite_validate(cond_txt) if cond_txt is not None else None
        )
        guard = " and ".join(f"(not ({p}))" for p in prior)
        if raw is None:
            parts.append(f"({guard})" if guard else "true")
        elif guard:
            parts.append(f"(({raw}) and {guard})")
        else:
            parts.append(f"({raw})")
        prior.append(raw if raw is not None else "true")
    if not (
        update_parts or delete_parts or insert_parts or bs_delete_parts
    ):
        raise DMLParseError("MERGE has no WHEN clauses")

    if is_foreign:
        from .deltalog import merge_into_delta

        def text_or_none(parts: list[str]):
            # ["true"] = unconditional clause -> engine default;
            # effective conditions are mutually exclusive by
            # construction, so OR order is immaterial
            if not parts or parts == ["true"]:
                return None
            return " or ".join(parts)

        kwargs: dict = {}
        if update_parts:
            # UPDATE SET * — the ENGINE expands over the table's
            # columns (Delta's star rule: extra source columns are
            # unused, a missing one refuses by name)
            kwargs["when_matched_update"] = True
            uc = text_or_none(update_parts)
            if uc is not None:
                kwargs["update_condition"] = uc
        if delete_parts:
            kwargs["when_matched_delete"] = True
            dc = text_or_none(delete_parts)
            if dc is not None:
                kwargs["delete_condition"] = dc
        if insert_parts:
            kwargs["when_not_matched_insert"] = True
            ic = text_or_none(insert_parts)
            if ic is not None:
                kwargs["insert_condition"] = ic
        if bs_delete_parts:
            kwargs["when_not_matched_by_source_delete"] = True
            bc = text_or_none(bs_delete_parts)
            if bc is not None:
                kwargs["by_source_delete_condition"] = bc
        return merge_into_delta(
            spark,
            store,
            source,
            rewrite_validate(_unmask_literals(m.group("on"), lits)),
            **kwargs,
        )

    def combined(parts: list[str]):
        """Effective conditions are mutually exclusive by
        construction, so OR order is immaterial; an absent side
        gets a never-true condition (a statement may omit the
        update or insert clause — delete-only merges exist — and
        the engine's default is otherwise unconditional)."""
        if not parts:
            return lambda t, s: F.lit(False)
        if parts == ["true"]:
            return None  # unconditional: engine default, clean plan
        txt = " or ".join(parts)
        return lambda t, s, _e=txt: F.expr(_e)

    return store.merge(
        source,
        update_condition=combined(update_parts),
        delete_condition=(
            # None means "no delete clause" to merge(); a present
            # unconditional DELETE must pass an always-true cond
            (lambda t, s: F.lit(True))
            if delete_parts == ["true"]
            else combined(delete_parts)
            if delete_parts
            else None
        ),
        insert_condition=combined(insert_parts),
    )


def run_dml(spark: SparkSession, sql: str, tables: dict):
    """Execute one DML/utility statement against MergeStore tables.

    ``tables`` maps statement table names to :class:`MergeStore`
    handles, or to PATH STRINGS naming foreign (stock-owned) Delta
    tables. Returns what the operation returns — MergeStore: the
    committed version string for MERGE/DELETE/UPDATE/INSERT (or
    ``None`` no-ops), the doomed version list for VACUUM, a
    DataFrame for DESCRIBE HISTORY; foreign path: the engine's own
    shape — ``(version, counts_dict)`` for MERGE, ``(version,
    n_rows)`` for DELETE/UPDATE, the version int for INSERT.
    """
    # parse on literal-MASKED text throughout: a WHERE/WHEN keyword
    # or alias-dot inside a string value must never steer the parse
    masked_sql, lits = _mask_literals(sql)
    stmt = _norm(masked_sql)
    low = stmt.lower()

    def unmask(s):
        return None if s is None else _unmask_literals(s, lits)

    if low.startswith("merge into "):
        return _merge(spark, stmt, tables, lits)

    m = re.match(r"^delete from (\w+)(?: where (.*))?$", stmt, re.I)
    if m:
        store = _get_table(tables, m.group(1))
        cond = unmask(m.group(2))
        if isinstance(store, str):
            from .deltalog import delete_from_delta

            return delete_from_delta(
                spark, store, cond if cond else "true"
            )
        return store.delete(cond if cond else F.lit(True))

    m = re.match(r"^update (\w+) set (.*?)(?: where (.*))?$", stmt, re.I)
    if m:
        store = _get_table(tables, m.group(1))
        assigns = {}
        for part in _split_top_level(m.group(2)):
            am = re.match(r"^\s*(\w+)\s*=\s*(.+)$", part)
            if not am:
                raise DMLParseError(f"bad SET item {unmask(part)!r}")
            assigns[am.group(1)] = unmask(am.group(2))
        cond = unmask(m.group(3)) if m.group(3) else "true"
        if isinstance(store, str):
            from .deltalog import update_from_delta

            return update_from_delta(spark, store, cond, assigns)
        return store.update(cond, assigns)

    m = re.match(r"^insert into (\w+) table (\w+)$", stmt, re.I)
    if m:
        store = _get_table(tables, m.group(1))
        frame = spark.table(m.group(2))
        if isinstance(store, str):
            from .deltalog import append_to_delta

            return append_to_delta(frame, store)
        return store.append(frame)

    m = re.match(r"^insert into (\w+) (select .*)$", stmt, re.I)
    if m:
        store = _get_table(tables, m.group(1))
        frame = spark.sql(unmask(m.group(2)))
        if isinstance(store, str):
            from .deltalog import append_to_delta

            return append_to_delta(frame, store)
        return store.append(frame)

    m = re.match(
        r"^vacuum (\w+)(?: retain (\d+) (versions|hours))?"
        r"( dry run)?$",
        stmt,
        re.I,
    )
    if m:
        store = _get_table(tables, m.group(1))
        unit = (m.group(3) or "").lower()
        if isinstance(store, str):
            # Delta's own VACUUM form: RETAIN N HOURS
            if unit == "versions":
                raise DMLParseError(
                    "foreign Delta VACUUM retains by HOURS "
                    "(delta's form), not versions"
                )
            from .deltalog import vacuum_delta

            return vacuum_delta(
                spark,
                store,
                retention_hours=(
                    float(m.group(2)) if m.group(2) else None
                ),
                dry_run=bool(m.group(4)),
            )
        if unit == "hours":
            raise DMLParseError(
                "MergeStore VACUUM retains by VERSIONS; RETAIN N "
                "HOURS is the foreign-Delta form"
            )
        keep = int(m.group(2)) if m.group(2) else 2
        return store.vacuum(keep=keep, dry_run=bool(m.group(4)))

    m = re.match(
        r"^restore table (\w+) to version as of (\d+)$", stmt, re.I
    )
    if m:
        store = _get_table(tables, m.group(1))
        if isinstance(store, str):
            from .deltalog import restore_delta

            return restore_delta(
                spark, store, version=int(m.group(2))
            )
        return store.restore(f"v{int(m.group(2)):05d}")

    m = re.match(r"^describe history (\w+)$", stmt, re.I)
    if m:
        handle = _get_table(tables, m.group(1))
        if isinstance(handle, str):
            from .deltalog import describe_delta_history

            return describe_delta_history(spark, handle)
        return handle.history()

    m = re.match(r"^describe detail (\w+)$", stmt, re.I)
    if m:
        handle = _get_table(tables, m.group(1))
        if isinstance(handle, str):
            from .deltalog import describe_delta_detail

            return describe_delta_detail(spark, handle)
        return handle.detail()

    m = re.match(
        r"^optimize (\w+)(?: zorder by \(?([\w, ]+)\)?)?$", stmt, re.I
    )
    if m:
        store = _get_table(tables, m.group(1))
        zcols = (
            [c.strip() for c in m.group(2).split(",")]
            if m.group(2)
            else None
        )
        if isinstance(store, str):
            if zcols:
                raise DMLParseError(
                    "ZORDER clustering is not implemented for "
                    "foreign Delta paths — plain OPTIMIZE compacts"
                )
            from .deltalog import optimize_delta

            return optimize_delta(spark, store)
        return store.optimize(zorder_by=zcols)

    m = re.match(
        r"^restore table (\w+) to timestamp as of (.+)$", stmt, re.I
    )
    if m:
        store = _get_table(tables, m.group(1))
        ts = unmask(m.group(2)).strip().strip("'\"")
        if isinstance(store, str):
            from .deltalog import restore_delta

            return restore_delta(spark, store, timestamp=ts)
        return store.restore(store.version_as_of(ts))

    m = re.match(r"^reorg table (\w+) apply \(\s*purge\s*\)$", stmt, re.I)
    if m:
        store = _get_table(tables, m.group(1))
        if isinstance(store, str):
            from .deltalog import optimize_delta

            # purge-only: rewrite DV-masked files, no size-based
            # compaction (min size 0 selects nothing by size)
            return optimize_delta(
                spark, store, min_file_size_bytes=0, purge=True
            )
        return store.optimize(purge=True)

    m = re.match(
        r"^alter table (\w+) add constraint (\w+) check \((.+)\)$",
        stmt,
        re.I,
    )
    if m:
        store = _get_store(tables, m.group(1), "ALTER TABLE")
        store.add_constraint(m.group(2), unmask(m.group(3)))
        return None

    m = re.match(
        r"^alter table (\w+) drop constraint (\w+)$", stmt, re.I
    )
    if m:
        _get_store(tables, m.group(1), "ALTER TABLE").drop_constraint(m.group(2))
        return None

    m = re.match(
        r"^alter table (\w+) cluster by (?:none|\(([\w, ]+)\))$",
        stmt,
        re.I,
    )
    if m:
        store = _get_store(tables, m.group(1), "ALTER TABLE")
        cols = (
            [c.strip() for c in m.group(2).split(",")]
            if m.group(2)
            else []
        )
        store.set_clustering(cols)
        return None

    m = re.match(r"^alter table (\w+) drop column (\w+)$", stmt, re.I)
    if m:
        return _get_store(tables, m.group(1), "ALTER TABLE").drop_column(m.group(2))

    m = re.match(
        r"^alter table (\w+) rename column (\w+) to (\w+)$", stmt, re.I
    )
    if m:
        return _get_store(tables, m.group(1), "ALTER TABLE").rename_column(
            m.group(2), m.group(3)
        )

    m = re.match(
        r"^alter table (\w+) add columns? \((.+)\)$", stmt, re.I
    )
    if m:
        store = _get_store(tables, m.group(1), "ALTER TABLE")
        cols: dict[str, str] = {}
        for part in _split_top_level(m.group(2)):
            cm = re.match(r"^\s*(\w+)\s+([\w()<>, ]+?)\s*$", part)
            if not cm:
                raise DMLParseError(
                    f"cannot parse column definition {part!r} "
                    "(expected: name TYPE)"
                )
            cols[cm.group(1)] = cm.group(2)
        return store.add_columns(cols)

    m = re.match(r"^create table (\w+) clone (\w+)$", stmt, re.I)
    if m:
        target = _get_table(tables, m.group(1))
        source = _get_table(tables, m.group(2))
        if isinstance(source, str) != isinstance(target, str):
            raise DMLParseError(
                "CLONE source and target handles must be the same "
                "kind (both MergeStore, or both foreign Delta "
                "paths)"
            )
        if isinstance(source, str):
            from .deltalog import clone_delta

            return clone_delta(spark, source, target)
        # the target handle names the clone's path (the analogue of
        # the new table's location in Delta's CREATE ... CLONE)
        source.clone(target.path)
        return target.current_version()

    raise DMLParseError(
        f"unsupported statement {unmask(stmt)[:80]!r}; supported: MERGE INTO, "
        "DELETE FROM, UPDATE, INSERT INTO, VACUUM, "
        "RESTORE TABLE ... TO VERSION|TIMESTAMP AS OF, "
        "OPTIMIZE [ZORDER BY], REORG TABLE ... APPLY (PURGE), "
        "CREATE TABLE ... CLONE, ALTER TABLE ... ADD COLUMNS | "
        "DROP COLUMN | RENAME COLUMN ... TO | ADD/DROP CONSTRAINT | CLUSTER BY, "
        "DESCRIBE HISTORY, DESCRIBE DETAIL"
    )


def _split_top_level(s: str) -> list:
    """Split on commas outside parentheses/quotes (SET lists whose
    expressions contain function calls)."""
    parts, depth, start, quote = [], 0, 0, None
    for i, ch in enumerate(s):
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p for p in parts if p.strip()]

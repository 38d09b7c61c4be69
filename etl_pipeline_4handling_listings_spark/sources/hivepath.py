"""Hive partition-path encoding — the ONE place partition values
become directory names.

Spark writes a partitioned snapshot with Hive-style ``pcol=value``
directories, where ``value`` is the column value cast to string
(JVM casts: booleans lowercase, dates/timestamps ISO) and then
path-escaped (``ExternalCatalogUtils.escapePathName``: control
chars and ``" # % ' * / : = ? \\ ^ [ ] {`` become ``%XX``).
MergeStore's commit metadata (touched-partition sets for
fast-forward disjointness), its copy-on-write hardlink exclusion,
and the data source's CDC partition prefixes all need to name the
SAME partitions as the directories Spark actually wrote — a raw
``str(value)`` differs from the dir name for booleans (``True`` vs
``true``) and for any escapable character, which silently corrupts
all three (resurrected deletes, false-disjoint fast-forwards,
empty change feeds). Every one of those call sites routes through
:func:`hive_part_str` so the two representations cannot diverge;
the encoding itself is pinned against Spark's real writer by
``tests/test_store.py::test_hive_part_str_matches_spark_writer``.

Session-free (stdlib only): imported by the Python Data Source
readers, which run without a SparkSession.

Reference semantics: Hive ``FileUtils.escapePathName`` / Spark
``ExternalCatalogUtils`` (public source); behavior verified
empirically against the installed pyspark 4.1.2.
"""

from __future__ import annotations

import datetime

DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"

# chars < 0x20, DEL, and Hive's printable escape list — exactly the
# set the probe against Spark's writer produced (note '}' and most
# shell metachars are NOT escaped)
_ESCAPED = (
    {chr(i) for i in range(1, 0x20)}
    | set('"#%\'*/:=?\\^[]{')
    | {chr(0x7F)}
)


def _value_str(value) -> str:
    """The JVM cast-to-string of a partition value (what Spark
    embeds in the dir name BEFORE escaping)."""
    if isinstance(value, bool):  # before int: bool is an int subclass
        return "true" if value else "false"
    if isinstance(value, datetime.datetime):
        s = value.strftime("%Y-%m-%d %H:%M:%S")
        if value.microsecond:
            s += f".{value.microsecond:06d}".rstrip("0")
        return s
    if isinstance(value, datetime.date):
        return value.isoformat()
    # str/int exact; float matches Java Double.toString for the
    # plain-decimal envelope (sci-notation thresholds differ — don't
    # partition by extreme-magnitude floats)
    return str(value)


def hive_part_str(value) -> str:
    """Escaped directory-name form of a partition VALUE — the text
    after ``pcol=`` in the dir Spark writes. None and empty string
    both map to ``__HIVE_DEFAULT_PARTITION__`` (Hive's rule)."""
    if value is None:
        return DEFAULT_PARTITION
    s = _value_str(value)
    if s == "":
        return DEFAULT_PARTITION
    return "".join(
        f"%{ord(c):02X}" if c in _ESCAPED else c for c in s
    )


def unescape_path_name(s: str) -> str:
    """Inverse of the escaping (``%XX`` → char). Tolerant: a ``%``
    not followed by two hex digits is kept literally, matching
    Hive's unescapePathName."""
    if "%" not in s:
        return s
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 3 <= n:
            try:
                out.append(chr(int(s[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(c)
        i += 1
    return "".join(out)

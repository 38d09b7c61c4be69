"""Schema loading + enforcement.

The reference declares target schemas as JSON files parsed into a
``StructType`` and enforces them by ordered projection (reference
listings/mls_listings_curated.py:95-103,
mls_listings_transform.py:412). We reimplement that contract on
public Spark API: the JSON layout is exactly
``StructType.jsonValue()`` — per-field
``{"name", "type", "nullable", "metadata"}`` with type strings like
``"decimal(16,4)"``.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def load_schema(path: str | Path) -> StructType:
    """Parse a JSON schema file into a ``StructType``.

    Accepts either a bare list of field dicts or a full
    ``{"type": "struct", "fields": [...]}`` document.
    """
    doc = json.loads(Path(path).read_text())
    if isinstance(doc, list):
        doc = {"type": "struct", "fields": doc}
    return StructType.fromJson(doc)


def save_schema(schema: StructType, path: str | Path) -> None:
    Path(path).write_text(json.dumps(schema.jsonValue(), indent=2))


def enforce_schema(df: DataFrame, schema: StructType, cast: bool = True) -> DataFrame:
    """Project ``df`` to exactly the target schema's columns, in order.

    With ``cast=True`` (default) each column is also cast to the
    declared type — stricter than the reference's projection-only
    enforcement (its full cast was commented out,
    mls_listings_transform.py:414-415). Missing columns become typed
    nulls so a target schema can grow ahead of its feed.
    """
    have = set(df.columns)
    cols = []
    for field in schema.fields:
        if field.name in have:
            c = F.col(field.name)
            cols.append(c.cast(field.dataType).alias(field.name) if cast else c)
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)

"""Schema discovery (SURVEY.md §2 A1).

The reference reads SQLite pragmas into ``dbMeta``/``tableMeta``/
``columnMeta`` — filename, WAL flag, per-table name + WITHOUT-ROWID flag,
per-column name/declared type/PK ordinal (``/root/reference/dbmeta.go``).

Spark equivalent: parquet footers and catalog introspection. ``discover``
walks a data directory and returns the same shape; ``pk_guess`` plays the
PK-ordinal role (Spark storage has no declared keys — the engine takes
key columns as parameters everywhere, this is the discovery aid).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from .sources import load_table


@dataclass
class ColumnMeta:
    name: str
    type: str
    pk: int = 0  # PK ordinal, 1-based; 0 = not a key (parity: dbmeta.go:12-16)


@dataclass
class TableMeta:
    name: str
    columns: list[ColumnMeta] = field(default_factory=list)
    path: str = ""


@dataclass
class DirMeta:
    """Parity with ``dbMeta`` (dbmeta.go:18-27): the storage location plus
    per-table metadata. WAL has no Spark analog (storage is immutable
    files); the append-only log dir plays that role."""

    location: str
    tables: dict[str, TableMeta] = field(default_factory=dict)


#: conventional key columns for the driver fixtures (discovery aid only —
#: operators always take keys explicitly)
KNOWN_KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def discover(spark: SparkSession, data_dir: str) -> DirMeta:
    """Scan ``data_dir`` for parquet tables and read their schemas.

    Metadata-only (footers), no data scan — like the reference's pragma
    reads at construction (triggers.go:68-71). Like the reference, the
    result is a point-in-time snapshot: later schema changes are invisible.
    """
    meta = DirMeta(location=data_dir)
    for path in sorted(glob.glob(os.path.join(data_dir, "*.parquet"))):
        name = os.path.splitext(os.path.basename(path))[0]
        df = load_table(spark, data_dir, name)
        keys = KNOWN_KEYS.get(name, [])
        cols = [
            ColumnMeta(
                name=f.name,
                type=f.dataType.simpleString(),
                pk=(keys.index(f.name) + 1) if f.name in keys else 0,
            )
            for f in df.schema.fields
        ]
        meta.tables[name] = TableMeta(name=name, columns=cols, path=path)
    return meta

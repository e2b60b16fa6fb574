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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column data profile in ONE pass: ``(col_name, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str)`` — the audit a
    pipeline runs before trusting a new 100 TB drop (null explosions,
    cardinality collapse, out-of-range values). Numeric columns report
    min/max as ``round(double, 6)`` in ``min_num``/``max_num``;
    string/temporal columns report the native min/max cast to string in
    ``min_str``/``max_str`` (min is computed in the NATIVE type first —
    a string-cast min would order '9' < '10' wrong).

    Physical shape: a single global aggregation emitting every stat for
    every column, then a rows-from-columns pivot of the one result row
    (driver-side arithmetic on 1 row, not a transpose shuffle). The
    multi-column DISTINCT uses Spark's expand: input amplification =
    #profiled columns through one shuffle — the price of exactness.
    ``exact_distinct=False`` swaps in ``approx_count_distinct`` (HLL++,
    relative error ``rsd``), the 100 TB default: no expand, partial
    sketches merge map-side.
    """
    cols = columns if columns is not None else df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__nulls_{c}")
        )
        if exact_distinct:
            aggs.append(
                F.countDistinct(F.col(c)).cast("bigint").alias(f"__dist_{c}")
            )
        else:
            aggs.append(
                F.approx_count_distinct(F.col(c), rsd)
                .cast("bigint")
                .alias(f"__dist_{c}")
            )
        if isinstance(fields[c], _NUMERIC_TYPES):
            aggs.append(
                F.round(F.min(F.col(c)).cast("double"), 6).alias(f"__min_{c}")
            )
            aggs.append(
                F.round(F.max(F.col(c)).cast("double"), 6).alias(f"__max_{c}")
            )
        else:
            aggs.append(
                F.min(F.col(c)).cast("string").alias(f"__min_{c}")
            )
            aggs.append(
                F.max(F.col(c)).cast("string").alias(f"__max_{c}")
            )
    one = df.agg(*aggs)
    per_col = []
    for c in cols:
        numeric = isinstance(fields[c], _NUMERIC_TYPES)
        per_col.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                (F.col(f"__min_{c}") if numeric else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"__max_{c}") if numeric else F.lit(None).cast("double")).alias("max_num"),
                (F.lit(None).cast("string") if numeric else F.col(f"__min_{c}")).alias("min_str"),
                (F.lit(None).cast("string") if numeric else F.col(f"__max_{c}")).alias("max_str"),
            )
        )
    return one.select(
        F.explode(F.array(*per_col)).alias("p")
    ).select("p.*")

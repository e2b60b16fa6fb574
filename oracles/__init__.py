"""DuckDB oracle SQL for every oracled registry query, one
module per family — the assembly point oracle_sql() reads."""

from . import (  # noqa: F401
    parta,
    cdc,
    joins,
    stats,
    storage,
    dedup,
    vector,
    text,
    multimodal,
    capstone,
    sql,
    sampling,
    decontam,
    retrieval,
)

SQL: dict[str, str] = {}
for _m in (parta, cdc, joins, stats, storage, dedup, vector, text, multimodal, capstone, sql, sampling, decontam, retrieval):
    SQL.update(_m.SQL)

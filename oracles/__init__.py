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
    # a key defined in two family modules would silently run the wrong
    # family's oracle while still passing the orphan/oracled tests —
    # same silent-collision class the r10 registry fix closed
    _dup = SQL.keys() & _m.SQL.keys()
    assert not _dup, f"oracle key collision in {_m.__name__}: {sorted(_dup)}"
    SQL.update(_m.SQL)

"""Multi-format timestamp parsing (SURVEY.md §2.3 P4-P6).

The reference tries ``'%Y-%m-%d %H:%M:%S'`` then ``'%Y-%m-%d'``
(``main_parallel.py:338-342``), but the live 60-min SMA feed emits
``'2025-12-09 19:00'`` — a format NONE of the reference parsers accept,
silently dropping every row of an incremental re-run
(``main_parallel.py:352-353`` catches ValueError and skips; evidence
``etl_log.log:5136``). We add the ``HH:mm`` pattern and keep the parse
permissive: unparseable strings become NULL for the caller to quarantine
(operators/quarantine semantics, never silent row loss).

All parsing is JVM-side ``to_timestamp`` under whole-stage codegen — no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Ordered most-specific-first so a 'yyyy-MM-dd HH:mm:ss' string is not
# truncated by a laxer pattern.
TIMESTAMP_PATTERNS = (
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm",   # the live-feed format the reference misses (P5)
    "yyyy-MM-dd",         # bare date -> midnight (reference main_parallel_duckdb.py:292)
)


def parse_timestamp_multi(col: Column | str) -> Column:
    """NULL-on-failure multi-pattern timestamp parse."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(p)) for p in TIMESTAMP_PATTERNS])


def parse_date(col: Column | str) -> Column:
    """Strict ISO date parse, NULL on failure (reference P4,
    ``main_parallel.py:264``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(F.try_to_timestamp(c, F.lit("yyyy-MM-dd")))

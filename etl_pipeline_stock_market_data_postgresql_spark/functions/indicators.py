"""Native technical indicators (SURVEY.md §2.5 A4).

The reference can only *fetch* a simple moving average from the API and
store it (``main_parallel.py:328-362``); the computation itself is the
one analytic capability the system consumes. Here it is computed
natively as a window aggregate — partitioned by symbol, ordered by time,
trailing N rows. At 100 TB this is a single shuffle on the symbol key
(already the storage partition key, so often shuffle-free) followed by a
sorted window scan; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def trailing_window(key_col: str, time_col: str, n: int,
                    tiebreak_cols: list[str] | None = None) -> Window:
    order = [F.col(time_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    return (Window.partitionBy(key_col).orderBy(*order)
            .rowsBetween(-(n - 1), Window.currentRow))


def sma(df: DataFrame, value_col: str, key_col: str, time_col: str, n: int,
        out_col: str = "sma_value", exact_only: bool = True,
        tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Trailing-N simple moving average per key (N=200 @60min, reference
    ``main_parallel.py:240-243``; N=10 @daily, ``main_parallel_duckdb.py:180-183``).

    ``exact_only`` masks rows with fewer than N trailing observations to
    NULL — matching the API semantics where the first SMA point appears
    only once N bars exist. ``tiebreak_cols`` makes the frame total-ordered
    when the time column alone has duplicates."""
    w = trailing_window(key_col, time_col, n, tiebreak_cols)
    avg = F.avg(value_col).over(w)
    if exact_only:
        cnt = F.count(value_col).over(w)
        avg = F.when(cnt >= n, avg)
    return df.withColumn(out_col, avg)


def rounded_4dp(col: Column) -> Column:
    """The API publishes SMA at 4 decimal places (observed ``278.0532``,
    ``etl_log.log:5136``); round for parity checks against stored values."""
    return F.round(col, 4)

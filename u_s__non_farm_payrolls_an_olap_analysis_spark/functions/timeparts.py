"""Time-dimension expression library (SURVEY §2.8 F1–F7).

Every derived time column the reference computes ad hoc in pandas
(``dashboard_nfp.py:85,114,198,245-246,300``) becomes a pure Catalyst
expression here, so Catalyst can constant-fold, push filters through them,
and keep the whole pipeline inside whole-stage codegen. No Python UDFs:
even the decade bucket — the reference's one lambda UDF
(``dashboard_nfp.py:300``) — is a builtin ``concat(floor(year/10)*10, 's')``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec


def year_of(col: Column | str) -> Column:
    """F1 — EXTRACT(YEAR ...) (`dashboard_nfp.py:85`). INT for oracle parity."""
    return F.year(col).cast("int")


def month_of(col: Column | str) -> Column:
    """F2 — EXTRACT(MONTH ...) (`dashboard_nfp.py:114`)."""
    return F.month(col).cast("int")


def quarter_of(col: Column | str) -> Column:
    """F3 — EXTRACT(QUARTER ...) / pandas ``to_period('Q')``
    (`dashboard_nfp.py:246`)."""
    return F.quarter(col).cast("int")


def month_name(col: Column | str) -> Column:
    """F4 — ``strftime('%B')`` full month name (`dashboard_nfp.py:198`).

    ``date_format(..., 'MMMM')`` is locale-sensitive; the engine pins the
    JVM default locale to en-US semantics in tests (matches DuckDB
    ``monthname``).
    """
    return F.date_format(col, "MMMM")


def month_start(col: Column | str) -> Column:
    """Month bucket — the grain of the reference's fact table (one row per
    month, `etl.py:58-63`). Kept as TIMESTAMP (midnight) rather than DATE so
    the pandas/Arrow representation matches DuckDB's (which materializes
    DATE as datetime64 anyway) for stable value-hash comparison."""
    return F.date_trunc("month", col)


def decade_label(year_col: Column) -> Column:
    """F6/F7 — decade bucket, total-function lambda semantics
    (`dashboard_nfp.py:300`): 1997 → '1990s'. Builtin expression, not a UDF."""
    return F.concat(
        (F.floor(year_col / 10) * 10).cast("int").cast("string"), F.lit("s")
    )


def months_between_int(later: Column, earlier: Column) -> Column:
    """F5 — whole-month delta ``(y2-y1)*12 + (m2-m1)`` (`dashboard_nfp.py:168`).

    Computed on year/month parts (not ``months_between``) so it is exact on
    month-start dates and matches DuckDB ``date_diff('month', ...)``.
    """
    return (
        (F.year(later) - F.year(earlier)) * 12 + (F.month(later) - F.month(earlier))
    ).cast("int")


def pct_change(col: Column, w: WindowSpec) -> Column:
    """W1/W2 — lag-1 percent change, the reference's central device
    (pandas ``pct_change()*100``, `etl.py:37`; SQL ``LAG`` form
    `dashboard_nfp.py:179-188`). NULL on the first row of each partition —
    callers decide whether to drop (the reference drops, `etl.py:38`)."""
    prev = F.lag(col, 1).over(w)
    return (col - prev) * 100.0 / prev


def diff(col: Column, w: WindowSpec) -> Column:
    """W3 — lag-1 difference (pandas ``diff()``, `dashboard_nfp.py:339`)."""
    return col - F.lag(col, 1).over(w)


def running_max_prior(col: Column, w_order: WindowSpec) -> Column:
    """W4 — running max over *strictly preceding* rows: the 'prior peak'
    (`dashboard_nfp.py:161`). Explicit frame spec; NULL on the first row."""
    return F.max(col).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )

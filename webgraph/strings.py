"""Scalar string/number formatting + masking (C6/C8).

Re-derives the reference's reporting utilities:
- StringFormatUtil.java:4-14 — fixed "%4.2f" formatting of
  nodes-per-second / seconds / minutes in reportResults output;
- ApplicationConfiguration.java:226,254-263 — config echo masks secrets
  (proxyPassword) with a same-length run of '*'.

Both Python-scalar forms (driver-side reporting, the only place the
reference uses them) and Column forms (so the same formatting can run
JVM-side inside a query when a report is produced as a DataFrame).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_rate(value: float) -> str:
    """'%4.2f' — StringFormatUtil.formatNodesPerSecond (java:5-7)."""
    return "%4.2f" % value


def format_seconds(value: float) -> str:
    """'%4.2f' — StringFormatUtil.formatSeconds (java:9-11)."""
    return "%4.2f" % value


def format_minutes(value: float) -> str:
    """'%4.2f' — StringFormatUtil.formatMinutes (java:13-15)."""
    return "%4.2f" % value


def format_rate_col(value: Column) -> Column:
    """Column form of the '%4.2f' report formatting."""
    return F.format_string("%4.2f", value)


def format_count_col(value: Column) -> Column:
    """Human-readable grouped integer (1,234,567) for report columns."""
    return F.format_number(value, 0)


def mask(secret: str | None, mask_char: str = "*") -> str | None:
    """Same-length '*' run; None/empty pass through unchanged
    (ApplicationConfiguration.java:254-263)."""
    if not secret:
        return secret
    return mask_char * len(secret)


def mask_col(secret: Column, mask_char: str = "*") -> Column:
    """Column form: non-null values become a same-length mask-char run."""
    return F.when(
        secret.isNull() | (F.length(secret) == 0), secret
    ).otherwise(F.rpad(F.lit(""), F.length(secret), mask_char))

"""Runtime assertion combinators (U9).

The reference's procedures guard statement results with
EXPECT_SCALAR_LONG / EXPECT_SCALAR / EXPECT_ZERO_OR_ONE_ROW /
EXPECT_SCALAR_MATCH, aborting the transaction on violation
(DeleteAfterDate.java:75-90, NewEvent.java:62-74). The Spark equivalents
validate collected results in pipeline driver code / tests.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


class ExpectationError(AssertionError):
    pass


def expect_scalar(df: DataFrame) -> Any:
    """Exactly one row, one column → its value (EXPECT_SCALAR)."""
    rows = df.limit(2).collect()
    if len(rows) != 1 or len(rows[0]) != 1:
        raise ExpectationError(
            f"expected scalar, got {len(rows)} row(s) × {len(df.columns)} col(s)"
        )
    return rows[0][0]


def expect_scalar_long(df: DataFrame) -> int:
    """EXPECT_SCALAR_LONG: scalar that is an integer."""
    v = expect_scalar(df)
    if not isinstance(v, int):
        raise ExpectationError(f"expected long scalar, got {type(v).__name__}")
    return v


def expect_scalar_match(df: DataFrame, expected: Any) -> Any:
    """EXPECT_SCALAR_MATCH(n): scalar equal to `expected`."""
    v = expect_scalar(df)
    if v != expected:
        raise ExpectationError(f"expected scalar {expected!r}, got {v!r}")
    return v


def expect_zero_or_one_row(df: DataFrame) -> list:
    """EXPECT_ZERO_OR_ONE_ROW: at most one row → collected rows."""
    rows = df.limit(2).collect()
    if len(rows) > 1:
        raise ExpectationError(f"expected ≤1 row, got {len(rows)}")
    return rows

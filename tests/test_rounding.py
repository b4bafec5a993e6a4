"""The cross-engine rounding contract behind functions/rounding.py.

round(x, k) on a DOUBLE is not portable: Spark rounds the shortest
decimal rendering (BigDecimal.valueOf), DuckDB rounds the stored binary
value with its own recovery heuristics. At decimal half-way points that
are binary-INEXACT the two can land on different sides — the round-7
cross-scale gate caught exactly this on events_time_weighted_avg
(44.94875). Every integer-ratio oracle therefore rounds via the exact
integer half-up identity, asserted engine-identical here.
"""

from __future__ import annotations

import duckdb
import pytest

from app_fastdata_spark.functions.rounding import (
    round_ratio,
    sql_round_ratio,
)

# (numerator, denominator, decimals) — covers binary-exact half-way
# (1/32), binary-inexact half-way where the engines' builtins DIVERGE
# (3/20000, 287672/6400 = the TWA 44.94875 case), repeating decimals,
# integers, and a full-precision tail
CASES = [
    (1, 32, 4),
    (3, 20000, 4),
    (287672, 6400, 4),
    (9, 1600, 4),
    (1, 3, 4),
    (2, 3, 6),
    (1, 1, 4),
    (0, 7, 6),
    (999999, 1000000, 6),
]


@pytest.mark.parametrize("a,b,k", CASES)
def test_round_ratio_engine_identical(spark, a, b, k):
    s = (
        spark.range(1)
        .select(round_ratio(str(a), str(b), k).alias("v"))
        .collect()[0]
        .v
    )
    d = duckdb.connect().execute(
        "SELECT " + sql_round_ratio(str(a), str(b), k)
    ).fetchone()[0]
    py = ((2 * 10**k * a + b) // (2 * b)) / 10**k
    assert s == d == py, (a, b, k, s, d, py)


def test_builtin_round_diverges_where_identity_does_not(spark):
    """Documents WHY the identity exists: the builtins disagree on the
    binary-inexact half-way 3/20000 (0.00015). If the engines ever
    converge, this starts failing and the helper becomes optional."""
    from pyspark.sql import functions as F

    s = (
        spark.range(1)
        .select(F.round(F.lit(3) / F.lit(20000.0), 4).alias("v"))
        .collect()[0]
        .v
    )
    d = duckdb.connect().execute(
        "SELECT round(3 / 20000.0, 4)"
    ).fetchone()[0]
    assert s == 0.0002 and d == 0.0001 and s != d

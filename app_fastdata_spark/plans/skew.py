"""Skew mitigation: salted two-phase aggregation.

A hot grouping key (one src producing a large share of events — exactly
what a popular IP does in the reference's click stream) concentrates a
groupBy's shuffle into one reducer. Salting splits each key into
`n_salts` sub-keys for the first (heavy) aggregation, then re-aggregates
the tiny partial results — the same partial→final shape as A7, applied
one level deeper.

The salt must be DETERMINISTIC (derived from a row attribute, not
rand()) so results are reproducible and retries are idempotent.

`top_users_salted` registers with the SAME oracle as `top_users`: the
rewrite is semantics-preserving by construction and the driver verifies
it by value hash. AQE's skew-join handling covers *joins* at runtime;
explicit salting is the aggregation-side tool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.serving import TOP_USERS_SQL, events_in_window, recency
from ..operators.views import events_by_second
from ..params import TOP_K
from ..registry import register

N_SALTS = 16


def salted_sum(
    df: DataFrame, key: str, value: str, salt_from: str, n_salts: int = N_SALTS
) -> DataFrame:
    """Two-phase SUM(value) GROUP BY key with a deterministic salt:
    phase 1 shuffles on (key, salt) — hot keys spread across n_salts
    reducers; phase 2 shuffles only the n_salts partials per key."""
    salt = (F.crc32(F.col(salt_from).cast("string")) % n_salts).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(value))


def top_users_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ebs = events_by_second(spark, sf_dir, ev=events_in_window(spark, sf_dir)).filter(
        recency()
    )
    return (
        salted_sum(ebs, "src", "count_values", salt_from="second_ts")
        .select("src", F.col("count_values").alias("counts"))
        .orderBy(F.desc("counts"), F.asc("src"))
        .limit(TOP_K)
    )


register("top_users_salted", sql=TOP_USERS_SQL)(top_users_salted)

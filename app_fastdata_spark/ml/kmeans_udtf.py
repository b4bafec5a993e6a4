"""W2/U6 — the polymorphic whole-relation transform, Spark-first.

The reference's Vertica path runs k-means as an R transform UDTF:
`mykmeansPoly(src, dest, referral, agent USING PARAMETERS k=20) OVER()`
— a function consuming ALL rows and emitting k center rows
(vertica/RFunctions.sql:14-19, vertica/RFunctions.R:6-23).

Spark equivalent per SURVEY.md §2.5 W2: ``groupBy(lit(1)).applyInPandas``
with an explicit out-schema — the whole relation arrives as one pandas
frame, the UDTF returns the k centers. Lloyd's iterations are plain
numpy with a DETERMINISTIC quantile-spread init (no RNG), so the result
is reproducible without a seed — and rounded to ints like the Scala job
(KMeansReferral.scala:52).

Scale note: the single-group applyInPandas deliberately funnels the
relation through one task — correct semantics for a UDTF declared
OVER(), which is inherently a gather. At 100 TB you train on a sample
(`.sample(fraction)` upstream keeps the gather bounded) or use the
distributed ``ml.kmeans`` path; both produce the same `clusters` table
contract for the ST7 swap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

K = 20
MAX_ITER = 20
OUT_SCHEMA = "id int, cu int, cv int"


def _kmeans_fit(pdf: pd.DataFrame) -> pd.DataFrame:
    X = pdf[["u", "v"]].to_numpy(dtype=float)
    k = min(K, len(X))
    # deterministic init: k points evenly spread through the (u+v)-sorted
    # order — the reproducibility the R UDx got from set.seed
    order = np.lexsort((X[:, 1], X[:, 0]))
    centers = X[order[np.linspace(0, len(X) - 1, k).astype(int)]].copy()
    for _ in range(MAX_ITER):
        d = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            pts = X[assign == j]
            if len(pts):
                centers[j] = pts.mean(axis=0)
    out = centers[np.lexsort((centers[:, 1], centers[:, 0]))]
    return pd.DataFrame(
        {
            "id": np.arange(k, dtype=np.int32),
            "cu": np.round(out[:, 0]).astype(np.int32),
            "cv": np.round(out[:, 1]).astype(np.int32),
        }
    )


def kmeans_centers_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    feats = ev.select(
        (F.col("user_id") % 100).cast("double").alias("u"),
        F.col("value").alias("v"),
    )
    return (
        feats.groupBy(F.lit(1).alias("g"))
        .applyInPandas(lambda pdf: _kmeans_fit(pdf), schema=OUT_SCHEMA)
        .orderBy("id")
    )


# Rows-only: iterative ML, not SQL-expressible (same as kmeans_centers).
register("kmeans_centers_udtf")(kmeans_centers_udtf)

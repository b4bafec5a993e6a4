"""Batch ML loop (SURVEY.md §3.3): k-means retrain + atomic model swap.

Reference: exported events → Spark MLlib KMeans(k=20, 20 iters) → centers
ROUNDED TO INTS (KMeansReferral.scala:49-57 — the rounding is part of the
semantics) → two-phase swap into the live `clusters` table
(ST7, db/ddl.sql:23-43). Here the swap is an atomic
`write.mode("overwrite").parquet` — next micro-batch scores against the
new model.

Rows-only correctness check (iterative algorithm, not SQL-expressible);
tests assert determinism with a fixed seed, center count/rounding, and
that post-swap scoring assigns every event a cluster in [0, k).
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

K = 20
MAX_ITER = 20
SEED = 42


def train_centers(events: DataFrame) -> DataFrame:
    """KMeans over the (user_id mod 100, value) feature space → k rounded-int
    centers with deterministic ids (ordered by center coordinates)."""
    feats = events.select(
        (F.col("user_id") % 100).cast("double").alias("u"),
        F.col("value").alias("v"),
    )
    assembled = VectorAssembler(inputCols=["u", "v"], outputCol="features").transform(
        feats
    )
    model = KMeans(k=K, maxIter=MAX_ITER, seed=SEED, featuresCol="features").fit(
        assembled
    )
    centers = [
        (int(round(c[0])), int(round(c[1]))) for c in model.clusterCenters()
    ]  # rounding per KMeansReferral.scala:52
    spark = events.sparkSession
    df = spark.createDataFrame(sorted(centers), "cu int, cv int")
    return df.select(
        (F.row_number().over(Window.orderBy("cu", "cv")) - 1).alias("id"),
        "cu",
        "cv",
    )


def swap_model(centers: DataFrame, path: str) -> None:
    """ST7 two-phase swap collapsed to an atomic overwrite (SURVEY.md §3.3)."""
    centers.write.mode("overwrite").parquet(path)


def kmeans_centers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return train_centers(load_table(spark, sf_dir, "events"))


# Rows-only: iterative ML, not SQL-expressible in the oracle.
register("kmeans_centers")(kmeans_centers)

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
    spark_ = events.sparkSession
    if feats.isEmpty():
        # "the arriving shard is empty": MLlib's fit() throws on an empty
        # dataset — no observations means no model; return the empty
        # centers relation (same schema), matching the UDTF twin's
        # 0-row behavior and the reference's empty-table swap semantics
        return spark_.createDataFrame([], "id int, cu int, cv int")
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


# --- one oracle-checkable Lloyd iteration over embeddings -----------------
# The full k-means loop is rows-only by necessity (iterative), but ONE
# Lloyd step — assign every vector to its nearest seed centroid, then
# recompute centroids as per-cluster means — is plain relational algebra,
# so the ML loop's inner step gets the same value-hash evidence as every
# other operator. Seeds are the K smallest vec_ids (deterministic, no
# RNG); distances fold left-to-right in double (the similarity.dot parity
# idiom) and assignment ranks round to 6 dp with cluster-id tiebreak.

STEP_K = 8


def assign_to_seed_centroids(emb: DataFrame) -> DataFrame:
    """(vec_id, cluster_id, embedding): nearest of the vec_id<STEP_K seed
    centroids per vector — the Lloyd assignment shared by the oracled
    Lloyd step and the cluster-balanced sampler. Distances quantize to
    6 dp with a cluster-id tiebreak so engine rank order cannot diverge.
    N·K interpreted distance folds are fine at dim-table scale; the
    100 TB form swaps the fold for the broadcast GEMM used by
    similarity._top_cells_udf (same semantics)."""
    from pyspark.sql import Column

    cent = emb.filter(F.col("vec_id") < STEP_K).select(
        F.col("vec_id").alias("cluster_id"), F.col("embedding").alias("cvec")
    )

    def sqdist(a: Column, b: Column) -> Column:
        diff2 = F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        )
        return F.aggregate(diff2, F.lit(0.0), lambda acc, t: acc + t)

    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "embedding", "cluster_id",
        F.round(sqdist(F.col("embedding"), F.col("cvec")), 6).alias("d"),
    )
    w = Window.partitionBy("vec_id").orderBy("d", "cluster_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cluster_id", "embedding")
    )


def kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster_id, pos, centroid, n_members): the updated centroid
    component at each dimension after one Lloyd assignment against the
    vec_id<K seed set."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = assign_to_seed_centroids(emb)
    return (
        assigned.select(
            "cluster_id", F.posexplode("embedding").alias("pos", "component")
        )
        .groupBy("cluster_id", "pos")
        .agg(
            F.round(F.avg(F.col("component").cast("double")), 6).alias(
                "centroid"
            ),
            F.count("*").alias("n_members"),
        )
    )


def _sql_sqdist(a: str, b: str) -> str:
    from ..operators.similarity import DIM

    return " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        f" * (CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        for i in range(1, DIM + 1)
    )


# The seed-assignment CTE pair shared by the Lloyd-step oracle and the
# cluster-balanced sampler's oracle (curation.py). Use as
# "WITH " + seed_assign_sql() + <query over `assigned`>.
def seed_assign_sql() -> str:
    return f"""cent AS (
      SELECT vec_id AS cluster_id, embedding AS cvec FROM embeddings
      WHERE vec_id < {STEP_K}
    ),
    assigned AS (
      SELECT vec_id, cluster_id, embedding FROM (
        SELECT e.vec_id, c.cluster_id, e.embedding,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round({_sql_sqdist("e.embedding", "c.cvec")}, 6),
                          c.cluster_id
               ) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rn = 1
    )"""


register(
    "kmeans_lloyd_step",
    sql="WITH "
    + seed_assign_sql()
    + """
    SELECT cluster_id, i - 1 AS pos,
           round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS centroid,
           count(*) AS n_members
    FROM assigned, unnest(range(1, len(embedding) + 1)) AS u(i)
    GROUP BY cluster_id, i - 1
    """,
)(kmeans_lloyd_step)

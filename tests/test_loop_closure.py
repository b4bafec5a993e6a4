"""M4 — the reference's full closed loop (SURVEY.md §3.3, README.md:7-31):

  ingest → sessionized export → harvest handoff → k-means retrain →
  atomic model swap → NEW events score against the NEW model.

One integration test drives every stage with the real modules (no mocks):
sources.export for S4/S11, ml.kmeans for U8/ST7, streaming.pipeline for
ST6 rescoring.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from app_fastdata_spark.ml.kmeans import swap_model, train_centers
from app_fastdata_spark.operators.sessions import session_starts_df
from app_fastdata_spark.sources.export import harvest, write_export
from app_fastdata_spark.streaming import pipeline as P
from app_fastdata_spark.tables import load_table


def test_closed_loop_export_retrain_swap_rescore(spark, sf_dir, tmp_path):
    export_dir = str(tmp_path / "export")
    process_dir = str(tmp_path / "process")
    feat_path = str(tmp_path / "features.parquet")
    model_path = str(tmp_path / "clusters")
    scored_path = str(tmp_path / "scored")

    # 1. ingest + sessionized export (ST2 → S4): session-start rows only
    ev = load_table(spark, sf_dir, "events")
    exported = session_starts_df(ev).select(
        F.col("user_id").alias("src"),
        F.col("event_type").alias("dest"),
        F.lit(0).alias("referral"),
        F.lit(0).alias("agent"),
        "ts",
        "value",
        "user_id",
        "event_type",
        "event_id",
        F.lit(None).cast("string").alias("props"),
    )
    write_export(exported, export_dir, generation=0)

    # 2. harvest handoff (S11) + feature projection (P1) + parquet (S7)
    feats = harvest(
        spark,
        export_dir,
        process_dir,
        feat_path,
        feature_cols=("user_id", "event_type", "ts", "value"),
    )
    assert feats.count() > 0

    # 3. retrain (U8: k=20, rounded-int centers) on the harvested subset
    centers = train_centers(spark.read.parquet(feat_path))
    assert centers.count() == 20

    # 4. atomic swap (ST7)
    swap_model(
        centers.select("id", F.col("cu").cast("double"), F.col("cv").cast("double")),
        model_path,
    )

    # 5. next micro-batch scores against the NEW model (ST6+ST7)
    q = P.start_enriched_swap_stream(
        P.events_stream(spark, sf_dir), model_path, scored_path
    )
    q.awaitTermination()
    scored = spark.read.parquet(scored_path)
    n = scored.count()
    assert n == ev.count()
    mm = scored.agg(F.min("cluster"), F.max("cluster")).collect()[0]
    assert mm[0] >= 0 and mm[1] < 20
    # every assigned id exists in the freshly-trained model
    model_ids = {r.id for r in spark.read.parquet(model_path).collect()}
    got_ids = {r.cluster for r in scored.select("cluster").distinct().collect()}
    assert got_ids <= model_ids

"""S4/S5/S7/S8/S11 — export sinks and the harvest handoff.

The reference exports its session-start stream through a pluggable
connector: Avro files on WebHDFS laid out `…/%g/%p/%t` (generation /
partition / table — db/deployment-hadoop.xml.template:5-10) or JDBC to
Vertica (deployment-demo.xml.template:5-11). The batch loop then
atomically renames the export dir before harvesting so in-flight exports
accumulate separately (hdp.harvest.pig:25-26, compute_clusters.sh:63-64),
globs the Avro (harvest.pig:25), projects features, and writes Parquet
(harvest.pig:26-27).

Spark-first: the connector dissolves into `DataFrameWriter` — the
`%g/%p` layout becomes `partitionBy` on a generation column, the rename
handoff becomes one `os.rename` (same-filesystem atomicity). The Avro
format itself: the external spark-avro module is probed at runtime and
used when present; when absent (this container), the export path still
writes REAL Avro object container files through the pure-Python codec in
`avro_codec.py` (executor-side mapInArrow, one file per partition — the
connector's `%p`), and harvest decodes them distributedly, discovering
the schema from the container header. Parquet remains available via
`fmt="parquet"` for pipelines that prefer it (columnar, statistics).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_AVRO_OK: bool | None = None


def avro_available(spark: SparkSession) -> bool:
    """Probe once whether the external spark-avro module is on the
    classpath (S4/S6 use it when present, Parquet otherwise)."""
    global _AVRO_OK
    if _AVRO_OK is None:
        try:
            spark.read.format("avro").load("/nonexistent-avro-probe")
            _AVRO_OK = True
        except Exception as ex:  # noqa: BLE001
            _AVRO_OK = "Failed to find data source" not in str(ex)
    return _AVRO_OK


def export_format(spark: SparkSession) -> str:
    return "avro" if avro_available(spark) else "avro-py"


def write_export(
    df: DataFrame, base_dir: str, generation: int = 0, fmt: str | None = None
) -> str:
    """S4: export-connector file layout — one generation subdir per write
    (the `%g` of deployment-hadoop.xml.template:8), files partitioned by
    Spark's own task partitioning (the `%p`). Returns the format used."""
    fmt = fmt or export_format(df.sparkSession)
    if fmt == "avro-py":
        from .avro_codec import write_avro

        write_avro(df, os.path.join(base_dir, f"generation={generation}"))
        return fmt
    (
        df.withColumn("generation", F.lit(generation))
        .write.partitionBy("generation")
        .format(fmt)
        .mode("append")
        .save(base_dir)
    )
    return fmt


def harvest(
    spark: SparkSession,
    export_dir: str,
    process_dir: str,
    out_parquet: str,
    feature_cols: tuple[str, ...] = ("src", "dest", "referral", "agent"),
    feature_schema: "T.StructType | None" = None,
) -> DataFrame:
    """S11 + S6 + P1 + S7: the compute_clusters harvest step.

    1. atomic rename export→process (compute_clusters.sh:63-64) so new
       exports keep accumulating in a fresh dir;
    2. glob-scan the handed-off files (harvest.pig:25);
    3. project the 4 ML feature ints (harvest.pig:26);
    4. write Parquet for the training job (harvest.pig:27).

    Returns the projected frame (also persisted at out_parquet).
    """
    if os.path.exists(process_dir):
        # stale process dir from a failed prior run (compute_clusters.sh:63)
        import shutil

        shutil.rmtree(process_dir)
    os.rename(export_dir, process_dir)  # same-fs atomic handoff
    import glob as _glob

    # Route by what is ACTUALLY on disk, not by what a fresh probe says the
    # session could write: a fmt="parquet" export, an avro export from a
    # jar-present session, and an EMPTY export (write_avro emits no files
    # for empty partitions) must all harvest. ("avro-py" is this repo's
    # codec marker, never a spark.read format.)
    avro_files = sorted(_glob.glob(f"{process_dir}/*/*.avro"))
    parquet_files = sorted(_glob.glob(f"{process_dir}/*/*.parquet"))
    if avro_files and avro_available(spark):
        # jar-present sessions read through the JVM reader — it handles
        # every container codec (snappy/deflate/...), whereas the pure-
        # Python decoder is the jar-FREE fallback (null/deflate only).
        scanned = spark.read.format("avro").load(f"{process_dir}/*")
    elif avro_files:
        from .avro_codec import read_avro, read_schema, spark_schema_of

        # schema discovery from one container header (driver-side, cheap)
        scanned = read_avro(
            spark, avro_files, spark_schema_of(read_schema(avro_files[0]))
        )
    elif parquet_files:
        # partitionBy("generation") layout → partition discovery from the
        # process root recovers the generation column.
        scanned = spark.read.parquet(process_dir)
    else:
        # empty export: no harvestable files at all. The empty frame's
        # schema must agree with what a non-empty harvest would have
        # written to the same out_parquet — callers with non-long
        # features pass feature_schema; the default long-typed frame
        # matches the reference's integer feature vector (harvest.pig:26)
        # and keeps the handoff total on a quiet interval.
        from pyspark.sql import types as T

        scanned = spark.createDataFrame(
            [],
            feature_schema
            or T.StructType(
                [T.StructField(c, T.LongType(), True) for c in feature_cols]
            ),
        )
    trimmed = scanned.select(*feature_cols)
    trimmed.write.mode("overwrite").parquet(out_parquet)
    return spark.read.parquet(out_parquet)


_JDBC_OK: dict[str, bool] = {}


def jdbc_available(spark: SparkSession, probe_url: str = "jdbc:derby:memory:probe") -> bool:
    """Probe once PER URL whether a JDBC driver accepting `probe_url` is
    on the classpath. Spark ships embedded Derby (for the Hive
    metastore), so the default probe asks DriverManager for a Derby-URL
    handler — getDriver registers ServiceLoader drivers and matches
    without opening a connection."""
    if probe_url not in _JDBC_OK:
        try:
            spark._jvm.java.sql.DriverManager.getDriver(probe_url)
            _JDBC_OK[probe_url] = True
        except Exception:  # noqa: BLE001
            _JDBC_OK[probe_url] = False
    return _JDBC_OK[probe_url]


def jdbc_export_writer(
    url: str, table: str, properties: dict[str, str] | None = None
) -> Callable[[DataFrame, int], None]:
    """S5/U7: the JDBC export target (deployment-demo.xml.template:5-11;
    vertica/RFunctions.sql:5-6,16) as a foreachBatch sink — each
    micro-batch appends transactionally via the JVM JDBC writer.

    Exercised end-to-end against Spark's embedded Derby when its driver
    is present (tests/test_sources.py::test_jdbc_export_end_to_end);
    `jdbc_available` gates environments without any JDBC driver. A real
    deployment swaps `url` for the warehouse target (Vertica/Postgres)
    and adds its driver jar — the writer shape is identical."""

    def write_batch(batch: DataFrame, _epoch: int) -> None:
        batch.write.jdbc(url, table, mode="append", properties=properties or {})

    return write_batch


def write_training_shards(
    spark, sf_dir: str, out_dir: str, doc_source=None
) -> list[int]:
    """Emit the curated corpus as trainer-ready shard files: each doc
    lands in its deterministic md5 shard (doc_global_shuffle assignment)
    and rows inside each shard file are ordered by the shuffled pos —
    a trainer streaming shard=K in file order sees the reproducible
    pseudo-random permutation. Returns the SORTED shard ids actually
    written (shard ids are md5 buckets, NOT contiguous — a narrowing
    doc_source may skip buckets entirely, so trainers iterate this
    list, never range(n)).

    Layout: out_dir/shard=K/part-*.parquet (one file per shard via
    repartition on shard before partitionBy — at 100 TB shard count
    scales with the corpus and each writer task streams one shard;
    repartition(shard) + sortWithinPartitions(pos) is one exchange +
    per-partition sort, no global ordering).

    `doc_source(spark, sf_dir) -> DataFrame[doc_id, ...]` narrows the
    corpus (e.g. pipeline survivors); default is the full table.
    """
    from pyspark.sql import functions as F

    from ..operators.curation import doc_global_shuffle
    from ..tables import load_table

    docs = (
        doc_source(spark, sf_dir)
        if doc_source is not None
        else load_table(spark, sf_dir, "documents")
    )
    assign = doc_global_shuffle(spark, sf_dir)
    # sort leads with the partition column: the dynamic-partition writer
    # re-sorts each task's rows by partition key (NOT a stable sort), so
    # (shard, pos) satisfies that required ordering up front and pos
    # order survives into the files.
    joined = docs.join(assign, "doc_id")
    out = joined.repartition(F.col("shard")).sortWithinPartitions(
        "shard", "pos"
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    # enumerate what was WRITTEN from the directory listing — free, and
    # it cannot disagree with the artifact the trainer will read (a
    # recount of the joined frame would re-run the whole assignment job)
    import glob as _glob
    import os as _os

    return sorted(
        int(_os.path.basename(p).split("=", 1)[1])
        for p in _glob.glob(_os.path.join(out_dir, "shard=*"))
    )

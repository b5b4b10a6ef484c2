"""Table-format adapter: Iceberg when a catalog is present, parquet else.

The north rule targets Iceberg tables (BASELINE.json input_hint).  This
container ships no iceberg-spark-runtime jar and no network to fetch one,
so the pipeline runs on parquet here; this module is the single seam where
that choice lives.  On a cluster with an Iceberg catalog configured
(spark.sql.catalog.* set and the runtime jar on the classpath) the same
calls route to `spark.table` / `df.writeTo`:

* read_table(spark, "catalog.db.transcripts") -> Iceberg scan with hidden
  partitioning, snapshot isolation, and predicate/partition pushdown.
* write_table(df, "catalog.db.extraction", partition_by=["bucket"]) ->
  `writeTo(...).overwritePartitions()`, which is the idempotent
  per-partition overwrite the resumable driver needs (pipeline.py uses
  parquet dynamic partition overwrite, the same contract).

Identifiers containing "/" (or starting with "file:"/"s3:"/...) are
treated as paths; anything else as a catalog table identifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_path(ident: str) -> bool:
    return "/" in ident or ident.startswith(("file:", "s3:", "hdfs:"))


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_table(
    spark: SparkSession, ident: str, fmt: str = "parquet"
) -> DataFrame:
    """Read a transcripts/extraction table from a path (parquet/json) or a
    catalog identifier (Iceberg / any registered catalog table)."""
    if is_path(ident):
        return spark.read.format(fmt).load(ident)
    return spark.table(ident)


def write_table(
    df: DataFrame,
    ident: str,
    partition_by: list[str] | None = None,
    overwrite_partitions: bool = False,
    fmt: str = "parquet",
) -> None:
    """Write to a path (format sink) or a catalog table (DataFrameWriterV2).

    ``overwrite_partitions=True`` gives idempotent per-partition overwrite
    on both routes -- dynamic partitionOverwriteMode for paths,
    ``overwritePartitions()`` for catalog tables -- which is what the
    checkpoint/resume driver relies on.

    Defaults are symmetric across routes: without
    ``overwrite_partitions`` both the path route and the catalog route
    ERROR if the target already exists (``create()``, not
    createOrReplace — silently replacing a table a user didn't ask to
    replace is a footgun).  The dynamic overwrite mode is scoped to this
    one write via a writer option, never set on the shared session.
    """
    if is_path(ident):
        writer = df.write.mode(
            "overwrite" if overwrite_partitions else "errorifexists"
        )
        if overwrite_partitions:
            # per-write scope: a session-level conf change would alter the
            # semantics of later, unrelated overwrite writes
            writer = writer.option("partitionOverwriteMode", "dynamic")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.format(fmt).save(ident)
        return
    v2 = df.writeTo(ident)
    if partition_by:
        from pyspark.sql import functions as F

        v2 = v2.partitionedBy(*[F.col(c) for c in partition_by])
    if overwrite_partitions:
        v2.overwritePartitions()
    else:
        v2.create()

"""Tagging-crop generation: the text/relational analogue of the
reference's ``generate_tagging`` task
(/root/reference/src/task/project.py:107-265).

The reference walks every hit segment of a project run in a fixed order,
assigns a global entry number, groups entries into batch directories of
1000, crops the rendered page image to the segment's box rounded to
8-pixel blocks, splits wide crops into 2/3/4 overlapping horizontal
blocks for mobile display, and writes a JSON sidecar per entry.

Spark-first re-expression:

* the global entry sequence is computed WITHOUT a single-partition
  window: hits are range-partitioned on the entry order, per-partition
  counts (a tiny driver collect, one long per partition) become
  cumulative offsets, and a mapInPandas pass assigns
  ``offset[partition] + local_rank`` — the standard scalable
  global-index pattern, O(1) driver state per partition;
* the 8-block crop rounding (project.py:178-183) and the 2/3/4-way
  split-with-overlap rule (project.py:196-226) are pure Catalyst integer
  arithmetic over the segment box — value-checkable in SQL;
* batch assignment (project.py:174) is arithmetic on the entry id;
* the per-entry JSON sidecar becomes columns (+ ``to_json`` for an
  actual sink); the meta.json {count, batch_size} summary
  (project.py:260-264) is a one-row aggregate.

The jpeg pixels themselves are the multimodal decode path (stubbed in
this container, see ops/multimodal.py); everything the reference
computes AROUND the pixels — numbering, batching, crop geometry, split
sizes, label sets — is real and exact here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crop_coords(scale_expr, box_y0, box_x0, box_y1, box_x1):
    """8-block-rounded crop rectangle (project.py:178-183):
    start = int(v*scale/8)*8, end = int(v*scale/8 + 1)*8.
    Returns (y0, x0, y1, x1) integer columns.  All inputs non-negative,
    so int() truncation == floor."""
    def start(v):
        return (F.floor(v * scale_expr / 8) * 8).cast("int")

    def end(v):
        return (F.floor(v * scale_expr / 8 + 1) * 8).cast("int")

    return start(box_y0), start(box_x0), end(box_y1), end(box_x1)


def crop_split_sizes(crop_w, crop_h):
    """Split-for-mobile rule (project.py:193-226): a crop with aspect
    ratio >= 2 splits into 4 / 3 / 2 horizontal blocks at widths
    >= 2000 / 1400 / 800, with 8-px overlap margins; otherwise (or below
    800) the single crop stands.  Returns array<array<int>> of
    [width, height] pairs, matching the reference's ``crop_sizes``.

    The reference computes unit_width = crop_width / k in float and
    truncates int(unit/8 ± 1)*8; widths are non-negative so truncation
    is floor."""
    def blocks(k: int):
        unit = crop_w.cast("double") / k
        # margin pairs [ml_i, mr_i]; size_i = mr_i - ml_i
        sizes = []
        for i in range(k):
            ml = (
                F.lit(0)
                if i == 0
                else (F.floor(unit * i / 8 - 1) * 8).cast("int")
            )
            mr = (
                crop_w
                if i == k - 1
                else (F.floor(unit * (i + 1) / 8 + 1) * 8).cast("int")
            )
            sizes.append(F.array(mr - ml, crop_h))
        return F.array(*sizes)

    single = F.array(F.array(crop_w, crop_h))
    return (
        F.when(crop_w < 2 * crop_h, single)
        .when(crop_w >= 2000, blocks(4))
        .when(crop_w >= 1400, blocks(3))
        .when(crop_w >= 800, blocks(2))
        .otherwise(single)
    )


def global_entry_ids(
    df: DataFrame, order_cols: list[str], n_partitions: int = 32,
    checkpoint: bool = False,
) -> DataFrame:
    """Add a 1-based dense global ``entry_id`` following ``order_cols``
    (the reference's sequential entry_count, project.py:172-174) without
    funnelling the data through one partition.

    Shape: range-partition on the order columns (so partition p holds a
    contiguous key range), cache that layout, collect the per-partition
    row counts (one long per partition), turn them into cumulative
    offsets, then assign offset + local rank inside each partition with
    mapInPandas.  The cache pins one physical partitioning for both the
    count pass and the assignment pass, which is what makes the ids
    stable.  Driver state is O(partitions), not O(rows).

    Durability: id stability relies on the persisted range-partitioned
    layout being REUSED by both passes.  If cached partitions AND the
    backing shuffle files are both lost (executor loss mid-job), a
    re-executed exchange may re-sample range boundaries, making the
    collected offsets inconsistent with the recomputed partitioning.
    One persisted layout per job is safe on a healthy cluster (shuffle
    output itself survives a cached-partition eviction); for long
    multi-hour production runs pass ``checkpoint=True`` to pin the
    layout as a materialized lineage cut instead of a cache.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    parts = (
        df.repartitionByRange(n_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
    )
    parts = (
        parts.localCheckpoint(eager=True) if checkpoint else parts.persist()
    )
    sizes = (
        parts.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    by_pid = {r["pid"]: r["count"] for r in sizes}
    offsets = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]

    out_schema = StructType(
        list(parts.schema.fields) + [StructField("entry_id", LongType(), False)]
    )

    def assign(it):
        # Arrow batches arrive in the partition's sorted order (the sort
        # happened Spark-side in sortWithinPartitions), so assignment is
        # a running counter — never re-sort per batch here.
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for pdf in it:
            pdf = pdf.reset_index(drop=True)
            pdf["entry_id"] = base + seen + 1 + pdf.index
            seen += len(pdf)
            yield pdf

    from .caching import register

    # `parts` stays persisted while the returned plan is live (it pins
    # the partitioning the offsets were computed from); callers drop it
    # with caching.materialize/release
    return register(parts.mapInPandas(assign, schema=out_schema), parts)


def tagging_entries(
    segments: DataFrame,
    batch_size: int = 1000,
    target_scale: float = 1.0,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx", "cindex"),
    n_partitions: int = 32,
) -> DataFrame:
    """Hit segments -> tagging entries with global numbering, batch
    directory assignment, crop geometry, and split sizes.

    Expects columns ``order_cols`` + ``box_y0 box_x0 box_y1 box_x1``
    (segment box, reference seg['content']['box']) and passes through
    everything else (type/content/labels...).  Adds:

    * entry_id     — 1-based global sequence in ``order_cols`` order
    * batch_index  — floor(entry_id / batch_size) * batch_size, the
                     reference's batch directory name (project.py:174)
    * crop_y0/x0/y1/x1, crop_width, crop_height — 8-block-rounded crop
    * crop_sizes   — array<array<int>> [w,h] per split block
    """
    numbered = global_entry_ids(segments, list(order_cols), n_partitions)
    y0, x0, y1, x1 = crop_coords(
        F.lit(float(target_scale)),
        F.col("box_y0"),
        F.col("box_x0"),
        F.col("box_y1"),
        F.col("box_x1"),
    )
    out = (
        numbered.withColumn(
            "batch_index",
            (F.floor(F.col("entry_id") / batch_size) * batch_size).cast("long"),
        )
        .withColumn("crop_y0", y0)
        .withColumn("crop_x0", x0)
        .withColumn("crop_y1", y1)
        .withColumn("crop_x1", x1)
        .withColumn("crop_width", F.col("crop_x1") - F.col("crop_x0"))
        .withColumn("crop_height", F.col("crop_y1") - F.col("crop_y0"))
    )
    from .caching import register

    # carry the registered cache of global_entry_ids through the column
    # derivations (each withColumn returns a fresh DataFrame object)
    return register(
        out.withColumn(
            "crop_sizes",
            crop_split_sizes(F.col("crop_width"), F.col("crop_height")),
        ),
        *getattr(numbered, "_crrf_cached", []),
    )


def tagging_meta(entries: DataFrame, batch_size: int = 1000) -> DataFrame:
    """The meta.json analogue (project.py:260-264): one row
    (count, batch_size)."""
    return entries.agg(
        F.count("*").alias("count"), F.lit(batch_size).alias("batch_size")
    )


def write_tagging_batches(entries: DataFrame, path: str) -> None:
    """Write entries as JSON partitioned by batch_index — the batch
    directory layout of the reference's output tree (one dir per 1000
    entries, project.py:174-176).  Partition count = number of batches,
    not tasks x batches."""
    (
        entries.repartition("batch_index")
        .write.mode("overwrite")
        .partitionBy("batch_index")
        .json(path)
    )


def pack_tagging_archive(batches_path: str, archive_path: str) -> int:
    """The ``pack_tagging`` analogue (/root/reference/src/task/
    project.py:268-286): walk the batch tree and zip every JSON part,
    preserving the batch_index=N directory layout as archive names.

    Driver-side by design, exactly like the reference: the input is the
    already-sampled tagging output (thousands of entries), orders of
    magnitude smaller than the corpus, and a zip is inherently a
    single-writer format.  Returns the number of files archived.
    """
    import os
    import zipfile

    n = 0
    with zipfile.ZipFile(archive_path, "w", zipfile.ZIP_DEFLATED) as zo:
        for root, _dirs, files in os.walk(batches_path):
            for fn in sorted(files):
                if not fn.endswith(".json"):
                    continue
                full = os.path.join(root, fn)
                zo.write(full, os.path.relpath(full, batches_path))
                n += 1
    return n

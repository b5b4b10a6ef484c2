"""Similarity search over an embedding column (array<float>).

* brute_force_topk: exact cosine top-k -- the correctness baseline.  The
  dot product is a pure Catalyst expression (zip_with + aggregate), so the
  scan stays JVM-side and whole-stage-codegen'd; top-k is an orderBy+limit
  which Spark executes as a per-partition TakeOrdered (no full sort
  shuffle).
* lsh_bucket_topk: the scale path -- random-hyperplane buckets with
  multi-probe (query probes its bucket and single-bit-flip neighbours), so
  only a fraction of the table is scored.  Recall < 1.0 by construction;
  num_planes/probe radius trade recall for cost.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cosine_col(vec: Column, query: list[float]) -> Column:
    """Cosine similarity of an array<float> column against a literal query
    vector, as a pure Catalyst expression."""
    q = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(
        F.zip_with(vec, q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_v = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    qn = float(np.sqrt(np.sum(np.asarray(query, dtype="float64") ** 2)))
    return F.when(norm_v == 0, F.lit(0.0)).otherwise(dot / (norm_v * F.lit(qn)))


def brute_force_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: (id, cosine) ordered desc, deterministic
    tie-break on id."""
    return (
        embeddings.select(
            F.col(id_col), cosine_col(F.col(vec_col), query).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def ivf_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 3,
    sample_fraction: float = 0.2,
    seed: int = 11,
    iters: int = 8,
    max_train: int = 100_000,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Train: k-means on a driver-side sample (centroids are tiny: n_centroids
    x dim floats, broadcast).  The sample is hard-capped at ``max_train``
    rows so the driver collect stays bounded no matter the table size.
    Assign: one vectorized pass bucketing every row to its nearest
    centroid.  Probe: score exact cosine only inside the ``n_probe``
    centroids nearest to the query.  At 100TB the assignment pass is done
    once at ingest and persisted as a partition column, so a query touches
    n_probe/n_centroids of the data.
    """
    sample = np.vstack(
        [
            r[0]
            for r in embeddings.select(vec_col)
            .sample(fraction=sample_fraction, seed=seed)
            .limit(max_train)
            .collect()
        ]
    ).astype("float64")
    rng = np.random.RandomState(seed)
    cent = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    s_sq = (sample ** 2).sum(axis=1)[:, None]
    for _ in range(iters):
        # squared-distance expansion via matmul: no (n x k x dim) temp
        d = s_sq + (cent ** 2).sum(axis=1)[None, :] - 2.0 * (sample @ cent.T)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)

    q = np.asarray(query, dtype="float64")
    probe = np.argsort(((cent - q) ** 2).sum(axis=1))[:n_probe]
    probe_set = {int(x) for x in probe}
    cent_b = embeddings.sparkSession.sparkContext.broadcast(cent)

    def assign_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = cent_b.value
        c_sq = (C ** 2).sum(axis=1)[None, :]
        for pdf in it:
            V = np.vstack(pdf[vec_col].values).astype("float64")
            d = (V ** 2).sum(axis=1)[:, None] + c_sq - 2.0 * (V @ C.T)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "centroid": d.argmin(axis=1).astype("int64"),
                }
            )

    assigned = embeddings.select(id_col, vec_col).mapInPandas(
        assign_batches,
        schema=f"{id_col} long, {vec_col} array<float>, centroid long",
    )
    return (
        assigned.filter(F.col("centroid").isin(sorted(probe_set)))
        .select(F.col(id_col), cosine_col(F.col(vec_col), query).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def lsh_bucket_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    probe_bits: int = 1,
    seed: int = 3,
) -> DataFrame:
    """Approximate top-k: score only rows whose hyperplane-sign bucket is
    within `probe_bits` bit flips of the query's bucket."""
    dim = len(query)
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_planes, dim)).astype("float64")
    qkey = int(((planes @ np.asarray(query)) > 0).dot(1 << np.arange(num_planes)))
    probes = {qkey}
    if probe_bits >= 1:
        for i in range(num_planes):
            probes.add(qkey ^ (1 << i))
    planes_b = embeddings.sparkSession.sparkContext.broadcast(planes)

    def bucketize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = planes_b.value
        for pdf in it:
            V = np.vstack(pdf[vec_col].values).astype("float64")
            keys = ((V @ P.T) > 0).dot(1 << np.arange(P.shape[0]))
            yield pd.DataFrame(
                {id_col: pdf[id_col], vec_col: pdf[vec_col],
                 "bucket": keys.astype("int64")}
            )

    bucketed = embeddings.select(id_col, vec_col).mapInPandas(
        bucketize, schema=f"{id_col} long, {vec_col} array<float>, bucket long"
    )
    return (
        bucketed.filter(F.col("bucket").isin(sorted(probes)))
        .select(F.col(id_col), cosine_col(F.col(vec_col), query).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )

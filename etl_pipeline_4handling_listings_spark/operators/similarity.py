"""Similarity search over embedding columns (``array<float>``).

Beyond-reference operators (BASELINE north star):

- :func:`cosine_topk` — exact brute-force top-k: broadcast the query
  set, map-side dot products (JVM higher-order functions, no UDF),
  per-query top-k via window. The per-row cost is O(|queries|·d);
  the only shuffle is the final rank by query.
- :func:`rp_lsh_topk` — the scale path: random-hyperplane LSH
  bucketing; each vector lands in one bucket, queries probe their
  own bucket (+ optional multi-probe neighbors), so the candidate
  set shrinks by ~2^planes. Recall < 1 by construction — it's an
  ANN operator; pair with :func:`cosine_topk` on the candidate set.

Determinism: hyperplanes derive from a fixed seed; all float math
is double-precision sequential folds.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------
# Bit-exact NumPy twins of the Catalyst sequential folds.
#
# Catalyst higher-order functions (aggregate / zip_with / transform)
# are CodegenFallback: every element evaluation walks an interpreted
# expression tree, which made the ANN operators' linear algebra the
# dominant cost (guide §4.2 — hand batches to vectorized native code).
# These helpers vectorize ACROSS ROWS while looping over the dimension
# axis IN ORDER, so every row's accumulation performs the identical
# IEEE-754 double ops in the identical order as the Catalyst fold
# ``aggregate(zip_with(a, b, (x, y) -> x*y), 0.0, (acc, x) -> acc+x)``
# — results are bit-identical, and the knife-edge recall gates /
# exact-score equality tests cannot move.
# ---------------------------------------------------------------------


def _np_mat(col) -> "np.ndarray":  # noqa: F821 (lazy numpy import)
    """pandas Series of equal-length float sequences -> (n, d) f64."""
    import numpy as np

    return np.stack(col.to_numpy()).astype(np.float64, copy=False)


def _seq_dot_np(A, w):
    """Row-wise sequential-fold dot(A[i], w): acc starts at 0.0 and
    adds products in dimension order — the Catalyst ``dot`` twin."""
    import numpy as np

    acc = np.zeros(A.shape[0], dtype=np.float64)
    for j in range(A.shape[1]):
        acc += A[:, j] * w[j]
    return acc


def _seq_sq_norm_np(A):
    """Row-wise sequential-fold dot(A[i], A[i])."""
    import numpy as np

    acc = np.zeros(A.shape[0], dtype=np.float64)
    for j in range(A.shape[1]):
        acc += A[:, j] * A[:, j]
    return acc


def _seq_sq_dist_np(A, c):
    """Row-wise sequential-fold sum((A[i][j]-c[j])^2) — the twin of
    ``aggregate(zip_with(v, c, (a,b) -> (a-b)*(a-b)), 0.0, +)``."""
    import numpy as np

    acc = np.zeros(A.shape[0], dtype=np.float64)
    for j in range(A.shape[1]):
        d = A[:, j] - c[j]
        acc += d * d
    return acc


def _assign_cells_np(A, centroids):
    """Nearest-centroid id per row, ties to the LOWEST cell id —
    identical to ``array_sort`` over struct(dist, cell) ascending
    (np.argmin returns the first minimum)."""
    import numpy as np

    D = np.empty((A.shape[0], centroids.shape[0]), dtype=np.float64)
    for ci in range(centroids.shape[0]):
        D[:, ci] = _seq_sq_dist_np(A, centroids[ci])
    return np.argmin(D, axis=1)


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine_sim, rank). ``queries``
    is broadcast — the candidate scoring is a map-only stage over
    the (arbitrarily large) vector table; the single shuffle is the
    per-query rank window.
    """
    from pyspark.sql import Window

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_v"),
    ).withColumn("_vnorm", l2_norm(F.col("_v")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(query_vec_col)).alias("_q"),
    ).withColumn("_qnorm", l2_norm(F.col("_q")))
    scored = v.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        (dot(F.col("_q"), F.col("_v")) / (F.col("_qnorm") * F.col("_vnorm"))).alias(
            "cosine_sim"
        ),
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (stdlib RNG, fixed seed)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]


def rp_bucket(vec: Column, hyperplanes: list[list[float]]) -> Column:
    """Random-projection bucket id: sign bits of plane dot products."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(hyperplanes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(vec, lit_plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def rp_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    planes: int = 8,
    seed: int = 42,
    probe_radius: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """ANN top-k: score only vectors in the query's LSH bucket(s).

    Bucketing cuts candidates by ~2^planes; recall is approximate.
    ``probe_radius=1`` is multi-probe LSH: each query additionally
    probes the ``planes`` buckets one sign-flip away (the most likely
    homes of near neighbors), multiplying recall at the cost of
    planes+1 probes — still exponentially cheaper than a cross join.
    Returns (query_id, neighbor_id, cosine_sim, rank).
    """
    import math

    import numpy as np

    hp = random_hyperplanes(dim, planes, seed)
    P = np.array(hp, dtype=np.float64)
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_v"),
    )

    # query side: tiny by the operator's broadcast contract — compute
    # home + multi-probe buckets on the driver with the bit-exact twin
    # of rp_bucket (sign of the sequential-fold plane dot)
    qinfo = []
    for r in queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(query_vec_col)).alias("_q"),
    ).collect():
        qv = np.asarray(list(r["_q"]), dtype=np.float64)
        home = 0
        for i in range(planes):
            bit = 1 if float(_seq_dot_np(qv[None, :], P[i])[0]) >= 0.0 else 0
            home |= bit << i
        probes = {home}
        if probe_radius >= 1:
            probes |= {home ^ (1 << i) for i in range(planes)}
        if probe_radius >= 2:
            probes |= {
                home ^ ((1 << i) | (1 << j))
                for i in range(planes)
                for j in range(i + 1, planes)
            }
        qnorm = math.sqrt(float(_seq_sq_norm_np(qv[None, :])[0]))
        qinfo.append((r["query_id"], qv, np.array(sorted(probes)), qnorm))

    def bucketer(A):
        bucket = np.zeros(A.shape[0], dtype=np.int64)
        for i in range(planes):
            bucket |= (_seq_dot_np(A, P[i]) >= 0.0).astype(np.int64) << i
        return bucket

    return _score_probed_topk(v, qinfo, bucketer, k, queries, query_id_col)


def _score_probed_topk(
    v: DataFrame,
    qinfo: list,
    bucketer,
    k: int,
    queries: DataFrame,
    query_id_col: str,
    cell_col: str | None = None,
) -> DataFrame:
    """Fused candidate-generation + scoring kernel (Arrow batches).

    Per batch: key every corpus row (``bucketer`` over the vectors,
    or a precomputed ``cell_col``), match each query's probe-key set,
    compute bit-exact cosines (sequential-fold twins), and emit only
    the per-batch top-k per query — the global rank window then sees
    ~n_batches x |Q| x k rows instead of the full candidate stream
    (the window previously funneled every candidate of a query into
    one task). Per-batch top-k of a deterministic total order
    composes exactly: the global top-k rows and ranks are identical
    to ranking the full stream.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    qid_type = queries.schema[query_id_col].dataType
    nid_type = v.schema["neighbor_id"].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", qid_type),
            T.StructField("neighbor_id", nid_type),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )
    cols = ["neighbor_id", "_v"] + ([cell_col] if cell_col else [])
    src = v.select(*cols)

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            A = _np_mat(pdf["_v"])
            ids = pdf["neighbor_id"]
            keys = (
                pdf[cell_col].to_numpy() if cell_col else bucketer(A)
            )
            vnorm = np.sqrt(_seq_sq_norm_np(A))
            for qid, qv, probe_arr, qnorm in qinfo:
                mask = np.isin(keys, probe_arr)
                mask &= (ids != qid).to_numpy()
                if not mask.any():
                    continue
                num = _seq_dot_np(A[mask], qv)
                cos = num / (qnorm * vnorm[mask])
                sub = pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": ids[mask].to_numpy(),
                        "cosine_sim": cos,
                    }
                )
                if len(sub) > k:
                    sub = sub.sort_values(
                        ["cosine_sim", "neighbor_id"],
                        ascending=[False, True],
                        kind="mergesort",
                    ).head(k)
                yield sub

    scored = src.mapInPandas(run, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    quantizer: str = "kmeans",
) -> DataFrame:
    """IVF-style ANN: coarse quantizer + probe-nearest cells.

    Train (``quantizer``):

    - ``"kmeans"`` — distributed MLlib KMeans (seeded, random init,
      few iterations): the textbook IVF quantizer; costs ~maxIter
      passes over the corpus.
    - ``"sample"`` — seeded hash-sampled centroids: the n_centroids
      vectors with the smallest portable content-hash priority ARE
      the centroids (one TakeOrdered pass, no iterations). For
      near-isotropic corpora Lloyd steps barely move recall — cell
      quality is governed by n_probe and held by the recall gate —
      so this is the cheap default at re-train frequency.

    Search: each query scores only the vectors in its ``n_probe``
    nearest cells, so the candidate set shrinks
    ~n_centroids/n_probe-fold. Cell centroids live on the driver
    (n_centroids × dim floats — tiny); every data-sized step stays
    distributed.

    Returns (query_id, neighbor_id, cosine_sim, rank).
    """
    import math

    import numpy as np

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_v"),
    )

    cell_col = None
    if quantizer == "sample":
        pri = F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("neighbor_id"), F.lit(seed))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        picked = (
            v.select("neighbor_id", "_v", pri.alias("_p"))
            .orderBy("_p", "neighbor_id")
            .limit(n_centroids)
            .collect()
        )
        centroids = np.array(
            [list(row["_v"]) for row in picked], dtype=np.float64
        )
        assigned = v  # cells fall out of the scoring kernel's pass
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feat = v.withColumn("_feat", array_to_vector(F.col("_v")))
        # a coarse quantizer does not need converged k-means: seeded
        # random init + few iterations gives equally-usable cells at
        # a fraction of the cost (k-means|| init alone runs several
        # passes over the data); recall is governed by n_probe, and
        # the recall gate (the ann_ivf query's recall oracle) holds
        # the quality bar
        model = KMeans(
            k=n_centroids,
            seed=seed,
            featuresCol="_feat",
            initMode="random",
            maxIter=8,
        ).fit(feat)
        assigned = model.transform(feat).withColumnRenamed(
            "prediction", "_cell"
        ).drop("_feat")
        centroids = np.array(
            [c.tolist() for c in model.clusterCenters()], dtype=np.float64
        )
        cell_col = "_cell"

    # query side: tiny by the broadcast contract — probe cells on the
    # driver via the bit-exact distance twin; tie order (d, cell)
    # matches the old array_sort(struct(d, cell)) slice
    qinfo = []
    for r in queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(query_vec_col)).alias("_q"),
    ).collect():
        qv = np.asarray(list(r["_q"]), dtype=np.float64)
        d = np.array(
            [
                float(_seq_sq_dist_np(qv[None, :], c)[0])
                for c in centroids
            ]
        )
        order = np.lexsort((np.arange(len(centroids)), d))
        probes = np.sort(order[:n_probe])
        qnorm = math.sqrt(float(_seq_sq_norm_np(qv[None, :])[0]))
        qinfo.append((r["query_id"], qv, probes, qnorm))

    def bucketer(A):
        return _assign_cells_np(A, centroids)

    return _score_probed_topk(
        assigned, qinfo, bucketer, k, queries, query_id_col,
        cell_col=cell_col,
    )

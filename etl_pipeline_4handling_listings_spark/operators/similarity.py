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
    from pyspark.sql import Window

    hp = random_hyperplanes(dim, planes, seed)
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_v"),
    ).withColumn("_bucket", rp_bucket(F.col("_v"), hp))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(query_vec_col)).alias("_q"),
    ).withColumn("_home", rp_bucket(F.col("_q"), hp))
    probe_buckets = [F.col("_home")]
    if probe_radius >= 1:
        probe_buckets += [
            F.col("_home").bitwiseXOR(F.lit(1 << i).cast("long"))
            for i in range(planes)
        ]
    if probe_radius >= 2:
        probe_buckets += [
            F.col("_home").bitwiseXOR(F.lit((1 << i) | (1 << j)).cast("long"))
            for i in range(planes)
            for j in range(i + 1, planes)
        ]
    q = q.select(
        "query_id",
        "_q",
        F.explode(F.array(*probe_buckets)).alias("_bucket"),
    )
    scored = (
        v.join(F.broadcast(q), "_bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_q"), F.col("_v")).alias("cosine_sim"),
        )
    )
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
    from pyspark.sql import Window

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_v"),
    )
    spark = vectors.sparkSession

    def _cents_frame(centroids: list) -> DataFrame:
        """One broadcastable row: array<struct<cell,vec>> sorted by
        cell. Centroids travel as a VALUE, not as unrolled literal
        expressions — n_centroids x dim literals make Catalyst
        analysis/codegen the dominant cost (measured ~2 s of the
        3 s ann_ivf wall at 16 x 64) and would grow without bound
        with the centroid count."""
        cent_df = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cell int, vec array<double>",
        )
        return cent_df.agg(
            F.sort_array(F.collect_list(F.struct("cell", "vec"))).alias(
                "_cents"
            )
        )

    def _cell_dists(vec: Column) -> Column:
        # per-row distances to every centroid from the carried array
        return F.array_sort(
            F.transform(
                F.col("_cents"),
                lambda s: F.struct(
                    F.aggregate(
                        F.zip_with(
                            vec, s.vec, lambda a, b: (a - b) * (a - b)
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    s.cell.alias("cell"),
                ),
            )
        )

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
        centroids = [list(row["_v"]) for row in picked]
        assigned = (
            v.crossJoin(F.broadcast(_cents_frame(centroids)))
            .withColumn(
                "_cell", F.element_at(_cell_dists(F.col("_v")), 1).cell
            )
            .drop("_cents")
        )
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
        centroids = [c.tolist() for c in model.clusterCenters()]

    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            _as_double(F.col(query_vec_col)).alias("_q"),
        )
        .crossJoin(F.broadcast(_cents_frame(centroids)))
        .withColumn(
            "_cell",
            F.explode(
                F.slice(_cell_dists(F.col("_q")), 1, n_probe).cell
            ),
        )
        .drop("_cents")
    )
    scored = (
        assigned.join(F.broadcast(q), "_cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_q"), F.col("_v")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )

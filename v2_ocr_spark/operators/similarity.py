"""Similarity search over an embedding column (array<float>).

  * brute_force_topk — exact cosine top-k: broadcast the (small) query
    set against the corpus, JVM-side dot products via F.aggregate /
    zip_with, window rank per query. The correctness baseline.
  * cosine_near_dup_pairs — all corpus pairs with cosine >= threshold.
  * ivf_topk — the scale path: coarse quantization into nlist cells
    (deterministic seed centroids, one assignment pass), queries probe
    only the nprobe nearest cells. Recall < 1 by construction; tests
    measure it against brute force.

Scale notes (100 TB): brute force is a broadcast-join scan — linear in
corpus size and embarrassingly parallel; it is the right plan whenever
the query set is small (the 1000-executor case is bounded by scan
bandwidth). IVF cuts scanned fraction to ~nprobe/nlist; cell
assignment is one narrow pass and the cell-id column becomes the
partition key so each query probes a pruned partition subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.window import Window


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_unit_norm(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Pre-normalize once so cosine becomes a plain dot product."""
    n = _norm(F.col(col))
    return df.withColumn(
        "unit",
        F.transform(F.col(col), lambda x: x.cast("double") / n),
    )


def brute_force_topk(
    spark, sf_dir, k: int = 5, n_queries: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors for the first n_queries vectors
    (queries are corpus members; self-matches excluded)."""
    emb = _emb(spark, sf_dir)
    corpus = with_unit_norm(emb).select(
        F.col("vec_id").alias("nbr_id"), F.col("unit").alias("nbr_unit")
    )
    queries = with_unit_norm(emb.where(F.col("vec_id") < n_queries)).select(
        F.col("vec_id").alias("query_id"), F.col("unit").alias("q_unit")
    )
    scored = (
        corpus.join(F.broadcast(queries))
        .where(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            _dot(F.col("q_unit"), F.col("nbr_unit")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "nbr_id",
            F.round("cosine", 6).alias("cosine"),
        )
        .orderBy("query_id", "rank")
    )


def cosine_near_dup_pairs(spark, sf_dir, threshold: float = 0.4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, all-pairs)."""
    emb = with_unit_norm(_emb(spark, sf_dir))
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("unit").alias("u_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("unit").alias("u_b"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", _dot(F.col("u_a"), F.col("u_b")).alias("cosine")
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


def _centroids(emb_unit: DataFrame, nlist: int) -> DataFrame:
    """Deterministic coarse centroids: the nlist corpus vectors whose
    vec_id hashes lowest (a seed sample; one pass, no iteration)."""
    return (
        emb_unit.withColumn("h", F.xxhash64("vec_id"))
        .orderBy("h")
        .limit(nlist)
        .select(
            F.row_number()
            .over(Window.orderBy("h"))
            .alias("cell_id"),
            F.col("unit").alias("centroid"),
        )
    )


def ivf_assign(emb_unit: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast argmax)."""
    scored = emb_unit.join(F.broadcast(centroids)).select(
        "vec_id",
        "unit",
        "cell_id",
        _dot(F.col("unit"), F.col("centroid")).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cell_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", "unit", "cell_id")
    )


def ivf_topk(
    spark, sf_dir, k: int = 5, n_queries: int = 10,
    nlist: int = 16, nprobe: int = 4,
) -> DataFrame:
    """IVF-style ANN: probe only the nprobe closest cells per query."""
    emb = with_unit_norm(_emb(spark, sf_dir)).select("vec_id", "unit")
    cents = _centroids(emb, nlist)
    assigned = ivf_assign(emb, cents)

    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("unit").alias("q_unit")
    )
    q_cells = queries.join(F.broadcast(cents)).select(
        "query_id",
        "q_unit",
        "cell_id",
        _dot(F.col("q_unit"), F.col("centroid")).alias("sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cell_id"))
    probes = (
        q_cells.withColumn("rk", F.row_number().over(wq))
        .where(F.col("rk") <= nprobe)
        .select("query_id", "q_unit", "cell_id")
    )

    scored = (
        assigned.join(F.broadcast(probes), "cell_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("nbr_id"),
            _dot(F.col("q_unit"), F.col("unit")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", F.round("cosine", 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )

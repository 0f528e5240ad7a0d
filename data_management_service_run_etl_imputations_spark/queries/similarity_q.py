"""Similarity-search queries over the embeddings table (engine extension)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)
from data_management_service_run_etl_imputations_spark.queries import register
from data_management_service_run_etl_imputations_spark.schemas import load_table

N_QUERIES = 5
TOP_K = 10


@register(
    "ann_bruteforce_topk",
    headline=True,
    oracle=f"""
        WITH q AS (SELECT vec_id AS query_id,
                          CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < {N_QUERIES}),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   list_cosine_similarity(q.qv, CAST(c.embedding AS DOUBLE[]))
                       AS cos_raw
            FROM q JOIN embeddings c ON c.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine,
               CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos_raw DESC, neighbor_id) AS rank
            FROM scored
        )
        WHERE rank <= {TOP_K}
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-{k}: broadcast query set × corpus, JVM-side dot
    products (zip_with/aggregate), per-query window rank. The correctness
    baseline for the ANN variants."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    out = brute_force_topk(emb, queries, k=TOP_K)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register("ann_lsh_topk")
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH (8 planes, multi-probe
    hamming-1): bucket equi-join instead of full cross product — the 100 TB
    path. Recall vs brute force asserted in unit tests (rows-only here:
    approximate by construction)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    dims = len(emb.select("embedding").head()[0])
    out = lsh_topk(emb, queries, dims=dims, k=TOP_K, n_planes=8)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register("ann_ivf_topk")
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: KMeans coarse quantizer (16 cells), query probes its 4
    nearest cells, exact rank within candidates — the FAISS-IVF layout as
    DataFrame ops. Rows-only check (KMeans-dependent); recall vs brute
    force asserted in unit tests."""
    from data_management_service_run_etl_imputations_spark.operators.similarity import (
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    out = ivf_topk(emb, queries, k=TOP_K, n_centroids=16, n_probe=4)
    return out.withColumn("rank", F.col("rank").cast("long"))

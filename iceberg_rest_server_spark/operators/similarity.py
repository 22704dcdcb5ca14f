"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the correctness baseline. Dot products run
  JVM-side (zip_with + aggregate, left-fold in index order — the same
  accumulation order DuckDB's list_dot_product uses, so results are
  bit-comparable). Query set is broadcast; ranking is a per-query window.
- LSH-bucketed (random hyperplane) top-k: the scale path. Signatures are
  computed by one Arrow-batched pandas UDF (a (batch × dim) · (dim × p)
  matmul); candidates come from an equi-join on the signature, so work is
  O(N·bucket) instead of O(N²).
- Cosine near-dup pairs: all pairs above a cosine threshold, via the same
  hyperplane bucketing + exact verify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product in doubles, element order preserved."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def dot_d(a: Column, b: Column) -> Column:
    """Dot product over already-double arrays (same left-fold order as
    `dot`, so bit-identical — just without per-element casts)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _prepped(df: DataFrame, id_col: str, vec_col: str, id_alias: str, vec_alias: str) -> DataFrame:
    """Per-vector precomputation: double-cast array + norm, done once per
    vector instead of once per pair (float→double casts are exact, and
    the norm is the same fold as computing it inside the pair, so pair
    cosines stay bit-identical while pair cost drops to one fold)."""
    return df.repartition(F.col(id_col)).select(
        F.col(id_col).alias(id_alias),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_alias),
        norm(F.col(vec_col)).alias(f"{vec_alias}_nrm"),
    )


def cosine_topk_bruteforce(
    queries: DataFrame, corpus: DataFrame, id_col: str, vec_col: str, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    Cross join with the query side broadcast: at 100 TB the corpus stays
    partitioned and never shuffles; each executor scans its corpus slice
    once per query batch. Ranking keys are (rounded cosine desc, id) so
    ties break deterministically.
    """
    q = _prepped(queries, id_col, vec_col, "query_id", "qvec")
    c = _prepped(corpus, id_col, vec_col, "neighbor_id", "cvec")
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                dot_d(F.col("qvec"), F.col("cvec"))
                / (F.col("qvec_nrm") * F.col("cvec_nrm")),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, planes)).astype(np.float64)


def hyperplane_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    planes: int = 4,
    tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Multi-table random-hyperplane LSH: `tables` independent signatures
    of `planes` bits each, exploded to (table, bucket) rows.

    One Arrow-batched matmul computes all tables at once: (batch × dim) ·
    (dim × tables·planes). Multi-table is what makes recall tunable
    independently of bucket size — per-table collision probability is
    cos-angle^planes, overall recall 1-(1-p)^tables."""
    H = _hyperplanes(dim, tables * planes, seed)

    @F.pandas_udf("array<long>")
    def sigs(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        bits = (M @ H) > 0  # (batch, tables*planes)
        bits = bits.reshape(len(M), tables, planes)
        weights = (1 << np.arange(planes)).astype(np.int64)
        buckets = bits @ weights  # (batch, tables)
        return pd.Series(list(buckets))

    with_sig = df.repartition(F.col(id_col)).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), sigs(F.col(vec_col)).alias("sigs")
    )
    return with_sig.select(
        "id",
        "vec",
        F.posexplode("sigs").alias("table", "bucket"),
    )


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    planes: int = 4,
    tables: int = 16,
) -> DataFrame:
    """Approximate top-k: candidates share any (table, bucket); exact
    cosine rescoring inside the candidate set. Tune recall with `tables`
    (more tables → higher recall), candidate volume with `planes`."""
    qs = hyperplane_signatures(queries, id_col, vec_col, dim, planes, tables)
    cs = hyperplane_signatures(corpus, id_col, vec_col, dim, planes, tables)
    cands = (
        cs.alias("c")
        .join(qs.alias("q"), ["table", "bucket"])
        .filter(F.col("q.id") != F.col("c.id"))
        .select(
            F.col("q.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            F.col("q.vec").alias("qvec"),
            F.col("c.vec").alias("cvec"),
        )
        .distinct()
    )
    scored = cands.withColumn(
        "cosine",
        F.round(dot(F.col("qvec"), F.col("cvec")) / (norm(F.col("qvec")) * norm(F.col("cvec"))), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_neardup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """All pairs (id1 < id2) with cosine >= threshold — exact via self-join.

    The scale path replaces the full self-join with hyperplane bucketing;
    here exactness anchors the oracle check (and the LSH variant's recall
    measurement in tests)."""
    a = _prepped(df, id_col, vec_col, "id1", "v1")
    b = _prepped(df, id_col, vec_col, "id2", "v2")
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn(
            "cosine",
            F.round(
                dot_d(F.col("v1"), F.col("v2")) / (F.col("v1_nrm") * F.col("v2_nrm")), 6
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )

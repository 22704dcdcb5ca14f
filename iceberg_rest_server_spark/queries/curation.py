"""Q151–Q152: corpus-curation QA tier — the checks a training-data
pipeline runs BEFORE committing a corpus snapshot (SURVEY.md §2F
extensions).

- Q151: embedding-dimension audit — per-dimension distributional QA
  over the embedding column (dead/saturated dimensions, Tukey-fence
  outlier counts). The vector-QA complement to the row-level quality
  scores of q33: a broken encoder shows up as collapsed or exploding
  dimensions long before downstream ANN quality degrades.
- Q152: cluster-safe train/test split — near-dup CLUSTERS (not
  documents) are the atomic unit of assignment, so no near-duplicate
  pair can straddle train and test. The step up from q120 (which
  detects leakage after a doc-hash split): here the split is leakage-
  free by construction, and the oracle re-derives the clusters with a
  recursive-CTE transitive closure to cross-check both the CC labels
  and the assignment.

Determinism (driver hash-match contract): Q151 emits only SELECTED
input values (discrete quantiles via row_number, min/max) and integer
counts — no float summation anywhere, so every output bit matches the
oracle's. The Tukey fences are computed with the identically-shaped
expression (`p25 - 1.5 * (p75 - p25)`) in both engines — IEEE double
ops on identical inputs are bit-deterministic. Q152 is all integer
counts.

100 TB notes: Q151's per-dimension selection sorts within dim
partitions — embarrassingly parallel across the (bounded) embedding
width; at petabyte row counts per dimension you'd swap the exact
selection for the mergeable-sketch rollup pattern (q89/q145) and keep
the same output contract as a rank-band gate. Q152 rides the bucketed
PPJoin + pointer-jumping CC (operators/dedup.py) — no all-pairs
anywhere; the split rule is a pure hash of the component id, so
assignment needs no extra shuffle beyond the component aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup
from ..tables import load
from ._registry import register

# ---------------------------------------------------------------- Q151


def _kq(q: float):
    """Discrete-quantile index: k = max(1, ceil(q*n)) — defined manually
    (not percentile_disc) so Spark and DuckDB compute the identical rank
    arithmetic."""
    return F.greatest(F.lit(1).cast("long"), F.ceil(F.lit(q) * F.col("n")).cast("long"))


@register(
    "q151_embedding_dim_audit",
    oracle="""
    WITH ex AS (
      SELECT ord AS dim, CAST(val AS DOUBLE) AS v
      FROM (SELECT unnest(embedding) AS val,
                   unnest(range(len(embedding))) AS ord
            FROM embeddings)
      WHERE val IS NOT NULL
    ),
    ranked AS (
      SELECT dim, v,
             row_number() OVER (PARTITION BY dim ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY dim) AS n
      FROM ex
    ),
    picks AS (
      SELECT dim,
             max(n) AS n,
             min(v) AS min_v,
             max(v) AS max_v,
             max(CASE WHEN rn = greatest(1, CAST(ceil(0.25 * n) AS BIGINT))
                      THEN v END) AS p25,
             max(CASE WHEN rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
                      THEN v END) AS med,
             max(CASE WHEN rn = greatest(1, CAST(ceil(0.75 * n) AS BIGINT))
                      THEN v END) AS p75
      FROM ranked GROUP BY dim
    ),
    fen AS (
      SELECT picks.*,
             p25 - 1.5 * (p75 - p25) AS lo,
             p75 + 1.5 * (p75 - p25) AS hi
      FROM picks
    )
    SELECT f.dim, f.n, f.min_v, f.max_v, f.p25, f.med, f.p75,
           CAST(sum(CASE WHEN e.v < f.lo OR e.v > f.hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM ex e JOIN fen f ON e.dim = f.dim
    GROUP BY f.dim, f.n, f.min_v, f.max_v, f.p25, f.med, f.p75
    ORDER BY f.dim
    """,
    doc="Embedding-dimension audit: per-dimension n/min/max, discrete "
    "quartiles (pure selection — k = ceil(q*n) via row_number, never "
    "interpolation, so float outputs are input values and hash-exact), "
    "and Tukey-fence outlier counts (1.5×IQR). Catches dead dimensions "
    "(min==max), saturation, and heavy tails before ANN/quantization "
    "consume the vectors. Plan: one posexplode, one per-dim window "
    "rank, one broadcast of the 64 fence rows back over the exploded "
    "values.",
)
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    ex = (
        emb.select(F.posexplode("embedding").alias("dim", "val"))
        .filter(F.col("val").isNotNull())
        .select(F.col("dim").cast("long").alias("dim"), F.col("val").cast("double").alias("v"))
    )
    w = Window.partitionBy("dim").orderBy("v")
    wn = Window.partitionBy("dim")
    ranked = ex.select(
        "dim",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    picks = ranked.groupBy("dim").agg(
        F.max("n").alias("n"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.max(F.when(F.col("rn") == _kq(0.25), F.col("v"))).alias("p25"),
        F.max(F.when(F.col("rn") == _kq(0.5), F.col("v"))).alias("med"),
        F.max(F.when(F.col("rn") == _kq(0.75), F.col("v"))).alias("p75"),
    )
    # fences: expression shape mirrors the oracle exactly (p25 - 1.5*(p75-p25))
    fen = picks.select(
        "dim",
        "n",
        "min_v",
        "max_v",
        "p25",
        "med",
        "p75",
        (F.col("p25") - F.lit(1.5) * (F.col("p75") - F.col("p25"))).alias("lo"),
        (F.col("p75") + F.lit(1.5) * (F.col("p75") - F.col("p25"))).alias("hi"),
    )
    return (
        ex.join(F.broadcast(fen), "dim")
        .groupBy("dim", "n", "min_v", "max_v", "p25", "med", "p75")
        .agg(
            F.sum(
                F.when((F.col("v") < F.col("lo")) | (F.col("v") > F.col("hi")), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------- Q152

# The transitive-closure CTE mirrors q49's oracle (same pair predicate,
# same char-trigram grams) and then assigns WHOLE components to splits.
_Q152_ORACLE = """
WITH RECURSIVE grams AS (
  SELECT doc_id,
         list_distinct([substr(text, i, 3) for i in range(1, length(text) - 1)]) AS g
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2
  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
          / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.8
),
edges AS (
  SELECT id1 AS u, id2 AS v FROM pairs
  UNION
  SELECT id2 AS u, id1 AS v FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (
  SELECT u AS doc_id, least(u, min(v)) AS component
  FROM reach GROUP BY u
),
members AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
),
csz AS (
  SELECT component, count(*) AS sz FROM members GROUP BY component
)
SELECT CASE WHEN substr(md5(CAST(component AS VARCHAR)), 1, 1) IN ('0','1','2')
            THEN 'test' ELSE 'train' END AS split,
       CAST(sum(sz) AS BIGINT) AS n_docs,
       count(*) AS n_clusters,
       CAST(sum(CASE WHEN sz > 1 THEN sz ELSE 0 END) AS BIGINT) AS n_clustered_docs,
       CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multidoc_clusters
FROM csz GROUP BY 1 ORDER BY split
"""


@register(
    "q152_cluster_safe_split",
    oracle=_Q152_ORACLE,
    doc="Cluster-safe train/test split: near-dup clusters (exact Jaccard "
    "pairs j>=0.8 resolved by connected components, singletons = their "
    "own cluster) are assigned ATOMICALLY to splits by md5 of the "
    "component id — leakage-free by construction, vs q120 which "
    "measures leakage after a per-doc split. Output: per-split doc/"
    "cluster totals and the multi-doc-cluster mass. Oracle re-derives "
    "the clusters with a recursive-CTE transitive closure, so a single "
    "mislabeled component flips a count and fails the hash.",
)
def q152(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = dedup.exact_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    comp = dedup.connected_components(pairs, "id1", "id2")
    members = (
        docs.select("doc_id")
        .join(comp, docs.doc_id == comp.id, "left")
        .select("doc_id", F.coalesce("component", F.col("doc_id")).alias("component"))
    )
    csz = members.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    split = (
        F.when(
            F.substring(F.md5(F.col("component").cast("string")), 1, 1).isin("0", "1", "2"),
            F.lit("test"),
        )
        .otherwise(F.lit("train"))
        .alias("split")
    )
    return (
        csz.select(split, "sz")
        .groupBy("split")
        .agg(
            F.sum("sz").alias("n_docs"),
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum(F.when(F.col("sz") > 1, F.col("sz")).otherwise(0)).alias(
                "n_clustered_docs"
            ),
            F.sum(F.when(F.col("sz") > 1, 1).otherwise(0)).alias("n_multidoc_clusters"),
        )
        .orderBy("split")
    )

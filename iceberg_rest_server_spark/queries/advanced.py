"""Q127–Q133: round-5 additions — corpus clustering, edit-distance
similarity join, SCD2/gaps-and-islands, interval concurrency, Markov
transitions, RFM segmentation, and hard-negative mining.

These extend the training-data-pipeline and lakehouse-analytics tiers
beyond the reference's own query surface (reference has no clustering /
fuzzy-join / temporal operators; its inventory stops at the catalog
plane — see SURVEY.md §2F note), re-expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import similarity
from ..tables import load
from ._exact import dec
from ._registry import register
from .northstar import _cos_sql


@register(
    "q127_kmeans_clustering",
    # Cluster ids/sizes are engine-specific (they depend on the
    # assignment of every vector), so the oracle pins the invariants the
    # algorithm guarantees: every vector is assigned exactly once
    # (n_points carries the hash), Lloyd's inertia is non-increasing,
    # and the fit actually improved over the deterministic init.
    oracle="""
    SELECT count(*) AS n_points,
           8 AS k,
           TRUE AS inertia_monotone,
           TRUE AS inertia_improved
    FROM embeddings
    """,
    doc="Distributed k-means (Lloyd's) over the embedding corpus: "
    "Arrow-batched GEMM assignment, per-partition partial (sum, count, "
    "inertia) rows — map-side combine at the vector level — and a "
    "k×dim driver-side finalize per iteration (metadata scale, "
    "independent of corpus size). Deterministic init = first k vectors "
    "by id. Self-verified: inertia history non-increasing (Lloyd's "
    "invariant) and strictly improved vs init; the exact corpus count "
    "carries the hash. operators/clustering.py.",
)
def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import kmeans_fit_assign

    emb = load(spark, sf_dir, "embeddings")
    assignments, history, _ = kmeans_fit_assign(
        emb, "vec_id", "embedding", k=8, max_iter=6
    )
    n_points = assignments.count()
    monotone = all(
        history[i + 1] <= history[i] * (1 + 1e-9) for i in range(len(history) - 1)
    )
    improved = len(history) >= 2 and history[-1] < history[0]
    return spark.createDataFrame(
        [(n_points, 8, bool(monotone), bool(improved))],
        "n_points long, k int, inertia_monotone boolean, inertia_improved boolean",
    )


@register(
    "q128_edit_distance_join",
    # Same blocking semantics on both sides: candidates must share their
    # first two name tokens (DuckDB split_part is 1-indexed, Spark's
    # split array is 0-indexed), then exact Levenshtein ≤ 5.
    oracle="""
    SELECT a.p_partkey AS id1, b.p_partkey AS id2,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM part a JOIN part b
      ON a.p_partkey < b.p_partkey
     AND split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
     AND split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
    WHERE levenshtein(a.p_name, b.p_name) <= 5
    ORDER BY id1, id2
    """,
    doc="Edit-distance similarity join: candidate pairs come from an "
    "equi-join on a blocking key (first two name tokens), then exact "
    "Levenshtein ≤ 5 — never an all-pairs cross join. Blocking turns "
    "the O(N²) fuzzy join into sum-of-block² work, the same shape the "
    "PPJoin/minhash dedup tiers use; the distance itself runs JVM-side "
    "in whole-stage codegen (F.levenshtein). The typo-tolerant "
    "record-linkage primitive for entity resolution over 100 TB "
    "catalogs.",
)
def q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    keyed = part.select(
        F.col("p_partkey").alias("pk"),
        F.col("p_name").alias("name"),
        toks.getItem(0).alias("t1"),
        toks.getItem(1).alias("t2"),
    )
    a = keyed.select(
        F.col("pk").alias("id1"), F.col("name").alias("n1"), "t1", "t2"
    )
    b = keyed.select(
        F.col("pk").alias("id2"), F.col("name").alias("n2"), "t1", "t2"
    )
    return (
        a.join(b, ["t1", "t2"])
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("dist", F.levenshtein("n1", "n2"))
        .filter(F.col("dist") <= 5)
        .select("id1", "id2", "dist")
        .orderBy("id1", "id2")
    )


@register(
    "q129_scd2_reconstruction",
    oracle="""
    WITH numbered AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn_all,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn_type
      FROM events
    ), islands AS (
      SELECT user_id, event_type, rn_all - rn_type AS grp,
             min(ts) AS valid_from, min(rn_all) AS island_ord,
             count(*) AS n_events
      FROM numbered
      GROUP BY user_id, event_type, rn_all - rn_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY island_ord) AS valid_to,
           n_events,
           (lead(valid_from) OVER (PARTITION BY user_id
                                   ORDER BY island_ord) IS NULL) AS is_current
    FROM islands
    ORDER BY user_id, valid_from, event_type
    """,
    doc="SCD2 (slowly-changing-dimension type 2) reconstruction from a "
    "change-event stream via gaps-and-islands: consecutive same-value "
    "runs per key collapse to one versioned row (the row_number "
    "difference trick), valid_to chains from the next island's "
    "valid_from, open-ended row flagged is_current. One shuffle on "
    "user_id serves both window passes and the island aggregate "
    "map-side combines — the CDC-log → dimension-table pattern every "
    "lakehouse needs.",
)
def q129(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    numbered = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.row_number().over(w_all).alias("rn_all"),
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
    )
    islands = numbered.groupBy("user_id", "event_type", "grp").agg(
        F.min("ts").alias("valid_from"),
        # island_ord is the tie-break: equal timestamps across adjacent
        # islands would make ORDER BY valid_from ambiguous and the lead()
        # non-deterministic; min(rn_all) is a unique per-island ordinal.
        F.min("rn_all").alias("island_ord"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_next = Window.partitionBy("user_id").orderBy("island_ord")
    return (
        islands.withColumn("valid_to", F.lead("valid_from").over(w_next))
        .select(
            "user_id",
            "event_type",
            "valid_from",
            "valid_to",
            "n_events",
            F.col("valid_to").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "event_type")
    )


@register(
    "q130_interval_concurrency",
    oracle="""
    WITH deltas AS (
      SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS delta
      FROM orders GROUP BY 1
      UNION ALL
      SELECT CAST(o_orderdate AS DATE) + 30 AS d, -count(*) AS delta
      FROM orders GROUP BY 1
    ), daily AS (
      SELECT d, sum(delta) AS delta FROM deltas GROUP BY d
    ), running AS (
      SELECT d, sum(delta) OVER (ORDER BY d
                                 ROWS UNBOUNDED PRECEDING) AS open_orders
      FROM daily
    )
    SELECT CAST(year(d) AS INT) AS yr,
           CAST(max(open_orders) AS BIGINT) AS peak_open
    FROM running GROUP BY 1 ORDER BY yr
    """,
    doc="Interval-overlap concurrency (max simultaneously-open orders, "
    "30-day lifetime) via the sweep-line recipe: ±1 deltas at interval "
    "endpoints, PRE-AGGREGATED per day before the running sum — the "
    "cumulative window then runs over ~date-cardinality rows (thousands) "
    "instead of 2N raw endpoints, so the one inherently-serial prefix "
    "scan is metadata-scale no matter how many intervals the fact table "
    "holds. The alternative (self-join on overlap) is O(N²) and never "
    "viable at 100 TB.",
)
def q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    starts = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("delta")
    )
    ends = orders.groupBy(F.date_add(F.to_date("o_orderdate"), 30).alias("d")).agg(
        (-F.count(F.lit(1))).alias("delta")
    )
    daily = (
        starts.unionByName(ends)
        .groupBy("d")
        .agg(F.sum("delta").alias("delta"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    running = daily.withColumn("open_orders", F.sum("delta").over(w))
    return (
        running.groupBy(F.year("d").cast("int").alias("yr"))
        .agg(F.max("open_orders").cast("long").alias("peak_open"))
        .orderBy("yr")
    )


@register(
    "q131_markov_transitions",
    oracle="""
    WITH pairs AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ), counts AS (
      SELECT from_type, to_type, count(*) AS n
      FROM pairs WHERE to_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY from_type), 6) AS p
    FROM counts
    ORDER BY from_type, to_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: lead() pairs adjacent events (one shuffle on user_id), "
    "the pair aggregate map-side combines, and row-normalization runs "
    "as a window over the tiny (types × types) count matrix. The "
    "behavioral-model summary that drives next-event prediction and "
    "anomalous-flow detection; all O(N) work is a single pass over the "
    "fact table.",
)
def q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    w_norm = Window.partitionBy("from_type")
    return (
        counts.withColumn(
            "p", F.round(F.col("n").cast("double") / F.sum("n").over(w_norm), 6)
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "q132_rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS freq,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey, monetary,
             ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS r,
             ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f,
             ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m
      FROM rfm
    )
    SELECT r * 100 + f * 10 + m AS segment,
           count(*) AS n_customers,
           CAST(sum(monetary) AS DOUBLE) AS total_monetary
    FROM scored GROUP BY 1 ORDER BY segment
    """,
    doc="RFM (recency/frequency/monetary) customer segmentation: one "
    "aggregate over orders builds the per-customer profile, three "
    "ntile(5) quintile scores (deterministic: unique custkey tiebreak) "
    "label each dimension, and segments aggregate the quintile cube. "
    "The ntile windows sort only the customer-level profile (orders "
    "cardinality already collapsed), and monetary stays exact decimal "
    "until the final cast — bit-stable under repartitioning.",
)
def q132(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(dec("o_totalprice")).alias("monetary"),
    )
    scored = rfm.select(
        "o_custkey",
        "monetary",
        F.ntile(5).over(Window.orderBy(F.desc("last_order"), "o_custkey")).alias("r"),
        F.ntile(5).over(Window.orderBy(F.desc("freq"), "o_custkey")).alias("f"),
        F.ntile(5).over(Window.orderBy(F.desc("monetary"), "o_custkey")).alias("m"),
    )
    return (
        scored.groupBy(
            (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary").cast("double").alias("total_monetary"),
        )
        .orderBy("segment")
    )


@register(
    "q133_hard_negative_mining",
    oracle=f"""
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round({_cos_sql('q', 'c')}, 6) AS cosine,
             row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round({_cos_sql('q', 'c')}, 6) DESC, c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON q.label != c.label
      WHERE q.vec_id < 10
    ) t WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    doc="Hard-negative mining for contrastive training: per query, the "
    "top-5 most-similar vectors with a DIFFERENT label — the pairs that "
    "sit closest to the decision boundary. Query side is broadcast "
    "(corpus never shuffles), cosines run JVM-side with the "
    "sequential-fold dot product (bit-identical to the oracle), and the "
    "label inequality prunes in the join condition before any scoring. "
    "At 100 TB the exact pass swaps for the LSH/IVF candidate "
    "generators (operators/similarity.py) with the same label filter.",
)
def q133(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    prep = emb.select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
        similarity.norm(F.col("embedding")).alias("nrm"),
    )
    q = (
        prep.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("qlabel"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
    )
    scored = (
        prep.join(F.broadcast(q), F.col("qlabel") != F.col("label"))
        .withColumn(
            "cosine",
            F.round(
                similarity.dot_d(F.col("qv"), F.col("v"))
                / (F.col("qnrm") * F.col("nrm")),
                6,
            ),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )

"""Q163–Q170, Q173–Q185, Q188: model-evaluation & advanced-analytics tier —
the measurement queries a training-data pipeline runs AFTER a model (or
a candidate scoring function) exists: ranking quality (AUC, PR-curve
threshold sweep), statistical dependence (chi-squared, lagged
cross-correlation), dimensionality structure (PCA), smoothed trends and
anomalies (EWMA, rolling-baseline flags), spatial blocking joins,
behavioral sequence mining, and score calibration. Plus the multiset
set-operation gap (INTERSECT ALL / EXCEPT ALL) left open by Q19, and
the Spark-4 aggregate surface (LISTAGG WITHIN GROUP, bitmap-exact
distinct rollups).

Determinism (driver hash-match contract): every float that reaches the
output is either (a) computed from exact integers with the identically
shaped expression in both engines (AUC, chi-squared, calibration
rates), (b) a sum of power-of-two-scaled doubles accumulated in DECIMAL
so addition order cannot matter (EWMA, chi-squared cell terms), or (c)
plain +/-/* on identical doubles (spatial distances) — never a
transcendental (exp/sin/pow-with-non-dyadic-base), whose last-ulp
behavior differs between the JVM's libm and DuckDB's.

100 TB notes per query are in each docstring; none of these plans
contains an unbounded cross product or a driver-sized collect on a
data-sized path (q166's Gram matrix is dim×dim = metadata-sized, the
same discipline as q127's k×dim k-means finalize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sampling import _hex6_spark, hex6_sql
from ..tables import load
from ._registry import register

# ---------------------------------------------------------------- Q163


@register(
    "q163_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="Multiset INTERSECT ALL (bag semantics: min of per-side "
    "multiplicities) — completes q19's set-op family, which covered "
    "only the DISTINCT variants. Catalyst plans intersectAll as a "
    "count-per-side aggregate + generate (no join explosion); one "
    "shuffle on the value, scales like a groupBy.",
)
def q163_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersectAll(supp).orderBy("nationkey")


@register(
    "q163_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="Multiset EXCEPT ALL (bag difference: multiplicity max(0, l-r)) "
    "— the other half of the q163 multiset pair. Same single-shuffle "
    "count-difference plan as intersectAll.",
)
def q163_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.exceptAll(supp).orderBy("nationkey")


# ---------------------------------------------------------------- Q164


@register(
    "q164_auc_rank_sum",
    oracle="""
    WITH scored AS (
      SELECT CAST(user_id % 4 AS BIGINT) AS segment,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
             value,
             CAST(2 * rank() OVER (PARTITION BY user_id % 4 ORDER BY value)
                  + count(*) OVER (PARTITION BY user_id % 4, value)
                  - 1 AS BIGINT) AS dar
      FROM events
    )
    SELECT segment,
           CAST(sum(label) AS BIGINT) AS n_pos,
           CAST(count(*) - sum(label) AS BIGINT) AS n_neg,
           CAST(sum(CASE WHEN label = 1 THEN dar ELSE 0 END)
                - sum(label) * (sum(label) + 1) AS BIGINT) AS auc_num,
           round((sum(CASE WHEN label = 1 THEN dar ELSE 0 END)
                  - sum(label) * (sum(label) + 1))
                 / (2.0 * sum(label) * (count(*) - sum(label))), 6) AS auc
    FROM scored
    GROUP BY segment
    ORDER BY segment
    """,
    doc="AUC-ROC per segment via the Mann–Whitney rank sum — the "
    "standard distributed AUC (no pair enumeration: AUC = (R⁺ - "
    "n⁺(n⁺+1)/2) / (n⁺n⁻) where R⁺ is the positive-class rank sum). "
    "Ties handled exactly with midranks kept in INTEGER arithmetic: "
    "2·midrank = 2·rank() + tie_count - 1, so the only float op is one "
    "final exact-integer ratio, rounded identically in both engines. "
    "Plan: one rank window per segment + one aggregate. 100 TB: the "
    "sort-per-segment becomes the cost; swap to a fixed-bin histogram "
    "AUC (trapezoidal over ~10k score bins, one groupBy) when segments "
    "stop fitting a sort — the output contract stays the same.",
)
def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    seg = (F.col("user_id") % 4).cast("bigint")
    base = ev.select(
        seg.alias("segment"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        "value",
    )
    w_rank = Window.partitionBy("segment").orderBy("value")
    w_tie = Window.partitionBy("segment", "value")
    scored = base.select(
        "segment",
        "label",
        (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1)
        .cast("bigint")
        .alias("dar"),
    )
    n_pos = F.sum("label")
    n_all = F.count(F.lit(1))
    r_pos2 = F.sum(F.when(F.col("label") == 1, F.col("dar")).otherwise(0))
    return (
        scored.groupBy("segment")
        .agg(
            n_pos.cast("bigint").alias("n_pos"),
            (n_all - n_pos).cast("bigint").alias("n_neg"),
            (r_pos2 - n_pos * (n_pos + 1)).cast("bigint").alias("auc_num"),
            F.round(
                (r_pos2 - n_pos * (n_pos + 1)) / (2.0 * n_pos * (n_all - n_pos)), 6
            ).alias("auc"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------- Q165


@register(
    "q165_chi_squared_independence",
    oracle="""
    WITH obs AS (
      SELECT lang, source, count(*) AS o
      FROM documents GROUP BY lang, source
    ),
    grid AS (
      SELECT l.lang, s.source
      FROM (SELECT DISTINCT lang FROM documents) l
      CROSS JOIN (SELECT DISTINCT source FROM documents) s
    ),
    m AS (
      SELECT g.lang, g.source, COALESCE(obs.o, 0) AS o,
             sum(COALESCE(obs.o, 0)) OVER (PARTITION BY g.lang) AS rl,
             sum(COALESCE(obs.o, 0)) OVER (PARTITION BY g.source) AS cs,
             sum(COALESCE(obs.o, 0)) OVER () AS n
      FROM grid g LEFT JOIN obs ON g.lang = obs.lang AND g.source = obs.source
    )
    SELECT CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1)
                AS BIGINT) AS dof,
           CAST(max(n) AS BIGINT) AS n,
           round(CAST(sum(CAST(
             (o - CAST(rl * cs AS DOUBLE) / n)
             * (o - CAST(rl * cs AS DOUBLE) / n)
             / (CAST(rl * cs AS DOUBLE) / n) AS DECIMAL(38, 12))) AS DOUBLE),
             6) AS chi2
    FROM m
    """,
    doc="Chi-squared test of independence over the lang × source "
    "contingency table — the dependence screen a corpus-mixing pipeline "
    "runs before trusting per-source language ratios. Expected counts "
    "come from exact integer margins; each cell's (O-E)²/E is a double "
    "computed from identical integer inputs, then CAST TO DECIMAL "
    "before summing so the (tiny) cell sum is order-independent. "
    "Zero-observation cells are materialized (distinct-langs × "
    "distinct-sources broadcast grid) so the statistic is the textbook "
    "one, not observed-cells-only. Plan: one fact-table groupBy, then "
    "windows over the cells-sized table only. 100 TB: the contingency "
    "table is |langs|·|sources| rows regardless of corpus size — only "
    "the first groupBy touches data.",
)
def q165(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    grid = (
        docs.select("lang")
        .distinct()
        .crossJoin(F.broadcast(docs.select("source").distinct()))
    )
    filled = grid.join(obs, ["lang", "source"], "left").select(
        "lang", "source", F.coalesce(F.col("o"), F.lit(0)).alias("o")
    )
    m = filled.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(Window.partitionBy("lang")).alias("rl"),
        F.sum("o").over(Window.partitionBy("source")).alias("cs"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = (F.col("rl") * F.col("cs")).cast("double") / F.col("n")
    cell = ((F.col("o") - e) * (F.col("o") - e) / e).cast("decimal(38,12)")
    return m.agg(
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        ((F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1))
        .cast("bigint")
        .alias("dof"),
        F.max("n").cast("bigint").alias("n"),
        F.round(F.sum(cell).cast("double"), 6).alias("chi2"),
    )


# ---------------------------------------------------------------- Q166


def _gram_terms_blocked(emb: DataFrame) -> DataFrame:
    """Per-batch blocked-GEMM partial sums for the second-moment build.

    Emits (i, j, s) rows: j >= 0 → upper-triangle XᵀX partial, j == -1
    → per-dim sum partial, i == j == -1 → row-count partial. Each Arrow
    batch is one numpy GEMM (rows×dim · dim×rows), so the per-batch cost
    is BLAS-speed and the emitted volume is dim²/2 + dim + 1 rows per
    batch regardless of batch size."""
    import numpy as np
    import pandas as pd

    def part(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            g = x.T @ x
            iu = np.triu_indices(g.shape[0])
            yield pd.concat(
                [
                    pd.DataFrame(
                        {"i": iu[0].astype(np.int32), "j": iu[1].astype(np.int32), "s": g[iu]}
                    ),
                    pd.DataFrame(
                        {
                            "i": np.arange(x.shape[1], dtype=np.int32),
                            "j": np.int32(-1),
                            "s": x.sum(axis=0),
                        }
                    ),
                    pd.DataFrame({"i": [np.int32(-1)], "j": [np.int32(-1)], "s": [float(len(x))]}),
                ],
                ignore_index=True,
            )

    return emb.select("embedding").mapInPandas(part, schema="i int, j int, s double")


def _gram_blocked(emb: DataFrame):
    """Combine blocked partials: DECIMAL(38,18) cross-batch sum (addition-
    order-independent), then collect the metadata-sized result. Returns
    ([((i, j), gram_sum)], [(i, dim_sum)], n_rows).

    Reproducibility contract: the DECIMAL combine makes the cross-batch
    SUM order-free, but each float64 partial still depends on which rows
    landed in its Arrow batch — so the Gram is batch-boundary-dependent
    (unlike the replaced explode path, which quantized per-row products
    and was bit-identical across partitionings). The invariant-checked
    oracle absorbs this; numeric tests comparing against an independent
    re-derivation should scale tolerance with corpus size rather than
    assert a fixed 1e-9."""
    rows = (
        _gram_terms_blocked(emb)
        .groupBy("i", "j")
        .agg(F.sum(F.col("s").cast("decimal(38,18)")).alias("s"))
        .collect()
    )
    gram = [((r["i"], r["j"]), float(r["s"])) for r in rows if r["j"] >= 0]
    mean = [(r["i"], float(r["s"])) for r in rows if r["j"] == -1 and r["i"] >= 0]
    n = int(next(float(r["s"]) for r in rows if r["i"] == -1 and r["j"] == -1))
    return gram, mean, n


def _gram_exploded(emb: DataFrame):
    """Pre-r8 correctness-reference Gram build: dim² posexplode fan-out,
    per-row products cast to DECIMAL before the cross-row sum. Kept as the
    test-only equality anchor for the blocked-GEMM executed path
    (tests/test_mleval_tier.py pins the two within 1e-9)."""
    ex = emb.select(F.posexplode("embedding").alias("i", "xi"))
    pairs = emb.select(
        "embedding", F.posexplode("embedding").alias("i", "xi")
    ).select("i", "xi", F.posexplode("embedding").alias("j", "xj"))
    gram_rows = (
        pairs.filter(F.col("i") <= F.col("j"))
        .groupBy("i", "j")
        .agg(
            # widen the float32 cells BEFORE multiplying so the per-row
            # product is the same float64 value the GEMM path computes
            F.sum(
                (F.col("xi").cast("double") * F.col("xj").cast("double")).cast(
                    "decimal(38,18)"
                )
            ).alias("s")
        )
        .collect()
    )
    mean_rows = (
        ex.groupBy("i")
        .agg(
            F.sum(F.col("xi").cast("decimal(38,18)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    gram = [((r["i"], r["j"]), float(r["s"])) for r in gram_rows]
    mean = [(r["i"], float(r["s"])) for r in mean_rows]
    return gram, mean, mean_rows[0]["n"]


@register(
    "q166_pca_top_components",
    # Eigenvectors depend on every input row, so (like q127's k-means)
    # the oracle pins the invariants the algorithm guarantees instead of
    # re-deriving the decomposition in SQL: exact corpus count + dim
    # carry the hash; unit norm, eigen-residual, positivity, ordering
    # and orthogonality are computed in the same job and pinned TRUE.
    oracle="""
    SELECT 0 AS component, count(*) AS n_vectors, 64 AS dim,
           TRUE AS unit_norm_ok, TRUE AS residual_ok,
           TRUE AS lambda_positive, TRUE AS ordered_ok,
           TRUE AS orthogonal_ok
    FROM embeddings
    UNION ALL
    SELECT 1, count(*), 64, TRUE, TRUE, TRUE, TRUE, TRUE FROM embeddings
    ORDER BY component
    """,
    doc="Distributed PCA: top-2 principal components of the embedding "
    "corpus via a blocked-GEMM covariance build + driver-side dense "
    "eigensolve. Each Arrow batch contributes one dim×dim partial "
    "XᵀX (a single numpy GEMM over the batch — JVM→Arrow→numpy, no "
    "row explosion), partial per-dim sums, and a row count; the "
    "cross-batch combine casts each partial to DECIMAL(38,18) so the "
    "global sum is addition-order-independent, and only the dim×dim "
    "= 64×64 matrix reaches the driver — metadata-sized, the q127 "
    "discipline — where the O(dim³) symmetric eigensolve is trivial "
    "at any corpus size. (Power iteration was measured unusable here: "
    "the corpus spectrum is clustered — λ1=0.0275 vs λ2=0.0272 — so "
    "its gap-ratio convergence stalls at ~1e-4 residuals; the dense "
    "solve is the numerically honest finalize.) Self-verified: ‖v‖=1, "
    "‖Cv-λv‖≤1e-9, λ>0, λ1≥λ2, v1⊥v2. The dim²-explode build that was "
    "the pre-r8 executed path survives as _gram_exploded, pinned equal "
    "to this one in tests/test_mleval_tier.py; the executed plan is "
    "asserted to contain the mapInPandas GEMM and NO Generate "
    "(tests/test_plans.py). 100 TB: per-batch work is one "
    "rows×dim GEMM; shuffle volume is batches·dim²/2 tiny partial "
    "rows; nothing data-sized leaves the executors.",
)
def q166(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    gram, mean, n = _gram_blocked(emb)

    import numpy as np

    dim = 1 + max(i for i, _ in mean)
    g = np.zeros((dim, dim))
    for (i, j), s in gram:
        g[i, j] = s
        g[j, i] = s
    mu = np.zeros(dim)
    for i, s in mean:
        mu[i] = s / n
    cov = g / n - np.outer(mu, mu)

    eigvals, eigvecs = np.linalg.eigh(cov)
    l0, l1 = float(eigvals[-1]), float(eigvals[-2])
    v0, v1 = eigvecs[:, -1], eigvecs[:, -2]
    r0 = float(np.linalg.norm(cov @ v0 - l0 * v0))
    r1 = float(np.linalg.norm(cov @ v1 - l1 * v1))
    rows = [
        (
            0,
            n,
            dim,
            bool(abs(np.linalg.norm(v0) - 1.0) < 1e-9),
            bool(r0 <= 1e-9),
            bool(l0 > 0),
            bool(l0 >= l1),
            bool(abs(float(v0 @ v1)) < 1e-9),
        ),
        (
            1,
            n,
            dim,
            bool(abs(np.linalg.norm(v1) - 1.0) < 1e-9),
            bool(r1 <= 1e-9),
            bool(l1 > 0),
            bool(l0 >= l1),
            bool(abs(float(v0 @ v1)) < 1e-9),
        ),
    ]
    return spark.createDataFrame(
        rows,
        "component int, n_vectors bigint, dim int, unit_norm_ok boolean, "
        "residual_ok boolean, lambda_positive boolean, ordered_ok boolean, "
        "orthogonal_ok boolean",
    ).orderBy("component")


# ---------------------------------------------------------------- Q167


@register(
    "q167_ewma_bounded",
    oracle="""
    WITH seq AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) - 1 AS k,
             count(*) OVER (PARTITION BY user_id) AS n_total
      FROM events
    ),
    win AS (
      SELECT user_id, value, k,
             least(n_total, 50) AS n
      FROM seq WHERE k < 50
    )
    SELECT user_id,
           CAST(max(n) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(
             CASE WHEN k = n - 1
                  THEN value / CAST(1::BIGINT << (n - 1) AS DOUBLE)
                  ELSE value / CAST(1::BIGINT << (k + 1) AS DOUBLE)
             END AS DECIMAL(38, 18))) AS DOUBLE), 8) AS ewma
    FROM win
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Bounded-memory EWMA (α=1/2) of event values per user over the "
    "last 50 events — the smoothed-activity feature a ranking pipeline "
    "maintains per entity. The recursion eₜ = αxₜ + (1-α)eₜ₋₁ unrolls "
    "to a weighted sum whose α=1/2 weights are EXACT powers of two "
    "(value / (1<<k) is an exponent shift — no libm pow anywhere), and "
    "the per-user sum is accumulated in DECIMAL, so the result is "
    "bit-identical across engines and shuffle orders. The 50-event "
    "truncation (weights below 2⁻⁵⁰ ≈ 1e-15) is the defined semantics, "
    "applied identically in the oracle — and it is what makes the "
    "operator bounded-state at 100 TB: one row_number window per user, "
    "50 rows max survive to the aggregate.",
)
def q167(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    seq = ev.select(
        "user_id",
        "value",
        (F.row_number().over(w) - 1).alias("k"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_total"),
    )
    win = seq.filter(F.col("k") < 50).withColumn(
        "n", F.least(F.col("n_total"), F.lit(50))
    )
    term = F.when(
        F.col("k") == F.col("n") - 1,
        F.col("value") / F.expr("CAST(shiftleft(1L, CAST(n - 1 AS INT)) AS DOUBLE)"),
    ).otherwise(
        F.col("value") / F.expr("CAST(shiftleft(1L, CAST(k + 1 AS INT)) AS DOUBLE)")
    )
    return (
        win.groupBy("user_id")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.round(F.sum(term.cast("decimal(38,18)")).cast("double"), 8).alias(
                "ewma"
            ),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------- Q168

# Explicit DOUBLE casts everywhere: a bare `/ 10.0` is DECIMAL division
# in both engines but with DIFFERENT precision/scale promotion rules
# (measured: Spark kept a boundary dist² exactly 2.25 in decimal while
# DuckDB's double path gave 2.249999…94) — so the contract is plain
# IEEE-double arithmetic end to end.
_LAT = "(CAST(({u}) % 1200 AS DOUBLE) / CAST(10 AS DOUBLE) - CAST(60 AS DOUBLE))"
_LON = "(CAST(({u}) % 3600 AS DOUBLE) / CAST(10 AS DOUBLE) - CAST(180 AS DOUBLE))"


@register(
    "q168_spatial_grid_join",
    # the oracle is the BRUTE-FORCE all-pairs join — it proves the grid
    # blocking loses no pair (and invents none) at the checked sf.
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS key,
             {_LAT.format(u=hex6_sql("concat('lat', CAST(c_custkey AS VARCHAR))"))} AS lat,
             {_LON.format(u=hex6_sql("concat('lon', CAST(c_custkey AS VARCHAR))"))} AS lon
      FROM customer
    )
    SELECT a.key AS key_a, b.key AS key_b,
           round((a.lat - b.lat) * (a.lat - b.lat)
                 + (a.lon - b.lon) * (a.lon - b.lon), 9) AS dist2
    FROM pts a JOIN pts b ON a.key < b.key
    WHERE (a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon) < 2.25
    ORDER BY key_a, key_b
    """,
    doc="Spatial distance self-join with grid-cell blocking: all point "
    "pairs within 1.5° (planar), points placed by the deterministic "
    "hex6 hash so both engines derive identical coordinates. Spark "
    "explodes each point into its 3×3 neighborhood of 2°×2° cells and "
    "equi-joins on the cell key — each qualifying pair meets in exactly "
    "one cell, so no dedup pass is needed; the DuckDB oracle runs the "
    "BRUTE-FORCE quadratic join, proving blocking-completeness. "
    "Distance is pure +/-/* on identical doubles (no trig — the "
    "haversine refinement would hit cross-engine libm ulps; planar "
    "semantics are the defined contract). 100 TB: candidate count = "
    "9·Σ per-cell² — bounded by density, never n²; skewed cells get "
    "the q85 salting treatment.",
)
def q168(spark: SparkSession, sf_dir: str) -> DataFrame:
    lat_u = _hex6_spark("concat('lat', CAST(c_custkey AS STRING))")
    lon_u = _hex6_spark("concat('lon', CAST(c_custkey AS STRING))")
    pts = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.expr(_LAT.format(u=lat_u)).alias("lat"),
        F.expr(_LON.format(u=lon_u)).alias("lon"),
    )
    cells = pts.select(
        "key",
        "lat",
        "lon",
        F.floor(F.col("lon") / 2.0).alias("cx"),
        F.floor(F.col("lat") / 2.0).alias("cy"),
    )
    probe = (
        cells.withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("key").alias("key_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    d2 = (F.col("lat_a") - F.col("lat")) * (F.col("lat_a") - F.col("lat")) + (
        F.col("lon_a") - F.col("lon")
    ) * (F.col("lon_a") - F.col("lon"))
    return (
        probe.join(cells, ["cx", "cy"])
        .filter(F.col("key_a") < F.col("key"))
        .filter(d2 < 2.25)
        .select(
            "key_a",
            F.col("key").alias("key_b"),
            F.round(d2, 9).alias("dist2"),
        )
        .orderBy("key_a", "key_b")
    )


# ---------------------------------------------------------------- Q169


@register(
    "q169_event_pattern_match",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(CASE event_type WHEN 'view' THEN 'v'
                                        WHEN 'click' THEN 'c'
                                        WHEN 'purchase' THEN 'p'
                                        ELSE 'o' END,
                        '' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'v+c+p')) AS BIGINT) AS n_funnels
    FROM seqs
    ORDER BY user_id
    """,
    doc="Behavioral sequence-pattern mining (MATCH_RECOGNIZE-lite): "
    "each user's event history becomes an ordered symbol string and a "
    "regex counts non-overlapping 'views→clicks→purchase' funnel runs "
    "(v+c+p). Leftmost non-overlapping match semantics are identical "
    "between Java regex and RE2 for this backreference-free pattern. "
    "Order inside the string is pinned by (ts, event_id), so the "
    "collect_list→array_sort build is shuffle-order-independent. "
    "100 TB: per-user sequences are bounded (sessions, not lifetimes); "
    "beyond that the same symbol mapping feeds applyInPandas with a "
    "streaming matcher — the expression contract stays.",
)
def q169(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ch = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .otherwise("o")
    )
    seqs = (
        ev.select("user_id", F.struct("ts", "event_id", ch.alias("ch")).alias("s"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("s")), lambda x: x["ch"]), ""
            ).alias("seq")
        )
    )
    return seqs.select(
        "user_id",
        F.length("seq").cast("bigint").alias("seq_len"),
        F.regexp_count(F.col("seq"), F.lit("v+c+p")).cast("bigint").alias("n_funnels"),
    ).orderBy("user_id")


# ---------------------------------------------------------------- Q170


@register(
    "q170_calibration_bins",
    oracle="""
    WITH mx AS (SELECT max(value) AS vmax FROM events),
    scored AS (
      SELECT least(9, CAST(floor(value / vmax * 10) AS BIGINT)) AS bin,
             value / vmax AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
      FROM events, mx
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(label) AS BIGINT) AS n_pos,
           round(CAST(sum(CAST(score AS DECIMAL(38, 18))) AS DOUBLE)
                 / count(*), 6) AS mean_score,
           round(sum(label) / CAST(count(*) AS DOUBLE), 6) AS observed_rate
    FROM scored
    GROUP BY bin
    ORDER BY bin
    """,
    doc="Score-calibration bins (reliability diagram input): a "
    "deterministic monotone score (value / global max — no exp(), so "
    "no cross-engine libm) bucketed into deciles of score space; per "
    "bin the mean predicted score (DECIMAL-accumulated, order-"
    "independent) vs the observed positive rate (exact-integer ratio). "
    "Plan: one broadcast scalar max + a map-only projection + one "
    "groupBy over ≤10 bins. 100 TB: this is a pure map-side-combine "
    "aggregate — the cheapest shape there is.",
)
def q170(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max("value").alias("vmax"))
    scored = ev.crossJoin(F.broadcast(mx)).select(
        F.least(
            F.lit(9), F.floor(F.col("value") / F.col("vmax") * 10).cast("bigint")
        ).alias("bin"),
        (F.col("value") / F.col("vmax")).alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    return (
        scored.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("label").cast("bigint").alias("n_pos"),
            F.round(
                F.sum(F.col("score").cast("decimal(38,18)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_score"),
            F.round(
                F.sum("label") / F.count(F.lit(1)).cast("double"), 6
            ).alias("observed_rate"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------- Q173


@register(
    "q173_threshold_sweep",
    oracle="""
    WITH mx AS (SELECT max(value) AS vmax FROM events),
    binned AS (
      SELECT least(9, CAST(floor(value / vmax * 10) AS BIGINT)) AS bin,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
      FROM events, mx
    ),
    per_bin AS (
      SELECT bin, count(*) AS n, sum(label) AS pos
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT sum(pos) AS all_pos FROM per_bin),
    sweep AS (
      SELECT bin AS threshold_bin,
             sum(pos) OVER (ORDER BY bin DESC) AS tp,
             sum(n - pos) OVER (ORDER BY bin DESC) AS fp,
             all_pos
      FROM per_bin, tot
    )
    SELECT threshold_bin,
           CAST(tp AS BIGINT) AS tp,
           CAST(fp AS BIGINT) AS fp,
           CAST(all_pos - tp AS BIGINT) AS fn,
           round(tp / CAST(tp + fp AS DOUBLE), 6) AS precision_,
           round(tp / CAST(all_pos AS DOUBLE), 6) AS recall_,
           round(2.0 * tp / CAST(tp + fp + all_pos AS DOUBLE), 6) AS f1
    FROM sweep
    ORDER BY threshold_bin
    """,
    doc="Precision/recall/F1 threshold sweep (the PR-curve input): the "
    "classifier 'predict positive iff score-bin ≥ k' is evaluated at "
    "every decile threshold in ONE pass — per-bin (n, positives) "
    "counts, then descending cumulative sums over the ≤10-row bin "
    "table. Thresholds are defined ON the bins, so no float boundary "
    "ambiguity exists; every metric is an exact-integer ratio rounded "
    "identically (F1 simplified to 2·tp/(tp+fp+all_pos) — one exact "
    "division instead of a harmonic mean of two rounded floats). "
    "100 TB: the fact table is touched by one map-side-combining "
    "groupBy; all windows run over 10 rows.",
)
def q173(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max("value").alias("vmax"))
    binned = ev.crossJoin(F.broadcast(mx)).select(
        F.least(
            F.lit(9), F.floor(F.col("value") / F.col("vmax") * 10).cast("bigint")
        ).alias("bin"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("label").alias("pos")
    )
    tot = per_bin.agg(F.sum("pos").alias("all_pos"))
    w = Window.orderBy(F.desc("bin")).rowsBetween(Window.unboundedPreceding, 0)
    sweep = per_bin.crossJoin(F.broadcast(tot)).select(
        F.col("bin").alias("threshold_bin"),
        F.sum("pos").over(w).alias("tp"),
        F.sum(F.col("n") - F.col("pos")).over(w).alias("fp"),
        "all_pos",
    )
    return sweep.select(
        "threshold_bin",
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        (F.col("all_pos") - F.col("tp")).cast("bigint").alias("fn"),
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")).cast("double"), 6).alias(
            "precision_"
        ),
        F.round(F.col("tp") / F.col("all_pos").cast("double"), 6).alias("recall_"),
        F.round(
            2.0 * F.col("tp")
            / (F.col("tp") + F.col("fp") + F.col("all_pos")).cast("double"),
            6,
        ).alias("f1"),
    ).orderBy("threshold_bin")


# ---------------------------------------------------------------- Q174


@register(
    "q174_rolling_anomaly_flags",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, value,
             count(*) OVER w AS n_prev,
             sum(CAST(value AS DECIMAL(18,6))) OVER w AS sum_prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id,
           CAST(n_prev AS BIGINT) AS n_prev,
           round(CAST(sum_prev AS DOUBLE) / n_prev, 6) AS rolling_mean
    FROM seq
    WHERE n_prev >= 5
      AND CAST(value AS DECIMAL(18,6)) * n_prev > 3 * sum_prev
    ORDER BY user_id, event_id
    """,
    doc="Rolling-baseline anomaly flags: an event is anomalous when its "
    "value exceeds 3× the mean of the user's previous ≤20 events (≥5 "
    "required — no cold-start flags). The comparison value·n > 3·sum "
    "is EXACT DECIMAL arithmetic (never mean-then-compare in floats), "
    "so flag membership is bit-deterministic; the reported rolling "
    "mean is the one exact ratio, rounded. One user_id shuffle, one "
    "ROWS frame — bounded state per key, the streaming-adjacent shape "
    "(q140's ValueState holds exactly this window at 100 TB).",
)
def q174(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    seq = ev.select(
        "user_id",
        "event_id",
        "value",
        F.count(F.lit(1)).over(w).alias("n_prev"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).alias("sum_prev"),
    )
    return (
        seq.filter(
            (F.col("n_prev") >= 5)
            & (
                F.col("value").cast("decimal(18,6)") * F.col("n_prev")
                > 3 * F.col("sum_prev")
            )
        )
        .select(
            "user_id",
            "event_id",
            F.col("n_prev").cast("bigint").alias("n_prev"),
            F.round(
                F.col("sum_prev").cast("double") / F.col("n_prev"), 6
            ).alias("rolling_mean"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------- Q175


@register(
    "q175_lagged_cross_correlation",
    # sqrt IS safe cross-engine (IEEE-754 requires correct rounding,
    # unlike pow/exp/sin): its inputs here are doubles derived from
    # exact integer counts with identically shaped expressions.
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT l.lag, a.v, b.p
      FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3)) AS l(lag)
      JOIN hourly a ON TRUE
      JOIN hourly b ON b.h = a.h + l.lag * INTERVAL '1 hour'
    ),
    sums AS (
      SELECT lag, count(*) AS n,
             sum(v) AS sv, sum(p) AS sp,
             sum(v * v) AS svv, sum(p * p) AS spp, sum(v * p) AS svp
      FROM lagged GROUP BY lag
    )
    SELECT lag, CAST(n AS BIGINT) AS n_hours,
           round((CAST(n * svp - sv * sp AS DOUBLE))
                 / (sqrt(CAST(n * svv - sv * sv AS DOUBLE))
                    * sqrt(CAST(n * spp - sp * sp AS DOUBLE))), 6) AS xcorr
    FROM sums
    ORDER BY lag
    """,
    doc="Lagged cross-correlation between the hourly view and purchase "
    "series (does view volume LEAD purchase volume?): Pearson r at "
    "lags −3..+3 h, computed from EXACT integer power sums per lag — "
    "the only floats are the final casts, one division and two sqrts "
    "(IEEE-correctly-rounded, hence engine-identical — the safe "
    "exception to this module's no-libm rule). Plan: the fact table "
    "collapses to an hourly table in one groupBy; the 7-lag fan-out "
    "and self-join run on hours-sized data. 100 TB: hourly cardinality "
    "grows with time, not volume — the self-join stays metadata-thin.",
)
def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("v"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p"),
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
    a = hourly.select(F.col("h").alias("ha"), "v")
    b = hourly.select(F.col("h").alias("hb"), "p")
    lagged = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("hb")
            == F.col("ha") + F.col("lag") * F.expr("INTERVAL '1' HOUR"),
        )
        .select("lag", "v", "p")
    )
    sums = lagged.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum("p").alias("sp"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
        F.sum(F.col("p") * F.col("p")).alias("spp"),
        F.sum(F.col("v") * F.col("p")).alias("svp"),
    )
    num = (F.col("n") * F.col("svp") - F.col("sv") * F.col("sp")).cast("double")
    dv = F.sqrt((F.col("n") * F.col("svv") - F.col("sv") * F.col("sv")).cast("double"))
    dp = F.sqrt((F.col("n") * F.col("spp") - F.col("sp") * F.col("sp")).cast("double"))
    return sums.select(
        "lag",
        F.col("n").cast("bigint").alias("n_hours"),
        F.round(num / (dv * dp), 6).alias("xcorr"),
    ).orderBy("lag")


# ---------------------------------------------------------------- Q177


@register(
    "q177_ordered_listagg",
    oracle="""
    SELECT c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n_rich,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer
    WHERE c_acctbal > 9000
    GROUP BY c_nationkey
    ORDER BY nationkey
    """,
    doc="Ordered string aggregation — Spark 4's LISTAGG ... WITHIN GROUP "
    "(ORDER BY) vs DuckDB's string_agg(... ORDER BY): the "
    "report-formatting aggregate every BI surface needs, deterministic "
    "ONLY because the within-group order is pinned (an unordered "
    "listagg varies with shuffle order and would fail the hash gate). "
    "The acctbal filter keeps per-group strings output-sized. 100 TB: "
    "one map-side-combining aggregate; per-group result size is the "
    "user's contract, not the engine's.",
)
def q177(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import register_views

    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_nationkey AS nationkey,
               CAST(count(*) AS BIGINT) AS n_rich,
               listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name) AS names
        FROM customer
        WHERE c_acctbal > 9000
        GROUP BY c_nationkey
        ORDER BY nationkey
        """
    )


# ---------------------------------------------------------------- Q178


@register(
    "q178_bitmap_distinct_rollup",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             count(DISTINCT user_id) AS ndv_day
      FROM events GROUP BY 1, 2
    )
    SELECT d.day, d.event_type,
           CAST(d.ndv_day AS BIGINT) AS ndv_day,
           CAST(t.ndv_type AS BIGINT) AS ndv_type
    FROM daily d
    JOIN (SELECT event_type, count(DISTINCT user_id) AS ndv_type
          FROM events GROUP BY event_type) t USING (event_type)
    ORDER BY day, event_type
    """,
    doc="EXACT mergeable distinct counts via Spark 4 bitmap aggregates: "
    "per-(day,type) user bitmaps (bitmap_construct_agg of "
    "bitmap_bit_position) are built once and OR-merged to the per-type "
    "grain (bitmap_or_agg) — the exact-arithmetic sibling of the "
    "HLL/theta sketch rollups (q111/q144): same partial→merge shape, "
    "zero error. The oracle recomputes both grains with plain COUNT "
    "DISTINCT. 100 TB: bitmaps shard by bucket (bitmap_bucket_number) "
    "so each key's bitmap is 4 KB-bounded; the rollup merges bitmaps, "
    "never re-touches facts.",
)
def q178(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        F.col("ts").cast("date").alias("day"),
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
    )
    daily_bm = base.groupBy("day", "event_type", "bkt").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    daily = daily_bm.groupBy("day", "event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("ndv_day")
    )
    type_bm = daily_bm.groupBy("event_type", "bkt").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm")
    )
    per_type = type_bm.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("ndv_type")
    )
    return (
        daily.join(per_type, "event_type")
        .select("day", "event_type", "ndv_day", "ndv_type")
        .orderBy("day", "event_type")
    )


# ---------------------------------------------------------------- Q179


@register(
    "q179_weighted_median",
    oracle="""
    WITH w AS (
      SELECT lang, n_chars,
             sum(n_chars) OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS cum_w,
             sum(n_chars) OVER (PARTITION BY lang) AS tot_w
      FROM documents
    )
    SELECT lang,
           CAST(min(tot_w) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 2 * cum_w >= tot_w THEN n_chars END)
                AS BIGINT) AS weighted_median
    FROM w
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Weighted median per language (weight = the value itself here: "
    "the doc length at which half the corpus BYTES sit in shorter "
    "docs — a storage-centric robust center the unweighted q41 median "
    "can't see). Selection semantics: smallest value whose cumulative "
    "weight reaches half the total, tie-broken by (value, doc_id) so "
    "the cumulative sum is deterministic; all-integer arithmetic "
    "(2·cum ≥ tot avoids halving). One sort per lang partition + one "
    "aggregate. 100 TB: same contract via the mergeable-sketch rank "
    "band (q89/q145) once a lang stops fitting a sort.",
)
def q179(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    cum = Window.partitionBy("lang").orderBy("n_chars", "doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy("lang")
    w = docs.select(
        "lang",
        "n_chars",
        F.sum("n_chars").over(cum).alias("cum_w"),
        F.sum("n_chars").over(tot).alias("tot_w"),
    )
    return (
        w.groupBy("lang")
        .agg(
            F.min("tot_w").cast("bigint").alias("total_weight"),
            F.min(
                F.when(2 * F.col("cum_w") >= F.col("tot_w"), F.col("n_chars"))
            )
            .cast("bigint")
            .alias("weighted_median"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------- Q180


@register(
    "q180_ab_test_zscore",
    # Welch z from exact integer/decimal power sums; sqrt is IEEE-exact.
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3','4','5','6','7')
                  THEN 'A' ELSE 'B' END AS arm,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events WHERE event_type = 'purchase'
    ),
    s AS (
      SELECT arm, count(*) AS n,
             sum(v) AS sv,
             sum(v * v) AS svv
      FROM assigned GROUP BY arm
    ),
    wide AS (
      SELECT
        (SELECT n FROM s WHERE arm = 'A') AS na,
        (SELECT n FROM s WHERE arm = 'B') AS nb,
        (SELECT sv FROM s WHERE arm = 'A') AS sva,
        (SELECT sv FROM s WHERE arm = 'B') AS svb,
        (SELECT svv FROM s WHERE arm = 'A') AS svva,
        (SELECT svv FROM s WHERE arm = 'B') AS svvb
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(CAST(sva AS DOUBLE) / na, 6) AS mean_a,
           round(CAST(svb AS DOUBLE) / nb, 6) AS mean_b,
           round((CAST(sva AS DOUBLE) / na - CAST(svb AS DOUBLE) / nb)
                 / sqrt(
                     (CAST(svva AS DOUBLE) / na
                      - (CAST(sva AS DOUBLE) / na) * (CAST(sva AS DOUBLE) / na))
                     / na
                     + (CAST(svvb AS DOUBLE) / nb
                        - (CAST(svb AS DOUBLE) / nb) * (CAST(svb AS DOUBLE) / nb))
                     / nb
                   ), 6) AS z
    FROM wide
    """,
    doc="Two-sample A/B z-test (Welch) on purchase values, arms "
    "assigned by the deterministic md5 hash-split (the q45 idiom — "
    "reproducible assignment is half of what makes an A/B readout "
    "trustworthy): per-arm count and DECIMAL-exact Σv, Σv² collapse "
    "the fact table in one map-side-combining aggregate, then the z "
    "statistic is pure arithmetic + one IEEE-exact sqrt on identical "
    "doubles. 100 TB: two rows leave the aggregate — nothing else "
    "moves.",
)
def q180(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
            *"01234567"
        ),
        "A",
    ).otherwise("B")
    s = (
        ev.select(arm.alias("arm"), F.col("value").cast("decimal(18,6)").alias("v"))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.sum(F.col("v") * F.col("v")).alias("svv"),
        )
    )
    a = s.filter(F.col("arm") == "A").select(
        F.col("n").alias("na"), F.col("sv").alias("sva"), F.col("svv").alias("svva")
    )
    b = s.filter(F.col("arm") == "B").select(
        F.col("n").alias("nb"), F.col("sv").alias("svb"), F.col("svv").alias("svvb")
    )
    wide = a.crossJoin(F.broadcast(b))
    mean_a = F.col("sva").cast("double") / F.col("na")
    mean_b = F.col("svb").cast("double") / F.col("nb")
    var_a = F.col("svva").cast("double") / F.col("na") - mean_a * mean_a
    var_b = F.col("svvb").cast("double") / F.col("nb") - mean_b * mean_b
    return wide.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(
            (mean_a - mean_b)
            / F.sqrt(var_a / F.col("na") + var_b / F.col("nb")),
            6,
        ).alias("z"),
    )


# ---------------------------------------------------------------- Q185

# Deterministic Poisson(1)-approximating bootstrap weight from one hex
# digit of md5(event_id, replica): P(0)=6/16, P(1)=6/16, P(2)=3/16,
# P(3)=1/16 — matches e^-1≈.368/.368/.184/.061 to ~1.5%. The SAME
# expression runs in both engines, so every replica is bit-identical.
_Q185_B = 32
_Q185_W = (
    "CASE WHEN strpos('0123456789abcdef', substr(md5("
    "CAST(event_id AS VARCHAR) || '_' || CAST(b AS VARCHAR)), 1, 1)) - 1 < 6"
    " THEN 0 "
    "WHEN strpos('0123456789abcdef', substr(md5("
    "CAST(event_id AS VARCHAR) || '_' || CAST(b AS VARCHAR)), 1, 1)) - 1 < 12"
    " THEN 1 "
    "WHEN strpos('0123456789abcdef', substr(md5("
    "CAST(event_id AS VARCHAR) || '_' || CAST(b AS VARCHAR)), 1, 1)) - 1 < 15"
    " THEN 2 ELSE 3 END"
)


@register(
    "q185_bootstrap_ci",
    oracle=f"""
    WITH reps AS (
      SELECT e.event_type, b.b,
             ({_Q185_W}) AS w,
             CAST(e.value AS DECIMAL(18,6)) AS v
      FROM events e CROSS JOIN (SELECT unnest(range({_Q185_B})) AS b) b
    ),
    rep_means AS (
      SELECT event_type, b,
             round(CAST(sum(w * v) AS DOUBLE) / sum(w), 6) AS m
      FROM reps GROUP BY event_type, b
    ),
    ranked AS (
      SELECT event_type, m,
             row_number() OVER (PARTITION BY event_type ORDER BY m, b) AS rn
      FROM rep_means
    )
    SELECT r.event_type,
           CAST(s.n AS BIGINT) AS n,
           round(CAST(s.sv AS DOUBLE) / s.n, 6) AS mean_value,
           max(CASE WHEN rn = 2 THEN m END) AS ci_lo,
           max(CASE WHEN rn = {_Q185_B - 1} THEN m END) AS ci_hi
    FROM ranked r
    JOIN (SELECT event_type, count(*) AS n,
                 sum(CAST(value AS DECIMAL(18,6))) AS sv
          FROM events GROUP BY event_type) s USING (event_type)
    GROUP BY r.event_type, s.n, s.sv
    ORDER BY r.event_type
    """,
    doc="Distributed Poisson bootstrap: a 90%-ish CI for each event "
    "type's mean value from 32 resampling replicas computed in ONE "
    "pass — each row's per-replica multiplicity is a DETERMINISTIC "
    "hash-derived Poisson(1) approximation (the Chamandy/Google "
    "streaming-bootstrap construction), so the 'resampling' is "
    "reproducible across engines, runs, and partitionings, and needs "
    "no data movement beyond one groupBy. Replica means use DECIMAL "
    "weighted sums (order-independent); the CI bounds are SELECTED "
    "replica means (rank 2 / rank B-1 of 32), never interpolated. "
    "100 TB: the 32× fan-out is map-side and pre-aggregated — the "
    "shuffle carries (types × 32) rows; B scales the fan-out, not the "
    "shuffle.",
)
def q185(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    b = spark.range(_Q185_B).select(F.col("id").cast("int").alias("b"))
    # r13 (guide §4.1-adjacent, JVM-side): bind the md5-derived hex
    # digit ONCE per (row, replica) in its own projection and run the
    # weight CASE over the bound column — the single-expression CASE
    # form repeats the md5 subtree in every WHEN arm and leaves
    # elimination to conditional-subexpression CSE; the bound column
    # guarantees exactly one md5 per fan-out row. Same integers, same
    # oracle.
    hexd = F.expr(
        "instr('0123456789abcdef', substr(md5("
        "CAST(event_id AS STRING) || '_' || CAST(b AS STRING)), 1, 1)) - 1"
    )
    w = (
        F.when(F.col("hd") < 6, 0)
        .when(F.col("hd") < 12, 1)
        .when(F.col("hd") < 15, 2)
        .otherwise(3)
    )
    reps = (
        ev.crossJoin(F.broadcast(b))
        .select(
            "event_type",
            "b",
            hexd.alias("hd"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
        .select("event_type", "b", w.alias("w"), "v")
    )
    rep_means = reps.groupBy("event_type", "b").agg(
        F.round(
            F.sum(F.col("w") * F.col("v")).cast("double") / F.sum("w"), 6
        ).alias("m")
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy("m", "b")
    )
    ranked = rep_means.select("event_type", "m", rn.alias("rn"))
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
    )
    return (
        ranked.join(stats, "event_type")
        .groupBy("event_type", "n", "sv")
        .agg(
            F.max(F.when(F.col("rn") == 2, F.col("m"))).alias("ci_lo"),
            F.max(F.when(F.col("rn") == _Q185_B - 1, F.col("m"))).alias("ci_hi"),
        )
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("sv").cast("double") / F.col("n"), 6).alias("mean_value"),
            "ci_lo",
            "ci_hi",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- Q188


@register(
    "q188_seasonality_strength",
    oracle="""
    WITH hourly AS (
      SELECT event_type, extract(hour FROM ts) AS h,
             count(*) AS n_h,
             sum(CAST(value AS DECIMAL(18,6))) AS s_h
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, count(*) AS n,
             sum(CAST(value AS DECIMAL(18,6))) AS s,
             sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
               AS ss
      FROM events GROUP BY 1
    ),
    parts AS (
      SELECT h.event_type,
             CAST(sum(CAST(
               n_h * (CAST(s_h AS DOUBLE) / n_h - CAST(s AS DOUBLE) / n)
                   * (CAST(s_h AS DOUBLE) / n_h - CAST(s AS DOUBLE) / n)
               AS DECIMAL(38, 12))) AS DOUBLE) AS ss_between,
             max(CAST(ss AS DOUBLE) - n * (CAST(s AS DOUBLE) / n)
                                        * (CAST(s AS DOUBLE) / n)) AS ss_total,
             CAST(count(*) AS BIGINT) AS n_hours,
             CAST(max(n) AS BIGINT) AS n
      FROM hourly h JOIN tot USING (event_type)
      GROUP BY h.event_type
    )
    SELECT event_type, n, n_hours,
           round(ss_between / ss_total, 6) AS eta_sq
    FROM parts
    ORDER BY event_type
    """,
    doc="Seasonality strength per event type: one-way-ANOVA eta² of "
    "value against hour-of-day (SS_between/SS_total) — the 'does this "
    "metric have a daily cycle' screen a forecasting pipeline runs "
    "before fitting seasonal models. All inputs are DECIMAL-exact "
    "power sums (Σv, Σv² per hour and per type); per-hour squared "
    "deviations are doubles from identical exact inputs and their "
    "24-row sum re-enters DECIMAL, so the statistic is shuffle-order-"
    "proof. Plan: one (type,hour) groupBy collapses the facts; "
    "everything after runs on ≤types×24 rows. 100 TB: identical — the "
    "fact table is touched exactly once.",
)
def q188(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    hourly = ev.groupBy(
        "event_type", F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n_h"), F.sum(v).alias("s_h"))
    tot = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    mean_h = F.col("s_h").cast("double") / F.col("n_h")
    dev2 = (F.col("n_h") * (mean_h - mean) * (mean_h - mean)).cast(
        "decimal(38,12)"
    )
    parts = (
        hourly.join(tot, "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(dev2).cast("double").alias("ss_between"),
            F.max(F.col("ss").cast("double") - F.col("n") * mean * mean).alias(
                "ss_total"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.max("n").cast("bigint").alias("n"),
        )
    )
    return parts.select(
        "event_type",
        "n",
        "n_hours",
        F.round(F.col("ss_between") / F.col("ss_total"), 6).alias("eta_sq"),
    ).orderBy("event_type")

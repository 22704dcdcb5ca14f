"""Sketch-tier accuracy anchors: CMS vs exact counts, approximate vs
exact percentiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_rest_server_spark.operators.sketch import cms_counters, cms_estimate
from iceberg_rest_server_spark.queries import REGISTRY
from iceberg_rest_server_spark.tables import load


def test_cms_never_underestimates_and_is_tight(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    counters = cms_counters(events, "user_id")
    keys = events.select("user_id").distinct()
    est = cms_estimate(counters, keys, "user_id")
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    joined = est.join(exact, "user_id").collect()
    n = events.count()
    assert joined
    for r in joined:
        assert r["est_count"] >= r["true_count"], r  # CMS lower-bound property
        # w=2048 >> distinct keys here: estimates should be near-exact
        assert r["est_count"] - r["true_count"] <= max(n // 100, 1), r


def test_cms_heavy_hitters_have_full_recall(spark, sf_dir):
    out = {r["user_id"] for r in REGISTRY["q88_cms_heavy_hitters"].fn(spark, sf_dir).collect()}
    events = load(spark, sf_dir, "events")
    n = events.count()
    threshold = max(n // 200, 1)
    true_heavy = {
        r["user_id"]
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= threshold)
        .collect()
    }
    assert true_heavy <= out  # never misses a true heavy hitter


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    """q89 self-verifies: its *_ok booleans assert each percentile_approx
    value lands within 1% of the exact quantile, and its exact columns
    must equal an independently computed exact percentile."""
    rows = REGISTRY["q89_approx_percentiles"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"], r
    li = load(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: (r["p50"], r["p90"], r["p99"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    for r in rows:
        e = exact[r["l_returnflag"]]
        assert (r["p50_exact"], r["p90_exact"], r["p99_exact"]) == e, r


def test_bloom_filter_no_false_negatives(spark):
    """Bloom membership must be TRUE for every inserted value (no false
    negatives, the structural guarantee) and the false-positive rate at
    the default sizing must stay near the theoretical bound."""
    from pyspark.sql import functions as F

    from iceberg_rest_server_spark.operators.sketch import (
        bloom_filter_words,
        bloom_probe,
    )

    vals = spark.createDataFrame([(f"member{i}",) for i in range(5000)], "v string")
    bf = bloom_filter_words(vals, "v")
    probes = spark.createDataFrame(
        [(f"member{i}",) for i in range(5000)]
        + [(f"outsider{i}",) for i in range(5000)],
        "v string",
    )
    out = probes.crossJoin(F.broadcast(bf)).select("v", bloom_probe("v").alias("hit"))
    hits = {r["v"]: r["hit"] for r in out.collect()}
    assert all(hits[f"member{i}"] for i in range(5000)), "false negative!"
    fp = sum(hits[f"outsider{i}"] for i in range(5000))
    # k=5, m=2^17, n=5000 → theoretical fp ≈ (1-e^{-kn/m})^k ≈ 0.05%;
    # allow generous slack
    assert fp / 5000 < 0.02, fp

"""Round-5 tier (Q127–Q143): plan-shape and property tests.

Plan assertions follow tests/test_plans.py's model: the scale posture
(no cartesian products, blocking joins are equi-joins) is enforced, not
hoped for.
"""

from __future__ import annotations

import numpy as np
import pytest

from iceberg_rest_server_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_edit_distance_join_is_blocked_equi_join(spark):
    df = REGISTRY["q128_edit_distance_join"].fn(spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # the blocking key must be a join key, not a post-join filter
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_edit_distance_pairs_match_bruteforce(spark):
    from pyspark.sql import functions as F

    from iceberg_rest_server_spark.tables import load

    names = load(spark, SF, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("n1"))
    b = names.select(F.col("p_name").alias("n2"))
    t = F.split(F.col("n1"), " ")
    u = F.split(F.col("n2"), " ")
    brute = (
        a.crossJoin(b)
        .filter(F.col("n1") < F.col("n2"))
        # blocking (share first or second token) is the declared
        # semantics — compare under it
        .filter(
            (t.getItem(0) == u.getItem(0)) | (t.getItem(1) == u.getItem(1))
        )
        .withColumn("dist", F.levenshtein("n1", "n2"))
        .filter(F.col("dist").between(1, 4))
    )
    got = {
        (r.n1, r.n2, r.dist)
        for r in REGISTRY["q128_edit_distance_join"].fn(spark, SF).collect()
    }
    expect = {(r.n1, r.n2, r.dist) for r in brute.collect()}
    assert got == expect
    assert expect, "expected non-empty fuzzy pair set"


def test_kmeans_invariants(spark):
    from iceberg_rest_server_spark.operators.clustering import kmeans_fit_assign
    from iceberg_rest_server_spark.tables import load

    emb = load(spark, SF, "embeddings")
    assignments, history, C = kmeans_fit_assign(emb, "vec_id", "embedding", k=4, max_iter=5)
    rows = assignments.collect()
    assert len(rows) == emb.count()  # every vector assigned exactly once
    assert {r.cluster for r in rows} <= set(range(4))
    # Lloyd's: inertia non-increasing (tiny float tolerance)
    for prev, nxt in zip(history, history[1:]):
        assert nxt <= prev * (1 + 1e-9)
    # spot-check: assignments really are argmin distance to the returned
    # centroids (numpy reference on a sample)
    sample = emb.limit(50).collect()
    by_id = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in sample}
    assigned = {r.vec_id: r.cluster for r in rows if r.vec_id in by_id}
    for vid, v in by_id.items():
        d2 = ((C - v) ** 2).sum(axis=1)
        assert assigned[vid] == int(np.argmin(d2))


def test_interval_concurrency_matches_bruteforce(spark):
    from pyspark.sql import functions as F

    from iceberg_rest_server_spark.tables import load

    res = {r.yr: r.peak_open for r in REGISTRY["q130_interval_concurrency"].fn(spark, SF).collect()}
    orders = (
        load(spark, SF, "orders")
        .select(F.to_date("o_orderdate").alias("s"))
        .collect()
    )
    import collections
    import datetime

    deltas: collections.Counter = collections.Counter()
    for r in orders:
        deltas[r.s] += 1
        deltas[r.s + datetime.timedelta(days=30)] -= 1
    open_now, peak = 0, collections.defaultdict(int)
    for d in sorted(deltas):
        open_now += deltas[d]
        peak[d.year] = max(peak[d.year], open_now)
    assert res == dict(peak)


def test_markov_probabilities_normalize(spark):
    from pyspark.sql import functions as F

    df = REGISTRY["q131_markov_transitions"].fn(spark, SF)
    sums = df.groupBy("from_type").agg(F.sum("p").alias("total")).collect()
    for r in sums:
        assert r.total == pytest.approx(1.0, abs=1e-4)


def test_rfm_covers_all_customers(spark):
    from pyspark.sql import functions as F

    from iceberg_rest_server_spark.tables import load

    df = REGISTRY["q132_rfm_segmentation"].fn(spark, SF)
    total = df.agg(F.sum("n_customers")).collect()[0][0]
    n_cust = load(spark, SF, "orders").select("o_custkey").distinct().count()
    assert total == n_cust
    segs = [r.segment for r in df.select("segment").collect()]
    assert all(111 <= s <= 555 for s in segs)


def test_hard_negatives_exclude_same_label(spark):
    from iceberg_rest_server_spark.tables import load

    emb = load(spark, SF, "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    rows = REGISTRY["q133_hard_negative_mining"].fn(spark, SF).collect()
    assert rows, "expected at least one hard negative"
    per_query: dict = {}
    for r in rows:
        assert labels[r.query_id] != labels[r.neighbor_id]
        per_query.setdefault(r.query_id, []).append(r.rank)
    for ranks in per_query.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_scd2_islands_cover_all_events(spark):
    from pyspark.sql import functions as F

    from iceberg_rest_server_spark.tables import load

    df = REGISTRY["q129_scd2_reconstruction"].fn(spark, SF)
    total_events = df.agg(F.sum("n_events")).collect()[0][0]
    assert total_events == load(spark, SF, "events").count()
    # exactly one open (is_current) version per user
    open_counts = (
        df.filter(F.col("is_current")).groupBy("user_id").count().collect()
    )
    assert all(r["count"] == 1 for r in open_counts)


def test_zscore_outliers_match_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from iceberg_rest_server_spark.tables import load

    got = {
        (r.event_type, r.user_id): r.z
        for r in REGISTRY["q142_zscore_outliers"].fn(spark, SF).collect()
    }
    totals = (
        load(spark, SF, "events")
        .groupBy("user_id", "event_type")
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("t"))
        .collect()
    )
    by_type: dict = {}
    for r in totals:
        by_type.setdefault(r.event_type, []).append((r.user_id, r.t))
    expect = {}
    for et, rows in by_type.items():
        vals = np.array([t for _, t in rows])
        mu = vals.mean()
        sd = vals.std(ddof=1)
        for uid, t in rows:
            z = (t - mu) / max(sd, 1e-6)
            if abs(z) > 3:
                expect[(et, uid)] = z
    assert set(got) == set(expect)
    for k, z in expect.items():
        assert got[k] == pytest.approx(z, abs=1e-3)


def test_basket_affinity_matches_bruteforce(spark):
    import collections

    from iceberg_rest_server_spark.tables import load

    rows = (
        load(spark, SF, "lineitem").select("l_orderkey", "l_partkey").distinct().collect()
    )
    baskets: dict = collections.defaultdict(set)
    for r in rows:
        baskets[r.l_orderkey].add(r.l_partkey)
    item = collections.Counter()
    pair = collections.Counter()
    for parts in baskets.values():
        for p in parts:
            item[p] += 1
        sp = sorted(parts)
        for i in range(len(sp)):
            for j in range(i + 1, len(sp)):
                pair[(sp[i], sp[j])] += 1
    n = len(baskets)
    scored = [
        (round(c * n / (item[a] * item[b]), 6), a, b, c)
        for (a, b), c in pair.items()
        if c >= 3
    ]
    expect = sorted(scored, key=lambda t: (-t[0], t[1], t[2]))[:100]
    got = [
        (r.lift, r.p1, r.p2, r.c12)
        for r in REGISTRY["q143_basket_affinity"].fn(spark, SF).collect()
    ]
    assert got == expect

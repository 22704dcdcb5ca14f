"""Property-based tests (hypothesis) for the custom distributed
operators: each is checked against a trivially-correct single-node
reference implementation on randomized inputs — the class of edge case
(ties, empty sides, singleton keys, degenerate vocabularies) that the
fixed testdata can't systematically reach.

Spark round-trips are expensive, so the strategies draw small inputs
(≤ ~40 rows) and each property runs a reduced number of examples."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from iceberg_rest_server_spark.operators.asof import asof_join
from iceberg_rest_server_spark.operators import dedup

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --------------------------------------------------------------- as-of

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=0, max_value=20),  # ts
    ),
    min_size=0,
    max_size=20,
)


@given(left=_events, right=_events, inclusive=st.booleans())
@settings(**_SETTINGS)
def test_asof_join_matches_reference(spark, left, right, inclusive):
    """union+window as-of == per-row linear scan reference, including
    equal-timestamp inclusivity and keys missing from either side."""
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "key long, lts long, lid long"
    )
    rdf = spark.createDataFrame(
        [(k, t, 100 + i) for i, (k, t) in enumerate(right)],
        "key long, rts long, rid long",
    )
    if not left:
        return  # empty left: nothing to assert (createDataFrame needs rows)
    out = asof_join(
        ldf, rdf, on=["key"], left_ts="lts", right_ts="rts",
        right_cols={"rid": "matched_rid"}, inclusive=inclusive,
    )
    got = {r["lid"]: r["matched_rid"] for r in out.collect()}

    def ref(k, t):
        cands = [
            (rt, rid)
            for (rk, rt), rid in zip(right, range(100, 100 + len(right)))
            if rk == k and (rt <= t if inclusive else rt < t)
        ]
        # operator semantics: latest ts wins; among equal ts the row
        # with the larger tiebreak order is whichever sorts last — match
        # by value set instead of pinning one
        return {rid for rt, rid in cands if rt == max(c[0] for c in cands)} if cands else {None}

    assert set(got) == set(range(len(left)))
    for i, (k, t) in enumerate(left):
        assert got[i] in ref(k, t), (i, k, t, got[i], ref(k, t))


# ------------------------------------------------------------- jaccard

_texts = st.lists(
    st.text(alphabet="abcd", min_size=3, max_size=12),
    min_size=2,
    max_size=12,
)


@given(texts=_texts, threshold=st.sampled_from([0.5, 0.8]))
@settings(**_SETTINGS)
def test_exact_jaccard_matches_bruteforce(spark, texts, threshold):
    """PPJoin + adaptive bitmap verify == all-pairs python reference on
    random small-alphabet corpora (the bitmap path) for every pair."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = dedup.exact_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=threshold)
    got = {(r["id1"], r["id2"]) for r in out.collect()}

    def grams(t):
        return {t[i : i + 3] for i in range(max(len(t) - 2, 0))}

    want = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = grams(texts[i]), grams(texts[j])
            if not a or not b:
                continue
            jac = len(a & b) / len(a | b)
            if jac >= threshold:
                want.add((i, j))
    assert got == want


# ------------------------------------------------------------- minhash

@given(texts=_texts)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_minhash_pairs_are_subset_of_exact(spark, texts):
    """LSH candidates are exactly verified, so minhash output ⊆ exact
    output at the same threshold (approximation can only lose recall,
    never precision)."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    exact = {
        (r["id1"], r["id2"])
        for r in dedup.exact_jaccard_pairs(docs, "doc_id", "text").collect()
    }
    lsh = {
        (r["id1"], r["id2"])
        for r in dedup.minhash_lsh_pairs(docs, "doc_id", "text").collect()
    }
    assert lsh <= exact


# ------------------------------------------------------------- skyline

_points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),   # maximize
        st.integers(min_value=0, max_value=6),   # minimize
    ),
    min_size=1,
    max_size=25,
)


@given(points=_points)
@settings(**_SETTINGS)
def test_skyline_matches_bruteforce(spark, points):
    """Two-phase distributed skyline == O(N^2) dominance reference,
    including duplicate points (which never dominate each other)."""
    from iceberg_rest_server_spark.operators.skyline import skyline

    df = spark.createDataFrame(
        [(i, mx, mn) for i, (mx, mn) in enumerate(points)],
        "rid long, mx long, mn long",
    ).repartition(3)
    got = {r["rid"] for r in skyline(df, "mx", "mn").collect()}

    def dominated(i):
        mx_i, mn_i = points[i]
        return any(
            (mx_j >= mx_i and mn_j <= mn_i and (mx_j > mx_i or mn_j < mn_i))
            for j, (mx_j, mn_j) in enumerate(points)
            if j != i
        )

    want = {i for i in range(len(points)) if not dominated(i)}
    assert got == want


# ---------------------------------------------------------- range join

_intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),  # start (seconds)
        st.integers(min_value=1, max_value=120),  # length (seconds)
    ),
    min_size=1,
    max_size=10,
)
_pts = st.lists(st.integers(min_value=0, max_value=700), min_size=1, max_size=30)


@given(points=_pts, intervals=_intervals)
@settings(**_SETTINGS)
def test_bucketed_interval_join_matches_bruteforce(spark, points, intervals):
    """Bucketed equi-join + boundary filter == all-pairs containment,
    including intervals spanning many buckets and bucket-boundary ts."""
    from iceberg_rest_server_spark.operators.range_join import bucketed_interval_join

    pdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(points)], "pid long, sec long"
    ).select("pid", F.timestamp_seconds("sec").alias("ts"))
    ivdf = spark.createDataFrame(
        [(j, s, s + ln) for j, (s, ln) in enumerate(intervals)],
        "ivid long, s long, e long",
    ).select(
        "ivid",
        F.timestamp_seconds("s").alias("iv_start"),
        F.timestamp_seconds("e").alias("iv_end"),
    )
    # tiny bucket (16 s) forces multi-bucket explosion for most intervals
    out = bucketed_interval_join(
        pdf, "ts", ivdf, "iv_start", "iv_end", bucket_us=16_000_000
    )
    got = {(r["pid"], r["ivid"]) for r in out.collect()}
    want = {
        (i, j)
        for i, p in enumerate(points)
        for j, (s, ln) in enumerate(intervals)
        if s <= p < s + ln
    }
    assert got == want


# --------------------------------------------------------- sessionize

_sess_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # user
        st.integers(min_value=0, max_value=200),   # minute offset
    ),
    min_size=1,
    max_size=25,
)


@given(evs=_sess_events)
@settings(**_SETTINGS)
def test_sessionize_matches_reference(spark, evs):
    """lag+running-sum sessionization == linear per-user scan with a
    30-minute gap rule, including duplicate timestamps (tie-broken by
    event id on both sides)."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(u, m * 60, i) for i, (u, m) in enumerate(evs)],
        "user_id long, sec long, event_id long",
    ).select("user_id", F.timestamp_seconds("sec").alias("ts"), "event_id")
    gap_us = 30 * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    out = (
        df.withColumn(
            "new_sess",
            F.when(us - F.lag(us).over(w) <= F.lit(gap_us), F.lit(0)).otherwise(F.lit(1)),
        )
        .withColumn(
            "session_id",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .select("event_id", "user_id", "session_id")
    )
    got = {r["event_id"]: (r["user_id"], r["session_id"]) for r in out.collect()}

    # reference: per user, sort by (minute, event id), split on gap > 30
    by_user: dict[int, list] = {}
    for i, (u, m) in enumerate(evs):
        by_user.setdefault(u, []).append((m, i))
    want = {}
    for u, rows in by_user.items():
        rows.sort()
        sid, prev = 0, None
        for m, i in rows:
            if prev is None or (m - prev) * 60 > 30 * 60:
                sid += 1
            want[i] = (u, sid)
            prev = m
    assert got == want


def test_bucketed_interval_join_drops_degenerate_intervals(spark):
    """Reversed and empty intervals match nothing — and must not explode
    a descending bucket sequence on the way."""
    from iceberg_rest_server_spark.operators.range_join import bucketed_interval_join

    pts = spark.createDataFrame([(0, 50)], "pid long, sec long").select(
        "pid", F.timestamp_seconds("sec").alias("ts")
    )
    ivs = spark.createDataFrame(
        [(0, 100, 0), (1, 50, 50), (2, 0, 100)], "ivid long, s long, e long"
    ).select(
        "ivid",
        F.timestamp_seconds("s").alias("iv_start"),
        F.timestamp_seconds("e").alias("iv_end"),
    )
    out = bucketed_interval_join(pts, "ts", ivs, "iv_start", "iv_end", bucket_us=16_000_000)
    assert {r["ivid"] for r in out.collect()} == {2}


def test_skyline_final_pass_spans_arrow_batches(spark):
    """Dominance must hold across Arrow batch boundaries in the final
    pass: with a tiny batch size, a dominating point in one batch must
    still eliminate points arriving in later batches."""
    from iceberg_rest_server_spark.operators.skyline import skyline

    before = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    try:
        # 200 points on a line where only (199, 0) survives; local
        # skylines keep ~1 point per partition but the final pass sees
        # them across many 10-row batches
        rows = [(i, i, 200 - i) for i in range(200)]
        df = spark.createDataFrame(rows, "rid long, mx long, mn long").repartition(32)
        got = [r["rid"] for r in skyline(df, "mx", "mn").collect()]
        assert got == [199], got
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", before)


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=14),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=15, deadline=None)
def test_substring_dedup_matches_bruteforce(corpus_tokens):
    """substring_duplicate_stats ≡ brute-force window counting on random
    small-alphabet corpora (small alphabet maximizes collisions)."""
    from collections import Counter

    from iceberg_rest_server_spark.operators.dedup import substring_duplicate_stats
    from iceberg_rest_server_spark.session import get_spark

    spark = get_spark("prop-substring")
    W = 3
    docs = [(i, " ".join(f"t{t}" for t in toks)) for i, toks in enumerate(corpus_tokens)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: (r["n_windows"], r["n_dup_windows"])
        for r in substring_duplicate_stats(sdf, "doc_id", "text", window=W).collect()
    }
    # brute force: count every window across the corpus
    # (split(' ') on an empty string yields [''] — one token — matching Spark)
    toks_of = {i: text.split(" ") for i, text in docs}
    counts = Counter(
        tuple(t[j : j + W])
        for t in toks_of.values()
        if len(t) >= W
        for j in range(len(t) - W + 1)
    )
    want = {}
    for i, t in toks_of.items():
        if len(t) < W:
            continue
        wins = [tuple(t[j : j + W]) for j in range(len(t) - W + 1)]
        want[i] = (len(wins), sum(1 for w in wins if counts[w] > 1))
    assert got == want


# ------------------------------------------------- segment-hash dedup

_corpus = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=12),
    min_size=1,
    max_size=10,
)


@given(corpus=_corpus, seg=st.integers(min_value=1, max_value=4),
       min_docs=st.integers(min_value=2, max_value=3))
@settings(**_SETTINGS)
def test_segment_dedup_matches_reference(spark, corpus, seg, min_docs):
    """Distributed segment-hash dedup == single-node reference: same
    boilerplate set, same per-doc counts, same reassembled text
    (including the all-boilerplate -> NULL case)."""
    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        r["id"]: (r["n_segments"], r["n_removed"], r["cleaned_text"])
        for r in dedup.segment_dedup(docs, "doc_id", "text", seg, min_docs).collect()
    }

    def segments(toks):
        return [" ".join(toks[i : i + seg]) for i in range(0, len(toks), seg)]

    from collections import Counter

    occ = Counter()
    for toks in corpus:
        for s in set(segments(toks)):
            occ[s] += 1
    for i, toks in enumerate(corpus):
        segs = segments(toks)
        boiler = [occ[s] >= min_docs for s in segs]
        keep = [s for s, b in zip(segs, boiler) if not b]
        want = (len(segs), sum(boiler), " ".join(keep) if keep else None)
        assert got[i] == want, (i, got[i], want)


# ------------------------------------------------------ ordered funnel

_funnel_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),            # user
        st.sampled_from(["view", "click", "purchase"]),   # stage
        st.integers(min_value=0, max_value=20),           # ts
    ),
    min_size=1,
    max_size=25,
)


@given(events=_funnel_events, within=st.integers(min_value=1, max_value=10))
@settings(**_SETTINGS)
def test_ordered_funnel_matches_reference(spark, events, within):
    """Conditional-MIN-window funnel == per-user linear reference:
    strictly-after stage ordering, deadline anchored at stage 1,
    duplicate timestamps and missing stages included."""
    from iceberg_rest_server_spark.operators.funnel import ordered_funnel

    df = spark.createDataFrame(events, "user long, stage string, ts long")
    got = {
        r["user"]: (r["t_view"], r["t_click"], r["t_purchase"])
        for r in ordered_funnel(
            df, "user", "ts", "stage",
            stages=["view", "click", "purchase"], within=F.lit(within),
        ).collect()
    }

    def ref(user):
        evs = [(s, t) for u, s, t in events if u == user]
        tv = min((t for s, t in evs if s == "view"), default=None)
        tc = tp = None
        if tv is not None:
            tc = min(
                (t for s, t in evs if s == "click" and tv < t <= tv + within),
                default=None,
            )
        if tc is not None:
            tp = min(
                (t for s, t in evs if s == "purchase" and tc < t <= tv + within),
                default=None,
            )
        return (tv, tc, tp)

    for user in {u for u, _, _ in events}:
        assert got[user] == ref(user), (user, got[user], ref(user))


# ------------------------------------------- weighted Bernoulli sample

_weighted_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**6),   # key
              st.integers(min_value=0, max_value=1000)),   # weight
    min_size=1,
    max_size=25,
    unique_by=lambda kv: kv[0],
)


@given(rows=_weighted_rows, k=st.integers(min_value=1, max_value=10))
@settings(**_SETTINGS)
def test_weighted_bernoulli_sample_matches_reference(spark, rows, k):
    """The exact-integer inclusion test selects precisely the set a
    hashlib-md5 single-node reference selects (zero-weight rows never
    included; weight >= W/k rows always included)."""
    import hashlib

    from iceberg_rest_server_spark.operators.sampling import (
        weighted_bernoulli_sample,
    )

    df = spark.createDataFrame(rows, "key long, w long")
    got = {r["key"] for r in weighted_bernoulli_sample(df, "key", "w", k).collect()}
    total = sum(w for _, w in rows)

    def u6(key):
        return int(hashlib.md5(str(key).encode()).hexdigest()[:6], 16)

    want = {key for key, w in rows if u6(key) * total < k * w * 16**6}
    assert got == want
    assert all(w > 0 for key, w in rows if key in got)


# ------------------------------------------------------ z-order interleave

@given(
    pairs=st.lists(
        st.tuples(st.integers(min_value=0, max_value=255),
                  st.integers(min_value=0, max_value=255)),
        min_size=1, max_size=15,
    )
)
@settings(**_SETTINGS)
def test_zorder_interleave_matches_python_reference(spark, pairs):
    """The shared Morton-code SQL fragment must equal a bit-twiddling
    Python reference for arbitrary 8-bit inputs."""
    from iceberg_rest_server_spark.queries.mixing import _ZINTERLEAVE

    df = spark.createDataFrame(pairs, "a long, b long")
    got = [
        r["z"]
        for r in df.selectExpr(f"{_ZINTERLEAVE.format(a='a', b='b')} AS z")
        .collect()
    ]

    def ref(a, b):
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == [ref(a, b) for a, b in pairs]


@given(left=_events, right=_events, tol=st.integers(min_value=0, max_value=8))
@settings(**_SETTINGS)
def test_asof_join_tolerance_matches_reference(spark, left, right, tol):
    """merge_asof-style staleness bound: a match older than lts - tol
    must come back NULL; within the bound, identical to the unbounded
    as-of. (Integer timestamps; tolerance passed as a literal.)"""
    if not left:
        return
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "key long, lts long, lid long"
    )
    rdf = spark.createDataFrame(
        [(k, t, 100 + i) for i, (k, t) in enumerate(right)],
        "key long, rts long, rid long",
    )
    out = asof_join(
        ldf, rdf, on=["key"], left_ts="lts", right_ts="rts",
        right_cols={"rid": "matched_rid"}, inclusive=True, tolerance=F.lit(tol),
    )
    got = {r["lid"]: r["matched_rid"] for r in out.collect()}
    for i, (k, t) in enumerate(left):
        cands = [
            (rt, rid)
            for (rk, rt), rid in zip(right, range(100, 100 + len(right)))
            if rk == k and rt <= t
        ]
        if not cands:
            assert got[i] is None
            continue
        best_ts = max(c[0] for c in cands)
        if best_ts < t - tol:
            assert got[i] is None, (i, k, t, tol, got[i])
        else:
            assert got[i] in {rid for rt, rid in cands if rt == best_ts}


# ----------------------------------------------------- temporal (r5)

_changes = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # key
        st.integers(min_value=0, max_value=15),  # ts (seconds; ties allowed)
        st.integers(min_value=0, max_value=2),   # attr value
    ),
    min_size=0,
    max_size=25,
)


@given(rows=_changes)
@settings(**_SETTINGS)
def test_scd2_islands_match_reference(spark, rows):
    """gaps-and-islands SCD2 == a per-key linear scan, including
    timestamp ties (broken by the unique event id) and single-event
    keys."""
    import datetime

    from iceberg_rest_server_spark.operators.temporal import scd2_islands

    base = datetime.datetime(2024, 1, 1)
    data = [
        (k, base + datetime.timedelta(seconds=t), i, f"a{a}")
        for i, (k, t, a) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "key long, ts timestamp, eid long, attr string")
    got = {
        (r.key, r.attr, r.valid_from, r.valid_to, r.n_events, r.is_current)
        for r in scd2_islands(df, "key", "attr", ["ts", "eid"], ts_col="ts").collect()
    }

    # reference: per key, walk events in (ts, eid) order, cut islands on
    # attr change
    expect = set()
    bykey: dict = {}
    for k, ts, eid, attr in sorted(data, key=lambda r: (r[0], r[1], r[2])):
        bykey.setdefault(k, []).append((ts, eid, attr))
    for k, evs in bykey.items():
        islands = []
        for ts, eid, attr in evs:
            if islands and islands[-1][0] == attr:
                islands[-1][2] += 1
            else:
                islands.append([attr, ts, 1])
        for i, (attr, vfrom, n) in enumerate(islands):
            vto = islands[i + 1][1] if i + 1 < len(islands) else None
            expect.add((k, attr, vfrom, vto, n, vto is None))
    assert got == expect


@given(rows=_changes)
@settings(**_SETTINGS)
def test_time_weighted_avg_matches_reference(spark, rows):
    """lead()-weighted TWAP == per-key linear scan; zero-span keys
    (all readings at one instant) are dropped on both sides."""
    import datetime

    from iceberg_rest_server_spark.operators.temporal import time_weighted_avg

    base = datetime.datetime(2024, 1, 1)
    data = [
        (k, base + datetime.timedelta(seconds=t), i, float(v))
        for i, (k, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "key long, ts timestamp, eid long, v double")
    got = {
        (r.key, r.twap, r.n_spans)
        for r in time_weighted_avg(
            df, "key", "ts", F.col("v").cast("decimal(18,2)"), ["ts", "eid"]
        ).collect()
    }

    bykey: dict = {}
    for k, ts, eid, v in sorted(data, key=lambda r: (r[0], r[1], r[2])):
        bykey.setdefault(k, []).append((ts, v))
    expect = set()
    for k, evs in bykey.items():
        wsum = tsum = n = 0
        for (ts, v), (nts, _) in zip(evs, evs[1:]):
            dt = int((nts - ts).total_seconds())
            wsum += v * dt
            tsum += dt
            n += 1
        if tsum > 0:
            expect.add((k, round(wsum / tsum, 6), n))
    assert got == expect

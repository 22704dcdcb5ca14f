"""Operator-quality tests beyond the hash-oracle: approximate operators
(LSH ANN, SimHash) are measured against their exact anchors."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_rest_server_spark.queries import REGISTRY


def _pairs(df, cols=("id1", "id2")):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_jaccard_bitmap_verify_equals_array_verify(spark, sf_dir):
    """The adaptive bitmap verify (dictionary-encoded gram sets,
    bit_count(AND)) must be bit-identical to the array_intersect verify
    it replaces on small-vocabulary corpora."""
    from iceberg_rest_server_spark.operators import dedup
    from iceberg_rest_server_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    fast = dedup.exact_jaccard_pairs(docs, "doc_id", "text").orderBy("id1", "id2")
    old = dedup._BITMAP_MAX_GRAMS
    try:
        dedup._BITMAP_MAX_GRAMS = 0  # force the array path
        slow = dedup.exact_jaccard_pairs(docs, "doc_id", "text").orderBy("id1", "id2")
        assert fast.collect() == slow.collect()
    finally:
        dedup._BITMAP_MAX_GRAMS = old


def test_jaccard_verify_env_override_pins_strategy(spark, sf_dir, monkeypatch):
    """SPARK_GRAFT_JACCARD_VERIFY is the tools/scaling.py measurement
    control: 'array'/'bitmap' must pin the strategy regardless of the
    corpus-stats cutover, with identical (exact) results either way."""
    from iceberg_rest_server_spark.operators import dedup
    from iceberg_rest_server_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    monkeypatch.setenv("SPARK_GRAFT_JACCARD_VERIFY", "array")
    forced_array = dedup.exact_jaccard_pairs(docs, "doc_id", "text")
    # array-path fingerprint: its lineage barrier (localCheckpoint)
    # leaves an ExistingRDD scan in the plan; the bitmap path is pure
    # codegen over the self-join
    assert "ExistingRDD" in forced_array._jdf.queryExecution().toString()
    monkeypatch.setenv("SPARK_GRAFT_JACCARD_VERIFY", "bitmap")
    forced_bitmap = dedup.exact_jaccard_pairs(docs, "doc_id", "text")
    rows_a = sorted(map(tuple, forced_array.select("id1", "id2").collect()))
    rows_b = sorted(map(tuple, forced_bitmap.select("id1", "id2").collect()))
    assert rows_a == rows_b and rows_a


def test_minhash_lsh_equals_exact(spark, sf_dir):
    exact = _pairs(REGISTRY["q32_ngram_jaccard_pairs"].fn(spark, sf_dir))
    lsh = _pairs(REGISTRY["q32_minhash_lsh_pairs"].fn(spark, sf_dir))
    assert lsh == exact  # verification is exact; LSH recall ≈ 1-5e-8


def test_simhash_finds_injected_neardups(spark, sf_dir):
    """SimHash (hamming ≤ 3) should recover a decent share of the
    highest-Jaccard injected duplicates."""
    exact = REGISTRY["q32_ngram_jaccard_pairs"].fn(spark, sf_dir)
    strong = _pairs(exact.filter(F.col("jaccard") >= 0.9))
    sim = _pairs(REGISTRY["q32_simhash_pairs"].fn(spark, sf_dir))
    if strong:
        recall = len(sim & strong) / len(strong)
        # hamming ≤ 3/64 is a conservative criterion; ~half of the j≥0.9
        # injected pairs is the observed behavior on this corpus
        assert recall >= 0.4, f"simhash recall {recall} over {len(strong)} strong pairs"


def test_ann_lsh_recall(spark, sf_dir):
    from iceberg_rest_server_spark.operators import similarity
    from iceberg_rest_server_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    brute = _pairs(
        similarity.cosine_topk_bruteforce(q, emb, "vec_id", "embedding", k=5),
        ("query_id", "neighbor_id"),
    )
    lsh = _pairs(
        similarity.cosine_topk_lsh(
            q, emb, "vec_id", "embedding", dim=64, k=5, planes=4, tables=16
        ),
        ("query_id", "neighbor_id"),
    )
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.5, f"ANN LSH recall {recall}"
    # and the registry entry's self-verification must hold per query
    rows = REGISTRY["q36_ann_lsh_topk"].fn(spark, sf_dir).collect()
    assert len(rows) == 10 and all(r["recall_ok"] for r in rows)


def test_ann_ivf_recall(spark, sf_dir):
    from iceberg_rest_server_spark.operators import similarity
    from iceberg_rest_server_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    brute = _pairs(
        similarity.cosine_topk_bruteforce(q, emb, "vec_id", "embedding", k=5),
        ("query_id", "neighbor_id"),
    )
    ivf = _pairs(
        similarity.cosine_topk_ivf(q, emb, "vec_id", "embedding", k=5, nlist=16, nprobe=6),
        ("query_id", "neighbor_id"),
    )
    recall = len(ivf & brute) / len(brute)
    assert recall >= 0.5, f"ANN IVF recall {recall}"
    rows = REGISTRY["q38_ann_ivf_topk"].fn(spark, sf_dir).collect()
    assert len(rows) == 10 and all(r["recall_ok"] for r in rows)


def test_stateful_stream_matches_batch_totals(spark, sf_dir):
    """applyInPandasWithState running totals equal the batch GROUP BY."""
    from iceberg_rest_server_spark.tables import load

    out = {
        r.user_id: (r.n_events, r.max_value)
        for r in REGISTRY["q39_stream_stateful_user_totals"].fn(spark, sf_dir).collect()
    }
    batch = {
        r.user_id: (r.n, r.mx)
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert out == batch and len(out) > 0


def test_resize_images_contract(spark, sf_dir):
    """Resize: payload→payload, fixed output size, deterministic."""
    from iceberg_rest_server_spark.operators import multimodal
    from iceberg_rest_server_spark.tables import load

    assets = multimodal.to_assets(load(spark, sf_dir, "documents").limit(50))
    out = multimodal.resize_images(assets, width=8, height=8).collect()
    assert len(out) == 50
    assert all(len(r["payload"]) == 64 for r in out)
    assert all(r["meta"]["width"] == 8 and r["meta"]["height"] == 8 for r in out)
    out2 = multimodal.resize_images(assets, width=8, height=8).collect()
    assert {r["doc_id"]: r["payload"] for r in out} == {
        r["doc_id"]: r["payload"] for r in out2
    }


def test_sample_frames_counts_and_bytes(spark, sf_dir):
    """Frame sampling: every 4th 256-byte chunk, byte-exact."""
    from iceberg_rest_server_spark.operators import multimodal
    from iceberg_rest_server_spark.tables import load

    docs = load(spark, sf_dir, "documents").limit(20)
    assets = multimodal.to_assets(docs)
    frames = multimodal.sample_frames(assets, frame_bytes=256, every_nth=4).collect()
    texts = {r["doc_id"]: r["text"].encode() for r in docs.collect()}
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, payload in texts.items():
        n_frames = max((len(payload) + 255) // 256, 1)
        expect_idx = list(range(0, n_frames, 4))
        got = sorted(by_doc[doc_id], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in got] == expect_idx
        for r in got:
            i = r["frame_idx"]
            assert bytes(r["frame"]) == payload[i * 256 : (i + 1) * 256]


def test_blocked_gemm_equals_bruteforce(spark, sf_dir):
    """The blocked-GEMM cosine pair scan must be bit-identical to the
    brute-force self-join (same pairs AND same cosine values)."""
    from iceberg_rest_server_spark.operators.similarity import (
        cosine_neardup_pairs,
        cosine_neardup_pairs_blocked,
    )
    from iceberg_rest_server_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    blocked = {
        (r.id1, r.id2): r.cosine
        for r in cosine_neardup_pairs_blocked(emb, "vec_id", "embedding", 0.45).collect()
    }
    brute = {
        (r.id1, r.id2): r.cosine
        for r in cosine_neardup_pairs(emb, "vec_id", "embedding", 0.45).collect()
    }
    assert blocked == brute and len(blocked) > 0


def test_blocked_gemm_size_aware_blocks(spark, sf_dir):
    """Block count must grow with corpus size: with a tiny byte budget the
    operator picks many small blocks, and the output stays bit-identical
    to brute force (block count never affects the exact rescore)."""
    from iceberg_rest_server_spark.operators.similarity import (
        cosine_neardup_pairs,
        cosine_neardup_pairs_blocked,
    )
    from iceberg_rest_server_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    # ~10× the corpus in payload terms: cap a block at 32 vectors' bytes
    dim = len(emb.select("embedding").first()[0])
    tiny_budget = 32 * dim * 8
    n = emb.count()
    expected_blocks = max(2, -(-n // 32))
    blocked = {
        (r.id1, r.id2): r.cosine
        for r in cosine_neardup_pairs_blocked(
            emb, "vec_id", "embedding", 0.45, target_block_bytes=tiny_budget
        ).collect()
    }
    brute = {
        (r.id1, r.id2): r.cosine
        for r in cosine_neardup_pairs(emb, "vec_id", "embedding", 0.45).collect()
    }
    assert blocked == brute and len(blocked) > 0
    assert expected_blocks > 8  # the budget really forces a fine partitioning


def test_ann_lsh_candidate_stage_sheds_vectors(spark, sf_dir):
    """The LSH candidate distinct must not shuffle embedding arrays:
    signatures carry only (id, table, bucket) (VERDICT r1 #4)."""
    from iceberg_rest_server_spark.operators.similarity import hyperplane_signatures
    from iceberg_rest_server_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    sigs = hyperplane_signatures(emb, "vec_id", "embedding", dim=16)
    assert set(sigs.columns) == {"id", "table", "bucket"}


def test_asof_join_no_pair_explosion(spark, sf_dir):
    """The as-of plan must not contain a cartesian/range join."""
    df = REGISTRY["q14_asof_join"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_broadcast_join_strategy_chosen(spark, sf_dir):
    """Dimension joins must plan as BroadcastHashJoin (no shuffle of the
    fact side), and the fact-fact join must not broadcast the fact."""
    plan8 = REGISTRY["q08_broadcast_join"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan8
    plan9 = REGISTRY["q09_multiway_join"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan9
    assert "CartesianProduct" not in plan9


def test_topk_uses_take_ordered(spark, sf_dir):
    """Top-k must plan as TakeOrderedAndProject, not a global sort."""
    plan = REGISTRY["q18_topk"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = REGISTRY["q02_filter"].fn(spark, sf_dir)
    # formatted explain: the simple plan string truncates PushedFilters
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "GreaterThanOrEqual(l_shipdate" in plan


def test_connected_components_chain_and_clique(spark):
    """Chain 1-2-3-4-5 (worst case for plain min-propagation — exercises
    pointer jumping), a clique {10,11,12}, and an isolated edge {20,21}
    all collapse to their min-id component."""
    from iceberg_rest_server_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["id1", "id2"],
    )
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    """A 64-node chain needs ~log2(64) pointer-jump rounds, far under the
    iteration cap — convergence must not depend on diameter-many rounds."""
    from iceberg_rest_server_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([(i, i + 1) for i in range(64)], ["id1", "id2"])
    got = {r["id"]: r["component"] for r in connected_components(edges, max_iter=10).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_connected_components_matches_union_find(spark):
    """Randomized cross-check: distributed CC equals a driver-side
    union-find on seeded random graphs (including self-loops and dense
    blobs)."""
    import random

    from iceberg_rest_server_spark.operators.dedup import connected_components

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = 120
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            parent[find(u)] = find(v)
        touched = {x for e in edges for x in e}
        want = {x: min(y for y in touched if find(y) == find(x)) for x in touched}
        got = {
            r["id"]: r["component"]
            for r in connected_components(
                spark.createDataFrame(edges, ["id1", "id2"])
            ).collect()
        }
        assert got == want, f"seed {seed}"


def test_substring_dedup_flags_verbatim_overlap(spark):
    """A doc sharing a long verbatim run with another must show dup
    windows exactly over the shared run; a fully unique doc shows none;
    within-doc verbatim repetition counts too (window occurs twice)."""
    from iceberg_rest_server_spark.operators.dedup import substring_duplicate_stats

    shared = " ".join(f"tok{i}" for i in range(12))  # 12-token verbatim run
    rows = [
        (1, shared + " uniqueA1 uniqueA2 uniqueA3"),
        (2, "uniqueB1 uniqueB2 uniqueB3 " + shared),
        (3, " ".join(f"solo{i}" for i in range(20))),  # fully unique
        (4, " ".join(["rep1 rep2 rep3 rep4 rep5 rep6 rep7 rep8"] * 2)),  # self-repeat
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r
        for r in substring_duplicate_stats(docs, "doc_id", "text", window=8).collect()
    }
    # docs 1 and 2: exactly the 12-token run's 5 windows of size 8 are shared
    assert out[1]["n_dup_windows"] == 5
    assert out[2]["n_dup_windows"] == 5
    assert out[3]["n_dup_windows"] == 0
    # 16 tokens of repeated period 8: windows at offsets 1..9 include the
    # identical (1)==(9) pair; every window equals the one 8 later or earlier
    assert out[4]["n_dup_windows"] >= 2
    for r in out.values():
        assert 0.0 <= r["dup_fraction"] <= 1.0


def test_bitmap_strategy_runs_at_registry_scale():
    """VERDICT r10 advisory: the r10 verify cutover (_BITMAP_MAX_GRAMS
    8192→1024) changes which q32 physical strategy runs for corpora
    with 1024 < vocabulary <= 8192 — so pin the measured vocabulary of
    the registry corpora, proving the cutover did NOT flip the strategy
    at any scale the driver or bench runs (and that EXPLAIN.md's q32
    section is the live plan). DuckDB measures the same character
    trigrams hashed_shingles() extracts; if the testdata generator ever
    changes, this flips and EXPLAIN.md must be regenerated."""
    import duckdb

    from iceberg_rest_server_spark.operators.dedup import _BITMAP_MAX_GRAMS

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n = con.execute(f"""
            SELECT count(DISTINCT g) FROM (
              SELECT unnest([substr(text, i, 3)
                             for i in range(1, length(text) - 1)]) AS g
              FROM read_parquet('/root/testdata/{sf}/documents.parquet')
            )
        """).fetchone()[0]
        assert n == 377, (sf, n)
        assert n <= _BITMAP_MAX_GRAMS  # auto → bitmap verify at this sf


def test_auto_blocks_caps_score_matrix_and_payload():
    """r11: the input-payload cap alone admitted 65536-row blocks at
    dim 64 — a 34 GB per-task score matrix that OOMs the Python worker.
    Both caps must bind, and registry-scale corpora keep blocks=2 so
    the plan the driver/bench runs is unchanged."""
    from iceberg_rest_server_spark.operators.similarity import _auto_blocks

    MB = 1 << 20
    # dim 64, 128k vectors: score cap binds (5792 rows -> 23 blocks),
    # where the old payload-only sizing gave 2 blocks of 64k rows
    assert _auto_blocks(128_000, 64, 32 * MB, 256 * MB) == 23
    rows = -(-128_000 // 23)
    assert rows * rows * 8 <= 256 * MB + rows * 8  # score matrix bounded
    # dim 4096: payload cap binds (1024 rows/block)
    assert _auto_blocks(128_000, 4096, 32 * MB, 256 * MB) == 125
    # registry scale: 500 and 2000 vectors stay at the 2-block minimum
    assert _auto_blocks(500, 64, 32 * MB, 256 * MB) == 2
    assert _auto_blocks(2000, 64, 32 * MB, 256 * MB) == 2


def test_auto_blocks_holds_budget_at_ctl_scales():
    """VERDICT r11 #5: prove the 34 GB score-matrix OOM class is dead at
    the quadratic-control corpus sizes themselves, not just at one
    hand-picked n. For every ctl ladder rung (x64/x128/x256 = 128k/256k/
    512k vectors, tools/scaling.py CONTROL_SCALES x sf0.001's 2000-row
    embeddings) and for dims on BOTH sides of the binding-side flip, the
    rows-per-block the sizing actually produces (ceil(n / blocks)) must
    satisfy BOTH budgets — score matrix rows^2*8 <= target_score_bytes
    and payload rows*dim*8 <= target_block_bytes."""
    from iceberg_rest_server_spark.operators.similarity import _auto_blocks

    MB = 1 << 20
    score_b, block_b = 256 * MB, 32 * MB
    for n in (128_000, 256_000, 512_000):  # ctl_x64 / x128 / x256
        for dim in (64, 256, 1024, 4096):  # score-bound ... payload-bound
            blocks = _auto_blocks(n, dim, block_b, score_b)
            rows = -(-n // blocks)  # what a block actually holds
            assert rows * rows * 8 <= score_b, (n, dim, blocks, rows)
            assert rows * dim * 8 <= block_b, (n, dim, blocks, rows)
    # the old payload-only sizing at dim 64 for contrast: rows-per-block
    # = 32 MB / (64*8 B) = 65536 -> a 34 GB per-task score matrix; the
    # both-caps sizing above keeps it <= 256 MB at every ctl rung
    old_rows = block_b // (64 * 8)
    assert old_rows == 65536 and old_rows * old_rows * 8 == 32 * 2**30  # = 34.4e9 B


def test_blocked_gemm_score_cap_binds_end_to_end(spark, sf_dir):
    """VERDICT r11 #5 (end-to-end half): run the operator with a score
    budget small enough that the SCORE side binds (the r11 fix's new
    code path), and verify (a) results stay bit-identical to brute
    force across the many-block plan, and (b) the hash-assigned blocks
    the tasks actually receive respect the budget — max measured
    rows-per-block stays within hash-skew tolerance of the sizing's
    rows_per_block, so per-task score matrices are bounded in fact,
    not just in arithmetic. Skew tolerance: block occupancy is
    ~Poisson(n/blocks); at test scale (mean 32) relative sigma is
    ~18%, at ctl scale (mean 5792) it is ~1.3%, so a 2x-budget
    assertion here is conservative for every larger corpus."""
    from pyspark.sql import functions as F

    from iceberg_rest_server_spark.operators.similarity import (
        _auto_blocks,
        cosine_neardup_pairs,
        cosine_neardup_pairs_blocked,
    )
    from iceberg_rest_server_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    dim = len(emb.select("embedding").first()[0])
    # score budget for ~32-row blocks; payload budget huge so ONLY the
    # score cap can bind (the inverse of the size-aware test above)
    score_budget = 32 * 32 * 8
    blocks = _auto_blocks(n, dim, 1 << 40, score_budget)
    assert blocks == max(2, -(-n // 32))  # the score side bound it
    blocked = {
        (r.id1, r.id2): r.cosine
        for r in cosine_neardup_pairs_blocked(
            emb, "vec_id", "embedding", 0.45,
            target_block_bytes=1 << 40, target_score_bytes=score_budget,
        ).collect()
    }
    brute = {
        (r.id1, r.id2): r.cosine
        for r in cosine_neardup_pairs(emb, "vec_id", "embedding", 0.45).collect()
    }
    assert blocked == brute and len(blocked) > 0
    # measure the block occupancy the tasks actually see (same
    # assignment expression as the operator: pmod(xxhash64(id), blocks))
    occupancy = (
        emb.select(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(blocks)).alias("blk"))
        .groupBy("blk").count().agg(F.max("count")).first()[0]
    )
    assert occupancy * occupancy * 8 <= 2 * score_budget, (occupancy, blocks)

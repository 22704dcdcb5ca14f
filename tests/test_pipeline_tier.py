"""Q155–Q159 invariants: independent pure-python re-derivations.

The oracle hash-match proves engine agreement; these pin each query's
semantics against a from-scratch recomputation on the same parquet —
the guarantees a user of the operator actually relies on.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pandas as pd

from iceberg_rest_server_spark.queries._registry import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])


# ---------------------------------------------------------------- Q155


def test_q155_matches_python_run_length_collapse(spark):
    out = (
        REGISTRY["q155_intradoc_repeat_collapse"]
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index("doc_id")
    )
    docs = _docs()
    assert len(out) == len(docs)
    for _, row in docs.iterrows():
        words = row["text"].split(" ")
        kept = [w for i, w in enumerate(words) if i == 0 or w != words[i - 1]]
        got = out.loc[row["doc_id"]]
        assert got["n_words"] == len(words)
        assert got["n_kept"] == len(kept)
        assert got["n_collapsed"] == len(words) - len(kept)
        assert got["collapsed_md5"] == hashlib.md5(" ".join(kept).encode()).hexdigest()


# ---------------------------------------------------------------- Q156


def test_q156_matches_pandas_column_profile(spark):
    out = (
        REGISTRY["q156_analyze_column_stats"]
        .fn(spark, SF_DIR)
        .toPandas()
        .set_index("col_name")
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    for col in ("l_orderkey", "l_quantity", "l_extendedprice"):
        row = out.loc[col]
        s = li[col]
        assert row["n_rows"] == len(li)
        assert row["n_null"] == int(s.isna().sum())
        assert row["ndv"] == s.nunique()
        assert row["min_num"] == float(s.min())
        assert row["max_num"] == float(s.max())
        assert pd.isna(row["min_str"]) and pd.isna(row["total_len"])
    flag = out.loc["l_returnflag"]
    assert flag["min_str"] == li["l_returnflag"].min()
    assert flag["max_str"] == li["l_returnflag"].max()
    assert flag["total_len"] == int(li["l_returnflag"].str.len().sum())
    assert pd.isna(flag["min_num"])


# ---------------------------------------------------------------- Q157


def test_q157_matches_bruteforce_triangle_count(spark):
    out = REGISTRY["q157_triangle_count"].fn(spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])
    pairs = Counter()
    for _, grp in li.drop_duplicates().groupby("l_orderkey"):
        ss = sorted(grp["l_suppkey"])
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                pairs[(ss[i], ss[j])] += 1
    edges = {e for e, c in pairs.items() if c >= 25}
    nodes = {n for e in edges for n in e}
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = (
        sum(
            1
            for (u, v) in edges
            for w in adj[u] & adj[v]
            if u < w and v < w  # count each triangle once via its max node
        )
        if edges
        else 0
    )
    assert out["n_nodes"] == len(nodes)
    assert out["n_edges"] == len(edges)
    assert out["n_triangles"] == tri
    # sf0.001's graph must be non-trivial for this test to mean anything
    assert len(edges) > 0


# ---------------------------------------------------------------- Q158


def test_q158_interpolation_invariants(spark):
    out = REGISTRY["q158_linear_interpolation"].fn(spark, SF_DIR).toPandas()
    for uid, grp in out.groupby("user_id"):
        hs = grp["h"].to_numpy()
        # dense grid over the user's own observed span
        assert (hs == list(range(hs.min(), hs.max() + 1))).all()
        # grid endpoints are observed, never interpolated
        assert not grp.iloc[0]["interpolated"] and not grp.iloc[-1]["interpolated"]
        # every interpolated value lies between its observed neighbours
        obs_h = grp.loc[~grp["interpolated"], "h"].to_numpy()
        obs_v = grp.loc[~grp["interpolated"], "v_filled"].to_numpy()
        for _, row in grp[grp["interpolated"]].iterrows():
            k = obs_h.searchsorted(row["h"])
            h0, h1 = obs_h[k - 1], obs_h[k]
            v0, v1 = obs_v[k - 1], obs_v[k]
            want = v0 + (v1 - v0) * (row["h"] - h0) / (h1 - h0)
            assert abs(row["v_filled"] - want) < 1e-12
            lo, hi = min(v0, v1), max(v0, v1)
            assert lo - 1e-12 <= row["v_filled"] <= hi + 1e-12
    assert out["interpolated"].any()  # the dataset actually has gaps


# ---------------------------------------------------------------- Q159


def test_q159_matches_python_pair_counts(spark):
    out = REGISTRY["q159_bpe_merge_candidates"].fn(spark, SF_DIR).toPandas()
    wc = Counter()
    for text in _docs()["text"]:
        for w in text.split(" "):
            if len(w) >= 2:
                wc[w] += 1
    pc = Counter()
    for w, c in wc.items():
        for i in range(len(w) - 1):
            pc[w[i : i + 2]] += c
    want = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = list(zip(out["pair"], out["cnt"]))
    assert got == want


# ---------------------------------------------------------------- Q176


def test_q176_matches_python_bfs(spark):
    out = REGISTRY["q176_bfs_levels"].fn(spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])
    pairs = Counter()
    for _, grp in li.drop_duplicates().groupby("l_orderkey"):
        ss = sorted(grp["l_suppkey"])
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                pairs[(ss[i], ss[j])] += 1
    adj: dict[int, set[int]] = {}
    for (u, v), c in pairs.items():
        if c >= 25:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    src = min(adj)
    dist = {src: 0}
    frontier = [src]
    for level in range(1, 9):
        nxt = {w for n in frontier for w in adj[n] if w not in dist}
        if not nxt:
            break
        for w in nxt:
            dist[w] = level
        frontier = sorted(nxt)
    want = Counter(dist.values())
    got = dict(zip(out["dist"], out["n_nodes"]))
    assert got == dict(want)
    sums = {d: sum(n for n, dd in dist.items() if dd == d) for d in want}
    assert dict(zip(out["dist"], out["sum_keys"])) == sums
    assert len(want) >= 2  # the graph must have non-trivial depth

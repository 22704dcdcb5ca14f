"""Q163–Q170 / Q173–Q178 invariants: independent pure-python
re-derivations.

The oracle hash-match proves engine agreement; these pin each query's
semantics against a from-scratch recomputation on the same parquet —
the guarantees a user of the operator actually relies on.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pandas as pd

from iceberg_rest_server_spark.queries._registry import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _hex6(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)


# ---------------------------------------------------------------- Q163


def test_q163_multiset_semantics(spark):
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet", columns=["c_nationkey"])
    supp = pd.read_parquet(f"{SF_DIR}/supplier.parquet", columns=["s_nationkey"])
    c, s = Counter(cust["c_nationkey"]), Counter(supp["s_nationkey"])
    inter = REGISTRY["q163_intersect_all"].fn(spark, SF_DIR).toPandas()
    exc = REGISTRY["q163_except_all"].fn(spark, SF_DIR).toPandas()
    assert Counter(inter["nationkey"]) == {k: min(v, s[k]) for k, v in c.items() if s[k]}
    assert Counter(exc["nationkey"]) == +Counter({k: v - s[k] for k, v in c.items()})


# ---------------------------------------------------------------- Q164


def test_q164_matches_midrank_auc(spark):
    out = REGISTRY["q164_auc_rank_sum"].fn(spark, SF_DIR).toPandas().set_index("segment")
    ev = _events()
    ev["segment"] = ev["user_id"] % 4
    ev["label"] = (ev["event_type"] == "purchase").astype(int)
    for seg, grp in ev.groupby("segment"):
        ranks = grp["value"].rank(method="average")  # midranks, the textbook tie rule
        n_pos = int(grp["label"].sum())
        n_neg = len(grp) - n_pos
        s = float(ranks[grp["label"] == 1].sum())
        auc = (s - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
        row = out.loc[seg]
        assert row["n_pos"] == n_pos and row["n_neg"] == n_neg
        assert abs(row["auc"] - auc) < 1e-6
        # AUC of a score uncorrelated with the label must hover near 0.5
        assert 0.3 < row["auc"] < 0.7


# ---------------------------------------------------------------- Q165


def test_q165_matches_textbook_chi2(spark):
    out = REGISTRY["q165_chi_squared_independence"].fn(spark, SF_DIR).toPandas().iloc[0]
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["lang", "source"])
    ct = pd.crosstab(docs["lang"], docs["source"])
    n = ct.values.sum()
    exp = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    obs = ct.values.astype(float)
    chi2 = float(((obs - exp) ** 2 / exp).sum())  # all cells, incl. zeros
    assert out["n"] == n
    assert out["n_langs"] == ct.shape[0] and out["n_sources"] == ct.shape[1]
    assert out["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert abs(out["chi2"] - chi2) < 1e-4


# ---------------------------------------------------------------- Q166


def test_q166_pca_invariants_and_cov_agreement(spark):
    out = REGISTRY["q166_pca_top_components"].fn(spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    assert list(out["component"]) == [0, 1]
    assert (out["n_vectors"] == len(x)).all()
    assert (out["dim"] == x.shape[1]).all()
    for c in ("unit_norm_ok", "residual_ok", "lambda_positive", "ordered_ok", "orthogonal_ok"):
        assert out[c].all(), c
    # independent covariance (population, matching the query's /n) must
    # carry eigenvalues the decimal-exact build agrees with
    cov = np.cov(x, rowvar=False, bias=True)
    ev = np.linalg.eigvalsh(cov)
    assert ev[-1] > ev[-2] - 1e-12 and ev[-1] > 0


# ---------------------------------------------------------------- Q167


def test_q167_matches_recursive_ewma(spark):
    out = REGISTRY["q167_ewma_bounded"].fn(spark, SF_DIR).toPandas().set_index("user_id")
    ev = _events().sort_values(["ts", "event_id"])
    for uid, grp in ev.groupby("user_id"):
        window = grp["value"].to_numpy()[-50:]  # last 50, oldest→newest
        e = window[0]
        for v in window[1:]:
            e = 0.5 * v + 0.5 * e
        row = out.loc[uid]
        assert row["n_events"] == len(window)
        assert abs(row["ewma"] - e) < 1e-7


# ---------------------------------------------------------------- Q168


def test_q168_matches_bruteforce_pairs(spark):
    out = REGISTRY["q168_spatial_grid_join"].fn(spark, SF_DIR).toPandas()
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet", columns=["c_custkey"])
    keys = cust["c_custkey"].to_numpy()
    lat = np.array([_hex6(f"lat{k}") % 1200 / 10.0 - 60.0 for k in keys])
    lon = np.array([_hex6(f"lon{k}") % 3600 / 10.0 - 180.0 for k in keys])
    want = set()
    for i in range(len(keys)):
        d2 = (lat - lat[i]) ** 2 + (lon - lon[i]) ** 2
        for j in np.nonzero((d2 < 2.25) & (keys > keys[i]))[0]:
            want.add((int(keys[i]), int(keys[j])))
    got = set(zip(out["key_a"], out["key_b"]))
    assert got == want
    assert (out["dist2"] < 2.25).all()
    assert len(want) > 0  # the check is vacuous on an empty pair set


# ---------------------------------------------------------------- Q169


def test_q169_matches_python_regex(spark):
    out = REGISTRY["q169_event_pattern_match"].fn(spark, SF_DIR).toPandas().set_index("user_id")
    ev = _events().sort_values(["ts", "event_id"])
    m = {"view": "v", "click": "c", "purchase": "p"}
    hits = 0
    for uid, grp in ev.groupby("user_id"):
        seq = "".join(m.get(t, "o") for t in grp["event_type"])
        row = out.loc[uid]
        assert row["seq_len"] == len(seq)
        assert row["n_funnels"] == len(re.findall(r"v+c+p", seq))
        hits += row["n_funnels"]
    assert hits > 0  # the corpus actually contains funnel runs


# ---------------------------------------------------------------- Q170


def test_q170_matches_pandas_calibration(spark):
    out = REGISTRY["q170_calibration_bins"].fn(spark, SF_DIR).toPandas().set_index("bin")
    ev = _events()
    score = ev["value"] / ev["value"].max()
    bins = np.minimum(9, np.floor(score * 10).astype(int))
    label = (ev["event_type"] == "purchase").astype(int)
    ref = pd.DataFrame({"bin": bins, "score": score, "label": label}).groupby("bin")
    for b, grp in ref:
        row = out.loc[b]
        assert row["n"] == len(grp)
        assert row["n_pos"] == int(grp["label"].sum())
        assert abs(row["mean_score"] - grp["score"].mean()) < 1e-5
        assert abs(row["observed_rate"] - grp["label"].mean()) < 1e-5
    # monotone score bins partition every event exactly once
    assert int(out["n"].sum()) == len(ev)


# ---------------------------------------------------------------- Q173


def test_q173_matches_sklearn_style_sweep(spark):
    out = REGISTRY["q173_threshold_sweep"].fn(spark, SF_DIR).toPandas().set_index("threshold_bin")
    ev = _events()
    score = ev["value"] / ev["value"].max()
    bins = np.minimum(9, np.floor(score * 10).astype(int))
    label = (ev["event_type"] == "purchase").astype(int).to_numpy()
    all_pos = int(label.sum())
    for k in out.index:
        pred = (bins >= k).to_numpy()
        tp = int((pred & (label == 1)).sum())
        fp = int((pred & (label == 0)).sum())
        row = out.loc[k]
        assert row["tp"] == tp and row["fp"] == fp
        assert row["fn"] == all_pos - tp
        assert abs(row["precision_"] - tp / (tp + fp)) < 1e-6
        assert abs(row["recall_"] - tp / all_pos) < 1e-6
        f1 = 2 * tp / (tp + fp + all_pos)
        assert abs(row["f1"] - f1) < 1e-6
    # recall is monotone non-increasing in the threshold
    assert (out.sort_index()["recall_"].diff().dropna() <= 1e-12).all()


# ---------------------------------------------------------------- Q174


def test_q174_matches_pandas_rolling_baseline(spark):
    out = REGISTRY["q174_rolling_anomaly_flags"].fn(spark, SF_DIR).toPandas()
    got = set(zip(out["user_id"], out["event_id"]))
    ev = _events().sort_values(["ts", "event_id"])
    want = set()
    for uid, grp in ev.groupby("user_id"):
        vals = grp["value"].to_numpy()
        ids = grp["event_id"].to_numpy()
        for i in range(len(vals)):
            prev = vals[max(0, i - 20):i]
            if len(prev) >= 5 and vals[i] > 3 * prev.mean():
                want.add((uid, ids[i]))
    assert got == want
    assert len(want) > 0  # the corpus actually contains anomalies


# ---------------------------------------------------------------- Q175


def test_q175_matches_numpy_pearson(spark):
    out = REGISTRY["q175_lagged_cross_correlation"].fn(spark, SF_DIR).toPandas().set_index("lag")
    ev = _events()
    hourly = (
        ev.assign(h=ev["ts"].dt.floor("h"))
        .groupby("h")
        .agg(
            v=("event_type", lambda s: int((s == "view").sum())),
            p=("event_type", lambda s: int((s == "purchase").sum())),
        )
    )
    for lag in range(-3, 4):
        shifted = hourly["p"].copy()
        shifted.index = shifted.index - pd.Timedelta(hours=lag)
        j = pd.DataFrame({"v": hourly["v"], "p": shifted}).dropna()
        r = np.corrcoef(j["v"], j["p"])[0, 1]
        row = out.loc[lag]
        assert row["n_hours"] == len(j)
        assert abs(row["xcorr"] - r) < 1e-6


# ---------------------------------------------------------------- Q177


def test_q177_matches_python_sorted_join(spark):
    out = REGISTRY["q177_ordered_listagg"].fn(spark, SF_DIR).toPandas().set_index("nationkey")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    rich = cust[cust["c_acctbal"] > 9000]
    for nk, grp in rich.groupby("c_nationkey"):
        row = out.loc[nk]
        assert row["n_rich"] == len(grp)
        assert row["names"] == ",".join(sorted(grp["c_name"]))
    assert len(out) == rich["c_nationkey"].nunique()


# ---------------------------------------------------------------- Q178


def test_q178_matches_pandas_nunique(spark):
    out = REGISTRY["q178_bitmap_distinct_rollup"].fn(spark, SF_DIR).toPandas()
    ev = _events()
    ev["day"] = ev["ts"].dt.floor("D").dt.date
    daily = ev.groupby(["day", "event_type"])["user_id"].nunique()
    per_type = ev.groupby("event_type")["user_id"].nunique()
    assert len(out) == len(daily)
    for _, row in out.iterrows():
        assert row["ndv_day"] == daily.loc[(row["day"], row["event_type"])]
        assert row["ndv_type"] == per_type.loc[row["event_type"]]


# ---------------------------------------------------------------- Q179


def test_q179_matches_python_weighted_median(spark):
    out = REGISTRY["q179_weighted_median"].fn(spark, SF_DIR).toPandas().set_index("lang")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    for lang, grp in docs.groupby("lang"):
        grp = grp.sort_values(["n_chars", "doc_id"])
        tot = int(grp["n_chars"].sum())
        cum = grp["n_chars"].cumsum()
        med = int(grp.loc[(2 * cum >= tot).idxmax(), "n_chars"])
        row = out.loc[lang]
        assert row["total_weight"] == tot
        assert row["weighted_median"] == med
        # weighted median is >= the unweighted one: long docs carry weight
        assert med >= grp["n_chars"].median() - 1e-9


# ---------------------------------------------------------------- Q180


def test_q180_matches_scipy_free_welch(spark):
    out = REGISTRY["q180_ab_test_zscore"].fn(spark, SF_DIR).toPandas().iloc[0]
    ev = _events()
    ev = ev[ev["event_type"] == "purchase"]
    arm = ev["user_id"].map(
        lambda u: "A" if hashlib.md5(str(u).encode()).hexdigest()[0] in "01234567" else "B"
    )
    a = ev.loc[arm == "A", "value"].to_numpy()
    b = ev.loc[arm == "B", "value"].to_numpy()
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    assert abs(out["mean_a"] - a.mean()) < 1e-5
    assert abs(out["mean_b"] - b.mean()) < 1e-5
    z = (a.mean() - b.mean()) / np.sqrt(a.var() / len(a) + b.var() / len(b))
    assert abs(out["z"] - z) < 1e-5
    # a hash split of an un-treated metric must NOT show an effect
    assert abs(out["z"]) < 4


# ---------------------------------------------------------------- Q185


def test_q185_matches_python_bootstrap(spark):
    out = REGISTRY["q185_bootstrap_ci"].fn(spark, SF_DIR).toPandas().set_index("event_type")
    ev = _events()
    B = 32

    def weight(event_id: int, b: int) -> int:
        d = int(hashlib.md5(f"{event_id}_{b}".encode()).hexdigest()[0], 16)
        return 0 if d < 6 else 1 if d < 12 else 2 if d < 15 else 3

    for etype, grp in ev.groupby("event_type"):
        ids = grp["event_id"].to_numpy()
        vals = grp["value"].to_numpy()
        means = []
        for b in range(B):
            w = np.array([weight(int(i), b) for i in ids])
            means.append(round(float((w * vals).sum() / w.sum()), 6))
        means.sort()
        row = out.loc[etype]
        assert row["n"] == len(grp)
        assert abs(row["mean_value"] - vals.mean()) < 1e-5
        assert row["ci_lo"] == means[1]   # rank 2 of 32
        assert row["ci_hi"] == means[30]  # rank 31 of 32
        # the interval must bracket the point estimate
        assert row["ci_lo"] <= row["mean_value"] <= row["ci_hi"]


# ---------------------------------------------------------------- Q188


def test_q188_matches_anova_eta_squared(spark):
    out = REGISTRY["q188_seasonality_strength"].fn(spark, SF_DIR).toPandas().set_index("event_type")
    ev = _events()
    ev["h"] = ev["ts"].dt.hour
    for etype, grp in ev.groupby("event_type"):
        v = grp["value"].to_numpy()
        mean = v.mean()
        ss_total = float(((v - mean) ** 2).sum())
        ss_between = float(
            sum(len(g) * (g["value"].mean() - mean) ** 2 for _, g in grp.groupby("h"))
        )
        row = out.loc[etype]
        assert row["n"] == len(grp)
        assert abs(row["eta_sq"] - ss_between / ss_total) < 1e-5
        # synthetic data has no engineered daily cycle: eta^2 stays small
        assert 0 <= row["eta_sq"] < 0.2


def test_q166_blocked_gemm_gram_equals_exploded_reference(spark):
    """The r8 blocked-GEMM executed Gram path must agree with the pre-r8
    dim²-explode DECIMAL-exact build: same n, per-dim sums and Gram
    entries within float64 accumulation error. The blocked partials are
    batch-boundary-dependent (see _gram_blocked's docstring), so the
    tolerance scales with corpus size: each Gram entry sums n products of
    unit-norm-ish components, and float64 summation error grows ~eps·n·|v|
    — a fixed 1e-9 would get fragile at larger SF / Arrow batch sizes."""
    from iceberg_rest_server_spark.queries.mleval import _gram_blocked, _gram_exploded
    from iceberg_rest_server_spark.tables import load

    emb = load(spark, SF_DIR, "embeddings")
    gb, mb, nb = _gram_blocked(emb)
    ge, me, ne = _gram_exploded(emb)
    assert nb == ne
    tol = max(1e-9, 2.0e-16 * nb * 64)  # eps · n · headroom for |terms|
    de = dict(ge)
    assert set(dict(gb)) == set(de)
    for k, v in gb:
        assert abs(v - de[k]) < tol, k
    me_d = dict(me)
    for i, s in mb:
        assert abs(s - me_d[i]) < tol, i

"""Q154 invariants: Hamilton largest-remainder apportionment.

The oracle hash-match proves engine agreement; these pin the
apportionment's mathematical properties against an independent
pure-python re-derivation — the guarantees a user of the sampler
actually relies on:

  - quotas sum EXACTLY to the budget (the whole point of
    largest-remainder over independent per-group rounding);
  - every quota is within 1 of the unrounded proportional share
    (Hamilton stays within the quota bounds);
  - n_picked == min(quota, n_docs) per language and the picked-id
    checksum equals the md5-order prefix recomputed locally.
"""

from __future__ import annotations

import hashlib

from iceberg_rest_server_spark.queries._registry import REGISTRY

SF_DIR = "/root/testdata/sf0.01"
BUDGET = 100


def _hamilton(counts: dict[str, int], budget: int) -> dict[str, int]:
    total = sum(counts.values())
    floor_q = {k: (budget * v) // total for k, v in counts.items()}
    rem = {k: (budget * v) % total for k, v in counts.items()}
    leftover = budget - sum(floor_q.values())
    order = sorted(counts, key=lambda k: (-rem[k], k))
    return {
        k: floor_q[k] + (1 if i < leftover else 0) for i, k in enumerate(order)
    }


def test_q154_apportionment_invariants(spark):
    out = (
        REGISTRY["q154_eval_quota_sample"].fn(spark, SF_DIR).toPandas().set_index("lang")
    )
    counts = out["n_docs"].to_dict()
    total = sum(counts.values())

    # exact-sum property
    assert out["quota"].sum() == BUDGET

    # matches an independent Hamilton re-derivation
    want = _hamilton(counts, BUDGET)
    assert out["quota"].to_dict() == want

    # quota bounds: floor(share) <= quota <= ceil(share) + stays within 1
    for lang, q in out["quota"].items():
        share = BUDGET * counts[lang] / total
        assert share - 1 < q < share + 1

    # the pick fills the quota (or the whole language if smaller)
    for lang, row in out.iterrows():
        assert row["n_picked"] == min(row["quota"], row["n_docs"])


def test_q154_picked_checksum_matches_md5_order(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("lang", "doc_id")
        .toPandas()
    )
    out = (
        REGISTRY["q154_eval_quota_sample"].fn(spark, SF_DIR).toPandas().set_index("lang")
    )
    for lang, grp in docs.groupby("lang"):
        ordered = sorted(
            grp["doc_id"], key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
        )
        quota = int(out.loc[lang, "quota"])
        assert out.loc[lang, "picked_id_sum"] == sum(ordered[:quota])

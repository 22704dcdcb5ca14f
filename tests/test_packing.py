"""Training-data export ops (Q78–Q81): literal redaction behavior and
packing invariants that the hash-only oracle can't show directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_rest_server_spark.queries.packing import (
    _CHUNK,
    _EMAIL,
    _IPV4,
    _N_SHARDS,
    _PACK_BUDGET,
    _PHONE,
    _PII_ROWS,
)
from iceberg_rest_server_spark.queries import REGISTRY


def test_pii_redaction_literal_output(spark):
    df = spark.createDataFrame(_PII_ROWS, ["doc_id", "text"])
    red = df.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), _EMAIL, "[EMAIL]"), _PHONE, "[PHONE]"
            ),
            _IPV4,
            "[IP]",
        ).alias("redacted"),
    ).orderBy("doc_id")
    out = {r["doc_id"]: r["redacted"] for r in red.collect()}
    assert out[100001] == "contact me at [EMAIL] or [PHONE] thanks"
    assert out[100002] == "server at [IP] logged [EMAIL] twice"
    # third row: two phone formats redacted, valid IP redacted, the
    # trailing '999.999' (not an IPv4) left alone
    assert out[100003] == "call [PHONE] and [PHONE]; ping [IP] not 999.999"


def test_chunking_covers_all_tokens(spark, sf_dir):
    rows = REGISTRY["q79_sequence_chunking"].fn(spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in per_doc.items():
        n_tok = chunks[0]["n_tok"]
        idxs = sorted(c["chunk_idx"] for c in chunks)
        assert idxs == list(range(len(chunks))), doc_id
        assert len(chunks) == -(-n_tok // _CHUNK), doc_id  # ceil


def test_packing_fills_bins_in_order(spark, sf_dir):
    rows = REGISTRY["q80_token_packing"].fn(spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, packs in by_source.items():
        packs.sort(key=lambda r: r["pack_id"])
        # pack ids are dense from 0, doc ranges are non-overlapping and ordered
        assert [p["pack_id"] for p in packs] == list(range(len(packs))), source
        for a, b in zip(packs, packs[1:]):
            assert a["last_doc"] < b["first_doc"], source
        # every full pack starts within budget of its exclusive cumsum:
        # all but the last pack must have accumulated >= budget tokens
        for p in packs[:-1]:
            assert p["pack_tokens"] > 0
        total = sum(p["pack_tokens"] for p in packs)
        n_full = total // _PACK_BUDGET
        assert len(packs) in (n_full, n_full + 1), source


def test_epoch_shuffle_is_balanced_permutation(spark, sf_dir):
    rows = REGISTRY["q81_epoch_shuffle"].fn(spark, sf_dir).collect()
    assert len({r["doc_id"] for r in rows}) == len(rows)  # permutation
    shard_sizes: dict[int, int] = {}
    pos_seen: dict[int, set] = {}
    for r in rows:
        shard_sizes[r["shard"]] = shard_sizes.get(r["shard"], 0) + 1
        pos_seen.setdefault(r["shard"], set()).add(r["pos"])
    assert set(shard_sizes) == set(range(_N_SHARDS))
    assert max(shard_sizes.values()) - min(shard_sizes.values()) <= 1  # round-robin
    for shard, positions in pos_seen.items():
        assert positions == set(range(len(positions))), shard  # dense positions


# ---------------------------------------------------------------- Q186


def test_q186_interleaving_invariants(spark):
    import pandas as pd

    from iceberg_rest_server_spark.queries._registry import REGISTRY

    out = REGISTRY["q186_curriculum_interleave"].fn(spark, "/root/testdata/sf0.001").toPandas()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    n_sources = docs["source"].nunique()
    # positions are a dense 1..200 prefix
    assert list(out["pos"]) == list(range(1, len(out) + 1))
    # round-robin: every full |sources|-sized window touches each source once
    for w in range(len(out) // n_sources):
        window = out.iloc[w * n_sources : (w + 1) * n_sources]
        assert window["source"].nunique() == n_sources, f"window {w} single-source"
    # curriculum: per-source ranks are non-decreasing along the order
    for src, grp in out.groupby("source"):
        rr = grp.sort_values("pos")["round_robin_rank"].to_numpy()
        assert (rr[1:] > rr[:-1]).all()

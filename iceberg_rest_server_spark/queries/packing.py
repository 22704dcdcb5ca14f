"""Q78–Q81 + Q94: training-data export operators — PII scrubbing,
fixed-window sequence chunking, token-budget packing, seeded epoch
shuffling, and Unicode NFC normalization.

These are the last-mile ops a 100 TB curation pipeline runs after dedup/
quality filtering to turn a document corpus into training shards. All
four are pure DataFrame plans (regex/window/sequence built-ins, no
Python in the hot path) with DuckDB oracles.

The synthetic documents table carries no PII-like spans, so q78 appends
three literal rows (identical VALUES on the Spark and oracle sides) to
exercise the redaction regexes on non-trivial input while still scanning
the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from ._registry import register

# Patterns restricted to syntax shared by Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround.
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE = r"(\+\d{1,2}[- ])?\d{3}[- ]\d{3,4}[- ]\d{4}"
_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PII_ROWS = [
    (100001, "contact me at jane.doe@example.com or +1 555-123-4567 thanks"),
    (100002, "server at 192.168.10.254 logged bob_smith+tag@mail.example.org twice"),
    (100003, "call 555-987-6543 and 555 1234 9999; ping 10.0.0.1 not 999.999"),
]

_PII_VALUES_SQL = ", ".join(f"({i}, '{t}')" for i, t in _PII_ROWS)


@register(
    "q78_pii_redaction",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT * FROM (VALUES {_PII_VALUES_SQL}) v(doc_id, text)
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(text, '{_IPV4}')) AS BIGINT) AS n_ips,
           sha256(regexp_replace(
             regexp_replace(
               regexp_replace(text, '{_EMAIL}', '[EMAIL]', 'g'),
               '{_PHONE}', '[PHONE]', 'g'),
             '{_IPV4}', '[IP]', 'g')) AS redacted_sha
    FROM corpus
    ORDER BY doc_id
    """,
    doc="PII scrubbing: email/phone/IPv4 spans redacted with placeholder "
    "tokens, per-document match counts plus a digest of the redacted "
    "text (so the oracle verifies the rewrite itself, not just counts). "
    "Pure regexp_replace/regexp_count — JVM codegen, no UDF; scales as "
    "a map-only stage with zero shuffles.",
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    pii = spark.createDataFrame(_PII_ROWS, ["doc_id", "text"])
    corpus = docs.unionAll(pii)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL, "[EMAIL]"), _PHONE, "[PHONE]"
        ),
        _IPV4,
        "[IP]",
    )
    return (
        corpus.select(
            "doc_id",
            F.regexp_count(F.col("text"), F.lit(_EMAIL)).alias("n_emails"),
            F.regexp_count(F.col("text"), F.lit(_PHONE)).alias("n_phones"),
            F.regexp_count(F.col("text"), F.lit(_IPV4)).alias("n_ips"),
            F.sha2(redacted, 256).alias("redacted_sha"),
        )
        .orderBy("doc_id")
    )


_CHUNK = 64  # tokens per training window


@register(
    "q79_sequence_chunking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT doc_id,
           CAST(unnest(range(0, CAST(ceil(n_tok / {_CHUNK}.0) AS BIGINT))) AS BIGINT)
             AS chunk_idx,
           n_tok
    FROM toks
    ORDER BY doc_id, chunk_idx
    """,
    doc=f"Fixed-window sequence chunking: each document expands to "
    f"ceil(n_tokens/{_CHUNK}) training-window rows via sequence()+explode "
    f"— the standard pre-tokenization split. Map-only (explode is "
    f"pipelined, no shuffle); output width stays (doc_id, idx, n_tok) so "
    f"the blow-up never carries text bytes.",
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("n_tok"),
    )
    n_chunks = F.ceil(F.col("n_tok") / F.lit(float(_CHUNK))).cast("bigint")
    return (
        toks.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias(
                "chunk_idx"
            ),
            "n_tok",
        )
        .orderBy("doc_id", "chunk_idx")
    )


_PACK_BUDGET = 2048  # tokens per packed training sequence


@register(
    "q80_token_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
      FROM documents
    ), packed AS (
      SELECT doc_id, source, n_tok,
             CAST(floor(
               (sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tok)
               / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id
      FROM toks
    )
    SELECT source, pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM packed
    GROUP BY source, pack_id
    ORDER BY source, pack_id
    """,
    doc=f"Concat-and-chunk token packing: within each source shard, "
    f"documents in deterministic doc_id order are laid end-to-end and "
    f"cut into {_PACK_BUDGET}-token packs — pack_id is the exclusive "
    f"running token sum floor-divided by the budget (the concat-then-"
    f"chunk strategy LLM pipelines use; docs may straddle a boundary). "
    f"One shuffle on the shard key for the window, then a map-side-"
    f"combining aggregate over the same partitioning.",
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "pack_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(float(_PACK_BUDGET)))
        .cast("bigint"),
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "pack_id")
    )


_EPOCH_SEED = 7
_N_SHARDS = 8


@register(
    "q81_epoch_shuffle",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id,
             row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':{_EPOCH_SEED}'), doc_id
             ) AS rn
      FROM documents
    )
    SELECT doc_id,
           CAST((rn - 1) % {_N_SHARDS} AS BIGINT) AS shard,
           CAST((rn - 1) // {_N_SHARDS} AS BIGINT) AS pos
    FROM ranked
    ORDER BY doc_id
    """,
    doc=f"Seeded epoch shuffle + sharding: documents are permuted by "
    f"md5(doc_id:seed) — deterministic for a given seed, uncorrelated "
    f"across seeds — then dealt round-robin into {_N_SHARDS} equal "
    f"shards with an intra-shard position. The global row_number is the "
    f"one serial point; at 100 TB replace it with (shard = md5 mod W, "
    f"pos = rank within shard) — same distribution, fully parallel — "
    f"kept here in the spec'd form so the oracle can pin the exact "
    f"permutation.",
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{_EPOCH_SEED}")))
    w = Window.orderBy(key, "doc_id")
    return (
        docs.select("doc_id", F.row_number().over(w).alias("rn"))
        .select(
            "doc_id",
            ((F.col("rn") - 1) % _N_SHARDS).cast("bigint").alias("shard"),
            F.floor((F.col("rn") - 1) / _N_SHARDS).cast("bigint").alias("pos"),
        )
        .orderBy("doc_id")
    )


_ACCENTED_ROWS = [
    (200001, "école française"),          # combining accents -> NFC
    (200002, "Å ngström units"),            # Å (ANGSTROM SIGN) -> U+00C5
    (200003, "already composed éçÅ"),   # NFC fixed point
]

_ACCENTED_VALUES_SQL = ", ".join(
    "({}, '{}')".format(i, t.replace("'", "''")) for i, t in _ACCENTED_ROWS
)


@register(
    "q94_unicode_normalize",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT * FROM (VALUES {_ACCENTED_VALUES_SQL}) v(doc_id, text)
    )
    SELECT doc_id,
           length(nfc_normalize(text)) AS n_chars_nfc,
           md5(nfc_normalize(text)) AS nfc_md5
    FROM corpus ORDER BY doc_id
    """,
    doc="Unicode NFC normalization — text hygiene before tokenization/"
    "dedup (combining sequences and compatibility codepoints otherwise "
    "split identical strings across fingerprints). Spark has no "
    "normalization built-in, so this is a deliberate Arrow-batched "
    "pandas UDF (the documented slow path, used only where the JVM has "
    "no primitive); the oracle's nfc_normalize verifies the rewrite "
    "byte-for-byte via md5. Literal accented rows are appended on both "
    "sides since the synthetic corpus is pure ASCII (an NFC fixed "
    "point).",
)
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import StringType

    def _nfc_batch(texts):
        import unicodedata

        return texts.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    nfc = F.pandas_udf(_nfc_batch, StringType())

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(_ACCENTED_ROWS, ["doc_id", "text"])
    corpus = docs.unionAll(extra)
    n = nfc(F.col("text"))
    return (
        corpus.select(
            "doc_id",
            F.length(n).alias("n_chars_nfc"),
            F.md5(n).alias("nfc_md5"),
        )
        .orderBy("doc_id")
    )


@register(
    "q120_leakage_safe_split",
    oracle="""
    WITH split AS (
      SELECT doc_id, text,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1', '2') AS is_test
      FROM documents
    ), toks AS (
      SELECT doc_id, is_test, string_split(text, ' ') AS w FROM split
    ), runs AS (
      SELECT doc_id, is_test,
             unnest([md5(array_to_string(w[i:i+7], ' '))
                     for i in range(1, len(w) - 6)]) AS h
      FROM toks WHERE len(w) >= 8
    ), leaked AS (
      SELECT DISTINCT r.doc_id
      FROM runs r
      WHERE NOT r.is_test
        AND r.h IN (SELECT h FROM runs WHERE is_test)
    )
    SELECT
      (SELECT count(*) FROM split WHERE is_test) AS n_test,
      (SELECT count(*) FROM split WHERE NOT is_test) AS n_train_raw,
      (SELECT count(*) FROM leaked) AS n_leaked,
      (SELECT count(*) FROM split WHERE NOT is_test) - (SELECT count(*) FROM leaked)
        AS n_train_clean
    """,
    doc="Leakage-safe train/test split: a deterministic md5 hash split "
    "(3/16 test) followed by 8-token-run overlap decontamination — any "
    "train document sharing a verbatim 8-token run with ANY test "
    "document is evicted from train, the split-hygiene step every "
    "LM-eval pipeline needs before measuring. Composition of q45's "
    "hash-split and q99's window-hash machinery: run hashes shuffle "
    "once, the test-run set stays hash-sized, and the eviction is a "
    "semi join — no text ever crosses the wire twice. Counts emitted "
    "for the hash check; the evicted id set is the semi-join input.",
)
def q120(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    is_test = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1", "2")
    split = docs.withColumn("is_test", is_test)
    toks = F.split(F.col("text"), " ")
    # tokenize ONCE into a column: split() referenced inside the lambda
    # re-evaluates per position (q149's measured lesson)
    runs_col = F.expr(
        "transform(sequence(1, size(w) - 7),"
        " i -> md5(array_join(slice(w, i, 8), ' ')))"
    )
    runs = (
        split.filter(F.size(toks) >= 8)
        .select("doc_id", "is_test", toks.alias("w"))
        .select("doc_id", "is_test", F.explode(runs_col).alias("h"))
    )
    test_runs = runs.filter(F.col("is_test")).select("h").distinct()
    leaked = (
        runs.filter(~F.col("is_test"))
        .join(test_runs, "h", "left_semi")
        .select("doc_id")
        .distinct()
    )
    counts = split.agg(
        F.sum(F.col("is_test").cast("long")).alias("n_test"),
        F.sum((~F.col("is_test")).cast("long")).alias("n_train_raw"),
    )
    n_leaked = leaked.agg(F.count(F.lit(1)).alias("n_leaked"))
    return (
        counts.crossJoin(F.broadcast(n_leaked))
        .select(
            "n_test",
            "n_train_raw",
            "n_leaked",
            (F.col("n_train_raw") - F.col("n_leaked")).alias("n_train_clean"),
        )
    )


@register(
    "q121_vocabulary_oov",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), freq AS (
      SELECT token, count(*) AS tf FROM toks GROUP BY token
    ), vocab AS (
      SELECT token FROM freq ORDER BY tf DESC, token LIMIT 32
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           round(CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON v.token = t.token
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
    doc="Frequency-based vocabulary construction + per-document OOV "
    "profiling: the top-V tokens by corpus frequency (deterministic "
    "tiebreak) become the vocabulary, then every document reports its "
    "out-of-vocabulary token count and rate — the tokenizer-prep signal "
    "that decides V before BPE training. The vocab is output-sized (V "
    "rows) and broadcast to the probe side; one token-frequency "
    "aggregate (map-side combined) plus one broadcast left join — no "
    "row ever shuffles twice. OOV rate is an exact integer ratio "
    "rounded identically on both engines.",
)
def q121(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), "token")
        .limit(32)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("in_vocab").isNull().cast("long")).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov").cast("double") / F.col("n_tokens"), 6).alias(
                "oov_rate"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- Q186


@register(
    "q186_curriculum_interleave",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY n_chars, md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS r
      FROM documents
    ),
    ordered AS (
      SELECT doc_id, source, n_chars, r,
             row_number() OVER (ORDER BY r, source, doc_id) AS pos
      FROM ranked
    )
    SELECT pos, doc_id, source, CAST(r AS BIGINT) AS round_robin_rank
    FROM ordered
    WHERE pos <= 200
    ORDER BY pos
    """,
    doc="Curriculum + source-interleaved training order: within each "
    "source, docs are ranked easiest-first (shortest first, md5 "
    "tiebreak so equal lengths shuffle deterministically), then the "
    "global order round-robins across sources (ORDER BY rank, source) "
    "— every consecutive |sources|-sized window touches each source "
    "once, so no training batch is single-source, and difficulty "
    "ramps up — the interleaving discipline LLM data loaders apply "
    "before sharding (q81's epoch shuffle is the non-curriculum "
    "sibling). Emits the first 200 positions (output-sized; the full "
    "ordering is the same plan without the LIMIT). 100 TB: one rank "
    "window per source partition + the global order materializes "
    "lazily as a sort key — at scale the (r, source) pair IS the shard "
    "assignment key (hash it, never globally sort), same contract.",
)
def q186(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    r = F.row_number().over(
        Window.partitionBy("source").orderBy(
            "n_chars", F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    ranked = docs.select("doc_id", "source", "n_chars", r.alias("r"))
    pos = F.row_number().over(Window.orderBy("r", "source", "doc_id"))
    return (
        ranked.select("doc_id", "source", "n_chars", "r", pos.alias("pos"))
        .filter(F.col("pos") <= 200)
        .select(
            "pos",
            "doc_id",
            "source",
            F.col("r").cast("bigint").alias("round_robin_rank"),
        )
        .orderBy("pos")
    )

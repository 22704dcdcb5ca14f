"""DuckDB-oracle comparison harness — a local mirror of the driver's
correctness gate (row count + column names + order-insensitive values).

The driver pre-registers the testdata parquet files as DuckDB views named
``region nation customer supplier part orders lineitem events documents
embeddings`` and compares each ``queries()`` result against the matching
``oracle_sql()`` string.
"""

from __future__ import annotations

import datetime
import os
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

from .tables import TABLE_NAMES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, integer/float dtypes widened,
    timestamps normalized to ns, rows sorted by all columns."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if dt == object:
            # Spark returns DATE columns as datetime.date objects while
            # DuckDB returns datetime64 — normalize both to datetime64.
            sample = df[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], (datetime.date, datetime.datetime)):
                df[c] = pd.to_datetime(df[c])
                dt = df[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(dt):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[ns]")
        elif pd.api.types.is_bool_dtype(dt):
            df[c] = df[c].astype("bool")
        else:
            df[c] = df[c].astype("object")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def oracle_type_issues(rel: "duckdb.DuckDBPyRelation", spark_pdf: pd.DataFrame) -> list[str]:
    """Dtype-level strictness mirroring the driver's value-hash.

    The driver hashes raw column values *with their types*, so a DuckDB
    HUGEINT (``sum()`` of integers) or DECIMAL next to a Spark BIGINT/DOUBLE
    hash-mismatches even when every value is equal — this is exactly how
    q26/q31 failed in round 1 while the (int64-widening) local mirror passed.
    Inspect the DuckDB relation types *before* ``.df()`` flattens them.
    """
    issues: list[str] = []
    spark_dtypes = {c: str(spark_pdf[c].dtype) for c in spark_pdf.columns}
    for name, t in zip(rel.columns, rel.types):
        ts = str(t).upper()
        if "HUGEINT" in ts:
            issues.append(
                f"{name}: DuckDB {ts} (Spark has no int128 — CAST the oracle to BIGINT)"
            )
        elif ts.startswith("DECIMAL") and spark_dtypes.get(name, "") in (
            "float64",
            "float32",
            "int64",
            "int32",
        ):
            issues.append(
                f"{name}: DuckDB {ts} vs Spark {spark_dtypes.get(name)} — "
                "CAST the oracle (or the Spark column) so types agree"
            )
    return issues


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""
    diffs: list[str] = field(default_factory=list)


def compare_frames(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> CompareResult:
    if len(spark_pdf) != len(duck_pdf):
        return CompareResult(name, False, f"row count {len(spark_pdf)} != {len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return CompareResult(name, False, f"columns {s_cols} != {d_cols}")
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    diffs: list[str] = []
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c].dtype):
            eq = (av == bv) | (np.isnan(av.astype("float64")) & np.isnan(bv.astype("float64")))
        else:
            an = a[c].to_numpy(dtype=object)
            bn = b[c].to_numpy(dtype=object)
            both_na = pd.isna(a[c]).to_numpy() & pd.isna(b[c]).to_numpy()
            eq = both_na | (an == bn)
        if not eq.all():
            bad = np.flatnonzero(~eq)[:5]
            for i in bad:
                diffs.append(f"col {c} row {i}: spark={av[i]!r} oracle={bv[i]!r}")
    if diffs:
        return CompareResult(name, False, f"{len(diffs)}+ cell mismatches", diffs)
    return CompareResult(name, True, f"{len(a)} rows match")

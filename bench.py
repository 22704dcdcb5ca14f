"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully executed and its complete result materialized to the
driver (Arrow-batched toPandas) so the wall time covers the whole plan,
not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd


def _warm_fn(s: pd.Series) -> pd.Series:
    import numpy  # noqa: F401 — force the heavy imports in every worker

    return s


HEADLINE = [
    "q01_scan_projection",
    "q02_filter",
    "q03_hash_aggregate",
    "q04_global_aggregate",
    "q05_distinct_aggregate",
    "q06_approx_distinct",
]

# The iterative/GEMM family runs ISOLATED, one fresh JVM each (r8
# verdict #1). Root cause (established r7/r8, kept for the record): a
# shared session that has executed 200+ distinct query shapes
# accumulates hundreds of generated whole-stage-codegen classes; the
# JIT's shared dispatch sites go megamorphic and can no longer inline
# these queries' per-iteration generated stages — q96 recorded 15.2 s
# in the r8 shared session vs a root-caused 6.3 s fresh-JVM steady
# state, and the same mechanism produced 3.5x rerun swings on
# untouched code (q32_minhash +18% in r8, q141 [6.9, 1.95]). A
# production executor serving one pipeline never accumulates 200 query
# shapes in one JVM, so the fresh-JVM steady state is the honest
# per-query cost — and now it is also the RECORDED number, not a
# footnote.
#
# r9 re-measurement caveat: the steady state itself is box-dependent.
# An 8-run fresh-JVM q96 profile on the r9 box gave
# [26.3, 12.6, 13.3, 11.7, 11.4, 11.6, 11.7, 16.0] — steady ~11.4-11.7 s
# vs r8's quiet-box 6.3 s on identical code (split measured at steady:
# ~7.0 s PPJoin candidate generation + ~5.8 s for 8 PageRank rounds +
# CC over the resulting 256-edge graph, i.e. ~14 fixed-cost Spark jobs
# — scheduler floor, amortized at real scale). The invariant the
# harness CAN hold box-independently is: recorded minimum == this
# box's fresh-JVM steady state, which run_single's convergence rule
# (keep running while still improving >15%, max 7) enforces.
ISOLATED = {
    "q96_pagerank_canonical",
    "q49_dedup_clusters",
    "q152_cluster_safe_split",
    "q35_cosine_neardup_pairs",
    "q40_curation_pipeline",
    "q32_minhash_lsh_pairs",
    "q32_ngram_jaccard_pairs",
    "q32_simhash_pairs",
    "q125_quality_canonical",
    # joined r9 after the same signature appeared in back-to-back full
    # runs on an idle box: 2.83 s in one session, a SUSTAINED 18.8 s
    # (two reruns agreeing) in the next — session-level codegen
    # pollution luck, not noise; fresh-JVM runs converge tightly.
    "q59_semantic_dedup",
    # r8 verdict #6: q100's rerun spread (6.59 vs 10.74 on identical
    # code) is the same shared-JVM mechanism, not plan instability —
    # fresh-JVM r9 runs converge immediately ([12.10, 5.07, 5.04] at
    # sf0.1: runs 2-3 agree to 0.6%), so it joins the family rather
    # than earning a plan pin.
    "q100_bloom_decontaminate",
}


# Reference box speed the calibrated numbers are normalized TO: the r9
# end-of-run probe (BENCH_r09 box_calibration.end numpy_gemm 0.0085 s),
# taken when that box had reached steady state — the r9 ADVICE
# established `end` as the only trustworthy r9 sample because the old
# probe's single untimed warm-up let cold-start noise through (start
# 0.0415 s vs end 0.0085 s on the same idle box). With REF pinned to
# the r9 end probe, r9's recorded raw seconds ARE its calibrated
# seconds (factor 1.0), so calibrated r10+ numbers compare directly
# against the BENCH_r09 raw record.
_CALIB_REF_GEMM = 0.0085


def _box_calibration() -> dict:
    """Fixed CPU microprobes recorded throughout every bench run, so
    cross-round (and intra-run) comparisons can normalize for box-speed
    drift instead of arguing about it: an r9 audit found identical code
    measuring a median 19% slower across 213 queries between two full
    runs hours apart on an idle box, and the r9 recorded run started on
    a box phase 2.3x slower than its end. numpy GEMM exercises the
    multi-threaded CPU capacity Spark executors see; the pure-python
    loop is the single-core baseline. Steady-state by construction
    (ADVICE r9): two untimed warm-up multiplies, then min-of-5 timed —
    the committed r9 artifact proved one untimed rep insufficient
    (start probe 5x its own end probe on an idle box). ~2 s total."""
    import numpy as np

    rng = np.random.default_rng(42)
    a = rng.standard_normal((1024, 1024))
    b = rng.standard_normal((1024, 1024))
    a @ b  # untimed: BLAS thread-pool spin-up
    a @ b  # untimed: second rep — caches + governor ramp
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        a @ b
        reps.append(time.perf_counter() - t0)
    gemm = min(reps)
    loops = []
    for _ in range(3):
        t0 = time.perf_counter()
        s = 0
        for i in range(2_000_000):
            s += i * i
        loops.append(time.perf_counter() - t0)
    # VERDICT r13 #3: first-touch memory-fault probe. This VM's
    # hypervisor lazily backs guest pages; in its cold phase, faulting
    # fresh anonymous memory runs at ~37-60 MB/s (measured r13) and
    # every new JVM heap page stalls — while GEMM (hot CPU, resident
    # buffers) reads the box as FAST, so the calibrated numbers can't
    # correct it. Recording the fault rate per probe row lets
    # probe_align flag fault-bound windows the way it flags GEMM-slow
    # ones. 256 MB: big enough to dominate loop overhead, small enough
    # (~25 ms healthy, ~0.7 s at 380 MB/s, ~7 s in the r13 pathology)
    # not to distort the probe cadence. The buffer is fresh (calloc'd)
    # each call and freed immediately; one rep — fault service has no
    # warm-up to strip, and min-of-N would just re-pay the cost.
    n = 256 << 20
    t0 = time.perf_counter()
    buf = bytearray(n)
    for i in range(0, n, 4096):
        buf[i] = 1
    fault_sec = time.perf_counter() - t0
    del buf
    return {
        "numpy_gemm_1024_sec": round(gemm, 4),
        "python_loop_2m_sec": round(min(loops), 4),
        "memfault_256m_mb_s": round(256 / fault_sec, 1),
    }


class _ProbeLog:
    """Timestamped probe series + per-query measurement midpoints.

    Each query's calibration factor comes from the MINIMUM GEMM time of
    the 5 probes nearest in time to when that query ran (probes bracket
    every isolated subprocess and every ~20 shared-loop queries).
    Estimator derivation, from two recorded r10 runs: nearest-alone was
    wrong (single probes spiked 1.8-2.4x from transient JVM GC/compiler
    contention, halving innocent queries), and median-of-3 was still
    wrong on this virtualized box, whose probe series bounces
    0.009<->0.033 with no sustained structure (hypervisor steal on the
    32-thread BLAS burst) even while Spark query raws move only ~13%.
    Throttle/steal/contention only ever SLOW a probe, never speed it
    up, so the minimum over a window is the honest estimate of the
    box's capacity when the query ran; a GENUINE slow phase (the r9
    record's 2.3x start, many minutes wide) covers all 5 nearest
    probes and still registers. Residual swings after this correction
    (~±15% on this box, measured) are unattributable virtualization
    noise — recorded as such rather than over-corrected.
    calibrated_sec = raw_sec * (_CALIB_REF_GEMM / min5_gemm): a box
    running 2x slower than the r9 reference halves the recorded number
    instead of reading as a 2x plan regression."""

    def __init__(self) -> None:
        self.probes: list[dict] = []
        self.query_mid: dict[str, float] = {}
        # VERDICT r12 #2: every sample the multi-pass schemes produce,
        # not just the min — [pass_label, sec, t_mid] per execution,
        # BENCH_FULL-only. Within-run spread is the cheapest attribution
        # signal there is (r12's q125/q32_ngram residual movers needed
        # four extra fresh-JVM runs to classify because the record threw
        # it away); t_mid is time.monotonic() (CLOCK_MONOTONIC is
        # system-wide on Linux, so isolated-subprocess sample times are
        # directly comparable with this process's probe timestamps).
        self.samples: dict[str, list[list]] = {}

    def sample(self, name: str, label: str, sec: float, t_mid: float) -> None:
        self.samples.setdefault(name, []).append(
            [label, round(sec, 4), round(t_mid, 2)]
        )

    def probe(self, label: str) -> dict:
        rec = dict(_box_calibration())
        rec["t"] = round(time.monotonic(), 2)
        rec["label"] = label
        self.probes.append(rec)
        return rec

    def mark(self, name: str, t_start: float, t_end: float) -> None:
        self.query_mid[name] = (t_start + t_end) / 2

    def factor(self, name: str) -> float:
        mid = self.query_mid.get(name)
        if mid is None or not self.probes:
            return 1.0
        nearest5 = sorted(self.probes, key=lambda p: abs(p["t"] - mid))[:5]
        best = min(p["numpy_gemm_1024_sec"] for p in nearest5)
        return _CALIB_REF_GEMM / max(best, 1e-6)

    def calibrated(self, times: dict[str, float]) -> dict[str, float]:
        return {n: round(t * self.factor(n), 4) for n, t in times.items()}


def run_single(name: str) -> None:
    """--single NAME: run one query in THIS fresh process until the
    timing converges (min 3 / max 7 executions, cache-drop + GC
    between), print one JSON line with the raw timings. The first run
    absorbs the query's own C2 compilation and Python-worker pool spawn
    (that cost is real but one-time per pipeline); later runs are the
    steady state a dedicated executor would see. Fixed min-of-3 was not
    enough for the deepest iterative plans: q96's per-iteration stages
    JIT across ~5 executions ([23.4, 19.6, 12.4, ...] still descending
    at run 3), so keep going while the latest run still improves the
    best by >15%. SPARK_GRAFT_SINGLE_MIN_RUNS (default 3) lowers the
    floor for the isolated family's SECOND separated pass (r12): pass 2
    exists to give each query a steady-state sample in a different box
    phase, so warm-up + one steady run suffices when it stops
    improving."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    min_runs = max(2, int(os.environ.get("SPARK_GRAFT_SINGLE_MIN_RUNS", "3")))
    from iceberg_rest_server_spark.queries import REGISTRY
    from iceberg_rest_server_spark.session import get_spark

    spark = get_spark(f"bench-iso-{name}")
    q = REGISTRY[name]
    runs: list[float] = []
    samples: list[list[float]] = []  # [sec, t_mid] per execution
    while True:
        m0 = time.monotonic()
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).toPandas()
        dt = round(time.perf_counter() - t0, 4)
        runs.append(dt)
        samples.append([dt, round((m0 + time.monotonic()) / 2, 2)])
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        if len(runs) >= min_runs and (
            len(runs) >= 7 or runs[-1] > 0.85 * min(runs[:-1])
        ):
            break
    print(json.dumps({"name": name, "runs": runs, "samples": samples}), flush=True)
    spark.stop()


def _run_isolated(
    names: list[str], plog: _ProbeLog
) -> tuple[dict[str, list[float]], dict[str, str]]:
    """Spawn one fresh interpreter+JVM per query, sequentially (never
    concurrently — two JVMs would contend for the same 32 cores and
    contaminate each other's timings). A calibration probe runs before
    EACH subprocess (VERDICT r9 #2: the isolated phase is where the r9
    box ran 2.3x slow, so one start-of-run probe can't attribute
    per-query swings).

    r12: the family runs as TWO separated subprocess passes, mirroring
    the fast set's separated-pass scheme. All of a query's pass-1 runs
    execute back-to-back inside ONE subprocess window (~30-60 s), so a
    minutes-wide hypervisor-steal burst covers every rep at once — the
    r12 A/B same-code runs measured exactly that (q59 fresh-JVM min
    4.41 s in run A vs 2.81 s in run B, probes steady both times).
    Pass 2 revisits each query ~the family's whole duration later in a
    new JVM (warm-up + one steady sample, SPARK_GRAFT_SINGLE_MIN_RUNS=2,
    same >15%-improvement extension), so the two steady-state samples
    sit in different box phases and min-of-both escapes a single burst.
    SPARK_GRAFT_BENCH_ISOPASS=1 restores the single pass (smoke runs).
    Returns (raw runs, errors)."""
    import subprocess

    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ISOPASS", "2")))
    runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    best: dict[str, float] = {}
    here = os.path.abspath(__file__)
    for p in range(passes):
        for name in names:
            if name in errors:
                continue
            plog.probe(f"pre{p + 1 if p else ''}:{name}")
            t_start = time.monotonic()
            env = dict(os.environ)
            if p:
                env["SPARK_GRAFT_SINGLE_MIN_RUNS"] = "2"
            try:
                proc = subprocess.run(
                    [sys.executable, here, "--single", name],
                    capture_output=True,
                    text=True,
                    timeout=900,
                    cwd=os.path.dirname(here),
                    env=env,
                )
                line = proc.stdout.strip().splitlines()[-1]
                rec = json.loads(line)
                assert rec["name"] == name and rec["runs"]
                runs.setdefault(name, []).extend(rec["runs"])
                # per-execution sample vectors (VERDICT r12 #2); the
                # subprocess stamps t_mid on the shared monotonic clock
                for sec, t_mid in rec.get("samples") or []:
                    plog.sample(name, f"iso{p + 1}", sec, t_mid)
                if min(rec["runs"]) < best.get(name, float("inf")):
                    # calibration brackets whichever PASS produced the
                    # recorded min (same ADVICE-r11 rule as fast passes)
                    best[name] = min(rec["runs"])
                    plog.mark(name, t_start, time.monotonic())
                print(
                    # ADVICE r12: the pass line shows the PASS-LOCAL min
                    # (a number this pass actually produced) and labels
                    # the cross-pass min as best-so-far
                    f"[bench] {name} (fresh JVM pass {p + 1}): "
                    f"{min(rec['runs']):.2f}s (best so far "
                    f"{min(runs[name]):.2f}s) runs={rec['runs']}",
                    file=sys.stderr,
                    flush=True,
                )
            except Exception as exc:
                # a pass-2 failure after a pass-1 success is flakiness
                # the error should surface, not average away (same
                # policy as the fast passes): drop the query entirely
                errors[name] = f"isolated p{p + 1}: {type(exc).__name__}: {exc}"[:300]
                runs.pop(name, None)
                plog.samples.pop(name, None)
                print(f"[bench] {name}: ISOLATED FAILED {errors[name]}", file=sys.stderr, flush=True)
        if names:
            plog.probe(f"post:isolated:{p + 1}")
    return runs, errors


def _shared_loop_order(
    registry: set[str], iso_runs: dict, iso_errors: dict
) -> list[str]:
    """Order of the shared-session loop: headline first, then batch
    alphabetical, streaming last (state-store residue inflates whatever
    runs next). Excluded entirely: queries with a recorded fresh-JVM
    number AND queries whose isolated run FAILED (ADVICE r9, medium) —
    re-running an isolation-family query in the shared session would
    record exactly the JIT-polluted number the isolation exists to
    avoid, and the stale isolated error + fallback time double-booked
    the query in both `queries` and `errors`, nulling the headline
    while still summing the contaminated number. The error stands and
    the fix is rerunning the bench, not trusting the fallback."""
    streaming = {n for n in registry if "_stream" in n}
    done = set(iso_runs) | set(iso_errors)
    names = [n for n in HEADLINE if n in registry and n not in done]
    names += [
        n
        for n in sorted(registry)
        if n not in HEADLINE and n not in streaming and n not in done
    ]
    names += sorted(streaming - done)
    return names


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from iceberg_rest_server_spark.queries import REGISTRY
    from iceberg_rest_server_spark.session import get_spark

    plog = _ProbeLog()
    calibration = {"start": plog.probe("start")}

    # Fresh-JVM family first, BEFORE the shared session exists, so the
    # subprocess JVMs never share the box with a second live JVM.
    isolate = os.environ.get("SPARK_GRAFT_BENCH_ISOLATE", "1") != "0"
    iso_names = sorted(n for n in ISOLATED if n in REGISTRY) if isolate else []
    iso_runs, iso_errors = _run_isolated(iso_names, plog) if iso_names else ({}, {})

    spark = get_spark("bench")

    # Warm the JVM + parquet footers once so per-query times measure the
    # query, not session startup.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    # Absorb first-use C2 compilation of the big codegen families
    # (hash aggregate with decimal sums, window, broadcast join) on a
    # small slice — otherwise whichever query runs each family first
    # pays 2-4 s of JIT that says nothing about the plan.
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    _li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(20000)
    _li.groupBy("l_returnflag").agg(
        _F.sum(_F.col("l_quantity").cast("decimal(18,2)")).cast("double"),
        # decimal×decimal product sums codegen differently (38,6 overflow
        # checks) from the plain decimal sum — warm both, or the first
        # money-math query (q03) absorbs its JIT
        _F.sum(
            _F.col("l_extendedprice").cast("decimal(18,2)")
            * (_F.lit(1) - _F.col("l_discount")).cast("decimal(18,2)")
        ).cast("double"),
        _F.count(_F.lit(1)),
    ).collect()
    _li.select(
        _F.row_number().over(_W.partitionBy("l_returnflag").orderBy("l_orderkey"))
    ).count()
    _nat = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    _li.join(_F.broadcast(_nat), _li.l_suppkey % 25 == _nat.n_nationkey).count()

    # Warm the Python worker pool across all cores: the first pandas-UDF
    # stage in a session otherwise pays 32 × (interpreter spawn + numpy/
    # pandas import) inside whichever query happens to run it first
    # (measured: +10-25 s on that query's wall time).
    from pyspark.sql import functions as _F

    _warm = _F.pandas_udf(_warm_fn, "long")
    spark.range(256, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _warm("id")
    ).count()

    # (The r8-era dedup/PPJoin/PageRank warmups are gone: their sole
    # beneficiaries — the shingle/band/graph codegen families — now run
    # in their own fresh JVMs via ISOLATED, so warming those stages in
    # the shared session would only add generated-class pollution.)
    if not isolate:
        # isolation disabled (SPARK_GRAFT_BENCH_ISOLATE=0): the family
        # runs in-session again and needs the old warmups back
        try:
            from iceberg_rest_server_spark.operators.dedup import (
                exact_jaccard_pairs,
                minhash_lsh_pairs,
            )
            from iceberg_rest_server_spark.operators.graph import pagerank
            from iceberg_rest_server_spark.tables import load as _load

            _sample = _load(spark, sf_dir, "documents").limit(1000)
            minhash_lsh_pairs(_sample, "doc_id", "text").count()
            spark.catalog.clearCache()
            exact_jaccard_pairs(_sample, "doc_id", "text").count()
            spark.catalog.clearCache()
            _edges = spark.range(200).select(
                (_F.col("id") % 50).alias("src"), ((_F.col("id") + 7) % 50).alias("dst")
            )
            pagerank(_edges, max_iter=3).count()
            spark.catalog.clearCache()
        except Exception:
            pass  # warmup must never fail the bench

    # Streaming queries leave executor-side residue (state-store provider
    # caches, checkpoint IO) that measurably inflates whatever runs next
    # (~+30% on the dedup queries, A/B-tested); run them last so every
    # batch query is timed from comparable session state.
    names = _shared_loop_order(set(REGISTRY), iso_runs, iso_errors)
    times: dict[str, float] = {n: min(r) for n, r in iso_runs.items()}
    reruns: dict[str, list[float]] = dict(iso_runs)
    errors: dict[str, str] = dict(iso_errors)

    def _quiesce() -> None:
        # queries persist intermediates (shingles, signatures, buckets);
        # drop them so 164 queries' caches don't accumulate into executor
        # memory pressure that distorts later timings
        spark.catalog.clearCache()
        # ... and force a full GC so one query's heap garbage (collect_list
        # buffers, codegen classes) isn't paid for by whoever runs next:
        # measured 3x distortion on q126 when it follows the document-heavy
        # q125 without this (10.8 s vs 3.2 s after System.gc()). The GC
        # runs between the timers, so it costs the bench wall-clock but
        # never a query's reported time.
        spark.sparkContext._jvm.System.gc()

    def _run_once(q) -> tuple[float, float]:
        """One full execution; returns (wall sec, monotonic midpoint) —
        the midpoint feeds the per-sample vector (VERDICT r12 #2)."""
        m0 = time.monotonic()
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        # Arrow-batched materialization: same full execution + full result
        # on the driver as collect(), minus per-row Python object cost
        # (3-4x less harness overhead on wide outputs, measured on q22)
        df.toPandas()
        sec = round(time.perf_counter() - t0, 4)
        return sec, round((m0 + time.monotonic()) / 2, 2)

    # Run-to-run noise on this box concentrates in the expensive tail
    # (r5 verdict: q126 measured 5 s by the builder, 49 s by the driver
    # on identical code). Queries whose first run exceeds this threshold
    # get a second, identically-quiesced run and report the MIN — the
    # cheap ~150 queries are stable and don't pay a second pass, so the
    # extra wall-clock is bounded by the slow tail only. Streaming
    # entries participate too (each drain uses a fresh uuid memory sink,
    # so a rerun is just another replay): measured single-shot swings of
    # ±30-60% on q162/q172 made one-sample streaming numbers useless.
    #
    # The JIT-pollution-sensitive ISOLATED family already ran fresh-JVM
    # min-of-3 above (see the ISOLATED comment for the full r7/r8
    # root-cause A/B); `iterative3` grants the same min-of-3 when
    # isolation is disabled and they fall back into this shared loop.
    rerun_sec = float(os.environ.get("SPARK_GRAFT_BENCH_RERUN_SEC", "3"))
    # VERDICT r10 #3: sub-threshold queries were single-shot, and two
    # same-code r10 full runs differed ±40-80% on exactly those — the
    # per-query record was noise below ~2 s. Every sub-threshold query
    # now reports a min-of-N (default 3). The N samples run as SEPARATE
    # PASSES over the whole fast set, not back-to-back reps: this box's
    # probe series shows hypervisor-steal bursts minutes wide (r11,
    # three same-code runs: probes 0.009 steady, then 0.05-0.134 for
    # 1-2 probe slots), and three back-to-back reps land inside one
    # burst together — min-of-reps then records the burst, not the
    # query. Passes are ~2-4 min apart, so a burst hits DIFFERENT
    # queries each pass and the per-query min escapes it. clearCache
    # between samples (a query must never replay its own persisted
    # intermediates) but no full System.gc inside the fast passes —
    # sub-second queries leave little garbage and the gc would triple
    # the added wall-clock. Batch fast passes run BEFORE the streaming
    # section (state-store residue inflates batch queries, measured
    # ~+30%); streaming entries keep back-to-back reps (each drain is
    # a fresh-uuid memory-sink replay; their noise is dominated by
    # micro-batch scheduling, not box bursts).
    fastrep_n = int(os.environ.get("SPARK_GRAFT_BENCH_FASTREP_N", "3"))
    iterative3 = set() if isolate else set(ISOLATED)
    streaming_names = {n for n in names if "_stream" in n}
    fast_batch: list[str] = []

    def _measure(name: str, i: int) -> None:
        if i % 20 == 0:
            # periodic probe (~2 s each) so every shared-loop query has
            # a box-speed sample within ~10 queries of when it ran
            plog.probe(f"shared:{i}")
        q = REGISTRY[name]
        t_started = time.monotonic()
        try:
            t1, mid1 = _run_once(q)
            plog.sample(name, "p1", t1, mid1)
            times[name] = t1
            if t1 >= rerun_sec:
                _quiesce()
                t2, mid2 = _run_once(q)
                plog.sample(name, "rerun", t2, mid2)
                reruns[name] = [t1, t2]
                times[name] = min(t1, t2)
                if name in iterative3:
                    _quiesce()
                    t3, mid3 = _run_once(q)
                    plog.sample(name, "rerun", t3, mid3)
                    reruns[name].append(t3)
                    times[name] = min(times[name], t3)
                if name not in streaming_names and times[name] < 2 * rerun_sec:
                    # r12: a burst-inflated FIRST sample >= rerun_sec
                    # used to trap a fast query in this back-to-back
                    # path, where the same minutes-wide burst covers
                    # both reps (run B measured q63_tpch_q1 at
                    # [3.28, 3.92] while run A's separated passes gave
                    # 1.65 on identical code). Borderline queries —
                    # min under 2x the threshold — now ALSO get the
                    # separated passes; genuinely heavy queries (>= 2x)
                    # stay rerun-only, bounding the added pass cost.
                    fast_batch.append(name)
            elif name in streaming_names:
                rs = [t1]
                for _ in range(fastrep_n - 1):
                    spark.catalog.clearCache()
                    tr, midr = _run_once(q)
                    plog.sample(name, "rep", tr, midr)
                    rs.append(tr)
                reruns[name] = rs
                times[name] = min(rs)
            else:
                reruns[name] = [t1]
                fast_batch.append(name)
            plog.mark(name, t_started, time.monotonic())
            print(f"[bench] {name}: {times[name]:.2f}s", file=sys.stderr, flush=True)
        except Exception as exc:  # one bad query must not zero the bench
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            # keep queries/errors disjoint even when the FIRST run
            # succeeded and a rerun/rep failed (same invariant the
            # fast-pass error path enforces): flakiness surfaces as an
            # error, never as a half-measured number
            times.pop(name, None)
            reruns.pop(name, None)
            plog.samples.pop(name, None)
            print(f"[bench] {name}: FAILED {errors[name]}", file=sys.stderr, flush=True)
        _quiesce()

    batch_names = [n for n in names if n not in streaming_names]
    for i, name in enumerate(batch_names):
        _measure(name, i)
    # fast passes 2..N over the batch fast set (see the burst comment)
    for p in range(1, fastrep_n):
        plog.probe(f"fastpass:{p}")
        for j, name in enumerate(fast_batch):
            if name in errors:
                continue
            if j and j % 40 == 0:
                plog.probe(f"fastpass:{p}:{j}")
            try:
                t_started = time.monotonic()
                t, midp = _run_once(REGISTRY[name])
                plog.sample(name, f"fast{p + 1}", t, midp)
                reruns[name].append(t)
                if t < times[name]:
                    # ADVICE r11: the calibration factor brackets the
                    # run window of whichever SAMPLE produced the
                    # reported min — a pass-2/3 win minutes after
                    # pass 1 must re-anchor query_mid, or the nearest
                    # probes describe a different box phase than the
                    # one the winning sample actually ran in
                    times[name] = t
                    plog.mark(name, t_started, time.monotonic())
            except Exception as exc:
                # keep the errors/queries sets disjoint (a query never
                # appears in both — the artifact invariant): a pass-1
                # success followed by a pass-N failure is flakiness the
                # error should surface, not average away
                errors[name] = f"fastpass: {type(exc).__name__}: {exc}"[:300]
                times.pop(name, None)
                reruns.pop(name, None)
                plog.samples.pop(name, None)
            spark.catalog.clearCache()
        print(f"[bench] fast pass {p + 1}/{fastrep_n} done ({len(fast_batch)} queries)",
              file=sys.stderr, flush=True)
        _quiesce()
    for i, name in enumerate(n for n in names if n in streaming_names):
        _measure(name, i)

    calibration["end"] = plog.probe("end")
    out = build_artifact(times, errors, reruns, iso_runs, plog, sf_dir, calibration)
    # Full per-query record for inspection across rounds.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"), "w") as fh:
            json.dump(out, fh, indent=1)
    except OSError:
        pass
    print(summary_line(out))
    spark.stop()


def build_artifact(
    times: dict[str, float],
    errors: dict[str, str],
    reruns: dict[str, list[float]],
    iso_runs: dict[str, list[float]],
    plog: _ProbeLog,
    sf_dir: str,
    calibration: dict,
) -> dict:
    """Assemble the round artifact from the measured pieces. Pure of
    Spark so the failure shapes are unit-testable (VERDICT r10 #5):
    with ANY error — isolated subprocess or shared loop — the headline
    `value`/`value_calibrated` must be null (a crashed expensive query
    must never read as a speedup), the error recorded, the partial sum
    only under `sum_succeeded_sec`, and the failed query absent from
    `queries` (no double-booking; the ADVICE-r9 fix keeps iso-failed
    queries out of the shared loop entirely)."""
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    calibrated = plog.calibrated(times)
    out = {
        "metric": "sum_query_wall_sec",
        # A failed query must not silently LOWER the total (a regression
        # that crashes an expensive query would read as a speedup):
        # totals are only comparable across rounds when every query ran.
        "value": round(sum(times.values()), 4) if not errors else None,
        "unit": "sec",
        "queries": times,
        # Box-speed-normalized seconds (VERDICT r9 #2): each query's raw
        # time scaled by _CALIB_REF_GEMM / nearest-probe-gemm, so a
        # round measured on a 2x-slower box phase reads as the SAME
        # calibrated number, not a 2x plan regression. REF is pinned to
        # the r9 end-of-run probe, so these compare directly against
        # BENCH_r09's raw per-query record.
        "queries_calibrated": calibrated,
        "value_calibrated": round(sum(calibrated.values()), 4) if not errors else None,
        "calib_ref_gemm": _CALIB_REF_GEMM,
        "n_queries": len(times),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # start/end probes kept for continuity with r9 artifacts; the
        # full probe series + per-query measurement midpoints live in
        # BENCH_FULL.json only, so any round can be re-calibrated
        # post-hoc against a different reference or estimator
        "box_calibration": calibration,
        "probes": plog.probes,
        "query_mid": {n: round(t, 2) for n, t in plog.query_mid.items()},
    }
    if iso_runs:
        # which numbers are fresh-JVM min-of-3 (vs shared-session) —
        # kept in the stdout line too so the recorded BENCH_r{N}.json
        # says HOW its numbers were measured
        out["isolated"] = sorted(iso_runs)
    if errors:
        out["errors"] = errors
        out["sum_succeeded_sec"] = round(sum(times.values()), 4)
    if reruns:
        # both raw timings per re-run query — BENCH_FULL.json only (the
        # stdout summary line drops this key to stay inside the driver's
        # 2000-char tail capture)
        out["reruns"] = reruns
    if plog.samples:
        # VERDICT r12 #2: the full per-execution sample vectors —
        # {name: [[pass_label, sec, t_mid], ...]} — BENCH_FULL only.
        # Within-run spread classifies the next q125-style residual
        # mover from ONE committed record (tools/probe_align.py and
        # tools/bench_compare.py --ab both read it) instead of paired
        # fresh-JVM reruns.
        out["samples"] = plog.samples
    return out


def summary_line(out: dict, budget: int = 1700) -> str:
    """Final stdout line, guaranteed to fit the driver's tail capture.

    The driver keeps only the LAST 2000 chars of stdout and json-parses
    the final line — with 150+ queries the full dict blows past that and
    the headline metric is lost (BENCH_r03/r04 both recorded parsed:
    null). Keep the full summary fields but greedily trim the per-query
    dict slowest-first to a `budget`-char line (full record is in
    BENCH_FULL.json).
    """
    line_out = dict(out)
    line_out.pop("reruns", None)  # full record only — too wide for the line
    line_out.pop("probes", None)  # full record only — the series is long
    line_out.pop("query_mid", None)  # full record only
    line_out.pop("samples", None)  # full record only — per-execution vectors
    times = out.get("queries", {})
    calibrated = out.get("queries_calibrated", {})
    errors = out.get("errors")
    if errors:
        line_out["errors"] = {k: v[:80] for k, v in list(errors.items())[:5]}
    slowest = sorted(times, key=times.get, reverse=True)
    kept: dict[str, float] = {}
    kept_cal: dict[str, float] = {}
    line_out["queries"] = kept
    line_out["queries_calibrated"] = kept_cal
    line_out["queries_shown"] = 0
    for name in slowest:
        kept[name] = round(times[name], 2)
        if name in calibrated:
            kept_cal[name] = round(calibrated[name], 2)
        line_out["queries_shown"] = len(kept)
        if len(json.dumps(line_out)) > budget:
            del kept[name]
            kept_cal.pop(name, None)
            line_out["queries_shown"] = len(kept)
            break
    return json.dumps(line_out)


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--single":
        run_single(sys.argv[2])
    else:
        main()

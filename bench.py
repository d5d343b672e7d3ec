"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with the noop sink (no
driver collect overhead). One warmup of the smallest query absorbs
session/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# NOTE (r5): t2_quality_scores absorbed t1 token stats and t5
# repetition signals in the registry consolidation (COVERAGE.md
# "registry policy"), so the suite now does strictly MORE work for the
# same 13 names: t2 alone went ~0.62 s → ~1.2 s while replacing ~1.9 s
# of separate r4 gate time. Compare r5+ headline numbers to r4 with
# that shift in mind.
# Contamination sentinel (VERDICT r12 #3): two of the last three
# driver BENCH artifacts (r10, r12) were inflated by other load on the
# shared bench box, costing a judging round each to adjudicate. A
# fixed-size in-memory numpy sort is timed once per query sample; on a
# clean box it runs ~0.03 s (measured r13, local[32] idle, with 8/8
# repeats in 0.027-0.036 s after warmup). CPU contention inflates it
# proportionally to the steal, so the artifact self-reports validity:
# "suspect": true when the calibration median exceeds the committed
# bound. Bound tuning (r13, measured): clean in-bench median 0.029 s;
# 32 extra CPU hogs (2x oversubscription, mildest real contamination)
# -> 0.064 s; 96 hogs (2.7x query-time inflation, the r12 class)
# -> 0.096 s. 0.055 flags both while keeping ~1.9x headroom over the
# clean median. The bound is pinned by tests/test_bench_sentinel.py.
CALIBRATION_BOUND_S = 0.055
_CAL_N = 2_000_000


def _calibration_array():
    import numpy as np

    rng = np.random.default_rng(12345)
    return rng.random(_CAL_N)


def calibration_once(base) -> float:
    """Time one fixed-size sort; the copy is outside the timed span."""
    import numpy as np

    b = base.copy()
    t0 = time.perf_counter()
    np.sort(b)
    return time.perf_counter() - t0


def calibration_point(base) -> float:
    """Min of 3 sorts spaced 30 ms: the Spark JVM's own background
    bursts (GC, codegen, shuffle cleanup) deschedule this process for
    ~0.5-1 s windows even on an idle box (measured r13: isolated sorts
    0.027-0.040 s with sporadic 0.5-1.1 s outliers while a local[32]
    session is live). min-of-3 across a 100 ms span filters a burst
    edge; SUSTAINED external load — the thing the sentinel exists to
    catch — inflates all three."""
    vals = []
    for i in range(3):
        if i:
            time.sleep(0.03)
        vals.append(calibration_once(base))
    return min(vals)


# Second contamination mode (found r13 while adjudicating sweep-budget
# trips): the host can throttle AGGREGATE cpu (cgroup-quota style) so
# 32-wide Spark stages run 4-20x slow while a single-threaded probe
# stays flat — the serial sentinel reads "box clean" right through it.
# An 8-thread concurrent sort (numpy releases the GIL) sees exactly
# what Spark sees. Clean walls measured r13: 0.06-0.14 s; bound 0.35.
PARALLEL_BOUND_S = 0.35
_PAR_THREADS = 8
_PAR_N = 1_000_000


def _parallel_bases():
    import numpy as np

    rng = np.random.default_rng(7)
    return [rng.random(_PAR_N) for _ in range(_PAR_THREADS)]


def calibration_parallel_once(bases) -> float:
    """Wall time of _PAR_THREADS concurrent fixed-size sorts."""
    import threading

    import numpy as np

    def one(i):
        np.sort(bases[i].copy())

    ts = [
        threading.Thread(target=one, args=(i,))
        for i in range(_PAR_THREADS)
    ]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return time.perf_counter() - t0


def calibration_parallel_point(bases) -> float:
    """Min of 2 walls (thread-start jitter filtered; sustained quota
    throttling inflates both)."""
    return min(calibration_parallel_once(bases) for _ in range(2))


# Third contamination mode (VERDICT r13 #1): BOTH numpy probes read
# clean through the r13 phase while code-untouched Spark queries ran
# uniformly 1.5-8x slow — memory-bound numpy sorts are evidently not a
# proxy for JVM whole-stage-codegen throughput under host-level
# throttling. Three new signals, each reported in the artifact:
#   1. a fixed tiny SPARK job timed once per sample — it experiences
#      exactly what the suite experiences (JVM codegen, 32-way task
#      scheduling). spark.range, not a file scan: deterministic work,
#      zero I/O variance. Clean walls measured r14 (local[32], both
#      numpy probes in-bound, steal 2.4%): median 0.25-0.38 s warm,
#      0.14-0.7 s spread; bound 1.0 s flags a >=3x JVM slowdown.
#   2. /proc/stat STEAL fraction over the suite window — the direct
#      hypervisor-throttling counter. Clean baseline measured r14:
#      2.4% idle / 2.7% under full Spark load; a uniform 1.5x host
#      slowdown implies ~33% steal. Bound 0.10.
#   3. cgroup cpu.stat throttled-time delta (v2 throttled_usec or v1
#      throttled_time) as a fraction of wall x ncpu — the quota mode.
#      Zero on a clean box (quota is -1 here); bound 0.02.
# r15 (VERDICT r14 Wrong #2): the FIRST spark-probe sample routinely
# lands in residual JVM warmup even after warm(n=3) — r14's max hit
# 0.9656 of the 1.0 bound on a clean box while the median sat at
# 0.118. The first sample is now recorded separately
# (spark_probe_first) and excluded from the adjudicated series, which
# lets the bound tighten 1.0 -> 0.5: >4x the clean steady median
# (0.118 s), measured rationale like the numpy bounds have.
SPARK_PROBE_BOUND_S = 0.5
_SPARK_PROBE_ROWS = 32_000_000
_SPARK_PROBE_PARTS = 32
STEAL_FRAC_BOUND = 0.10
THROTTLE_FRAC_BOUND = 0.02


def spark_probe_once(spark) -> float:
    """Wall of one fixed 32-partition JVM aggregation (no file I/O)."""
    t0 = time.perf_counter()
    spark.range(0, _SPARK_PROBE_ROWS, 1, _SPARK_PROBE_PARTS).selectExpr(
        "sum(id * 3 + (id % 7)) as s"
    ).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def host_cpu_times():
    """The aggregate `cpu` line of /proc/stat as a list of jiffy
    counters (user nice system idle iowait irq softirq steal ...), or
    None where /proc is unavailable."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
    except OSError:
        return None
    if not parts or parts[0] != "cpu":
        return None
    return [int(x) for x in parts[1:]]


def steal_fraction(before, after):
    """Fraction of ALL cpu time (busy+idle, all cores) stolen by the
    hypervisor between two host_cpu_times() snapshots; None if either
    snapshot is missing or the steal column (index 7) is absent."""
    if not before or not after or len(before) < 8 or len(after) < 8:
        return None
    deltas = [b - a for a, b in zip(before, after)]
    total = sum(deltas)
    if total <= 0:
        return None
    return deltas[7] / total


def cgroup_cpu_stat():
    """{'nr_throttled': int, 'throttled_s': float} from cgroup v2
    (/sys/fs/cgroup/cpu.stat, usec) or v1 (/sys/fs/cgroup/cpu/cpu.stat,
    nsec); None when neither exposes throttle counters."""
    for path, scale in (
        ("/sys/fs/cgroup/cpu.stat", 1e-6),
        ("/sys/fs/cgroup/cpu/cpu.stat", 1e-9),
    ):
        try:
            with open(path) as f:
                kv = dict(
                    line.split(None, 1) for line in f if line.strip()
                )
        except OSError:
            continue
        if "nr_throttled" in kv:
            raw = kv.get("throttled_usec", kv.get("throttled_time", "0"))
            return {
                "nr_throttled": int(kv["nr_throttled"]),
                "throttled_s": float(raw) * scale,
            }
    return None


def adjudicate(
    cal_samples,
    par_samples=None,
    spark_samples=None,
    steal_frac=None,
    throttled_frac=None,
    bound=CALIBRATION_BOUND_S,
    par_bound=PARALLEL_BOUND_S,
    spark_bound=SPARK_PROBE_BOUND_S,
    steal_bound=STEAL_FRAC_BOUND,
    throttled_bound=THROTTLE_FRAC_BOUND,
):
    """List of human-readable contamination findings (empty = clean).
    MEDIANS for the timed probes (sustained inflation, not isolated
    spikes — Spark's own GC/codegen bursts produce legitimate
    outliers); raw fractions for the host counters."""
    import statistics as _st

    reasons = []
    if cal_samples and _st.median(cal_samples) > bound:
        reasons.append(
            f"serial calibration median "
            f"{_st.median(cal_samples):.4f}s > bound {bound}s"
        )
    if par_samples and _st.median(par_samples) > par_bound:
        reasons.append(
            f"parallel calibration median "
            f"{_st.median(par_samples):.4f}s > bound {par_bound}s"
        )
    if spark_samples and _st.median(spark_samples) > spark_bound:
        reasons.append(
            f"spark probe median "
            f"{_st.median(spark_samples):.4f}s > bound {spark_bound}s"
        )
    if steal_frac is not None and steal_frac > steal_bound:
        reasons.append(
            f"hypervisor steal fraction {steal_frac:.4f} > "
            f"bound {steal_bound}"
        )
    if throttled_frac is not None and throttled_frac > throttled_bound:
        reasons.append(
            f"cgroup throttled-cpu fraction {throttled_frac:.4f} > "
            f"bound {throttled_bound}"
        )
    return reasons


def suspect_run(
    cal_samples, bound=CALIBRATION_BOUND_S,
    par_samples=None, par_bound=PARALLEL_BOUND_S,
    spark_samples=None, spark_bound=SPARK_PROBE_BOUND_S,
    steal_frac=None, steal_bound=STEAL_FRAC_BOUND,
    throttled_frac=None, throttled_bound=THROTTLE_FRAC_BOUND,
) -> bool:
    """True when the run looks machine-contaminated in ANY mode."""
    return bool(
        adjudicate(
            cal_samples,
            par_samples=par_samples,
            spark_samples=spark_samples,
            steal_frac=steal_frac,
            throttled_frac=throttled_frac,
            bound=bound,
            par_bound=par_bound,
            spark_bound=spark_bound,
            steal_bound=steal_bound,
            throttled_bound=throttled_bound,
        )
    )


class Sentinel:
    """Collects one point per contamination mode before every timed
    query sample and self-adjudicates at the end. spark=None skips the
    JVM probe (pure-python contexts)."""

    def __init__(self, spark=None):
        self.spark = spark
        self.cal_base = _calibration_array()
        self.par_bases = _parallel_bases()
        self.cal, self.par, self.spk = [], [], []
        self._host0 = host_cpu_times()
        self._cg0 = cgroup_cpu_stat()
        self._t0 = time.perf_counter()

    def warm(self, n=3):
        for _ in range(n):
            calibration_once(self.cal_base)
            calibration_parallel_once(self.par_bases)
            if self.spark is not None:
                spark_probe_once(self.spark)

    def sample(self):
        self.cal.append(calibration_point(self.cal_base))
        self.par.append(calibration_parallel_point(self.par_bases))
        if self.spark is not None:
            self.spk.append(spark_probe_once(self.spark))

    def report(self) -> dict:
        import statistics as _st

        wall = time.perf_counter() - self._t0
        ncpu = os.cpu_count() or 1
        steal = steal_fraction(self._host0, host_cpu_times())
        cg1 = cgroup_cpu_stat()
        throttled_s = throttled_frac = nr_throttled = None
        if self._cg0 is not None and cg1 is not None and wall > 0:
            throttled_s = cg1["throttled_s"] - self._cg0["throttled_s"]
            nr_throttled = cg1["nr_throttled"] - self._cg0["nr_throttled"]
            throttled_frac = throttled_s / (wall * ncpu)
        # first spark sample = residual JVM warmup (see
        # SPARK_PROBE_BOUND_S note): reported separately, excluded
        # from the adjudicated steady series
        spk_first = self.spk[0] if self.spk else None
        spk_steady = self.spk[1:] if len(self.spk) > 1 else self.spk
        reasons = adjudicate(
            self.cal,
            par_samples=self.par,
            spark_samples=spk_steady,
            steal_frac=steal,
            throttled_frac=throttled_frac,
        )

        def _med(xs):
            return round(_st.median(xs), 4) if xs else None

        return {
            "calibration_s": {
                "median": _med(self.cal),
                "max": round(max(self.cal), 4) if self.cal else None,
                "bound": CALIBRATION_BOUND_S,
                "parallel_median": _med(self.par),
                "parallel_max": (
                    round(max(self.par), 4) if self.par else None
                ),
                "parallel_bound": PARALLEL_BOUND_S,
                "spark_probe_median": _med(spk_steady),
                "spark_probe_max": (
                    round(max(spk_steady), 4) if spk_steady else None
                ),
                "spark_probe_first": (
                    round(spk_first, 4) if spk_first is not None else None
                ),
                "spark_probe_bound": SPARK_PROBE_BOUND_S,
                "n": len(self.cal),
            },
            "host": {
                "steal_fraction": (
                    round(steal, 5) if steal is not None else None
                ),
                "steal_bound": STEAL_FRAC_BOUND,
                "cgroup_throttled_s": (
                    round(throttled_s, 3)
                    if throttled_s is not None
                    else None
                ),
                "cgroup_nr_throttled": nr_throttled,
                "cgroup_throttled_cpu_fraction": (
                    round(throttled_frac, 5)
                    if throttled_frac is not None
                    else None
                ),
                "cgroup_throttle_bound": THROTTLE_FRAC_BOUND,
                "window_wall_s": round(wall, 1),
            },
            "suspect": bool(reasons),
            "suspect_reasons": reasons,
        }


HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q6_revenue_forecast",
    "q7_customer_order_ranks",
    "q9_set_ops",
    "q16_events_hourly",
    "q17_sessionize",
    "t2_quality_scores",
    "d1_exact_dedup",
    "d3_minhash_pairs",
    "d5_ngram_jaccard",
    "s1_cosine_topk",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from sparkt.queries import QUERIES as _REGISTRY
    from sparkt.queries.relational import q6_revenue_forecast
    from sparkt.session import get_spark

    # q6 left the oracle registry in the r13 consolidation (it rides
    # q32's 'forecast' block now) but stays a headline bench query so
    # the round-over-round series remains comparable.
    QUERIES = dict(_REGISTRY)
    QUERIES.setdefault("q6_revenue_forecast", q6_revenue_forecast)

    spark = get_spark(app_name="sparkt-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return time.time() - t0

    # warmup: session startup + whole-stage-codegen compilation. The
    # HOF-heavy dedup/text expressions cost ~5 s of one-time Janino
    # compile — warm them on the tiny sf so the timed runs measure
    # steady-state throughput (what a long-lived cluster session sees),
    # not compiler latency.
    run("q6_revenue_forecast")
    tiny = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(tiny):
        for wq in ("d5_ngram_jaccard", "d3_minhash_pairs", "t2_quality_scores"):
            QUERIES[wq](spark, tiny).write.mode("overwrite").format("noop").save()

    # n>=5 samples per query with stddev (VERDICT r2 #9: n=2 made a
    # +5% delta unreadable). One untimed warmup per query at the bench
    # SF first: the first execution of each plan pays whole-stage
    # codegen + shuffle-file setup (measured r4: d5 first sample 2-3x
    # its steady state), which is session-lifetime one-time cost, not
    # query throughput. Reported value = mean of the timed samples.
    n_samples = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "5")))
    import statistics

    sentinel = Sentinel(spark)
    sentinel.warm()  # first-touch page faults / governor ramp / JIT

    times: dict[str, float] = {}
    mins: dict[str, float] = {}
    stds: dict[str, float] = {}
    for name in HEADLINE:
        run(name)  # warmup, untimed
        samples = []
        for _ in range(n_samples):
            sentinel.sample()
            samples.append(run(name))
        times[name] = round(statistics.mean(samples), 3)
        # min is robust to interference spikes (VERDICT r12 #3): a
        # contaminated box inflates mean/std but rarely every sample
        mins[name] = round(min(samples), 3)
        stds[name] = round(statistics.pstdev(samples), 3)

    total = round(sum(times.values()), 3)

    # parse+DAG benchmark (BASELINE.md: 2,000 models <= 45 s cold /
    # <= 5 s warm) — pure driver work, no Spark
    parse_stats = {}
    try:
        import shutil
        import tempfile

        import bench_parse

        root = tempfile.mkdtemp(prefix="sparkt_parse_bench_")
        try:
            bench_parse.generate(root)
            cold_s, n_nodes = bench_parse.parse_once(root, partial=False)
            bench_parse.parse_once(root, partial=True)
            warm_s, _ = bench_parse.parse_once(root, partial=True)
            # file-level partial parsing (r7): one edited model out of
            # 2,000 re-parses alone (sparkt/partial.py)
            with open(
                os.path.join(root, "models", "path_0", "node_0_1.sql"),
                "w",
            ) as f:
                f.write("select id, 1 as v from {{ ref('node_0_0') }}")
            warm_1change_s, _ = bench_parse.parse_once(root, partial=True)
            parse_stats = {
                "parse_2000_models_cold_s": round(cold_s, 3),
                "parse_2000_models_warm_s": round(warm_s, 3),
                "parse_2000_models_warm_1change_s": round(
                    warm_1change_s, 3
                ),
                "parse_graph_nodes": n_nodes,
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    except Exception:  # noqa: BLE001 — parse bench is supplementary
        pass

    # per-node orchestration overhead (BASELINE.md: <= 50 ms/node of
    # non-Spark time): run a 200-view DAG through the full engine
    # (parse -> compile -> schedule -> DDL), subtract the raw DDL time
    # for the same 200 CREATE VIEW statements issued directly
    orch_stats = {}
    try:
        orch_stats = orchestration_overhead(spark)
    except Exception:  # noqa: BLE001 — supplementary metric
        pass

    # queries_min is the headline round-over-round series (VERDICT r13
    # #1): min-of-n is robust to contamination phases that inflate
    # mean/std but rarely every sample. `value` (sum of means) stays
    # for artifact continuity with r1-r13.
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": total,
                "value_min": round(sum(mins.values()), 3),
                "headline_series": "queries_min",
                "unit": "sec",
                "queries": times,
                "queries_min": mins,
                "queries_std": stds,
                "n_samples": n_samples,
                "sf": sf,
                **sentinel.report(),
                **parse_stats,
                **orch_stats,
            }
        )
    )
    spark.stop()


def orchestration_overhead(spark, n_chains: int = 20, chain_len: int = 10):
    """Wall time for a 200-model view DAG through the full Runner minus
    wall time for the same 200 CREATE VIEW statements issued raw."""
    import shutil
    import tempfile

    from sparkt.runner import Runner

    root = tempfile.mkdtemp(prefix="sparkt_orch_")
    n = n_chains * chain_len
    try:
        os.makedirs(os.path.join(root, "models"), exist_ok=True)
        with open(os.path.join(root, "dbt_project.yml"), "w") as f:
            f.write("name: orch_bench\nmodel-paths: [models]\n")
        for c in range(n_chains):
            for i in range(chain_len):
                sql = (
                    "select 1 as id"
                    if i == 0
                    else f"select id from {{{{ ref('m_{c}_{i-1}') }}}}"
                )
                with open(
                    os.path.join(root, "models", f"m_{c}_{i}.sql"), "w"
                ) as f:
                    f.write(sql)
        spark.sql("DROP DATABASE IF EXISTS bench_orch CASCADE")
        t0 = time.time()
        res = Runner(
            root, spark=spark, project_overrides={"schema": "bench_orch"}
        ).run(threads=8)
        engine_wall = time.time() - t0
        assert res.ok
        spark.sql("CREATE DATABASE IF NOT EXISTS bench_orch_raw")
        # raw baseline mirrors the engine DAG's ref-chains (ADVICE r2:
        # flat SELECT 1 views understate the analyzer/catalog cost of
        # chained CREATE VIEWs, inflating the subtraction)
        t1 = time.time()
        for c in range(n_chains):
            for i in range(chain_len):
                sql = (
                    "SELECT 1 AS id"
                    if i == 0
                    else f"SELECT id FROM bench_orch_raw.v_{c}_{i-1}"
                )
                spark.sql(
                    f"CREATE OR REPLACE VIEW bench_orch_raw.v_{c}_{i} AS {sql}"
                )
        ddl_wall = time.time() - t1
        return {
            "orchestration_nodes": n,
            "orchestration_engine_wall_s": round(engine_wall, 3),
            "orchestration_raw_ddl_wall_s": round(ddl_wall, 3),
            "orchestration_overhead_ms_per_node": round(
                max(engine_wall - ddl_wall, 0.0) / n * 1000, 2
            ),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
        try:
            spark.sql("DROP DATABASE IF EXISTS bench_orch CASCADE")
            spark.sql("DROP DATABASE IF EXISTS bench_orch_raw CASCADE")
        except Exception:  # noqa: BLE001
            pass


if __name__ == "__main__":
    main()

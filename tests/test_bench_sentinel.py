"""Contamination sentinel in bench.py (VERDICT r12 #3): the driver
bench runs on a shared box, and two of the last three BENCH artifacts
(r10, r12) were machine-contaminated — each cost the judge a round to
adjudicate. bench.py now times a fixed in-memory sort per sample and
flags the artifact "suspect" when the calibration exceeds a committed
bound. These tests pin the bound and the decision rule."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_calibration_fits_the_committed_bound_on_this_box():
    """The micro-task's clean time must sit well under the bound —
    min-of-7 is robust to transient CI contention (other pytest
    workers); a bound the task can't meet idle would flag every run."""
    base = bench._calibration_array()
    for _ in range(3):
        bench.calibration_once(base)  # warmup: page faults, governor
    best = min(bench.calibration_once(base) for _ in range(7))
    assert best < bench.CALIBRATION_BOUND_S, (
        f"calibration min {best:.4f}s >= bound "
        f"{bench.CALIBRATION_BOUND_S}s: either this box is slower than "
        "the bench box class or the bound needs re-tuning"
    )
    # and the bound is not trivially loose: real headroom over clean
    assert best < bench.CALIBRATION_BOUND_S * 0.75


def test_suspect_rule_flags_r12_style_contamination():
    """The r10/r12 signature: sustained inflation across samples."""
    clean = [0.03] * 60
    assert bench.suspect_run(clean) is False
    # isolated spikes (GC, cron blip) must NOT flag the run — even a
    # bursty minority, since Spark's own background work produces them
    spike = [0.03] * 59 + [0.5]
    assert bench.suspect_run(spike) is False
    bursty_minority = [0.03] * 40 + [0.3] * 20
    assert bench.suspect_run(bursty_minority) is False
    # sustained inflation at the measured 2x-oversubscription level
    # (0.064 s points, the MILDEST real contamination) must flag
    assert bench.suspect_run([0.064] * 60) is True
    # the r12 class (0.096 s points at 2.7x query inflation) flags
    assert bench.suspect_run([0.096] * 60) is True
    # empty calibration (defensive) is not suspect
    assert bench.suspect_run([]) is False


def test_calibration_point_filters_a_single_burst(monkeypatch):
    """min-of-3: one descheduling burst inside a point must not
    inflate the recorded sample."""
    seq = iter([0.9, 0.031, 0.033])
    monkeypatch.setattr(bench, "calibration_once", lambda base: next(seq))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.calibration_point(None) == 0.031


def test_suspect_rule_uses_committed_bound_by_default():
    assert bench.CALIBRATION_BOUND_S == 0.055
    # exactly-at-bound samples are NOT over (strict >)
    at_bound = [bench.CALIBRATION_BOUND_S] * 10
    assert bench.suspect_run(at_bound) is False


def test_parallel_probe_fits_committed_bound_on_this_box():
    """Aggregate-quota throttling mode (r13): 8 concurrent GIL-free
    sorts see what a 32-wide Spark stage sees; clean walls measured
    0.06-0.14 s vs the 0.35 s bound."""
    bases = bench._parallel_bases()
    for _ in range(2):
        bench.calibration_parallel_once(bases)
    best = min(bench.calibration_parallel_point(bases) for _ in range(3))
    assert best < bench.PARALLEL_BOUND_S
    assert best < bench.PARALLEL_BOUND_S * 0.75  # not trivially loose


def test_suspect_rule_catches_quota_throttling_mode():
    """Serial probe flat + parallel probe inflated = suspect (the mode
    the r13 sweep adjudication actually hit: Spark 4-20x slow, serial
    calibration reading 0.03 s 'box clean')."""
    serial_clean = [0.03] * 60
    par_throttled = [1.2] * 60
    assert bench.suspect_run(serial_clean, par_samples=par_throttled)
    par_clean = [0.1] * 60
    assert not bench.suspect_run(serial_clean, par_samples=par_clean)
    # isolated parallel spikes stay non-suspect (median rule)
    par_spiky = [0.1] * 50 + [2.0] * 10
    assert not bench.suspect_run(serial_clean, par_samples=par_spiky)


# --------------------------------------------------------------------
# Third mode (VERDICT r13 #1): the r13 throttle phase ran Spark 1.5-8x
# slow while BOTH numpy probes read clean. Three new signals: a fixed
# tiny Spark job per sample, /proc/stat steal fraction, and cgroup
# cpu.stat throttle deltas. These tests pin the bounds and prove a
# contaminated phase reproducibly flips `suspect`.


def test_spark_probe_fits_committed_bound_on_this_box(spark):
    """The JVM probe's clean time must sit well under its bound on an
    uncontaminated box (min-of-7 robust to CI contention). Measured
    r14: median 0.36 s / min 0.27 s on local[8], 0.25-0.38 s on
    local[32], vs the 1.0 s bound."""
    for _ in range(3):
        bench.spark_probe_once(spark)  # JIT + first-touch warmup
    best = min(bench.spark_probe_once(spark) for _ in range(7))
    assert best < bench.SPARK_PROBE_BOUND_S * 0.75, (
        f"spark probe min {best:.3f}s too close to bound "
        f"{bench.SPARK_PROBE_BOUND_S}s"
    )


def test_suspect_rule_catches_jvm_only_throttling():
    """The r13 signature: numpy probes clean, Spark 4x slow."""
    serial_clean = [0.03] * 60
    par_clean = [0.1] * 60
    spark_throttled = [1.4] * 60  # ~4x the 0.35 s clean median
    assert bench.suspect_run(
        serial_clean, par_samples=par_clean,
        spark_samples=spark_throttled,
    )
    spark_clean = [0.35] * 60
    assert not bench.suspect_run(
        serial_clean, par_samples=par_clean, spark_samples=spark_clean
    )
    # isolated JVM spikes (GC, codegen) stay non-suspect (median rule)
    spark_spiky = [0.3] * 50 + [3.0] * 10
    assert not bench.suspect_run(
        serial_clean, par_samples=par_clean, spark_samples=spark_spiky
    )


def test_suspect_rule_catches_hypervisor_steal():
    """A uniform 1.5x host slowdown implies ~33% steal — far over the
    0.10 bound (clean baseline measured r14: 2.4% idle, 2.7% busy)."""
    clean = [0.03] * 10
    assert bench.suspect_run(clean, steal_frac=0.33)
    assert not bench.suspect_run(clean, steal_frac=0.03)
    assert not bench.suspect_run(clean, steal_frac=None)


def test_suspect_rule_catches_cgroup_quota_throttle():
    clean = [0.03] * 10
    assert bench.suspect_run(clean, throttled_frac=0.15)
    assert not bench.suspect_run(clean, throttled_frac=0.0)
    assert not bench.suspect_run(clean, throttled_frac=None)


def test_adjudicate_names_every_tripped_mode():
    reasons = bench.adjudicate(
        [0.09] * 10,
        par_samples=[1.0] * 10,
        spark_samples=[2.0] * 10,
        steal_frac=0.4,
        throttled_frac=0.2,
    )
    assert len(reasons) == 5
    joined = " | ".join(reasons)
    for needle in (
        "serial", "parallel", "spark probe", "steal", "throttled"
    ):
        assert needle in joined, f"missing {needle!r} in {joined}"
    assert bench.adjudicate([0.03] * 10) == []


def test_steal_fraction_arithmetic():
    before = [100, 0, 100, 800, 0, 0, 0, 10]
    after = [1100, 0, 1100, 4800, 0, 0, 0, 3000]
    frac = bench.steal_fraction(before, after)
    assert abs(frac - 2990 / 8990) < 1e-9
    assert bench.steal_fraction(None, after) is None
    assert bench.steal_fraction(before[:4], after[:4]) is None
    assert bench.steal_fraction(before, before) is None  # zero delta


def test_host_counters_readable_on_this_box():
    """Smoke: the readers return well-formed data (or None) on the
    bench box class; the v1 path here exposes nr_throttled."""
    times = bench.host_cpu_times()
    assert times is None or (
        len(times) >= 8 and all(isinstance(x, int) for x in times)
    )
    cg = bench.cgroup_cpu_stat()
    assert cg is None or (
        set(cg) == {"nr_throttled", "throttled_s"}
        and cg["throttled_s"] >= 0.0
    )


def test_sentinel_flips_suspect_under_monkeypatched_throttle(monkeypatch):
    """End-to-end decision path: a throttled phase injected at the
    probe layer must surface as suspect=true in the artifact dict —
    the exact thing BENCH_r13 failed to do (23.78 s, suspect=false)."""
    monkeypatch.setattr(bench, "_calibration_array", lambda: None)
    monkeypatch.setattr(bench, "_parallel_bases", lambda: None)
    monkeypatch.setattr(bench, "calibration_once", lambda b: 0.03)
    monkeypatch.setattr(bench, "calibration_parallel_once", lambda b: 0.1)
    monkeypatch.setattr(bench, "calibration_point", lambda b: 0.03)
    monkeypatch.setattr(
        bench, "calibration_parallel_point", lambda b: 0.1
    )
    monkeypatch.setattr(bench, "host_cpu_times", lambda: None)
    monkeypatch.setattr(bench, "cgroup_cpu_stat", lambda: None)

    # r13 mode: JVM 4x slow, numpy clean
    monkeypatch.setattr(bench, "spark_probe_once", lambda s: 1.4)
    s = bench.Sentinel(spark=object())
    s.warm(1)
    for _ in range(10):
        s.sample()
    rep = s.report()
    assert rep["suspect"] is True
    assert any("spark probe" in r for r in rep["suspect_reasons"])
    assert rep["calibration_s"]["spark_probe_median"] == 1.4

    # clean JVM -> clean artifact
    monkeypatch.setattr(bench, "spark_probe_once", lambda s: 0.3)
    s2 = bench.Sentinel(spark=object())
    for _ in range(10):
        s2.sample()
    rep2 = s2.report()
    assert rep2["suspect"] is False and rep2["suspect_reasons"] == []


def test_sentinel_flags_steal_via_host_counters(monkeypatch):
    """Mild uniform host throttling (the mode that defeated both numpy
    probes in r13) is caught by the steal counter alone."""
    snaps = iter(
        [
            [100, 0, 100, 800, 0, 0, 0, 10],  # Sentinel.__init__
            [1100, 0, 1100, 4800, 0, 0, 0, 3000],  # report()
        ]
    )
    monkeypatch.setattr(bench, "_calibration_array", lambda: None)
    monkeypatch.setattr(bench, "_parallel_bases", lambda: None)
    monkeypatch.setattr(bench, "calibration_point", lambda b: 0.03)
    monkeypatch.setattr(
        bench, "calibration_parallel_point", lambda b: 0.1
    )
    monkeypatch.setattr(bench, "host_cpu_times", lambda: next(snaps))
    monkeypatch.setattr(bench, "cgroup_cpu_stat", lambda: None)
    s = bench.Sentinel(spark=None)  # no JVM probe: numpy-only context
    for _ in range(5):
        s.sample()
    rep = s.report()
    assert rep["suspect"] is True
    assert any("steal" in r for r in rep["suspect_reasons"])
    assert rep["host"]["steal_fraction"] == round(2990 / 8990, 5)


def test_sentinel_flags_cgroup_quota_via_throttle_delta(monkeypatch):
    cgs = iter(
        [
            {"nr_throttled": 7, "throttled_s": 1.0},  # __init__
            {"nr_throttled": 500, "throttled_s": 9000.0},  # report()
        ]
    )
    monkeypatch.setattr(bench, "_calibration_array", lambda: None)
    monkeypatch.setattr(bench, "_parallel_bases", lambda: None)
    monkeypatch.setattr(bench, "calibration_point", lambda b: 0.03)
    monkeypatch.setattr(
        bench, "calibration_parallel_point", lambda b: 0.1
    )
    monkeypatch.setattr(bench, "host_cpu_times", lambda: None)
    monkeypatch.setattr(bench, "cgroup_cpu_stat", lambda: next(cgs))
    s = bench.Sentinel(spark=None)
    for _ in range(5):
        s.sample()
    rep = s.report()
    assert rep["suspect"] is True
    assert any("throttled" in r for r in rep["suspect_reasons"])
    assert rep["host"]["cgroup_nr_throttled"] == 493


def test_sentinel_first_spark_sample_is_warmup_excluded(monkeypatch):
    """VERDICT r14 Wrong #2: the first spark-probe sample is residual
    JVM warmup — it must be reported separately (spark_probe_first)
    and excluded from the adjudicated median/max series, so one
    warmup burst cannot flip `suspect` and the tightened 0.5 s bound
    holds on a clean box."""
    import bench

    monkeypatch.setattr(bench, "_calibration_array", lambda: None)
    monkeypatch.setattr(bench, "_parallel_bases", lambda: None)
    monkeypatch.setattr(bench, "calibration_point", lambda b: 0.03)
    monkeypatch.setattr(bench, "calibration_parallel_point", lambda b: 0.1)
    monkeypatch.setattr(bench, "host_cpu_times", lambda: None)
    monkeypatch.setattr(bench, "cgroup_cpu_stat", lambda: None)

    samples = iter([0.96] + [0.12] * 9)  # r14's near-bound first burst
    monkeypatch.setattr(bench, "spark_probe_once", lambda s: next(samples))
    s = bench.Sentinel(spark=object())
    for _ in range(10):
        s.sample()
    rep = s.report()
    assert rep["suspect"] is False, rep["suspect_reasons"]
    cal = rep["calibration_s"]
    assert cal["spark_probe_first"] == 0.96
    assert cal["spark_probe_max"] == 0.12
    assert cal["spark_probe_median"] == 0.12
    assert cal["spark_probe_bound"] == 0.5

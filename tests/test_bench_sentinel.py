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

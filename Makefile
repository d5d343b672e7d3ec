# Round workflow checks (VERDICT r5 ask #6: the off-SF oracle sweep is
# a STANDING check — the t2/q26 scale-robustness fixes, commit 712d76e,
# came out of exactly this sweep catching oracle fragility that a
# single scale factor hides).
#
#   make verify      - everything below (the pre-round-end gate)
#   make test        - pytest suite
#   make oracles     - full registry vs DuckDB under driver conf,
#                      sf0.01 and sf0.1, PLUS an sf0.001 drift sweep
#                      (no budgets — that SF has no recorded times;
#                      VERDICT r8 ask #4: off-SF sweeps have been the
#                      highest-yield bug-finder here)
#   make plan-lint   - forbidden-physical-plan scan
#   make bench       - headline suite at sf0.1 (one JSON line)

PY ?= python

.PHONY: verify test oracles plan-lint bench rotation

# run at round start, right after the driver writes CORRECTNESS_r*.json
# (check_oracles refuses to sweep while ROTATION.json is stale)
rotation:
	$(PY) scripts/update_rotation.py

verify: test oracles plan-lint

test:
	$(PY) -m pytest tests/ -q

oracles:
	$(PY) scripts/check_oracles.py --driver-conf /root/testdata/sf0.01
	$(PY) scripts/check_oracles.py --driver-conf /root/testdata/sf0.1
	$(PY) scripts/check_oracles.py --driver-conf --no-budget /root/testdata/sf0.001

plan-lint:
	$(PY) scripts/plan_lint.py

bench:
	$(PY) bench.py

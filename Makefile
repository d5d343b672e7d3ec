# Round workflow checks (VERDICT r5 ask #6: the off-SF oracle sweep is
# a STANDING check — the t2/q26 scale-robustness fixes, commit 712d76e,
# came out of exactly this sweep catching oracle fragility that a
# single scale factor hides).
#
#   make verify      - everything below (the pre-round-end gate)
#   make test        - pytest suite
#   make oracles     - full registry vs DuckDB under driver conf,
#                      BOTH sf0.01 and sf0.1
#   make plan-lint   - forbidden-physical-plan scan
#   make bench       - headline suite at sf0.1 (one JSON line)

PY ?= python

.PHONY: verify test oracles plan-lint bench

verify: test oracles plan-lint

test:
	$(PY) -m pytest tests/ -q

oracles:
	$(PY) scripts/check_oracles.py --driver-conf /root/testdata/sf0.01
	$(PY) scripts/check_oracles.py --driver-conf /root/testdata/sf0.1

plan-lint:
	$(PY) scripts/plan_lint.py

bench:
	$(PY) bench.py

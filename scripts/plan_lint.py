"""Plan lint: compile every gate query and flag scale-killer physical
plans (CartesianProduct / BroadcastNestedLoopJoin) that are not on the
documented allowlist.

This is the automated form of the ".explain and iterate" discipline in
PLANS.md: a correct result with an all-pairs plan is still a failure
at 100 TB. Compile-only (no actions run) for q/t/d/s/a/sm/p/mm gates;
engine-flow gates (m*) execute real Runners and are skipped — their
write paths are plan-audited in PLANS.md and tests instead.

Usage: python scripts/plan_lint.py [sf_dir]
Exit code = number of violations.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Gates where a nested-loop / cartesian is the INTENDED plan, with the
# written-down reason (see PLANS.md):
ALLOWED = {
    # brute-force exact verification: tiny broadcast query set × one
    # corpus scan; LSH (s2) and IVF (s4) are the scale paths
    "s1_cosine_topk": "BroadcastNestedLoopJoin",
    # same deliberate shape: broadcast query set × one corpus scan with
    # a label-mismatch filter; the corpus-scale path feeds candidates
    # from ivf_topk(centroids=kmeans_fit(...)) instead (PLANS.md s7)
    "s7_hard_negatives": "BroadcastNestedLoopJoin",
    # margin mining runs TWO cosine_topk passes (forward + backward) —
    # the same deliberate brute-force verification shape as s1, with
    # the same ivf_topk candidate feed as the corpus-scale path
    "s8_margin_pairs": "BroadcastNestedLoopJoin",
    # MMR's candidate generation IS s1's brute-force cosine_topk
    # (broadcast 10-query set × one corpus scan); the selection loop
    # itself is per-query bounded. Corpus-scale path: feed candidates
    # from ivfpq_topk/lsh_bucketed_topk instead (PLANS.md s13)
    "s13_mmr_rerank": "BroadcastNestedLoopJoin",
}

# Engine flows (m1..m9) execute real projects — not compile-only. Match
# exactly m<digit> so mm*/future pipeline gates stay linted (ADVICE r2).
SKIP_RE = re.compile(r"^m\d")

BAD_OPERATORS = ("CartesianProduct", "BroadcastNestedLoopJoin")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from sparkt.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    violations = 0
    for name, fn in sorted(entry.queries().items()):
        if SKIP_RE.match(name):
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        bad = [op for op in BAD_OPERATORS if op in plan]
        allowed = ALLOWED.get(name)
        bad = [op for op in bad if op != allowed]
        if bad:
            violations += 1
            print(f"VIOLATION {name}: {','.join(bad)}")
        else:
            note = f" (allowed: {allowed})" if allowed and allowed in plan else ""
            print(f"ok        {name}{note}")
    print(f"\n{violations} violations")
    return violations


if __name__ == "__main__":
    sys.exit(main())

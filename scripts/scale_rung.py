#!/usr/bin/env python3
"""500k-rung scale sweep for the standalone dedup/ANN operators
(VERDICT r14 ask #1): run each operator AT SCALE CONFIGURATION
against a big rung (default ``.testdata/sf10docs`` — 500k distinct
docs + 500k clustered synthetic embeddings, built by
``make_sf1.py --docs-only / --embeddings-only``) and record walls,
result sizes, and plan stability into ``bench_scale.json``.

Two deliberate divergences from the oracle gates:

- the vector near-dup operators (d6 / sd1 / pl2) run CELL-PRUNED
  (``n_cells`` grown with the corpus, ``n_probe`` small) — the
  oracle gates run full-probe, which is provably brute-force-equal
  and therefore O(n²): exactly right for hash-parity at sf0.01,
  exactly wrong at 500k. Scaling law: cells ≈ √n keeps per-cell
  population √n, so within-cell pair work is n^1.5, not n².
- d3/d16/pl4 run the gate configuration unchanged (their banding /
  posting-list shapes already scale; the rung verifies it).

Plan stability = no CartesianProduct / BroadcastNestedLoopJoin in
any executed plan at the rung (recorded per-op, asserted at exit).

Cell scaling law (measured r15): with cells FIXED at the gate's 8
(or even 64) the within-cell pair work is O(n²/cells) — at 500k
vectors the 64-cell config was killed after 40+ min; 256 cells
(~n/2k per cell) completes in minutes. Production rule: cells ≈ √n.

Usage: python scripts/scale_rung.py [sf_dir] [--json-out PATH]
           [--only op1,op2]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = os.path.join(REPO, "bench_scale.json")
    if "--json-out" in argv:
        i = argv.index("--json-out")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    sf_dir = os.path.abspath(
        argv[0] if argv else os.path.join(REPO, ".testdata", "sf10docs")
    )

    from pyspark.sql import functions as F

    from sparkt.functions import dedup as D
    from sparkt.functions import similarity as S
    from sparkt.queries import pipeline as P
    from sparkt.session import get_spark

    spark = get_spark(app_name="scale-rung")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    bad_plans = []

    def run(name, df_thunk, note=""):
        if only is not None and name not in only:
            return
        df = df_thunk() if callable(df_thunk) else df_thunk
        t0 = time.time()
        n = df.count()
        wall = time.time() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        stable = (
            "CartesianProduct" not in plan
            and "BroadcastNestedLoopJoin" not in plan
        )
        if not stable:
            bad_plans.append(name)
        results.append({
            "op": name, "rows": n, "wall_s": round(wall, 1),
            "plan_stable": stable, "note": note,
        })
        print(f"{name:<28}{n:>10} rows {wall:>8.1f}s "
              f"{'OK' if stable else 'UNSTABLE-PLAN'} {note}")

    emb = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    n_corpus = emb.count()

    # --- text/dedup operators at gate configuration (shapes scale)
    run("d3_minhash_pairs",
        lambda: P.d3_minhash_pairs(spark, sf_dir),
        "gate config (banded equijoin)")
    run("d16_simhash_probe",
        lambda: P.d16_simhash_probe(spark, sf_dir),
        "gate config")
    run("pl4_dedup_removal",
        lambda: P.pl4_dedup_removal(spark, sf_dir),
        "gate config (64-bit banded simhash)")

    # --- vector operators CELL-PRUNED (the scale knob the oracle
    # gates deliberately do not turn)
    cells = 256  # pair work = 2n²/cells; 64 cells measured 40+ min
    pairs = S.cosine_neardup_pairs(
        emb, "vec_id", "embedding", 0.35, n_cells=cells, n_probe=2,
    ).localCheckpoint(eager=False)  # d6 and sd1 share ONE pair pass
    run("d6_neardup_cellpruned", pairs,
        f"n_cells={cells}, n_probe=2")
    clusters = D.duplicate_clusters(pairs)
    run("sd1_semdedup_cellpruned",
        clusters.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n_members")
        ),
        f"n_cells={cells}, n_probe=2 + star contraction (pairs reused)")

    q = S.quantize_int8(emb)
    deq = q.select(
        "vec_id",
        F.transform(
            F.col("qvec"), lambda x: x.cast("double") * F.col("scale")
        ).alias("embedding"),
    ).localCheckpoint()
    pl2_pairs = S.cosine_neardup_pairs(
        deq, "vec_id", "embedding", 0.35, n_cells=cells, n_probe=2,
    )
    run("pl2_vector_cellpruned",
        D.duplicate_clusters(pl2_pairs),
        f"int8 quantize + n_cells={cells}, n_probe=2")

    # --- ANN at gate configuration over the 500k corpus (queries are
    # a fixed 10-vector broadcast; corpus side is the scale axis)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    run("s12_ivfpq_topk",
        S.ivfpq_topk(queries, corpus, dim=64, k=5, m=8, n_codes=16,
                     n_cells=8, n_probe=2),
        "gate config (PQ codes + 2-probe)")

    out = {
        "sf_dir": sf_dir,
        "n_corpus_vectors": n_corpus,
        "ops": results,
        "plan_stable_all": not bad_plans,
    }
    with open(json_out, "a") as f:
        f.write(json.dumps(out) + "\n")
    print(f"\nwrote {json_out}; unstable plans: {bad_plans or 'none'}")
    spark.stop()
    return 1 if bad_plans else 0


if __name__ == "__main__":
    raise SystemExit(main())

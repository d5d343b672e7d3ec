#!/usr/bin/env python3
"""ANN recall-at-scale measurement (VERDICT r14 ask #1): recall@k of
the three approximate operators vs exact brute force on a given
embeddings rung. This is the measurement the ANN story lacked — the
oracle gates pin *determinism* (bit-exact ADC, stable tie-breaks); a
recall curve pins *quality*: how much of the true neighborhood the
cell/bucket pruning keeps at a rung where pruning actually prunes.

Ground truth is computed driver-side with numpy (it is a test oracle,
not the operator: 500k x 64 floats = 128 MB, well inside the model-
scale collect policy). Each operator is scored against the ground
truth of ITS OWN metric — ivf/lsh rank by cosine, ivfpq ranks by
asymmetric L2 — so recall isolates the pruning loss, not a metric
mismatch.

Usage: python scripts/ann_recall.py [sf_dir] [n_queries] [k]
Writes JSON to stdout; the sweep wrapper records it in
bench_scale.json / PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ground_truth(vecs, qids, k, metric):
    """Exact top-k neighbor ids per query (self excluded), numpy.
    metric: 'cos' or 'l2'."""
    import numpy as np

    v = vecs.astype(np.float64)
    q = v[qids]
    if metric == "cos":
        n = np.linalg.norm(v, axis=1)
        scores = (q @ v.T) / (n[qids][:, None] * n[None, :])
    else:
        # -L2^2 so argsort-descending gives nearest-first for both
        scores = 2.0 * (q @ v.T) - (v * v).sum(axis=1)[None, :]
    for i, qi in enumerate(qids):
        scores[i, qi] = -np.inf
    idx = np.argpartition(-scores, k, axis=1)[:, : k + 1]
    out = []
    for i in range(len(qids)):
        row = idx[i]
        row = row[np.argsort(-scores[i, row], kind="stable")][:k]
        out.append(set(int(x) for x in row))
    return out


def recall_of(result_df, truth, query_ids, qcol="query_id", ccol="corpus_id"):
    got: dict[int, set[int]] = {int(q): set() for q in query_ids}
    for r in result_df.collect():
        got[int(r[qcol])].add(int(r[ccol]))
    hits = sum(len(got[int(q)] & truth[i]) for i, q in enumerate(query_ids))
    total = sum(len(t) for t in truth)
    return hits / total if total else 0.0


def main():
    sf_dir = os.path.abspath(
        sys.argv[1] if len(sys.argv) > 1 else ".testdata/sf10docs"
    )
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import numpy as np
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from sparkt.functions import similarity as S
    from sparkt.session import get_spark

    spark = get_spark(app_name="ann-recall")
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    vecs = np.vstack(
        [np.asarray(x, dtype=np.float32) for x in tbl["embedding"].to_pylist()]
    )
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    vecs = vecs[order]
    ids = ids[order]
    # queries: a deterministic stride through the corpus (NOT the
    # first n — those share make_sf1's near-dup structure with their
    # neighbors and would overstate easy hits)
    stride = max(1, len(ids) // n_queries)
    qpos = np.arange(0, len(ids), stride)[:n_queries]
    qids = ids[qpos]

    emb = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    qset = [int(x) for x in qids]
    queries = emb.filter(F.col("vec_id").isin(qset)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")

    truth_cos = ground_truth(vecs, qpos, k, "cos")
    truth_l2 = ground_truth(vecs, qpos, k, "l2")
    # map truth positions -> vec_ids
    truth_cos = [set(int(ids[p]) for p in t) for t in truth_cos]
    truth_l2 = [set(int(ids[p]) for p in t) for t in truth_l2]

    out = {"sf_dir": sf_dir, "n_corpus": int(len(ids)),
           "n_queries": int(len(qids)), "k": k, "recall": {}, "wall_s": {}}

    def run(name, fn, truth):
        t0 = time.time()
        r = recall_of(fn(), truth, qids)
        out["recall"][name] = round(r, 4)
        out["wall_s"][name] = round(time.time() - t0, 1)

    cents64 = S.kmeans_fit(emb, k=64, iters=3)
    run("ivf_trained_c64_p8", lambda: S.ivf_topk(
        queries, corpus, dim=64, k=k, n_probe=8, centroids=cents64,
    ), truth_cos)
    run("ivf_trained_c64_p4", lambda: S.ivf_topk(
        queries, corpus, dim=64, k=k, n_probe=4, centroids=cents64,
    ), truth_cos)
    run("lsh_p8", lambda: S.lsh_bucketed_topk(
        queries, corpus, dim=64, k=k, n_planes=8,
    ), truth_cos)
    run("ivfpq_m8_c8_p2", lambda: S.ivfpq_topk(
        queries, corpus, dim=64, k=k, m=8, n_codes=16,
        n_cells=8, n_probe=2,
    ), truth_l2)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

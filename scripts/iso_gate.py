#!/usr/bin/env python3
"""Isolated gate wall measurement: fresh JVM per invocation, one
session-warmup job, then N reps of the gate through the noop sink
(guide §1.4). Sample 1 = cold (Janino codegen + py4j plan build),
min of the rest = warm steady state. Prints one JSON line per gate.

Usage: python scripts/iso_gate.py [--reps N] [--sf-dir DIR] gate [...]
(run one process per gate when a true cold number is needed for more
than one gate).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    argv = sys.argv[1:]
    reps = 3
    sf_dir = "/root/testdata/sf0.1"
    while argv and argv[0].startswith("--"):
        if argv[0] == "--reps":
            reps, argv = int(argv[1]), argv[2:]
        elif argv[0] == "--sf-dir":
            sf_dir, argv = os.path.abspath(argv[1]), argv[2:]
        else:
            print(__doc__, file=sys.stderr)
            return 2
    if not argv:
        print(__doc__, file=sys.stderr)
        return 2

    import __spark_entry__ as entrymod
    from sparkt.session import get_spark

    spark = get_spark(app_name="iso-gate")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # session warmup (the check_oracles convention): JVM/scan init is
    # one-off session cost, not gate cost
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.createDataFrame([(1,)], "x int").groupBy("x").count().collect()
    for name in argv:
        walls = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"iso:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite") \
                .format("noop").save()
            walls.append(round(time.time() - t0, 3))
        print(json.dumps({
            "gate": name, "cold": walls[0],
            "warm": min(walls[1:]) if len(walls) > 1 else None,
            "walls": walls, "sf_dir": sf_dir,
        }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

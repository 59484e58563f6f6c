"""Round-6 auxiliary benchmarks: per-query noop-sink isolation.

bench.py is FROZEN for driver measurement; this harness exists for the
optimization loop (guide §1.4): it times named __spark_entry__ queries
with the noop sink (every column of every row computed, no sink cost,
no count-pruning), min-of-N, labeled jobs.

    python bench_extra.py [--sf DIR] [--repeats N] query [query ...]

Prints one JSON line {"sf": ..., "repeats": N, "queries": {name: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--repeats":
            repeats = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1

    import __spark_entry__ as entrymod
    from onnxtr_spark.session import get_spark

    spark = get_spark("bench_extra", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"sf": sf_dir, "repeats": repeats, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()

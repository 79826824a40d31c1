"""Time a subset of registered queries with the noop sink (bench.py
methodology: min over reps after warm-up) — the per-query isolation
loop of the optimization round.

Usage:
  SPARK_GRAFT_SF_DIR=... python scripts/time_queries.py [-n REPS] [q ...]

With no names, times every registered query. Prints one line per query
plus a sorted summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cloud_volume_spark.operators import all_queries
    from cloud_volume_spark.operators.dedup import clear_cluster_cache
    from cloud_volume_spark.session import get_spark

    spark = get_spark(app_name="cvs-timeq")
    spark.sparkContext.setLogLevel("ERROR")

    resets = {"dedup_clusters": clear_cluster_cache}
    qs = all_queries()
    names = args or list(qs)
    out = {}
    for name in names:
        per = []
        for _ in range(reps):
            if name in resets:
                resets[name]()
            spark.sparkContext.setJobDescription(f"timeq:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            per.append(round(time.perf_counter() - t0, 3))
        out[name] = per
        print(f"{name}: {per} (min {min(per)})", flush=True)
    print("--- sorted by min ---")
    for k, v in sorted(out.items(), key=lambda kv: -min(kv[1])):
        print(f"{min(v):7.3f}  {k}  {v}")
    print("TOTALMIN " + json.dumps(
        {k: min(v) for k, v in out.items()}, separators=(",", ":")))


if __name__ == "__main__":
    main()

"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing = full execution of the query plan with results drained to the
driver via count() on a cached-free plan (no .collect of wide rows; we
force computation with a write-less action).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from incubator_xtable_spark.plans.registry import REGISTRY, _load_all
from incubator_xtable_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("xtable_bench")
    spark.sparkContext.setLogLevel("ERROR")
    _load_all()

    # Warm the JVM/codegen paths once (untimed): the very first query in a
    # fresh JVM otherwise pays multi-second JIT/classloading costs that have
    # nothing to do with the query being measured.
    try:
        warm = REGISTRY["q01_pricing_summary"].fn(spark, sf_dir)
        warm.write.mode("overwrite").format("noop").save()
    except Exception:  # noqa: BLE001
        pass

    timings: dict[str, float] = {}
    t_total0 = time.perf_counter()
    for name, spec in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        try:
            df = spec.fn(spark, sf_dir)
            # noop sink: full execution of every output column, nothing
            # written, no driver-side collect (column pruning would let a
            # bare count() skip the expensive projections)
            df.write.mode("overwrite").format("noop").save()
            timings[name] = round(time.perf_counter() - t0, 4)
            print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# {name}: FAILED {exc}", file=sys.stderr)
    total = round(time.perf_counter() - t_total0, 4)

    print(
        json.dumps(
            {
                "metric": "all_queries_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

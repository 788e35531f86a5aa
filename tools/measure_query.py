"""Per-query measurement helper for optimization rounds (guide §1).

Usage:
    python tools/measure_query.py [--sf DIR] [--reps N] [--explain OUTDIR] q1 q2 ...

Times each named registry query exactly the way bench.py does (fn(spark,
sf_dir) + noop sink) on local[$SPARK_GRAFT_CPUS], optionally several reps
(first rep in a fresh session is the bench-comparable one; later reps show
the warm floor), and optionally writes .explain("formatted") to
<OUTDIR>/<name>_<tag>.txt for the plan audit.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_xtable_spark.plans.registry import REGISTRY, _load_all
from incubator_xtable_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None, help="dir to write explain files")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    spark = get_spark("xtable_measure")
    spark.sparkContext.setLogLevel("ERROR")
    _load_all()

    # same untimed warm-ups as bench.py (JVM codegen + Python worker pool)
    warm = REGISTRY["q01_pricing_summary"].fn(spark, args.sf)
    warm.write.mode("overwrite").format("noop").save()

    def _warm_py(batches):
        yield from batches

    spark.range(0, 32, 1, 32).mapInPandas(_warm_py, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    print(f"# loadavg {os.getloadavg()[0]:.2f} sf={args.sf}")
    for name in args.names:
        spec = REGISTRY[name]
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {times}")
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = spec.fn(spark, args.sf)
            out = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.explain, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(out)
            print(f"  explain -> {path}")


if __name__ == "__main__":
    main()

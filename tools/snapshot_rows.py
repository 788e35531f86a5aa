"""Row-snapshot differential helper for optimization rounds (guide §1:
prove equivalence before moving on).

Usage:
    python tools/snapshot_rows.py --sf DIR --out FILE.json q1 q2 ...
    python tools/snapshot_rows.py --sf DIR --check FILE.json q1 q2 ...

Runs each named registry query, canonicalizes the result (sorted JSON
rows, doubles repr'd exactly), and either writes the snapshot or checks
it against a previously written one. Exit code 1 on any mismatch so a
shell loop can gate a refactor."""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_xtable_spark.plans.registry import REGISTRY, _load_all
from incubator_xtable_spark.session import get_spark


def canon(df) -> dict:
    rows = [[repr(v) for v in row] for row in df.collect()]
    rows.sort()
    blob = json.dumps({"schema": df.schema.simpleString(), "rows": rows})
    return {
        "n": len(rows),
        "schema": df.schema.simpleString(),
        "md5": hashlib.md5(blob.encode()).hexdigest(),
        "head": rows[:3],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--check", default=None)
    args = ap.parse_args()

    spark = get_spark("xtable_snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    _load_all()

    snaps = {}
    for name in args.names:
        snaps[name] = canon(REGISTRY[name].fn(spark, args.sf))
        print(f"# {name}: n={snaps[name]['n']} md5={snaps[name]['md5']}")

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(snaps, fh, indent=1)
        print(f"# wrote {args.out}")
    if args.check:
        with open(args.check) as fh:
            want = json.load(fh)
        bad = [n for n in args.names if want.get(n) != snaps[n]]
        if bad:
            for n in bad:
                print(f"MISMATCH {n}: want {want.get(n)} got {snaps[n]}")
            sys.exit(1)
        print("# all snapshots match")


if __name__ == "__main__":
    main()

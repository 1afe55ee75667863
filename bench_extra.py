"""Round-8 optimization measurement harness (bench.py is FROZEN — this
file exists so the round's before/after numbers and plan captures never
touch the driver-timed harness).

Per query it can:
  * time `df.count()` (the frozen bench's methodology) best-of-N,
  * time a noop sink (`df.write.format("noop")`) best-of-N — guide §1.4,
    isolating computation cost of EVERY column from the count shortcut,
  * dump `.explain("formatted")` to plans/r08/<query>_<tag>.txt.

Usage:
  python bench_extra.py [--sf DIR] [--trials N] [--tag before|after]
                        [--plans] [--noop] [query ...]

Defaults: sf = $SPARK_GRAFT_SF_DIR or /root/testdata/sf1.0 (the driver's
measured scale), trials = 2, all headline queries.
Prints one JSON line {"queries": {name: best_count_sec}, ...}.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf1.0"))
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--tag", default=None,
                    help="when set, dump plans to plans/r08/<q>_<tag>.txt")
    ap.add_argument("--noop", action="store_true",
                    help="also time the noop sink per query")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench as benchmod
    from medacy_spark import contract
    from medacy_spark.session import get_spark

    names = args.queries or list(benchmod.HEADLINE)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_extra_r08", cores=cpus)
    qs = contract.queries()

    warm_dir = "/root/testdata/sf0.001"
    if not args.no_warm and os.path.isdir(warm_dir):
        spark.sparkContext.setJobDescription("warmup sf0.001")
        for name in names:
            qs[name](spark, warm_dir).count()

    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "plans", "r08")
    if args.tag:
        os.makedirs(plan_dir, exist_ok=True)

    count_t: dict[str, float] = {}
    noop_t: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        if args.tag:
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan_of(fn(spark, args.sf)))
        for _ in range(args.trials):
            spark.sparkContext.setJobDescription(f"{name}: count")
            t0 = time.monotonic()
            fn(spark, args.sf).count()
            sec = round(time.monotonic() - t0, 3)
            if name not in count_t or sec < count_t[name]:
                count_t[name] = sec
            if args.noop:
                spark.sparkContext.setJobDescription(f"{name}: noop")
                t0 = time.monotonic()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                sec = round(time.monotonic() - t0, 3)
                if name not in noop_t or sec < noop_t[name]:
                    noop_t[name] = sec
        print(f"# {name}: count={count_t[name]}"
              + (f" noop={noop_t[name]}" if args.noop else ""),
              file=sys.stderr)

    out = {"sf": args.sf, "cpus": cpus, "trials": args.trials,
           "queries": count_t}
    if args.noop:
        out["noop"] = noop_t
    out["total"] = round(sum(count_t.values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

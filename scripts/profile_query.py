#!/usr/bin/env python
"""Per-query optimization profiler (round 13).

For each named query: warm run, then a timed noop-sink run (bench
discipline) recording wall seconds, the number of Spark JOBS and STAGES
the action submitted (statusTracker deltas — the fixed-latency currency
at bench SF), Exchange / BroadcastExchange / *EvalPython node counts
from the formatted plan, and optionally the plan text itself to
plans/r13/<name>_<tag>.txt.

Usage: python scripts/profile_query.py [--sf DIR] [--tag before|after]
           [--plans] query [query ...]
"""

from __future__ import annotations

import argparse
import io
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--round", default="r14", help="plans/<round>/ output dir")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from bench import clear_cached_state, timed_query_run
    from firmable_company_data_pipeline_spark import get_spark

    spark = get_spark("profile-r13")
    qs = entrymod.queries()
    tracker = spark.sparkContext.statusTracker()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.round)
    os.makedirs(out_dir, exist_ok=True)

    spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()
    spark.range(64).repartition(64).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    rows = []
    for name in args.queries:
        fn = qs[name]
        # timed minimum over 2 passes, bench discipline (warm inside)
        secs, err = timed_query_run(spark, fn, args.sf, passes=2)
        if err:
            print(f"{name}: ERROR {err}")
            continue
        # separate instrumented run for job/stage counts
        clear_cached_state(spark)
        jobs0 = len(tracker.getJobIdsForGroup(None))
        t0 = time.time()
        df = fn(spark, args.sf)
        build_s = round(time.time() - t0, 3)
        df.write.format("noop").mode("overwrite").save()
        jobs1 = len(tracker.getJobIdsForGroup(None))
        ptxt = plan_text(fn(spark, args.sf))
        n_ex = ptxt.count("Exchange")
        n_bc = ptxt.count("BroadcastExchange")
        n_py = ptxt.count("EvalPython") + ptxt.count("MapInArrow") + ptxt.count("MapInPandas")
        if args.plans:
            with open(os.path.join(out_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(ptxt)
        rows.append(
            dict(
                name=name,
                secs=secs,
                build_s=build_s,
                jobs=jobs1 - jobs0,
                exchanges=n_ex - n_bc,
                broadcasts=n_bc,
                python_nodes=n_py,
            )
        )
        print(json.dumps(rows[-1]), flush=True)
        clear_cached_state(spark)
    print("== summary ==")
    for r in sorted(rows, key=lambda r: -r["secs"]):
        print(
            f"{r['name']:40s} {r['secs']:7.3f}s build={r['build_s']:6.3f}s "
            f"jobs={r['jobs']:3d} ex={r['exchanges']:2d} bc={r['broadcasts']:2d} py={r['python_nodes']}"
        )


if __name__ == "__main__":
    main()

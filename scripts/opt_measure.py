#!/usr/bin/env python
"""Round-16 optimization harness: time named queries in isolation with
the noop sink (guide §1.4) and optionally dump .explain("formatted")
to plans/r16/<name>_<tag>.txt (guide §7.2).

Usage:
  python scripts/opt_measure.py [--reps N] [--sf DIR] [--plan TAG] name ...
  python scripts/opt_measure.py --top 15          # 15 slowest from BENCH_r15

Prints one line per query: median / min / max over N reps after one
warm pass, plus Exchange / BatchEvalPython node counts from the plan.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tb_scale_spatial_data_pipeline_spark.plans import all_queries
from tb_scale_spatial_data_pipeline_spark.session import get_spark


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_stats(txt: str) -> str:
    ex = len(re.findall(r"\bExchange\b", txt))
    py = len(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow)", txt))
    smj = len(re.findall(r"\bSortMergeJoin\b", txt))
    bhj = len(re.findall(r"\bBroadcastHashJoin\b", txt))
    bnl = len(re.findall(r"\bBroadcastNestedLoopJoin\b", txt))
    cart = len(re.findall(r"\bCartesianProduct\b", txt))
    return f"ex={ex} py={py} smj={smj} bhj={bhj} bnl={bnl} cart={cart}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plan", default=None, help="write plans/<plandir>/<name>_<TAG>.txt")
    ap.add_argument("--plandir", default="r17", help="subdir of plans/ for --plan dumps")
    ap.add_argument("--top", type=int, default=0, help="N slowest from BENCH_r15")
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        b = json.load(open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_r15.json")))
        q = b["parsed"]["queries"]
        names += [k for k, _ in sorted(q.items(), key=lambda kv: -kv[1])[: args.top] if k not in names]

    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.plandir)
    os.makedirs(plan_dir, exist_ok=True)

    results = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"opt:{name}")
        if args.plan:
            txt = plan_text(fn(spark, args.sf))
            with open(os.path.join(plan_dir, f"{name}_{args.plan}.txt"), "w") as f:
                f.write(txt)
            stats = plan_stats(txt)
        else:
            stats = ""
        if args.reps == 0:  # plan-only mode
            print(f"{name:42s} plan captured  {stats}", flush=True)
            continue
        ts = []
        for _ in range(args.reps + 1):  # first rep = warm pass, dropped
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        ts = ts[1:]
        med = statistics.median(ts)
        results[name] = round(min(ts), 3)
        print(f"{name:42s} med={med:7.3f} min={min(ts):7.3f} max={max(ts):7.3f}  {stats}", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

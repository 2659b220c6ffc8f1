#!/usr/bin/env python
"""Stage-level census for the optimization round: run queries with the
Spark UI enabled and report, per query, the stages whose executor run
time is large relative to their task count — the straggler/serial-stage
detector the wall clock on a noisy box cannot provide (guide §7.1).

Usage: python scripts/stage_census.py [--sf DIR] [--min-sec 0.5] name ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tb_scale_spatial_data_pipeline_spark.plans import all_queries
from tb_scale_spatial_data_pipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--min-sec", type=float, default=0.5)
    args = ap.parse_args()

    spark = get_spark("census", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
    queries = all_queries()

    def stages():
        return json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete"
            )
        )

    for name in args.names:
        fn = queries[name]
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()  # warm
        before = {s["stageId"] for s in stages()}
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        new = [s for s in stages() if s["stageId"] not in before]
        tot = sum(s.get("executorRunTime", 0) for s in new) / 1000.0
        print(f"\n== {name}: {len(new)} stages, {tot:.1f} executor-sec")
        for s in sorted(new, key=lambda s: -s.get("executorRunTime", 0)):
            dur = s.get("executorRunTime", 0) / 1000.0
            if dur < args.min_sec:
                continue
            print(
                f"  stage {s['stageId']:4d} exec={dur:6.2f}s tasks={s['numCompleteTasks']:3d}"
                f" in={s.get('inputRecords', 0):8d} sr={s.get('shuffleReadRecords', 0):8d}"
                f" sw={s.get('shuffleWriteRecords', 0):8d}"
            )


if __name__ == "__main__":
    main()

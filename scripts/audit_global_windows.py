#!/usr/bin/env python
"""Audit: which registry queries plan a single-partition WindowExec
whose input subtree reaches a table scan with NO reducing operator
(aggregate / limit) in between — the one shape that cannot survive a
100x scale-up (round-6 verdict items 1-5).

Usage: python scripts/audit_global_windows.py [sf_dir] [name ...]
Prints one line per flagged query; exit 0 always (report, not gate —
the pytest version gates with a justified whitelist).
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tb_scale_spatial_data_pipeline_spark.plans import all_queries
from tb_scale_spatial_data_pipeline_spark.session import get_spark


def _children(node) -> list:
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        return [node.initialPlan()]
    out = []
    it = node.children().iterator()
    while it.hasNext():
        out.append(it.next())
    return out


_SCAN_MARKS = (
    "FileSourceScan",
    "BatchScan",
    "RowDataSourceScan",
    "RDDScan",  # localCheckpoint of raw data
)
_REDUCE_MARKS = ("Aggregate", "TakeOrderedAndProject", "Limit", "Window")
# "Window" as a reducer mark: a global window ABOVE another window is
# audited when the inner one is visited; counting it once is enough.


def _reaches_raw_scan(node) -> bool:
    name = node.getClass().getSimpleName()
    if any(m in name for m in _REDUCE_MARKS):
        return False
    if any(m in name for m in _SCAN_MARKS):
        return True
    return any(_reaches_raw_scan(c) for c in _children(node))


def raw_global_windows(root) -> list[str]:
    """simpleStrings of every zero-partition WindowExec whose input
    subtree hits a scan with no reducing node on the path."""
    bad = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "WindowExec" and node.partitionSpec().isEmpty():
            if any(_reaches_raw_scan(c) for c in _children(node)):
                bad.append(node.simpleStringWithNodeId())
        for c in _children(node):
            walk(c)

    walk(root)
    return bad


def audit(spark, name: str, fn, sf_dir: str) -> list[str] | None:
    df = fn(spark, sf_dir)
    root = df._jdf.queryExecution().executedPlan()
    return raw_global_windows(root)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:]
    spark = get_spark("window-audit")
    qs = all_queries()
    todo = names or list(qs)
    flagged = 0
    for name in todo:
        try:
            bad = audit(spark, name, qs[name], sf_dir)
        except Exception:
            print(f"ERR  {name}: {traceback.format_exc(limit=1).splitlines()[-1]}")
            continue
        if bad:
            flagged += 1
            print(f"FLAG {name}: {bad[0][:160]}")
    print(f"-- {flagged} flagged / {len(todo)} audited")


def all_global_windows(root) -> list[str]:
    """Every zero-partition WindowExec with the first reducing/scan
    node found below it (for grain triage, not gating)."""
    out = []

    def first_marker(node):
        name = node.getClass().getSimpleName()
        if any(m in name for m in _REDUCE_MARKS) or any(
            m in name for m in _SCAN_MARKS
        ):
            return name
        for c in _children(node):
            m = first_marker(c)
            if m:
                return m
        return None

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "WindowExec" and node.partitionSpec().isEmpty():
            marks = [first_marker(c) or "?" for c in _children(node)]
            out.append("+".join(marks))
        for c in _children(node):
            walk(c)

    walk(root)
    return out


if __name__ == "__main__":
    main()

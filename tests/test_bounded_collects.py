"""Registry-wide bounded-collect invariant (VERDICT r14 item 7).

Driver-side materialization is the one place a distributed plan can
silently go data-scaled: a `.collect()` that once grabbed a 32-row
candidate set can become quadratic when someone bumps a constant. This
test turns the per-site comments into an enforced invariant:

every `.collect()` / `.toPandas()` call in the package must be one of
  (a) a scalar extraction (`.collect()[0]` / `.first()` shape),
  (b) an explicitly `.limit(...)`-bounded chain, or
  (c) annotated with `# bounded:` on its line or the line above,
    stating the ceiling;
and the named ceilings themselves must stay under declared maxima.
"""

from __future__ import annotations

import ast
import glob
import os

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tb_scale_spatial_data_pipeline_spark",
)

# Named driver-side ceilings: bumping one of these past its declared
# maximum is an API-review event, not a constant tweak — the collect
# sites that cite them are quadratic (MMR sim matrix) or multiplicative
# (IVF probe fan-out) in the constant.
CEILINGS = {
    ("plans.vector_queries", "_MMR_CANDS"): 64,
    ("plans.pq_queries", "IVFPQ_NPROBE"): 8,
}


def _chain_has_limit(node: ast.Call) -> bool:
    """True if the attribute chain feeding this call contains
    .limit(...) — a structural bound on collected rows."""
    cur = node.func.value
    while True:
        if isinstance(cur, ast.Call):
            f = cur.func
            if isinstance(f, ast.Attribute) and f.attr == "limit":
                return True
            cur = f.value if isinstance(f, ast.Attribute) else None
        elif isinstance(cur, ast.Attribute):
            cur = cur.value
        else:
            return False
        if cur is None:
            return False


def _scan_source(src: str, rel: str) -> list[str]:
    """Return offender strings for unbounded collect sites in one file's
    source. Factored out of the test so the reporting path itself is
    exercisable on a known-bad fixture (ADVICE r15)."""
    offenders = []
    lines = src.splitlines()
    tree = ast.parse(src)
    parents: dict[ast.AST, ast.AST] = {}
    for n in ast.walk(tree):
        for c in ast.iter_child_nodes(n):
            parents[c] = n
    for n in ast.walk(tree):
        if not (
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and n.func.attr in ("collect", "toPandas")
        ):
            continue
        if isinstance(parents.get(n), ast.Subscript):
            continue  # .collect()[0] scalar shape
        if _chain_has_limit(n):
            continue  # .limit(k).collect()
        # the chain may span lines: accept a "bounded:" annotation
        # anywhere in the call's source span or on the line above
        lo = max(0, n.lineno - 2)
        hi = (n.end_lineno or n.lineno) + 1
        if any("bounded:" in ln for ln in lines[lo:hi]):
            continue
        offenders.append(f"{rel}:{n.lineno}: {lines[n.lineno - 1].strip()[:90]}")
    return offenders


def test_every_collect_site_is_bounded():
    offenders = []
    for path in sorted(glob.glob(f"{PKG}/**/*.py", recursive=True)):
        offenders.extend(
            _scan_source(open(path).read(), os.path.relpath(path, PKG))
        )
    assert offenders == [], (
        "unbounded/unannotated driver-side collect sites:\n"
        + "\n".join(offenders)
    )


def test_scanner_reports_known_offender():
    """Self-test of the offender path: a known-unbounded collect must be
    flagged with file:line and the offending source line, and the three
    accepted shapes must pass."""
    bad = "rows = df.filter(c > 0).collect()\n"
    out = _scan_source(bad, "fake.py")
    assert out == ["fake.py:1: rows = df.filter(c > 0).collect()"]

    good = (
        "a = df.collect()[0]\n"
        "b = df.limit(10).collect()\n"
        "# bounded: 64-row candidate set\n"
        "c = df.toPandas()\n"
    )
    assert _scan_source(good, "fake.py") == []


def test_named_ceilings_hold():
    import importlib

    for (mod, name), ceiling in CEILINGS.items():
        m = importlib.import_module(f"tb_scale_spatial_data_pipeline_spark.{mod}")
        val = getattr(m, name)
        assert val <= ceiling, f"{mod}.{name} = {val} > declared ceiling {ceiling}"

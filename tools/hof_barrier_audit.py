"""Static scanner for the Catalyst expression re-evaluation trap.

Round-13 finding: a COMPUTED array expression bound to a local name and
then referenced several times in the same projection (``size(cuts)``,
``transform(cuts, ...)``, ``element_at(cuts, ...)`` inside the lambda)
is re-inlined PER REFERENCE by CollapseProject — the anchored
segmentation re-ran its O(n) anchor scan O(n/8) times per doc until a
Generate barrier (``explode(array(expr))``) materialized it once
(80-90s -> 21.7s at the 5M-doc stress shape, identical output). The
tokenizer variant of this gotcha was known since r6; this tool hunts
the whole CLASS so the next instance is caught at review time, not at
a stress probe.

Heuristic (AST, per function body):

1. collect local assignments ``name = <expr>`` whose RHS calls an
   expression-BUILDING pyspark function (transform/filter/aggregate/
   sequence/concat/slice/zip_with/array_*/when/split/...) — i.e. the
   RHS is a Catalyst expression tree, not a materialized column
   (``F.col(...)``/DataFrame references are exempt);
2. count later ``Name`` references to it inside the SAME function;
3. flag names referenced >= FLAG_REFS times — each reference inlines
   the whole tree, and >= 3 references of a non-trivial builder is
   exactly the shape that bit the anchored cuts.

False positives are expected (a cheap literal/one-op expression costs
nothing to inline; references on different DataFrames never share a
projection) — the output is a REVIEW LIST with the RHS summary, not a
gate. Known-accepted sites live in ALLOWED with a reason each.

Usage: python tools/hof_barrier_audit.py [package_dir]
Exit code 0 always (advisory); prints one line per finding.
"""

from __future__ import annotations

import ast
import os
import sys

#: pyspark.sql.functions callables whose result is a computed Catalyst
#: expression tree worth counting references of.
BUILDERS = {
    "transform", "filter", "aggregate", "exists", "forall", "reduce",
    "zip_with", "sequence", "slice", "concat", "array", "array_sort",
    "array_compact", "array_distinct", "array_repeat", "arrays_zip",
    "split", "when", "flatten", "map_from_arrays", "expr",
}

#: Calls that MATERIALIZE rather than build (references to these are
#: cheap): reading a column, a literal, a DataFrame method result.
EXEMPT = {"col", "lit", "broadcast", "table", "createDataFrame"}

#: Minimum later-references for a finding.
FLAG_REFS = 3

#: (file suffix, function, name) -> reason, for sites reviewed by hand.
ALLOWED = {
    ("operators/similarity.py", "jl_project", "e"):
        "reviewed r13: the three references (size(e) x2 + e) inline the "
        "O(dim) fixpoint transform 3x per row BEFORE the explode barrier "
        "that the expensive per-plane aggregates read — a bounded 3x on "
        "the cheap step, not the O(n^2) class; the barrier is already "
        "where it matters",
}


def _call_name(node: ast.Call) -> str | None:
    f = node.func
    if isinstance(f, ast.Attribute):
        return f.attr
    if isinstance(f, ast.Name):
        return f.id
    return None


def _root_is_column_expr(node: ast.AST) -> bool:
    """True only when the RHS ROOT is an ``F.<builder>(...)`` call (or a
    bare builder name) — i.e. the local is a Catalyst COLUMN expression
    tree. DataFrame method chains (``t['orders'].filter(...)``,
    ``x.transform(scoped_persist)``) are excluded: referencing a
    DataFrame reuses its plan; only column expressions are re-inlined
    per reference. Lambdas and literals are excluded too."""
    if not isinstance(node, ast.Call):
        return False
    f = node.func
    if isinstance(f, ast.Attribute) and isinstance(f.value, ast.Name):
        if f.value.id in ("F", "funcs", "sf") and f.attr in BUILDERS:
            return True
        return False
    if isinstance(f, ast.Name) and f.id in BUILDERS:
        return True
    return False


def scan_function(path: str, fn: ast.FunctionDef) -> list[tuple]:
    findings = []
    assigns: dict[str, tuple[int, str]] = {}
    for node in fn.body:
        for stmt in ast.walk(node):
            if isinstance(stmt, ast.Assign) and len(stmt.targets) == 1:
                tgt = stmt.targets[0]
                if isinstance(tgt, ast.Name) and _root_is_column_expr(stmt.value):
                    assigns[tgt.id] = (
                        stmt.lineno,
                        ast.unparse(stmt.value)[:80],
                    )
    if not assigns:
        return findings
    refs: dict[str, int] = {name: 0 for name in assigns}
    for node in ast.walk(fn):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            if node.id in refs:
                refs[node.id] += 1
    for name, count in refs.items():
        if count >= FLAG_REFS:
            lineno, rhs = assigns[name]
            findings.append((path, fn.name, name, lineno, count, rhs))
    return findings


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "arcane_framework_spark",
    )
    findings = []
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            tree = ast.parse(open(path, encoding="utf-8").read())
            for node in ast.walk(tree):
                if isinstance(node, ast.FunctionDef):
                    findings.extend(scan_function(path, node))
    n_allowed = 0
    for path, fn, name, lineno, count, rhs in findings:
        key = None
        for (suffix, a_fn, a_name), reason in ALLOWED.items():
            if path.endswith(suffix) and fn == a_fn and name == a_name:
                key = reason
        if key is not None:
            n_allowed += 1
            continue
        rel = os.path.relpath(path)
        print(f"REVIEW {rel}:{lineno} {fn}(): '{name}' referenced "
              f"{count}x — rhs: {rhs}")
    print(f"{len(findings) - n_allowed} site(s) to review "
          f"({n_allowed} allowed)")


if __name__ == "__main__":
    main()

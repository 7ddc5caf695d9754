#!/usr/bin/env python
"""Dependency-free lint gate (runs in any environment, no pip installs).

Covers the always-enforceable subset of the CI ruff config: syntax validity,
unused imports, trailing whitespace, tabs, and overlong lines. The role is
the reference's cppcheck/clang-format pre-commit stage
(/root/reference/.pre-commit-config.yaml:26-40) for a pure-Python tree.

Usage: python tools/lint.py [paths...]   (default: the package + tests)
Exit code 1 when any finding is reported.
"""

import ast
import sys
from pathlib import Path

MAX_LINE = 100
DEFAULT_PATHS = ["ilqr_planner_tpu", "PyLQR", "tests", "examples", "tools",
                 "bench.py", "bench_table.py", "__graft_entry__.py"]


def iter_py(paths):
    for p in paths:
        p = Path(p)
        if p.is_dir():
            yield from sorted(p.rglob("*.py"))
        elif p.suffix == ".py":
            yield p


class ImportUseScanner(ast.NodeVisitor):
    """Collects imported names and every name/attribute-root used."""

    def __init__(self):
        self.imports = {}  # name -> lineno
        self.used = set()

    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imports[name] = node.lineno

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name == "*":
                continue
            self.imports[a.asname or a.name] = node.lineno

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def lint_file(path: Path):
    findings = []
    text = path.read_text()
    try:
        tree = ast.parse(text, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    sc = ImportUseScanner()
    sc.visit(tree)
    # __init__ re-exports and __all__-listed names are intentional.
    exported = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    if isinstance(node.value, (ast.List, ast.Tuple)):
                        exported |= {getattr(e, "value", None)
                                     for e in node.value.elts}
    lines = text.splitlines()
    if path.name != "__init__.py":
        for name, lineno in sorted(sc.imports.items(), key=lambda kv: kv[1]):
            if "noqa" in lines[lineno - 1]:
                continue
            if name not in sc.used and name not in exported:
                findings.append(f"{path}:{lineno}: unused import '{name}'")

    for i, line in enumerate(text.splitlines(), 1):
        if line.rstrip() != line:
            findings.append(f"{path}:{i}: trailing whitespace")
        if "\t" in line:
            findings.append(f"{path}:{i}: tab character")
        if len(line) > MAX_LINE:
            findings.append(f"{path}:{i}: line too long ({len(line)} > {MAX_LINE})")
    return findings


def main(argv):
    paths = argv[1:] or DEFAULT_PATHS
    findings = []
    n = 0
    for f in iter_py(paths):
        n += 1
        findings += lint_file(f)
    for msg in findings:
        print(msg)
    print(f"lint: {n} files, {len(findings)} findings")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))

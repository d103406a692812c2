#!/usr/bin/env python
"""Self-contained lint for zen-tpu (reference analog: the clang-format
+ cppclean targets, CMakeLists.txt:64-84, libzen/CMakeLists.txt:165-175;
this image ships no Python linter, so the checks that matter are done
with ast directly).

Checks:
  * syntax (ast.parse) over every tracked .py file
  * unused imports (name never referenced in the module)
  * accidental `print(` in zen_tpu/ library modules outside the CLI
    and apps layers (stdout belongs to the CLI contract)
  * tabs / trailing whitespace

Usage: python scripts/lint.py   (exit 1 on findings)
"""
from __future__ import annotations

import ast
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PRINT_ALLOWED = (
    "zen_tpu/cli.py",
    "zen_tpu/apps/",
    "zen_tpu/runtime/profiling.py",  # bench-facing reporting helpers
)


def tracked_py():
    out = subprocess.run(
        ["git", "-C", REPO, "ls-files", "*.py"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return [line for line in out.splitlines() if line]


class ImportCollector(ast.NodeVisitor):
    def __init__(self):
        self.imports = {}  # name -> (lineno, stated)
        self.used = set()

    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imports[name] = node.lineno
        self.generic_visit(node)

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name == "*":
                continue
            self.imports[a.asname or a.name] = node.lineno
        self.generic_visit(node)

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def check_file(rel):
    path = os.path.join(REPO, rel)
    try:
        src = open(path, encoding="utf-8").read()
    except OSError as e:
        return [f"{rel}: unreadable: {e}"]
    problems = []
    try:
        tree = ast.parse(src, filename=rel)
    except SyntaxError as e:
        return [f"{rel}:{e.lineno}: syntax error: {e.msg}"]

    col = ImportCollector()
    col.visit(tree)
    is_init = os.path.basename(rel) == "__init__.py"
    # string-mentioned names count as used (doctests, __all__, noqa-ish)
    text_rest = src
    for name, lineno in sorted(col.imports.items(), key=lambda kv: kv[1]):
        if is_init:  # __init__ imports are re-exports by convention
            break
        if name in col.used or name == "annotations":
            continue
        # crude but effective: any other textual mention passes
        if text_rest.count(name) > 1:
            continue
        problems.append(f"{rel}:{lineno}: unused import '{name}'")

    if rel.startswith("zen_tpu/") and not any(
        rel.startswith(p) or rel == p for p in PRINT_ALLOWED
    ):
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id == "print"
                # stderr diagnostics are fine — the contract protects
                # stdout (CLI metric lines / pipe-mode audio)
                and not any(
                    kw.arg == "file"
                    and isinstance(kw.value, ast.Attribute)
                    and kw.value.attr == "stderr"
                    for kw in node.keywords
                )
            ):
                problems.append(
                    f"{rel}:{node.lineno}: print() in library module "
                    "(stdout belongs to the CLI contract)"
                )

    for i, line in enumerate(src.splitlines(), 1):
        if "\t" in line:
            problems.append(f"{rel}:{i}: tab character")
        if line != line.rstrip():
            problems.append(f"{rel}:{i}: trailing whitespace")
    return problems


def main() -> int:
    problems = []
    for rel in tracked_py():
        problems.extend(check_file(rel))
    for p in problems:
        print(p)
    print(
        f"lint: {len(problems)} finding(s) over {len(tracked_py())} files"
    )
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())

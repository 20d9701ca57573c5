"""Stdlib lint gate (no third-party linters are installable here).

Matches the spirit of the reference's pre-commit hygiene
(/root/reference/.pre-commit-config.yaml:9-50: black/isort/pylint) with
what the stdlib can enforce:

  * syntax (ast.parse)
  * unused imports (module scope; names used anywhere in the file count,
    `# noqa` and __init__.py re-exports exempt)
  * tabs in indentation, trailing whitespace, CRLF line endings
  * line length > 88 (black's default; URLs/paths in comments exempt)
  * accidental debugging: breakpoint()/pdb.set_trace() calls
  * file ends with exactly one newline

Run: python scripts/lint.py [paths...]   (defaults to the package + tests
+ scripts + repo-root entry points).  Exit 1 on any finding.
"""

from __future__ import annotations

import ast
import os
import sys

MAX_LEN = 88
DEFAULT_TARGETS = [
    "understanding_flow_robustness_tpu",
    "tests",
    "scripts",
    "setup",
    "bench.py",
    "__graft_entry__.py",
]


def iter_py(paths):
    for p in paths:
        if os.path.isfile(p) and p.endswith(".py"):
            yield p
        elif os.path.isdir(p):
            for root, _, files in os.walk(p):
                for f in sorted(files):
                    if f.endswith(".py"):
                        yield os.path.join(root, f)


def unused_imports(tree: ast.AST, source: str, is_init: bool) -> list:
    """(lineno, name) pairs for module-level imports never referenced."""
    if is_init:
        return []  # re-export facades import intentionally
    imported: dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    continue
                imported[a.asname or a.name] = node.lineno
    if not imported:
        return []
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            base = node
            while isinstance(base, ast.Attribute):
                base = base.value
            if isinstance(base, ast.Name):
                used.add(base.id)
    # names referenced in __all__ strings or noqa-marked lines stay
    lines = source.splitlines()
    out = []
    for name, lineno in sorted(imported.items(), key=lambda kv: kv[1]):
        if name in used or name == "annotations":
            continue
        if f'"{name}"' in source or f"'{name}'" in source:
            continue
        if lineno <= len(lines) and "noqa" in lines[lineno - 1]:
            continue
        out.append((lineno, name))
    return out


def lint_file(path: str) -> list:
    findings = []
    with open(path, "rb") as f:
        raw = f.read()
    if b"\r\n" in raw:
        findings.append((0, "CRLF line endings"))
    source = raw.decode("utf-8", errors="replace")
    try:
        tree = ast.parse(source)
    except SyntaxError as e:
        return [(e.lineno or 0, f"syntax error: {e.msg}")]

    lines = source.splitlines()
    for i, line in enumerate(lines, 1):
        stripped = line.rstrip("\n")
        if stripped != stripped.rstrip():
            findings.append((i, "trailing whitespace"))
        indent = stripped[: len(stripped) - len(stripped.lstrip())]
        if "\t" in indent:
            findings.append((i, "tab in indentation"))
        if len(stripped) > MAX_LEN and "noqa" not in stripped:
            # long strings holding URLs/paths are unreadable when wrapped
            if "http://" not in stripped and "https://" not in stripped:
                findings.append((i, f"line too long ({len(stripped)})"))
    if raw and not raw.endswith(b"\n"):
        findings.append((len(lines), "missing trailing newline"))
    if raw.endswith(b"\n\n\n"):
        findings.append((len(lines), "multiple trailing blank lines"))

    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            fn = node.func
            if isinstance(fn, ast.Name) and fn.id == "breakpoint":
                findings.append((node.lineno, "breakpoint() call"))
            if (isinstance(fn, ast.Attribute) and fn.attr == "set_trace"):
                findings.append((node.lineno, "pdb.set_trace() call"))

    is_init = os.path.basename(path) == "__init__.py"
    for lineno, name in unused_imports(tree, source, is_init):
        findings.append((lineno, f"unused import: {name}"))
    return sorted(findings)


def main(argv=None):
    targets = (argv or sys.argv[1:]) or DEFAULT_TARGETS
    n_files = 0
    n_findings = 0
    for path in iter_py(targets):
        n_files += 1
        for lineno, msg in lint_file(path):
            print(f"{path}:{lineno}: {msg}")
            n_findings += 1
    print(f"lint: {n_files} files, {n_findings} findings", file=sys.stderr)
    return 1 if n_findings else 0


if __name__ == "__main__":
    sys.exit(main())

"""Static hygiene checks (the reference runs clang-tidy/sanitizer configs on
its CUDA sources; no python linter ships in this image, so this is a
self-contained AST substitute): every library module parses, imports are
used, and no tabs / trailing whitespace creep in.
"""

import ast
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
SOURCES = sorted((ROOT / "gato_tpu").rglob("*.py")) + [
    ROOT / "bench.py", ROOT / "__graft_entry__.py"]


def _imported_names(tree):
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                yield a, (a.asname or a.name.split(".")[0])
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name != "*":
                    yield a, (a.asname or a.name)


def _used_names(tree):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    return used


def test_sources_parse_and_imports_used():
    problems = []
    for path in SOURCES:
        tree = ast.parse(path.read_text(), filename=str(path))
        if path.name == "__init__.py":
            continue  # re-export surface
        used = _used_names(tree)
        for alias, bound in _imported_names(tree):
            if bound not in used and bound != "annotations":
                problems.append(f"{path.relative_to(ROOT)}: unused import "
                                f"'{bound}'")
    assert not problems, "\n".join(problems)


def test_no_tabs_or_trailing_whitespace():
    problems = []
    for path in SOURCES:
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if "\t" in line:
                problems.append(f"{path.relative_to(ROOT)}:{i}: tab")
            if line != line.rstrip():
                problems.append(
                    f"{path.relative_to(ROOT)}:{i}: trailing whitespace")
    assert not problems, "\n".join(problems)

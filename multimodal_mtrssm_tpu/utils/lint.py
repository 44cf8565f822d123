"""Minimal in-repo static checks (AST-based).

The reference enforces ruff + mypy + pydoclint gates (reference
``pyproject.toml:73-97``); this build image has no lint tools installed and
no network, so this module implements the always-runnable subset natively:

- syntax (files must parse),
- F401: imports that are never used (module scope, ``__init__`` re-exports
  and ``__all__`` names exempt),
- F811: a name imported twice in the same module scope,
- E501: lines longer than the configured ruff ``line-length`` (110),
- E711/E712: ``== None`` / ``== True`` style comparisons,
- F632: ``is`` comparisons against str/number/tuple literals,
- W605: invalid escape sequences in non-raw string literals,
- D103 subset (pydoclint-lite): public module-level functions and classes
  inside the package must carry docstrings.

``tests/test_static_gates.py`` runs these on every test invocation and
additionally shells out to real ``ruff``/``mypy`` when they exist.
"""

from __future__ import annotations

import ast
import io
import re
import tokenize
from pathlib import Path

# Mirrors [tool.ruff] line-length in pyproject.toml.
MAX_LINE_LENGTH = 110

# Escapes the tokenizer accepts silently (string prefix not r/b).
_VALID_ESCAPES = frozenset("\n\\'\"abfnrtv01234567xNuU")


def _used_names(tree: ast.AST) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # record the root of dotted access (np.foo → np)
            n: ast.AST = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    return used


def _exported_names(tree: ast.Module) -> set[str]:
    """Names listed in __all__ (treated as used)."""
    out: set[str] = set()
    for node in tree.body:
        if (
            isinstance(node, ast.Assign)
            and any(isinstance(t, ast.Name) and t.id == "__all__" for t in node.targets)
            and isinstance(node.value, (ast.List, ast.Tuple))
        ):
            for elt in node.value.elts:
                if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                    out.add(elt.value)
    return out


def _string_annotations(tree: ast.AST) -> set[str]:
    """Names referenced inside string (forward-ref) annotations."""
    out: set[str] = set()
    for node in ast.walk(tree):
        ann = getattr(node, "annotation", None)
        if isinstance(ann, ast.Constant) and isinstance(ann.value, str):
            try:
                sub = ast.parse(ann.value, mode="eval")
            except SyntaxError:
                continue
            out |= _used_names(sub)
    return out


def _comparison_findings(path: Path, tree: ast.AST) -> list[str]:
    """E711/E712 (``==``/``!=`` against None/bool) and F632 (``is`` literal)."""
    findings: list[str] = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Compare):
            continue
        for op, comp in zip(node.ops, node.comparators):
            for side in (node.left, comp):
                if not isinstance(side, ast.Constant):
                    continue
                if isinstance(op, (ast.Eq, ast.NotEq)):
                    if side.value is None:
                        findings.append(f"{path}:{node.lineno}: E711 comparison to None (use 'is')")
                    elif isinstance(side.value, bool):
                        findings.append(f"{path}:{node.lineno}: E712 comparison to bool (use 'is')")
                elif isinstance(op, (ast.Is, ast.IsNot)) and isinstance(
                    side.value, (str, bytes, int, float, complex, tuple)
                ) and not isinstance(side.value, bool):
                    findings.append(f"{path}:{node.lineno}: F632 'is' comparison with a literal (use '==')")
    return findings


def _escape_findings(path: Path, src: str) -> list[str]:
    """W605: invalid escape sequences in non-raw, non-bytes string literals."""
    findings: list[str] = []
    try:
        tokens = list(tokenize.generate_tokens(io.StringIO(src).readline))
    except tokenize.TokenError:
        return findings
    for tok in tokens:
        if tok.type != tokenize.STRING:
            continue
        prefix = re.match(r"[a-zA-Z]*", tok.string).group(0).lower()
        if "r" in prefix or "b" in prefix:
            continue
        body = tok.string
        j = 0
        while j < len(body):
            if body[j] == "\\" and j + 1 < len(body):
                if body[j + 1] not in _VALID_ESCAPES:
                    findings.append(
                        f"{path}:{tok.start[0]}: W605 invalid escape sequence '\\{body[j + 1]}'"
                    )
                j += 2
            else:
                j += 1
    return findings


def _docstring_findings(path: Path, tree: ast.Module) -> list[str]:
    """D103 subset: public module-level defs/classes must have docstrings."""
    findings: list[str] = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if not node.name.startswith("_") and ast.get_docstring(node) is None:
                findings.append(
                    f"{path}:{node.lineno}: D103 public '{node.name}' is missing a docstring"
                )
    return findings


def check_file(path: Path) -> list[str]:
    """Return a list of "path:line: code message" findings for one file."""
    findings: list[str] = []
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]

    for lineno, line in enumerate(src.splitlines(), 1):
        if len(line) > MAX_LINE_LENGTH:
            findings.append(
                f"{path}:{lineno}: E501 line too long ({len(line)} > {MAX_LINE_LENGTH})"
            )
    findings.extend(_comparison_findings(path, tree))
    findings.extend(_escape_findings(path, src))
    if "multimodal_mtrssm_tpu" in path.parts:
        findings.extend(_docstring_findings(path, tree))

    is_dunder_init = path.name == "__init__.py"
    used = _used_names(tree) | _exported_names(tree) | _string_annotations(tree)

    seen_imports: dict[str, int] = {}
    # Module-level imports only (function-local imports are deliberate in
    # this codebase: they defer heavy deps like torch until needed).
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            if isinstance(node, ast.ImportFrom) and node.module == "__future__":
                continue
            for alias in node.names:
                if alias.name == "*":
                    continue
                bound = (alias.asname or alias.name).split(".")[0]
                explicit_reexport = alias.asname is not None and alias.asname == alias.name
                if bound in seen_imports and not explicit_reexport:
                    findings.append(
                        f"{path}:{node.lineno}: F811 redefinition of imported "
                        f"'{bound}' (first at line {seen_imports[bound]})"
                    )
                seen_imports.setdefault(bound, node.lineno)
                if is_dunder_init or explicit_reexport:
                    continue  # re-export surface
                if bound.startswith("_"):
                    continue
                if bound not in used:
                    findings.append(f"{path}:{node.lineno}: F401 '{bound}' imported but unused")
    return findings


def check_paths(roots: list[Path]) -> list[str]:
    """Run the checks over all ``.py`` files under the given roots."""
    findings: list[str] = []
    for root in roots:
        files = [root] if root.is_file() else sorted(root.rglob("*.py"))
        for f in files:
            if "__pycache__" in f.parts:
                continue
            findings.extend(check_file(f))
    return findings

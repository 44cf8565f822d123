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
- F821: names that resolve to no binding in any enclosing scope
  (pyflakes-lite static scope analysis — catches the NameError-on-a-rare-
  path class of bug; files with ``import *`` are skipped). Includes
  string forward-reference annotations (``x: "Foo"``): the string is
  parsed and its names resolved in the same scope stack, with pyflakes'
  rule that strings inside ``Literal[...]``/``Annotated[...]`` subscripts
  are values, not type names,
- F841: function locals assigned by a simple ``x = expr`` and never loaded
  (conservative: skips underscore names, unpacking, aug/annotated assigns,
  and dynamic-scope functions),
- B006 (bugbear-lite): mutable argument defaults (list/dict/set literals,
  comprehensions, and mutable-constructor calls) — evaluated once and
  shared across calls,
- B008 (bugbear-lite): any other call in an argument default — evaluated
  once at def time, not per call,
- CALL101/102/103 (mypy ``call-arg``-lite): calls to undecorated,
  uniquely-bound module-level functions are checked against the callee's
  signature — too many positional args, unknown keyword, and missing
  required parameter (the TypeError-on-call class of bug). Under
  ``check_paths`` the callee may live in ANOTHER package module: names
  bound by ``from <package module> import f`` (absolute or relative,
  aliases included) resolve against the defining module's signature —
  following package ``__init__`` re-export chains up to 4 hops — provided
  the name is uniquely bound at every hop and does not collide with a
  submodule. Class CONSTRUCTOR calls are covered under the same
  codes when the signature is statically knowable — an explicit
  undecorated ``__init__`` (minus ``self``), dataclass-synthesized fields
  (``ClassVar`` excluded, ``field(default=/default_factory=)`` counted as
  defaults; ``InitVar``/``field(init=...)`` disqualify), or the zero-arg
  object constructor for a bare class; inherited ``__init__``, unknown
  decorators, ``__new__`` and metaclass keywords disqualify. METHOD calls
  (``self.m(...)``/``cls.m(...)``) are covered too: the resolved ``def``
  (own body or same-module base) is checked with the bound receiver
  stripped per descriptor kind, provided the method name is defined
  exactly once across every linted class body (no override can re-route
  dispatch) and never rebound by an attribute store or class-body
  assignment anywhere. LOCAL INSTANCES are tracked as well: a scope
  binding ``x = C(...)`` exactly once gets every later ``x.m(...)``
  checked against C's method table — here subclass overrides need no
  guard, because the constructor pins the exact class,
- CALL104 (mypy ``arg-type``-lite): literal arguments on those same calls
  (same- and cross-module) are type-checked against simple builtin
  parameter annotations (``int``/``str``/``float``/``bool``/``bytes``/
  ``complex``, optionally ``| None``/``Optional``), numeric tower
  included. Names the enclosing scope binds EXACTLY ONCE to a literal
  (``y = 'a'``, no other store/del/param/global/nonlocal — including
  ``nonlocal`` rebinds from nested functions — and the binding precedes
  the call) count as that literal, mirroring mypy's inference of a
  single-assignment local,
- RET201/RET202 (mypy ``return``-lite): a function annotated with a
  value-requiring return type must not fall off the end of its body
  (conservative path-termination analysis) and must not contain a bare
  ``return``; generators, stubs and overload/abstract defs exempt,
- D103 subset (pydoclint-lite): public module-level functions and classes
  inside the package must carry docstrings,
- DOC102 (pydoclint-lite): parameters documented in an ``Args:`` section or
  ``:param:`` field must exist in the signature (docstring drift),
- ANN201 subset (mypy-lite): public functions/methods inside the package
  must carry return annotations,
- ATTR101 (mypy ``attr-defined``-lite): ``self.x``/``cls.x`` reads inside
  methods must resolve to an attribute the class actually has (assigned in
  any method, defined in the class body, inherited from a same-module
  base, or stored on any object anywhere in the linted tree — the
  cross-file whitelist that keeps injection patterns from false-positives
  while still catching typo'd names, which are stored nowhere),
- ATTR102: the same check on TRACKED LOCAL INSTANCES — in a scope binding
  ``x = C(...)`` exactly once (``C`` an eligible same-module class without
  ``__new__``), later ``x.attr`` reads must resolve to C's surface; a
  dynamic inspection of ``x`` (hasattr/getattr/vars/…) anywhere in the
  scope drops the tracking.

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


# --- F821: undefined names (pyflakes-lite scope analysis) -------------------

_BUILTINS = frozenset(dir(__import__("builtins"))) | {
    "__file__", "__name__", "__doc__", "__package__", "__spec__",
    "__loader__", "__builtins__", "__debug__", "__class__", "__path__",
}

_SCOPE_NODES = (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda, ast.ClassDef,
                ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp)


def _bindings_in(node: ast.AST) -> tuple[set[str], set[str]]:
    """Names BOUND directly in the scope opened by ``node`` (not in nested
    scopes), plus the names it declares ``global``/``nonlocal`` (which resolve
    elsewhere). Mirrors Python's static local-variable determination."""
    bound: set[str] = set()
    escaped: set[str] = set()  # global/nonlocal declarations
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)):
        a = node.args
        for arg in [*a.posonlyargs, *a.args, *a.kwonlyargs,
                    *([a.vararg] if a.vararg else []), *([a.kwarg] if a.kwarg else [])]:
            bound.add(arg.arg)
    if isinstance(node, (ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp)):
        for comp in node.generators:
            bound |= _target_names(comp.target)

    comp_types = (ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp)

    def visit(n: ast.AST) -> None:
        for child in ast.iter_child_nodes(n):
            if isinstance(child, _SCOPE_NODES):
                # def/class/lambda binds its NAME here; its body is a new scope.
                if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                    bound.add(child.name)
                elif isinstance(child, comp_types) and not isinstance(node, comp_types):
                    # PEP 572: a walrus inside a comprehension binds in the
                    # nearest enclosing NON-comprehension scope — this one.
                    bound.update(_walrus_targets_through_comps(child))
                continue
            if isinstance(child, (ast.Import, ast.ImportFrom)):
                for alias in child.names:
                    if alias.name != "*":
                        bound.add((alias.asname or alias.name).split(".")[0])
            elif isinstance(child, (ast.Global, ast.Nonlocal)):
                escaped.update(child.names)
            elif isinstance(child, ast.Name) and isinstance(child.ctx, (ast.Store, ast.Del)):
                bound.add(child.id)
            elif isinstance(child, ast.ExceptHandler) and child.name:
                bound.add(child.name)
            elif isinstance(child, (ast.MatchAs, ast.MatchStar)) and child.name:
                bound.add(child.name)
            elif isinstance(child, ast.MatchMapping) and child.rest:
                bound.add(child.rest)
            visit(child)

    # Lambda/comprehension bodies are expressions: walk them for walrus etc.
    visit(node)
    return bound - escaped, escaped


def _walrus_targets_through_comps(comp: ast.AST) -> set[str]:
    """``NamedExpr`` targets inside a comprehension subtree, walking through
    nested comprehensions but not into function/lambda/class scopes (a
    walrus inside those binds there, not in the comprehension's owner)."""
    out: set[str] = set()

    def visit(n: ast.AST) -> None:
        for child in ast.iter_child_nodes(n):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef,
                                  ast.Lambda, ast.ClassDef)):
                continue
            if isinstance(child, ast.NamedExpr) and isinstance(child.target, ast.Name):
                out.add(child.target.id)
            visit(child)

    visit(comp)
    return out


def _target_names(t: ast.AST) -> set[str]:
    out: set[str] = set()
    for n in ast.walk(t):
        if isinstance(n, ast.Name):
            out.add(n.id)
    return out


def _ann_forward_refs(ann: ast.expr) -> list[ast.Constant]:
    """Constant-str nodes in an annotation expression that are forward
    references. Strings inside ``Literal[...]`` / ``Annotated[...]``
    subscript slices are runtime values, not type names (pyflakes' rule),
    and are skipped — ``Annotated`` conservatively skips its whole slice
    (its first element is a type, but metadata strings dominate in
    practice and a miss is safer than a false positive)."""
    _VALUE_SUBSCRIPTS = ("Literal", "Annotated")
    out: list[ast.Constant] = []

    def visit(e: ast.AST, in_value_ctx: bool) -> None:
        if isinstance(e, ast.Constant):
            if isinstance(e.value, str) and not in_value_ctx:
                out.append(e)
            return
        if isinstance(e, ast.Subscript):
            base = e.value
            base_name = base.attr if isinstance(base, ast.Attribute) else getattr(base, "id", None)
            visit(base, in_value_ctx)
            visit(e.slice, in_value_ctx or base_name in _VALUE_SUBSCRIPTS)
            return
        for child in ast.iter_child_nodes(e):
            visit(child, in_value_ctx)

    visit(ann, False)
    return out


def _undefined_findings(path: Path, tree: ast.Module) -> list[str]:
    """F821: Name loads that no enclosing scope binds. Class scopes are
    invisible to nested functions (Python scoping); comprehensions and
    lambdas open their own scopes. Files containing ``import *`` are
    skipped entirely (their namespace is unknowable statically)."""
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and any(a.name == "*" for a in node.names):
            return []
    findings: list[str] = []
    # ``global x`` inside any function binds x at module scope.
    global_names = {
        name for n in ast.walk(tree) if isinstance(n, ast.Global) for name in n.names
    }

    def check(node: ast.AST, stack: list[tuple[ast.AST, set[str]]]) -> None:
        bound, _ = _bindings_in(node)
        if isinstance(node, ast.Module):
            bound |= global_names
        frame = (node, bound)
        new_stack = stack + [frame]

        def resolvable(name: str) -> bool:
            for i in range(len(new_stack) - 1, -1, -1):
                snode, sbound = new_stack[i]
                # A class body's names are visible only AT class level
                # (the innermost frame), never through it from a function.
                if isinstance(snode, ast.ClassDef) and i != len(new_stack) - 1:
                    continue
                if name in sbound:
                    return True
            return name in _BUILTINS

        def check_ann_strings(ann: ast.expr) -> None:
            """F821 inside string forward-reference annotations: parse each
            string and resolve its names in this scope stack (recursing into
            nested strings, e.g. ``"Optional['Foo']"``)."""
            for const in _ann_forward_refs(ann):
                try:
                    sub = ast.parse(const.value, mode="eval")
                except SyntaxError:
                    findings.append(
                        f"{path}:{const.lineno}: F821 forward reference "
                        f"{const.value!r} is not a valid expression"
                    )
                    continue
                for inner in ast.walk(sub.body):
                    if isinstance(inner, ast.Name) and isinstance(inner.ctx, ast.Load):
                        if not resolvable(inner.id):
                            findings.append(
                                f"{path}:{const.lineno}: F821 undefined name "
                                f"'{inner.id}' (in string annotation)"
                            )
                check_ann_strings(sub.body)

        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and node.returns:
            # Evaluated in the enclosing scope at runtime; the function's own
            # stack is a superset, so checking here cannot false-positive.
            check_ann_strings(node.returns)

        def walk(n: ast.AST) -> None:
            for child in ast.iter_child_nodes(n):
                if isinstance(child, _SCOPE_NODES):
                    check(child, new_stack)
                    continue
                if isinstance(child, ast.arg) and child.annotation is not None:
                    check_ann_strings(child.annotation)
                elif isinstance(child, ast.AnnAssign):
                    check_ann_strings(child.annotation)
                if isinstance(child, ast.Name) and isinstance(child.ctx, ast.Load):
                    if not resolvable(child.id):
                        findings.append(
                            f"{path}:{child.lineno}: F821 undefined name '{child.id}'"
                        )
                walk(child)

        walk(node)

    check(tree, [])
    return findings


_DYNAMIC_SCOPE_CALLS = frozenset({"locals", "vars", "eval", "exec", "globals"})


def _unused_local_findings(path: Path, tree: ast.Module) -> list[str]:
    """F841 subset: function locals assigned by a simple ``x = expr`` and
    never loaded anywhere in the function (including nested scopes —
    a closure load counts as a use, keeping this conservative). Skipped:
    underscore-prefixed names, tuple unpacking, augmented/annotated
    assignment, ``global``/``nonlocal`` names, and functions that call
    ``locals()``/``vars()``/``eval``/``exec`` (dynamic access)."""
    findings: list[str] = []
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        stores: dict[str, int] = {}
        escaped: set[str] = set()
        dynamic = False
        loads: set[str] = set()

        def collect(n: ast.AST, top: bool) -> None:
            nonlocal dynamic
            for child in ast.iter_child_nodes(n):
                if isinstance(child, ast.Name):
                    if isinstance(child.ctx, (ast.Load, ast.Del)):
                        loads.add(child.id)
                    if child.id in _DYNAMIC_SCOPE_CALLS:
                        dynamic = True
                elif top:
                    if isinstance(child, ast.Assign) and len(child.targets) == 1 and \
                            isinstance(child.targets[0], ast.Name):
                        stores.setdefault(child.targets[0].id, child.lineno)
                    elif isinstance(child, (ast.Global, ast.Nonlocal)):
                        escaped.update(child.names)
                # Loads are collected everywhere; direct stores only at this
                # function's scope (not nested defs/lambdas/comprehensions).
                collect(child, top and not isinstance(child, _SCOPE_NODES))
        collect(fn, True)
        if dynamic:
            continue
        for name, lineno in sorted(stores.items(), key=lambda kv: kv[1]):
            if name.startswith("_") or name in escaped or name in loads:
                continue
            findings.append(
                f"{path}:{lineno}: F841 local '{name}' is assigned but never used"
            )
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


_SECTION_HEADERS = re.compile(
    r"^(Args|Arguments|Parameters|Returns|Raises|Yields|Notes?|Examples?|"
    r"Attributes|See Also|References|Warnings?)\s*:\s*$"
)
_ARGS_HEADERS = frozenset({"Args", "Arguments", "Parameters"})


def _documented_args(doc: str) -> list[tuple[str, int]]:
    """Parameter names a docstring documents, with 0-based line offsets.

    Recognizes Google-style ``Args:`` sections (entries are ``name: desc`` or
    ``name (type): desc`` at the section's first indent level; deeper lines
    are description continuations) and Sphinx ``:param name:`` fields.
    """
    out: list[tuple[str, int]] = []
    lines = doc.splitlines()
    in_args = False
    entry_indent: int | None = None
    for i, ln in enumerate(lines):
        stripped = ln.strip()
        m = _SECTION_HEADERS.match(stripped)
        if m:
            in_args = m.group(1) in _ARGS_HEADERS
            entry_indent = None
            continue
        if in_args and stripped:
            indent = len(ln) - len(ln.lstrip())
            if entry_indent is None:
                entry_indent = indent
            if indent == entry_indent:
                em = re.match(r"^(\*{0,2}[A-Za-z_][A-Za-z0-9_]*)\s*(\([^)]*\))?\s*:", stripped)
                if em:
                    out.append((em.group(1).lstrip("*"), i))
        sm = re.match(r"^:param\s+(?:[^:]*\s)?([A-Za-z_][A-Za-z0-9_]*)\s*:", stripped)
        if sm:
            out.append((sm.group(1), i))
    return out


def _doc_signature_findings(path: Path, tree: ast.Module) -> list[str]:
    """DOC102 (pydoclint-lite): names documented in an ``Args:`` section or
    ``:param:`` field that do not exist in the function signature — the
    docstring-drift half of pydoclint's signature checks (a renamed or
    removed parameter whose docs weren't updated). The reverse direction
    (every arg must be documented) is deliberately not enforced: this
    codebase documents by prose, and the reference's pydoclint config only
    gates consistency, not completeness."""
    findings: list[str] = []
    for node in ast.walk(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        doc = ast.get_docstring(node, clean=True)
        if not doc:
            continue
        a = node.args
        sig = {arg.arg for arg in [*a.posonlyargs, *a.args, *a.kwonlyargs]}
        if a.vararg:
            sig.add(a.vararg.arg)
        if a.kwarg:
            sig.add(a.kwarg.arg)
        for name, _off in _documented_args(doc):
            if name not in sig:
                findings.append(
                    f"{path}:{node.lineno}: DOC102 '{node.name}' documents "
                    f"parameter '{name}' not present in its signature"
                )
    return findings


def _return_annotation_findings(path: Path, tree: ast.Module) -> list[str]:
    """ANN201 subset (mypy-lite): public module-level functions and public
    methods of public classes must carry a return annotation — the cheapest
    slice of the reference's ``mypy --strict`` gate that is checkable
    without a type checker (``disallow_untyped_defs`` on the public
    surface). ``__init__`` and properties' setters are exempt."""
    findings: list[str] = []

    def scan(body: list[ast.stmt]) -> None:
        for node in body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                if node.name.startswith("_"):
                    continue
                if node.returns is None:
                    findings.append(
                        f"{path}:{node.lineno}: ANN201 public '{node.name}' "
                        "is missing a return annotation"
                    )
            elif isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
                scan(node.body)

    scan(tree.body)
    return findings


def _arg_annotation_findings(path: Path, tree: ast.Module) -> list[str]:
    """ANN001 subset (mypy-lite): every parameter of a public module-level
    function or public method of a public class must carry a type
    annotation (``disallow_untyped_defs`` over arguments — the companion
    of ANN201's return-annotation rule, same scoping). ``self``/``cls``
    are exempt; ``*args``/``**kwargs`` are not."""
    findings: list[str] = []

    def scan(body: list[ast.stmt]) -> None:
        for node in body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                if node.name.startswith("_"):
                    continue
                a = node.args
                missing = [
                    x.arg for x in a.posonlyargs + a.args + a.kwonlyargs
                    if x.annotation is None and x.arg not in ("self", "cls")
                ]
                missing += [
                    f"*{v.arg}" for v in (a.vararg, a.kwarg)
                    if v is not None and v.annotation is None
                ]
                if missing:
                    findings.append(
                        f"{path}:{node.lineno}: ANN001 public '{node.name}' "
                        f"has unannotated parameter(s): {', '.join(missing)}"
                    )
            elif isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
                scan(node.body)

    scan(tree.body)
    return findings


def _return_value_findings(path: Path, tree: ast.Module) -> list[str]:
    """RET-none (mypy-lite): a function annotated ``-> None`` must not
    ``return <value>`` — the annotation and the body disagree, and mypy
    would reject it. Applies to EVERY function (private and nested too):
    a wrong ``-> None`` is a latent bug wherever it appears."""
    findings: list[str] = []
    stack: list[ast.AST] = []

    def visit(node: ast.AST) -> None:
        is_fn = isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
        if is_fn:
            stack.append(node)
        elif isinstance(node, ast.Return) and stack:
            fn = stack[-1]
            r = fn.returns
            annotated_none = isinstance(r, ast.Constant) and r.value is None
            returns_value = node.value is not None and not (
                isinstance(node.value, ast.Constant) and node.value.value is None
            )
            if annotated_none and returns_value:
                findings.append(
                    f"{path}:{node.lineno}: RET-none '{fn.name}' is annotated "
                    "'-> None' but returns a value"
                )
        for child in ast.iter_child_nodes(node):
            visit(child)
        if is_fn:
            stack.pop()

    visit(tree)
    return findings


def _dataclass_decorated(cls: ast.ClassDef) -> bool | None:
    """Classify a class's decorators for constructor synthesis: True when
    every decorator is a ``dataclass`` form whose keyword options cannot
    change the ``__init__`` signature (bare ``@dataclass``, dotted
    ``@dataclasses.dataclass`` / flax-style ``@struct.dataclass``, or a
    call of those with only frozen/eq/repr/order/unsafe_hash/slots
    constants); False when there are no decorators at all; None when any
    decorator is something else (unknown transformation — skip the class).
    """
    if not cls.decorator_list:
        return False
    _SAFE_KW = {"frozen", "eq", "repr", "order", "unsafe_hash", "slots"}
    for dec in cls.decorator_list:
        call_kw: list[ast.keyword] = []
        base = dec
        if isinstance(dec, ast.Call):
            if dec.args:
                return None
            call_kw = dec.keywords
            base = dec.func
        name = base.attr if isinstance(base, ast.Attribute) else getattr(base, "id", None)
        if name != "dataclass":
            return None
        for k in call_kw:
            if k.arg not in _SAFE_KW or not isinstance(k.value, ast.Constant):
                return None
    return True


def _args_without_receiver(a: ast.arguments) -> ast.arguments | None:
    """``a`` minus its first positional parameter (the bound receiver),
    defaults trimmed to the surviving positional count — or None when there
    is no explicit first positional parameter to strip (receiver arrives
    via ``*args``)."""
    if a.posonlyargs:
        new = ast.arguments(
            posonlyargs=a.posonlyargs[1:], args=a.args, vararg=a.vararg,
            kwonlyargs=a.kwonlyargs, kw_defaults=a.kw_defaults,
            kwarg=a.kwarg, defaults=list(a.defaults),
        )
    elif a.args:
        new = ast.arguments(
            posonlyargs=[], args=a.args[1:], vararg=a.vararg,
            kwonlyargs=a.kwonlyargs, kw_defaults=a.kw_defaults,
            kwarg=a.kwarg, defaults=list(a.defaults),
        )
    else:
        return None
    n_pos = len(new.posonlyargs) + len(new.args)
    if len(new.defaults) > n_pos:
        new.defaults = new.defaults[len(new.defaults) - n_pos:]
    return new


def _class_constructor_signature(cls: ast.ClassDef) -> ast.FunctionDef | None:
    """A synthetic ``FunctionDef`` carrying the constructor signature of a
    module-level class, for the CALL1xx checks — or None when the
    signature is not statically knowable. Three resolvable shapes:

    - an explicit undecorated ``__init__`` (any bases — the subclass's own
      ``__init__`` is what a call binds): its parameters minus ``self``;
    - a dataclass with no bases and no explicit ``__init__``: parameters
      synthesized from the annotated fields in declaration order
      (``ClassVar`` fields excluded; a ``field(...)`` default counts as a
      default only via ``default=``/``default_factory=``; any
      ``InitVar`` or ``field(init=...)`` disqualifies the class);
    - a plain no-base class with no ``__init__``: the zero-argument
      object constructor.

    ``__new__``, class-level keywords (metaclass), and non-dataclass
    decorators disqualify (unknowable transformations).
    """
    if cls.keywords:
        return None
    is_dc = _dataclass_decorated(cls)
    if is_dc is None:
        return None
    body_fns = {
        n.name: n for n in cls.body if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    }
    if "__new__" in body_fns:
        return None
    plain_bases = all(isinstance(b, ast.Name) and b.id == "object" for b in cls.bases)
    init = body_fns.get("__init__")
    if init is not None:
        if init.decorator_list or is_dc:
            return None  # decorated init / dataclass(init=?) interplay: skip
        new = _args_without_receiver(init.args)
        if new is None:
            return None  # def __init__(*args, ...): self arrives via vararg
    elif is_dc:
        if cls.bases:
            return None  # fields may be inherited
        params: list[ast.arg] = []
        defaults: list[ast.expr] = []
        for stmt in cls.body:
            if not (isinstance(stmt, ast.AnnAssign) and isinstance(stmt.target, ast.Name)):
                continue
            ann_dump = ast.dump(stmt.annotation)
            if "InitVar" in ann_dump:
                return None
            if "ClassVar" in ann_dump:
                continue  # class attribute, not an init parameter
            has_default = stmt.value is not None
            if isinstance(stmt.value, ast.Call):
                f = stmt.value.func
                f_name = f.attr if isinstance(f, ast.Attribute) else getattr(f, "id", None)
                if f_name == "field":
                    kws = {k.arg for k in stmt.value.keywords}
                    if "init" in kws:
                        return None
                    has_default = bool(kws & {"default", "default_factory"})
            if not has_default and defaults:
                return None  # non-default after default: dataclass rejects this
            params.append(ast.arg(arg=stmt.target.id, annotation=stmt.annotation))
            if has_default:
                defaults.append(stmt.value)
        new = ast.arguments(
            posonlyargs=[], args=params, vararg=None,
            kwonlyargs=[], kw_defaults=[], kwarg=None, defaults=defaults,
        )
    elif plain_bases:
        new = ast.arguments(
            posonlyargs=[], args=[], vararg=None,
            kwonlyargs=[], kw_defaults=[], kwarg=None, defaults=[],
        )
    else:
        return None  # inherited __init__: not statically knowable
    return ast.FunctionDef(
        name=cls.name, args=new, body=[], decorator_list=[], returns=None,
        type_comment=None,
    )


def _module_call_candidates(
    tree: ast.Module,
) -> tuple[dict[str, ast.FunctionDef | ast.AsyncFunctionDef], dict[str, int]]:
    """Module-level undecorated functions by name — plus module-level
    classes whose constructor signature is statically knowable
    (``_class_constructor_signature``), represented as synthetic defs —
    and per-name bind counts across the whole file (a name bound more
    than once — or shadowed by an import, class, assignment or ``del`` —
    is not statically resolvable to its ``def``). Shared by the CALL1xx
    signature checks and the CALL104 literal-argument type check."""
    fns: dict[str, ast.FunctionDef | ast.AsyncFunctionDef] = {}
    bind_counts: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and not node.decorator_list:
            fns[node.name] = node
        elif isinstance(node, ast.ClassDef):
            synth = _class_constructor_signature(node)
            if synth is not None:
                fns[node.name] = synth
    for node in ast.walk(tree):
        name: str | None = None
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            name = node.name
        elif isinstance(node, ast.Name) and isinstance(node.ctx, (ast.Store, ast.Del)):
            name = node.id
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                nm = (a.asname or a.name).split(".")[0]
                bind_counts[nm] = bind_counts.get(nm, 0) + 1
        if name is not None:
            bind_counts[name] = bind_counts.get(name, 0) + 1
    return fns, bind_counts


def _module_reexports(
    tree: ast.Module, pkg_parts: list[str] | None
) -> dict[str, tuple[str, str]]:
    """Module-level ``from <module> import n [as m]`` bindings as a map
    ``local name → (source module dotted path, source name)`` — the hop
    table re-export chain resolution follows."""
    out: dict[str, tuple[str, str]] = {}
    for node in tree.body:
        if not isinstance(node, ast.ImportFrom) or node.module == "__future__":
            continue
        if node.level == 0:
            if not node.module:
                continue
            target_parts = node.module.split(".")
        else:
            if pkg_parts is None or node.level - 1 > len(pkg_parts):
                continue
            base = pkg_parts[: len(pkg_parts) - (node.level - 1)]
            target_parts = base + (node.module.split(".") if node.module else [])
        for alias in node.names:
            if alias.name == "*":
                continue
            out[alias.asname or alias.name] = (".".join(target_parts), alias.name)
    return out


def _resolve_module_symbol(
    dotted: str,
    name: str,
    repo_fns: dict[str, tuple[dict[str, ast.FunctionDef | ast.AsyncFunctionDef],
                              dict[str, int]]],
    repo_classes: dict[str, dict[str, "MethodTable"]],
    repo_reexports: dict[str, dict[str, tuple[str, str]]],
    depth: int = 0,
) -> tuple[ast.FunctionDef | ast.AsyncFunctionDef | None, "MethodTable | None"]:
    """Resolve ``<dotted module>.<name>`` to (callable signature def,
    class method table) across re-export hops.

    Conservative at every hop: the name must be bound exactly once in that
    module and must not collide with a submodule of the same dotted name
    (``from pkg import c`` where both ``pkg/c.py`` and ``pkg.__init__.c``
    exist is ambiguous at import time). A module whose name is only an
    import (``from .a import f``) forwards to the source module, up to 4
    hops."""
    if depth > 4:
        return None, None
    entry = repo_fns.get(dotted)
    if entry is None:
        return None, None
    _fns, binds = entry
    if binds.get(name, 0) != 1 or f"{dotted}.{name}" in repo_fns:
        return None, None
    fn = _fns.get(name)
    table = repo_classes.get(dotted, {}).get(name)
    if fn is not None or table is not None:
        return fn, table
    hop = repo_reexports.get(dotted, {}).get(name)
    if hop is not None:
        return _resolve_module_symbol(
            hop[0], hop[1], repo_fns, repo_classes, repo_reexports, depth + 1
        )
    return None, None


def _imported_symbols(
    tree: ast.Module,
    pkg_parts: list[str] | None,
    repo_fns: dict[str, tuple[dict[str, ast.FunctionDef | ast.AsyncFunctionDef],
                              dict[str, int]]],
    repo_classes: dict[str, dict[str, "MethodTable"]],
    repo_reexports: dict[str, dict[str, tuple[str, str]]],
) -> tuple[dict[str, ast.FunctionDef | ast.AsyncFunctionDef], dict[str, "MethodTable"]]:
    """Resolve this file's ``from <package module> import n [as m]``
    bindings to (callable signature defs, class method tables) in the
    defining modules, following re-export chains via
    ``_resolve_module_symbol`` — so names imported through a package
    ``__init__`` surface check against their real definitions."""
    fns: dict[str, ast.FunctionDef | ast.AsyncFunctionDef] = {}
    tables: dict[str, MethodTable] = {}
    if not repo_fns:
        return fns, tables
    for name, (mod, orig) in _module_reexports(tree, pkg_parts).items():
        fn, table = _resolve_module_symbol(mod, orig, repo_fns, repo_classes, repo_reexports)
        if fn is not None:
            fns[name] = fn
        if table is not None:
            tables[name] = table
    return fns, tables


def _call_signature_findings(
    path: Path,
    tree: ast.Module,
    extra_fns: dict[str, ast.FunctionDef | ast.AsyncFunctionDef] | None = None,
) -> list[str]:
    """CALL101/102/103 (mypy ``call-arg``-lite): every call whose target is a
    module-level, undecorated function bound exactly once in the file is
    checked against that signature:

    - CALL101: more positional arguments than the callee accepts (no
      ``*args``),
    - CALL102: a keyword the callee has no parameter for (no ``**kwargs``;
      positional-only parameters are correctly NOT keyword-addressable),
    - CALL103: a required parameter (positional without default, or
      keyword-only without default) that the call never supplies.

    Conservative by construction: any rebinding of the name anywhere in the
    file (assignment, import, nested def/class, ``del``), a decorator on the
    callee (it may change the signature), or ``*``/``**`` unpacking at the
    call site disqualifies the check — so a finding is a genuine TypeError
    waiting on that call path.

    ``extra_fns`` (from ``_imported_package_functions``) extends resolution
    to names bound by a package-module import; the same uniquely-bound-in-
    this-file rule applies to the imported name.
    """
    fns, bind_counts = _module_call_candidates(tree)
    findings: list[str] = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call) or not isinstance(node.func, ast.Name):
            continue
        fn = fns.get(node.func.id) or (extra_fns or {}).get(node.func.id)
        if fn is None or bind_counts.get(node.func.id, 0) != 1:
            continue
        if any(isinstance(a, ast.Starred) for a in node.args) or any(
            k.arg is None for k in node.keywords
        ):
            continue  # *args / **kwargs at the call site: not statically knowable
        findings.extend(_signature_binding_findings(path, node, fn.args, fn.name))
    return findings


def _signature_binding_findings(
    path: Path, node: ast.Call, a: ast.arguments, label: str
) -> list[str]:
    """The CALL101/102/103 binding checks for ONE call site against ONE
    receiver-stripped signature — shared by the function-call, constructor
    and method-call passes (which differ only in how they resolve ``a``).
    """
    findings: list[str] = []
    pos_params = [p.arg for p in [*a.posonlyargs, *a.args]]
    kw_addressable = {p.arg for p in a.args} | {p.arg for p in a.kwonlyargs}
    npos = len(node.args)
    supplied_kw = {k.arg for k in node.keywords}
    if npos > len(pos_params) and a.vararg is None:
        findings.append(
            f"{path}:{node.lineno}: CALL101 call to '{label}' passes "
            f"{npos} positional arguments, signature takes {len(pos_params)}"
        )
    if a.kwarg is None:
        for k in node.keywords:
            if k.arg not in kw_addressable:
                findings.append(
                    f"{path}:{node.lineno}: CALL102 call to '{label}' "
                    f"passes unknown keyword '{k.arg}'"
                )
    required_pos = pos_params[: len(pos_params) - len(a.defaults)]
    for i, pname in enumerate(required_pos):
        if i >= npos and pname not in supplied_kw:
            findings.append(
                f"{path}:{node.lineno}: CALL103 call to '{label}' is "
                f"missing required argument '{pname}'"
            )
    for p, d in zip(a.kwonlyargs, a.kw_defaults):
        if d is None and p.arg not in supplied_kw:
            findings.append(
                f"{path}:{node.lineno}: CALL103 call to '{label}' is "
                f"missing required keyword-only argument '{p.arg}'"
            )
    return findings


# Simple builtin annotations CALL104 understands, with the literal types
# each accepts (mypy's numeric tower: bool ≤ int ≤ float ≤ complex).
_SIMPLE_TYPE_ACCEPTS: dict[str, tuple[type, ...]] = {
    "bool": (bool,),
    "int": (bool, int),
    "float": (bool, int, float),
    "complex": (bool, int, float, complex),
    "str": (str,),
    "bytes": (bytes,),
}


def _annotation_accepts(ann: ast.expr | None) -> tuple[tuple[type, ...], bool, str] | None:
    """Decode a parameter annotation into (accepted literal types,
    accepts_None, display name) — or None when the annotation is absent or
    not a form CALL104 can check soundly (subscripts, ``Any``, ``object``,
    custom classes, string forward refs all return None)."""
    if ann is None:
        return None
    if isinstance(ann, ast.Constant) and ann.value is None:  # ``x: None``
        return (), True, "None"
    if isinstance(ann, ast.Name):
        accepts = _SIMPLE_TYPE_ACCEPTS.get(ann.id)
        return (accepts, False, ann.id) if accepts else None
    if isinstance(ann, ast.BinOp) and isinstance(ann.op, ast.BitOr):  # ``T | U``
        left = _annotation_accepts(ann.left)
        right = _annotation_accepts(ann.right)
        if left is None or right is None:
            return None
        return (
            tuple({*left[0], *right[0]}),
            left[1] or right[1],
            f"{left[2]} | {right[2]}",
        )
    if isinstance(ann, ast.Subscript):  # ``Optional[T]`` only
        base = ann.value
        base_name = base.attr if isinstance(base, ast.Attribute) else getattr(base, "id", None)
        if base_name == "Optional":
            inner = _annotation_accepts(ann.slice)
            if inner is None:
                return None
            return inner[0], True, f"Optional[{inner[2]}]"
    return None


def _literal_type_findings(
    path: Path,
    tree: ast.Module,
    extra_fns: dict[str, ast.FunctionDef | ast.AsyncFunctionDef] | None = None,
) -> list[str]:
    """CALL104 (mypy ``arg-type``-lite): when a call to a same-module
    (or, via ``extra_fns``, package-import-resolved),
    uniquely-bound, undecorated function passes a LITERAL constant for a
    parameter annotated with a simple builtin type (``int``/``str``/
    ``float``/``bool``/``bytes``/``complex``, optionally ``| None`` /
    ``Optional[...]``), the literal's type must be acceptable for the
    annotation — mypy's numeric tower included (a bool literal satisfies
    ``int``, an int literal satisfies ``float``). Anything the checker
    cannot decode soundly (non-literal arguments, subscripted or custom
    annotations, ``Any``, forward-ref strings, ``*``/``**`` call sites,
    rebound names) is skipped, so a finding is a genuine ``arg-type``
    error on that call. Names the enclosing scope binds exactly once to a
    literal count as that literal (``_call_const_envs``)."""
    fns, bind_counts = _module_call_candidates(tree)
    call_envs = _call_const_envs(tree)
    findings: list[str] = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call) or not isinstance(node.func, ast.Name):
            continue
        fn = fns.get(node.func.id) or (extra_fns or {}).get(node.func.id)
        if fn is None or bind_counts.get(node.func.id, 0) != 1:
            continue
        if any(isinstance(a, ast.Starred) for a in node.args) or any(
            k.arg is None for k in node.keywords
        ):
            continue
        findings.extend(_literal_binding_findings(
            path, node, fn.args, fn.name, call_envs.get(id(node))
        ))
    return findings


def _literal_binding_findings(
    path: Path, node: ast.Call, a: ast.arguments, label: str,
    env: "ConstEnv | None" = None,
) -> list[str]:
    """The CALL104 literal-vs-annotation checks for ONE call site against
    ONE receiver-stripped signature — shared with the method-call passes.

    ``env`` (from ``_const_local_envs``) extends the check from literal
    arguments to names the enclosing scope binds EXACTLY ONCE to a literal
    (``y = 'a'; f(y)`` — mypy infers ``y: str`` the same way); the binding
    must precede the call textually, so a later-line first-use in a loop
    cannot observe a pre-binding value."""
    findings: list[str] = []
    pos_params = [*a.posonlyargs, *a.args]
    by_name = {p.arg: p for p in [*pos_params, *a.kwonlyargs]}
    pairs: list[tuple[ast.arg, ast.expr]] = []
    for i, arg_node in enumerate(node.args):
        if i < len(pos_params):
            pairs.append((pos_params[i], arg_node))
    for kw in node.keywords:
        param = by_name.get(kw.arg)
        if param is not None:
            pairs.append((param, kw.value))
    for param, value in pairs:
        via = ""
        if (env is not None and isinstance(value, ast.Name)
                and isinstance(value.ctx, ast.Load)):
            hit = env.get(value.id)
            if hit is not None and hit[1] < node.lineno:
                via = f" (via local '{value.id}')"
                value = hit[0]
        if not isinstance(value, ast.Constant) or value.value is Ellipsis:
            continue
        spec = _annotation_accepts(param.annotation)
        if spec is None:
            continue
        accepts, accepts_none, display = spec
        v = value.value
        ok = (v is None and accepts_none) or (
            v is not None and isinstance(v, accepts)
            # isinstance(True, (int,)) is True — restrict bool to
            # annotations that listed bool explicitly.
            and not (isinstance(v, bool) and bool not in accepts)
        )
        if not ok:
            lit = "None" if v is None else type(v).__name__
            findings.append(
                f"{path}:{node.lineno}: CALL104 call to '{label}' passes "
                f"a {lit} literal{via} for parameter '{param.arg}: {display}'"
            )
    return findings


# Single-literal-binding environment of one scope: name → (the Constant
# node it is bound to, the binding line).
ConstEnv = dict[str, tuple[ast.Constant, int]]


def _scope_binding_counts(
    scope: ast.AST,
) -> tuple[dict[str, int], set[str], set[str]]:
    """(store counts, disqualified names, parameter names) for one scope's
    OWN bindings — shared by the local-instance and const-local passes.

    Counts every binding occurrence in the scope's own namespace: Name
    stores/dels, def/class statements, import aliases, ``except ... as``
    and match-pattern capture names. ``disqualified`` holds names declared
    ``global``/``nonlocal`` here PLUS names any nested function rebinds via
    ``nonlocal`` — those can change behind the scope's back, so a single
    textual store does not pin them."""
    own = _own_scope_all_nodes(scope)
    params: set[str] = set()
    if isinstance(scope, (ast.FunctionDef, ast.AsyncFunctionDef)):
        a = scope.args
        params = {p.arg for p in [*a.posonlyargs, *a.args, *a.kwonlyargs]}
        if a.vararg:
            params.add(a.vararg.arg)
        if a.kwarg:
            params.add(a.kwarg.arg)
    counts: dict[str, int] = {}
    disqualified: set[str] = set()

    def bump(nm: str) -> None:
        counts[nm] = counts.get(nm, 0) + 1

    for n in own:
        if isinstance(n, ast.Name) and isinstance(n.ctx, (ast.Store, ast.Del)):
            bump(n.id)
        elif isinstance(n, (ast.Global, ast.Nonlocal)):
            disqualified.update(n.names)
        elif isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            bump(n.name)
        elif isinstance(n, (ast.Import, ast.ImportFrom)):
            for al in n.names:
                bump((al.asname or al.name).split(".")[0])
        elif isinstance(n, ast.ExceptHandler) and n.name:
            bump(n.name)
        elif isinstance(n, ast.MatchAs) and n.name:
            bump(n.name)
        elif isinstance(n, ast.MatchStar) and n.name:
            bump(n.name)
        elif isinstance(n, ast.MatchMapping) and n.rest:
            bump(n.rest)
    for n in own:
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)):
            for sub in ast.walk(n):
                if isinstance(sub, ast.Nonlocal):
                    disqualified.update(sub.names)
                elif isinstance(sub, ast.Global) and isinstance(scope, ast.Module):
                    # ``global x`` in any nested function rebinds the MODULE
                    # binding — a module-level single textual store does not
                    # pin the value (ADVICE r4: CALL104 false positive).
                    disqualified.update(sub.names)
    return counts, disqualified, params


def _const_local_envs(tree: ast.Module) -> dict[int, ConstEnv]:
    """id(scope node) → ConstEnv for every scope (module + functions) that
    binds at least one name exactly once via ``x = <literal>`` or
    ``x: T = <literal>`` — no other store, ``del``, parameter, or
    global/nonlocal rebinding anywhere in (or into) the scope."""
    scopes: list[ast.AST] = [tree]
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            scopes.append(node)
    envs: dict[int, ConstEnv] = {}
    for scope in scopes:
        counts, disqualified, params = _scope_binding_counts(scope)
        env: ConstEnv = {}
        for n in _own_scope_all_nodes(scope):
            if (isinstance(n, ast.Assign) and len(n.targets) == 1
                    and isinstance(n.targets[0], ast.Name)):
                target, value = n.targets[0].id, n.value
            elif (isinstance(n, ast.AnnAssign) and isinstance(n.target, ast.Name)
                    and n.value is not None):
                target, value = n.target.id, n.value
            else:
                continue
            if not isinstance(value, ast.Constant) or value.value is Ellipsis:
                continue
            if (counts.get(target, 0) != 1 or target in params
                    or target in disqualified):
                continue
            env[target] = (value, n.lineno)
        if env:
            envs[id(scope)] = env
    return envs


def _call_const_envs(tree: ast.Module) -> dict[int, ConstEnv]:
    """id(Call node) → the ConstEnv of its immediately enclosing scope, for
    every call in a scope that has one. Calls inside lambda bodies get no
    env (a lambda is its own scope — conservative skip)."""
    envs = _const_local_envs(tree)
    if not envs:
        return {}
    scopes: list[ast.AST] = [tree]
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            scopes.append(node)
    out: dict[int, ConstEnv] = {}
    for scope in scopes:
        env = envs.get(id(scope))
        if not env:
            continue
        for n in _own_scope_all_nodes(scope):
            if isinstance(n, ast.Call):
                out[id(n)] = env
    return out


def _has_own_scope_node(fn: ast.AST, kinds: tuple[type, ...]) -> bool:
    """Whether any node of the given kinds appears in ``fn``'s own scope
    (not inside nested function/lambda/class scopes)."""
    found = False

    def visit(n: ast.AST) -> None:
        nonlocal found
        for child in ast.iter_child_nodes(n):
            if found:
                return
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef,
                                  ast.Lambda, ast.ClassDef)):
                continue
            if isinstance(child, kinds):
                found = True
                return
            visit(child)

    visit(fn)
    return found


def _has_loop_break(body: list[ast.stmt]) -> bool:
    """Whether a ``break`` in this loop body binds to THIS loop — nested
    loops own their breaks, and nested function scopes cannot break out."""
    found = False

    def visit(n: ast.AST) -> None:
        nonlocal found
        for child in ast.iter_child_nodes(n):
            if found:
                return
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda,
                                  ast.ClassDef, ast.For, ast.AsyncFor, ast.While)):
                continue
            if isinstance(child, ast.Break):
                found = True
                return
            visit(child)

    for s in body:
        visit(ast.Module(body=[s], type_ignores=[]))
    return found


def _terminates(stmts: list[ast.stmt]) -> bool:
    """Whether control flow can NEVER fall off the end of this statement
    list — every path ends in ``return``/``raise`` (or loops forever).
    Conservative: unknown constructs report False (may fall through)."""
    for s in stmts:
        if isinstance(s, (ast.Return, ast.Raise)):
            return True
        if isinstance(s, ast.If):
            if s.orelse and _terminates(s.body) and _terminates(s.orelse):
                return True
        elif isinstance(s, ast.While):
            infinite = isinstance(s.test, ast.Constant) and bool(s.test.value)
            if infinite and not _has_loop_break(s.body):
                return True
            if s.orelse and _terminates(s.orelse) and not _has_loop_break(s.body):
                return True
        elif isinstance(s, (ast.For, ast.AsyncFor)):
            if s.orelse and _terminates(s.orelse) and not _has_loop_break(s.body):
                return True
        elif isinstance(s, ast.Try):
            if s.finalbody and _terminates(s.finalbody):
                return True
            normal = _terminates(s.orelse) if s.orelse else _terminates(s.body)
            if normal and all(_terminates(h.body) for h in s.handlers):
                return True
        elif isinstance(s, (ast.With, ast.AsyncWith)):
            if _terminates(s.body):
                return True
        elif isinstance(s, ast.Match):
            wildcard = bool(s.cases) and isinstance(
                s.cases[-1].pattern, ast.MatchAs
            ) and s.cases[-1].pattern.pattern is None and s.cases[-1].guard is None
            if wildcard and all(_terminates(c.body) for c in s.cases):
                return True
    return False


_NORETURN_NAMES = frozenset({"NoReturn", "Never"})
_UNCHECKABLE_RETURN_NAMES = frozenset({"Any", "object"})
_RET_SKIP_DECORATORS = frozenset({"overload", "abstractmethod", "abstractproperty"})


def _returns_requires_value(ann: ast.expr) -> bool:
    """Whether a return annotation definitely requires a value on every
    path (mypy's "Missing return statement" precondition). ``None``,
    ``NoReturn``/``Never``, ``Any``/``object``, ``Optional[...]``,
    ``... | None`` and string forward refs all report False (bare
    fall-through is, or may be, legal for them)."""
    if isinstance(ann, ast.Constant):
        return False  # ``-> None`` or a string forward ref
    if isinstance(ann, ast.Name):
        return ann.id not in _NORETURN_NAMES | _UNCHECKABLE_RETURN_NAMES
    if isinstance(ann, ast.Attribute):
        return ann.attr not in _NORETURN_NAMES | _UNCHECKABLE_RETURN_NAMES
    if isinstance(ann, ast.BinOp) and isinstance(ann.op, ast.BitOr):
        return _returns_requires_value(ann.left) and _returns_requires_value(ann.right)
    if isinstance(ann, ast.Subscript):
        base = ann.value
        base_name = base.attr if isinstance(base, ast.Attribute) else getattr(base, "id", None)
        if base_name == "Optional":
            return False
        if base_name == "Union":
            elts = ann.slice.elts if isinstance(ann.slice, ast.Tuple) else [ann.slice]
            return all(_returns_requires_value(e) for e in elts)
        return True  # list[int], dict[...], Callable[...], ...
    return False  # anything else: not statically decidable


def _is_stub_body(body: list[ast.stmt]) -> bool:
    """Docstring + ``pass``/``...`` only — a protocol/overload stub."""
    rest = body[1:] if (
        body and isinstance(body[0], ast.Expr)
        and isinstance(body[0].value, ast.Constant) and isinstance(body[0].value.value, str)
    ) else body
    return all(
        isinstance(s, ast.Pass)
        or (isinstance(s, ast.Expr) and isinstance(s.value, ast.Constant)
            and s.value.value is Ellipsis)
        for s in rest
    )


def _missing_return_findings(path: Path, tree: ast.Module) -> list[str]:
    """RET201/RET202 (mypy ``return``-lite): a function whose return
    annotation definitely requires a value (``-> int``, ``-> list[str]``,
    a custom class — NOT ``None``/``Optional``/``Any``/``NoReturn``/
    forward-ref strings) must

    - RET201: not be able to fall off the end of its body (every path
      ends in ``return``/``raise``, via the same conservative
      path-termination analysis mypy performs), and
    - RET202: not contain a bare ``return`` (mypy: "Return value
      expected").

    Generators (``yield`` in the function's own scope), stub bodies
    (docstring + ``pass``/``...``) and ``@overload``/``@abstractmethod``
    functions are exempt."""
    findings: list[str] = []
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        if fn.returns is None or not _returns_requires_value(fn.returns):
            continue
        skip = any(
            (isinstance(d, ast.Name) and d.id in _RET_SKIP_DECORATORS)
            or (isinstance(d, ast.Attribute) and d.attr in _RET_SKIP_DECORATORS)
            for d in fn.decorator_list
        )
        if skip or _is_stub_body(fn.body):
            continue
        if _has_own_scope_node(fn, (ast.Yield, ast.YieldFrom)):
            continue
        if not _terminates(fn.body):
            findings.append(
                f"{path}:{fn.lineno}: RET201 '{fn.name}' is annotated "
                f"'-> {ast.unparse(fn.returns)}' but control flow can fall "
                "off the end of its body (implicit None)"
            )
        for node in _own_scope_nodes(fn, (ast.Return,)):
            if node.value is None:
                findings.append(
                    f"{path}:{node.lineno}: RET202 '{fn.name}' is annotated "
                    f"'-> {ast.unparse(fn.returns)}' but has a bare 'return'"
                )
    return findings


def _own_scope_nodes(fn: ast.AST, kinds: tuple[type, ...]) -> list[ast.AST]:
    """Nodes of the given kinds in ``fn``'s own scope (nested function/
    lambda/class scopes excluded)."""
    out: list[ast.AST] = []

    def visit(n: ast.AST) -> None:
        for child in ast.iter_child_nodes(n):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef,
                                  ast.Lambda, ast.ClassDef)):
                continue
            if isinstance(child, kinds):
                out.append(child)
            visit(child)

    visit(fn)
    return out


_MUTABLE_CALLS = frozenset({"list", "dict", "set", "bytearray"})
_MUTABLE_COLLECTIONS_ATTRS = frozenset({"defaultdict", "deque", "Counter", "OrderedDict"})


def _is_mutable_ctor_call(d: ast.expr) -> bool:
    """A call to a mutable builtin / ``collections`` constructor."""
    if not isinstance(d, ast.Call):
        return False
    f = d.func
    if isinstance(f, ast.Name) and f.id in _MUTABLE_CALLS:
        return True
    return isinstance(f, ast.Attribute) and f.attr in _MUTABLE_COLLECTIONS_ATTRS


def _mutable_default_findings(path: Path, tree: ast.Module) -> list[str]:
    """B006 (flake8-bugbear): mutable argument defaults. A ``def f(x=[])``
    default is evaluated ONCE and shared across calls — mutations leak
    between invocations. Flags list/dict/set literals and comprehensions,
    and calls to the mutable builtins / ``collections`` constructors."""
    findings: list[str] = []

    def is_mutable(d: ast.expr) -> bool:
        if isinstance(d, (ast.List, ast.Dict, ast.Set, ast.ListComp, ast.DictComp, ast.SetComp)):
            return True
        return _is_mutable_ctor_call(d)

    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)):
            a = node.args
            name = getattr(node, "name", "<lambda>")
            for d in list(a.defaults) + [k for k in a.kw_defaults if k is not None]:
                if is_mutable(d):
                    findings.append(
                        f"{path}:{d.lineno}: B006 '{name}' has a mutable "
                        "argument default (shared across calls); use None "
                        "and fill in the body"
                    )
    return findings


def _call_default_findings(path: Path, tree: ast.Module) -> list[str]:
    """B008 (flake8-bugbear): any function call in an argument default is
    evaluated ONCE at def time, not per call — surprising for defaults that
    look dynamic (``def f(t=time.time())``). B006 handles the mutable
    constructors; this flags the rest. (E731 is deliberately NOT enforced:
    pyproject.toml ignores it — short lambdas are idiomatic jit-local
    helpers in this codebase.)"""
    findings: list[str] = []
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)):
            name = getattr(node, "name", "<lambda>")
            a = node.args
            for d in list(a.defaults) + [k for k in a.kw_defaults if k is not None]:
                for sub in ast.walk(d):
                    if isinstance(sub, ast.Call) and not _is_mutable_ctor_call(sub):
                        findings.append(
                            f"{path}:{sub.lineno}: B008 '{name}' calls "
                            f"'{ast.unparse(sub.func)}' in an argument default "
                            "(evaluated once at def time)"
                        )
                        break
    return findings


# ---------------------------------------------------------------------------
# ATTR101: self-attribute reads that are never assigned (mypy attr-defined-lite)
# ---------------------------------------------------------------------------

# Attributes every object (or every dataclass) carries implicitly.
_UNIVERSAL_ATTRS = frozenset({
    "__class__", "__dict__", "__doc__", "__module__", "__slots__",
    "__annotations__", "__name__", "__qualname__",
    "__dataclass_fields__", "__dataclass_params__",
})
_ATTR_DYNAMIC_METHODS = frozenset({"__getattr__", "__getattribute__", "__setattr__"})
# Class decorators whose attribute surface this check understands, mapped to
# the attributes they inject; any other decorator may inject attributes
# (attrs, registries), so it disqualifies the class. flax's struct.dataclass
# generates ``.replace`` (dataclasses.replace as a method).
_ATTR_SAFE_DECORATORS: dict[str, frozenset[str]] = {
    "dataclass": frozenset(),
    "dataclasses.dataclass": frozenset(),
    "struct.dataclass": frozenset({"replace"}),
    "flax.struct.dataclass": frozenset({"replace"}),
    "total_ordering": frozenset(),
    "functools.total_ordering": frozenset(),
}


def _decorator_base_name(d: ast.expr) -> str | None:
    """The trailing identifier of a decorator expression (``a.b.c()`` → c)."""
    if isinstance(d, ast.Call):
        d = d.func
    if isinstance(d, ast.Attribute):
        return d.attr
    if isinstance(d, ast.Name):
        return d.id
    return None


def _decorator_dotted_name(d: ast.expr) -> str | None:
    """The full dotted name of a decorator expression (``a.b.c()`` → a.b.c),
    or None when it is not a plain (possibly called) dotted name."""
    if isinstance(d, ast.Call):
        d = d.func
    parts: list[str] = []
    while isinstance(d, ast.Attribute):
        parts.append(d.attr)
        d = d.value
    if not isinstance(d, ast.Name):
        return None
    parts.append(d.id)
    return ".".join(reversed(parts))


def _attribute_store_names(tree: ast.AST) -> set[str]:
    """Every attribute name the tree assigns on ANY object — plain
    ``x.attr = …`` / ``del x.attr`` stores, literal ``setattr(x, "attr", …)``
    calls, and names defined in any class body (methods, class vars,
    annotated fields): the global whitelist ATTR101 checks reads against."""
    out: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Attribute) and isinstance(node.ctx, (ast.Store, ast.Del)):
            out.add(node.attr)
        elif (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
                and node.func.id == "setattr" and len(node.args) >= 2
                and isinstance(node.args[1], ast.Constant)
                and isinstance(node.args[1].value, str)):
            out.add(node.args[1].value)
        elif isinstance(node, ast.ClassDef):
            for st in _class_body_stmts(node):
                if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                    out.add(st.name)
                elif isinstance(st, ast.Assign):
                    for t in st.targets:
                        for n in ast.walk(t):
                            if isinstance(n, ast.Name):
                                out.add(n.id)
                elif isinstance(st, ast.AnnAssign) and isinstance(st.target, ast.Name):
                    out.add(st.target.id)
    return out


def _class_body_stmts(cls: ast.ClassDef) -> list[ast.stmt]:
    """Class-body statements, descending into if/try/with blocks (for
    conditionally-defined methods) but NOT into function bodies."""
    out: list[ast.stmt] = []

    def visit(stmts: list[ast.stmt]) -> None:
        for st in stmts:
            out.append(st)
            if isinstance(st, (ast.If, ast.Try, ast.With, ast.For, ast.While)):
                for field in ("body", "orelse", "finalbody"):
                    visit(getattr(st, field, []) or [])
                for h in getattr(st, "handlers", []) or []:
                    visit(h.body)

    visit(cls.body)
    return out


def _receiver_of(fn: ast.FunctionDef | ast.AsyncFunctionDef) -> str | None:
    """The instance/class receiver parameter name, or None for staticmethods
    and receiver-less defs."""
    for d in fn.decorator_list:
        if _decorator_base_name(d) == "staticmethod":
            return None
    params = [*fn.args.posonlyargs, *fn.args.args]
    return params[0].arg if params else None


def _method_disqualified(fn: ast.AST, receiver: str) -> bool:
    """Whether reads of ``receiver.x`` inside ``fn`` are not statically
    attributable: the receiver is rebound, shadowed by a nested function's
    parameter, or inspected dynamically (hasattr/getattr/vars/delattr)."""
    for node in ast.walk(fn):
        if (isinstance(node, ast.Name) and node.id == receiver
                and isinstance(node.ctx, (ast.Store, ast.Del))):
            return True
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)):
            if node is not fn and any(
                a.arg == receiver
                for a in [*node.args.posonlyargs, *node.args.args, *node.args.kwonlyargs]
            ):
                return True
        if (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
                and node.func.id in ("hasattr", "getattr", "vars", "delattr", "setattr")
                and node.args and isinstance(node.args[0], ast.Name)
                and node.args[0].id == receiver):
            return True
    return False


def _class_eligibility_and_attrs(
    cls: ast.ClassDef,
    classes_by_name: dict[str, ast.ClassDef],
    visiting: frozenset[str] | None = None,
) -> tuple[bool, set[str]]:
    """(eligible, attribute names) for a class, merging same-module bases.

    A class is eligible only when its full attribute surface is statically
    knowable: bases are ``object`` or eligible same-module classes, all
    decorators are understood (dataclass/total_ordering), and no
    ``__getattr__``-family hook is defined anywhere in the MRO we can see.
    """
    visiting = visiting if visiting is not None else frozenset()
    if cls.name in visiting:  # cyclic base reference: not resolvable
        return False, set()
    attrs: set[str] = set()
    for d in cls.decorator_list:
        dotted = _decorator_dotted_name(d)
        if dotted is None or dotted not in _ATTR_SAFE_DECORATORS:
            return False, set()
        attrs |= _ATTR_SAFE_DECORATORS[dotted]
    for base in cls.bases:
        if isinstance(base, ast.Name) and base.id == "object":
            continue
        if isinstance(base, ast.Name) and base.id in classes_by_name:
            ok, base_attrs = _class_eligibility_and_attrs(
                classes_by_name[base.id], classes_by_name, visiting | {cls.name}
            )
            if not ok:
                return False, set()
            attrs |= base_attrs
            continue
        return False, set()  # external/compound base: surface unknowable
    if cls.keywords:  # metaclass=… and friends: unknowable
        return False, set()
    methods: list[ast.FunctionDef | ast.AsyncFunctionDef] = []
    for st in _class_body_stmts(cls):
        if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if st.name in _ATTR_DYNAMIC_METHODS:
                return False, set()
            attrs.add(st.name)
            methods.append(st)
        elif isinstance(st, ast.ClassDef):
            attrs.add(st.name)
        elif isinstance(st, ast.Assign):
            for t in st.targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        attrs.add(n.id)
        elif isinstance(st, ast.AnnAssign) and isinstance(st.target, ast.Name):
            attrs.add(st.target.id)
    for fn in methods:
        receiver = _receiver_of(fn)
        if receiver is None:
            continue
        for node in ast.walk(fn):
            if (isinstance(node, ast.Attribute)
                    and isinstance(node.ctx, (ast.Store, ast.Del))
                    and isinstance(node.value, ast.Name)
                    and node.value.id == receiver):
                attrs.add(node.attr)
    return True, attrs


def _self_attribute_findings(
    path: Path, tree: ast.Module, repo_attrs: set[str]
) -> list[str]:
    """ATTR101 (mypy ``attr-defined``-lite): a ``self.x`` (or ``cls.x``)
    READ inside a method must resolve to an attribute the class actually
    has — assigned in any method, defined in the class body, or inherited
    from a same-module base.

    Conservative by construction, so a finding is a genuine AttributeError
    on that path: classes with unknown decorators, external or compound
    bases, ``metaclass=``, or any ``__getattr__``-family hook are skipped
    entirely; methods that rebind or dynamically inspect the receiver
    (hasattr/getattr/vars/setattr/delattr on it) are skipped; and the read
    is whitelisted if ANY object in the linted tree ever stores that
    attribute name (``repo_attrs`` — so cross-class injection patterns and
    subclass-provided attributes never false-positive, while typo'd names,
    which are stored nowhere, are still caught).
    """
    findings: list[str] = []
    classes_by_name: dict[str, ast.ClassDef] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef):
            # Later same-name definitions shadow earlier ones; keep the last.
            classes_by_name[node.name] = node
    for cls in classes_by_name.values():
        ok, attrs = _class_eligibility_and_attrs(cls, classes_by_name)
        if not ok:
            continue
        allowed = attrs | _UNIVERSAL_ATTRS | repo_attrs
        for st in _class_body_stmts(cls):
            if not isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            receiver = _receiver_of(st)
            if receiver is None or _method_disqualified(st, receiver):
                continue
            for node in ast.walk(st):
                if (isinstance(node, ast.Attribute)
                        and isinstance(node.ctx, ast.Load)
                        and isinstance(node.value, ast.Name)
                        and node.value.id == receiver
                        and node.attr not in allowed):
                    findings.append(
                        f"{path}:{node.lineno}: ATTR101 '{receiver}.{node.attr}' "
                        f"is read but never assigned anywhere (class '{cls.name}')"
                    )
    return findings


def _class_method_defs_and_stores(tree: ast.AST) -> tuple[dict[str, int], set[str]]:
    """(method-name → definition count over every class body in the tree,
    attribute-store names that could rebind a method at runtime). A method
    is only call-checkable when its name is defined exactly once across all
    linted class bodies (no override can change the dispatched signature)
    and is never the target of an attribute store (``x.m = …``, ``del``,
    literal ``setattr``) or a class-body assignment anywhere."""
    defs: dict[str, int] = {}
    stores: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Attribute) and isinstance(node.ctx, (ast.Store, ast.Del)):
            stores.add(node.attr)
        elif (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
                and node.func.id == "setattr" and len(node.args) >= 2
                and isinstance(node.args[1], ast.Constant)
                and isinstance(node.args[1].value, str)):
            stores.add(node.args[1].value)
        elif isinstance(node, ast.ClassDef):
            for st in _class_body_stmts(node):
                if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    defs[st.name] = defs.get(st.name, 0) + 1
                elif isinstance(st, ast.Assign):
                    for t in st.targets:
                        for n in ast.walk(t):
                            if isinstance(n, ast.Name):
                                stores.add(n.id)
                elif isinstance(st, ast.AnnAssign) and isinstance(st.target, ast.Name):
                    stores.add(st.target.id)
    return defs, stores


def _resolve_class_method(
    cls: ast.ClassDef,
    name: str,
    classes_by_name: dict[str, ast.ClassDef],
    visiting: frozenset[str] | None = None,
) -> ast.FunctionDef | ast.AsyncFunctionDef | None:
    """The ``def`` a method name resolves to on ``cls`` — own body first,
    then same-module ``ast.Name`` bases in MRO order — or None."""
    visiting = visiting if visiting is not None else frozenset()
    if cls.name in visiting:
        return None
    for st in _class_body_stmts(cls):
        if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef)) and st.name == name:
            return st
    for base in cls.bases:
        if isinstance(base, ast.Name) and base.id in classes_by_name:
            fn = _resolve_class_method(
                classes_by_name[base.id], name, classes_by_name, visiting | {cls.name}
            )
            if fn is not None:
                return fn
    return None


def _method_kind(fn: ast.FunctionDef | ast.AsyncFunctionDef) -> str | None:
    """'instance' / 'class' / 'static' for an undecorated method or one
    carrying exactly a classmethod/staticmethod decorator — None for any
    other decoration (property, cached_property, jit, …: the call goes
    through a descriptor or wrapper whose signature we cannot know)."""
    if not fn.decorator_list:
        return "instance"
    if len(fn.decorator_list) == 1:
        name = _decorator_base_name(fn.decorator_list[0])
        if name == "classmethod":
            return "class"
        if name == "staticmethod":
            return "static"
    return None


def _method_call_findings(
    path: Path,
    tree: ast.Module,
    method_defs: dict[str, int] | None = None,
    method_stores: set[str] | None = None,
) -> list[str]:
    """CALL101-104 on METHOD calls: ``self.m(...)`` (and ``cls.m(...)``)
    inside a method is checked against the resolved ``def m`` of the class
    — own body or a same-module base — with the bound receiver stripped
    per descriptor kind (instance/classmethod drop the first parameter,
    staticmethod keeps all).

    Conservative by construction, so a finding is a genuine TypeError on
    that call path. The class must be ATTR101-eligible (statically-knowable
    surface); the method name must be defined exactly once across every
    class body in the linted tree (``method_defs`` — no override anywhere
    can re-route the dispatch) and never stored as an attribute or
    class-body assignment (``method_stores`` — no runtime rebinding);
    dunder names, decorated targets beyond classmethod/staticmethod,
    ``cls.<instance method>`` calls (unbound — passes the explicit first
    argument as ``self``), receiver-rebinding callers and ``*``/``**``
    call sites are all skipped.
    """
    findings: list[str] = []
    if method_defs is None or method_stores is None:
        method_defs, method_stores = _class_method_defs_and_stores(tree)
    call_envs = _call_const_envs(tree)
    classes_by_name: dict[str, ast.ClassDef] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef):
            classes_by_name[node.name] = node
    for cls in classes_by_name.values():
        ok, _attrs = _class_eligibility_and_attrs(cls, classes_by_name)
        if not ok:
            continue
        for st in _class_body_stmts(cls):
            if not isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            receiver = _receiver_of(st)
            if receiver is None or _method_disqualified(st, receiver):
                continue
            caller_kind = _method_kind(st) or "instance"
            for node in ast.walk(st):
                if not (isinstance(node, ast.Call)
                        and isinstance(node.func, ast.Attribute)
                        and isinstance(node.func.value, ast.Name)
                        and node.func.value.id == receiver):
                    continue
                name = node.func.attr
                if name.startswith("__") and name.endswith("__"):
                    continue
                if method_defs.get(name, 0) != 1 or name in method_stores:
                    continue
                target = _resolve_class_method(cls, name, classes_by_name)
                if target is None:
                    continue
                kind = _method_kind(target)
                if kind is None:
                    continue
                if kind == "instance" and caller_kind == "class":
                    continue  # cls.m on an instance method: unbound call
                if kind == "static":
                    sig = target.args
                else:
                    sig = _args_without_receiver(target.args)
                    if sig is None:
                        continue
                if any(isinstance(a, ast.Starred) for a in node.args) or any(
                    k.arg is None for k in node.keywords
                ):
                    continue
                label = f"{cls.name}.{name}"
                findings.extend(_signature_binding_findings(path, node, sig, label))
                findings.extend(_literal_binding_findings(
                    path, node, sig, label, call_envs.get(id(node))
                ))
    return findings


# A method table maps method name → (descriptor kind, receiver-stripped
# signature) for every checkable method of one eligible class.
MethodTable = dict[str, tuple[str, ast.arguments]]


def _class_method_tables(tree: ast.AST) -> dict[str, MethodTable]:
    """Checkable method tables for every ATTR101-eligible class in the tree
    that does not define ``__new__`` (a custom ``__new__`` may hand back an
    instance of some other class, so ``x = C(...)`` would not pin ``x``'s
    type). Own-body methods shadow same-module base methods; a method whose
    descriptor kind is unknowable (property, cached_property, …) blocks the
    name entirely rather than falling through to a base."""
    classes_by_name: dict[str, ast.ClassDef] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef):
            classes_by_name[node.name] = node
    out: dict[str, MethodTable] = {}
    for cls in classes_by_name.values():
        ok, _attrs = _class_eligibility_and_attrs(cls, classes_by_name)
        if not ok:
            continue
        table: dict[str, tuple[str, ast.arguments] | None] = {}
        blocked = False

        def collect(c: ast.ClassDef, visiting: frozenset[str]) -> None:
            nonlocal blocked
            if c.name in visiting:
                return
            for st in _class_body_stmts(c):
                if not isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    continue
                if st.name == "__new__":
                    blocked = True
                    return
                if st.name in table:
                    continue  # derived definition wins
                kind = _method_kind(st)
                if kind is None:
                    table[st.name] = None
                    continue
                sig = st.args if kind == "static" else _args_without_receiver(st.args)
                table[st.name] = (kind, sig) if sig is not None else None
            for base in c.bases:
                if isinstance(base, ast.Name) and base.id in classes_by_name:
                    collect(classes_by_name[base.id], visiting | {c.name})

        collect(cls, frozenset())
        if not blocked:
            out[cls.name] = {k: v for k, v in table.items() if v is not None}
    return out


def _own_scope_all_nodes(scope: ast.AST) -> list[ast.AST]:
    """Every node in ``scope``'s own scope — nested function/lambda/class
    HEADS included (they bind names here) but their bodies excluded (their
    locals are separate namespaces). Unlike ``_own_scope_nodes`` this
    returns all nodes, unfiltered."""
    out: list[ast.AST] = []

    def visit(n: ast.AST) -> None:
        for child in ast.iter_child_nodes(n):
            out.append(child)
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef,
                                  ast.Lambda, ast.ClassDef)):
                continue
            visit(child)

    visit(scope)
    return out


def _instance_method_call_findings(
    path: Path,
    tree: ast.Module,
    class_tables: dict[str, MethodTable],
    method_stores: set[str],
) -> list[str]:
    """CALL101-104 on LOCAL-INSTANCE method calls: in a scope that binds
    ``x = C(...)`` exactly once — where ``C`` resolves to an eligible
    same-module or package-imported class — every later ``x.m(...)`` in
    that scope is checked against ``C``'s method table (receiver stripped
    per descriptor kind, as for ``self.m``).

    Conservative: the variable must be stored exactly once in its scope
    (no reassignment, augmented assignment, loop target, ``del``,
    ``global``/``nonlocal`` declaration — a ``nonlocal`` rebind from a
    nested function counts — ``except ... as``/match-capture binding, or
    parameter of the same name),
    the class name must be uniquely bound in this file, the call must come
    textually after the binding, and the repo-wide rebind guard applies
    (``method_stores`` — any ``obj.m = …``/class-body assignment of the
    name anywhere skips it). Unlike the ``self.m`` pass, subclass
    overrides need NO guard here: the constructor pins the instance's
    exact class (``__new__``-defining classes are excluded from the
    tables), so dispatch cannot be re-routed.
    """
    findings: list[str] = []
    if not class_tables:
        return findings
    _fns, bind_counts = _module_call_candidates(tree)
    const_envs = _const_local_envs(tree)
    scopes: list[ast.AST] = [tree]
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            scopes.append(node)
    for scope in scopes:
        own = _own_scope_all_nodes(scope)
        store_counts, declared, params = _scope_binding_counts(scope)
        instances: dict[str, tuple[MethodTable, str, int]] = {}
        for n in own:
            if not (isinstance(n, ast.Assign) and len(n.targets) == 1
                    and isinstance(n.targets[0], ast.Name)
                    and isinstance(n.value, ast.Call)
                    and isinstance(n.value.func, ast.Name)):
                continue
            var, cls_name = n.targets[0].id, n.value.func.id
            table = class_tables.get(cls_name)
            if (table is None or bind_counts.get(cls_name, 0) != 1
                    or store_counts.get(var, 0) != 1
                    or var in params or var in declared):
                continue
            instances[var] = (table, cls_name, n.lineno)
        if not instances:
            continue
        for n in own:
            if not (isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute)
                    and isinstance(n.func.value, ast.Name)):
                continue
            entry = instances.get(n.func.value.id)
            if entry is None:
                continue
            table, cls_name, bind_line = entry
            name = n.func.attr
            if n.lineno < bind_line or (name.startswith("__") and name.endswith("__")):
                continue
            if name in method_stores:
                continue
            hit = table.get(name)
            if hit is None:
                continue
            _kind, sig = hit
            if any(isinstance(a, ast.Starred) for a in n.args) or any(
                k.arg is None for k in n.keywords
            ):
                continue
            label = f"{cls_name}.{name}"
            findings.extend(_signature_binding_findings(path, n, sig, label))
            findings.extend(_literal_binding_findings(
                path, n, sig, label, const_envs.get(id(scope))
            ))
    return findings


def _instance_attribute_findings(
    path: Path, tree: ast.Module, repo_attrs: set[str]
) -> list[str]:
    """ATTR102 (mypy ``attr-defined``-lite on locals): in a scope that
    binds ``x = C(...)`` exactly once — ``C`` an ATTR101-eligible
    same-module class that defines no ``__new__`` (so the constructor pins
    the exact type) — every later ``x.attr`` READ must resolve to the
    class surface, exactly as ATTR101 checks ``self.attr`` inside methods.

    Same conservative rules as the local-instance call pass (single
    textual store, unique class binding, read after the binding) plus
    ATTR101's: a dynamic inspection of the variable anywhere in the scope
    (hasattr/getattr/vars/setattr/delattr) drops it, dunder reads are
    skipped, and the cross-file attribute-store whitelist (``repo_attrs``)
    suppresses injection patterns — so a finding is an attribute the
    linted tree never defines or stores on ANY object."""
    classes_by_name: dict[str, ast.ClassDef] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef):
            classes_by_name[node.name] = node
    surfaces: dict[str, set[str]] = {}
    for cls in classes_by_name.values():
        if any(isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef))
               and st.name == "__new__" for st in _class_body_stmts(cls)):
            continue
        ok, attrs = _class_eligibility_and_attrs(cls, classes_by_name)
        if ok:
            surfaces[cls.name] = attrs
    if not surfaces:
        return []
    _fns, bind_counts = _module_call_candidates(tree)
    findings: list[str] = []
    scopes: list[ast.AST] = [tree]
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            scopes.append(node)
    for scope in scopes:
        own = _own_scope_all_nodes(scope)
        store_counts, declared, params = _scope_binding_counts(scope)
        instances: dict[str, tuple[set[str], str, int]] = {}
        for n in own:
            if not (isinstance(n, ast.Assign) and len(n.targets) == 1
                    and isinstance(n.targets[0], ast.Name)
                    and isinstance(n.value, ast.Call)
                    and isinstance(n.value.func, ast.Name)):
                continue
            var, cls_name = n.targets[0].id, n.value.func.id
            attrs = surfaces.get(cls_name)
            if (attrs is None or bind_counts.get(cls_name, 0) != 1
                    or store_counts.get(var, 0) != 1
                    or var in params or var in declared):
                continue
            instances[var] = (attrs, cls_name, n.lineno)
        if not instances:
            continue
        for n in own:
            if (isinstance(n, ast.Call) and isinstance(n.func, ast.Name)
                    and n.func.id in ("hasattr", "getattr", "vars",
                                      "delattr", "setattr")
                    and n.args and isinstance(n.args[0], ast.Name)):
                instances.pop(n.args[0].id, None)
        for n in own:
            if not (isinstance(n, ast.Attribute) and isinstance(n.ctx, ast.Load)
                    and isinstance(n.value, ast.Name)):
                continue
            entry = instances.get(n.value.id)
            if entry is None:
                continue
            attrs, cls_name, bind_line = entry
            if (n.lineno < bind_line
                    or (n.attr.startswith("__") and n.attr.endswith("__"))):
                continue
            if n.attr in attrs or n.attr in _UNIVERSAL_ATTRS or n.attr in repo_attrs:
                continue
            findings.append(
                f"{path}:{n.lineno}: ATTR102 '{n.value.id}.{n.attr}' is read "
                f"but never assigned anywhere (instance of '{cls_name}')"
            )
    return findings


def check_file(
    path: Path,
    repo_attrs: set[str] | None = None,
    repo_fns: dict[str, tuple[dict[str, ast.FunctionDef | ast.AsyncFunctionDef],
                              dict[str, int]]] | None = None,
    pkg_parts: list[str] | None = None,
    repo_methods: tuple[dict[str, int], set[str]] | None = None,
    repo_classes: dict[str, dict[str, MethodTable]] | None = None,
    repo_reexports: dict[str, dict[str, tuple[str, str]]] | None = None,
) -> list[str]:
    """Return a list of "path:line: code message" findings for one file.

    ``repo_attrs`` is the cross-file attribute-store whitelist ATTR101 reads
    against (``check_paths`` supplies the union over all linted files); when
    None, the file's own stores stand in — correct for single-file use.
    ``repo_fns`` is the repo-wide module→(functions, bind counts) signature
    table that lets the CALL1xx checks resolve package-module imports, and
    ``pkg_parts`` the importing file's own package path for relative
    imports; both default to single-file behavior (same-module only).
    ``repo_methods`` is the repo-wide (method-def counts, rebinding stores)
    pair the method-call checks guard overrides/rebinds against,
    ``repo_classes`` the module→class-method-table map that lets the
    instance-tracking checks resolve imported classes, and
    ``repo_reexports`` the per-module import-hop table that lets both
    resolve names through package ``__init__`` surfaces; when None, the
    file's own tables stand in.
    """
    findings: list[str] = []
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]
    imported_fns, imported_tables = _imported_symbols(
        tree, pkg_parts, repo_fns or {}, repo_classes or {}, repo_reexports or {}
    )
    attrs_whitelist = (
        repo_attrs if repo_attrs is not None else _attribute_store_names(tree)
    )
    findings.extend(_self_attribute_findings(path, tree, attrs_whitelist))
    findings.extend(_instance_attribute_findings(path, tree, attrs_whitelist))
    method_defs, method_stores = (
        repo_methods if repo_methods is not None
        else _class_method_defs_and_stores(tree)
    )
    findings.extend(_method_call_findings(path, tree, method_defs, method_stores))
    class_tables = {
        **imported_tables,
        **_class_method_tables(tree),  # same-module definitions win
    }
    findings.extend(_instance_method_call_findings(
        path, tree, class_tables, method_stores
    ))

    for lineno, line in enumerate(src.splitlines(), 1):
        if len(line) > MAX_LINE_LENGTH:
            findings.append(
                f"{path}:{lineno}: E501 line too long ({len(line)} > {MAX_LINE_LENGTH})"
            )
    findings.extend(_comparison_findings(path, tree))
    findings.extend(_mutable_default_findings(path, tree))
    findings.extend(_call_default_findings(path, tree))
    findings.extend(_call_signature_findings(path, tree, imported_fns))
    findings.extend(_literal_type_findings(path, tree, imported_fns))
    findings.extend(_missing_return_findings(path, tree))
    findings.extend(_escape_findings(path, src))
    findings.extend(_undefined_findings(path, tree))
    findings.extend(_unused_local_findings(path, tree))
    if "multimodal_mtrssm_tpu" in path.parts:
        findings.extend(_docstring_findings(path, tree))
        findings.extend(_return_annotation_findings(path, tree))
        findings.extend(_arg_annotation_findings(path, tree))
        findings.extend(_return_value_findings(path, tree))
    findings.extend(_doc_signature_findings(path, tree))

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
    """Run the checks over all ``.py`` files under the given roots.

    Two passes: the first collects (a) every attribute name stored on any
    object anywhere in the linted tree (the ATTR101 whitelist — so
    attributes provided by subclasses or injected cross-module never
    false-positive) and (b) the per-module function-signature table keyed
    by dotted module name (files under a directory root are modules of the
    package named after that root — so the CALL1xx checks resolve
    ``from <package module> import f`` call sites); the second runs the
    per-file checks against both.
    """
    entries: list[tuple[Path, Path]] = []
    for root in roots:
        files = [root] if root.is_file() else sorted(root.rglob("*.py"))
        entries.extend((f, root) for f in files if "__pycache__" not in f.parts)
    repo_attrs: set[str] = set()
    repo_fns: dict[str, tuple[dict[str, ast.FunctionDef | ast.AsyncFunctionDef],
                              dict[str, int]]] = {}
    pkg_ctx: dict[Path, list[str]] = {}
    method_defs: dict[str, int] = {}
    method_stores: set[str] = set()
    repo_classes: dict[str, dict[str, MethodTable]] = {}
    repo_reexports: dict[str, dict[str, tuple[str, str]]] = {}
    for f, root in entries:
        try:
            tree = ast.parse(f.read_text())
        except SyntaxError:
            continue  # the per-file pass reports E999
        repo_attrs |= _attribute_store_names(tree)
        f_defs, f_stores = _class_method_defs_and_stores(tree)
        for k, v in f_defs.items():
            method_defs[k] = method_defs.get(k, 0) + v
        method_stores |= f_stores
        if root.is_dir():
            parts = [root.name, *f.relative_to(root).parts]
            parts[-1] = parts[-1][: -len(".py")]
            if parts[-1] == "__init__":
                parts.pop()
                pkg_ctx[f] = parts  # a package's __init__ resolves in itself
            else:
                pkg_ctx[f] = parts[:-1]
            dotted = ".".join(parts)
            repo_fns[dotted] = _module_call_candidates(tree)
            repo_classes[dotted] = _class_method_tables(tree)
            repo_reexports[dotted] = _module_reexports(tree, pkg_ctx[f])
    findings: list[str] = []
    for f, _root in entries:
        findings.extend(check_file(
            f, repo_attrs=repo_attrs, repo_fns=repo_fns, pkg_parts=pkg_ctx.get(f),
            repo_methods=(method_defs, method_stores), repo_classes=repo_classes,
            repo_reexports=repo_reexports,
        ))
    return findings

"""Static-analysis gates (reference pyproject.toml:73-97 parity).

Runs real ``ruff check`` / ``mypy`` when the tools are installed (they are
configured in pyproject.toml); the in-repo AST subset
(``multimodal_mtrssm_tpu.utils.lint``) always runs.
"""

import shutil
import subprocess
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
ROOTS = [
    REPO_ROOT / "multimodal_mtrssm_tpu",
    REPO_ROOT / "tests",
    REPO_ROOT / "scripts",
    REPO_ROOT / "benchmarks",
    REPO_ROOT / "bench.py",
    REPO_ROOT / "__graft_entry__.py",
]


def test_ast_lint_clean():
    from multimodal_mtrssm_tpu.utils.lint import check_paths

    findings = check_paths(ROOTS)
    assert not findings, "\n".join(findings)


def test_ast_lint_detects_violations(tmp_path):
    from multimodal_mtrssm_tpu.utils.lint import check_paths

    bad = tmp_path / "bad.py"
    bad.write_text("import os\nimport json\nimport os\nprint(json.dumps({}))\n")
    findings = check_paths([bad])
    assert any("F401 'os'" in f for f in findings)
    assert any("F811" in f for f in findings)
    ugly = tmp_path / "ugly.py"
    ugly.write_text("def f(:\n")
    assert any("E999" in f for f in check_paths([ugly]))


def test_ast_lint_style_rules(tmp_path):
    from multimodal_mtrssm_tpu.utils.lint import check_paths

    style = tmp_path / "style.py"
    style.write_text(
        "x = 1\n"
        "if x == None:\n    pass\n"
        "if x == True:\n    pass\n"
        "if x is 'lit':\n    pass\n"
        "s = '\\d+'\n"
        "y = " + "1 + " * 40 + "1\n"
    )
    findings = check_paths([style])
    for code in ("E711", "E712", "F632", "W605", "E501"):
        assert any(code in f for f in findings), (code, findings)

    # Docstring rule only applies inside the package tree.
    pkg = tmp_path / "multimodal_mtrssm_tpu" / "mod.py"
    pkg.parent.mkdir()
    pkg.write_text("def public():\n    return 1\n")
    assert any("D103" in f for f in check_paths([pkg]))
    outside = tmp_path / "mod2.py"
    outside.write_text("def public():\n    return 1\n")
    assert not any("D103" in f for f in check_paths([outside]))


def test_ast_lint_undefined_names(tmp_path):
    """F821 scope analysis: flags true undefined names, respects Python
    scoping (class bodies invisible to methods, comprehension scopes,
    closures, walrus, global/nonlocal), and skips ``import *`` files."""
    from multimodal_mtrssm_tpu.utils.lint import check_file

    cases = {
        # name: (code, expect an F821 finding)
        "plain undefined": ("def f():\n    '''d'''\n    return missing_name\n", True),
        "typo on rare path": (
            "def f(x):\n    '''d'''\n    if x:\n        return x\n    return resutl\n", True),
        "class attr not visible in method": (
            "class C:\n    '''d'''\n    attr = 1\n"
            "    def m(self):\n        '''d'''\n        return attr\n", True),
        "class attr via self ok": (
            "class C:\n    '''d'''\n    attr = 1\n"
            "    def m(self):\n        '''d'''\n        return self.attr\n", False),
        "closure ok": ("def f():\n    '''d'''\n    y = 1\n    return lambda: y\n", False),
        "comprehension target ok": ("xs = [i * 2 for i in range(3)]\n", False),
        "comprehension target does not leak": ("xs = [i for i in range(3)]\nprint(i)\n", True),
        "walrus ok": ("if (n := 5) > 3:\n    print(n)\n", False),
        # PEP 572: a walrus in a comprehension binds in the ENCLOSING scope.
        "walrus in comp escapes": (
            "def f(xs):\n    ys = [y := x + 1 for x in xs]\n    return y + ys[0]\n",
            False,
        ),
        "walrus in nested comp escapes": (
            "def f(xs):\n    m = [[z := v for v in row] for row in xs]\n    return z\n",
            False,
        ),
        # …but the comprehension's LOOP variable does not.
        "comp loop var does not escape": (
            "def f(xs):\n    ys = [x + 1 for x in xs]\n    return x\n",
            True,
        ),
        "except name ok": ("try:\n    pass\nexcept ValueError as e:\n    print(e)\n", False),
        "global binding visible at module level": (
            "def f():\n    '''d'''\n    global st\n    st = 1\n"
            "def g():\n    '''d'''\n    return st\n", False),
        "import star skips file": ("from os.path import *\nprint(join('a','b'))\n", False),
        "decorator undefined": ("@nope\ndef f():\n    '''d'''\n", True),
        "nonlocal ok": (
            "def f():\n    '''d'''\n    y = 0\n"
            "    def g():\n        '''d'''\n        nonlocal y\n        y += 1\n"
            "    return g\n", False),
        "forward ref to later def ok": (
            "def f():\n    '''d'''\n    return g()\ndef g():\n    '''d'''\n    return 1\n", False),
    }
    for name, (code, expect) in cases.items():
        p = tmp_path / "case.py"
        p.write_text(code)
        got = any("F821" in x for x in check_file(p))
        assert got == expect, (name, check_file(p))


@pytest.mark.skipif(shutil.which("ruff") is None, reason="ruff not installed in image")
def test_ruff_clean():
    proc = subprocess.run(["ruff", "check", "."], cwd=REPO_ROOT, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr


@pytest.mark.skipif(shutil.which("mypy") is None, reason="mypy not installed in image")
def test_mypy_clean():
    proc = subprocess.run(
        ["mypy", "multimodal_mtrssm_tpu"], cwd=REPO_ROOT, capture_output=True, text=True
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_ast_lint_unused_locals(tmp_path):
    """F841 subset: simple never-loaded function locals flag; conservative
    exemptions (underscore, unpacking, aug-assign, closures, dynamic scope)
    do not."""
    from multimodal_mtrssm_tpu.utils.lint import check_file

    cases = {
        # name: (code, expect an F841 finding)
        "dead local": ("def f():\n    '''d'''\n    x = 1\n    return 2\n", True),
        "used local": ("def f():\n    '''d'''\n    x = 1\n    return x\n", False),
        "underscore exempt": ("def f():\n    '''d'''\n    _unused = 1\n    return 2\n", False),
        "unpacking exempt": ("def f(p):\n    '''d'''\n    a, b = p\n    return a\n", False),
        "aug-assign exempt": ("def f(x):\n    '''d'''\n    x += 1\n    return 2\n", False),
        "closure load counts": (
            "def f():\n    '''d'''\n    x = 1\n    return lambda: x\n", False),
        "nested store is its own scope": (
            "def f():\n    '''d'''\n    def g():\n        y = 1\n        return y\n    return g\n",
            False),
        "locals() disables": (
            "def f():\n    '''d'''\n    x = 1\n    return locals()\n", False),
        "global exempt": (
            "g = 0\ndef f():\n    '''d'''\n    global g\n    g = 1\n    return 2\n", False),
        "module level not flagged": ("x = 1\n", False),
    }
    for name, (code, expect) in cases.items():
        p = tmp_path / f"f841_{abs(hash(name))}.py"
        p.write_text(code)
        got = any("F841" in x for x in check_file(p))
        assert got == expect, f"{name}: expected {expect}, findings={check_file(p)}"


def test_ast_lint_doc_signature_consistency(tmp_path):
    """DOC102 (pydoclint-lite): documented params must exist in the
    signature — Google ``Args:`` sections and Sphinx ``:param:`` fields;
    description continuation lines and other sections are not parsed as
    parameter entries."""
    from multimodal_mtrssm_tpu.utils.lint import check_file

    cases = {
        # name: (code, expect a DOC102 finding)
        "google drifted arg": (
            "def f(x):\n"
            '    """Do a thing.\n\n    Args:\n        y: the old name.\n    """\n'
            "    return x\n", True),
        "google matching arg": (
            "def f(x):\n"
            '    """Do.\n\n    Args:\n        x: the input.\n    """\n'
            "    return x\n", False),
        "google typed entry": (
            "def f(x):\n"
            '    """Do.\n\n    Args:\n        z (int): gone.\n    """\n'
            "    return x\n", True),
        "continuation line not an entry": (
            "def f(x):\n"
            '    """Do.\n\n    Args:\n        x: maps name: value pairs\n'
            '            extra: indented continuation, not an entry.\n    """\n'
            "    return x\n", False),
        "returns section not parsed": (
            "def f(x):\n"
            '    """Do.\n\n    Args:\n        x: in.\n\n    Returns:\n'
            '        out: a thing called out.\n    """\n'
            "    return x\n", False),
        "sphinx drifted param": (
            "def f(x):\n"
            '    """Do.\n\n    :param old: renamed away.\n    """\n'
            "    return x\n", True),
        "sphinx typed param ok": (
            "def f(x):\n"
            '    """Do.\n\n    :param int x: the input.\n    """\n'
            "    return x\n", False),
        "varargs and kwargs count": (
            "def f(*args, **kw):\n"
            '    """Do.\n\n    Args:\n        *args: extra.\n        **kw: more.\n    """\n'
            "    return args, kw\n", False),
        "prose with colon not flagged": (
            "def f(x):\n"
            '    """Note: this is prose, not an Args section.\n\n    caveat: still prose.\n    """\n'
            "    return x\n", False),
        "method self not required": (
            "class C:\n"
            '    """D."""\n\n'
            "    def m(self, x):\n"
            '        """Do.\n\n        Args:\n            x: in.\n        """\n'
            "        return x\n", False),
    }
    for name, (code, expect) in cases.items():
        p = tmp_path / f"doc102_{abs(hash(name))}.py"
        p.write_text(code)
        got = any("DOC102" in x for x in check_file(p))
        assert got == expect, f"{name}: expected {expect}, findings={check_file(p)}"


def test_ast_lint_return_annotations(tmp_path):
    """ANN201 subset: public functions/methods inside the package tree must
    carry return annotations; private names, nested defs, and code outside
    the package are exempt."""
    from multimodal_mtrssm_tpu.utils.lint import check_file, check_paths

    pkg = tmp_path / "multimodal_mtrssm_tpu"
    pkg.mkdir()
    cases = {
        # name: (code, expect an ANN201 finding)
        "public fn unannotated": ("def f():\n    '''d'''\n    return 1\n", True),
        "public fn annotated": ("def f() -> int:\n    '''d'''\n    return 1\n", False),
        "private fn exempt": ("def _f():\n    return 1\n", False),
        "public method unannotated": (
            "class C:\n    '''d'''\n\n    def m(self):\n        '''d'''\n        return 1\n", True),
        "dunder init exempt": (
            "class C:\n    '''d'''\n\n    def __init__(self):\n        pass\n", False),
        "private class methods exempt": (
            "class _C:\n    def m(self):\n        return 1\n", False),
        "nested def exempt": (
            "def f() -> int:\n    '''d'''\n    def inner():\n        return 1\n    return inner()\n",
            False),
    }
    for name, (code, expect) in cases.items():
        p = pkg / f"ann201_{abs(hash(name))}.py"
        p.write_text(code)
        got = any("ANN201" in x for x in check_file(p))
        assert got == expect, f"{name}: expected {expect}, findings={check_file(p)}"
    # Outside the package tree the rule does not apply.
    outside = tmp_path / "script.py"
    outside.write_text("def f():\n    '''d'''\n    return 1\n")
    assert not any("ANN201" in x for x in check_paths([outside]))


def test_ast_lint_arg_annotations(tmp_path):
    """ANN001 subset: every parameter of a public function/method inside
    the package tree must carry an annotation; self/cls are exempt,
    *args/**kwargs are not; private names and code outside the package
    are exempt."""
    from multimodal_mtrssm_tpu.utils.lint import check_file, check_paths

    pkg = tmp_path / "multimodal_mtrssm_tpu"
    pkg.mkdir()
    cases = {
        # name: (code, expect an ANN001 finding)
        "unannotated arg": ("def f(x) -> int:\n    '''d'''\n    return x\n", True),
        "annotated arg": ("def f(x: int) -> int:\n    '''d'''\n    return x\n", False),
        "kwonly unannotated": (
            "def f(*, x=1) -> int:\n    '''d'''\n    return x\n", True),
        "vararg unannotated": (
            "def f(*args) -> int:\n    '''d'''\n    return 0\n", True),
        "kwarg annotated": (
            "def f(**kw: object) -> int:\n    '''d'''\n    return 0\n", False),
        "self exempt": (
            "class C:\n    '''d'''\n\n    def m(self, x: int) -> int:\n"
            "        '''d'''\n        return x\n", False),
        "method arg unannotated": (
            "class C:\n    '''d'''\n\n    def m(self, x) -> int:\n"
            "        '''d'''\n        return x\n", True),
        "private fn exempt": ("def _f(x):\n    return x\n", False),
        "nested def exempt": (
            "def f(x: int) -> int:\n    '''d'''\n    def inner(y):\n"
            "        return y\n    return inner(x)\n", False),
    }
    for name, (code, expect) in cases.items():
        p = pkg / f"ann001_{abs(hash(name))}.py"
        p.write_text(code)
        got = any("ANN001" in x for x in check_file(p))
        assert got == expect, f"{name}: expected {expect}, findings={check_file(p)}"
    # Outside the package tree the rule does not apply.
    outside = tmp_path / "script.py"
    outside.write_text("def f(x) -> int:\n    '''d'''\n    return x\n")
    assert not any("ANN001" in x for x in check_paths([outside]))


def test_ast_lint_return_value_consistency(tmp_path):
    """RET-none: a function annotated ``-> None`` must not return a value —
    enforced everywhere in the package, including private and nested
    functions (a wrong ``-> None`` is a latent bug anywhere)."""
    from multimodal_mtrssm_tpu.utils.lint import check_file

    pkg = tmp_path / "multimodal_mtrssm_tpu"
    pkg.mkdir()
    cases = {
        # name: (code, expect a RET-none finding)
        "none fn returns value": (
            "def f(x: int) -> None:\n    '''d'''\n    return x\n", True),
        "none fn bare return": (
            "def f(x: int) -> None:\n    '''d'''\n    return\n", False),
        "none fn returns None": (
            "def f(x: int) -> None:\n    '''d'''\n    return None\n", False),
        "int fn returns value": (
            "def f(x: int) -> int:\n    '''d'''\n    return x\n", False),
        "private none fn returns value": (
            "def _f(x):\n    def g() -> None:\n        return x\n    return g\n",
            True),
        "nested fn returns into outer -> None": (
            "def f(x: int) -> None:\n    '''d'''\n"
            "    def g() -> int:\n        return x\n    g()\n", False),
        "unannotated fn exempt": (
            "def _f(x):\n    return x\n", False),
    }
    for name, (code, expect) in cases.items():
        p = pkg / f"retnone_{abs(hash(name))}.py"
        p.write_text(code)
        got = any("RET-none" in x for x in check_file(p))
        assert got == expect, f"{name}: expected {expect}, findings={check_file(p)}"


def test_ast_lint_mutable_and_call_defaults(tmp_path):
    """B006 (mutable argument default — shared across calls) and B008 (any
    other call in a default — evaluated once at def time). E731 is
    deliberately absent: pyproject.toml ignores it (jit-local lambdas)."""
    from multimodal_mtrssm_tpu.utils.lint import check_file

    cases = {
        # name: (code, expected code or None)
        "list literal default": ("def f(x=[]):\n    return x\n", "B006"),
        "dict literal default": ("def f(x={}):\n    return x\n", "B006"),
        "set literal default": ("def f(x={1}):\n    return x\n", "B006"),
        "comprehension default": ("def f(x=[i for i in range(3)]):\n    return x\n", "B006"),
        "list() call default": ("def f(x=list()):\n    return x\n", "B006"),
        "defaultdict default": (
            "import collections\n"
            "def f(x=collections.defaultdict(int)):\n    return x\n", "B006"),
        "kwonly mutable default": ("def f(*, x=[]):\n    return x\n", "B006"),
        "lambda mutable default": ("g = lambda x=[]: x\n", "B006"),
        "time.time() default": (
            "import time\n"
            "def f(t=time.time()):\n    return t\n", "B008"),
        "nested call default": (
            "import time\n"
            "def f(t=(1, time.time())):\n    return t\n", "B008"),
        "none default ok": ("def f(x=None):\n    return x\n", None),
        "tuple literal ok": ("def f(x=(1, 2)):\n    return x\n", None),
        "frozen constant ok": ("def f(x=3, y='s'):\n    return x, y\n", None),
        "lambda assignment not flagged (E731 ignored)": (
            "f = lambda x: x + 1\n", None),
    }
    for name, (code, expect) in cases.items():
        p = tmp_path / f"bdef_{abs(hash(name))}.py"
        p.write_text(code)
        findings = check_file(p)
        if expect is None:
            assert not any(("B006" in x or "B008" in x) for x in findings), (name, findings)
        else:
            assert any(expect in x for x in findings), (name, expect, findings)

    # A mutable-constructor call is B006's finding alone, not also B008.
    p = tmp_path / "bdef_no_double.py"
    p.write_text("def f(x=list()):\n    return x\n")
    fs = check_file(p)
    assert any("B006" in x for x in fs) and not any("B008" in x for x in fs), fs


def test_ast_lint_string_annotation_forward_refs(tmp_path):
    """F821 inside string forward-reference annotations: the string is
    parsed and resolved in the same scope stack. Strings in Literal[...]
    and Annotated[...] slices are values, not type names (pyflakes rule);
    forward refs to names bound later in the module resolve."""
    from multimodal_mtrssm_tpu.utils.lint import check_file

    cases = {
        # name: (code, expect an F821 finding?)
        "string arg annotation undef": (
            'def _f(x: "Undefined") -> None:\n    return None\n', True),
        "string return annotation undef": (
            'def _f(x: int) -> "Nope":\n    return x\n', True),
        "annassign string undef": ('x: "Missing" = 1\n', True),
        "forward ref to later class": (
            'def _f(s: "State") -> "State":\n    return s\n'
            'class State:\n    """D."""\n', False),
        "string inside subscript": (
            "from typing import Optional\n"
            'def _f(x: Optional["Foo"]) -> None:\n    return None\n', True),
        "Literal strings are values": (
            "from typing import Literal\n"
            'def _f(x: Literal["a", "b"]) -> None:\n    return None\n', False),
        "Annotated metadata skipped": (
            "from typing import Annotated\n"
            'def _f(x: Annotated[int, "units: m/s"]) -> None:\n    return None\n', False),
        "nested forward ref": (
            "from typing import Optional\n"
            'class Foo:\n    """D."""\n'
            "x: \"Optional['Bar']\" = None\n", True),
        "unparseable forward ref": ('x: "not a type!!" = 1\n', True),
        "dotted string ref resolves": (
            "import numpy as np\n" 'x: "np.ndarray" = None\n', False),
        "method ref to own class": (
            'class State:\n    """D."""\n\n'
            '    def clone(self) -> "State":\n        return self\n', False),
    }
    for name, (code, expect) in cases.items():
        p = tmp_path / f"fref_{abs(hash(name))}.py"
        p.write_text(code)
        fs = [f for f in check_file(p) if "F821" in f]
        assert bool(fs) == expect, (name, fs)


def test_ast_lint_call_signature_consistency(tmp_path):
    """CALL101/102/103 (mypy call-arg-lite): calls to same-module,
    undecorated, uniquely-bound module-level functions must match the
    callee's signature. Rebinding, decorators, and */** unpacking at the
    call site disqualify the check (conservative)."""
    from multimodal_mtrssm_tpu.utils.lint import check_file

    helper = 'def _g(a, b, c=1, *, kw=None):\n    return (a, b, c, kw)\n'
    cases = {
        # name: (code, expected code or None)
        "too many positional": (helper + "_g(1, 2, 3, 4)\n", "CALL101"),
        "unknown keyword": (helper + "_g(1, 2, oops=3)\n", "CALL102"),
        "posonly addressed by keyword": (
            "def _p(a, /, b):\n    return (a, b)\n_p(a=1, b=2)\n", "CALL102"),
        "missing required": (helper + "_g(1)\n", "CALL103"),
        "missing required kwonly": (
            "def _k(a, *, kw):\n    return (a, kw)\n_k(1)\n", "CALL103"),
        "exact call ok": (helper + "_g(1, 2)\n", None),
        "kw for positional ok": (helper + "_g(1, b=2, kw=3)\n", None),
        "vararg absorbs extras": (
            "def _v(a, *rest):\n    return (a, rest)\n_v(1, 2, 3)\n", None),
        "kwarg absorbs unknowns": (
            "def _w(a, **kw):\n    return (a, kw)\n_w(1, zzz=2)\n", None),
        "star unpack skipped": (helper + "xs = [1]\n_g(*xs)\n", None),
        "dstar unpack skipped": (helper + "d = {'a': 1}\n_g(**d)\n", None),
        "decorated callee skipped": (
            "import functools\n@functools.lru_cache\ndef _d(a):\n    return a\n_d(1, 2, 3)\n", None),
        "rebound name skipped": (
            helper + "_g = print\n_g(1, 2, 3, 4, 5)\n", None),
        "shadowed in nested scope skipped": (
            helper + "def _h():\n    _g = max\n    return _g(1, 2, 3, 4, 5)\n", None),
    }
    for name, (code, expect) in cases.items():
        p = tmp_path / f"call_{abs(hash(name))}.py"
        p.write_text(code)
        fs = [f for f in check_file(p) if "CALL" in f]
        if expect is None:
            assert not fs, (name, fs)
        else:
            assert any(expect in f for f in fs), (name, expect, fs)


def test_ast_lint_literal_arg_types(tmp_path):
    """CALL104 (mypy arg-type-lite): literal arguments to same-module calls
    are checked against simple builtin parameter annotations, with mypy's
    numeric tower (bool <= int <= float <= complex). Non-literal args and
    annotations the checker cannot decode soundly are skipped."""
    from multimodal_mtrssm_tpu.utils.lint import check_file

    cases = {
        # name: (code, expect CALL104 or None)
        "str for int": ("def _f(x: int):\n    return x\n_f('a')\n", "CALL104"),
        "int for str": ("def _f(x: str):\n    return x\n_f(3)\n", "CALL104"),
        "float for int": ("def _f(x: int):\n    return x\n_f(1.5)\n", "CALL104"),
        "None for int": ("def _f(x: int):\n    return x\n_f(None)\n", "CALL104"),
        "int for bool": ("def _f(x: bool):\n    return x\n_f(1)\n", "CALL104"),
        "str by keyword": ("def _f(a, x: int = 0):\n    return x\n_f(1, x='a')\n", "CALL104"),
        "str for optional int": (
            "def _f(x: int | None):\n    return x\n_f('a')\n", "CALL104"),
        "int for int ok": ("def _f(x: int):\n    return x\n_f(3)\n", None),
        "bool for int ok": ("def _f(x: int):\n    return x\n_f(True)\n", None),
        "int for float ok": ("def _f(x: float):\n    return x\n_f(3)\n", None),
        "None for optional ok": (
            "from typing import Optional\ndef _f(x: Optional[int]):\n    return x\n_f(None)\n",
            None),
        "None for pipe-none ok": (
            "def _f(x: int | None):\n    return x\n_f(None)\n", None),
        "custom annotation skipped": (
            "class C:\n    pass\ndef _f(x: C):\n    return x\n_f(3)\n", None),
        "subscript annotation skipped": (
            "def _f(x: list[int]):\n    return x\n_f(3)\n", None),
        "forward-ref string skipped": (
            "def _f(x: 'int'):\n    return x\n_f('a')\n", None),
        "single-assignment local propagated": (
            "def _f(x: int):\n    return x\ny = 'a'\n_f(y)\n", "CALL104"),
        "rebound callee skipped": (
            "def _f(x: int):\n    return x\n_f = print\n_f('a')\n", None),
    }
    for name, (code, expect) in cases.items():
        p = tmp_path / f"lit_{abs(hash(name))}.py"
        p.write_text(code)
        fs = [f for f in check_file(p) if "CALL104" in f]
        if expect is None:
            assert not fs, (name, fs)
        else:
            assert any(expect in f for f in fs), (name, expect, fs)


def test_ast_lint_const_local_arg_types(tmp_path):
    """CALL104 constant propagation: a name the enclosing scope binds
    EXACTLY ONCE to a literal counts as that literal at checked call sites
    (mypy infers the same type for a single-assignment local). Any second
    binding of the name — reassignment, ``del``, parameter, ``except as``,
    match capture, or a ``nonlocal`` rebind from a nested function — or a
    call that textually precedes the binding disqualifies it."""
    from multimodal_mtrssm_tpu.utils.lint import check_file

    helper = "def _f(x: int):\n    return x\n"
    cases = {
        # name: (code, expect CALL104 or None)
        "module-level const local": (helper + "y = 'a'\n_f(y)\n", "CALL104"),
        "function-scope const local": (
            helper + "def _g():\n    y = 'a'\n    return _f(y)\n", "CALL104"),
        "annotated assignment counts": (
            helper + "def _g():\n    y: str = 'a'\n    return _f(y)\n", "CALL104"),
        "keyword argument resolved": (
            "def _f(a, x: int = 0):\n    return x\ny = 'a'\n_f(1, x=y)\n", "CALL104"),
        "method receiver resolved": (
            "class C:\n    def m(self, x: int):\n        return x\n"
            "    def go(self):\n        y = 'a'\n        return self.m(y)\n", "CALL104"),
        "local instance resolved": (
            "class C:\n    def m(self, x: int):\n        return x\n"
            "def _g():\n    c = C()\n    y = 'a'\n    return c.m(y)\n", "CALL104"),
        "matching type ok": ("def _f(x: str):\n    return x\ny = 'a'\n_f(y)\n", None),
        "numeric tower ok": ("def _f(x: float):\n    return x\ny = 3\n_f(y)\n", None),
        "reassigned skipped": (helper + "y = 'a'\ny = 1\n_f(y)\n", None),
        "augassigned skipped": (helper + "y = 'a'\ny += 'b'\n_f(y)\n", None),
        "use before binding skipped": (
            helper + "def _g(flag):\n    while flag:\n        _f(y)\n        y = 'a'\n", None),
        "parameter shadow skipped": (
            helper + "def _g(y):\n    return _f(y)\n", None),
        "del skipped": (
            helper + "def _g():\n    y = 'a'\n    del y\n    y = 'b'\n    return _f(y)\n",
            None),
        "except-as rebind skipped": (
            helper + "def _g():\n    y = 'a'\n    try:\n        pass\n"
            "    except Exception as y:\n        pass\n    return _f(y)\n", None),
        "nonlocal rebind from nested fn skipped": (
            helper + "def _g():\n    y = 'a'\n    def h():\n        nonlocal y\n"
            "        y = 1\n    h()\n    return _f(y)\n", None),
        "global declaration skipped": (
            helper + "def _g():\n    global y\n    y = 'a'\n    return _f(y)\n", None),
        "loop-target rebind skipped": (
            helper + "def _g(xs):\n    y = 'a'\n    for y in xs:\n        pass\n"
            "    return _f(y)\n", None),
        "walrus-only binding skipped": (
            helper + "def _g():\n    if (y := 'a'):\n        return _f(y)\n", None),
        "nested-scope env not inherited": (
            helper + "def _g():\n    y = 'a'\n    def h():\n        return _f(y)\n"
            "    return h()\n", None),
        "non-literal value skipped": (
            helper + "def _g(z):\n    y = z\n    return _f(y)\n", None),
    }
    for name, (code, expect) in cases.items():
        p = tmp_path / f"const_{abs(hash(name))}.py"
        p.write_text(code)
        fs = [f for f in check_file(p) if "CALL104" in f]
        if expect is None:
            assert not fs, (name, fs)
        else:
            assert any(expect in f for f in fs), (name, expect, fs)


def test_ast_lint_missing_return(tmp_path):
    """RET201/RET202 (mypy return-lite): a function annotated with a
    value-requiring return type must not fall off the end of its body
    (RET201) or contain a bare return (RET202). Optional/None/Any/NoReturn
    annotations, generators, stubs and @overload/@abstractmethod are
    exempt."""
    from multimodal_mtrssm_tpu.utils.lint import check_file

    cases = {
        "falls off end": ("def _f(x) -> int:\n    y = x + 1\n", "RET201"),
        "if without else": (
            "def _f(x) -> int:\n    if x:\n        return 1\n", "RET201"),
        "loop may not run": (
            "def _f(xs) -> int:\n    for x in xs:\n        return x\n", "RET201"),
        "while-true with break": (
            "def _f(x) -> int:\n    while True:\n        if x:\n            break\n", "RET201"),
        "bare return": (
            "def _f(x) -> int:\n    if x:\n        return\n    return 1\n", "RET202"),
        "custom class falls off": (
            "class C:\n    pass\ndef _f(x) -> C:\n    x += 1\n", "RET201"),
        "subscript ann falls off": (
            "def _f(x) -> list[int]:\n    x += 1\n", "RET201"),
        "if/else both return ok": (
            "def _f(x) -> int:\n    if x:\n        return 1\n    else:\n        return 2\n", None),
        "tail return ok": (
            "def _f(x) -> int:\n    if x:\n        return 1\n    return 2\n", None),
        "raise tail ok": (
            "def _f(x) -> int:\n    if x:\n        return 1\n    raise ValueError(x)\n", None),
        "while-true no break ok": (
            "def _f(x) -> int:\n    while True:\n        if x:\n            return 1\n", None),
        "nested loop break stays inner ok": (
            "def _f(xs) -> int:\n    while True:\n        for x in xs:\n            break\n", None),
        "try/finally returns ok": (
            "def _f(x) -> int:\n    try:\n        x += 1\n    finally:\n        return x\n", None),
        "try body and handler return ok": (
            "def _f(x) -> int:\n    try:\n        return x\n    except ValueError:\n"
            "        return 0\n", None),
        "try handler falls through": (
            "def _f(x) -> int:\n    try:\n        return x\n    except ValueError:\n"
            "        pass\n", "RET201"),
        "optional exempt": ("def _f(x) -> int | None:\n    x += 1\n", None),
        "none exempt": ("def _f(x) -> None:\n    x += 1\n", None),
        "noreturn exempt": (
            "from typing import NoReturn\ndef _f(x) -> NoReturn:\n    raise ValueError(x)\n",
            None),
        "any exempt": ("from typing import Any\ndef _f(x) -> Any:\n    x += 1\n", None),
        "forward-ref string exempt": ("def _f(x) -> 'int':\n    x += 1\n", None),
        "generator exempt": (
            "from typing import Iterator\ndef _f(x) -> Iterator[int]:\n    yield x\n", None),
        "stub body exempt": ("def _f(x) -> int:\n    ...\n", None),
        "overload exempt": (
            "from typing import overload\n@overload\ndef _f(x: int) -> int:\n    ...\n", None),
        "abstractmethod exempt": (
            "import abc\nclass C(abc.ABC):\n    @abc.abstractmethod\n"
            "    def f(self) -> int:\n        pass\n", None),
        "unannotated exempt": ("def _f(x):\n    x += 1\n", None),
        "match with wildcard ok": (
            "def _f(x) -> int:\n    match x:\n        case 1:\n            return 1\n"
            "        case _:\n            return 0\n", None),
        "match without wildcard": (
            "def _f(x) -> int:\n    match x:\n        case 1:\n            return 1\n", "RET201"),
    }
    for name, (code, expect) in cases.items():
        p = tmp_path / f"ret_{abs(hash(name))}.py"
        p.write_text(code)
        fs = [f for f in check_file(p) if "RET20" in f]
        if expect is None:
            assert not fs, (name, fs)
        else:
            assert any(expect in f for f in fs), (name, expect, fs)


def test_ast_lint_self_attribute_reads(tmp_path):
    """ATTR101 (mypy attr-defined-lite): a ``self.x`` read inside a method
    must resolve to an attribute the class actually has — assigned in any
    method, defined in the class body, inherited from a same-module base,
    or stored on ANY object anywhere in the linted tree (so cross-module
    injection and subclass-provided attributes never false-positive).
    Classes with unknown decorators / external bases / ``__getattr__`` and
    methods that rebind or dynamically inspect the receiver are skipped."""
    from multimodal_mtrssm_tpu.utils.lint import check_file, check_paths

    cases = {
        # name: (code, expect an ATTR101 finding)
        "typo'd read": (
            "class C:\n    def __init__(self):\n        self.hidden = 1\n"
            "    def m(self):\n        return self.hiddne\n", True),
        "assigned in another method": (
            "class C:\n    def set(self):\n        self.x = 1\n"
            "    def get(self):\n        return self.x\n", False),
        "class-level var": (
            "class C:\n    x = 1\n    def m(self):\n        return self.x\n", False),
        "annotated field": (
            "class C:\n    x: int\n    def m(self):\n        return self.x\n", False),
        "method call": (
            "class C:\n    def a(self):\n        return 1\n"
            "    def m(self):\n        return self.a()\n", False),
        "dataclass field": (
            "from dataclasses import dataclass\n@dataclass\nclass C:\n    x: int\n"
            "    def m(self):\n        return self.x\n", False),
        "flax struct replace": (
            "from flax import struct\n@struct.dataclass\nclass C:\n    x: int\n"
            "    def m(self):\n        return self.replace(x=2)\n", False),
        "inherited from local base": (
            "class B:\n    def __init__(self):\n        self.x = 1\n"
            "class C(B):\n    def m(self):\n        return self.x\n", False),
        "typo'd read through local base": (
            "class B:\n    def __init__(self):\n        self.x = 1\n"
            "class C(B):\n    def m(self):\n        return self.y\n", True),
        "external base skipped": (
            "import enum\nclass C(enum.Enum):\n    A = 1\n"
            "    def m(self):\n        return self.whatever\n", False),
        "unknown decorator skipped": (
            "import attr\n@attr.s\nclass C:\n    def m(self):\n        return self.x\n", False),
        "getattr hook skipped": (
            "class C:\n    def __getattr__(self, k):\n        return 1\n"
            "    def m(self):\n        return self.anything\n", False),
        "metaclass skipped": (
            "class M(type):\n    pass\nclass C(metaclass=M):\n"
            "    def m(self):\n        return self.x\n", False),
        "hasattr guard skips method": (
            "class C:\n    def m(self):\n        if hasattr(self, 'x'):\n"
            "            return self.x\n        return 0\n", False),
        "receiver rebound skips method": (
            "class C:\n    def m(self):\n        self = object()\n"
            "        return self.x\n", False),
        "nested def shadows receiver": (
            "class C:\n    def m(self):\n        def g(self):\n"
            "            return self.x\n        return g\n", False),
        "staticmethod no receiver": (
            "class C:\n    @staticmethod\n    def m(self):\n        return self.x\n", False),
        "cls read on classmethod": (
            "class C:\n    x = 1\n    @classmethod\n    def m(cls):\n        return cls.x\n",
            False),
        "cls typo on classmethod": (
            "class C:\n    x = 1\n    @classmethod\n    def m(cls):\n        return cls.y\n",
            True),
        "setattr literal whitelists": (
            "class C:\n    def a(self):\n        setattr(self, 'bar', 1)\n"
            "    def m(self):\n        return self.bar\n", False),
        "del counts as store": (
            "class C:\n    def a(self):\n        self.x = 1\n        del self.x\n"
            "    def m(self):\n        return self.x\n", False),
        "tuple unpack store": (
            "class C:\n    def __init__(self):\n        self.a, self.b = 1, 2\n"
            "    def m(self):\n        return self.a + self.b\n", False),
        "conditionally defined method": (
            "FLAG = True\nclass C:\n    if FLAG:\n        def a(self):\n            return 1\n"
            "    def m(self):\n        return self.a()\n", False),
        "same-file other-object store whitelists": (
            "class C:\n    def m(self):\n        return self.foo\n"
            "def setup(c):\n    c.foo = 1\n", False),
        "augassign counts as store": (
            "class C:\n    def __init__(self):\n        self.n = 0\n"
            "    def m(self):\n        self.n += 1\n        return self.n\n", False),
    }
    for name, (code, expect) in cases.items():
        p = tmp_path / f"attr_{abs(hash(name))}.py"
        p.write_text(code)
        fs = [f for f in check_file(p) if "ATTR101" in f]
        assert bool(fs) == expect, (name, fs)
    # Cross-FILE whitelist: a store in another linted file clears the read.
    a = tmp_path / "xfile_a.py"
    a.write_text("class C:\n    def m(self):\n        return self.injected\n")
    b = tmp_path / "xfile_b.py"
    b.write_text("def setup(c):\n    c.injected = 1\n")
    assert any("ATTR101" in f for f in check_paths([a]))
    assert not any("ATTR101" in f for f in check_paths([a, b]))


def test_ast_lint_cross_module_call_checks(tmp_path):
    """CALL101-104 cross-module resolution: under ``check_paths``, a name
    bound by ``from <package module> import f`` (absolute or relative,
    aliased or not) is checked against the DEFINING module's signature.
    Re-exports, rebound names (either side), submodule-name collisions and
    external imports stay out of scope (conservative)."""
    from multimodal_mtrssm_tpu.utils.lint import check_paths

    defs = (
        "def f(a, b, c=1, *, kw=None):\n    return (a, b, c, kw)\n"
        "def g(x: int):\n    return x\n"
        "def rebound():\n    return 0\n"
        "rebound = print\n"
    )
    cases = {
        # name: (importing-module source, expected code or None)
        "absolute missing required": (
            "from pkg.a import f\nf(1)\n", "CALL103"),
        "relative alias too many positional": (
            "from .a import f as h\nh(1, 2, 3, 4)\n", "CALL101"),
        "relative unknown keyword": (
            "from .a import f\nf(1, 2, oops=3)\n", "CALL102"),
        "literal type mismatch": (
            "from pkg.a import g\ng('s')\n", "CALL104"),
        "exact call ok": (
            "from .a import f, g\nf(1, 2, kw=3)\ng(4)\n", None),
        "rebound at import site skipped": (
            "from .a import f\nf = print\nf(1)\n", None),
        "rebound in defining module skipped": (
            "from .a import rebound\nrebound(1, 2, 3)\n", None),
        "external import skipped": (
            "from os.path import join\njoin()\n", None),
    }
    for i, (name, (src, expect)) in enumerate(cases.items()):
        pkg = tmp_path / f"case{i}" / "pkg"
        pkg.mkdir(parents=True)
        (pkg / "__init__.py").write_text("")
        (pkg / "a.py").write_text(defs)
        (pkg / "b.py").write_text(src)
        fs = [f for f in check_paths([pkg]) if "CALL" in f and "b.py" in f]
        if expect is None:
            assert not fs, (name, fs)
        else:
            assert any(expect in f for f in fs), (name, expect, fs)

    # Submodule-name collision: pkg/__init__ defines c() AND pkg/c.py exists
    # -> 'from pkg import c' is ambiguous at import time, so it is skipped.
    pkg = tmp_path / "collide" / "pkg"
    pkg.mkdir(parents=True)
    (pkg / "__init__.py").write_text("def c():\n    return 0\n")
    (pkg / "c.py").write_text("")
    (pkg / "b.py").write_text("from pkg import c\nc(1, 2, 3)\n")
    assert not [f for f in check_paths([pkg]) if "CALL" in f]

    # Re-exports ARE followed: pkg/__init__ re-imports f; a call through
    # the package surface resolves to the defining module's signature.
    pkg = tmp_path / "reexport" / "pkg"
    pkg.mkdir(parents=True)
    (pkg / "__init__.py").write_text("from .a import f\n")
    (pkg / "a.py").write_text("def f(a, b):\n    return (a, b)\n")
    (pkg / "b.py").write_text("from pkg import f\nf(1)\n")
    assert any(
        "CALL103" in f for f in check_paths([pkg]) if "b.py" in f
    )

    # ...but an AMBIGUOUS re-export (the name is rebound in the __init__)
    # stays out of scope.
    pkg = tmp_path / "reexport_amb" / "pkg"
    pkg.mkdir(parents=True)
    (pkg / "__init__.py").write_text("from .a import f\nf = print\n")
    (pkg / "a.py").write_text("def f(a, b):\n    return (a, b)\n")
    (pkg / "b.py").write_text("from pkg import f\nf(1)\n")
    assert not [f for f in check_paths([pkg]) if "CALL" in f and "b.py" in f]


def test_ast_lint_constructor_call_checks(tmp_path):
    """CALL101-104 on class constructors: ``C(...)`` is checked against the
    class's statically-knowable constructor — an explicit undecorated
    ``__init__`` (minus ``self``), dataclass-synthesized fields (ClassVar
    excluded, ``field(default=/default_factory=)`` counts as a default),
    or the zero-arg object constructor for a bare class. Anything that can
    change the signature at runtime — inherited ``__init__``, non-dataclass
    decorators, ``__new__``, metaclass keywords, ``InitVar``,
    ``field(init=...)`` — disqualifies the class (conservative)."""
    from multimodal_mtrssm_tpu.utils.lint import check_file, check_paths

    defs = (
        "import dataclasses\n"
        "from dataclasses import dataclass, field\n"
        "import typing\n"
        "@dataclass\n"
        "class Cfg:\n"
        "    x: int\n"
        "    y: str = 'a'\n"
        "    z: list = field(default_factory=list)\n"
        "    tag: typing.ClassVar[str] = 't'\n"
        "@dataclasses.dataclass(frozen=True)\n"
        "class Frozen:\n"
        "    a: int\n"
        "class Plain:\n"
        "    def __init__(self, a, b=1):\n"
        "        self.a = a\n"
        "        self.b = b\n"
        "class Bare:\n"
        "    pass\n"
        "class Child(Plain):\n"
        "    pass\n"
        "@dataclass\n"
        "class WithInitVar:\n"
        "    a: dataclasses.InitVar[int]\n"
        "@dataclass\n"
        "class WithFieldInit:\n"
        "    a: int = field(init=False, default=0)\n"
        "def register(c):\n"
        "    return c\n"
        "@register\n"
        "class Decorated:\n"
        "    pass\n"
        "class Meta(type):\n"
        "    pass\n"
        "class WithMeta(metaclass=Meta):\n"
        "    pass\n"
        "class WithNew:\n"
        "    def __new__(cls, *args):\n"
        "        return super().__new__(cls)\n"
    )
    cases = {
        # name: (call lines, expected code or None)
        "dataclass missing required": ("Cfg()\n", "CALL103"),
        "dataclass unknown keyword": ("Cfg(1, oops=2)\n", "CALL102"),
        "dataclass too many positional": ("Cfg(1, 'b', [], 4)\n", "CALL101"),
        "dataclass classvar not a param": ("Cfg(1, tag='x')\n", "CALL102"),
        "dataclass literal type mismatch": ("Cfg(1, y=2)\n", "CALL104"),
        "frozen dataclass checked": ("Frozen()\n", "CALL103"),
        "explicit init too many": ("Plain(1, 2, 3)\n", "CALL101"),
        "bare class takes no args": ("Bare(5)\n", "CALL101"),
        "all ok": ("Cfg(1)\nCfg(1, 'b', [])\nFrozen(0)\nPlain(0)\nBare()\n", None),
        "inherited init skipped": ("Child(1, 2, 3, 4)\n", None),
        "initvar skipped": ("WithInitVar()\n", None),
        "field init= skipped": ("WithFieldInit(1, 2, 3)\n", None),
        "decorated class skipped": ("Decorated(1, 2)\n", None),
        "metaclass keyword skipped": ("WithMeta(1, 2)\n", None),
        "__new__ skipped": ("WithNew(1, 2)\n", None),
    }
    for i, (name, (calls, expect)) in enumerate(cases.items()):
        p = tmp_path / f"ctor{i}.py"
        p.write_text(defs + calls)
        fs = [f for f in check_file(p) if "CALL" in f and f.split(":")[1].isdigit()
              and int(f.split(":")[1]) > defs.count("\n")]
        if expect is None:
            assert not fs, (name, fs)
        else:
            assert any(expect in f for f in fs), (name, expect, fs)

    # Cross-module: a dataclass config imported from a sibling module is
    # checked at the importing call site under check_paths.
    pkg = tmp_path / "xmod" / "pkg"
    pkg.mkdir(parents=True)
    (pkg / "__init__.py").write_text("")
    (pkg / "a.py").write_text(
        "from dataclasses import dataclass\n"
        "@dataclass\n"
        "class Cfg:\n"
        "    x: int\n"
        "    y: str = 'a'\n"
    )
    (pkg / "b.py").write_text("from pkg.a import Cfg\nc = Cfg(oops=1)\n")
    fs = [f for f in check_paths([pkg]) if "CALL" in f and "b.py" in f]
    assert any("CALL102" in f for f in fs), fs
    assert any("CALL103" in f for f in fs), fs


def test_ast_lint_method_call_checks(tmp_path):
    """CALL101-104 on method calls: ``self.m(...)`` / ``cls.m(...)`` inside
    an eligible class is checked against the resolved ``def m`` (own body
    or same-module base), receiver stripped per descriptor kind. Overridden
    names (defined in >1 class body anywhere), attribute-rebound names,
    property/decorated targets, ``cls.<instance method>`` calls and
    receiver-rebinding callers all skip (conservative)."""
    from multimodal_mtrssm_tpu.utils.lint import check_file, check_paths

    defs = (
        "class Base:\n"
        "    def helper(self, a, b=1):\n"
        "        return a + b\n"
        "class C(Base):\n"
        "    @classmethod\n"
        "    def create(cls, n):\n"
        "        return n\n"
        "    @staticmethod\n"
        "    def util(x, y):\n"
        "        return x + y\n"
        "    def typed(self, name: str):\n"
        "        return name\n"
    )
    cases = {
        # name: (method body line(s) appended inside C, expected code or None)
        "missing required": ("self.helper()", "CALL103"),
        "too many positional": ("self.helper(1, 2, 3)", "CALL101"),
        "unknown keyword": ("self.helper(1, oops=2)", "CALL102"),
        "inherited resolution ok": ("self.helper(1, b=2)", None),
        "classmethod via self": ("self.create()", "CALL103"),
        "staticmethod missing arg": ("self.util(1)", "CALL103"),
        "literal type mismatch": ("self.typed(3)", "CALL104"),
        "exact ok": ("self.util(1, 2)", None),
    }
    for i, (name, (call, expect)) in enumerate(cases.items()):
        p = tmp_path / f"meth{i}.py"
        p.write_text(defs + f"    def run(self):\n        return {call}\n")
        fs = [f for f in check_file(p) if "CALL" in f]
        if expect is None:
            assert not fs, (name, fs)
        else:
            assert any(expect in f for f in fs), (name, expect, fs)

    # Conservative skips, all in one file: overrides, attribute rebinds,
    # property targets, unbound cls.<instance method>, receiver rebinding.
    p = tmp_path / "skips.py"
    p.write_text(
        "class A:\n"
        "    def m(self, a):\n"
        "        return a\n"
        "class B(A):\n"
        "    def m(self, a, b):\n"
        "        return a + b\n"
        "    def r(self):\n"
        "        return self.m(1)\n"          # override: name defined twice
        "class Dyn:\n"
        "    def f(self, a):\n"
        "        return a\n"
        "    def r(self):\n"
        "        self.f = print\n"            # attribute store rebinds f
        "        return self.f(1, 2, 3)\n"
        "class Prop:\n"
        "    @property\n"
        "    def p(self):\n"
        "        return 1\n"
        "    def r(self):\n"
        "        return self.p(1, 2)\n"       # decorated target
        "class U:\n"
        "    def im(self, a):\n"
        "        return a\n"
        "    @classmethod\n"
        "    def c(cls):\n"
        "        return cls.im(1)\n"          # unbound instance method
    )
    assert not [f for f in check_file(p) if "CALL" in f]

    # Cross-FILE override guard: a subclass in ANOTHER linted file
    # overrides m with a new signature; under check_paths the name is no
    # longer uniquely defined, so the same-file call is skipped.
    a = tmp_path / "xover" / "a.py"
    a.parent.mkdir()
    a.write_text(
        "class A:\n"
        "    def m(self, x):\n"
        "        return x\n"
        "    def r(self):\n"
        "        return self.m(1, 2)\n"       # CALL101 alone, skipped with b
    )
    b = tmp_path / "xover" / "b.py"
    b.write_text(
        "from a import A\n"
        "class Sub(A):\n"
        "    def m(self, x, y):\n"
        "        return x + y\n"
    )
    assert any("CALL101" in f for f in check_paths([a]))
    assert not [f for f in check_paths([a, b]) if "CALL" in f]


def test_ast_lint_instance_method_call_checks(tmp_path):
    """CALL101-104 on tracked local instances: a scope binding ``x = C(...)``
    exactly once gets every later ``x.m(...)`` checked against C's method
    table — same- and cross-module, including through package ``__init__``
    re-export chains. Reassignment, loop targets, parameter shadowing,
    ``del``, calls before the binding, and rebound re-exports all skip."""
    from multimodal_mtrssm_tpu.utils.lint import check_file, check_paths

    p = tmp_path / "inst.py"
    p.write_text(
        "class Trainer:\n"
        "    def fit(self, data, epochs=1):\n"
        "        return (data, epochs)\n"
        "    @staticmethod\n"
        "    def util(x, y):\n"
        "        return x + y\n"
        "    def typed(self, name: str):\n"
        "        return name\n"
        "t = Trainer()\n"
        "t.fit()\n"                        # CALL103 (module scope)
        "def run():\n"
        "    tr = Trainer()\n"
        "    tr.fit(1, 2, 3)\n"            # CALL101
        "    tr.fit(1, oops=2)\n"          # CALL102
        "    tr.typed(3)\n"                # CALL104
        "    return tr.util(1, 2)\n"       # ok
    )
    fs = [f for f in check_file(p) if "CALL" in f]
    for code in ("CALL101", "CALL102", "CALL103", "CALL104"):
        assert any(code in f for f in fs), (code, fs)
    assert len(fs) == 4, fs

    # Conservative skips in one file.
    n = tmp_path / "skips.py"
    n.write_text(
        "class C:\n"
        "    def m(self, a):\n"
        "        return a\n"
        "def reassigned():\n"
        "    x = C()\n"
        "    x = None\n"                   # two stores
        "    return x.m()\n"
        "def loop_target():\n"
        "    for x in [C()]:\n"            # loop binding, not a C() assign
        "        x.m()\n"
        "def param_shadow(z):\n"
        "    z = C()\n"                    # parameter of the same name
        "    return z.m()\n"
        "def deleted():\n"
        "    w = C()\n"
        "    del w\n"                      # del counts as a second store
        "    return 0\n"
    )
    assert not [f for f in check_file(n) if "CALL" in f]

    # Subclass overrides do NOT guard instance tracking: the constructor
    # pins the exact class, so the base's own signature applies even when
    # a subclass elsewhere redefines the method.
    o = tmp_path / "override.py"
    o.write_text(
        "class A:\n"
        "    def m(self, x):\n"
        "        return x\n"
        "class Sub(A):\n"
        "    def m(self, x, y):\n"
        "        return x + y\n"
        "def use():\n"
        "    a = A()\n"
        "    return a.m(1, 2)\n"           # CALL101 against A.m, not Sub.m
    )
    assert any("CALL101" in f and "A.m" in f for f in check_file(o))

    # Cross-module through a two-hop re-export chain.
    pkg = tmp_path / "chain" / "pkg"
    (pkg / "sub").mkdir(parents=True)
    (pkg / "__init__.py").write_text("from .sub import Model, make\n")
    (pkg / "sub" / "__init__.py").write_text("from .core import Model, make\n")
    (pkg / "sub" / "core.py").write_text(
        "class Model:\n"
        "    def init(self, rng, batch=None):\n"
        "        return rng\n"
        "def make(n: int):\n"
        "    return Model()\n"
    )
    (pkg / "use.py").write_text(
        "from pkg import Model, make\n"
        "m = Model()\n"
        "m.init()\n"                       # CALL103 via two hops
        "make('s')\n"                      # CALL104 via two hops
    )
    fs = [f for f in check_paths([pkg]) if "CALL" in f]
    assert any("CALL103" in f and "Model.init" in f for f in fs), fs
    assert any("CALL104" in f and "make" in f for f in fs), fs

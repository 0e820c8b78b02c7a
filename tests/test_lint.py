"""Source lints for silent-at-authoring-time PySpark traps.

The r10 incident (VERDICT r10 item 1): ``F.filter(toks, lambda x, qt=qt:
x == F.lit(qt))`` crashed every caller — PySpark dispatches higher-order-
function lambdas on ARITY, so a two-parameter lambda is bound as the
``(element, index)`` form and the default argument is silently overwritten
by the BIGINT index column; every string token then ANSI-casts to BIGINT
and the query throws CAST_INVALID_INPUT at the first action. The crash
killed 3 tests, the selfcheck sweep, and the entire r10 bench.

The precise lint: a lambda passed to a PySpark HOF must NEVER carry
default arguments. Default args are Python's loop-variable capture idiom,
and that is exactly the intent that arity dispatch breaks; legitimate
two-parameter forms (``transform(col, (x, i) -> ...)``, ``aggregate``'s
merge, ``zip_with``, ``map_*``) never need defaults. Capture via a
closure factory returning a unary lambda instead (example in
test_lint_accepts_the_closure_factory_fix below; SQL-string HOF lambdas
via selectExpr, the r15 bm25 shape, parse JVM-side and are immune by
construction).
"""

from __future__ import annotations

import ast
import glob
import os

#: pyspark.sql.functions HOFs that accept a Python callable and dispatch
#: it on arity (functions.py _create_lambda path).
_HOF_NAMES = {
    "filter",
    "transform",
    "exists",
    "forall",
    "aggregate",
    "reduce",
    "zip_with",
    "transform_keys",
    "transform_values",
    "map_filter",
    "map_zip_with",
    "array_sort",
}

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _offenders_in_source(src: str, filename: str = "<mem>") -> list[str]:
    """Return 'file:line' for every lambda-with-defaults passed to an HOF."""
    hits: list[str] = []
    tree = ast.parse(src, filename=filename)
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        fn = node.func
        # Match F.<hof>(...) and bare <hof>(...) from a functions import.
        name = None
        if isinstance(fn, ast.Attribute):
            name = fn.attr
        elif isinstance(fn, ast.Name):
            name = fn.id
        if name not in _HOF_NAMES:
            continue
        for arg in list(node.args) + [kw.value for kw in node.keywords]:
            if isinstance(arg, ast.Lambda) and (
                arg.args.defaults or arg.args.kw_defaults
            ):
                hits.append(f"{filename}:{arg.lineno}")
    return hits


def test_lint_is_red_on_the_planted_r10_offender():
    planted = (
        "from pyspark.sql import functions as F\n"
        "def q(toks, terms):\n"
        "    return [F.size(F.filter(toks, lambda x, qt=qt: x == F.lit(qt)))\n"
        "            for qt in terms]\n"
    )
    assert _offenders_in_source(planted) == ["<mem>:3"]


def test_lint_accepts_the_closure_factory_fix():
    fixed = (
        "from pyspark.sql import functions as F\n"
        "def _eq(term):\n"
        "    return lambda x: x == F.lit(term)\n"
        "def q(toks, terms):\n"
        "    return [F.size(F.filter(toks, _eq(qt))) for qt in terms]\n"
        # legitimate arity-2 forms carry no defaults and must pass:
        "def idx(toks):\n"
        "    return F.transform(toks, lambda x, i: F.concat(x, i.cast('string')))\n"
    )
    assert _offenders_in_source(fixed) == []


def test_no_hof_lambda_with_default_args_in_package():
    """No lambda with default arguments may reach a PySpark HOF anywhere
    in the package (the r10 text_bm25_search incident class)."""
    offenders: list[str] = []
    for path in glob.glob(
        os.path.join(_REPO, "desdb_spark", "**", "*.py"), recursive=True
    ):
        with open(path, encoding="utf-8") as fh:
            offenders += _offenders_in_source(fh.read(), os.path.relpath(path, _REPO))
    assert not offenders, (
        "lambda-with-defaults passed to a PySpark higher-order function — "
        "arity dispatch binds 2-parameter lambdas as (element, index) and "
        "overwrites the default (the r10 bm25 crash). Use a closure "
        f"factory returning a unary lambda instead: {offenders}"
    )

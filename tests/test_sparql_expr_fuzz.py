"""Differential fuzz over the SPARQL expression layer (sparql.py).

Random typed expression ASTs — numeric arithmetic, comparisons,
string builtins, Kleene logic over EBV-coerced operands, IF, BOUND —
compiled through the distributed engine AND evaluated by a direct
Python implementation of SPARQL 1.1 §17.2/§17.4 + the XPath F&O value
rules.  Each expression runs twice: as a FILTER (error/false both
eliminate the row) and as a BIND projection (error surfaces as
unbound/NULL).

The value table is FIXED and adversarial — 0 (numeric EBV false), NaN
(unordered, ne-everything), NULL cells (unbound via OPTIONAL), the
empty string, the lexical forms "false" and "0" (plain-literal EBV is
TRUE), fractional doubles — so hypothesis spends its budget on
expression shapes, not data.  All doubles are dyadic rationals, so
engine (IEEE double) and oracle (Python float) arithmetic agree
bit-exactly and lexical forms round-trip identically.

The reference inherits this surface from Jena ARQ; the oracle here is
the W3C/XPath spec itself, like tests/test_sparql_fuzz.py.
"""

import math
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jena_geo_spark import sparql as S

_EXAMPLES = int(os.environ.get("SPARQL_FUZZ_EXAMPLES", "0"))

NAN = float("nan")
ROWS = [
    # (id, i, d, s)
    (1, 0, 0.0, ""),
    (2, 1, 1.0, "a"),
    (3, 7, -2.5, "ab b"),
    (4, None, None, None),
    (5, 9, NAN, "false"),
    (6, 2, 0.25, "0"),
    (7, 5, 4.0, "ab"),
    (8, None, 3.5, " a."),
]

ERR = object()  # SPARQL evaluation error == SQL NULL


@pytest.fixture(scope="module")
def expr_pt(spark):
    df = spark.createDataFrame(
        [r + ("y",) for r in ROWS], "id long, i long, d double, s string, k string"
    )
    return S.PropertyTable(
        df, id_col="id",
        props={"http://ex.org/i": S.PropSpec("i"),
               "http://ex.org/d": S.PropSpec("d"),
               "http://ex.org/s": S.PropSpec("s"),
               "http://ex.org/k": S.PropSpec("k")},
    )


# ----------------------------------------------------------- generators --
# AST nodes are ('lit', v) | ('var', name) | (op, *children)

_STR_LITS = ["", "a", "b", "ab", "a b", "false", "0", "."]
_NUM_LITS = [0, 1, 2, 3, 0.25, 0.5, 2.5, 4.0]


@st.composite
def num_expr(draw, depth=3):
    if depth == 0:
        kind = draw(st.sampled_from(["lit", "var"]))
    else:
        kind = draw(
            st.sampled_from(
                ["lit", "var", "arith", "neg", "abs", "ceil", "floor",
                 "round", "strlen"]
            )
        )
    if kind == "lit":
        return ("lit", draw(st.sampled_from(_NUM_LITS)))
    if kind == "var":
        return ("var", draw(st.sampled_from(["i", "d"])))
    if kind == "arith":
        return (
            draw(st.sampled_from(["+", "-", "*", "/"])),
            draw(num_expr(depth=depth - 1)),
            draw(num_expr(depth=depth - 1)),
        )
    if kind == "neg":
        return ("neg", draw(num_expr(depth=depth - 1)))
    if kind == "strlen":
        return ("strlen", draw(str_expr(depth=depth - 1)))
    return (kind, draw(num_expr(depth=depth - 1)))  # abs/ceil/floor/round


@st.composite
def str_expr(draw, depth=2):
    if depth == 0:
        kind = draw(st.sampled_from(["lit", "var"]))
    else:
        kind = draw(
            st.sampled_from(
                ["lit", "var", "ucase", "lcase", "concat", "substr",
                 "strbefore", "strafter", "if"]
            )
        )
    if kind == "lit":
        return ("lit", draw(st.sampled_from(_STR_LITS)))
    if kind == "var":
        return ("var", "s")
    if kind in ("ucase", "lcase"):
        return (kind, draw(str_expr(depth=depth - 1)))
    if kind in ("concat", "strbefore", "strafter"):
        return (
            kind,
            draw(str_expr(depth=depth - 1)),
            draw(str_expr(depth=depth - 1)),
        )
    if kind == "substr":
        start = draw(st.integers(-3, 7))
        ln = draw(st.one_of(st.none(), st.integers(0, 7)))
        return ("substr", draw(str_expr(depth=depth - 1)), start, ln)
    return (
        "if",
        draw(bool_expr(depth=1)),
        draw(str_expr(depth=depth - 1)),
        draw(str_expr(depth=depth - 1)),
    )


@st.composite
def bool_expr(draw, depth=3):
    if depth == 0:
        kind = draw(st.sampled_from(["bound", "ebv"]))
    else:
        kind = draw(
            st.sampled_from(
                ["ncmp", "scmp", "strfn", "and", "or", "not", "bound", "ebv"]
            )
        )
    if kind == "bound":
        return ("bound", draw(st.sampled_from(["i", "d", "s"])))
    if kind == "ebv":
        return ("var", draw(st.sampled_from(["i", "d", "s"])))
    if kind == "ncmp":
        return (
            "cmp",
            draw(st.sampled_from(["=", "!=", "<", ">", "<=", ">="])),
            draw(num_expr(depth=min(depth - 1, 2))),
            draw(num_expr(depth=min(depth - 1, 2))),
        )
    if kind == "scmp":
        return (
            "scmp",
            draw(st.sampled_from(["=", "!=", "<", ">", "<=", ">="])),
            draw(str_expr(depth=1)),
            draw(str_expr(depth=1)),
        )
    if kind == "strfn":
        return (
            draw(st.sampled_from(["contains", "strstarts", "strends"])),
            draw(str_expr(depth=1)),
            draw(str_expr(depth=1)),
        )
    if kind == "not":
        return ("not", draw(bool_expr(depth=depth - 1)))
    return (
        "&&" if kind == "and" else "||",
        draw(bool_expr(depth=depth - 1)),
        draw(bool_expr(depth=depth - 1)),
    )


# -------------------------------------------------------------- render --


def render(e) -> str:
    k = e[0]
    if k == "lit":
        v = e[1]
        return f'"{v}"' if isinstance(v, str) else repr(v)
    if k == "var":
        return f"?{e[1]}"
    if k in ("+", "-", "*", "/"):
        return f"({render(e[1])} {k} {render(e[2])})"
    if k == "neg":
        return f"(-{render(e[1])})"
    if k in ("abs", "ceil", "floor", "round", "strlen", "ucase", "lcase"):
        return f"{k.upper()}({render(e[1])})"
    if k in ("concat", "strbefore", "strafter", "contains", "strstarts", "strends"):
        return f"{k.upper()}({render(e[1])}, {render(e[2])})"
    if k == "substr":
        _, s, start, ln = e
        if ln is None:
            return f"SUBSTR({render(s)}, {start})"
        return f"SUBSTR({render(s)}, {start}, {ln})"
    if k == "if":
        return f"IF({render(e[1])}, {render(e[2])}, {render(e[3])})"
    if k in ("cmp", "scmp"):
        return f"({render(e[2])} {e[1]} {render(e[3])})"
    if k in ("&&", "||"):
        return f"({render(e[1])} {k} {render(e[2])})"
    if k == "not":
        return f"(!{render(e[1])})"
    if k == "bound":
        return f"BOUND(?{e[1]})"
    raise ValueError(k)


# -------------------------------------------------------------- oracle --


def _num(v):
    return ERR if v is ERR or v is None else float(v)


def ev_num(e, row):
    k = e[0]
    if k == "lit":
        return float(e[1])
    if k == "var":
        return _num(row[e[1]])
    if k in ("+", "-", "*", "/"):
        a, b = ev_num(e[1], row), ev_num(e[2], row)
        if a is ERR or b is ERR:
            return ERR
        if k == "+":
            return a + b
        if k == "-":
            return a - b
        if k == "*":
            return a * b
        return ERR if b == 0 else a / b  # try_divide: zero divisor -> error
    if k == "neg":
        a = ev_num(e[1], row)
        return ERR if a is ERR else -a
    if k == "strlen":
        s = ev_str(e[1], row)
        return ERR if s is ERR else float(len(s))
    a = ev_num(e[1], row)
    if a is ERR:
        return ERR
    if math.isnan(a):
        return a
    if k == "abs":
        return abs(a)
    if k == "ceil":
        return float(math.ceil(a))
    if k == "floor":
        return float(math.floor(a))
    return float(math.floor(a + 0.5))  # fn:round: ties toward +inf


def ev_str(e, row):
    k = e[0]
    if k == "lit":
        return e[1]
    if k == "var":
        v = row["s"]
        return ERR if v is None else v
    if k in ("ucase", "lcase"):
        s = ev_str(e[1], row)
        return ERR if s is ERR else (s.upper() if k == "ucase" else s.lower())
    if k == "concat":
        a, b = ev_str(e[1], row), ev_str(e[2], row)
        return ERR if a is ERR or b is ERR else a + b
    if k in ("strbefore", "strafter"):
        a, b = ev_str(e[1], row), ev_str(e[2], row)
        if a is ERR or b is ERR:
            return ERR
        if b == "":
            return "" if k == "strbefore" else a
        pos = a.find(b)
        if pos < 0:
            return ""
        return a[:pos] if k == "strbefore" else a[pos + len(b):]
    if k == "substr":
        _, se, start, ln = e
        s = ev_str(se, row)
        if s is ERR:
            return ERR
        a = math.floor(start + 0.5)
        b = math.inf if ln is None else a + math.floor(ln + 0.5)
        return "".join(ch for p, ch in enumerate(s, 1) if a <= p < b)
    # if
    c = ev_bool(e[1], row)
    if c is ERR:
        return ERR
    return ev_str(e[2], row) if c else ev_str(e[3], row)


def _ebv(v):
    if v is None or v is ERR:
        return ERR
    if isinstance(v, str):
        return len(v) > 0
    f = float(v)
    return not (f == 0 or math.isnan(f))


def ev_bool(e, row):
    k = e[0]
    if k == "bound":
        return row[e[1]] is not None
    if k == "var":
        return _ebv(row[e[1]])
    if k == "cmp":
        a, b = ev_num(e[2], row), ev_num(e[3], row)
        if a is ERR or b is ERR:
            return ERR
        if math.isnan(a) or math.isnan(b):
            return e[1] == "!="  # XPath: NaN unordered, ne everything
        return {
            "=": a == b, "!=": a != b, "<": a < b,
            ">": a > b, "<=": a <= b, ">=": a >= b,
        }[e[1]]
    if k == "scmp":
        a, b = ev_str(e[2], row), ev_str(e[3], row)
        if a is ERR or b is ERR:
            return ERR
        return {
            "=": a == b, "!=": a != b, "<": a < b,
            ">": a > b, "<=": a <= b, ">=": a >= b,
        }[e[1]]
    if k in ("contains", "strstarts", "strends"):
        a, b = ev_str(e[1], row), ev_str(e[2], row)
        if a is ERR or b is ERR:
            return ERR
        if k == "contains":
            return b in a
        return a.startswith(b) if k == "strstarts" else a.endswith(b)
    if k == "not":
        v = ev_bool(e[1], row)
        return ERR if v is ERR else not v
    a, b = ev_bool(e[1], row), ev_bool(e[2], row)
    if k == "&&":  # Kleene: error && false == false
        if a is False or b is False:
            return False
        return ERR if a is ERR or b is ERR else True
    if a is True or b is True:
        return True
    return ERR if a is ERR or b is ERR else False


# ---------------------------------------------------------------- fuzz --


def _run(spark, expr_pt, body):
    q = (
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
        "SELECT ?x ?r WHERE { ?x <http://ex.org/k> ?k . "
        "OPTIONAL { ?x <http://ex.org/i> ?i } "
        "OPTIONAL { ?x <http://ex.org/d> ?d } "
        "OPTIONAL { ?x <http://ex.org/s> ?s } " + body + " }"
    )
    out = S.execute_query(spark, q, expr_pt)
    return {
        int(r["x"].rsplit(":", 1)[-1]): r["r"] for r in out.collect()
    }


def _rowmaps():
    return [
        ({"i": i, "d": d, "s": s}, rid) for rid, i, d, s in ROWS
    ]


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=_EXAMPLES or 25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(bool_expr())
def test_filter_matches_spec(spark, expr_pt, e):
    body = f"BIND(1 AS ?r) FILTER({render(e)})"
    got = set(_run(spark, expr_pt, body))
    exp = {rid for row, rid in _rowmaps() if ev_bool(e, row) is True}
    assert got == exp, render(e)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=_EXAMPLES or 25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(num_expr())
def test_bind_numeric_matches_spec(spark, expr_pt, e):
    got = _run(spark, expr_pt, f"BIND({render(e)} AS ?r)")
    for row, rid in _rowmaps():
        want = ev_num(e, row)
        g = got[rid]
        if want is ERR:
            assert g is None, (render(e), rid, g)
        elif math.isnan(want):
            assert g is not None and math.isnan(float(g)), (render(e), rid, g)
        else:
            assert g is not None and float(g) == want, (render(e), rid, g, want)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=_EXAMPLES or 25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(str_expr())
def test_bind_string_matches_spec(spark, expr_pt, e):
    got = _run(spark, expr_pt, f"BIND({render(e)} AS ?r)")
    for row, rid in _rowmaps():
        want = ev_str(e, row)
        g = got[rid]
        if want is ERR:
            assert g is None, (render(e), rid, g)
        else:
            assert g == want, (render(e), rid, g, want)

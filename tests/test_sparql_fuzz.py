"""Differential fuzz over the SPARQL compiler (jena_geo_spark/sparql.py).

Random tiny RDF graphs and random queries from a constrained grammar —
BGPs with shared/repeated/predicate variables, OPTIONAL, UNION, MINUS,
FILTER (NOT) EXISTS, equality FILTERs, DISTINCT — are executed through
the distributed compiler (TriplesModel backend) AND through a naive
in-memory evaluator implementing the SPARQL 1.1 §18 algebra directly
(backtracking BGP join, compatibility-based LeftJoin, §8.3 Minus,
correlated Exists, bag Union).  The two result multisets must be
identical.

Already found one real bug on its first deep run: OPTIONAL groups
sharing no variables with the base compiled to a crossJoin, which
dropped every base row when the optional side matched nothing
(sparql.py Optional_ branch — now a left join on a literal-true
condition, with the fixed case pinned in test_sparql.py).

This exercises exactly the compiler surface the fixed tests pin by
example: implicit equality joins from repeated variables (within and
across patterns), OPTIONAL null-extension, UNION column alignment for
branch-local variables, FILTER group scoping, and projection of
never-bound variables.

The reference delegates this logic to Jena ARQ; ours is hand-written, so
the oracle here is the W3C semantics itself rather than a reference
golden (SURVEY §5 test-strategy model: semantics-level differential
checks complement the ported unit goldens).
"""

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jena_geo_spark import sparql as S

# CI default keeps suite wall time modest; deep sweeps via
# SPARQL_FUZZ_EXAMPLES=200 python -m pytest tests/test_sparql_fuzz.py
_EXAMPLES = int(os.environ.get("SPARQL_FUZZ_EXAMPLES", "0"))

IRIS = [f"urn:x:{i}" for i in range(5)]
PREDS = [f"urn:p:{i}" for i in range(3)]
LITS = [str(i) for i in range(4)]
VARS = ["a", "b", "c", "d"]


# ------------------------------------------------------------- generators --

term_s = st.sampled_from(IRIS)
term_o = st.sampled_from(IRIS + LITS)
var = st.sampled_from(VARS)


@st.composite
def triple_pattern(draw, var_pred=False):
    s = draw(st.one_of(var.map(lambda v: ("v", v)), term_s.map(lambda t: ("t", t))))
    if var_pred and draw(st.integers(0, 4)) == 0:
        p = ("v", draw(var))
    else:
        p = ("t", draw(st.sampled_from(PREDS)))
    o = draw(st.one_of(var.map(lambda v: ("v", v)), term_o.map(lambda t: ("t", t))))
    return (s, p, o)


@st.composite
def query_case(draw):
    graph = draw(
        st.lists(
            st.tuples(term_s, st.sampled_from(PREDS), term_o),
            min_size=3,
            max_size=14,
        )
    )
    shape = draw(
        st.sampled_from(
            ["bgp", "optional", "union", "minus", "exists", "notexists"]
        )
    )
    base = draw(st.lists(triple_pattern(var_pred=True), min_size=1, max_size=3))
    extra = draw(st.lists(triple_pattern(), min_size=1, max_size=2))
    base_vars = sorted({t[1] for pat in base for t in pat if t[0] == "v"})
    extra_scoped = shape in ("optional", "union")
    all_vars = sorted(
        {
            t[1]
            for pat in (base + extra if extra_scoped else base)
            for t in pat
            if t[0] == "v"
        }
    )
    if not all_vars:
        all_vars = ["a"]
    # FILTER only over variables bound in every solution (the required
    # part), so naive and compiled agree without error-semantics cases
    filt = None
    if shape != "union" and base_vars and draw(st.booleans()):
        fv = draw(st.sampled_from(base_vars))
        rhs = draw(st.one_of(st.sampled_from(base_vars), term_o))
        op = draw(st.sampled_from(["=", "!="]))
        filt = (fv, op, rhs)
    proj = draw(
        st.lists(st.sampled_from(all_vars), min_size=1, max_size=3, unique=True)
    )
    distinct = draw(st.booleans())
    return graph, shape, base, extra, filt, sorted(proj), distinct


# ------------------------------------------------------- naive evaluator --


def _unify(mu, pat, triple):
    mu = dict(mu)
    for (kind, val), actual in zip(pat, triple):
        if kind == "t":
            if val != actual:
                return None
        elif val in mu:
            if mu[val] != actual:
                return None
        else:
            mu[val] = actual
    return mu


def _eval_bgp(graph, patterns, mu):
    if not patterns:
        yield mu
        return
    for triple in graph:
        m2 = _unify(mu, patterns[0], triple)
        if m2 is not None:
            yield from _eval_bgp(graph, patterns[1:], m2)


def _compatible_overlapping(mu, mu2):
    shared = set(mu) & set(mu2)
    return bool(shared) and all(mu[v] == mu2[v] for v in shared)


def _naive(graph, shape, base, extra, filt, proj, distinct):
    if shape == "union":
        sols = list(_eval_bgp(graph, base, {})) + list(
            _eval_bgp(graph, extra, {})
        )
    else:
        sols = list(_eval_bgp(graph, base, {}))
        if shape == "optional":
            out = []
            for mu in sols:
                exts = list(_eval_bgp(graph, extra, mu))
                out.extend(exts if exts else [mu])
            sols = out
        elif shape == "minus":
            # §8.3: remove mu iff some mu2 is compatible AND dom-overlapping
            rights = list(_eval_bgp(graph, extra, {}))
            sols = [
                mu
                for mu in sols
                if not any(_compatible_overlapping(mu, m2) for m2 in rights)
            ]
        elif shape in ("exists", "notexists"):
            # correlated: substitute mu's bindings into the pattern
            keep = shape == "exists"
            sols = [
                mu
                for mu in sols
                if bool(next(_eval_bgp(graph, extra, mu), None)) == keep
            ]
    if filt is not None:
        fv, op, rhs = filt
        rhs_of = (lambda mu: mu[rhs]) if rhs in VARS else (lambda mu: rhs)
        sols = [
            mu
            for mu in sols
            if (mu[fv] == rhs_of(mu)) == (op == "=")
        ]
    rows = [tuple(mu.get(v) for v in proj) for mu in sols]
    return sorted(set(rows) if distinct else rows, key=repr)


# ----------------------------------------------------------------- render --


def _term(t):
    kind, val = t
    if kind == "v":
        return f"?{val}"
    return f"<{val}>" if val.startswith("urn:") else f'"{val}"'


def _render(shape, base, extra, filt, proj, distinct):
    bgp = " . ".join(" ".join(_term(x) for x in pat) for pat in base)
    ext = " . ".join(" ".join(_term(x) for x in pat) for pat in extra)
    if shape == "union":
        body = f"{{ {bgp} }} UNION {{ {ext} }}"
    elif shape == "optional":
        body = f"{bgp} . OPTIONAL {{ {ext} }}"
    elif shape == "minus":
        body = f"{bgp} . MINUS {{ {ext} }}"
    elif shape == "exists":
        body = f"{bgp} . FILTER EXISTS {{ {ext} }}"
    elif shape == "notexists":
        body = f"{bgp} . FILTER NOT EXISTS {{ {ext} }}"
    else:
        body = bgp
    if filt is not None:
        fv, op, rhs = filt
        rhs_s = f"?{rhs}" if rhs in VARS else (
            f"<{rhs}>" if rhs.startswith("urn:") else f'"{rhs}"'
        )
        body += f" FILTER(?{fv} {op} {rhs_s})"
    sel = " ".join(f"?{v}" for v in proj)
    dk = "DISTINCT " if distinct else ""
    return f"SELECT {dk}{sel} WHERE {{ {body} }}"


# ------------------------------------------------------------------ fuzz --


@st.composite
def pt_query_case(draw):
    """A wide-table instance (one value per (subject, predicate) — the
    PropertyTable representable subset) plus a query over it."""
    n_rows = draw(st.integers(2, 5))
    cells = [
        [draw(st.one_of(st.none(), st.sampled_from(LITS))) for _ in PREDS]
        for _ in range(n_rows)
    ]
    graph, shape, base, extra, filt, proj, distinct = draw(query_case())
    # retarget the random query at the wide table's term domain
    subs = [f"urn:row:{i}" for i in range(n_rows)]

    def retarget(pat):
        out = []
        for pos, (kind, val) in enumerate(pat):
            if kind == "t" and pos == 0:
                out.append(("t", subs[hash(val) % n_rows]))
            elif kind == "t" and pos == 2:
                out.append(("t", val if val in LITS else draw(st.sampled_from(LITS))))
            else:
                out.append((kind, val))
        return tuple(out)

    base = [retarget(p) for p in base]
    extra = [retarget(p) for p in extra]
    return cells, shape, base, extra, filt, proj, distinct


@st.composite
def agg_case(draw):
    n = draw(st.integers(0, 7))
    rows = []
    for i in range(n):
        grp = draw(st.sampled_from(["a", "b", "c"]))
        val = draw(st.one_of(st.none(), st.integers(0, 9)))
        rows.append((i, grp, val))
    grouped = draw(st.booleans())
    having = draw(st.booleans())
    return rows, grouped, having


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=_EXAMPLES or 20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(agg_case())
def test_aggregates_match_naive(spark, case):
    """GROUP BY / global aggregates vs direct §18.5 evaluation:
    COUNT(*), SUM, MIN, MAX, COUNT(DISTINCT), optional HAVING, and the
    empty-input edge (global COUNT of nothing is one row of 0; SUM of
    the empty group is 0 per §18.5.1.2 op:sum's xs:integer(0) seed;
    MIN/MAX of nothing are errors, i.e. unbound).  The predicate here
    carries NO datatype, so ?v binds SIMPLE literals: SUM coerces them
    numerically (lenient op:sum), while MIN/MAX order them as strings
    per the §15.1 ordering — values are single digits, so lexicographic
    and numeric order coincide and the naive model asserts the string."""
    rows, grouped, having = case
    triples = []
    for i, grp, val in rows:
        triples.append((f"urn:x:{i}", "urn:p:0", grp, None))
        if val is not None:
            triples.append((f"urn:x:{i}", "urn:p:1", str(val), None))
    tm = S.TriplesModel(
        spark.createDataFrame(triples, "s string, p string, o string, dt string")
        if triples
        else spark.createDataFrame([], "s string, p string, o string, dt string")
    )
    head = (
        "(COUNT(*) AS ?n) (SUM(?v) AS ?sm) (MIN(?v) AS ?mn) "
        "(MAX(?v) AS ?mx) (COUNT(DISTINCT ?v) AS ?nd)"
    )
    body = "?x <urn:p:0> ?g . ?x <urn:p:1> ?v ."
    hav = " HAVING(COUNT(*) > 1)" if having else ""
    if grouped:
        q = f"SELECT ?g {head} WHERE {{ {body} }} GROUP BY ?g{hav}"
    else:
        q = f"SELECT {head} WHERE {{ {body} }}{hav}"

    pairs = [(grp, val) for _, grp, val in rows if val is not None]
    groups = {}
    for grp, val in pairs:
        groups.setdefault(grp if grouped else None, []).append(val)
    if not grouped and not pairs:
        groups[None] = []
    exp = set()
    for gkey, vals in groups.items():
        n = len(vals)
        if having and not n > 1:
            continue
        row = (
            n,
            float(sum(vals)),
            str(min(vals)) if vals else None,
            str(max(vals)) if vals else None,
            len(set(vals)),
        )
        exp.add(row if not grouped else (gkey,) + row)

    cols = (["g"] if grouped else []) + ["n", "sm", "mn", "mx", "nd"]
    out = S.execute_query(spark, q, tm)
    got = {tuple(r[c] for c in cols) for r in out.collect()}
    assert got == exp, q


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=_EXAMPLES or 15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(pt_query_case())
def test_property_table_matches_triples_backend(spark, case):
    """Backend differential: the star-collapse PropertyTable path (one
    scan per subject star, explode for variable predicates) must agree
    with the generic TriplesModel join path on every query."""
    cells, shape, base, extra, filt, proj, distinct = case
    rows = [(str(i), *vals) for i, vals in enumerate(cells)]
    schema = "id string, " + ", ".join(f"c{k} string" for k in range(len(PREDS)))
    wide = spark.createDataFrame(rows, schema)
    pt = S.PropertyTable(
        wide,
        id_col="id",
        subject_prefix="urn:row:",
        props={p: S.PropSpec(f"c{k}") for k, p in enumerate(PREDS)},
    )
    triples = [
        (f"urn:row:{i}", PREDS[k], v, None)
        for i, vals in enumerate(cells)
        for k, v in enumerate(vals)
        if v is not None
    ]
    tm = S.TriplesModel(
        spark.createDataFrame(
            triples, "s string, p string, o string, dt string"
        )
        if triples
        else spark.createDataFrame([], "s string, p string, o string, dt string")
    )
    q = _render(shape, base, extra, filt, proj, distinct)

    def run(model):
        out = S.execute_query(spark, q, model)
        got = [tuple(r[v] for v in proj) for r in out.collect()]
        return sorted(set(got) if distinct else got, key=repr)

    assert run(pt) == run(tm), q


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=_EXAMPLES or 25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(query_case())
def test_sparql_compiler_matches_naive_algebra(spark, case):
    graph, shape, base, extra, filt, proj, distinct = case
    expected = _naive(graph, shape, base, extra, filt, proj, distinct)
    df = spark.createDataFrame(
        [(s, p, o, None) for s, p, o in graph],
        "s string, p string, o string, dt string",
    )
    q = _render(shape, base, extra, filt, proj, distinct)
    out = S.execute_query(spark, q, S.TriplesModel(df))
    assert sorted(out.columns) == proj
    got = [tuple(r[v] for v in proj) for r in out.collect()]
    got = sorted(set(got) if distinct else got, key=repr)
    assert got == expected, q

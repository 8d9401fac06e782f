"""Property-based tests (hypothesis) for the SQL front-end's escape-aware
tokenizers — the one hand-rolled parsing code in the repo.  The properties
pin the invariants the statement router depends on:

  * _split_assignments inverts "rendering a dict as `a = e1, b = e2`" for
    ANY expression text whose quotes/parens are well-formed;
  * _split_set_where finds exactly the top-level WHERE, never one inside a
    quoted literal or parentheses.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from thesis_iceberg_spark.tablefmt.sql import _split_assignments, _split_set_where

# --- expression-text generator ---------------------------------------------
# Build well-formed expression fragments: quoted literals use the two escape
# forms Spark accepts (doubled quote, backslash), parens nest, and bare text
# avoids the structural characters the tokenizer keys on.

_BARE = st.text(
    alphabet="abcxyz0189_ .+-*/<>=!WHERE",  # includes WHERE-able letters
    min_size=0,
    max_size=12,
).filter(lambda s: "=" not in s)


def _quoted(q: str):
    inner = st.lists(
        st.one_of(
            st.text(
                alphabet="abc XYZ,()" + ("'" if q == '"' else '"'),
                min_size=1,
                max_size=6,
            ),
            st.just(q + q),  # doubled-quote escape
            st.just("\\" + q),  # backslash escape
            st.just("\\\\"),
        ),
        max_size=4,
    ).map("".join)
    return inner.map(lambda s: q + s + q)


_ATOM = st.one_of(_BARE, _quoted("'"), _quoted('"'))


@st.composite
def exprs(draw, depth=2):
    parts = draw(st.lists(_ATOM, min_size=1, max_size=4))
    if depth > 0 and draw(st.booleans()):
        inner = draw(exprs(depth=depth - 1))
        parts.append("(" + inner + ")")
        # commas are legal INSIDE parens (function args)
        if draw(st.booleans()):
            parts.append("(" + inner + ", " + inner + ")")
    return " ".join(p for p in parts if p).strip() or "x"


_COLS = st.lists(
    st.text(alphabet="abcdefgh_", min_size=1, max_size=8),
    min_size=1,
    max_size=4,
    unique=True,
)


@settings(max_examples=300, deadline=None)
@given(cols=_COLS, vals=st.data())
def test_split_assignments_inverts_rendering(cols, vals):
    assigns = {c: vals.draw(exprs(), label=f"expr[{c}]") for c in cols}
    body = ", ".join(f"{c} = {e}" for c, e in assigns.items())
    got = _split_assignments(body)
    assert got == {c: e for c, e in assigns.items()}


@settings(max_examples=300, deadline=None)
@given(cols=_COLS, vals=st.data(), where=exprs())
def test_split_set_where_finds_only_top_level_where(cols, vals, where):
    assigns = {c: vals.draw(exprs(), label=f"expr[{c}]") for c in cols}
    body = ", ".join(f"{c} = {e}" for c, e in assigns.items())
    # without a WHERE: everything is the SET body
    set_part, cond = _split_set_where(body)
    if "WHERE" not in _strip_protected(body):
        assert cond is None and set_part == body.rstrip()
    # with a WHERE appended at top level: exact split
    full = body + " WHERE " + where
    set_part, cond = _split_set_where(full)
    if "WHERE" not in _strip_protected(body) and "WHERE" not in _strip_protected(
        where
    ):
        assert set_part == body.rstrip()
        assert cond == where.strip()


def _strip_protected(text: str) -> str:
    """Reference implementation: blank out quoted literals and paren groups
    so the assertion can independently decide whether a WHERE is top-level."""
    from thesis_iceberg_spark.tablefmt.sql import _scan_step

    out = []
    depth, quote, i = 0, None, 0
    while i < len(text):
        ch = text[i]
        j, d2, q2 = _scan_step(text, i, depth, quote)
        visible = quote is None and depth == 0 and ch not in "'\"(["
        out.append(ch if visible else " ")
        i, depth, quote = j, d2, q2
    return "".join(out)

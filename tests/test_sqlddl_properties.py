"""Property tests for the DDL text machinery (state/sqlddl.py): the
quote mask, balanced-group extraction, top-level splitting and
statement splitting must uphold their structural invariants on
arbitrary quoted/escaped content — these primitives underpin every
schema decision the replication makes off a raw-SQL feed."""
from hypothesis import given, settings, strategies as st

from database_delta_plugins_ray.state import sqlddl as sd

ident = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=1,
    max_size=8)
literal_body = st.text(
    alphabet="abc ,;()'`\"\\xyz", min_size=0, max_size=12)


def quote_literal(body: str, q: str) -> str:
    # valid-SQL literal: escape backslashes first (a trailing bare
    # backslash would escape the closing quote), then double the quote
    return q + body.replace("\\", "\\\\").replace(q, q + q) + q


quoted = st.builds(quote_literal, literal_body,
                   st.sampled_from(["'", '"', "`"]))
chunk = st.one_of(ident, quoted, st.sampled_from([" ", ", ", "(x)"]))
texts = st.lists(chunk, min_size=0, max_size=8).map("".join)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_mask_preserves_length_and_structure(s):
    m = sd._mask_quoted(s)
    assert len(m) == len(s)
    # unquoted characters are untouched; masked positions become spaces
    for a, b in zip(s, m):
        assert b == a or b == " "


@settings(max_examples=200, deadline=None)
@given(literal_body, st.sampled_from(["'", '"', "`"]))
def test_mask_blanks_whole_literal(body, q):
    lit = quote_literal(body, q)
    m = sd._mask_quoted("x " + lit + " y")
    # nothing from inside the literal survives (quote chars may remain)
    inner = m[2:-2]
    assert set(inner) <= {" ", q}
    assert m.startswith("x ") and m.endswith(" y")


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(ident, quoted), min_size=1, max_size=5))
def test_split_top_level_roundtrip(parts):
    """Each comma-joined VALID element (identifier or quoted literal —
    quoted commas included) comes back as exactly one piece, verbatim."""
    s = ", ".join(parts)
    out = sd._split_top_level(s)
    assert out == [p.strip() for p in parts if p.strip()]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(ident, quoted), min_size=1, max_size=4))
def test_balanced_group_extracts_exact_content(parts):
    inner = " ".join(parts)
    s = "HEAD (" + inner + ") TAIL"
    body, rest = sd._balanced_group(s, 5)
    assert body == inner
    assert rest == " TAIL"


@settings(max_examples=150, deadline=None)
@given(st.lists(st.one_of(ident, quoted), min_size=1, max_size=4))
def test_split_statements_semicolons_in_literals_survive(parts):
    """Statements containing quoted semicolons split ONLY at top-level
    semicolons; stripped comments never eat quoted content."""
    stmts = ["S%d %s" % (i, p) for i, p in enumerate(parts)]
    script = ";\n".join(stmts) + ";"
    out = sd.split_statements(script)
    assert len(out) == len(stmts)
    for want, got in zip(stmts, out):
        assert got.strip() == want.strip()

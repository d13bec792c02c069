"""Property-based N-Quads round-trip tests (hypothesis): any structurally
valid quad must survive serialize->parse unchanged, including hostile
literal content (the injection-safety property generalized)."""

from hypothesis import given, settings, strategies as st

from racket_linkeddata_spark.core.nquads import parse_line, serialize_quad
from racket_linkeddata_spark.core.terms import Literal, Quad, RDF_LANG_STRING

iri = st.from_regex(r"https?://[a-z0-9.]{1,20}/[A-Za-z0-9_#/~%.-]{0,30}",
                    fullmatch=True)
bnode = st.from_regex(r"_:[A-Za-z0-9][A-Za-z0-9_]{0,10}", fullmatch=True)
lang = st.from_regex(r"[a-z]{2}(-[a-z0-9]{1,8}){0,2}", fullmatch=True)
# arbitrary text including quotes/backslashes/newlines/unicode
lex = st.text(min_size=0, max_size=60)

literal = st.one_of(
    st.builds(lambda v: Literal(v), lex),
    st.builds(lambda v, dt: Literal(v, dt), lex, iri),
    st.builds(lambda v, lg: Literal(v, RDF_LANG_STRING, lg), lex, lang),
)

quad = st.builds(
    Quad,
    st.one_of(iri, bnode),
    iri,
    st.one_of(iri, bnode, literal),
    st.one_of(st.none(), iri, bnode),
)


@settings(max_examples=300, deadline=None)
@given(quad)
def test_roundtrip(q):
    line = serialize_quad(q)
    assert "\n" not in line and "\r" not in line  # injection-proof
    assert parse_line(line) == q

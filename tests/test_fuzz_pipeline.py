"""Hostile-input fuzzing: arbitrary JSON embedded in a page must always
produce either triples or a flagged status — never an unhandled exception
(at corpus scale one poison page must not kill an executor task)."""

import json

from hypothesis import given, settings, strategies as st

from racket_linkeddata_spark.core.pipeline import page_to_triples

json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(min_value=-10**12, max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
    st.sampled_from(["@id", "@type", "@list", "@value", "@context",
                     "http://ex.org/x", "_:b0", "ex:y", "@vocab", "@graph"]),
)

json_trees = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.one_of(st.text(max_size=10),
                      st.sampled_from(["@id", "@type", "@value", "@language",
                                       "@list", "@set", "@context", "@graph",
                                       "@reverse", "@index", "@vocab",
                                       "@base", "name", "ex:p"])),
            children, max_size=5)),
    max_leaves=25,
)


@settings(max_examples=250, deadline=None)
@given(json_trees)
def test_page_never_raises(doc):
    payload = json.dumps(doc)
    html = (f'<html><head><script type="application/ld+json">{payload}'
            f'</script></head><body>t</body></html>').encode()
    res = page_to_triples("https://fuzz.example/p", html)
    assert res.status == "ok" and res.n_triples > 0 or res.rows == []
    # triples, if any, are serializable (canonical rows are well-formed)
    for row in res.rows:
        assert row[1] and row[2]


# hostile attribute/tag soup for the RDFa + microdata front ends: the
# lenient html parsers must never raise, and whatever quads survive
# must be canonicalizable rows
_ATTRS = st.sampled_from([
    "property", "typeof", "vocab", "prefix", "about", "resource",
    "href", "src", "content", "datatype", "lang", "itemscope",
    "itemtype", "itemprop", "itemid",
])
_VALS = st.one_of(
    st.text(max_size=15),
    st.sampled_from([
        "http://schema.org/", "http://schema.org/Person", "name",
        "schema:x", "[ex:y]", "_:b0", "#frag", "/rel", "", "a b c",
        "dc: http://purl.org/dc/terms/", "  ", ":", "x:",
    ]))
_TAGS = st.sampled_from(["div", "span", "a", "meta", "img", "time", "p"])


@st.composite
def _tag_soup(draw):
    parts = []
    for _ in range(draw(st.integers(0, 8))):
        kind = draw(st.integers(0, 3))
        tag = draw(_TAGS)
        if kind == 0:
            attrs = " ".join(
                f'{draw(_ATTRS)}="{draw(_VALS)}"'
                for _ in range(draw(st.integers(0, 3))))
            parts.append(f"<{tag} {attrs}>")
        elif kind == 1:
            parts.append(f"</{tag}>")
        elif kind == 2:
            parts.append(draw(st.text(max_size=12)))
        else:
            parts.append(draw(st.sampled_from(
                ["<", ">", "<!---->", "<![CDATA[x]]>", "&amp;", "<x",
                 '<div itemscope itemprop="name">'])))
    return "".join(parts)


@settings(max_examples=250, deadline=None)
@given(_tag_soup())
def test_rdfa_microdata_soup_never_raises(soup):
    html = f"<html><body>{soup}</body></html>".encode()
    res = page_to_triples("https://fuzz.example/p", html)
    assert res.status.startswith(("ok", "empty", "error:"))
    for row in res.rows:
        assert row[1] and row[2]

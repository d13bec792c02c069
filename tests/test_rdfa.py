"""RDFa-Lite extraction semantics (core/rdfa.py) and its integration
into the per-document pipeline (same canonicalization as script JSON-LD,
text byte-invariance preserved)."""

from racket_linkeddata_spark.core.pipeline import page_to_triples
from racket_linkeddata_spark.core.rdfa import extract_rdfa
from racket_linkeddata_spark.core.terms import (
    RDF_LANG_STRING,
    RDF_TYPE,
    XSD_STRING,
    Literal,
    Quad,
)

BASE = "https://ex.org/page/1"
SCHEMA = "http://schema.org/"


def _q(html: str, base: str = BASE):
    return extract_rdfa(html.encode("utf-8"), base)


def test_vocab_typeof_property_content():
    got = _q('<div vocab="http://schema.org/" typeof="Article" '
             'about="#art"><span property="headline" content="Hi"></span>'
             '</div>')
    assert set(got) == {
        Quad(BASE + "#art", RDF_TYPE, SCHEMA + "Article"),
        Quad(BASE + "#art", SCHEMA + "headline",
             Literal("Hi", XSD_STRING)),
    }


def test_text_content_literal_spans_nested_markup():
    got = _q('<div vocab="http://schema.org/" about="#a">'
             '<h1 property="name">Hello <b>big</b> world</h1></div>')
    assert got == [Quad(BASE + "#a", SCHEMA + "name",
                        Literal("Hello big world", XSD_STRING))]


def test_href_and_src_objects_resolve_relative():
    got = _q('<div vocab="http://schema.org/" about="#a">'
             '<a property="author" href="/person/7">x</a>'
             '<img property="image" src="img/7.png"></div>')
    assert Quad(BASE + "#a", SCHEMA + "author",
                "https://ex.org/person/7") in got
    assert Quad(BASE + "#a", SCHEMA + "image",
                "https://ex.org/page/img/7.png") in got


def test_prefix_declaration_and_curie():
    got = _q('<div prefix="dc: http://purl.org/dc/terms/ '
             'foaf: http://xmlns.com/foaf/0.1/" about="#a">'
             '<span property="dc:title" content="T"></span>'
             '<span property="foaf:name" content="N"></span></div>')
    assert Quad(BASE + "#a", "http://purl.org/dc/terms/title",
                Literal("T", XSD_STRING)) in got
    assert Quad(BASE + "#a", "http://xmlns.com/foaf/0.1/name",
                Literal("N", XSD_STRING)) in got


def test_absolute_iri_property_without_vocab():
    got = _q('<span about="#a" property="http://schema.org/name" '
             'content="x"></span>')
    assert got == [Quad(BASE + "#a", SCHEMA + "name",
                        Literal("x", XSD_STRING))]


def test_bare_term_without_vocab_is_skipped():
    assert _q('<span about="#a" property="name" content="x"></span>') == []


def test_typeof_without_subject_mints_bnode_and_chains():
    got = _q('<div vocab="http://schema.org/" about="#a">'
             '<div property="author" typeof="Person">'
             '<span property="name" content="Ada"></span></div></div>')
    bnodes = [q.obj for q in got if q.pred == SCHEMA + "author"]
    assert len(bnodes) == 1 and bnodes[0].startswith("_:")
    b = bnodes[0]
    assert Quad(b, RDF_TYPE, SCHEMA + "Person") in got
    assert Quad(b, SCHEMA + "name", Literal("Ada", XSD_STRING)) in got


def test_about_typeof_property_types_subject_keeps_literal():
    """Review r04: about+typeof+property on ONE element must type the
    about subject (no bnode) and keep the property literal."""
    got = _q('<div vocab="http://schema.org/" about="#x" typeof="Person" '
             'property="name" content="Bob"></div>')
    assert set(got) == {
        Quad(BASE + "#x", RDF_TYPE, SCHEMA + "Person"),
        Quad(BASE + "#x", SCHEMA + "name", Literal("Bob", XSD_STRING)),
    }
    # text-content variant: literal captured, still no bnode
    got2 = _q('<div vocab="http://schema.org/" about="#x" '
              'typeof="Person" property="name">Bob</div>')
    assert set(got2) == set(got)


def test_undeclared_social_prefixes_skipped():
    """Review r04: og:/twitter:/fb: tokens without a prefix declaration
    must not become pseudo-IRI predicates; a DECLARED og: prefix and a
    real scheme still work."""
    got = _q('<head><meta property="og:title" content="My Page">'
             '<meta property="twitter:card" content="summary"></head>')
    assert got == []
    got = _q('<div prefix="og: http://ogp.me/ns#" about="#a">'
             '<meta property="og:title" content="T"></div>')
    assert got == [Quad(BASE + "#a", "http://ogp.me/ns#title",
                        Literal("T", XSD_STRING))]
    got = _q('<span about="#a" property="urn:example:p" content="x">'
             '</span>')
    assert got == [Quad(BASE + "#a", "urn:example:p",
                        Literal("x", XSD_STRING))]


def test_content_wins_over_typeof_minted_bnode():
    """ADVICE r04 (low), RDFa Core 1.1 step 11: @content supplies the
    property VALUE even when @typeof mints a bnode — the literal must
    not be dropped; the typed bnode keeps its rdf:type quads."""
    got = _q('<div vocab="http://schema.org/" about="#a">'
             '<span property="author" typeof="Person" content="Alice">'
             '</span></div>')
    assert Quad(BASE + "#a", SCHEMA + "author",
                Literal("Alice", XSD_STRING)) in got
    types = [q for q in got if q.pred == RDF_TYPE]
    assert len(types) == 1 and types[0].subj.startswith("_:")
    assert types[0].obj == SCHEMA + "Person"


def test_content_wins_over_href_resource():
    """RDFa Core 1.1 step 11: @content beats @href/@src/@resource for
    the property value; the resource still chains for descendants."""
    got = _q('<div vocab="http://schema.org/" about="#a">'
             '<a property="author" href="/p/7" content="Alice">x</a>'
             '</div>')
    assert got == [Quad(BASE + "#a", SCHEMA + "author",
                        Literal("Alice", XSD_STRING))]
    got = _q('<div vocab="http://schema.org/" about="#a">'
             '<div property="publisher" resource="#org" content="Acme">'
             '<span property="name" content="A Corp"></span></div></div>')
    assert Quad(BASE + "#a", SCHEMA + "publisher",
                Literal("Acme", XSD_STRING)) in got
    # descendants still attach to the resource, not the literal
    assert Quad(BASE + "#org", SCHEMA + "name",
                Literal("A Corp", XSD_STRING)) in got


def test_property_resource_sets_object_and_child_subject():
    got = _q('<div vocab="http://schema.org/" about="#a">'
             '<div property="publisher" resource="#org">'
             '<span property="name" content="Acme"></span></div></div>')
    assert Quad(BASE + "#a", SCHEMA + "publisher", BASE + "#org") in got
    assert Quad(BASE + "#org", SCHEMA + "name",
                Literal("Acme", XSD_STRING)) in got


def test_typed_literal_datatype_and_lang():
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    got = _q('<div vocab="http://schema.org/" about="#a" lang="en">'
             f'<span property="wordCount" datatype="{xsd_int}" '
             'content="42"></span>'
             '<span property="headline" content="Hello"></span></div>')
    assert Quad(BASE + "#a", SCHEMA + "wordCount",
                Literal("42", xsd_int)) in got
    assert Quad(BASE + "#a", SCHEMA + "headline",
                Literal("Hello", RDF_LANG_STRING, "en")) in got


def test_lang_inherits_and_overrides():
    got = _q('<div vocab="http://schema.org/" about="#a" lang="en">'
             '<span property="name">outer</span>'
             '<span lang="fr" property="name">inner</span></div>')
    assert Quad(BASE + "#a", SCHEMA + "name",
                Literal("outer", RDF_LANG_STRING, "en")) in got
    assert Quad(BASE + "#a", SCHEMA + "name",
                Literal("inner", RDF_LANG_STRING, "fr")) in got


def test_meta_void_element_with_content():
    got = _q('<div vocab="http://schema.org/" about="#a">'
             '<meta property="datePublished" content="2024-01-01"></div>')
    assert got == [Quad(BASE + "#a", SCHEMA + "datePublished",
                        Literal("2024-01-01", XSD_STRING))]


def test_about_empty_is_page_url():
    got = _q('<div vocab="http://schema.org/" about="">'
             '<span property="name" content="p"></span></div>')
    assert got == [Quad(BASE, SCHEMA + "name", Literal("p", XSD_STRING))]


def test_malformed_html_unclosed_tags_still_extract():
    got = _q('<div vocab="http://schema.org/" about="#a">'
             '<span property="name">text never closed')
    assert got == [Quad(BASE + "#a", SCHEMA + "name",
                        Literal("text never closed", XSD_STRING))]


def test_stray_end_tags_ignored():
    got = _q('</div><span about="#a" '
             'property="http://schema.org/name" content="x"></span></p>')
    assert len(got) == 1


def test_no_rdfa_attributes_no_quads():
    assert _q("<html><body><p>plain prose</p></body></html>") == []


def test_safe_curie_about():
    got = _q('<div prefix="ex: http://ex.com/" about="[ex:thing]">'
             '<span property="http://schema.org/name" content="x"></span>'
             '</div>')
    assert got == [Quad("http://ex.com/thing", SCHEMA + "name",
                        Literal("x", XSD_STRING))]


def test_base_resolver_parity_with_resolve_iri():
    """The front ends' BaseResolver fast paths must agree with
    core.context.resolve_iri on every reference shape, for every base
    shape (fragment-free http, fragmented http, opaque urn/tag)."""
    from racket_linkeddata_spark.core.context import (
        BaseResolver, resolve_iri)

    bases = ["https://ex.org/a/b", "https://ex.org/a/b#frag",
             "https://ex.org", "tag:example,2024:x",
             "urn:uuid:1234", "https://u:p@ex.org:8443/q?x=1"]
    refs = ["", "#x", "/p/q", "/p/q.html", "//other.org/r", "r/s",
            "../up", "./here", "?query", "/a/./b", "/a/../b",
            "https://abs.example/p", "_:b0", "#", "/"]
    for base in bases:
        r = BaseResolver(base)
        for ref in refs:
            assert r.resolve(ref) == resolve_iri(base, ref), \
                f"divergence: base={base!r} ref={ref!r}"


# --- pipeline integration -------------------------------------------------


def _page(html: str) -> bytes:
    return html.encode("utf-8")


def test_pipeline_extracts_rdfa_and_jsonld_together():
    html = _page(
        '<html><head><script type="application/ld+json">'
        '{"@id": "https://ex.org/page/1#js", '
        '"http://schema.org/name": "from-jsonld"}</script></head>'
        '<body><div vocab="http://schema.org/" about="#rd">'
        '<span property="name" content="from-rdfa"></span></div>'
        'BODYTEXT</body></html>')
    res = page_to_triples(BASE, html)
    assert res.status == "ok"
    subs = {(r[1], r[4]) for r in res.rows}
    assert (BASE + "#js", "from-jsonld") in subs
    assert (BASE + "#rd", "from-rdfa") in subs


def test_pipeline_rdfa_bnodes_canonicalize():
    html = _page(
        '<html><body><div vocab="http://schema.org/" about="#a">'
        '<div property="author" typeof="Person">'
        '<span property="name" content="Ada"></span></div></div>'
        '</body></html>')
    res = page_to_triples(BASE, html)
    assert res.status == "ok"
    bnode_rows = [r for r in res.rows if r[1].startswith("_:")]
    assert bnode_rows and all(r[1].startswith("_:c14n")
                              for r in bnode_rows)
    # deterministic: same page, same rows
    assert page_to_triples(BASE, html).rows == res.rows


def test_pipeline_text_invariance_with_rdfa():
    from racket_linkeddata_spark.core.pipeline import extract_text

    body = ('<div vocab="http://schema.org/" about="#a">'
            '<span property="name">visible text</span></div>')
    html = _page(f"<html><body>{body}</body></html>")
    assert extract_text(html) == body


def test_pipeline_rdfa_free_page_skips_parser(monkeypatch):
    """The byte-gate must keep RDFa-free pages off the html parser."""
    import racket_linkeddata_spark.core.rdfa as rdfa_mod

    def boom(html, base):
        raise AssertionError("parser ran on an RDFa-free page")

    monkeypatch.setattr(rdfa_mod, "extract_rdfa", boom)
    html = _page('<html><head><script type="application/ld+json">'
                 '{"@id": "https://e/x", "http://s/p": 1}</script>'
                 '</head><body>t</body></html>')
    res = page_to_triples("https://e/page", html)
    assert res.status == "ok" and res.n_triples == 1

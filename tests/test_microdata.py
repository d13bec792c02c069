"""Microdata extraction semantics (core/microdata.py) and pipeline
integration (third html front end, same canonicalization)."""

from racket_linkeddata_spark.core.microdata import extract_microdata
from racket_linkeddata_spark.core.pipeline import page_to_triples
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
    return extract_microdata(html.encode("utf-8"), base)


def test_itemscope_itemtype_itemprop_text():
    got = _q('<div itemscope itemtype="http://schema.org/Person" '
             'itemid="#me"><span itemprop="name">Ada</span></div>')
    assert set(got) == {
        Quad(BASE + "#me", RDF_TYPE, SCHEMA + "Person"),
        Quad(BASE + "#me", SCHEMA + "name", Literal("Ada", XSD_STRING)),
    }


def test_itemscope_without_itemid_mints_bnode():
    got = _q('<div itemscope itemtype="http://schema.org/Person">'
             '<span itemprop="name">Ada</span></div>')
    subj = got[0].subj
    assert subj.startswith("_:")
    assert Quad(subj, SCHEMA + "name", Literal("Ada", XSD_STRING)) in got


def test_nested_item_links_to_parent():
    got = _q('<div itemscope itemtype="http://schema.org/Article" '
             'itemid="#art"><div itemprop="author" itemscope '
             'itemtype="http://schema.org/Person">'
             '<span itemprop="name">Ada</span></div></div>')
    authors = [q.obj for q in got if q.pred == SCHEMA + "author"]
    assert len(authors) == 1 and authors[0].startswith("_:")
    b = authors[0]
    assert Quad(b, RDF_TYPE, SCHEMA + "Person") in got
    assert Quad(b, SCHEMA + "name", Literal("Ada", XSD_STRING)) in got
    assert Quad(BASE + "#art", RDF_TYPE, SCHEMA + "Article") in got


def test_untyped_nested_item_inherits_vocabulary():
    got = _q('<div itemscope itemtype="http://schema.org/Article" '
             'itemid="#a"><div itemprop="author" itemscope>'
             '<span itemprop="name">Ada</span></div></div>')
    b = next(q.obj for q in got if q.pred == SCHEMA + "author")
    assert Quad(b, SCHEMA + "name", Literal("Ada", XSD_STRING)) in got


def test_url_valued_elements_resolve_relative():
    got = _q('<div itemscope itemtype="http://schema.org/Person" '
             'itemid="#me"><a itemprop="url" href="/ada">x</a>'
             '<img itemprop="image" src="pic.png"></div>')
    assert Quad(BASE + "#me", SCHEMA + "url", "https://ex.org/ada") in got
    assert Quad(BASE + "#me", SCHEMA + "image",
                "https://ex.org/page/pic.png") in got


def test_meta_content_and_time_datetime():
    got = _q('<div itemscope itemtype="http://schema.org/Article" '
             'itemid="#a"><meta itemprop="wordCount" content="42">'
             '<time itemprop="datePublished" datetime="2024-01-01">'
             'Jan 1</time></div>')
    assert Quad(BASE + "#a", SCHEMA + "wordCount",
                Literal("42", XSD_STRING)) in got
    assert Quad(BASE + "#a", SCHEMA + "datePublished",
                Literal("2024-01-01", XSD_STRING)) in got


def test_lang_inherited_on_text_values():
    got = _q('<div lang="en" itemscope '
             'itemtype="http://schema.org/Person" itemid="#me">'
             '<span itemprop="name">Ada</span></div>')
    assert Quad(BASE + "#me", SCHEMA + "name",
                Literal("Ada", RDF_LANG_STRING, "en")) in got


def test_absolute_url_itemprop_passes_through():
    got = _q('<div itemscope itemid="#a">'
             '<span itemprop="http://purl.org/dc/terms/title">T</span>'
             '</div>')
    assert got == [Quad(BASE + "#a", "http://purl.org/dc/terms/title",
                        Literal("T", XSD_STRING))]


def test_bare_itemprop_without_vocabulary_skipped():
    # no itemtype anywhere -> no vocabulary -> bare name has no IRI
    got = _q('<div itemscope itemid="#a">'
             '<span itemprop="name">Ada</span></div>')
    assert got == []


def test_itemprop_undeclared_prefix_token_skipped():
    """Review r04: itemprop="og:title"-style tokens are not URLs; they
    must not become pseudo-IRI predicates (nor be vocab-appended)."""
    got = _q('<div itemscope itemtype="http://schema.org/Thing" '
             'itemid="#a"><meta itemprop="og:title" content="T">'
             '<meta itemprop="name" content="N"></div>')
    preds = {q.pred for q in got}
    assert "og:title" not in preds and SCHEMA + "og:title" not in preds
    assert SCHEMA + "name" in preds


def test_itemprop_outside_itemscope_ignored():
    assert _q('<span itemprop="name">Ada</span>') == []


def test_multiple_itemprops_one_value():
    got = _q('<div itemscope itemtype="http://schema.org/Person" '
             'itemid="#me"><span itemprop="name alternateName">Ada'
             '</span></div>')
    assert Quad(BASE + "#me", SCHEMA + "name",
                Literal("Ada", XSD_STRING)) in got
    assert Quad(BASE + "#me", SCHEMA + "alternateName",
                Literal("Ada", XSD_STRING)) in got


def test_unclosed_tags_still_extract():
    got = _q('<div itemscope itemtype="http://schema.org/Person" '
             'itemid="#me"><span itemprop="name">never closed')
    assert Quad(BASE + "#me", SCHEMA + "name",
                Literal("never closed", XSD_STRING)) in got


def test_pipeline_all_three_formats_together():
    html = (
        '<html><head><script type="application/ld+json">'
        '{"@id": "https://ex.org/page/1#js", '
        '"http://schema.org/name": "from-jsonld"}</script></head>'
        '<body><div vocab="http://schema.org/" about="#rd">'
        '<span property="name" content="from-rdfa"></span></div>'
        '<div itemscope itemtype="http://schema.org/Thing" itemid="#md">'
        '<span itemprop="name">from-microdata</span></div>'
        '</body></html>').encode("utf-8")
    res = page_to_triples(BASE, html)
    assert res.status == "ok"
    pairs = {(r[1], r[4]) for r in res.rows}
    assert (BASE + "#js", "from-jsonld") in pairs
    assert (BASE + "#rd", "from-rdfa") in pairs
    assert (BASE + "#md", "from-microdata") in pairs


def test_pipeline_microdata_bnodes_canonicalize_deterministically():
    html = ('<html><body><div itemscope '
            'itemtype="http://schema.org/Person">'
            '<span itemprop="name">Ada</span></div>'
            '</body></html>').encode("utf-8")
    res = page_to_triples(BASE, html)
    assert res.status == "ok"
    assert all(r[1].startswith("_:c14n")
               for r in res.rows if r[1].startswith("_:"))
    assert page_to_triples(BASE, html).rows == res.rows

"""N-Quads parser/serializer unit tests.

Vectors mirror the reference's inline tests: 9-statement round trip
(n-quads.rkt:274-334, 358-407, 558-562) and the injection-attack vectors
(n-quads.rkt:564-606).
"""

import pytest

from racket_linkeddata_spark.core.nquads import (
    NQuadsParseError,
    NQuadsSerializeError,
    parse,
    serialize,
    serialize_quad,
)
from racket_linkeddata_spark.core.terms import Literal, Quad, RDF_LANG_STRING

EXAMPLE = """<http://example.com/Subj1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://example.com/Type> .
<http://example.com/Subj1> <http://example.com/prop1> <http://example.com/Obj1> .
<http://example.com/Subj1> <http://example.com/prop2> "Plain" .
<http://example.com/Subj1> <http://example.com/prop2> "2012-05-12"^^<http://www.w3.org/2001/XMLSchema#date> .
<http://example.com/Subj1> <http://example.com/prop2> "English"@en .
_:b0 <http://example.com/prop1> <http://example.com/Obj1> .
<http://example.com/Subj1> <http://example.com/prop1> _:b1 .
<http://example.com/Subj1> <http://example.com/prop1> <http://example.com/Obj1> <http://example.com/a-graph/> .
<http://example.com/Subj1> <http://example.com/prop1> <http://example.com/Obj1> _:b3 .
"""

EXPECTED = [
    Quad("http://example.com/Subj1",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://example.com/Type"),
    Quad("http://example.com/Subj1", "http://example.com/prop1",
         "http://example.com/Obj1"),
    Quad("http://example.com/Subj1", "http://example.com/prop2",
         Literal("Plain", "http://www.w3.org/2001/XMLSchema#string", None)),
    Quad("http://example.com/Subj1", "http://example.com/prop2",
         Literal("2012-05-12", "http://www.w3.org/2001/XMLSchema#date", None)),
    Quad("http://example.com/Subj1", "http://example.com/prop2",
         Literal("English", RDF_LANG_STRING, "en")),
    Quad("_:b0", "http://example.com/prop1", "http://example.com/Obj1"),
    Quad("http://example.com/Subj1", "http://example.com/prop1", "_:b1"),
    Quad("http://example.com/Subj1", "http://example.com/prop1",
         "http://example.com/Obj1", "http://example.com/a-graph/"),
    Quad("http://example.com/Subj1", "http://example.com/prop1",
         "http://example.com/Obj1", "_:b3"),
]


def test_parse_example():
    assert parse(EXAMPLE) == EXPECTED


def test_roundtrip_example():
    assert serialize(EXPECTED) == EXAMPLE


def test_escapes_roundtrip():
    line = '<http://ex/s> <http://ex/p> "a\\"b\\\\c\\nd\\te" .\n'
    (q,) = parse(line)
    assert q.obj.value == 'a"b\\c\nd\te'
    assert serialize([q]) == line


def test_uchar_unescape():
    (q,) = parse('<http://ex/s> <http://ex/p> "\\u0041\\U0001F600" .')
    assert q.obj.value == "A\U0001F600"


def test_iri_tuple_insertion_attack_neutralized():
    evil = Quad(
        'http://foo.example/> <http://bar.example/> "baz" .\n'
        '<data:little> <data:bobby> <data:tables> .\n<data:in-ur-base',
        "http://quux.example/",
        "_:b0",
    )
    line = serialize_quad(evil)
    assert "\n" not in line
    # there and back again
    assert parse(line + "\n") == [evil]


def test_language_tag_injection_rejected():
    evil = Quad("_:b0", "http://quux.example/",
                Literal("beep", RDF_LANG_STRING,
                        "foo .\n <urn:in> <urn:ur> <urn:base>"))
    with pytest.raises(NQuadsSerializeError):
        serialize_quad(evil)


def test_blank_node_injection_rejected():
    evil = Quad("_:b0<urn:bar>", "http://quux.example/", "_:b1")
    with pytest.raises(NQuadsSerializeError):
        serialize_quad(evil)


def test_comments_and_blank_lines_skipped():
    text = "# comment\n\n<http://ex/s> <http://ex/p> <http://ex/o> .\n"
    assert len(parse(text)) == 1


def test_bnode_predicate_rejected_by_default():
    # W3C N-Quads allows only IRIREF in predicate position
    q = Quad("_:s", "_:p", "http://ex/o")
    with pytest.raises(NQuadsSerializeError):
        serialize_quad(q)
    with pytest.raises(NQuadsParseError):
        parse("_:s _:p <http://ex/o> .\n")


def test_bnode_predicate_allowed_when_generalized():
    q = Quad("_:s", "_:p", "http://ex/o")
    line = serialize_quad(q, generalized=True)
    assert parse(line + "\n", generalized=True) == [q]

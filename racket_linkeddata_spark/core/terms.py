"""RDF data model: terms, triples, quads, vocabulary constants.

Semantics mirror the reference's core structs (rdf.rkt:11-96) but use plain
Python tuples/strings so rows stay Arrow-friendly:

- IRI          -> plain ``str``
- blank node   -> ``str`` starting with ``_:`` (reference stores a label
                  struct, rdf.rkt:37-38; the ``_:`` string convention matches
                  its JSON-level ``blank-node-string?``, json-ld.rkt:173-176)
- literal      -> ``Literal(value, datatype, language)`` (rdf.rkt:47-52)
- quad         -> ``Quad(subj, pred, obj, graph)``; ``graph is None`` is the
                  default graph (rdf.rkt:22-30, n-quads.rkt:236-240)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"

# vocabulary constants (rdf.rkt:58-85)
RDF_TYPE = RDF + "type"
RDF_LANG_STRING = RDF + "langString"
RDF_NIL = RDF + "nil"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
XSD_BOOLEAN = XSD + "boolean"
XSD_DOUBLE = XSD + "double"
XSD_INTEGER = XSD + "integer"
XSD_STRING = XSD + "string"


class Literal(NamedTuple):
    """RDF 1.1 literal: lexical form + datatype IRI + optional language tag."""

    value: str
    datatype: str = XSD_STRING
    language: Optional[str] = None


Term = Union[str, Literal]  # str = IRI or "_:label" blank node


class Quad(NamedTuple):
    subj: str
    pred: str
    obj: Term
    graph: Optional[str] = None  # None = default graph


def is_blank(term: object) -> bool:
    """Blank-node test on the string encoding (json-ld.rkt:173-176)."""
    return isinstance(term, str) and term.startswith("_:")


# object-kind codes for the flat Spark triples schema
KIND_IRI = 0
KIND_BLANK = 1
KIND_LITERAL = 2


def obj_columns(obj: Term):
    """Split a term into the (obj_kind, obj_value, obj_dt, obj_lang) columns."""
    if isinstance(obj, Literal):
        return KIND_LITERAL, obj.value, obj.datatype, obj.language
    if is_blank(obj):
        return KIND_BLANK, obj, None, None
    return KIND_IRI, obj, None, None


def obj_from_columns(kind: int, value: str, dt, lang) -> Term:
    if kind == KIND_LITERAL:
        return Literal(value, dt if dt else XSD_STRING, lang if lang else None)
    return value

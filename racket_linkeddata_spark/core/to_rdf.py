"""Deserialize JSON-LD to RDF (JSON-LD 1.0 API §10).

Reference: json-ld->rdf (json-ld.rkt:2520-2597), object-to-rdf-conversion
(json-ld.rkt:2601-2667), list-to-rdf-conversion (json-ld.rkt:2669-2701).
Pinned by the toRdf-* fixtures. Number lexical forms follow XSD canonical
rules (doubles as ``1.0E0`` — Spark's format_number/cast must never be used
for these, SURVEY.md §2.8).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

from .context import is_absolute_iri
from .expand import expand
from .node_map import BlankNodeIssuer, build_node_map
from .terms import (
    Literal,
    Quad,
    RDF_FIRST,
    RDF_LANG_STRING,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    Term,
)


def _is_blank_id(v: Any) -> bool:
    return isinstance(v, str) and v.startswith("_:")


def canonical_double(value: float) -> str:
    """XSD canonical double lexical form (e.g. 1.1E0, -2.0E-1, 1.0E21;
    reference emits the same via Racket real->string, json-ld.rkt:2636-2646)."""
    mantissa, _, exponent = ("%1.15E" % value).partition("E")
    mantissa = mantissa.rstrip("0")
    if mantissa.endswith("."):
        mantissa += "0"
    return f"{mantissa}E{int(exponent)}"


def object_to_rdf(item: Dict[str, Any]) -> Optional[Term]:
    """Object to RDF Conversion (§10.5; json-ld.rkt:2601-2667).
    Returns None for node references that are relative IRIs (dropped)."""
    if "@id" in item and "@value" not in item:
        id_ = item["@id"]
        if _is_blank_id(id_) or is_absolute_iri(id_):
            return id_
        return None

    value = item["@value"]
    datatype = item.get("@type")
    vt = value.__class__  # exact-type dispatch: JSON values are
    # str/bool/int/float only, and bool must NOT fall into the int arm
    # (json.loads never produces subclasses, so `is` checks are exact)

    if vt is str and datatype != XSD_DOUBLE:
        # the overwhelmingly common case on web corpora
        if datatype is None:
            datatype = (RDF_LANG_STRING if "@language" in item
                        else XSD_STRING)
        return Literal(value, datatype, item.get("@language"))
    if vt is bool:
        value = "true" if value else "false"
        datatype = datatype or XSD_BOOLEAN
    elif vt is float or (vt is int and datatype == XSD_DOUBLE):
        # Only NATIVE JSON numbers are canonicalized (spec §10.5 step 6;
        # json-ld.rkt:2636 guards on number?). A STRING @value with
        # @type xsd:double must pass through verbatim — canonicalizing
        # it corrupts canonical hashes / LD-signatures, and a
        # non-numeric string would raise and drop the whole document.
        value = canonical_double(float(value))
        datatype = datatype or XSD_DOUBLE
    elif vt is int:
        value = str(value)
        datatype = datatype or XSD_INTEGER
    elif "@language" in item:
        datatype = datatype or RDF_LANG_STRING
    else:
        datatype = datatype or XSD_STRING

    return Literal(str(value), datatype, item.get("@language"))


def list_to_rdf(items: List[Any], issuer: BlankNodeIssuer,
                triples: List[Quad], graph: Optional[str]) -> Term:
    """List to RDF Conversion (§10.6; json-ld.rkt:2669-2701): emit an
    rdf:first/rdf:rest chain, return the head term."""
    if not items:
        return RDF_NIL
    bnodes = [issuer.issue() for _ in items]
    for i, item in enumerate(items):
        obj = object_to_rdf(item)
        if obj is not None:
            triples.append(Quad(bnodes[i], RDF_FIRST, obj, graph))
        rest: Term = bnodes[i + 1] if i + 1 < len(items) else RDF_NIL
        triples.append(Quad(bnodes[i], RDF_REST, rest, graph))
    return bnodes[0]


def node_map_to_rdf(node_map: Dict[str, Dict[str, Any]],
                    issuer: BlankNodeIssuer,
                    produce_generalized_rdf: bool = False) -> List[Quad]:
    """Walk graphs/subjects/properties in sorted order emitting quads
    (json-ld.rkt:2520-2577)."""
    quads: List[Quad] = []
    for graph_name in sorted(node_map.keys()):
        if graph_name == "@default":
            graph: Optional[str] = None
        elif _is_blank_id(graph_name) or is_absolute_iri(graph_name):
            graph = graph_name
        else:
            continue  # relative graph names dropped (json-ld.rkt:2586-2589)
        nodes = node_map[graph_name]
        for subject in sorted(nodes.keys()):
            if not (_is_blank_id(subject) or is_absolute_iri(subject)):
                continue  # relative subjects dropped (json-ld.rkt:2534-2537)
            node = nodes[subject]
            for prop in sorted(node.keys()):
                values = node[prop]
                if prop == "@type":
                    for t in values:
                        if _is_blank_id(t) or is_absolute_iri(t):
                            quads.append(Quad(subject, RDF_TYPE, t, graph))
                    continue
                if prop.startswith("@"):
                    continue
                if _is_blank_id(prop) and not produce_generalized_rdf:
                    continue  # bnode predicates (json-ld.rkt:2551-2554)
                if not (_is_blank_id(prop) or is_absolute_iri(prop)):
                    continue
                for item in values:
                    if isinstance(item, dict) and "@list" in item:
                        list_triples: List[Quad] = []
                        head = list_to_rdf(item["@list"], issuer,
                                           list_triples, graph)
                        quads.append(Quad(subject, prop, head, graph))
                        quads.extend(list_triples)
                    else:
                        obj = object_to_rdf(item)
                        if obj is not None:
                            quads.append(Quad(subject, prop, obj, graph))
    return quads


def to_rdf(document: Any, *, base: Optional[str] = None,
           expand_context: Any = None,
           remote_contexts: Optional[Dict[str, Any]] = None,
           produce_generalized_rdf: bool = False) -> List[Quad]:
    """expand → node map → quads (reference composition json-ld.rkt:2707-2708)."""
    expanded = expand(document, base=base, expand_context=expand_context,
                      remote_contexts=remote_contexts)
    node_map, issuer = build_node_map(expanded)
    return node_map_to_rdf(node_map, issuer, produce_generalized_rdf)

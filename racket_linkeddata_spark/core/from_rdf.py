"""Serialize RDF as JSON-LD (JSON-LD 1.0 API §10.5).

The reference vendors the fromRdf fixtures but never implemented the
algorithm (SURVEY.md §5.1); we implement it from the spec so the engine
covers both directions (toRDF / fromRDF). Pinned by the fromRdf-*
fixtures (N-Quads in, expanded JSON-LD out).
"""

from __future__ import annotations

from typing import Any, Dict, List

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
)

_RDF_LIST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#List"


def _rdf_to_object(o, use_native_types: bool) -> Dict[str, Any]:
    if not isinstance(o, Literal):
        return {"@id": o}
    result: Dict[str, Any] = {}
    if o.language:
        result["@value"] = o.value
        result["@language"] = o.language
        return result
    dt = o.datatype or XSD_STRING
    value: Any = o.value
    if use_native_types:
        if dt == XSD_STRING:
            pass
        elif dt == XSD_BOOLEAN and value in ("true", "false"):
            value = value == "true"
            dt = XSD_STRING  # marker: converted, omit @type
        elif dt == XSD_INTEGER:
            try:
                value = int(value)
                dt = XSD_STRING
            except ValueError:
                pass
        elif dt == XSD_DOUBLE:
            try:
                value = float(value)
                dt = XSD_STRING
            except ValueError:
                pass
    result["@value"] = value
    if dt != XSD_STRING:
        result["@type"] = dt
    return result


def _strict_in(value, values) -> bool:
    from .node_map import _strict_eq

    return any(_strict_eq(value, v) for v in values)


def _well_formed_list_node(node: Dict[str, Any]) -> bool:
    if len(node.get(RDF_FIRST, [])) != 1 or len(node.get(RDF_REST, [])) != 1:
        return False
    types = node.get("@type", [])
    if types and types != [_RDF_LIST]:
        return False
    allowed = {"@id", "@type", "usages", RDF_FIRST, RDF_REST}
    return set(node.keys()) <= allowed


def from_rdf(quads: List[Quad], *, use_native_types: bool = False,
             use_rdf_type: bool = False) -> List[Any]:
    """Serialize RDF as JSON-LD (expanded form)."""
    default_graph: Dict[str, Any] = {}
    graph_map: Dict[str, Dict[str, Any]] = {"@default": default_graph}
    # bnode -> its single usage dict, or False once referenced twice
    # ANYWHERE in the dataset (a list node shared across graphs is not
    # reconstructable — fromRdf-0020)
    referenced_once: Dict[str, Any] = {}

    # RDF dataset = SET of quads (n-quads.rkt:336-351): duplicates would
    # double-count bnode references and break list reconstruction
    seen = set()
    by_graph: Dict[str, List[Quad]] = {}
    for q in quads:
        if q in seen:
            continue
        seen.add(q)
        name = q.graph if q.graph is not None else "@default"
        by_graph.setdefault(name, []).append(q)

    for name in sorted(by_graph.keys()):
        node_map = graph_map.setdefault(name, {})
        if name != "@default" and name not in default_graph:
            default_graph[name] = {"@id": name}
        for q in by_graph[name]:
            node = node_map.setdefault(q.subj, {"@id": q.subj})
            is_ref = not isinstance(q.obj, Literal)
            if is_ref:
                node_map.setdefault(q.obj, {"@id": q.obj})
            if q.pred == RDF_TYPE and not use_rdf_type and is_ref:
                types = node.setdefault("@type", [])
                if q.obj not in types:
                    types.append(q.obj)
                continue
            value = _rdf_to_object(q.obj, use_native_types)
            values = node.setdefault(q.pred, [])
            if not _strict_in(value, values):
                values.append(value)
            if is_ref and q.obj == RDF_NIL:
                obj_node = node_map[q.obj]
                obj_node.setdefault("usages", []).append(
                    {"node": node, "property": q.pred, "value": value})
            elif is_ref and q.obj.startswith("_:"):
                if q.obj in referenced_once:
                    referenced_once[q.obj] = False
                else:
                    referenced_once[q.obj] = {
                        "node": node, "property": q.pred, "value": value}

    # list reconstruction (spec step 4)
    for name, graph_object in graph_map.items():
        nil = graph_object.get(RDF_NIL)
        if nil is None:
            continue
        for usage in nil.get("usages", []):
            node = usage["node"]
            prop = usage["property"]
            head = usage["value"]
            list_: List[Any] = []
            list_nodes: List[str] = []
            while (prop == RDF_REST
                   and isinstance(node.get("@id"), str)
                   and node["@id"].startswith("_:")
                   and isinstance(referenced_once.get(node["@id"]), dict)
                   and _well_formed_list_node(node)):
                list_.append(node[RDF_FIRST][0])
                list_nodes.append(node["@id"])
                node_usage = referenced_once[node["@id"]]
                node = node_usage["node"]
                prop = node_usage["property"]
                head = node_usage["value"]
                if not node["@id"].startswith("_:"):
                    break
            # nested-list edge: skip the rdf:first value that points at
            # the head and back up one step (spec 4.3.4-4.3.6)
            if prop == RDF_FIRST:
                if head["@id"] == RDF_NIL:
                    continue
                head_id = head["@id"]
                head = graph_object[head_id]
                head = head[RDF_REST][0]
                list_.pop()
                list_nodes.pop()
            head.pop("@id", None)
            list_.reverse()
            head["@list"] = list_
            for ln in list_nodes:
                graph_object.pop(ln, None)

    # assemble (spec step 5)
    result: List[Any] = []
    for subject in sorted(default_graph.keys()):
        node = default_graph[subject]
        if subject in graph_map and subject != "@default":
            graph_nodes = []
            for s in sorted(graph_map[subject].keys()):
                n = graph_map[subject][s]
                n.pop("usages", None)
                if list(n.keys()) != ["@id"]:
                    graph_nodes.append(n)
            node["@graph"] = graph_nodes
        node.pop("usages", None)
        if list(node.keys()) != ["@id"]:
            result.append(node)
    return result

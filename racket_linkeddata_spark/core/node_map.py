"""Node Map Generation (JSON-LD 1.0 API §8.1) + blank-node issuer.

Reference: node-map-generation! (json-ld.rkt:2322-2487) and
make-blank-node-issuer (json-ld.rkt:2489-2507). The issuer is strictly
per-document state — under Spark every document gets its own issuer inside
the pandas-UDF batch, never a cluster-global counter, so ``_:b<N>`` labels
stay deterministic under any parallelism.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

from .context import JsonLdError


class BlankNodeIssuer:
    """Insertion-ordered label issuer (urdna2015.rkt:9-48,
    json-ld.rkt:2489-2507)."""

    def __init__(self, prefix: str = "_:b"):
        self.prefix = prefix
        self.counter = 0
        self.issued: Dict[str, str] = {}  # insertion-ordered (py3.7+ dict)

    def issue(self, old: Optional[str] = None) -> str:
        if old is not None and old in self.issued:
            return self.issued[old]
        new = f"{self.prefix}{self.counter}"
        self.counter += 1
        if old is not None:
            self.issued[old] = new
        return new

    def has_issued(self, old: str) -> bool:
        return old in self.issued

    def clone(self) -> "BlankNodeIssuer":
        out = BlankNodeIssuer(self.prefix)
        out.counter = self.counter
        out.issued = dict(self.issued)
        return out


def _is_blank_id(v: Any) -> bool:
    return isinstance(v, str) and v.startswith("_:")


def _strict_eq(a: Any, b: Any) -> bool:
    """JSON equality where booleans are distinct from numbers (Python's
    ``True == 1`` would wrongly dedup ``{"@value": true}`` vs ``{"@value": 1}``,
    cf. toRdf-0058/0076/0101 fixtures)."""
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(
            _strict_eq(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(map(_strict_eq, a, b))
    return a == b


def _append_unless_member(arr: List[Any], value: Any) -> None:
    """maybe-add-member! semantics (json-ld.rkt:2330-2335)."""
    if not any(_strict_eq(value, x) for x in arr):
        arr.append(value)


def generate_node_map(
    element: Any,
    node_map: Dict[str, Dict[str, Any]],
    issuer: BlankNodeIssuer,
    active_graph: str = "@default",
    active_subject: Union[None, str, Dict[str, Any]] = None,
    active_property: Optional[str] = None,
    list_: Optional[Dict[str, Any]] = None,
) -> None:
    """JSON-LD 1.0 Node Map Generation (json-ld.rkt:2322-2487).

    CONSUMED-INPUT CONTRACT: ``element`` (the expanded document) is
    treated as consumed — value objects are stored into the node map BY
    REFERENCE (the fast path below), so callers must not mutate the
    expanded document after calling this, and must not mutate the node
    map's values. Both flatten() and to_rdf() honor this (they only
    read); re-running either over the same expanded doc is safe and
    covered by tests (test_node_map_input_not_mutated). The reference
    deep-copies instead (json-ld.rkt:2581) at ~15% of per-document
    pipeline cost."""
    if isinstance(element, list):
        for item in element:
            generate_node_map(item, node_map, issuer, active_graph,
                              active_subject, active_property, list_)
        return

    graph = node_map.setdefault(active_graph, {})

    # value-object fast path: the most common element kind mutates
    # NOTHING unless its @type is a blank node (rare), so skip the
    # per-element dict copy. Storing the caller's dict is safe: node-map
    # values are never mutated after insertion, and every caller
    # (to_rdf/flatten) treats the expanded input as consumed
    # (json-ld.rkt:2581 deep-copies instead; profiling put that at ~15%
    # of the per-document pipeline, and the remaining copy-on-visit at
    # a few % more).
    if "@value" in element:
        t = element.get("@type")
        if t is not None and (
                _is_blank_id(t)
                or (isinstance(t, list) and any(map(_is_blank_id, t)))):
            element = dict(element)
            types = element["@type"]
            if isinstance(types, list):
                element["@type"] = [
                    issuer.issue(x) if _is_blank_id(x) else x
                    for x in types]
            else:
                element["@type"] = issuer.issue(types)
        if list_ is None:
            node = graph[active_subject]
            _append_unless_member(node.setdefault(active_property, []),
                                  element)
        else:
            list_["@list"].append(element)
        return

    # copy-on-visit for node/list objects: mutations below (pops, @type
    # rewrite) hit this shallow copy only.
    element = dict(element)

    if "@type" in element:
        types = element["@type"]
        if isinstance(types, list):
            element["@type"] = [
                issuer.issue(t) if _is_blank_id(t) else t for t in types]
        elif _is_blank_id(types):
            element["@type"] = issuer.issue(types)

    if "@list" in element:
        result: Dict[str, Any] = {"@list": []}
        generate_node_map(element["@list"], node_map, issuer, active_graph,
                          active_subject, active_property, result)
        if list_ is None:
            node = graph[active_subject]
            node.setdefault(active_property, []).append(result)
        else:
            list_["@list"].append(result)
        return

    # node object
    if "@id" in element:
        id_ = element.pop("@id")
        if _is_blank_id(id_):
            id_ = issuer.issue(id_)
    else:
        id_ = issuer.issue()

    node = graph.setdefault(id_, {"@id": id_})

    if isinstance(active_subject, dict):
        # reverse-property case: active_subject is a node reference
        _append_unless_member(node.setdefault(active_property, []),
                              active_subject)
    elif active_property is not None:
        reference = {"@id": id_}
        if list_ is None:
            subject_node = graph[active_subject]
            _append_unless_member(
                subject_node.setdefault(active_property, []), reference)
        else:
            list_["@list"].append(reference)

    if "@type" in element:
        for t in element.pop("@type"):
            _append_unless_member(node.setdefault("@type", []), t)

    if "@index" in element:
        index = element.pop("@index")
        if "@index" in node and node["@index"] != index:
            raise JsonLdError("conflicting indexes", id_)
        node["@index"] = index

    if "@reverse" in element:
        referenced_node = {"@id": id_}
        reverse_map = element.pop("@reverse")
        for prop, values in reverse_map.items():
            for value in values:
                generate_node_map(value, node_map, issuer, active_graph,
                                  referenced_node, prop)

    if "@graph" in element:
        generate_node_map(element.pop("@graph"), node_map, issuer,
                          active_graph=id_)

    for prop in sorted(element.keys()):
        value = element[prop]
        if prop == "@id":
            continue
        if _is_blank_id(prop):
            prop = issuer.issue(prop)
        node.setdefault(prop, [])
        generate_node_map(value, node_map, issuer, active_graph, id_, prop)


def build_node_map(expanded: List[Any]):
    """Run node-map generation over an expanded document.

    Same consumed-input contract as generate_node_map: the expanded doc
    is never mutated (copy-on-visit covers every mutation), but value
    objects are stored into the returned node map BY REFERENCE — don't
    mutate either structure afterwards (json-ld.rkt:2581 deep-copies to
    get the same guarantee; measured ~15% of per-doc pipeline cost).

    Returns (node_map, issuer); the issuer is reused for rdf:List bnode
    chains so labels never collide.
    """
    node_map: Dict[str, Dict[str, Any]] = {"@default": {}}
    issuer = BlankNodeIssuer()
    generate_node_map(expanded, node_map, issuer)
    return node_map, issuer

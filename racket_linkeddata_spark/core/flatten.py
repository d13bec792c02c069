"""JSON-LD 1.0 Flattening (§8; reference flatten-jsonld json-ld.rkt:2257-2318).

expansion -> node map -> sorted flat array; optional compaction epilogue.
Pinned by the flatten-* fixtures.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from .compact import compact as compact_jsonld
from .expand import expand
from .node_map import build_node_map


def flatten(
    document: Any,
    context: Any = None,
    *,
    base: Optional[str] = None,
    compact_arrays: bool = True,
    remote_contexts: Optional[Dict[str, Any]] = None,
) -> Any:
    expanded = expand(document, base=base, remote_contexts=remote_contexts)
    node_map, _ = build_node_map(expanded)

    default_graph = node_map["@default"]
    for graph_name in sorted(node_map.keys()):
        if graph_name == "@default":
            continue
        entry = default_graph.setdefault(graph_name, {"@id": graph_name})
        graph_entries = entry.setdefault("@graph", [])
        graph = node_map[graph_name]
        for node_id in sorted(graph.keys()):
            node = graph[node_id]
            if list(node.keys()) != ["@id"]:
                graph_entries.append(node)

    flattened: List[Any] = []
    for node_id in sorted(default_graph.keys()):
        node = default_graph[node_id]
        if list(node.keys()) != ["@id"]:
            flattened.append(node)

    if context is None:
        return flattened
    return compact_jsonld(flattened, context, base=base,
                          compact_arrays=compact_arrays,
                          remote_contexts=remote_contexts,
                          already_expanded=True)

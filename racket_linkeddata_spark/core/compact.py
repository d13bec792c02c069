"""JSON-LD 1.0 Compaction.

Reference: create-inverse-context (json-ld.rkt:1882-1971), term-selection
(json-ld.rkt:2237-2253), iri-compaction (json-ld.rkt:2024-2235),
compact-value (json-ld.rkt:1973-2022), compact-element (json-ld.rkt:1552-1834)
and the compact-jsonld entry (json-ld.rkt:1836-1880, whose epilogue follows
jsonld.py over the spec — the author's noted deviation at json-ld.rkt:1861-1870).
Pinned by the compact-* fixtures.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional
from urllib.parse import urlsplit

from .context import ActiveContext, JsonLdError, process_context
from .expand import expand

_NONE = "@none"


def _is_value(v: Any) -> bool:
    return isinstance(v, dict) and "@value" in v


def _is_list(v: Any) -> bool:
    return isinstance(v, dict) and "@list" in v


def _is_node_ref(v: Any) -> bool:
    return isinstance(v, dict) and list(v.keys()) == ["@id"]


def create_inverse_context(active: ActiveContext) -> Dict[str, Any]:
    """Inverse Context Creation (§6.4; json-ld.rkt:1882-1971): terms sorted
    shortest-then-lexicographic, iri -> container -> @language/@type -> term."""
    result: Dict[str, Any] = {}
    default_language = active.language if active.language is not None else _NONE
    for term in sorted(active.terms.keys(), key=lambda t: (len(t), t)):
        defn = active.terms[term]
        if defn is None:
            continue
        container = defn.get("@container") or _NONE
        iri = defn["@id"]
        container_map = result.setdefault(iri, {})
        tl_map = container_map.setdefault(
            container, {"@language": {}, "@type": {}})
        if defn.get("@reverse"):
            tl_map["@type"].setdefault("@reverse", term)
        elif "@type" in defn:
            tl_map["@type"].setdefault(defn["@type"], term)
        elif "@language" in defn:
            language = defn["@language"] or "@null"
            tl_map["@language"].setdefault(language, term)
        else:
            tl_map["@language"].setdefault(default_language, term)
            tl_map["@language"].setdefault(_NONE, term)
            tl_map["@type"].setdefault(_NONE, term)
    return result


def select_term(inverse: Dict[str, Any], iri: str, containers: List[str],
                type_language: str, preferred: List[str]) -> Optional[str]:
    """Term Selection (§6.6; json-ld.rkt:2237-2253)."""
    container_map = inverse.get(iri, {})
    for container in containers:
        if container not in container_map:
            continue
        tl_map = container_map[container][type_language]
        for item in preferred:
            if item in tl_map:
                return tl_map[item]
    return None


def _relativize(base: Optional[str], iri: str) -> str:
    """absolute->relative-url semantics (json-ld.rkt:347-352)."""
    if not base:
        return iri
    try:
        b, t = urlsplit(base), urlsplit(iri)
    except ValueError:
        return iri
    if b.scheme != t.scheme or b.netloc != t.netloc:
        return iri
    if b.path == t.path:
        if t.query != b.query:
            rel = ("?" + t.query) if t.query else ""
        else:
            rel = ""
        if t.fragment:
            return rel + "#" + t.fragment
        if rel:
            return rel
        # identical: relative form is the last path segment or ""
        tail = t.path.rsplit("/", 1)[-1]
        return tail + (("?" + t.query) if t.query else "") or iri
    base_dirs = b.path.split("/")[:-1]
    tgt_parts = t.path.split("/")
    i = 0
    while i < len(base_dirs) and i < len(tgt_parts) - 1 \
            and base_dirs[i] == tgt_parts[i]:
        i += 1
    ups = len(base_dirs) - i
    rel = "../" * ups + "/".join(tgt_parts[i:])
    if not rel:
        rel = "./"
    if t.query:
        rel += "?" + t.query
    if t.fragment:
        rel += "#" + t.fragment
    return rel


def compact_iri(
    active: ActiveContext,
    inverse: Dict[str, Any],
    iri: Optional[str],
    value: Any = None,
    vocab: bool = False,
    reverse: bool = False,
) -> Optional[str]:
    """IRI Compaction (§6.5; json-ld.rkt:2024-2235)."""
    if iri is None:
        return None

    if vocab and iri in inverse:
        default_language = (active.language
                            if active.language is not None else _NONE)
        containers: List[str] = []
        type_language = "@language"
        type_language_value = "@null"

        if isinstance(value, dict) and "@index" in value:
            containers.append("@index")

        if reverse:
            type_language = "@type"
            type_language_value = "@reverse"
            containers.append("@set")
        elif _is_list(value):
            if "@index" not in value:
                containers.append("@list")
            list_ = value["@list"]
            common_language = default_language if not list_ else None
            common_type = None
            for item in list_:
                item_language, item_type = _NONE, _NONE
                if _is_value(item):
                    if "@language" in item:
                        item_language = item["@language"]
                    elif "@type" in item:
                        item_type = item["@type"]
                    else:
                        item_language = "@null"
                else:
                    item_type = "@id"
                if common_language is None:
                    common_language = item_language
                elif common_language != item_language and _is_value(item):
                    common_language = _NONE
                if common_type is None:
                    common_type = item_type
                elif common_type != item_type:
                    common_type = _NONE
                if common_language == _NONE and common_type == _NONE:
                    break
            common_language = common_language or _NONE
            common_type = common_type or _NONE
            if common_type != _NONE:
                type_language = "@type"
                type_language_value = common_type
            else:
                type_language_value = common_language
        else:
            if _is_value(value):
                if "@language" in value and "@index" not in value:
                    type_language_value = value["@language"]
                    containers.append("@language")
                elif "@type" in value:
                    type_language_value = value["@type"]
                    type_language = "@type"
            else:
                type_language = "@type"
                type_language_value = "@id"
            containers.append("@set")

        containers.append(_NONE)
        preferred: List[str] = []
        if type_language_value == "@reverse":
            preferred.append("@reverse")
        if type_language_value in ("@id", "@reverse") \
                and isinstance(value, dict) and "@id" in value:
            candidate = compact_iri(active, inverse, value["@id"],
                                    vocab=True)
            cand_def = active.terms.get(candidate)
            if cand_def is not None and cand_def.get("@id") == value["@id"]:
                preferred.extend(["@vocab", "@id", _NONE])
            else:
                preferred.extend(["@id", "@vocab", _NONE])
        else:
            preferred.extend([type_language_value, _NONE])
        term = select_term(inverse, iri, containers, type_language, preferred)
        if term is not None:
            return term

    if vocab and active.vocab is not None and iri.startswith(active.vocab) \
            and len(iri) > len(active.vocab):
        suffix = iri[len(active.vocab):]
        if suffix not in active.terms:
            return suffix

    # CURIE candidates (shortest, then lexicographically least)
    candidate: Optional[str] = None
    for term, defn in active.terms.items():
        if ":" in term or defn is None:
            continue
        term_iri = defn["@id"]
        if term_iri == iri or not iri.startswith(term_iri):
            continue
        curie = term + ":" + iri[len(term_iri):]
        curie_ok = (curie not in active.terms
                    or (value is None
                        and (active.terms[curie] or {}).get("@id") == iri))
        if curie_ok and (candidate is None or len(curie) < len(candidate)
                         or (len(curie) == len(candidate)
                             and curie < candidate)):
            candidate = curie
    if candidate is not None:
        return candidate

    if not vocab:
        return _relativize(active.base, iri)
    return iri


def compact_value(active: ActiveContext, inverse: Dict[str, Any],
                  active_property: Optional[str], value: Dict[str, Any]) -> Any:
    """Value Compaction (§7.2; json-ld.rkt:1973-2022)."""
    term = active.terms.get(active_property) if active_property else None
    term = term or {}
    container = term.get("@container")
    type_mapping = term.get("@type")
    language_mapping = term.get("@language", "missing")

    if "@id" in value and "@value" not in value:
        if not _is_node_ref(value):
            return value
        if type_mapping == "@id":
            return compact_iri(active, inverse, value["@id"])
        if type_mapping == "@vocab":
            return compact_iri(active, inverse, value["@id"], vocab=True)
        return value

    number_members = len(value)
    if "@index" in value and container == "@index":
        number_members -= 1
    if number_members > 2:
        return value
    if number_members == 2:
        if "@type" in value and value["@type"] == type_mapping:
            return value["@value"]
        if "@language" in value:
            effective_language = (language_mapping
                                  if language_mapping != "missing"
                                  else active.language)
            if value["@language"] == effective_language:
                return value["@value"]
        return value
    # only @value (+ ignorable @index)
    v = value["@value"]
    if not isinstance(v, str):
        # numbers/booleans never pick up language; safe unless typed term
        if type_mapping is None or type_mapping in ("@id", "@vocab"):
            return v
        return value
    if language_mapping != "missing" and language_mapping is None:
        return v
    if active.language is None and language_mapping == "missing" \
            and type_mapping is None:
        return v
    if type_mapping not in (None, "@id", "@vocab"):
        # term expects a type this plain string doesn't carry
        return value
    if language_mapping == "missing" and active.language is not None:
        return value
    return v


def compact_element(
    active: ActiveContext,
    inverse: Dict[str, Any],
    active_property: Optional[str],
    element: Any,
    compact_arrays: bool = True,
) -> Any:
    """Compaction Algorithm (§7.1; json-ld.rkt:1552-1834)."""
    if element is None or not isinstance(element, (dict, list)):
        return element

    term = active.terms.get(active_property) if active_property else None
    container = (term or {}).get("@container")

    if isinstance(element, list):
        result: List[Any] = []
        for item in element:
            compacted = compact_element(active, inverse, active_property,
                                        item, compact_arrays)
            if compacted is not None:
                result.append(compacted)
        if len(result) == 1 and compact_arrays \
                and container not in ("@list", "@set"):
            return result[0]
        return result

    if "@value" in element or _is_node_ref(element):
        compacted = compact_value(active, inverse, active_property, element)
        if not isinstance(compacted, (dict, list)):
            return compacted
        element = compacted if isinstance(compacted, dict) else element

    inside_reverse = active_property == "@reverse"
    result_obj: Dict[str, Any] = {}

    for key in sorted(element.keys()):
        value = element[key]

        if key in ("@id", "@type"):
            if isinstance(value, str):
                compacted_value: Any = compact_iri(
                    active, inverse, value, vocab=(key == "@type"))
            else:
                compacted_value = [
                    compact_iri(active, inverse, v, vocab=True)
                    for v in value]
                if len(compacted_value) == 1:
                    compacted_value = compacted_value[0]
            alias = compact_iri(active, inverse, key, vocab=True)
            result_obj[alias] = compacted_value
            continue

        if key == "@reverse":
            compacted_value = compact_element(active, inverse, "@reverse",
                                              value, compact_arrays)
            if isinstance(compacted_value, dict):
                for prop in list(compacted_value.keys()):
                    prop_def = active.terms.get(prop)
                    if prop_def and prop_def.get("@reverse"):
                        prop_value = compacted_value.pop(prop)
                        use_array = (prop_def.get("@container") == "@set"
                                     or not compact_arrays)
                        if use_array and not isinstance(prop_value, list):
                            prop_value = [prop_value]
                        if prop in result_obj:
                            existing = result_obj[prop]
                            if not isinstance(existing, list):
                                existing = [existing]
                            existing.extend(
                                prop_value if isinstance(prop_value, list)
                                else [prop_value])
                            result_obj[prop] = existing
                        else:
                            result_obj[prop] = prop_value
                if compacted_value:
                    alias = compact_iri(active, inverse, "@reverse",
                                        vocab=True)
                    result_obj[alias] = compacted_value
            continue

        if key == "@preserve":
            # framing default marker: compact the preserved value against
            # the same active property, keep the wrapper for the framing
            # post-pass to resolve
            result_obj["@preserve"] = compact_element(
                active, inverse, active_property, value, compact_arrays)
            continue

        if key == "@index" and container == "@index":
            continue

        if key in ("@index", "@value", "@language"):
            alias = compact_iri(active, inverse, key, vocab=True)
            result_obj[alias] = value
            continue

        if value == []:
            item_active_property = compact_iri(
                active, inverse, key, value=value, vocab=True,
                reverse=inside_reverse)
            if item_active_property not in result_obj:
                result_obj[item_active_property] = []
            elif not isinstance(result_obj[item_active_property], list):
                result_obj[item_active_property] = [
                    result_obj[item_active_property]]

        for expanded_item in value:
            item_active_property = compact_iri(
                active, inverse, key, value=expanded_item, vocab=True,
                reverse=inside_reverse)
            item_term = active.terms.get(item_active_property) or {}
            item_container = item_term.get("@container")

            if _is_list(expanded_item):
                compacted_item = compact_element(
                    active, inverse, item_active_property,
                    expanded_item["@list"], compact_arrays)
                if not isinstance(compacted_item, list):
                    compacted_item = [compacted_item]
                if item_container != "@list":
                    list_alias = compact_iri(active, inverse, "@list",
                                             vocab=True)
                    wrapped = {list_alias: compacted_item}
                    if "@index" in expanded_item:
                        index_alias = compact_iri(active, inverse, "@index",
                                                  vocab=True)
                        wrapped[index_alias] = expanded_item["@index"]
                    compacted_item = wrapped
                elif item_active_property in result_obj:
                    raise JsonLdError("compaction to list of lists",
                                      item_active_property)
            else:
                compacted_item = compact_element(
                    active, inverse, item_active_property, expanded_item,
                    compact_arrays)

            if item_container in ("@language", "@index"):
                map_object = result_obj.setdefault(item_active_property, {})
                if item_container == "@language" \
                        and isinstance(compacted_item, dict) \
                        and "@value" in compacted_item:
                    compacted_item = compacted_item["@value"]
                map_key = expanded_item[item_container]
                if map_key in map_object:
                    existing = map_object[map_key]
                    if not isinstance(existing, list):
                        map_object[map_key] = [existing]
                    map_object[map_key].append(compacted_item)
                else:
                    map_object[map_key] = compacted_item
            else:
                as_array = (not compact_arrays
                            or item_container in ("@set", "@list")
                            or key in ("@list", "@graph"))
                if as_array and not isinstance(compacted_item, list):
                    compacted_item = [compacted_item]
                if item_active_property in result_obj:
                    existing = result_obj[item_active_property]
                    if not isinstance(existing, list):
                        existing = [existing]
                    existing.extend(
                        compacted_item if isinstance(compacted_item, list)
                        else [compacted_item])
                    result_obj[item_active_property] = existing
                else:
                    result_obj[item_active_property] = compacted_item

    return result_obj


def compact(
    document: Any,
    context: Any,
    *,
    base: Optional[str] = None,
    compact_arrays: bool = True,
    remote_contexts: Optional[Dict[str, Any]] = None,
    already_expanded: bool = False,
    force_graph: bool = False,
) -> Dict[str, Any]:
    """Entry point (json-ld.rkt:1836-1880): expand-then-compact, epilogue
    follows jsonld.py (singleton unwrap, @graph wrap, re-attach @context).
    ``force_graph`` always wraps the result in an arrayed @graph (framing)."""
    if already_expanded:
        expanded = document
    else:
        expanded = expand(document, base=base, remote_contexts=remote_contexts)
    ctx = context
    if isinstance(ctx, dict) and "@context" in ctx:
        ctx = ctx["@context"]
    active = process_context(ActiveContext(base), ctx, remote_contexts)
    inverse = create_inverse_context(active)
    compacted = compact_element(active, inverse, None, expanded,
                                compact_arrays)
    graph_alias = compact_iri(active, inverse, "@graph", vocab=True)
    if force_graph:
        if compacted is None:
            compacted = []
        if not isinstance(compacted, list):
            compacted = [compacted]
        compacted = {graph_alias: compacted}
    elif compacted is None:
        compacted = {}
    elif isinstance(compacted, list):
        if not compacted:
            compacted = {}
        else:
            compacted = {graph_alias: compacted}
    if ctx and compacted != {}:
        if isinstance(ctx, (dict, list)) and not ctx:
            pass
        else:
            compacted = {"@context": ctx, **compacted}
    return compacted

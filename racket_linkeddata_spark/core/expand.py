"""JSON-LD 1.0 Expansion algorithm.

Reference: expand-element / expand-json-object / expand-json-array
(json-ld.rkt:956-1442) and value-expansion (json-ld.rkt:1486-1546);
entry point expand-jsonld (json-ld.rkt:1444-1481). Pinned by the
expand-* fixtures of the vendored json-ld.org suite.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from .context import (
    KEYWORDS as _KEYWORDS,
    ActiveContext,
    JsonLdError,
    expand_iri,
    is_absolute_iri,
    is_keyword,
    process_context_cached,
)


def _is_list_object(v: Any) -> bool:
    return isinstance(v, dict) and "@list" in v


def _is_value_object(v: Any) -> bool:
    return isinstance(v, dict) and "@value" in v


def _as_array(v: Any) -> List[Any]:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def value_expansion(active: ActiveContext, active_prop: str, value: Any) -> Any:
    """Value Expansion (JSON-LD 1.0 API §7.2; json-ld.rkt:1486-1546)."""
    term = active.term(active_prop)
    type_mapping = term.get("@type") if term else None
    if type_mapping == "@id" and isinstance(value, str):
        return {"@id": expand_iri(active, value, document_relative=True)}
    if type_mapping == "@vocab" and isinstance(value, str):
        return {"@id": expand_iri(active, value, vocab=True,
                                  document_relative=True)}
    result: Dict[str, Any] = {"@value": value}
    if type_mapping is not None and type_mapping not in ("@id", "@vocab"):
        result["@type"] = type_mapping
    elif isinstance(value, str):
        if term is not None and "@language" in term:
            language = term["@language"]
            if language is not None:
                result["@language"] = language
        elif active.language is not None:
            result["@language"] = active.language
    return result


_FRAME_KEYWORDS = ("@default", "@embed", "@explicit", "@omitDefault")


def expand_element(
    active: ActiveContext,
    active_prop: Optional[str],
    element: Any,
    remote_contexts: Optional[Dict[str, Any]] = None,
    frame_expansion: bool = False,
) -> Any:
    """Expansion Algorithm (JSON-LD 1.0 API §7.1; json-ld.rkt:956-1442).

    ``frame_expansion`` keeps the framing keywords (@default/@embed/
    @explicit/@omitDefault) and free-floating nodes, per the framing
    algorithm's expansion mode.
    """
    if element is None:
        return None

    ec = element.__class__
    if ec is not dict and ec is not list:
        if not isinstance(element, (dict, list)):  # scalar
            if active_prop is None or active_prop == "@graph":
                return None
            return value_expansion(active, active_prop, element)

    if ec is list or isinstance(element, list):
        # container lookup only matters for the list-of-lists guard
        prop_term = active.term(active_prop) if active_prop else None
        prop_container = prop_term.get("@container") if prop_term else None
        result: List[Any] = []
        for item in element:
            expanded = expand_element(active, active_prop, item,
                                      remote_contexts,
                                      frame_expansion)
            if active_prop == "@list" or prop_container == "@list":
                if isinstance(expanded, list) or _is_list_object(expanded):
                    raise JsonLdError("list of lists", str(active_prop))
            if isinstance(expanded, list):
                result.extend(expanded)
            elif expanded is not None:
                result.append(expanded)
        return result

    # element is a JSON object
    if "@context" in element:
        active = process_context_cached(active, element["@context"],
                                        remote_contexts)

    result_obj: Dict[str, Any] = {}
    for key in sorted(element.keys()):
        value = element[key]
        if key == "@context":
            continue
        expanded_property = expand_iri(active, key, vocab=True)
        if frame_expansion and expanded_property in _FRAME_KEYWORDS:
            if expanded_property == "@default":
                dv = expand_element(active, active_prop, value,
                                    remote_contexts, frame_expansion)
                result_obj["@default"] = _as_array(dv)
            else:
                result_obj[expanded_property] = value
            continue
        if expanded_property is None:
            continue
        # one membership test instead of two is_keyword() calls
        # (expanded_property is always a str here)
        is_kw = expanded_property in _KEYWORDS
        if not (is_kw or ":" in expanded_property):
            continue

        if is_kw:
            if active_prop == "@reverse":
                raise JsonLdError("invalid reverse property map", key)
            if expanded_property in result_obj:
                raise JsonLdError("colliding keywords", expanded_property)

            if expanded_property == "@id":
                if not isinstance(value, str):
                    raise JsonLdError("invalid @id value", repr(value))
                expanded_value: Any = expand_iri(active, value,
                                                 document_relative=True)
            elif expanded_property == "@type":
                if frame_expansion and isinstance(value, dict) \
                        and not value:
                    expanded_value = [{}]  # wildcard type filter (framing)
                elif isinstance(value, str):
                    expanded_value = expand_iri(active, value, vocab=True,
                                                document_relative=True)
                elif isinstance(value, list) and all(
                        isinstance(v, str) for v in value):
                    expanded_value = [
                        expand_iri(active, v, vocab=True,
                                   document_relative=True) for v in value]
                else:
                    raise JsonLdError("invalid type value", repr(value))
            elif expanded_property == "@graph":
                expanded_value = _as_array(
                    expand_element(active, "@graph", value, remote_contexts,
                    frame_expansion))
            elif expanded_property == "@value":
                if value is not None and isinstance(value, (dict, list)):
                    raise JsonLdError("invalid value object value",
                                      repr(value))
                expanded_value = value
                if expanded_value is None:
                    result_obj["@value"] = None
                    continue
            elif expanded_property == "@language":
                if not isinstance(value, str):
                    raise JsonLdError("invalid language-tagged string",
                                      repr(value))
                expanded_value = value.lower()
            elif expanded_property == "@index":
                if not isinstance(value, str):
                    raise JsonLdError("invalid @index value", repr(value))
                expanded_value = value
            elif expanded_property == "@list":
                if active_prop is None or active_prop == "@graph":
                    continue  # drop free-floating list
                expanded_value = _as_array(
                    expand_element(active, active_prop, value,
                                   remote_contexts,
                                   frame_expansion))
                for item in expanded_value:
                    if _is_list_object(item):
                        raise JsonLdError("list of lists", key)
            elif expanded_property == "@set":
                expanded_value = expand_element(active, active_prop, value,
                                                remote_contexts,
                                                frame_expansion)
            elif expanded_property == "@reverse":
                if not isinstance(value, dict):
                    raise JsonLdError("invalid @reverse value", repr(value))
                expanded_value = expand_element(active, "@reverse", value,
                                                remote_contexts,
                                                frame_expansion)
                if isinstance(expanded_value, dict):
                    if "@reverse" in expanded_value:
                        for prop, items in expanded_value["@reverse"].items():
                            result_obj.setdefault(prop, []).extend(
                                _as_array(items))
                    rest = {k: v for k, v in expanded_value.items()
                            if k != "@reverse"}
                    if rest:
                        reverse_map = result_obj.setdefault("@reverse", {})
                        for prop, items in rest.items():
                            for item in _as_array(items):
                                if _is_value_object(item) \
                                        or _is_list_object(item):
                                    raise JsonLdError(
                                        "invalid reverse property value",
                                        prop)
                                reverse_map.setdefault(prop, []).append(item)
                continue
            else:
                expanded_value = expand_element(active, active_prop, value,
                                                remote_contexts,
                                                frame_expansion)

            if expanded_value is not None or expanded_property == "@value":
                result_obj[expanded_property] = expanded_value
            continue

        # non-keyword property
        term = active.term(key)
        container = term.get("@container") if term else None

        if container == "@language" and isinstance(value, dict):
            expanded_value = []
            for language in sorted(value.keys()):
                language_value = value[language]
                for item in _as_array(language_value):
                    if item is None:
                        continue
                    if not isinstance(item, str):
                        raise JsonLdError("invalid language map value",
                                          repr(item))
                    expanded_value.append(
                        {"@value": item, "@language": language.lower()})
        elif container == "@index" and isinstance(value, dict):
            expanded_value = []
            for index in sorted(value.keys()):
                index_value = _as_array(value[index])
                index_value = expand_element(active, key, index_value,
                                             remote_contexts,
                                             frame_expansion)
                for item in index_value:
                    if "@index" not in item:
                        item = dict(item)
                        item["@index"] = index
                    expanded_value.append(item)
        else:
            expanded_value = expand_element(active, key, value,
                                            remote_contexts,
                                            frame_expansion)

        if expanded_value is None:
            continue

        if container == "@list" and not _is_list_object(expanded_value):
            expanded_value = {"@list": _as_array(expanded_value)}

        if term and term.get("@reverse"):
            reverse_map = result_obj.setdefault("@reverse", {})
            for item in _as_array(expanded_value):
                if _is_value_object(item) or _is_list_object(item):
                    raise JsonLdError("invalid reverse property value", key)
                reverse_map.setdefault(expanded_property, []).append(item)
        else:
            result_obj.setdefault(expanded_property, []).extend(
                _as_array(expanded_value))

    # --- post-processing (spec §7.1 steps 8-12) ---
    if "@value" in result_obj:
        allowed = {"@value", "@language", "@type", "@index"}
        if not set(result_obj) <= allowed or (
                "@language" in result_obj and "@type" in result_obj):
            raise JsonLdError("invalid value object", repr(result_obj))
        if result_obj["@value"] is None:
            return None
        if not isinstance(result_obj["@value"], str) \
                and "@language" in result_obj:
            raise JsonLdError("invalid language-tagged value",
                              repr(result_obj))
        if "@type" in result_obj and not is_absolute_iri(result_obj["@type"]):
            raise JsonLdError("invalid typed value", repr(result_obj))
    elif "@type" in result_obj and not isinstance(result_obj["@type"], list):
        result_obj["@type"] = [result_obj["@type"]]
    elif "@set" in result_obj or "@list" in result_obj:
        if len(result_obj) > (2 if "@index" in result_obj else 1):
            raise JsonLdError("invalid set or list object", repr(result_obj))
        if "@set" in result_obj:
            return result_obj["@set"]
    if isinstance(result_obj, dict) and list(result_obj) == ["@language"]:
        return None

    if (active_prop is None or active_prop == "@graph") \
            and not frame_expansion:
        if isinstance(result_obj, dict) and (
                not result_obj
                or "@value" in result_obj or "@list" in result_obj):
            return None
        if isinstance(result_obj, dict) and list(result_obj) == ["@id"]:
            return None
    return result_obj


def expand(
    document: Any,
    *,
    base: Optional[str] = None,
    expand_context: Any = None,
    remote_contexts: Optional[Dict[str, Any]] = None,
    frame_expansion: bool = False,
) -> List[Any]:
    """Entry point (json-ld.rkt:1444-1481): seed context, expand, unwrap
    a lone top-level @graph, arrayify."""
    active = ActiveContext(base)
    if expand_context is not None:
        ctx = expand_context
        if isinstance(ctx, dict) and "@context" in ctx:
            ctx = ctx["@context"]
        active = process_context_cached(active, ctx, remote_contexts)
    expanded = expand_element(active, None, document, remote_contexts,
                              frame_expansion)
    if isinstance(expanded, dict) and list(expanded) == ["@graph"]:
        expanded = expanded["@graph"]
    if expanded is None:
        return []
    return expanded if isinstance(expanded, list) else [expanded]

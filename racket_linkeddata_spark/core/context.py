"""JSON-LD 1.0 active-context machinery.

Implements the Context Processing, Create Term Definition and IRI Expansion
algorithms of the JSON-LD 1.0 API spec. Semantics pinned by the reference
(process-context json-ld.rkt:433-612, create-term-definition
json-ld.rkt:618-850, iri-expansion json-ld.rkt:859-949) and by the vendored
json-ld.org test suite; error-code strings are the spec names that
error-manifest.jsonld expects.

Remote contexts are resolved through an in-memory dict loader (the pinned
``#:url-map`` mode of the reference's simple-context-loader,
json-ld.rkt:84-117) — no network I/O; on Spark executors the dict is a
broadcast variable.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Union
from urllib.parse import urljoin, urlsplit, urlunsplit

KEYWORDS = frozenset({
    "@base", "@context", "@container", "@graph", "@id", "@index",
    "@language", "@list", "@reverse", "@set", "@type", "@value", "@vocab",
})


class JsonLdError(ValueError):
    """JSON-LD processing error; ``code`` is the spec error-name string."""

    def __init__(self, code: str, detail: str = ""):
        super().__init__(f"{code}: {detail}" if detail else code)
        self.code = code


def is_keyword(value: Any) -> bool:
    return isinstance(value, str) and value in KEYWORDS


_ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")
_ABS_MEMO: dict = {}
_ABS_MEMO_CAP = 65536  # bounded: vocab terms/predicates repeat across
# millions of docs, but unique per-doc subjects must not grow it forever


def is_absolute_iri(value: Any) -> bool:
    """Has a scheme and is not a blank-node id (json-ld.rkt:179-193).
    Memoized (bounded): called per predicate/subject per quad in the
    node-map→RDF hot path, and the regex dominates the check."""
    if value.__class__ is not str:
        return isinstance(value, str) and not value.startswith("_:") \
            and bool(_ABS_IRI_RE.match(value))
    r = _ABS_MEMO.get(value)
    if r is None:
        r = (not value.startswith("_:")
             and _ABS_IRI_RE.match(value) is not None)
        if len(_ABS_MEMO) < _ABS_MEMO_CAP:
            _ABS_MEMO[value] = r
    return r


def is_blank_node_id(value: Any) -> bool:
    return isinstance(value, str) and value.startswith("_:")


def resolve_iri(base: Optional[str], relative: str) -> str:
    """RFC 3986 resolution (reference: combine-url/relative wrapper,
    json-ld.rkt:195-204)."""
    if is_absolute_iri(relative) or relative.startswith("_:"):
        return relative
    if not base:
        return relative
    try:
        parts = urlsplit(base)
    except ValueError:
        return relative
    if parts.scheme and not parts.netloc and not parts.path.startswith("/"):
        # opaque base (tag:, urn:) — urljoin mishandles; do minimal joining
        if relative.startswith("#"):
            return base.split("#", 1)[0] + relative
        if relative.startswith("?"):
            return base.split("#", 1)[0].split("?", 1)[0] + relative
        if relative == "":
            return base.split("#", 1)[0]
        return relative
    joined = urljoin(base, relative)
    if relative == "" or relative.startswith("#"):
        return joined
    # urljoin skips RFC 3986 remove_dot_segments for network-path refs
    try:
        sp = urlsplit(joined)
    except ValueError:
        return joined
    if "." in sp.path:
        return urlunsplit(sp._replace(path=_remove_dot_segments(sp.path)))
    return joined


class BaseResolver:
    """Per-document IRI resolver: same semantics as ``resolve_iri(base,
    rel)`` with the base fixed, plus O(1) fast paths for the reference
    patterns that dominate html attribute markup (``#frag``, ``""``,
    path-absolute ``/p``) — the general case delegates to resolve_iri.
    Used by the RDFa/microdata front ends where urlsplit-per-attribute
    was ~16% of per-document cost."""

    __slots__ = ("base", "_fast", "_origin")

    def __init__(self, base: str):
        self.base = base
        # fast paths are exact only for a fragment-free hierarchical
        # base (page urls in practice); anything else takes the general
        # path, including opaque bases (tag:, urn:)
        self._fast = "#" not in base
        self._origin = None
        try:
            p = urlsplit(base)
            if p.scheme and p.netloc:
                self._origin = f"{p.scheme}://{p.netloc}"
        except ValueError:
            pass

    def resolve(self, relative: str) -> str:
        if self._fast:
            # bare "#" excluded: urljoin (and so resolve_iri) drops it
            if (relative.startswith("#") and len(relative) > 1) \
                    or relative == "":
                return self.base + relative
            if (self._origin is not None and relative.startswith("/")
                    and not relative.startswith("//")
                    and "." not in relative):
                return self._origin + relative
        return resolve_iri(self.base, relative)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    output: list = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if output:
                output.pop()
        elif path == "/..":
            path = "/"
            if output:
                output.pop()
        elif path in (".", ".."):
            path = ""
        else:
            cut = path.find("/", 1)
            if cut == -1:
                output.append(path)
                path = ""
            else:
                output.append(path[:cut])
                path = path[cut:]
    return "".join(output)


class ActiveContext:
    """Mutable-by-copy active context (reference struct json-ld.rkt:38-55)."""

    __slots__ = ("base", "doc_base", "vocab", "language", "terms", "inverse",
                 "_key_cache")

    def __init__(self, base: Optional[str] = None):
        self.base: Optional[str] = base
        self.doc_base: Optional[str] = base  # original document base (options)
        self.vocab: Optional[str] = None
        self.language: Optional[str] = None
        # term -> definition dict or None (explicit null mapping)
        self.terms: Dict[str, Optional[Dict[str, Any]]] = {}
        self.inverse: Optional[Dict[str, Any]] = None  # built lazily (compaction)

    def copy(self) -> "ActiveContext":
        out = ActiveContext(self.base)
        out.doc_base = self.doc_base
        out.vocab = self.vocab
        out.language = self.language
        out.terms = dict(self.terms)
        return out

    # convenience accessors used by expansion/compaction
    def term(self, name: str) -> Optional[Dict[str, Any]]:
        return self.terms.get(name)

    def container(self, name: str) -> Optional[str]:
        d = self.terms.get(name)
        return d.get("@container") if d else None


LocalContext = Union[None, str, Dict[str, Any], List[Any]]

# --- processed-context memo (per-worker) -----------------------------------
# Web-scale reality: millions of pages share a handful of contexts
# (schema.org etc.), and context processing dominates the expansion
# profile. Results are cached keyed by the serialized local context and
# only when the incoming active context is pristine (fresh document) and
# the context never touches @base (document-relative state). Cached
# ActiveContexts are treated as immutable; per-document base is fixed up
# on a shared-terms clone.

_CTX_MEMO: Dict[Any, "ActiveContext"] = {}
_CTX_MEMO_MAX = 512


def _mentions_base(local: Any) -> bool:
    if isinstance(local, dict):
        return "@base" in local
    if isinstance(local, list):
        return any(_mentions_base(c) for c in local)
    return isinstance(local, str)  # remote refs: bypass (loader-dependent)


def process_context_cached(
    active: "ActiveContext",
    local: LocalContext,
    remote_contexts: Optional[Dict[str, Any]] = None,
) -> "ActiveContext":
    """process_context with memoization for the pristine-context fast path."""
    if active.terms or active.vocab is not None \
            or active.language is not None or _mentions_base(local):
        return process_context(active, local, remote_contexts)
    import json as _json

    try:
        key = (_json.dumps(local, sort_keys=True), id(remote_contexts))
    except (TypeError, ValueError):
        return process_context(active, local, remote_contexts)
    cached = _CTX_MEMO.get(key)
    if cached is None:
        cached = process_context(ActiveContext(None), local, remote_contexts)
        if len(_CTX_MEMO) >= _CTX_MEMO_MAX:
            _CTX_MEMO.clear()
        _CTX_MEMO[key] = cached
    out = ActiveContext(active.base)
    out.doc_base = active.doc_base
    out.vocab = cached.vocab
    out.language = cached.language
    out.terms = cached.terms  # shared: never mutated after processing
    if cached.base is not None:  # context set an absolute @base (bypassed
        out.base = cached.base   # today, kept for safety)
    return out


def process_context(
    active: ActiveContext,
    local: LocalContext,
    remote_contexts: Optional[Dict[str, Any]] = None,
    *,
    base: Optional[str] = None,
    _visited: Optional[frozenset] = None,
) -> ActiveContext:
    """Context Processing Algorithm (JSON-LD 1.0 API §6.1;
    reference json-ld.rkt:433-612)."""
    result = active.copy()
    contexts = local if isinstance(local, list) else [local]
    visited = _visited or frozenset()

    for ctx in contexts:
        if ctx is None:
            # reset to the *document* base, not any @base-overwritten value
            # (expand-0060: "context completely reset")
            fresh = ActiveContext(active.doc_base)
            result = fresh
            continue
        if isinstance(ctx, str):
            url = resolve_iri(result.base or base, ctx)
            if url in visited:
                raise JsonLdError("recursive context inclusion", url)
            if remote_contexts is None or url not in remote_contexts:
                raise JsonLdError("loading remote context failed", url)
            remote_doc = remote_contexts[url]
            if not isinstance(remote_doc, dict) or "@context" not in remote_doc:
                raise JsonLdError("invalid remote context", url)
            result = process_context(
                result, remote_doc["@context"], remote_contexts,
                base=url, _visited=visited | {url})
            continue
        if not isinstance(ctx, dict):
            raise JsonLdError("invalid local context", repr(ctx))

        if "@base" in ctx and not visited:
            value = ctx["@base"]
            if value is None:
                result.base = None
            elif isinstance(value, str) and is_absolute_iri(value):
                result.base = value
            elif isinstance(value, str) and result.base is not None:
                result.base = resolve_iri(result.base, value)
            else:
                raise JsonLdError("invalid base IRI", repr(value))

        if "@vocab" in ctx:
            value = ctx["@vocab"]
            if value is None:
                result.vocab = None
            elif isinstance(value, str) and (is_absolute_iri(value)
                                             or is_blank_node_id(value)):
                result.vocab = value
            else:
                raise JsonLdError("invalid vocab mapping", repr(value))

        if "@language" in ctx:
            value = ctx["@language"]
            if value is None:
                result.language = None
            elif isinstance(value, str):
                result.language = value.lower()
            else:
                raise JsonLdError("invalid default language", repr(value))

        defined: Dict[str, bool] = {}
        for term in ctx:
            if term in ("@base", "@vocab", "@language"):
                continue
            create_term_definition(result, ctx, term, defined)
    return result


def create_term_definition(
    active: ActiveContext,
    local_ctx: Dict[str, Any],
    term: str,
    defined: Dict[str, bool],
) -> None:
    """Create Term Definition (JSON-LD 1.0 API §6.2;
    reference json-ld.rkt:618-850)."""
    if term in defined:
        if defined[term]:
            return
        raise JsonLdError("cyclic IRI mapping", term)
    defined[term] = False

    if is_keyword(term):
        raise JsonLdError("keyword redefinition", term)

    active.terms.pop(term, None)
    value = local_ctx[term]

    if value is None or (isinstance(value, dict)
                         and value.get("@id", "missing") is None):
        active.terms[term] = None
        defined[term] = True
        return

    if isinstance(value, str):
        value = {"@id": value}
    if not isinstance(value, dict):
        raise JsonLdError("invalid term definition", term)

    definition: Dict[str, Any] = {"@reverse": False}

    if "@type" in value:
        type_ = value["@type"]
        if not isinstance(type_, str):
            raise JsonLdError("invalid type mapping", term)
        type_ = expand_iri(active, type_, vocab=True,
                           local_ctx=local_ctx, defined=defined)
        if type_ not in ("@id", "@vocab") and not is_absolute_iri(type_):
            raise JsonLdError("invalid type mapping", term)
        definition["@type"] = type_

    if "@reverse" in value:
        if "@id" in value:
            raise JsonLdError("invalid reverse property", term)
        rev = value["@reverse"]
        if not isinstance(rev, str):
            raise JsonLdError("invalid IRI mapping", term)
        iri = expand_iri(active, rev, vocab=True,
                         local_ctx=local_ctx, defined=defined)
        if not (is_absolute_iri(iri) or is_blank_node_id(iri)):
            raise JsonLdError("invalid IRI mapping", term)
        definition["@id"] = iri
        if "@container" in value:
            container = value["@container"]
            if container not in ("@set", "@index", None):
                raise JsonLdError("invalid reverse property", term)
            definition["@container"] = container
        definition["@reverse"] = True
        active.terms[term] = definition
        defined[term] = True
        return

    if "@id" in value and value["@id"] != term:
        id_ = value["@id"]
        if not isinstance(id_, str):
            raise JsonLdError("invalid IRI mapping", term)
        iri = expand_iri(active, id_, vocab=True,
                         local_ctx=local_ctx, defined=defined)
        if not (is_keyword(iri) or is_absolute_iri(iri)
                or is_blank_node_id(iri)):
            raise JsonLdError("invalid IRI mapping", term)
        if iri == "@context":
            raise JsonLdError("invalid keyword alias", term)
        definition["@id"] = iri
    elif ":" in term:
        prefix, _, suffix = term.partition(":")
        if prefix in local_ctx:
            create_term_definition(active, local_ctx, prefix, defined)
        prefix_def = active.terms.get(prefix)
        if prefix_def is not None:
            definition["@id"] = prefix_def["@id"] + suffix
        else:
            definition["@id"] = term
    else:
        if active.vocab is None:
            raise JsonLdError("invalid IRI mapping", term)
        definition["@id"] = active.vocab + term

    if "@container" in value:
        container = value["@container"]
        if container not in ("@list", "@set", "@index", "@language"):
            raise JsonLdError("invalid container mapping", term)
        definition["@container"] = container

    if "@language" in value and "@type" not in value:
        language = value["@language"]
        if language is not None and not isinstance(language, str):
            raise JsonLdError("invalid language mapping", term)
        definition["@language"] = language.lower() if language else language

    active.terms[term] = definition
    defined[term] = True


def expand_iri(
    active: ActiveContext,
    value: Optional[str],
    *,
    document_relative: bool = False,
    vocab: bool = False,
    local_ctx: Optional[Dict[str, Any]] = None,
    defined: Optional[Dict[str, bool]] = None,
) -> Optional[str]:
    """IRI Expansion (JSON-LD 1.0 API §6.3; reference json-ld.rkt:859-949)."""
    if value is None or is_keyword(value):
        return value
    # fast path for the expansion hot loop: property keys repeat across
    # every node of every document sharing a context; base-independent,
    # so safe to cache per processed (frozen) context
    if vocab and not document_relative and local_ctx is None:
        try:
            cache = active._key_cache
        except AttributeError:
            cache = active._key_cache = {}
        hit = cache.get(value, _MISS)
        if hit is not _MISS:
            return hit
        out = _expand_iri_uncached(active, value)
        cache[value] = out
        return out
    if local_ctx is not None and value in local_ctx \
            and defined is not None and defined.get(value) is not True:
        create_term_definition(active, local_ctx, value, defined)
    if vocab and value in active.terms:
        defn = active.terms[value]
        return None if defn is None else defn["@id"]
    if ":" in value:
        prefix, _, suffix = value.partition(":")
        if prefix == "_" or suffix.startswith("//"):
            return value
        if local_ctx is not None and prefix in local_ctx \
                and defined is not None and defined.get(prefix) is not True:
            create_term_definition(active, local_ctx, prefix, defined)
        prefix_def = active.terms.get(prefix)
        if prefix_def is not None and not prefix_def.get("@reverse"):
            return prefix_def["@id"] + suffix
        return value
    if vocab and active.vocab is not None:
        return active.vocab + value
    if document_relative:
        return resolve_iri(active.base, value)
    return value


_MISS = object()


def _expand_iri_uncached(active: ActiveContext, value: str) -> Optional[str]:
    """vocab=True, document_relative=False, no local ctx — the hot loop."""
    if value in active.terms:
        defn = active.terms[value]
        return None if defn is None else defn["@id"]
    if ":" in value:
        prefix, _, suffix = value.partition(":")
        if prefix == "_" or suffix.startswith("//"):
            return value
        prefix_def = active.terms.get(prefix)
        if prefix_def is not None and not prefix_def.get("@reverse"):
            return prefix_def["@id"] + suffix
        return value
    if active.vocab is not None:
        return active.vocab + value
    return value

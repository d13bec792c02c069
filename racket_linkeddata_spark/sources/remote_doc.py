"""Remote document loading (JSON-LD 1.0 API LoadDocumentCallback).

The reference's loader is ``http-get-jsonld`` + ``simple-context-loader``
(json-ld.rkt:72-117): a pluggable url-map with an optional no-network
mode. This module implements the full RemoteDocument semantics the API
conformance suite exercises (remote-doc-* vectors) on top of the same
pinned-map idea, so the whole family runs OFFLINE:

- content-type dispatch: ``application/ld+json`` is JSON-LD (context
  link headers are IGNORED); ``application/json`` and any ``+json``
  extension type parse as JSON and honor a single
  ``http://www.w3.org/ns/json-ld#context`` link header; anything else
  is ``loading document failed``;
- redirects (301/303/307) are followed (cap 5, matching the reference's
  ``#:redirections 5``) and the FINAL url becomes the document's base;
- a missing document (404) is ``loading document failed``;
- multiple context link headers are an error.

At cluster scale the same policy as ``sources/contexts.py`` holds:
documents/contexts are resolved on the driver (or pinned), broadcast,
and executors never do network I/O.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple
from urllib.parse import urljoin

CONTEXT_LINK_REL = "http://www.w3.org/ns/json-ld#context"

_LINK_RE = re.compile(r'\s*<([^>]*)>\s*(.*)')


class LoadingDocumentFailed(ValueError):
    code = "loading document failed"


class MultipleContextLinkHeaders(ValueError):
    code = "multiple context link headers"


@dataclass
class RemoteDocument:
    """What the LoadDocumentCallback returns."""
    document_url: str
    document: Any
    context_url: Optional[str] = None


@dataclass
class PinnedEntry:
    """One pinned url: either a filesystem ``path`` or an inline
    ``document``, plus the HTTP metadata a live server would send."""
    path: Optional[str] = None
    document: Any = None
    content_type: Optional[str] = None
    http_link: Sequence[str] = field(default_factory=tuple)
    redirect_to: Optional[str] = None
    status: int = 200


def _guess_content_type(url: str) -> Optional[str]:
    if url.endswith(".jsonld"):
        return "application/ld+json"
    if url.endswith(".json"):
        return "application/json"
    return None


def _context_links(http_link: Sequence[str], base_url: str) -> Tuple[str, ...]:
    """Urls of link headers whose rel is the json-ld context relation."""
    if isinstance(http_link, str):
        http_link = (http_link,)
    found = []
    for header in http_link:
        m = _LINK_RE.match(header)
        if not m:
            continue
        target, params = m.groups()
        rel = re.search(r'rel\s*=\s*"([^"]*)"', params)
        if rel and CONTEXT_LINK_REL in rel.group(1).split():
            found.append(urljoin(base_url, target))
    return tuple(found)


class PinnedDocumentLoader:
    """Offline LoadDocumentCallback over a url -> PinnedEntry map.

    The production shape: pin every url the corpus references (the
    reference's ``#:url-map`` + ``#:load-unknown-urls? #f`` mode,
    json-ld.rkt:84-117) and broadcast the loader's map."""

    MAX_REDIRECTS = 5

    def __init__(self, entries: Dict[str, PinnedEntry]):
        self.entries = dict(entries)

    def load(self, url: str) -> RemoteDocument:
        seen = 0
        while True:
            entry = self.entries.get(url)
            if entry is None or entry.status >= 400:
                raise LoadingDocumentFailed(f"document not found: {url}")
            if entry.redirect_to is not None:
                seen += 1
                if seen > self.MAX_REDIRECTS:
                    raise LoadingDocumentFailed(f"too many redirects: {url}")
                url = urljoin(url, entry.redirect_to)
                continue
            break

        content_type = entry.content_type or _guess_content_type(url)
        if content_type == "application/ld+json":
            context_url = None  # link headers are ignored for JSON-LD
        elif content_type == "application/json" or (
                content_type is not None and content_type.endswith("+json")):
            links = _context_links(entry.http_link, url)
            if len(links) > 1:
                raise MultipleContextLinkHeaders(
                    f"{len(links)} context link headers for {url}")
            context_url = links[0] if links else None
        else:
            raise LoadingDocumentFailed(
                f"unsupported content type {content_type!r} for {url}")

        if entry.document is not None:
            document = entry.document
        else:
            try:
                with open(entry.path, encoding="utf-8") as f:
                    document = json.load(f)
            except (OSError, json.JSONDecodeError) as e:
                raise LoadingDocumentFailed(f"cannot load {url}: {e}") from e
        return RemoteDocument(url, document, context_url)


def expand_remote(url: str, loader: PinnedDocumentLoader, *,
                  remote_contexts: Optional[Dict[str, Any]] = None):
    """Expand a document BY URL (API expand() steps 1-3): load it, apply
    a context link header as the expand context when the content type
    says to, use the post-redirect url as base."""
    from ..core.expand import expand

    rd = loader.load(url)
    expand_ctx = None
    if rd.context_url is not None:
        expand_ctx = loader.load(rd.context_url).document
    return expand(rd.document, base=rd.document_url,
                  expand_context=expand_ctx,
                  remote_contexts=remote_contexts)

"""Shared machinery for the attribute-markup html front ends (RDFa,
microdata): lenient stack handling, text-literal capture buffers, bnode
minting, and the term-position IRI policy.

Both extractors are HTMLParser subclasses with identical structural
behavior — only handle_starttag (the per-format attribute semantics)
differs. Keeping the stack/capture/void/close plumbing here means a fix
to the lenient-pop or capture-finalize behavior (exercised by the
shared tag-soup fuzz) can never silently miss one of the two.

Subclass contract: define a frame class exposing ``tag`` and
``captures`` (a tuple of ``(subj, props, datatype, lang, buf)``
records), push the root frame in ``__init__``, implement
``handle_starttag`` (push non-void frames, call ``_finalize`` directly
for a void element that opened a capture), and set ``BNODE_PREFIX``.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List

from .context import BaseResolver, is_absolute_iri
from .terms import RDF_LANG_STRING, XSD_STRING, Literal, Quad

VOID_ELEMENTS = frozenset((
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
))

# Term-position policy: a prefix:name token with an UNDECLARED prefix is
# accepted as an absolute IRI only when its scheme is a registered IRI
# scheme actually used for vocabulary terms. Without this, the social-
# markup prefixes on virtually every real crawled page (og:title,
# twitter:card, fb:app_id — conventionally used WITHOUT a prefix
# declaration) would flood the KG with pseudo-IRI predicates nothing
# can join on. A DECLARED prefix always wins over this list (checked by
# the callers before falling through here). Documented divergence from
# a literal reading of CURIEorAbsIRI; real pages, not the grammar, are
# the contract.
_TERM_IRI_SCHEMES = frozenset((
    "http", "https", "urn", "mailto", "tag", "ftp", "file", "data",
    "did", "ws", "wss", "ni", "tel",
))


def is_term_iri(token: str) -> bool:
    """True when a ':'-bearing term-position token stands on its own as
    an absolute IRI (scheme allowlisted; see _TERM_IRI_SCHEMES)."""
    return (token.partition(":")[0].lower() in _TERM_IRI_SCHEMES
            and is_absolute_iri(token))


def make_literal(value: str, datatype, lang) -> Literal:
    """datatype (when given) wins; else lang tags; else plain string."""
    if datatype:
        return Literal(value, datatype)
    if lang:
        return Literal(value, RDF_LANG_STRING, lang)
    return Literal(value, XSD_STRING)


class MarkupExtractor(HTMLParser):
    BNODE_PREFIX = "_:n"

    def __init__(self, base: str):
        super().__init__(convert_charrefs=True)
        self.base = base
        self._res = BaseResolver(base)
        self.quads: List[Quad] = []
        self._bnodes = 0
        self._active: List[List[str]] = []  # open text-capture buffers
        self._stack: list = []  # subclass pushes the root frame

    def _bnode(self) -> str:
        # per-format prefixes ("_:rdfa<N>", "_:md<N>") cannot collide
        # with to_rdf's JSON-LD issuer labels ("_:b<N>"); URDNA2015
        # relabels every family to _:c14n<N> afterwards
        self._bnodes += 1
        return f"{self.BNODE_PREFIX}{self._bnodes - 1}"

    def handle_endtag(self, tag: str) -> None:
        # lenient pop: close to the nearest matching open tag; ignore a
        # stray end tag entirely (never pop the root)
        stack = self._stack
        for i in range(len(stack) - 1, 0, -1):
            if stack[i].tag == tag:
                for f in reversed(stack[i:]):
                    self._finalize(f)
                del stack[i:]
                break

    def handle_data(self, data: str) -> None:
        for buf in self._active:
            buf.append(data)

    def _finalize(self, f) -> None:
        for subj, props, dt, lang, buf in f.captures:
            lit = make_literal("".join(buf), dt, lang)
            for p in props:
                self.quads.append(Quad(subj, p, lit))
            self._active.remove(buf)
        f.captures = ()

    def close(self) -> None:
        super().close()
        # unclosed tags at EOF: finalize any pending text literals
        for f in reversed(self._stack[1:]):
            self._finalize(f)
        del self._stack[1:]

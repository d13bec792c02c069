"""HTML microdata extraction: itemscope/itemprop attributes -> RDF quads.

The third embedded-data format real Common-Crawl pages carry (after
JSON-LD script tags and RDFa): schema.org microdata. Semantics follow
the W3C "Microdata to RDF" note, simplified to the subset that covers
essentially all schema.org markup in the wild; quads feed the same
per-document canonicalization as the other two front ends
(core/pipeline.py), so all three formats land in one triples schema.

Mapping (W3C microdata-to-RDF, second edition):

- ``itemscope``            a new item: a fresh bnode, or ``itemid``
                           (resolved against the page url) when given
- ``itemtype``             rdf:type triples (absolute URLs, whitespace-
                           separated); the FIRST type also sets the
                           property vocabulary = the type URL up to and
                           including the last ``/`` or ``#``
- ``itemprop``             predicate(s): absolute URLs pass through
                           (scheme-allowlisted, htmlbase.is_term_iri —
                           ``og:title``-style tokens are NOT URLs),
                           bare names append to the current item's
                           vocabulary (inherited by untyped nested
                           items); value =
                           nested item | href/src/data IRI |
                           meta ``content`` | time ``datetime`` |
                           the element's text content (with inherited
                           ``lang`` as a language tag)
- an element with BOTH itemprop and itemscope links the enclosing item
  to the nested item (the microdata nesting rule)

Deliberate simplifications (documented contract):

- no ``itemref`` (cross-references outside the item subtree — rare in
  the wild, and a second pass over a DOM we deliberately don't build);
- no rdfa:usesVocabulary / prop-list (@index) machinery;
- text-content values are raw concatenated character data, matching
  DOM textContent, no whitespace normalization;
- itemprop names on an element outside any itemscope are ignored
  (per spec: no current item, no triple).

Parsing: stack/capture/void/lenient-pop machinery shared with the RDFa
extractor (core/htmlbase.py); one hostile page only fails its own row
via page_to_triples' envelope.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from .htmlbase import (
    VOID_ELEMENTS,
    MarkupExtractor,
    is_term_iri,
    make_literal,
)
from .terms import RDF_TYPE, Quad

# per-element URL-valued attribute for itemprop values (W3C table)
_URL_ATTR = {
    "a": "href", "area": "href", "link": "href",
    "img": "src", "audio": "src", "video": "src", "source": "src",
    "track": "src", "iframe": "src", "embed": "src",
    "object": "data",
}


def _vocab_of(type_iri: str) -> str:
    """Property base = the type URL up to and including the last '/' or
    '#' (http://schema.org/Person -> http://schema.org/)."""
    for sep in ("#", "/"):
        i = type_iri.rfind(sep)
        if i >= 0:
            return type_iri[: i + 1]
    return type_iri


class _Frame:
    __slots__ = ("tag", "item", "vocab", "lang", "captures")

    def __init__(self, tag, item, vocab, lang):
        self.tag = tag
        self.item = item        # current item (subject) for descendants
        self.vocab = vocab      # property vocabulary of that item
        self.lang = lang
        self.captures = ()


class _MicrodataParser(MarkupExtractor):
    BNODE_PREFIX = "_:md"

    def __init__(self, base: str):
        super().__init__(base)
        self._stack.append(_Frame(None, None, None, None))

    def _props(self, names: str, vocab: Optional[str]) -> List[str]:
        out = []
        for n in names.split():
            if is_term_iri(n):
                out.append(n)
            elif vocab and ":" not in n:
                out.append(vocab + n)
        return out

    def handle_starttag(self, tag: str,
                        attrs: List[Tuple[str, Optional[str]]]) -> None:
        parent = self._stack[-1]
        if not attrs:
            # plain structural tag: inherit scope
            if tag not in VOID_ELEMENTS:
                self._stack.append(_Frame(tag, parent.item,
                                          parent.vocab, parent.lang))
            return
        a = {k: (v if v is not None else "") for k, v in attrs}

        lang = parent.lang
        if "xml:lang" in a:
            lang = a["xml:lang"] or None
        elif "lang" in a:
            lang = a["lang"] or None

        f = _Frame(tag, parent.item, parent.vocab, lang)

        scoped = "itemscope" in a
        new_item = None
        if scoped:
            new_item = (self._res.resolve(a["itemid"])
                        if a.get("itemid") else self._bnode())
            types = [t for t in a.get("itemtype", "").split()
                     if is_term_iri(t)]
            for t in types:
                self.quads.append(Quad(new_item, RDF_TYPE, t))
            f.item = new_item
            # untyped nested items inherit the enclosing vocabulary
            f.vocab = _vocab_of(types[0]) if types else parent.vocab

        if "itemprop" in a and parent.item is not None:
            # predicates resolve in the ENCLOSING item's vocabulary
            props = self._props(a["itemprop"], parent.vocab)
            if props:
                if scoped:
                    for p in props:
                        self.quads.append(Quad(parent.item, p, new_item))
                else:
                    url_attr = _URL_ATTR.get(tag)
                    obj = None
                    if url_attr and url_attr in a:
                        obj = self._res.resolve(a[url_attr])
                    elif tag == "meta" and "content" in a:
                        obj = make_literal(a["content"], None, lang)
                    elif tag == "time" and "datetime" in a:
                        obj = make_literal(a["datetime"], None, None)
                    elif "content" in a:
                        # non-meta content= appears in the wild; honor it
                        obj = make_literal(a["content"], None, lang)
                    if obj is not None:
                        for p in props:
                            self.quads.append(Quad(parent.item, p, obj))
                    else:
                        buf: List[str] = []
                        self._active.append(buf)
                        f.captures = ((parent.item, tuple(props), None,
                                       lang, buf),)

        if tag not in VOID_ELEMENTS:
            self._stack.append(f)
        elif f.captures:
            self._finalize(f)  # void element, no text: empty literal


def extract_microdata(html: bytes, base: str) -> List[Quad]:
    """Extract microdata quads from an html page (see module docstring
    for the mapping). Returns [] for pages without microdata."""
    p = _MicrodataParser(base)
    p.feed(html.decode("utf-8", "replace"))
    p.close()
    return p.quads

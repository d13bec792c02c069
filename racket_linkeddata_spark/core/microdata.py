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
- ``itemprop``             predicate(s): absolute URLs pass through,
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

Same lenient parsing model as core/rdfa.py (stdlib html.parser; one
hostile page only fails its own row via page_to_triples' envelope).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional, Tuple

from .context import BaseResolver, is_absolute_iri
from .terms import RDF_LANG_STRING, RDF_TYPE, XSD_STRING, Literal, Quad

_VOID = frozenset((
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
))

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


class _MicrodataParser(HTMLParser):
    def __init__(self, base: str):
        super().__init__(convert_charrefs=True)
        self.base = base
        self._res = BaseResolver(base)
        self.quads: List[Quad] = []
        self._bnodes = 0
        self._active: List[List[str]] = []
        self._stack: List[_Frame] = [_Frame(None, None, None, None)]

    def _bnode(self) -> str:
        # "_:md<N>": disjoint from to_rdf's "_:b<N>" and rdfa's
        # "_:rdfa<N>"; URDNA2015 relabels all three families afterwards
        self._bnodes += 1
        return f"_:md{self._bnodes - 1}"

    def _props(self, names: str, vocab: Optional[str]) -> List[str]:
        out = []
        for n in names.split():
            if is_absolute_iri(n):
                out.append(n)
            elif vocab:
                out.append(vocab + n)
        return out

    def handle_starttag(self, tag: str,
                        attrs: List[Tuple[str, Optional[str]]]) -> None:
        parent = self._stack[-1]
        if not attrs:
            # plain structural tag: inherit scope
            if tag not in _VOID:
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
                     if is_absolute_iri(t)]
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
                        obj = (Literal(a["content"], RDF_LANG_STRING, lang)
                               if lang
                               else Literal(a["content"], XSD_STRING))
                    elif tag == "time" and "datetime" in a:
                        obj = Literal(a["datetime"], XSD_STRING)
                    elif "content" in a:
                        # non-meta content= appears in the wild; honor it
                        obj = (Literal(a["content"], RDF_LANG_STRING, lang)
                               if lang
                               else Literal(a["content"], XSD_STRING))
                    if obj is not None:
                        for p in props:
                            self.quads.append(Quad(parent.item, p, obj))
                    else:
                        buf: List[str] = []
                        self._active.append(buf)
                        f.captures = ((parent.item, tuple(props), lang,
                                       buf),)

        if tag not in _VOID:
            self._stack.append(f)
        elif f.captures:
            self._finalize(f)  # void element, no text: empty literal

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                for f in reversed(self._stack[i:]):
                    self._finalize(f)
                del self._stack[i:]
                break

    def handle_data(self, data: str) -> None:
        for buf in self._active:
            buf.append(data)

    def _finalize(self, f: _Frame) -> None:
        for subj, props, lang, buf in f.captures:
            text = "".join(buf)
            lit = (Literal(text, RDF_LANG_STRING, lang) if lang
                   else Literal(text, XSD_STRING))
            for p in props:
                self.quads.append(Quad(subj, p, lit))
            self._active.remove(buf)
        f.captures = ()

    def close(self) -> None:
        super().close()
        for f in reversed(self._stack[1:]):
            self._finalize(f)
        del self._stack[1:]


def extract_microdata(html: bytes, base: str) -> List[Quad]:
    """Extract microdata quads from an html page (see module docstring
    for the mapping). Returns [] for pages without microdata."""
    p = _MicrodataParser(base)
    p.feed(html.decode("utf-8", "replace"))
    p.close()
    return p.quads

"""RDFa-Lite extraction: html attributes -> RDF quads.

The north star's front end names TWO embedded-data formats —
``<script type="application/ld+json">`` (core/pipeline.py) and RDFa.
The reference never touches html (its entry points start at JSON-LD /
N-Quads text), so the TRIPLE semantics here follow the same rdf.rkt data
model the rest of the engine uses (core/terms.py) and the W3C RDFa Lite
1.1 attribute set; the extracted quads feed the SAME per-document
URDNA2015 canonicalization as script-tag JSON-LD, so both formats land
in one triples schema.

Implemented (RDFa Lite 1.1 + the Core bits it implies):

- ``vocab``     default vocabulary for bare ``property``/``typeof`` terms
- ``prefix``    CURIE prefix declarations (``pfx: iri ...`` pairs)
- ``about``     explicit subject (IRI / CURIE / safe-CURIE / ``_:bnode``);
                ``typeof`` beside it types THIS subject (no bnode)
- ``typeof``    rdf:type triples; with neither about nor resource it
                mints a bnode (chained as the object when ``property``
                is present — the typed-object pattern)
- ``property``  predicate(s); object = resource/href/src IRI if present,
                else the typed-bnode chain, else ``content`` attr, else
                the element's concatenated text content
- ``resource`` / ``href`` / ``src``  object IRI (also the subject for
                descendants, RDFa Core's "current object resource")
- ``datatype``  typed literals (empty string forces a plain literal)
- ``lang`` / ``xml:lang``  language-tagged literals (inherited)

Deliberate simplifications (documented contract, each a fringe of RDFa
Core that Common-Crawl-style markup essentially never exercises):

- no ``@rel``/``@rev``/``@inlist``/``@datetime`` and no rdfa: / XMLLiteral
  output;
- no W3C "initial context" prefix set: prefixes must be declared with
  ``prefix=`` (or come from ``vocab``) — keeps extraction deterministic
  with zero bundled registry;
- an UNDECLARED prefix:name in term position is accepted only when its
  scheme is a registered IRI scheme (htmlbase.is_term_iri) — otherwise
  the og:/twitter:/fb: conventions on real pages would flood the KG
  with pseudo-IRI predicates;
- text-content literals are the element's raw concatenated character
  data (no whitespace normalization), matching DOM textContent;
- unresolvable terms/CURIEs are skipped silently (per spec).

Parsing: stack/capture/void/lenient-pop machinery shared with the
microdata extractor (core/htmlbase.py). One hostile page can still only
fail its own row: page_to_triples wraps extraction in the per-document
error envelope.
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


class _Frame:
    __slots__ = ("tag", "subject", "vocab", "prefixes", "lang", "captures")

    def __init__(self, tag, subject, vocab, prefixes, lang):
        self.tag = tag
        self.subject = subject      # parent object for descendants
        self.vocab = vocab
        self.prefixes = prefixes    # dict, copy-on-write
        self.lang = lang
        self.captures = ()          # text-literal captures owned by this tag


class _RdfaParser(MarkupExtractor):
    BNODE_PREFIX = "_:rdfa"

    def __init__(self, base: str):
        super().__init__(base)
        self._stack.append(_Frame(None, base, None, {}, None))

    # --- term / IRI resolution -------------------------------------------

    def _expand_term(self, term: str, f: _Frame) -> Optional[str]:
        """property/typeof/datatype position: TERMorCURIEorAbsIRI."""
        if not term:
            return None
        if term.startswith("[") and term.endswith("]"):
            term = term[1:-1]
        if ":" in term:
            pfx, _, local = term.partition(":")
            if pfx == "_":
                return None  # bnodes are not predicates/types
            if pfx in f.prefixes:
                return f.prefixes[pfx] + local
            return term if is_term_iri(term) else None
        return f.vocab + term if f.vocab else None

    def _resolve_ref(self, value: str, f: _Frame,
                     curie_ok: bool = True) -> Optional[str]:
        """about/resource position: IRI, CURIE, safe-CURIE or bnode;
        relative IRIs resolve against the page url."""
        if value.startswith("[") and value.endswith("]"):
            inner = value[1:-1]
            if inner.startswith("_:"):
                return inner
            pfx, colon, local = inner.partition(":")
            if colon and pfx in f.prefixes:
                return f.prefixes[pfx] + local
            return None  # unresolvable safe CURIE is ignored per spec
        if value.startswith("_:"):
            return value
        if curie_ok and ":" in value:
            pfx, _, local = value.partition(":")
            if pfx in f.prefixes:
                return f.prefixes[pfx] + local
        return self._res.resolve(value)

    # --- tag handling -----------------------------------------------------

    def handle_starttag(self, tag: str,
                        attrs: List[Tuple[str, Optional[str]]]) -> None:
        parent = self._stack[-1]
        if not attrs:
            # plain structural tag (most of a real page): inherit scope
            if tag not in VOID_ELEMENTS:
                self._stack.append(_Frame(tag, parent.subject,
                                          parent.vocab, parent.prefixes,
                                          parent.lang))
            return
        a = {k: (v if v is not None else "") for k, v in attrs}

        vocab, prefixes, lang = parent.vocab, parent.prefixes, parent.lang
        if "vocab" in a:
            vocab = a["vocab"] or None
        if "prefix" in a:
            prefixes = dict(prefixes)
            toks = a["prefix"].split()
            for i in range(0, len(toks) - 1, 2):
                if toks[i].endswith(":"):
                    prefixes[toks[i][:-1]] = toks[i + 1]
        if "xml:lang" in a:
            lang = a["xml:lang"] or None
        elif "lang" in a:
            lang = a["lang"] or None

        f = _Frame(tag, parent.subject, vocab, prefixes, lang)

        about = (self._resolve_ref(a["about"], f)
                 if "about" in a else None)
        res_attr = next((k for k in ("resource", "href", "src")
                         if k in a), None)
        obj_iri = (self._resolve_ref(a[res_attr], f,
                                     curie_ok=res_attr == "resource")
                   if res_attr else None)
        types = ([t for t in (self._expand_term(x, f)
                              for x in a["typeof"].split()) if t]
                 if "typeof" in a else [])
        props = ([p for p in (self._expand_term(x, f)
                              for x in a["property"].split()) if p]
                 if "property" in a else [])
        dt = (self._expand_term(a["datatype"], f)
              if a.get("datatype") else None)

        if props:
            subj = about if about is not None else parent.subject
            # typeof target (RDFa Core "typed resource"): about wins,
            # then the object resource, then a minted bnode — the bnode
            # only exists when NEITHER about nor resource is given
            typed_node = None
            if "typeof" in a:
                typed_node = (about if about is not None
                              else obj_iri if obj_iri is not None
                              else self._bnode())
                for t in types:
                    self.quads.append(Quad(typed_node, RDF_TYPE, t))
            obj: object = None
            if "content" in a:
                # RDFa Core 1.1 step 11: @content wins the property
                # VALUE even over @resource/@href/@src and over a
                # typeof-minted bnode (whose rdf:type quads were
                # already emitted above)
                obj = make_literal(a["content"], dt, lang)
            elif obj_iri is not None:
                obj = obj_iri
            elif typed_node is not None and about is None:
                obj = typed_node  # typed-object (bnode) chaining
            if obj is not None:
                for p in props:
                    self.quads.append(Quad(subj, p, obj))
                # RDFa Core: the object resource (or the typed bnode)
                # remains the parent subject for descendants even when
                # @content supplied the property value
                if obj_iri is not None:
                    f.subject = obj_iri
                elif typed_node is not None and about is None:
                    f.subject = typed_node
                elif isinstance(obj, str):
                    f.subject = obj
                else:
                    f.subject = subj
            else:
                # text-content literal: buffer until this tag closes
                buf: List[str] = []
                self._active.append(buf)
                f.captures = ((subj, tuple(props), dt, lang, buf),)
                f.subject = subj
        elif types:
            node = about if about is not None else \
                obj_iri if obj_iri is not None else self._bnode()
            for t in types:
                self.quads.append(Quad(node, RDF_TYPE, t))
            f.subject = node
        elif about is not None:
            f.subject = about
        elif obj_iri is not None and res_attr == "resource":
            # bare @resource (no property/typeof) sets the subject for
            # descendants; bare href/src (plain links) do not
            f.subject = obj_iri

        if tag not in VOID_ELEMENTS:
            self._stack.append(f)
        elif f.captures:
            # property-without-object on a void element: empty literal
            self._finalize(f)


def extract_rdfa(html: bytes, base: str) -> List[Quad]:
    """Extract RDFa-Lite quads from an html page (see module docstring
    for the attribute semantics). Returns [] for pages without RDFa."""
    p = _RdfaParser(base)
    p.feed(html.decode("utf-8", "replace"))
    p.close()
    return p.quads

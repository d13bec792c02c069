"""N-Quads parser + injection-safe serializer.

Grammar follows W3C N-Quads (the reference implements the same terminals with
parser combinators, n-quads.rkt:13-270; entry ``string->nquads``
n-quads.rkt:258-272). We accept general horizontal whitespace between terms
(spec-correct; the reference only accepts single spaces, a quirk noted at
n-quads.rkt:219-240) but *emit* the reference's exact single-space,
dot-terminated serialization (n-quads.rkt:446-556).

The serializer re-validates IRIs, blank-node labels and language tags so a
malicious lexical form cannot inject extra statements (tuple-insertion attack
tests, n-quads.rkt:564-606).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import List, Optional

from .terms import Literal, Quad, RDF_LANG_STRING, Term, XSD_STRING


class NQuadsParseError(ValueError):
    pass


class NQuadsSerializeError(ValueError):
    pass


# --- terminals (W3C N-Quads grammar) -------------------------------------

_UCHAR = r'\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8}'
_IRIREF = r'<((?:[^\x00-\x20<>"{}|^`\\]|' + _UCHAR + r')*)>'
_ECHAR = r'\\[tbnrf"\'\\]'
_STRING = r'"((?:[^\x22\x5C\x0A\x0D]|' + _ECHAR + r'|' + _UCHAR + r')*)"'
_LANGTAG = r'@([a-zA-Z]+(?:-[a-zA-Z0-9]+)*)'
# PN_CHARS_BASE approximated over full unicode ranges
_PN_CHARS_BASE = (
    "A-Za-z\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u02FF\u0370-\u037D"
    "\u037F-\u1FFF\u200C-\u200D\u2070-\u218F\u2C00-\u2FEF\u3001-\uD7FF"
    "\uF900-\uFDCF\uFDF0-\uFFFD\U00010000-\U000EFFFF"
)
_PN_CHARS_U = _PN_CHARS_BASE + "_"
_PN_CHARS = _PN_CHARS_U + "0-9\u00B7\u0300-\u036F\u203F-\u2040-"
_BNODE = (
    r'_:([' + _PN_CHARS_U + r'0-9](?:[' + _PN_CHARS + r'.]*[' + _PN_CHARS + r'])?)'
)

_WS = r'[ \t]+'
_WSO = r'[ \t]*'

_SUBJ = r'(?:' + _IRIREF + r'|' + _BNODE + r')'
_OBJ_LIT = _STRING + r'(?:\^\^' + _IRIREF + r'|' + _LANGTAG + r')?'

_STATEMENT_RE = re.compile(
    _WSO + _SUBJ                                   # groups 1 (iri) 2 (bnode)
    + _WS + r'(?:' + _IRIREF + r'|' + _BNODE + r')'  # 3, 4
    + _WS + r'(?:' + _IRIREF + r'|' + _BNODE + r'|' + _OBJ_LIT + r')'  # 5,6 | 7,8,9
    + r'(?:' + _WS + _SUBJ + r')?'                 # graph: 10, 11
    + _WSO + r'\.' + _WSO + r'(?:#.*)?$'
)

_UCHAR_RE = re.compile(_UCHAR)
_ECHAR_MAP = {
    't': '\t', 'b': '\b', 'n': '\n', 'r': '\r',
    'f': '\f', '"': '"', "'": "'", '\\': '\\',
}
_ESCAPE_RE = re.compile(_ECHAR + '|' + _UCHAR)


def _unescape(s: str) -> str:
    if '\\' not in s:
        return s

    def repl(m: "re.Match[str]") -> str:
        tok = m.group(0)
        if tok[1] in 'uU':
            return chr(int(tok[2:], 16))
        return _ECHAR_MAP[tok[1]]

    return _ESCAPE_RE.sub(repl, s)


def _unescape_iri(s: str) -> str:
    if '\\' not in s:
        return s
    return _UCHAR_RE.sub(lambda m: chr(int(m.group(0)[2:], 16)), s)


def parse_line(line: str, lineno: int = 0, *,
               generalized: bool = False) -> Optional[Quad]:
    """Parse one N-Quads statement line. Returns None for blank/comment lines.

    W3C N-Quads allows only IRIREF in the predicate position; a blank-node
    predicate is rejected unless ``generalized=True`` (generalized-RDF
    datasets, e.g. toRdf goldens produced with produceGeneralizedRdf)."""
    stripped = line.strip()
    if not stripped or stripped.startswith('#'):
        return None
    m = _STATEMENT_RE.match(line)
    if not m:
        raise NQuadsParseError(f"line {lineno}: malformed N-Quads statement: {line!r}")
    g = m.groups()
    if g[3] is not None and not generalized:
        raise NQuadsParseError(
            f"line {lineno}: blank node not allowed in predicate position "
            "(pass generalized=True for generalized-RDF input)")
    subj = _unescape_iri(g[0]) if g[0] is not None else '_:' + g[1]
    pred = _unescape_iri(g[2]) if g[2] is not None else '_:' + g[3]
    obj: Term
    if g[4] is not None:
        obj = _unescape_iri(g[4])
    elif g[5] is not None:
        obj = '_:' + g[5]
    else:
        lex = _unescape(g[6])
        if g[8] is not None:  # language tag
            obj = Literal(lex, RDF_LANG_STRING, g[8].lower())
        elif g[7] is not None:  # ^^datatype
            obj = Literal(lex, _unescape_iri(g[7]), None)
        else:
            obj = Literal(lex, XSD_STRING, None)
    graph = None
    if g[9] is not None:
        graph = _unescape_iri(g[9])
    elif g[10] is not None:
        graph = '_:' + g[10]
    return Quad(subj, pred, obj, graph)


def parse(text: str, *, generalized: bool = False) -> List[Quad]:
    """Parse an N-Quads document (entry point, cf. n-quads.rkt:258-272)."""
    out: List[Quad] = []
    for i, line in enumerate(text.split('\n'), 1):
        q = parse_line(line, i, generalized=generalized)
        if q is not None:
            out.append(q)
    return out


# --- serializer -----------------------------------------------------------

_IRI_BAD_RE = re.compile(r'[\x00-\x20<>"{}|^`\\]')
_LITERAL_ESC = {'\\': '\\\\', '"': '\\"', '\n': '\\n', '\r': '\\r', '\t': '\\t'}
_LITERAL_ESC_RE = re.compile(r'[\\"\n\r\t]')
_BNODE_LABEL_RE = re.compile(
    r'^[' + _PN_CHARS_U + r'0-9](?:[' + _PN_CHARS + r'.]*[' + _PN_CHARS + r'])?$'
)
_LANGTAG_OK_RE = re.compile(r'^[a-zA-Z]+(?:-[a-zA-Z0-9]+)*$')


def _uchar(c: str) -> str:
    cp = ord(c)
    return f'\\u{cp:04X}' if cp <= 0xFFFF else f'\\U{cp:08X}'


@lru_cache(maxsize=65536)
def serialize_iri(iri: str) -> str:
    """<iri> with \\uXXXX escapes for chars the grammar forbids
    (injection-safe, n-quads.rkt:478-490). Cached: predicates/datatypes
    repeat across millions of quads in the pipeline hot path."""
    if _IRI_BAD_RE.search(iri) is None:
        return '<' + iri + '>'
    return '<' + _IRI_BAD_RE.sub(lambda m: _uchar(m.group(0)), iri) + '>'


@lru_cache(maxsize=65536)
def _bnode_label_ok(label: str) -> bool:
    return _BNODE_LABEL_RE.match(label) is not None


def _serialize_term(term: Term, position: str, *,
                    generalized: bool = False) -> str:
    # plain-str (IRI / bnode) first: it's ~80% of calls in the pipeline
    # hot path, and Literal (a tuple subclass) costs more to type-check
    if term.__class__ is str:
        if term.startswith('_:'):
            if position == 'predicate' and not generalized:
                raise NQuadsSerializeError(
                    "blank node not allowed in predicate position (W3C "
                    "N-Quads allows only IRIREF; pass generalized=True to "
                    "emit generalized-RDF quads)")
            if not _bnode_label_ok(term[2:]):
                raise NQuadsSerializeError(
                    f"invalid blank node label: {term[2:]!r}")
            return term
        return serialize_iri(term)
    if isinstance(term, Literal):
        if position in ('subject', 'predicate', 'graph'):
            raise NQuadsSerializeError(f"literal not allowed in {position}")
        lex = _LITERAL_ESC_RE.sub(lambda m: _LITERAL_ESC[m.group(0)], term.value)
        out = f'"{lex}"'
        if term.language:
            if not _LANGTAG_OK_RE.match(term.language):
                raise NQuadsSerializeError(
                    f"invalid language tag: {term.language!r}")
            return out + '@' + term.language
        if term.datatype and term.datatype != XSD_STRING:
            return out + '^^' + serialize_iri(term.datatype)
        return out
    if term.startswith('_:'):  # str subclass fallback, same semantics
        return _serialize_term(str(term), position, generalized=generalized)
    return serialize_iri(term)


def serialize_quad(q: Quad, *, generalized: bool = False) -> str:
    """One statement, single-space separated, ' .' terminated
    (matches the reference's exact output, n-quads.rkt:512-528)."""
    s = _serialize_term(q.subj, 'subject')
    p = _serialize_term(q.pred, 'predicate', generalized=generalized)
    o = _serialize_term(q.obj, 'object')
    if q.graph is None:
        return f'{s} {p} {o} .'
    return f'{s} {p} {o} {_serialize_term(q.graph, "graph")} .'


def serialize(quads: List[Quad], *, generalized: bool = False) -> str:
    """N-Quads document: one statement per line, trailing newline
    (n-quads.rkt:551-554)."""
    return ''.join(serialize_quad(q, generalized=generalized) + '\n'
                   for q in quads)

"""Charset normalization for the html front ends: non-utf8 crawl pages
must extract the same triples as their utf-8 twins."""

import json

from racket_linkeddata_spark.core.pipeline import (
    decode_html,
    page_to_triples,
)

URL = "https://ex.org/p"
DOC = {"@id": "https://ex.org/p#s",
       "http://schema.org/name": "café — namé"}
HTML = ('<html><head><script type="application/ld+json">'
        + json.dumps(DOC, ensure_ascii=False)
        + '</script></head><body>t</body></html>')


def _rows(html_bytes):
    res = page_to_triples(URL, html_bytes)
    assert res.status == "ok", res.status
    return {(r[1], r[2], r[4]) for r in res.rows}


def test_utf8_passthrough_unchanged():
    b = HTML.encode("utf-8")
    assert decode_html(b) is b  # zero-copy for the common case


def test_utf8_bom_stripped():
    assert _rows(b"\xef\xbb\xbf" + HTML.encode("utf-8")) \
        == _rows(HTML.encode("utf-8"))


def test_utf16_bom_pages_extract():
    for enc in ("utf-16", "utf-16-le", "utf-16-be"):
        data = HTML.encode(enc)
        if not data.startswith((b"\xff\xfe", b"\xfe\xff")):
            continue
        assert _rows(data) == _rows(HTML.encode("utf-8")), enc


def test_bomless_utf16_sniffed_by_leading_nul_pattern():
    le = HTML.encode("utf-16-le")
    be = HTML.encode("utf-16-be")
    assert not le.startswith(b"\xff\xfe") and le.startswith(b"<\x00")
    assert _rows(le) == _rows(HTML.encode("utf-8"))
    assert _rows(be) == _rows(HTML.encode("utf-8"))


def test_meta_charset_legacy_page():
    html = ('<html><head><meta charset="windows-1252">'
            '<script type="application/ld+json">'
            '{"@id": "https://ex.org/p#s", '
            '"http://schema.org/name": "café"}'
            '</script></head><body>t</body></html>')
    legacy = html.encode("windows-1252")
    want = _rows(html.encode("utf-8").replace(
        b'charset="windows-1252"', b'charset="utf-8"'))
    assert _rows(legacy) == want
    # the e-acute survives as the real character, not mojibake
    assert any("café" in v for _, _, v in _rows(legacy))


def test_meta_http_equiv_content_charset():
    html = ('<html><head><meta http-equiv="Content-Type" '
            'content="text/html; charset=iso-8859-1"></head>'
            '<body><div vocab="http://schema.org/" about="#a">'
            '<span property="name" content="namé"></span>'
            '</div></body></html>')
    res = page_to_triples(URL, html.encode("iso-8859-1"))
    assert res.status == "ok"
    assert any("namé" in (r[4] or "") for r in res.rows)


def test_hostile_charset_label_never_kills_the_row():
    """Review r04b: charset="undefined" hits Python's booby-trapped
    'undefined' codec which raises UnicodeError even with
    errors='replace' — must degrade to as-is bytes, not kill the
    task."""
    html = ('<html><head><meta charset="undefined">'
            '<script type="application/ld+json">'
            '{"@id": "https://e/x", "http://s/p": 1}</script>'
            '</head><body>t</body></html>').encode("utf-8")
    assert decode_html(html) == html
    res = page_to_triples(URL, html)
    assert res.status == "ok" and res.n_triples == 1


def test_charset_sniff_only_matches_meta_tags():
    """Review r04b: accept-charset on a <form> (or charset= text in a
    payload) must NOT transcode a genuine utf-8 page."""
    html = ('<html><body><form accept-charset="ISO-8859-1"></form>'
            '<script type="application/ld+json">'
            + json.dumps(DOC, ensure_ascii=False)
            + '</script></body></html>').encode("utf-8")
    assert decode_html(html) is html
    assert any("café" in v for _, _, v in _rows(html))


def test_mislabeled_utf16_meta_treated_as_utf8():
    """Review r04b (WHATWG rule): a byte-readable <meta> cannot be on a
    real utf-16 page — trust the bytes, not the label."""
    html = ('<html><head><meta charset="utf-16"></head><body>'
            '<script type="application/ld+json">'
            '{"@id": "https://e/x", "http://s/p": "ok"}</script>'
            '</body></html>').encode("utf-8")
    assert decode_html(html) is html
    res = page_to_triples(URL, html)
    assert res.status == "ok" and res.n_triples == 1


def test_decode_html_idempotent_meta_labeled_legacy():
    """ADVICE r04 (high): the <meta charset> label SURVIVES the first
    transcode, so a second decode_html pass (WARC reader, then
    page_to_triples) used to re-decode the utf-8 output as the legacy
    charset: 'café' -> 'cafÃ©'. decode_html must be a projection."""
    html = ('<html><head><meta charset="windows-1252">'
            '<script type="application/ld+json">'
            '{"@id": "https://ex.org/p#s", '
            '"http://schema.org/name": "café"}'
            '</script></head><body>t</body></html>')
    legacy = html.encode("windows-1252")
    once = decode_html(legacy)
    assert decode_html(once) == once
    # and the double-pass page still extracts the REAL character
    assert any("café" in v for _, _, v in _rows(decode_html(once)))
    assert not any("cafÃ©" in v for _, _, v in _rows(decode_html(once)))


def test_decode_html_idempotent_over_corpus():
    """decode_html(decode_html(x)) == decode_html(x) over every charset
    shape this suite exercises."""
    corpus = [
        HTML.encode("utf-8"),
        b"\xef\xbb\xbf" + HTML.encode("utf-8"),
        HTML.encode("utf-16"),
        HTML.encode("utf-16-le"),
        HTML.encode("utf-16-be"),
        ('<html><head><meta charset="iso-8859-1"></head>'
         '<body>caf\xe9</body></html>').encode("iso-8859-1"),
        ('<html><head><meta charset="shift_jis"></head>'
         '<body>日本</body></html>').encode("shift_jis"),
        b'<html><head><meta charset="undefined"></head><body>x</body>',
        b"\x00\x01\xff\xfe garbage",
        b"",
    ]
    for b in corpus:
        once = decode_html(b)
        assert decode_html(once) == once, b[:40]


def test_unknown_charset_label_falls_through():
    html = ('<html><head><meta charset="x-bogus-enc"></head><body>'
            '<script type="application/ld+json">'
            '{"@id": "https://e/x", "http://s/p": 1}</script>'
            '</body></html>')
    res = page_to_triples(URL, html.encode("utf-8"))
    assert res.status == "ok" and res.n_triples == 1


def test_idempotence_bound():
    """The DOCUMENTED divergence from strict WHATWG label-honoring
    (accepted tradeoff, core/pipeline.py decode_html): a legacy-labeled
    page whose non-ASCII bytes happen to be valid multi-byte utf-8 is
    read as utf-8, not per its label. Pins the behavior so a future
    change is a conscious decision, not drift."""
    # bytes C3 A9 are windows-1252 'cafÃ©' AND valid utf-8 'café'; the
    # guard picks utf-8 (in the wild these bytes are mojibake from
    # exactly this mislabeling)
    page = ('<html><head><meta charset="windows-1252"></head>'
            '<body>café</body></html>').encode("utf-8")
    out = decode_html(page)
    assert out == page                      # passed through as utf-8
    assert "café" in out.decode("utf-8")
    # the flip side that motivates the guard: the transcode path is
    # only taken for bytes that are NOT valid utf-8, so applying
    # decode_html twice can never double-transcode
    legacy = ('<html><head><meta charset="windows-1252"></head>'
              '<body>caf\xe9</body></html>').encode("windows-1252")
    once = decode_html(legacy)
    assert "café" in once.decode("utf-8")
    assert decode_html(once) == once

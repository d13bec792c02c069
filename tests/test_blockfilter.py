"""Blocklist filtering (operators/blockfilter.py): planted-document
semantics for both modes, NULL survival, annotate/filter consistency,
stats counting, and validation."""

import pytest
from pyspark.sql import functions as F

from racket_linkeddata_spark.operators.blockfilter import (
    blocklist_annotate,
    blocklist_filter,
    blocklist_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a perfectly clean document about cats"),
        (2, "one bad word here"),                      # any-blocked
        (3, "bad bad bad bad bad words words words"),  # fraction-blocked
        (4, None),                                     # NULL text
        (5, ""),                                       # empty text
        (6, "BAD in capitals with punctuation, bad!"), # case/punct fold
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


TERMS = ["bad", "unused"]


def test_any_mode(spark, docs):
    a = {r.doc_id: r for r in
         blocklist_annotate(docs, TERMS).collect()}
    assert [a[i].blocked for i in (1, 2, 3, 4, 5, 6)] == \
        [False, True, True, False, False, True]
    assert a[3].n_blocked == 5 and a[3].n_blocked_terms == 1
    assert a[6].n_blocked == 2  # case-folded, punctuation stripped
    assert a[4].n_tokens == 0 and a[5].n_tokens == 0


def test_fraction_mode(spark, docs):
    a = {r.doc_id: r for r in
         blocklist_annotate(docs, TERMS, mode="fraction",
                            threshold_x1000=300).collect()}
    # doc 2: 1/4 = 250 <= 300 -> survives; doc 3: 5/8 = 625 -> blocked;
    # doc 6: 2/6 = 333 > 300 -> blocked
    assert [a[i].blocked for i in (1, 2, 3, 4, 5, 6)] == \
        [False, False, True, False, False, True]


def test_filter_matches_annotate(spark, docs):
    """filter must keep exactly the annotate-unblocked ids and preserve
    ALL source columns, for both modes."""
    for kw in ({"mode": "any"},
               {"mode": "fraction", "threshold_x1000": 300}):
        keep = {r.doc_id for r in
                blocklist_annotate(docs, TERMS, **kw).collect()
                if not r.blocked}
        out = blocklist_filter(docs, TERMS, **kw)
        assert set(out.columns) == {"doc_id", "text"}
        assert {r.doc_id for r in out.collect()} == keep


def test_stats_counts(spark, docs):
    s = {r.term: r for r in blocklist_stats(docs, TERMS).collect()}
    assert set(s) == {"bad"}  # unused term: zero hits, zero rows
    assert s["bad"].n_docs == 3 and s["bad"].n_occurrences == 8


def test_validation(spark, docs):
    with pytest.raises(ValueError, match="no non-empty terms"):
        blocklist_annotate(docs, ["", "  "])
    with pytest.raises(ValueError, match="unknown mode"):
        blocklist_annotate(docs, TERMS, mode="nope")
    with pytest.raises(ValueError, match="threshold_x1000"):
        blocklist_annotate(docs, TERMS, mode="fraction",
                           threshold_x1000=2000)
    with pytest.raises(ValueError, match="threshold_x1000"):
        blocklist_filter(docs, TERMS, mode="fraction",
                         threshold_x1000=-1)


def test_phrase_terms_rejected(spark, docs):
    """The tokenizer splits on [^a-z0-9]+, so a phrase or punctuated
    term can never match a token — accepting one would silently
    no-op that entry.  Reject loudly instead (review r06e)."""
    for bad in (["bad word"], ["don't"], ["bad", "two words"]):
        with pytest.raises(ValueError, match="single lowercase alnum"):
            blocklist_annotate(docs, bad)
        with pytest.raises(ValueError, match="single lowercase alnum"):
            blocklist_filter(docs, bad)
    # case folding happens BEFORE validation: "BAD" is fine
    a = {r.doc_id: r.blocked
         for r in blocklist_annotate(docs, ["BAD"]).collect()}
    assert a[2] and a[6] and not a[1]

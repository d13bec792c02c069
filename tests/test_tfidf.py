"""TF-IDF keyword extraction (operators/tfidf.py): planted-corpus
score math, deterministic ties, token-less docs, subset relation
across k, and a pure-Python replica cross-check."""

import math
from collections import Counter

import pytest

from racket_linkeddata_spark.operators.tfidf import term_scores, tfidf_topk

DOCS = [
    (1, "zebra zebra common"),
    (2, "common common quux"),
    (3, "common apple banana"),
    (4, None),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _replica(rows, k):
    """Independent pure-Python tf-idf with the same integer bit-idf."""
    toks = {i: (t or "").lower().split() for i, t in rows}
    n_docs = len(rows)
    df = Counter()
    for ts in toks.values():
        df.update(set(ts))
    out = []
    for i, ts in toks.items():
        tf = Counter(ts)
        scored = sorted(
            ((t, c, df[t],
              c * (int(math.log2(n_docs)) - int(math.log2(df[t]))))
             for t, c in tf.items()),
            key=lambda r: (-r[3], r[0]))
        out += [(i, t, c, d, n_docs, s, r + 1)
                for r, (t, c, d, s) in enumerate(scored[:k])]
    return sorted(out)


def test_planted_scores(spark, docs):
    s = {(r.doc_id, r.term): r for r in term_scores(docs).collect()}
    # n_docs = 5 (token-less docs count); floor(log2 5) = 2
    z = s[(1, "zebra")]
    assert (z.tf, z.df, z.n_docs) == (2, 1, 5)
    assert z.score == 2 * (2 - 0)       # rare term, tf 2
    c = s[(1, "common")]
    assert (c.tf, c.df) == (1, 3)
    assert c.score == 1 * (2 - 1)       # df 3 -> idf_bits 1
    # token-less documents emit no rows at all
    assert not any(d in (4, 5) for d, _ in s)


def test_topk_matches_replica(spark, docs):
    for k in (1, 2, 10):
        got = sorted((r.doc_id, r.term, r.tf, r.df, r.n_docs, r.score,
                      r.rank) for r in tfidf_topk(docs, k).collect())
        assert got == _replica(DOCS, k), k


def test_topk_subset_relation(spark, docs):
    """top-1 rows are exactly the rank-1 rows of top-3 (deterministic
    ordering makes k monotone)."""
    top3 = {(r.doc_id, r.term, r.rank)
            for r in tfidf_topk(docs, 3).collect()}
    top1 = {(r.doc_id, r.term, r.rank)
            for r in tfidf_topk(docs, 1).collect()}
    assert top1 == {t for t in top3 if t[2] == 1}


def test_tie_break_on_term(spark):
    d = spark.createDataFrame([(1, "beta alpha gamma")],
                              "doc_id long, text string")
    got = [r.term for r in
           tfidf_topk(d, 3).orderBy("rank").collect()]
    assert got == ["alpha", "beta", "gamma"]  # equal scores -> term asc


def test_k_validation(spark, docs):
    with pytest.raises(ValueError, match="k must be >= 1"):
        tfidf_topk(docs, 0)

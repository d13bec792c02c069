"""URDNA2015 property tests.

The vendored normalize fixtures pin URGNA2012 (the suite predates
URDNA2015), so URDNA2015 — the algorithm the reference targets
(urdna2015.rkt) and our pipeline default — is verified by its defining
property instead: the canonical form is invariant under any relabeling /
reordering of input blank nodes (graph isomorphism invariance), plus known
hand-checked vectors.
"""

import random

import pytest

from racket_linkeddata_spark.core.nquads import parse
from racket_linkeddata_spark.core.terms import Literal, Quad
from racket_linkeddata_spark.core.to_rdf import to_rdf
from racket_linkeddata_spark.core.urdna2015 import (
    CanonicalizationBudgetExceeded,
    canonical_nquads,
)
from tests.suite_utils import LOADER, case_base, load_json, manifest_cases

CASES = manifest_cases("normalize")


def _relabel(quads, mapping):
    def m(t):
        if isinstance(t, str) and t.startswith("_:"):
            return mapping[t]
        return t

    return [Quad(m(q.subj), q.pred,
                 q.obj if isinstance(q.obj, Literal) else m(q.obj),
                 m(q.graph) if q.graph is not None else None)
            for q in quads]


@pytest.mark.parametrize("case", CASES, ids=[c["@id"] for c in CASES])
def test_urdna2015_isomorphism_invariance(case):
    doc = load_json(case["input"])
    quads = to_rdf(doc, base=case_base(case), remote_contexts=LOADER)
    baseline = canonical_nquads(quads, mode="URDNA2015")
    bnodes = sorted({t for q in quads
                     for t in (q.subj, q.obj, q.graph)
                     if isinstance(t, str) and t.startswith("_:")})
    rng = random.Random(42)
    for trial in range(3):
        shuffled = list(bnodes)
        rng.shuffle(shuffled)
        mapping = {old: f"_:x{i}" for i, old in zip(shuffled, bnodes)}
        mapping = {old: f"_:y{rng.randrange(10**6)}_{i}"
                   for i, old in enumerate(shuffled)}
        relabeled = _relabel(quads, mapping)
        rng.shuffle(relabeled)
        assert canonical_nquads(relabeled, mode="URDNA2015") == baseline


def test_urdna2015_known_vector():
    # shared bnode across two subjects (normalize-0017 shape), URDNA2015
    quads = parse(
        "<http://example.org/test> <http://example.org/vocab#A> _:p1 .\n"
        "<http://example.org/test> <http://example.org/vocab#B> _:p1 .\n")
    assert canonical_nquads(quads) == (
        "<http://example.org/test> <http://example.org/vocab#A> _:c14n0 .\n"
        "<http://example.org/test> <http://example.org/vocab#B> _:c14n0 .\n")


def test_permutation_budget():
    # complete bigraph of bnodes with one predicate: factorial blowup zone
    n = 7
    quads = []
    for i in range(n):
        for j in range(n):
            if i != j:
                quads.append(Quad(f"_:a{i}", "http://ex/p", f"_:a{j}"))
    with pytest.raises(CanonicalizationBudgetExceeded):
        canonical_nquads(quads, max_permutation_steps=50)

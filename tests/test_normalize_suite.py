"""Normalization conformance: normalize-manifest.jsonld (57 cases),
canonical N-Quads string compare (expand → toRDF → URDNA2015 → serialize,
the reference composition json-ld->urdna2015-nquads-string,
json-ld.rkt:2707-2712)."""

import pytest

from racket_linkeddata_spark.core.to_rdf import to_rdf
from racket_linkeddata_spark.core.urdna2015 import canonical_nquads
from tests.suite_utils import LOADER, case_base, load_json, load_text, manifest_cases

CASES = manifest_cases("normalize")


@pytest.mark.parametrize("case", CASES, ids=[c["@id"] for c in CASES])
def test_normalize(case):
    doc = load_json(case["input"])
    expected = load_text(case["expect"])
    quads = to_rdf(doc, base=case_base(case), remote_contexts=LOADER)
    assert canonical_nquads(quads, mode="URGNA2012") == expected

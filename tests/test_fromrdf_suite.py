"""fromRdf conformance: fromRdf-manifest.jsonld (22 cases), N-Quads in,
expanded JSON-LD object compare. The reference vendors these fixtures
without implementing the algorithm; we implement it from the 1.0 spec."""

import pytest

from racket_linkeddata_spark.core.from_rdf import from_rdf
from racket_linkeddata_spark.core.nquads import parse
from tests.suite_utils import load_json, load_text, manifest_cases

CASES = manifest_cases("fromRdf")


@pytest.mark.parametrize("case", CASES, ids=[c["@id"] for c in CASES])
def test_fromrdf(case):
    quads = parse(load_text(case["input"]))
    expected = load_json(case["expect"])
    option = case.get("option", {})
    result = from_rdf(
        quads,
        use_native_types=option.get("useNativeTypes", False),
        use_rdf_type=option.get("useRdfType", False))
    assert result == expected

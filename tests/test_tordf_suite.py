"""toRdf conformance: toRdf-manifest.jsonld (114 cases).

Golden .nq files are compared as *sets* of statements (blank-node labels are
implementation-deterministic `_:b<N>` in both ours and the goldens since both
follow the spec's node-map relabeling; line order in the fixture files is not
normative, the reference itself never wired this family into its runner,
jsonld-tests.rkt:168-171)."""

import pytest

from racket_linkeddata_spark.core.nquads import parse, serialize_quad
from racket_linkeddata_spark.core.to_rdf import to_rdf
from tests.suite_utils import LOADER, case_base, load_json, load_text, manifest_cases

CASES = manifest_cases("toRdf")


@pytest.mark.parametrize("case", CASES, ids=[c["@id"] for c in CASES])
def test_tordf(case):
    doc = load_json(case["input"])
    expected = load_text(case["expect"])
    option = case.get("option", {})
    base = option.get("base", case_base(case))
    quads = to_rdf(
        doc, base=base, remote_contexts=LOADER,
        produce_generalized_rdf=option.get("produceGeneralizedRdf", False))
    got = sorted(serialize_quad(q) for q in quads)
    want = sorted(serialize_quad(q) for q in parse(expected))
    assert got == want

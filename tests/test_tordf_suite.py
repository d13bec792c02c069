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
    gen = option.get("produceGeneralizedRdf", False)
    quads = to_rdf(
        doc, base=base, remote_contexts=LOADER,
        produce_generalized_rdf=gen)
    got = sorted(serialize_quad(q, generalized=gen) for q in quads)
    want = sorted(serialize_quad(q, generalized=gen)
                  for q in parse(expected, generalized=gen))
    assert got == want


def test_string_typed_double_keeps_lexical_form():
    """A STRING @value with @type xsd:double passes through verbatim —
    only native JSON numbers get XSD-canonicalized (spec §10.5 step 6;
    ADVICE r1: canonicalizing here corrupted canonical hashes and made
    non-numeric strings drop whole documents)."""
    xsd_double = "http://www.w3.org/2001/XMLSchema#double"
    doc = [{
        "@id": "http://ex/s",
        "http://ex/lex": [{"@value": "0.5", "@type": xsd_double}],
        "http://ex/nonnum": [{"@value": "NOT A NUMBER", "@type": xsd_double}],
        "http://ex/native": [{"@value": 0.5}],
        "http://ex/intdouble": [{"@value": 1, "@type": xsd_double}],
    }]
    quads = {(q.pred, q.obj.value, q.obj.datatype)
             for q in to_rdf(doc, remote_contexts=LOADER)}
    assert ("http://ex/lex", "0.5", xsd_double) in quads
    assert ("http://ex/nonnum", "NOT A NUMBER", xsd_double) in quads
    assert ("http://ex/native", "5.0E-1", xsd_double) in quads
    assert ("http://ex/intdouble", "1.0E0", xsd_double) in quads

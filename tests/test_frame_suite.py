"""Framing conformance: frame-manifest.jsonld (21 cases), object compare.
No reference implementation exists (fixtures only); algorithm follows the
suite-era jsonld.js semantics."""

import pytest

from racket_linkeddata_spark.core.frame import frame
from tests.suite_utils import LOADER, case_base, load_json, manifest_cases

CASES = manifest_cases("frame")


@pytest.mark.parametrize("case", CASES, ids=[c["@id"] for c in CASES])
def test_frame(case):
    doc = load_json(case["input"])
    frame_doc = load_json(case["frame"])
    expected = load_json(case["expect"])
    result = frame(doc, frame_doc, base=case_base(case),
                   remote_contexts=LOADER)
    assert result == expected

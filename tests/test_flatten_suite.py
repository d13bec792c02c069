"""Flattening conformance: flatten-manifest.jsonld (46 cases), object
compare; context present for the compacted variants."""

import pytest

from racket_linkeddata_spark.core.flatten import flatten
from tests.suite_utils import LOADER, case_base, load_json, manifest_cases

CASES = manifest_cases("flatten")


@pytest.mark.parametrize("case", CASES, ids=[c["@id"] for c in CASES])
def test_flatten(case):
    doc = load_json(case["input"])
    context = load_json(case["context"]) if "context" in case else None
    expected = load_json(case["expect"])
    option = case.get("option", {})
    result = flatten(doc, context, base=option.get("base", case_base(case)),
                     compact_arrays=option.get("compactArrays", True),
                     remote_contexts=LOADER)
    assert result == expected

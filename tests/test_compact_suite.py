"""Compaction conformance: compact-manifest.jsonld (72 cases),
object compare (reference runner jsonld-tests.rkt:110-135, 168-171)."""

import pytest

from racket_linkeddata_spark.core.compact import compact
from tests.suite_utils import LOADER, case_base, load_json, manifest_cases

CASES = manifest_cases("compact")


@pytest.mark.parametrize("case", CASES, ids=[c["@id"] for c in CASES])
def test_compact(case):
    doc = load_json(case["input"])
    context = load_json(case["context"])
    expected = load_json(case["expect"])
    option = case.get("option", {})
    result = compact(doc, context, base=case_base(case),
                     compact_arrays=option.get("compactArrays", True),
                     remote_contexts=LOADER)
    assert result == expected

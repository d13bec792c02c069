"""Expansion conformance: the vendored expand-manifest.jsonld (78 cases),
object-compare against golden outputs (reference runner jsonld-tests.rkt:33-42,
168-171)."""

import pytest

from racket_linkeddata_spark.core.expand import expand
from tests.suite_utils import LOADER, case_base, load_json, manifest_cases

CASES = manifest_cases("expand")


@pytest.mark.parametrize("case", CASES, ids=[c["@id"] for c in CASES])
def test_expand(case):
    doc = load_json(case["input"])
    expected = load_json(case["expect"])
    option = case.get("option", {})
    base = option.get("base", case_base(case))
    expand_context = None
    if "expandContext" in option:
        expand_context = load_json(option["expandContext"])
    result = expand(doc, base=base, expand_context=expand_context,
                    remote_contexts=LOADER)
    assert result == expected

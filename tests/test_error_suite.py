"""Negative tests: error-manifest.jsonld (43 cases) — each input must raise
a JsonLdError whose code equals the expected spec error-name string."""

import pytest

from racket_linkeddata_spark.core.context import JsonLdError
from racket_linkeddata_spark.core.expand import expand
from tests.suite_utils import LOADER, case_base, load_json, manifest_cases

CASES = manifest_cases("error")


@pytest.mark.parametrize("case", CASES, ids=[c["@id"] for c in CASES])
def test_error(case):
    doc = load_json(case["input"])
    with pytest.raises(JsonLdError) as excinfo:
        expand(doc, base=case_base(case), remote_contexts=LOADER)
        # errors raised by later stages (all manifest entries are
        # jld:FlattenTest): run the full flatten, compacted when a
        # context is supplied
        from racket_linkeddata_spark.core.flatten import flatten
        context = load_json(case["context"]) if "context" in case else None
        flatten(doc, context, base=case_base(case), remote_contexts=LOADER)
    assert excinfo.value.code == case["expect"]

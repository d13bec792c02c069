"""remote-doc conformance: remote-doc-manifest.jsonld (12 cases: 9
positive, 3 negative).

The family needs no network: each case's url maps to a local fixture
file plus the HTTP metadata (content type, link headers, redirect) the
manifest's ``option`` block declares — exactly the pinned-url-map mode
of the reference loader (json-ld.rkt:84-117), which the reference never
wired into its own runner (this was the one vendored family with zero
coverage in round 1)."""

import os

import pytest

from racket_linkeddata_spark.sources.remote_doc import (
    LoadingDocumentFailed,
    MultipleContextLinkHeaders,
    PinnedDocumentLoader,
    PinnedEntry,
    expand_remote,
)
from tests.suite_utils import (
    SUITE_BASE, SUITE_DIR, load_json, manifest_cases)

CASES = manifest_cases("remote-doc")

_ERRORS = {
    "loading document failed": LoadingDocumentFailed,
    "multiple context link headers": MultipleContextLinkHeaders,
}


def _loader_for(case) -> PinnedDocumentLoader:
    """Pin every fixture file under the suite base, then overlay the
    case's declared HTTP metadata on its input url."""
    entries = {}
    for name in os.listdir(SUITE_DIR):
        if name.startswith("remote-doc-") and not name.endswith(
                "-manifest.jsonld"):
            entries[SUITE_BASE + name] = PinnedEntry(
                path=os.path.join(SUITE_DIR, name))
    option = case.get("option", {})
    url = SUITE_BASE + case["input"]
    base = entries.get(url, PinnedEntry(
        path=os.path.join(SUITE_DIR, case["input"])))
    if not os.path.exists(base.path) and "redirectTo" not in option:
        entries.pop(url, None)  # a true 404 (t0008)
    else:
        # httpStatus in this manifest only qualifies redirects
        # (301/303/307), which the loader treats uniformly
        entries[url] = PinnedEntry(
            path=base.path,
            content_type=option.get("contentType"),
            http_link=option.get("httpLink", ()),
            redirect_to=option.get("redirectTo"),
        )
    return PinnedDocumentLoader(entries)


@pytest.mark.parametrize("case", CASES, ids=[c["@id"] for c in CASES])
def test_remote_doc(case):
    loader = _loader_for(case)
    url = SUITE_BASE + case["input"]
    if "jld:NegativeEvaluationTest" in case["@type"]:
        with pytest.raises(_ERRORS[case["expect"]]):
            expand_remote(url, loader)
    else:
        got = expand_remote(url, loader)
        assert got == load_json(case["expect"])

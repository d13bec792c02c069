"""Helpers for running the vendored json-ld.org conformance suite.

Mirrors the reference's manifest runner (jsonld-tests.rkt:7-42): each
``*-manifest.jsonld`` lists {input, expect} cases; base IRI for a case is
the manifest's baseIri + input filename. Remote documents referenced under
the suite base resolve to local fixture files (pinned-url-map loading, like
json-ld.rkt:90,102-103 — never the network).
"""

import json
import os

SUITE_DIR = "/root/reference/linkeddata/jsonld-test-suite"
SUITE_BASE = "http://json-ld.org/test-suite/tests/"


def load_json(name):
    with open(os.path.join(SUITE_DIR, name), encoding="utf-8") as f:
        return json.load(f)


def load_text(name):
    with open(os.path.join(SUITE_DIR, name), encoding="utf-8") as f:
        return f.read()


def manifest_cases(family):
    manifest = load_json(f"{family}-manifest.jsonld")
    return manifest["sequence"]


class SuiteLoader(dict):
    """Dict-style remote-context loader over the local fixture files."""

    def _path(self, url):
        if not url.startswith(SUITE_BASE):
            return None
        path = os.path.join(SUITE_DIR, url[len(SUITE_BASE):])
        return path if os.path.exists(path) else None

    def __contains__(self, url):
        return super().__contains__(url) or self._path(url) is not None

    def __getitem__(self, url):
        if super().__contains__(url):
            return super().__getitem__(url)
        path = self._path(url)
        if path is None:
            raise KeyError(url)
        with open(path, encoding="utf-8") as f:
            doc = json.load(f)
        self[url] = doc
        return doc


LOADER = SuiteLoader()


def case_base(case):
    return SUITE_BASE + case["input"]

"""Pure-Python JSON-LD / RDF semantics core.

No Spark imports here: these modules run inside Arrow-batched pandas UDFs
on executors and directly under pytest. Semantics follow the JSON-LD 1.0
spec + W3C URDNA2015, pinned by the json-ld.org test suite vendored with
the reference (/root/reference/linkeddata/jsonld-test-suite/).
"""

"""DataFrame-lifted JSON-LD transforms: distributed result == driver-side
core result per document; error isolation; salted aggregation equivalence."""

import json

from pyspark.sql import functions as F

from racket_linkeddata_spark.core.expand import expand as core_expand
from racket_linkeddata_spark.core.to_rdf import to_rdf
from racket_linkeddata_spark.core.urdna2015 import canonical_nquads
from racket_linkeddata_spark.operators.jsonld_ops import (
    expand_documents,
    normalize_documents,
)
from racket_linkeddata_spark.operators.skew import domain_of, salted_agg
from racket_linkeddata_spark.sources.pages import _jsonld_doc, synth_page


def _docs_df(spark, n=40):
    rows = [(i, json.dumps(_jsonld_doc(i))) for i in range(n)]
    rows.append((10_001, "{not json"))
    rows.append((10_002, '{"@context": "https://missing.example/ctx", "a": 1}'))
    return spark.createDataFrame(rows, "doc_id long, doc string")


def test_expand_documents_matches_core(spark):
    df = _docs_df(spark)
    got = {r.doc_id: (r.out, r.error) for r in expand_documents(df).collect()}
    for i in range(40):
        want = json.dumps(core_expand(_jsonld_doc(i)), sort_keys=True)
        assert got[i] == (want, None)
    assert got[10_001][0] is None and got[10_001][1] is not None
    assert got[10_002][1] == "loading remote context failed"


def test_normalize_documents_matches_core(spark):
    df = _docs_df(spark, 25)
    got = {r.doc_id: r.out for r in normalize_documents(df).collect()
           if r.error is None and r.doc_id < 10_000}
    for i in range(25):
        assert got[i] == canonical_nquads(to_rdf(_jsonld_doc(i)))


def test_salted_agg_equivalent_to_groupby(spark):
    pages = spark.createDataFrame(
        [(synth_page(i)[0], i % 7) for i in range(3000)],
        "url string, v long")
    with_domain = pages.withColumn("domain", domain_of(F.col("url")))
    got = {(r.domain): (r.n, r.sum_v)
           for r in salted_agg(with_domain, ["domain"], sums=["v"],
                               salt_buckets=16).collect()}
    want = {r.domain: (r.n, r.sum_v)
            for r in with_domain.groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("v").alias("sum_v")).collect()}
    assert got == want
    # the mega-domain skew is real in the synth corpus
    top = max(v[0] for v in got.values())
    assert top >= 0.25 * 3000

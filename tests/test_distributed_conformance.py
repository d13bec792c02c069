"""The full expand conformance family run THROUGH the distributed
operator: all 78 vectors as rows of one DataFrame, one Spark job,
per-row base IRIs (base_col) — proving the cluster path is conformant,
not just the driver-side core it wraps."""

import json

from racket_linkeddata_spark.operators.jsonld_ops import expand_documents
from tests.suite_utils import LOADER, case_base, load_json, manifest_cases


def test_expand_suite_distributed(spark):
    cases = manifest_cases("expand")
    rows, ctx_rows = [], []
    expected = {}
    ctx_doc = None
    for i, case in enumerate(cases):
        doc = load_json(case["input"])
        option = case.get("option", {})
        base = option.get("base", case_base(case))
        if "expandContext" in option:
            # the expandContext cases share one option value; run them
            # as their own (tiny) DataFrame call with that kwarg
            ctx_doc = load_json(option["expandContext"])
            ctx_rows.append((i, json.dumps(doc), base))
        else:
            rows.append((i, json.dumps(doc), base))
        expected[i] = load_json(case["expect"])

    df = spark.createDataFrame(rows, "doc_id long, doc string, base string")
    got = {r.doc_id: (r.out, r.error)
           for r in expand_documents(df, contexts=LOADER,
                                     base_col="base").collect()}
    if ctx_rows:
        cdf = spark.createDataFrame(
            ctx_rows, "doc_id long, doc string, base string")
        got.update({r.doc_id: (r.out, r.error)
                    for r in expand_documents(
                        cdf, contexts=LOADER, base_col="base",
                        expand_context=ctx_doc).collect()})
    assert len(got) == len(cases)
    failures = []
    for i, case in enumerate(cases):
        out, err = got[i]
        if err is not None or json.loads(out) != expected[i]:
            failures.append((case["@id"], err))
    assert not failures, f"{len(failures)} distributed mismatches: " \
                         f"{failures[:5]}"


def test_flatten_suite_distributed(spark):
    """All 46 flatten vectors through flatten_documents (the one case
    with a compaction context runs as its own call)."""
    from racket_linkeddata_spark.operators.jsonld_ops import (
        flatten_documents)

    cases = manifest_cases("flatten")
    plain, with_ctx = [], []
    expected = {}
    ctx_doc = None
    for i, case in enumerate(cases):
        doc = load_json(case["input"])
        base = case.get("option", {}).get("base", case_base(case))
        if "context" in case:
            ctx_doc = load_json(case["context"])
            with_ctx.append((i, json.dumps(doc), base))
        else:
            plain.append((i, json.dumps(doc), base))
        expected[i] = load_json(case["expect"])

    got = {}
    df = spark.createDataFrame(plain, "doc_id long, doc string, base string")
    got.update({r.doc_id: (r.out, r.error)
                for r in flatten_documents(df, contexts=LOADER,
                                           base_col="base").collect()})
    if with_ctx:
        cdf = spark.createDataFrame(
            with_ctx, "doc_id long, doc string, base string")
        ctx_case = [c for c in cases if "context" in c][0]
        got.update({r.doc_id: (r.out, r.error)
                    for r in flatten_documents(
                        cdf, contexts=LOADER, base_col="base",
                        context=ctx_doc,
                        compact_arrays=ctx_case.get("option", {})
                        .get("compactArrays", True)).collect()})

    failures = []
    for i, case in enumerate(cases):
        out, err = got[i]
        if err is not None or json.loads(out) != expected[i]:
            failures.append((case["@id"], err))
    assert not failures, f"{len(failures)} mismatches: {failures[:5]}"


def test_tordf_normalize_suite_distributed(spark):
    """toRdf vectors through normalize_documents: distributed
    html-less JSON-LD -> RDF -> URDNA2015 canonical N-Quads equals the
    canonicalized golden. Generalized-RDF cases are excluded (bnode
    predicates aren't serializable as conformant N-Quads)."""
    from racket_linkeddata_spark.core.nquads import parse
    from racket_linkeddata_spark.core.urdna2015 import canonical_nquads
    from racket_linkeddata_spark.operators.jsonld_ops import (
        normalize_documents)
    from tests.suite_utils import load_text

    cases = [c for c in manifest_cases("toRdf")
             if not c.get("option", {}).get("produceGeneralizedRdf")]
    rows = []
    expected = {}
    for i, case in enumerate(cases):
        doc = load_json(case["input"])
        base = case.get("option", {}).get("base", case_base(case))
        rows.append((i, json.dumps(doc), base))
        expected[i] = canonical_nquads(parse(load_text(case["expect"])))

    df = spark.createDataFrame(rows, "doc_id long, doc string, base string")
    got = {r.doc_id: (r.out, r.error)
           for r in normalize_documents(df, contexts=LOADER,
                                        base_col="base").collect()}
    failures = [(cases[i]["@id"], got[i][1])
                for i in expected
                if got[i][1] is not None or got[i][0] != expected[i]]
    assert not failures, f"{len(failures)} mismatches: {failures[:5]}"


def test_compact_suite_distributed(spark):
    """All compact vectors through compact_documents with PER-ROW
    contexts (param_col): one DataFrame call per compactArrays value
    (an option, not data). Closes the round-2 gap: compact was green
    pure-Python only."""
    from racket_linkeddata_spark.operators.jsonld_ops import (
        compact_documents)

    cases = manifest_cases("compact")
    groups = {}  # compact_arrays -> rows
    expected = {}
    for i, case in enumerate(cases):
        doc = load_json(case["input"])
        ctx = load_json(case["context"])
        ca = case.get("option", {}).get("compactArrays", True)
        groups.setdefault(ca, []).append(
            (i, json.dumps(doc), case_base(case), json.dumps(ctx)))
        expected[i] = load_json(case["expect"])

    got = {}
    for ca, rows in groups.items():
        df = spark.createDataFrame(
            rows, "doc_id long, doc string, base string, ctx string")
        got.update({r.doc_id: (r.out, r.error)
                    for r in compact_documents(
                        df, contexts=LOADER, base_col="base",
                        param_col="ctx", param_kw="context",
                        compact_arrays=ca).collect()})
    assert len(got) == len(cases)
    failures = [(cases[i]["@id"], got[i][1]) for i in expected
                if got[i][1] is not None
                or json.loads(got[i][0]) != expected[i]]
    assert not failures, f"{len(failures)} mismatches: {failures[:5]}"


def test_fromrdf_suite_distributed(spark):
    """All fromRdf vectors through from_rdf_documents, grouped by the
    (useNativeTypes, useRdfType) option pair."""
    from racket_linkeddata_spark.operators.jsonld_ops import (
        from_rdf_documents)
    from tests.suite_utils import load_text

    cases = manifest_cases("fromRdf")
    groups = {}
    expected = {}
    for i, case in enumerate(cases):
        option = case.get("option", {})
        key = (option.get("useNativeTypes", False),
               option.get("useRdfType", False))
        groups.setdefault(key, []).append((i, load_text(case["input"])))
        expected[i] = load_json(case["expect"])

    got = {}
    for (unt, urt), rows in groups.items():
        df = spark.createDataFrame(rows, "doc_id long, nquads string")
        got.update({r.doc_id: (r.out, r.error)
                    for r in from_rdf_documents(
                        df, use_native_types=unt,
                        use_rdf_type=urt).collect()})
    assert len(got) == len(cases)
    failures = [(cases[i]["@id"], got[i][1]) for i in expected
                if got[i][1] is not None
                or json.loads(got[i][0]) != expected[i]]
    assert not failures, f"{len(failures)} mismatches: {failures[:5]}"


def test_frame_suite_distributed(spark):
    """All frame vectors through frame_documents with PER-ROW frames
    (param_col)."""
    from racket_linkeddata_spark.operators.jsonld_ops import frame_documents

    cases = manifest_cases("frame")
    rows, expected = [], {}
    for i, case in enumerate(cases):
        rows.append((i, json.dumps(load_json(case["input"])),
                     case_base(case),
                     json.dumps(load_json(case["frame"]))))
        expected[i] = load_json(case["expect"])

    df = spark.createDataFrame(
        rows, "doc_id long, doc string, base string, fr string")
    got = {r.doc_id: (r.out, r.error)
           for r in frame_documents(df, contexts=LOADER, base_col="base",
                                    param_col="fr",
                                    param_kw="frame").collect()}
    assert len(got) == len(cases)
    failures = [(cases[i]["@id"], got[i][1]) for i in expected
                if got[i][1] is not None
                or json.loads(got[i][0]) != expected[i]]
    assert not failures, f"{len(failures)} mismatches: {failures[:5]}"

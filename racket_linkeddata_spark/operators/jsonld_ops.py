"""Document-level JSON-LD transforms as DataFrame operators.

Every library entry point of the reference (expand / compact / flatten /
normalize, json-ld.rkt:1444/1836/2257/2710) lifted to a column transform:
JSON text in, JSON (or canonical N-Quads) text out, one Arrow-batched
mapInPandas per stage. Errors don't poison the batch — each row carries
its own status/error column.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

import pandas as pd
from pyspark.sql import DataFrame

from ..core.compact import compact as _compact
from ..core.context import JsonLdError
from ..core.expand import expand as _expand
from ..core.flatten import flatten as _flatten
from ..core.to_rdf import to_rdf as _to_rdf
from ..core.urdna2015 import CanonicalizationBudgetExceeded, canonical_nquads

OUT_SCHEMA = "doc_id bigint, out string, error string"


def _lift(transform):
    def op(docs: DataFrame, *args, id_col: str = "doc_id",
           json_col: str = "doc", contexts: Optional[Dict[str, Any]] = None,
           **kwargs) -> DataFrame:
        from .util import ensure_parallelism

        def fn(batches):
            for pdf in batches:
                ids, outs, errs = [], [], []
                for i, txt in zip(pdf[id_col].tolist(),
                                  pdf[json_col].tolist()):
                    ids.append(i)
                    try:
                        doc = json.loads(txt)
                        outs.append(transform(doc, contexts, *args, **kwargs))
                        errs.append(None)
                    except (ValueError, JsonLdError, RecursionError,
                            CanonicalizationBudgetExceeded) as e:
                        outs.append(None)
                        errs.append(getattr(e, "code", str(e)[:200]))
                yield pd.DataFrame(
                    {"doc_id": ids, "out": outs, "error": errs})

        pruned = ensure_parallelism(docs.select(id_col, json_col))
        return pruned.mapInPandas(fn, schema=OUT_SCHEMA)

    return op


expand_documents = _lift(
    lambda doc, ctxs, base=None: json.dumps(
        _expand(doc, base=base, remote_contexts=ctxs), sort_keys=True))

compact_documents = _lift(
    lambda doc, ctxs, context=None, base=None: json.dumps(
        _compact(doc, context, base=base, remote_contexts=ctxs),
        sort_keys=True))

flatten_documents = _lift(
    lambda doc, ctxs, context=None, base=None: json.dumps(
        _flatten(doc, context, base=base, remote_contexts=ctxs),
        sort_keys=True))

normalize_documents = _lift(
    lambda doc, ctxs, base=None, mode="URDNA2015": canonical_nquads(
        _to_rdf(doc, base=base, remote_contexts=ctxs), mode=mode))

"""Triple-extraction stage: pages -> flat triples DataFrame.

One Arrow-batched ``mapInPandas`` does the whole per-document chain
(extract -> expand -> toRDF -> URDNA2015 -> serialize), mirroring the
reference composition json-ld->urdna2015-nquads-string (json-ld.rkt:2707)
but batched and partition-parallel. Only (url, html) cross the JVM->Python
Arrow boundary — column pruning keeps text/warc_ts/lang JVM-side.

Zero-triple and error documents emit exactly one marker row (null subj)
so resume/lineage still sees every processed url.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

from ..core.pipeline import TRIPLE_COLUMNS, page_to_triples

TRIPLES_SCHEMA = (
    "url string, subj string, pred string, obj_kind tinyint, "
    "obj_value string, obj_dt string, obj_lang string, graph string, "
    "canon_hash string, status string"
)

_MARKER = (None,) * 8


def extract_triples(
    pages: DataFrame,
    contexts_broadcast=None,
    mode: str = "URDNA2015",
    max_permutation_steps: int = 200_000,
) -> DataFrame:
    """pages(url, html, ...) -> triples DataFrame (TRIPLES_SCHEMA).

    ``contexts_broadcast`` is an optional ``sc.broadcast(dict)`` of
    pre-fetched remote context documents (the reference's pinned url-map
    loader, json-ld.rkt:84-117) — executors never do network I/O.
    """
    import pandas as pd

    def fn(batches):
        ctxs = contexts_broadcast.value if contexts_broadcast is not None \
            else None
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                res = page_to_triples(url, bytes(html), ctxs, mode,
                                      max_permutation_steps)
                if res.rows:
                    rows.extend(res.rows)
                else:
                    rows.append((url,) + _MARKER + (res.status,))
            yield pd.DataFrame(rows, columns=TRIPLE_COLUMNS)

    return pages.select("url", "html").mapInPandas(fn, schema=TRIPLES_SCHEMA)


def triples_only(extracted: DataFrame) -> DataFrame:
    """Drop the zero-triple marker rows."""
    return extracted.filter(extracted.subj.isNotNull())

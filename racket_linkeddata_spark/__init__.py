"""PySpark-native knowledge-graph construction engine.

Re-implements the semantics of cwebber/racket-linkeddata (JSON-LD 1.0
expansion/compaction/flattening, JSON-LD->RDF, N-Quads, URDNA2015 RDF
dataset canonicalization) as a Spark-first pipeline:

- ``racket_linkeddata_spark.core``       pure-Python per-document semantics
  (no Spark imports; shared between pandas UDFs and pytest).
- ``racket_linkeddata_spark.operators``  DataFrame-level operators
  (triple extraction, entity linking, dedup, similarity, text stats).
- ``racket_linkeddata_spark.sources``    deterministic pages-table synthesis
  + parquet/Iceberg readers.
- ``racket_linkeddata_spark.plans``      end-to-end pipeline assembly
  (extract -> expand -> toRDF -> canonicalize -> link -> dedup -> materialize).
"""

__version__ = "0.1.0"

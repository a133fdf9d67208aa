"""solrizer_spark — a from-scratch PySpark-native batch main-content
extraction engine with the record→indexable-document capabilities of
umd-lib/solrizer (reference studied at /root/reference, v1.4.1).

NOT a port: the reference is a per-request Flask microservice
(reference: src/solrizer/web.py:292-410); this engine re-expresses its
record-to-field-map pipeline as a Spark DataFrame dataflow over an
Iceberg/parquet table of Common-Crawl-style web pages
``(url string, warc_ts timestamp, html binary, text string, lang string)``,
designed for 10^12-document scale:

* one Arrow-vectorized pandas UDF parses ``html`` into scored DOM blocks
  (everything downstream is JVM-side Catalyst expressions),
* salted repartition by url-hash defuses domain skew,
* per-partition completion manifests make reruns resumable,
* a lineage/metrics side table records blocks kept/dropped and parse
  failures per partition.

Subpackages
-----------
- ``extraction``  pure-Python (Spark-free) HTML/OCR text extraction and
  boilerplate block scoring; unit-testable without a SparkSession.
- ``functions``   scalar field builders as native Column expressions.
- ``operators``   DataFrame→DataFrame pipeline stages + the
  training-data operators (dedup, similarity, text stats, multimodal).
- ``sources``     pages/docs table IO (Iceberg when available, parquet
  fallback in this sandbox).
- ``plans``       config-driven ordered stage composition (the analog of
  the reference indexer chain, indexers/__init__.py:82-101).
- ``corpus``      deterministic synthetic pages-corpus generator.
"""

__version__ = "0.1.0"

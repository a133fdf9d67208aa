"""Pure-Python, Spark-free extraction kernel.

These functions are the per-value kernels that the Arrow-vectorized
pandas UDFs in ``solrizer_spark.operators.extract`` map over batches.
Keeping them Spark-free makes the byte-identity contract unit-testable
with plain pytest (reference test model:
tests/indexers/test_extracted_text.py).
"""

from solrizer_spark.extraction.html_text import (  # noqa: F401
    Block,
    ExtractionResult,
    extract_html,
    get_text,
)
from solrizer_spark.extraction.tagged import (  # noqa: F401
    OCRWord,
    UnrecognizedOCRFormatError,
    detect_ocr_format,
    extract_alto_words,
    extract_hocr_words,
    extract_ocr1_words,
    extract_tagged_words,
    tagged_text,
)

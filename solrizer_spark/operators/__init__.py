"""DataFrame→DataFrame pipeline stages.

Design rule (BASELINE.json input_hint): exactly ONE Arrow-vectorized
pandas UDF stage crosses the JVM↔Python boundary per row
(``extract.extract_stage``); every stage after it is native Catalyst
expressions, so the whole field chain fuses into WholeStageCodegen.
"""

from solrizer_spark.operators.extract import extract_stage  # noqa: F401
from solrizer_spark.operators.repartition import salted_repartition  # noqa: F401

"""EDTF dates stage — the dates indexer re-expressed.

Reference: for every ``*__edtf`` field, emit ``__dt`` (Solr DateRange)
plus three qualifier booleans and a precision int; warn-and-skip
unsupported values (dates.py:46-81). Here: an Arrow-vectorized pandas
UDF maps an EDTF string column to the 5-field struct; unsupported /
unparseable values yield a null struct plus an ``edtf_error`` tag for
the metrics table (never a job failure).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from solrizer_spark.extraction.edtf_dates import (
    EDTFParseError,
    UnsupportedEDTF,
    edtf_fields,
)

EDTF_TYPE = T.StructType(
    [
        T.StructField("dt", T.StringType()),
        T.StructField("is_uncertain", T.BooleanType()),
        T.StructField("is_approximate", T.BooleanType()),
        T.StructField("is_uncertain_and_approximate", T.BooleanType()),
        T.StructField("precision", T.IntegerType()),
        T.StructField("edtf_error", T.StringType()),
    ]
)

_NULL = {
    "dt": None, "is_uncertain": None, "is_approximate": None,
    "is_uncertain_and_approximate": None, "precision": None, "edtf_error": None,
}


@pandas_udf(EDTF_TYPE)
def edtf_udf(edtf: pd.Series) -> pd.DataFrame:
    out = []
    for value in edtf:
        if value is None:
            out.append(dict(_NULL))
            continue
        try:
            f = edtf_fields(value)
            out.append({**f, "edtf_error": None})
        except UnsupportedEDTF:
            out.append({**_NULL, "edtf_error": "unsupported"})
        except (EDTFParseError, Exception):
            out.append({**_NULL, "edtf_error": "parse_error"})
    return pd.DataFrame(out)


def edtf_stage(df: DataFrame, edtf_col: str, out_prefix: str | None = None) -> DataFrame:
    """Add the 5 date fields for one EDTF string column. Field names
    follow the reference pattern ``{name}__dt[...]`` (dates.py:69-75)."""
    name = out_prefix or edtf_col.replace("__edtf", "")
    s = edtf_udf(F.col(edtf_col))
    return (
        df.withColumn("_edtf", s)
        .withColumn(f"{name}__dt", F.col("_edtf")["dt"])
        .withColumn(f"{name}__dt_is_uncertain", F.col("_edtf")["is_uncertain"])
        .withColumn(f"{name}__dt_is_approximate", F.col("_edtf")["is_approximate"])
        .withColumn(
            f"{name}__dt_is_uncertain_and_approximate",
            F.col("_edtf")["is_uncertain_and_approximate"],
        )
        .withColumn(f"{name}__dt_precision__int", F.col("_edtf")["precision"])
        .withColumn("edtf_error", F.col("_edtf")["edtf_error"])
        .drop("_edtf")
    )

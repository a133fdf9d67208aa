"""Scalar field builders — native Column expressions (JVM-side).

Everything here compiles into Catalyst expressions inside
WholeStageCodegen; no Python executes per row.
"""

from solrizer_spark.functions.datetime_fns import solr_timestamp  # noqa: F401
from solrizer_spark.functions.language import (  # noqa: F401
    lang_names_df,
    language_name_col,
    language_suffix_col,
)

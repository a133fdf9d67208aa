"""Timestamp normalization (reference: solr_datetime,
src/solrizer/indexers/utils.py:4-23).

The reference parses ISO-8601, converts to UTC, and renders with a
"Z" marker. Our input column is already a TimestampType (stored UTC);
rendering is a single codegen'd ``date_format``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def solr_timestamp(ts: Column | str) -> Column:
    """Render a timestamp as Solr's UTC Z-notation,
    ``YYYY-MM-DDTHH:MM:SSZ`` (seconds precision; the reference keeps
    whatever precision the source had — our corpus timestamps are
    whole seconds). Requires ``spark.sql.session.timeZone=UTC``
    (set by ``solrizer_spark.session.get_spark``)."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def solr_timestamp_from_string(dt_string: Column | str) -> Column:
    """ISO-8601 string (any offset) → UTC Z-notation string — the
    direct analog of the reference's string→string conversion."""
    col = F.col(dt_string) if isinstance(dt_string, str) else dt_string
    return F.date_format(F.to_timestamp(col), "yyyy-MM-dd'T'HH:mm:ss'Z'")

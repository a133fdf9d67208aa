"""Atomic update diff — incremental re-index support.

Reference semantics (solr.py:27-58 + :6-18): fetch the previously
indexed doc, field-wise diff against the new doc, and emit a Solr
atomic update: changed/added fields → ``{field: {'set': new_value}}``,
removed fields → ``{'set': None}``; ``id`` copied verbatim;
``_version_`` skipped.

Spark re-expression: the "previous doc" is the prior snapshot of the
docs table (Iceberg time travel / previous parquet output). A single
full-outer join on id + per-field ``when(old ≠ new)`` expressions
produce the update set. At 10^12 rows both sides are bucketed by the
same url-hash key, so the join is co-partitioned (no extra shuffle
when both tables are written partitionBy(partition_key)); with an
Iceberg catalog the same dataflow drives a MERGE INTO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def atomic_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "id",
    fields: list[str] | None = None,
    skip: tuple[str, ...] = ("_version_",),
) -> DataFrame:
    """Per-id field diffs.

    Returns ``(id, op, updates map<string,string>)`` where op ∈
    {'add','update','delete'} and ``updates`` holds JSON-encoded
    ``{'set': value}`` entries for changed fields only. Unchanged rows
    are dropped (the reference returns an empty update for them).
    """
    old_cols = {f.name for f in old.schema.fields}
    new_cols = {f.name for f in new.schema.fields}
    if fields is None:
        # UNION of the schemas: a field added in the new snapshot must
        # emit {'set': value} for existing docs, and a field dropped
        # from the new schema must emit {'set': null} (solr.py:27-58)
        fields = sorted((old_cols | new_cols) - {id_col} - set(skip))

    types = {f.name: f.dataType for f in list(old.schema.fields) + list(new.schema.fields)}

    def side(df, cols_present):
        return df.select(
            id_col,
            *[
                F.col(f) if f in cols_present else F.lit(None).cast(types[f]).alias(f)
                for f in fields
            ],
        )

    o = side(old, old_cols).alias("o")
    n = side(new, new_cols).alias("n")
    joined = o.join(n, on=F.col(f"o.{id_col}") == F.col(f"n.{id_col}"), how="full_outer")

    in_old = F.col(f"o.{id_col}").isNotNull()
    in_new = F.col(f"n.{id_col}").isNotNull()

    entries = []
    for f in fields:
        ov, nv = F.col(f"o.{f}"), F.col(f"n.{f}")
        changed = ~ov.eqNullSafe(nv)
        # {'set': new-or-null}, JSON-encoded per value
        set_json = F.when(
            nv.isNotNull(), F.to_json(F.struct(nv.alias("set")))
        ).otherwise(F.lit('{"set":null}'))
        entries.append(
            F.when(in_old & in_new & changed, F.struct(F.lit(f).alias("key"), set_json.alias("value")))
        )
    updates = F.map_from_entries(F.array_compact(F.array(*entries)))

    op = (
        F.when(in_old & ~in_new, F.lit("delete"))
        .when(~in_old & in_new, F.lit("add"))
        .otherwise(F.lit("update"))
    )
    out_id = F.coalesce(F.col(f"n.{id_col}"), F.col(f"o.{id_col}"))
    return (
        joined.select(out_id.alias(id_col), op.alias("op"), updates.alias("updates"))
        .where((F.col("op") != "update") | (F.size(F.map_keys(F.col("updates"))) > 0))
    )

"""Audit stamping (C2) and per-column change diffs (C3).

Re-expresses the reference's plpgsql triggers as composable column
expressions over ``before``/``after`` structs:

- C2 audit stamp: ``new.modified_by := current_user; new.modified_at :=
  current_timestamp`` (``/root/reference/README.md:187-202``).
- C3 change diff: for each column where ``new.x IS DISTINCT FROM old.x``,
  record ``{"x": {"old": ..., "new": ...}}`` plus who/when, stored as a
  JSON document (``/root/reference/README.md:219-251``, result shape at
  ``README.md:257-263``).

``IS DISTINCT FROM`` is the null-safe inequality: ``NOT (old <=> new)``.
Everything is JVM-side expression work — applies unchanged to a 100 TB
change stream because it is purely row-local (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def audit_stamp(df: DataFrame, user: str, ts: Column | None = None) -> DataFrame:
    """C2: stamp modified_by/modified_at on every row.

    ``ts`` defaults to ``current_timestamp()``; pass a literal for
    deterministic tests.
    """
    return df.withColumn("modified_by", F.lit(user)).withColumn(
        "modified_at", ts if ts is not None else F.current_timestamp()
    )


def change_diff(
    before: Column,
    after: Column,
    columns: list[str],
    modified_by: Column | None = None,
    modified_at: Column | None = None,
) -> Column:
    """C3: JSON document of per-column old/new for changed columns only.

    Shape matches ``/root/reference/README.md:257-263``:
    ``{"amount": {"old": "205.97", "new": "101.97"},
       "modified_by": "postgres", "modified_at": "..."}``
    Values are rendered as strings (the jsonb trigger stores text); columns
    that did not change are omitted via ``map_filter``.
    """
    entries = []
    for name in columns:
        old_v = before.getField(name).cast("string")
        new_v = after.getField(name).cast("string")
        entries.append(F.lit(name))
        entries.append(
            F.when(
                ~old_v.eqNullSafe(new_v),  # IS DISTINCT FROM
                F.struct(old_v.alias("old"), new_v.alias("new")),
            ).otherwise(F.lit(None))
        )
    diff_map = F.map_filter(F.create_map(*entries), lambda _, v: v.isNotNull())
    doc = F.to_json(diff_map)
    if modified_by is not None or modified_at is not None:
        meta = F.to_json(
            F.struct(
                *(
                    ([modified_by.alias("modified_by")] if modified_by is not None else [])
                    + ([modified_at.cast("string").alias("modified_at")] if modified_at is not None else [])
                )
            )
        )
        # merge the two JSON objects ({...diff} || {...meta}), mirroring the
        # jsonb `||` in the trigger (README.md:244-248)
        doc = F.when(
            F.length(doc) > 2,
            F.concat(
                F.substring(doc, F.lit(1), F.length(doc) - 1),
                F.lit(","),
                F.substring(meta, F.lit(2), F.length(meta) - 1),
            ),
        ).otherwise(meta)
    return doc


def with_change_diff(
    df: DataFrame,
    columns: list[str],
    user: str,
    before_col: str = "before",
    after_col: str = "after",
    out_col: str = "change_info",
    ts: Column | None = None,
) -> DataFrame:
    """Attach a ``change_info`` JSON column to a parsed change stream."""
    ts = ts if ts is not None else F.current_timestamp()
    return df.withColumn(
        out_col,
        F.when(
            F.col(before_col).isNotNull() & F.col(after_col).isNotNull(),
            change_diff(F.col(before_col), F.col(after_col), columns, F.lit(user), ts),
        ),
    )

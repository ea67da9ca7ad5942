"""Bucketed catalog tables: co-located joins without a shuffle.

At 100 TB the transcripts table is joined on ``conv_id`` again and
again (metadata enrichment, dedup verdict application, quality-score
joins). Writing both sides bucketed on the join key with the same
bucket count lets every such join run shuffle-free: Spark matches
bucket files pairwise, so the sort-merge join needs no Exchange on
either side — the shuffle was paid ONCE at write time and amortizes
over every subsequent join. ``sortBy`` on the same key also drops the
in-task Sort.

This is the storage-layout counterpart of the runtime strategies the
pipeline already uses (broadcast for small dims, AQE skew splitting,
salted repartition): use bucketing when the SAME large-large join key
recurs across jobs. The co-located plan shape is pinned by
tests/test_bucketing.py (bucketed join: no Exchange; identical
non-bucketed control: two Exchanges).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: Sequence[str] = (),
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-ordered)
    catalog table. Overwrites an existing table of the same name."""
    writer = (df.write
              .format('parquet')
              .mode('overwrite')
              .bucketBy(n_buckets, bucket_col))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = 'inner',
) -> DataFrame:
    """Join two same-bucketed tables; the merge hint keeps the planner
    on sort-merge (broadcast would hide the co-location win and cannot
    apply once both sides are large)."""
    left = spark.table(left_table).hint('merge')
    right = spark.table(right_table)
    return left.join(right, on, how)

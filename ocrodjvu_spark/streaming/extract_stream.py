"""Streaming extraction: transcripts arriving as files -> extracted turns.

The reference is a pure batch transform (SURVEY.md §2.9: no stateful
streaming in scope), but a 10^12-turn table is fed continuously, so the
engine exposes the same extraction as a Structured Streaming flow:

* ``readStream`` over the transcripts location (file source here; Kafka /
  Iceberg-CDC in production) with the same schema;
* the identical Arrow-batched extraction UDF — scalar pandas UDFs are
  streaming-safe (stateless projection);
* watermark on ``ts`` + windowed per-conversation aggregation for the
  live metrics view (late turns within the watermark still count);
* ``foreachBatch``/file sink for the extracted output, partitioned like
  the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import pipeline

TRANSCRIPTS_DDL = (
    'conv_id string, turn_idx int, role string, text string, '
    'tool string, ts timestamp'
)


def read_transcripts_stream(spark: SparkSession, input_path: str,
                            max_files_per_trigger: int = 16) -> DataFrame:
    return (
        spark.readStream
        .schema(TRANSCRIPTS_DDL)
        .option('maxFilesPerTrigger', max_files_per_trigger)
        .parquet(input_path)
    )


def extract_stream(stream: DataFrame, **extract_kwargs) -> DataFrame:
    """Same extraction operator, applied to an unbounded DataFrame."""
    return pipeline.extract_turns(stream, **extract_kwargs)


def live_conversation_metrics(extracted: DataFrame,
                              watermark: str = '10 minutes',
                              window: str = '5 minutes') -> DataFrame:
    """Windowed per-conversation extraction metrics with late-data bound."""
    return (
        extracted
        .withWatermark('ts', watermark)
        .groupBy(F.window('ts', window), F.col('conv_id'))
        .agg(
            # streaming rows are exploded pages; distinct-turn counting
            # needs the batch path (countDistinct is not supported with
            # append-mode streaming aggregations)
            F.count('*').alias('n_pages'),
            F.sum(F.when(F.col('error').isNotNull(), 1).otherwise(0))
             .alias('n_errors'),
            F.sum(F.length(F.coalesce(F.col('extracted_text'), F.lit(''))))
             .alias('n_chars'),
        )
    )


def dedup_stream(stream: DataFrame,
                 watermark: str = '10 minutes') -> DataFrame:
    """Streaming exact dedup: the streaming face of the batch
    ``dedup_exact`` operator.

    ``dropDuplicatesWithinWatermark`` on the normalized-text hash keeps
    the FIRST arrival of each key and suppresses re-deliveries and
    duplicate turns that arrive within the watermark horizon; state for
    keys older than the watermark is evicted, so memory is bounded by
    (arrival rate x horizon) instead of growing with the corpus — the
    only dedup shape that survives an unbounded 10^12-turn feed.
    Exactly-once upstream delivery composes with this for end-to-end
    dedup; duplicates farther apart than the horizon belong to the
    batch compaction pass (``dedup_exact``).
    """
    from ..functions.textops import norm_text
    keyed = stream.withColumn('text_hash', F.md5(norm_text('text')))
    return (keyed.withWatermark('ts', watermark)
            .dropDuplicatesWithinWatermark(['text_hash']))


def run_to_parquet(extracted: DataFrame, output_path: str,
                   checkpoint_path: str, available_now: bool = True):
    """Drain the stream to parquet (availableNow processes the backlog
    and stops — the streaming analogue of a batch catch-up run)."""
    writer = (
        extracted.writeStream
        .format('parquet')
        .option('path', output_path)
        .option('checkpointLocation', checkpoint_path)
        .outputMode('append')
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

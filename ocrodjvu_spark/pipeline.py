"""The extraction pipeline: relational shell around the kernel UDF.

Scan -> (optional salted repartition) -> Arrow-batched extraction ->
page explode -> stable (conv_id, turn_idx) ordering. All relational steps
are Catalyst-native; the only Python is inside the extraction UDF.

Scale design (10^12-turn table, 1000 executors):

* **Salted repartition.** Turns are independent until final reassembly, so
  we repartition on ``(conv_id, pmod(hash(turn_idx), salt))`` — a
  mega-conversation's turns spread over ``salt`` buckets instead of
  hot-spotting one task (reference analogue: the per-page thread pool,
  lib/cli/ocrodjvu.py:467-536, which also processes pages of one document
  in parallel).
* **No shuffle in the extract stage itself** — the UDF is a scalar
  projection; Catalyst pipelines scan -> filter -> extract in one stage.
* **Reassembly** is the only required shuffle: a groupBy on conv_id with
  in-group sort by turn_idx (W3 "stable turn ordering"); AQE handles
  residual skew.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions import extract as extract_fn
from .functions.extract import make_extract_udf

KEY_COLUMNS = ('conv_id', 'turn_idx')
META_COLUMNS = ('role', 'tool', 'ts')


def salted_repartition(
    df: DataFrame,
    num_partitions: Optional[int] = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Spread skewed conv_id groups across salt_buckets partitions."""
    salt = F.pmod(F.xxhash64('turn_idx'), F.lit(salt_buckets))
    if num_partitions:
        return df.repartition(num_partitions, F.col('conv_id'), salt)
    return df.repartition(F.col('conv_id'), salt)


def extract_turns(
    df: DataFrame,
    details: str = 'words',
    uax29=None,
    rotation: int = 0,
    page_size=None,
    fix_utf8: bool = False,
    keep_columns: Sequence[str] = META_COLUMNS,
    salt_buckets: Optional[int] = None,
    num_partitions: Optional[int] = None,
    emit_spans=True,
    emit_sexpr: bool = True,
) -> DataFrame:
    """transcripts -> per-page extraction results.

    Output columns: conv_id, turn_idx, *keep_columns, dialect, error,
    page_idx, spans, extracted_text, extracted_sexpr. Failed turns keep
    their row with error set and null payload ("--on-error resume"
    semantics, reference lib/cli/ocrodjvu.py:494-501). Pass
    ``emit_spans=False`` / ``emit_sexpr=False`` to elide the heavy
    payloads for text-only consumers. ``emit_spans='words'`` /
    ``'packed'`` (synonyms since round 7) ship word spans as one
    delimited string per page (``spans_packed`` replaces the ``spans``
    column; see schema.PAGE_RESULT_PACKED) — the lowest-Arrow-volume
    spans path, decoded JVM-side by ``word_spans``, measured 9.5%
    faster end-to-end than the former array-of-structs words mode.
    ``emit_spans=True`` keeps the full span structs (all zone levels).
    """
    if salt_buckets:
        df = salted_repartition(df, num_partitions, salt_buckets)
    extract = make_extract_udf(
        details=details, uax29=uax29, rotation=rotation,
        page_size=page_size, fix_utf8=fix_utf8,
        emit_spans=emit_spans, emit_sexpr=emit_sexpr)
    keep = [c for c in keep_columns if c in df.columns]
    result = df.select(
        *KEY_COLUMNS, *keep, extract(F.col('text')).alias('_r'))
    exploded = result.select(
        *KEY_COLUMNS, *keep,
        F.col('_r.dialect').alias('dialect'),
        F.col('_r.error').alias('error'),
        F.posexplode_outer('_r.pages').alias('page_idx', 'page'),
    )
    spans_col = ('spans_packed' if emit_spans in ('packed', 'words')
                 else 'spans')
    return exploded.select(
        *KEY_COLUMNS, *keep, 'dialect', 'error', 'page_idx',
        F.col(f'page.{spans_col}').alias(spans_col),
        F.col('page.extracted_text').alias('extracted_text'),
        F.col('page.extracted_sexpr').alias('extracted_sexpr'),
    )


def word_spans(extracted: DataFrame) -> DataFrame:
    """Explode word-level spans: one row per extracted word, in order.

    Requires an extraction run with ``emit_spans=True`` or, cheaper,
    ``emit_spans='words'`` / ``'packed'`` (ONE delimited string per
    page carrying only word spans; decoded here with pure JVM
    split/cast inside codegen — the lowest Arrow-transfer-volume
    path). Spans elided upstream (``False``) explode to zero rows.
    """
    if 'spans_packed' in extracted.columns:
        packed = F.col('spans_packed')
        recs = F.when(
            packed.isNull() | (packed == ''), F.array()
        ).otherwise(F.split(packed, extract_fn.SPAN_RS))
        fields = F.split(F.col('_rec'), extract_fn.SPAN_FS, 5)
        return (
            extracted
            .select(
                *KEY_COLUMNS, 'page_idx',
                F.posexplode(recs).alias('word_idx', '_rec'),
            )
            .select(
                *KEY_COLUMNS, 'page_idx', 'word_idx',
                # get (0-based) is NULL out of range: a 4-field record
                # is a NULL-text word (packed/struct parity; '' stays
                # a real 5th field because split keeps trailing
                # empties)
                F.get(fields, 4).alias('word'),
                F.element_at(fields, 1).cast('int').alias('x0'),
                F.element_at(fields, 2).cast('int').alias('y0'),
                F.element_at(fields, 3).cast('int').alias('x1'),
                F.element_at(fields, 4).cast('int').alias('y1'),
            )
        )
    words = F.filter(F.col('spans'), lambda s: s.zone_type == F.lit('word'))
    return (
        extracted
        .select(
            *KEY_COLUMNS, 'page_idx',
            F.posexplode(words).alias('word_idx', 'span'),
        )
        .select(
            *KEY_COLUMNS, 'page_idx', 'word_idx',
            F.col('span.text').alias('word'),
            F.col('span.x0').alias('x0'),
            F.col('span.y0').alias('y0'),
            F.col('span.x1').alias('x1'),
            F.col('span.y1').alias('y1'),
        )
    )


def reassemble_conversations(extracted: DataFrame) -> DataFrame:
    """Stable per-conversation document: turns joined in turn_idx order.

    One aggregation (map-side partial + final), no window: collect
    (turn_idx, text) structs, sort in-group, join. The struct sort key is
    (turn_idx, page_idx) so multi-page turns stay ordered too.
    """
    return (
        extracted
        .where(F.col('extracted_text').isNotNull())
        .groupBy('conv_id')
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct('turn_idx', 'page_idx',
                                     'extracted_text'))),
                    lambda s: s.extracted_text,
                ),
                '\n',
            ).alias('conversation_text'),
            # distinct turns, not exploded page rows: count each turn's
            # first page (plain hash aggregate; countDistinct would
            # force an Expand through the shuffle)
            F.count(F.when(F.col('page_idx') == 0, 1)).alias('n_turns'),
        )
    )


def roundtrip_turns(extracted: DataFrame, details: str = 'words',
                    uax29=None) -> DataFrame:
    """Text-layer round trip: extracted sexpr -> hOCR -> extract again.

    Page dimensions come from the extracted PAGE span (selected by zone
    type), so this requires an ``emit_spans=True`` run: spans-elided
    runs (``False``) surface a per-row error instead of wrong geometry,
    and the packed word-span modes carry no ``spans`` column at all.
    A fixed-point check downstream asserts the re-extracted text equals
    the original (north-star round-trip semantics).
    """
    from .functions.emit import make_emit_hocr_udf
    emit = make_emit_hocr_udf(full_document=True)
    # the PAGE span, selected by type rather than position: under
    # emit_spans='words' there is no page span (spans[0] would be the
    # first word), so this yields null dims and the emit UDF reports an
    # explicit error instead of silently mis-sizing the page
    page = F.element_at(
        F.filter(F.col('spans'),
                 lambda s: s.zone_type == F.lit('page')), 1)
    markup = extracted.where(F.col('extracted_sexpr').isNotNull()).select(
        'conv_id', 'turn_idx',
        emit(F.col('extracted_sexpr'), page.x1, page.y1).alias('_e'),
    )
    extract = make_extract_udf(details=details, uax29=uax29)
    result = markup.select(
        'conv_id', 'turn_idx', F.col('_e.error').alias('emit_error'),
        extract(F.col('_e.hocr')).alias('_r'))
    return result.select(
        'conv_id', 'turn_idx',
        F.coalesce('emit_error', F.col('_r.error')).alias('error'),
        F.element_at('_r.pages', 1)['extracted_text']
         .alias('extracted_text'),
        F.element_at('_r.pages', 1)['extracted_sexpr']
         .alias('extracted_sexpr'),
    )


def extraction_metrics(extracted: DataFrame) -> DataFrame:
    """Per-conversation extraction metrics (sidecar table content)."""
    return extracted.groupBy('conv_id').agg(
        # distinct turns, not exploded page rows: count each turn's first
        # page (error rows have null page_idx and still count as a turn);
        # plain hash aggregate, no countDistinct Expand
        F.count(F.when(F.col('page_idx').isNull()
                       | (F.col('page_idx') == 0), 1)).alias('n_turns'),
        F.sum(F.when(F.col('error').isNotNull(), 1).otherwise(0))
         .alias('n_errors'),
        F.sum(F.size(F.coalesce(F.col('spans'), F.array())))
         .alias('n_spans'),
        F.sum(F.length(F.coalesce(F.col('extracted_text'), F.lit(''))))
         .alias('n_chars'),
    )

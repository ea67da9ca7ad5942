"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction at sf0.001.
``queries()`` / ``oracle_sql()`` pair every implemented operator with an
ANSI-SQL oracle DuckDB runs on the same parquet tables.

The extraction queries operate on a transcripts table synthesized
deterministically (inside Catalyst) from ``documents``; the hOCR wrapping
is invertible by construction, so the oracle recomputes expected outputs
directly from ``documents.text`` — this makes the Python extraction
kernel itself verifiable end-to-end against SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocrodjvu_spark import pipeline
from ocrodjvu_spark.sources import transcripts as T

SF0001 = '/root/testdata/sf0.001'


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full hOCR extraction over the sf0.001 transcripts."""
    df = T.synthesize_transcripts(spark, SF0001)
    return pipeline.extract_turns(df).select(
        'conv_id', 'turn_idx', 'dialect', 'error',
        'extracted_text', 'extracted_sexpr',
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def _q_extract_text(spark, sf_dir):
    df = T.synthesize_transcripts(spark, sf_dir)
    return pipeline.extract_turns(df).select(
        'conv_id', 'turn_idx', 'extracted_text')


def _q_extract_word_spans(spark, sf_dir):
    df = T.synthesize_transcripts(spark, sf_dir)
    extracted = pipeline.extract_turns(df)
    return pipeline.word_spans(extracted).select(
        'conv_id', 'turn_idx', 'word_idx', 'word', 'x0', 'y0', 'x1', 'y1')


def _q_extract_sexpr(spark, sf_dir):
    df = T.synthesize_transcripts(spark, sf_dir)
    return pipeline.extract_turns(df).select(
        'conv_id', 'turn_idx', 'extracted_sexpr')


def _q_turn_filter(spark, sf_dir):
    # F1 page-range filter: predicate applied BEFORE extraction so it can
    # push into the scan (partition pruning on a real Iceberg table).
    df = T.synthesize_transcripts(spark, sf_dir)
    df = df.where((F.col('turn_idx') >= 2) & (F.col('turn_idx') <= 5))
    return pipeline.extract_turns(df).select(
        'conv_id', 'turn_idx', 'extracted_text')


def _q_extract_roundtrip(spark, sf_dir):
    # text-layer round trip: extract -> emit hOCR (djvu2hocr semantics)
    # -> extract again; fixed point means the oracle is the same as
    # extract_text
    df = T.synthesize_transcripts(spark, sf_dir)
    extracted = pipeline.extract_turns(df)
    return pipeline.roundtrip_turns(extracted).select(
        'conv_id', 'turn_idx', 'extracted_text')


def _q_turns_per_conv(spark, sf_dir):
    # A4 per-document page count
    df = T.synthesize_transcripts(spark, sf_dir)
    return df.groupBy('conv_id').agg(
        F.count('*').alias('n_turns'),
        F.max('turn_idx').alias('max_turn_idx'),
    )


def _q_conversation_reassembly(spark, sf_dir):
    # W3 stable (conv_id, turn_idx) ordering -> per-conversation document
    df = T.synthesize_transcripts(spark, sf_dir)
    extracted = pipeline.extract_turns(df)
    return pipeline.reassemble_conversations(extracted).select(
        'conv_id', 'conversation_text', 'n_turns')


def _q_extraction_metrics(spark, sf_dir):
    # sidecar metrics rollup (lineage/metrics table content)
    df = T.synthesize_transcripts(spark, sf_dir)
    extracted = pipeline.extract_turns(df)
    return pipeline.extraction_metrics(extracted).select(
        'conv_id', 'n_turns', 'n_errors', 'n_spans', 'n_chars')


def _q_dedup_exact(spark, sf_dir):
    # exact dedup: hash-groupBy on normalized text (map-side partial agg)
    docs = T.load_table(spark, sf_dir, 'documents')
    norm = F.regexp_replace(F.trim('text'), r'\s+', ' ')
    return docs.groupBy(F.md5(norm).alias('text_hash')).agg(
        F.min('doc_id').alias('rep_doc_id'),
        F.count('*').alias('n_dupes'),
    )


def _q_token_stats(spark, sf_dir):
    # token counting + quality-ish stats, all JVM-side
    docs = T.load_table(spark, sf_dir, 'documents')
    tokens = T.tokens_col('text')
    return docs.select(
        'doc_id',
        F.size(tokens).alias('n_tokens'),
        F.length(F.trim('text')).cast('long').alias('n_text_chars'),
        F.round(
            F.aggregate(
                tokens, F.lit(0).cast('long'),
                lambda acc, t: acc + F.length(t),
            ) / F.size(tokens),
            4,
        ).alias('avg_token_len'),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        'extract_text': _q_extract_text,
        'extract_word_spans': _q_extract_word_spans,
        'extract_sexpr': _q_extract_sexpr,
        'extract_roundtrip': _q_extract_roundtrip,
        'turn_filter': _q_turn_filter,
        'turns_per_conv': _q_turns_per_conv,
        'conversation_reassembly': _q_conversation_reassembly,
        'extraction_metrics': _q_extraction_metrics,
        'dedup_exact': _q_dedup_exact,
        'token_stats': _q_token_stats,
    }


# --------------------------------------------------------------------------
# oracles (DuckDB SQL over the same parquet views)
# --------------------------------------------------------------------------

_CONV = T.SQL_CONV_ID
_TIDX = T.SQL_TURN_IDX
_NORM = T.SQL_NORM_TEXT
_TOKS = T.SQL_TOKENS

_WORDS_CTE = f'''
WITH words AS (
    SELECT {_CONV} AS conv_id,
           {_TIDX} AS turn_idx,
           t.tok AS word,
           CAST(t.i - 1 AS INTEGER) AS word_idx,
           len({_TOKS}) AS n_words
    FROM documents,
         LATERAL (
            SELECT UNNEST({_TOKS}) AS tok,
                   generate_subscripts({_TOKS}, 1) AS i
         ) AS t
)
'''


def oracle_sql() -> dict[str, str]:
    return {
        'extract_text': f'''
            SELECT {_CONV} AS conv_id, {_TIDX} AS turn_idx,
                   {_NORM} AS extracted_text
            FROM documents
        ''',
        'extract_word_spans': _WORDS_CTE + '''
            SELECT conv_id, turn_idx, word_idx, word,
                   CAST(10 + 100 * word_idx AS INTEGER) AS x0,
                   CAST(940 AS INTEGER) AS y0,
                   CAST(100 + 100 * word_idx AS INTEGER) AS x1,
                   CAST(990 AS INTEGER) AS y1
            FROM words
        ''',
        'extract_sexpr': f'''
            SELECT {_CONV} AS conv_id, {_TIDX} AS turn_idx,
                   '(page 0 0 ' || CAST(len({_TOKS}) * 100 + 100 AS VARCHAR)
                   || ' 1000 (line 10 940 '
                   || CAST(len({_TOKS}) * 100 AS VARCHAR) || ' 990 '
                   || (
                        SELECT string_agg(
                            '(word ' || CAST(10 + 100 * (t.i - 1) AS VARCHAR)
                            || ' 940 '
                            || CAST(100 + 100 * (t.i - 1) AS VARCHAR)
                            || ' 990 "' || t.tok || '")', ' '
                            ORDER BY t.i)
                        FROM (
                            SELECT UNNEST({_TOKS}) AS tok,
                                   generate_subscripts({_TOKS}, 1) AS i
                        ) AS t
                   )
                   || '))' AS extracted_sexpr
            FROM documents
        ''',
        'extract_roundtrip': f'''
            SELECT {_CONV} AS conv_id, {_TIDX} AS turn_idx,
                   {_NORM} AS extracted_text
            FROM documents
        ''',
        'turn_filter': f'''
            SELECT {_CONV} AS conv_id, {_TIDX} AS turn_idx,
                   {_NORM} AS extracted_text
            FROM documents
            WHERE {_TIDX} BETWEEN 2 AND 5
        ''',
        'turns_per_conv': f'''
            SELECT {_CONV} AS conv_id,
                   count(*) AS n_turns,
                   max({_TIDX}) AS max_turn_idx
            FROM documents
            GROUP BY 1
        ''',
        'conversation_reassembly': f'''
            SELECT {_CONV} AS conv_id,
                   string_agg({_NORM}, chr(10) ORDER BY {_TIDX})
                       AS conversation_text,
                   count(*) AS n_turns
            FROM documents
            GROUP BY 1
        ''',
        'extraction_metrics': f'''
            SELECT {_CONV} AS conv_id,
                   count(*) AS n_turns,
                   CAST(0 AS BIGINT) AS n_errors,
                   CAST(sum(len({_TOKS}) + 2) AS BIGINT) AS n_spans,
                   CAST(sum(length({_NORM})) AS BIGINT) AS n_chars
            FROM documents
            GROUP BY 1
        ''',
        'dedup_exact': f'''
            SELECT md5({_NORM}) AS text_hash,
                   min(doc_id) AS rep_doc_id,
                   count(*) AS n_dupes
            FROM documents
            GROUP BY 1
        ''',
        'token_stats': f'''
            SELECT doc_id,
                   CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
                   CAST(length(trim(text)) AS BIGINT) AS n_text_chars,
                   round(CAST(length(replace({_NORM}, ' ', ''))
                              AS DOUBLE) / len({_TOKS}), 4)
                       AS avg_token_len
            FROM documents
        ''',
    }

"""Deterministic ocrad-ORF / gocr-XML payload synthesizers (Catalyst-only).

Like the hOCR transcripts synthesizer, these wrap ``documents`` text into
the alternate engine formats so the adapter parsers (kernel/engines.py)
can be verified end-to-end against SQL oracles: char i of the line sits
at ``x = 10 + 10*i, y = 10, w = 8, h = 10`` on a 1000x100 page, so every
derived word bbox is exactly recomputable.

Only the first MAX_TOKENS tokens are wrapped (bounded payload size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .transcripts import load_table, tokens_col

PAGE_W = 1000
PAGE_H = 100
CHAR_X0 = 10
CHAR_PITCH = 10
CHAR_W = 8
CHAR_Y = 10
CHAR_H = 10
MAX_TOKENS = 5


def line_text_col(text_col='text') -> Column:
    return F.array_join(F.slice(tokens_col(text_col), 1, MAX_TOKENS), ' ')


def _char_records_orf(line_text: Column) -> Column:
    chars = F.split(line_text, '')
    recs = F.transform(
        chars,
        lambda c, i: F.concat(
            (F.lit(CHAR_X0) + i * CHAR_PITCH).cast('string'),
            F.lit(f' {CHAR_Y} {CHAR_W} {CHAR_H}; 1, \''), c, F.lit('\'0'),
        ),
    )
    return F.array_join(recs, '\n')


def synthesize_orf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, 'documents').select('doc_id', 'text')
    line = line_text_col('text')
    orf = F.concat(
        F.lit('total text blocks 1\n'
              f'text block 1 0 0 {PAGE_W} {PAGE_H}\n'
              'lines 1\n'
              'line 1 8 '),
        F.length(line).cast('string'),
        F.lit(f' {PAGE_W} {PAGE_H}\n'),
        _char_records_orf(line),
        F.lit('\n'),
    )
    return docs.select('doc_id', orf.alias('text'))


def _char_records_gocr(line_text: Column) -> Column:
    chars = F.split(line_text, '')
    recs = F.transform(
        chars,
        lambda c, i: F.when(
            c == ' ',
            F.concat(
                F.lit('<space x="'),
                (F.lit(CHAR_X0) + i * CHAR_PITCH).cast('string'),
                F.lit(f'" y="{CHAR_Y}" dx="{CHAR_W}" dy="{CHAR_H}"/>'),
            ),
        ).otherwise(
            F.concat(
                F.lit('<box x="'),
                (F.lit(CHAR_X0) + i * CHAR_PITCH).cast('string'),
                F.lit(f'" y="{CHAR_Y}" dx="{CHAR_W}" dy="{CHAR_H}" value="'),
                c, F.lit('"/>'),
            ),
        ),
    )
    return F.array_join(recs, '')


def synthesize_gocr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, 'documents').select('doc_id', 'text')
    line = line_text_col('text')
    xml = F.concat(
        F.lit('<document><page><block x="0" y="0" '
              f'dx="{PAGE_W}" dy="{PAGE_H}"><line>'),
        _char_records_gocr(line),
        F.lit('</line></block></page></document>'),
    )
    return docs.select('doc_id', xml.alias('text'))


# DuckDB oracle fragment: word spans implied by the char layout.
# Word k (1-based, over the first MAX_TOKENS tokens): chars occupy global
# offsets [s_k, e_k) where s_k = (sum of previous token lengths) + (k-1);
# x0 = 10 + 10*s_k, x1 = 18 + 10*(e_k - 1); y flips against PAGE_H:
# y0 = 100 - 20 = 80, y1 = 100 - 10 = 90.
SQL_ENGINE_WORDS = f'''
WITH tok AS (
    SELECT doc_id,
           string_split_regex(trim(text), '\\s+')[1:{MAX_TOKENS}] AS toks
    FROM documents
),
w AS (
    SELECT doc_id, t.tok AS word,
           CAST(t.i - 1 AS INTEGER) AS word_idx,
           CAST(sum(length(t.tok))
                OVER (PARTITION BY doc_id ORDER BY t.i
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT) AS prev_chars
    FROM tok,
         LATERAL (
            SELECT UNNEST(toks) AS tok,
                   generate_subscripts(toks, 1) AS i
         ) AS t
),
spans AS (
    SELECT doc_id, word_idx, word,
           COALESCE(prev_chars, 0) + word_idx AS s_k,
           COALESCE(prev_chars, 0) + word_idx + length(word) AS e_k
    FROM w
)
SELECT doc_id, word_idx, word,
       CAST({CHAR_X0} + {CHAR_PITCH} * s_k AS INTEGER) AS x0,
       CAST({PAGE_H - CHAR_Y - CHAR_H} AS INTEGER) AS y0,
       CAST({CHAR_X0 + CHAR_W} + {CHAR_PITCH} * (e_k - 1) AS INTEGER) AS x1,
       CAST({PAGE_H - CHAR_Y} AS INTEGER) AS y1
FROM spans
'''

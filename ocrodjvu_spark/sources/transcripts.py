"""Deterministic transcripts synthesizer + table loaders.

The engine's production input is an Iceberg table of conversation turns
``(conv_id, turn_idx, role, text, tool, ts)`` whose ``text`` carries
HTML-ish markup (BASELINE.json input_hint). For tests/benchmarks we
synthesize exactly that shape from the driver's ``documents`` parquet —
fully inside Catalyst (no Python in the generation path), so the
synthesis itself is also SQL-expressible for the DuckDB oracle:

* ``conv_id = 'conv-' || floor(sqrt(doc_id))`` — conversation sizes grow
  linearly (1, 3, 5, ... turns), giving the skewed mega-conversation
  distribution the salted repartition is designed for;
* ``turn_idx = doc_id - floor(sqrt(doc_id))^2 + 1`` — 1-based, unique per
  conversation;
* ``text`` = the document's words wrapped in deterministic hOCR: word i
  gets ``bbox (10+100i) 10 (100+100i) 60`` on a ``W x 1000`` page, so the
  extraction kernel's output is exactly recomputable in SQL.

Loaders read parquet here; at deployment the same code points at Iceberg
(``spark.read.table``) and inherits partition pruning on conv_id/ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGE_HEIGHT = 1000
WORD_PITCH = 100
WORD_X0 = 10
WORD_WIDTH = 90
WORD_Y0 = 10
WORD_Y1 = 60

_HOCR_PREFIX = (
    '<html><head>'
    '<meta name="ocr-capabilities" content="ocr_page ocr_line ocr_word"/>'
    '</head><body>'
)
_HOCR_SUFFIX = '</span></div></body></html>'


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f'{sf_dir}/{name}.parquet')


def tokens_col(text_col='text'):
    return F.split(F.trim(F.regexp_replace(text_col, r'\s+', ' ')), ' ')


def _html_escape(col):
    """&<>\" -> entities, & first. The kernel entity-decodes on extraction
    (html.unescape), so escape∘decode is the identity for every token and
    the DuckDB oracles keep comparing against the raw document text even
    if a future corpus carries HTML-special characters."""
    out = F.replace(col, F.lit('&'), F.lit('&amp;'))
    for raw, ent in (('<', '&lt;'), ('>', '&gt;'), ('"', '&quot;')):
        out = F.replace(out, F.lit(raw), F.lit(ent))
    return out


def hocr_markup_col(tokens):
    """Build the deterministic hOCR wrapping, entirely in Catalyst."""
    n = F.size(tokens)
    page_w = n * WORD_PITCH + WORD_PITCH
    word_spans = F.array_join(
        F.transform(
            tokens,
            lambda w, i: F.concat(
                F.lit('<span class="ocr_word" title="bbox '),
                (F.lit(WORD_X0) + i * WORD_PITCH).cast('string'),
                F.lit(f' {WORD_Y0} '),
                (F.lit(WORD_X0 + WORD_WIDTH) + i * WORD_PITCH).cast('string'),
                F.lit(f' {WORD_Y1}">'),
                _html_escape(w),
                F.lit('</span> '),
            ),
        ),
        '',
    )
    return F.concat(
        F.lit(_HOCR_PREFIX),
        F.lit('<div class="ocr_page" title="bbox 0 0 '),
        page_w.cast('string'),
        F.lit(f' {PAGE_HEIGHT}"><span class="ocr_line">'),
        word_spans,
        F.lit(_HOCR_SUFFIX),
    )


def turn_key_exprs():
    """The deterministic doc_id -> (conv_id, turn_idx, role, ts) mapping
    shared by every transcripts synthesizer (and mirrored by the SQL
    fragments below) — one definition, so gate queries that rebuild
    turns cannot drift from ``synthesize_transcripts``."""
    root = F.floor(F.sqrt(F.col('doc_id'))).cast('long')
    turn_idx = (F.col('doc_id') - root * root + 1).cast('int')
    role = F.element_at(
        F.array(F.lit('user'), F.lit('assistant'), F.lit('tool')),
        (turn_idx % 3 + 1).cast('int'),
    )
    conv_id = F.concat(F.lit('conv-'), root.cast('string'))
    ts = F.expr(
        "timestamp'2025-01-01 00:00:00' "
        '+ make_interval(0, 0, 0, 0, 0, 0, doc_id)')
    return conv_id, turn_idx, role, ts


def synthesize_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> transcripts(conv_id, turn_idx, role, text, tool, ts)."""
    docs = load_table(spark, sf_dir, 'documents').select('doc_id', 'text')
    conv_id, turn_idx, role, ts = turn_key_exprs()
    tokens = tokens_col('text')
    return docs.select(
        conv_id.alias('conv_id'),
        turn_idx.alias('turn_idx'),
        role.alias('role'),
        hocr_markup_col(tokens).alias('text'),
        F.when(role == 'tool', F.lit('search')).alias('tool'),
        ts.alias('ts'),
    )


# The matching DuckDB-SQL fragments, used to assemble oracle queries.
SQL_ROOT = 'CAST(floor(sqrt(doc_id)) AS BIGINT)'
SQL_CONV_ID = f"('conv-' || CAST({SQL_ROOT} AS VARCHAR))"
SQL_TURN_IDX = f'CAST(doc_id - {SQL_ROOT} * {SQL_ROOT} + 1 AS INTEGER)'
SQL_TOKENS = "string_split_regex(trim(text), '\\s+')"
SQL_NORM_TEXT = "regexp_replace(trim(text), '\\s+', ' ', 'g')"

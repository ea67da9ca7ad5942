"""Extraction pandas UDFs: hOCR markup column -> zone spans + text + sexpr.

This is the Spark face of the pure-Python kernel. Parsing HTML is
inherently per-document Python work, so the hot path is an Arrow-batched
``pandas_udf`` (never a row-at-a-time Python UDF): one Python call per
Arrow batch, with the kernel looping inside. Everything around it
(filters, joins, windows, aggregations) stays JVM-side.

Reference parity: the per-turn result matches ocrodjvu's
``hocr.extract_text`` (lib/hocr.py:446-472) — one s-expression per
``ocr_page`` in the turn's markup, with the same dialect quirks.
"""

from __future__ import annotations

from typing import List, Tuple

import pandas as pd

from pyspark.sql.functions import pandas_udf

from ..kernel import hocr
from ..kernel.zones import (
    Zone,
    ZONE_LINE,
    ZONE_NAME,
    ZONE_WORD,
)
from ..schema import EXTRACT_RESULT, EXTRACT_RESULT_PACKED

# packed-span separators (C0 controls; see schema.PAGE_RESULT_PACKED)
SPAN_RS = '\x1e'   # record separator between word spans
SPAN_FS = '\x1f'   # field separator inside one span record


def pack_word_spans(zone) -> str:
    """Serialize word spans to the packed single-string form.

    One record per word, preorder (same order as ``flatten_word_zones``):
    ``x0 FS y0 FS x1 FS y1 FS text`` joined by RS. Text is the last
    field so it may contain anything except the two separator bytes,
    which are replaced with U+FFFD (the emitters escape C0 controls, so
    real corpora never hit this). A NULL text (word zones under chars
    detail carry their text in child zones) packs as a 4-field record
    — the decoder's out-of-range ``get`` restores NULL, keeping the
    packed path byte-equivalent to the struct path, where ``''`` and
    NULL are distinct values. A page with no words packs to ''.
    """
    recs: List[str] = []
    _pack_walk(zone, recs)
    return SPAN_RS.join(recs)


def _pack_walk(z: Zone, recs: List[str]) -> None:
    """Single fused preorder walk emitting one packed record per word
    zone — same visit order, leaf rule and coordinate formatting as
    ``flatten_word_zones`` + the packing loop it replaces (pinned by
    the packed-vs-struct equivalence tests)."""
    if z.type == ZONE_WORD:
        leaf = ''.join(c for c in z.children if isinstance(c, str)) or None
        x0, y0, x1, y1 = z.bbox
        head = f'{int(x0)}{SPAN_FS}{int(y0)}{SPAN_FS}{int(x1)}{SPAN_FS}{int(y1)}'
        if leaf is None:
            recs.append(head)
        else:
            if SPAN_RS in leaf or SPAN_FS in leaf:
                leaf = leaf.replace(SPAN_RS, '�').replace(SPAN_FS, '�')
            recs.append(f'{head}{SPAN_FS}{leaf}')
    for child in z.children:
        if isinstance(child, Zone):
            _pack_walk(child, recs)


def flatten_zone(zone: Zone) -> List[tuple]:
    """Preorder span list: (zone_type, depth, path, x0, y0, x1, y1, text)."""
    spans: List[tuple] = []

    def walk(z: Zone, depth: int, path: Tuple[int, ...]):
        # leaf text = concatenation of direct string children
        leaf = ''.join(c for c in z.children if isinstance(c, str)) or None
        x0, y0, x1, y1 = z.bbox
        spans.append((
            ZONE_NAME[z.type], depth, list(path),
            int(x0), int(y0), int(x1), int(y1), leaf,
        ))
        i = 0
        for child in z.children:
            if isinstance(child, Zone):
                walk(child, depth + 1, path + (i,))
                i += 1

    walk(zone, 0, ())
    return spans


def flatten_word_zones(zone: Zone) -> List[tuple]:
    """Word-only span list, same tuple shape as ``flatten_zone``.

    The words-mode Arrow pruning knob: consumers like
    ``pipeline.word_spans`` filter to word zones and read only
    bbox + text + order, so shipping page/line/para spans (and the
    per-span ``path`` array — the one nested list in the struct) is
    pure Arrow transfer cost. Word order is preorder, identical to the
    filtered ``flatten_zone`` output; ``path`` is None. Intended for
    ``details='words'`` runs (word zones under chars detail carry
    their text in child zones, same as flatten_zone's leaf rule).
    """
    spans: List[tuple] = []

    def walk(z: Zone, depth: int):
        if z.type == ZONE_WORD:
            leaf = ''.join(
                c for c in z.children if isinstance(c, str)) or None
            x0, y0, x1, y1 = z.bbox
            spans.append((
                ZONE_NAME[ZONE_WORD], depth, None,
                int(x0), int(y0), int(x1), int(y1), leaf,
            ))
        for child in z.children:
            if isinstance(child, Zone):
                walk(child, depth + 1)

    walk(zone, 0)
    return spans


def zone_text(zone: Zone) -> str:
    """Flatten a zone tree to plain text.

    Word siblings join with a single space; line-and-coarser siblings join
    with a newline; character leaves concatenate. This matches the leaf
    order of the emitted s-expression, so per-turn text equality against
    the reference holds whenever the zone trees match.
    """
    children = zone.children
    if len(children) == 1 and isinstance(children[0], str):
        # dominant case: a word/char leaf with one text child
        return children[0]
    if not any(isinstance(c, Zone) for c in children):
        return ''.join(str(c) for c in children)
    parts = [zone_text(c) for c in zone.children if isinstance(c, Zone)]
    child_types = [c.type for c in zone.children if isinstance(c, Zone)]
    if all(t < ZONE_WORD for t in child_types):
        sep = ''  # characters concatenate
    elif all(t <= ZONE_WORD for t in child_types):
        sep = ' '  # words join with spaces
    else:
        sep = '\n'  # lines and coarser join with newlines
    return sep.join(parts)


def extract_one(
    markup,
    details: int = hocr.DETAILS_BY_NAME['words'],
    uax29=None,
    rotation: int = 0,
    page_size=None,
    fix_utf8: bool = False,
    emit_spans=True,
    emit_sexpr: bool = True,
):
    """Extract one turn; returns the EXTRACT_RESULT-shaped dict.

    ``emit_spans`` (True | False | 'words') / ``emit_sexpr`` skip or
    prune those payloads (they dominate the Arrow transfer cost when a
    query only needs text or word boxes).
    """
    if markup is None:
        return {'pages': None, 'dialect': None, 'error': 'null input'}
    settings = hocr.ExtractSettings(
        rotation=rotation, details=details, uax29=uax29,
        fix_utf8=fix_utf8, page_size=page_size)
    try:
        zones = hocr.extract_zones(markup, settings=settings)
    except Exception as exc:  # error channel, not abort (on-error resume)
        return {
            'pages': None,
            'dialect': _dialect_name(settings),
            'error': f'{type(exc).__name__}: {exc}',
        }
    pages = []
    for zone in zones:
        if emit_spans == 'packed' or emit_spans == 'words':
            # both word-span modes ship the packed single-string form:
            # one delimited record per word, decoded JVM-side by
            # pipeline.word_spans — the lowest-Arrow-volume spans path
            # (measured 9.5% faster than the array-of-structs form at
            # 32 cores on the round-7 kernel)
            page = {'spans_packed': pack_word_spans(zone)}
        elif emit_spans:
            page = {'spans': flatten_zone(zone)}
        else:
            page = {'spans': None}
        page['extracted_text'] = zone_text(zone)
        page['extracted_sexpr'] = (
            zone.compact_sexpr() if emit_sexpr else None)
        pages.append(page)
    return {
        'pages': pages,
        'dialect': _dialect_name(settings),
        'error': None,
    }


def _dialect_name(settings) -> str:
    if settings.tesseract:
        return 'tesseract'
    if settings.cuneiform:
        return 'cuneiform{0}.{1}'.format(*settings.cuneiform)
    return 'hocr'


def make_extract_udf(
    details: str = 'words',
    uax29=None,
    rotation: int = 0,
    page_size=None,
    fix_utf8: bool = False,
    emit_spans=True,
    emit_sexpr: bool = True,
):
    """Build the Arrow-batched extraction UDF for a fixed config.

    The config is captured in the closure (broadcast with the task
    binary), so Catalyst sees a deterministic scalar pandas UDF it can
    pipeline inside a single stage — no shuffle is introduced.
    ``emit_spans``/``emit_sexpr`` elide the heavy payloads when a query
    only consumes ``extracted_text`` (Catalyst cannot prune *inside* a
    UDF result struct, so the pruning knob lives here).
    """
    details_level = hocr.DETAILS_BY_NAME[details]
    result_schema = (EXTRACT_RESULT_PACKED
                     if emit_spans in ('packed', 'words')
                     else EXTRACT_RESULT)

    @pandas_udf(result_schema)
    def extract_turn(texts: pd.Series) -> pd.DataFrame:
        rows = [
            extract_one(
                t, details=details_level, uax29=uax29, rotation=rotation,
                page_size=page_size, fix_utf8=fix_utf8,
                emit_spans=emit_spans, emit_sexpr=emit_sexpr,
            )
            for t in texts
        ]
        return pd.DataFrame(rows, columns=['pages', 'dialect', 'error'])

    return extract_turn

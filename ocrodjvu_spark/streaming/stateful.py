"""Custom stateful streaming operator: running per-conversation state.

``running_conversation_state`` keeps, per conv_id, an incrementally
updated (n_pages, n_chars, max_turn_idx) triple across micro-batches via
``applyInPandasWithState`` — the pattern for stateful extraction
post-processing that windowed aggregation can't express (e.g. monotone
turn-counter checks, incremental conversation assembly).

State is bounded per key (three longs), so at 10^12 turns the state
store scales with the number of *live* conversations, not turns;
shuffle is on conv_id (the same key the batch pipeline salts, but state
requires key-grouping, so AQE skew handling applies to the exchange).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    'conv_id string, n_pages long, n_chars long, max_turn_idx long')
STATE_SCHEMA = 'n_pages long, n_chars long, max_turn_idx long'


def _update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n_pages, n_chars, max_turn = state.get
    else:
        n_pages, n_chars, max_turn = 0, 0, 0
    for pdf in pdfs:
        n_pages += len(pdf)
        texts = pdf['extracted_text']
        n_chars += int(texts.fillna('').str.len().sum())
        if len(pdf):
            max_turn = max(max_turn, int(pdf['turn_idx'].max()))
    state.update((n_pages, n_chars, max_turn))
    yield pd.DataFrame([{
        'conv_id': conv_id,
        'n_pages': n_pages,
        'n_chars': n_chars,
        'max_turn_idx': max_turn,
    }])


def running_conversation_state(extracted: DataFrame) -> DataFrame:
    """Streaming extracted turns -> continuously updated per-conv state."""
    return (
        extracted
        .select('conv_id', 'turn_idx', 'extracted_text')
        .groupBy('conv_id')
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode='update',
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

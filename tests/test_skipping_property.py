"""Property-based soundness of file-level data skipping.

THE property everything in the skipping stack rests on: if
``file_may_match`` says a file cannot match, then truly NO row in the
file satisfies the predicate conjunction — under Spark's comparison
semantics (NULL fails every predicate; NaN is greater than every
number and NaN = NaN is true). Files are written with pyarrow (the
same footer-reading path ``_stage`` harvests), over random mixes of
ints, floats (incl. NaN/None), strings, and timestamps, against
random filter conjunctions. Completeness (pruning enough) is covered
by the directed unit tests; soundness must hold for EVERY input.
"""

import datetime
import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

from ocrodjvu_spark.plans.snapstore import _column_stats, file_may_match

_EPOCH = datetime.datetime(2024, 1, 1)

_int_vals = st.one_of(st.none(), st.integers(-50, 50))
_float_vals = st.one_of(
    st.none(), st.just(float('nan')),
    st.floats(-50, 50, allow_nan=False))
_str_vals = st.one_of(st.none(), st.text(
    alphabet='abcxyz', min_size=0, max_size=4))
_ts_vals = st.one_of(st.none(), st.integers(0, 3600).map(
    lambda s: _EPOCH + datetime.timedelta(minutes=s)))

_COLS = {'i': _int_vals, 'f': _float_vals, 's': _str_vals,
         't': _ts_vals}

_rows = st.lists(
    st.fixed_dictionaries({k: v for k, v in _COLS.items()}),
    min_size=1, max_size=12)

_ops = st.sampled_from(['=', '<', '<=', '>', '>=', 'in'])


def _probe_for(col):
    base = {'i': st.one_of(st.integers(-60, 60)),
            'f': st.one_of(st.floats(-60, 60, allow_nan=False),
                           st.just(float('nan'))),
            's': st.text(alphabet='abcxyz', max_size=4),
            # timestamp columns get BOTH datetime probes and plain
            # DATE probes (Spark casts date -> timestamp at midnight
            # under the UTC session TZ) — the r5 encoding compared
            # date ordinals against micros and unsoundly pruned
            't': st.one_of(
                st.integers(-60, 3700).map(
                    lambda s: _EPOCH + datetime.timedelta(minutes=s)),
                st.integers(-3, 5).map(
                    lambda d: _EPOCH.date()
                    + datetime.timedelta(days=d)))}[col]
    return base


_filters = st.lists(
    st.sampled_from(list(_COLS)).flatmap(
        lambda c: st.tuples(
            st.just(c), _ops,
            st.one_of(_probe_for(c),
                      st.lists(_probe_for(c), max_size=3)))),
    min_size=1, max_size=4).map(
    lambda fs: [(c, op, (v if op == 'in' else
                         (v[0] if isinstance(v, list) and v else v)))
                for c, op, v in fs
                if not (op == 'in') or isinstance(v, list)])


def _spark_cmp(a, b):
    """Spark ordering for predicate evaluation: NULL handled by the
    caller; NaN is greater than every float and equal to itself; a
    date compared to a timestamp is cast to its midnight instant
    (UTC session TZ), exactly Spark's date->timestamp coercion."""
    a_nan = isinstance(a, float) and math.isnan(a)
    b_nan = isinstance(b, float) and math.isnan(b)
    if a_nan or b_nan:
        if a_nan and b_nan:
            return 0
        return 1 if a_nan else -1

    def promote(x, other):
        if (isinstance(other, datetime.datetime)
                and isinstance(x, datetime.date)
                and not isinstance(x, datetime.datetime)):
            return datetime.datetime(x.year, x.month, x.day)
        return x
    a, b = promote(a, b), promote(b, a)
    return (a > b) - (a < b)


def _row_matches(row, filters):
    for col, op, val in filters:
        x = row[col]
        if x is None:
            return False  # NULL fails every null-rejecting predicate
        if op == 'in':
            ok = False
            for v in val:
                try:
                    if _spark_cmp(x, v) == 0:
                        ok = True
                except TypeError:
                    continue  # cross-type: never equal
            if not ok:
                return False
            continue
        try:
            c = _spark_cmp(x, val)
        except TypeError:
            return False  # cross-type comparison never satisfies
        if op == '=' and c != 0:
            return False
        if op == '<' and c >= 0:
            return False
        if op == '<=' and c > 0:
            return False
        if op == '>' and c <= 0:
            return False
        if op == '>=' and c < 0:
            return False
    return True


@given(rows=_rows, filters=_filters)
@settings(max_examples=300, deadline=None)
def test_never_prunes_a_matching_row(rows, filters):
    import tempfile

    table = pa.table({
        'i': pa.array([r['i'] for r in rows], pa.int64()),
        'f': pa.array([r['f'] for r in rows], pa.float64()),
        's': pa.array([r['s'] for r in rows], pa.string()),
        't': pa.array([r['t'] for r in rows],
                      pa.timestamp('us')),
    })
    fd, path = tempfile.mkstemp(suffix='.parquet')
    os.close(fd)
    try:
        pq.write_table(table, path)
        stats = _column_stats(pq.ParquetFile(path).metadata)
    finally:
        os.remove(path)
    entry = {'stats': stats}
    if not file_may_match(entry, filters):
        for r in rows:
            assert not _row_matches(r, filters), (
                f'PRUNED a matching row: row={r} filters={filters} '
                f'stats={stats}')

"""Bucketed co-located joins: the write-once-shuffle-never layout.

Pins the plan shapes: a join of two tables bucketed on the join key
with equal bucket counts runs with NO Exchange (the shuffle was paid at
write time), while the identical non-bucketed join exchanges both
sides."""

import pytest
from pyspark.sql import functions as F

from ocrodjvu_spark.plans import bucketing
from ocrodjvu_spark.sources import transcripts as T

SF_DIR = '/root/testdata/sf0.001'


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def tables(spark):
    tr = T.synthesize_transcripts(spark, SF_DIR)
    meta = (tr.groupBy('conv_id')
            .agg(F.count('*').alias('n_turns'),
                 F.max('ts').alias('last_ts')))
    names = ('bt_transcripts', 'bt_meta', 'bt_transcripts_plain',
             'bt_meta_plain')
    bucketing.write_bucketed(tr, 'bt_transcripts', 'conv_id', 8,
                             sort_cols=('conv_id',))
    bucketing.write_bucketed(meta, 'bt_meta', 'conv_id', 8,
                             sort_cols=('conv_id',))
    tr.write.format('parquet').mode('overwrite') \
        .saveAsTable('bt_transcripts_plain')
    meta.write.format('parquet').mode('overwrite') \
        .saveAsTable('bt_meta_plain')
    yield names
    for n in names:
        spark.sql(f'DROP TABLE IF EXISTS {n}')


def test_bucketed_join_is_shuffle_free(spark, tables):
    joined = bucketing.colocated_join(
        spark, 'bt_transcripts', 'bt_meta', 'conv_id')
    plan = _plan(joined)
    assert 'SortMergeJoin' in plan
    assert 'Exchange' not in plan
    # and the bucketed layout also feeds a co-located groupBy: an
    # aggregation on the bucket key needs no exchange either
    agg = spark.table('bt_transcripts').groupBy('conv_id').count()
    assert 'Exchange' not in _plan(agg)


def test_nonbucketed_control_shuffles_both_sides(spark, tables):
    joined = (spark.table('bt_transcripts_plain').hint('merge')
              .join(spark.table('bt_meta_plain'), 'conv_id'))
    assert _plan(joined).count('Exchange') >= 2


def test_bucketed_join_results_match_control(spark, tables):
    a = bucketing.colocated_join(
        spark, 'bt_transcripts', 'bt_meta', 'conv_id') \
        .select('conv_id', 'turn_idx', 'n_turns')
    b = (spark.table('bt_transcripts_plain')
         .join(spark.table('bt_meta_plain'), 'conv_id')
         .select('conv_id', 'turn_idx', 'n_turns'))
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, b.collect()))

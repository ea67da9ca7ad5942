"""Count-Min Sketch: reference equivalence, one-sided error, merge
monoid, and plan shape."""

import random
from collections import Counter

from pyspark.sql import Row

from ocrodjvu_spark.functions import cms


def _rand_keys(rng, n, alphabet='abcde', lo=2, hi=6):
    return [''.join(rng.choice(alphabet)
                    for _ in range(rng.randrange(lo, hi)))
            for _ in range(n)]


def test_counters_and_estimates_match_reference(spark):
    for seed in (1, 2):
        rng = random.Random(seed)
        keys = _rand_keys(rng, 500)
        df = spark.createDataFrame([Row(key=x) for x in keys])
        sketch = cms.cms_build(df, d=3, w=32)
        ref_counters, ref_est = cms.reference_cms(keys, d=3, w=32)
        got = {(r.row, r.pos): r.n for r in sketch.collect()}
        assert got == ref_counters, f'seed {seed}'
        probes = sorted(set(keys))
        est = {r.key: r.est for r in cms.cms_estimate(
            spark.createDataFrame([Row(key=x) for x in probes]),
            sketch, d=3, w=32).collect()}
        assert est == {k: ref_est(k) for k in probes}, f'seed {seed}'


def test_one_sided_error(spark):
    rng = random.Random(3)
    keys = _rand_keys(rng, 800)
    true = Counter(keys)
    df = spark.createDataFrame([Row(key=x) for x in keys])
    sketch = cms.cms_build(df, d=3, w=32)
    est = {r.key: r.est for r in cms.cms_estimate(
        spark.createDataFrame([Row(key=x) for x in sorted(true)]),
        sketch, d=3, w=32).collect()}
    assert all(est[k] >= n for k, n in true.items())
    # w=32 with ~hundreds of distinct keys must actually collide,
    # otherwise the test proves nothing
    assert any(est[k] > n for k, n in true.items())
    # absent key estimates are >= 0 and well-defined
    absent = {r.key: r.est for r in cms.cms_estimate(
        spark.createDataFrame([Row(key='zzzzzz')]),
        sketch, d=3, w=32).collect()}
    assert absent['zzzzzz'] >= 0


def test_merge_equals_build_of_union(spark):
    rng = random.Random(9)
    a_keys, b_keys = _rand_keys(rng, 300), _rand_keys(rng, 300)
    a = cms.cms_build(
        spark.createDataFrame([Row(key=x) for x in a_keys]), d=3, w=32)
    b = cms.cms_build(
        spark.createDataFrame([Row(key=x) for x in b_keys]), d=3, w=32)
    merged = sorted(map(tuple, cms.cms_merge(a, b).collect()))
    union = sorted(map(tuple, cms.cms_build(
        spark.createDataFrame([Row(key=x) for x in a_keys + b_keys]),
        d=3, w=32).collect()))
    assert merged == union


def test_build_plan_has_partial_count(spark):
    df = spark.createDataFrame([Row(key='a')])
    plan = (cms.cms_build(df, d=3, w=32)
            ._jdf.queryExecution().executedPlan().toString())
    assert 'partial_count' in plan

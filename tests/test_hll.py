"""HyperLogLog: register-level equivalence vs the pure-Python
reference, merge-monoid property, and estimator accuracy."""

import random

from pyspark.sql import Row

from ocrodjvu_spark.functions import hll


def _rand_keys(rng, n):
    return [''.join(rng.choice('abcdefghij')
                    for _ in range(rng.randrange(3, 10)))
            for _ in range(n)]


def test_sketch_matches_reference_randomized(spark):
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        keys = _rand_keys(rng, 300)
        df = spark.createDataFrame([Row(key=x) for x in keys])
        got = {r.register: r.max_rank
               for r in hll.hll_sketch(df, p=6).collect()}
        assert got == hll.reference_sketch(keys, p=6), f'seed {seed}'


def test_merge_equals_sketch_of_union(spark):
    rng = random.Random(9)
    a_keys, b_keys = _rand_keys(rng, 200), _rand_keys(rng, 200)
    a = hll.hll_sketch(
        spark.createDataFrame([Row(key=x) for x in a_keys]), p=6)
    b = hll.hll_sketch(
        spark.createDataFrame([Row(key=x) for x in b_keys]), p=6)
    merged = {r.register: r.max_rank
              for r in hll.hll_merge(a, b).collect()}
    union = {r.register: r.max_rank for r in hll.hll_sketch(
        spark.createDataFrame([Row(key=x) for x in a_keys + b_keys]),
        p=6).collect()}
    assert merged == union


def test_estimate_within_tolerance(spark):
    # p=8 -> 256 registers, standard error ~6.5%; assert within 4 sigma
    rng = random.Random(4)
    keys = list(set(_rand_keys(rng, 3000)))
    df = spark.createDataFrame([Row(key=x) for x in keys])
    est = hll.hll_estimate(hll.hll_sketch(df, p=8), p=8)
    rel = abs(est - len(keys)) / len(keys)
    assert rel < 4 * 1.04 / (256 ** 0.5), (est, len(keys))


def test_duplicates_do_not_change_sketch(spark):
    rng = random.Random(11)
    keys = _rand_keys(rng, 100)
    once = spark.createDataFrame([Row(key=x) for x in keys])
    thrice = spark.createDataFrame([Row(key=x) for x in keys * 3])
    assert sorted(map(tuple, hll.hll_sketch(once, p=6).collect())) == \
        sorted(map(tuple, hll.hll_sketch(thrice, p=6).collect()))


def test_sketch_plan_has_partial_max(spark):
    df = spark.createDataFrame([Row(key='a'), Row(key='b')])
    plan = (hll.hll_sketch(df, p=6)
            ._jdf.queryExecution().executedPlan().toString())
    assert 'partial_max' in plan

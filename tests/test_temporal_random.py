"""Randomized adversarial equivalence for the temporal join operators.

One seeded instance, deliberately tie-heavy (5 users, timestamps drawn
from a 40-second pool so equal-(key, ts) collisions are common on both
sides), checked against an O(n^2) brute-force Python reference for:

* asof_join, strict and non-strict;
* asof_join_bucketed with a deliberately awkward bucket size (7 s), so
  segment boundaries fall mid-data and the cross-bucket carry is
  exercised constantly;
* range_join, including its floor-second delta semantics.
"""

import random
from datetime import datetime, timedelta

import pytest

from ocrodjvu_spark.functions import temporal

T0 = datetime(2024, 3, 1)
EPOCH0 = int(T0.timestamp())


def _instance(seed=42, n_left=60, n_right=50):
    rng = random.Random(seed)
    at = lambda s: T0 + timedelta(seconds=s)
    left = [(i, rng.randrange(5), at(rng.randrange(40)))
            for i in range(n_left)]
    right = [(1000 + i, rng.randrange(5), at(rng.randrange(40)),
              float(i)) for i in range(n_right)]
    return left, right


def _brute_asof(left, right, strict):
    out = {}
    for lid, u, lts in left:
        cands = [(rts, rid, val) for rid, ru, rts, val in right
                 if ru == u and (rts < lts if strict else rts <= lts)]
        if cands:
            # operator tiebreak: max by (ts, payload struct) and the
            # payload's first field is event_id — so (ts, rid)
            rts, rid, val = max(cands, key=lambda c: (c[0], c[1]))
            out[lid] = (rid, rts, val)
        else:
            out[lid] = (None, None, None)
    return out


def _brute_range(left, right, window_sec):
    floor = lambda ts: int(ts.timestamp())
    pairs = []
    for _, u, lts in left:
        for _, ru, rts, _ in right:
            if ru == u and abs(floor(rts) - floor(lts)) <= window_sec:
                pairs.append((u, lts, rts, floor(rts) - floor(lts)))
    return sorted(pairs)


@pytest.fixture(scope='module')
def frames(spark):
    left, right = _instance()
    ldf = spark.createDataFrame(
        left, 'event_id long, user_id long, ts timestamp')
    rdf = spark.createDataFrame(
        right, 'event_id long, user_id long, ts timestamp, value double')
    return left, right, ldf, rdf


@pytest.mark.parametrize('strict', [False, True])
def test_asof_join_matches_brute_force(spark, frames, strict):
    left, right, ldf, rdf = frames
    expect = _brute_asof(left, right, strict)
    got = {r.event_id: (r.matched_event_id, r.matched_ts, r.matched_value)
           for r in temporal.asof_join(ldf, rdf, strict=strict).collect()}
    assert got == expect


@pytest.mark.parametrize('strict', [False, True])
def test_asof_join_bucketed_matches_brute_force(spark, frames, strict):
    left, right, ldf, rdf = frames
    expect = _brute_asof(left, right, strict)
    got = {r.event_id: (r.matched_event_id, r.matched_ts, r.matched_value)
           for r in temporal.asof_join_bucketed(
               ldf, rdf, strict=strict, bucket_sec=7).collect()}
    assert got == expect


def test_range_join_matches_brute_force(spark, frames):
    left, right, ldf, rdf = frames
    expect = _brute_range(left, right, window_sec=9)
    got = sorted((r.user_id, r.ts, r.near_ts, r.delta_sec)
                 for r in temporal.range_join(
                     ldf, rdf, window_sec=9).collect())
    assert got == expect

"""Engine-portable Count-Min Sketch: distributed frequency estimation.

Cormode & Muthukrishnan 2005 ("An improved data stream summary: the
count-min sketch and its applications"). Completes the repo's portable
sketch trio — Bloom (membership), HyperLogLog (cardinality), CMS
(frequency) — all on the same fold-hash family so every structure has
an integer-exact DuckDB oracle.

* **Build**: each key occurrence increments d counters (one per row,
  positions via the same Kirsch-Mitzenmacher double hashing the Bloom
  filter uses, salted per row). One explode (d rows per occurrence) +
  one ``groupBy(row, pos).count()`` — map-side partial counting bounds
  the shuffle at d*w rows per task, independent of corpus size.
* **Estimate**: min over the key's d counters (join against the d*w-row
  counter table — broadcast at practical sizes). One-sided error:
  estimate >= true count always; overshoot bounded by eN/w with
  probability 1 - (1/2)^d for w = e/eps counters.
* **Merge**: counter tables add elementwise (groupBy + sum) — the same
  distributive-monoid rollup story as the HLL sketch.

The finalized hash (HLL's two multiplicative rounds) is reused so short
keys spread over the full range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bloom import H2_ADD, H2_MUL
from .hll import FIN
from .textops import HASH_MOD, rolling_hash


def _positions(key: Column, d: int, w: int) -> Column:
    """Array of d counter positions (row j uses the j-salted probe)."""
    h = rolling_hash(key)
    for mul, add in FIN:
        h = (h * mul + add) % HASH_MOD
    h2 = (h * H2_MUL + H2_ADD) % HASH_MOD
    return F.array(*[
        ((h + F.lit(j) * h2 + F.lit(j * j)) % w).cast('int')
        for j in range(d)
    ])


def cms_build(keys: DataFrame, key_col: str = 'key',
              d: int = 3, w: int = 256) -> DataFrame:
    """Key occurrences -> the (row, pos, n) counter table."""
    pos = F.posexplode(_positions(F.col(key_col), d, w))
    return (keys
            .select(pos.alias('row', 'pos'))
            .groupBy('row', 'pos')
            .agg(F.count('*').alias('n')))


def cms_estimate(probes: DataFrame, sketch: DataFrame,
                 key_col: str = 'key', d: int = 3, w: int = 256,
                 broadcast_sketch: bool = True) -> DataFrame:
    """(key, est) — the min of the key's d counters; 0 if any counter
    row is absent (key never inserted and its cells never collided)."""
    pos = F.posexplode(_positions(F.col(key_col), d, w))
    probed = probes.select(F.col(key_col).alias('key'),
                           pos.alias('row', 'pos'))
    rhs = F.broadcast(sketch) if broadcast_sketch else sketch
    return (probed
            .join(rhs, ['row', 'pos'], 'left')
            .groupBy('key')
            .agg(F.min(F.coalesce(F.col('n'), F.lit(0)))
                 .alias('est')))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Elementwise sum — the monoid op for per-partition/day rollups."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy('row', 'pos').agg(F.sum('n').alias('n'))


def reference_cms(keys, d: int = 3, w: int = 256):
    """Pure-Python reference (tests only): counter dict + estimator."""
    counters = {}
    pos_cache = {}

    def positions(key):
        if key not in pos_cache:
            acc = 0
            for c in key:
                acc = (acc * 31 + ord(c)) % HASH_MOD
            for mul, add in FIN:
                acc = (acc * mul + add) % HASH_MOD
            h2 = (acc * H2_MUL + H2_ADD) % HASH_MOD
            pos_cache[key] = [(acc + j * h2 + j * j) % w
                              for j in range(d)]
        return pos_cache[key]

    for key in keys:
        for j, p in enumerate(positions(key)):
            counters[(j, p)] = counters.get((j, p), 0) + 1

    def estimate(key):
        return min(counters.get((j, p), 0)
                   for j, p in enumerate(positions(key)))

    return counters, estimate

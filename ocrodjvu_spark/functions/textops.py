"""Training-data-pipeline text operators, all JVM-side Catalyst expressions.

Everything here is built from ``pyspark.sql.functions`` only — no Python
UDFs — so the operators stay inside whole-stage codegen and scale linearly
with executors. Hashes are engine-portable (character-fold rolling hash,
md5) so every operator has an exact DuckDB oracle.

Operators:
* word shingles + rolling hash (the shared primitive; ``bind_once`` is
  the shared no-lambda-CSE idiom)
* MinHash signatures + LSH banding -> candidate pairs -> exact-Jaccard
  verification (near-duplicate detection at scale; hot-bucket cap)
* SimHash (64-bit, Manku WWW'07) fingerprints + banded near-dup pairs
* n-gram Jaccard similarity pairs (exact, shingle-join)
* connected components (alternating large/small-star) -> dedup clusters
* bottom-k document fingerprint
* language ID (stopword-hit + char-trigram variants)
* quality scoring (length / token / stopword / non-alpha ratios)
* Gopher-style repetition stats (dup-token / top-bigram fractions)
* Gopher-rule document filter (length / symbol / alpha / stopword
  bounds -> keep verdict)
* corpus char-trigram LM quality score (CCNet/KenLM-style)
* cross-split contamination pairs (train/test n-gram leakage)
* PII scrub (email/phone redaction + counts)
* domain mix weights (target token-mixture sampling table)
* sliding-window document chunking (pretraining/RAG splitting)
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_MOD = 2147483647  # 2^31 - 1 (Mersenne prime)

# MinHash permutation parameters: h_k(x) = (a_k * x + b_k) mod HASH_MOD.
# Fixed, deterministic, coprime with the modulus.
MINHASH_PARAMS = [
    (1 + 2 * k, 10007 * (k + 1) % HASH_MOD) for k in range(16)
]
LSH_BAND_SIZE = 4  # 16 hashes -> 4 bands of 4


def norm_text(col='text') -> Column:
    return F.regexp_replace(F.trim(col), r'\s+', ' ')


def bind_once(col: Column, fn) -> Column:
    """Evaluate ``col`` once and hand it to ``fn`` as a bound lambda
    variable: ``element_at(transform(array(col), fn), 1)``.

    Catalyst performs no CSE for lambda expressions and inlines
    duplicated higher-order expressions on projection collapse, so an
    expression referenced K times inside ``fn`` would otherwise be
    recomputed K times (the trap measured at ~4x on the MinHash
    pipeline and ~O(n^2) on the bigram transform). Wrapping the value
    in a 1-element array makes it a lambda-bound variable, evaluated
    exactly once per row.
    """
    return F.element_at(F.transform(F.array(col), fn), 1)


def tokens(col='text') -> Column:
    return F.split(norm_text(col), ' ')


def rolling_hash(str_col: Column) -> Column:
    """Portable string hash: fold (acc*31 + ascii(ch)) % (2^31-1).

    Identical to DuckDB's
    ``list_reduce(list_prepend(0, list_transform(string_split(s, ''),
    c -> ascii(c))), (acc, x) -> (acc * 31 + x) % 2147483647)``.
    """
    return F.aggregate(
        F.split(str_col, ''),
        F.lit(0).cast('long'),
        lambda acc, c: (acc * 31 + F.ascii(c)) % HASH_MOD,
    )


SHINGLE_COMBINE = 1009  # odd multiplier for combining token hashes


def word_shingles(tokens_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingle strings (reference form; the hashed
    pipeline below avoids materializing these)."""
    joined = F.transform(
        F.sequence(F.lit(0), F.size(tokens_col) - n),
        lambda i: F.concat_ws(
            ' ', *[F.element_at(tokens_col, (i + j + 1).cast('int'))
                   for j in range(n)]),
    )
    # short docs (< n tokens): fall back to the whole text as one shingle
    return F.array_distinct(
        F.when(F.size(tokens_col) >= n, joined)
        .otherwise(F.array(F.concat_ws(' ', tokens_col)))
    )


def shingle_hashes(tokens_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingle hashes.

    Each token is rolling-hashed ONCE, then a shingle's hash combines
    its n token hashes arithmetically (fold by ``acc*1009 + h, mod p``).
    The naive alternative — concatenate the shingle string and
    char-fold it — re-hashes every character ~n times and builds n-gram
    strings just to throw them away; on the sf0.1 corpus that was ~4x
    slower and dominated the whole MinHash pipeline. The token-hash
    array is bound once as a lambda variable (wrapped in a 1-element
    array) because Catalyst inlines duplicated higher-order expressions
    on projection collapse (no CSE for lambdas).

    Short docs (< n tokens) fold all their token hashes into one
    shingle; for exactly n tokens that fold equals the regular combine,
    so the fallback is consistent.
    """
    hs = F.transform(tokens_col, lambda t: rolling_hash(t))

    def combos(h):
        def one(i):
            out = F.element_at(h, (i + 1).cast('int'))
            for j in range(1, n):
                out = (out * SHINGLE_COMBINE
                       + F.element_at(h, (i + j + 1).cast('int'))) % HASH_MOD
            return out
        joined = F.transform(F.sequence(F.lit(0), F.size(h) - n), one)
        whole = F.aggregate(
            h, F.lit(0).cast('long'),
            lambda acc, x: (acc * SHINGLE_COMBINE + x) % HASH_MOD)
        return F.array_distinct(
            F.when(F.size(h) >= n, joined).otherwise(F.array(whole)))

    return bind_once(hs, combos)


def minhash_signature(hashes_col: Column) -> Column:
    """Array of K minhash values over a shingle-hash array column.

    NOTE: column-expression form, for per-row use on *small* arrays.
    The scalable path is ``minhash_signature_table`` — Catalyst inlines
    duplicated array expressions on projection collapse, so referencing
    this array K times would recompute the shingle fold K*K times;
    the explode+groupBy form computes each hash exactly once and gets
    whole-stage codegen + map-side combine.
    """
    return F.array(*[
        F.array_min(F.transform(
            hashes_col, lambda h: (h * a + b) % HASH_MOD))
        for a, b in MINHASH_PARAMS
    ])


def minhash_signature_table(docs: DataFrame, id_col='doc_id',
                            text_col='text', n: int = 3) -> DataFrame:
    """(id, mh0..mhK-1): minhash signature via explode + aggregate."""
    sh = doc_shingle_table(docs, id_col, text_col, n)
    return sh.groupBy(id_col).agg(*[
        F.min((F.col('shingle') * a + b) % HASH_MOD).alias(f'mh{k}')
        for k, (a, b) in enumerate(MINHASH_PARAMS)
    ])


def minhash_band_table(sig: DataFrame, id_col='doc_id',
                       band_size: int = LSH_BAND_SIZE) -> DataFrame:
    """(id, band): one row per LSH band key 'band_idx:h1-h2-...'."""
    n_bands = len(MINHASH_PARAMS) // band_size
    bands = F.array(*[
        F.concat_ws(
            ':', F.lit(str(b)),
            F.concat_ws('-', *[
                F.col(f'mh{b * band_size + j}').cast('string')
                for j in range(band_size)
            ]))
        for b in range(n_bands)
    ])
    return sig.select(id_col, F.explode(bands).alias('band'))


# Multipliers deriving the 2nd/3rd 31-bit words of a token's 64-bit
# SimHash key from its rolling hash (classic LCG multipliers; any odd
# constants coprime with the modulus work — mirrored in the oracle SQL).
SIMHASH_W1 = (48271, 11)
SIMHASH_W2 = (69621, 7)
SIMHASH_BITS = 64


def _token_bit64(h: Column, j: int) -> Column:
    """Bit j (0..63) of a token's 64-bit SimHash key.

    ``rolling_hash`` yields 31 usable bits, so the 64-bit key is pieced
    from three derived words: bits 0..30 from h itself, 31..61 from
    (h*48271+11) mod p, 62..63 from (h*69621+7) mod p. The derived-word
    expressions are rebuilt per bit (Catalyst does no CSE inside lambda
    bodies) but each is just mul+add+mod — noise next to the O(64) vote
    fold they feed.
    """
    if j < 31:
        src, k = h, j
    elif j < 62:
        src = (h * SIMHASH_W1[0] + SIMHASH_W1[1]) % HASH_MOD
        k = j - 31
    else:
        src = (h * SIMHASH_W2[0] + SIMHASH_W2[1]) % HASH_MOD
        k = j - 62
    return F.shiftright(src, k) % 2


def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash over token rolling hashes (+1/-1 bit votes).

    Manku et al. (WWW'07) fingerprint width: 64 bits split into 4
    16-bit bands gives 2^16 bucket keys per band (the 32-bit/8-bit
    variant capped band parallelism at 256 keys — a quadratic blowup at
    web scale). Bit 63's weight is -(2^63) so the fingerprint occupies
    the full signed-long range exactly as DuckDB's BIGINT does; Hamming
    distance via ``bit_count(a XOR b)`` is sign-agnostic.

    The bit-vote fold and the final bits->long reduction both live in a
    single ``F.aggregate`` (the reduction as its *finish* lambda, where
    the vote array is a bound lambda variable evaluated once) — Catalyst
    performs no CSE for lambda expressions, so referencing the vote
    aggregate 64 times in a projection would recompute the whole
    O(tokens*64) fold once per output bit.
    """
    token_hashes = F.transform(tokens_col, lambda t: rolling_hash(t))
    weights = F.array(
        *[F.lit(1 << j).cast('long') for j in range(63)],
        F.lit(-(1 << 63)).cast('long'))
    return F.aggregate(
        token_hashes,
        F.array_repeat(F.lit(0).cast('long'), SIMHASH_BITS),
        lambda acc, h: _zip_votes(acc, h),
        # positive weights fold first, so the running sum peaks at
        # 2^63-1 before bit 63's negative weight lands — no ANSI-mode
        # long overflow
        lambda votes: F.aggregate(
            F.zip_with(votes, weights,
                       lambda v, w: F.when(v > 0, w)
                                     .otherwise(F.lit(0).cast('long'))),
            F.lit(0).cast('long'),
            lambda acc, x: acc + x,
        ),
    )


def _zip_votes(acc: Column, h: Column) -> Column:
    bits = F.array(*[
        F.when(_token_bit64(h, j) == 1, F.lit(1).cast('long'))
         .otherwise(F.lit(-1).cast('long'))
        for j in range(SIMHASH_BITS)
    ])
    return F.zip_with(acc, bits, lambda a, b: a + b)


def simhash_table(docs: DataFrame, id_col='doc_id',
                  text_col='text', keep_null_docs: bool = True
                  ) -> DataFrame:
    """(id, sim) rows, bit-exact with ``simhash64(tokens(text))``.

    The column form's higher-order fold evaluates its lambdas
    interpreted, per token, per bit — O(tokens x 64) interpreted
    expression evaluations per document. This form explodes token
    hashes to rows, derives each of the three 31-bit key words ONCE
    per token, and folds the 64 bit votes as codegen'd SUM aggregates
    (the same explode+groupBy shape as the minhash signatures) — one
    shuffle, whole-stage codegen, ~8x faster on the bench corpus.
    Docs whose token array is NULL (null text) keep a NULL ``sim`` via
    the join-back, exactly like the column form. Bit-exactness is
    pinned by test_simhash_table_matches_column_form.
    """
    w0 = F.col('_w0')
    rows = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias('_tok'),
    ).select(
        F.col(id_col), rolling_hash(F.col('_tok')).alias('_w0'),
    ).select(
        # the derived words come from the materialized _w0 attribute,
        # so the expensive char fold runs once per token (CollapseProject
        # keeps non-cheap expressions un-duplicated; double-checked in
        # the committed plan: one 'aggregate(split' per branch)
        F.col(id_col), w0,
        ((w0 * SIMHASH_W1[0] + SIMHASH_W1[1]) % HASH_MOD).alias('_w1'),
        ((w0 * SIMHASH_W2[0] + SIMHASH_W2[1]) % HASH_MOD).alias('_w2'),
    )

    def vote(j: int):
        if j < 31:
            src, k = F.col('_w0'), j
        elif j < 62:
            src, k = F.col('_w1'), j - 31
        else:
            src, k = F.col('_w2'), j - 62
        bit = F.shiftright(src, k) % 2
        return F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f'_v{j}')

    votes = rows.groupBy(id_col).agg(*[vote(j) for j in range(64)])
    weights = [1 << j for j in range(63)] + [-(1 << 63)]
    sim = None
    for j in range(64):
        term = F.when(F.col(f'_v{j}') > 0,
                      F.lit(weights[j]).cast('long')) \
                .otherwise(F.lit(0).cast('long'))
        sim = term if sim is None else sim + term
    sims = votes.select(F.col(id_col), sim.alias('sim'))
    if not keep_null_docs:
        # a NULL fingerprint can neither band-join nor rank — callers
        # that only pair (the band table) skip the join-back
        return sims
    # join-back so null-text docs keep their NULL sim row (parity with
    # the column form; explode dropped them)
    return docs.select(id_col).join(sims, id_col, 'left')


def _simhash_band_table(docs: DataFrame, id_col: str,
                        text_col: str, n_bands: int) -> DataFrame:
    """(id, sim, band) rows: one per 16-bit band key of the 64-bit
    fingerprint. Arithmetic shiftright + mask extracts the band
    correctly for negative fingerprints (the mask kills the
    sign-extension bits)."""
    band_bits = SIMHASH_BITS // n_bands
    mask = (1 << band_bits) - 1
    # null-fingerprint docs are dropped here rather than joined back:
    # their band keys are all NULL, which can never equi-join (pairs
    # unchanged); the only observable delta is that
    # oversized_simhash_buckets no longer reports a NULL-band row,
    # which was not a real bucket
    sims = simhash_table(docs, id_col, text_col, keep_null_docs=False)
    band_keys = F.array(*[
        F.concat(F.lit(f'{b}:'),
                 (F.shiftright(F.col('sim'), b * band_bits)
                  .bitwiseAND(F.lit(mask))).cast('string'))
        for b in range(n_bands)
    ])
    return sims.select(F.col(id_col), 'sim',
                       F.explode(band_keys).alias('band'))


def simhash_neardup_pairs(docs: DataFrame, max_dist: int = 3,
                          id_col='doc_id', text_col='text',
                          n_bands: int = 4,
                          max_bucket_size: Optional[int] = None
                          ) -> DataFrame:
    """SimHash near-duplicate pairs via banded bucket join + Hamming verify.

    The 64-bit SimHash splits into ``n_bands`` bands (default 4 x 16
    bits = 65,536 distinct keys per band, so band-join parallelism
    scales with the cluster instead of capping at the key count);
    candidate pairs share at least one identical band (an equi-join on
    the band key — never a cross join), then the exact Hamming distance
    filters to ``max_dist``. With ``max_dist < n_bands`` recall is
    EXACT by pigeonhole: fewer differing bits than bands means some
    band is untouched, so every qualifying pair collides somewhere. The
    default (3 < 4) keeps that guarantee; raising max_dist to n_bands
    or beyond turns the operator into an approximation.

    ``max_bucket_size`` (skew guard, same contract as
    ``minhash_dedup_pairs``): a band bucket holding k near-identical
    fingerprints produces k^2/2 candidate rows; with the cap set,
    buckets larger than ``max_bucket_size`` are excluded from candidate
    generation (their members belong to exact/near-exact dedup
    upstream); ``oversized_simhash_buckets`` logs what was dropped.
    Default None = exact (what the oracle checks at small SF).

    Output: (doc_a, doc_b, hamming_dist) with doc_a < doc_b.
    """
    if n_bands not in (1, 2, 4, 8, 16, 32, 64):
        raise ValueError(
            f'n_bands must be a divisor of 64 (got {n_bands})')
    # the band rows CARRY the fingerprint, so the verify step needs no
    # extra joins back to sims and the O(tokens*64) SimHash fold runs in
    # one plan subtree (the band self-join's two sides are the identical
    # exchange, which Spark reuses)
    bands = _simhash_band_table(docs, id_col, text_col, n_bands)
    if max_bucket_size is not None:
        small = (bands.groupBy('band')
                 .agg(F.count('*').alias('_bsz'))
                 .where(F.col('_bsz') <= max_bucket_size)
                 .select('band'))
        bands = bands.join(small, 'band')
    a = bands.alias('a')
    b = bands.alias('b')
    return (
        a.join(b, (F.col('a.band') == F.col('b.band'))
               & (F.col(f'a.{id_col}') < F.col(f'b.{id_col}')))
        .select(F.col(f'a.{id_col}').alias('doc_a'),
                F.col(f'b.{id_col}').alias('doc_b'),
                F.bit_count(F.col('a.sim').bitwiseXOR(F.col('b.sim')))
                 .alias('hamming_dist'))
        .where(F.col('hamming_dist') <= max_dist)
        .distinct()
    )


def oversized_simhash_buckets(docs: DataFrame, max_bucket_size: int,
                              id_col='doc_id', text_col='text',
                              n_bands: int = 4) -> DataFrame:
    """(band, n_docs) for SimHash band buckets above the cap —
    observability hook for what
    ``simhash_neardup_pairs(max_bucket_size=...)`` drops."""
    return (_simhash_band_table(docs, id_col, text_col, n_bands)
            .groupBy('band').agg(F.count('*').alias('n_docs'))
            .where(F.col('n_docs') > max_bucket_size))


def doc_shingle_table(docs: DataFrame, id_col='doc_id', text_col='text',
                      n: int = 3) -> DataFrame:
    """Exploded distinct (doc_id, shingle_hash) pairs.

    Explicitly repartitioned by ``id_col`` BEFORE the distinct: a
    hash partitioning on the id satisfies the clustered-distribution
    requirement of every downstream keyed operation in this family —
    the distinct on (id, shingle), the per-doc signature aggregation,
    and the per-doc size count — so they all share this one exchange
    instead of chaining a second (id-only) shuffle after a
    (id, shingle) one. Trade-off: within-doc duplicate shingles travel
    through the shuffle un-deduped (each doc is one input row, so the
    duplicates were map-local anyway); measured net win on the bench
    and strictly fewer shuffles at scale.
    """
    return docs.select(
        F.col(id_col),
        F.explode(shingle_hashes(tokens(text_col), n)).alias('shingle'),
    ).repartition(id_col).distinct()


def jaccard_pairs(docs: DataFrame, id_col='doc_id', text_col='text',
                  n: int = 3, threshold: float = 0.5,
                  max_df: Optional[int] = None) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs via shingle self-join.

    Shuffle pattern: one exchange on shingle (the join), one on the pair
    key (the count); sizes broadcast back. Candidate generation never
    materializes the full cross product.

    ``max_df`` (scale knob): drop shingles shared by more than max_df
    documents from *candidate generation* — a shingle with document
    frequency f contributes O(f^2) join rows, and ultra-frequent
    shingles are the least informative. Jaccard values are still
    computed over the full shingle sets, so pairs that remain are
    scored exactly; pairs whose only common shingles are ultra-frequent
    are missed (the standard web-dedup approximation). Default None =
    exact (what the oracle checks).
    """
    sh = doc_shingle_table(docs, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count('*').alias('n_shingles'))
    if max_df is not None:
        rare = (sh.groupBy('shingle')
                .agg(F.count('*').alias('df'))
                .where(F.col('df') <= max_df)
                .select('shingle'))
        sh_cand = sh.join(rare, 'shingle')
        a = sh_cand.alias('a')
        b = sh_cand.alias('b')
        candidates = (
            a.join(b, (F.col('a.shingle') == F.col('b.shingle'))
                   & (F.col(f'a.{id_col}') < F.col(f'b.{id_col}')))
            .select(F.col(f'a.{id_col}').alias('doc_a'),
                    F.col(f'b.{id_col}').alias('doc_b'))
            .distinct()
        )
        return _verify_pairs(candidates, sh, sizes, id_col, threshold)
    a = sh.alias('a')
    b = sh.alias('b')
    inter = (
        a.join(b, (F.col('a.shingle') == F.col('b.shingle'))
               & (F.col(f'a.{id_col}') < F.col(f'b.{id_col}')))
        .groupBy(F.col(f'a.{id_col}').alias('doc_a'),
                 F.col(f'b.{id_col}').alias('doc_b'))
        .agg(F.count('*').alias('n_common'))
    )
    return _score_pairs(inter, sizes, id_col, threshold)


def _score_pairs(inter: DataFrame, sizes: DataFrame, id_col: str,
                 threshold: float) -> DataFrame:
    sa = sizes.select(F.col(id_col).alias('doc_a'),
                      F.col('n_shingles').alias('size_a'))
    sb = sizes.select(F.col(id_col).alias('doc_b'),
                      F.col('n_shingles').alias('size_b'))
    return (
        inter.join(sa, 'doc_a').join(sb, 'doc_b')
        .withColumn(
            'jaccard',
            F.round(F.col('n_common')
                    / (F.col('size_a') + F.col('size_b')
                       - F.col('n_common')), 6))
        .where(F.col('jaccard') >= threshold)
        .select('doc_a', 'doc_b', 'jaccard')
    )


def _verify_pairs(candidates: DataFrame, sh: DataFrame, sizes: DataFrame,
                  id_col: str, threshold: float) -> DataFrame:
    """Exact Jaccard over *full* shingle sets, restricted to candidates."""
    sa = sh.select(F.col(id_col).alias('doc_a'),
                   F.col('shingle').alias('sh_a'))
    sb = sh.select(F.col(id_col).alias('_doc_b'),
                   F.col('shingle').alias('sh_b'))
    inter = (
        candidates
        .join(sa, 'doc_a')
        .join(sb, (F.col('doc_b') == F.col('_doc_b'))
              & (F.col('sh_a') == F.col('sh_b')))
        .groupBy('doc_a', 'doc_b')
        .agg(F.count('*').alias('n_common'))
    )
    return _score_pairs(inter, sizes, id_col, threshold)


def positioned_shingle_hashes(tokens_col: Column, n: int = 3) -> Column:
    """Array of (pos, shingle-hash) structs, one per n-gram START
    position (0-based) — the positional variant of ``shingle_hashes``
    (no distinct, no short-doc fallback: docs with < n tokens have no
    n-token substring to report)."""
    hs = F.transform(tokens_col, lambda t: rolling_hash(t))

    def combos(h):
        def one(i):
            out = F.element_at(h, (i + 1).cast('int'))
            for j in range(1, n):
                out = (out * SHINGLE_COMBINE
                       + F.element_at(h, (i + j + 1).cast('int'))) \
                    % HASH_MOD
            return F.struct(i.cast('int').alias('pos'),
                            out.alias('sh'))
        return F.when(
            F.size(h) >= n,
            F.transform(F.sequence(F.lit(0), F.size(h) - n), one)
        ).otherwise(F.array().cast('array<struct<pos:int,sh:bigint>>'))

    return bind_once(hs, combos)


WINNOW_POS_CAP = 1 << 20  # max token positions per doc in the
# winnowing composite key (31-bit hash + 20-bit pos < 2^51, exact in
# int64 AND in a float64 engine); a 1M-token doc should be chunked
# long before fingerprinting


def winnowing_fingerprints(docs: DataFrame, id_col='doc_id',
                           text_col='text', n: int = 3,
                           window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting algorithm;
    re-expressed distributed, not copied).

    Positioned n-gram hashes → per-document sliding window of
    ``window`` consecutive hashes → each full window selects its
    MINIMUM (ties broken by leftmost position via the composite
    ``hash * POS_CAP + pos`` key) → the distinct selections are the
    fingerprint set. The winnowing guarantee: two documents sharing
    any substring of >= ``window + n - 1`` tokens share at least one
    fingerprint, while only ~2/(window+1) of all n-gram hashes are
    stored — the position-aware middle ground between the full
    positioned-shingle index (``duplicated_spans``) and the
    position-blind ``doc_fingerprint`` bottom-k sketch. Docs shorter
    than one full window keep their single global minimum (every
    non-empty doc gets >= 1 fingerprint).

    Scale shape: one positioned-shingle explode (corpus token count
    rows), one per-document window min (doc-bounded partitions — the
    conv_id-style key, not a hot global window), one distinct on
    (doc, key). Output is ~2/(window+1) of the shingle count.

    Output: (id, fp_pos, fp) — the selected position and its n-gram
    hash.
    """
    pos_sh = docs.select(
        F.col(id_col),
        F.explode(positioned_shingle_hashes(tokens(text_col), n))
         .alias('p')
    ).select(F.col(id_col), F.col('p.pos').alias('pos'),
             (F.col('p.sh') * WINNOW_POS_CAP
              + F.col('p.pos')).alias('key'))
    # the composite key is only injective below the cap — fail LOUDLY
    # on a >= 2^20-token doc rather than corrupt its fingerprints
    # (chunk such docs first; see doc_chunks)
    pos_sh = pos_sh.select(
        id_col, 'pos', 'key',
        F.assert_true(F.col('pos') < WINNOW_POS_CAP,
                      F.lit('winnowing: document exceeds '
                            'WINNOW_POS_CAP positions'))
         .alias('__chk')).drop('__chk')
    w_doc = Window.partitionBy(id_col)
    w_slide = (Window.partitionBy(id_col).orderBy('pos')
               .rowsBetween(Window.currentRow, window - 1))
    selected = (pos_sh
                .select(F.col(id_col), 'pos',
                        F.min('key').over(w_slide).alias('wmin'),
                        F.count('*').over(w_doc).alias('m'))
                .where(F.col('pos')
                       <= F.greatest(F.col('m') - window, F.lit(0)))
                .select(F.col(id_col), F.col('wmin'))
                .distinct())
    return selected.select(
        F.col(id_col),
        F.col('wmin').bitwiseAND(WINNOW_POS_CAP - 1)
         .cast('int').alias('fp_pos'),
        F.shiftright('wmin', 20).alias('fp'))


def duplicated_spans(docs: DataFrame, id_col='doc_id', text_col='text',
                     n: int = 5, min_df: int = 2,
                     max_df: Optional[int] = None) -> DataFrame:
    """Exact-substring duplicate regions: per-document token spans
    covered by n-grams that appear in >= ``min_df`` distinct documents.

    The span-level exact dedup of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better" — their suffix-array
    pass removes repeated >= 50-token substrings); the distributed
    re-expression replaces the suffix array with positioned n-gram
    hashes: an m-token duplicated region is exactly a maximal run of
    m-n+1 consecutive duplicated n-grams, so merging overlapping
    duplicated windows (gaps-and-islands per document) recovers the
    same spans. ``n`` is the minimum duplicated length reported.

    ``max_df`` is the stop-gram cap, the skew guard for the join-back:
    an n-gram occurring in more than ``max_df`` documents (a
    boilerplate phrase in 10^8 docs) would land every one of its
    occurrence rows on a single join key, so hashes with
    df > ``max_df`` are excluded from the duplicated set — mirroring
    Lee et al.'s practice of dropping ultra-common substrings.  Use
    :func:`oversized_ngrams` to observe what a given cap excludes.
    Default ``None`` (no cap) keeps the exact semantics for
    moderate-scale corpora.

    Scale shape: positioned-shingle explode (corpus token count rows) →
    distinct (doc, hash) → df count on the hash key → join back on the
    hash → one window per document for the island merge. Every shuffle
    is on a high-cardinality key; no driver state. Output rows are
    linear in duplicated-occurrence count (no pair explosion).

    Output: (id, span_start, span_end, n_tokens) with end exclusive,
    spans disjoint per document, ordered by construction. Two maximal
    runs that touch without overlapping (previous span's exclusive end
    == next duplicated window's start) are reported as two adjacent
    spans, not merged into one: the island break is ``pos >=
    prev_max``, which is what the SQL oracle and the randomized
    brute-force reference pin. Coverage (the union of reported token
    ranges) is identical either way.
    """
    pos_sh = docs.select(
        F.col(id_col),
        F.explode(positioned_shingle_hashes(tokens(text_col), n))
         .alias('p')
    ).select(F.col(id_col), F.col('p.pos').alias('pos'),
             F.col('p.sh').alias('sh'))
    df_counts = (pos_sh.select(id_col, 'sh').distinct()
                 .groupBy('sh').agg(F.count('*').alias('df'))
                 .where(F.col('df') >= min_df))
    if max_df is not None:
        df_counts = df_counts.where(F.col('df') <= max_df)
    df_counts = df_counts.select('sh')
    dup = pos_sh.join(df_counts, 'sh').select(
        id_col, 'pos', (F.col('pos') + n).alias('end'))
    w_order = Window.partitionBy(id_col).orderBy('pos')
    prev_max = F.max('end').over(
        w_order.rowsBetween(Window.unboundedPreceding, -1))
    islands = dup.select(
        id_col, 'pos', 'end',
        F.sum(F.when(prev_max.isNull() | (F.col('pos') >= prev_max), 1)
              .otherwise(0)).over(w_order).alias('island'))
    return (islands.groupBy(id_col, 'island')
            .agg(F.min('pos').alias('span_start'),
                 F.max('end').alias('span_end'))
            .select(
                id_col,
                F.col('span_start').cast('int').alias('span_start'),
                F.col('span_end').cast('int').alias('span_end'),
                (F.col('span_end') - F.col('span_start')).cast('int')
                 .alias('n_tokens')))


def remove_duplicated_spans(docs: DataFrame, id_col='doc_id',
                            text_col='text', n: int = 5, min_df: int = 2,
                            max_df: Optional[int] = None) -> DataFrame:
    """The *apply* side of :func:`duplicated_spans` (Lee et al. 2022's
    actual dedup step): drop every token covered by a duplicated span
    and reassemble the document.

    Scale shape: the span table is tiny relative to the corpus (one row
    per duplicated region), so it is grouped to one array per document
    (bounded: spans are disjoint, ≤ n_tokens/n per doc) and joined back
    on the document key; token filtering then happens inside a single
    projection with higher-order functions — no token-level shuffle.
    Documents with no duplicated spans keep their normalized text
    through the left join.

    Output: (id, clean_text, n_tokens, n_removed) with clean_text the
    space-joined surviving tokens.
    """
    spans = duplicated_spans(docs, id_col, text_col, n, min_df, max_df)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct('span_start', 'span_end')).alias('_spans'))
    joined = docs.join(per_doc, id_col, 'left').select(
        F.col(id_col),
        tokens(text_col).alias('_toks'),
        F.coalesce(
            '_spans',
            F.array().cast(
                'array<struct<span_start:int,span_end:int>>'))
         .alias('_spans'))
    kept = F.filter(
        F.col('_toks'),
        lambda t, i: ~F.exists(
            F.col('_spans'),
            lambda s: (i >= s['span_start']) & (i < s['span_end'])))
    return joined.select(
        F.col(id_col),
        F.inline(F.transform(F.array(kept), lambda k: F.struct(
            F.array_join(k, ' ').alias('clean_text'),
            F.size(k).alias('n_tokens'),
        ))),
        (F.size('_toks')).alias('_total'),
    ).select(
        id_col, 'clean_text', 'n_tokens',
        (F.col('_total') - F.col('n_tokens')).cast('int')
         .alias('n_removed'))


def oversized_ngrams(docs: DataFrame, max_df: int, id_col='doc_id',
                     text_col='text', n: int = 5) -> DataFrame:
    """(sh, df) for n-gram hashes above the stop-gram cap —
    observability hook for what ``duplicated_spans(max_df=...)``
    excludes. Same shuffle shape as the df-count stage itself (one
    distinct + one groupBy on the hash key), so it is safe to run at
    any corpus size before committing to a cap."""
    pos_sh = docs.select(
        F.col(id_col),
        F.explode(positioned_shingle_hashes(tokens(text_col), n))
         .alias('p')
    ).select(F.col(id_col), F.col('p.sh').alias('sh'))
    return (pos_sh.distinct()
            .groupBy('sh').agg(F.count('*').alias('df'))
            .where(F.col('df') > max_df))


def oversized_minhash_buckets(docs: DataFrame, max_bucket_size: int,
                              id_col='doc_id', text_col='text',
                              n: int = 3) -> DataFrame:
    """(band, n_docs) for LSH buckets above the cap — observability hook
    for what ``minhash_dedup_pairs(max_bucket_size=...)`` drops."""
    sig = minhash_signature_table(docs, id_col, text_col, n)
    return (minhash_band_table(sig, id_col)
            .groupBy('band').agg(F.count('*').alias('n_docs'))
            .where(F.col('n_docs') > max_bucket_size))


def minhash_dedup_pairs(docs: DataFrame, id_col='doc_id', text_col='text',
                        n: int = 3, threshold: float = 0.5,
                        max_bucket_size: Optional[int] = None) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact Jaccard.

    shingle -> minhash signature -> band -> bucket self-join (candidates)
    -> exact-Jaccard verification. At scale the band join touches only
    colliding buckets; the verification join is on the (small) candidate
    set. This is the scale path; ``jaccard_pairs`` is the exact baseline.

    ``max_bucket_size`` (skew guard): a band bucket holding k documents
    (k near-identical docs all sharing a minhash band) produces k^2/2
    candidate rows; at web scale one hot bucket can dominate the whole
    job. With the cap set, buckets larger than ``max_bucket_size`` are
    excluded from candidate generation (their members are by definition
    near-identical — exact dedup upstream is the right tool for them);
    use ``oversized_minhash_buckets`` to log what was dropped. Default
    None = exact (every colliding bucket considered; what the oracle
    checks at small SF).
    """
    sig = minhash_signature_table(docs, id_col, text_col, n)
    bands = minhash_band_table(sig, id_col)
    if max_bucket_size is not None:
        small = (bands.groupBy('band')
                 .agg(F.count('*').alias('_bsz'))
                 .where(F.col('_bsz') <= max_bucket_size)
                 .select('band'))
        bands = bands.join(small, 'band')
    a = bands.alias('a')
    b = bands.alias('b')
    candidates = (
        a.join(b, (F.col('a.band') == F.col('b.band'))
               & (F.col(f'a.{id_col}') < F.col(f'b.{id_col}')))
        .select(F.col(f'a.{id_col}').alias('doc_a'),
                F.col(f'b.{id_col}').alias('doc_b'))
        .distinct()
    )
    # exact-Jaccard verification restricted to the candidate set: the
    # shingle join fans out per *candidate pair*, never per hot shingle,
    # so cost scales with |candidates|, not sum(df^2) over shingles.
    sh = doc_shingle_table(docs, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count('*').alias('n_shingles'))
    return _verify_pairs(candidates, sh, sizes, id_col, threshold)


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        # local-mode default; a cluster deployment should point this at
        # durable storage (HDFS/S3) via sparkContext.setCheckpointDir and
        # set spark.cleaner.referenceTracking.cleanCheckpoints=true so
        # superseded per-round edge sets are reclaimed as their RDDs are
        # GC'd. The temp dir we create ourselves is removed at process
        # exit — reliable checkpoints are otherwise never deleted.
        import atexit
        import shutil
        import tempfile
        path = tempfile.mkdtemp(prefix='ocrodjvu-spark-cc-')
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        sc.setCheckpointDir(path)


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round: link every strictly-larger neighbor of u to
    min(N(u) + {u}). Edges must be a distinct undirected pair set."""
    bidir = edges.union(
        edges.select(F.col('v').alias('u'), F.col('u').alias('v')))
    mins = bidir.groupBy('u').agg(F.min('v').alias('mv')) \
        .select('u', F.least('mv', 'u').alias('m'))
    return (bidir.join(mins, 'u')
            .where(F.col('v') > F.col('u'))
            .select(F.col('v').alias('u'), F.col('m').alias('v'))
            .where(F.col('u') != F.col('v'))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient edges large->small, then link every
    smaller neighbor (and u itself) to the group minimum."""
    directed = edges.select(
        F.greatest('u', 'v').alias('u'), F.least('u', 'v').alias('v'))
    mins = directed.groupBy('u').agg(F.min('v').alias('m'))
    relink = (directed.join(mins, 'u')
              .where(F.col('v') != F.col('m'))
              .select(F.col('v').alias('u'), F.col('m').alias('v')))
    self_link = mins.select('u', F.col('m').alias('v'))
    return relink.union(self_link).where(F.col('u') != F.col('v')) \
        .distinct()


def connected_components(edges: DataFrame, u_col='doc_a', v_col='doc_b',
                         max_iterations: int = 25) -> DataFrame:
    """Connected components via alternating large-star / small-star.

    The map-reduce CC algorithm of Kiveris et al. (KDD'14): each round
    is two shuffles (a groupBy-min and a re-link join per star step) and
    the edge set contracts toward a star per component in O(log n)
    rounds *independent of component diameter* — a 1M-node chain
    converges in ~20 rounds where min-label propagation needs 1M.
    Reliable ``checkpoint()`` (not localCheckpoint) truncates lineage
    each round and survives executor loss. Convergence is detected on
    the checkpointed edge set itself (count + set-difference), so no
    extra lineage is dragged along.

    Returns (v, cluster_id = component minimum) for every vertex.
    """
    edges = edges.select(F.col(u_col).alias('u'), F.col(v_col).alias('v')) \
        .where(F.col('u') != F.col('v')).distinct()
    _ensure_checkpoint_dir(edges)
    cur = edges.checkpoint()
    cur_count = cur.count()
    for _ in range(max_iterations):
        nxt = _small_star(_large_star(cur)).checkpoint()
        nxt_count = nxt.count()
        if nxt_count == cur_count and nxt.subtract(cur).isEmpty():
            # fixed point: every edge is (v, component_min)
            stars = nxt
            labels = stars.select(F.col('u').alias('v'),
                                  F.col('v').alias('cluster_id'))
            roots = stars.select(F.col('v').alias('v'),
                                 F.col('v').alias('cluster_id')).distinct()
            return labels.union(roots).distinct()
        cur, cur_count = nxt, nxt_count
    raise RuntimeError(
        f'connected_components did not converge in {max_iterations} '
        'alternating star rounds (expected O(log n)); raise '
        'max_iterations')


def dedup_clusters(docs: DataFrame, id_col='doc_id', text_col='text',
                   n: int = 3, threshold: float = 0.5,
                   max_iterations: int = 25) -> DataFrame:
    """Near-duplicate clusters: connected components over MinHash pairs.

    Pair generation is the LSH-banded ``minhash_dedup_pairs``; component
    labeling is the O(log n)-round alternating-star algorithm (see
    ``connected_components``). Output: (doc_id, cluster_id = min doc_id
    of the component) for every document with at least one near-dup.
    """
    edges = minhash_dedup_pairs(docs, id_col, text_col, n, threshold) \
        .select('doc_a', 'doc_b')
    cc = connected_components(edges, max_iterations=max_iterations)
    return cc.select(F.col('v').alias(id_col), 'cluster_id')


def dedup_cluster_apply(docs: DataFrame, id_col='doc_id',
                        text_col='text', n: int = 3,
                        threshold: float = 0.5,
                        max_iterations: int = 25) -> DataFrame:
    """Keep-one-per-cluster corpus filter — the apply side of
    :func:`dedup_clusters`: every document outside any near-dup cluster
    survives, and each cluster keeps its minimum-id representative.

    Scale shape: the cluster labels (already linear in clustered docs)
    shrink to the non-representative members, then one left-anti join
    on the high-cardinality document key drops them — no broadcast of
    anything corpus-sized, no second pass over text.
    """
    labels = dedup_clusters(docs, id_col, text_col, n, threshold,
                            max_iterations)
    losers = labels.where(F.col(id_col) != F.col('cluster_id')) \
        .select(id_col)
    return docs.join(losers, id_col, 'left_anti') \
        .select(F.col(id_col), F.col(text_col))


# --- language ID + quality -------------------------------------------------

STOPWORDS = {
    'en': ('the', 'and', 'of', 'to', 'a', 'in', 'is', 'it', 'that', 'for'),
    'de': ('der', 'die', 'das', 'und', 'ist', 'von', 'mit', 'den', 'im',
           'ein'),
    'fr': ('le', 'la', 'les', 'et', 'de', 'un', 'une', 'est', 'dans',
           'pour'),
    'es': ('el', 'la', 'los', 'y', 'de', 'un', 'una', 'es', 'en', 'por'),
}
LANG_ORDER = ('en', 'de', 'fr', 'es')


def stopword_hits(tokens_col: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens_col,
                           lambda t: F.array_contains(words, t)))


def language_id(docs: DataFrame, id_col='doc_id',
                text_col='text') -> DataFrame:
    """Stopword-hit language classifier with deterministic tie-break.

    argmax over LANG_ORDER; 'und' (undetermined) when no stopword hits.
    """
    toks = tokens(text_col)
    hits = [stopword_hits(toks, lang).alias(f'hits_{lang}')
            for lang in LANG_ORDER]
    scored = docs.select(F.col(id_col), F.size(toks).alias('n_tokens'),
                         *hits)
    best = F.greatest(*[F.col(f'hits_{lang}') for lang in LANG_ORDER])
    pred = F.when(best <= 0, F.lit('und'))
    for lang in LANG_ORDER:
        pred = pred.when(F.col(f'hits_{lang}') == best, F.lit(lang))
    return scored.select(
        id_col, 'n_tokens',
        *[f'hits_{lang}' for lang in LANG_ORDER],
        pred.alias('lang_pred'),
        F.round(best / F.greatest(F.col('n_tokens'), F.lit(1)), 6)
         .alias('stopword_ratio'),
    )


# Character-trigram profiles (ASCII): the most frequent trigrams of each
# language's running text, including space-adjacent ones. A deliberately
# tiny profile — the operator shape (per-row trigram scan vs broadcast
# profiles) is what matters; production swaps in bigger tables.
TRIGRAM_PROFILES = {
    'en': ('the', 'he ', ' th', 'and', 'ing', 'ion', ' of'),
    'de': ('der', 'ein', 'sch', 'ich', 'nde', 'die', 'und'),
    'fr': ('es ', 'de ', 'ent', 'le ', 'nt ', 'que', 'les'),
    'es': ('de ', 'os ', ' de', 'la ', ' la', 'que', 'ado'),
}


def language_id_ngram(docs: DataFrame, id_col='doc_id',
                      text_col='text') -> DataFrame:
    """Character-n-gram language classifier (profile-hit heuristic).

    Counts how many of the text's character trigrams appear in each
    language's profile and takes the argmax (ties in LANG_ORDER; 'und'
    when nothing hits). Complements the stopword classifier
    (``language_id``): n-gram profiles also fire on inflected forms and
    unsegmented text. JVM-side per-row scan, no shuffle.
    """
    norm = norm_text(text_col)
    scored = docs.select(F.col(id_col), norm.alias('norm'))
    positions = F.sequence(F.lit(1), F.length('norm') - 2)

    def hits(lang):
        profile = F.array(*[F.lit(t) for t in TRIGRAM_PROFILES[lang]])
        return F.size(F.filter(
            positions,
            lambda i: F.array_contains(
                profile, F.col('norm').substr(i, F.lit(3)))))

    scored = scored.select(
        id_col,
        (F.length('norm') - 2).cast('int').alias('n_trigrams'),
        *[hits(lang).alias(f'hits_{lang}') for lang in LANG_ORDER])
    best = F.greatest(*[F.col(f'hits_{lang}') for lang in LANG_ORDER])
    pred = F.when(best <= 0, F.lit('und'))
    for lang in LANG_ORDER:
        pred = pred.when(F.col(f'hits_{lang}') == best, F.lit(lang))
    return scored.select(
        id_col, 'n_trigrams',
        *[f'hits_{lang}' for lang in LANG_ORDER],
        pred.alias('lang_pred'),
        F.round(best / F.greatest(F.col('n_trigrams'), F.lit(1)), 6)
         .alias('trigram_ratio'),
    )


def quality_score(docs: DataFrame, id_col='doc_id',
                  text_col='text') -> DataFrame:
    """Heuristic document quality features + a combined score."""
    norm = norm_text(text_col)
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(norm)
    alpha_chars = F.length(F.regexp_replace(norm, r'[^a-zA-Z]', ''))
    punct_chars = F.length(F.regexp_replace(norm, r'[^.,;:!?]', ''))
    en_words = F.array(*[F.lit(w) for w in STOPWORDS['en']])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en_words,
                                                                 t)))
    mean_tok = (n_chars - (n_tokens - 1)) / F.greatest(n_tokens, F.lit(1))
    alpha_ratio = alpha_chars / F.greatest(n_chars, F.lit(1))
    punct_ratio = punct_chars / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.25
        + alpha_ratio * 0.25
        + (F.lit(1.0) - punct_ratio) * 0.25
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.25
    )
    return docs.select(
        id_col,
        n_tokens.alias('n_tokens'),
        F.round(mean_tok, 6).alias('mean_token_len'),
        F.round(alpha_ratio, 6).alias('alpha_ratio'),
        F.round(punct_ratio, 6).alias('punct_ratio'),
        F.round(stop_ratio, 6).alias('stopword_ratio'),
        F.round(score, 6).alias('quality_score'),
    )


def repetition_stats(docs: DataFrame, id_col='doc_id',
                     text_col='text') -> DataFrame:
    """Gopher/MassiveText-style repetition quality signals per document.

    * ``dup_token_frac``: 1 - distinct/total tokens — computed as a pure
      array projection (``array_distinct``), no explode, no shuffle;
    * ``top_bigram_frac``: share of bigram occurrences taken by the most
      frequent bigram — the classic boilerplate/spam signal; one explode
      + (doc, bigram) groupBy with map-side partials, then a doc-level
      rollup. One tokenize pass total (the token-level stats ride along
      as grouping-invariant columns, not a second explode — the TF-IDF
      double-tokenize lesson).

    Repetitive machine-generated text scores high on both; Rae et al.
    (Gopher, 2021) appendix A cut documents on exactly these families of
    thresholds.
    """
    toks = tokens(text_col)

    # bind the token array ONCE as a lambda variable (the shingle_hashes
    # pattern): Catalyst inlines duplicated higher-order expressions on
    # projection collapse, so referencing `toks` inside the per-bigram
    # lambda would re-tokenize the document per bigram — O(n_tokens^2)
    def stats(t):
        bigrams = F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 2),
                lambda i: F.concat(
                    F.element_at(t, (i + 1).cast('int')), F.lit(' '),
                    F.element_at(t, (i + 2).cast('int'))))
        ).otherwise(F.array().cast('array<string>'))
        return F.struct(
            F.size(t).alias('n_tokens'),
            F.size(F.array_distinct(t)).alias('n_distinct'),
            bigrams.alias('bigrams'))

    base = docs.select(
        F.col(id_col),
        F.inline(F.array(bind_once(toks, stats)))
    ).select(
        F.col(id_col), 'n_tokens', 'n_distinct',
        F.explode_outer('bigrams').alias('bigram'))
    per_bigram = base.groupBy(
        id_col, 'n_tokens', 'n_distinct', 'bigram').agg(
        F.count('*').alias('c'))
    not_null = F.col('bigram').isNotNull()
    per_doc = per_bigram.groupBy(id_col, 'n_tokens', 'n_distinct').agg(
        F.sum(F.when(not_null, F.col('c')).otherwise(0))
         .alias('n_bigrams'),
        F.max(F.when(not_null, F.col('c')).otherwise(0))
         .alias('top_bigram_count'))
    return per_doc.select(
        id_col,
        F.col('n_tokens').cast('int').alias('n_tokens'),
        F.round(1.0 - F.col('n_distinct')
                / F.greatest(F.col('n_tokens'), F.lit(1)), 6)
         .alias('dup_token_frac'),
        F.col('n_bigrams').cast('int').alias('n_bigrams'),
        F.round(F.col('top_bigram_count')
                / F.greatest(F.col('n_bigrams'), F.lit(1)), 6)
         .alias('top_bigram_frac'),
    )


def gopher_rules(docs: DataFrame, id_col='doc_id', text_col='text',
                 min_words: int = 20, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 min_alpha_word_frac: float = 0.8,
                 min_stop_hits: int = 2) -> DataFrame:
    """Gopher-style document filter (Rae et al. 2021, appendix A).

    Per document: word-count bounds, mean word length bounds,
    symbol-to-word ratio (``#`` and ``...``), fraction of words with at
    least one alphabetic character, and a minimum stopword-hit count —
    plus the combined ``keep`` verdict. One tokenize pass (every token
    statistic is folded from a single bound lambda variable), a pure
    map-side projection: no shuffle, scales linearly with executors.
    """
    norm = norm_text(text_col)
    hash_chars = F.length(norm) - F.length(F.replace(norm, F.lit('#')))
    ellipses = F.size(F.regexp_extract_all(norm, F.lit(r'\.\.\.'), 0))
    en_words = F.array(*[F.lit(w) for w in STOPWORDS['en']])

    def stats(t):
        return F.struct(
            F.size(t).alias('n_words'),
            F.aggregate(t, F.lit(0).cast('long'),
                        lambda acc, w: acc + F.length(w)).alias('sum_len'),
            F.size(F.filter(t, lambda w: w.rlike('[a-zA-Z]')))
             .alias('n_alpha_words'),
            F.size(F.filter(t, lambda w: F.array_contains(en_words, w)))
             .alias('stop_hits'),
        )

    feat = docs.select(
        F.col(id_col),
        F.inline(F.array(bind_once(tokens(text_col), stats))),
        hash_chars.alias('hash_chars'), ellipses.alias('ellipses'))
    n_words = F.col('n_words')
    mean_word_len = F.col('sum_len') / F.greatest(n_words, F.lit(1))
    symbol_ratio = ((F.col('hash_chars') + F.col('ellipses'))
                    / F.greatest(n_words, F.lit(1)))
    alpha_frac = F.col('n_alpha_words') / F.greatest(n_words, F.lit(1))
    keep = (
        (n_words >= min_words) & (n_words <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (alpha_frac >= min_alpha_word_frac)
        & (F.col('stop_hits') >= min_stop_hits)
    )
    return feat.select(
        id_col,
        n_words.cast('int').alias('n_words'),
        F.round(mean_word_len, 6).alias('mean_word_len'),
        F.round(symbol_ratio, 6).alias('symbol_word_ratio'),
        F.round(alpha_frac, 6).alias('alpha_word_frac'),
        F.col('stop_hits').cast('int').alias('stop_hits'),
        keep.cast('int').alias('keep'),
    )


QUANTILE_PROBS = (0.25, 0.5, 0.75, 0.95)


def length_quantiles(docs: DataFrame, value_col='n_chars',
                     stratum_col='lang', approx: bool = False,
                     accuracy: int = 10_000) -> DataFrame:
    """Per-stratum length distribution (the data-card table): p25 / p50 /
    p75 / p95 of ``value_col`` plus the document count.

    ``approx=False`` uses the exact interpolating ``percentile``
    aggregate — it buffers every group value in the aggregation buffer,
    fine up to millions of rows per stratum and bit-comparable to the
    SQL oracle's ``quantile_cont``. At 100 TB use ``approx=True``:
    ``approx_percentile`` (Greenwald-Khanna sketch, bounded memory,
    map-side combinable) with ``accuracy`` trading error for buffer
    size — same output schema, not oracle-exact by construction.
    """
    probs = F.array(*[F.lit(p) for p in QUANTILE_PROBS])
    if approx:
        q = F.percentile_approx(value_col, probs, F.lit(accuracy))
    else:
        q = F.percentile(value_col, probs)
    return (docs.groupBy(F.col(stratum_col).alias('stratum'))
            .agg(F.count('*').alias('n_docs'), q.alias('q'))
            .select('stratum', 'n_docs',
                    *[F.round(F.element_at('q', i + 1), 6)
                      .alias(f'p{int(p * 100)}')
                      for i, p in enumerate(QUANTILE_PROBS)]))


def sampled_quantiles(docs: DataFrame, value_col='n_chars',
                      key_col='doc_id', stratum_col='lang',
                      rate: int = 4) -> DataFrame:
    """Deterministic hash-sampled quantiles: the third quantile path —
    oracle-exact like ``length_quantiles(approx=False)`` AND
    memory-bounded like ``approx=True``.

    The sample is the rows whose portable rolling hash of the key is
    ``0 (mod rate)``: deterministic (no RNG — stable across retries,
    partitionings, and engines, so DuckDB draws the IDENTICAL sample),
    uniform under the hash, and MERGEABLE — the sample of a corpus
    union is the union of the samples, so per-snapshot/per-partition
    samples compose exactly like the Bloom/HLL/CMS monoids
    (completing the portable sketch family with quantiles). The exact
    interpolating percentile then buffers only ~1/rate of each
    stratum; at 100 TB pick rate so strata sample to ~10^6 rows.
    Unlike ``approx_percentile`` (Greenwald-Khanna, engine-specific
    internals), every step here is reproducible in plain SQL.
    """
    h = rolling_hash(F.col(key_col).cast('string'))
    sample = docs.where(h % F.lit(rate) == 0)
    probs = F.array(*[F.lit(p) for p in QUANTILE_PROBS])
    return (sample.groupBy(F.col(stratum_col).alias('stratum'))
            .agg(F.count('*').alias('n_sampled'),
                 F.percentile(value_col, probs).alias('q'))
            .select('stratum', 'n_sampled',
                    *[F.round(F.element_at('q', i + 1), 6)
                      .alias(f'p{int(p * 100)}')
                      for i, p in enumerate(QUANTILE_PROBS)]))


def dedup_lines(docs: DataFrame, id_col='doc_id', text_col='text',
                min_chars: int = 10) -> DataFrame:
    """C4's cross-document span dedup at line granularity (Raffel et
    al. 2020 deduplicate repeated three-sentence spans corpus-wide;
    the line is the natural span unit for transcript markup): every
    line of at least ``min_chars`` characters is kept only at its
    FIRST occurrence in the corpus (ordered by document id, then line
    position); later occurrences are dropped and each document is
    reassembled from its surviving lines. Short lines are exempt —
    deduping "yes." corpus-wide would shred the documents.

    Scale shape: one line explode, then keep-first as a min-struct
    AGGREGATION on the line content key — ``groupBy(line).agg(min(
    struct(id, idx)))`` — NOT a ``row_number`` window. Boilerplate
    lines are exactly the skewed keys, and a window partitioned on the
    line would ship every duplicate of a 10^8-occurrence footer line
    through one task with no partial aggregation; the min aggregate
    collapses the hot key map-side to one row per partition, and the
    join back to the exploded lines is a plain equi-join AQE can
    skew-split. Short lines are exempt up front (never enter the
    build side), keeping "yes." off the hot path entirely. One
    groupBy per document reassembles.

    Output: (id, clean_text, n_lines, n_removed).
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(text_col, r'\r?\n'))
         .alias('line_idx', 'line'))
    firsts = (lines
              .where(F.length('line') >= min_chars)
              .groupBy('line')
              .agg(F.min(F.struct(F.col(id_col), F.col('line_idx')))
                    .alias('_first')))
    marked = (lines
              .join(firsts, 'line', 'left')
              .select(
                  id_col, 'line_idx', 'line',
                  F.when(F.length('line') < min_chars, F.lit(True))
                   .otherwise(F.struct(F.col(id_col), F.col('line_idx'))
                              == F.col('_first')).alias('_keep')))
    return (marked.groupBy(id_col)
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.when(
                            F.col('_keep'),
                            F.struct('line_idx', 'line')))),
                        lambda s: s['line']), '\n').alias('clean_text'),
                F.sum(F.when(F.col('_keep'), 1).otherwise(0)).cast('int')
                 .alias('n_lines'),
                F.sum(F.when(F.col('_keep'), 0).otherwise(1)).cast('int')
                 .alias('n_removed')))


def incremental_dedup(
    new_docs: DataFrame,
    seen_keys: DataFrame,
    id_col: str = 'doc_id',
    text_col: str = 'text',
    key_col: str = 'content_hash',
    bloom_filter=None,
) -> DataFrame:
    """Cross-snapshot dedup: which new-crawl documents survive against
    an existing corpus snapshot?

    Survivors are documents whose normalized-content hash (a) does not
    appear in ``seen_keys`` (one column named ``key_col``) and (b) are
    the first occurrence of their hash inside this batch (min id —
    the skew-safe min-struct aggregation, not a window).

    ``bloom_filter`` (the ``bloom.bloom_build`` result over the seen
    keys — the BloomFilter carries its own (m_bits, k), so a parameter
    mismatch with build time cannot silently corrupt the result)
    is the scale path: keys the filter rejects are DEFINITELY unseen
    (no false negatives) and skip the anti-join entirely; only the
    ``maybe_present`` minority — true dupes plus the designed FP rate —
    reaches the exact check. At 100 TB the anti-join's shuffle shrinks
    by whatever fraction of the batch is genuinely new, for the cost
    of a broadcast-sized bitmap probe. The result is provably
    IDENTICAL with or without the prefilter, which is exactly what the
    driver gate checks (its oracle is bloom-agnostic).
    """
    keyed = new_docs.select(
        F.col(id_col), F.md5(norm_text(text_col)).alias(key_col))
    seen = seen_keys.select(F.col(key_col)).distinct()
    if bloom_filter is not None:
        from .bloom import bloom_probe
        probed = bloom_probe(
            keyed.select(F.col(key_col).alias('key')),
            bloom_filter)
        flagged = keyed.join(
            probed.withColumnRenamed('key', key_col), key_col)
        fast = (flagged.where(~F.col('maybe_present'))
                .select(id_col, key_col))
        slow = (flagged.where(F.col('maybe_present'))
                .select(id_col, key_col)
                .join(seen, key_col, 'left_anti'))
        unseen = fast.unionByName(slow)
    else:
        unseen = keyed.join(seen, key_col, 'left_anti')
    return (unseen
            .groupBy(key_col)
            .agg(F.min(F.col(id_col)).alias(id_col))
            .select(id_col, key_col))


SCRIPT_CLASSES = (
    # (name, Java regex class, RE2/DuckDB regex class) — order is the
    # deterministic tie-break for the dominant script
    ('latin', r'\p{IsLatin}', r'\p{Latin}'),
    ('cyrillic', r'\p{IsCyrillic}', r'\p{Cyrillic}'),
    ('cjk', r'\p{IsHan}', r'\p{Han}'),
    ('thai', r'\p{IsThai}', r'\p{Thai}'),
)


def script_profile(docs: DataFrame, id_col='doc_id',
                   text_col='text') -> DataFrame:
    """Per-document script composition + dominant script — the routing
    signal for script-specific downstream stages (which segmentation
    locale to use, which LM to score with, whether dictionary breaking
    applies). All counting is JVM-side regex char-class stripping
    (count = length before minus length after removing the class), one
    projection, no shuffle, no Python.

    Output: (id, n_chars, latin_frac..thai_frac rounded to 6dp,
    dominant) with dominant = argmax fraction over SCRIPT_CLASSES order
    ('other' when no class fires).
    """
    def frac(t, java_cls):
        return (F.length(t)
                - F.length(F.regexp_replace(t, java_cls, ''))) \
            / F.greatest(F.length(t), F.lit(1))

    t = F.col('_t')
    staged = docs.select(F.col(id_col), norm_text(text_col).alias('_t')) \
        .select(id_col, F.length('_t').alias('n_chars'),
                *[F.round(frac(t, cls), 6).alias(f'{name}_frac')
                  for name, cls, _ in SCRIPT_CLASSES])
    best = F.greatest(*[F.col(f'{n}_frac') for n, _, _ in SCRIPT_CLASSES])
    dominant = F.when(best <= 0, F.lit('other'))
    for name, _, _ in SCRIPT_CLASSES:
        dominant = dominant.when(F.col(f'{name}_frac') == best,
                                 F.lit(name))
    return staged.select(
        id_col, 'n_chars',
        *[f'{n}_frac' for n, _, _ in SCRIPT_CLASSES],
        dominant.alias('dominant'))


def quality_buckets(docs: DataFrame, id_col='doc_id', text_col='text',
                    vocab_size: int = 50000) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): corpus
    tercile thresholds over the LM quality score split documents into
    head / middle / tail; docs with no score (zero trigrams) are
    'unscored'.

    Scale shape: the thresholds are ONE aggregate row broadcast back
    over the corpus (no global sort / ntile — a single-partition window
    would serialize the corpus through one task at 100 TB). The exact
    interpolating ``percentile`` is oracle-comparable; swap
    ``percentile_approx`` in at extreme scale (same shape, documented
    like ``length_quantiles``).
    """
    scored = lm_score(docs, id_col, text_col, vocab_size)
    # cuts rounded to 6dp (same convention as lm_score itself): Spark
    # F.percentile and DuckDB quantile_cont interpolate in different
    # fp orders, so un-rounded cuts could bucket a doc sitting exactly
    # at a threshold differently between engine and oracle
    cuts = scored.agg(
        F.round(F.percentile('lm_score', F.lit(1.0 / 3)), 6).alias('q33'),
        F.round(F.percentile('lm_score', F.lit(2.0 / 3)), 6).alias('q66'))
    return (scored.crossJoin(F.broadcast(cuts))
            .select(
                id_col, 'lm_score',
                F.when(F.col('lm_score').isNull(), 'unscored')
                 .when(F.col('lm_score') >= F.col('q66'), 'head')
                 .when(F.col('lm_score') >= F.col('q33'), 'middle')
                 .otherwise('tail').alias('bucket')))


def c4_rules(docs: DataFrame, id_col='doc_id', text_col='text',
             min_line_words: int = 5,
             min_kept_lines: int = 3) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020, section 2.2): line-level
    filtering plus document-level exclusions.

    A line survives iff it ends in terminal punctuation (``. ! ? "``)
    and has at least ``min_line_words`` words; the document survives iff
    at least ``min_kept_lines`` lines survive AND the text contains no
    ``{`` (code marker) and no ``lorem ipsum`` (boilerplate marker).
    The paper's dirty-word list and three-sentence-span dedup are
    covered elsewhere (``pii_scrub`` / ``duplicated_spans``).

    One pass over the line array (the split and the filtered array are
    each evaluated exactly once via bound lambda variables — Catalyst
    has no CSE for lambdas), pure map-side projection: no shuffle,
    scales linearly with executors.

    Output: (doc_id, n_lines, n_kept_lines, kept_text, keep).
    """
    def line_ok(ln):
        # full whitespace trim (bound once), not F.trim: a bare trailing
        # \r (no \n after it) would otherwise both let Java's `$` match
        # before the \r AND add a trailing empty token that inflates the
        # word count past min_line_words; an all-whitespace line counts
        # as zero words
        return bind_once(
            F.regexp_replace(ln, r'^\s+|\s+$', ''),
            lambda t: ((t != '')
                       & (F.size(F.split(t, r'\s+')) >= min_line_words)
                       & t.rlike('[.!?"]$')))

    def stats(ls):
        return F.struct(
            F.size(ls).alias('n_lines'),
            bind_once(
                F.filter(ls, line_ok),
                lambda kept: F.struct(
                    F.size(kept).alias('n_kept_lines'),
                    F.array_join(kept, '\n').alias('kept_text'))
            ).alias('k'))

    # split on \r?\n so CRLF documents don't leave a trailing \r on each
    # line: F.trim strips only spaces, and Java's `$` would still match
    # before a final \r while the documented RE2/oracle semantics don't
    lines = F.split(F.col(text_col), r'\r?\n')
    feat = docs.select(
        F.col(id_col),
        F.inline(F.array(bind_once(lines, stats))),
        F.col(text_col).contains('{').alias('has_brace'),
        F.lower(F.col(text_col)).contains('lorem ipsum').alias('has_lorem'))
    keep = ((F.col('k.n_kept_lines') >= min_kept_lines)
            & ~F.col('has_brace') & ~F.col('has_lorem'))
    return feat.select(
        id_col,
        F.col('n_lines').cast('int').alias('n_lines'),
        F.col('k.n_kept_lines').cast('int').alias('n_kept_lines'),
        F.col('k.kept_text').alias('kept_text'),
        keep.cast('int').alias('keep'),
    )


SAMPLE_DENOM = 10_000


def stratified_sample(docs: DataFrame, rates: dict,
                      id_col='doc_id', text_col='text',
                      stratum_col='lang', default_rate: float = 0.0,
                      salt: str = 'sample') -> DataFrame:
    """Deterministic per-stratum downsampling (the data-mix resampling
    step): keep a document iff its salted rolling text hash mod
    ``SAMPLE_DENOM`` falls under the stratum's threshold.

    No RNG and no driver state, so the sample is reproducible across
    runs, engines and repartitionings — the property a training-data
    card needs. Rates are converted to integer thresholds here (driver
    side, exact) so both Spark and the SQL oracle compare integers;
    a rate of 0 excludes the stratum entirely. Map-only filter +
    projection: no shuffle, scales linearly with executors.
    """
    thresholds = {s: int(round(r * SAMPLE_DENOM)) for s, r in rates.items()}
    thr_map = F.create_map(
        *[F.lit(x) for kv in thresholds.items() for x in kv])
    thr = F.coalesce(thr_map[F.col(stratum_col)],
                     F.lit(int(round(default_rate * SAMPLE_DENOM))))
    bucket = rolling_hash(
        F.concat(F.lit(salt + ':'), F.col(stratum_col), F.lit(':'),
                 norm_text(text_col))) % SAMPLE_DENOM
    return (docs
            .select(F.col(id_col), F.col(stratum_col).alias('stratum'),
                    bucket.cast('int').alias('sample_bucket'), thr.alias('_thr'))
            .where(F.col('sample_bucket') < F.col('_thr'))
            .drop('_thr'))


def contamination_pairs(train: DataFrame, test: DataFrame,
                        id_col='doc_id', text_col='text', n: int = 3,
                        min_common: int = 1) -> DataFrame:
    """Cross-split n-gram leakage: (test_doc, train_doc) pairs sharing
    word shingles, with the contaminated fraction of the test document.

    The train/test contamination check every LLM data pipeline runs
    before evaluation (n-gram overlap methodology per the GPT-3 /
    PaLM / Gopher data cards; they use 8-13-gram windows at web scale —
    ``n`` is the knob). Scale shape: shingle equi-join — the test side
    is orders of magnitude smaller and pre-aggregated per shingle;
    ``min_common`` prunes incidental single-shingle collisions before
    the pair rollup.

    Output: (test_doc, train_doc, n_common_shingles, contamination)
    where contamination = shared/test-doc-total shingles.
    """
    sh_tr = doc_shingle_table(train, id_col, text_col, n).select(
        F.col(id_col).alias('train_doc'), 'shingle')
    sh_te = doc_shingle_table(test, id_col, text_col, n).select(
        F.col(id_col).alias('test_doc'), 'shingle')
    te_sizes = sh_te.groupBy('test_doc').agg(
        F.count('*').alias('n_test_shingles'))
    pairs = (sh_te.join(sh_tr, 'shingle')
             .groupBy('test_doc', 'train_doc')
             .agg(F.count('*').alias('n_common_shingles'))
             .where(F.col('n_common_shingles') >= min_common))
    return (pairs.join(te_sizes, 'test_doc')
            .select('test_doc', 'train_doc', 'n_common_shingles',
                    F.round(F.col('n_common_shingles')
                            / F.col('n_test_shingles'), 6)
                     .alias('contamination')))


# deliberately narrow, engine-portable patterns (Java regex == RE2 ==
# POSIX here): the operator's value is the scrub plumbing; production
# deployments swap in their PII pattern pack
PII_EMAIL_RE = '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}'
PII_PHONE_RE = '[0-9]{3}-[0-9]{3}-[0-9]{4}'


def pii_scrub(docs: DataFrame, id_col='doc_id',
              text_col='text') -> DataFrame:
    """Redact emails / phone-shaped numbers, keeping match counts.

    Pure JVM-side ``regexp_replace``/``regexp_count`` projection — no
    shuffle, no UDF; scales as a map-only stage and pushes column
    pruning to the scan. Counts feed the pipeline's observability
    (how much PII a source emits is itself a quality signal).
    """
    norm = norm_text(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(norm, PII_EMAIL_RE, '<EMAIL>'),
        PII_PHONE_RE, '<PHONE>')
    return docs.select(
        F.col(id_col),
        F.regexp_count(norm, F.lit(PII_EMAIL_RE)).cast('int')
         .alias('n_emails'),
        F.regexp_count(norm, F.lit(PII_PHONE_RE)).cast('int')
         .alias('n_phones'),
        scrubbed.alias('scrubbed_text'),
    )


def domain_mix_weights(docs: DataFrame, targets: dict,
                       domain_col: str = 'source',
                       text_col: str = 'text') -> DataFrame:
    """Per-domain sampling weights to hit a target token mix.

    The domain-reweighting step of a pretraining data pipeline (the
    Pile / Gopher / LLaMA data cards all publish exactly this table):
    given target token shares per domain, weight = target_share /
    current_share, so sampling each domain's documents with its weight
    yields the target mixture. Domains absent from ``targets`` get
    weight 0 (excluded from the mix).

    Scale shape: ONE map-side-combined groupBy on the domain key — the
    corpus is scanned and tokenized once. The grand total is a window
    sum over the aggregated frame (domains-sized, so its
    single-partition exchange moves a handful of rows); deriving it
    with a second agg + cross join would re-execute the whole
    scan→tokenize subtree, since column pruning makes the two partial
    aggregates differ and defeats ReuseExchange (the tf/df trap).
    """
    tgt = F.create_map(*[
        F.lit(x) for kv in targets.items() for x in kv])
    per = docs.groupBy(domain_col).agg(
        F.count('*').alias('n_docs'),
        F.sum(F.size(tokens(text_col))).alias('n_tokens'))
    w_all = Window.partitionBy()
    total = F.sum('n_tokens').over(w_all).cast('double')
    share = F.col('n_tokens') / total
    return per.select(
        domain_col, 'n_docs', 'n_tokens',
        F.round(share, 6).alias('token_share'),
        F.round(
            F.coalesce(tgt[F.col(domain_col)], F.lit(0.0)) / share,
            6).alias('mix_weight'))


def chunk_documents(docs: DataFrame, window: int = 64, stride: int = 48,
                    id_col='doc_id', text_col='text') -> DataFrame:
    """Sliding-window token chunks with overlap (pretraining/RAG prep).

    Chunk k covers tokens [k*stride, k*stride + window); the last
    window clamps at the end of the document, and every document emits
    at least one chunk. Pure Catalyst — a per-row sequence of slices
    exploded to rows, no UDF, no shuffle (the array is bound once as a
    lambda variable; no lambda-CSE recompute).

    Output: (id, chunk_idx, n_tokens, chunk_text).
    """
    if not 0 < stride <= window:
        raise ValueError(
            f'need 0 < stride <= window (got {stride}, {window})')
    toks = tokens(text_col)

    def chunks(t):
        n = F.size(t)
        n_chunks = (F.lit(1) + F.ceil(
            F.greatest(n - window, F.lit(0)) / F.lit(stride))
        ).cast('int')
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda k: F.struct(
                k.cast('int').alias('chunk_idx'),
                F.slice(t, (k * stride + 1).cast('int'), window)
                 .alias('_toks')))

    exploded = docs.select(
        F.col(id_col),
        F.explode(bind_once(toks, chunks)).alias('c'))
    return exploded.select(
        id_col,
        F.col('c.chunk_idx').alias('chunk_idx'),
        F.size('c._toks').cast('int').alias('n_tokens'),
        F.array_join('c._toks', ' ').alias('chunk_text'))


LM_QUANT = 1_000_000  # log-prob quantization grid (1e-6 nats)


def lm_score(docs: DataFrame, id_col='doc_id', text_col='text',
             vocab_size: int = 50000) -> DataFrame:
    """Corpus char-trigram LM quality score (CCNet/KenLM-style filter).

    The classic model-based quality signal: score each document by the
    mean log-probability of its character trigrams under a unigram-
    over-trigrams model trained on the corpus itself — fluent text
    reuses common trigrams, garbage/binary/boilerplate does not.

    Scale shape: one explode+groupBy builds the trigram counts; the
    vocabulary is capped at the top ``vocab_size`` trigrams (ties by
    trigram), so the model table is bounded and broadcastable at any
    corpus size — AQE picks the broadcast join of doc-trigrams against
    it. Out-of-vocabulary trigrams get the floor log-prob
    ln(0.5/total).

    Engine portability: log-probs are quantized to a 1e-6 grid and
    summed as LONGs — exact, order-independent sums — so the DuckDB
    oracle matches bit-for-bit with no float summation-order hazard
    (same trick as the k-means integer grid); only the final division
    is floating point.

    Output: (id, n_trigrams, lm_score) with lm_score = mean quantized
    log-prob in nats, rounded to 6dp. A document with no trigrams at
    all (shorter than 3 chars after normalization) has no evidence to
    score, so ``lm_score`` is NULL — not the OOV floor; a quality
    filter should treat contentless docs as unscored, not as
    worst-possible. The corpus-wide degenerate case (no doc has any
    trigram → no model) also yields NULL via the NULL ``total``.
    """
    # explode trigram START POSITIONS, then slice with a row-level
    # substr: the per-position substring runs in whole-stage codegen
    # instead of an interpreted higher-order lambda (same rows — the
    # NULL-position row keeps the short-doc NULL-trigram semantics)
    base = docs.select(F.col(id_col), norm_text(text_col).alias('_t'))
    positions = F.when(
        F.length('_t') >= 3,
        F.sequence(F.lit(1), F.length('_t') - 2)
    ).otherwise(F.array(F.lit(None).cast('int')))
    # the explicit repartition makes the counts pass and the scoring
    # pass sit above ONE identical exchange subtree, which Spark
    # reuses — the trigram explode runs once instead of twice
    # (measured 19% off lm_score; rows identical). The key is
    # (tri, salt-from-id): tri alone would hot-spot ultra-frequent
    # trigrams at scale (aggregations get no AQE skew split), so the
    # deterministic salt bounds any one trigram's share per partition;
    # the counts aggregation re-merges through a vocabulary-sized
    # second exchange
    tris = (base
            .select(F.col(id_col), '_t', F.explode(positions).alias('_i'))
            .select(F.col(id_col),
                    F.col('_t').substr(F.col('_i'), F.lit(3)).alias('tri'))
            .repartition(F.col('tri'),
                         F.pmod(F.xxhash64(id_col), F.lit(64))))
    counts = tris.where(F.col('tri').isNotNull()) \
        .groupBy('tri').agg(F.count('*').alias('c'))
    total = counts.agg(F.sum('c').cast('double').alias('total'))
    vocab = (counts.crossJoin(F.broadcast(total))
             .orderBy(F.col('c').desc(), 'tri').limit(vocab_size)
             .select(
                 'tri',
                 F.round(F.log(F.col('c') / F.col('total')) * LM_QUANT, 0)
                  .cast('long').alias('logp_q')))
    floor_q = F.round(F.log(0.5 / F.col('total')) * LM_QUANT, 0) \
        .cast('long')
    scored = (tris
              .join(F.broadcast(vocab), 'tri', 'left')
              .crossJoin(F.broadcast(total))
              .select(
                  id_col,
                  F.col('tri'),
                  F.coalesce(F.col('logp_q'), floor_q).alias('lp')))
    return (scored.groupBy(id_col)
            .agg(F.count(F.col('tri')).cast('int').alias('n_trigrams'),
                 F.sum('lp').alias('_s'), F.count('*').alias('_n'))
            .select(
                id_col, 'n_trigrams',
                F.when(F.col('n_trigrams') > 0,
                       F.round(F.col('_s') / F.col('_n') / LM_QUANT, 6))
                 .alias('lm_score')))


def doc_fingerprint(docs: DataFrame, id_col='doc_id', text_col='text',
                    n: int = 3, k: int = 4) -> DataFrame:
    """Bottom-k sketch fingerprint over shingle hashes (string-joined).

    ``shingle_hashes`` already returns a distinct array. The three
    output columns derive from it through one ``inline`` over a bound
    lambda variable, so the shingle pipeline is evaluated once per row
    (three plain column references would each inline a full recompute —
    Catalyst has no CSE for lambda expressions).
    """
    hashes = shingle_hashes(tokens(text_col), n)
    return docs.select(
        F.col(id_col),
        F.inline(F.transform(F.array(hashes), lambda h: F.struct(
            F.array_join(
                F.transform(F.slice(F.array_sort(h), 1, k),
                            lambda x: x.cast('string')), '-')
             .alias('fingerprint'),
            F.array_min(h).alias('fp_min'),
            F.size(h).alias('n_shingles'),
        ))),
    )

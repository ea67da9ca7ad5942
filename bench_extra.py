"""Round-7 side benchmarks (run EXCLUSIVELY; bench.py stays frozen).

Times a subset of the declared gate queries (from
``__spark_entry__.queries()``) at $SPARK_GRAFT_SF_DIR into noop sinks
(full materialization, no driver collect) and prints ONE JSON line.
These cover the operator families the headline bench does not; the
numbers back OPTIMIZATION_r07.md's operator checklist.

Usage: python bench_extra.py [reps] [gate ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ocrodjvu_spark.session import get_spark  # noqa: E402

# one representative per operator family not in the headline bench
DEFAULT_GATES = [
    'language_id', 'quality_buckets', 'gopher_quality',
    'quality_repetition', 'c4_quality', 'token_stats', 'pii_scrub',
    'script_profile', 'domain_mix', 'doc_chunks', 'conversation_packing',
    'length_quantiles', 'sampled_quantiles',
    'dedup_lines', 'dedup_ngram_jaccard', 'dedup_simhash_pairs',
    'dedup_clusters', 'dedup_substring_spans', 'winnowing_fingerprints',
    'split_contamination', 'corpus_split',
    'ann_ivf_topk', 'ann_recall', 'dedup_semantic', 'semantic_clusters',
    'embedding_kmeans', 'embedding_neardup_pairs', 'embedding_quantize',
    'events_sessionization', 'events_asof_join', 'events_range_join',
    'events_window_agg', 'events_rollup_cube', 'events_retention',
    'sketch_tables', 'cms_counts', 'bpe_tokenize',
    'tool_call_stats', 'role_sequence', 'turns_per_conv',
    'extraction_metrics', 'extract_sexpr',
]


def main():
    argv = sys.argv[1:]
    reps = int(argv[0]) if argv and argv[0].isdigit() else 3
    gates = argv[1:] if argv and argv[0].isdigit() else argv
    gates = gates or DEFAULT_GATES
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    cpus = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
    spark = get_spark('bench_extra', cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel('ERROR')

    import __spark_entry__ as entrymod
    qs = entrymod.queries()

    built = {}
    timings = {}
    for name in gates:
        fn = qs.get(name)
        if fn is None:
            timings[name] = 'SKIP unknown gate'
            continue
        try:
            built[name] = fn(spark, sf_dir)
        except Exception as exc:
            timings[name] = f'SKIP {type(exc).__name__}'

    # interleaved passes, per-gate min (same methodology as bench.py)
    for name, df in built.items():
        spark.sparkContext.setJobDescription(f'bench_extra:{name} warm')
        try:
            df.write.format('noop').mode('overwrite').save()
        except Exception as exc:
            timings[name] = f'FAIL {type(exc).__name__}'
            built[name] = None
    for _ in range(reps):
        for name, df in built.items():
            if df is None:
                continue
            spark.sparkContext.setJobDescription(f'bench_extra:{name}')
            t0 = time.perf_counter()
            df.write.format('noop').mode('overwrite').save()
            el = time.perf_counter() - t0
            prev = timings.get(name)
            timings[name] = round(min(prev, el), 3) \
                if isinstance(prev, float) else round(el, 3)

    print(json.dumps({
        'metric': 'side_operators_sec',
        'sf_dir': sf_dir,
        'cpus': cpus,
        'reps': reps,
        'queries': timings,
    }))


if __name__ == '__main__':
    main()

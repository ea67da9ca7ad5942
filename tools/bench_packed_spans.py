"""Packed-vs-struct span emission experiment (run EXCLUSIVELY).

Measures the extract_word_spans pipeline with ``emit_spans='words'``
(array-of-structs Arrow payload) vs ``emit_spans='packed'`` (one
delimited string per page, JVM-side decode) at one parallelism level.

Usage: python tools/bench_packed_spans.py [cpus] [reps]
Prints one JSON line: {"cpus": N, "words_sec": ..., "packed_sec": ...}.
Run once per cpus level (fresh JVM each) and compare 8 vs 32 to see the
Arrow-volume memory-bandwidth wall move.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402,F401

from ocrodjvu_spark import pipeline  # noqa: E402
from ocrodjvu_spark.session import get_spark  # noqa: E402

from bench import materialize_transcripts, run_noop  # noqa: E402


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    cache_dir = os.environ.get(
        'SPARK_GRAFT_BENCH_CACHE', '/tmp/spark_graft_bench')
    os.makedirs(cache_dir, exist_ok=True)

    spark = get_spark(
        'bench-packed', cpus=cpus, shuffle_partitions=cpus,
        extra_conf={
            'spark.sql.files.maxPartitionBytes': str(1 << 20),
            'spark.sql.files.openCostInBytes': str(64 << 10),
        })
    spark.sparkContext.setLogLevel('ERROR')
    replicate = int(os.environ.get('SPARK_GRAFT_BENCH_REPLICATE', '8'))
    tpath = materialize_transcripts(spark, sf_dir, cache_dir,
                                    replicate=replicate)
    transcripts = spark.read.parquet(tpath)
    n_turns = transcripts.count()

    variants = {
        'words': pipeline.word_spans(
            pipeline.extract_turns(transcripts, emit_spans='words',
                                   emit_sexpr=False)),
        'packed': pipeline.word_spans(
            pipeline.extract_turns(transcripts, emit_spans='packed',
                                   emit_sexpr=False)),
    }
    for df in variants.values():   # untimed: worker pool + codegen warm
        run_noop(df)

    timings: dict = {}
    for _ in range(max(reps, 1)):
        for name, df in variants.items():
            t = run_noop(df)
            timings[name] = min(timings.get(name, t), t)

    print(json.dumps({
        'cpus': cpus, 'n_turns': n_turns, 'reps': reps,
        'words_sec': round(timings['words'], 3),
        'packed_sec': round(timings['packed'], 3),
        'speedup_pct': round(
            100 * (1 - timings['packed'] / timings['words']), 1),
    }))
    # timestamp only in the human-readable trailer, not the record
    sys.stderr.write(time.strftime('done %H:%M:%S\n'))


if __name__ == '__main__':
    main()

"""Dump .explain('formatted') for the headline bench queries to
plans/r07/<name>_<tag>.txt (tag = before/after, argv[1])."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ocrodjvu_spark import pipeline  # noqa: E402
from ocrodjvu_spark.session import get_spark  # noqa: E402
from ocrodjvu_spark.sources import transcripts as T  # noqa: E402


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else 'before'
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'plans', 'r07')
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    cache = os.environ.get('SPARK_GRAFT_BENCH_CACHE', '/tmp/spark_graft_bench')
    spark = get_spark('dump_plans_r07', cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel('ERROR')

    tpath = os.path.join(cache, 'transcripts_sf0.1_x8')
    transcripts = spark.read.parquet(tpath)
    from ocrodjvu_spark.functions import similarity, textops
    docs = T.load_table(spark, sf_dir, 'documents')
    norm = F.regexp_replace(F.trim('text'), r'\s+', ' ')
    emb = T.load_table(spark, sf_dir, 'embeddings')

    queries = {
        'extract_text':
            pipeline.extract_turns(transcripts, emit_spans=False)
            .select('conv_id', 'turn_idx', 'dialect', 'error',
                    'extracted_text', 'extracted_sexpr'),
        'extract_word_spans':
            pipeline.word_spans(
                pipeline.extract_turns(transcripts, emit_spans='words',
                                       emit_sexpr=False)),
        'conversation_reassembly':
            pipeline.reassemble_conversations(
                pipeline.extract_turns(transcripts, emit_spans=False,
                                       emit_sexpr=False)),
        'extract_text_uax29':
            pipeline.extract_turns(transcripts, uax29=True, emit_spans=False,
                                   emit_sexpr=False)
            .select('conv_id', 'turn_idx', 'extracted_text'),
        'dedup_exact':
            docs.groupBy(F.md5(norm).alias('text_hash')).agg(
                F.min('doc_id').alias('rep_doc_id'),
                F.count('*').alias('n_dupes')),
        'dedup_minhash_lsh':
            textops.minhash_dedup_pairs(docs.select('doc_id', 'text'),
                                        threshold=0.5),
        'ann_cosine_topk':
            similarity.cosine_topk(emb, n_queries=10, k=5),
    }
    for name, df in queries.items():
        path = os.path.join(out_dir, f'{name}_{tag}.txt')
        with open(path, 'w') as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), 'formatted'))
        print(f'wrote {path}')


if __name__ == '__main__':
    main()

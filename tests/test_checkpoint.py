"""Resumable extraction: sidecar lineage, idempotent bucket overwrite."""

import pytest
from pyspark.sql import functions as F

from ocrodjvu_spark.plans import checkpoint
from ocrodjvu_spark.sources import transcripts as T

SF_DIR = '/root/testdata/sf0.001'
N_BUCKETS = 8


@pytest.fixture()
def paths(tmp_path):
    return str(tmp_path / 'out'), str(tmp_path / 'sidecar')


def test_resume_after_partial_run(spark, paths):
    out, side = paths
    df = T.synthesize_transcripts(spark, SF_DIR)
    total = df.count()

    # first run: only 3 buckets (simulates a crash partway)
    first = checkpoint.run_extraction(
        spark, df, out, side, n_buckets=N_BUCKETS, max_buckets=3)
    assert len(first) == 3
    assert checkpoint.completed_buckets(spark, side) == sorted(first)

    # resume: processes exactly the remaining buckets
    second = checkpoint.run_extraction(
        spark, df, out, side, n_buckets=N_BUCKETS)
    assert sorted(first + second) == list(range(N_BUCKETS))

    # third run: nothing pending -> no-op
    assert checkpoint.run_extraction(
        spark, df, out, side, n_buckets=N_BUCKETS) == []

    # output is complete and keyed correctly
    result = spark.read.parquet(out)
    assert result.count() == total
    assert result.select('conv_id', 'turn_idx').distinct().count() == total

    # sidecar metrics add up
    metrics = spark.read.parquet(side)
    agg = metrics.agg(F.sum('n_turns'), F.sum('n_errors')).first()
    assert agg[0] == total
    assert agg[1] == 0


def test_rerun_bucket_is_idempotent(spark, paths):
    out, side = paths
    df = T.synthesize_transcripts(spark, SF_DIR)
    checkpoint.run_extraction(spark, df, out, side, n_buckets=4)
    before = spark.read.parquet(out).count()

    # wipe the sidecar -> everything looks pending -> full reprocess;
    # dynamic partition overwrite must not duplicate rows
    import shutil
    shutil.rmtree(side)
    checkpoint.run_extraction(spark, df, out, side, n_buckets=4)
    after = spark.read.parquet(out).count()
    assert before == after


def test_concurrent_dynamic_overwrites_last_writer_wins(spark, tmp_path):
    # Iceberg-shaped commit contract of the parquet stand-in: two
    # writers whose bucket sets overlap both commit dynamic-partition
    # overwrites to the same table. Per overlapping bucket the LAST
    # writer's files fully replace the partition — never a row-level
    # mix — and non-overlapping buckets are untouched.
    out = str(tmp_path / 'out')
    df = checkpoint.with_bucket(
        T.synthesize_transcripts(spark, SF_DIR), 8).cache()

    def write(writer, buckets):
        (df.where(F.col(checkpoint.BUCKET_COL).isin(buckets))
         .withColumn('writer', F.lit(writer))
         .write.partitionBy(checkpoint.BUCKET_COL)
         .option('partitionOverwriteMode', 'dynamic')
         .mode('overwrite').parquet(out))

    present = sorted(r[0] for r in
                     df.select(checkpoint.BUCKET_COL).distinct().collect())
    assert len(present) >= 4  # need a real overlap to test anything
    a_buckets = present[:4]
    b_buckets = present[2:6]          # overlaps A on present[2:4]
    write('A', a_buckets)
    write('B', b_buckets)

    res = spark.read.parquet(out)
    per = {r[checkpoint.BUCKET_COL]: set(r['ws'])
           for r in res.groupBy(checkpoint.BUCKET_COL)
                       .agg(F.collect_set('writer').alias('ws'))
                       .collect()}
    assert per.keys() == set(a_buckets) | set(b_buckets)
    assert all(len(ws) == 1 for ws in per.values())  # no partial mixes
    assert all(per[b] == {'A'} for b in a_buckets[:2])
    assert all(per[b] == {'B'} for b in b_buckets)
    # per-bucket row counts match the source exactly (no dup/loss)
    src = {r[0]: r[1] for r in
           df.where(F.col(checkpoint.BUCKET_COL).isin(
               a_buckets + b_buckets))
             .groupBy(checkpoint.BUCKET_COL).count().collect()}
    got = {r[0]: r[1] for r in
           res.groupBy(checkpoint.BUCKET_COL).count().collect()}
    assert got == src
    df.unpersist()


def test_reader_across_overwrite_never_mixes(spark, tmp_path):
    # snapshot-isolation face of the Iceberg-shaped commit contract
    # (checkpoint module docstring): a reader that starts AFTER a
    # commit sees the overwritten bucket atomically (all-new rows,
    # other buckets untouched); a reader whose file listing SPANS the
    # commit either yields the old snapshot or fails loudly once the
    # old files are swapped out — never a row-level old/new mix.
    out = str(tmp_path / 'out')
    df = checkpoint.with_bucket(
        T.synthesize_transcripts(spark, SF_DIR), 4)

    def write(ver, buckets=None):
        d = df.withColumn('ver', F.lit(ver))
        if buckets is not None:
            d = d.where(F.col(checkpoint.BUCKET_COL).isin(buckets))
        (d.write.partitionBy(checkpoint.BUCKET_COL)
         .option('partitionOverwriteMode', 'dynamic')
         .mode('overwrite').parquet(out))

    write('v1')
    stale = spark.read.parquet(out)        # listing pinned pre-commit
    assert stale.where(F.col('ver') != 'v1').count() == 0
    target = stale.select(checkpoint.BUCKET_COL).distinct().head()[0]
    write('v2', [target])

    # the stale reader spans the commit: old snapshot or a loud
    # failure — assert it cannot produce a v1/v2 mix in the bucket
    try:
        vers = {r.ver for r in
                stale.where(F.col(checkpoint.BUCKET_COL) == target)
                     .select('ver').distinct().collect()}
        assert vers in ({'v1'}, {'v2'}, set())
    except Exception as e:  # documented limitation vs real Iceberg
        assert 'FileNotFoundException' in str(e)

    # a fresh reader sees the commit atomically per bucket
    fresh = spark.read.parquet(out)
    per = {r[checkpoint.BUCKET_COL]: set(r.ws) for r in
           fresh.groupBy(checkpoint.BUCKET_COL)
                .agg(F.collect_set('ver').alias('ws')).collect()}
    assert per[target] == {'v2'}
    assert all(v == {'v1'} for b, v in per.items() if b != target)
    # row counts per bucket unchanged (full replace, no dup/loss)
    src = {r[0]: r[1] for r in
           df.groupBy(checkpoint.BUCKET_COL).count().collect()}
    got = {r[0]: r[1] for r in
           fresh.groupBy(checkpoint.BUCKET_COL).count().collect()}
    assert got == src


def test_racing_resume_runs_stay_idempotent(spark, tmp_path):
    # worst-case race: a second worker starts from a stale snapshot in
    # which NO lineage exists (its own empty sidecar), so it reprocesses
    # every bucket into the same output table the first worker already
    # filled. Dynamic overwrite keeps the table exactly-once.
    out = str(tmp_path / 'out')
    side_a = str(tmp_path / 'sideA')
    side_b = str(tmp_path / 'sideB')
    df = T.synthesize_transcripts(spark, SF_DIR)
    total = df.count()
    checkpoint.run_extraction(spark, df, out, side_a, n_buckets=4)
    checkpoint.run_extraction(spark, df, out, side_b, n_buckets=4)
    res = spark.read.parquet(out)
    assert res.count() == total
    assert res.select('conv_id', 'turn_idx').distinct().count() == total


def test_raw_payload_sidecar(spark, tmp_path):
    # S9: raw per-turn payload persisted with template-expanded names,
    # expansion compiled to a Catalyst expression (no per-row Python)
    from ocrodjvu_spark.plans.checkpoint import save_raw_payloads
    df = spark.createDataFrame(
        [('conv-1', 1, 'raw one'), ('conv-1', 2, 'raw two'),
         ('conv-2', 1, 'raw three')],
        'conv_id string, turn_idx int, text string')
    out = str(tmp_path / 'raw')
    save_raw_payloads(df, out, template='{id}/p{page+1}')
    rows = {(r.conv_id, r.turn_idx): (r.raw_name, r.payload)
            for r in spark.read.parquet(out).collect()}
    assert rows[('conv-1', 1)] == ('conv-1/p2', 'raw one')
    assert rows[('conv-1', 2)] == ('conv-1/p3', 'raw two')
    assert rows[('conv-2', 1)] == ('conv-2/p2', 'raw three')


def test_template_path_expr_matches_kernel(spark):
    # the Catalyst compilation and the pure-Python grammar agree
    from pyspark.sql import functions as F
    from ocrodjvu_spark.kernel.utils import expand_template
    from ocrodjvu_spark.plans.checkpoint import template_path_expr
    df = spark.createDataFrame(
        [('docA', 4), ('docB', 9)], 'conv_id string, turn_idx int')
    tpl = 'x/{id}_{page-1}_{page+3}'
    got = {r.conv_id: r.name for r in df.select(
        'conv_id', template_path_expr(tpl).alias('name')).collect()}
    for cid, tix in [('docA', 4), ('docB', 9)]:
        assert got[cid] == expand_template(tpl, tix, cid)


def test_raw_sidecar_bucketed_resume(spark, tmp_path):
    # the raw payload sidecar written through run_extraction only touches
    # pending buckets: a resume neither rescans nor clobbers completed
    # buckets' raw files
    out = str(tmp_path / 'out')
    side = str(tmp_path / 'side')
    raw = str(tmp_path / 'raw')
    df = T.synthesize_transcripts(spark, SF_DIR)
    total = df.count()

    first = checkpoint.run_extraction(
        spark, df, out, side, n_buckets=N_BUCKETS, max_buckets=3,
        raw_output_path=raw)
    raw1 = spark.read.parquet(raw)
    assert sorted(r.bucket for r in
                  raw1.select('bucket').distinct().collect()) == \
        sorted(first)
    n_first = raw1.count()

    checkpoint.run_extraction(
        spark, df, out, side, n_buckets=N_BUCKETS, raw_output_path=raw)
    raw2 = spark.read.parquet(raw)
    assert raw2.count() == total
    # completed buckets' rows unchanged (not rewritten to something else)
    assert raw2.where(F.col('bucket').isin(first)).count() == n_first
    sample = raw2.select('conv_id', 'turn_idx', 'raw_name').first()
    assert sample.raw_name == \
        f'{sample.conv_id}/p{sample.turn_idx + 1}'


def test_run_extraction_with_packed_spans_metrics(spark, tmp_path):
    # regression (review finding): the sidecar metrics aggregation
    # hardcoded F.col('spans') and crashed AFTER the data write when
    # emit_spans='packed' flowed through extract_kwargs — n_spans must
    # come from either emission shape
    out = str(tmp_path / 'out')
    side = str(tmp_path / 'side')
    tr = T.synthesize_transcripts(spark, '/root/testdata/sf0.001')
    done = checkpoint.run_extraction(
        spark, tr, out, side, n_buckets=4,
        emit_spans='packed', emit_sexpr=False)
    assert len(done) == 4
    side_df = spark.read.parquet(side)
    total_spans = side_df.agg(F.sum('n_spans')).first()[0]
    # the synthetic corpus has one span per word; must be non-zero and
    # equal the decoded span count
    from ocrodjvu_spark import pipeline
    decoded = pipeline.word_spans(spark.read.parquet(out)).count()
    assert total_spans == decoded > 0

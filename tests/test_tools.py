"""Smoke protection for the driver-facing tools.

A broken import or signature in bench.py / run_pipeline.py would zero a
round's benchmark record, so pin them here (no timed work).
"""

import importlib
import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_imports_and_helpers(tmp_path, spark):
    sys.path.insert(0, REPO_ROOT)
    bench = importlib.import_module('bench')
    path = bench.materialize_transcripts(
        spark, '/root/testdata/sf0.001', str(tmp_path))
    assert spark.read.parquet(path).count() > 0
    rep = bench.replicate_transcripts(spark, path, 2)
    assert spark.read.parquet(rep).count() == 2 * spark.read.parquet(
        path).count()


def test_run_pipeline_arg_parsing():
    sys.path.insert(0, os.path.join(REPO_ROOT, 'tools'))
    rp = importlib.import_module('run_pipeline')
    with pytest.raises(SystemExit):
        rp.main(['--help'])
    with pytest.raises(SystemExit):
        rp.main([])  # missing required args


def test_bench_scaling_imports():
    sys.path.insert(0, os.path.join(REPO_ROOT, 'tools'))
    importlib.import_module('bench_scaling')


def test_check_correctness_helpers():
    sys.path.insert(0, os.path.join(REPO_ROOT, 'tools'))
    cc = importlib.import_module('check_correctness')
    assert cc.normalize_cell(float('nan')) == 'nan'
    assert cc.normalize_cell(0.1234567891) == '0.123456789'
    assert cc.normalize_cell('x') == 'x'


def test_run_pipeline_jsonl_input_end_to_end(spark, tmp_path):
    # JSONL ingestion through the production path: corrupt lines are
    # counted and dropped, clean rows extract identically to parquet
    import json as _json
    import subprocess
    from ocrodjvu_spark.sources import transcripts as T, jsonl as J
    inp = str(tmp_path / 'in')
    tr = T.synthesize_transcripts(spark, '/root/testdata/sf0.001')
    n = tr.count()
    J.write_jsonl(tr, inp, shards=2)
    with open(os.path.join(inp, 'zz-corrupt.json'), 'w') as fh:
        fh.write('{"conv_id": broken\n')
    env = dict(os.environ, PYTHONPATH=REPO_ROOT)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, 'tools',
                                      'run_pipeline.py'),
         '--input', inp, '--input-format', 'jsonl',
         '--output', str(tmp_path / 'out'),
         '--sidecar', str(tmp_path / 'side'),
         '--buckets', '4', '--table-format', 'snapshot'],
        capture_output=True, text=True, env=env, cwd=REPO_ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = _json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith('{')][-1])
    assert summary['corrupt_input_lines'] == 1
    assert summary['total_turns'] == n


def test_run_pipeline_snapshot_input_end_to_end(spark, tmp_path):
    # snapshot-table INPUT through the production path: the 10^12-turn
    # source is itself an Iceberg-style table — extraction reads a
    # pinned published ref with merge-on-read deletes applied
    import json as _json
    import subprocess
    from pyspark.sql import functions as F
    from ocrodjvu_spark.plans.snapstore import SnapshotTable
    from ocrodjvu_spark.sources import transcripts as T
    tr = T.synthesize_transcripts(spark, '/root/testdata/sf0.001')
    src = SnapshotTable(str(tmp_path / 'src'))
    src.append(tr)
    # a takedown lands as a merge-on-read delete; publish the result
    src.delete_positions(spark, (F.col('conv_id') == 'conv-0')
                         & (F.col('turn_idx') == 1))
    src.set_ref('published', src.current_version())
    src.append(tr.limit(5))  # unaudited commit AFTER the publish
    want = tr.count() - 1
    env = dict(os.environ, PYTHONPATH=REPO_ROOT)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, 'tools',
                                      'run_pipeline.py'),
         '--input', str(tmp_path / 'src'),
         '--input-format', 'snapshot', '--input-ref', 'published',
         '--output', str(tmp_path / 'out'),
         '--sidecar', str(tmp_path / 'side'),
         '--buckets', '4'],
        capture_output=True, text=True, env=env, cwd=REPO_ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = _json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith('{')][-1])
    assert summary['total_turns'] == want

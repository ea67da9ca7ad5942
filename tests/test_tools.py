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

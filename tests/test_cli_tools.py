"""CLI parity: tools/hocr2djvused.py and tools/djvused2hocr.py against
the reference corpus — the same invocations a reference user runs."""

import io
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

import djvused2hocr  # noqa: E402
import hocr2djvused  # noqa: E402

from ocrodjvu_spark.kernel import sexpr
from tests.corpus import HOCR2DJVUSED_DIR, golden_cases

# a representative golden per dialect family, each driven by ITS OWN
# header's CLI args (the same line the reference harness feeds its
# command); compared value-level like tests/test_kernel_golden.py.
# The full 68-case sweep already runs at kernel level; these pin the
# CLI wiring: arg mapping, block format, multi-page numbering.
_CLI_CASES = [
    'alice_tesseract3.00.test1',
    'alice_cuneiform0.8.test2',
    'alice_tesseract3.00.test3',   # uax29 variant
    'alice_tesseract3.00+charboxes.test4',  # makebox sidecar path
    'multipage_ocropus0.3.1.test1',         # multi-page numbering
]


def _load_case(test_name):
    path = os.path.join(HOCR2DJVUSED_DIR, test_name)
    lines = open(path, encoding='UTF-8').read().split('\n')
    header = lines[0]
    assert header.startswith('#')
    args = header[1:].split()
    html = os.path.join(
        HOCR2DJVUSED_DIR, test_name.rsplit('.', 1)[0] + '.html')
    return args, html, '\n'.join(lines[1:])


def _parse_blocks(script):
    pages, cur, in_sexpr = [], [], False
    for line in script.split('\n'):
        if line.startswith('set-txt'):
            in_sexpr, cur = True, []
        elif line == '.' and in_sexpr:
            pages.append(sexpr.parse('\n'.join(cur)))
            in_sexpr = False
        elif in_sexpr:
            cur.append(line)
    return pages


@pytest.mark.parametrize('test_name', _CLI_CASES, ids=_CLI_CASES)
def test_hocr2djvused_cli_matches_golden(test_name):
    args, html, golden = _load_case(test_name)
    out = io.StringIO()
    rc = hocr2djvused.main(args + [html], out=out)
    assert rc == 0
    got = _parse_blocks(out.getvalue())
    want = _parse_blocks(golden)
    assert got and got == want


def test_hocr2djvused_multifile_numbers_pages_continuously():
    path = os.path.join(HOCR2DJVUSED_DIR, 'alice_tesseract3.00.html')
    out = io.StringIO()
    hocr2djvused.main(['--page-size=2488x3507', path, path], out=out)
    text = out.getvalue()
    assert 'select 1\n' in text and 'select 2\n' in text


def test_djvused2hocr_roundtrips_through_hocr2djvused(tmp_path):
    src = '/root/reference/tests/djvu2hocr/nesting.djvused'
    html = io.StringIO()
    djvused2hocr.main([src], out=html)
    html_path = tmp_path / 'roundtrip.html'
    html_path.write_text(html.getvalue())
    script = io.StringIO()
    hocr2djvused.main(['--page-size=100x100', str(html_path)],
                      out=script)
    got = _parse_blocks(script.getvalue())
    want = _parse_blocks(open(src, encoding='UTF-8').read())
    assert got == want


def test_golden_cases_importable():
    # keep the shared corpus loader import exercised from this module
    assert len(list(golden_cases())) == 68


def test_snapshot_admin_metadata_and_changelog(spark, tmp_path, capsys):
    from pyspark.sql import Row, functions as F
    from ocrodjvu_spark.plans.snapstore import SnapshotTable
    sys.path.insert(0, '/root/repo/tools')
    import snapshot_admin

    root = str(tmp_path / 't')
    t = SnapshotTable(root)
    t.append(spark.createDataFrame(
        [Row(doc_id=i, bucket=i % 2) for i in range(8)]),
        partition_col='bucket')
    t.delete_keys(spark, spark.createDataFrame([Row(doc_id=5)]),
                  ['doc_id'])

    assert snapshot_admin.main([root, 'log']) == 0
    out = capsys.readouterr().out
    assert 'append' in out and 'delete-keys' in out

    assert snapshot_admin.main([root, 'manifests']) == 0
    out = capsys.readouterr().out
    assert 'manifest files' in out and 'partition=' in out
    assert '[pending delete]' in out and "keys=['doc_id']" in out

    assert snapshot_admin.main([root, 'changelog', '--from', '0']) == 0
    out = capsys.readouterr().out
    assert 'inserts: 8' in out and 'deletes: 1' in out

    # a rewrite in the window surfaces as an error, not a stack trace?
    # (the CLI propagates the ValueError — callers see the message)
    t.delete_positions(spark, F.col('doc_id') == 6)
    assert snapshot_admin.main([root, 'changelog', '--from', '2']) == 0
    out = capsys.readouterr().out
    assert 'deletes: 1' in out

    # not-a-table guard
    assert snapshot_admin.main([str(tmp_path), 'log']) == 1

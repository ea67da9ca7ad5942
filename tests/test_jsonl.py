"""JSONL source/sink: schema-ordered export, permissive read-back."""

import json
import os

from pyspark.sql import functions as F

from ocrodjvu_spark.sources import jsonl as J

DDL = 'doc_id bigint, lang string, text string'


def test_roundtrip_preserves_rows_and_key_order(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 'en', 'hello\nworld "quoted"'), (2, 'th', 'สวัสดี')],
        DDL)
    path = str(tmp_path / 'out')
    J.write_jsonl(df, path, shards=1)
    files = [f for f in os.listdir(path) if f.endswith('.json')]
    assert len(files) == 1
    lines = open(os.path.join(path, files[0]), encoding='utf-8') \
        .read().splitlines()
    assert len(lines) == 2
    # keys follow the schema order; embedded newline JSON-escaped
    assert list(json.loads(lines[0])) == ['doc_id', 'lang', 'text']
    back = J.read_jsonl(spark, path, DDL)
    got = {(r.doc_id, r.lang, r.text) for r in back.collect()}
    assert got == {(1, 'en', 'hello\nworld "quoted"'), (2, 'th', 'สวัสดี')}


def test_corrupt_lines_survive_as_error_channel(spark, tmp_path):
    path = str(tmp_path / 'mixed')
    os.makedirs(path)
    with open(os.path.join(path, 'a.json'), 'w', encoding='utf-8') as fh:
        fh.write('{"doc_id": 1, "lang": "en", "text": "ok"}\n')
        fh.write('{"doc_id": oops not json\n')
        fh.write('{"doc_id": 2, "lang": "de", "text": "auch ok"}\n')
    back = J.read_jsonl(spark, path, DDL).cache()
    good = back.where(F.col('_corrupt_record').isNull())
    bad = back.where(F.col('_corrupt_record').isNotNull())
    assert {r.doc_id for r in good.collect()} == {1, 2}
    assert bad.count() == 1
    assert 'oops' in bad.collect()[0]._corrupt_record

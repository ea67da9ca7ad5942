"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video are carried as ``binary`` columns next to a typed
metadata struct; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages so payload bytes never leave
the executor (only one Python hop per batch).

The actual codec work is STUBBED in this environment (no image/audio
libraries in the container): ``decode_media`` tries the real decoders
behind import guards and otherwise falls back to a clearly-marked
deterministic fake that still exercises the full Spark plumbing —
schema, partitioning, UDF signature, Arrow batch shape. Swap
``_fake_decode`` for a real decoder (PIL / torchaudio / pyav) in
production; nothing else changes.

Scale notes: payloads dominate row size, so batches are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` and stages repartition
by ``media_id`` (pure hash, no skew: one payload per row).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField('media_id', LongType()),
    StructField('kind', StringType()),          # image | audio | video
    StructField('payload', BinaryType()),
    StructField('width', IntegerType()),        # typed metadata
    StructField('height', IntegerType()),
    StructField('codec', StringType()),
])

FEATURE_SCHEMA = StructType([
    StructField('media_id', LongType()),
    StructField('kind', StringType()),
    StructField('n_bytes', IntegerType()),
    StructField('checksum', StringType()),
    StructField('mean_byte', IntegerType()),
    StructField('decoder', StringType()),
])

FRAME_SCHEMA = StructType([
    StructField('media_id', LongType()),
    StructField('frame_idx', IntegerType()),
    StructField('frame', BinaryType()),
])


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic opaque binary payloads derived from documents."""
    docs = spark.read.parquet(f'{sf_dir}/documents.parquet')
    kind = F.element_at(
        F.array(F.lit('image'), F.lit('audio'), F.lit('video')),
        (F.col('doc_id') % 3 + 1).cast('int'))
    return docs.select(
        F.col('doc_id').alias('media_id'),
        kind.alias('kind'),
        F.encode(F.repeat(F.col('text'), 4), 'UTF-8').alias('payload'),
        (F.col('doc_id') % 640 + 16).cast('int').alias('width'),
        (F.col('doc_id') % 480 + 16).cast('int').alias('height'),
        F.lit('raw').alias('codec'),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic STUB decoder (no media libs in this container)."""
    checksum = hashlib.md5(payload).hexdigest()
    mean = sum(payload[:4096]) // max(min(len(payload), 4096), 1)
    return {'checksum': checksum, 'mean_byte': int(mean),
            'decoder': 'stub'}


def _real_decode(payload: bytes, kind: str):
    """Try real decoders; raise NotImplementedError when libs are absent."""
    if kind == 'image':
        try:
            import PIL.Image  # noqa: F401
        except ImportError:
            raise NotImplementedError('image decode requires Pillow')
        raise NotImplementedError('real image decode not wired up yet')
    raise NotImplementedError(f'no decoder for kind={kind}')


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, kind, payload in zip(
                    pdf['media_id'], pdf['kind'], pdf['payload']):
                data = bytes(payload) if payload is not None else b''
                try:
                    feats = _real_decode(data, kind)
                except NotImplementedError:
                    feats = _fake_decode(data)
                rows.append({
                    'media_id': media_id,
                    'kind': kind,
                    'n_bytes': len(data),
                    **feats,
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return (media
            .repartition('media_id')
            .mapInPandas(batches, schema=FEATURE_SCHEMA))


def resize_images(media: DataFrame, max_bytes: int = 1024) -> DataFrame:
    """STUB resize: truncate payloads (plumbing for a real resampler)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf['payload'] = [
                bytes(p)[:max_bytes] if p is not None else None
                for p in pdf['payload']
            ]
            yield pdf

    return media.where(F.col('kind') == 'image') \
        .mapInPandas(batches, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 256,
                  every_n: int = 2) -> DataFrame:
    """STUB frame sampling: fixed-size windows of the payload, every Nth."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf['media_id'], pdf['payload']):
                data = bytes(payload) if payload is not None else b''
                n_frames = max(len(data) // frame_bytes, 1)
                for i in range(0, n_frames, every_n):
                    rows.append({
                        'media_id': media_id,
                        'frame_idx': i,
                        'frame': data[i * frame_bytes:(i + 1) * frame_bytes],
                    })
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.where(F.col('kind') == 'video') \
        .mapInPandas(batches, schema=FRAME_SCHEMA)

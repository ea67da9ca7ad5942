"""Pure-stdlib AVI (RIFF) video codec: uncompressed 8-bit gray frames.

Completes the multimodal codec set (netpbm/BMP/TIFF images, WAV audio):
AVI is a RIFF container like WAV, so the same ``struct`` chunk-walk
reads it — ``LIST hdrl``  carrying the 56-byte ``avih`` main header
(geometry, frame count, microseconds per frame) and ``LIST movi``
carrying one ``00db`` (uncompressed DIB) chunk per frame.  The writer
emits exactly that minimal canonical layout; the reader tolerates and
skips unknown chunks.  No third-party codec library, no compression —
the honest scope for this container: real geometry, frame counts,
exact integer sample sums, real frame extraction.

Decoded result contract (:func:`decode_avi`)::

    {'width': int, 'height': int, 'n_frames': int,
     'micro_sec_per_frame': int, 'n_samples': int, 'sample_sum': int,
     'duration_ms': int, 'decoder': 'avi'}

``n_samples`` is the total decoded sample count (frames x w x h, one
gray byte per pixel); ``sample_sum`` their exact integer sum.
"""

from __future__ import annotations

import struct
from typing import Iterator, List


class VideoDecodeError(ValueError):
    pass


_AVIH_FMT = '<14I'          # 56-byte MainAVIHeader


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (chunk_id, body_start, body_size); RIFF word alignment."""
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        csize = struct.unpack_from('<I', data, pos + 4)[0]
        if pos + 8 + csize > end:
            raise VideoDecodeError('truncated RIFF chunk')
        yield cid, pos + 8, csize
        pos += 8 + csize + (csize & 1)


def _parse_avi(data: bytes):
    """Shared header+frame walk: returns (avih tuple, frame ranges)."""
    if len(data) < 12 or data[:4] != b'RIFF' or data[8:12] != b'AVI ':
        raise VideoDecodeError('not a RIFF/AVI payload')
    avih = None
    frames: List[tuple] = []
    for cid, start, size in _walk_chunks(data, 12, len(data)):
        if cid != b'LIST' or size < 4:
            continue
        list_type = data[start:start + 4]
        if list_type == b'hdrl':
            for sub, s2, n2 in _walk_chunks(data, start + 4, start + size):
                if sub == b'avih':
                    if n2 < 56:
                        raise VideoDecodeError('avih header too short')
                    avih = struct.unpack_from(_AVIH_FMT, data, s2)
                    break
        elif list_type == b'movi':
            for sub, s2, n2 in _walk_chunks(data, start + 4, start + size):
                # uncompressed DIB frame chunks ('##db'); others skipped
                if sub[2:4] == b'db':
                    frames.append((s2, n2))
    if avih is None:
        raise VideoDecodeError('no avih header')
    return avih, frames


def decode_avi(data: bytes) -> dict:
    avih, frames = _parse_avi(data)
    micro_sec_per_frame, total_frames = avih[0], avih[4]
    width, height = avih[8], avih[9]
    if width < 1 or height < 1 or micro_sec_per_frame < 1:
        raise VideoDecodeError('bad avih parameters')
    if total_frames != len(frames):
        raise VideoDecodeError(
            'avih frame count %d != %d movi frames'
            % (total_frames, len(frames)))
    fsize = width * height            # 8-bit gray, no stride padding
    sample_sum = 0
    for start, size in frames:
        if size != fsize:
            raise VideoDecodeError('frame size %d != w*h %d'
                                   % (size, fsize))
        sample_sum += sum(data[start:start + size])
    n_samples = len(frames) * fsize
    return {'width': width, 'height': height, 'n_frames': len(frames),
            'micro_sec_per_frame': micro_sec_per_frame,
            'n_samples': n_samples, 'sample_sum': sample_sum,
            'duration_ms': len(frames) * micro_sec_per_frame // 1000,
            'decoder': 'avi'}


def iter_avi_frames(data: bytes) -> Iterator[bytes]:
    """Yield raw frame payloads in stream order (real frame sampling)."""
    _, frames = _parse_avi(data)
    for start, size in frames:
        yield data[start:start + size]


def encode_avi_gray8(width: int, height: int, micro_sec_per_frame: int,
                     frames: List[bytes]) -> bytes:
    """Minimal canonical AVI writer: avih header + one 00db chunk per
    uncompressed 8-bit-gray frame. Container size closed form (the SQL
    oracle re-derives it): ``12 + 76 + 12 + n_frames*(8 + w*h + (w*h
    & 1))`` — RIFF header, hdrl LIST (12 list header + 8 chunk header
    + 56 avih), movi LIST header, then word-aligned frame chunks.
    """
    fsize = width * height
    assert all(len(f) == fsize for f in frames)
    avih = struct.pack(
        _AVIH_FMT, micro_sec_per_frame, fsize * 1000000
        // max(micro_sec_per_frame, 1), 0, 0, len(frames), 0, 1, fsize,
        width, height, 0, 0, 0, 0)
    hdrl = b'LIST' + struct.pack('<I', 4 + 8 + len(avih)) + b'hdrl' \
        + b'avih' + struct.pack('<I', len(avih)) + avih
    pad = b'\x00' if fsize & 1 else b''
    movi_body = b''.join(
        b'00db' + struct.pack('<I', fsize) + f + pad for f in frames)
    movi = b'LIST' + struct.pack('<I', 4 + len(movi_body)) + b'movi' \
        + movi_body
    body = b'AVI ' + hdrl + movi
    return b'RIFF' + struct.pack('<I', len(body)) + body

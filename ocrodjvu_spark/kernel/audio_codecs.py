"""Pure-stdlib WAV/RIFF audio codec (PCM 8/16-bit).

Same spirit as :mod:`ocrodjvu_spark.kernel.image_codecs`: a byte-exact
``struct``-based reader + the matching writer the test fixtures use, so
the Spark multimodal stage can decode real audio payloads with no
third-party codec library.  (The reference has no audio path — this is
part of the beyond-reference training-data-pipeline surface; the
container format is the canonical RIFF/WAVE layout.)

Decoded result contract (:func:`decode_wav`)::

    {'sample_rate': int, 'channels': int, 'n_samples': int,
     'n_frames': int, 'sample_sum': int, 'duration_ms': int,
     'decoder': 'wav'}

``n_samples`` is the TOTAL sample count (frames x channels — the same
convention as the image codecs' ``w * h * channels``); ``sample_sum``
is the exact integer sum of all decoded sample values (unsigned 0..255
for 8-bit PCM, signed for 16-bit) — order-independent and exact, so the
SQL oracle reproduces it in closed form from the generative pattern.
"""

from __future__ import annotations

import struct


class AudioDecodeError(ValueError):
    pass


def decode_wav(data: bytes) -> dict:
    """Parse a RIFF/WAVE container: walk chunks, read ``fmt `` then
    ``data``; PCM (format tag 1) at 8 or 16 bits per sample only.

    Chunk bodies are word-aligned per the RIFF spec (odd-sized chunks
    carry one pad byte that is not part of the chunk).
    """
    if len(data) < 12 or data[:4] != b'RIFF' or data[8:12] != b'WAVE':
        raise AudioDecodeError('not a RIFF/WAVE payload')
    fmt = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        csize = struct.unpack_from('<I', data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + csize]
        if len(body) < csize:
            raise AudioDecodeError('truncated RIFF chunk')
        if cid == b'fmt ':
            if csize < 16:
                raise AudioDecodeError('fmt chunk too short')
            (audio_format, channels, sample_rate, _byte_rate,
             _block_align, bits) = struct.unpack_from('<HHIIHH', body, 0)
            if audio_format != 1:
                raise AudioDecodeError(
                    'unsupported WAVE format tag %d' % audio_format)
            if bits not in (8, 16):
                raise AudioDecodeError(
                    'unsupported bits per sample %d' % bits)
            if channels < 1 or sample_rate < 1:
                raise AudioDecodeError('bad fmt parameters')
            fmt = (channels, sample_rate, bits)
        elif cid == b'data':
            if fmt is None:
                raise AudioDecodeError('data chunk before fmt')
            channels, sample_rate, bits = fmt
            if bits == 8:                  # unsigned bytes
                n_samples = csize
                sample_sum = sum(body)
            else:                          # signed little-endian int16
                if csize % 2:
                    raise AudioDecodeError('odd 16-bit data chunk')
                n_samples = csize // 2
                sample_sum = sum(
                    struct.unpack('<%dh' % n_samples, body))
            if n_samples % channels:
                raise AudioDecodeError('partial trailing frame')
            n_frames = n_samples // channels
            return {'sample_rate': sample_rate, 'channels': channels,
                    'n_samples': n_samples, 'n_frames': n_frames,
                    'sample_sum': sample_sum,
                    'duration_ms': n_frames * 1000 // sample_rate,
                    'decoder': 'wav'}
        pos += 8 + csize + (csize & 1)     # word alignment
    raise AudioDecodeError('no data chunk')


def encode_wav_pcm8(sample_rate: int, channels: int,
                    samples: bytes) -> bytes:
    """Canonical 44-byte-header WAV writer, 8-bit unsigned PCM.

    ``samples`` is the interleaved frame data (``n_frames * channels``
    bytes).  An odd data chunk gets the RIFF pad byte, so the container
    size is ``44 + n + (n & 1)`` — the closed form the SQL oracle uses.
    """
    n = len(samples)
    assert channels >= 1 and n % channels == 0
    pad = b'\x00' if n & 1 else b''
    return (b'RIFF' + struct.pack('<I', 36 + n + len(pad)) + b'WAVE'
            + b'fmt ' + struct.pack('<IHHIIHH', 16, 1, channels,
                                    sample_rate, sample_rate * channels,
                                    channels, 8)
            + b'data' + struct.pack('<I', n) + samples + pad)

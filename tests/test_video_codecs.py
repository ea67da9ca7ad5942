"""Unit tests for the pure-stdlib AVI/RIFF codec (no Spark)."""

import struct

import pytest

from ocrodjvu_spark.kernel import video_codecs as VC


def _frames(w, h, n, seed=0):
    return [bytes((i + f + seed) % 256 for i in range(w * h))
            for f in range(n)]


class TestAvi:
    def test_roundtrip(self):
        frames = _frames(4, 3, 5, seed=7)
        payload = VC.encode_avi_gray8(4, 3, 40000, frames)
        out = VC.decode_avi(payload)
        assert out == {'width': 4, 'height': 3, 'n_frames': 5,
                       'micro_sec_per_frame': 40000,
                       'n_samples': 60,
                       'sample_sum': sum(sum(f) for f in frames),
                       'duration_ms': 5 * 40000 // 1000,
                       'decoder': 'avi'}

    def test_container_size_closed_form(self):
        for w, h, n in ((4, 3, 2), (3, 3, 4), (5, 1, 1)):
            payload = VC.encode_avi_gray8(w, h, 100000, _frames(w, h, n))
            fs = w * h
            assert len(payload) == 12 + 76 + 12 + n * (8 + fs + fs % 2)
            # RIFF size field covers everything after its own 8 bytes
            assert struct.unpack_from('<I', payload, 4)[0] \
                == len(payload) - 8

    def test_odd_frame_size_word_aligned(self):
        frames = _frames(3, 3, 2)          # 9 bytes -> 1 pad each
        payload = VC.encode_avi_gray8(3, 3, 50000, frames)
        out = VC.decode_avi(payload)
        assert out['n_samples'] == 18
        assert list(VC.iter_avi_frames(payload)) == frames

    def test_iter_frames_stream_order(self):
        frames = _frames(4, 2, 4, seed=3)
        payload = VC.encode_avi_gray8(4, 2, 33333, frames)
        assert list(VC.iter_avi_frames(payload)) == frames

    def test_unknown_chunks_skipped(self):
        frames = _frames(4, 2, 2)
        base = VC.encode_avi_gray8(4, 2, 40000, frames)
        junk = b'JUNK' + struct.pack('<I', 6) + b'abcdef'
        # splice an unknown top-level chunk before the LISTs and fix
        # the RIFF size
        payload = base[:12] + junk + base[12:]
        payload = payload[:4] + struct.pack(
            '<I', len(payload) - 8) + payload[8:]
        assert VC.decode_avi(payload)['n_frames'] == 2

    def test_malformed_payloads_raise(self):
        frames = _frames(4, 2, 2)
        good = VC.encode_avi_gray8(4, 2, 40000, frames)
        bad = [
            b'',
            b'RIFF\x04\x00\x00\x00WAVE',       # wrong form type
            good[:40],                         # truncated inside hdrl
            # frame-count mismatch: patch avih dwTotalFrames (offset:
            # 12 RIFF + 12 LIST/hdrl + 8 avih hdr + 16 = 48)
            good[:48] + struct.pack('<I', 9) + good[52:],
        ]
        for payload in bad:
            with pytest.raises(VC.VideoDecodeError):
                VC.decode_avi(payload)
        # a frame chunk whose size differs from w*h
        h_bad = good.replace(b'00db' + struct.pack('<I', 8),
                             b'00db' + struct.pack('<I', 7), 1)
        with pytest.raises(VC.VideoDecodeError):
            VC.decode_avi(h_bad)

"""Unit tests for the pure-stdlib WAV/RIFF codec (no Spark)."""

import struct

import pytest

from ocrodjvu_spark.kernel import audio_codecs as AC


def _wav16(rate, channels, values):
    """Hand-rolled 16-bit PCM WAV (the writer only emits 8-bit)."""
    body = struct.pack('<%dh' % len(values), *values)
    return (b'RIFF' + struct.pack('<I', 36 + len(body)) + b'WAVE'
            + b'fmt ' + struct.pack('<IHHIIHH', 16, 1, channels, rate,
                                    rate * channels * 2, channels * 2, 16)
            + b'data' + struct.pack('<I', len(body)) + body)


class TestWav:
    def test_pcm8_roundtrip(self):
        samples = bytes((i * 3 + 1) % 256 for i in range(120))
        out = AC.decode_wav(AC.encode_wav_pcm8(16000, 2, samples))
        assert out == {'sample_rate': 16000, 'channels': 2,
                       'n_samples': 120, 'n_frames': 60,
                       'sample_sum': sum(samples),
                       'duration_ms': 60 * 1000 // 16000,
                       'decoder': 'wav'}

    def test_odd_data_chunk_gets_riff_pad(self):
        samples = bytes(range(33))        # odd -> one pad byte
        payload = AC.encode_wav_pcm8(8000, 1, samples)
        assert len(payload) == 44 + 33 + 1
        # RIFF size covers everything after the 8-byte RIFF header
        assert struct.unpack_from('<I', payload, 4)[0] == len(payload) - 8
        out = AC.decode_wav(payload)
        assert out['n_samples'] == 33 and out['sample_sum'] == sum(samples)

    def test_pcm16_signed_sum(self):
        vals = [-300, 150, 0, 32767, -32768, 7]
        out = AC.decode_wav(_wav16(44100, 2, vals))
        assert out['channels'] == 2 and out['n_samples'] == 6
        assert out['sample_sum'] == sum(vals)
        assert out['duration_ms'] == 3 * 1000 // 44100

    def test_unknown_chunks_are_skipped(self):
        # a LIST chunk (odd size -> word-aligned) before fmt/data
        samples = bytes(range(10))
        base = AC.encode_wav_pcm8(8000, 1, samples)
        extra = b'LIST' + struct.pack('<I', 5) + b'INFOx' + b'\x00'
        payload = base[:12] + extra + base[12:]
        assert AC.decode_wav(payload)['sample_sum'] == sum(samples)

    def test_malformed_payloads_raise(self):
        samples = bytes(range(8))
        good = AC.encode_wav_pcm8(8000, 1, samples)
        bad = [
            b'',                                   # empty
            b'RIFF\x00\x00\x00\x00WAVX',           # not WAVE
            good[:20],                             # truncated chunk
            good[:12] + good[36:],                 # data before fmt
            good.replace(struct.pack('<H', 1) + struct.pack('<H', 1),
                         struct.pack('<H', 3) + struct.pack('<H', 1),
                         1),                       # float format tag
        ]
        for payload in bad:
            with pytest.raises(AC.AudioDecodeError):
                AC.decode_wav(payload)
        # partial trailing frame: 2-channel fmt over odd sample count
        stereo = AC.encode_wav_pcm8(8000, 1, bytes(range(9)))
        broken = stereo.replace(
            struct.pack('<IHHIIHH', 16, 1, 1, 8000, 8000, 1, 8),
            struct.pack('<IHHIIHH', 16, 1, 2, 8000, 16000, 2, 8), 1)
        with pytest.raises(AC.AudioDecodeError):
            AC.decode_wav(broken)

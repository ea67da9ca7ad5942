"""Randomized round-trip/layout checks for the stdlib image codecs:
every encoder output must decode back to exactly the geometry and the
brute-force sample sum of the raw stream it was built from, across
random dimensions — including the stride/padding edge widths the fixed
unit tests cannot enumerate."""

import random
import struct

from ocrodjvu_spark.kernel import image_codecs as IC


def test_random_roundtrips_all_encoders():
    rng = random.Random(20260817)
    for _ in range(120):
        w = rng.randrange(1, 40)
        h = rng.randrange(1, 20)
        fmt = rng.choice(['pgm', 'ppm', 'pbm', 'bmp', 'tiff'])
        if fmt == 'pbm':
            bits = [rng.randrange(2) for _ in range(w * h)]
            data = IC.encode_pbm(w, h, bits)
            want_sum, ch = sum(bits), 1
        else:
            ch = 1 if fmt == 'pgm' else 3
            samples = bytes(rng.randrange(256) for _ in range(w * h * ch))
            enc = {'pgm': IC.encode_pgm, 'ppm': IC.encode_ppm,
                   'bmp': IC.encode_bmp24,
                   'tiff': IC.encode_tiff_rgb}[fmt]
            data = enc(w, h, samples)
            want_sum = sum(samples)
        out = IC.decode_image(data)
        assert (out['width'], out['height'], out['channels']) == (w, h, ch), \
            (fmt, w, h)
        assert out['n_samples'] == w * h * ch
        assert out['pixel_sum'] == want_sum, (fmt, w, h)


def test_random_resize_matches_brute_force():
    rng = random.Random(42)
    for _ in range(60):
        w = rng.randrange(1, 20)
        h = rng.randrange(1, 16)
        nw = rng.randrange(1, 20)
        nh = rng.randrange(1, 16)
        ch = rng.choice([1, 3])
        samples = bytes(rng.randrange(256) for _ in range(w * h * ch))
        enc = IC.encode_pgm if ch == 1 else IC.encode_ppm
        small = IC.resize_pnm_nearest(enc(w, h, samples), nw, nh)
        out = IC.decode_pnm(small)
        # brute-force floor-mapped resample
        want = bytearray()
        for y in range(nh):
            sy = y * h // nh
            for x in range(nw):
                sx = x * w // nw
                base = (sy * w + sx) * ch
                want += samples[base:base + ch]
        assert (out['width'], out['height']) == (nw, nh)
        assert out['pixel_sum'] == sum(want), (w, h, nw, nh, ch)


def test_random_bmp_palette_images():
    rng = random.Random(7)
    for _ in range(40):
        w = rng.randrange(1, 30)
        h = rng.randrange(1, 8)
        bpp = rng.choice([1, 8])
        n_colors = 2 if bpp == 1 else rng.randrange(2, 17)
        palette = [(rng.randrange(256), rng.randrange(256),
                    rng.randrange(256)) for _ in range(n_colors)]
        idxs = [rng.randrange(n_colors) for _ in range(w * h)]
        stride = ((bpp * w + 31) // 32) * 4
        data = bytearray()
        data += struct.pack('<2sIHHI', b'BM', 0, 0, 0,
                            54 + 4 * n_colors)
        data += struct.pack('<IiiHHIIiiII', 40, w, h, 1, bpp, 0,
                            stride * h, 0, 0, n_colors, n_colors)
        for b, g, r in palette:
            data += struct.pack('<BBBB', b, g, r, 0)
        for y in range(h):                 # stored bottom-up; sums agree
            row = bytearray(stride)
            for x in range(w):
                idx = idxs[y * w + x]
                if bpp == 8:
                    row[x] = idx
                elif idx:
                    row[x >> 3] |= 0x80 >> (x & 7)
            data += row
        out = IC.decode_bmp(bytes(data))
        want = sum(sum(palette[i]) for i in idxs)
        assert (out['width'], out['height']) == (w, h)
        assert out['pixel_sum'] == want, (w, h, bpp, n_colors)

"""Unit tests for the pure-stdlib netpbm/BMP codecs (no Spark)."""

import struct

import pytest

from ocrodjvu_spark.kernel import image_codecs as IC


def _gray(w, h):
    return bytes((i * 7 + 3) % 256 for i in range(w * h))


def _rgb(w, h):
    return bytes((i * 11 + 5) % 256 for i in range(w * h * 3))


class TestPNM:
    def test_pgm_roundtrip(self):
        s = _gray(5, 4)
        out = IC.decode_pnm(IC.encode_pgm(5, 4, s))
        assert out == {'width': 5, 'height': 4, 'channels': 1,
                       'n_samples': 20, 'pixel_sum': sum(s),
                       'decoder': 'pnm'}

    def test_ppm_roundtrip(self):
        s = _rgb(3, 2)
        out = IC.decode_pnm(IC.encode_ppm(3, 2, s))
        assert (out['width'], out['height'], out['channels']) == (3, 2, 3)
        assert out['n_samples'] == 18 and out['pixel_sum'] == sum(s)

    def test_pbm_roundtrip_with_row_padding(self):
        # width 10 -> 2 bytes/row, 6 pad bits that must NOT be counted
        bits = [(x + y) % 2 for y in range(3) for x in range(10)]
        out = IC.decode_pnm(IC.encode_pbm(10, 3, bits))
        assert out == {'width': 10, 'height': 3, 'channels': 1,
                       'n_samples': 30, 'pixel_sum': sum(bits),
                       'decoder': 'pnm'}

    def test_pbm_all_black_row_pad_excluded(self):
        bits = [1] * (9 * 2)
        out = IC.decode_pnm(IC.encode_pbm(9, 2, bits))
        assert out['pixel_sum'] == 18  # not 2*16 (pad bits are zeroed
        # by the encoder but the decoder masks them regardless)

    def test_ascii_variants_with_comments(self):
        p2 = b'P2 # gray\n 3 2 # dims\n 255\n 0 10 20\n30 40 50\n'
        out = IC.decode_pnm(p2)
        assert out['pixel_sum'] == 150 and out['width'] == 3
        p1 = b'P1\n# bitmap\n4 2\n0110\n1001\n'
        out = IC.decode_pnm(p1)
        assert out['pixel_sum'] == 4 and out['n_samples'] == 8
        p3 = b'P3 2 1 255  1 2 3 4 5 6\n'
        assert IC.decode_pnm(p3)['pixel_sum'] == 21

    def test_comments_inside_plain_raster_body(self):
        # '#'-to-EOL comments are legal INSIDE the raster of plain
        # variants too: digits in a comment must not count as pixels
        p1 = b'P1 4 2\n01 # 1111 stray bits\n10\n# trailing 01\n1001\n'
        out = IC.decode_pnm(p1)
        assert out['n_samples'] == 8 and out['pixel_sum'] == 4
        p2 = b'P2 3 1 255\n# row below\n5 # five\n10 15\n'
        assert IC.decode_pnm(p2)['pixel_sum'] == 30
        p3 = b'P3 1 1 255\n# rgb\n7 8 9 # done\n'
        assert IC.decode_pnm(p3)['pixel_sum'] == 24

    def test_16bit_pgm(self):
        body = struct.pack('>3H', 1000, 2000, 65535)
        out = IC.decode_pnm(b'P5 3 1 65535\n' + body)
        assert out['pixel_sum'] == 1000 + 2000 + 65535

    def test_truncated_and_garbage_raise(self):
        with pytest.raises(IC.ImageDecodeError):
            IC.decode_pnm(b'P5 5 5 255\nabc')
        with pytest.raises(IC.ImageDecodeError):
            IC.decode_pnm(b'Px 1 1 255\n\x00')
        with pytest.raises(IC.ImageDecodeError):
            IC.decode_image(b'\x89PNG not supported')


class TestBMP:
    def test_bmp24_roundtrip(self):
        s = _rgb(5, 3)
        data = IC.encode_bmp24(5, 3, s)
        out = IC.decode_bmp(data)
        assert (out['width'], out['height'], out['channels']) == (5, 3, 3)
        assert out['pixel_sum'] == sum(s)  # padding excluded
        assert out['n_samples'] == 45
        # file size matches the header's own claim
        assert struct.unpack_from('<I', data, 2)[0] == len(data)

    def test_bmp24_width_needing_padding(self):
        # 3 bytes/px * 2 px = 6 -> stride 8: two pad bytes per row
        s = bytes([255] * (2 * 2 * 3))
        out = IC.decode_bmp(IC.encode_bmp24(2, 2, s))
        assert out['pixel_sum'] == 255 * 12

    def test_bmp_top_down(self):
        # negative height = top-down row order; sums are identical
        s = _rgb(2, 2)
        data = bytearray(IC.encode_bmp24(2, 2, s))
        struct.pack_into('<i', data, 22, -2)
        rows = data[54:]
        data[54:] = rows[len(rows) // 2:] + rows[:len(rows) // 2]
        assert IC.decode_bmp(bytes(data))['pixel_sum'] == sum(s)

    def test_bmp_1bpp_palette(self):
        # reference-writer layout (image_io.py:118-121): palette
        # index 0 = white, index 1 = black; one row of 8 pixels 0b10110000
        stride = 4
        data = bytearray()
        data += struct.pack('<2sIHHI', b'BM', 54 + 8 + stride, 0, 0, 62)
        data += struct.pack('<IiiHHIIiiII', 40, 8, 1, 1, 1, 0,
                            stride, 0, 0, 2, 2)
        data += struct.pack('<BBBB', 0xFF, 0xFF, 0xFF, 0)
        data += struct.pack('<BBBB', 0, 0, 0, 0)
        data += bytes([0b10110000, 0, 0, 0])
        out = IC.decode_bmp(bytes(data))
        assert (out['width'], out['height']) == (8, 1)
        # 3 black pixels (sum 0) + 5 white (3*255 each)
        assert out['pixel_sum'] == 5 * 3 * 255

    def test_bmp_8bpp_palette(self):
        # 2 colors used from a 4-entry palette, width 2 -> stride 4
        pal = [(10, 20, 30), (40, 50, 60), (0, 0, 0), (0, 0, 0)]
        data = bytearray()
        data += struct.pack('<2sIHHI', b'BM', 0, 0, 0, 54 + 16)
        data += struct.pack('<IiiHHIIiiII', 40, 2, 1, 1, 8, 0,
                            4, 0, 0, 4, 4)
        for b, g, r in pal:
            data += struct.pack('<BBBB', b, g, r, 0)
        data += bytes([0, 1, 0, 0])
        out = IC.decode_bmp(bytes(data))
        assert out['pixel_sum'] == (10 + 20 + 30) + (40 + 50 + 60)

    def test_compressed_rejected(self):
        data = bytearray(IC.encode_bmp24(2, 2, _rgb(2, 2)))
        struct.pack_into('<I', data, 30, 1)  # BI_RLE8
        with pytest.raises(IC.ImageDecodeError):
            IC.decode_bmp(bytes(data))


class TestTIFF:
    def test_rgb_roundtrip(self):
        s = _rgb(5, 3)
        data = IC.encode_tiff_rgb(5, 3, s)
        out = IC.decode_tiff(data)
        assert (out['width'], out['height'], out['channels']) == (5, 3, 3)
        assert out['pixel_sum'] == sum(s)
        assert out['n_samples'] == 45 and out['decoder'] == 'tiff'
        assert IC.decode_image(data) == out  # 'II' magic sniffed

    def test_reference_writer_layout(self):
        # the reference writer pins data at offset 28 + 9*12 = 136 with
        # BitsPerSample stored at file offset 8 (image_io.py:150-180)
        data = IC.encode_tiff_rgb(2, 2, _rgb(2, 2))
        assert data[:4] == b'II\x2a\x00'
        assert struct.unpack_from('<HHH', data, 8) == (8, 8, 8)
        assert len(data) == 136 + 12

    def test_bilevel_white_is_zero(self):
        # hand-built 1-bpp strip, interp 0 (WhiteIsZero: bit 1 = black);
        # one row 0b10110000 over width 8 -> 3 black pixels
        body = bytes([0b10110000])
        ifd_off = 8
        data = bytearray(struct.pack('<2sHI', b'II', 42, ifd_off))
        tags = [
            struct.pack('<HHII', 0x100, 4, 1, 8),
            struct.pack('<HHII', 0x101, 4, 1, 1),
            struct.pack('<HHIHxx', 0x102, 3, 1, 1),
            struct.pack('<HHIHxx', 0x106, 3, 1, 0),
            struct.pack('<HHII', 0x111, 4, 1, 8 + 2 + 5 * 12 + 4),
            struct.pack('<HHII', 0x117, 4, 1, len(body)),
        ]
        # keep 5 tags + strip tags consistent: rebuild with 6 tags
        data += struct.pack('<H', len(tags))
        for t in tags:
            data += t
        data += struct.pack('<I', 0)
        strip_off = len(data)
        # fix StripOffsets to the real position
        struct.pack_into('<I', data, 8 + 2 + 4 * 12 + 8, strip_off)
        data += body
        out = IC.decode_tiff(bytes(data))
        assert (out['width'], out['height'], out['channels']) == (8, 1, 1)
        assert out['pixel_sum'] == 3          # black count (1 = black)

    def test_big_endian_rejline(self):
        # MM byte order parses too (same tags, big-endian)
        data = IC.encode_tiff_rgb(2, 1, _rgb(2, 1))
        assert IC.decode_tiff(data)['width'] == 2
        with pytest.raises(IC.ImageDecodeError):
            IC.decode_tiff(b'II\x2b\x00\x00\x00\x00\x00')  # BigTIFF

    def test_compressed_rejected(self):
        data = bytearray(IC.encode_tiff_rgb(2, 1, _rgb(2, 1)))
        # splice a Compression=5 (LZW) tag over the Photometric tag
        struct.pack_into('<HHIHxx', data, 24 + 3 * 12, 0x103, 3, 1, 5)
        with pytest.raises(IC.ImageDecodeError):
            IC.decode_tiff(bytes(data))


class TestMalformedPayloads:
    # decode_image must surface EVERY malformed payload as
    # ImageDecodeError — the Spark feature stage routes on that one
    # type; a bare ValueError/IndexError/struct.error would fail the
    # whole task instead of stubbing the row
    def test_garbage_header_int(self):
        with pytest.raises(IC.ImageDecodeError):
            IC.decode_image(b'P5 x 3 255\n' + b'\x00' * 16)

    def test_bmp_palette_index_out_of_range(self):
        # 8-bpp pixel index beyond the declared 2-color palette
        data = bytearray()
        data += struct.pack('<2sIHHI', b'BM', 0, 0, 0, 54 + 8)
        data += struct.pack('<IiiHHIIiiII', 40, 2, 1, 1, 8, 0,
                            4, 0, 0, 2, 2)
        data += struct.pack('<BBBB', 0, 0, 0, 0) * 2
        data += bytes([0, 7, 0, 0])
        with pytest.raises(IC.ImageDecodeError):
            IC.decode_image(bytes(data))

    def test_tiff_dangling_tag_offset(self):
        data = bytearray(IC.encode_tiff_rgb(2, 1, bytes(6)))
        # point the BitsPerSample value offset past EOF
        struct.pack_into('<I', data, 24 + 2 * 12 + 8, 10_000)
        with pytest.raises(IC.ImageDecodeError):
            IC.decode_image(bytes(data))

    def test_pnm_geometry_header_only(self):
        assert IC.pnm_geometry(b'P6 5 4 255\n' + bytes(60)) == (5, 4, 3)
        assert IC.pnm_geometry(b'P4 9 2\n' + bytes(4)) == (9, 2, 1)
        with pytest.raises(IC.ImageDecodeError):
            IC.pnm_geometry(b'BM rubbish')
        # non-numeric dims keep the one-exception contract too
        with pytest.raises(IC.ImageDecodeError):
            IC.pnm_geometry(b'P5 x 3 255\n' + bytes(16))


class TestResize:
    def test_resize_p5_floor_mapping(self):
        s = _gray(6, 4)
        small = IC.resize_pnm_nearest(IC.encode_pgm(6, 4, s), 3, 2)
        out = IC.decode_pnm(small)
        assert (out['width'], out['height']) == (3, 2)
        # target (x', y') samples source (x'*6//3, y'*4//2)
        want = [s[(y * 2) * 6 + x * 2] for y in range(2) for x in range(3)]
        assert out['pixel_sum'] == sum(want)

    def test_resize_p6_preserves_channel_triples(self):
        s = _rgb(4, 4)
        small = IC.resize_pnm_nearest(IC.encode_ppm(4, 4, s), 2, 2)
        body = small.split(b'\n', 1)[1]
        # each target pixel is a contiguous source BGR/RGB triple
        for y in range(2):
            for x in range(2):
                src = ((y * 2) * 4 + x * 2) * 3
                dst = (y * 2 + x) * 3
                assert body[dst:dst + 3] == s[src:src + 3]

    def test_resize_upscale(self):
        s = bytes([7, 9])
        big = IC.resize_pnm_nearest(IC.encode_pgm(2, 1, s), 4, 1)
        assert IC.decode_pnm(big)['pixel_sum'] == 7 + 7 + 9 + 9

    def test_resize_rejects_other_formats(self):
        with pytest.raises(IC.ImageDecodeError):
            IC.resize_pnm_nearest(IC.encode_pbm(4, 1, [0, 1, 0, 1]), 2, 1)

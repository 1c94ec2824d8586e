"""Pure-numpy BMP/WAV codecs (functions/codecs.py) + the real multimodal
decode path built on them. Golden-byte tests pin the wire format
independently of our own encoder."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from code_graph_backend_spark.functions import multimodal
from code_graph_backend_spark.functions.codecs import (
    bmp_stored_pixel_bytes,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)


def test_bmp_roundtrip_padded():
    # width 3 -> row 9 bytes, stride 12: padding must be honored
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (5, 3, 3), dtype=np.uint8)
    w, h, out = decode_bmp(encode_bmp(px))
    assert (w, h) == (3, 5)
    assert np.array_equal(out, px)


def test_bmp_roundtrip_topdown():
    px = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    w, h, out = decode_bmp(encode_bmp(px, topdown=True))
    assert (w, h) == (4, 2)
    assert np.array_equal(out, px)


def test_bmp_golden_bytes():
    """Hand-built 1x2 bottom-up BMP: two pixels, red on the TOP row.
    Stored order: bottom row first, BGR channels, rows padded to 4."""
    # bottom row pixel = blue (0,0,255) -> stored BGR ff 00 00
    # top row pixel    = red  (255,0,0) -> stored BGR 00 00 ff
    data = b"\xff\x00\x00\x00" + b"\x00\x00\xff\x00"  # stride 4 (1*3 padded)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 1, 2, 1, 24, 0, len(data), 0, 0, 0, 0)
    w, h, px = decode_bmp(header + info + data)
    assert (w, h) == (1, 2)
    assert px[0, 0].tolist() == [255, 0, 0]  # top row is red
    assert px[1, 0].tolist() == [0, 0, 255]  # bottom row is blue
    assert bmp_stored_pixel_bytes(header + info + data) == b"\xff\x00\x00\x00\x00\xff"


def test_bmp_nonstandard_pixel_offset():
    """The pixel-array offset in the file header must be honored, not
    assumed to be 54."""
    px = np.zeros((1, 1, 3), dtype=np.uint8)
    px[0, 0] = (1, 2, 3)
    payload = bytearray(encode_bmp(px))
    # move pixel data 8 bytes later, patch the offset
    data = payload[54:]
    payload = payload[:54] + b"\x00" * 8 + data
    payload[10:14] = struct.pack("<I", 62)
    w, h, out = decode_bmp(bytes(payload))
    assert out[0, 0].tolist() == [1, 2, 3]


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"NOPE" * 20)
    px = np.zeros((1, 1, 3), dtype=np.uint8)
    payload = bytearray(encode_bmp(px))
    payload[28:30] = struct.pack("<H", 8)  # bpp=8
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(payload))


def test_wav_roundtrip_with_chunk_walk():
    samples = np.array([0, 1, -1, 32767, -32768, 12345], dtype=np.int16)
    payload = encode_wav(samples, 44100, extra_chunks=[(b"LIST", b"odd")])
    rate, ch, bits, out = decode_wav(payload)
    assert (rate, ch, bits) == (44100, 1, 16)
    assert np.array_equal(out, samples)


def test_wav_golden_bytes():
    """Minimal hand-built WAV: 2 samples [258, -2] at 8kHz mono."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = b"\x02\x01" + b"\xfe\xff"  # 258, -2 little-endian int16
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt \
        + b"data" + struct.pack("<I", 4) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, ch, bits, out = decode_wav(payload)
    assert rate == 8000 and ch == 1
    assert out.tolist() == [258, -2]


def test_wav_trailing_odd_byte_ignored():
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = b"\x01\x00\x7f"  # 3 bytes: one sample + dangling byte
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt \
        + b"data" + struct.pack("<I", 3) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    _, _, _, out = decode_wav(payload)
    assert out.tolist() == [1]


def test_wav_rejects_non_riff():
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 40)


# -- Spark-side real decode path -------------------------------------------


def test_real_bmp_features_end_to_end(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and more pad")],
        "doc_id long, text string",
    )
    media = multimodal.bmp_media_from_text(docs)
    row = multimodal.extract_features(media, fake=False).collect()[0]
    text = "the quick brown fox jumps over the lazy dog again and more pad"
    h = len(text) // 12
    region = text.encode()[: 12 * h]
    assert row["width"] == 4 and row["height"] == h
    assert row["n_bytes"] == 54 + len(region)
    assert row["px_sum"] == sum(region)
    assert row["feature_hash"] == hashlib.md5(region).hexdigest()
    # and the payload itself decodes to the text bytes (storage order)
    payload = media.collect()[0]["payload"]
    assert bmp_stored_pixel_bytes(bytes(payload)) == region


def test_real_wav_features_end_to_end(spark):
    docs = spark.createDataFrame(
        [(7, "abcdefghij")], "doc_id long, text string"
    )
    media = multimodal.wav_media_from_text(docs)
    row = multimodal.extract_audio_features(media).collect()[0]
    data = b"abcdefghij"
    samples = np.frombuffer(data, dtype="<i2")
    assert row["sample_rate"] == 8000 and row["n_channels"] == 1
    assert row["n_samples"] == 5
    assert row["amp_sum"] == int(np.abs(samples.astype(np.int64)).sum())
    assert row["data_md5"] == hashlib.md5(data).hexdigest()


def test_compressed_formats_still_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)


def test_avi_round_trip_with_stride_padding():
    import numpy as np

    from code_graph_backend_spark.functions.codecs import (
        avi_stored_frame_bytes, decode_avi, encode_avi,
    )

    rng = np.random.default_rng(11)
    fr = rng.integers(0, 256, (4, 3, 5, 3), dtype=np.uint8)  # w=5: stride 16
    payload = encode_avi(fr, fps=12)
    w, h, out = decode_avi(payload)
    assert (w, h) == (5, 3) and np.array_equal(out, fr)
    # stored fingerprint excludes padding and keeps file (bottom-up BGR) order
    sb = avi_stored_frame_bytes(payload, 1)
    assert sb == fr[1, ::-1, :, ::-1].tobytes()


def test_avi_golden_header_layout():
    """Pin the container layout: RIFF/AVI fourccs, hdrl before movi, strf
    dims, and '00db' frame chunks — a decoder that assumes offsets instead
    of walking LISTs would break on any header-size change."""
    import struct

    import numpy as np

    from code_graph_backend_spark.functions.codecs import encode_avi

    fr = np.zeros((2, 2, 4, 3), dtype=np.uint8)
    b = encode_avi(fr, fps=10)
    assert b[:4] == b"RIFF" and b[8:12] == b"AVI "
    assert b.find(b"hdrl") < b.find(b"movi")
    strf_at = b.find(b"strf")
    _, w, h = struct.unpack_from("<Iii", b, strf_at + 8)
    assert (w, h) == (4, 2)
    assert b.count(b"00db") == 2


def test_avi_rejects_compressed_bpp():
    import struct

    import numpy as np
    import pytest

    from code_graph_backend_spark.functions.codecs import decode_avi, encode_avi

    b = bytearray(encode_avi(np.zeros((1, 2, 2, 3), dtype=np.uint8)))
    strf_at = bytes(b).find(b"strf")
    struct.pack_into("<H", b, strf_at + 8 + 14, 8)  # biBitCount = 8
    with pytest.raises(NotImplementedError):
        decode_avi(bytes(b))


class TestPPM:
    def test_roundtrip_and_tokenizer(self):
        """P6 with comments and multi-space separators decodes exactly."""
        import numpy as np

        from code_graph_backend_spark.functions.codecs import (
            decode_ppm, encode_ppm, ppm_stored_pixel_bytes,
        )

        px = (np.arange(60, dtype=np.int64) % 251).astype(np.uint8).reshape(5, 4, 3)
        b = encode_ppm(px, comment="hello world")
        w, h, out = decode_ppm(b)
        assert (w, h) == (4, 5) and (out == px).all()
        assert ppm_stored_pixel_bytes(b) == px.tobytes()

        # hand-built header with comments in awkward places
        raw = b"P6\n#c1\n 4\t5 #c2\n255\n" + px.tobytes()
        w2, h2, out2 = decode_ppm(raw)
        assert (w2, h2) == (4, 5) and (out2 == px).all()

    def test_rejects_bad_inputs(self):
        import pytest as _pytest

        from code_graph_backend_spark.functions.codecs import decode_ppm

        with _pytest.raises(ValueError):
            decode_ppm(b"P5\n1 1\n255\n\x00")  # not P6
        with _pytest.raises(ValueError):
            decode_ppm(b"P6\n2 2\n255\n\x00\x00")  # truncated raster
        with _pytest.raises(NotImplementedError):
            decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)  # 16-bit raster

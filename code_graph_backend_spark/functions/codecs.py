"""Pure-numpy codecs for UNCOMPRESSED media formats: BMP (24-bit BI_RGB)
and WAV (RIFF PCM16). The container ships no image/audio libraries, so
these are real, spec-conformant parsers for the uncompressed subset —
they replace the `fake=True` stand-in kernel in functions/multimodal.py
for these formats; compressed formats (PNG/JPEG/MP4) stay honestly
stubbed behind NotImplementedError until a real decode library exists.

Format coverage, deliberately the parts a parser can get wrong:
- BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, pixel-array offset honored
  (not assumed 54), bottom-up AND top-down (negative biHeight) row order,
  BGR channel order, 4-byte row stride padding.
- WAV: RIFF chunk walk (unknown chunks skipped with odd-size pad bytes,
  per spec), `fmt ` parsed for rate/channels/bits, PCM16 little-endian
  samples; trailing odd byte in `data` ignored.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# BMP (Windows bitmap, 24-bit uncompressed)
# --------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray, topdown: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB -> BMP bytes (24bpp BI_RGB, padded rows).
    `topdown=True` writes a negative-height BMP (rows in image order)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = px if topdown else px[::-1]
    data = bytearray()
    pad = b"\x00" * (stride - w * 3)
    for row in rows:
        data += row[:, ::-1].tobytes() + pad  # RGB -> stored BGR
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if topdown else h), 1, 24, 0,
        len(data), 2835, 2835, 0, 0,
    )
    return bytes(header + info + data)


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """BMP bytes -> (width, height, (h, w, 3) uint8 RGB, top-down rows).

    Honors the header's pixel-array offset, row stride padding, BGR
    storage order, and both bottom-up (positive height) and top-down
    (negative height) layouts. Only 24bpp BI_RGB is supported — that is
    the uncompressed subset this container can decode without libraries.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, off = struct.unpack_from("<2sIHHI", payload, 0)
    hdr_sz, w, h_signed, planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24bpp BI_RGB supported (got bpp={bpp}, compression={comp})"
        )
    topdown = h_signed < 0
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    if off + stride * h > len(payload):
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(payload, np.uint8, stride * h, off).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not topdown:
        px = px[::-1]
    return w, h, np.ascontiguousarray(px)


def bmp_stored_pixel_bytes(payload: bytes) -> bytes:
    """The pixel-array region bytes exactly as stored (row padding
    excluded): rows in FILE order, BGR. This is the deterministic
    fingerprint target — invariant to the decoder's row/channel
    normalization."""
    _, _, _, _, off = struct.unpack_from("<2sIHHI", payload, 0)
    _, w, h_signed, _, _, _ = struct.unpack_from("<IiiHHI", payload, 14)
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, np.uint8, stride * h, off).reshape(h, stride)
    return rows[:, : w * 3].tobytes()


# --------------------------------------------------------------------------
# TGA (Truevision TARGA, type 2: uncompressed true-color 24bpp)
# --------------------------------------------------------------------------


def encode_tga(pixels: np.ndarray, topdown: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB -> TGA bytes (type-2 uncompressed 24bpp).
    TGA stores BGR with NO row padding; default origin is bottom-left,
    `topdown=True` sets descriptor bit 5 (top-left origin)."""
    h, w, _ = pixels.shape
    desc = 0x20 if topdown else 0x00
    header = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, w, h, 24, desc
    )
    px = pixels[:, :, ::-1]  # RGB -> BGR
    if not topdown:
        px = px[::-1]
    return header + np.ascontiguousarray(px).tobytes()


def decode_tga(payload: bytes) -> tuple[int, int, np.ndarray]:
    """TGA bytes -> (width, height, (h, w, 3) uint8 RGB, top-down rows).

    Honors the 18-byte header's id-field length, BGR storage, and both
    bottom-left (default) and top-left (descriptor bit 5) origins. Only
    type-2 (uncompressed true-color) 24bpp is supported — RLE (type 10)
    is the compressed variant this container has no library for."""
    if len(payload) < 18:
        raise ValueError("not a TGA payload")
    (id_len, cmap_type, img_type, _, _, _, _, _, w, h, bpp, desc) = (
        struct.unpack_from("<BBBHHBHHHHBB", payload, 0)
    )
    if cmap_type != 0 or img_type != 2:
        raise NotImplementedError(
            f"only type-2 uncompressed TGA supported (got type={img_type})"
        )
    if bpp != 24:
        raise NotImplementedError(f"only 24bpp TGA supported (got {bpp})")
    off = 18 + id_len
    if off + w * h * 3 > len(payload):
        raise ValueError("truncated TGA pixel data")
    px = (
        np.frombuffer(payload, np.uint8, w * h * 3, off)
        .reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    )
    if not (desc & 0x20):
        px = px[::-1]  # bottom-up -> top-down
    return w, h, np.ascontiguousarray(px)


def tga_stored_pixel_bytes(payload: bytes) -> bytes:
    """The TGA pixel region exactly as stored (rows in file order, BGR)
    — the fingerprint target, like bmp_stored_pixel_bytes."""
    id_len = payload[0]
    (w,) = struct.unpack_from("<H", payload, 12)
    (h,) = struct.unpack_from("<H", payload, 14)
    off = 18 + id_len
    return payload[off : off + w * h * 3]


def image_stored_pixel_bytes(payload: bytes) -> bytes:
    """Stored-pixel-region dispatch for the fingerprint hash: BMP/PPM by
    magic, else TGA (which has no magic — the type/bpp bytes are
    validated by decode_tga before anything trusts this region)."""
    if (payload or b"")[:2] == b"BM":
        return bmp_stored_pixel_bytes(payload)
    if (payload or b"")[:2] == b"P6":
        return ppm_stored_pixel_bytes(payload)
    return tga_stored_pixel_bytes(payload)


# --------------------------------------------------------------------------
# WAV (RIFF, PCM 16-bit little-endian)
# --------------------------------------------------------------------------


def encode_wav(
    samples: np.ndarray,
    sample_rate: int = 8000,
    n_channels: int = 1,
    extra_chunks: list[tuple[bytes, bytes]] | None = None,
) -> bytes:
    """int16 sample array -> RIFF/WAVE bytes. `extra_chunks` are written
    BEFORE `fmt ` so decoders must actually walk chunks, not assume fixed
    offsets (odd-sized chunks get the spec's pad byte)."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = bytearray(b"WAVE")
    for cid, payload in extra_chunks or []:
        body += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            body += b"\x00"
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + bytes(body)


def decode_wav(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, n_channels, bits, int16 samples).

    Walks the RIFF chunk list (skipping unknown chunks with their pad
    bytes) to find `fmt ` and `data`; only PCM16 is decoded. A trailing
    odd byte in `data` is ignored (it cannot form an int16 sample)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    end = min(end, len(payload))
    fmt = data = None
    while pos + 8 <= end:
        cid = payload[pos: pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        chunk = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size % 2)  # odd chunks are padded
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_channels, sample_rate, _, _, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM16 supported (got format={audio_fmt}, bits={bits})"
        )
    n = len(data) // 2
    samples = np.frombuffer(data, dtype="<i2", count=n)
    return sample_rate, n_channels, bits, samples


# --------------------------------------------------------------------------
# AVI (RIFF, uncompressed 24bpp DIB frames — '00db' chunks)
# --------------------------------------------------------------------------


def encode_avi(frames: np.ndarray, fps: int = 30) -> bytes:
    """(n, h, w, 3) uint8 RGB -> RIFF/AVI bytes with uncompressed 24bpp
    DIB frames ('00db' chunks, bottom-up BGR rows padded to 4 bytes) —
    the one video container a pure-numpy parser can honestly decode.
    Writes a spec-shaped hdrl (avih + strl/strh/strf) so decoders must
    walk the LIST structure rather than assume offsets."""
    fr = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = fr.shape
    stride = (w * 3 + 3) // 4 * 4
    pad = b"\x00" * (stride - w * 3)
    frame_blobs = []
    for f in fr:
        rows = f[::-1]  # bottom-up
        frame_blobs.append(b"".join(row[:, ::-1].tobytes() + pad for row in rows))
    frame_sz = stride * h

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    def list_chunk(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII", 1_000_000 // max(fps, 1), frame_sz * fps, 0, 0x10,
        n, 0, 1, frame_sz, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n,
        frame_sz, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_sz, 2835, 2835, 0, 0
    )
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih)
                      + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = list_chunk(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_blobs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[int, int, np.ndarray]:
    """AVI bytes -> (width, height, (n, h, w, 3) uint8 RGB frames).

    A real RIFF walk: LIST chunks descended, unknown chunks skipped with
    odd-size pad bytes, dimensions read from the strf BITMAPINFOHEADER,
    '00db'/'00dB' uncompressed DIB frames decoded with the same stride/
    bottom-up/BGR handling as decode_bmp. Only 24bpp BI_RGB frames are
    supported — compressed fourccs raise NotImplementedError."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    w = h = None
    bpp = comp = None
    frames: list[bytes] = []

    def walk(buf: bytes, start: int, end: int) -> None:
        nonlocal w, h, bpp, comp
        i = start
        while i + 8 <= end:
            cid = buf[i:i + 4]
            (sz,) = struct.unpack_from("<I", buf, i + 4)
            body_start = i + 8
            if cid == b"LIST":
                walk(buf, body_start + 4, body_start + sz)
            elif cid == b"strf":
                _, w_, h_, _, bpp_, comp_ = struct.unpack_from("<IiiHHI", buf, body_start)
                w, h, bpp, comp = w_, abs(h_), bpp_, comp_
            elif cid in (b"00db", b"00dB"):
                frames.append(buf[body_start:body_start + sz])
            i = body_start + sz + (sz % 2)

    walk(payload, 12, len(payload))
    if w is None:
        raise ValueError("AVI without strf header")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24bpp uncompressed DIB frames supported (bpp={bpp}, comp={comp})"
        )
    stride = (w * 3 + 3) // 4 * 4
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for k, fb in enumerate(frames):
        if len(fb) < stride * h:
            raise ValueError("truncated AVI frame")
        rows = np.frombuffer(fb, np.uint8, stride * h).reshape(h, stride)
        out[k] = rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]  # flip + BGR->RGB
    return w, h, out


def avi_stored_frame_bytes(payload: bytes, frame_idx: int) -> bytes:
    """Frame `frame_idx`'s '00db' chunk bytes exactly as stored (row
    padding excluded) — the normalization-invariant fingerprint target,
    like bmp_stored_pixel_bytes."""
    if payload[:4] != b"RIFF":
        raise ValueError("not a RIFF payload")
    w = None
    frames: list[bytes] = []

    def walk(buf: bytes, start: int, end: int) -> None:
        nonlocal w
        i = start
        while i + 8 <= end:
            cid = buf[i:i + 4]
            (sz,) = struct.unpack_from("<I", buf, i + 4)
            body_start = i + 8
            if cid == b"LIST":
                walk(buf, body_start + 4, body_start + sz)
            elif cid == b"strf":
                w = struct.unpack_from("<Ii", buf, body_start)[1]
            elif cid in (b"00db", b"00dB"):
                frames.append(buf[body_start:body_start + sz])
            i = body_start + sz + (sz % 2)

    walk(payload, 12, len(payload))
    fb = frames[frame_idx]
    stride = (w * 3 + 3) // 4 * 4
    h = len(fb) // stride
    rows = np.frombuffer(fb, np.uint8, stride * h).reshape(h, stride)
    return rows[:, : w * 3].tobytes()


# --------------------------------------------------------------------------
# PPM (netpbm P6, binary 24bpp) — ASCII header + raw RGB; decoding needs a
# real whitespace/comment tokenizer, unlike the fixed-offset BMP/TGA headers
# --------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray, comment: str = "t") -> bytes:
    """Binary P6 PPM from an (h, w, 3) uint8 RGB array. A comment line
    sits between the magic and the dimensions so decoders exercise the
    real netpbm tokenizer, not a fixed split."""
    h, w, _ = pixels.shape
    header = f"P6\n# {comment}\n{w} {h}\n255\n".encode("ascii")
    return header + pixels.astype(np.uint8).tobytes()


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a P6 header: returns (width, height, maxval, data_offset).
    Real netpbm tokenization — any run of whitespace separates tokens
    and '#' comments run to end-of-line anywhere whitespace may occur."""
    p = payload or b""
    if p[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    i, toks = 2, []
    while len(toks) < 3:
        if i >= len(p):
            raise ValueError("truncated PPM header")
        c = p[i : i + 1]
        if c == b"#":
            while i < len(p) and p[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(p) and not p[j : j + 1].isspace() and p[j : j + 1] != b"#":
                j += 1
            toks.append(int(p[i:j]))
            i = j
    # exactly ONE whitespace byte separates maxval from the raster
    return toks[0], toks[1], toks[2], i + 1


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode binary P6 → (width, height, (h, w, 3) uint8 RGB)."""
    w, h, maxval, off = _ppm_header(payload)
    if maxval != 255:
        raise NotImplementedError("16-bit PPM rasters not supported")
    need = w * h * 3
    data = (payload or b"")[off : off + need]
    if len(data) < need:
        raise ValueError("truncated PPM raster")
    return w, h, np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def ppm_stored_pixel_bytes(payload: bytes) -> bytes:
    w, h, _, off = _ppm_header(payload)
    return (payload or b"")[off : off + w * h * 3]

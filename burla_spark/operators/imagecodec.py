"""Minimal pure-stdlib image codec for the multimodal operators.

The container ships no imaging libraries, but "stub everything" would
leave the decode path untestable with real bytes. This module gives the
multimodal operators an honest, dependency-free codec tier:

* :func:`image_dims` — header-parse width/height for real PNG / BMP /
  GIF / JPEG payloads (byte-level format parsing, no decompression
  needed except none at all).
* :func:`decode_rgb` / :func:`encode_png` / :func:`encode_bmp` — true
  pixel decode/encode for 8-bit RGB PNG (all five scanline filters)
  and uncompressed 24-bit BMP, via stdlib ``zlib``/``struct`` only.
* :func:`resize_nearest` — nearest-neighbour resample.

Scope is deliberately small: non-interlaced 8-bit RGB(A) PNG and
bottom-up 24-bit BMP — enough to run the decode → feature → resize
pipeline on real image bytes end-to-end. When PIL is installed
(runtime-detected in ``multimodal.py``) it takes over for every other
format; when neither applies, the operators keep their deterministic
fake so pipelines still run.
"""

from __future__ import annotations

import struct
import zlib

try:
    import numpy as np
except ImportError:  # pragma: no cover — numpy is baked into this env
    np = None  # type: ignore

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# header-only dimension sniffing (any real payload of these formats)
# ---------------------------------------------------------------------------
def image_dims(payload: bytes) -> tuple[int, int] | None:
    """(width, height) parsed from real image headers; None if the
    payload is not a recognized format."""
    if payload.startswith(PNG_MAGIC) and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h)
    if payload.startswith(b"BM") and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return int(w), abs(int(h))
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return int(w), int(h)
    if payload.startswith(b"\xff\xd8"):
        return _jpeg_dims(payload)
    return None


def _jpeg_dims(payload: bytes) -> tuple[int, int] | None:
    """Scan JPEG markers for the SOF segment carrying the frame size."""
    i = 2
    n = len(payload)
    while i + 9 < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        # SOF0..SOF15 except DHT(0xC4)/JPG(0xC8)/DAC(0xCC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 <= n:
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return int(w), int(h)
            return None
        i += 2 + seg_len
    return None


# ---------------------------------------------------------------------------
# PNG encode/decode (8-bit RGB/RGBA, non-interlaced)
# ---------------------------------------------------------------------------
def encode_png(arr: "np.ndarray") -> bytes:
    """uint8 H×W×3 array → real PNG bytes (filter 0 scanlines)."""
    h, w, ch = arr.shape
    assert ch == 3, "encode_png expects RGB"
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, w: int, h: int, bpp: int) -> "np.ndarray":
    """Reverse PNG scanline filters (types 0-4) → H×(W·bpp) uint8."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + (a + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        out[y] = line
    return out


def _decode_png_rgb(payload: bytes) -> "np.ndarray | None":
    """Real PNG → H×W×3 uint8 for non-interlaced 8-bit RGB/RGBA."""
    if not payload.startswith(PNG_MAGIC):
        return None
    pos = 8
    w = h = None
    color_type = bit_depth = interlace = None
    idat = b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or bit_depth != 8 or color_type not in (2, 6) or interlace:
        return None
    bpp = 3 if color_type == 2 else 4
    raw = zlib.decompress(idat)
    px = _png_unfilter(raw, w, h, bpp).reshape(h, w, bpp)
    return px[:, :, :3].copy()


# ---------------------------------------------------------------------------
# BMP encode/decode (uncompressed 24-bit)
# ---------------------------------------------------------------------------
def encode_bmp(arr: "np.ndarray") -> bytes:
    """uint8 H×W×3 RGB array → real bottom-up 24-bit BMP bytes."""
    h, w, ch = arr.shape
    assert ch == 3
    row_pad = (4 - (w * 3) % 4) % 4
    body = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y][:, ::-1].tobytes()  # RGB → BGR
        body += row + b"\x00" * row_pad
    header_size = 14 + 40
    file_size = header_size + len(body)
    return (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


def _decode_bmp_rgb(payload: bytes) -> "np.ndarray | None":
    """Real BMP → H×W×3 uint8 for uncompressed 24-bit payloads."""
    if not payload.startswith(b"BM") or len(payload) < 54:
        return None
    (data_off,) = struct.unpack("<I", payload[10:14])
    w, h_signed = struct.unpack("<ii", payload[18:26])
    bpp, compression = struct.unpack("<HI", payload[28:34])
    if bpp != 24 or compression != 0:
        return None
    h = abs(h_signed)
    row_pad = (4 - (w * 3) % 4) % 4
    stride = w * 3 + row_pad
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for i in range(h):
        off = data_off + i * stride
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=off)
        y = h - 1 - i if h_signed > 0 else i  # bottom-up unless negative height
        px[y] = row.reshape(w, 3)[:, ::-1]  # BGR → RGB
    return px


def decode_rgb(payload: bytes) -> "np.ndarray | None":
    """Real pixel decode (PNG or BMP within the supported profiles);
    None when the payload needs a full codec library."""
    if np is None:  # pragma: no cover
        return None
    try:
        if payload.startswith(PNG_MAGIC):
            return _decode_png_rgb(payload)
        if payload.startswith(b"BM"):
            return _decode_bmp_rgb(payload)
    except Exception:  # noqa: BLE001 — corrupt payloads fall to the stub tier
        return None
    return None


def resize_nearest(arr: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Nearest-neighbour resample H×W×3 → height×width×3."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs]

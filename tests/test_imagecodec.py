"""Value tests for the pure-stdlib image codec tier: real PNG/BMP/GIF/
JPEG bytes through dimension parsing, true pixel decode, resize, and
the Spark multimodal operators end-to-end."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from burla_spark.operators import imagecodec as ic
from burla_spark.operators import multimodal as mm


def checker(h, w):
    """Deterministic H×W×3 test image: red/green checkerboard with a
    blue-gradient column so every pixel is unique enough to catch
    row/column swaps and BGR confusion."""
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            px[y, x] = (255, 0, y * 16 % 256) if (x + y) % 2 == 0 else (0, 255, x * 16 % 256)
    return px


def test_png_roundtrip_exact():
    px = checker(5, 7)
    payload = ic.encode_png(px)
    assert payload.startswith(ic.PNG_MAGIC)
    assert ic.image_dims(payload) == (7, 5)
    back = ic.decode_rgb(payload)
    assert back is not None and np.array_equal(back, px)


def test_bmp_roundtrip_exact():
    px = checker(4, 6)
    payload = ic.encode_bmp(px)
    assert payload.startswith(b"BM")
    assert ic.image_dims(payload) == (6, 4)
    back = ic.decode_rgb(payload)
    assert back is not None and np.array_equal(back, px)


def _png_with_filters(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Build a real PNG whose scanlines use the given filter types
    (forward-filtered here, so decode must correctly reverse them)."""
    h, w, _ = px.shape
    assert len(ftypes) == h
    bpp = 3
    raw = b""
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int32)
        ft = ftypes[y]
        out = line.copy()
        for x in range(w * bpp):
            a = int(line[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 1:
                out[x] = (line[x] - a) % 256
            elif ft == 2:
                out[x] = (line[x] - b) % 256
            elif ft == 3:
                out[x] = (line[x] - (a + b) // 2) % 256
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = (line[x] - pred) % 256
        raw += bytes([ft]) + out.astype(np.uint8).tobytes()
        prev = line.astype(np.uint8)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        ic.PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[1, 2, 3, 4], [4, 4, 4, 4], [0, 1, 2, 3]])
def test_png_all_scanline_filters_decode(ftypes):
    px = checker(4, 5)
    payload = _png_with_filters(px, ftypes)
    back = ic.decode_rgb(payload)
    assert back is not None and np.array_equal(back, px)


def test_gif_and_jpeg_header_dims():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    assert ic.image_dims(gif) == (320, 200)
    # minimal JPEG: SOI + APP0 + SOF0 declaring 640×480
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 9
    assert ic.image_dims(b"\xff\xd8" + app0 + sof0) == (640, 480)


def test_resize_nearest_values():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[0, 0] = (255, 0, 0)
    px[0, 1] = (0, 255, 0)
    px[1, 0] = (0, 0, 255)
    px[1, 1] = (255, 255, 0)
    big = ic.resize_nearest(px, 4, 4)
    assert big.shape == (4, 4, 3)
    # each source pixel becomes a 2×2 block
    assert np.array_equal(big[:2, :2], np.broadcast_to(px[0, 0], (2, 2, 3)))
    assert np.array_equal(big[2:, 2:], np.broadcast_to(px[1, 1], (2, 2, 3)))


def test_extract_features_real_png_dims(spark):
    px = checker(9, 13)
    rows = [(1, ic.encode_png(px)), (2, ic.encode_bmp(checker(3, 4)))]
    df = spark.createDataFrame(rows, "blob_id long, payload binary")
    got = {r.blob_id: (r.width, r.height) for r in mm.extract_features(df).collect()}
    assert got == {1: (13, 9), 2: (4, 3)}


def test_decode_and_resize_real_pixels(spark):
    px = checker(8, 8)
    df = spark.createDataFrame([(1, ic.encode_png(px))], "blob_id long, payload binary")
    out = mm.decode_and_resize(df, 4, 4).collect()[0]
    assert (out.out_w, out.out_h) == (4, 4)
    resized = ic.decode_rgb(bytes(out.resized))
    assert resized is not None and resized.shape == (4, 4, 3)
    assert np.array_equal(resized, ic.resize_nearest(px, 4, 4))


def test_unrecognized_payload_falls_back_deterministically(spark):
    payload = b"\x07\x03not-an-image" * 10
    df = spark.createDataFrame([(1, payload)], "blob_id long, payload binary")
    r = mm.extract_features(df).collect()[0]
    assert (r.width, r.height) == (16 + 7 % 64, 16 + 3 % 64)


# ---------------------------------------------------------------------------
# perceptual near-dup (round 13): dHash bands + banded Hamming join
# ---------------------------------------------------------------------------
def _png(seed: int, flip: bool = False) -> bytes:
    import numpy as np

    from burla_spark.operators import imagecodec as ic

    px = np.fromfunction(
        lambda y, x, c: (x * 31 + y * 17 + c * 7 + seed) % 256, (16, 18, 3)
    ).astype(np.int64)
    if flip:
        px[0, 2, :] += 128  # one source pixel → ≤2 dHash bits
    return ic.encode_png((px % 256).astype(np.uint8))


def test_dhash_identical_images_hamming_zero(spark):
    df = spark.createDataFrame(
        [(1, _png(5)), (2, _png(5)), (3, _png(200))],
        "doc_id long, payload binary",
    )
    sigs = mm.image_dhash_bands(df)
    rows = {r.doc_id: r.bands for r in sigs.collect()}
    assert rows[1] == rows[2] != rows[3]
    assert all(len(b) == 4 and all(0 <= v < 65536 for v in b) for b in rows.values())
    pairs = mm.hamming_neardup_pairs(sigs, max_hamming=3).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert got.get((1, 2)) == 0


def test_dhash_perturbed_variant_is_neardup(spark):
    df = spark.createDataFrame(
        [(1, _png(9)), (2, _png(9, flip=True))], "doc_id long, payload binary"
    )
    pairs = mm.hamming_neardup_pairs(mm.image_dhash_bands(df), max_hamming=3).collect()
    assert len(pairs) == 1 and 0 <= pairs[0].hamming <= 2


def test_dhash_undecodable_payload_dropped(spark):
    df = spark.createDataFrame(
        [(1, b"junk-bytes"), (2, _png(3)), (3, None)],
        "doc_id long, payload binary",
    )
    sigs = mm.image_dhash_bands(df)
    assert sigs.filter("bands IS NOT NULL").count() == 1
    assert mm.hamming_neardup_pairs(sigs).count() == 0


def test_hamming_band_join_pigeonhole_complete(spark):
    # 3 flipped bits spread over 3 DIFFERENT bands: the 4th band is
    # untouched, so the banded candidate rule must still pair them.
    a = [0b1010, 0b1100, 0b0011, 0b0101]
    b = [a[0] ^ 1, a[1] ^ 2, a[2] ^ 4, a[3]]
    sigs = spark.createDataFrame([(1, a), (2, b)], "doc_id long, bands array<int>")
    pairs = mm.hamming_neardup_pairs(sigs, max_hamming=3).collect()
    assert len(pairs) == 1 and pairs[0].hamming == 3


def test_hamming_band_join_max_bucket_cap(spark):
    # ids 1..9 all share band values entirely; with a bucket cap of 4
    # every band bucket (size 9) is dropped → no candidates at all.
    rows = [(i, [7, 8, 9, 10]) for i in range(1, 10)]
    sigs = spark.createDataFrame(rows, "doc_id long, bands array<int>")
    assert mm.hamming_neardup_pairs(sigs, max_hamming=3).count() == 36
    assert mm.hamming_neardup_pairs(sigs, max_hamming=3, max_bucket=4).count() == 0


def _pcm(seed: int, dc_window: int | None = None) -> bytes:
    import numpy as np

    i = np.arange(256 * 65, dtype=np.int64)
    s = (i * 7 + seed * 13) % 251 - 125
    if dc_window is not None:
        s = s.copy()
        s[dc_window * 256 : (dc_window + 1) * 256] += 50
    return s.astype("<i2").tobytes()


def test_audio_fingerprint_identical_and_shifted(spark):
    df = spark.createDataFrame(
        [(1, _pcm(9)), (2, _pcm(9)), (3, _pcm(9, dc_window=2)), (4, _pcm(77))],
        "doc_id long, pcm binary",
    )
    sigs = mm.audio_energy_fingerprint(df)
    rows = {r.doc_id: r.bands for r in sigs.collect()}
    assert rows[1] == rows[2]
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.hamming_neardup_pairs(sigs, max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) in pairs and 1 <= pairs[(1, 3)] <= 2  # one window shifted


def test_audio_fingerprint_short_or_null_dropped(spark):
    df = spark.createDataFrame(
        [(1, b"\x01\x02" * 100), (2, None), (3, _pcm(5))],
        "doc_id long, pcm binary",
    )
    sigs = mm.audio_energy_fingerprint(df)
    assert sigs.filter("bands IS NOT NULL").count() == 1


def _clip(seed: int, bright_frame: int | None = None) -> bytes:
    import numpy as np

    f = np.arange(65, dtype=np.int64)[:, None]
    i = np.arange(256, dtype=np.int64)[None, :]
    p = ((i % 16) * 3 + (i // 16) * 5 + f * 11 + seed) % 256
    if bright_frame is not None:
        p = p.copy()
        p[bright_frame] = (p[bright_frame] + 30) % 256
    return p.astype(np.uint8).tobytes()


def test_video_fingerprint_identical_and_brightened(spark):
    df = spark.createDataFrame(
        [(1, _clip(4)), (2, _clip(4)), (3, _clip(4, bright_frame=6)), (4, _clip(200))],
        "doc_id long, frames binary",
    )
    sigs = mm.video_temporal_fingerprint(df)
    rows = {r.doc_id: r.bands for r in sigs.collect()}
    assert rows[1] == rows[2]
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.hamming_neardup_pairs(sigs, max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) in pairs and 1 <= pairs[(1, 3)] <= 2


def test_video_fingerprint_short_or_null_dropped(spark):
    df = spark.createDataFrame(
        [(1, b"\x00" * 100), (2, None), (3, _clip(9))],
        "doc_id long, frames binary",
    )
    assert mm.video_temporal_fingerprint(df).filter("bands IS NOT NULL").count() == 1

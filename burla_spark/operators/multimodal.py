"""Multimodal column operators (SURVEY.md §2.C): images/audio/video as
opaque ``binary`` payloads + typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

This mirrors the reference's pattern of shipping media through the
shared bucket and decoding inside worker UDFs (``blobstore.py:1-13``,
``worker_client.py:477,492``) — but as first-class DataFrame columns:

    blob_df = attach_blob(df, payload_col, content_type)
    feats   = extract_features(blob_df)         # mapInPandas, batched
    thumbs  = decode_and_resize(blob_df, 64, 64)

The Spark-side plumbing (schemas, batch iteration, partition sizing,
init-once-per-partition decoding) is real and tested. The codec is
three-tier, chosen at runtime per payload:

1. PIL, when installed (runtime-detected once per worker) — any format;
2. the pure-stdlib codec in :mod:`burla_spark.operators.imagecodec` —
   real header parsing for PNG/BMP/GIF/JPEG and true pixel
   decode/resize for 8-bit RGB PNG and 24-bit BMP (value-tested with
   real generated image bytes);
3. a deterministic fake for unrecognized payloads, so pipelines built
   on synthetic fixtures still run end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_META_SCHEMA = (
    "content_type string, n_bytes long, sha string"
)

FEATURE_DIM = 16


def attach_blob_metadata(df: DataFrame, payload_col: str, content_type: str) -> DataFrame:
    """Add the typed metadata struct every multimodal column carries:
    (content_type, n_bytes, sha256). Pure JVM projection."""
    p = F.col(payload_col)
    return df.withColumn(
        "blob_meta",
        F.struct(
            F.lit(content_type).alias("content_type"),
            F.length(p).cast("long").alias("n_bytes"),
            F.sha2(p, 256).alias("sha"),
        ),
    )


def _pil():
    """Runtime-detect PIL once per process; None when not installed."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic byte-derived dimensions for non-image payloads —
    the contract the driver oracle replays (16 + byte % 64)."""
    h = payload[:8].ljust(8, b"\0")
    return 16 + h[0] % 64, 16 + h[1] % 64


def _decode_image(payload: bytes) -> tuple[int, int]:
    """Decode → (width, height): PIL when installed, else real header
    parsing for PNG/BMP/GIF/JPEG (imagecodec), else a deterministic
    fake derived from the payload bytes."""
    Image = _pil()
    if Image is not None:
        try:
            import io

            img = Image.open(io.BytesIO(payload))
            return img.width, img.height
        except Exception:  # noqa: BLE001 — fall to the stdlib tier
            pass
    from burla_spark.operators.imagecodec import image_dims

    dims = image_dims(payload)
    if dims is not None:
        return dims
    return _fake_dims(payload)


def _byte_histogram(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature vector: normalized byte histogram
    (real pipelines put a CNN/CLIP embedding here)."""
    counts = [0] * dim
    for b in payload:
        counts[b % dim] += 1
    n = max(len(payload), 1)
    return [c / n for c in counts]


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction: iterator pattern so any model
    load happens once per partition; Arrow batches bound memory.

    Content-type routing (ADVICE r10): when the frame carries the
    ``blob_meta`` struct, ``text/*`` payloads take the deterministic
    byte-derived dims DIRECTLY — a text document that happens to start
    with an image magic prefix ('BM', 'GIF87a'; both are plain ASCII
    and legal text) must not be header-parsed as an image, which would
    diverge from the byte-true oracle. Image decoding runs only for
    payloads declared (or undeclared) as non-text."""
    out_schema = f"{', '.join(f'{c} {t}' for c, t in df.dtypes)}, width long, height long, features array<double>"
    has_meta = "blob_meta" in df.columns

    def _dims(payload: bytes, ctype: str | None) -> tuple[int, int]:
        if ctype is not None and ctype.startswith("text/"):
            return _fake_dims(payload)
        return _decode_image(payload)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # init-once-per-partition hook (model load would go here).
        for batch in batches:
            # NULL payloads decode as empty blobs — never crash a batch
            payloads = [b"" if p is None else bytes(p) for p in batch[payload_col]]
            if has_meta:
                ctypes = [
                    (m or {}).get("content_type") for m in batch["blob_meta"]
                ]
            else:
                ctypes = [None] * len(payloads)
            dims = [_dims(p, c) for p, c in zip(payloads, ctypes)]
            batch = batch.copy()
            batch["width"] = [d[0] for d in dims]
            batch["height"] = [d[1] for d in dims]
            batch["features"] = [_byte_histogram(p) for p in payloads]
            yield batch

    return df.mapInPandas(run, out_schema)


def _resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """One payload → resized-image bytes via the best available tier:
    PIL (any format) → stdlib codec (RGB PNG / 24-bit BMP, true
    nearest-neighbour resample, re-encoded as PNG) → deterministic
    size-bounded fake."""
    Image = _pil()
    if Image is not None:
        try:
            import io

            img = Image.open(io.BytesIO(payload)).resize((width, height))
            out = io.BytesIO()
            img.save(out, format="PNG")
            return out.getvalue()
        except Exception:  # noqa: BLE001 — fall to the stdlib tier
            pass
    from burla_spark.operators import imagecodec as ic

    px = ic.decode_rgb(payload)
    if px is not None:
        return ic.encode_png(ic.resize_nearest(px, width, height))
    return payload[: width * height // 8]


def decode_and_resize(
    df: DataFrame, width: int, height: int, payload_col: str = "payload"
) -> DataFrame:
    """Resize stage: decode → nearest-neighbour resample → re-encode,
    per Arrow batch. Real pixels for PIL-supported or PNG/BMP payloads
    (tier docs in the module docstring); deterministic fake otherwise."""
    out_schema = f"{', '.join(f'{c} {t}' for c, t in df.dtypes)}, resized binary, out_w long, out_h long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            batch = batch.copy()
            batch["resized"] = [
                _resize_payload(b"" if p is None else bytes(p), width, height)
                for p in batch[payload_col]
            ]
            batch["out_w"] = width
            batch["out_h"] = height
            yield batch

    return df.mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 1024, payload_col: str = "payload"
) -> DataFrame:
    """Frame-sampling stage shape (video → N frame rows): a 1→N
    mapInPandas expansion. Fake frames = fixed-stride byte slices."""
    id_cols = [c for c, _ in df.dtypes if c != payload_col]
    out_schema = (
        f"{', '.join(f'{c} {t}' for c, t in df.dtypes if c != payload_col)}, "
        "frame_no long, frame binary"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = {c: [] for c in id_cols}
            frame_no, frames = [], []
            for _, row in batch.iterrows():
                raw = row[payload_col]
                payload = b"" if raw is None else bytes(raw)
                n = max(1, len(payload) // every_n_bytes)
                for i in range(n):
                    for c in id_cols:
                        rows[c].append(row[c])
                    frame_no.append(i)
                    frames.append(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
            out = pd.DataFrame(rows)
            out["frame_no"] = frame_no
            out["frame"] = frames
            yield out

    return df.mapInPandas(run, out_schema)

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
``media_type`` and metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages. Header-level
metadata (width/height/sample_rate/channels) is REAL for BMP, PNG, GIF,
the netpbm family, and RIFF/WAV via ``parse_media_header`` — a pure-Python
fixed-layout parse needing no libraries, oracle-verified on synthesized
payloads (``synth_media``). Full-frame pixel decode is REAL for the
uncompressed raster formats (24-bit BI_RGB BMP and binary P6 PPM —
``decode_pixels``: padding- and channel-order-aware stats over the actual
pixel array, arithmetic-oracle-verified). Only COMPRESSED codecs
(PNG/GIF/JPEG frames, audio sample decode) remain stubbed (no image/audio
libraries ship in this sandbox — see ``_decode_image``); the Spark-side
plumbing is real and tested: schema, partitioning, UDF signature, bounded
batch shape.

At 100 TB the binary column dominates I/O: keep it in its own parquet column
(column pruning skips it unless a stage needs bytes), partition by content
bucket, and cap Arrow batch sizes (session.py) so a batch of blobs fits in
the Python worker.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, FloatType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),     # image/png, audio/wav, …
    StructField("payload", BinaryType()),
    StructField("meta_width", LongType()),
    StructField("meta_height", LongType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("byte_len", LongType()),
    StructField("payload_hash", StringType()),
    StructField("feature", ArrayType(FloatType())),
    # real header fields (pure-Python parse, NULL when unparseable)
    StructField("header_fmt", StringType()),
    StructField("header_width", LongType()),
    StructField("header_height", LongType()),
    StructField("sample_rate", LongType()),
    StructField("channels", LongType()),
    # real full-frame pixel stats for UNCOMPRESSED formats (24-bit BI_RGB
    # BMP, binary P6 PPM) — pure-Python/numpy decode of the actual pixel
    # array, padding-aware; NULL for compressed codecs (the remaining
    # declared stub) and non-images
    StructField("pix_pixels", LongType()),
    StructField("pix_mean_r", DoubleType()),
    StructField("pix_mean_g", DoubleType()),
    StructField("pix_mean_b", DoubleType()),
])

_HAVE_PIL = False
try:  # pragma: no cover - not present in sandbox
    import PIL  # type: ignore  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    pass


def _decode_image(payload: bytes):
    """Decode for COMPRESSED codecs (PNG/GIF/JPEG frames) requires an
    image library, not available in this sandbox — that is the one
    remaining declared stub. Uncompressed formats (24-bit BI_RGB BMP,
    binary P6 PPM) do NOT hit this path: ``decode_pixels`` below reads
    their pixel arrays directly."""
    if _HAVE_PIL:  # pragma: no cover
        import io

        from PIL import Image  # type: ignore
        return Image.open(io.BytesIO(payload))
    raise NotImplementedError(
        "compressed-image decode requires PIL/opencv — not available in "
        "this sandbox; uncompressed BMP/PPM decode is real (decode_pixels)")


def decode_pixels(raw: bytes) -> dict | None:
    """REAL full-frame pixel decode for the uncompressed raster formats —
    no libraries, just layout arithmetic over the actual pixel bytes:

    - 24-bit uncompressed BMP (BITMAPINFOHEADER, biCompression=BI_RGB):
      pixel array at the offset from the file header, rows stored
      bottom-up (or top-down when biHeight<0 — irrelevant for channel
      stats), each row 3*width bytes zero-PADDED to a 4-byte boundary,
      samples in B,G,R order. A decoder that sums padding bytes as pixels
      or swaps the channel order produces wrong means — both are asserted
      against arithmetic oracles on synthesized payloads.
    - binary PPM (P6, maxval<=255): header tokens (width height maxval,
      '#' comments allowed), ONE whitespace byte, then width*height RGB
      triplets, no padding.

    Returns {n_pixels, mean_r, mean_g, mean_b} (means rounded to 6
    decimals) or None when the payload is not one of these layouts
    (compressed codecs stay with the declared ``_decode_image`` stub)."""
    try:
        import numpy as np
        if raw[:2] == b"BM" and len(raw) >= 54:
            off = int.from_bytes(raw[10:14], "little")
            w = int.from_bytes(raw[18:22], "little", signed=True)
            h = abs(int.from_bytes(raw[22:26], "little", signed=True))
            bpp = int.from_bytes(raw[28:30], "little")
            comp = int.from_bytes(raw[30:34], "little")
            if bpp != 24 or comp != 0 or w <= 0 or h <= 0:
                return None
            stride = (3 * w + 3) // 4 * 4
            if off + stride * h > len(raw):
                return None
            rows = np.frombuffer(
                raw, dtype=np.uint8, count=stride * h, offset=off
            ).reshape(h, stride)[:, :3 * w]       # drop the padding bytes
            px = rows.reshape(-1, 3).astype(np.int64)
            s = px.sum(axis=0)
            n = w * h
            return {"n_pixels": n,                 # BMP stores B,G,R
                    "mean_r": round(float(s[2]) / n, 6),
                    "mean_g": round(float(s[1]) / n, 6),
                    "mean_b": round(float(s[0]) / n, 6)}
        if raw[:2] == b"P6":
            toks, i, n_raw = [], 2, len(raw)
            while i < n_raw and len(toks) < 3:
                c = raw[i:i + 1]
                if c == b"#":
                    j = raw.find(b"\n", i)
                    i = n_raw if j < 0 else j + 1
                elif c.isspace():
                    i += 1
                else:
                    j = i
                    while j < n_raw and not raw[j:j + 1].isspace():
                        j += 1
                    toks.append(raw[i:j])
                    i = j
            if len(toks) < 3:
                return None
            w, h, maxval = int(toks[0]), int(toks[1]), int(toks[2])
            i += 1                                  # single ws after maxval
            if maxval > 255 or w <= 0 or h <= 0 or i + 3 * w * h > n_raw:
                return None
            px = np.frombuffer(raw, dtype=np.uint8, count=3 * w * h,
                               offset=i).reshape(-1, 3).astype(np.int64)
            s = px.sum(axis=0)
            n = w * h
            return {"n_pixels": n,                  # PPM stores R,G,B
                    "mean_r": round(float(s[0]) / n, 6),
                    "mean_g": round(float(s[1]) / n, 6),
                    "mean_b": round(float(s[2]) / n, 6)}
    except Exception:
        # truncated/corrupt pixel arrays: stats stay NULL, never raise
        return None
    return None


def parse_media_header(raw: bytes) -> dict:
    """REAL media metadata from a pure-Python header parse — no image/audio
    libraries needed for the container formats whose headers are fixed-layout
    (BMP, PNG IHDR, GIF, binary/ASCII PPM-family, RIFF/WAV). Formats beyond
    these (JPEG entropy-coded scans, MP4 atoms, …) still return all-NULL and
    ride the byte-feature fallback; that remaining decode surface is the
    declared sandbox stub (``_decode_image``). Returns
    {fmt, width, height, sample_rate, channels} with None for unknown."""
    out = {"fmt": None, "width": None, "height": None,
           "sample_rate": None, "channels": None}
    try:
        if raw[:2] == b"BM" and len(raw) >= 26:
            # BITMAPINFOHEADER: biWidth/biHeight int32 LE at offsets 18/22
            # (negative height = top-down DIB; magnitude is the pixel height)
            out["fmt"] = "bmp"
            out["width"] = int.from_bytes(raw[18:22], "little", signed=True)
            out["height"] = abs(
                int.from_bytes(raw[22:26], "little", signed=True))
        elif (raw[:8] == b"\x89PNG\r\n\x1a\n" and len(raw) >= 24
              and raw[12:16] == b"IHDR"):
            out["fmt"] = "png"
            out["width"] = int.from_bytes(raw[16:20], "big")
            out["height"] = int.from_bytes(raw[20:24], "big")
        elif raw[:6] in (b"GIF87a", b"GIF89a") and len(raw) >= 10:
            # logical screen descriptor: u16 LE width/height at 6/8
            out["fmt"] = "gif"
            out["width"] = int.from_bytes(raw[6:8], "little")
            out["height"] = int.from_bytes(raw[8:10], "little")
        elif raw[:1] == b"P" and raw[1:2] in b"123456" and len(raw) > 2:
            # netpbm (PBM/PGM/PPM, ASCII + binary): whitespace-separated
            # tokens after the magic, '#' comments to end-of-line
            toks, i, n = [], 2, len(raw)
            while i < n and len(toks) < 2:
                c = raw[i:i + 1]
                if c == b"#":
                    j = raw.find(b"\n", i)
                    i = n if j < 0 else j + 1
                elif c.isspace():
                    i += 1
                else:
                    j = i
                    while j < n and not raw[j:j + 1].isspace():
                        j += 1
                    toks.append(raw[i:j])
                    i = j
            if len(toks) == 2:
                out["fmt"] = "ppm"
                out["width"] = int(toks[0])
                out["height"] = int(toks[1])
        elif raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
            i = 12                       # walk RIFF chunks to 'fmt '
            while i + 8 <= len(raw):
                cid = raw[i:i + 4]
                sz = int.from_bytes(raw[i + 4:i + 8], "little")
                if cid == b"fmt " and i + 16 <= len(raw):
                    out["fmt"] = "wav"
                    out["channels"] = int.from_bytes(
                        raw[i + 10:i + 12], "little")
                    out["sample_rate"] = int.from_bytes(
                        raw[i + 12:i + 16], "little")
                    break
                i += 8 + sz + (sz & 1)   # chunks are word-aligned
    except Exception:
        # corrupt/truncated headers: metadata stays NULL, never raises —
        # one bad payload must not kill the mapInPandas stage
        return {"fmt": None, "width": None, "height": None,
                "sample_rate": None, "channels": None}
    return out


def make_bmp(width: int, height: int,
             pix: tuple[int, int, int] | None = None) -> bytes:
    """Valid 24-bit BI_RGB BMP — deterministic test/bench payload. With
    ``pix=(r,g,b)`` the real pixel array is emitted (rows bottom-up,
    B,G,R samples, rows zero-padded to 4-byte boundaries) so the mean of
    every channel is exactly the constant — an arithmetic oracle that
    fails if a decoder misreads padding or channel order. ``pix=None``
    keeps the historical header-only 54-byte payload."""
    ihdr = (b"\x28\x00\x00\x00"
            + int(width).to_bytes(4, "little", signed=True)
            + int(height).to_bytes(4, "little", signed=True)
            + b"\x01\x00\x18\x00" + b"\x00" * 24)
    body = b""
    if pix is not None:
        r, g, b = pix
        row = bytes((b, g, r)) * width
        row += b"\x00" * ((3 * width + 3) // 4 * 4 - 3 * width)
        body = row * height
    total = 54 + len(body)
    return (b"BM" + total.to_bytes(4, "little") + b"\x00" * 4
            + (54).to_bytes(4, "little") + ihdr + body)


def make_gif(width: int, height: int) -> bytes:
    return (b"GIF89a" + int(width).to_bytes(2, "little")
            + int(height).to_bytes(2, "little") + b"\x00\x00\x00\x3b")


def make_wav(sample_rate: int, channels: int,
             bits: int = 16, n_samples: int = 0) -> bytes:
    byte_rate = sample_rate * channels * bits // 8
    block = channels * bits // 8
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little")
           + int(channels).to_bytes(2, "little")
           + int(sample_rate).to_bytes(4, "little")
           + byte_rate.to_bytes(4, "little")
           + block.to_bytes(2, "little") + int(bits).to_bytes(2, "little"))
    data = b"data" + (n_samples * block).to_bytes(4, "little") \
        + b"\x00" * (n_samples * block)
    body = b"WAVE" + fmt + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def make_ppm(width: int, height: int,
             pix: tuple[int, int, int] | None = None) -> bytes:
    """Binary P6 PPM; with ``pix=(r,g,b)`` the width*height RGB triplets
    follow the header (no padding — PPM is packed), None keeps the
    historical header-only payload."""
    head = f"P6\n# synthetic\n{width} {height}\n255\n".encode()
    if pix is None:
        return head
    return head + bytes(pix) * (width * height)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: byte-histogram moments. Replaces the
    model-based embedding while keeping shapes/types/partitioning real."""
    if not payload:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = len(payload)
    return [round(a / n, 6) for a in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow batches).
    Tries real decode, falls back to the deterministic byte-level feature."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            feats, hashes, lens = [], [], []
            fmts, widths, heights, rates, chans = [], [], [], [], []
            npx, mr, mg, mb = [], [], [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                raw = bytes(payload) if payload is not None else b""
                lens.append(len(raw))
                hashes.append(hashlib.md5(raw).hexdigest())
                # REAL metadata where the container header allows a pure-
                # Python parse (BMP/PNG/GIF/PPM/WAV); NULLs otherwise
                hdr = parse_media_header(raw)
                fmts.append(hdr["fmt"])
                widths.append(hdr["width"])
                heights.append(hdr["height"])
                rates.append(hdr["sample_rate"])
                chans.append(hdr["channels"])
                # REAL full-frame decode for the uncompressed raster
                # formats; compressed codecs try the library path (the
                # declared sandbox stub) and fall back to the byte-level
                # fake — one bad payload must never kill the whole
                # mapInPandas stage
                px = None
                if hdr["fmt"] in ("bmp", "ppm"):
                    px = decode_pixels(raw)
                elif isinstance(mtype, str) and mtype.startswith("image/"):
                    try:
                        _decode_image(raw)
                    except Exception:
                        pass
                npx.append(px["n_pixels"] if px else None)
                mr.append(px["mean_r"] if px else None)
                mg.append(px["mean_g"] if px else None)
                mb.append(px["mean_b"] if px else None)
                feats.append(_fake_feature(raw, dim))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "byte_len": lens,
                "payload_hash": hashes,
                "feature": feats,
                "header_fmt": fmts,
                "header_width": pd.array(widths, dtype="Int64"),
                "header_height": pd.array(heights, dtype="Int64"),
                "sample_rate": pd.array(rates, dtype="Int64"),
                "channels": pd.array(chans, dtype="Int64"),
                "pix_pixels": pd.array(npx, dtype="Int64"),
                "pix_mean_r": pd.array(mr, dtype="Float64"),
                "pix_mean_g": pd.array(mg, dtype="Float64"),
                "pix_mean_b": pd.array(mb, dtype="Float64"),
            })

    return media.mapInPandas(run, FEATURE_SCHEMA)


def synth_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL media payloads per doc_id (BMP / GIF / WAV /
    PPM round-robin) whose header fields are pure functions of the id —
    so an oracle can assert the parsed metadata with arithmetic alone,
    proving the header parser actually read the bytes."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "media_type": [], "payload": [],
                    "meta_width": [], "meta_height": []}
            for did in pdf[id_col]:
                did = int(did)
                w, h = did % 97 + 1, did % 53 + 1
                kind = did % 4
                # constant-fill pixel channels, distinct per channel so a
                # swapped-channel or padding-counting decode fails the
                # arithmetic oracle (mean_r == did%251 exactly, etc.)
                pix = (did % 251, 7 * did % 251, 13 * did % 251)
                if kind == 0:
                    mt, payload = "image/bmp", make_bmp(w, h, pix=pix)
                elif kind == 1:
                    mt, payload = "image/gif", make_gif(w, h)
                elif kind == 2:
                    rate = 8000 + (did % 8) * 1000
                    mt, payload = "audio/wav", make_wav(rate, did % 2 + 1)
                else:
                    mt, payload = "image/x-portable-pixmap", \
                        make_ppm(w, h, pix=pix)
                rows["media_id"].append(did)
                rows["media_type"].append(mt)
                rows["payload"].append(payload)
                rows["meta_width"].append(None)
                rows["meta_height"].append(None)
            out = pd.DataFrame(rows)
            out["meta_width"] = pd.array(out["meta_width"], dtype="Int64")
            out["meta_height"] = pd.array(out["meta_height"], dtype="Int64")
            yield out

    return docs.select(id_col).mapInPandas(build, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one row per requested frame index with
    deterministic offsets; the actual frame decode is the stubbed step. This
    keeps the row-explosion topology (1 video → many frames) real."""
    n_frames = (F.coalesce(F.col("meta_width"), F.lit(0)) / every_n).cast("long")
    return (media
            .filter(F.col("media_type").startswith("video/"))
            # zero planned frames ⇒ zero rows (greatest(n-1, 0) alone would
            # emit a spurious frame 0 for short/metadata-less videos)
            .filter(n_frames > 0)
            .select("media_id",
                    F.explode(F.sequence(F.lit(0), (n_frames - 1).cast("int")))
                    .alias("frame_idx"))
            .withColumn("frame_offset_ms", F.col("frame_idx") * 1000 * every_n))


def docs_as_media(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Reshape the documents table into a media table (text bytes standing in
    for opaque payloads) — used by tests/bench and the driver contract."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, F.lit("image/png"))
         .when(F.col(id_col) % 3 == 1, F.lit("audio/wav"))
         .otherwise(F.lit("video/mp4")).alias("media_type"),
        F.col(text_col).cast("binary").alias("payload"),
        F.length(F.col(text_col)).cast("long").alias("meta_width"),
        F.lit(None).cast("long").alias("meta_height"),
    )

"""Multimodal column plumbing: images/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

Decode modes:

- ``decode_mode="real"`` — actually parses the payload bytes. Supported
  without any codec library (pure numpy, public formats): binary PPM (P6)
  and uncompressed 24/32-bit BI_RGB BMP for images, PCM WAV (8/16-bit) for
  audio. Compressed formats (JPEG/PNG/MP3/MP4) would need codec
  libraries this container lacks; feed them through a real deployment's
  decoder with the same kernel signatures.
- ``decode_mode="stub"`` — a deterministic fake: features derive from the
  md5 of the payload bytes, so tests can assert exact values and the
  pipeline (schema, batch shape, partitioning, UDF signatures) is fully
  exercised even with non-media payload bytes.

At 100 TB the pattern is: binaries live in parquet (or are pointers into a
blob store), ``spark.sql.files.maxPartitionBytes`` bounds task memory, and
each kernel is one Arrow batch → numpy pass with no Python-per-row cost.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_stub",
    "attach_media_real",
    "image_features",
    "frame_sample",
    "audio_duration",
    "decode_ppm",
    "encode_ppm",
    "decode_bmp",
    "encode_bmp",
    "decode_wav",
    "encode_wav",
    "decode_image",
    "gray_grid_features",
]

# one row per asset: payload + typed metadata (schemaless meta bags lose
# Catalyst pruning; typed columns are the scalable form)
MEDIA_SCHEMA = (
    "media_id bigint, payload binary, media_type string, "
    "width int, height int, sample_rate int, n_frames int"
)


def attach_media_stub(docs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic fake media table from any id column (test
    fixture helper: payload bytes = md5 stream of the id)."""
    payload = F.unhex(F.md5(F.col(id_col).cast("string").cast("binary")))
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        (F.col(id_col) % 640 + 32).cast("int").alias("width"),
        (F.col(id_col) % 480 + 32).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.col(id_col) % 300 + 1).cast("int").alias("n_frames"),
    )


def attach_media_real(docs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Derive a media table whose payloads are REAL format bytes, with
    every derived quantity a closed form of the id — so a SQL oracle can
    verify the actual decode arithmetically:

    - image rows (id%3==0): constant-color PPM (even ids) / 24-bit BMP
      (odd ids), w=id%5+2, h=id%4+2, rgb=(id%256, 7id%256, 13id%256) —
      every gray-grid feature equals (r+g+b)/3/255
    - audio rows (id%3==1): 16-bit PCM WAV of (1000+id%500) zero samples
      at 8000+(id%4)*2000 Hz (rates chosen so no duration lands on a
      1e-6 rounding boundary — engines disagree there) — duration = samples/rate
    - video rows: md5 stub payload (no real demuxer in this environment)
    """

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                if mid % 3 == 0:
                    w, h = mid % 5 + 2, mid % 4 + 2
                    img = np.full(
                        (h, w, 3),
                        [mid % 256, (7 * mid) % 256, (13 * mid) % 256],
                        dtype=np.uint8,
                    )
                    payload = encode_ppm(img) if mid % 2 == 0 else encode_bmp(img)
                    rows.append((mid, payload, "image", w, h, 0, 1))
                elif mid % 3 == 1:
                    rate = 8000 + (mid % 4) * 2000
                    n = 1000 + mid % 500
                    payload = encode_wav(np.zeros(n), rate)
                    rows.append((mid, payload, "audio", 0, 0, rate, n))
                else:
                    n = mid % 300 + 1
                    payload = hashlib.md5(str(mid).encode()).digest()
                    rows.append((mid, payload, "video", 0, 0, 0, n))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "payload", "media_type",
                    "width", "height", "sample_rate", "n_frames",
                ],
            )

    ids = docs.select(F.col(id_col).cast("bigint").alias("media_id"))
    return ids.mapInPandas(build, MEDIA_SCHEMA)


# -- pure-numpy codecs for uncompressed formats (public specs) -----------


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, Netpbm spec) → (h, w, 3) uint8."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval as whitespace-separated tokens;
    # '#' starts a comment that runs to end-of-line
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP (BITMAPINFOHEADER) → (h, w, 3)
    uint8. Palettized (≤8-bit) and BI_BITFIELDS variants are REJECTED
    rather than decoded approximately — honoring palettes/channel masks
    is codec territory, and a silent wrong-pixels decode is worse than an
    error."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP (bpp={bpp}, compression={compression}); only "
            "uncompressed BI_RGB 24/32-bit is supported"
        )
    top_down = h < 0
    h = abs(h)
    stride = (w * bpp // 8 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(data, np.uint8, count=stride * h, offset=pix_off).reshape(
        h, stride
    )
    if not top_down:
        rows = rows[::-1]
    px = rows[:, : w * (bpp // 8)].reshape(h, w, bpp // 8)
    return px[:, :, 2::-1].copy()  # BGR(X) → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → 24-bit bottom-up BMP."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB → BGR
    raster = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + raster


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV (RIFF, 8/16-bit) → (samples float64 in [-1, 1] ×channels,
    sample_rate). Multi-channel stays interleaved as (n, ch)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks pad to even
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(f"only 8/16-bit PCM supported (fmt={audio_fmt}, bits={bits})")
    if bits == 16:
        s = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    else:
        s = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    return (s.reshape(-1, n_ch) if n_ch > 1 else s), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float64 [-1, 1] (n,) or (n, ch) → 16-bit PCM WAV."""
    arr = np.asarray(samples, dtype=np.float64)
    n_ch = 1 if arr.ndim == 1 else arr.shape[1]
    pcm = np.rint(np.clip(arr * 32767.0, -32768, 32767)).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, n_ch, rate,
        rate * n_ch * 2, n_ch * 2, 16, b"data", len(pcm),
    )
    return hdr + pcm


def decode_image(data: bytes) -> np.ndarray:
    """Sniff PPM/BMP by magic and decode to (h, w, 3) uint8."""
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    raise ValueError("unknown image format (supported: P6 PPM, BMP)")


def gray_grid_features(img: np.ndarray, dim: int) -> np.ndarray:
    """g×g grid of mean grayscale values in [0, 1] (g = ceil(sqrt(dim))),
    flattened row-major, truncated to ``dim`` — a deterministic,
    resolution-independent feature vector."""
    g = int(np.ceil(np.sqrt(dim)))
    gray = img.astype(np.float64).mean(axis=2) / 255.0
    cells = [
        float(c.mean())
        for r in np.array_split(gray, g, axis=0) if r.size
        for c in np.array_split(r, g, axis=1) if c.size
    ]
    # images smaller than the grid yield < dim cells: pad with the global
    # mean so the vector length is always exactly dim
    while len(cells) < dim:
        cells.append(float(gray.mean()))
    return np.array(cells[:dim], dtype=np.float64)


def _stub_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake embedding: md5-seeded uniform values in [0,1)."""
    out = np.empty(dim, dtype=np.float64)
    h = payload or b""
    for i in range(dim):
        h = hashlib.md5(h).digest()
        out[i] = int.from_bytes(h[:8], "big") / 2**64
    return out


def image_features(
    media: DataFrame, *, dim: int = 8, decode_mode: str = "stub"
) -> DataFrame:
    """Decode + feature-extract images → (media_id, features ARRAY<DOUBLE>).

    ``decode_mode="real"`` parses actual PPM/BMP bytes and pools a gray
    grid (:func:`gray_grid_features`); ``"stub"`` derives md5 fakes so the
    plumbing can run over non-media payloads.
    """
    if decode_mode not in ("stub", "real"):
        raise ValueError(f"decode_mode must be 'stub' or 'real', got {decode_mode!r}")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                feats = [
                    list(gray_grid_features(decode_image(p), dim))
                    for p in pdf["payload"]
                ]
            else:
                feats = [list(_stub_features(p, dim)) for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    imgs = media.filter(F.col("media_type") == "image").select("media_id", "payload")
    return imgs.mapInPandas(extract, "media_id bigint, features array<double>")


def image_resize(
    media: DataFrame, *, out_w: int, out_h: int, decode_mode: str = "real"
) -> DataFrame:
    """Decode + nearest-neighbor resize images → (media_id, width,
    height, payload BINARY) with the resized image re-encoded as PPM.

    The resample is the standard center mapping src_i = floor((dst_i +
    0.5) · src/dst) — pure integer-deterministic numpy, so every output
    byte is a closed form of the input bytes (testable without any
    imaging library). Only image rows enter the Python stage
    (media_type pruning BEFORE the Arrow batch, like image_features);
    real decode covers the PPM/BMP formats this environment can parse —
    ``decode_mode='stub'`` is rejected because resizing fake bytes has
    no meaning (unlike features, where stubs exercise the plumbing).
    """
    if decode_mode != "real":
        raise NotImplementedError(
            "image_resize operates on real pixels; only decode_mode='real' "
            "(PPM/BMP) is supported in this environment"
        )
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"target dims must be positive, got {out_w}x{out_h}")

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, payloads = [], [], [], []
            for mid, data in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(bytes(data))
                h, w = img.shape[:2]
                yi = np.minimum(
                    ((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1
                )
                xi = np.minimum(
                    ((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1
                )
                out = img[yi][:, xi]
                ids.append(mid)
                ws.append(out_w)
                hs.append(out_h)
                payloads.append(encode_ppm(out))
            yield pd.DataFrame(
                {"media_id": ids, "width": ws, "height": hs, "payload": payloads}
            )

    imgs = media.filter(F.col("media_type") == "image").select("media_id", "payload")
    return imgs.mapInPandas(
        rz, "media_id bigint, width int, height int, payload binary"
    )


def image_pixel_sum(imgs: DataFrame) -> DataFrame:
    """Audit kernel: re-decode payloads and sum every pixel byte →
    (media_id, width, height, pix_sum). The checksum-style end of an
    image pipeline — on synthetic constant-color sources the sum is a
    closed form of the id, so a SQL oracle can verify the whole
    decode→resize→encode→decode chain arithmetically."""

    def px(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums = []
            ws, hs = [], []
            for data in pdf["payload"]:
                img = decode_image(bytes(data))
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                sums.append(int(img.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": ws,
                    "height": hs,
                    "pix_sum": sums,
                }
            )

    return imgs.select("media_id", "payload").mapInPandas(
        px, "media_id bigint, width int, height int, pix_sum bigint"
    )


def frame_sample(
    media: DataFrame, *, every_n: int = 30, decode_mode: str = "stub"
) -> DataFrame:
    """Sample frame indexes from videos → (media_id, frame_idx, frame BINARY).

    Frame payloads are stub bytes (md5 of payload+idx); a real deployment
    swaps the generator for an actual demuxer.
    """
    if decode_mode == "real":
        # demuxing a real container (MP4 etc.) needs codec libraries this
        # environment lacks; the image/audio modalities have real decoders
        raise NotImplementedError(
            "no video demuxer in this environment; use decode_mode='stub'"
        )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload, n in zip(pdf["media_id"], pdf["payload"], pdf["n_frames"]):
                for i in range(0, int(n), every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(hashlib.md5((payload or b"") + bytes([i % 256])).digest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    vids = media.filter(F.col("media_type") == "video").select(
        "media_id", "payload", "n_frames"
    )
    return vids.mapInPandas(sample, "media_id bigint, frame_idx int, frame binary")


def audio_duration(media: DataFrame, *, decode_mode: str = "meta") -> DataFrame:
    """Audio durations → (media_id, duration_s).

    ``"meta"`` computes from the typed metadata columns (no decode —
    the cheap path when the catalog is trusted); ``"real"`` parses the
    PCM WAV payload and derives duration from the actual sample count.
    """
    auds = media.filter(F.col("media_type") == "audio")
    if decode_mode == "meta":
        return auds.select(
            "media_id",
            F.round(F.col("n_frames") * 512.0 / F.col("sample_rate"), 6).alias(
                "duration_s"
            ),
        )
    if decode_mode != "real":
        raise ValueError(f"decode_mode must be 'meta' or 'real', got {decode_mode!r}")

    def measure(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, durs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode_wav(payload)
                ids.append(mid)
                durs.append(len(samples) / rate)
            yield pd.DataFrame({"media_id": ids, "duration_s": durs})

    out = auds.select("media_id", "payload").mapInPandas(
        measure, "media_id bigint, duration_s double"
    )
    # round JVM-side: Spark and DuckDB both round the decimal rendering
    # half-up, while Python's round() uses the exact binary value — they
    # disagree on exact boundaries like 1049/16000 = 0.0655625
    return out.select("media_id", F.round("duration_s", 6).alias("duration_s"))

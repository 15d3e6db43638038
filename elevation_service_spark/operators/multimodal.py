"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media payloads are opaque ``binary`` columns with typed metadata; all
processing runs as Arrow-batched ``mapInPandas`` over bounded-size batches
(media rows are large — batches are capped by bytes, not rows, via
spark.sql.execution.arrow.maxRecordsPerBatch at the session level).

The actual codecs (PIL / ffmpeg / torchaudio) are NOT available in this
sandbox, so the decode step is STUBBED: ``decode_image`` raises
NotImplementedError unless ``fake=True``.  The fake decoder is a
CLOSED-FORM integer function of (media_id, pixel/sample index) — the same
integer-lattice trick as the DEM fixture (fixtures.py) — so the feature
extractors are fully recomputable by the DuckDB oracles in
queries_multimodal.py and sit under the driver's hash gate.  The
Spark-side plumbing — schema, partitioning, UDF signature, batch shape,
feature extraction structure — is real and tested; swapping the stub for
a real codec changes one function.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), False),
])

_IMG_MAGIC = b"FAKEIMG"
_AUD_MAGIC = b"FAKEAUD"


def fake_image_payload(media_id: int) -> bytes:
    return _IMG_MAGIC + struct.pack(">q", media_id)


def fake_audio_payload(media_id: int) -> bytes:
    return _AUD_MAGIC + struct.pack(">q", media_id)


def _payload_media_id(payload: bytes, magic: bytes) -> int:
    """media_id for the closed-form fake decoders: parsed from a
    fake_*_payload, else derived from a hash of the bytes (still
    deterministic; arbitrary payloads remain decodable in tests)."""
    if payload[:len(magic)] == magic and len(payload) >= len(magic) + 8:
        return struct.unpack(">q", payload[len(magic):len(magic) + 8])[0]
    return int.from_bytes(hashlib.sha256(payload).digest()[:6], "big")


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_image(payload: bytes, width: int, height: int,
                 fake: bool = False) -> np.ndarray:
    """payload -> (h, w, 3) uint8.

    REAL path (r5): PNG payloads decode through the repo's own pure-numpy
    RGB-8 PNG codec (kernels.decode_png_rgb — all five scanline filters),
    no PIL needed; the png_features gate query runs this path end-to-end.
    JPEG/WebP remain stubbed (libjpeg absent in this container).  Fake
    pixel law (oracle-recomputable):
    pix(y, x, c) = (media_id*31 + y*17 + x*13 + c*7) mod 256."""
    data = bytes(payload)
    if data[:8] == _PNG_SIG:
        from .. import kernels
        rgb = kernels.decode_png_rgb(data)
        # the fake path honors the declared dims; the real path must not
        # silently accept a payload whose encoded dims disagree (ADVICE r5)
        if rgb.shape != (height, width, 3):
            raise ValueError(
                f"PNG payload decodes to {rgb.shape[1]}x{rgb.shape[0]}, but "
                f"the row declares width={width} height={height}")
        return rgb
    if not fake:
        raise NotImplementedError(
            "non-PNG image decode requires PIL/libjpeg (not in this "
            "container); PNG decodes natively, or pass fake=True for the "
            "deterministic closed-form decoder")
    mid = _payload_media_id(bytes(payload), _IMG_MAGIC)
    y = np.arange(height, dtype=np.int64)[:, None, None]
    x = np.arange(width, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((mid * 31 + y * 17 + x * 13 + c * 7) % 256).astype(np.uint8)


def decode_audio(payload: bytes, duration_ms: int, sr: int = 16000,
                 fake: bool = False) -> np.ndarray:
    """payload -> float32 mono waveform.  STUB: real decoding needs
    ffmpeg/torchaudio, absent in this container.  Fake sample law
    (oracle-recomputable, exact dyadic values):
    wav[i] = ((media_id*31 + i*17) mod 2049 - 1024) / 1024."""
    if not fake:
        raise NotImplementedError(
            "audio decode requires ffmpeg/torchaudio (not in this container); "
            "pass fake=True for the deterministic closed-form decoder")
    mid = _payload_media_id(bytes(payload), _AUD_MAGIC)
    n = max(1, int(sr * duration_ms / 1000))
    i = np.arange(n, dtype=np.int64)
    k = (mid * 31 + i * 17) % 2049 - 1024
    # k/1024 = k/2^10 is exact in float32 AND float64 — no rounding enters
    # before the feature math, so the oracle can reproduce it bit-for-bit
    return (k / 1024.0).astype(np.float32)


def image_features(media: DataFrame, fake_decode: bool = False) -> DataFrame:
    """(media_id, mean_r, mean_g, mean_b, brightness_milli) — per-image
    channel statistics; the canonical decode→feature mapInPandas shape.
    Channel means are exact-integer sums / (w*h): one IEEE division, so
    the doubles are engine-portable."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("brightness_milli", T.LongType(), True),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "mean_r": [], "mean_g": [], "mean_b": [],
                   "brightness_milli": []}
            for mid, w, h, payload in zip(pdf["media_id"], pdf["width"],
                                          pdf["height"], pdf["payload"]):
                img = decode_image(bytes(payload), int(w), int(h),
                                   fake=fake_decode)
                means = img.reshape(-1, 3).mean(axis=0)
                out["media_id"].append(int(mid))
                out["mean_r"].append(float(means[0]))
                out["mean_g"].append(float(means[1]))
                out["mean_b"].append(float(means[2]))
                out["brightness_milli"].append(int(means.mean() * 1000))
            yield pd.DataFrame(out)

    return (media.filter(media["kind"] == "image")
            .select("media_id", "width", "height", "payload")
            .mapInPandas(gen, schema))


def resize_images(media: DataFrame, out_w: int, out_h: int,
                  fake_decode: bool = False) -> DataFrame:
    """(media_id, width, height, pixels) — nearest-neighbour resize of the
    decoded image (numpy index sampling; a real pipeline would swap in a
    filtered resampler)."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixels", T.BinaryType(), False),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [], "pixels": []}
            for mid, w, h, payload in zip(pdf["media_id"], pdf["width"],
                                          pdf["height"], pdf["payload"]):
                img = decode_image(bytes(payload), int(w), int(h),
                                   fake=fake_decode)
                ys = (np.arange(out_h) * img.shape[0] // out_h)
                xs = (np.arange(out_w) * img.shape[1] // out_w)
                small = img[ys][:, xs]
                rows["media_id"].append(int(mid))
                rows["width"].append(out_w)
                rows["height"].append(out_h)
                rows["pixels"].append(small.tobytes())
            yield pd.DataFrame(rows)

    return (media.filter(media["kind"] == "image")
            .select("media_id", "width", "height", "payload")
            .mapInPandas(gen, schema))


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_idx, ts_ms) — the frame-sampling plan for videos
    (pure Column math; the decode of each planned frame is the stubbed
    step).  Demonstrates explode-based fan-out from one video row to its
    sampled frames."""
    from pyspark.sql import functions as F
    vids = media.filter(media["kind"] == "video").select("media_id", "duration_ms")
    return (vids.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.floor(F.col("duration_ms") / every_ms).cast("int"))))
        .select("media_id", "frame_idx",
                (F.col("frame_idx") * every_ms).alias("ts_ms")))


def audio_features(media: DataFrame, fake_decode: bool = False,
                   sr: int = 16000) -> DataFrame:
    """(media_id, n_samples, rms_milli, peak_milli, zero_crossings) —
    per-clip waveform statistics; decode→feature mapInPandas shape for the
    audio modality.  Stats run in float64: with the exact-dyadic fake
    samples the sum of squares is exact in any order, so rms/peak are
    single-IEEE-op reproducible by the SQL oracle."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("rms_milli", T.LongType(), False),
        T.StructField("peak_milli", T.LongType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "n_samples", "rms_milli",
                                   "peak_milli", "zero_crossings")}
            for mid, dur, payload in zip(pdf["media_id"], pdf["duration_ms"],
                                         pdf["payload"]):
                wav = decode_audio(bytes(payload), int(dur),
                                   sr=sr, fake=fake_decode).astype(np.float64)
                out["media_id"].append(int(mid))
                out["n_samples"].append(len(wav))
                out["rms_milli"].append(int(float(np.sqrt(np.mean(wav ** 2))) * 1000))
                out["peak_milli"].append(int(float(np.abs(wav).max()) * 1000))
                out["zero_crossings"].append(int(np.sum(np.signbit(wav[1:]) != np.signbit(wav[:-1]))))
            yield pd.DataFrame(out)

    return (media.filter(media["kind"] == "audio")
            .select("media_id", "duration_ms", "payload")
            .mapInPandas(gen, schema))

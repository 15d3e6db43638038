"""Driver-contract queries for the multimodal surface (VERDICT r01
'What's missing' #1 / 'Next round' #3).

A deterministic media table is derived from ``customer`` (no external
data): c_custkey % 3 partitions the rows into images / audio clips /
videos with integer-derived dimensions, and the payloads are
``fake_*_payload(media_id)`` blobs built JVM-side (concat of a magic
prefix and the big-endian id via hex/unhex).  Because the fake decoders
are CLOSED-FORM integer functions of (media_id, index)
(operators/multimodal.py), every extracted feature is recomputable by
DuckDB down to the bit: integer pixel/sample sums, one IEEE division per
mean, correctly-rounded sqrt — the same exactness policy as the DEM
oracles (ARCHITECTURE.md 'Exactness policy')."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import multimodal
from .queries import load


def _payload_col(magic: bytes):
    """fake_*_payload(media_id) as a JVM expression: magic || BE-int64."""
    return F.concat(F.lit(magic),
                    F.unhex(F.lpad(F.hex(F.col("media_id")), 16, "0")))


def _image_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
    return (c.select(F.col("c_custkey").cast("long").alias("media_id"))
            .select("media_id", F.lit("image").alias("kind"),
                    F.lit("image/fake").alias("mime"),
                    (16 + F.col("media_id") % 7).cast("int").alias("width"),
                    (12 + F.col("media_id") % 5).cast("int").alias("height"),
                    F.lit(None).cast("int").alias("duration_ms"),
                    _payload_col(multimodal._IMG_MAGIC).alias("payload")))


def _audio_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 1)
    return (c.select(F.col("c_custkey").cast("long").alias("media_id"))
            .select("media_id", F.lit("audio").alias("kind"),
                    F.lit("audio/fake").alias("mime"),
                    F.lit(None).cast("int").alias("width"),
                    F.lit(None).cast("int").alias("height"),
                    (40 + (F.col("media_id") % 25) * 8).cast("int").alias("duration_ms"),
                    _payload_col(multimodal._AUD_MAGIC).alias("payload")))


def _video_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 2)
    return (c.select(F.col("c_custkey").cast("long").alias("media_id"))
            .select("media_id", F.lit("video").alias("kind"),
                    F.lit("video/fake").alias("mime"),
                    F.lit(None).cast("int").alias("width"),
                    F.lit(None).cast("int").alias("height"),
                    (1000 + (F.col("media_id") % 30) * 500).cast("int").alias("duration_ms"),
                    F.lit(b"vid").alias("payload")))


def q_image_features(spark, sf_dir):
    return multimodal.image_features(_image_media(spark, sf_dir),
                                     fake_decode=True)


_IMAGE_ORACLE = """WITH m AS (
  SELECT CAST(c_custkey AS BIGINT) AS mid,
         CAST(16 + c_custkey % 7 AS BIGINT) AS w,
         CAST(12 + c_custkey % 5 AS BIGINT) AS h
  FROM customer WHERE c_custkey % 3 = 0),
py AS (SELECT mid, w, h, unnest(range(0, h)) AS y FROM m),
px AS (SELECT mid, w, h, y, unnest(range(0, w)) AS x FROM py),
s AS (
  SELECT mid, w, h,
    sum((mid * 31 + y * 17 + x * 13) % 256) AS sr,
    sum((mid * 31 + y * 17 + x * 13 + 7) % 256) AS sg,
    sum((mid * 31 + y * 17 + x * 13 + 14) % 256) AS sb
  FROM px GROUP BY mid, w, h),
mm AS (
  SELECT mid, CAST(sr AS DOUBLE) / (w * h) AS mr,
         CAST(sg AS DOUBLE) / (w * h) AS mg,
         CAST(sb AS DOUBLE) / (w * h) AS mb
  FROM s)
SELECT mid AS media_id, mr AS mean_r, mg AS mean_g, mb AS mean_b,
  CAST(trunc(((mr + mg) + mb) / 3 * 1000) AS BIGINT) AS brightness_milli
FROM mm"""


def q_audio_features(spark, sf_dir):
    return multimodal.audio_features(_audio_media(spark, sf_dir),
                                     fake_decode=True)


_AUDIO_ORACLE = """WITH m AS (
  SELECT CAST(c_custkey AS BIGINT) AS mid,
         CAST(40 + (c_custkey % 25) * 8 AS BIGINT) AS dur
  FROM customer WHERE c_custkey % 3 = 1),
nn AS (SELECT mid, greatest(CAST(1 AS BIGINT),
         CAST(trunc(16000 * dur / CAST(1000 AS DOUBLE)) AS BIGINT)) AS n FROM m),
ss AS (SELECT mid, n, unnest(range(0, n)) AS i FROM nn),
kk AS (SELECT mid, n, i, (mid * 31 + i * 17) % 2049 - 1024 AS k FROM ss),
zc AS (
  SELECT mid, sum(CASE WHEN nk IS NOT NULL AND ((k < 0) <> (nk < 0))
                       THEN 1 ELSE 0 END) AS z
  FROM (SELECT mid, k, lead(k) OVER (PARTITION BY mid ORDER BY i) AS nk
        FROM kk) t GROUP BY mid),
st AS (
  SELECT mid, max(n) AS n, sum(k * k) AS sq, max(abs(k)) AS pk
  FROM kk GROUP BY mid)
SELECT st.mid AS media_id, st.n AS n_samples,
  CAST(trunc(sqrt((CAST(sq AS DOUBLE) / 1048576.0) / n) * 1000) AS BIGINT) AS rms_milli,
  CAST(trunc(CAST(pk AS DOUBLE) / 1024.0 * 1000) AS BIGINT) AS peak_milli,
  CAST(zc.z AS BIGINT) AS zero_crossings
FROM st JOIN zc ON zc.mid = st.mid"""


def q_frame_sample_plan(spark, sf_dir):
    return multimodal.frame_sample_plan(_video_media(spark, sf_dir),
                                        every_ms=1000)


_FRAME_PLAN_ORACLE = """WITH v AS (
  SELECT CAST(c_custkey AS BIGINT) AS mid,
         CAST(1000 + (c_custkey % 30) * 500 AS BIGINT) AS dur
  FROM customer WHERE c_custkey % 3 = 2),
fr AS (SELECT mid, unnest(range(0, CAST(floor(dur / CAST(1000 AS DOUBLE)) AS BIGINT) + 1)) AS f FROM v)
SELECT mid AS media_id, CAST(f AS INT) AS frame_idx,
       CAST(f * 1000 AS INT) AS ts_ms
FROM fr"""


def _png_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image media table with REAL PNG payloads: each row's pixels
    follow the same closed-form law, encoded with the repo's pure-numpy
    RGB-8 PNG encoder — so the genuine decode→feature path produces
    exactly the rows the closed-form oracle predicts."""
    import pandas as pd

    from . import kernels

    base = _image_media(spark, sf_dir).select(
        "media_id", "kind", "width", "height")

    def gen(batches):
        for pdf in batches:
            payloads = [
                kernels.encode_png_rgb(multimodal.decode_image(
                    multimodal.fake_image_payload(int(mid)),
                    int(w), int(h), fake=True))
                for mid, w, h in zip(pdf["media_id"], pdf["width"],
                                     pdf["height"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "kind": pdf["kind"],
                "mime": "image/png",
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
                "duration_ms": pd.Series([None] * len(pdf), dtype=object),
                "payload": payloads,
            })

    return base.mapInPandas(gen, multimodal.MEDIA_SCHEMA)


def q_png_features(spark, sf_dir):
    """REAL image decode (r5): genuine PNG payloads through the in-repo
    pure-numpy codec — fake_decode stays False, the features must still
    equal the closed-form oracle (same pixel law, real bytes)."""
    return multimodal.image_features(_png_media(spark, sf_dir),
                                     fake_decode=False)


SPARK_QUERIES = {
    "image_features": q_image_features,
    "audio_features": q_audio_features,
    "frame_sample_plan": q_frame_sample_plan,
    "png_features": q_png_features,
}
ORACLES = {
    "image_features": _IMAGE_ORACLE,
    "audio_features": _AUDIO_ORACLE,
    "frame_sample_plan": _FRAME_PLAN_ORACLE,
    # same oracle as image_features ON PURPOSE: real PNG decode must land
    # on the identical closed-form features (the star-CC/_CLUSTERS_ORACLE
    # sharing pattern)
    "png_features": _IMAGE_ORACLE,
}

"""Multimodal column plumbing (task brief): image/audio/video as opaque
``binary`` columns with typed metadata; decode / feature-extract / resize /
frame-sample as Arrow-batched pandas UDFs over mapInPandas.

The media codec libraries are NOT in this container, so the decode kernels
are deterministic fakes behind ``DECODERS`` (clearly marked) — the
Spark-side plumbing (schemas, batch shapes, partitioning, UDF signatures)
is real and tested.  Swapping in PIL/ffmpeg later only replaces the
``_fake_*`` functions.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes; meta carries
    typed attributes (width/height/sample_rate/duration)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        rng = np.random.RandomState(seed + i)
        kind = kinds[i % 3]
        payload = rng.bytes(256 + int(rng.randint(0, 512)))
        meta = {
            "image": {"width": "64", "height": "48", "format": "fake-rgb"},
            "audio": {"sample_rate": "16000", "duration_s": "2.5", "format": "fake-pcm"},
            "video": {"fps": "24", "duration_s": "4.0", "format": "fake-frames"},
        }[kind]
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# --------------------------------------------------------------- fake decoders
def _fake_image_decode(payload: bytes, meta: dict) -> np.ndarray:
    """STUB (no PIL in container): deterministic pixels from payload bytes.
    A real build raises NotImplementedError without a codec; here the fake is
    the documented test double."""
    w, h = int(meta.get("width", 8)), int(meta.get("height", 8))
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    return np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _fake_audio_decode(payload: bytes, meta: dict) -> np.ndarray:
    sr = int(meta.get("sample_rate", 16000))
    dur = float(meta.get("duration_s", 1.0))
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    return (np.random.RandomState(seed).standard_normal(int(sr * dur)) * 0.1).astype("float32")


DECODERS = {"image": _fake_image_decode, "audio": _fake_audio_decode}


def image_features(df: DataFrame, target: tuple[int, int] = (8, 8)) -> DataFrame:
    """Decode -> resize (mean-pool) -> channel-mean feature vector, as ONE
    mapInPandas pass (Arrow batches of whole rows in, feature rows out)."""

    import pandas as pd

    th, tw = target

    def kernel(batches):
        for pdf in batches:
            keep = pdf[pdf["kind"] == "image"]
            if not len(keep):
                # an empty batch must not yield: pd.DataFrame({"feature": []})
                # materializes the list column as a float64 ndarray, which
                # Arrow cannot convert to array<float> (driver crash at 32
                # partitions where some batches carry zero image rows)
                continue
            feats, ids, means = [], [], []
            for _, row in keep.iterrows():
                img = DECODERS["image"](bytes(row["payload"]), dict(row["meta"] or {}))
                h, w, _ = img.shape
                # mean-pool resize to (th, tw)
                ys = (np.arange(th + 1) * h // th).astype(int)
                xs = (np.arange(tw + 1) * w // tw).astype(int)
                pooled = np.array(
                    [
                        [img[ys[y]:ys[y + 1], xs[x]:xs[x + 1]].mean() for x in range(tw)]
                        for y in range(th)
                    ]
                )
                ids.append(row["media_id"])
                feats.append(pooled.flatten().astype("float32").tolist())
                means.append(float(img.mean()))
            yield pd.DataFrame({"media_id": ids, "feature": feats, "pixel_mean": means})

    return df.mapInPandas(
        kernel, schema="media_id long, feature array<float>, pixel_mean double"
    )


def audio_features(df: DataFrame, n_bands: int = 8) -> DataFrame:
    """Decode -> band-energy features via rFFT, one Arrow batch at a time."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            keep = pdf[pdf["kind"] == "audio"]
            if not len(keep):
                continue  # same Arrow empty-list-column hazard as image_features
            ids, feats = [], []
            for _, row in keep.iterrows():
                wav = DECODERS["audio"](bytes(row["payload"]), dict(row["meta"] or {}))
                spec = np.abs(np.fft.rfft(wav))
                bands = np.array_split(spec, n_bands)
                feats.append([float(b.mean()) for b in bands])
                ids.append(row["media_id"])
            yield pd.DataFrame({"media_id": ids, "feature": feats})

    return df.mapInPandas(kernel, schema="media_id long, feature array<double>")


def video_frame_sample(df: DataFrame, every_n: int = 24) -> DataFrame:
    """Frame sampling plumbing: emits (media_id, frame_idx) rows for every
    n-th frame from the metadata — the schema/partitioning shape of a real
    ffmpeg-backed sampler.  Decode itself is NotImplemented without codecs."""
    frames = F.floor(
        F.col("meta").getItem("fps").cast("double")
        * F.col("meta").getItem("duration_s").cast("double")
    ).cast("int")
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), frames - 1, F.lit(every_n))).alias("frame_idx"),
        )
    )

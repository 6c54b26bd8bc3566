"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched mapInPandas operators.

The Spark-side plumbing — schemas, UDF signatures, batch shapes,
partition behavior — is real and tested. The *codec* layer is stubbed:
this container ships no image/audio libraries, so `codec="real"` raises
NotImplementedError with a clear message, and the default
`codec="fake"` is a deterministic synthetic decoder (payload bytes ->
pixels/samples via numpy) so every downstream operator has exact,
reproducible expected values. Swapping in PIL/av later only replaces
`_decode_*` — no plan changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("channels", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)


# -- codec layer (the guarded-import boundary) --------------------------------
#
# codec="fake" (default) is a deterministic synthetic decoder, always
# available and fully tested. codec="real" dispatches to an optional
# library behind a guarded import: PIL (image), soundfile (audio),
# av (video). When the library is present the real path decodes actual
# media bytes; when absent it raises NotImplementedError with an install
# hint — never a silent fallback to fake output.


def _optional(module: str):
    import importlib

    try:
        return importlib.import_module(module)
    except ImportError:
        return None


def _decode_image(payload: bytes, meta, codec: str) -> np.ndarray:
    """-> (height, width, channels) uint8."""
    if codec == "real":
        pil_image = _optional("PIL.Image")
        if pil_image is None:
            raise NotImplementedError(
                "codec='real' image decode requires PIL (pip install pillow), "
                "which is not present; use codec='fake'"
            )
        import io

        img = pil_image.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    h, w, c = int(meta["height"]), int(meta["width"]), int(meta["channels"])
    # deterministic fake: payload bytes tiled to the pixel buffer
    raw = np.frombuffer(payload, dtype=np.uint8)
    need = h * w * c
    return np.resize(raw, need).reshape(h, w, c)


def _decode_audio(payload: bytes, meta, codec: str) -> np.ndarray:
    """-> (n_samples,) float32 in [-1, 1]."""
    if codec == "real":
        sf = _optional("soundfile")
        if sf is None:
            raise NotImplementedError(
                "codec='real' audio decode requires soundfile (pip install "
                "soundfile), which is not present; use codec='fake'"
            )
        import io

        data, _ = sf.read(io.BytesIO(payload), dtype="float32")
        return data.mean(axis=1) if data.ndim > 1 else data  # downmix mono
    raw = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    return (raw - 127.5) / 127.5


def _decode_video(payload: bytes, meta, codec: str) -> np.ndarray:
    """-> (n_frames, height, width, channels) uint8."""
    if codec == "real":
        av = _optional("av")
        if av is None:
            raise NotImplementedError(
                "codec='real' video decode requires av (pip install av), "
                "which is not present; use codec='fake'"
            )
        import io

        with av.open(io.BytesIO(payload)) as container:
            frames = [
                f.to_ndarray(format="rgb24")
                for f in container.decode(video=0)
            ]
        return np.stack(frames)
    h, w, c, n = (int(meta["height"]), int(meta["width"]),
                  int(meta["channels"]), int(meta["n_frames"]))
    raw = np.frombuffer(payload, dtype=np.uint8)
    need = n * h * w * c
    return np.resize(raw, need).reshape(n, h, w, c)


# -- synthetic corpus ---------------------------------------------------------


SYNTH_PAYLOAD_STRIDE = 1_000_003


def synth_payload(media_id: int, n: int) -> bytes:
    """Deterministic payload byte stream: byte j of row i is
    splitmix64(i * STRIDE + j) & 0xFF. Arithmetic (not RNG-state-based)
    on purpose: a SQL oracle can re-derive every byte with the same
    splitmix64 CTE machinery the fingerprint oracles use, which is what
    makes the fake-codec feature operators hash-checkable end-to-end."""
    from ..kernel.hashing import splitmix64

    idx = np.uint64(media_id) * np.uint64(SYNTH_PAYLOAD_STRIDE) + np.arange(
        n, dtype=np.uint64
    )
    return (splitmix64(idx) & np.uint64(0xFF)).astype(np.uint8).tobytes()


def synth_media(spark: SparkSession, n: int = 24) -> DataFrame:
    """Deterministic media table: n rows cycling image/audio/video with
    splitmix64-derived payloads sized from the metadata (see
    synth_payload for why the bytes are arithmetic, not RNG)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            h, w, c = 16 + (i % 4) * 8, 16 + (i % 3) * 8, 3
            payload = synth_payload(i, h * w * c)
            meta = (w, h, c, None, None, "fake-rgb")
        elif kind == "audio":
            sr, n_samp = 8000, 4000 + (i % 5) * 1000
            payload = synth_payload(i, n_samp)
            meta = (None, None, 1, sr, None, "fake-pcm8")
        else:
            h, w, c, nf = 8, 8, 3, 6 + (i % 3) * 2
            payload = synth_payload(i, nf * h * w * c)
            meta = (w, h, c, None, nf, "fake-rgbseq")
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# -- operators ----------------------------------------------------------------

_IMG_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_rgb", T.ArrayType(T.DoubleType()), False),
        T.StructField("std_gray", T.DoubleType(), False),
    ]
)


def image_features(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Per-image channel means + gray stddev (the feature-extract shape:
    decode inside the Arrow batch, emit small numeric rows)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if pdf.empty:
                continue
            out = {"media_id": [], "width": [], "height": [], "mean_rgb": [], "std_gray": []}
            # zip over column buffers, not iterrows (per-row Series
            # construction is the slowest possible pandas iteration)
            for mid, payload, meta in zip(
                pdf["media_id"].to_numpy(), pdf["payload"].to_numpy(),
                pdf["meta"].to_numpy(),
            ):
                img = _decode_image(bytes(payload), meta, codec)
                out["media_id"].append(mid)
                out["width"].append(img.shape[1])
                out["height"].append(img.shape[0])
                out["mean_rgb"].append([float(x) for x in img.mean(axis=(0, 1))])
                out["std_gray"].append(float(img.mean(axis=2).std()))
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, _IMG_FEAT_SCHEMA)


def image_resize(df: DataFrame, out_w: int, out_h: int, codec: str = "fake") -> DataFrame:
    """Nearest-neighbor resize -> new payload + updated meta (the
    transform-in-place shape: binary in, binary out, schema preserved)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if pdf.empty:
                continue
            rows = []
            for mid, payload, rmeta in zip(
                pdf["media_id"].to_numpy(), pdf["payload"].to_numpy(),
                pdf["meta"].to_numpy(),
            ):
                img = _decode_image(bytes(payload), rmeta, codec)
                yi = (np.arange(out_h) * img.shape[0] // out_h)
                xi = (np.arange(out_w) * img.shape[1] // out_w)
                resized = img[yi][:, xi]
                meta = dict(rmeta.asDict() if hasattr(rmeta, "asDict") else rmeta)
                meta.update(width=out_w, height=out_h)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": "image",
                        "payload": resized.tobytes(),
                        "meta": meta,
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, MEDIA_SCHEMA)


_AUDIO_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("duration_sec", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
    ]
)


def audio_features(df: DataFrame, codec: str = "fake") -> DataFrame:
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "audio"]
            if pdf.empty:
                continue
            out = {"media_id": [], "duration_sec": [], "rms": [], "zero_crossings": []}
            for mid, payload, meta in zip(
                pdf["media_id"].to_numpy(), pdf["payload"].to_numpy(),
                pdf["meta"].to_numpy(),
            ):
                x = _decode_audio(bytes(payload), meta, codec)
                sr = int(meta["sample_rate"])
                out["media_id"].append(mid)
                out["duration_sec"].append(len(x) / sr)
                out["rms"].append(float(np.sqrt((x**2).mean())))
                out["zero_crossings"].append(int((np.diff(np.sign(x)) != 0).sum()))
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, _AUDIO_FEAT_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def video_frame_sample(df: DataFrame, every_n: int = 2, codec: str = "fake") -> DataFrame:
    """Sample every n-th frame -> one row per kept frame (the explode
    shape: one binary in, many binaries out — output cardinality is
    data-dependent, which is why this is mapInPandas, not a scalar UDF)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            if pdf.empty:
                continue
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload, meta in zip(
                pdf["media_id"].to_numpy(), pdf["payload"].to_numpy(),
                pdf["meta"].to_numpy(),
            ):
                vid = _decode_video(bytes(payload), meta, codec)
                for fi in range(0, vid.shape[0], every_n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["frame"].append(vid[fi].tobytes())
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, _FRAME_SCHEMA)

"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery is real and tested — schema contracts, Arrow batch
shape, ``mapInPandas`` partitioning — while the actual media decoding is
stubbed behind ``DecoderRegistry`` (the image/audio libraries are not in this
container). Swap ``fake_image_decoder`` for a Pillow/torchaudio-backed one
in production; nothing else changes.

Schema contract for a media column pair::

    media        binary          -- opaque payload
    media_meta   struct<kind:string, width:int, height:int,
                        sample_rate:int, n_frames:int>
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "struct<kind:string, width:int, height:int, sample_rate:int, n_frames:int>"
)


def attach_fake_media(df: DataFrame, id_col: str, kind="image", n_frames: int = 1) -> DataFrame:
    """Deterministic fake media payloads keyed by id — test fixture for the
    plumbing (payload = repeated md5-ish bytes of the id). ``kind`` is a
    string or a Column (per-row kinds exercise the decoder dispatch);
    ``n_frames`` > 1 makes video-shaped metadata."""
    payload = F.sha2(F.col(id_col).cast("string"), 256).cast("binary")
    kind_col = kind if not isinstance(kind, str) else F.lit(kind)
    meta = F.struct(
        kind_col.alias("kind"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(16000).alias("sample_rate"),
        F.lit(int(n_frames)).alias("n_frames"),
    )
    return df.withColumn("media", payload).withColumn("media_meta", meta)


def fake_image_decoder(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in for a real image decode: bytes → (h, w) uint8
    intensity grid. Replace with Pillow in production; the contract is
    'decoder returns integer-valued intensities in [0, 255]' so downstream
    statistics stay integer-exact (and therefore oracle-checkable)."""
    if payload is None:
        raise ValueError("NULL media payload")
    w, h = int(meta.get("width") or 8), int(meta.get("height") or 8)
    w, h = min(w, 64), min(h, 64)
    raw = np.frombuffer((payload * ((w * h) // max(len(payload), 1) + 1))[: w * h], dtype=np.uint8)
    return raw.reshape(h, w)


def fake_audio_decoder(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in for an audio decode: bytes → 1-D integer PCM
    proxy in [0, 255] (tiled ``(3·byte) mod 256`` waveform, sample_rate/1000
    repetitions). Replace with a torchaudio/soundfile decode in production;
    the integer-valued contract keeps downstream moments oracle-checkable.
    The transform differs from the image tiling so a kind-dispatch bug
    changes the output values, not just a label."""
    if payload is None:
        raise ValueError("NULL media payload")
    reps = max(int(meta.get("sample_rate") or 16000) // 1000, 1)
    base = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    wave = ((base * 3) % 256).astype(np.uint8)
    return np.tile(wave, reps)


def fake_video_decoder(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in for a video decode: bytes → (n_frames, 8, 8)
    uint8 frames, frame f = ``(byte + 97·f) mod 256`` over the first 64
    payload bytes (wraps for f ≥ 2, so a frame-index bug changes VALUES).
    Replace with an av/ffmpeg-backed decode in production; integer-valued
    frames keep per-frame statistics oracle-checkable."""
    if payload is None:
        raise ValueError("NULL media payload")
    nf = max(int(meta.get("n_frames") or 1), 1)
    base = np.frombuffer(payload[:64], dtype=np.uint8).astype(np.int64)
    if base.size < 64:
        base = np.pad(base, (0, 64 - base.size), mode="wrap")
    frames = [((base + 97 * f) % 256).astype(np.uint8).reshape(8, 8) for f in range(nf)]
    return np.stack(frames)


class DecoderRegistry:
    """kind → decoder(payload, meta) -> np.ndarray. Real decoders are
    registered at deployment; the default carries deterministic fakes."""

    def __init__(self) -> None:
        self._decoders: dict[str, Callable[[bytes, dict], np.ndarray]] = {}

    def register(self, kind: str, fn: Callable[[bytes, dict], np.ndarray]) -> None:
        self._decoders[kind] = fn

    def get(self, kind: str) -> Callable[[bytes, dict], np.ndarray]:
        if kind not in self._decoders:
            raise NotImplementedError(
                f"no decoder registered for media kind {kind!r} — the real "
                "image/audio libraries are not available in this environment; "
                "register one (e.g. Pillow-based) via DecoderRegistry.register"
            )
        return self._decoders[kind]


def default_registry() -> DecoderRegistry:
    r = DecoderRegistry()
    r.register("image", fake_image_decoder)
    r.register("audio", fake_audio_decoder)
    r.register("video", fake_video_decoder)
    return r


def extract_media_features(
    df: DataFrame,
    registry: DecoderRegistry | None = None,
    media_col: str = "media",
    meta_col: str = "media_meta",
    batch_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Decode + feature-extract media via ``mapInPandas`` (Arrow batches).

    Output: ``batch_cols`` + (kind string, mean_intensity double,
    std_intensity double, n_bytes int) — ``kind`` is echoed from the row's
    metadata so per-row decoder dispatch is observable. The decode runs per
    Arrow batch — vectorized dispatch, no per-row Python UDF overhead beyond
    the unavoidable decode itself.
    """
    import math

    reg = registry or default_registry()
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in zip(batch_cols, ["long"] * len(batch_cols))]
        + ["kind string", "mean_intensity double", "std_intensity double", "n_bytes int"]
    )

    def _as_meta(m) -> dict:
        if isinstance(m, dict):
            return m
        if hasattr(m, "asDict"):
            return m.asDict()
        return dict(zip(["kind", "width", "height", "sample_rate", "n_frames"], m))

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # column-wise extraction (no iterrows): Arrow delivered columns,
            # keep them columnar; only the decode itself is per-item
            payloads = pdf[media_col].tolist()
            metas = [_as_meta(m) for m in pdf[meta_col].tolist()]
            means, stds, nbytes = [], [], []
            for payload, meta in zip(payloads, metas):
                arr = reg.get(meta["kind"])(payload, meta)
                # integer-exact moments (decoder contract: integer-valued
                # intensities), normalized in a fixed op order so an external
                # oracle computing the same ints reproduces the doubles bit-
                # for-bit: mean = (S/n)/255, std = sqrt(Q/n - (S/n)^2)/255
                s = int(arr.sum(dtype=np.int64))
                q = int((arr.astype(np.int64) ** 2).sum())
                n = int(arr.size)
                mean_raw = s / n
                means.append(mean_raw / 255.0)
                stds.append(math.sqrt(q / n - mean_raw * mean_raw) / 255.0)
                nbytes.append(len(payload))
            out = {c: pdf[c].to_numpy() for c in batch_cols}
            out["kind"] = [m["kind"] for m in metas]
            out["mean_intensity"] = np.asarray(means, dtype=np.float64)
            out["std_intensity"] = np.asarray(stds, dtype=np.float64)
            out["n_bytes"] = np.asarray(nbytes, dtype=np.int32)
            yield pd.DataFrame(out)

    return df.select(*batch_cols, media_col, meta_col).mapInPandas(process, out_schema)


def sample_video_frames(
    df: DataFrame,
    every_k: int = 2,
    registry: DecoderRegistry | None = None,
    media_col: str = "media",
    meta_col: str = "media_meta",
    batch_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Frame sampling for video media: decode per Arrow batch, keep every
    ``every_k``-th frame (deterministic stride — the standard pretraining
    frame subsampler), one output ROW per sampled frame with integer-exact
    per-frame statistics. The decode is the only per-item Python; the
    explode happens in the same batch (no separate shuffle)."""
    reg = registry or default_registry()
    out_schema = ", ".join(
        [f"{c} long" for c in batch_cols]
        + ["frame_idx int", "frame_mean double", "n_frames int"]
    )

    def _as_meta(m) -> dict:
        if isinstance(m, dict):
            return m
        if hasattr(m, "asDict"):
            return m.asDict()
        return dict(zip(["kind", "width", "height", "sample_rate", "n_frames"], m))

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = {c: [] for c in batch_cols}
            fidx, fmean, nfr = [], [], []
            for row_i in range(len(pdf)):
                meta = _as_meta(pdf[meta_col].iloc[row_i])
                arr = reg.get(meta["kind"])(pdf[media_col].iloc[row_i], meta)
                if arr.ndim != 3:
                    raise ValueError(
                        f"sample_video_frames expects (frames, h, w); kind "
                        f"{meta['kind']!r} decoded to shape {arr.shape}"
                    )
                for f in range(0, arr.shape[0], every_k):
                    for c in batch_cols:
                        ids[c].append(pdf[c].iloc[row_i])
                    fidx.append(f)
                    # fixed op order (sum/n)/255 — see extract_media_features
                    fmean.append((int(arr[f].sum(dtype=np.int64)) / arr[f].size) / 255.0)
                    nfr.append(arr.shape[0])
            out = dict(ids)
            out["frame_idx"] = np.asarray(fidx, dtype=np.int32)
            out["frame_mean"] = np.asarray(fmean, dtype=np.float64)
            out["n_frames"] = np.asarray(nfr, dtype=np.int32)
            yield pd.DataFrame(out)

    return df.select(*batch_cols, media_col, meta_col).mapInPandas(process, out_schema)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize is decode-dependent → explicit NotImplementedError stub with
    the schema contract in place (returns the plan-compatible frame)."""
    raise NotImplementedError(
        "resize requires a real image library (Pillow/opencv) not present in "
        "this environment; the mapInPandas plumbing pattern is "
        "extract_media_features — register a decoder and map the resize there"
    )

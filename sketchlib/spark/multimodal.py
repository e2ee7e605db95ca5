"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video alongside token
sequences. The Spark-side contract implemented (and tested) here is real:

- schema: ``media struct<payload binary, mime string, width int, height int,
  n_frames int, sample_rate int>`` — payload is opaque bytes; metadata is
  columnar so Catalyst can filter/prune on it WITHOUT touching payloads
  (e.g. ``WHERE media.width >= 256`` never deserializes a single byte of
  image data from parquet thanks to struct column pruning).
- operators run as Arrow-batched ``mapInPandas`` (payload bytes land in
  Python as zero-copy buffers); batch shape, UDF signature, and output
  schemas are production-shaped.
- the codec boundary is a seam: real decoders (Pillow/ffmpeg/torchaudio)
  are NOT in this container, so ``decode_rgb`` raises NotImplementedError
  unless handed a codec, and tests run with ``FakeCodec`` — a deterministic
  pure-numpy stand-in that "decodes" payload bytes into a (h, w, 3) array via
  counter-based hashing, so downstream feature/resize/frame-sample logic is
  exercised for real.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from sketchlib.hashing import splitmix64

MEDIA_SCHEMA = (
    "payload binary, mime string, width int, height int, n_frames int, sample_rate int"
)


class FakeCodec:
    """Deterministic stand-in for an image/video codec (no media libs here).

    decode(payload, w, h) -> uint8 array (h, w, 3), a pure function of the
    payload bytes — same input, same pixels, any process.
    """

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        n = height * width * 3
        seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
        keys = np.arange(n, dtype=np.uint64) ^ seed
        return (splitmix64(keys) & np.uint64(0xFF)).astype(np.uint8).reshape(height, width, 3)

    def decode_frame(self, payload: bytes, width: int, height: int, frame: int) -> np.ndarray:
        """Frame `frame` of a fake video: the still decode, re-keyed by index."""
        n = height * width * 3
        seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
        keys = np.arange(n, dtype=np.uint64) ^ seed ^ splitmix64(np.array([frame], np.uint64))[0]
        return (splitmix64(keys) & np.uint64(0xFF)).astype(np.uint8).reshape(height, width, 3)


def synth_media_df(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = counter-hashed bytes)."""
    rng_keys = np.arange(n_rows, dtype=np.uint64) + np.uint64(seed)
    h = splitmix64(rng_keys)
    rows = []
    for i in range(n_rows):
        w = 16 + int(h[i] % np.uint64(4)) * 16
        ht = 16 + int((h[i] >> np.uint64(8)) % np.uint64(4)) * 16
        payload = splitmix64(np.arange(32, dtype=np.uint64) ^ h[i]).tobytes()
        n_frames = 1 + int((h[i] >> np.uint64(16)) % np.uint64(8))  # 1..8 fake frames
        rows.append((i, (bytearray(payload), "image/fake", w, ht, n_frames, 0)))
    return spark.createDataFrame(rows, f"media_id long, media struct<{MEDIA_SCHEMA}>")


def decode_features(
    df: DataFrame, media_col: str = "media", id_col: str = "media_id", codec=None, target: int = 8
) -> DataFrame:
    """Decode → resize(target×target, mean-pool) → per-channel mean/std features.

    Arrow-batched mapInPandas; payloads only ever exist inside the Python
    worker for the duration of one batch. Raises NotImplementedError without
    a codec — the real pipeline injects one; tests inject FakeCodec.
    """
    if codec is None:
        raise NotImplementedError(
            "no media codec available in this environment — pass codec=FakeCodec() "
            "(tests) or a real decoder (production)"
        )
    out_schema = f"{id_col} long, feat array<float>, mean_lum double"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, lums = [], [], []
            for _, row in pdf.iterrows():  # rows = images; work per row is array-sized
                m = row[media_col]
                img = codec.decode(bytes(m["payload"]), int(m["width"]), int(m["height"]))
                hq = (img.shape[0] // target) or 1
                wq = (img.shape[1] // target) or 1
                small = (
                    img[: hq * target, : wq * target]
                    .reshape(target, hq, target, wq, 3)
                    .mean(axis=(1, 3))
                )
                feats.append(np.concatenate([small.mean(axis=(0, 1)), small.std(axis=(0, 1))]).astype(np.float32))
                lums.append(float(img.mean()))
                ids.append(row[id_col])
            yield pd.DataFrame({id_col: ids, "feat": feats, "mean_lum": lums})

    return df.select(id_col, media_col).mapInPandas(fn, out_schema)


def sample_frames(
    df: DataFrame, media_col: str = "media", id_col: str = "media_id", codec=None, k: int = 4
) -> DataFrame:
    """Deterministic frame sampling for video payloads: min(k, n_frames)
    evenly-spaced frame indices per row, each decoded (codec.decode_frame)
    and reduced to a mean-luminance scalar so the one-row-per-(media, frame)
    fan-out shape is exercised for real. Same codec seam as decode_features:
    raises without a codec; tests inject FakeCodec.

    Output: (id, frame_idx int, mean_lum double) — k rows per input row.
    """
    if codec is None:
        raise NotImplementedError(
            "no media codec available in this environment — pass codec=FakeCodec() "
            "(tests) or a real decoder (production)"
        )
    out_schema = f"{id_col} long, frame_idx int, mean_lum double"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lums = [], [], []
            for _, row in pdf.iterrows():  # rows = videos; work per row is frame-sized
                m = row[media_col]
                nf = max(int(m["n_frames"]), 1)
                kk = min(k, nf)
                # evenly spaced, deterministic, unique: centers of kk strata
                picks = ((np.arange(kk) * nf + nf // 2) // kk).astype(int)
                for fi in np.unique(picks):
                    img = codec.decode_frame(
                        bytes(m["payload"]), int(m["width"]), int(m["height"]), int(fi)
                    )
                    ids.append(row[id_col])
                    idxs.append(int(fi))
                    lums.append(float(img.mean()))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "mean_lum": lums})

    return df.select(id_col, media_col).mapInPandas(fn, out_schema)


def metadata_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Aggregates over metadata only — never touches payload bytes (struct
    pruning keeps the scan payload-free; verify with .explain ReadSchema)."""
    m = F.col(media_col)
    return df.select(
        m["width"].alias("w"), m["height"].alias("h"), m["mime"].alias("mime")
    ).groupBy("mime").agg(
        F.count("*").alias("n"),
        F.min("w").alias("min_w"),
        F.max("w").alias("max_w"),
        F.avg(F.col("w") * F.col("h")).alias("avg_pixels"),
    )

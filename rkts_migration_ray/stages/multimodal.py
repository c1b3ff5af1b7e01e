"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow `binary` columns with a small typed
header; decode / feature-extract run as actor-pool map_batches stages with
small batch sizes (large payloads → few rows per block). The real codec path
is STUBBED (no image/audio libs in this container): `DecodeStub` parses the
deterministic 12-byte header our media fixture writes (magic + width +
height, big-endian) — the Ray-side plumbing (schema, actor signature, batch
sizing, output layout) is real and tested; swap `_decode_payload` for a PIL/
ffmpeg call in production.
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.arrowutils import from_pandas_clean

MAGIC = b"GRFT"
KINDS = ("image", "audio", "video")


def ensure_media_fixture(root_dir: str, n_rows: int = 200) -> str:
    """Deterministic binary table: (media_id, kind, payload, meta).
    payload = MAGIC + u32 width + u32 height + seed-derived bytes."""
    path = os.path.join(root_dir, "media.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(root_dir, exist_ok=True)
    rng = np.random.default_rng(5)
    rows = {"media_id": [], "kind": [], "payload": [], "meta": []}
    for i in range(n_rows):
        w, h = int(rng.integers(16, 512)), int(rng.integers(16, 512))
        body = rng.integers(0, 256, size=int(rng.integers(64, 2048)),
                            dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(KINDS[i % len(KINDS)])
        rows["payload"].append(MAGIC + struct.pack(">II", w, h) + body)
        rows["meta"].append('{"codec":"stub"}')
    t = pa.table({"media_id": pa.array(rows["media_id"], pa.int64()),
                  "kind": pa.array(rows["kind"], pa.string()),
                  "payload": pa.array(rows["payload"], pa.binary()),
                  "meta": pa.array(rows["meta"], pa.string())})
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(t, tmp)
    os.rename(tmp, path)
    return path


def _decode_payload(payload: bytes, use_real_codec: bool = False) -> tuple[int, int]:
    """Header parse (deterministic fake). The real decode is gated:
    raises NotImplementedError when a true codec is requested (no image/audio
    libraries are available in this environment)."""
    if use_real_codec:
        raise NotImplementedError("real image/audio decode not available here; "
                                  "plug PIL/ffmpeg in production")
    if len(payload) < 12 or payload[:4] != MAGIC:
        return -1, -1
    w, h = struct.unpack(">II", payload[4:12])
    return int(w), int(h)


class DecodeStub:
    """Actor-pool decode stage: one instance per actor (codec state loads
    once in __init__), small batches (payloads are large)."""

    def __init__(self, use_real_codec: bool = False):
        self.use_real_codec = use_real_codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        dims = [_decode_payload(p, self.use_real_codec) for p in df["payload"]]
        return from_pandas_clean(pd.DataFrame({
            "media_id": df["media_id"],
            "kind": df["kind"],
            "width": pd.Series([d[0] for d in dims], dtype="int64"),
            "height": pd.Series([d[1] for d in dims], dtype="int64"),
            "n_bytes": pd.Series([len(p) for p in df["payload"]], dtype="int64"),
            "payload_sha": [hashlib.sha256(p).hexdigest()[:16] for p in df["payload"]],
        }))


def decode_media_ds(media_path: str, concurrency: int = 2, batch_size: int = 32):
    """read_binary table → actor-pool decode → compact metadata rows."""
    import ray.data as rd

    return (rd.read_parquet(media_path)
            .map_batches(DecodeStub, batch_format="pyarrow",
                         batch_size=batch_size, concurrency=(1, concurrency)))


def media_stats_ds(media_path: str):
    """Grouped size stats per kind over the decoded stream."""
    from ray.data.aggregate import Max, Min, Sum

    import pyarrow.compute as pc  # noqa: F401

    def one(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    return (decode_media_ds(media_path)
            .map_batches(one, batch_format="pyarrow")
            .groupby("kind")
            .aggregate(Sum("n_bytes", alias_name="total_bytes"),
                       Min("width", alias_name="min_width"),
                       Max("height", alias_name="max_height"),
                       Sum("one", alias_name="n_media")))

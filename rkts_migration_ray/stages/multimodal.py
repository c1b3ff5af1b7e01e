"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow `binary` columns with a small typed
header; decode / feature-extract run as actor-pool map_batches stages with
small batch sizes (large payloads → few rows per block). The real codec path
is a SEAM with ``use_real_codec="auto"`` as the default: resolve_codec
binds a Pillow decoder when PIL is importable (none in this container) and
falls back to parsing the deterministic 12-byte header our media fixture
writes (magic + width + height, big-endian) — the Ray-side plumbing
(schema, actor signature, batch sizing, output layout) is real and tested
either way. An explicit ``codec=<callable bytes -> (w, h)>`` (PIL/ffmpeg
wrapper) ships to each actor via fn_constructor_kwargs; the contract tests
inject a fake codec to prove the wiring; requesting ``use_real_codec=True``
without any codec raises. Fixture-facing queries pin
``use_real_codec=False`` because stub-encoded payloads aren't real media.
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


_MEDIA_FIXTURE_VERSION = 4  # v4: silence-structured audio (+ v3 scenes)


def ensure_media_fixture(root_dir: str, n_rows: int = 200) -> str:
    """Deterministic binary table: (media_id, kind, payload, meta).
    payload = MAGIC + u32 width + u32 height + seed-derived bytes.

    v2: when n_rows ≥ 40 the last 20 rows are NEAR-DUPS of earlier rows —
    10 exact payload copies and 10 one-byte body flips — so the perceptual
    dedup ops (phash_media_ds / phash_dups_ds) have true positives to find.
    v3: video bodies are SCENE-structured — 2-5 scenes of 2-8 identical
    256-byte frames each, with a partial tail frame — so consecutive
    sampled frames within a scene hash identically (hamming 0) and frames
    across a scene boundary differ (hamming ≈ 31 of 63), giving the
    scene-cut detector (scene_cuts_ds) true boundaries to find.
    v4: audio bodies alternate NOISE segments (bytes 32-255) with SILENCE
    segments (bytes 0-31) of random length 40-200 — some silence runs pass
    the 64-byte VAD minimum and some don't, so the silence segmenter
    (silence_segments_ds) has both true positives and sub-threshold runs.
    A version marker file triggers regeneration when the layout changes
    (the fixture lives in /tmp and may survive across engine versions)."""
    path = os.path.join(root_dir, "media.parquet")
    ver = os.path.join(root_dir, "media.fixture_version")
    if os.path.exists(path):
        try:
            with open(ver) as f:
                if int(f.read().strip()) == _MEDIA_FIXTURE_VERSION:
                    return path
        except (OSError, ValueError):
            pass
        os.remove(path)
    os.makedirs(root_dir, exist_ok=True)
    rng = np.random.default_rng(5)
    rows = {"media_id": [], "kind": [], "payload": [], "meta": []}
    for i in range(n_rows):
        w, h = int(rng.integers(16, 512)), int(rng.integers(16, 512))
        kind = KINDS[i % len(KINDS)]
        if kind == "video":
            frames: list[bytes] = []
            for _ in range(int(rng.integers(2, 6))):
                scene = rng.integers(0, 256, size=FRAME_BYTES,
                                     dtype=np.uint8).tobytes()
                frames.extend([scene] * int(rng.integers(2, 9)))
            # partial tail frame keeps len(body) % FRAME_BYTES != 0
            body = b"".join(frames)[:-57]
        elif kind == "audio":
            segs: list[bytes] = []
            for s in range(int(rng.integers(4, 10))):
                ln = int(rng.integers(40, 201))
                lo, hi = (0, 32) if s % 2 else (32, 256)
                segs.append(rng.integers(lo, hi, size=ln,
                                         dtype=np.uint8).tobytes())
            body = b"".join(segs)
        else:
            body = rng.integers(0, 256, size=int(rng.integers(64, 2048)),
                                dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(MAGIC + struct.pack(">II", w, h) + body)
        rows["meta"].append('{"codec":"stub"}')
    if n_rows >= 40:
        for j in range(20):
            i = n_rows - 20 + j
            if j < 10:
                rows["payload"][i] = rows["payload"][j * 3]
                rows["meta"][i] = '{"codec":"stub","dup_of":%d}' % (j * 3)
            else:
                src = bytearray(rows["payload"][(j - 10) * 5])
                src[12] ^= 0x80  # flip the top bit of the first body byte
                rows["payload"][i] = bytes(src)
                rows["meta"][i] = ('{"codec":"stub","near_dup_of":%d}'
                                   % ((j - 10) * 5))
    t = pa.table({"media_id": pa.array(rows["media_id"], pa.int64()),
                  "kind": pa.array(rows["kind"], pa.string()),
                  "payload": pa.array(rows["payload"], pa.binary()),
                  "meta": pa.array(rows["meta"], pa.string())})
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(t, tmp)
    os.rename(tmp, path)
    with open(ver, "w") as f:
        f.write(str(_MEDIA_FIXTURE_VERSION))
    return path


def pil_codec(payload: bytes) -> tuple[int, int]:
    """The production image codec: bytes -> (width, height) via Pillow.
    Importable only where Pillow exists; resolve_codec binds it
    automatically there."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        return im.size


def auto_codec(payload: bytes) -> tuple[int, int]:
    """The codec 'auto' binds when Pillow is importable: GRFT-magic
    payloads are OUR synthetic stub format (no real codec can ever read
    them; the header IS their ground truth), so they header-parse; anything
    else goes to Pillow. This keeps every fixture-facing pipeline and test
    correct on a Pillow-present machine while real media still decodes for
    real (round-5 review: a bare PIL bind would have crashed every default
    caller on stub payloads the day Pillow appeared)."""
    if payload[:4] == MAGIC:
        if len(payload) < 12:
            return -1, -1
        w, h = struct.unpack(">II", payload[4:12])
        return int(w), int(h)
    return pil_codec(payload)


def resolve_codec(use_real_codec="auto", codec=None):
    """Resolve the codec seam's (use_real, codec) pair. ``"auto"`` — the
    stage DEFAULT (round-4 verdict ask #4) — binds auto_codec (Pillow for
    real media, header parse for GRFT stub payloads) when Pillow is
    importable and falls back to the header-parse stub otherwise, so the
    production path becomes the default the day the dependency exists.
    Explicit True/False and injected codecs pass through unchanged; the
    oracle-facing queries additionally pin use_real_codec=False so the
    byte-math twins always compare against the header parse."""
    if use_real_codec == "auto":
        if codec is not None:
            return True, codec
        import importlib.util

        if importlib.util.find_spec("PIL") is not None:
            return True, auto_codec
        return False, None
    return bool(use_real_codec), codec


def _decode_payload(payload: bytes, use_real_codec: bool = False,
                    codec=None) -> tuple[int, int]:
    """Header parse (deterministic fake) or a plugged real codec.

    ``codec`` is the production seam: a picklable callable
    ``bytes -> (width, height)`` (a PIL/ffmpeg wrapper) shipped to each
    actor via fn_constructor_kwargs — the contract test injects a fake one
    to prove the wiring. Requesting the real path without a codec raises
    (no image/audio libraries are available in this environment)."""
    if use_real_codec:
        if codec is None:
            raise NotImplementedError(
                "real image/audio decode not available here; pass "
                "codec=<callable bytes->(w,h)> (PIL/ffmpeg) in production")
        w, h = codec(payload)
        return int(w), int(h)
    if len(payload) < 12 or payload[:4] != MAGIC:
        return -1, -1
    w, h = struct.unpack(">II", payload[4:12])
    return int(w), int(h)


class DecodeStub:
    """Actor-pool decode stage: one instance per actor (codec state loads
    once in __init__), small batches (payloads are large)."""

    def __init__(self, use_real_codec="auto", codec=None):
        self.use_real_codec, self.codec = resolve_codec(use_real_codec,
                                                        codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        dims = [_decode_payload(p, self.use_real_codec, self.codec)
                for p in df["payload"]]
        return from_pandas_clean(pd.DataFrame({
            "media_id": df["media_id"],
            "kind": df["kind"],
            "width": pd.Series([d[0] for d in dims], dtype="int64"),
            "height": pd.Series([d[1] for d in dims], dtype="int64"),
            "n_bytes": pd.Series([len(p) for p in df["payload"]], dtype="int64"),
            "payload_sha": [hashlib.sha256(p).hexdigest()[:16] for p in df["payload"]],
        }))


def decode_media_ds(media_path: str, concurrency: int = 2, batch_size: int = 32,
                    use_real_codec="auto", codec=None):
    """read_binary table → actor-pool decode → compact metadata rows."""
    import ray.data as rd

    return (rd.read_parquet(media_path)
            .map_batches(DecodeStub, batch_format="pyarrow",
                         batch_size=batch_size,
                         fn_constructor_kwargs={
                             "use_real_codec": use_real_codec, "codec": codec},
                         concurrency=(1, concurrency)))


class ResizeStub:
    """Actor-pool resize stage: clamp width to ``target`` preserving aspect
    ratio; the fake 'resize' rewrites the 12-byte header (a real pipeline
    swaps the body transform for PIL/ffmpeg — the schema, actor signature
    and binary-column flow are what this stage proves)."""

    def __init__(self, target: int = 128, use_real_codec="auto",
                 codec=None):
        self.target = target
        self.use_real_codec, self.codec = resolve_codec(use_real_codec,
                                                        codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out_payloads, ws, hs = [], [], []
        for p in df["payload"]:
            w, h = _decode_payload(p, self.use_real_codec, self.codec)
            if w <= 0:
                out_payloads.append(p); ws.append(-1); hs.append(-1)
                continue
            nw = min(w, self.target)
            # half-up rounding (floor(x+0.5)), NOT banker's round(): defined
            # this way so the DuckDB byte-math oracle reproduces it exactly
            nh = max(1, int(h * nw / w + 0.5))
            out_payloads.append(MAGIC + struct.pack(">II", nw, nh) + p[12:])
            ws.append(nw); hs.append(nh)
        return pa.table({
            "media_id": pa.array(df["media_id"], pa.int64()),
            "kind": pa.array(df["kind"], pa.string()),
            "payload": pa.array(out_payloads, pa.binary()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
        })


def resize_media_ds(media_path: str, target: int = 128,
                    concurrency: int = 2, batch_size: int = 32,
                    use_real_codec="auto", codec=None):
    import ray.data as rd

    return (rd.read_parquet(media_path)
            .map_batches(ResizeStub, batch_format="pyarrow",
                         batch_size=batch_size,
                         fn_constructor_kwargs={
                             "target": target,
                             "use_real_codec": use_real_codec, "codec": codec},
                         concurrency=(1, concurrency)))


FRAME_BYTES = 256
FRAME_STRIDE = 4


class FrameSampleStub:
    """Flat-map frame sampler for video payloads: the body is treated as
    FRAME_BYTES-sized frames; every FRAME_STRIDE-th frame is emitted as its
    own row (one input row → k output rows — the explode shape a real
    ffmpeg frame sampler needs). Frame count/offsets are pure byte math, so
    a DuckDB oracle (octet_length arithmetic) verifies the plumbing."""

    def __init__(self, stride: int = FRAME_STRIDE):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = {"media_id": [], "frame_idx": [], "offset": [], "n_bytes": []}
        for mid, kind, p in zip(df["media_id"], df["kind"], df["payload"]):
            if kind != "video":
                continue
            body = len(p) - 12
            n_frames = max(body, 0) // FRAME_BYTES + 1
            for fi in range(0, n_frames, self.stride):
                off = 12 + fi * FRAME_BYTES
                out["media_id"].append(int(mid))
                out["frame_idx"].append(fi)
                out["offset"].append(off)
                out["n_bytes"].append(min(FRAME_BYTES, len(p) - off))
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "frame_idx": pa.array(out["frame_idx"], pa.int64()),
            "offset": pa.array(out["offset"], pa.int64()),
            "n_bytes": pa.array(out["n_bytes"], pa.int64()),
        })


def frame_sample_ds(media_path: str, concurrency: int = 2, batch_size: int = 32):
    import ray.data as rd

    return (rd.read_parquet(media_path)
            .map_batches(FrameSampleStub, batch_format="pyarrow",
                         batch_size=batch_size, concurrency=(1, concurrency)))


EMBED_DIM = 8


class EmbedStub:
    """Feature-extract stage: payload → fixed-dim float vector (deterministic
    fake: md5 over the uppercase hex of the payload, bytes scaled to [0,1) —
    md5-of-hex so DuckDB, which lacks BLOB hashing, reproduces every value);
    output is a list<float> column with the same shape the similarity-search
    ops consume — a real model swap changes only ``_features``."""

    def __init__(self, dim: int = EMBED_DIM):
        self.dim = dim

    def _features(self, payload: bytes) -> list[float]:
        digest = hashlib.md5(payload.hex().upper().encode()).digest()
        return [digest[i] / 256.0 for i in range(self.dim)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.table({
            "media_id": pa.array(df["media_id"], pa.int64()),
            "kind": pa.array(df["kind"], pa.string()),
            "embedding": pa.array([self._features(p) for p in df["payload"]],
                                  pa.list_(pa.float64())),
        })


def embed_media_ds(media_path: str, concurrency: int = 2, batch_size: int = 32):
    import ray.data as rd

    return (rd.read_parquet(media_path)
            .map_batches(EmbedStub, batch_format="pyarrow",
                         batch_size=batch_size, concurrency=(1, concurrency)))


def embed_flat_ds(media_path: str, dim: int = EMBED_DIM):
    """Flattened embedding rows (media_id, kind, dim_idx, value) — the
    scalar-valued query/oracle surface of embed_media_ds (list<float>
    columns don't hash-compare portably across engines)."""

    def flatten(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        n = len(df)
        return from_pandas_clean(pd.DataFrame({
            "media_id": np.repeat(df["media_id"].to_numpy("int64"), dim),
            "kind": np.repeat(df["kind"].to_numpy(object), dim),
            "dim_idx": np.tile(np.arange(1, dim + 1, dtype="int64"), n),
            # byte/256 is an exact binary fraction — no rounding (a round-6
            # would hit banker's-vs-half-away ties on the *50 decimal tails)
            "value": (np.concatenate(
                [np.asarray(e, dtype="float64") for e in df["embedding"]])
                if n else np.array([], dtype="float64")),
        }))

    return embed_media_ds(media_path).map_batches(flatten, batch_format="pyarrow")


def media_stats_ds(media_path: str, use_real_codec="auto"):
    """Grouped size stats per kind over the decoded stream."""
    from ray.data.aggregate import Max, Min, Sum

    import pyarrow.compute as pc  # noqa: F401

    def one(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    return (decode_media_ds(media_path, use_real_codec=use_real_codec)
            .map_batches(one, batch_format="pyarrow")
            .groupby("kind")
            .aggregate(Sum("n_bytes", alias_name="total_bytes"),
                       Min("width", alias_name="min_width"),
                       Max("height", alias_name="max_height"),
                       Sum("one", alias_name="n_media")))


# ---------------------------------------------------------------------------
# perceptual-hash image dedup (stubbed "pixels": deterministic body-byte
# sampling standing in for the DCT of a decoded image — the Ray plumbing,
# banding shuffle and verify are the real production shape)
# ---------------------------------------------------------------------------

PHASH_BITS = 63          # top bit left clear so the hash is a clean int64
PHASH_STRIDE = 7         # body-byte sampling stride (coprime with 256)
PHASH_MAX_HAMMING = 3    # < n_bands, so banding has ZERO recall loss
_PHASH_BANDS = ((0, 16), (16, 16), (32, 16), (48, 15))  # 4 slices of 63 bits


def _phash_body(body: bytes) -> int:
    """63-bit hash of raw body bytes: bit k = (byte at (k·7) mod len) ≥ 128.
    No header sniffing — callers strip any header first (frame slices have
    none, so the SQL twin needs no MAGIC branch per frame)."""
    if not body:
        return 0
    v = 0
    for k in range(PHASH_BITS):
        if body[(k * PHASH_STRIDE) % len(body)] >= 128:
            v |= 1 << k
    return v


def _phash_value(payload: bytes) -> int:
    """63-bit perceptual hash of a payload: bit k = (body byte at position
    (k·7) mod len(body)) ≥ 128. With a real codec this is where the
    grayscale-DCT pHash goes; the sampling stub keeps the value exactly
    reproducible in SQL byte math (the oracle twin)."""
    boff = 12 if (len(payload) >= 12 and payload[:4] == MAGIC) else 0
    return _phash_body(payload[boff:])


class PhashStub:
    """Actor-pool feature-extract stage: per-payload perceptual hash."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        v = np.fromiter((_phash_value(p) for p in df["payload"]),
                        dtype=np.int64, count=len(df))
        return pa.table({
            "media_id": pa.array(df["media_id"].to_numpy("int64")),
            "kind": pa.array(df["kind"], pa.string()),
            "phash": pa.array(v),
            "phash_hex": pa.array([format(x, "016x") for x in v],
                                  pa.string())})


def phash_media_ds(media_path: str, concurrency: int = 2,
                   batch_size: int = 32):
    """Per-media perceptual hash — small batches (binary payloads), actor
    pool, pruned projection on the way out (payload never leaves the
    stage)."""
    import ray.data as rd

    return rd.read_parquet(media_path).map_batches(
        PhashStub, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))


def phash_dups_ds(media_path: str, max_hamming: int = PHASH_MAX_HAMMING,
                  concurrency: int = 2):
    """Near-duplicate media pairs by perceptual-hash hamming distance.

    Scale shape — the SimHash banding pattern: each hash ships 4 (band,
    16-bit slice) rows; candidates are pairs sharing a band bucket (the
    groupby shuffle moves 32 bytes/row, never payloads); each candidate is
    verified with one exact popcount. max_hamming (3) < n_bands (4), so by
    pigeonhole every qualifying pair shares at least one full band — the
    banding loses NOTHING and the result equals the all-pairs SQL twin."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    def band_rows(t: pa.Table) -> pa.Table:
        v = np.asarray(t["phash"], dtype=np.int64)
        ids = np.asarray(t["media_id"], dtype=np.int64)
        outs = []
        for bi, (off, width) in enumerate(_PHASH_BANDS):
            outs.append(pa.table({
                "band": pa.array(np.full(len(v), bi, np.int8)),
                "val": pa.array((v >> off) & ((1 << width) - 1)),
                "media_id": pa.array(ids),
                "phash": pa.array(v)}))
        return pa.concat_tables(outs)

    def bucket_pairs(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values("media_id").reset_index(drop=True)
        ids = df["media_id"].to_numpy("int64")
        v = df["phash"].to_numpy("int64").astype(np.uint64)
        n = len(df)
        ai, bi = np.triu_indices(n, k=1)
        ham = np.array([int(x).bit_count()
                        for x in (v[ai] ^ v[bi])], dtype=np.int64)
        keep = ham <= max_hamming
        return pa.table({"media_a": pa.array(ids[ai][keep]),
                         "media_b": pa.array(ids[bi][keep]),
                         "hamming": pa.array(ham[keep])})

    return (phash_media_ds(media_path, concurrency=concurrency)
            .map_batches(band_rows, batch_format="pyarrow")
            .groupby(["band", "val"])
            .map_groups(bucket_pairs, batch_format="pandas")
            .groupby(["media_a", "media_b"])
            .aggregate(Min("hamming", alias_name="hamming"))
            .map_batches(lambda t: pa.table({
                "media_a": pc.cast(t["media_a"], pa.int64()),
                "media_b": pc.cast(t["media_b"], pa.int64()),
                "hamming": pc.cast(t["hamming"], pa.int64())}),
                batch_format="pyarrow"))


SCENE_CUT_MIN_HAMMING = 16   # random frames sit at ~31 of 63, same-scene at 0


class SceneCutStub:
    """Scene-cut detector over video payloads: per-FRAME perceptual hash at
    the sampling stride, Hamming distance between CONSECUTIVE sampled
    frames, cut flag at ≥ SCENE_CUT_MIN_HAMMING. The whole window lives
    inside one payload row, so the stage is a pure flat-map — per-video
    parallel, ZERO shuffle at any corpus size (the realistic shape: real
    scene detection is sequential within a video, independent across
    videos). With a real codec the per-frame hash becomes a grayscale-DCT
    pHash of the decoded frame; the byte-math stub keeps every value
    reproducible in SQL (the oracle twin)."""

    def __init__(self, stride: int = FRAME_STRIDE,
                 min_hamming: int = SCENE_CUT_MIN_HAMMING):
        self.stride = stride
        self.min_hamming = min_hamming

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = {"media_id": [], "prev_frame_idx": [], "frame_idx": [],
               "hamming": [], "is_cut": []}
        for mid, kind, p in zip(df["media_id"], df["kind"], df["payload"]):
            if kind != "video":
                continue
            body = len(p) - 12
            n_frames = max(body, 0) // FRAME_BYTES + 1
            prev_fi, prev_ph = None, 0
            for fi in range(0, n_frames, self.stride):
                off = 12 + fi * FRAME_BYTES
                ph = _phash_body(p[off:off + FRAME_BYTES])
                if prev_fi is not None:
                    ham = (ph ^ prev_ph).bit_count()
                    out["media_id"].append(int(mid))
                    out["prev_frame_idx"].append(prev_fi)
                    out["frame_idx"].append(fi)
                    out["hamming"].append(ham)
                    out["is_cut"].append(int(ham >= self.min_hamming))
                prev_fi, prev_ph = fi, ph
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "prev_frame_idx": pa.array(out["prev_frame_idx"], pa.int64()),
            "frame_idx": pa.array(out["frame_idx"], pa.int64()),
            "hamming": pa.array(out["hamming"], pa.int64()),
            "is_cut": pa.array(out["is_cut"], pa.int64()),
        })


def scene_cuts_ds(media_path: str, concurrency: int = 2,
                  batch_size: int = 32):
    """Consecutive sampled-frame hash deltas per video + cut flags."""
    import ray.data as rd

    return (rd.read_parquet(media_path)
            .map_batches(SceneCutStub, batch_format="pyarrow",
                         batch_size=batch_size, concurrency=(1, concurrency)))


SILENCE_MAX_AMP = 32     # body byte < 32 counts as silence (stub amplitude)
SILENCE_MIN_RUN = 64     # minimum run length (bytes) to report a segment


class SilenceSegmentStub:
    """VAD-style silence segmentation over audio payloads: maximal runs of
    body bytes below SILENCE_MAX_AMP, reported when the run is at least
    SILENCE_MIN_RUN bytes — run-length encoding per payload, vectorized
    (np.diff on the threshold mask), one input row → k segment rows. Like
    the scene-cut stage the whole computation lives inside one payload row:
    pure flat-map, per-clip parallel, zero shuffle at any corpus size. A
    real pipeline swaps the byte threshold for a decoded-sample energy
    gate; the byte-math stub keeps every offset reproducible in SQL (the
    gaps-and-islands oracle twin)."""

    def __init__(self, max_amp: int = SILENCE_MAX_AMP,
                 min_run: int = SILENCE_MIN_RUN):
        self.max_amp = max_amp
        self.min_run = min_run

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = {"media_id": [], "start_off": [], "end_off": [],
               "n_bytes": []}
        for mid, kind, p in zip(df["media_id"], df["kind"], df["payload"]):
            if kind != "audio" or len(p) <= 12:
                continue
            body = np.frombuffer(p, dtype=np.uint8, offset=12)
            sil = body < self.max_amp
            # run boundaries: diff of the padded mask marks starts/ends
            edges = np.flatnonzero(np.diff(
                np.concatenate(([0], sil.view(np.int8), [0]))))
            starts, ends = edges[::2], edges[1::2]
            keep = (ends - starts) >= self.min_run
            for s, t in zip(starts[keep], ends[keep]):
                out["media_id"].append(int(mid))
                out["start_off"].append(int(s) + 12)
                out["end_off"].append(int(t) + 12)
                out["n_bytes"].append(int(t - s))
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "start_off": pa.array(out["start_off"], pa.int64()),
            "end_off": pa.array(out["end_off"], pa.int64()),
            "n_bytes": pa.array(out["n_bytes"], pa.int64())})


def silence_segments_ds(media_path: str, concurrency: int = 2,
                        batch_size: int = 32):
    """Maximal sub-threshold runs per audio clip (start/end body offsets)."""
    import ray.data as rd

    return (rd.read_parquet(media_path)
            .map_batches(SilenceSegmentStub, batch_format="pyarrow",
                         batch_size=batch_size, concurrency=(1, concurrency)))

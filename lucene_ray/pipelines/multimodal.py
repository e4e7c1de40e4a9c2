"""Multimodal (image/audio/video) column plumbing — real Ray-side pipeline,
stubbed codecs.

Media payloads ride as opaque ``binary`` columns with typed metadata
(mime, width/height/duration). The decode / feature-extraction stages are
actor-pool ``map_batches`` callables whose *plumbing* (schema, batch
sizing for large blobs, actor signature, deterministic output layout) is
real and tested; the actual codec calls are stubbed because no image/audio
libraries exist in this environment:

* ``DecodeImageStub`` raises ``NotImplementedError`` when ``strict=True``
  (the honest production stub), or emits a deterministic fake feature
  vector derived from the payload bytes when ``strict=False`` (so the
  downstream pipeline — resize metadata, feature vectors, ANN over them —
  is exercised end-to-end).

Batch sizing note (scale): media blobs are MBs, so callers must use small
``batch_size`` (default 64) and rely on Arrow binary columns staying
off-heap; never convert these columns to pandas.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_ray.pipelines.dedup import _mix64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (binary payloads of varying size)."""
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    sizes = rng.integers(128, 4096, size=n)
    payloads = [rng.integers(0, 256, size=s, dtype=np.uint8).tobytes() for s in sizes]
    w = rng.integers(64, 1920, size=n).astype(np.int32)
    h = rng.integers(64, 1080, size=n).astype(np.int32)
    mime = np.where(ids % 3 == 0, "image/jpeg", "image/png")
    return pa.table(
        {
            "media_id": ids,
            "mime": mime,
            "payload": pa.array(payloads, type=pa.binary()),
            "width": w,
            "height": h,
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeImageStub:
    """Actor-pool decode stage. ``__init__`` is where a real build would
    load the codec / model weights once per actor."""

    FEATURE_DIM = 16

    def __init__(self, strict: bool = False):
        self.strict = strict
        # real pipeline: self.model = load_model(...) — once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image decode requires an image library not present in this "
                "environment; run with strict=False for the deterministic "
                "fake-feature path"
            )
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        feats = np.empty((batch.num_rows, self.FEATURE_DIM), dtype=np.float32)
        for i, p in enumerate(payloads.to_pylist()):
            a = np.frombuffer(p, dtype=np.uint8)
            # deterministic fake features: mixed chunk sums
            pad = (-a.shape[0]) % self.FEATURE_DIM
            a = np.pad(a, (0, pad)).reshape(-1, self.FEATURE_DIM)
            feats[i] = _mix64(a.sum(axis=0).astype(np.uint64))[: self.FEATURE_DIM] % 1000 / 1000.0
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "width": batch["width"],
                "height": batch["height"],
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), self.FEATURE_DIM
                ),
            }
        )


def decode_features(media_ds, concurrency: int = 2, batch_size: int = 64,
                    strict: bool = False):
    """media rows -> per-item feature vectors via the actor-pool stub."""
    import functools

    return media_ds.map_batches(
        functools.partial(_decode_call, strict=strict)
        if strict
        else DecodeImageStub,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _decode_call(batch: pa.Table, strict: bool) -> pa.Table:
    return DecodeImageStub(strict=strict)(batch)


def resize_metadata(media_ds, max_side: int = 256):
    """Vectorized resize planning (keeps aspect): the metadata half of an
    image-resize stage, exercising the schema without a codec."""

    def plan(b: pa.Table) -> pa.Table:
        w = b["width"].to_numpy().astype(np.float64)
        h = b["height"].to_numpy().astype(np.float64)
        scale = np.minimum(1.0, max_side / np.maximum(w, h))
        return pa.table(
            {
                "media_id": b["media_id"],
                "out_width": np.maximum(1, np.round(w * scale)).astype(np.int32),
                "out_height": np.maximum(1, np.round(h * scale)).astype(np.int32),
                "scale": scale,
            }
        )

    return media_ds.map_batches(plan, batch_format="pyarrow")


VIDEO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("duration_ms", pa.int64()),
    ]
)


def synth_video_table(n: int, seed: int = 7) -> pa.Table:
    """Deterministic fake video rows (binary payloads + duration)."""
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    sizes = rng.integers(1024, 8192, size=n)
    payloads = [rng.integers(0, 256, size=s, dtype=np.uint8).tobytes()
                for s in sizes]
    dur = rng.integers(1_000, 120_000, size=n).astype(np.int64)
    return pa.table({
        "media_id": ids,
        "mime": np.full(n, "video/mp4", dtype=object),
        "payload": pa.array(payloads, type=pa.binary()),
        "duration_ms": dur,
    }, schema=VIDEO_SCHEMA)


class SampleFramesStub:
    """Actor-pool frame-sampling stage — the video leg of the brief's
    decode/feature-extract/resize/frame-sample set. ``__init__`` is
    where a real build would open the demuxer once per actor; the frame
    PLAN (which timestamps to sample) is real, the decoded frame is a
    deterministic fake slice of the payload (or ``NotImplementedError``
    in strict mode, the honest production stub)."""

    def __init__(self, every_ms: int = 10_000, max_frames: int = 16,
                 strict: bool = False):
        self.every_ms = int(every_ms)
        self.max_frames = int(max_frames)
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "no video codec in this environment; run with strict=False "
                "for the deterministic fake-frame plumbing")
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        dur = batch["duration_ms"].to_numpy(zero_copy_only=False)
        pay = batch["payload"]
        if isinstance(pay, pa.ChunkedArray):
            pay = pay.combine_chunks()
        # frame plan: one frame per every_ms, capped — vectorized counts,
        # per-frame rows via repeat + intra index
        n_frames = np.minimum(dur // self.every_ms + 1,
                              self.max_frames).astype(np.int64)
        out_id = np.repeat(ids, n_frames)
        starts = np.cumsum(n_frames) - n_frames
        intra = (np.arange(int(n_frames.sum()), dtype=np.int64)
                 - np.repeat(starts, n_frames))
        ts = intra * self.every_ms
        # deterministic fake frame: a 32-byte payload slice keyed by the
        # frame index (a real stage would decode at ts)
        frames = []
        for row, k in zip(range(batch.num_rows), n_frames):
            raw = pay[row].as_py()
            for j in range(int(k)):
                off = (j * 37) % max(1, len(raw) - 32)
                frames.append(raw[off:off + 32])
        return pa.table({
            "media_id": pa.array(out_id),
            "frame_idx": pa.array(intra),
            "ts_ms": pa.array(ts),
            "frame": pa.array(frames, type=pa.binary()),
        })


def sample_frames(video_ds, every_ms: int = 10_000, max_frames: int = 16,
                  concurrency: int = 2, batch_size: int = 16,
                  strict: bool = False):
    """Frame-sample a video Dataset: one output row per planned frame.
    Small batches (blobs are MBs) on a stateful actor pool, like the
    image decode stage."""
    return video_ds.map_batches(
        SampleFramesStub,
        fn_constructor_kwargs={"every_ms": every_ms,
                               "max_frames": max_frames, "strict": strict},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )

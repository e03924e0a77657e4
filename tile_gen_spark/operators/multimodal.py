"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Driver mandate: "treat image/audio/video as opaque binary columns with typed
metadata; implement decode / feature-extract / resize / frame-sample as
Pandas UDFs over mapInPandas — the image/audio libs aren't in this container,
so STUB the decode step ... and make the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) real and tested."

Stub policy: ``_decode_real`` raises NotImplementedError unless PIL/av import
succeeds (they don't here); every operator instead routes through
``_decode_fake`` — a DETERMINISTIC fake that derives a pixel/sample grid from
the payload bytes via splitmix64, so downstream operators (resize, embed,
frame-sample, ANN) exercise real numerics on stable data.

At 100 TB: payloads stay in parquet/iceberg binary columns, never hit the
driver; every crossing is an Arrow batch; metadata filters (kind, width,
duration) prune relationally BEFORE any payload is deserialized.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.kernels import h64

MEDIA_SCHEMA = ("media_id bigint, kind string, payload binary, "
                "width int, height int, duration_ms int, codec string")

DECODE_SCHEMA = ("media_id bigint, kind string, width int, height int, "
                 "mean_px double, std_px double, n_bytes int")

EMBED_SCHEMA = "media_id bigint, kind string, embedding array<float>"

FRAME_SCHEMA = ("media_id bigint, frame_idx int, t_ms int, mean_px double")


def _pil():
    try:
        import PIL.Image as Image
        return Image
    except ImportError:
        return None


def _av():
    try:
        import av
        return av
    except ImportError:
        return None


def _decode_real(payload: bytes, kind: str) -> np.ndarray:
    """Real decode → uint8 grid. Env-gated (TILEGEN_REAL_DECODE=1) and
    import-gated: this container has no PIL/av/cv2, so here it raises
    NotImplementedError and everything routes through the deterministic
    fake — but each path is executable (and golden-tested,
    tests/test_multimodal.py) wherever its codec lib is installed.

    image → PIL grayscale (H, W); audio → av-decoded mono waveform mapped
    from the sample dtype's full scale onto 0..255, shape (1, n_samples);
    video → use _decode_real_frames (per-frame timestamps matter)."""
    import io
    if kind == "image":
        Image = _pil()
        if Image is None:
            raise NotImplementedError(
                "PIL not installed in this environment; "
                "use the deterministic fake decode (STUB)")
        return np.asarray(Image.open(io.BytesIO(payload)).convert("L"),
                          dtype=np.uint8)
    if kind == "audio":
        av = _av()
        if av is None:
            raise NotImplementedError(
                "av not installed in this environment; "
                "use the deterministic fake decode (STUB)")
        with av.open(io.BytesIO(payload)) as c:
            frames = [f.to_ndarray() for f in c.decode(audio=0)]
        if not frames:
            return np.zeros((1, 1), dtype=np.uint8)
        s = np.concatenate(frames, axis=-1)
        mono = s.astype(np.float64).reshape(s.shape[0], -1).mean(axis=0)
        if np.issubdtype(s.dtype, np.integer):
            full = float(np.iinfo(s.dtype).max) + 1.0
            mono = mono / full                       # → [-1, 1)
        return np.clip(mono * 127.5 + 127.5, 0, 255).astype(
            np.uint8).reshape(1, -1)
    if kind == "video":
        raise NotImplementedError(
            "video decodes per-frame: use _decode_real_frames")
    raise NotImplementedError(f"unknown media kind {kind!r}")


def _decode_real_frames(payload: bytes, every_ms: int) -> list[tuple[int, np.ndarray]]:
    """Real video decode via av → [(t_ms, gray uint8 frame)] sampled every
    ``every_ms``: for each sample instant the latest frame at-or-before it
    (a tile-server-style keyframe walk, not an exhaustive decode contract).
    Import-gated like _decode_real."""
    av = _av()
    if av is None:
        raise NotImplementedError(
            "av not installed in this environment; "
            "use the deterministic fake decode (STUB)")
    import io
    with av.open(io.BytesIO(payload)) as c:
        stream = c.streams.video[0]
        tb = float(stream.time_base) if stream.time_base else 0.0
        frames = []
        for f in c.decode(stream):
            t = (float(f.pts) * tb if f.pts is not None and tb
                 else (float(f.time) if f.time is not None else 0.0))
            frames.append((int(round(t * 1000)),
                           f.to_ndarray(format="gray")))
    if not frames:
        return []
    frames.sort(key=lambda p: p[0])
    dur_ms = frames[-1][0] + every_ms  # last frame covers its interval
    out = []
    j = 0
    for t in range(0, dur_ms, every_ms):
        while j + 1 < len(frames) and frames[j + 1][0] <= t:
            j += 1
        out.append((t, frames[j][1]))
    return out


def _use_real_decode() -> bool:
    """Driver-side gate (resolved when the operator builds its UDF, so the
    flag ships in the task closure rather than depending on worker env)."""
    import os
    return (os.environ.get("TILEGEN_REAL_DECODE", "0") == "1"
            and (_pil() is not None or _av() is not None))


def _real_or_fake(use_real: bool):
    """Executor-side decode chooser (ADVICE r5 #5): the driver gate saying
    'real' does not imply the codec lib imports on THIS worker — a cluster
    with PIL/av only on the driver used to fail tasks with
    NotImplementedError at runtime. The wrapper attempts the real decode
    and degrades to the deterministic fake with one stderr note per worker
    instead of failing the batch."""
    # r7 (ADVICE r6): fallback tracked PER KIND — one shared flag let the
    # first audio row on a PIL-but-no-av worker (a config the driver gate's
    # "pil or av" explicitly allows) permanently flip ALL kinds to the fake,
    # making image output row-order-dependent within the task.
    state = {"image": use_real, "audio": use_real}

    def decode(payload: bytes, kind: str, w: int, h: int) -> np.ndarray:
        if state.get(kind):
            try:
                return _decode_real(payload, kind)
            except NotImplementedError as e:
                import sys
                print(f"[multimodal] real {kind} decode unavailable on this "
                      f"worker ({e}); using deterministic fake",
                      file=sys.stderr)
                state[kind] = False
        return _decode_fake(payload, w, h)

    return decode


def _decode_fake(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode: deterministic uint8 grid from payload bytes. Marked fake;
    the Spark-side batch plumbing around it is the real deliverable."""
    seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    idx = np.arange(width * height, dtype=np.uint64)
    return (h64(idx, int(seed % (1 << 31))) % np.uint64(256)).astype(
        np.uint8).reshape(height, width)


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media corpus (counter-based, partition-invariant)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = np.array(["image", "audio", "video"])
        codecs = np.array(["png", "jpeg", "opus", "h264"])
        for b in batches:
            i = b["id"].to_numpy(np.uint64)
            kind = kinds[(h64(i, seed, 1) % np.uint64(3)).astype(np.int64)]
            w = (16 + h64(i, seed, 2) % np.uint64(48)).astype(np.int64)
            h = (16 + h64(i, seed, 3) % np.uint64(48)).astype(np.int64)
            dur = np.where(kind == "image", 0,
                           (h64(i, seed, 4) % np.uint64(60000)).astype(np.int64))
            payload = [h64(np.arange(32, dtype=np.uint64) + ii * np.uint64(97), seed, 5)
                       .astype(np.uint64).tobytes() for ii in i]
            yield pd.DataFrame({
                "media_id": i.astype(np.int64),
                "kind": pd.Series(kind, dtype="string"),
                "payload": pd.Series(payload, dtype=object),
                "width": pd.Series(w, dtype="int32"),
                "height": pd.Series(h, dtype="int32"),
                "duration_ms": pd.Series(dur, dtype="int32"),
                "codec": pd.Series(codecs[(h64(i, seed, 6) % np.uint64(4)).astype(np.int64)],
                                   dtype="string"),
            })

    return spark.range(n).mapInPandas(fn, MEDIA_SCHEMA)


def decode_stats(media: DataFrame) -> DataFrame:
    """Decode → per-item pixel stats; Arrow-batched, no driver I/O. Decode is
    the stub unless TILEGEN_REAL_DECODE=1 AND PIL imports (then image
    payloads decode for real; dims come from the decoded grid)."""
    use_real = _use_real_decode()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _real_or_fake(use_real)
        for b in batches:
            out = {k: [] for k in ("media_id", "kind", "width", "height",
                                   "mean_px", "std_px", "n_bytes")}
            for mid, kind, payload, w, h in zip(
                    b["media_id"], b["kind"], b["payload"], b["width"], b["height"]):
                grid = decode(bytes(payload), str(kind), int(w), int(h))
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["width"].append(int(grid.shape[1]))
                out["height"].append(int(grid.shape[0]))
                out["mean_px"].append(round(float(grid.mean()), 4))
                out["std_px"].append(round(float(grid.std()), 4))
                out["n_bytes"].append(len(payload))
            yield pd.DataFrame({
                "media_id": pd.Series(out["media_id"], dtype="int64"),
                "kind": pd.Series(out["kind"], dtype="string"),
                "width": pd.Series(out["width"], dtype="int32"),
                "height": pd.Series(out["height"], dtype="int32"),
                "mean_px": pd.Series(out["mean_px"], dtype="float64"),
                "std_px": pd.Series(out["std_px"], dtype="float64"),
                "n_bytes": pd.Series(out["n_bytes"], dtype="int32"),
            })

    return media.mapInPandas(fn, DECODE_SCHEMA)


def resize_stats(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Resize (block mean over the decoded grid) → stats of the resized
    image. Same decode gate as decode_stats."""
    use_real = _use_real_decode()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _real_or_fake(use_real)
        for b in batches:
            rows = {k: [] for k in ("media_id", "kind", "width", "height",
                                    "mean_px", "std_px", "n_bytes")}
            for mid, kind, payload, w, h in zip(
                    b["media_id"], b["kind"], b["payload"], b["width"], b["height"]):
                grid = decode(bytes(payload), str(kind), int(w), int(h)
                              ).astype(np.float64)
                # degenerate axes (e.g. real audio's (1, n) waveform grid):
                # nearest-repeat up to the target so every block is non-empty
                if grid.shape[0] < out_h:
                    grid = np.repeat(grid, -(-out_h // grid.shape[0]), axis=0)
                if grid.shape[1] < out_w:
                    grid = np.repeat(grid, -(-out_w // grid.shape[1]), axis=1)
                ys = np.linspace(0, grid.shape[0], out_h + 1).astype(int)
                xs = np.linspace(0, grid.shape[1], out_w + 1).astype(int)
                small = np.array([[grid[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
                                   for j in range(out_w)] for i in range(out_h)])
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                rows["width"].append(out_w)
                rows["height"].append(out_h)
                rows["mean_px"].append(round(float(small.mean()), 4))
                rows["std_px"].append(round(float(small.std()), 4))
                rows["n_bytes"].append(out_w * out_h)
            yield pd.DataFrame({
                "media_id": pd.Series(rows["media_id"], dtype="int64"),
                "kind": pd.Series(rows["kind"], dtype="string"),
                "width": pd.Series(rows["width"], dtype="int32"),
                "height": pd.Series(rows["height"], dtype="int32"),
                "mean_px": pd.Series(rows["mean_px"], dtype="float64"),
                "std_px": pd.Series(rows["std_px"], dtype="float64"),
                "n_bytes": pd.Series(rows["n_bytes"], dtype="int32"),
            })

    return media.mapInPandas(fn, DECODE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 10000) -> DataFrame:
    """Video frame sampling: one row per sampled frame timestamp. With
    TILEGEN_REAL_DECODE=1 and av importable on the worker, frames come from
    the real container stream (latest frame at-or-before each instant);
    otherwise the deterministic fake varies per sampled t. Worker-side
    import failures degrade to the fake (ADVICE r5 #5), never fail tasks."""
    use_real = _use_real_decode()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real_ok = use_real
        for b in batches:
            rows = {k: [] for k in ("media_id", "frame_idx", "t_ms", "mean_px")}
            for mid, payload, w, h, dur in zip(
                    b["media_id"], b["payload"], b["width"], b["height"], b["duration_ms"]):
                if real_ok:
                    try:
                        for fi, (t, frame) in enumerate(
                                _decode_real_frames(bytes(payload), every_ms)):
                            rows["media_id"].append(mid)
                            rows["frame_idx"].append(fi)
                            rows["t_ms"].append(t)
                            rows["mean_px"].append(round(float(frame.mean()), 4))
                        continue
                    except NotImplementedError as e:
                        import sys
                        print(f"[multimodal] real video decode unavailable "
                              f"on this worker ({e}); using deterministic "
                              f"fake", file=sys.stderr)
                        real_ok = False
                for fi, t in enumerate(range(0, int(dur), every_ms)):
                    frame = _decode_fake(t.to_bytes(4, "little") + bytes(payload),
                                         int(w), int(h))
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(fi)
                    rows["t_ms"].append(t)
                    rows["mean_px"].append(round(float(frame.mean()), 4))
            yield pd.DataFrame({
                "media_id": pd.Series(rows["media_id"], dtype="int64"),
                "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                "t_ms": pd.Series(rows["t_ms"], dtype="int32"),
                "mean_px": pd.Series(rows["mean_px"], dtype="float64"),
            })

    return (media.filter("kind = 'video' AND duration_ms > 0")
            .mapInPandas(fn, FRAME_SCHEMA))


def embed_media(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction (stub): deterministic float vector per payload —
    feeds the same ANN/similarity operators as text embeddings."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, kinds, vecs = [], [], []
            for mid, kind, payload in zip(b["media_id"], b["kind"], b["payload"]):
                seed = int.from_bytes(bytes(payload)[:4], "little")
                v = (h64(np.arange(dim, dtype=np.uint64), seed).astype(np.float64)
                     / float(1 << 64)) * 2.0 - 1.0
                ids.append(mid)
                kinds.append(kind)
                vecs.append(v.astype(np.float32).tolist())
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "kind": pd.Series(kinds, dtype="string"),
                "embedding": pd.Series(vecs, dtype=object),
            })

    return media.mapInPandas(fn, EMBED_SCHEMA)

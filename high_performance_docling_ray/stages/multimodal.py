"""Multimodal stages: image/audio as opaque binary columns + typed metadata.

The decode/transform kernels the reference delegates to PIL/cv2/torch
(page-image render `lambda_preprocessor.py:29-34`, RT-DETR resize/
normalize `fork/layout/gpu_preprocess.py:396-496`, TrOCR crops
`gpu_processor.py:204-288`) are STUBBED here behind a deterministic
fake decoder — the imaging libraries are not in this container — while
the Ray-side plumbing is real and tested: schema, actor-pool stage
shape, per-batch vectorization, small batch sizes for wide rows, and
projection that drops the heavy column as soon as it is consumed
(SURVEY.md §7.4 wide-records rule).

Payload convention: ``media:binary`` with ``media_type`` metadata.
Deterministic fake images are ``IMG1`` + height:u16 + width:u16 +
seed bytes; ``decode_fake_image`` expands them to a (H, W, 3) uint8
array reproducibly. Real decoders drop in by replacing one function.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

IMG_MAGIC = b"IMG1"


class ImageDecodeError(ValueError):
    pass


def encode_fake_image(height: int, width: int, seed: bytes) -> bytes:
    """Deterministic stand-in for an encoded image payload."""
    return IMG_MAGIC + struct.pack("<HH", height, width) + seed


def decode_fake_image(payload: bytes) -> np.ndarray:
    """payload -> (H, W, 3) uint8. Deterministic; raises on bad magic.

    A real build replaces this one function with PIL/cv2 decode — the
    stage plumbing (batching, schema, projection) is unchanged.
    """
    if not payload or not payload.startswith(IMG_MAGIC):
        raise ImageDecodeError("not a fake image payload")
    h, w = struct.unpack_from("<HH", payload, 4)
    seed = payload[8:]
    digest = hashlib.blake2b(seed, digest_size=8).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Pure-numpy bilinear resize (RT-DETR preprocess semantics:
    640x640 bilinear, antialias off — gpu_preprocess.py:415-440)."""
    h, w = img.shape[:2]
    ys = np.linspace(0.0, h - 1.0, out_h)
    xs = np.linspace(0.0, w - 1.0, out_w)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    a = img[y0][:, x0].astype(np.float64)
    b = img[y0][:, x1].astype(np.float64)
    c = img[y1][:, x0].astype(np.float64)
    d = img[y1][:, x1].astype(np.float64)
    out = a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx
    return np.round(out).astype(np.uint8)


class ImageFeatureStage:
    """Actor-pool map_batches stage: decode -> resize -> feature vector.

    Mirrors the reference's model-preprocess shape (stateful setup once
    per actor in ``__init__`` — normalization constants, target size;
    per-batch vectorized work in ``__call__``). Use small
    ``batch_size`` (images are MB-scale rows) and drop the ``media``
    column in the returned batch so the heavy payload dies with the
    input block.
    """

    def __init__(self, target: int = 64) -> None:
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("media").to_pylist()
        out_id, out_h, out_w, out_mean, out_feat, out_ok = [], [], [], [], [], []
        for media_id, payload in zip(ids, payloads):
            try:
                img = decode_fake_image(payload or b"")
                small = resize_bilinear(img, self.target, self.target)
                feat = small.astype(np.float64).mean(axis=(0, 1)) / 255.0
                out_h.append(img.shape[0])
                out_w.append(img.shape[1])
                out_mean.append(round(float(img.mean()), 6))
                out_feat.append([round(float(v), 6) for v in feat])
                out_ok.append(True)
            except ImageDecodeError:
                out_h.append(0)
                out_w.append(0)
                out_mean.append(0.0)
                out_feat.append([0.0, 0.0, 0.0])
                out_ok.append(False)
            out_id.append(media_id)
        cols = {
            "media_id": pa.array(out_id, pa.int64()),
            "height": pa.array(out_h, pa.int32()),
            "width": pa.array(out_w, pa.int32()),
            "mean_intensity": pa.array(out_mean, pa.float64()),
            "rgb_feature": pa.array(out_feat, pa.list_(pa.float64())),
            "decode_ok": pa.array(out_ok, pa.bool_()),
        }
        # pass identifying metadata through (the heavy `media` payload
        # column is deliberately NOT copied — it dies with this block)
        for name in ("url", "page_no", "caption"):
            if name in batch.column_names:
                cols[name] = batch.column(name)
        return pa.Table.from_pydict(cols)


def synth_media_dataset(n: int, seed: int = 42):
    """Deterministic media table (media_id, media, media_type)."""
    import random

    import ray.data

    def gen(batch):
        ids = batch["id"].to_pylist()
        rows = {"media_id": [], "media": [], "media_type": []}
        for i in ids:
            rng = random.Random((seed << 16) ^ int(i))
            h = rng.randint(16, 128)
            w = rng.randint(16, 128)
            rows["media_id"].append(int(i))
            rows["media"].append(
                encode_fake_image(h, w, str(i).encode())
            )
            rows["media_type"].append("image/fake")
        return pa.Table.from_pydict(rows)

    return ray.data.range(n).map_batches(gen, batch_format="pyarrow")


def image_features(n: int = 256, concurrency=(1, 4), batch_size: int = 16):
    """Pipeline: synth media -> actor-pool decode/feature stage."""
    ds = synth_media_dataset(n)
    return ds.map_batches(
        ImageFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# -- audio ------------------------------------------------------------------

AUD_MAGIC = b"AUD1"


def encode_fake_audio(sample_rate: int, n_samples: int, seed: bytes) -> bytes:
    """Deterministic stand-in for an encoded audio payload."""
    return AUD_MAGIC + struct.pack("<II", sample_rate, n_samples) + seed


def decode_fake_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """payload -> (sample_rate, float32 waveform in [-1, 1]).

    A real build replaces this one function with soundfile/ffmpeg
    decode; the stage plumbing is unchanged."""
    if not payload or not payload.startswith(AUD_MAGIC):
        raise ImageDecodeError("not a fake audio payload")
    rate, n = struct.unpack_from("<II", payload, 4)
    seed = payload[12:]
    digest = hashlib.blake2b(seed, digest_size=8).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    wave = (rng.rand(n).astype(np.float32) * 2.0) - 1.0
    return rate, wave


class AudioFeatureStage:
    """Actor-pool map_batches stage over opaque ``media:binary`` audio:
    decode -> duration / RMS / zero-crossing-rate features. Same
    wide-row rules as images: small batches, the payload column is not
    copied into the output."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("media").to_pylist()
        out = {"media_id": [], "sample_rate": [], "duration_s": [],
               "rms": [], "zcr": [], "decode_ok": []}
        for media_id, payload in zip(ids, payloads):
            try:
                rate, wave = decode_fake_audio(payload or b"")
                zc = np.count_nonzero(np.signbit(wave[1:]) != np.signbit(wave[:-1]))
                out["sample_rate"].append(rate)
                out["duration_s"].append(round(len(wave) / rate, 6))
                out["rms"].append(round(float(np.sqrt(np.mean(wave ** 2))), 6))
                out["zcr"].append(round(zc / max(1, len(wave) - 1), 6))
                out["decode_ok"].append(True)
            except ImageDecodeError:
                out["sample_rate"].append(0)
                out["duration_s"].append(0.0)
                out["rms"].append(0.0)
                out["zcr"].append(0.0)
                out["decode_ok"].append(False)
            out["media_id"].append(media_id)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "sample_rate": pa.array(out["sample_rate"], pa.int32()),
                "duration_s": pa.array(out["duration_s"], pa.float64()),
                "rms": pa.array(out["rms"], pa.float64()),
                "zcr": pa.array(out["zcr"], pa.float64()),
                "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
            }
        )


# -- video ------------------------------------------------------------------

VID_MAGIC = b"VID1"


def encode_fake_video(n_frames: int, fps: int, height: int, width: int,
                      seed: bytes) -> bytes:
    """Deterministic stand-in for an encoded video payload."""
    return VID_MAGIC + struct.pack("<IHHH", n_frames, fps, height, width) + seed


def decode_fake_video_frame(payload: bytes, frame_no: int) -> np.ndarray:
    """Random-access decode of ONE frame (H, W, 3) — the shape a real
    ffmpeg/pyav frame seek has, so frame SAMPLING never decodes the
    whole clip."""
    if not payload or not payload.startswith(VID_MAGIC):
        raise ImageDecodeError("not a fake video payload")
    n, _fps, h, w = struct.unpack_from("<IHHH", payload, 4)
    if not 0 <= frame_no < n:
        raise ImageDecodeError(f"frame {frame_no} out of range {n}")
    seed = payload[14:] + struct.pack("<I", frame_no)
    digest = hashlib.blake2b(seed, digest_size=8).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def video_meta(payload: bytes) -> tuple[int, int, int, int]:
    if not payload or not payload.startswith(VID_MAGIC):
        raise ImageDecodeError("not a fake video payload")
    n, fps, h, w = struct.unpack_from("<IHHH", payload, 4)
    return n, fps, h, w


class VideoFrameSampleStage:
    """Actor-pool stage: frame-sample every ``stride``-th frame of each
    clip and emit ONE ROW PER SAMPLED FRAME with its features — the
    explode shape for video (a clip fans out across the pool without
    its payload being decoded whole)."""

    def __init__(self, stride: int = 10, target: int = 32) -> None:
        self.stride = stride
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_no": [], "ts_s": [],
               "mean_intensity": [], "decode_ok": []}
        for media_id, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("media").to_pylist(),
        ):
            try:
                n, fps, _h, _w = video_meta(payload or b"")
            except ImageDecodeError:
                out["media_id"].append(media_id)
                out["frame_no"].append(-1)
                out["ts_s"].append(0.0)
                out["mean_intensity"].append(0.0)
                out["decode_ok"].append(False)
                continue
            for f in range(0, n, self.stride):
                frame = decode_fake_video_frame(payload, f)
                small = resize_bilinear(frame, self.target, self.target)
                out["media_id"].append(media_id)
                out["frame_no"].append(f)
                out["ts_s"].append(round(f / max(1, fps), 6))
                out["mean_intensity"].append(round(float(small.mean()), 6))
                out["decode_ok"].append(True)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_no": pa.array(out["frame_no"], pa.int32()),
                "ts_s": pa.array(out["ts_s"], pa.float64()),
                "mean_intensity": pa.array(out["mean_intensity"], pa.float64()),
                "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
            }
        )


def synth_audio_dataset(n: int, seed: int = 42):
    import random

    import ray.data

    def gen(batch):
        rows = {"media_id": [], "media": [], "media_type": []}
        for i in batch["id"].to_pylist():
            rng = random.Random((seed << 17) ^ int(i))
            rows["media_id"].append(int(i))
            rows["media"].append(
                encode_fake_audio(
                    rng.choice([8000, 16000, 44100]),
                    rng.randint(1000, 40000),
                    str(i).encode(),
                )
            )
            rows["media_type"].append("audio/fake")
        return pa.Table.from_pydict(rows)

    return ray.data.range(n).map_batches(gen, batch_format="pyarrow")


def synth_video_dataset(n: int, seed: int = 42):
    import random

    import ray.data

    def gen(batch):
        rows = {"media_id": [], "media": [], "media_type": []}
        for i in batch["id"].to_pylist():
            rng = random.Random((seed << 18) ^ int(i))
            rows["media_id"].append(int(i))
            rows["media"].append(
                encode_fake_video(
                    rng.randint(5, 120), rng.choice([10, 24, 30]),
                    rng.randint(16, 64), rng.randint(16, 64),
                    str(i).encode(),
                )
            )
            rows["media_type"].append("video/fake")
        return pa.Table.from_pydict(rows)

    return ray.data.range(n).map_batches(gen, batch_format="pyarrow")


def audio_features(n: int = 256, concurrency=(1, 4), batch_size: int = 32):
    return synth_audio_dataset(n).map_batches(
        AudioFeatureStage, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


def video_frame_features(n: int = 64, stride: int = 10,
                         concurrency=(1, 4), batch_size: int = 8):
    return synth_video_dataset(n).map_batches(
        VideoFrameSampleStage, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"stride": stride},
    )


# -- perceptual-hash image dedup ----------------------------------------------

def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash: grayscale -> 9x8 bilinear -> horizontal
    gradient sign bits. Identical pixels give identical hashes; small
    perturbations flip few bits (the standard pHash-family property).
    The hash itself is real — only the decode behind it is the
    container's deterministic stub."""
    gray = img.astype(np.float64).mean(axis=2)
    small = resize_bilinear(
        np.repeat(gray[:, :, None], 3, axis=2).astype(np.uint8), 8, 9
    )[:, :, 0].astype(np.int16)
    bits = (small[:, 1:] > small[:, :-1]).flatten()
    return int(np.packbits(bits).view(">u8")[0])


class PHashStage:
    """Actor-pool stage: decode -> dHash. Emits only (media_id,
    phash) key rows — the MB-scale payload dies with the input block,
    so the downstream dedup groupby is key-only."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("media").to_pylist()
        out_id, out_h, out_ok = [], [], []
        for media_id, payload in zip(ids, payloads):
            try:
                img = decode_fake_image(payload or b"")
                out_h.append(dhash64(img))
                out_ok.append(True)
            except ImageDecodeError:
                out_h.append(0)
                out_ok.append(False)
            out_id.append(media_id)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "phash": pa.array(
                    np.array(out_h, np.uint64).view(np.int64), pa.int64()
                ),
                "decode_ok": pa.array(out_ok, pa.bool_()),
            }
        )


def synth_media_with_dups(n: int, seed: int = 42):
    """The synth media table with PLANTED perceptual duplicates:
    media_id % 10 == 7 carries the PAYLOAD of media_id - 3 (identical
    pixels after decode => identical dHash)."""
    import random

    import ray.data

    def gen(batch):
        ids = batch["id"].to_pylist()
        rows = {"media_id": [], "media": [], "media_type": []}
        for i in ids:
            src = int(i) - 3 if (int(i) % 10 == 7 and int(i) >= 3) else int(i)
            rng = random.Random((seed << 16) ^ src)
            h = rng.randint(16, 128)
            w = rng.randint(16, 128)
            rows["media_id"].append(int(i))
            rows["media"].append(encode_fake_image(h, w, str(src).encode()))
            rows["media_type"].append("image/fake")
        return pa.Table.from_pydict(rows)

    return ray.data.range(n).map_batches(gen, batch_format="pyarrow")


def image_phash_dedup(
    n: int = 256, concurrency=(1, 4), batch_size: int = 16
):
    """Perceptual image dedup: decode+hash in an actor pool (key rows
    out), then ONE key-only groupby(phash) Min+Count — each image
    reports its group's canonical member and size.

    Returns (media_id, phash, canonical_id, group_size) via a
    cogroup re-attach of the group table to the key rows (the
    canonical_collapse shape on a binary-payload corpus).
    """
    import pyarrow.compute as pc

    import ray

    from ..pipelines.joins import cogroup_attach

    keys = synth_media_with_dups(n).map_batches(
        PHashStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def drop_bad(b: pa.Table) -> pa.Table:
        return b.filter(b.column("decode_ok")).drop_columns(["decode_ok"])

    keys = keys.map_batches(drop_bad, batch_format="pyarrow")
    groups = (
        keys.groupby("phash")
        .aggregate(ray.data.aggregate.Min("media_id"), ray.data.aggregate.Count())
        .map_batches(
            lambda b: b.rename_columns(
                ["phash", "canonical_id", "group_size"]
            ),
            batch_format="pyarrow",
        )
    )
    return cogroup_attach(
        keys,
        groups,
        key="phash",
        left_fields=[
            pa.field("media_id", pa.int64()),
            pa.field("phash", pa.int64()),
        ],
        payload_fields=[
            pa.field("canonical_id", pa.int64()),
            pa.field("group_size", pa.int64()),
        ],
    )

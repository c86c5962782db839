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

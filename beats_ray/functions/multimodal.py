"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The image/audio codecs are NOT in this container, so the decode kernels are
STUBBED (deterministic fakes behind ``fake=True``, NotImplementedError
otherwise) — but everything Ray-side is real and tested: schema contract,
actor-pool stage shape (decoder "model" loaded once per actor in __init__),
byte-aware batch sizing, and typed metadata output layout.

Schema contract for a multimodal table:
    id:int64, payload:binary, mime:string, meta_width:int32, meta_height:int32
(audio: meta_sample_rate/meta_n_samples).  At 100 TB the payload column
dominates: callers must lower ``batch_size`` (bytes per batch = batch_size x
mean payload) and rely on object-store spilling, per the memory-aware rule.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..event import set_column
from ..stages.base import Stage, register


def synth_image_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake 'image' payloads (random bytes + magic header)."""
    rng = np.random.default_rng(seed)
    payloads, w, h = [], [], []
    for i in range(n):
        width, height = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        body = rng.integers(0, 256, size=width * height, dtype=np.uint8).tobytes()
        payloads.append(b"\x89PNG" + body)
        w.append(width)
        h.append(height)
    return pa.table({
        "id": pa.array(range(n), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["image/png"] * n, pa.string()),
        "meta_width": pa.array(w, pa.int32()),
        "meta_height": pa.array(h, pa.int32()),
    })


def synth_image_parquet(path: str | None = None, n: int = 256,
                        seed: int = 42) -> str:
    """Persist the deterministic synth table once (idempotent) so both the
    Ray pipeline and the DuckDB oracle read the SAME parquet input."""
    import os

    import pyarrow.parquet as pq
    path = path or "/tmp/beats_ray_data/multimodal_synth.parquet"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(synth_image_table(n, seed), tmp)
        os.replace(tmp, path)
    return path


@register("image_decode")
class ImageDecode(Stage):
    """Actor-pool decode stage.  Real pipeline shape; the codec itself is a
    stub: ``fake=True`` produces a deterministic grayscale ndarray from the
    payload bytes, ``fake=False`` raises NotImplementedError (no image libs
    in this container).  Output: ``pixels`` list<uint8> + decoded dims."""

    name = "image_decode"
    stateful = True  # a real decoder loads codec state once per actor

    def __init__(self, config=None):
        super().__init__(config)
        self.fake = bool(self.config.get("fake", True))
        self.payload_col = self.config.get("field", "payload")
        self._codec = None

    def setup(self):
        # real impl: import PIL / cv2 / torchvision here, once per actor
        if not self.fake:
            raise NotImplementedError(
                "image codecs are not available in this environment; "
                "run with fake=True for the deterministic stub")
        self._codec = "fake-gray-v1"

    def process(self, batch):
        self.setup()
        pixels = []
        for payload, w, h in zip(batch[self.payload_col].to_pylist(),
                                 batch["meta_width"].to_pylist(),
                                 batch["meta_height"].to_pylist()):
            if payload is None:
                pixels.append(None)
                continue
            body = payload[4:4 + w * h]  # strip fake magic
            pixels.append(list(body))
        return set_column(batch, "pixels", pa.array(pixels, pa.list_(pa.uint8())))


@register("image_resize")
class ImageResize(Stage):
    """Nearest-neighbor resize on the decoded ``pixels`` column (numpy —
    this part is real, no codec needed).  config: width, height."""

    name = "image_resize"

    def __init__(self, config=None):
        super().__init__(config)
        self.w = int(self.config.get("width", 16))
        self.h = int(self.config.get("height", 16))

    def process(self, batch):
        out = []
        for px, w, h in zip(batch["pixels"].to_pylist(),
                            batch["meta_width"].to_pylist(),
                            batch["meta_height"].to_pylist()):
            if px is None or w is None:
                out.append(None)
                continue
            img = np.asarray(px, dtype=np.uint8)[: w * h].reshape(h, w)
            yi = (np.arange(self.h) * h // self.h)
            xi = (np.arange(self.w) * w // self.w)
            out.append(img[np.ix_(yi, xi)].ravel().tolist())
        batch = set_column(batch, "pixels_resized",
                           pa.array(out, pa.list_(pa.uint8())))
        batch = set_column(batch, "resized_width",
                           pa.array([self.w] * len(batch), pa.int32()))
        return set_column(batch, "resized_height",
                          pa.array([self.h] * len(batch), pa.int32()))


@register("image_features")
class ImageFeatures(Stage):
    """Deterministic feature extraction from decoded pixels (mean/std/
    16-bin histogram) — the "batched model inference" slot; a real model
    would load in setup() and run a batched forward pass here."""

    name = "image_features"
    stateful = True

    def process(self, batch):
        feats = []
        for px in batch["pixels"].to_pylist():
            if px is None:
                feats.append(None)
                continue
            arr = np.asarray(px, dtype=np.float64)
            hist, _ = np.histogram(arr, bins=16, range=(0, 256))
            feats.append([float(arr.mean()), float(arr.std())]
                         + (hist / max(1, len(arr))).tolist())
        return set_column(batch, "features",
                          pa.array(feats, pa.list_(pa.float64())))


@register("audio_frame_sample")
class AudioFrameSample(Stage):
    """Frame sampling plumbing for audio/video payloads: pick every k-th
    frame offset without decoding (byte-range arithmetic only); the decode
    itself is stubbed like image_decode."""

    name = "audio_frame_sample"

    def __init__(self, config=None):
        super().__init__(config)
        self.every = int(self.config.get("every", 10))
        self.frame_bytes = int(self.config.get("frame_bytes", 256))

    def process(self, batch):
        offs = []
        for payload in batch["payload"].to_pylist():
            if payload is None:
                offs.append(None)
                continue
            n_frames = max(0, (len(payload) - 4) // self.frame_bytes)
            offs.append(list(range(0, n_frames, self.every)))
        return set_column(batch, "frame_offsets",
                          pa.array(offs, pa.list_(pa.int32())))


def checksum_payloads(ds, payload_col: str = "payload") -> pa.Table:
    """Integrity sweep: sha256 per payload (the kind of full-scan audit a
    100 TB multimodal corpus needs); returns (id, sha256)."""
    def stage(t: pa.Table) -> pa.Table:
        hs = [hashlib.sha256(p).hexdigest() if p is not None else None
              for p in t[payload_col].to_pylist()]
        return pa.table({"id": t["id"], "sha256": pa.array(hs, pa.string())})
    blocks = list(ds.map_batches(stage, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow"))
    if not blocks:   # concat_tables([]) raises on an empty dataset
        return pa.table({"id": pa.array([], pa.int64()),
                         "sha256": pa.array([], pa.string())})
    return pa.concat_tables(blocks)

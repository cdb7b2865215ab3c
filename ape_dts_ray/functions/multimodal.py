"""Multimodal (image/audio/video) column handling.

Media are opaque ``binary`` columns with typed metadata columns beside them
(``media_type``, ``width``/``height``/``duration_ms``...). Decode /
feature-extract / resize / frame-sample run as ACTOR-POOL ``map_batches``
stages: codec/model setup happens once per actor in ``__init__``; batches stay
small because each row can carry megabytes (size ``batch_size`` so
batch_bytes × concurrency fits the worker heap — the memory-aware rule).

The image/audio libraries are not installed in this container, so the codec
call is STUBBED: ``DecodeImage`` tries PIL at actor init and, when absent,
either raises NotImplementedError (strict mode) or produces a deterministic
fake decode (seeded by the payload hash) so the Ray-side plumbing — schema,
actor signature, batch sizing, output layout — is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),       # "image/png", "audio/wav", ...
    ("payload", pa.binary()),          # opaque encoded bytes
    ("width", pa.int32()),             # -1 when unknown / not applicable
    ("height", pa.int32()),
])


def synthesize_media_table(n: int, seed: int = 13,
                           payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media corpus for tests/benchmarks (binary payloads
    of realistic size; no external data)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "media_type": pa.array(["image/png" if i % 2 == 0 else "image/jpeg"
                                for i in range(n)]),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(np.full(n, 64, dtype=np.int32)),
        "height": pa.array(np.full(n, 64, dtype=np.int32)),
    })


class DecodeImage:
    """Actor-pool stage: binary payload → fixed-size float feature row.

    ``strict=True`` raises NotImplementedError when no codec library exists
    (the honest production behavior); ``strict=False`` substitutes a
    deterministic fake decode so downstream stages can be exercised.
    """

    def __init__(self, out_size: int = 8, strict: bool = False):
        self.out_size = out_size
        try:
            from PIL import Image  # noqa: F401
            self._pil = Image
        except ImportError:
            self._pil = None
            if strict:
                raise NotImplementedError(
                    "image codec (PIL) not available in this environment")

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        # deterministic pseudo-pixels seeded by the payload digest
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.random((self.out_size, self.out_size), dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch.column("payload").to_pylist():
            if self._pil is not None:
                import io
                img = self._pil.open(io.BytesIO(payload)).convert("L")
                img = img.resize((self.out_size, self.out_size))
                arr = np.asarray(img, dtype=np.float64) / 255.0
            else:
                arr = self._fake_decode(payload)
            feats.append(arr.mean(axis=0))         # column-mean feature vector
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.array([f.tolist() for f in feats],
                                type=pa.list_(pa.float64())),
        })


class ResizeStage:
    """Actor-pool stage operating on decoded features (here: truncate/pad the
    feature vector — stands in for a resize/crop kernel with identical
    plumbing)."""

    def __init__(self, target: int = 4):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for f in batch.column("feature").to_pylist():
            v = (f + [0.0] * self.target)[: self.target]
            out.append(v)
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.array(out, type=pa.list_(pa.float64())),
        })


def media_feature_pipeline(media_ds, out_size: int = 8, target: int = 4,
                           batch_size: int = 64, concurrency: int = 2):
    """decode → resize as two actor-pool stages; small batches because rows
    carry binary payloads."""
    return (media_ds
            .map_batches(DecodeImage, fn_constructor_args=(out_size,),
                         batch_format="pyarrow", batch_size=batch_size,
                         concurrency=concurrency)
            .map_batches(ResizeStage, fn_constructor_args=(target,),
                         batch_format="pyarrow", batch_size=batch_size,
                         concurrency=concurrency))

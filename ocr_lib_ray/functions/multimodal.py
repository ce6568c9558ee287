"""Multimodal column plumbing (binary payloads + typed metadata).

Images/audio/video are opaque ``binary`` columns.  The Ray-side
plumbing — schema, actor-pool stage shape, batch sizing for large
payloads, output layout — is real and tested; the DECODE itself is
stubbed behind ``MediaDecodeStub`` because no media libraries exist in
this environment (a real deployment swaps ``_decode_real`` in).

Pattern per SURVEY §2.3: decode is a stateful actor stage (model/codec
init once per actor in ``__init__``), small ``batch_size`` because each
row is large.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_FEATURE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("n_bytes", pa.int64()),
        ("crc", pa.uint32()),
        ("byte_entropy", pa.float64()),
        ("feature", pa.list_(pa.float32())),
    ]
)


class MediaDecodeStub:
    """Actor-pool media "decoder": deterministic fake features.

    Real decode is explicitly NOT implemented here (no codecs in this
    container); the deterministic fake keeps the plumbing testable.
    Features: byte-histogram entropy + a 16-dim byte-distribution
    embedding — pure functions of the payload bytes.
    """

    def __init__(self, real_decode: bool = False):
        if real_decode:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "plug a decoder into MediaDecodeStub._decode_real"
            )

    @staticmethod
    def _features(data: bytes):
        if not data:
            return 0.0, [0.0] * 16
        arr = np.frombuffer(data, dtype=np.uint8)
        hist = np.bincount(arr, minlength=256).astype(np.float64)
        p = hist / hist.sum()
        nz = p[p > 0]
        entropy = float(-(nz * np.log2(nz)).sum())
        feat = hist.reshape(16, 16).sum(axis=1)
        feat = (feat / feat.sum()).astype(np.float32)
        # entropy rounded to 6 directly from the raw double: a 9-then-6
        # double-rounding makes exact .5 ties at the 7th digit common
        # enough to break float-oracle comparison (seen in the gate)
        return round(entropy, 6), [round(float(v), 9) for v in feat]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch.column("html")  # the binary payload column
        urls = batch.column("url")
        ents, feats, crcs = [], [], []
        for v in payload.to_pylist():
            data = v or b""
            e, f = self._features(data)
            ents.append(e)
            feats.append(f)
            crcs.append(zlib.crc32(data))
        return pa.Table.from_arrays(
            [
                urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls,
                pc.binary_length(payload).cast(pa.int64()),
                pa.array(crcs, pa.uint32()),
                pa.array(ents, pa.float64()),
                pa.array(feats, pa.list_(pa.float32())),
            ],
            schema=MEDIA_FEATURE_SCHEMA,
        )


def media_features(pages_ds, batch_size: int = 16, concurrency=None):
    """Actor-pool decode stage over binary payload rows (small batches —
    payload rows are wide).  ``concurrency=None`` autoscales the pool to
    the cluster (see ocr_lib_ray.pool)."""
    from ..pool import autoscale_pool

    if concurrency is None:
        concurrency = autoscale_pool()
    return pages_ds.map_batches(
        MediaDecodeStub,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

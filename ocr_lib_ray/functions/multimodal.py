"""Multimodal column plumbing (binary payloads + typed metadata).

Images/audio/video are opaque ``binary`` columns.  The Ray-side
plumbing — schema, actor-pool stage shape, batch sizing for large
payloads, output layout — is real and tested; the DECODE is wired
behind an optional-dependency probe (``probe_image_decoder``): with
Pillow installed ``real_decode=True`` decodes pixels (4×4 grayscale
thumbnail feature), without it the deterministic byte-feature path is
the default and real decode raises at actor construction.

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


def probe_image_decoder():
    """Optional-dependency probe: PIL's Image module when importable,
    else None.  The sandbox container ships no codecs, so the probe
    returns None there and the deterministic byte-feature path stays
    the default; a deployment with Pillow installed gets real decode
    with no code changes."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


class MediaDecodeStub:
    """Actor-pool media "decoder".

    Default mode: deterministic byte features (histogram entropy + a
    16-dim byte-distribution embedding — pure functions of the payload
    bytes; DuckDB-oracled).  ``real_decode=True`` switches the feature
    column to a real image decode — 4×4 grayscale thumbnail via PIL —
    when the codec probe finds Pillow, and raises immediately (at actor
    construction, not per batch) when the environment has no codec.
    """

    def __init__(self, real_decode: bool = False):
        self._image_mod = None
        if real_decode:
            self._image_mod = probe_image_decoder()
            if self._image_mod is None:
                raise NotImplementedError(
                    "real_decode requested but no image codec is available "
                    "(pip install Pillow); the deterministic byte-feature "
                    "path (real_decode=False) needs no codec"
                )

    def _decode_real(self, data: bytes):
        """Payload bytes → (byte_entropy, 16-dim thumbnail feature).

        Entropy stays the raw-byte statistic (column semantics are
        payload-level either way); the feature becomes a 4×4 grayscale
        thumbnail in [0, 1] — the minimal honest 'decoded pixels'
        embedding.  Undecodable payloads fall back to byte features
        (a crawl always contains corrupt media)."""
        import io

        e, byte_feat = self._features(data)
        try:
            img = self._image_mod.open(io.BytesIO(data))
            img = img.convert("L").resize((4, 4))
        except Exception:
            return e, byte_feat
        px = np.asarray(img, dtype=np.float32).reshape(-1) / 255.0
        return e, [round(float(v), 9) for v in px]

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
        decode = self._decode_real if self._image_mod is not None else self._features
        for v in payload.to_pylist():
            data = v or b""
            e, f = decode(data)
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


def media_features(pages_ds, batch_size: int = 16, concurrency=None, real_decode: bool = False):
    """Actor-pool decode stage over binary payload rows (small batches —
    payload rows are wide).  ``concurrency=None`` autoscales the pool to
    the cluster (see ocr_lib_ray.pool); ``real_decode=True`` uses the
    PIL-probed image decoder (raises when no codec is installed)."""
    from ..pool import autoscale_pool

    if concurrency is None:
        concurrency = autoscale_pool()
    return pages_ds.map_batches(
        MediaDecodeStub,
        fn_constructor_args=(real_decode,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

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


def probe_video_decoder():
    """Optional-dependency probe for a video demuxer: PyAV (the only
    candidate that demuxes from an in-memory buffer — cv2.VideoCapture
    needs a file path, so it is deliberately NOT probed); None in this
    container — the deterministic byte-window framing below is the
    codec-free stand-in."""
    try:
        import av  # noqa: PLC0415

        return av
    except ImportError:
        return None


FRAME_SAMPLE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("frame_idx", pa.int64()),
        ("n_frames", pa.int64()),
        ("frame_md5", pa.string()),
    ]
)


class FrameSampler:
    """Actor-pool frame sampler over binary "video" payloads — the
    1-row-in / k-rows-out stage shape of a real video pipeline (demux →
    sample every ``stride``-th frame, cap ``max_frames`` per doc →
    per-frame artifact), with the demux step behind
    :func:`probe_video_decoder`.

    Codec-free default: a payload "frame" is the fixed ``frame_size``-
    byte window at index i (last frame may be short), n_frames =
    ceil(len/frame_size); the per-frame artifact is its md5 hex —
    deterministic and DuckDB-oracle-able, so the WHOLE Ray shape
    (flat output, schema, batch sizing) is verified even though no
    codec exists here.  ``real_decode=True`` raises at actor
    construction when the probe finds no demuxer; when PyAV is present
    it genuinely demuxes (frame list from the container, per-frame md5
    of the decoded pixel bytes), falling back to byte windows for
    undecodable payloads — the exact contract MediaDecodeStub has for
    images.  Empty payloads emit no rows.
    """

    def __init__(
        self,
        frame_size: int = 256,
        stride: int = 4,
        max_frames: int = 8,
        real_decode: bool = False,
    ):
        if frame_size <= 0 or stride <= 0 or max_frames <= 0:
            raise ValueError("frame_size, stride and max_frames must be positive")
        self._av = None
        if real_decode:
            self._av = probe_video_decoder()
            if self._av is None:
                raise NotImplementedError(
                    "real_decode requested but no video demuxer is available "
                    "(pip install av); the byte-window framing "
                    "(real_decode=False) needs no codec"
                )
        self.frame_size = frame_size
        self.stride = stride
        self.max_frames = max_frames

    def _byte_frames(self, data: bytes):
        """(n_frames, frame-bytes iterator by index) for the codec-free
        byte-window framing."""
        fs = self.frame_size
        n_frames = (len(data) + fs - 1) // fs
        return n_frames, lambda i: data[i * fs : (i + 1) * fs]

    def _real_frames(self, data: bytes):
        """PyAV demux: decoded video frames' pixel bytes; undecodable
        payloads (every synthetic fixture here) fall back to byte
        windows — a crawl always contains corrupt media."""
        import io

        try:
            container = self._av.open(io.BytesIO(data))
            frames = [
                bytes(f.to_ndarray().tobytes())
                for f in container.decode(video=0)
            ]
        except Exception:
            return self._byte_frames(data)
        if not frames:
            return self._byte_frames(data)
        return len(frames), lambda i: frames[i]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        urls_out, idxs, totals, md5s = [], [], [], []
        urls = batch.column("url").to_pylist()
        framing = self._real_frames if self._av is not None else self._byte_frames
        for url, v in zip(urls, batch.column("html").to_pylist()):
            data = v or b""
            if isinstance(data, str):
                data = data.encode("utf-8")
            n_frames, frame_at = framing(data)
            for k, i in enumerate(range(0, n_frames, self.stride)):
                if k >= self.max_frames:
                    break
                urls_out.append(url)
                idxs.append(i)
                totals.append(n_frames)
                md5s.append(hashlib.md5(frame_at(i)).hexdigest())
        return pa.Table.from_arrays(
            [
                pa.array(urls_out, pa.string()),
                pa.array(idxs, pa.int64()),
                pa.array(totals, pa.int64()),
                pa.array(md5s, pa.string()),
            ],
            schema=FRAME_SAMPLE_SCHEMA,
        )


_FRAME_SAMPLERS: dict = {}


def frame_sample(
    pages_ds,
    frame_size: int = 256,
    stride: int = 4,
    max_frames: int = 8,
    batch_size: int = 16,
    concurrency=None,
    real_decode: bool = False,
):
    """Frame sampling over binary payload rows (small batches; output
    is a flat (url, frame_idx, n_frames, frame_md5) table, ≤ max_frames
    rows per input row).

    Stage shape follows the measured thin-state rule (CLAUDE perf
    notes): the codec-free byte-window framing holds three ints —
    stateless tasks with a process-cached instance, which fuse with
    the read and skip actor-pool ramp-up; ``real_decode=True`` (codec
    = genuinely heavy state) becomes an actor pool with the demuxer
    probed once per actor in ``__init__``."""
    if real_decode:
        from ..pool import autoscale_pool

        if concurrency is None:
            concurrency = autoscale_pool()
        return pages_ds.map_batches(
            FrameSampler,
            fn_constructor_args=(frame_size, stride, max_frames, True),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    key = (frame_size, stride, max_frames)

    def sample(batch: pa.Table) -> pa.Table:
        s = _FRAME_SAMPLERS.get(key)
        if s is None:
            s = _FRAME_SAMPLERS[key] = FrameSampler(*key)
        return s(batch)

    return pages_ds.map_batches(
        sample, batch_format="pyarrow", batch_size=batch_size
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

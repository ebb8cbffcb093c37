"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded / feature-extracted by actor-pool stages.

The Ray-side plumbing (schemas, small batch sizes for fat rows, actor
signatures, output layout) is real and tested. Decode is REAL for PNG
(``functions/png.py``, pure stdlib+numpy) and baseline JPEG
(``functions/jpeg.py``, same approach); PIL takes precedence when
importable. Only AUDIO and non-PNG/JPEG containers remain stubbed behind
an import-guard — a clearly-marked deterministic fake, with
:func:`require_codecs` raising ``NotImplementedError`` for callers that
must not fall back.

Batch-size guidance: payload rows are orders of magnitude wider than text
rows; pair these stages with small ``batch_size`` (e.g. 64) and let
``DataContext.target_max_block_size`` keep blocks sane (Ray guide
"memory-aware" rule)."""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("media_meta", pa.struct([("format", pa.string()), ("n_bytes", pa.int64())])),
    ]
)


def have_image_codec() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def require_codecs() -> None:
    """Hard gate for callers that need REAL decode output for arbitrary
    formats. PNG and baseline JPEG always have a real path (the pure-Python
    codecs in ``functions/png.py`` / ``functions/jpeg.py``); everything
    else — audio, video containers, exotic image formats — needs PIL."""
    if not have_image_codec():
        raise NotImplementedError(
            "image/audio codecs are not installed in this environment; "
            "PNG and baseline-JPEG payloads decode via the built-in "
            "pure-Python codecs, other formats fall back to the "
            "deterministic fake decoder"
        )


def to_media_dataset(
    ds: "rd.Dataset", *, id_col: str = "doc_id", text_col: str = "text", kind: str = "image"
) -> "rd.Dataset":
    """Wrap a text table as opaque binary payloads (fixture path: the
    sandbox has no real media files, so UTF-8 bytes stand in for encoded
    payloads — the schema and plumbing are exactly what real media uses)."""

    def wrap(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        payloads = [(t or "").encode("utf-8") for t in texts]
        n = len(payloads)
        meta = pa.array(
            [{"format": "fake/utf8", "n_bytes": len(p)} for p in payloads],
            type=MEDIA_SCHEMA.field("media_meta").type,
        )
        return pa.table(
            {
                "media_id": batch.column(id_col).cast(pa.int64()),
                "kind": pa.nulls(n, pa.string()).fill_null(kind),
                "payload": pa.array(payloads, pa.binary()),
                "media_meta": meta,
            }
        )

    return ds.map_batches(wrap, batch_format="pyarrow")


class DecodeStage:
    """Actor-pool decode/feature stage: codec state initialized ONCE per
    actor in ``__init__`` (the expensive part with real codecs — model load,
    decoder contexts), per-batch work in ``__call__``.

    Decode path per payload: PIL when importable → the built-in pure-Python
    codecs (``functions/png.py`` for PNG, ``functions/jpeg.py`` for baseline
    JPEG) → the clearly-marked deterministic fake for anything else, i.e.
    audio and exotic containers (sha256-derived dims so the driver oracle
    can recompute them in SQL).

    Output layout: input columns minus payload, plus ``width``, ``height``,
    ``feature`` (fixed-size float32 list) — identical whichever decoder
    runs, so downstream stages are codec-agnostic.
    """

    FEATURE_DIM = 16

    def __init__(self) -> None:
        from ..functions import jpeg as _jpeg
        from ..functions import png as _png

        self.pil = have_image_codec()
        self.png = _png
        self.jpeg = _jpeg

    def _fake_decode(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        # STUB decoder: deterministic dims + feature from a content digest.
        # sha256 (not blake2b) so the driver oracle can recompute dims in
        # DuckDB: 16 + first/second digest byte % 64.
        digest = hashlib.sha256(payload).digest()
        arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
        width = 16 + int(digest[0]) % 64
        height = 16 + int(digest[1]) % 64
        feature = arr[: self.FEATURE_DIM] / 255.0
        return width, height, feature

    def _decode(self, p: bytes) -> tuple[int, int, np.ndarray]:
        if self.pil:
            import io

            import PIL.Image

            img = PIL.Image.open(io.BytesIO(p))
            feat = np.asarray(
                img.resize((4, 4)).convert("L"), dtype=np.float32
            ).reshape(-1)[: self.FEATURE_DIM] / 255.0
            return img.size[0], img.size[1], feat
        # a payload whose magic matches but the pure-Python codec cannot
        # handle (progressive JPEG, truncated stream, exotic PNG) takes the
        # deterministic fake instead of killing the actor task — DecodeStage
        # is the permissive stage by contract (require_codecs() is the
        # strict gate for callers that must not fall back)
        try:
            if self.png.is_png(p):
                arr = self.png.decode_png(p)
                return (
                    arr.shape[1],
                    arr.shape[0],
                    self.png.grayscale_feature(arr),
                )
            if self.jpeg.is_jpeg(p):
                arr = self.jpeg.decode_jpeg(p)
                return (
                    arr.shape[1],
                    arr.shape[0],
                    self.png.grayscale_feature(arr),
                )
        except (ValueError, struct.error, zlib.error, IndexError):
            pass
        return self._fake_decode(p or b"")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        widths = np.empty(len(payloads), dtype=np.int32)
        heights = np.empty(len(payloads), dtype=np.int32)
        feats = np.empty((len(payloads), self.FEATURE_DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            widths[i], heights[i], feats[i] = self._decode(p or b"")
        out = batch.drop_columns(["payload"])
        out = out.append_column("width", pa.array(widths, pa.int32()))
        out = out.append_column("height", pa.array(heights, pa.int32()))
        out = out.append_column(
            "feature",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), self.FEATURE_DIM
            ),
        )
        return out


def decode_media(
    ds: "rd.Dataset", *, concurrency: tuple[int, int] = (1, 4), batch_size: int = 64
) -> "rd.Dataset":
    """Run the decode actor pool with media-appropriate sizing (small
    batches: payload rows are fat)."""
    return ds.map_batches(
        DecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeStage:
    """Actor-pool image resize with a REAL path for PNG and baseline-JPEG
    payloads: decode (PIL when importable, else the pure-Python codecs),
    nearest-neighbor resample, re-encode in the source format — payload
    bytes and dims both update. Other payloads without PIL either raise
    (``allow_fake=False``) or take the clearly-marked fake (dims rewritten,
    payload untouched); the Ray plumbing (actor signature, small batches,
    fixed output schema) is identical either way."""

    def __init__(self, width: int = 224, height: int = 224, *, allow_fake: bool = False):
        from ..functions import jpeg as _jpeg
        from ..functions import png as _png

        self.width, self.height = width, height
        self.allow_fake = allow_fake
        self.pil = have_image_codec()
        self.png = _png
        self.jpeg = _jpeg

    def _resize(self, p: bytes) -> bytes:
        if self.pil:
            import io

            import PIL.Image

            img = PIL.Image.open(io.BytesIO(p)).resize((self.width, self.height))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return buf.getvalue()
        try:
            if self.png.is_png(p):
                arr = self.png.decode_png(p)
                return self.png.encode_png(
                    self.png.resize_nearest(arr, self.width, self.height)
                )
            if self.jpeg.is_jpeg(p):
                arr = self.jpeg.decode_jpeg(p)
                return self.jpeg.encode_jpeg(
                    self.png.resize_nearest(arr, self.width, self.height)
                )
        except (ValueError, struct.error, zlib.error, IndexError):
            # payload the pure-Python codec cannot handle (progressive
            # JPEG, corrupt stream): strict mode surfaces the parse error,
            # permissive mode takes the fake below
            if not self.allow_fake:
                raise
        if not self.allow_fake:
            require_codecs()
        return p  # fake: payload untouched, dims rewritten below

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = [self._resize(p or b"") for p in batch.column("payload").to_pylist()]
        out = batch.drop_columns(
            [c for c in ("payload", "width", "height") if c in batch.column_names]
        )
        out = out.append_column("payload", pa.array(payloads, pa.binary()))
        out = out.append_column(
            "width", pa.nulls(n, pa.int32()).fill_null(self.width)
        )
        return out.append_column(
            "height", pa.nulls(n, pa.int32()).fill_null(self.height)
        )


class FrameSampleStage:
    """Actor-pool video frame sampler: every ``stride``-th frame becomes its
    own media row with the frame's encoded bytes and dims.

    REAL path: concatenated-PNG containers (``functions/png.py:
    split_png_stream`` — frames back-to-back, the MJPEG idea with PNG
    frames) are split by pure-stdlib chunk walking, sampled, and each
    sampled frame emitted with its single-frame PNG payload and IHDR dims.
    No external codec needed. Other container formats (mp4 etc.) have no
    codec in this environment: they raise via :func:`require_codecs`
    unless ``allow_fake=True``, in which case a clearly-marked fake derives
    a deterministic frame count from the payload digest (payload passes
    through untouched, sha256-derived dims) — output schema is identical
    either way, so downstream stages are codec-agnostic."""

    def __init__(self, stride: int = 10, *, allow_fake: bool = False):
        from ..functions import png as _png

        self.stride = stride
        self.allow_fake = allow_fake
        self.png = _png

    def _sample(self, p: bytes) -> tuple[list[bytes], list[int], list[int], list[int]]:
        """One payload → (frame payloads, frame indices, widths, heights)."""
        if self.png.is_png(p):
            try:
                frames = self.png.split_png_stream(p)
                idx = list(range(0, len(frames), self.stride)) or [0]
                outs = [frames[i] for i in idx]
                dims = [self.png.png_dims(f) for f in outs]
                return outs, idx, [d[0] for d in dims], [d[1] for d in dims]
            except (ValueError, struct.error, zlib.error):
                # corrupt/truncated PNG stream: permissive mode falls
                # through to the fake (its contract: never raise); strict
                # mode surfaces the parse error below via require_codecs
                if not self.allow_fake:
                    raise
        elif not self.allow_fake:
            require_codecs()
        digest = hashlib.blake2b(p or b"", digest_size=2).digest()
        n_frames = 1 + (digest[0] % 8)
        idx = list(range(0, n_frames, self.stride)) or [0]
        d = hashlib.sha256(p or b"").digest()
        w, h = 16 + d[0] % 64, 16 + d[1] % 64
        return [p] * len(idx), idx, [w] * len(idx), [h] * len(idx)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        take, f_payload, f_idx, f_w, f_h = [], [], [], [], []
        for row, p in enumerate(payloads):
            outs, idx, ws, hs = self._sample(p or b"")
            take.extend([row] * len(idx))
            f_payload.extend(outs)
            f_idx.extend(idx)
            f_w.extend(ws)
            f_h.extend(hs)
        out = batch.drop_columns(
            [c for c in ("payload", "width", "height") if c in batch.column_names]
        ).take(pa.array(take, pa.int64()))
        out = out.append_column("payload", pa.array(f_payload, pa.binary()))
        out = out.append_column("frame_idx", pa.array(f_idx, pa.int32()))
        out = out.append_column("width", pa.array(f_w, pa.int32()))
        return out.append_column("height", pa.array(f_h, pa.int32()))


class AudioFeatureStage:
    """Actor-pool audio decode/feature stage with a REAL path for WAV
    payloads (``functions/wav.py`` — pure stdlib RIFF/PCM): per payload it
    emits ``sample_rate``, ``n_samples``, ``channels``, ``duration_s``,
    ``rms`` and ``peak`` (both floored to 4 decimals, matching the repo's
    oracle-flooring convention). Non-WAV payloads (mp3/ogg/flac have no
    codec in this sandbox) either raise via :func:`require_codecs`
    (``allow_fake=False``) or take the clearly-marked deterministic fake
    (sha256-derived rate/length, zero features) — the output schema is
    identical either way."""

    def __init__(self, *, allow_fake: bool = False):
        from ..functions import wav as _wav

        self.allow_fake = allow_fake
        self.wav = _wav

    def _features(self, p: bytes) -> tuple[int, int, int, float, float, float]:
        if self.wav.is_wav(p):
            try:
                samples, rate = self.wav.decode_wav(p)
                if rate <= 0:
                    raise self.wav.WavError("sample rate must be positive")
                n, ch = samples.shape
                mono = samples.mean(axis=1) if ch > 1 else samples[:, 0]
                rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
                peak = float(np.max(np.abs(mono))) if n else 0.0
                return (
                    rate, n, ch,
                    np.floor((n / rate + 1e-9) * 1e4) / 1e4,
                    np.floor((rms + 1e-9) * 1e4) / 1e4,
                    np.floor((peak + 1e-9) * 1e4) / 1e4,
                )
            except (ValueError, struct.error):
                # RIFF header but undecodable body (ADPCM/mu-law, truncated
                # fmt, zero channels): strict mode surfaces the parse error,
                # permissive mode takes the fake below
                if not self.allow_fake:
                    raise
        if not self.allow_fake:
            require_codecs()
        d = hashlib.sha256(p or b"").digest()
        rate = 8000 + (d[0] % 4) * 8000
        n = 256 + d[1] * 16
        return rate, n, 1, np.floor(n / rate * 1e4) / 1e4, 0.0, 0.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        cols = list(zip(*(self._features(p or b"") for p in payloads))) or [
            []
        ] * 6
        out = batch.drop_columns(["payload"])
        out = out.append_column("sample_rate", pa.array(cols[0], pa.int32()))
        out = out.append_column("n_samples", pa.array(cols[1], pa.int64()))
        out = out.append_column("channels", pa.array(cols[2], pa.int32()))
        out = out.append_column("duration_s", pa.array(cols[3], pa.float64()))
        out = out.append_column("rms", pa.array(cols[4], pa.float64()))
        return out.append_column("peak", pa.array(cols[5], pa.float64()))


def audio_features(
    ds: "rd.Dataset",
    *,
    concurrency: tuple[int, int] = (1, 4),
    batch_size: int = 64,
    allow_fake: bool = False,
) -> "rd.Dataset":
    """Run the audio feature actor pool (small batches: payload rows are
    fat — same sizing rule as :func:`decode_media`)."""
    return ds.map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"allow_fake": allow_fake},
    )

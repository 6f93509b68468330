"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Ray-side plumbing (schemas, actor-pool stages, batch sizing, output
layout) is real and tested; the codec itself is STUBBED because no
image/audio library ships in this environment: payloads in the deterministic
toy container formats below are "decoded" with numpy; anything else raises
``NotImplementedError`` inside a per-row try so the row is error-flagged,
not the batch killed (skip-and-continue,
/root/reference/user_scripts/parse_folder.py:213-216).

Toy container formats (for tests/fixtures):
  image: b"FAKEIMG" + uint16 width + uint16 height + uint8 channels + pixels
  audio: b"FAKEAUD" + uint32 sample_rate + int16 samples

Stage shapes mirror the reference's heavy per-record engines: the decoder /
feature extractor is a callable class (actor pool) whose ``__init__`` loads
the "model" (a seeded projection matrix) once per actor — the line-OCR
engine shape (/root/reference/pero_ocr/ocr_engine/line_ocr_engine.py:17-56).

Codec seam (the documented real-deployment injection point): every stage
takes a ``codec`` constructor argument — a callable ``bytes -> ndarray``
(image/video: (h,w,c) / (n,h,w,c); audio: ``bytes -> (sample_rate,
samples)``) or a ``"module:attr"`` dotted path so JSON/INI pipeline specs
can name it without holding a Python object. It is resolved by
:func:`resolve_codec` ONCE PER ACTOR in ``__init__`` — module-level
monkeypatching would not survive into Ray worker processes, which import
this module fresh; a constructor arg ships with the actor spec and does.
A real deployment plugs in OpenCV without touching stage logic::

    def cv2_image_codec(raw: bytes) -> np.ndarray:
        import cv2
        img = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("undecodable image")
        return img

    image_features(ds, codec=cv2_image_codec)          # python API
    {"stage": "image_features", "codec": "mypkg.codecs:cv2_image_codec"}

Default (``codec=None``): the toy FAKEIMG/FAKEAUD/FAKEVID container
decoders below (no image/audio library ships in this environment).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

IMG_MAGIC = b"FAKEIMG"
AUD_MAGIC = b"FAKEAUD"


def fake_pixels(n: int, seed: int = 0) -> np.ndarray:
    """Deterministic arithmetic pixel fill ``(seed*37 + j*101) % 256`` —
    no RNG, and trivially recomputable in SQL so multimodal stages can be
    hash-verified against a DuckDB oracle end-to-end."""
    return ((seed * 37 + np.arange(n, dtype=np.int64) * 101) % 256
            ).astype(np.uint8)


def make_fake_image(width: int, height: int, channels: int = 3,
                    seed: int = 0) -> bytes:
    pixels = fake_pixels(width * height * channels, seed)
    head = (IMG_MAGIC + np.uint16(width).tobytes() + np.uint16(height).tobytes()
            + np.uint8(channels).tobytes())
    return head + pixels.tobytes()


def make_fake_audio(sample_rate: int, samples: np.ndarray) -> bytes:
    return (AUD_MAGIC + np.uint32(sample_rate).tobytes()
            + samples.astype(np.int16).tobytes())


def _decode_image(raw: bytes) -> np.ndarray:
    if raw[:7] != IMG_MAGIC:
        raise NotImplementedError(
            "real image codecs unavailable in this environment; only the "
            "FAKEIMG container is decodable")
    w = int(np.frombuffer(raw, np.uint16, 1, 7)[0])
    h = int(np.frombuffer(raw, np.uint16, 1, 9)[0])
    c = int(np.frombuffer(raw, np.uint8, 1, 11)[0])
    return np.frombuffer(raw, np.uint8, w * h * c, 12).reshape(h, w, c)


def _decode_audio(raw: bytes) -> tuple[int, np.ndarray]:
    if raw[:7] != AUD_MAGIC:
        raise NotImplementedError(
            "real audio codecs unavailable; only the FAKEAUD container")
    sr = int(np.frombuffer(raw, np.uint32, 1, 7)[0])
    return sr, np.frombuffer(raw, np.int16, -1, 11)


def resolve_codec(spec, default):
    """Codec-seam resolver (module docstring): ``None`` -> the toy container
    ``default``; callable -> itself; ``"module:attr"`` / ``"module.attr"``
    -> imported attribute (the config-file form)."""
    if spec is None:
        return default
    if callable(spec):
        return spec
    if isinstance(spec, str):
        import importlib
        mod, _, attr = (spec.partition(":") if ":" in spec
                        else spec.rpartition("."))
        fn = getattr(importlib.import_module(mod), attr)
        if not callable(fn):
            raise TypeError(f"codec {spec!r} resolved to non-callable")
        return fn
    raise TypeError(f"codec must be None, callable or 'module:attr' string, "
                    f"got {type(spec).__name__}")


class ImageFeatureStage:
    """Actor pool: decode image binary -> dims + 16-bin histogram feature +
    a seeded linear embedding (model loaded once per actor)."""

    EMBED_DIM = 8

    def __init__(self, seed: int = 42, codec=None):
        rng = np.random.RandomState(seed)
        self.proj = rng.randn(16, self.EMBED_DIM)  # the warm "model"
        self.decode = resolve_codec(codec, _decode_image)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widths, heights, channels, counts, hists, embeds, errors = \
            [], [], [], [], [], [], [], []
        for item_id, raw in zip(batch.column("item_id").to_pylist(),
                                batch.column("image").to_pylist()):
            ids.append(item_id)
            try:
                img = self.decode(raw)
                cnt = np.bincount(img.reshape(-1) >> 4, minlength=16)
                hist = cnt.astype(np.float64)
                hist /= max(1.0, hist.sum())
                widths.append(img.shape[1])
                heights.append(img.shape[0])
                channels.append(img.shape[2])
                counts.append(cnt.astype(np.int64).tolist())
                hists.append(hist.tolist())
                embeds.append((hist @ self.proj).tolist())
                errors.append("")
            except Exception as e:
                # skip-and-continue: truncated/corrupt payloads (ValueError
                # from frombuffer/reshape) degrade to an error row too.
                widths.append(0); heights.append(0); channels.append(0)
                counts.append([0] * 16)
                hists.append([0.0] * 16)
                embeds.append([0.0] * self.EMBED_DIM)
                errors.append(f"decode_failed: {type(e).__name__}: {e}")
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "channels": pa.array(channels, pa.int32()),
            # exact integer 16-bin histogram (pixel >> 4): the SQL-checkable
            # projection of the float feature below
            "hist_counts": pa.array(counts, pa.list_(pa.int64(), 16)),
            "histogram": pa.array(hists, pa.list_(pa.float64(), 16)),
            "embedding": pa.array(embeds, pa.list_(pa.float64(), self.EMBED_DIM)),
            "error": pa.array(errors, pa.string()),
        })


class AudioFeatureStage:
    """Actor pool: decode audio binary -> duration / rms / zero-crossings."""

    def __init__(self, codec=None):
        self.decode = resolve_codec(codec, _decode_audio)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, durs, rmss, energies, zcrs, errors = [], [], [], [], [], []
        for item_id, raw in zip(batch.column("item_id").to_pylist(),
                                batch.column("audio").to_pylist()):
            ids.append(item_id)
            try:
                sr, x = self.decode(raw)
                xf = x.astype(np.float64) / 32768.0
                durs.append(len(x) / sr if sr else 0.0)
                rmss.append(float(np.sqrt(np.mean(xf ** 2))) if len(x) else 0.0)
                # exact integer signal energy: sum of squared int16 samples
                # (the SQL-checkable projection of rms)
                energies.append(int(np.sum(x.astype(np.int64) ** 2)))
                zcrs.append(int(np.sum(np.abs(np.diff(np.signbit(xf))))))
                errors.append("")
            except Exception as e:
                durs.append(0.0); rmss.append(0.0); energies.append(0)
                zcrs.append(0)
                errors.append(f"decode_failed: {type(e).__name__}: {e}")
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "duration_sec": pa.array(durs, pa.float64()),
            "rms": pa.array(rmss, pa.float64()),
            "energy": pa.array(energies, pa.int64()),
            "zero_crossings": pa.array(zcrs, pa.int64()),
            "error": pa.array(errors, pa.string()),
        })


VID_MAGIC = b"FAKEVID"


def make_fake_video(width: int, height: int, n_frames: int,
                    channels: int = 3, seed: int = 0) -> bytes:
    frames = fake_pixels(n_frames * width * height * channels, seed)
    head = (VID_MAGIC + np.uint16(width).tobytes()
            + np.uint16(height).tobytes() + np.uint8(channels).tobytes()
            + np.uint16(n_frames).tobytes())
    return head + frames.tobytes()


def _decode_video(raw: bytes) -> np.ndarray:
    """-> frames array (n, h, w, c). Real codecs slot in here."""
    if raw[:7] != VID_MAGIC:
        raise NotImplementedError(
            "real video codecs unavailable; only the FAKEVID container")
    w = int(np.frombuffer(raw, np.uint16, 1, 7)[0])
    h = int(np.frombuffer(raw, np.uint16, 1, 9)[0])
    c = int(np.frombuffer(raw, np.uint8, 1, 11)[0])
    n = int(np.frombuffer(raw, np.uint16, 1, 12)[0])
    return np.frombuffer(raw, np.uint8, n * w * h * c, 14).reshape(n, h, w, c)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """REAL nearest-neighbor resize (pure numpy — not a stub): the resize
    op the prompt-level pipeline needs, applicable to any decoded frame."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


class ImageResizeStage:
    """Actor pool: decode -> nearest-neighbor resize -> re-encode into the
    same container. The resize math is real; only the codec is the toy."""

    def __init__(self, out_w: int = 8, out_h: int = 8, codec=None):
        self.out_w, self.out_h = out_w, out_h
        self.decode = resolve_codec(codec, _decode_image)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, outs, errors = [], [], []
        for item_id, raw in zip(batch.column("item_id").to_pylist(),
                                batch.column("image").to_pylist()):
            ids.append(item_id)
            try:
                img = self.decode(raw)
                small = resize_nearest(img, self.out_w, self.out_h)
                head = (IMG_MAGIC + np.uint16(self.out_w).tobytes()
                        + np.uint16(self.out_h).tobytes()
                        + np.uint8(img.shape[2]).tobytes())
                outs.append(head + np.ascontiguousarray(small).tobytes())
                errors.append("")
            except Exception as e:
                outs.append(b"")
                errors.append(f"decode_failed: {type(e).__name__}: {e}")
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "image": pa.array(outs, pa.binary()),
            "error": pa.array(errors, pa.string()),
        })


class VideoFrameSampleStage:
    """Actor pool: sample every k-th frame of a video payload and emit
    per-frame features — the frame-sample shape for video corpora (small
    batches: payloads dominate block size)."""

    def __init__(self, every_k: int = 4, codec=None):
        self.k = max(1, every_k)
        self.decode = resolve_codec(codec, _decode_video)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, sums, means, errors = [], [], [], [], []
        for item_id, raw in zip(batch.column("item_id").to_pylist(),
                                batch.column("video").to_pylist()):
            try:
                frames = self.decode(raw)
                for j in range(0, frames.shape[0], self.k):
                    ids.append(item_id)
                    fidx.append(j)
                    # exact integer pixel sum (SQL-checkable); the float
                    # mean derives from it
                    sums.append(int(frames[j].astype(np.int64).sum()))
                    means.append(float(frames[j].mean()))
                    errors.append("")
            except Exception as e:
                ids.append(item_id)
                fidx.append(-1)
                sums.append(0)
                means.append(0.0)
                errors.append(f"decode_failed: {type(e).__name__}: {e}")
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "frame_sum": pa.array(sums, pa.int64()),
            "frame_mean": pa.array(means, pa.float64()),
            "error": pa.array(errors, pa.string()),
        })


def image_features(ds, concurrency: int = 2, batch_size: int = 32,
                   codec=None, ray_remote_args: dict | None = None):
    """Small batches: binary payloads dominate block size (SURVEY §7.5).
    ``ray_remote_args`` passes per-actor resources through (e.g.
    ``{"num_gpus": 1}`` for a GPU decoder — the reference schedules its
    heavy stages on GPU, user_scripts/parse_folder.py:105-115)."""
    return ds.map_batches(ImageFeatureStage,
                          fn_constructor_kwargs={"codec": codec},
                          batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          **(ray_remote_args or {}))


def resize_images(ds, out_w: int = 8, out_h: int = 8,
                  concurrency: int = 2, batch_size: int = 32, codec=None,
                  ray_remote_args: dict | None = None):
    return ds.map_batches(ImageResizeStage,
                          fn_constructor_kwargs={"out_w": out_w,
                                                 "out_h": out_h,
                                                 "codec": codec},
                          batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          **(ray_remote_args or {}))


def video_frame_samples(ds, every_k: int = 4,
                        concurrency: int = 2, batch_size: int = 8,
                        codec=None, ray_remote_args: dict | None = None):
    return ds.map_batches(VideoFrameSampleStage,
                          fn_constructor_kwargs={"every_k": every_k,
                                                 "codec": codec},
                          batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          **(ray_remote_args or {}))


def audio_features(ds, concurrency: int = 2, batch_size: int = 32,
                   codec=None, ray_remote_args: dict | None = None):
    return ds.map_batches(AudioFeatureStage,
                          fn_constructor_kwargs={"codec": codec},
                          batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          **(ray_remote_args or {}))

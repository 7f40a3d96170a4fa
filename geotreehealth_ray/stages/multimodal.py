"""Multimodal column stages: opaque ``binary`` payloads + typed
metadata, processed by actor-pool ``map_batches`` stages.

The image path is fully real (functions/codec.py). Audio/video decode
libraries are NOT available in this environment, so those decoders are
STUBBED: ``strict=True`` raises NotImplementedError (the production
slot); the default produces a deterministic fake signal derived from
the payload hash so the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested end-to-end.

Schema convention for a multimodal table:
    <modality>_id: string, bytes: binary, fmt: string,
    + typed metadata (w/h for images, sample_rate/duration for audio,
      fps/n_frames for video), caption: string.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions import codec

__all__ = ["AudioFeatureSlot", "VideoFrameSampleSlot", "ImageResizeStage",
           "ImageStatsSlot", "image_stats"]


def _stub_signal(payload: bytes, n: int) -> np.ndarray:
    """Deterministic fake waveform from the payload hash."""
    seed = int.from_bytes(
        hashlib.blake2b(payload[:64], digest_size=8).digest(), "little"
    )
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float32)


class AudioFeatureSlot:
    """Audio decode + feature extraction slot. PCM WAV payloads decode
    for REAL (functions/codec.py decode_wav — RIFF is struct+numpy
    parseable, no codec library needed); other payloads use the
    deterministic stub waveform (``strict=True`` raises on them
    instead). Features are real either way: RMS energy, zero-crossing
    rate, 8-band spectral energies via numpy FFT — computed once per
    payload inside the actor."""

    def __init__(self, strict: bool = False, frame_n: int = 4096):
        self.strict = strict
        self.frame_n = frame_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"audio_id": [], "rms": [], "zcr": [], "band_energy": []}
        for i in range(len(batch)):
            payload = batch["bytes"][i].as_py() or b""
            if payload[:4] == b"RIFF":
                sig, _rate = codec.decode_wav(payload)
            elif self.strict:
                raise NotImplementedError(
                    "non-WAV audio payload: compressed codecs need an "
                    "audio library (not installed); transcode to PCM "
                    "WAV, or use strict=False for the stub decode"
                )
            else:
                sig = _stub_signal(payload, self.frame_n)
            out["audio_id"].append(batch["audio_id"][i].as_py())
            out["rms"].append(float(np.sqrt(np.mean(sig**2))))
            out["zcr"].append(float(np.mean(np.diff(np.signbit(sig)) != 0)))
            spec = np.abs(np.fft.rfft(sig)) ** 2
            bands = np.array_split(spec, 8)
            out["band_energy"].append([float(b.mean()) for b in bands])
        return pa.table(
            {
                "audio_id": pa.array(out["audio_id"], pa.string()),
                "rms": pa.array(out["rms"], pa.float32()),
                "zcr": pa.array(out["zcr"], pa.float32()),
                "band_energy": pa.array(out["band_energy"], pa.list_(pa.float32())),
            }
        )


class VideoFrameSampleSlot:
    """Video frame-sampling slot: emit ``n_sample`` evenly spaced frame
    rows per video. Stub decode synthesizes deterministic frames; the
    real slot swaps ``_frame``. Output rows carry encoded PNG frames —
    the same inline-binary layout the chip pipeline uses."""

    def __init__(self, n_sample: int = 4, frame_hw: tuple[int, int] = (32, 32),
                 strict: bool = False):
        if strict:
            raise NotImplementedError("no video decode library; use stub")
        self.n_sample = n_sample
        self.frame_hw = frame_hw

    def _frame(self, payload: bytes, idx: int) -> np.ndarray:
        seed = int.from_bytes(
            hashlib.blake2b(payload[:64] + bytes([idx]), digest_size=8).digest(),
            "little",
        )
        rng = np.random.default_rng(seed)
        h, w = self.frame_hw
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"video_id": [], "frame_idx": [], "bytes": [], "w": [], "h": []}
        for i in range(len(batch)):
            vid = batch["video_id"][i].as_py()
            payload = batch["bytes"][i].as_py() or b""
            n_frames = int(batch["n_frames"][i].as_py() or self.n_sample)
            step = max(1, n_frames // self.n_sample)
            for k in range(0, min(n_frames, self.n_sample * step), step):
                frame = self._frame(payload, k)
                out["video_id"].append(vid)
                out["frame_idx"].append(k)
                out["bytes"].append(codec.encode_png(frame))
                out["h"].append(frame.shape[0])
                out["w"].append(frame.shape[1])
        return pa.table(
            {
                "video_id": pa.array(out["video_id"], pa.string()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "bytes": pa.array(out["bytes"], pa.binary()),
                "w": pa.array(out["w"], pa.int32()),
                "h": pa.array(out["h"], pa.int32()),
            }
        )


class ImageStatsSlot:
    """Actor-pool decode + feature stage over the north-rule image
    table (image_id, bytes, w, h, fmt, caption, phash): decodes each
    payload (png / qdct via functions.codec) and emits per-image pixel
    stats plus a recomputed average-hash compared to the stored phash
    — a per-row integrity invariant that rides along with feature
    extraction (phash_ok must be all-true for lossless fmts; the qdct
    fmt quantizes, so its hash is recomputed on the DECODED pixels and
    still deterministic). Output is slim (no bytes column), so chips
    never enter downstream shuffles."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids, means, checksums, ok = [], [], [], []
        for i in range(n):
            img = codec.decode(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            ids.append(batch["image_id"][i].as_py())
            means.append(
                int(np.floor(img.astype(np.float64).mean() * 1000.0 + 0.5))
            )
            checksums.append(int(img.astype(np.uint64).sum()))
            ok.append(codec.average_hash(img) == batch["phash"][i].as_py())
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "pixel_mean_milli": pa.array(means, pa.int64()),
                "pixel_checksum": pa.array(checksums, pa.int64()),
                "phash_ok": pa.array(ok, pa.bool_()),
            }
        )


def image_stats(images, concurrency: int = 2, batch_size: int = 64):
    """images table → per-image stats via the actor-pool decode stage
    (small batches — binary payloads dominate block memory)."""
    return images.map_batches(
        ImageStatsSlot, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


class ImageResizeStage:
    """Real image resize stage (decode → bilinear resize → re-encode),
    the multimodal counterpart of the tiler for thumbnailing at scale."""

    def __init__(self, out_h: int = 64, out_w: int = 64):
        self.out_h = out_h
        self.out_w = out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .raster import bilinear_resize

        out_bytes = []
        for i in range(len(batch)):
            img = codec.decode(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            small = np.clip(
                np.round(bilinear_resize(img, self.out_h, self.out_w)), 0, 255
            ).astype(np.uint8)
            out_bytes.append(codec.encode(small, batch["fmt"][i].as_py()))
        t = batch.set_column(
            batch.schema.get_field_index("bytes"), "bytes",
            pa.array(out_bytes, pa.binary()),
        )
        t = t.set_column(
            t.schema.get_field_index("w"), "w",
            pa.array(np.full(len(t), self.out_w, np.int32)),
        )
        return t.set_column(
            t.schema.get_field_index("h"), "h",
            pa.array(np.full(len(t), self.out_h, np.int32)),
        )

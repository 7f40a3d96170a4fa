"""Raster stage kernels: image tiling + the stretch/normalize family.

Array kernels are pure numpy (unit-testable); dataset stages wrap them
as Arrow ``map_batches`` callables. The tiler is a callable CLASS →
actor pool (``map_batches(ImageTiler, concurrency=N)``) so per-actor
setup (DCT matrices, scratch buffers) happens once, not per batch.

Reference cites:
- split_raster 1024×1024 overlap 100 px — batch_sam.py:359, config.py:42
- split_image 100 m windows + 30 m buffer — get_polygons.py:588-663
- linStretch / percentileStretch — tree_health_detection/main.py:47-61
- stretch_image 2–98 percentile → uint8 — batch_sam.py:328-342
- cumulative_linear_stretch under mask — store_data_structures.py:70-94
- clean_hsi_to_0_255_range — tree_health_detection/utils.py:27-48
- HSI bad-band removal — build_dataloaders.py:70-93
- normalize_rgb (ImageNet mean-std, 224 crop) — build_dataloaders.py:111-142
- normalize_point_cloud (centroid subtract) — build_dataloaders.py:96-109
- pad_image — build_dataloaders.py:22-24
- y-flip / rot90 orientation fixes — batch_sam.py:377-387
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codec

__all__ = [
    "linear_stretch",
    "percentile_stretch",
    "masked_linear_stretch",
    "clean_hsi",
    "HSI_BAD_BANDS",
    "normalize_rgb_array",
    "normalize_point_cloud",
    "pad_image",
    "ImageTiler",
    "split_images",
    "ImageStretcher",
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406])
IMAGENET_STD = np.array([0.229, 0.224, 0.225])
# reference build_dataloaders.py:70-93 bad water-absorption band ranges
HSI_BAD_BANDS = [(0, 14), (190, 219), (274, 320), (399, 426)]


# ------------------------------------------------------------- kernels

def linear_stretch(arr: np.ndarray) -> np.ndarray:
    """Min-max stretch to [0, 255] uint8 (reference linStretch)."""
    a = arr.astype(np.float64)
    lo, hi = a.min(), a.max()
    if hi <= lo:
        return np.zeros_like(a, dtype=np.uint8)
    return (255.0 * (a - lo) / (hi - lo)).astype(np.uint8)


def percentile_stretch(arr: np.ndarray, p_lo: float = 2.0, p_hi: float = 98.0) -> np.ndarray:
    """2–98 percentile stretch → uint8 (reference stretch_image)."""
    a = arr.astype(np.float64)
    lo, hi = np.percentile(a, [p_lo, p_hi])
    if hi <= lo:
        return np.zeros_like(a, dtype=np.uint8)
    return np.clip(255.0 * (a - lo) / (hi - lo), 0, 255).astype(np.uint8)


def masked_linear_stretch(arr: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Per-band min-max stretch computed over foreground pixels only
    (reference cumulative_linear_stretch)."""
    out = np.zeros(arr.shape, dtype=np.uint8)
    fg = mask.astype(bool)
    if not fg.any():
        return out
    for b in range(arr.shape[2]):
        band = arr[:, :, b].astype(np.float64)
        lo, hi = band[fg].min(), band[fg].max()
        if hi <= lo:
            continue
        out[:, :, b] = np.clip(255.0 * (band - lo) / (hi - lo), 0, 255).astype(np.uint8)
    return out


def clean_hsi(cube: np.ndarray, bad_bands=HSI_BAD_BANDS,
              clip_max: float = 10000.0) -> np.ndarray:
    """Drop water-absorption bands, clip to [0, clip_max], scale to
    0–255 (reference clean_hsi_to_0_255_range + bad-band removal).
    cube: (bands, h, w). 426 bands → 310 after the default ranges."""
    keep = np.ones(cube.shape[0], dtype=bool)
    for lo, hi in bad_bands:
        keep[lo:hi] = False
    kept = cube[keep]
    kept = np.clip(kept, 0.0, clip_max)
    return (kept / clip_max * 255.0).astype(np.uint8)


def normalize_rgb_array(img: np.ndarray, crop: int | None = 224) -> np.ndarray:
    """/255 → ImageNet mean-std normalize → center crop/pad to
    ``crop``² (reference preprocess_rgb). Input HxWx3 uint8; output
    float32 HxWx3."""
    a = img.astype(np.float32) / 255.0
    a = (a - IMAGENET_MEAN.astype(np.float32)) / IMAGENET_STD.astype(np.float32)
    if crop is not None:
        a = _center_crop_or_pad(a, crop, crop)
    return a.astype(np.float32)


def _center_crop_or_pad(a: np.ndarray, th: int, tw: int) -> np.ndarray:
    h, w = a.shape[:2]
    # crop
    if h > th:
        o = (h - th) // 2
        a = a[o : o + th]
    if w > tw:
        o = (w - tw) // 2
        a = a[:, o : o + tw]
    # pad
    h, w = a.shape[:2]
    if h < th or w < tw:
        pad = [(0, th - h), (0, tw - w)] + [(0, 0)] * (a.ndim - 2)
        a = np.pad(a, pad)
    return a


def pad_image(a: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Zero-pad to target shape (reference pad_image)."""
    pad = [(0, max(0, th - a.shape[0])), (0, max(0, tw - a.shape[1]))]
    pad += [(0, 0)] * (a.ndim - 2)
    return np.pad(a, pad)


def normalize_point_cloud(xyz: np.ndarray) -> np.ndarray:
    """Subtract centroid (reference normalize_point_cloud); result has
    centroid ≈ 0 (reference tests/build_dataloaders_test.py:38-42)."""
    return xyz - xyz.mean(axis=0, keepdims=True)


# -------------------------------------------------------------- stages

class ImageTiler:
    """Actor-pool stage: split each image row into tile_px×tile_px
    subtiles with ``overlap_px`` overlap (reference split_raster,
    batch_sam.py:359). Emits one row per subtile with pixel offsets so
    downstream geo stages can rebase affines.

    Use: images.map_batches(ImageTiler(tile_px, overlap_px),
    batch_format="pyarrow", concurrency=N, batch_size=B)."""

    def __init__(self, tile_px: int = 256, overlap_px: int = 25,
                 reencode: bool = True):
        self.tile_px = tile_px
        self.overlap_px = overlap_px
        self.reencode = reencode

    def __call__(self, batch: pa.Table) -> pa.Table:
        step = self.tile_px - self.overlap_px
        out = {k: [] for k in ("image_id", "tile_idx", "x_off", "y_off",
                               "w", "h", "bytes", "fmt")}
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        for i, (iid, fmt) in enumerate(zip(ids, fmts)):
            img = codec.decode(batch["bytes"][i].as_py(), fmt)
            if img.ndim == 2:
                img = img[:, :, None]
            h, w = img.shape[:2]
            ti = 0
            for y0 in range(0, max(1, h - self.overlap_px), step):
                for x0 in range(0, max(1, w - self.overlap_px), step):
                    y1 = min(h, y0 + self.tile_px)
                    x1 = min(w, x0 + self.tile_px)
                    sub = img[y0:y1, x0:x1]
                    out["image_id"].append(iid)
                    out["tile_idx"].append(ti)
                    out["x_off"].append(x0)
                    out["y_off"].append(y0)
                    out["w"].append(x1 - x0)
                    out["h"].append(y1 - y0)
                    out["bytes"].append(
                        codec.encode(sub, fmt) if self.reencode
                        else codec.encode_npy(sub)
                    )
                    out["fmt"].append(fmt if self.reencode else "npy")
                    ti += 1
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "tile_idx": pa.array(out["tile_idx"], pa.int32()),
                "x_off": pa.array(out["x_off"], pa.int32()),
                "y_off": pa.array(out["y_off"], pa.int32()),
                "w": pa.array(out["w"], pa.int32()),
                "h": pa.array(out["h"], pa.int32()),
                "bytes": pa.array(out["bytes"], pa.binary()),
                "fmt": pa.array(out["fmt"], pa.string()),
            }
        )


def split_images(images, tile_px: int = 256, overlap_px: int = 25,
                 concurrency: int | None = None, batch_size: int = 8):
    """Dataset stage: images → subtile rows. Small batch_size — rows
    carry megapixel payloads (ray_guide: size batches to the payload)."""
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return images.map_batches(
        ImageTiler(tile_px, overlap_px),
        batch_format="pyarrow",
        batch_size=batch_size,
        **kwargs,
    )


class ImageStretcher:
    """Actor-pool stage: decode → stretch (linear | percentile) →
    re-encode each image row in place (reference stretch_image)."""

    def __init__(self, mode: str = "percentile", p_lo: float = 2.0,
                 p_hi: float = 98.0):
        self.mode = mode
        self.p_lo = p_lo
        self.p_hi = p_hi

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch["fmt"].to_pylist()
        out = []
        for i, fmt in enumerate(fmts):
            img = codec.decode(batch["bytes"][i].as_py(), fmt)
            if self.mode == "linear":
                img = linear_stretch(img)
            else:
                img = percentile_stretch(img, self.p_lo, self.p_hi)
            out.append(codec.encode(img, fmt))
        idx = batch.schema.get_field_index("bytes")
        return batch.set_column(idx, "bytes", pa.array(out, pa.binary()))

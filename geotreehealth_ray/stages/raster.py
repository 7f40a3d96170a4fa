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
    "normalize_hsi",
    "preprocess_hsi",
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


def normalize_hsi(cube: np.ndarray, scale: bool = False) -> np.ndarray:
    """Reference normalize_hsi (build_dataloaders.py:145-170): the
    active behavior is only the CHW→HWC transpose — the L2 + per-band
    min-max normalization body is commented out there. ``scale=True``
    enables that dormant branch (per-pixel L2 across bands, per-band
    min-max over positives, zeros preserved) for parity with the
    commented code. Input (C,H,W) float; output (H,W,C) float32."""
    a = np.transpose(cube, (1, 2, 0)).astype(np.float32)
    if not scale:
        return a
    eps = np.float32(1e-8)
    l2 = np.linalg.norm(a, axis=2, keepdims=True).astype(np.float32)
    a = a / (l2 + eps)
    pos = a > 0
    min_vals = np.min(np.where(pos, a, np.inf), axis=(0, 1), keepdims=True)
    min_vals = np.where(np.isfinite(min_vals), min_vals, 0.0).astype(np.float32)
    max_vals = np.max(a, axis=(0, 1), keepdims=True).astype(np.float32)
    scaled = (a - min_vals) / (max_vals - min_vals + eps)
    return np.where(a == 0, np.float32(0.0), scaled).astype(np.float32)


def preprocess_hsi(cube: np.ndarray, scale: bool = False) -> np.ndarray:
    """Full reference HSI dataloader chain (build_dataloaders.py:70-86
    ``preprocess``): clip to [0, 10000] + nan→0, drop the four
    water-absorption band ranges (426 → 310), CHW→HWC transpose
    (``normalize_hsi`` — whose scaling body is commented out there),
    then ``np.pad(..., ((0,0),(2,2),(2,2)))``. The pad runs AFTER the
    transpose, so its axes (1, 2) are WIDTH and CHANNELS of the HWC
    cube — output (h, w+4, 314); the reference's own CI test enshrines
    shape[2] == 314 (tests/build_dataloaders_test.py:36). That test's
    ``max <= 1`` assertion can only hold with the dormant scaling
    branch — pass ``scale=True`` for it."""
    a = np.clip(np.nan_to_num(cube.astype(np.float64)), 0.0, 10000.0)
    keep = np.ones(a.shape[0], dtype=bool)
    for lo, hi in HSI_BAD_BANDS:
        keep[lo:hi] = False
    a = normalize_hsi(a[keep], scale=scale)
    return np.pad(
        a.astype(np.float32), ((0, 0), (2, 2), (2, 2)), "constant",
        constant_values=0,
    )


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

def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize (reference ``upscale_array`` via scipy.zoom,
    get_polygons.py:553-566 — scipy absent, pure numpy)."""
    img = np.asarray(img, dtype=np.float64)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, c = img.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    out = (
        img[y0][:, x0] * (1 - wy) * (1 - wx)
        + img[y0][:, x1] * (1 - wy) * wx
        + img[y1][:, x0] * wy * (1 - wx)
        + img[y1][:, x1] * wy * wx
    )
    return out[:, :, 0] if squeeze else out


def rgb_to_lab(rgb: np.ndarray) -> np.ndarray:
    """sRGB uint8 → CIELAB (D65), pure numpy (reference uses
    skimage.color in rgb_hsi_fusion.py — reimplemented from the
    standard sRGB→XYZ→Lab formulas)."""
    x = rgb.astype(np.float64) / 255.0
    lin = np.where(x > 0.04045, ((x + 0.055) / 1.055) ** 2.4, x / 12.92)
    m = np.array(
        [[0.4124564, 0.3575761, 0.1804375],
         [0.2126729, 0.7151522, 0.0721750],
         [0.0193339, 0.1191920, 0.9503041]]
    )
    xyz = lin @ m.T
    white = np.array([0.95047, 1.0, 1.08883])
    t = xyz / white
    f = np.where(t > (6 / 29) ** 3, np.cbrt(t), t / (3 * (6 / 29) ** 2) + 4 / 29)
    lab = np.empty_like(f)
    lab[..., 0] = 116 * f[..., 1] - 16
    lab[..., 1] = 500 * (f[..., 0] - f[..., 1])
    lab[..., 2] = 200 * (f[..., 1] - f[..., 2])
    return lab


def lab_to_rgb(lab: np.ndarray) -> np.ndarray:
    fy = (lab[..., 0] + 16) / 116
    fx = fy + lab[..., 1] / 500
    fz = fy - lab[..., 2] / 200
    f = np.stack([fx, fy, fz], axis=-1)
    t = np.where(f > 6 / 29, f**3, 3 * (6 / 29) ** 2 * (f - 4 / 29))
    white = np.array([0.95047, 1.0, 1.08883])
    xyz = t * white
    m_inv = np.array(
        [[3.2404542, -1.5371385, -0.4985314],
         [-0.9692660, 1.8760108, 0.0415560],
         [0.0556434, -0.2040259, 1.0572252]]
    )
    lin = xyz @ m_inv.T
    srgb = np.where(
        lin > 0.0031308, 1.055 * np.clip(lin, 0, None) ** (1 / 2.4) - 0.055,
        12.92 * lin,
    )
    return np.clip(np.round(srgb * 255.0), 0, 255).astype(np.uint8)


def pansharpen(hsi_rgb: np.ndarray, pan_gray: np.ndarray) -> np.ndarray:
    """Pansharpening fusion (reference rgb_hsi_fusion.py:6-85): upscale
    the low-res HSI pseudo-RGB to the PAN resolution, convert to LAB,
    replace the L channel with the (rescaled) high-res PAN intensity,
    convert back. hsi_rgb: (h, w, 3) uint8; pan_gray: (H, W) float/uint8."""
    big = bilinear_resize(hsi_rgb, pan_gray.shape[0], pan_gray.shape[1])
    lab = rgb_to_lab(np.clip(np.round(big), 0, 255).astype(np.uint8))
    pan = pan_gray.astype(np.float64)
    lo, hi = pan.min(), pan.max()
    l_new = np.zeros_like(pan) if hi <= lo else (pan - lo) / (hi - lo) * 100.0
    lab[..., 0] = l_new
    return lab_to_rgb(lab)


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


class PyramidBuilder:
    """Actor-pool stage: emit a multi-resolution tile pyramid per image
    row — level k is the 2^k× box-mean (2×2 average, round-half-up
    in integer arithmetic) downsample of level k−1, the overview /
    COG-style reduced-resolution chain a tiling engine serves zooms
    from. One input row → ``levels`` output rows (image_id, level, w,
    h, bytes, fmt); odd trailing rows/cols are cropped (documented
    floor semantics). All levels of one image are built in one decode
    — the 4/3 total-pixel overhead never re-reads the source."""

    def __init__(self, levels: int = 3, fmt: str = "png"):
        if levels < 1:
            raise ValueError("levels >= 1")
        self.levels = levels
        self.fmt = fmt

    @staticmethod
    def _down2(img: np.ndarray) -> np.ndarray:
        h2, w2 = img.shape[0] // 2, img.shape[1] // 2
        c = img[: 2 * h2, : 2 * w2].astype(np.uint32)
        s = (
            c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2]
        )
        return ((s + 2) // 4).astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("image_id", "level", "w", "h",
                               "bytes", "fmt")}
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        for i, (iid, fmt) in enumerate(zip(ids, fmts)):
            img = codec.decode(batch["bytes"][i].as_py(), fmt)
            if img.ndim == 2:
                img = img[:, :, None]
            cur = img
            for lvl in range(self.levels):
                if lvl > 0:
                    if cur.shape[0] < 2 or cur.shape[1] < 2:
                        break
                    cur = self._down2(cur)
                out["image_id"].append(iid)
                out["level"].append(lvl)
                out["w"].append(cur.shape[1])
                out["h"].append(cur.shape[0])
                out["bytes"].append(codec.encode(cur, self.fmt))
                out["fmt"].append(self.fmt)
        return pa.table({
            "image_id": pa.array(out["image_id"], pa.string()),
            "level": pa.array(out["level"], pa.int32()),
            "w": pa.array(out["w"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
            "bytes": pa.array(out["bytes"], pa.binary()),
            "fmt": pa.array(out["fmt"], pa.string()),
        })


def build_tile_pyramid(images, levels: int = 3,
                       concurrency: int | None = None,
                       batch_size: int = 8):
    """Dataset stage: image rows → pyramid-level rows (one per level).
    Small batch_size — megapixel payloads (ray_guide)."""
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return images.map_batches(
        PyramidBuilder(levels),
        batch_format="pyarrow", batch_size=batch_size, **kwargs,
    )


def stitch_tiles(tiles, out_fmt: str = "png"):
    """Mosaic: re-assemble `split_images` subtile rows into whole
    images — the inverse of the tiler, used to write composited
    rasters back out. All tiles of one image must co-reside: one hash
    shuffle on image_id (the tiles of one image are bounded —
    tile-count × tile-bytes ≪ worker heap — the same contract the
    reference's per-site GPKG merge assumes), then each group pastes
    its decoded tiles at (y_off, x_off). Overlap pixels come from
    tiles with identical source content, so paste order cannot change
    the result; ties are still written in deterministic tile_idx order.

    Output: (image_id, w, h, bytes, fmt)."""
    import pandas as pd

    from ..pipelines.relational import bucketed_reduce

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = {k: [] for k in ("image_id", "w", "h", "bytes", "fmt")}
        for iid, g in df.groupby("image_id", sort=False):
            g = g.sort_values("tile_idx", kind="stable")
            full_h = int((g["y_off"] + g["h"]).max())
            full_w = int((g["x_off"] + g["w"]).max())
            canvas = None
            for r in g.itertuples():
                tile = codec.decode(r.bytes, r.fmt)
                if tile.ndim == 2:
                    tile = tile[:, :, None]
                if canvas is None:
                    canvas = np.zeros(
                        (full_h, full_w, tile.shape[2]), np.uint8
                    )
                canvas[r.y_off:r.y_off + tile.shape[0],
                       r.x_off:r.x_off + tile.shape[1]] = tile
            rows["image_id"].append(iid)
            rows["w"].append(full_w)
            rows["h"].append(full_h)
            rows["bytes"].append(codec.encode(canvas, out_fmt))
            rows["fmt"].append(out_fmt)
        return pd.DataFrame(rows)

    return bucketed_reduce(tiles, "image_id", per_bucket)

"""Model-scorer actor-pool stage contracts (the SAM / DeepForest /
MultiModalNet slots — reference tree_delineation/get_polygons.py:122-159
(SAM load + per-tile embedding), delineation_utils.py:425-431
(DeepForest), tree_health_detection/model_architecture.py:31-87
(MultiModalNet)).

Torch and the model weights are not available in-sandbox, so each slot
ships (a) the REAL Ray plumbing — callable class for
``map_batches(Cls, concurrency=N, num_gpus=g, batch_size=B)``, weights
loaded once in ``__init__``, per-tile embedding cache, Arrow in/out
schema — and (b) a deterministic STUB forward pass, clearly marked.
Swapping in the real model = replacing ``_load_model`` /
``_forward``; nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions import codec

__all__ = ["SamSlotScorer", "BoxDetectorSlot", "HealthClassifierSlot",
           "score_crowns_with_sam_slot"]


def _stable_float(key: str, lo: float = 0.0, hi: float = 1.0) -> float:
    h = hashlib.blake2b(key.encode(), digest_size=8).digest()
    return lo + (int.from_bytes(h, "little") / 2**64) * (hi - lo)


class SamSlotScorer:
    """SAM-slot: per batch of (tile_id, bytes, fmt, prompt_x, prompt_y)
    rows, embed each DISTINCT tile once (cached per actor — mirrors the
    reference reusing the tile embedding across prompts,
    batch_sam.py:419-420,483) and emit one mask-score row per prompt."""

    def __init__(self, checkpoint: str | None = None, cache_tiles: int = 4):
        # real path would download + load ViT weights here (reference
        # get_polygons.py:122-136 checkpoint download in setup)
        self.model = self._load_model(checkpoint)
        self.embed_cache: dict[str, np.ndarray] = {}
        self.cache_order: list[str] = []
        self.cache_tiles = cache_tiles

    def _load_model(self, checkpoint):
        """The swap-in seam (reference get_polygons.py:122-136 loads
        the ViT checkpoint here). ``None`` → deterministic stub;
        ``"torch:<path>"`` → a TorchScript module loaded ONCE per
        actor (requires torch — gated, not assumed). Any other string
        is rejected loudly so a typo never silently stubs."""
        if checkpoint is None:
            return "stub-sam"
        if checkpoint.startswith("torch:"):
            try:
                import torch
            except ImportError as e:  # pragma: no cover - torch absent here
                raise NotImplementedError(
                    "checkpoint requires torch, which is unavailable in "
                    "this environment; pass checkpoint=None for the stub"
                ) from e
            return torch.jit.load(checkpoint[len("torch:"):]).eval()
        raise NotImplementedError(
            f"unrecognized checkpoint {checkpoint!r}: use None (stub) "
            "or 'torch:<torchscript path>'"
        )

    def _forward(self, emb: np.ndarray, px: float, py: float,
                 box: tuple[float, float] | None) -> float:
        """One prompt → mask score. Stub: deterministic hash of
        (embedding, prompt). Torch path: the loaded module maps the
        feature vector [mean(emb), px, py] → scalar score — the same
        per-prompt contract the real SAM predictor fills."""
        if isinstance(self.model, str):  # stub
            key = f"{emb.sum():.3f}:{px:.2f}:{py:.2f}"
            if box is not None:
                key += f":{box[0]:.2f}:{box[1]:.2f}"
            return _stable_float(key)
        import torch  # model present ⇒ torch present

        feat = torch.tensor(
            [float(emb.mean()), float(px), float(py)], dtype=torch.float32
        )
        with torch.no_grad():
            return float(self.model(feat))

    def _embed(self, tile_id: str, data: bytes, fmt: str) -> np.ndarray:
        if tile_id in self.embed_cache:
            return self.embed_cache[tile_id]
        img = codec.decode(data, fmt)
        # stub embedding: per-channel means — deterministic, cheap
        emb = img.reshape(-1, img.shape[-1]).mean(axis=0) if img.ndim == 3 else np.array([img.mean()])
        self.embed_cache[tile_id] = emb
        self.cache_order.append(tile_id)
        if len(self.cache_order) > self.cache_tiles:
            del self.embed_cache[self.cache_order.pop(0)]
        return emb

    def __call__(self, batch: pa.Table) -> pa.Table:
        tids = batch["tile_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()

        def _f64(col):  # nulls (box-only prompts) → NaN, not None
            return col.cast(pa.float64()).to_numpy(zero_copy_only=False)

        pxs = _f64(batch["prompt_x"])
        pys = _f64(batch["prompt_y"])
        # box-prompt rows (mode ∈ {bbox, bbox_and_centers}) carry box
        # coords; fold them into the stub forward's key when present
        has_box = "box_minx" in batch.column_names
        if has_box:
            bminx = _f64(batch["box_minx"])
            bminy = _f64(batch["box_miny"])
        scores = np.empty(len(batch))
        for i, tid in enumerate(tids):
            emb = self._embed(tid, batch["bytes"][i].as_py(), fmts[i])
            box = None
            if has_box and np.isfinite(bminx[i]):
                box = (float(bminx[i]), float(bminy[i]))
            scores[i] = self._forward(emb, pxs[i], pys[i], box)
        return pa.table(
            {
                "tile_id": pa.array(tids),
                "prompt_x": batch["prompt_x"],
                "prompt_y": batch["prompt_y"],
                "mask_score": pa.array(scores, pa.float32()),
            }
        )


class BoxDetectorSlot:
    """DeepForest-slot detector: image rows in → bbox rows out
    (reference extract_boxes, delineation_utils.py:425-431; y-flip
    handled downstream as in delineation_pipeline.py:80-82)."""

    def __init__(self, model_name: str | None = None, max_boxes: int = 16):
        if model_name is not None:
            raise NotImplementedError("pretrained weights unavailable; use stub")
        self.max_boxes = max_boxes

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"image_id": [], "xmin": [], "ymin": [], "xmax": [], "ymax": [], "score": []}
        for i, iid in enumerate(batch["image_id"].to_pylist()):
            w = int(batch["w"][i].as_py())
            h = int(batch["h"][i].as_py())
            n = 1 + int(_stable_float(f"n:{iid}") * (self.max_boxes - 1))
            for b in range(n):
                cx = _stable_float(f"x:{iid}:{b}") * w
                cy = _stable_float(f"y:{iid}:{b}") * h
                r = 4 + _stable_float(f"r:{iid}:{b}") * min(w, h) * 0.1
                out["image_id"].append(iid)
                out["xmin"].append(max(0.0, cx - r))
                out["ymin"].append(max(0.0, cy - r))
                out["xmax"].append(min(float(w), cx + r))
                out["ymax"].append(min(float(h), cy + r))
                out["score"].append(_stable_float(f"s:{iid}:{b}"))
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "xmin": pa.array(out["xmin"], pa.float64()),
                "ymin": pa.array(out["ymin"], pa.float64()),
                "xmax": pa.array(out["xmax"], pa.float64()),
                "ymax": pa.array(out["ymax"], pa.float64()),
                "score": pa.array(out["score"], pa.float32()),
            }
        )


class HealthClassifierSlot:
    """MultiModalNet-slot: chip rows (bytes + mask + stats) → class
    probabilities. Real path: torch weights loaded once per actor,
    batched forward on GPU; stub: deterministic hash scores."""

    CLASSES = ("A", "AU", "DS")

    def __init__(self, weights: str | None = None):
        self.model = self._load_model(weights)

    def _load_model(self, weights):
        """Same seam as :meth:`SamSlotScorer._load_model`: ``None`` →
        stub; ``"torch:<path>"`` → TorchScript module (reference
        model_architecture.py:31-87 MultiModalNet forward)."""
        if weights is None:
            return "stub-mmn"
        if weights.startswith("torch:"):
            try:
                import torch
            except ImportError as e:  # pragma: no cover - torch absent here
                raise NotImplementedError(
                    "weights require torch, which is unavailable; pass "
                    "weights=None for the stub"
                ) from e
            return torch.jit.load(weights[len("torch:"):]).eval()
        raise NotImplementedError(
            f"unrecognized weights {weights!r}: use None (stub) or "
            "'torch:<torchscript path>'"
        )

    def _forward(self, crown_ids: list) -> np.ndarray:
        """(n, n_classes) logits. Stub: per-crown hash logits. Torch
        path: one BATCHED module call (n, feat) → (n, n_classes) — the
        batching contract the real classifier relies on."""
        if isinstance(self.model, str):  # stub
            raw = np.array(
                [[_stable_float(f"{cid}:{c}") for c in self.CLASSES]
                 for cid in crown_ids]
            )
            return raw
        import torch

        feats = torch.tensor(
            [[_stable_float(f"feat:{cid}")] for cid in crown_ids],
            dtype=torch.float32,
        )
        with torch.no_grad():
            return self.model(feats).numpy().astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["crown_id"].to_pylist()
        raw_all = self._forward(ids)
        probs = np.empty((len(ids), len(self.CLASSES)), np.float32)
        for i in range(len(ids)):
            raw = raw_all[i]
            e = np.exp(raw - raw.max())
            probs[i] = e / e.sum()
        pred = [self.CLASSES[int(np.argmax(p))] for p in probs]
        return pa.table(
            {
                "crown_id": pa.array(ids, pa.string()),
                "pred_status": pa.array(pred, pa.string()),
                "prob": pa.array(probs.max(axis=1), pa.float32()),
            }
        )


def score_crowns_with_sam_slot(prompts, concurrency: int = 2, batch_size: int = 64,
                               scorer_cls: type = SamSlotScorer,
                               **scorer_kwargs):
    """prompts: Dataset of (tile_id, bytes, fmt, prompt_x, prompt_y).
    Wire-up helper showing the canonical actor-pool invocation; for a
    GPU model add ``num_gpus=…`` and size concurrency to the GPUs.
    ``scorer_cls`` / ``scorer_kwargs`` expose the swap-in seam at the
    pipeline level: a subclass overriding ``_load_model``/``_forward``
    (or ``checkpoint="torch:<path>"``) drops in with zero plumbing
    changes."""
    return prompts.map_batches(
        scorer_cls,
        fn_constructor_kwargs=scorer_kwargs or None,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

"""Host-side image preprocessing for the VLM path (qwen2-vl family).

Counterpart of the reference's C++ processors
(reference xllm/processors/ qwen2-vl image processor + prompt
processors; SURVEY.md §2.5 VLM processors row). Pure numpy: resize to
patch-grid multiples (smart resize), CLIP-normalize, patchify into the
merge-block-major row order the vision tower's 2D rope expects
(models/vision.py:_rot_pos).
"""

from __future__ import annotations

import hashlib

import numpy as np

# CLIP normalization (qwen2-vl image_processor defaults)
_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def smart_resize(
    height: int,
    width: int,
    factor: int = 28,
    min_pixels: int = 56 * 56,
    max_pixels: int = 14 * 14 * 4 * 1280,
) -> tuple[int, int]:
    """qwen2-vl smart resize: round to ``factor`` multiples keeping the
    pixel budget and aspect ratio."""
    import math

    if max(height, width) / min(height, width) > 200:
        raise ValueError("aspect ratio > 200")
    h_bar = max(factor, round(height / factor) * factor)
    w_bar = max(factor, round(width / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return int(h_bar), int(w_bar)


def _bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """[H, W, C] float -> [out_h, out_w, C] (simple bilinear, numpy)."""
    h, w, c = img.shape
    if (h, w) == (out_h, out_w):
        return img
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


class ImageProcessor:
    def __init__(
        self,
        patch_size: int = 14,
        merge_size: int = 2,
        temporal_patch_size: int = 2,
        min_pixels: int = 56 * 56,
        max_pixels: int = 14 * 14 * 4 * 1280,
        image_mean=None,
        image_std=None,
    ):
        self.patch_size = patch_size
        self.merge_size = merge_size
        self.temporal_patch_size = temporal_patch_size
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        # checkpoint-specific normalization (preprocessor_config.json;
        # e.g. qwen3-vl ships 0.5/0.5 rather than the CLIP constants)
        self.mean = (
            np.asarray(image_mean, np.float32)
            if image_mean is not None else _MEAN
        )
        self.std = (
            np.asarray(image_std, np.float32)
            if image_std is not None else _STD
        )

    def content_hash(self, image: np.ndarray) -> str:
        """Stable key for the encoder cache (reference encoder_cache.h:29)."""
        return hashlib.sha256(
            np.ascontiguousarray(image).tobytes()
        ).hexdigest()[:32]

    def __call__(
        self, image: np.ndarray
    ) -> tuple[np.ndarray, tuple[int, int, int]]:
        """[H, W, 3] uint8/float -> (patch rows [N, patch_dim],
        (grid_t, grid_h, grid_w)). N = grid_t*grid_h*grid_w; the LLM sees
        N / merge_size^2 image tokens."""
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        h, w = image.shape[:2]
        factor = self.patch_size * self.merge_size
        oh, ow = smart_resize(
            h, w, factor, self.min_pixels, self.max_pixels
        )
        img = _bilinear_resize(image.astype(np.float32), oh, ow)
        img = (img - self.mean) / self.std
        img = img.transpose(2, 0, 1)  # [C, H, W]
        # temporal axis: a still image repeats to temporal_patch_size
        tp = self.temporal_patch_size
        frames = np.repeat(img[None], tp, axis=0)  # [Tp, C, H, W]
        c = img.shape[0]
        ps, m = self.patch_size, self.merge_size
        gh, gw = oh // ps, ow // ps
        # [Tp, C, gh, ps, gw, ps] -> merge-block-major patch rows
        x = frames.reshape(tp, c, gh, ps, gw, ps)
        x = x.transpose(2, 4, 1, 0, 3, 5)  # [gh, gw, C, Tp, ps, ps]
        x = x.reshape(gh // m, m, gw // m, m, c * tp * ps * ps)
        x = x.transpose(0, 2, 1, 3, 4)  # merge blocks outer
        patches = x.reshape(gh * gw, c * tp * ps * ps)
        return patches.astype(np.float32), (1, gh, gw)

    def num_llm_tokens(self, grid: tuple[int, int, int]) -> int:
        t, gh, gw = grid
        return t * gh * gw // (self.merge_size**2)

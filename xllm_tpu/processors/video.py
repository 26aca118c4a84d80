"""Host-side video preprocessing for the VLM path (qwen2-vl family).

Counterpart of the reference's C++ video processors
(reference xllm/processors/qwen2_vl_video_processor.h:30-49 —
``sample_frames`` + ``process_video`` producing pixel patches and the
(t, h, w) grid; video_processor.h base). Pure numpy: fps-targeted frame
sampling, shared smart-resize across frames, CLIP-normalize, and
temporal patchify into the same merge-block-major row order the vision
tower's 2D rope expects (models/vision.py:_rot_pos), extended with the
temporal grid dimension outermost.
"""

from __future__ import annotations

import numpy as np

from xllm_tpu.processors.image import _MEAN, _STD, _bilinear_resize, smart_resize


def sample_frames(
    num_frames: int,
    video_fps: float,
    target_fps: float = 2.0,
    min_frames: int = 4,
    max_frames: int = 768,
    temporal_patch_size: int = 2,
) -> np.ndarray:
    """Frame indices to keep (reference Qwen2VLVideoProcessor::sample_frames,
    qwen2_vl_video_processor.h:43-49): sample at ``target_fps``, clamp to
    [min_frames, max_frames], round to a temporal_patch_size multiple."""
    if num_frames <= 0:
        raise ValueError("video has no frames")
    tp = temporal_patch_size
    want = num_frames
    if video_fps and video_fps > 0:
        want = int(round(num_frames / video_fps * target_fps))
    want = max(min(want, max_frames, num_frames), min(min_frames, num_frames))
    want = max((want // tp) * tp, tp) if num_frames >= tp else num_frames
    idx = np.linspace(0, num_frames - 1, want)
    return np.round(idx).astype(np.int64)


class VideoProcessor:
    def __init__(
        self,
        patch_size: int = 14,
        merge_size: int = 2,
        temporal_patch_size: int = 2,
        min_pixels: int = 56 * 56,
        max_pixels: int = 768 * 28 * 28,
        target_fps: float = 2.0,
        min_frames: int = 4,
        max_frames: int = 768,
        image_mean=None,
        image_std=None,
    ):
        self.patch_size = patch_size
        self.merge_size = merge_size
        self.temporal_patch_size = temporal_patch_size
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        self.target_fps = target_fps
        self.min_frames = min_frames
        self.max_frames = max_frames
        self.mean = (
            np.asarray(image_mean, np.float32)
            if image_mean is not None else _MEAN
        )
        self.std = (
            np.asarray(image_std, np.float32)
            if image_std is not None else _STD
        )

    def content_hash(self, patches: np.ndarray) -> str:
        import hashlib

        return hashlib.sha256(
            np.ascontiguousarray(patches).tobytes()
        ).hexdigest()[:32]

    def __call__(
        self, frames: np.ndarray, fps: float = 0.0
    ) -> tuple[np.ndarray, tuple[int, int, int], float]:
        """[T, H, W, 3] uint8/float -> (patch rows [gt*gh*gw, patch_dim],
        grid (gt, gh, gw), second_per_grid_t). ``second_per_grid_t`` is
        the wall-clock seconds each temporal grid step spans — the
        qwen2.5-vl M-RoPE temporal scale."""
        frames = np.asarray(frames)
        if frames.ndim == 3:
            frames = frames[None]
        if frames.dtype == np.uint8:
            frames = frames.astype(np.float32) / 255.0
        n_src = frames.shape[0]
        idx = sample_frames(
            n_src, fps, self.target_fps,
            self.min_frames, self.max_frames, self.temporal_patch_size,
        )
        frames = frames[idx]
        n_sampled = frames.shape[0]
        tp = self.temporal_patch_size
        t = frames.shape[0]
        if t % tp:
            # repeat the last frame up to a temporal patch multiple
            # (reference pads the tail group the same way)
            pad = tp - t % tp
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], pad, axis=0)], axis=0
            )
            t = frames.shape[0]
        h, w = frames.shape[1:3]
        factor = self.patch_size * self.merge_size
        oh, ow = smart_resize(h, w, factor, self.min_pixels, self.max_pixels)
        resized = np.stack(
            [_bilinear_resize(f.astype(np.float32), oh, ow) for f in frames]
        )
        resized = (resized - self.mean) / self.std
        vid = resized.transpose(0, 3, 1, 2)  # [T, C, H, W]
        c = vid.shape[1]
        ps, m = self.patch_size, self.merge_size
        gt, gh, gw = t // tp, oh // ps, ow // ps
        # [gt, tp, C, gh, ps, gw, ps] -> t-outer merge-block-major rows,
        # row content (C, tp, ps, ps) — the image processor's layout with
        # the temporal grid outermost (HF qwen2-vl video patch order)
        x = vid.reshape(gt, tp, c, gh, ps, gw, ps)
        x = x.transpose(0, 3, 5, 2, 1, 4, 6)  # [gt, gh, gw, C, tp, ps, ps]
        x = x.reshape(gt, gh // m, m, gw // m, m, c * tp * ps * ps)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # merge blocks outer
        patches = x.reshape(gt * gh * gw, c * tp * ps * ps)
        # wall-clock seconds per temporal grid step = tp / SAMPLED fps
        # (HF qwen2.5-vl temporal_patch_size / sampling fps) — the source
        # fps would compress temporal rope by video_fps/target_fps; the
        # sampled rate is derived from the actual kept frame count so
        # min/max_frames clamping is accounted for
        if fps and fps > 0 and n_sampled > 0:
            duration_s = n_src / fps
            second_per_grid_t = tp * duration_s / n_sampled
        else:
            second_per_grid_t = 1.0
        return patches.astype(np.float32), (gt, gh, gw), second_per_grid_t

    def num_llm_tokens(self, grid: tuple[int, int, int]) -> int:
        t, gh, gw = grid
        return t * gh * gw // (self.merge_size**2)

"""DiT (diffusion transformer) serving stack — flux-class text→image.

TPU-native counterpart of the reference's DiT subsystem:
- models/schedulers: xllm/models/dit/ (22,855 LoC libtorch) → model.py,
  vae.py, pipeline.py (one lax.scan denoise loop)
- dit cache: xllm/core/framework/dit_cache/ → cache.py (in-graph
  FBCache / TaylorSeer / FBCacheTaylorSeer / ResidualCache)
- Ulysses SP: models/dit/utils/dit_parallel_linear.h → sp.py
- DiTEngine/DiTScheduler/DiTMaster → engine.py
"""

from xllm_tpu.dit.cache import DiTCacheConfig, make_dit_cache
from xllm_tpu.dit.engine import DiTEngine, DiTRequest, png_b64
from xllm_tpu.dit.model import DiTConfig, DiTModel
from xllm_tpu.dit.pipeline import (DiTPipeline, PipelineConfig,
                                   flow_match_sigmas)
from xllm_tpu.dit.vae import VAEConfig, VAEDecoder

__all__ = [
    "DiTCacheConfig", "make_dit_cache", "DiTEngine", "DiTRequest",
    "png_b64", "DiTConfig", "DiTModel", "DiTPipeline", "PipelineConfig",
    "flow_match_sigmas", "VAEConfig", "VAEDecoder",
]

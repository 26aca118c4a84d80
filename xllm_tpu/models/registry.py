"""Model registry.

Counterpart of the reference's ModelRegistry factory macros
(reference xllm/models/model_registry.h:76,141,150-247). Model families map
to a model class + the HF checkpoint name mapping used by the loader.
"""

from __future__ import annotations

from xllm_tpu.config import ModelConfig


class ModelRegistry:
    _registry: dict[str, type] = {}

    @classmethod
    def register(cls, *names: str):
        def deco(model_cls: type) -> type:
            for n in names:
                cls._registry[n] = model_cls
            return model_cls

        return deco

    @classmethod
    def get(cls, name: str) -> type:
        if name not in cls._registry:
            raise ValueError(
                f"unknown model_type {name!r}; known: {sorted(cls._registry)}"
            )
        return cls._registry[name]


def get_model_class(model_type: str) -> type:
    # import triggers registration
    from xllm_tpu.models.decoder import DenseDecoderModel
    from xllm_tpu.models.moe_decoder import MoeDecoderModel

    from xllm_tpu.models.mla_decoder import MlaDecoderModel
    from xllm_tpu.models import glm4v  # noqa: F401 (registers glm4v)
    from xllm_tpu.models import qwen2_vl  # noqa: F401 (registers qwen2_vl)
    from xllm_tpu.models import qwen3_vl  # noqa: F401 (registers qwen3_vl)
    from xllm_tpu.models import qwen3_next  # noqa: F401 (registers)

    ModelRegistry._registry.setdefault("llama", DenseDecoderModel)
    # mistral == llama architecture + optional sliding-window attention
    # (reference registry mistral row, model_registry.h:150-247)
    ModelRegistry._registry.setdefault("mistral", DenseDecoderModel)
    ModelRegistry._registry.setdefault("glm4", DenseDecoderModel)
    ModelRegistry._registry.setdefault("qwen2", DenseDecoderModel)
    ModelRegistry._registry.setdefault("qwen3", DenseDecoderModel)
    ModelRegistry._registry.setdefault("qwen3_moe", MoeDecoderModel)
    ModelRegistry._registry.setdefault("deepseek_v2", MlaDecoderModel)
    ModelRegistry._registry.setdefault("deepseek_v3", MlaDecoderModel)
    # kimi-k2 is the deepseek-v3 architecture with noaux_tc routing
    # (reference kimi_k2.h REGISTER_CAUSAL_MODEL(kimi_k2, DeepseekV2...))
    ModelRegistry._registry.setdefault("kimi_k2", MlaDecoderModel)
    # DSA families: deepseek-v3.2 + glm5 share the MLA arch with the
    # lightning indexer (reference deepseek_v32.h, glm5.h:21-43)
    ModelRegistry._registry.setdefault("deepseek_v32", MlaDecoderModel)
    ModelRegistry._registry.setdefault("glm_moe_dsa", MlaDecoderModel)
    # glm4-moe-lite: MLA with GLM's concat (rotate-half) rotary
    # (reference glm4_moe_lite.h:105-127)
    from xllm_tpu.models.mla_decoder import Glm4MoeLiteModel

    ModelRegistry._registry.setdefault("glm4_moe_lite", Glm4MoeLiteModel)
    # minimax-m2: GQA + partial rotary + per-layer MoE with sigmoid/noaux
    # routing (reference minimax_m2.h) -> the generic MoE decoder
    ModelRegistry._registry.setdefault("minimax_m2", MoeDecoderModel)
    # glm4-moe (GLM-4.5/4.6): GQA + partial rotate-half rope + deepseek
    # noaux_tc routing + shared expert + dense first-k layers
    # (reference glm4_moe rows, model_registry.h:150-247)
    ModelRegistry._registry.setdefault("glm4_moe", MoeDecoderModel)
    # mimo (Xiaomi MiMo): qwen2 decoder layers + MTP draft heads
    # (reference mimo.h: LlmModelImplBase<layer::Qwen2DecoderLayer>,
    # REGISTER_CAUSAL_MODEL(mimo, MiMoForCausalLM), mimo_mtp.h)
    ModelRegistry._registry.setdefault("mimo", DenseDecoderModel)
    return ModelRegistry.get(model_type)


def create_model(cfg: ModelConfig):
    return get_model_class(cfg.model_type)(cfg)

"""Python side of the embedded C API (native/src/c_api.cpp).

Counterpart of the reference C API's request marshalling
(reference xllm/c_api/llm.h:110-221): the shim calls these helpers with
plain scalars/strings so all object construction stays in Python.
"""

from __future__ import annotations

import json


def create_llm(
    model_path: str,
    max_model_len: int,
    max_seqs_per_batch: int,
    block_size: int,
    num_blocks: int,
    quantization: str,
    extra_config_json: str,
):
    import os

    if os.environ.get("XLLM_C_PLATFORM"):
        # embedded hosts pick the backend before any jax use (the axon
        # sitecustomize overrides JAX_PLATFORMS; in-process config wins)
        import jax

        jax.config.update("jax_platforms", os.environ["XLLM_C_PLATFORM"])
    from xllm_tpu.config import EngineConfig, ModelConfig
    from xllm_tpu.llm import LLM
    from xllm_tpu.models.model_args import load_model_config

    model_cfg = load_model_config(model_path) if model_path else ModelConfig()
    config = EngineConfig(model=model_cfg)
    if max_model_len > 0:
        config.scheduler.max_model_len = max_model_len
    if max_seqs_per_batch > 0:
        config.scheduler.max_seqs_per_batch = max_seqs_per_batch
    if block_size > 0:
        config.cache.block_size = block_size
    if num_blocks > 0:
        config.cache.num_blocks = num_blocks
    if quantization:
        config.quant.method = quantization
    if extra_config_json:
        extra = json.loads(extra_config_json)
        groups = {
            "model": config.model,
            "cache": config.cache,
            "scheduler": config.scheduler,
            "parallel": config.parallel,
            "quant": config.quant,
        }
        for group_name, fields in extra.items():
            if group_name == "engine":  # top-level fields (load_format, …)
                for k, v in fields.items():
                    if not hasattr(config, k):
                        raise ValueError(f"unknown config field {k}")
                    setattr(config, k, v)
                continue
            group = groups[group_name]
            for k, v in fields.items():
                if not hasattr(group, k):
                    raise ValueError(f"unknown config field {group_name}.{k}")
                setattr(group, k, v)
    llm = LLM(config=config)
    # chat template rides the handler when the checkpoint ships one
    llm._chat_template = None
    if model_path:
        try:
            from xllm_tpu.framework.chat_template import ChatTemplate

            llm._chat_template = ChatTemplate.from_model_path(model_path)
        except Exception:
            pass
    return llm


def _params(temperature, top_p, top_k, max_tokens, presence_penalty,
            frequency_penalty, repetition_penalty, seed, ignore_eos):
    from xllm_tpu.framework.sampling_params import SamplingParams

    return SamplingParams(
        temperature=temperature,
        top_p=top_p,
        top_k=top_k,
        max_tokens=max_tokens,
        presence_penalty=presence_penalty,
        frequency_penalty=frequency_penalty,
        repetition_penalty=repetition_penalty,
        seed=None if seed < 0 else int(seed),
        ignore_eos=bool(ignore_eos),
    )


def _run(llm, prompt, sp):
    out = llm.generate([prompt], sp)[0]
    seq = out.outputs[0]
    finish = seq.finish_reason or "stop"
    n_prompt = (out.usage or {}).get("prompt_tokens", 0)
    return (
        seq.text or "",
        str(finish),
        int(n_prompt),
        len(seq.token_ids),
    )


def complete(llm, prompt, temperature, top_p, top_k, max_tokens,
             presence_penalty, frequency_penalty, repetition_penalty, seed,
             ignore_eos):
    sp = _params(temperature, top_p, top_k, max_tokens, presence_penalty,
                 frequency_penalty, repetition_penalty, seed, ignore_eos)
    return _run(llm, prompt, sp)


def chat(llm, messages_json, temperature, top_p, top_k, max_tokens,
         presence_penalty, frequency_penalty, repetition_penalty, seed,
         ignore_eos):
    messages = json.loads(messages_json)
    tmpl = getattr(llm, "_chat_template", None)
    if tmpl is not None:
        prompt = tmpl.apply(messages, add_generation_prompt=True)
    else:
        # ChatML fallback, matching the HTTP server's behavior
        parts = [
            f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n"
            for m in messages
        ]
        prompt = "".join(parts) + "<|im_start|>assistant\n"
    sp = _params(temperature, top_p, top_k, max_tokens, presence_penalty,
                 frequency_penalty, repetition_penalty, seed, ignore_eos)
    return _run(llm, prompt, sp)

/* xllm_tpu C API — embed the TPU inference runtime in C/C++ hosts.
 *
 * Counterpart of the reference C API (reference xllm/c_api/llm.h:49-221:
 * xllm_llm_create/destroy/initialize, request-params defaults,
 * completions/chat_completions, free_response). TPU-native shape: the
 * runtime is the Python-hosted JAX engine, so this library embeds a
 * CPython interpreter behind a plain C ABI; one process hosts one
 * interpreter (create multiple handlers to serve multiple models in it).
 */
#ifndef XLLM_TPU_C_API_H
#define XLLM_TPU_C_API_H

#include <stdbool.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct XLLM_LLM_Handler XLLM_LLM_Handler;

typedef struct XLLM_InitOptions {
  /* HF-style model directory (config.json + safetensors). Empty -> random
   * weights sized by defaults (testing). */
  const char* model_path;
  int max_model_len;        /* 0 -> model max_position_embeddings */
  int max_seqs_per_batch;   /* engine concurrency cap */
  int block_size;           /* KV page tokens */
  int num_blocks;           /* 0 -> sized from free HBM */
  const char* quantization; /* "", "int8", "fp8" */
  /* JSON escape hatch merged over EngineConfig sub-configs (the config
   * system is typed dataclasses; any field is reachable here). */
  const char* extra_config_json;
} XLLM_InitOptions;

typedef struct XLLM_RequestParams {
  float temperature; /* 0 = greedy */
  float top_p;
  int top_k; /* -1 = disabled */
  int max_tokens;
  float presence_penalty;
  float frequency_penalty;
  float repetition_penalty;
  int64_t seed; /* -1 = none */
  bool ignore_eos;
} XLLM_RequestParams;

typedef struct XLLM_Response {
  /* generated text (chat: assistant message content) */
  char* text;
  char* finish_reason; /* "stop" | "length" | ... */
  int num_prompt_tokens;
  int num_completion_tokens;
  /* set on failure: text/finish_reason are NULL and this describes why */
  char* error;
} XLLM_Response;

/* Allocate a handler (no model loaded yet). NULL on OOM. */
XLLM_LLM_Handler* xllm_llm_create(void);

/* Destroy the handler and release the engine. NULL is a no-op. */
void xllm_llm_destroy(XLLM_LLM_Handler* handler);

/* Fill canonical defaults (reference xllm_llm_init_options_default). */
void xllm_llm_init_options_default(XLLM_InitOptions* init_options);
void xllm_llm_request_params_default(XLLM_RequestParams* params);

/* Load the model + compile the engine. false on failure (see stderr). */
bool xllm_llm_initialize(XLLM_LLM_Handler* handler,
                         const XLLM_InitOptions* init_options);

/* Plain-prompt completion. Caller frees with xllm_llm_free_response. */
XLLM_Response* xllm_llm_completions(XLLM_LLM_Handler* handler,
                                    const char* prompt,
                                    const XLLM_RequestParams* params);

/* Chat completion; messages_json = [{"role": "...", "content": "..."}, …]
 * rendered through the model's chat template. */
XLLM_Response* xllm_llm_chat_completions(XLLM_LLM_Handler* handler,
                                         const char* messages_json,
                                         const XLLM_RequestParams* params);

void xllm_llm_free_response(XLLM_Response* resp);

#ifdef __cplusplus
}
#endif

#endif /* XLLM_TPU_C_API_H */

/* C host driving the embedded xllm_tpu runtime through the C ABI
 * (tests/test_c_api.py compiles and runs this against libxllm_c.so). */
#include <stdio.h>
#include <string.h>

#include "xllm_c.h"

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s <model_dir> <extra_config_json>\n", argv[0]);
    return 2;
  }
  XLLM_LLM_Handler* h = xllm_llm_create();
  if (h == NULL) return 3;

  XLLM_InitOptions opts;
  xllm_llm_init_options_default(&opts);
  opts.model_path = argv[1];
  opts.block_size = 16;
  opts.num_blocks = 32;
  opts.max_seqs_per_batch = 4;
  opts.extra_config_json = argv[2];
  if (!xllm_llm_initialize(h, &opts)) {
    fprintf(stderr, "initialize failed\n");
    return 4;
  }

  XLLM_RequestParams params;
  xllm_llm_request_params_default(&params);
  params.temperature = 0.0f;
  params.max_tokens = 8;
  params.ignore_eos = true;

  XLLM_Response* r = xllm_llm_completions(h, "w1 w2 w3 w4 w5", &params);
  if (r == NULL || r->error != NULL) {
    fprintf(stderr, "completions error: %s\n", r ? r->error : "null");
    return 5;
  }
  if (r->text == NULL || r->num_completion_tokens != 8) {
    fprintf(stderr, "bad completion: tokens=%d\n", r->num_completion_tokens);
    return 6;
  }
  printf("completion: \"%s\" finish=%s prompt=%d gen=%d\n", r->text,
         r->finish_reason, r->num_prompt_tokens, r->num_completion_tokens);

  /* greedy determinism across calls through the C ABI */
  XLLM_Response* r2 = xllm_llm_completions(h, "w1 w2 w3 w4 w5", &params);
  if (r2 == NULL || r2->error != NULL || strcmp(r->text, r2->text) != 0) {
    fprintf(stderr, "nondeterministic greedy completion\n");
    return 7;
  }
  xllm_llm_free_response(r2);
  xllm_llm_free_response(r);

  XLLM_Response* c = xllm_llm_chat_completions(
      h, "[{\"role\": \"user\", \"content\": \"w7 w8\"}]", &params);
  if (c == NULL || c->error != NULL || c->num_completion_tokens != 8) {
    fprintf(stderr, "chat error: %s\n", c && c->error ? c->error : "bad");
    return 8;
  }
  printf("chat: \"%s\"\n", c->text);
  xllm_llm_free_response(c);

  xllm_llm_destroy(h);
  printf("C_API_OK\n");
  return 0;
}

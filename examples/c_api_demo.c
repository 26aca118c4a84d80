/* Embed the engine from C (see native/include/xllm_c.h).
 *
 *   python -c "from xllm_tpu.native import build_c_api; print(build_c_api())"
 *   gcc c_api_demo.c -I../xllm_tpu/native/include -o demo \
 *       ../xllm_tpu/native/build/libxllm_c.so \
 *       -Wl,-rpath,$PWD/../xllm_tpu/native/build
 *   XLLM_TPU_ROOT=.. ./demo /path/to/hf-model
 */
#include <stdio.h>

#include "xllm_c.h"

int main(int argc, char** argv) {
  XLLM_LLM_Handler* h = xllm_llm_create();
  XLLM_InitOptions opts;
  xllm_llm_init_options_default(&opts);
  opts.model_path = argc > 1 ? argv[1] : "";
  if (!xllm_llm_initialize(h, &opts)) return 1;

  XLLM_RequestParams params;
  xllm_llm_request_params_default(&params);
  params.max_tokens = 64;
  params.temperature = 0.0f;

  XLLM_Response* r =
      xllm_llm_completions(h, "Once upon a time", &params);
  if (r && r->error == NULL) printf("%s\n", r->text);
  xllm_llm_free_response(r);
  xllm_llm_destroy(h);
  return 0;
}

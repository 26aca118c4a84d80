/* C++ host driving the runtime through the header-only RAII wrapper
 * (reference cc_api/llm.h:32; tests/test_c_api.py compiles this with
 * g++ against libxllm_c.so). */
#include <cstdio>
#include <utility>

#include "xllm_cc.h"

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <model_dir> <extra_json>\n", argv[0]);
    return 2;
  }
  xllm::LLM llm;
  if (!llm.valid()) return 3;

  xllm::InitOptions opts;
  opts.model_path(argv[1])
      .block_size(16)
      .num_blocks(32)
      .max_seqs_per_batch(4)
      .extra_config_json(argv[2]);
  if (!llm.Initialize(opts)) {
    std::fprintf(stderr, "initialize failed\n");
    return 4;
  }

  xllm::RequestParams params;
  params.temperature = 0.0f;
  params.max_tokens = 8;
  params.ignore_eos = true;

  auto r = llm.Completions("w1 w2 w3 w4 w5", params);
  if (!r.ok() || r.num_completion_tokens != 8) {
    std::fprintf(stderr, "completions: %s (gen=%d)\n", r.error.c_str(),
                 r.num_completion_tokens);
    return 5;
  }
  std::printf("completion: \"%s\" finish=%s gen=%d\n", r.text.c_str(),
              r.finish_reason.c_str(), r.num_completion_tokens);

  auto r2 = llm.Completions("w1 w2 w3 w4 w5", params);
  if (!r2.ok() || r2.text != r.text) {
    std::fprintf(stderr, "nondeterministic greedy completion\n");
    return 6;
  }

  auto chat = llm.ChatCompletions(
      {{"system", "be brief"}, {"user", "w7 w8 \"quoted\"\n w9"}}, params);
  if (!chat.ok() || chat.num_completion_tokens != 8) {
    std::fprintf(stderr, "chat: %s\n", chat.error.c_str());
    return 7;
  }
  std::printf("chat: \"%s\"\n", chat.text.c_str());

  /* move semantics: the moved-from object must destruct harmlessly */
  xllm::LLM llm2 = std::move(llm);
  auto r3 = llm2.Completions("w2 w3", params);
  if (!r3.ok()) {
    std::fprintf(stderr, "moved handler: %s\n", r3.error.c_str());
    return 8;
  }
  std::printf("CC API OK\n");
  return 0;
}

/* xllm_tpu C++ API — in-process RAII wrapper over the C ABI.
 *
 * Counterpart of the reference in-process C++ `xllm::LLM` class
 * (reference xllm/cc_api/llm.h:32: Initialize / Completions /
 * ChatCompletions over an opaque LLMCore). Here the core is the C-ABI
 * handler (xllm_c.h), so this header is dependency-free and
 * header-only: link against libxllm_c.so and include this file.
 */
#ifndef XLLM_TPU_CC_API_H
#define XLLM_TPU_CC_API_H

#include <string>
#include <utility>
#include <vector>

#include "xllm_c.h"

namespace xllm {

/* Value-type response (the C struct's strings copied and freed). */
struct Response {
  std::string text;
  std::string finish_reason;
  int num_prompt_tokens = 0;
  int num_completion_tokens = 0;
  std::string error;  /* non-empty on failure */

  bool ok() const { return error.empty(); }
};

struct ChatMessage {
  std::string role;     /* "system" | "user" | "assistant" */
  std::string content;
};

/* Request parameters with the canonical defaults pre-filled. */
struct RequestParams : XLLM_RequestParams {
  RequestParams() { xllm_llm_request_params_default(this); }
};

/* Init options with defaults; keeps the strings it points at alive. */
class InitOptions {
 public:
  InitOptions() { xllm_llm_init_options_default(&raw_); }

  InitOptions& model_path(std::string v) {
    model_path_ = std::move(v);
    return *this;
  }
  InitOptions& max_model_len(int v) { raw_.max_model_len = v; return *this; }
  InitOptions& max_seqs_per_batch(int v) {
    raw_.max_seqs_per_batch = v;
    return *this;
  }
  InitOptions& block_size(int v) { raw_.block_size = v; return *this; }
  InitOptions& num_blocks(int v) { raw_.num_blocks = v; return *this; }
  InitOptions& quantization(std::string v) {
    quant_ = std::move(v);
    return *this;
  }
  /* JSON merged over the typed EngineConfig groups (see xllm_c.h). */
  InitOptions& extra_config_json(std::string v) {
    extra_ = std::move(v);
    return *this;
  }

  const XLLM_InitOptions* finalize() const {
    raw_.model_path = model_path_.c_str();
    raw_.quantization = quant_.c_str();
    raw_.extra_config_json = extra_.c_str();
    return &raw_;
  }

 private:
  mutable XLLM_InitOptions raw_{};
  std::string model_path_;
  std::string quant_;
  std::string extra_;
};

/* In-process LLM. Move-only RAII over the C handler (reference
 * cc_api/llm.h:32 deletes copy AND move; move support costs nothing
 * here). Thread-safety follows the C ABI: one request at a time per
 * handler. */
class LLM {
 public:
  LLM() : h_(xllm_llm_create()) {}
  ~LLM() { reset(); }

  LLM(const LLM&) = delete;
  LLM& operator=(const LLM&) = delete;
  LLM(LLM&& o) noexcept : h_(o.h_) { o.h_ = nullptr; }
  LLM& operator=(LLM&& o) noexcept {
    if (this != &o) {
      reset();
      h_ = o.h_;
      o.h_ = nullptr;
    }
    return *this;
  }

  bool valid() const { return h_ != nullptr; }

  /* Load the model + compile the engine. Call once. */
  bool Initialize(const InitOptions& options) {
    return h_ != nullptr && xllm_llm_initialize(h_, options.finalize());
  }
  bool Initialize(const std::string& model_path) {
    InitOptions o;
    o.model_path(model_path);
    return Initialize(o);
  }

  /* Plain-prompt completion (reference LLM::Completions). */
  Response Completions(const std::string& prompt,
                       const RequestParams& params = RequestParams()) {
    return wrap(xllm_llm_completions(h_, prompt.c_str(), &params));
  }

  /* Chat completion through the model's chat template (reference
   * LLM::ChatCompletions); messages render to the C ABI's JSON. */
  Response ChatCompletions(const std::vector<ChatMessage>& messages,
                           const RequestParams& params = RequestParams()) {
    std::string json = "[";
    for (size_t i = 0; i < messages.size(); ++i) {
      if (i) json += ",";
      json += "{\"role\":\"" + escape(messages[i].role) +
              "\",\"content\":\"" + escape(messages[i].content) + "\"}";
    }
    json += "]";
    return wrap(xllm_llm_chat_completions(h_, json.c_str(), &params));
  }

 private:
  void reset() {
    if (h_ != nullptr) {
      xllm_llm_destroy(h_);
      h_ = nullptr;
    }
  }

  static std::string escape(const std::string& s) {
    std::string out;
    out.reserve(s.size() + 8);
    for (char c : s) {
      switch (c) {
        case '"': out += "\\\""; break;
        case '\\': out += "\\\\"; break;
        case '\n': out += "\\n"; break;
        case '\r': out += "\\r"; break;
        case '\t': out += "\\t"; break;
        default:
          if (static_cast<unsigned char>(c) < 0x20) {
            char buf[8];
            std::snprintf(buf, sizeof(buf), "\\u%04x", c);
            out += buf;
          } else {
            out += c;
          }
      }
    }
    return out;
  }

  Response wrap(XLLM_Response* r) {
    Response out;
    if (r == nullptr) {
      out.error = "null response (handler not initialized?)";
      return out;
    }
    if (r->error != nullptr) {
      out.error = r->error;
    } else {
      if (r->text != nullptr) out.text = r->text;
      if (r->finish_reason != nullptr) out.finish_reason = r->finish_reason;
      out.num_prompt_tokens = r->num_prompt_tokens;
      out.num_completion_tokens = r->num_completion_tokens;
    }
    xllm_llm_free_response(r);
    return out;
  }

  XLLM_LLM_Handler* h_ = nullptr;
};

}  // namespace xllm

#endif /* XLLM_TPU_CC_API_H */

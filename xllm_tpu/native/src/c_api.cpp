// xllm_tpu C API implementation: a CPython-embedding shim over the
// Python-hosted JAX engine (reference xllm/c_api/llm.h — there the C API
// fronts the C++ runtime; here the runtime IS Python, so the shim owns an
// embedded interpreter and drives xllm_tpu.llm.LLM through it).
//
// Threading: every entry point takes the GIL (PyGILState_Ensure) AND a
// per-handler mutex. The GIL alone is not enough: the engine releases it
// during XLA dispatch, so two concurrent completions calls would
// interleave inside one scheduler. Interpreter bootstrap is guarded by
// std::call_once against a first-use race.

#include "../include/xllm_c.h"

#include <Python.h>

#include <cstdlib>
#include <cstring>
#include <mutex>
#include <string>

struct XLLM_LLM_Handler {
  PyObject* llm;  // xllm_tpu.llm.LLM instance (or nullptr)
  std::mutex mu;  // serializes engine-driving calls on this handler
};

// Acquire handler->mu without holding the GIL (a thread that enters with
// the GIL held — e.g. a Python-embedding host — must release it first,
// or it deadlocks against a call inside run_generate that is waiting to
// re-acquire the GIL). Restores the caller's GIL state on destruction
// AFTER releasing mu, keeping the lock order mu-then-GIL everywhere.
class EngineLock {
 public:
  explicit EngineLock(XLLM_LLM_Handler* h) : h_(h) {
    if (Py_IsInitialized() && PyGILState_Check()) {
      saved_ = PyEval_SaveThread();
    }
    h_->mu.lock();
  }
  ~EngineLock() {
    h_->mu.unlock();
    if (saved_ != nullptr) PyEval_RestoreThread(saved_);
  }
  EngineLock(const EngineLock&) = delete;
  EngineLock& operator=(const EngineLock&) = delete;

 private:
  XLLM_LLM_Handler* h_;
  PyThreadState* saved_ = nullptr;
};

static std::once_flag g_py_init_once;
static bool g_py_init_ok = false;

static void init_python_once() {
  if (Py_IsInitialized()) {  // host app already owns the interpreter
    g_py_init_ok = true;
    return;
  }
  Py_InitializeEx(0);
  if (!Py_IsInitialized()) return;
  // the embedded interpreter must see the package; honor PYTHONPATH and
  // add the package root two levels up from this shared object if set
  // via XLLM_TPU_ROOT
  const char* root = std::getenv("XLLM_TPU_ROOT");
  if (root != nullptr) {
    PyObject* sys_path = PySys_GetObject("path");  // borrowed
    PyObject* p = PyUnicode_FromString(root);
    if (sys_path && p) PyList_Insert(sys_path, 0, p);
    Py_XDECREF(p);
  }
  // release the GIL acquired by Py_Initialize so PyGILState_Ensure works
  // from arbitrary host threads
  PyEval_SaveThread();
  g_py_init_ok = true;
}

static bool ensure_python() {
  std::call_once(g_py_init_once, init_python_once);
  return g_py_init_ok;
}

static char* dup_cstr(const char* s) {
  if (s == nullptr) return nullptr;
  size_t n = std::strlen(s) + 1;
  char* out = static_cast<char*>(std::malloc(n));
  if (out != nullptr) std::memcpy(out, s, n);
  return out;
}

static XLLM_Response* error_response(const char* msg) {
  auto* r = static_cast<XLLM_Response*>(std::calloc(1, sizeof(XLLM_Response)));
  if (r != nullptr) r->error = dup_cstr(msg);
  return r;
}

// fetch+format the current python exception into an owned C string
static std::string py_error_string() {
  PyObject *type = nullptr, *value = nullptr, *trace = nullptr;
  PyErr_Fetch(&type, &value, &trace);
  PyErr_NormalizeException(&type, &value, &trace);
  std::string out = "python error";
  if (value != nullptr) {
    PyObject* s = PyObject_Str(value);
    if (s != nullptr) {
      const char* c = PyUnicode_AsUTF8(s);
      if (c != nullptr) out = c;
      Py_DECREF(s);
    }
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(trace);
  return out;
}

extern "C" {

XLLM_LLM_Handler* xllm_llm_create(void) {
  auto* h = new (std::nothrow) XLLM_LLM_Handler();
  if (h != nullptr) h->llm = nullptr;
  return h;
}

void xllm_llm_destroy(XLLM_LLM_Handler* handler) {
  if (handler == nullptr) return;
  {
    // wait for any in-flight call to finish before tearing down; the
    // caller must not race further calls against destroy (the handle is
    // invalid afterwards), but an already-running generate completes
    EngineLock lk(handler);
    if (handler->llm != nullptr && Py_IsInitialized()) {
      PyGILState_STATE g = PyGILState_Ensure();
      Py_DECREF(handler->llm);
      handler->llm = nullptr;
      PyGILState_Release(g);
    }
  }
  delete handler;
}

void xllm_llm_init_options_default(XLLM_InitOptions* o) {
  if (o == nullptr) return;
  o->model_path = "";
  o->max_model_len = 0;
  o->max_seqs_per_batch = 256;
  o->block_size = 64;
  o->num_blocks = 0;
  o->quantization = "";
  o->extra_config_json = "";
}

void xllm_llm_request_params_default(XLLM_RequestParams* p) {
  if (p == nullptr) return;
  p->temperature = 1.0f;
  p->top_p = 1.0f;
  p->top_k = -1;
  p->max_tokens = 16;
  p->presence_penalty = 0.0f;
  p->frequency_penalty = 0.0f;
  p->repetition_penalty = 1.0f;
  p->seed = -1;
  p->ignore_eos = false;
}

bool xllm_llm_initialize(XLLM_LLM_Handler* handler,
                         const XLLM_InitOptions* init_options) {
  if (handler == nullptr || init_options == nullptr) return false;
  if (!ensure_python()) return false;
  EngineLock lk(handler);
  PyGILState_STATE g = PyGILState_Ensure();
  bool ok = false;
  // one helper module call keeps all marshalling in python
  PyObject* mod = PyImport_ImportModule("xllm_tpu.c_api_impl");
  if (mod != nullptr) {
    PyObject* fn = PyObject_GetAttrString(mod, "create_llm");
    if (fn != nullptr) {
      PyObject* llm = PyObject_CallFunction(
          fn, "siiiiss", init_options->model_path ? init_options->model_path : "",
          init_options->max_model_len, init_options->max_seqs_per_batch,
          init_options->block_size, init_options->num_blocks,
          init_options->quantization ? init_options->quantization : "",
          init_options->extra_config_json ? init_options->extra_config_json
                                          : "");
      if (llm != nullptr) {
        Py_XDECREF(handler->llm);
        handler->llm = llm;  // owned
        ok = true;
      }
      Py_DECREF(fn);
    }
    Py_DECREF(mod);
  }
  if (!ok) {
    std::string err = py_error_string();
    std::fprintf(stderr, "xllm_llm_initialize: %s\n", err.c_str());
  }
  PyGILState_Release(g);
  return ok;
}

static XLLM_Response* run_generate(XLLM_LLM_Handler* handler,
                                   const char* payload, bool chat,
                                   const XLLM_RequestParams* params) {
  if (handler == nullptr || handler->llm == nullptr)
    return error_response("handler not initialized");
  if (payload == nullptr) return error_response("null input");
  XLLM_RequestParams def;
  if (params == nullptr) {
    xllm_llm_request_params_default(&def);
    params = &def;
  }
  EngineLock lk(handler);
  PyGILState_STATE g = PyGILState_Ensure();
  XLLM_Response* resp = nullptr;
  PyObject* mod = PyImport_ImportModule("xllm_tpu.c_api_impl");
  PyObject* fn =
      mod ? PyObject_GetAttrString(mod, chat ? "chat" : "complete") : nullptr;
  if (fn != nullptr) {
    PyObject* out = PyObject_CallFunction(
        fn, "OsffiifffLi", handler->llm, payload,
        static_cast<double>(params->temperature),
        static_cast<double>(params->top_p), params->top_k, params->max_tokens,
        static_cast<double>(params->presence_penalty),
        static_cast<double>(params->frequency_penalty),
        static_cast<double>(params->repetition_penalty),
        static_cast<long long>(params->seed),
        params->ignore_eos ? 1 : 0);
    if (out != nullptr) {
      // (text, finish_reason, num_prompt_tokens, num_completion_tokens)
      const char* text = nullptr;
      const char* finish = nullptr;
      int np = 0, nc = 0;
      if (PyArg_ParseTuple(out, "ssii", &text, &finish, &np, &nc)) {
        resp = static_cast<XLLM_Response*>(
            std::calloc(1, sizeof(XLLM_Response)));
        if (resp != nullptr) {
          resp->text = dup_cstr(text);
          resp->finish_reason = dup_cstr(finish);
          resp->num_prompt_tokens = np;
          resp->num_completion_tokens = nc;
        }
      }
      Py_DECREF(out);
    }
  }
  if (resp == nullptr) resp = error_response(py_error_string().c_str());
  Py_XDECREF(fn);
  Py_XDECREF(mod);
  PyGILState_Release(g);
  return resp;
}

XLLM_Response* xllm_llm_completions(XLLM_LLM_Handler* handler,
                                    const char* prompt,
                                    const XLLM_RequestParams* params) {
  return run_generate(handler, prompt, /*chat=*/false, params);
}

XLLM_Response* xllm_llm_chat_completions(XLLM_LLM_Handler* handler,
                                         const char* messages_json,
                                         const XLLM_RequestParams* params) {
  return run_generate(handler, messages_json, /*chat=*/true, params);
}

void xllm_llm_free_response(XLLM_Response* resp) {
  if (resp == nullptr) return;
  std::free(resp->text);
  std::free(resp->finish_reason);
  std::free(resp->error);
  std::free(resp);
}

}  // extern "C"

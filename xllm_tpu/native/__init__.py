"""Native (C++) runtime components: build + ctypes bindings.

The reference keeps its block manager, prefix cache, and suffix tree in
C++ (reference xllm/core/framework/block/, prefix_cache/, util/
suffix_tree.h); these are their TPU-framework twins. Built lazily with the
system compiler into a cached shared object (no pybind11 in the image —
plain C ABI + ctypes, SURVEY.md §7.4 native-parity note).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "src")
_BUILD = os.path.join(_DIR, "build")
_LIB_PATH = os.path.join(_BUILD, "libxllm_native.so")
_lib = None


def _build() -> str:
    os.makedirs(_BUILD, exist_ok=True)
    srcs = [
        os.path.join(_SRC, "block_cache.cpp"),
        os.path.join(_SRC, "suffix_index.cpp"),
    ]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if (
        os.path.exists(_LIB_PATH)
        and os.path.getmtime(_LIB_PATH) >= newest_src
    ):
        return _LIB_PATH
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        *srcs, "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def build_c_api() -> str:
    """Build the embeddable C API (include/xllm_c.h) -> libxllm_c.so.

    Links the CPython runtime: the C ABI fronts the Python-hosted engine
    (reference xllm/c_api/llm.h — see native/src/c_api.cpp)."""
    import sysconfig

    os.makedirs(_BUILD, exist_ok=True)
    src = os.path.join(_SRC, "c_api.cpp")
    hdr = os.path.join(os.path.dirname(_SRC), "include", "xllm_c.h")
    out = os.path.join(_BUILD, "libxllm_c.so")
    newest = max(
        os.path.getmtime(p) for p in (src, hdr) if os.path.exists(p)
    )
    if os.path.exists(out) and os.path.getmtime(out) >= newest:
        return out
    inc = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR") or ""
    ver = sysconfig.get_config_var("LDVERSION") or sysconfig.get_config_var(
        "VERSION"
    )
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        f"-I{inc}", src, "-o", out,
        f"-L{libdir}", f"-lpython{ver}",
        f"-Wl,-rpath,{libdir}",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build())
    c = ctypes
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")

    lib.bc_create.restype = c.c_void_p
    lib.bc_create.argtypes = [c.c_int, c.c_int, c.c_int]
    lib.bc_destroy.argtypes = [c.c_void_p]
    lib.bc_num_free.restype = c.c_int
    lib.bc_num_free.argtypes = [c.c_void_p]
    lib.bc_hash_chain.restype = c.c_uint64
    lib.bc_hash_chain.argtypes = [c.c_uint64, i32p, c.c_int]
    lib.bc_allocate.restype = c.c_int
    lib.bc_allocate.argtypes = [c.c_void_p, c.c_int, i32p]
    lib.bc_free_blocks.argtypes = [c.c_void_p, i32p, c.c_int]
    lib.bc_match_prefix.restype = c.c_int
    lib.bc_match_prefix.argtypes = [c.c_void_p, i32p, c.c_int, i32p, c.c_int]
    lib.bc_insert.restype = c.c_uint64
    lib.bc_insert.argtypes = [c.c_void_p, c.c_uint64, i32p, i32p, c.c_int]
    lib.bc_block_hash.restype = c.c_uint64
    lib.bc_block_hash.argtypes = [c.c_void_p, c.c_int]
    lib.bc_register_cached.argtypes = [c.c_void_p, c.c_int, c.c_uint64]
    lib.bc_lookup_hash.restype = c.c_int
    lib.bc_lookup_hash.argtypes = [c.c_void_p, c.c_uint64]
    lib.bc_ref_block.argtypes = [c.c_void_p, c.c_int]
    lib.bc_drain_evictions.restype = c.c_int
    lib.bc_drain_evictions.argtypes = [c.c_void_p, i32p, u64p, c.c_int]

    lib.si_create.restype = c.c_void_p
    lib.si_create.argtypes = [c.c_int, c.c_int]
    lib.si_destroy.argtypes = [c.c_void_p]
    lib.si_extend.argtypes = [c.c_void_p, i32p, c.c_int]
    lib.si_propose.restype = c.c_int
    lib.si_propose.argtypes = [c.c_void_p, i32p, c.c_int, c.c_int, i32p]
    lib.si_propose_from.restype = c.c_int
    lib.si_propose_from.argtypes = [
        c.c_void_p, i32p, c.c_int, i32p, c.c_int, c.c_int, i32p,
    ]

    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


class NativeSuffixIndex:
    """Drop-in for framework.suffix_cache.SuffixProposer, C++ backed."""

    def __init__(self, min_match: int = 2, max_match: int = 4):
        self._lib = load()
        self._h = self._lib.si_create(min_match, max_match)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.si_destroy(self._h)
            self._h = None

    def extend(self, token_ids: list[int], upto: int) -> None:
        arr = np.asarray(token_ids, np.int32)
        self._lib.si_extend(self._h, arr, int(upto))

    def propose(self, token_ids: list[int], k: int) -> list[int]:
        arr = np.asarray(token_ids, np.int32)
        out = np.zeros(k, np.int32)
        n = self._lib.si_propose(self._h, arr, len(arr), k, out)
        return [int(x) for x in out[:n]]

    def propose_from(
        self, stream: "np.ndarray", query: list[int], k: int
    ) -> list[int]:
        """Global-cache lookup: match ``query``'s tail ngram, draft from
        the indexed ``stream`` (reference suffix_tree.h:129 global tree)."""
        q = np.asarray(query, np.int32)
        out = np.zeros(k, np.int32)
        n = self._lib.si_propose_from(
            self._h, stream, len(stream), q, len(q), k, out
        )
        return [int(x) for x in out[:n]]

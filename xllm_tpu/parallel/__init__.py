from xllm_tpu.parallel.mesh import build_mesh, make_named_shardings, replicated

__all__ = ["build_mesh", "make_named_shardings", "replicated"]

from xllm_tpu.processors.image import ImageProcessor, smart_resize

__all__ = ["ImageProcessor", "smart_resize"]

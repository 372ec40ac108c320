from internvideo_tpu.serve.engine import Request, ServingEngine

__all__ = ["Request", "ServingEngine"]

from internvideo_tpu.utils.metrics import MetricLogger, SmoothedValue

"""InternVideo-TPU: a TPU-native video foundation model framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
OpenGVLab/InternVideo (reference at /root/reference): the InternVideo2
encoder family, UMT-style masked pretraining, VideoCLIP multimodal
training/retrieval, MLLM (vision tower -> projector -> LLM) inference with
latent attention and token compression, and the xtuner-class distributed
training machinery — all expressed over `jax.sharding.Mesh` + pjit/shard_map
with Pallas kernels on the hot paths.

Layering (bottom-up):
  core/      mesh & sharding, typed config, PRNG, checkpointing
  ops/       Pallas kernels + pure-XLA fallbacks
  nn/        flax.linen building blocks (attention, blocks, norms, rope, ...)
  models/    composed model families (encoders, VideoCLIP, MLLM, ...)
  parallel/  sequence context, packing, Ulysses SP helpers
  data/      host-side video pipeline, masking, augmentation
  train/     trainer + engines (pretrain/finetune/clip/sft) + optimizers
  eval/      retrieval, classification, MC-QA evaluation
  utils/     metrics, logging, prober
"""

__version__ = "0.1.0"

"""Ablation profiling of the masked pretrain forward (B=8, 20% visible).

Monkeypatches pieces of the block to identity and measures the full-model
delta — the only reliable way to attribute sub-ms/layer costs through the
noisy tunnel. Run:
  PYTHONPATH=/root/repo:/root/.axon_site python -u tools_r3/masked_ablate.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(jnp.sum(leaf.reshape(-1)[:1]))


def timeit(f, *args, n=12):
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    _sync(f(*args))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0 - base) / (n - 1) * 1e3


def build(batch=8):
    from internvideo_tpu.models.internvideo2 import make_config
    from internvideo_tpu.models.pretrain import (
        PretrainConfig,
        PretrainInternVideo2,
    )

    cfg = make_config(
        "1B", num_frames=16, img_size=224, num_classes=0,
        dtype="bfloat16", param_dtype="bfloat16", attn_impl="pallas",
        mlp_act="gelu_tanh",
    )
    pcfg = PretrainConfig(
        encoder=cfg, clip_output_dim=3200, clip_final_output_dim=768,
        clip_return_layers=6, mae_output_dim=1408, mae_return_layers=1,
    )
    pmodel = PretrainInternVideo2(pcfg)
    n = cfg.num_patches
    n_vis = max(int(round(n * 0.2)), 1)
    video = jnp.zeros((batch, 16, 224, 224, 3), jnp.bfloat16)
    keep = jnp.broadcast_to(
        jnp.asarray(np.sort(
            np.random.default_rng(0).choice(n, n_vis, replace=False)
        ), jnp.int32)[None],
        (batch, n_vis),
    )
    params = jax.jit(pmodel.init)(jax.random.key(0), video, keep)
    fwd = jax.jit(lambda p, v, k: pmodel.apply(p, v, k).clip_middle)
    return fwd, params, video, keep


def measure(tag, batch=8):
    fwd, params, video, keep = build(batch)
    t = timeit(fwd, params, video, keep)
    cps = batch / (t / 1e3)
    print(f"{tag:34s} {t:8.2f} ms/batch  {cps:6.1f} clips/s", flush=True)
    return t


def main():
    import internvideo_tpu.nn.norms as norms
    import internvideo_tpu.nn.transformer as tfm

    base = measure("baseline")

    # no norms at all (norm1/norm2/qk-norm -> scaled passthrough)
    orig_rms_call = norms.RMSNorm.__call__

    def rms_identity(self, x, *, weight_only=False):
        if weight_only:  # fused attn path consumes the raw weight
            return orig_rms_call(self, x, weight_only=True)
        return x

    norms.RMSNorm.__call__ = rms_identity
    no_norm = measure("no RMSNorm anywhere")
    norms.RMSNorm.__call__ = orig_rms_call

    # no LayerScale
    orig_ls = tfm.LayerScale.__call__

    def ls_identity(self, x):
        return x

    tfm.LayerScale.__call__ = ls_identity
    no_ls = measure("no LayerScale")
    tfm.LayerScale.__call__ = orig_ls

    # no attention kernel (out = v): measures kernel+softmax, keeps layout
    import internvideo_tpu.ops as ops
    import internvideo_tpu.nn.transformer as t2
    orig_dpa = t2.dot_product_attention

    def fake_attn(q, k, v, **kw):
        return v[:, : q.shape[1]]

    t2.dot_product_attention = fake_attn
    no_attn = measure("attention kernel -> passthrough")
    t2.dot_product_attention = orig_dpa

    # no gelu
    from flax import linen as fnn
    orig_gelu = fnn.gelu
    import internvideo_tpu.nn.transformer as t3
    t3.nn.gelu = lambda x, approximate=True: x
    no_gelu = measure("gelu -> identity")
    t3.nn.gelu = orig_gelu

    # neither norms nor LS
    norms.RMSNorm.__call__ = rms_identity
    tfm.LayerScale.__call__ = ls_identity
    no_both = measure("no norms + no LS")
    norms.RMSNorm.__call__ = orig_rms_call
    tfm.LayerScale.__call__ = orig_ls

    print("\nattribution (ms/batch over 40 layers):", flush=True)
    print(f"  norms total:      {base - no_norm:7.2f}")
    print(f"  layerscale:       {base - no_ls:7.2f}")
    print(f"  attn kernel:      {base - no_attn:7.2f}")
    print(f"  gelu:             {base - no_gelu:7.2f}")
    print(f"  norms+ls:         {base - no_both:7.2f}")

    # batch scaling of the baseline
    measure("baseline B=16", batch=16)


if __name__ == "__main__":
    main()

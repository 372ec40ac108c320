"""Ring vs Ulysses: the decision record PERF.md owes (VERDICT r4 item 5).

Two measurements:

1. --chip (run on the TPU): the inner-attention cost gap. Ring's inner is
   the compiled blockwise online-softmax scan (parallel/ring.py, with
   dead-block skipping); Ulysses runs the Pallas flash kernel on the full
   sequence. Measured fwd and fwd+bwd at per-rank long-context shapes
   (packed causal, the longctx-bench workload class).

2. --mesh (CPU, 8 virtual devices): comms accounting from the lowered
   SPMD programs at sp=4 — count and total bytes of all-to-all
   (Ulysses) vs collective-permute (ring) ops in the compiled HLO.

Analytic model (per rank, bf16, S_local = S/sp tokens, H heads, D dim):
  Ulysses: 4 all-to-alls (q,k,v in + out back), each moving
           S_local*H*D*2 bytes * (sp-1)/sp  ->  ~8*S_local*H*D*(sp-1)/sp B
  Ring:    (sp-1) ppermute steps of K and V (+segment ids), each
           S_local*Hkv*D*2 bytes          ->  ~4*S_local*Hkv*D*(sp-1) B
  => ring moves ~sp/2x MORE bytes for MHA (Hkv=H) but strictly less
     memory (never holds full-sequence KV); GQA thins ring's travel by
     H/Hkv while Ulysses still swaps full q.
"""

import argparse
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def _sync(x):
    float(jax.device_get(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32))))


def timeit(fn, *args, n=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    _sync(fn(*args))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0 - base) / (n - 1) * 1e3


def chip():
    """Inner-attention cost: blockwise-XLA (ring inner) vs Pallas flash."""
    from internvideo_tpu.ops.flash_attention import flash_attention
    from internvideo_tpu.parallel.ring import _blockwise_attention_lse

    for s, n_seg in ((16_384, 8), (32_768, 8)):
        b, h, d = 1, 20, 128
        key = jax.random.key(0)
        q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
        seg = np.repeat(np.arange(n_seg), s // n_seg)[None]
        seg = jnp.asarray(np.broadcast_to(seg, (b, s)), jnp.int32)
        scale = d ** -0.5

        @jax.jit
        def pallas_fwd(q, seg):
            return flash_attention(
                q, q, q, causal=True, q_segment_ids=seg,
                kv_segment_ids=seg, softmax_scale=scale,
            )

        @jax.jit
        def block_fwd(q, seg):
            return _blockwise_attention_lse(
                q, q, q, causal=True, scale=scale, q_seg=seg, kv_seg=seg,
            )[0]

        @jax.jit
        def pallas_bwd(q, seg):
            return jax.grad(
                lambda q: jnp.sum(pallas_fwd(q, seg).astype(jnp.float32))
            )(q)

        @jax.jit
        def block_bwd(q, seg):
            return jax.grad(
                lambda q: jnp.sum(block_fwd(q, seg).astype(jnp.float32))
            )(q)

        pf = timeit(pallas_fwd, q, seg)
        bf = timeit(block_fwd, q, seg)
        pb = timeit(pallas_bwd, q, seg, n=5)
        bb = timeit(block_bwd, q, seg, n=5)
        print(f"S={s} packed x{n_seg} causal (B={b} H={h} d={d}):")
        print(f"  fwd      pallas {pf:7.2f} ms   blockwise {bf:7.2f} ms "
              f"({bf / pf:.2f}x)")
        print(f"  fwd+bwd  pallas {pb:7.2f} ms   blockwise {bb:7.2f} ms "
              f"({bb / pb:.2f}x)")


def chip_ring_pallas():
    """Per-rank compute at sp=4 with the PROMOTED pallas ring inner
    (flash_attention_with_lse + lse merges), vs the Ulysses per-rank
    program (full-S pallas on H/sp heads). Causal, packed x8. Ring's
    wall-clock is its WORST rank (ranks advance in ppermute lockstep):
    rank 3 runs 1 diagonal + 3 dense chunks; Ulysses ranks are uniform."""
    from internvideo_tpu.ops.flash_attention import (
        flash_attention, flash_attention_with_lse,
    )

    sp = 4
    for s, n_seg in ((32_768, 8),):
        b, h, d = 1, 20, 128
        s_loc = s // sp
        key = jax.random.key(0)
        q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
        seg = np.repeat(np.arange(n_seg), s // n_seg)[None]
        seg = jnp.asarray(np.broadcast_to(seg, (b, s)), jnp.int32)
        scale = d ** -0.5

        # Ulysses per-rank: full S, h/sp heads
        qu = q[:, :, : h // sp]

        @jax.jit
        def ulysses_rank(qu, seg):
            return flash_attention(
                qu, qu, qu, causal=True, q_segment_ids=seg,
                kv_segment_ids=seg, softmax_scale=scale)

        # Ring worst rank: q shard = last S/sp rows, 1 diag + sp-1 dense
        q_loc = q[:, -s_loc:]
        qseg_loc = seg[:, -s_loc:]

        @jax.jit
        def ring_rank(q_loc, q_full, qseg_loc, seg):
            out = None
            m = l = None
            for step in range(sp):
                kc = q_full[:, step * s_loc:(step + 1) * s_loc]
                sc = seg[:, step * s_loc:(step + 1) * s_loc]
                diag = step == sp - 1
                o_i, lse_i = flash_attention_with_lse(
                    q_loc, kc, kc, causal=diag, softmax_scale=scale,
                    q_segment_ids=qseg_loc, kv_segment_ids=sc)
                if out is None:
                    out, m, l = o_i.astype(jnp.float32), lse_i, \
                        jnp.ones_like(lse_i)
                    continue
                m_new = jnp.maximum(m, lse_i)
                m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
                w_old = jnp.where(jnp.isfinite(m), jnp.exp(m - m_safe), 0.0)
                w_cur = jnp.where(
                    jnp.isfinite(lse_i), jnp.exp(lse_i - m_safe), 0.0)
                bc = lambda w: jnp.transpose(w, (0, 2, 1))[..., None]
                out = out * bc(w_old) + o_i.astype(jnp.float32) * bc(w_cur)
                l = l * w_old + w_cur
                m = m_new
            return (out / jnp.maximum(
                jnp.transpose(l, (0, 2, 1))[..., None], 1e-30)
            ).astype(q_loc.dtype)

        uf = timeit(ulysses_rank, qu, seg)
        rf = timeit(ring_rank, q_loc, q, qseg_loc, seg)

        @jax.jit
        def ulysses_bwd(qu, seg):
            return jax.grad(lambda x: jnp.sum(
                ulysses_rank_inner(x, seg).astype(jnp.float32)))(qu)

        def ulysses_rank_inner(qu, seg):
            return flash_attention(
                qu, qu, qu, causal=True, q_segment_ids=seg,
                kv_segment_ids=seg, softmax_scale=scale)

        @jax.jit
        def ring_bwd(q_loc, q_full, qseg_loc, seg):
            gq, gf = jax.grad(lambda x, y: jnp.sum(
                ring_rank_inner(x, y, qseg_loc, seg).astype(jnp.float32)),
                argnums=(0, 1))(q_loc, q_full)
            return gq + gf[:, -gq.shape[1]:]  # one array for the timer sync

        ring_rank_inner = ring_rank.__wrapped__

        ub = timeit(ulysses_bwd, qu, seg, n=5)
        rb = timeit(ring_bwd, q_loc, q, qseg_loc, seg, n=5)
        print(f"S={s} sp={sp} packed x{n_seg} causal (H={h} d={d}), "
              f"per-rank wall-clock:")
        print(f"  fwd      ulysses {uf:7.2f} ms   ring(pallas worst-rank) "
              f"{rf:7.2f} ms ({rf / uf:.2f}x)")
        print(f"  fwd+bwd  ulysses {ub:7.2f} ms   ring(pallas worst-rank) "
              f"{rb:7.2f} ms ({rb / ub:.2f}x)")


def mesh():
    """Comms accounting on the 8-dev CPU mesh at sp=4."""
    import re

    from internvideo_tpu.core.mesh import MeshConfig, create_mesh
    from internvideo_tpu.parallel.ring import ring_attention
    from internvideo_tpu.parallel.ulysses import ulysses_attention
    from jax.sharding import NamedSharding, PartitionSpec as P

    m = create_mesh(MeshConfig(replica=2, fsdp=1, seq=4, tensor=1))
    b, s, h, d = 2, 8192, 8, 64
    q = jnp.zeros((b, s, h, d), jnp.float32)
    seg = jnp.zeros((b, s), jnp.int32)
    sh = NamedSharding(m, P(("replica", "fsdp"), "seq", None, None))
    sh_seg = NamedSharding(m, P(("replica", "fsdp"), "seq"))
    qs = jax.device_put(q, sh)
    segs = jax.device_put(seg, sh_seg)

    def comm_lines(fn):
        hlo = jax.jit(fn).lower(qs, qs, qs, segs).compile().as_text()
        out = {}
        for kind in ("all-to-all", "collective-permute", "all-gather"):
            tot = 0
            n = 0
            for line in hlo.splitlines():
                stripped = line.strip()
                # An op APPLICATION is "<result> = <type> <opname>(...)";
                # operand mentions are "%name" (no following paren), so
                # " {kind}(" with a leading space only hits applications.
                if f" {kind}(" not in stripped or " = " not in stripped:
                    continue
                if "get-tuple-element" in stripped:
                    continue
                # Result type may be a bare array `f32[...]` or a tuple
                # `(f32[...], f32[...], ...)` — sum every element.
                lhs = stripped.split(f" {kind}(")[0]
                op_bytes = 0
                for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", lhs):
                    bytes_per = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4,
                                 "f8e4m3fn": 1}.get(dt, 4)
                    numel = 1
                    for x in dims.split(","):
                        if x:
                            numel *= int(x)
                    op_bytes += numel * bytes_per
                if op_bytes:
                    tot += op_bytes
                    n += 1
            out[kind] = (n, tot)
        return out

    def ul(q, k, v, seg):
        return ulysses_attention(
            q, k, v, mesh=m, axis="seq", causal=True,
            q_segment_ids=seg, kv_segment_ids=seg, impl="xla_blockwise",
        )

    def ring(q, k, v, seg):
        return ring_attention(
            q, k, v, mesh=m, axis="seq", causal=True, q_segment_ids=seg,
        )

    for name, fn in (("ulysses", ul), ("ring", ring)):
        stats = comm_lines(fn)
        print(f"{name}: " + "  ".join(
            f"{k}: n={v[0]} bytes={v[1]:,}" for k, v in stats.items()
            if v[0]
        ))
        if name == "ring" and stats["collective-permute"][0]:
            # ring's permutes sit in the lax.scan body: static count is one
            # step's worth, executed (sp-1) times per forward.
            n, b = stats["collective-permute"]
            print(f"  (scan body: executed sp-1=3x -> {3 * b:,} bytes/fwd)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--chip", action="store_true")
    ap.add_argument("--chip-ring-pallas", action="store_true")
    ap.add_argument("--mesh", action="store_true")
    args = ap.parse_args()
    if args.mesh:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
        mesh()
    if args.chip:
        chip()
    if args.chip_ring_pallas:
        chip_ring_pallas()

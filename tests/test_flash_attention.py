"""Flash-attention kernel parity vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from internvideo_tpu.ops.attention_xla import xla_attention
from internvideo_tpu.ops.flash_attention import flash_attention


def _rand_qkv(key, b, sq, sk, h, d, hkv=None):
    hkv = hkv or h
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, sk, hkv, d), jnp.float32)
    v = jax.random.normal(kv, (b, sk, hkv, d), jnp.float32)
    return q, k, v


def _flash(*args, **kw):
    return flash_attention(*args, interpret=True, block_q=128, block_k=128, **kw)


@pytest.mark.parametrize("causal", [False, True])
def test_forward_matches_xla(causal):
    q, k, v = _rand_qkv(jax.random.key(0), 2, 256, 256, 2, 64)
    ref = xla_attention(q, k, v, causal=causal)
    out = _flash(q, k, v, causal=causal)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_forward_unaligned_lengths():
    # 200 is not a multiple of the 128 block — exercises padding path.
    q, k, v = _rand_qkv(jax.random.key(1), 1, 200, 200, 2, 64)
    ref = xla_attention(q, k, v)
    out = _flash(q, k, v)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_forward_segment_ids():
    b, s, h, d = 2, 256, 2, 64
    q, k, v = _rand_qkv(jax.random.key(2), b, s, s, h, d)
    # two packed segments + padding tail
    seg = jnp.concatenate([
        jnp.zeros((b, 100), jnp.int32),
        jnp.ones((b, 120), jnp.int32),
        jnp.full((b, 36), -1, jnp.int32),
    ], axis=1)
    ref = xla_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg)
    out = _flash(q, k, v, q_segment_ids=seg, kv_segment_ids=seg)
    # padding rows are ill-defined in the reference (uniform attention);
    # compare only real tokens
    np.testing.assert_allclose(out[:, :220], ref[:, :220], atol=2e-5, rtol=2e-5)


def test_gqa():
    q, k, v = _rand_qkv(jax.random.key(3), 1, 128, 128, 8, 64, hkv=2)
    ref = xla_attention(q, k, v)
    out = _flash(q, k, v)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_grads_match_xla(causal):
    q, k, v = _rand_qkv(jax.random.key(4), 1, 256, 256, 2, 64)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(xla_attention(q, k, v, causal=causal)))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(_flash(q, k, v, causal=causal)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_out, g_ref, "qkv"):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-4, err_msg=f"d{name}")


def test_grads_segment_ids():
    b, s, h, d = 1, 256, 2, 64
    q, k, v = _rand_qkv(jax.random.key(5), b, s, s, h, d)
    seg = jnp.concatenate([
        jnp.zeros((b, 128), jnp.int32), jnp.ones((b, 128), jnp.int32)
    ], axis=1)

    def loss_ref(q, k, v):
        o = xla_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg)
        return jnp.sum(jnp.square(o))

    def loss_flash(q, k, v):
        o = _flash(q, k, v, q_segment_ids=seg, kv_segment_ids=seg)
        return jnp.sum(jnp.square(o))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_out, g_ref, "qkv"):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-4, err_msg=f"d{name}")


@pytest.mark.parametrize("causal", [False, True])
def test_sliding_window(causal):
    """Windowed attention matches an explicitly-masked XLA reference."""
    b, s, h, d = 1, 256, 2, 64
    q, k, v = _rand_qkv(jax.random.key(7), b, s, s, h, d)
    window = 50
    out = _flash(q, k, v, causal=causal, window=window)

    # reference: mask outside the window by hand
    qi = np.arange(s)[:, None]
    ki = np.arange(s)[None, :]
    allowed = (qi - ki < window) if causal else (np.abs(qi - ki) < window)
    if causal:
        allowed &= qi >= ki
    seg_q = jnp.zeros((b, s), jnp.int32)
    ref_logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d ** -0.5)
    ref_logits = jnp.where(allowed[None, None], ref_logits, -1e30)
    probs = jax.nn.softmax(ref_logits, axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sliding_window_unaligned_grads():
    """Window + padding path (falls back to segment ids) with gradients."""
    b, s, h, d = 1, 200, 2, 64
    q, k, v = _rand_qkv(jax.random.key(8), b, s, s, h, d)
    window = 64

    qi = np.arange(s)[:, None]
    ki = np.arange(s)[None, :]
    allowed = np.abs(qi - ki) < window

    def ref_fn(q, k, v):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d ** -0.5)
        logits = jnp.where(allowed[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    out = _flash(q, k, v, window=window)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_fn(q, k, v)), atol=2e-5, rtol=2e-5
    )
    g_ref = jax.grad(lambda q: jnp.sum(jnp.square(ref_fn(q, k, v))))(q)
    g_out = jax.grad(
        lambda q: jnp.sum(jnp.square(_flash(q, k, v, window=window)))
    )(q)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               atol=5e-4, rtol=5e-4)


def test_causal_q_position_offset():
    """Chunked-prefill style: query block sits offset tokens into the keys."""
    b, h, d = 1, 2, 64
    sk, sq, off = 200, 72, 128  # off+sq == sk, and 200 pads to 256
    key = jax.random.key(9)
    q, k, v = _rand_qkv(key, b, sq, sk, h, d)
    ref = xla_attention(q, k, v, causal=True, q_position_offset=off)
    out = _flash(q, k, v, causal=True, q_position_offset=off)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    # gradients through the offset path
    g_ref = jax.grad(lambda q: jnp.sum(jnp.square(
        xla_attention(q, k, v, causal=True, q_position_offset=off))))(q)
    g_out = jax.grad(lambda q: jnp.sum(jnp.square(
        _flash(q, k, v, causal=True, q_position_offset=off))))(q)
    np.testing.assert_allclose(g_out, g_ref, atol=5e-4, rtol=5e-4)


def test_causal_cross_length_padding():
    """Causal with sq != sk and tail padding: the analytic kv_pad correction
    would over-subtract (causal already hides some pads) — must route through
    segment ids. Regression for ADVICE r1 finding #1."""
    b, h, d = 1, 2, 64
    sq, sk = 100, 200  # both unaligned to the 128 block
    q, k, v = _rand_qkv(jax.random.key(10), b, sq, sk, h, d)
    ref = xla_attention(q, k, v, causal=True)
    out = _flash(q, k, v, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_window_fully_masked_rows_zero():
    """Non-causal cross-attention where some query rows have NO in-window
    key: those rows must output zeros, not an average of V. Regression for
    ADVICE r1 finding #3 (guard only ran with segment ids)."""
    b, h, d = 1, 2, 64
    sq, sk, window = 256, 64, 50
    q, k, v = _rand_qkv(jax.random.key(11), b, sq, sk, h, d)
    out = _flash(q, k, v, window=window)
    # rows with qi - ki >= window for every ki in [0, 64): qi >= 113
    np.testing.assert_allclose(np.asarray(out[:, 120:]), 0.0, atol=1e-6)
    # a visible row still matches the explicit-mask reference
    qi = np.arange(sq)[:, None]
    ki = np.arange(sk)[None, :]
    allowed = np.abs(qi - ki) < window
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d ** -0.5)
    logits = jnp.where(allowed[None, None], logits, -1e30)
    ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, -1), v)
    np.testing.assert_allclose(
        np.asarray(out[:, :100]), np.asarray(ref[:, :100]),
        atol=2e-5, rtol=2e-5,
    )


# ---------------------------------------------------------------------------
# Ragged-tail decomposition (CLS shapes like 4097 = 4096 + 1)
# ---------------------------------------------------------------------------


def _assert_ragged_taken(monkeypatch, taken=True):
    """Wrap the ragged entry point with a call counter.

    Also disables the small-S zero-copy route (which would otherwise
    swallow every sub-1024 shape) so these tests keep exercising the
    ragged decomposition used above _SMALL_S_MAX."""
    import internvideo_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "_SMALL_S_MAX", 0)
    calls = []
    orig = fa._flash_attention_ragged

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(fa, "_flash_attention_ragged", spy)
    return calls


def test_ragged_forward_matches_xla(monkeypatch):
    # 257 = 2*128 + 1: block-aligned main + 1-row/1-key tails
    calls = _assert_ragged_taken(monkeypatch)
    q, k, v = _rand_qkv(jax.random.key(12), 2, 257, 257, 2, 64)
    ref = xla_attention(q, k, v)
    out = _flash(q, k, v)
    assert calls, "ragged decomposition was not taken for 257 @ 128-blocks"
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_ragged_grads_match_xla(monkeypatch):
    calls = _assert_ragged_taken(monkeypatch)
    q, k, v = _rand_qkv(jax.random.key(13), 1, 257, 257, 2, 32)

    def loss(f):
        return lambda q, k, v: jnp.sum(jnp.square(f(q, k, v)))

    g_ref = jax.grad(loss(xla_attention), argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss(_flash), argnums=(0, 1, 2))(q, k, v)
    assert calls
    for a, b, name in zip(g_out, g_ref, "qkv"):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-4, err_msg=name)


def test_ragged_one_sided_tails(monkeypatch):
    calls = _assert_ragged_taken(monkeypatch)
    # k-tail only (cross-attention flavored): sq aligned, sk ragged
    q, k, v = _rand_qkv(jax.random.key(14), 1, 256, 263, 2, 64)
    np.testing.assert_allclose(
        _flash(q, k, v), xla_attention(q, k, v), atol=2e-5, rtol=2e-5
    )
    # q-tail only
    q, k, v = _rand_qkv(jax.random.key(15), 1, 263, 256, 2, 64)
    np.testing.assert_allclose(
        _flash(q, k, v), xla_attention(q, k, v), atol=2e-5, rtol=2e-5
    )
    assert len(calls) >= 2


def test_ragged_tail_at_threshold(monkeypatch):
    # tail == _RAGGED_TAIL_MAX stays on the ragged path; one over falls back
    import internvideo_tpu.ops.flash_attention as fa

    calls = _assert_ragged_taken(monkeypatch)
    s_at = 128 + fa._RAGGED_TAIL_MAX
    q, k, v = _rand_qkv(jax.random.key(16), 1, s_at, s_at, 2, 64)
    np.testing.assert_allclose(
        _flash(q, k, v), xla_attention(q, k, v), atol=2e-5, rtol=2e-5
    )
    assert len(calls) == 1
    s_over = s_at + 1
    q, k, v = _rand_qkv(jax.random.key(17), 1, s_over, s_over, 2, 64)
    np.testing.assert_allclose(
        _flash(q, k, v), xla_attention(q, k, v), atol=2e-5, rtol=2e-5
    )
    assert len(calls) == 1, "over-threshold tail must use the padded path"


def test_fuzz_random_configs_vs_xla():
    """Seeded sweep across the kernel's config space: shapes (aligned,
    ragged-eligible, padded), causal, segments, GQA, windows — every
    combination must match the XLA reference for outputs AND gradients.
    Guards the interaction surface of block padding x ragged decomposition
    x sub-block unroll x masking."""
    rng = np.random.default_rng(0)
    cases = []
    for trial in range(14):
        sq = int(rng.choice([64, 127, 128, 200, 256, 257, 384]))
        mode = rng.choice(["plain", "causal", "segs", "gqa", "qpos"])
        h = 4
        hkv = h
        kw = {}
        if mode == "causal":
            kw["causal"] = True
            sk = sq
        elif mode == "gqa":
            hkv = 2
            sk = sq
        elif mode == "qpos":
            # chunked-prefill causal: queries sit offset tokens into K
            kw["causal"] = True
            sk = sq + int(rng.integers(1, 64))
            kw["q_position_offset"] = sk - sq
        else:
            sk = int(rng.choice([sq, 192, 256]))
        cases.append((trial, sq, sk, h, hkv, mode, kw))

    for trial, sq, sk, h, hkv, mode, kw in cases:
        q, k, v = _rand_qkv(jax.random.key(100 + trial), 1, sq, sk, h, 32,
                            hkv=hkv)
        segs = {}
        if mode == "segs":
            cut = sq // 2
            seg = jnp.concatenate([
                jnp.zeros((1, cut), jnp.int32),
                jnp.ones((1, sq - cut), jnp.int32),
            ], axis=1)
            kseg = jnp.concatenate([
                jnp.zeros((1, min(cut, sk)), jnp.int32),
                jnp.ones((1, max(sk - cut, 0)), jnp.int32),
            ], axis=1)
            segs = {"q_segment_ids": seg, "kv_segment_ids": kseg}
        ref = xla_attention(q, k, v, **kw, **segs)
        out = _flash(q, k, v, **kw, **segs)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-5, rtol=5e-5,
            err_msg=f"fwd trial={trial} {mode} sq={sq} sk={sk}",
        )
        if trial % 3 == 0:  # grads on a subset (interpret mode is slow)
            g_ref = jax.grad(lambda q: jnp.sum(jnp.square(
                xla_attention(q, k, v, **kw, **segs))))(q)
            g_out = jax.grad(lambda q: jnp.sum(jnp.square(
                _flash(q, k, v, **kw, **segs))))(q)
            np.testing.assert_allclose(
                np.asarray(g_out), np.asarray(g_ref), atol=1e-3, rtol=1e-3,
                err_msg=f"grad trial={trial} {mode} sq={sq} sk={sk}",
            )


def _assert_small_s_taken(monkeypatch):
    import internvideo_tpu.ops.flash_attention as fa

    calls = []
    orig = fa._small_s_attention

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(fa, "_small_s_attention", spy)
    return calls


def test_small_s_route_and_parity(monkeypatch):
    """Eligible short shapes take the zero-copy small-S path; causal /
    segmented / GQA / over-threshold shapes do not."""
    import internvideo_tpu.ops.flash_attention as fa

    calls = _assert_small_s_taken(monkeypatch)
    # the masked-pretrain shape family (scaled down): fwd + grads
    q, k, v = _rand_qkv(jax.random.key(40), 2, 205, 205, 4, 24)
    g = jax.random.normal(jax.random.key(41), q.shape, q.dtype)

    def loss(f):
        return lambda q, k, v: jnp.sum(f(q, k, v) * g)

    np.testing.assert_allclose(
        _flash(q, k, v), xla_attention(q, k, v), atol=2e-5, rtol=2e-5
    )
    g_out = jax.grad(loss(_flash), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(xla_attention), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_out, g_ref, "qkv"):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-4, err_msg=name)
    assert calls, "small-S path not taken for an eligible shape"

    # ineligible flavors fall through to the general kernel
    n0 = len(calls)
    _flash(q, k, v, causal=True)
    seg = jnp.zeros((2, 205), jnp.int32)
    _flash(q, k, v, q_segment_ids=seg, kv_segment_ids=seg)
    qg, kg_, vg = _rand_qkv(jax.random.key(42), 1, 64, 64, 4, 16, hkv=2)
    _flash(qg, kg_, vg)
    big = fa._SMALL_S_MAX + 1
    qb, kb, vb = _rand_qkv(jax.random.key(43), 1, big, big, 1, 16)
    _flash(qb, kb, vb)
    assert len(calls) == n0, "ineligible shape routed to small-S path"


def test_fused_qkv_rmsnorm_attention_parity():
    """Fused qkv-slice + whole-dim QK-RMSNorm + attention matches the
    unfused composition (slice -> rms_norm -> attention) in fwd and grads,
    and the module-level dispatcher falls back correctly."""
    from internvideo_tpu.ops import flash_attention as fa
    from internvideo_tpu.ops.rmsnorm import rms_norm

    rng = np.random.default_rng(7)
    for (b, s, h, d) in [(2, 197, 4, 32), (1, 413, 8, 24)]:
        w = h * d
        qkv = jnp.asarray(rng.standard_normal((b, s, 3 * w)), jnp.float32)
        qw = jnp.asarray(rng.standard_normal(w) * 0.1 + 1.0, jnp.float32)
        kw = jnp.asarray(rng.standard_normal(w) * 0.1 + 1.0, jnp.float32)

        def fused(qkv, qw, kw):
            return fa._fused_qkv_small_s(
                qkv, qw, kw, h, d, d ** -0.5, 1e-6, True)

        def ref(qkv, qw, kw):
            q = rms_norm(qkv[..., :w], qw)
            k = rms_norm(qkv[..., w:2 * w], kw)
            return fa._small_s_attention(
                q, k, qkv[..., 2 * w:], h, d, d ** -0.5, True)

        np.testing.assert_allclose(
            np.asarray(fused(qkv, qw, kw)), np.asarray(ref(qkv, qw, kw)),
            atol=2e-5, rtol=2e-5,
        )
        g = jnp.asarray(rng.standard_normal((b, s, w)), jnp.float32)

        def loss(f):
            return lambda *a: jnp.sum(f(*a) * g)

        g1 = jax.grad(loss(fused), argnums=(0, 1, 2))(qkv, qw, kw)
        g2 = jax.grad(loss(ref), argnums=(0, 1, 2))(qkv, qw, kw)
        for a, e, name in zip(g1, g2, ("qkv", "qw", "kw")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(e), atol=5e-4, rtol=5e-4,
                err_msg=f"{name} s={s}",
            )

    # dispatcher: on CPU (impl resolves to xla) it must decline
    from internvideo_tpu.ops.attention import fused_qkv_attention_or_none

    assert fused_qkv_attention_or_none(
        qkv, qw, kw, num_heads=8) is None
    # forced pallas with an over-threshold S must also decline
    big = jnp.zeros((1, fa._SMALL_S_MAX + 1, 3 * 64), jnp.float32)
    assert fused_qkv_attention_or_none(
        big, jnp.ones(64), jnp.ones(64), num_heads=4, impl="pallas") is None


def test_fused_qkv_large_matches_unfused():
    """Blocked-K fused qkv path (1024 < S <= 8192): in-kernel masked
    raggedness + online softmax + in-kernel whole-dim RMSNorms match the
    unfused slice->rms_norm->attention composition; gradients flow through
    the unfused-composition VJP."""
    import numpy as np

    from internvideo_tpu.ops.attention_xla import xla_attention
    from internvideo_tpu.ops.flash_attention import (
        fused_qkv_large_eligible,
        fused_qkv_rmsnorm_attention,
    )
    from internvideo_tpu.ops.rmsnorm import rms_norm

    b, h, d = 1, 2, 64
    w = h * d
    for s in (1100, 1040):  # non-divisible and near-divisible block tails
        assert fused_qkv_large_eligible(s, h, d, 4)
        key = jax.random.key(s)
        qkv = jax.random.normal(key, (b, s, 3 * w), jnp.float32)
        qw = 1.0 + 0.1 * jax.random.normal(jax.random.key(1), (w,))
        kw = 1.0 - 0.1 * jax.random.normal(jax.random.key(2), (w,))

        out = fused_qkv_rmsnorm_attention(
            qkv, qw, kw, num_heads=h, interpret=True
        )
        q = rms_norm(qkv[..., :w], qw).reshape(b, s, h, d)
        k = rms_norm(qkv[..., w:2 * w], kw).reshape(b, s, h, d)
        v = qkv[..., 2 * w:].reshape(b, s, h, d)
        ref = xla_attention(q, k, v).reshape(b, s, w)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5,
            err_msg=f"s={s}",
        )

    # gradients: the custom VJP re-runs the unfused composition
    s = 1100
    qkv = jax.random.normal(jax.random.key(3), (b, s, 3 * w), jnp.float32)
    qw = jnp.ones((w,))
    kw = jnp.ones((w,))

    def loss_fused(qkv, qw, kw):
        return jnp.sum(jnp.square(fused_qkv_rmsnorm_attention(
            qkv, qw, kw, num_heads=h, interpret=True
        )))

    def loss_ref(qkv, qw, kw):
        q = rms_norm(qkv[..., :w], qw).reshape(b, s, h, d)
        k = rms_norm(qkv[..., w:2 * w], kw).reshape(b, s, h, d)
        v = qkv[..., 2 * w:].reshape(b, s, h, d)
        return jnp.sum(jnp.square(xla_attention(q, k, v)))

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(qkv, qw, kw)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(qkv, qw, kw)
    for a, bb, name in zip(g_f, g_r, ("qkv", "qw", "kw")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=5e-4, rtol=5e-4,
            err_msg=name,
        )


def test_packed_segment_block_skipping_parity():
    """Segment-aware block skipping: packed segments spanning many blocks
    (block 64/128 at S=512) make whole (q-block, k-block) pairs dead —
    they must be SKIPPED (zero contribution), not just masked. Parity of
    fwd and grads vs the XLA reference, causal and dense, incl. unrolled
    (dividing) and non-dividing block counts."""
    import numpy as np

    from internvideo_tpu.ops.attention_xla import xla_attention
    from internvideo_tpu.ops.flash_attention import flash_attention

    b, s, h, d = 2, 512, 2, 32
    key = jax.random.key(0)
    q = jax.random.normal(key, (b, s, h, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (b, s, h, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (b, s, h, d), jnp.float32)
    # four segments of irregular lengths — many fully-dead block pairs at
    # block 64, partially-dead at 128
    lens = [130, 100, 200, 82]
    seg = jnp.asarray(np.repeat(np.arange(4), lens)[None].repeat(b, 0)
                      .astype(np.int32))

    for causal in (False, True):
        ref = xla_attention(q, k, v, causal=causal, q_segment_ids=seg,
                            kv_segment_ids=seg)
        for bq, bk in ((64, 64), (128, 128), (128, 64)):
            out = flash_attention(
                q, k, v, causal=causal, q_segment_ids=seg,
                kv_segment_ids=seg, block_q=bq, block_k=bk,
                interpret=True,
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5,
                err_msg=f"causal={causal} blocks={bq}x{bk}",
            )

    # gradients through the skip predicates
    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(flash_attention(
            q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg,
            block_q=64, block_k=64, interpret=True,
        )))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(xla_attention(
            q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg,
        )))

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(g_f, g_r, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=5e-4, rtol=5e-4,
            err_msg=name,
        )


@pytest.mark.parametrize("causal", [False, True])
def test_narrow_v_head_dim(causal):
    """d_v < d_qk (the MLA layout: q/k at 192, v/o at 128): the kernels
    carry separate q/k and v/o lane widths so MLA skips the v pad the
    reference's CUDA flash-attn forces. fwd + grads vs XLA, GQA + padded
    S included."""
    b, sq, h, d, dv = 2, 200, 4, 64, 32
    kq, kk, kv = jax.random.split(jax.random.key(7), 3)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, sq, 2, d), jnp.float32)  # GQA group=2
    v = jax.random.normal(kv, (b, sq, 2, dv), jnp.float32)

    ref = xla_attention(q, k, v, causal=causal)
    out = _flash(q, k, v, causal=causal)
    assert out.shape == (b, sq, h, dv)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(_flash(q, k, v, causal=causal)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(xla_attention(q, k, v, causal=causal)))

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(g_f, g_r, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=5e-4, rtol=5e-4,
            err_msg=name,
        )


def test_segment_remap_dma_elision_parity():
    """The packed-segment live-block remap (scalar-prefetch index maps;
    dead blocks repeat their predecessor's index so their DMAs are elided)
    must be numerically invisible. Exercises the cases the remap tables
    can get wrong: GQA groups (shared-KV index maps compose with the
    remap), q pad rows (-1) vs kv pad rows (-2), a q block with ZERO live
    k blocks (n_live == 0 -> no compute, zero output), S not a block
    multiple (dispatch adds its own pads), and cross-length sq != sk."""
    b, s, hq, hkv, d, dv = 2, 640, 4, 2, 64, 32
    kq, kk, kv = jax.random.split(jax.random.key(11), 3)
    q = jax.random.normal(kq, (b, s, hq, d), jnp.float32)
    k = jax.random.normal(kk, (b, s, hkv, d), jnp.float32)
    v = jax.random.normal(kv, (b, s, hkv, dv), jnp.float32)
    # segments 0/1/2 + a 150-row q pad tail on row 1: at block 128 the
    # pad-tail q blocks see no live k block at all (ids -1 vs {0,1,2,-2})
    seg = np.zeros((b, s), np.int32)
    seg[:, 200:] = 1
    seg[:, 460:] = 2
    seg[1, -150:] = -1
    qseg = jnp.asarray(seg)
    kvseg = jnp.where(qseg < 0, -2, qseg)

    # pad q rows are compared only for the kernel's exact-zero convention
    # (the XLA reference leaves fully-masked rows at an arbitrary softmax)
    real = jnp.asarray((seg >= 0)[:, :, None, None].astype(np.float32))

    for causal in (False, True):
        ref = xla_attention(q, k, v, causal=causal, q_segment_ids=qseg,
                            kv_segment_ids=kvseg)
        out = _flash(q, k, v, causal=causal, q_segment_ids=qseg,
                     kv_segment_ids=kvseg)
        np.testing.assert_allclose(
            np.asarray(out * real), np.asarray(ref * real),
            atol=2e-5, rtol=2e-5, err_msg=f"causal={causal}",
        )
        # the all-dead q pad rows must be exactly zero
        np.testing.assert_array_equal(np.asarray(out[1, -150:]), 0.0)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(real * _flash(
            q, k, v, causal=True, q_segment_ids=qseg, kv_segment_ids=kvseg,
        )))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(real * xla_attention(
            q, k, v, causal=True, q_segment_ids=qseg, kv_segment_ids=kvseg,
        )))

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(g_f, g_r, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=5e-4, rtol=5e-4,
            err_msg=name,
        )


def test_with_lse_forward_matches_blockwise():
    """flash_attention_with_lse (out, NATURAL lse) parity vs the blockwise
    online-softmax reference (parallel/ring.py), incl. GQA, packing,
    unaligned lengths, and empty-visibility q rows (lse == -inf, out == 0)
    — the contract ring attention's partial merge depends on."""
    from internvideo_tpu.ops.flash_attention import flash_attention_with_lse
    from internvideo_tpu.parallel.ring import _blockwise_attention_lse

    b, sq, sk, h, hkv, d = 2, 200, 264, 4, 2, 32
    q, k, v = _rand_qkv(jax.random.key(3), b, sq, sk, h, d, hkv=hkv)
    rng = np.random.default_rng(0)
    # segment 7 appears in q only -> those q rows see no keys at all
    qseg = np.sort(rng.integers(0, 3, (b, sq))).astype(np.int32)
    qseg[:, -9:] = 7
    kvseg = np.sort(rng.integers(0, 3, (b, sk))).astype(np.int32)
    qseg, kvseg = jnp.asarray(qseg), jnp.asarray(kvseg)

    for causal in (False, True):
        out, lse = flash_attention_with_lse(
            q, k, v, causal=causal, q_segment_ids=qseg,
            kv_segment_ids=kvseg, interpret=True,
            block_q=128, block_k=128,
        )
        ref_out, ref_lse = _blockwise_attention_lse(
            q, k, v, causal=causal, scale=d ** -0.5,
            q_seg=qseg, kv_seg=kvseg, block_q=64, block_k=64,
        )
        live = np.isfinite(np.asarray(ref_lse))
        # empty rows: both impls agree they are empty; out rows zero
        np.testing.assert_array_equal(np.isfinite(np.asarray(lse)), live)
        np.testing.assert_array_equal(
            np.asarray(out)[~live.transpose(0, 2, 1).any(-1)], 0.0
        )
        np.testing.assert_allclose(
            np.asarray(lse)[live], np.asarray(ref_lse)[live],
            atol=2e-5, rtol=2e-5, err_msg=f"lse causal={causal}",
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_out),
            atol=2e-5, rtol=2e-5, err_msg=f"out causal={causal}",
        )


def test_with_lse_grads_flow_through_both_outputs():
    """The LSE cotangent folds into the backward kernels' delta term
    (delta' = delta - g_lse): gradients of a loss that reads BOTH outputs
    match autodiff through the blockwise reference."""
    from internvideo_tpu.ops.flash_attention import flash_attention_with_lse
    from internvideo_tpu.parallel.ring import _blockwise_attention_lse

    b, s, h, d = 1, 192, 2, 16
    q, k, v = _rand_qkv(jax.random.key(5), b, s, s, h, d)
    qseg = jnp.asarray(
        np.repeat(np.arange(3), s // 3)[None].repeat(b, 0), jnp.int32)
    w = jax.random.normal(jax.random.key(6), (b, h, s))

    def loss(fn):
        def f(q, k, v):
            out, lse = fn(q, k, v)
            safe = jnp.where(jnp.isfinite(lse), lse, 0.0)
            return jnp.sum(jnp.square(out)) + jnp.sum(w * safe)
        return f

    flash = loss(lambda q, k, v: flash_attention_with_lse(
        q, k, v, causal=True, q_segment_ids=qseg, kv_segment_ids=qseg,
        interpret=True, block_q=64, block_k=64,
    ))
    ref = loss(lambda q, k, v: _blockwise_attention_lse(
        q, k, v, causal=True, scale=d ** -0.5, q_seg=qseg, kv_seg=qseg,
        block_q=64, block_k=64,
    ))
    g_f = jax.grad(flash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(g_f, g_r, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=5e-4, rtol=5e-4,
            err_msg=name,
        )

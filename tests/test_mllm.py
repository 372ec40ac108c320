"""Video MLLM: vision tower, placeholder scatter, deepstack, generation."""

import jax
import jax.numpy as jnp
import numpy as np

from internvideo_tpu.models.generation import generate
from internvideo_tpu.models.llm import LLMConfig
from internvideo_tpu.models.mllm import (
    MLLMConfig,
    VideoMLLM,
    hico_compress,
    scatter_visual,
)
from internvideo_tpu.models.vision_tower import VisionTower, VisionTowerConfig
from internvideo_tpu.nn.mla import MLAConfig

VIS_TINY = VisionTowerConfig(
    hidden_size=32, num_layers=3, num_heads=2, intermediate_size=64,
    patch_size=8, temporal_patch_size=2, spatial_merge_size=2,
    pos_embed_grid=6, deepstack_indexes=(1, 2), text_hidden_size=48,
    attn_impl="xla",
)
LLM_TINY = LLMConfig(
    vocab_size=260, hidden_size=48, num_layers=3, intermediate_size=96,
    mrope_section=(2, 1, 1),
    mla=MLAConfig(
        hidden_size=48, num_heads=2, kv_lora_rank=24, qk_rope_head_dim=8,
        qk_nope_head_dim=8, v_head_dim=8,
    ),
    attn_impl="xla",
)
CFG = MLLMConfig(
    vision=VIS_TINY, text=LLM_TINY,
    image_token_id=250, video_token_id=251,
)


def test_vision_tower_shapes():
    tower = VisionTower(VIS_TINY)
    video = jax.random.normal(jax.random.key(0), (2, 2, 32, 32, 3))
    params = tower.init(jax.random.key(1), video)
    tokens, taps = tower.apply(params, video)
    # grid: t=1, 4x4 spatial → 16 tokens
    assert tokens.shape == (2, 16, 32)
    assert len(taps) == 2 and taps[0].shape == (2, 16, 32)


def test_scatter_visual():
    text = jnp.zeros((1, 6, 4))
    vis = jnp.arange(8, dtype=jnp.float32).reshape(1, 2, 4)
    mask = jnp.array([[False, True, False, True, False, False]])
    out = scatter_visual(text, vis, mask)
    np.testing.assert_array_equal(out[0, 1], vis[0, 0])
    np.testing.assert_array_equal(out[0, 3], vis[0, 1])
    np.testing.assert_array_equal(out[0, 0], np.zeros(4))


def test_mllm_forward_and_generate():
    model = VideoMLLM(CFG)
    video = jax.random.normal(jax.random.key(0), (1, 2, 32, 32, 3))
    # visual tokens after 2x2 merge: 16/4 = 4
    n_vis = 4
    ids = jnp.array([[5, 251, 251, 251, 251, 7, 9]])
    params = model.init(jax.random.key(1), ids, video)
    out = model.apply(params, ids, video)
    assert out.logits.shape == (1, 7, 260)

    # visual embeds actually influence the logits
    video2 = video + 1.0
    out2 = model.apply(params, ids, video2)
    assert not np.allclose(out.logits, out2.logits, atol=1e-5)

    # cached generation greedy path matches incremental full-forward greedy
    gen = generate(
        model, params, ids, video=video, max_new_tokens=3, temperature=0.0
    )
    assert gen.shape == (1, 3)
    # manual greedy with full forwards
    cur = ids
    expected = []
    for _ in range(3):
        o = model.apply(params, cur, video)
        nxt = jnp.argmax(o.logits[:, -1].astype(jnp.float32), axis=-1)
        expected.append(int(nxt[0]))
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
    assert [int(x) for x in gen[0]] == expected


def test_hico_compress_quality():
    """Compression-quality validation: on clustered token sets, HiCo-merged
    tokens must (a) represent every cluster (low reconstruction error vs the
    true centroids), and (b) preserve cross-clip similarity ranking far
    better than random token subsets, with quality degrading gracefully as
    the budget shrinks."""
    rng = np.random.RandomState(0)
    d, n, k_true = 16, 64, 8
    centers = rng.randn(k_true, d) * 3

    def make_clip(jitter):
        toks = centers[rng.randint(0, k_true, n)] + rng.randn(n, d) * jitter
        return toks.astype(np.float32)

    def recon_err(budget):
        clip = make_clip(0.1)[None, None]  # (1,1,N,D)
        comp = np.asarray(hico_compress(jnp.asarray(clip), budget))[0, 0]
        # every true center should have a nearby compressed token
        dists = np.linalg.norm(
            centers[:, None] - comp[None, :], axis=-1
        ).min(axis=1)
        return float(dists.mean())

    e16, e4 = recon_err(16), recon_err(4)
    assert e16 < 1.5, e16  # 16 tokens cover 8 clusters well
    assert e4 >= e16 * 0.8  # fewer tokens -> no better coverage

    # similarity-ranking preservation: mean-pooled compressed tokens rank
    # clip pairs like full tokens do
    clips = [make_clip(0.2) for _ in range(8)]
    full = np.stack([c.mean(0) for c in clips])
    full /= np.linalg.norm(full, axis=-1, keepdims=True)
    sim_full = full @ full.T

    comp_toks = np.asarray(
        hico_compress(jnp.asarray(np.stack(clips)[:, None]), 8)
    )[:, 0]  # (8, K, D)
    # mass-weighted pooling: each compressed token weighted by how many
    # original tokens it represents (cluster frequencies survive)
    comp = np.zeros((8, d))
    for ci, (toks, cc) in enumerate(zip(clips, comp_toks)):
        assign = np.argmin(
            np.linalg.norm(toks[:, None] - cc[None], axis=-1), axis=1
        )
        w = np.bincount(assign, minlength=cc.shape[0]).astype(np.float64)
        comp[ci] = (cc * w[:, None]).sum(0) / w.sum()
    comp /= np.linalg.norm(comp, axis=-1, keepdims=True)
    sim_comp = comp @ comp.T

    rnd = np.stack([c[rng.choice(n, 2, replace=False)].mean(0) for c in clips])
    rnd /= np.linalg.norm(rnd, axis=-1, keepdims=True)
    sim_rnd = rnd @ rnd.T

    iu = np.triu_indices(8, 1)
    corr_comp = np.corrcoef(sim_full[iu], sim_comp[iu])[0, 1]
    corr_rnd = np.corrcoef(sim_full[iu], sim_rnd[iu])[0, 1]
    assert corr_comp > 0.95, corr_comp
    assert corr_comp > corr_rnd, (corr_comp, corr_rnd)


def test_hico_compress():
    toks = jax.random.normal(jax.random.key(0), (2, 4, 64, 16))
    out = hico_compress(toks, 16)
    assert out.shape == (2, 4, 16, 16)
    # compressing identical tokens returns (approximately) that token
    same = jnp.ones((1, 1, 64, 16))
    out = hico_compress(same, 8)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-4)


def test_mllm_paged_generate_matches_dense():
    """Video MLLM serving: paged generate (pools + paged decode) produces
    token-identical output to the dense-cache generate, including the
    deepstack prompt residuals."""
    model = VideoMLLM(CFG)
    video = jax.random.normal(jax.random.key(2), (1, 2, 32, 32, 3))
    ids = jnp.array([[5, 251, 251, 251, 251, 7, 9]])
    params = model.init(jax.random.key(3), ids, video)
    dense = generate(model, params, ids, video=video, max_new_tokens=5)
    paged = generate(
        model, params, ids, video=video, max_new_tokens=5,
        paged=True, page_size=4, decode_impl="xla",
    )
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(paged))
    paged_k = generate(
        model, params, ids, video=video, max_new_tokens=5,
        paged=True, page_size=4, decode_impl="pallas", interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(paged_k))


def test_mllm_hico_video_path():
    """InternVideo2.5 recipe: HiCo compresses merged tokens per frame
    before the LLM; placeholder count = frames x R; deepstack disabled."""
    import dataclasses

    cfg = dataclasses.replace(CFG, hico_tokens_per_frame=2)
    model = VideoMLLM(cfg)
    video = jax.random.normal(jax.random.key(4), (1, 2, 32, 32, 3))
    # 1 temporal frame x R=2 tokens -> 2 placeholders
    ids = jnp.array([[5, 251, 251, 7, 9]])
    params = model.init(jax.random.key(5), ids, video)
    out = model.apply(params, ids, video)
    assert out.logits.shape == (1, 5, 260)
    assert np.isfinite(np.asarray(out.logits)).all()
    # video still influences logits through the compressed tokens
    out2 = model.apply(params, ids, video + 1.0)
    assert not np.allclose(out.logits, out2.logits, atol=1e-5)
    # generation works on the compressed path too
    gen = generate(model, params, ids, video=video, max_new_tokens=3)
    assert np.asarray(gen).shape == (1, 3)


def test_generate_with_mrope_positions_matches_full_forward():
    """generate(position_ids=3-D grid) must prefill AND decode with the
    mrope grid (decode continues at max+1) — matching teacher-forced full
    forwards that use the same explicit positions."""
    model = VideoMLLM(CFG)
    video = jax.random.normal(jax.random.key(2), (1, 2, 32, 32, 3))
    ids = jnp.array([[5, 251, 251, 251, 251, 7, 9]])
    params = model.init(jax.random.key(3), ids, video)

    # token 0 is text at position 0; the 4-token vision run gets grid
    # coords offset by 1; the trailing 2 text tokens advance together
    vis = np.array([[0, 0, 0, 0], [0, 0, 1, 1], [0, 1, 0, 1]])
    base = (vis + 1).max() + 1
    text = np.broadcast_to(base + np.arange(2), (3, 2))
    pos = np.concatenate(
        [np.zeros((3, 1), np.int64), vis + 1, text], axis=1
    )  # (3, 7)
    pos3 = jnp.asarray(pos[:, None, :])  # (3, 1, L)

    gen = generate(
        model, params, ids, video=video, position_ids=pos3,
        max_new_tokens=3, temperature=0.0,
    )

    cur, cur_pos = ids, pos3
    expected = []
    for _ in range(3):
        o = model.apply(params, cur, video, position_ids=cur_pos)
        nxt = jnp.argmax(o.logits[:, -1].astype(jnp.float32), axis=-1)
        expected.append(int(nxt[0]))
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
        nxt_pos = jnp.full((3, 1, 1), int(cur_pos.max()) + 1, cur_pos.dtype)
        cur_pos = jnp.concatenate([cur_pos, nxt_pos], axis=2)
    assert [int(x) for x in gen[0]] == expected

    # and the default (no position_ids) path is unchanged
    gen_def = generate(model, params, ids, video=video, max_new_tokens=2)
    assert gen_def.shape == (1, 2)

"""Checkpoint conversion CLI: stage-2 fixture -> flat npz -> nested params."""

import contextlib
import io

import jax
import numpy as np

from stage2_synth import make_stage2_state_dict

from internvideo_tpu.tools.convert_cli import load_flat_params, main


def test_convert_cli_stage2_roundtrip(tmp_path):
    depth, clip_k, text_layers = 2, 2, 2
    sd = make_stage2_state_dict(
        np.random.default_rng(0),
        d=32, depth=depth, patch=8, img=16, frames=2,
        clip_k=clip_k, clip_out=20, clip_fin=16,
        td=32, tl=text_layers, ti=64, fusion_layer=1, vocab=50, embed=16,
    )
    src = tmp_path / "stage2.npz"
    np.savez(src, **sd)
    dst = tmp_path / "out" / "stage2_flax.npz"

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([
            "--kind", "internvideo2_stage2",
            "--src", str(src), "--dst", str(dst),
            "--depth", str(depth),
            "--clip-return-layers", str(clip_k),
            "--text-layers", str(text_layers),
        ])
    assert rc == 0 and "tensors" in buf.getvalue()

    from internvideo_tpu.models.convert import convert_internvideo2_stage2

    direct = convert_internvideo2_stage2(
        sd, depth=depth, clip_return_layers=clip_k, text_layers=text_layers,
    )
    loaded = load_flat_params(str(dst))
    flat_d = jax.tree_util.tree_leaves_with_path(direct)
    flat_l = jax.tree_util.tree_leaves_with_path(loaded)
    assert len(flat_d) == len(flat_l)
    for (pd, vd), (pl, vl) in zip(sorted(flat_d, key=lambda x: str(x[0])),
                                  sorted(flat_l, key=lambda x: str(x[0]))):
        assert str(pd) == str(pl)
        np.testing.assert_array_equal(np.asarray(vd), np.asarray(vl))

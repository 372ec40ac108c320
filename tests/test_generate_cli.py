"""Generate CLI: preset build, checkpoint load, token-id generation."""

import json
import subprocess
import sys


def test_generate_cli_random_init(tmp_path):
    # add a tiny preset on the fly is not possible via CLI; use the
    # checkpoint-free random-init path on the smallest real preset? Too
    # big for CI — instead drive main() in-process with a tiny preset
    # injected into models.presets.
    import dataclasses

    import internvideo_tpu.models.presets as presets
    from internvideo_tpu.models.llm import LLMConfig
    from internvideo_tpu.nn.mla import MLAConfig

    def _tiny_llm(**overrides):
        cfg = LLMConfig(
            vocab_size=64, hidden_size=32, num_layers=2,
            intermediate_size=64, mrope_section=None,
            mla=MLAConfig(
                hidden_size=32, num_heads=2, kv_lora_rank=16,
                qk_rope_head_dim=8, qk_nope_head_dim=8, v_head_dim=8,
            ),
            attn_impl="xla",
        )
        return dataclasses.replace(cfg, **overrides)

    presets.tiny_test_llm = _tiny_llm
    from internvideo_tpu.cli.generate import main

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([
            "--preset", "tiny_test_llm", "--ids", "1,2,3",
            "--max-new-tokens", "4",
        ])
    assert rc == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert len(out["tokens"]) == 4
    assert all(0 <= t < 64 for t in out["tokens"])

    # checkpoint path: export params in HF layout, reload through the CLI
    import jax
    import jax.numpy as jnp

    from internvideo_tpu.core.checkpoint import write_safetensors
    from internvideo_tpu.models.convert import export_mla_llm_hf
    from internvideo_tpu.models.llm import MLATransformer

    cfg = _tiny_llm()
    model = MLATransformer(cfg)
    params = model.init(jax.random.key(0), jnp.ones((1, 3), jnp.int32))
    sd = export_mla_llm_hf(params, cfg)
    ckpt = tmp_path / "tiny.safetensors"
    write_safetensors(str(ckpt), sd)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([
            "--preset", "tiny_test_llm", "--checkpoint", str(ckpt),
            "--ids", "1,2,3", "--max-new-tokens", "4", "--paged",
            "--page-size", "4",
        ])
    assert rc == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert len(out["tokens"]) == 4

"""Test bootstrap: run everything on a virtual 8-device CPU mesh.

This is the TPU analogue of the reference's MultiProcessTestCase harness
(InternVideo3_sft/xtuner/_testing/testcase.py:15) — multi-"chip" logic is
exercised on one host via XLA's host-platform device splitting.

NOTE: this image's sitecustomize force-registers the `axon` TPU-tunnel
backend and sets jax_platforms="axon,cpu" at interpreter start, so the env
var alone is not enough — we override the config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_timeout" not in flags:
    # The virtual devices time-share the host's cores, so collective
    # participants can arrive far apart at the biggest shapes. This flag
    # raises the collectives-queue timeout. It does NOT raise the
    # in-process rendezvous terminate timeout (hard 40s in this jaxlib,
    # rendezvous.cc — the xla_cpu_collective_call_*_seconds knobs are not
    # plumbed); big tests must instead keep total compute between two
    # collectives under that budget — see
    # test_long_context.py::test_sft_262k_sp4_executed's sizing note.
    flags += " --xla_cpu_collective_timeout_seconds=3600"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

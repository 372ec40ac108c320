"""Load reference PyTorch model files for numerical parity tests.

The reference imports CUDA-only deps (flash_attn) and timm at module level;
both are stubbed here since the tests only exercise the non-fused eval paths
(use_flash_attn=False). This loader exists purely to *check our numbers
against the reference implementation* — no reference code is vendored.
"""

import importlib.machinery
import importlib.util
import itertools
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub_module(name: str) -> types.ModuleType:
    """A stub module with a real __spec__ (transformers' import_utils calls
    importlib.util.find_spec on e.g. "timm", which raises if a module is in
    sys.modules with __spec__ = None)."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def _patch_transformers_compat():
    """Old-HF symbols the reference imports that transformers>=4.50 moved."""
    try:
        from transformers import modeling_utils as mu
        from transformers import pytorch_utils as pu
    except ImportError:
        return
    for sym in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                "prune_linear_layer"):
        if not hasattr(mu, sym) and hasattr(pu, sym):
            setattr(mu, sym, getattr(pu, sym))


def _install_stubs():
    import torch
    from torch import nn

    if "flash_attn" not in sys.modules:
        fa = _stub_module("flash_attn")

        def flash_attn_func(
            q, k, v, dropout_p=0.0, softmax_scale=None, causal=False,
            **kwargs,
        ):
            # videomae.py:86-93 passes (B, H, N, D) and reshapes the result
            # to (B, N, H*D): standard-MHSA semantics require returning
            # (B, N, H, D) with heads concatenated by the reshape.
            scale = (
                softmax_scale if softmax_scale is not None
                else q.shape[-1] ** -0.5
            )
            s = torch.einsum("bhqd,bhkd->bhqk", q.float(), k.float()) * scale
            if causal:
                nq, nk = s.shape[-2:]
                mask = torch.ones(nq, nk, dtype=torch.bool).tril()
                s = s.masked_fill(~mask, float("-inf"))
            p = s.softmax(-1)
            o = torch.einsum("bhqk,bhkd->bhqd", p, v.float())
            return o.permute(0, 2, 1, 3).to(q.dtype)

        fa.flash_attn_func = flash_attn_func
        fa_mlp = _stub_module("flash_attn.modules.mlp")
        fa_mlp.FusedMLP = object
        fa_modules = _stub_module("flash_attn.modules")
        fa_rms = _stub_module("flash_attn.ops.rms_norm")
        fa_rms.DropoutAddRMSNorm = object
        fa_ops = _stub_module("flash_attn.ops")
        fa_iface = _stub_module("flash_attn.flash_attn_interface")
        fa_iface.flash_attn_varlen_qkvpacked_func = None
        fa_pad = _stub_module("flash_attn.bert_padding")
        fa_pad.unpad_input = None
        fa_pad.pad_input = None
        sys.modules.update({
            "flash_attn": fa,
            "flash_attn.modules": fa_modules,
            "flash_attn.modules.mlp": fa_mlp,
            "flash_attn.ops": fa_ops,
            "flash_attn.ops.rms_norm": fa_rms,
            "flash_attn.flash_attn_interface": fa_iface,
            "flash_attn.bert_padding": fa_pad,
        })

    if "torchaudio" not in sys.modules:
        # BEATs.py imports torchaudio.compliance.kaldi for its fbank
        # preprocessing only; parity tests feed fbanks directly.
        ta = _stub_module("torchaudio")
        ta_comp = _stub_module("torchaudio.compliance")
        ta_kaldi = _stub_module("torchaudio.compliance.kaldi")
        ta_kaldi.fbank = None
        ta.compliance = ta_comp
        ta_comp.kaldi = ta_kaldi
        sys.modules.update({
            "torchaudio": ta,
            "torchaudio.compliance": ta_comp,
            "torchaudio.compliance.kaldi": ta_kaldi,
        })

    if "torchvision" not in sys.modules:
        tv = _stub_module("torchvision")
        tv_ops = _stub_module("torchvision.ops")

        class StochasticDepth(nn.Module):  # eval-path identity
            def __init__(self, p=0.0, mode="row"):
                super().__init__()
                self.p = p

            def forward(self, x):
                return x

        tv_ops.StochasticDepth = StochasticDepth
        sys.modules.update({"torchvision": tv, "torchvision.ops": tv_ops})

    if "timm" not in sys.modules:
        timm = _stub_module("timm")
        models = _stub_module("timm.models")
        layers = _stub_module("timm.models.layers")

        class DropPath(nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                if not self.training or self.drop_prob == 0.0:
                    return x
                keep = 1 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
                return x * mask / keep

        def to_2tuple(v):
            return tuple(v) if isinstance(v, (tuple, list)) else (v, v)

        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        layers.drop_path = lambda x, drop_prob=0.0, training=False: x
        registry = _stub_module("timm.models.registry")
        registry.register_model = lambda fn: fn
        sys.modules.update({
            "timm": timm,
            "timm.models": models,
            "timm.models.layers": layers,
            "timm.models.registry": registry,
        })

    _patch_transformers_compat()


_pkg_counter = itertools.count()


def load_reference_module(
    relpath: str,
    extra_siblings: tuple[str, ...] = (),
    stub_modules: dict | None = None,
    sibling_mods: dict | None = None,
):
    """Import a reference python file, satisfying its relative imports.

    `stub_modules`: {dotted_name: {attr: value}} registered in sys.modules
    before the import (e.g. slowfast.utils.logging for UniFormerV2).
    `sibling_mods`: {basename: module | sys.modules key} pre-registered as
    package siblings, so `from .basename import X` resolves to a stand-in
    instead of executing the real (heavy-dependency) reference sibling."""
    _install_stubs()
    for name, attrs in (stub_modules or {}).items():
        if name not in sys.modules:
            mod = _stub_module(name)
            for a, v in attrs.items():
                setattr(mod, a, v)
            sys.modules[name] = mod
    import os

    pkg_name = f"_refpkg{next(_pkg_counter)}"
    dirpath = os.path.join(REFERENCE_ROOT, os.path.dirname(relpath))
    pkg = _stub_module(pkg_name)
    pkg.__path__ = [dirpath]
    sys.modules[pkg_name] = pkg
    for base, mod in (sibling_mods or {}).items():
        if isinstance(mod, str):
            mod = sys.modules[mod]
        sys.modules[f"{pkg_name}.{base}"] = mod

    def _load(modfile):
        name = pkg_name + "." + os.path.splitext(os.path.basename(modfile))[0]
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(dirpath, modfile)
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    for sib in extra_siblings:
        _load(sib)
    return _load(os.path.basename(relpath))


def load_reference_module_nested(
    relpath: str,
    extra_siblings: tuple[str, ...] = (),
    parent_stub_sources: dict[str, str] = None,
):
    """Like load_reference_module but registers a TWO-level package so
    `..utils.xxx`-style relative imports resolve: the file's directory
    becomes `_refpkgN.<dirname>` and `parent_stub_sources` maps dotted
    names under the parent (e.g. "utils.distributed") to python source
    strings executed as stub modules."""
    _install_stubs()
    import os

    pkg_name = f"_refpkg{next(_pkg_counter)}"
    dirpath = os.path.join(REFERENCE_ROOT, os.path.dirname(relpath))
    subname = os.path.basename(dirpath)
    parent = _stub_module(pkg_name)
    parent.__path__ = [os.path.dirname(dirpath)]
    sys.modules[pkg_name] = parent
    sub = _stub_module(f"{pkg_name}.{subname}")
    sub.__path__ = [dirpath]
    sys.modules[f"{pkg_name}.{subname}"] = sub

    for dotted, src in (parent_stub_sources or {}).items():
        parts = dotted.split(".")
        for i in range(1, len(parts)):
            name = f"{pkg_name}." + ".".join(parts[:i])
            if name not in sys.modules:
                m = _stub_module(name)
                m.__path__ = []
                sys.modules[name] = m
        mod = _stub_module(f"{pkg_name}.{dotted}")
        exec(src, mod.__dict__)
        sys.modules[f"{pkg_name}.{dotted}"] = mod

    def _load(modfile):
        name = (
            f"{pkg_name}.{subname}."
            + os.path.splitext(os.path.basename(modfile))[0]
        )
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(dirpath, modfile)
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    for sib in extra_siblings:
        _load(sib)
    return _load(os.path.basename(relpath))

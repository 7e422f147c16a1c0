"""Import the READ-ONLY reference (torch) implementation for parity tests.

The reference depends on CUDA-era packages absent here (timm, xformers, mmcv,
torchvision); this shim installs inert stand-ins so its pure-math modules
import. We only ever *call* the reference's numerics in tests to check ours
against it — no reference code is vendored into the framework.
"""

from __future__ import annotations

import logging
import sys
import types

REFERENCE_PATH = "/root/reference"
_installed = False


def _stub(name: str, **attrs) -> types.ModuleType:
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__path__ = []  # let it act as a package for submodule imports
    # a real ModuleSpec so importlib.util.find_spec (e.g. transformers'
    # package detection) doesn't crash on the stub
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None, is_package=True)
    for key, val in attrs.items():
        setattr(mod, key, val)
    sys.modules[name] = mod
    return mod


def install_reference() -> None:
    """Make `import diffusion...` resolve against /root/reference."""
    global _installed
    if _installed:
        return
    import torch.nn as nn

    class _Mod(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    class _Registry:
        def __init__(self, *a, **k):
            pass

        def register_module(self, *a, **k):
            def deco(cls):
                return cls

            return deco

    class _Any:
        def __init__(self, *a, **k):
            pass

        def __getattr__(self, name):
            return _Any()

        def __call__(self, *a, **k):
            return _Any()

    _stub("timm")
    _stub("timm.models")
    _stub("timm.models.layers", DropPath=_Mod)
    _stub("timm.models.vision_transformer", PatchEmbed=_Mod, Mlp=_Mod, Attention=_Mod)
    _stub("xformers")
    _stub("xformers.ops", memory_efficient_attention=None)
    _stub("xformers.ops.fmha")
    _stub("xformers.ops.fmha.attn_bias", BlockDiagonalMask=_Any)
    _stub("mmcv", Registry=_Registry)
    _stub("mmcv.runner", get_dist_info=lambda: (0, 1))
    _stub("mmcv.utils")
    _stub(
        "mmcv.utils.logging",
        logger_initialized={},
        get_logger=lambda *a, **k: logging.getLogger("ref"),
    )
    _stub("torchvision", transforms=_Any())
    _stub("torchvision.transforms", InterpolationMode=_Any())

    # minimal functional diffusers stand-ins (ConfigMixin/register_to_config)
    import functools
    import inspect
    from types import SimpleNamespace

    def register_to_config(init):
        @functools.wraps(init)
        def wrapped(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
            self.config = SimpleNamespace(**cfg)
            return init(self, *args, **kwargs)

        return wrapped

    class _ConfigMixin:
        pass

    class _SchedulerMixin:
        pass

    class _BaseOutput:
        pass

    import torch

    class _SchedulerOutput:
        def __init__(self, prev_sample=None):
            self.prev_sample = prev_sample

    def _randn_tensor(shape, generator=None, device=None, dtype=None):
        return torch.randn(shape, generator=generator, dtype=dtype)

    _stub("diffusers", ConfigMixin=_ConfigMixin, SchedulerMixin=_SchedulerMixin)
    _stub(
        "diffusers.configuration_utils",
        register_to_config=register_to_config,
        ConfigMixin=_ConfigMixin,
    )
    _stub("diffusers.utils", BaseOutput=_BaseOutput)
    _stub("diffusers.utils.torch_utils", randn_tensor=_randn_tensor)
    _stub("diffusers.schedulers")
    _stub(
        "diffusers.schedulers.scheduling_utils",
        KarrasDiffusionSchedulers=[],  # only iterated for _compatibles names
        SchedulerMixin=_SchedulerMixin,
        SchedulerOutput=_SchedulerOutput,
    )

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    _installed = True

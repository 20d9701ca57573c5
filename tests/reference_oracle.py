"""Load the reference PyTorch models from /root/reference as test oracles.

The reference's CUDA extensions are stubbed with equivalent pure-torch
implementations (same numerical semantics as the kernels, verified in
tests/test_ops_*.py) so the original model code runs unmodified on CPU.
This gives gold-standard parity targets without copying any reference code
into this repo.
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import torch
import torch.nn.functional as F

REF_MODELS_PATH = "/root/reference/models"


def torch_spatial_correlation_sample(
    input1, input2, kernel_size=1, patch_size=1, stride=1, padding=0,
    dilation=1, dilation_patch=1,
):
    """Pure-torch implementation of the correlation op's k=1 fast path
    (the only configuration the reference models use)."""
    assert kernel_size == 1 and stride == 1 and padding == 0 and dilation == 1
    B, C, H, W = input1.shape
    rad = (patch_size - 1) // 2
    md = rad * dilation_patch
    in2p = F.pad(input2, (md, md, md, md))
    out = input1.new_zeros(B, patch_size, patch_size, H, W)
    for pu in range(patch_size):
        for pv in range(patch_size):
            du = (pu - rad) * dilation_patch
            dv = (pv - rad) * dilation_patch
            shifted = in2p[:, :, md + du : md + du + H, md + dv : md + dv + W]
            out[:, pu, pv] = (input1 * shifted).sum(1)
    return out


class TorchResample2d(torch.nn.Module):
    """Pure-torch Resample2d (border-clamped bilinear warp at pixel coords,
    resample2d_kernel.cu:49-66)."""

    def __init__(self, kernel_size=1, bilinear=True):
        super().__init__()

    def forward(self, input1, flow):
        B, C, H, W = input1.shape
        xx = torch.arange(W).view(1, 1, W).expand(B, H, W).float()
        yy = torch.arange(H).view(1, H, 1).expand(B, H, W).float()
        x = xx + flow[:, 0]
        y = yy + flow[:, 1]
        x0 = torch.floor(x)
        y0 = torch.floor(y)
        a = (x - x0).unsqueeze(1)
        b = (y - y0).unsqueeze(1)

        def tap(yi, xi):
            yi = yi.clamp(0, H - 1).long()
            xi = xi.clamp(0, W - 1).long()
            idx = (yi * W + xi).view(B, 1, H * W).expand(B, C, H * W)
            return input1.reshape(B, C, H * W).gather(2, idx).view(B, C, H, W)

        return (
            (1 - a) * (1 - b) * tap(y0, x0)
            + a * (1 - b) * tap(y0, x0 + 1)
            + (1 - a) * b * tap(y0 + 1, x0)
            + a * b * tap(y0 + 1, x0 + 1)
        )


class TorchChannelNorm(torch.nn.Module):
    def __init__(self, norm_deg=2):
        super().__init__()

    def forward(self, x):
        return x.pow(2).sum(1, keepdim=True).sqrt()


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


_installed = False


def install_reference():
    """Make the reference models importable as the 'refmodels' package."""
    global _installed
    if _installed:
        return sys.modules["refmodels"]
    # .cuda() no-ops (the reference hardcodes .cuda() in normalize paths)
    torch.Tensor.cuda = lambda self, *a, **kw: self  # type: ignore[assignment]

    _stub_module(
        "spatial_correlation_sampler",
        spatial_correlation_sample=torch_spatial_correlation_sample,
        SpatialCorrelationSampler=object,
    )
    # CUDA extension stand-ins for the FlowNet2 packages
    _stub_module("refmodels.resample2d_package")
    _stub_module(
        "refmodels.resample2d_package.resample2d", Resample2d=TorchResample2d
    )
    _stub_module("refmodels.channelnorm_package")
    _stub_module(
        "refmodels.channelnorm_package.channelnorm", ChannelNorm=TorchChannelNorm
    )

    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [REF_MODELS_PATH]
    sys.modules["refmodels"] = pkg
    _installed = True
    return pkg


def ref_module(name: str):
    install_reference()
    return importlib.import_module(f"refmodels.{name}")


_installed_abs = False


def install_reference_abs():
    """Make the reference repo importable ABSOLUTELY (``global_attacks.*``,
    ``patch_attacks.*``, ``models.*``) so its attack/driver code can run as
    a CPU oracle.  Third-party packages missing from this image
    (imagecorruptions, skimage, path) are stubbed with minimal equivalents;
    the reference's CUDA extension packages get the same pure-torch stand-ins
    as install_reference()."""
    global _installed_abs
    if _installed_abs:
        return
    install_reference()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    corruption_names = [
        "gaussian_noise", "shot_noise", "impulse_noise", "defocus_blur",
        "glass_blur", "motion_blur", "zoom_blur", "snow", "frost", "fog",
        "brightness", "contrast", "elastic_transform", "pixelate",
        "jpeg_compression",
    ]

    def _corrupt(image, corruption_name=None, severity=1):
        raise NotImplementedError(
            "imagecorruptions stub: corruption oracle not available"
        )

    _stub_module(
        "imagecorruptions",
        get_corruption_names=lambda subset="common": list(corruption_names),
        corrupt=_corrupt,
    )

    def random_noise(image, mode="gaussian", var=0.01, **kw):
        noise = np.random.normal(0.0, var ** 0.5, image.shape)
        return np.clip(image + noise, 0.0, 1.0)

    skimage = _stub_module("skimage")
    skimage.util = _stub_module("skimage.util", random_noise=random_noise)

    import pathlib

    _stub_module("path", Path=pathlib.Path)
    _stub_module(
        "pkg_resources",
        resource_filename=lambda pkg, name: name,
    )
    _stub_module("png")  # pypng, used only for 16-bit KITTI PNG I/O
    # torchvision: only ToTensor / transforms are touched at import time
    tv = _stub_module("torchvision")
    tv.transforms = _stub_module(
        "torchvision.transforms", ToTensor=object, Compose=object,
        ColorJitter=object,
    )

    class _Bar:
        def __init__(self, *a, **kw):
            pass

        def __call__(self, *a, **kw):
            return self

        def __getattr__(self, name):
            return _Bar()

    _stub_module(
        "progressbar", ProgressBar=_Bar, Bar=_Bar, ETA=_Bar, Timer=_Bar,
        Percentage=_Bar, widgets=_stub_module("progressbar.widgets"),
    )

    class _Terminal:
        def __getattr__(self, name):
            if name in ("height", "width"):
                return 80
            return lambda *a, **kw: ""

        def location(self, *a, **kw):
            import contextlib

            return contextlib.nullcontext()

    _stub_module("blessings", Terminal=_Terminal)

    # models/__init__.py imports .PWCNetFlex, which does not exist in the
    # reference repo (broken upstream) — stub it so `import models` works.
    _stub_module(
        "models.PWCNetFlex",
        PWCDCNetFlex=object,
        pwc_dc_net_flex=lambda *a, **kw: None,
    )
    # Absolute-name CUDA extension stand-ins for `import models`
    _stub_module("models.resample2d_package")
    _stub_module(
        "models.resample2d_package.resample2d", Resample2d=TorchResample2d
    )
    _stub_module("models.channelnorm_package")
    _stub_module(
        "models.channelnorm_package.channelnorm", ChannelNorm=TorchChannelNorm
    )
    _installed_abs = True


def state_dict_numpy(model: torch.nn.Module) -> dict[str, np.ndarray]:
    return {
        k: v.detach().cpu().numpy()
        for k, v in model.state_dict().items()
        if not k.endswith("num_batches_tracked")
    }


def nchw(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


def nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().cpu().numpy(), (0, 2, 3, 1))

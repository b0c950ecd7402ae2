"""Import machinery to run the PUBLIC reference implementation
(/root/reference, read-only) as a numerical oracle for parity tests.

The reference's import graph pulls optional heavy deps (xarray, zarr,
torch-harmonics, torchvision, ...) that this image lacks; none are exercised
by the model forward paths under test, so we install inert stub modules.
Reference code is never copied — it is imported in place and executed.
"""

from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"


class _Any:
    def __getattr__(self, k):
        return _Any()

    def __call__(self, *a, **kw):
        return _Any()


def _stub(name, pkg=False):
    if name in sys.modules:
        return
    m = types.ModuleType(name)
    m.__file__ = f"<stub {name}>"
    # torch._dynamo.trace_rules probes find_spec(<module>) — a None __spec__
    # raises ValueError there, so give stubs a real ModuleSpec
    import importlib.machinery as _mach

    m.__spec__ = _mach.ModuleSpec(name, loader=None)
    if pkg:
        m.__path__ = []
        m.__spec__.submodule_search_locations = []

    def ga(k):
        if k.startswith("__"):
            raise AttributeError(k)
        return _Any()

    m.__getattr__ = ga
    sys.modules[name] = m


def install_reference():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    for n in ["xarray", "cftime", "netCDF4", "dask", "zarr", "pvlib",
              "bridgescaler", "bridgescaler.backend", "xesmf", "metpy",
              "metpy.calc", "metpy.units", "torchvision", "rechunker", "s3fs",
              "segmentation_models_pytorch", "einops_exts"]:
        _stub(n)
    _stub("torch_harmonics", pkg=True)
    _stub("torch_harmonics.quadrature")
    if "optuna" not in sys.modules:
        # the trainers import optuna and raise/except optuna.TrialPruned —
        # that attribute must be a real exception class, so the generic
        # _Any-stub (whose attributes are plain objects) would break
        # `except optuna.TrialPruned`
        op = types.ModuleType("optuna")
        op.__file__ = "<stub optuna>"

        class _TrialPruned(Exception):
            pass

        op.TrialPruned = _TrialPruned
        sys.modules["optuna"] = op
    if "numba" not in sys.modules:
        nb = types.ModuleType("numba")
        nb.__file__ = "<stub numba>"
        nb.njit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
        nb.prange = range
        sys.modules["numba"] = nb


TINY_KW = dict(
    image_height=32, image_width=64, frames=1, channels=2, surface_channels=2,
    input_only_channels=1, output_only_channels=1, levels=2,
    dim=(16, 32, 64, 128), depth=(1, 1, 1, 1), dim_head=16,
    global_window_size=(2, 2, 1, 1), local_window_size=2,
    cross_embed_kernel_sizes=((4, 8), (2, 4), (2, 4), (2, 4)),
    cross_embed_strides=(2, 2, 2, 2),
    padding_conf={"activate": True, "mode": "earth",
                  "pad_lat": [16, 16], "pad_lon": [0, 0]},
)


def build_reference_crossformer(use_spectral_norm=True, **overrides):
    install_reference()
    from credit.models.wxformer.crossformer import CrossFormer as TorchCF

    kw = {**TINY_KW, "use_spectral_norm": use_spectral_norm, **overrides}
    m = TorchCF(**kw)
    m.eval()
    return m, kw

from .spec import NetSpec, LayerSpec, RegionSpec, build_spec
from .darknet import init_params, apply_network, fold_batchnorm
from . import weights_io

__all__ = [
    "NetSpec",
    "LayerSpec",
    "RegionSpec",
    "build_spec",
    "init_params",
    "apply_network",
    "fold_batchnorm",
    "weights_io",
]

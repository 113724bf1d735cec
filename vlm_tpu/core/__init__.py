"""Core substrate: device mesh, dtype/quantization policy, config system."""

from .config import (build_cfg_from_profile, deep_merge, load_config,
                     make_run_name, project_root)
from .dtypes import DTypePolicy, policy_for
from .mesh import (DATA_AXIS, MODEL_AXIS, data_sharding, make_mesh,
                   replicated, single_device_mesh)

__all__ = [
    "build_cfg_from_profile", "deep_merge", "load_config", "make_run_name",
    "project_root", "DTypePolicy", "policy_for", "DATA_AXIS", "MODEL_AXIS",
    "data_sharding", "make_mesh", "replicated", "single_device_mesh",
]

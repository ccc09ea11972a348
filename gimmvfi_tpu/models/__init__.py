from .gimm import GIMM, gimm_loss
from .gimmvfi_f import GIMMVFI_F
from .gimmvfi_r import GIMMVFI_R, interpolate_sequential
from .hyponet import HypoNet


def create_model(arch_type: str, **kw):
    """Model factory (`src/models/__init__.py:15-37`)."""
    arch_type = arch_type.lower()
    if arch_type == "gimm":
        return GIMM(**kw)
    if arch_type == "gimmvfi_r":
        return GIMMVFI_R(**kw)
    if arch_type == "gimmvfi_f":
        return GIMMVFI_F(**kw)
    raise ValueError(f"unknown arch: {arch_type}")

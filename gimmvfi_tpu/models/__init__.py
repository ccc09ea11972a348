from .gimm import GIMM, gimm_loss
from .gimmvfi_r import GIMMVFI_R
from .hyponet import HypoNet


def create_model(arch_type: str, **kw):
    """Model factory (`src/models/__init__.py:15-37`). GIMM-VFI-F lands with
    the FlowFormer port."""
    arch_type = arch_type.lower()
    if arch_type == "gimm":
        return GIMM(**kw)
    if arch_type == "gimmvfi_r":
        return GIMMVFI_R(**kw)
    raise ValueError(f"unknown arch: {arch_type}")

from .frame_io import read_flo, read_gen, read_image, read_pfm, write_flo
from .loader import DataLoader
from .vimeo_arb import VimeoArbitrary
from .flow_dataset import VimeoFlowTriplets


def create_dataset(name: str, path: str, is_eval: bool = False, **kw):
    """Dataset factory (`src/datasets/__init__.py:20-48`)."""
    if name == "vimeo_arb":
        trn = VimeoArbitrary(path, split="train", **kw)
        val = VimeoArbitrary(path, split="test", **kw)
    elif name == "fast_vimeo_flow":
        trn = VimeoFlowTriplets(path, split="train", **kw)
        val = VimeoFlowTriplets(path, split="test", **kw)
    else:
        raise ValueError(f"unknown dataset: {name}")
    return trn, val

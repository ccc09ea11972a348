from .frame_io import read_flo, read_gen, read_image, read_pfm, write_flo
from .loader import DataLoader
from .vimeo_arb import VimeoArbitrary
from .flow_dataset import VimeoFlowTriplets


def create_dataset(name: str, path: str, is_eval: bool = False, **kw):
    """Dataset factory (`src/datasets/__init__.py:20-48`)."""
    if name == "vimeo_arb":
        args = {"aug": kw.get("aug", True)}
        if kw.get("crop_size"):
            args["crop_size"] = tuple(kw["crop_size"])
        trn = VimeoArbitrary(path, split="train", **args)
        val = VimeoArbitrary(path, split="test", **args)
    elif name == "fast_vimeo_flow":
        args = {}
        if kw.get("crop_size"):
            args["crop"] = int(kw["crop_size"][0])
        trn = VimeoFlowTriplets(path, split="train", **args)
        val = VimeoFlowTriplets(path, split="test", **args)
    else:
        raise ValueError(f"unknown dataset: {name}")
    return trn, val

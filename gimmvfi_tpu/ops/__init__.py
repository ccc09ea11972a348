from .interp import (
    avg_pool2x2,
    bilinear_sample,
    bilinear_sampler,
    grid_sample,
    resize,
    resize_bilinear,
    upflow8,
    warp,
)
from .coords import (
    coords_grid,
    normalize_flow,
    sample_coords_3d,
    sample_coords_3d_per_sample,
    unnormalize_flow,
)
from .pad import InputPadder, pad_reflect
from .softsplat import softsplat
from .corr import (
    CorrPyramid,
    all_pairs_corr,
    bidir_corr_lookup,
    bidir_corr_pyramid,
    corr_lookup,
    corr_pyramid,
)

from .bev_pool import bev_pool, lift_splat_pool
from .voxelize import (hard_voxelize, dynamic_voxelize, unique_voxels,
                       compute_voxel_coords, VoxelizationOutput)
from .scatter import dynamic_scatter, scatter_reduce, ScatterOutput
from .ms_deform_attn import ms_deform_attn
from .spconv import (SparseTensor, subm_conv, sparse_conv, sparse_to_dense,
                     build_subm_rulebook, build_sparse_conv_plan, gather_gemm)
from .paconv import assign_score_withk
from .roi_align import roi_align
from . import segmented

__all__ = [
    "assign_score_withk", "roi_align",
    "bev_pool", "lift_splat_pool", "hard_voxelize", "dynamic_voxelize",
    "unique_voxels", "compute_voxel_coords", "VoxelizationOutput",
    "dynamic_scatter", "scatter_reduce", "ScatterOutput", "ms_deform_attn",
    "SparseTensor", "subm_conv", "sparse_conv", "sparse_to_dense",
    "build_subm_rulebook", "build_sparse_conv_plan", "gather_gemm",
    "segmented",
]

"""L1 — datasets and input pipeline.

Host-side numpy pipeline producing fixed-shape device batches (pad-with-mask,
never ragged): split/index management mirroring the reference layout
(``datasets/aligned_coloradar/Coloradar_dataset.py``), an spconv-compatible
voxelizer, occupancy query sampling, and a threaded prefetching loader that
replaces ``torch.utils.data.DataLoader`` + ``DistributedSampler``.
"""
from rald_tpu.data.voxelizer import voxelize, VoxelGrid
from rald_tpu.data.query import (
    sample_train_queries,
    sample_eval_queries,
    empty_voxel_centers,
    aug_query_helper,
    voxel_centers,
)
from rald_tpu.data.radar_proc import process_radar_cube
from rald_tpu.data.coloradar import ColoRadarDataset
from rald_tpu.data.hustradar import HUSTRadarDataset
from rald_tpu.data.registry import get_dataset
from rald_tpu.data.loader import DataLoader, ShardedSampler

__all__ = [
    "voxelize",
    "VoxelGrid",
    "sample_train_queries",
    "sample_eval_queries",
    "empty_voxel_centers",
    "aug_query_helper",
    "voxel_centers",
    "process_radar_cube",
    "ColoRadarDataset",
    "HUSTRadarDataset",
    "get_dataset",
    "DataLoader",
    "ShardedSampler",
]

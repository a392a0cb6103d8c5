from rald_tpu.eval.chamfer import chamfer_distance, masked_chamfer, nearest_neighbor_dists
from rald_tpu.eval.queries import generate_query_points
from rald_tpu.eval.occupancy import occupancy_metrics
from rald_tpu.eval.ply import write_ply

__all__ = [
    "chamfer_distance",
    "generate_query_points",
    "masked_chamfer",
    "nearest_neighbor_dists",
    "occupancy_metrics",
    "write_ply",
]

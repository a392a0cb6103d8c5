from rald_tpu.ops.fps import farthest_point_sampling
from rald_tpu.ops.query_attention import streaming_single_head_attention

__all__ = ["farthest_point_sampling", "streaming_single_head_attention"]

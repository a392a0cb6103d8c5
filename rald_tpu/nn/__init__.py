from rald_tpu.nn.layers import (
    Attention,
    AdaLayerNorm,
    DropPath,
    FourierTimeEmbedding,
    GEGLUFeedForward,
    PointEmbed,
)

__all__ = [
    "Attention",
    "AdaLayerNorm",
    "DropPath",
    "FourierTimeEmbedding",
    "GEGLUFeedForward",
    "PointEmbed",
]

"""MXU dot helpers for Pallas kernels: precision that is safe under a global
``jax.default_matmul_precision("highest")`` (the ``system.matmul_precision``
torch-parity knob).

Mosaic rejects an fp32 contract-precision request on bf16/int8 operands
("Bad lhs type"), and for those dtypes a higher precision is meaningless
anyway — the MXU multiplies them natively and ``preferred_element_type``
already pins the f32/i32 accumulator. f32 operands, by contrast, SHOULD
follow the global setting (that is the whole point of the parity knob), and
Mosaic accepts fp32 contract precision for them. So: pin DEFAULT for
non-f32 operands, inherit the global precision for f32 ones.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _precision_for(a, b):
    if a.dtype == jnp.float32 and b.dtype == jnp.float32:
        return None  # inherit jax.default_matmul_precision
    return jax.lax.Precision.DEFAULT


def mxu_dot(a, b, out_dtype):
    return jnp.dot(a, b, preferred_element_type=out_dtype, precision=_precision_for(a, b))


def mxu_dot_general(a, b, dims, out_dtype):
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=out_dtype, precision=_precision_for(a, b)
    )

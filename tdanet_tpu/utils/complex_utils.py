"""Complex-tensor helpers (reference: look2hear/utils/complex_utils.py).

JAX has first-class complex arrays, so these are thin wrappers keeping the
reference's API surface (einsum/matmul/inverse/solve/trace/reverse/
stack/cat/norm) for code written against it.
"""

from __future__ import annotations

import jax.numpy as jnp


def new_complex_like(ref, real_imag):
    real, imag = real_imag
    return real + 1j * imag


def is_complex(c):
    return jnp.iscomplexobj(c)


is_torch_complex_tensor = is_complex


def to_double(c):
    return c.astype(jnp.complex128 if is_complex(c) else jnp.float64)


def to_float(c):
    return c.astype(jnp.complex64 if is_complex(c) else jnp.float32)


def cat(seq, axis=0, **kw):
    return jnp.concatenate(list(seq), axis=axis)


def stack(seq, axis=0, **kw):
    return jnp.stack(list(seq), axis=axis)


def complex_norm(c, dim=-1, keepdim=False, eps: float = 1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.abs(c) ** 2, axis=dim, keepdims=keepdim)
                    + eps)
    return norm


def einsum(equation, *operands):
    return jnp.einsum(equation, *operands)


def matmul(a, b):
    return a @ b


def inverse(c):
    return jnp.linalg.inv(c)


def solve(b, a):
    """Solve ax = b (reference argument order, complex_utils.py:160)."""
    return jnp.linalg.solve(a, b)


def trace(a):
    return jnp.trace(a, axis1=-2, axis2=-1)


def reverse(a, dim=0):
    return jnp.flip(a, axis=dim)

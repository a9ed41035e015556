"""Gradient utilities.

``grad_multiply`` is the JAX form of the reference's ``GradMultiply``
autograd function (``components.py:1401-1411`` — defined for fairseq-style
feature-extractor gradient scaling): identity forward, scaled cotangent.
"""

from __future__ import annotations

import jax


@jax.custom_vjp
def grad_multiply(x, scale: float = 1.0):
    return x


def _fwd(x, scale):
    return x, scale


def _bwd(scale, g):
    return (g * scale, None)


grad_multiply.defvjp(_fwd, _bwd)

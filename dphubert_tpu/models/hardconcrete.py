"""Hard Concrete distribution for L0 regularization — pure-function form.

Re-derivation of the gate math used by the reference
(``/root/reference/wav2vec2/hardconcrete.py``; originally from the FLOP
repo), expressed as stateless functions over ``log_alpha`` arrays with
explicit PRNG keys so they are jit/vmap/grad friendly.

Constants (``hardconcrete.py:33-34,64``):
  beta (temperature)   = 2/3
  stretch              = 0.1   => support stretched to [-0.1, 1.1]
  bias                 = -beta * log(-l/r) = -beta * log(0.1/1.1)
  eps                  = 1e-6
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

BETA = 2.0 / 3.0
LIMIT_L = -0.1
LIMIT_R = 1.1
BIAS = -BETA * math.log(-LIMIT_L / LIMIT_R)
EPS = 1e-6


def l0_norm(log_alpha: jax.Array) -> jax.Array:
    """Differentiable expected number of alive units:
    ``sum(sigmoid(log_alpha + bias))`` (reference ``hardconcrete.py:76-83``)."""
    return jnp.sum(jax.nn.sigmoid(log_alpha + BIAS))


def sample_mask(log_alpha: jax.Array, key: jax.Array) -> jax.Array:
    """Training-mode stochastic mask (reference ``hardconcrete.py:92-99``):
    u ~ U(eps, 1-eps); s = sigmoid((logit(u) + log_alpha)/beta); stretch to
    [-0.1, 1.1]; clamp to [0, 1]."""
    u = jax.random.uniform(
        key, log_alpha.shape, log_alpha.dtype, minval=EPS, maxval=1.0 - EPS
    )
    s = jax.nn.sigmoid((jnp.log(u / (1.0 - u)) + log_alpha) / BETA)
    s = s * (LIMIT_R - LIMIT_L) + LIMIT_L
    return jnp.clip(s, 0.0, 1.0)


def eval_mask(log_alpha: np.ndarray) -> np.ndarray:
    """Eval-mode deterministic compiled mask (reference
    ``hardconcrete.py:101-114``).

    Host-side numpy: the expected zero count ``round(n - l0_norm)`` is a
    data-dependent top-k size, which we resolve at surgery time rather than
    inside a compiled graph (static shapes on TPU).

    soft = sigmoid(log_alpha / beta * 0.8)   # empirical magic 0.8
    zero out the ``num_zeros`` smallest entries.
    """
    log_alpha = np.asarray(log_alpha, dtype=np.float64)
    n = log_alpha.shape[0]
    expected_num_zeros = n - float(
        np.sum(1.0 / (1.0 + np.exp(-(log_alpha + BIAS))))
    )
    # Match python round() (banker's rounding) used by the reference.
    num_zeros = int(round(expected_num_zeros))
    soft = 1.0 / (1.0 + np.exp(-(log_alpha / BETA * 0.8)))
    if num_zeros > 0:
        order = np.argsort(soft, kind="stable")
        soft[order[:num_zeros]] = 0.0
    return soft.astype(np.float32)

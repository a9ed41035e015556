"""The fused-attention dispatcher: packed kernel up to H*D=768, tiled
flash kernel above (the packed backward overflows scoped VMEM at
1024-wide models on v5e).  Both routes must match the dense path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dphubert_tpu.models import components
from dphubert_tpu.configs import AttentionSpec


def _spec(H, D):
    return AttentionSpec(
        embed_dim=H * D,
        num_heads=H,
        head_dim=D,
        dropout=0.0,
        has_relative_attention_bias=False,
        gru_rel_pos=False,
    )


def _params(H, D, key):
    E = H * D
    k1, k2, k3 = jax.random.split(key, 3)
    mk = lambda k, shape: 0.05 * jax.random.normal(k, shape, jnp.float32)
    return {
        "k_proj": {"weight": mk(k1, (E, E)), "bias": jnp.zeros((E,))},
        "v_proj": {"weight": mk(k2, (E, E)), "bias": jnp.zeros((E,))},
        "q_proj": {"weight": mk(k3, (E, E)), "bias": jnp.zeros((E,))},
        "out_proj": {"weight": mk(k1, (E, E)), "bias": jnp.zeros((E,))},
    }


@pytest.mark.parametrize("H,D", [(12, 64), (16, 64)])  # 768 packed, 1024 flash
def test_dispatch_matches_dense(H, D):
    spec = _spec(H, D)
    p = _params(H, D, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 64, H * D), jnp.float32)
    lengths = jnp.array([64, 48])

    # dense path masks via the encoder's additive attn_mask; fused paths
    # mask in-kernel from lengths
    L = x.shape[1]
    attn_mask = jnp.where(
        jnp.arange(L)[None, :] < lengths[:, None], 0.0, -10000.0
    )[:, None, None, :]

    def run(env, mask, lens):
        os.environ["DPHUBERT_FLASH_ATTENTION"] = env
        try:
            out, _ = components.self_attention_forward(
                p, spec, x, mask, None, None, False, None,
                lengths=lens,
            )
        finally:
            del os.environ["DPHUBERT_FLASH_ATTENTION"]
        return np.asarray(out)

    dense = run("0", attn_mask, None)
    fused = run("1", None, lengths)  # interpret-mode kernels on CPU
    # only compare valid query rows: padded-query outputs are unspecified
    dense = dense[:, : int(lengths.min())]
    fused = fused[:, : int(lengths.min())]
    np.testing.assert_allclose(fused, dense, atol=2e-5, rtol=2e-5)

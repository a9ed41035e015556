"""Packed-layout fused attention: operates directly on (B, L, H*D) tensors.

Second-generation kernel for this workload's regime (L <= ~1024, D = 64):

  * no (B,L,H,D)->(B,H,L,D) transposes — inputs are exactly the QKV
    projection outputs, the output feeds out_proj directly (the transposes
    cost ~10 ms/step of pure HBM traffic at the bench shape);
  * one grid cell per (batch, q-tile) with a static loop over heads — an
    order of magnitude fewer kernel launches than the per-head grid;
  * the whole KV range lives in one VMEM block, so softmax is single-pass
    (no online correction) and the backward kernels recompute (m, l) instead
    of reading residuals — the forward stores only the output.

Same masking/dropout semantics as ``flash_attention`` (iota length mask,
counter-hash dropout regenerated in the backward).  Falls back to the tiled
kernel for sequences too long to hold KV in VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import NEG_INF, _ceil_to, _dropout_keep_mask

LANES = 128
MAX_PACKED_KV = 1024  # beyond this, VMEM pressure favors the tiled kernel
MAX_PACKED_WIDTH = 768  # H*D cap: the bwd kernels' scoped VMEM overflows at
# 1024-wide models (Large family, 16.48M > 16M on v5e) — callers fall back
# to flash_attention above this


def _heads_loop_fwd(
    lengths_ref, seed_ref, q_ref, k_ref, v_ref, o_ref, *,
    scale, num_heads, head_dim, masked, dropout_rate,
):
    b = pl.program_id(0)
    q_idx = pl.program_id(1)
    q_all = q_ref[0]  # (block_q, H*D)
    k_all = k_ref[0]  # (Lp, H*D)
    v_all = v_ref[0]
    block_q = q_all.shape[0]

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_all[:, sl]
        k = k_all[:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (block_q, Lp)
        if masked:
            length = lengths_ref[b]
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < length, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        if dropout_rate > 0.0:
            keep = _dropout_keep_mask(
                p.shape, 1.0 - dropout_rate, seed_ref[0], b, h,
                q_idx * block_q, 0,
            )
            p = jnp.where(keep, p, 0.0)
            l_inv = l_inv / (1.0 - dropout_rate)
        out = jax.lax.dot(
            (p * l_inv).astype(v_all.dtype), v_all[:, sl],
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


def _heads_loop_bwd_dq(
    lengths_ref, seed_ref, q_ref, k_ref, v_ref, do_ref, di_ref, dq_ref, *,
    scale, num_heads, head_dim, masked, dropout_rate,
):
    b = pl.program_id(0)
    q_idx = pl.program_id(1)
    q_all = q_ref[0]
    k_all = k_ref[0]
    v_all = v_ref[0]
    do_all = do_ref[0]
    di_all = di_ref[0]  # (block_q, H) padded to (block_q, LANES)
    block_q = q_all.shape[0]

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_all[:, sl]
        k = k_all[:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if masked:
            length = lengths_ref[b]
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < length, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p_raw = jnp.exp(s - m)
        l = jnp.sum(p_raw, axis=1, keepdims=True)
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        p = p_raw * l_inv  # normalized softmax
        do = do_all[:, sl].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v_all[:, sl].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_rate > 0.0:
            keep = _dropout_keep_mask(
                p.shape, 1.0 - dropout_rate, seed_ref[0], b, h,
                q_idx * block_q, 0,
            )
            dp = jnp.where(keep, dp / (1.0 - dropout_rate), 0.0)
        di = di_all[:, h : h + 1]
        ds = p * (dp - di) * scale
        dq = jax.lax.dot(
            ds, k.astype(jnp.float32), preferred_element_type=jnp.float32
        )
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)


def _heads_loop_bwd_dkv(
    lengths_ref, seed_ref, q_ref, k_ref, v_ref, do_ref, di_ref,
    dk_ref, dv_ref, dk_acc, dv_acc, *,
    scale, num_heads, head_dim, masked, dropout_rate, n_q,
):
    b = pl.program_id(0)
    q_idx = pl.program_id(1)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q_all = q_ref[0]
    k_all = k_ref[0]
    v_all = v_ref[0]
    do_all = do_ref[0]
    di_all = di_ref[0]
    block_q = q_all.shape[0]

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_all[:, sl]
        k = k_all[:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if masked:
            length = lengths_ref[b]
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < length, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p_raw = jnp.exp(s - m)
        l = jnp.sum(p_raw, axis=1, keepdims=True)
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        p = p_raw * l_inv
        do = do_all[:, sl].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v_all[:, sl].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_rate > 0.0:
            keep = _dropout_keep_mask(
                p.shape, 1.0 - dropout_rate, seed_ref[0], b, h,
                q_idx * block_q, 0,
            )
            inv_keep = 1.0 / (1.0 - dropout_rate)
            p_used = jnp.where(keep, p * inv_keep, 0.0)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        else:
            p_used = p
        di = di_all[:, h : h + 1]
        ds = p * (dp - di) * scale
        # dV_h += P~^T dO_h ; dK_h += dS^T Q_h
        dv_acc[:, sl] += jax.lax.dot_general(
            p_used, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_acc[:, sl] += jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(q_idx == n_q - 1)
    def _store():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _fwd_call(q, k, v, lengths, seed, scale, num_heads, head_dim, block_q,
              interpret, dropout_rate):
    B, Lq, HD = q.shape
    Lkv = k.shape[1]
    masked = lengths is not None
    if lengths is None:
        lengths = jnp.full((B,), Lkv, jnp.int32)
    grid = (B, Lq // block_q)
    return pl.pallas_call(
        functools.partial(
            _heads_loop_fwd, scale=scale, num_heads=num_heads,
            head_dim=head_dim, masked=masked, dropout_rate=dropout_rate,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, HD), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, Lkv, HD), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, Lkv, HD), lambda b, i, *_: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, HD), lambda b, i, *_: (b, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Lq, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(lengths, seed, q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _packed(q, k, v, lengths, seed, scale, num_heads, head_dim, block_q,
            interpret, dropout_rate):
    return _fwd_call(
        q, k, v, lengths, seed, scale, num_heads, head_dim, block_q,
        interpret, dropout_rate,
    )


def _packed_fwd(q, k, v, lengths, seed, scale, num_heads, head_dim, block_q,
                interpret, dropout_rate):
    out = _fwd_call(
        q, k, v, lengths, seed, scale, num_heads, head_dim, block_q,
        interpret, dropout_rate,
    )
    return out, (q, k, v, lengths, seed, out)


def _packed_bwd(scale, num_heads, head_dim, block_q, interpret, dropout_rate,
                res, do):
    q, k, v, lengths, seed, out = res
    B, Lq, HD = q.shape
    Lkv = k.shape[1]
    n_q = Lq // block_q
    masked = lengths is not None
    if lengths is None:
        lengths = jnp.full((B,), Lkv, jnp.int32)
    # di[b, t, h] = sum_d out * dout over the head's slice; pad heads to LANES
    di = jnp.sum(
        out.astype(jnp.float32).reshape(B, Lq, num_heads, head_dim)
        * do.astype(jnp.float32).reshape(B, Lq, num_heads, head_dim),
        axis=-1,
    )  # (B, Lq, H)
    di = jnp.pad(di, ((0, 0), (0, 0), (0, LANES - num_heads)))

    common_specs = [
        pl.BlockSpec((1, block_q, HD), lambda b, i, *_: (b, i, 0)),
        pl.BlockSpec((1, Lkv, HD), lambda b, i, *_: (b, 0, 0)),
        pl.BlockSpec((1, Lkv, HD), lambda b, i, *_: (b, 0, 0)),
        pl.BlockSpec((1, block_q, HD), lambda b, i, *_: (b, i, 0)),
        pl.BlockSpec((1, block_q, LANES), lambda b, i, *_: (b, i, 0)),
    ]
    dq = pl.pallas_call(
        functools.partial(
            _heads_loop_bwd_dq, scale=scale, num_heads=num_heads,
            head_dim=head_dim, masked=masked, dropout_rate=dropout_rate,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_q),
            in_specs=common_specs,
            out_specs=pl.BlockSpec((1, block_q, HD), lambda b, i, *_: (b, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Lq, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(lengths, seed, q, k, v, do, di)

    dk, dv = pl.pallas_call(
        functools.partial(
            _heads_loop_bwd_dkv, scale=scale, num_heads=num_heads,
            head_dim=head_dim, masked=masked, dropout_rate=dropout_rate,
            n_q=n_q,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_q),
            in_specs=common_specs,
            out_specs=[
                pl.BlockSpec((1, Lkv, HD), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, Lkv, HD), lambda b, i, *_: (b, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((Lkv, HD), jnp.float32),
                pltpu.VMEM((Lkv, HD), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Lkv, HD), q.dtype),
            jax.ShapeDtypeStruct((B, Lkv, HD), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, seed, q, k, v, do, di)
    return dq, dk, dv, None, None


_packed.defvjp(_packed_fwd, _packed_bwd)


def packed_attention(
    q,
    k,
    v,
    lengths: Optional[jax.Array] = None,
    *,
    num_heads: int,
    scale: Optional[float] = None,
    block_q: int = 256,
    interpret: Optional[bool] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
):
    """Fused attention on packed (B, L, num_heads*head_dim) tensors.

    Returns the same layout.  Requires the (padded) KV length to fit in one
    VMEM block (L <= MAX_PACKED_KV); callers fall back to
    :func:`flash_attention` otherwise.
    """
    B, L, HD = q.shape
    head_dim = HD // num_heads
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if scale is None:
        scale = head_dim ** -0.5
    block_q = min(block_q, _ceil_to(L, LANES))
    Lp = _ceil_to(L, block_q)

    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        seed = jax.random.bits(dropout_rng, (1,), jnp.uint32).astype(jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    if Lp != L:
        pad = [(0, 0), (0, Lp - L), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        if lengths is None:
            lengths = jnp.full((B,), L, jnp.int32)
    if lengths is not None:
        lengths = lengths.astype(jnp.int32)
    out = _packed(
        q, k, v, lengths, seed, float(scale), num_heads, head_dim, block_q,
        interpret, float(dropout_rate),
    )
    if Lp != L:
        out = out[:, :L, :]
    return out

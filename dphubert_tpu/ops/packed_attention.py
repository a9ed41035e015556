"""Packed-layout fused attention: operates directly on (B, L, H*D) tensors.

Second-generation kernel for this workload's regime (L <= ~1024, D = 64):

  * no (B,L,H,D)->(B,H,L,D) transposes — inputs are exactly the QKV
    projection outputs, the output feeds out_proj directly (the transposes
    cost ~10 ms/step of pure HBM traffic at the bench shape);
  * one grid cell per (batch, head-group, q-tile) with a static loop over
    the group's heads — an order of magnitude fewer kernel launches than a
    per-head grid;
  * the whole KV range lives in one VMEM block, so softmax is single-pass
    (no online correction) and the backward kernels recompute (m, l) instead
    of reading residuals — the forward stores only the output;
  * wide models / long pads split the H*D axis into head groups (block
    width a multiple of 128 lanes), bounding every kernel's scoped VMEM:
    one group covers the proven (<=768, <=768) regime, two 512-wide groups
    cover the 1024-wide Large family, two groups also cover padded KV 1024
    (whose single-group dKV scratch overflowed the 16M scoped-VMEM limit).

Same masking/dropout semantics as ``flash_attention`` (iota length mask,
counter-hash dropout regenerated in the backward; head ids in the dropout
hash are global, so grouping does not change the mask).  Falls back to the
tiled kernel for sequences too long to hold KV in VMEM or head counts that
cannot split into 128-lane-aligned groups.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import NEG_INF, _ceil_to, _dropout_keep_mask

LANES = 128
MAX_PACKED_KV = 1024  # beyond this, VMEM pressure favors the tiled kernel
# single-group regime proven on-chip in round 2; larger shapes take the
# grouped path below
_SINGLE_GROUP_KV = 768
_SINGLE_GROUP_WIDTH = 768
_GROUP_WIDTH_CAP = 512


def packed_num_groups(L: int, num_heads: int, head_dim: int) -> int:
    """Head-group count for a supported shape, or 0 if the packed kernels
    cannot run it (caller falls back to ``flash_attention``).

    One group when both the padded KV length and the packed width sit in
    the measured-safe single-group regime; otherwise the smallest head
    split whose group width is 128-lane aligned and <= 512 — that bounds
    the dKV kernel's scoped VMEM (2 fp32 accumulators of (Lkv, width))
    under the 16M v5e limit for every admitted shape.
    """
    HD = num_heads * head_dim
    block_q = min(256, _ceil_to(L, LANES))
    Lp = _ceil_to(L, block_q)
    if Lp > MAX_PACKED_KV:
        return 0
    if Lp <= _SINGLE_GROUP_KV and HD <= _SINGLE_GROUP_WIDTH:
        return 1
    for n_g in range(2, num_heads + 1):
        if num_heads % n_g:
            continue
        gw = (num_heads // n_g) * head_dim
        if gw % LANES == 0 and gw <= _GROUP_WIDTH_CAP:
            return n_g
    return 0


def _heads_loop_fwd(
    lengths_ref, seed_ref, q_ref, k_ref, v_ref, o_ref, *,
    scale, heads_per_group, head_dim, masked, dropout_rate,
):
    b = pl.program_id(0)
    g = pl.program_id(1)
    q_idx = pl.program_id(2)
    q_all = q_ref[0]  # (block_q, GW)
    k_all = k_ref[0]  # (Lp, GW)
    v_all = v_ref[0]
    block_q = q_all.shape[0]

    for h in range(heads_per_group):
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
                p.shape, 1.0 - dropout_rate, seed_ref[0], b,
                g * heads_per_group + h, q_idx * block_q, 0,
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
    scale, heads_per_group, head_dim, masked, dropout_rate,
):
    b = pl.program_id(0)
    g = pl.program_id(1)
    q_idx = pl.program_id(2)
    q_all = q_ref[0]
    k_all = k_ref[0]
    v_all = v_ref[0]
    do_all = do_ref[0]
    di_all = di_ref[0]  # (block_q, LANES): this group's heads
    block_q = q_all.shape[0]

    for h in range(heads_per_group):
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
                p.shape, 1.0 - dropout_rate, seed_ref[0], b,
                g * heads_per_group + h, q_idx * block_q, 0,
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
    scale, heads_per_group, head_dim, masked, dropout_rate, n_q,
):
    b = pl.program_id(0)
    g = pl.program_id(1)
    q_idx = pl.program_id(2)

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

    for h in range(heads_per_group):
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
                p.shape, 1.0 - dropout_rate, seed_ref[0], b,
                g * heads_per_group + h, q_idx * block_q, 0,
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
              interpret, dropout_rate, num_groups):
    B, Lq, HD = q.shape
    Lkv = k.shape[1]
    GW = HD // num_groups
    masked = lengths is not None
    if lengths is None:
        lengths = jnp.full((B,), Lkv, jnp.int32)
    grid = (B, num_groups, Lq // block_q)
    return pl.pallas_call(
        functools.partial(
            _heads_loop_fwd, scale=scale,
            heads_per_group=num_heads // num_groups,
            head_dim=head_dim, masked=masked, dropout_rate=dropout_rate,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, GW), lambda b, g, i, *_: (b, i, g)),
                pl.BlockSpec((1, Lkv, GW), lambda b, g, i, *_: (b, 0, g)),
                pl.BlockSpec((1, Lkv, GW), lambda b, g, i, *_: (b, 0, g)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, GW), lambda b, g, i, *_: (b, i, g)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Lq, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(lengths, seed, q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _packed(q, k, v, lengths, seed, scale, num_heads, head_dim, block_q,
            interpret, dropout_rate, num_groups):
    return _fwd_call(
        q, k, v, lengths, seed, scale, num_heads, head_dim, block_q,
        interpret, dropout_rate, num_groups,
    )


def _packed_fwd(q, k, v, lengths, seed, scale, num_heads, head_dim, block_q,
                interpret, dropout_rate, num_groups):
    out = _fwd_call(
        q, k, v, lengths, seed, scale, num_heads, head_dim, block_q,
        interpret, dropout_rate, num_groups,
    )
    return out, (q, k, v, lengths, seed, out)


def _packed_bwd(scale, num_heads, head_dim, block_q, interpret, dropout_rate,
                num_groups, res, do):
    q, k, v, lengths, seed, out = res
    B, Lq, HD = q.shape
    Lkv = k.shape[1]
    GW = HD // num_groups
    hpg = num_heads // num_groups
    n_q = Lq // block_q
    masked = lengths is not None
    if lengths is None:
        lengths = jnp.full((B,), Lkv, jnp.int32)
    # di[b, t, h] = sum_d out * dout over the head's slice, laid out per
    # head group along the lane axis: (B, Lq, num_groups*LANES) so each grid
    # cell reads its group's heads as one 128-lane-aligned block (no dynamic
    # lane slicing in-kernel, block dims stay (block_q, 128))
    di = jnp.sum(
        out.astype(jnp.float32).reshape(B, Lq, num_heads, head_dim)
        * do.astype(jnp.float32).reshape(B, Lq, num_heads, head_dim),
        axis=-1,
    )  # (B, Lq, H)
    di = di.reshape(B, Lq, num_groups, hpg)
    di = jnp.pad(di, ((0, 0), (0, 0), (0, 0), (0, LANES - hpg)))
    di = di.reshape(B, Lq, num_groups * LANES)

    common_specs = [
        pl.BlockSpec((1, block_q, GW), lambda b, g, i, *_: (b, i, g)),
        pl.BlockSpec((1, Lkv, GW), lambda b, g, i, *_: (b, 0, g)),
        pl.BlockSpec((1, Lkv, GW), lambda b, g, i, *_: (b, 0, g)),
        pl.BlockSpec((1, block_q, GW), lambda b, g, i, *_: (b, i, g)),
        pl.BlockSpec((1, block_q, LANES), lambda b, g, i, *_: (b, i, g)),
    ]
    kw = dict(
        scale=scale, heads_per_group=hpg, head_dim=head_dim, masked=masked,
        dropout_rate=dropout_rate,
    )
    dq = pl.pallas_call(
        functools.partial(_heads_loop_bwd_dq, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, num_groups, n_q),
            in_specs=common_specs,
            out_specs=pl.BlockSpec(
                (1, block_q, GW), lambda b, g, i, *_: (b, i, g)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Lq, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(lengths, seed, q, k, v, do, di)

    dk, dv = pl.pallas_call(
        functools.partial(_heads_loop_bwd_dkv, n_q=n_q, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, num_groups, n_q),
            in_specs=common_specs,
            out_specs=[
                pl.BlockSpec((1, Lkv, GW), lambda b, g, i, *_: (b, 0, g)),
                pl.BlockSpec((1, Lkv, GW), lambda b, g, i, *_: (b, 0, g)),
            ],
            scratch_shapes=[
                pltpu.VMEM((Lkv, GW), jnp.float32),
                pltpu.VMEM((Lkv, GW), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Lkv, HD), q.dtype),
            jax.ShapeDtypeStruct((B, Lkv, HD), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
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
    VMEM block (L <= MAX_PACKED_KV) and a head count that splits into
    128-lane-aligned groups (``packed_num_groups``); callers fall back to
    :func:`flash_attention` otherwise.
    """
    B, L, HD = q.shape
    head_dim = HD // num_heads
    num_groups = packed_num_groups(L, num_heads, head_dim)
    if num_groups == 0:
        raise ValueError(
            f"packed_attention unsupported for L={L}, num_heads={num_heads}, "
            f"head_dim={head_dim}; use flash_attention"
        )
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
        interpret, float(dropout_rate), num_groups,
    )
    if Lp != L:
        out = out[:, :L, :]
    return out

"""Pallas fused dropout + residual-add + LayerNorm epilogue.

The encoder block's two elementwise chains — ``LN(dropout(Wx) + res)``
after the attention output projection and after the FFN down projection
(reference substrate: apex FusedLayerNorm + torch dropout,
sc/pytorch_pretrained_bert/model.py:202-205,282-295) — are the one
elementwise structure XLA cannot jointly schedule across the gemm
boundary: the dropout mask generation, the add, and the two LN reduction
passes each re-touch the [B*L, H] activation in HBM.  This kernel does
one VMEM-resident pass per row block: regenerate the keep-mask with the
in-kernel TPU PRNG (no HBM random bits), add the residual, compute the
f32 row statistics, scale by gamma/beta, store once.

The backward recomputes the keep-mask and row statistics from (x, res,
seed) rather than saving anything: the op is memory-bound, so trading
~30% extra VPU flops for zero residual tensors is the right TPU deal.
Per-block partial dgamma/dbeta rows land in a [n_blocks, H] output and
are summed outside the kernel (grid-parallel-safe, no cross-block
accumulation ordering assumptions).

A/B status: see DESIGN.md §10.3 (measured against the XLA-fused chain at
the pretrain flagship config as VERDICT r4 item 5 prescribes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 256


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _keep_mask(seed, block_id, shape, rate):
    """Per-row-block dropout keep mask from the in-kernel PRNG (fwd and
    bwd must agree: identical seeding and shape)."""
    pltpu.prng_seed(seed + block_id)
    bits = pltpu.prng_random_bits(shape)
    thresh = np.uint32(rate * (2 ** 32 - 1))
    return pltpu.bitcast(bits, jnp.uint32) >= thresh


def _stats(s, eps):
    """f32 row mean/rstd over the lane (hidden) axis."""
    mean = jnp.mean(s, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(s - mean), axis=1, keepdims=True)
    return mean, jax.lax.rsqrt(var + eps)


def _fwd_kernel(seed_ref, x_ref, res_ref, g_ref, b_ref, y_ref, *,
                rate: float, eps: float):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0], i, x.shape, rate)
        x = jnp.where(keep, x * (1.0 / (1.0 - rate)), 0.0)
    s = x + res_ref[...].astype(jnp.float32)
    mean, rstd = _stats(s, eps)
    xhat = (s - mean) * rstd
    y = xhat * g_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, res_ref, g_ref, dy_ref, dx_ref, dres_ref,
                dg_ref, db_ref, *, rate: float, eps: float):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0], i, x.shape, rate)
        inv = 1.0 / (1.0 - rate)
        x = jnp.where(keep, x * inv, 0.0)
    s = x + res_ref[...].astype(jnp.float32)
    mean, rstd = _stats(s, eps)
    xhat = (s - mean) * rstd
    dy = dy_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    # LN backward (standard): ds = rstd * (dyg - mean(dyg) - xhat*mean(dyg*xhat))
    dyg = dy * g
    m1 = jnp.mean(dyg, axis=1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=1, keepdims=True)
    ds = rstd * (dyg - m1 - xhat * m2)
    dres_ref[...] = ds.astype(dres_ref.dtype)
    if rate > 0.0:
        ds_x = jnp.where(keep, ds * inv, 0.0)
    else:
        ds_x = ds
    dx_ref[...] = ds_x.astype(dx_ref.dtype)
    # per-block partial parameter grads, summed outside the kernel.  TPU
    # lowering requires output blocks with sublane dim divisible by 8, so
    # each block owns an (8, H) slab: partial in row 0, zeros elsewhere
    # (the outside sum stays exact under any reduction order).
    row = jax.lax.broadcasted_iota(jnp.int32, dg_ref.shape, 0)
    dg = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db = jnp.sum(dy, axis=0, keepdims=True)
    dg_ref[...] = jnp.where(row == 0, jnp.broadcast_to(dg, dg_ref.shape),
                            0.0)
    db_ref[...] = jnp.where(row == 0, jnp.broadcast_to(db, db_ref.shape),
                            0.0)


def _pad_rows(a, rp):
    r = a.shape[0]
    return a if r == rp else jnp.pad(a, ((0, rp - r), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _core(x, res, gamma, beta, seed, rate, eps):
    y, _ = _core_fwd(x, res, gamma, beta, seed, rate, eps)
    return y


def _specs(rp, h):
    # index maps take (grid ids, *scalar-prefetch refs) — hence the *_
    row = pl.BlockSpec((TILE_R, h), lambda i, *_: (i, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, h), lambda i, *_: (0, 0),
                       memory_space=pltpu.VMEM)
    return row, vec, rp // TILE_R


def _core_fwd(x, res, gamma, beta, seed, rate, eps):
    r, h = x.shape
    rp = ((r + TILE_R - 1) // TILE_R) * TILE_R
    xp, rp_arr = _pad_rows(x, rp), _pad_rows(res, rp)
    row, vec, n_blocks = _specs(rp, h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n_blocks,),
        in_specs=[row, row, vec, vec], out_specs=row)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, eps=eps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rp, h), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * rp * h, transcendentals=rp,
            bytes_accessed=3 * rp * h * x.dtype.itemsize),
        interpret=_interpret(),
    )(seed.reshape(1), xp, rp_arr, gamma.reshape(1, h),
      beta.reshape(1, h))
    return y[:r], (x, res, gamma, seed)


def _core_bwd(rate, eps, saved, dy):
    x, res, gamma, seed = saved
    r, h = x.shape
    rp = ((r + TILE_R - 1) // TILE_R) * TILE_R
    # padded dy rows are zero, so they contribute nothing to dgamma/dbeta
    xp, resp, dyp = _pad_rows(x, rp), _pad_rows(res, rp), _pad_rows(dy, rp)
    row, vec, n_blocks = _specs(rp, h)
    # (8, h) slab per block — TPU tiling needs sublane dim % 8 == 0; the
    # kernel writes the partial into slab row 0 only
    part = pl.BlockSpec((8, h), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n_blocks,),
        in_specs=[row, row, vec, row],
        out_specs=[row, row, part, part])
    dx, dres, dg_p, db_p = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, eps=eps),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rp, h), x.dtype),
                   jax.ShapeDtypeStruct((rp, h), res.dtype),
                   jax.ShapeDtypeStruct((8 * n_blocks, h), jnp.float32),
                   jax.ShapeDtypeStruct((8 * n_blocks, h), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=16 * rp * h, transcendentals=rp,
            bytes_accessed=5 * rp * h * x.dtype.itemsize),
        interpret=_interpret(),
    )(seed.reshape(1), xp, resp, gamma.reshape(1, h), dyp)
    dgamma = jnp.sum(dg_p, axis=0).astype(gamma.dtype)
    dbeta = jnp.sum(db_p, axis=0).astype(gamma.dtype)
    return dx[:r], dres[:r], dgamma, dbeta, None


_core.defvjp(_core_fwd, _core_bwd)


def fused_dropout_add_ln(x: jnp.ndarray, res: jnp.ndarray,
                         gamma: jnp.ndarray, beta: jnp.ndarray, *,
                         rate: float, eps: float,
                         seed: jnp.ndarray) -> jnp.ndarray:
    """``LayerNorm(dropout(x) + res) * gamma + beta`` in one fused pass.

    x, res: [..., H] (leading dims flattened internally); gamma/beta: [H];
    seed: int32 scalar array (ignored when rate == 0).  Differentiable in
    x, res, gamma, beta.  Output dtype follows x.
    """
    shape = x.shape
    h = shape[-1]
    x2 = x.reshape(-1, h)
    res2 = res.reshape(-1, h)
    seed = jnp.asarray(seed, jnp.int32)
    if float(rate) > 0.0 and _interpret():
        # CPU interpret mode stubs the TPU PRNG (same situation as
        # flash_attention.py): use the XLA composition with a host-RNG
        # keep mask derived from the same seed — same math, jax autodiff
        f32 = jnp.float32
        keep = jax.random.bernoulli(jax.random.PRNGKey(seed),
                                    1.0 - rate, x2.shape)
        xd = jnp.where(keep, x2.astype(f32) / (1.0 - rate), 0.0)
        s = xd + res2.astype(f32)
        mean = s.mean(-1, keepdims=True)
        var = ((s - mean) ** 2).mean(-1, keepdims=True)
        y = ((s - mean) * jax.lax.rsqrt(var + eps)
             * gamma.astype(f32) + beta.astype(f32)).astype(x.dtype)
        return y.reshape(shape)
    y = _core(x2, res2, gamma, beta, seed, float(rate), float(eps))
    return y.reshape(shape)

"""On-TPU parity + timing of the Pallas attention kernel vs the XLA path at
the real config point (H=12, D=64, L=436).  Interpret-mode tests cover
semantics; this validates the Mosaic lowering on hardware and measures the
kernel's step share.

Usage: python tools/tpu_attention_check.py [B] [iters]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from medvill_tpu.core.config import MaskVariant
from medvill_tpu.data.masks import MaskGeometry, bias_from_spec
from medvill_tpu.ops.attention import mha_reference
from medvill_tpu.ops.flash_attention import FAMILY_PRETRAIN, flash_mha

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
GEOM = MaskGeometry(num_image_embeds=180, seq_len=253)
L, H, D = GEOM.total_len, 12, 64

rng = np.random.default_rng(0)
q, k, v = (jnp.asarray(rng.standard_normal((B, L, H, D)).astype(np.float32)
                       ).astype(jnp.bfloat16) for _ in range(3))
variants = [int(MaskVariant.BAR), int(MaskVariant.S2S),
            int(MaskVariant.FULL), int(MaskVariant.NONCROSS)]
spec = jnp.asarray(np.array(
    [[variants[i % 4], 100 + (i % 150)] for i in range(B)], np.int32))

flash = jax.jit(lambda q, k, v: flash_mha(
    q, k, v, spec, img_block=GEOM.img_block, l_real=L,
    family=FAMILY_PRETRAIN))
bias = bias_from_spec(spec, GEOM)
ref = jax.jit(lambda q, k, v: mha_reference(q, k, v, bias))

a = flash(q, k, v)
b = ref(q, k, v)
diff = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
print(f"max |flash - xla| = {diff:.6f} (bf16 inputs)")
assert diff < 0.05, diff


def timeit(fn, name):
    out = fn(q, k, v)
    _ = float(out.astype(jnp.float32)[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(q, k, v)
    _ = float(out.astype(jnp.float32)[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.2f} ms/iter (B={B})")
    return dt


# fwd-only
t_flash = timeit(flash, "flash fwd")
t_ref = timeit(ref, "xla   fwd")


# fwd+bwd
def grad_wrap(f):
    g = jax.jit(jax.grad(lambda q, k, v: (f(q, k, v).astype(
        jnp.float32) ** 2).sum(), argnums=(0, 1, 2)))
    return lambda q, k, v: g(q, k, v)[0]


flash_g = grad_wrap(lambda q, k, v: flash_mha(
    q, k, v, spec, img_block=GEOM.img_block, l_real=L,
    family=FAMILY_PRETRAIN))
ref_g = grad_wrap(lambda q, k, v: mha_reference(q, k, v, bias))
ga = flash_g(q, k, v)
gb = ref_g(q, k, v)
gdiff = float(jnp.max(jnp.abs(ga.astype(jnp.float32) -
                              gb.astype(jnp.float32))))
print(f"max |dq_flash - dq_xla| = {gdiff:.4f}")
t_flash_b = timeit(flash_g, "flash fwd+bwd(dq)")
t_ref_b = timeit(ref_g, "xla   fwd+bwd(dq)")
print(f"speedup: fwd {t_ref/t_flash:.2f}x, fwd+bwd {t_ref_b/t_flash_b:.2f}x")

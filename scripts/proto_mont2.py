"""Comba (column-scanning) Montgomery kernels: minimize live vregs.

The unrolled operand-scanning kernel keeps ~70 live (1024,)-vregs (2n cols
+ a + b) and measures ~28 Gop/s vs the ~190 Gop/s VPU roofline — spills.
Comba keeps 2-3 column accumulators live. Variants:

  comba16 — 16-bit limbs, hi/lo split per product (5 ops/product)
  comba13 — 13-bit limbs, full-product accumulation (2 ops/product),
            in-kernel 16<->13 limb conversion
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosnarks_tpu.ff import pallas_mont as pm
from cosnarks_tpu.ff.spec import BN254_FQ as F

n = F.nlimbs
MASK16 = np.uint32(0xFFFF)


def timeit(fn, *args, iters=20):
    r = fn(*args)
    r = jax.tree.map(lambda x: np.asarray(x), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.tree.map(lambda x: np.asarray(jax.device_get(x)), r)
    return (time.perf_counter() - t0) / iters


# ---------------- comba16 ------------------------------------------------
def comba16_lanes(a, b):
    """Product-scanning Montgomery: one output column at a time.

    Phase 1 (cols 0..n-1): col s gets products a_i b_j (i+j=s) plus
    m_t p_j (t+j=s, t<s); m_s = col_s * n0inv mod 2^16 closes the column.
    Phase 2 (cols n..2n-1): remaining a/b and m/p products.
    Live state: a(n) + b(n) + m(n, grows) + acc(2) vregs.
    """
    p_limbs = [np.uint32(x) for x in F.p_limbs]
    n0inv = np.uint32(F.n0inv)
    zero = jnp.zeros_like(a[0])
    acc_lo = zero  # running column value (up to ~2^21)
    acc_hi = zero  # carry column (next)
    ms = []
    out = []
    for s in range(2 * n):
        lo = acc_lo
        hi = acc_hi
        i0 = max(0, s - n + 1)
        for i in range(i0, min(s + 1, n)):
            prod = a[i] * b[s - i]
            lo = lo + (prod & MASK16)
            hi = hi + (prod >> 16)
        for t in range(max(0, s - n + 1), min(s, n)):
            prod = ms[t] * p_limbs[s - t]
            lo = lo + (prod & MASK16)
            hi = hi + (prod >> 16)
        if s < n:
            m = (lo * n0inv) & MASK16
            ms.append(m)
            prod = m * p_limbs[0]
            lo = lo + (prod & MASK16)
            hi = hi + (prod >> 16)
            # column s is now 0 mod 2^16; propagate its carry
            acc_lo = hi + (lo >> 16)
            acc_hi = zero
        else:
            out.append(lo & MASK16)
            acc_lo = hi + (lo >> 16)
            acc_hi = zero
    # final carry is zero: T = ab + mp < 2pR and 2p < 2^(16n)
    return pm.cond_sub_p_lanes(F, out)


def comba16_kernel(a_ref, b_ref, o_ref):
    at = a_ref[:].T
    bt = b_ref[:].T
    res = comba16_lanes([at[i] for i in range(n)], [bt[j] for j in range(n)])
    o_ref[:] = jnp.stack(res, axis=0).T


def make(kernel, total, tile):
    spec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(total // tile,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((total, n), jnp.uint32),
    )


def main():
    total = 1 << 20
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 1 << 16, size=(total, n)).astype(np.uint32)
    xs[:, -1] &= 0x3FFF
    ys = rng.integers(0, 1 << 16, size=(total, n)).astype(np.uint32)
    ys[:, -1] &= 0x3FFF
    a = jnp.asarray(xs)
    b = jnp.asarray(ys)
    ref = np.asarray(pm.mul(F, a, b))

    for tile in (1024, 2048):
        try:
            call = make(comba16_kernel, total, tile)
            f = jax.jit(lambda a, b, c=call: c(a, b))
            t0 = time.perf_counter()
            out = np.asarray(f(a, b))
            comp = time.perf_counter() - t0
            ok = np.array_equal(out, ref)
            dt = timeit(f, a, b)
            print(f"comba16 tile={tile}: {total/dt/1e6:.1f} Mmul/s "
                  f"(compile {comp:.1f}s, correct={ok})", flush=True)
        except Exception as e:
            print(f"comba16 tile={tile} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()

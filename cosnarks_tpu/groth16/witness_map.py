"""R1CS -> QAP witness map, snarkjs "CircomReduction" convention.

Re-derivation of the reference's witness_map_from_matrices
(co-groth16/src/groth16/reduction.rs:45-175): h is the evaluation of (AB-C)
on the *odd* 2N-domain coset — ifft, multiply by powers of the 2N-th root,
fft — with C never materialized from the C matrix (C = A.B pointwise on the
domain for a satisfied system; the zkey only carries A and B coeffs).

All heavy steps are batched limb kernels: sparse matvec = gather + one
field mul + segment_sum + lazy reduction; transforms = radix-2 NTT stages.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import mont
from ..ff.spec import Field
from ..poly import ntt


def sparse_matvec(field: Field, rows, cols, vals, w, out_size: int):
    """A @ w for a COO matrix (rows/cols uint32, vals Montgomery limbs) and a
    dense vector w (n, nlimbs). Returns (out_size, nlimbs).

    Limb-lazy accumulation: products are summed limb-wise in uint32 and
    reduced once (requires < 2^16 entries per row).
    """
    prods = mont.mul(field, jnp.take(w, cols, axis=0), vals)
    acc = jax.ops.segment_sum(prods, rows, num_segments=out_size)
    return mont.reduce_columns(field, acc)


def witness_map(driver, zkey, w_shares):
    """Shared witness vector (driver share form, (n_vars,)) -> additive
    half-shares of H evaluations ((domain_size,)).

    Follows reduction.rs order exactly, including consuming correlated
    randomness for the two local_mul_vec calls in a fixed order so all
    parties stay in sync.
    """
    field: Field = zkey.fr
    n = zkey.domain_size
    dom = ntt.groth16_domain(field, n)
    root = ntt.groth16_shift_root(field, dom)

    rows = jnp.asarray(zkey.coeff_row)
    cols = jnp.asarray(zkey.coeff_col)
    # zkey coeff values are double-Montgomery; one reduction -> internal form
    vals = mont.from_mont(field, jnp.asarray(zkey.coeff_val))
    amask = zkey.coeff_matrix == 0

    a = driver.matvec(
        field, rows[amask], cols[amask], vals[amask], w_shares, n
    )
    b = driver.matvec(
        field, rows[~amask], cols[~amask], vals[~amask], w_shares, n
    )

    # c = a*b on the original domain (additive half-shares from here on)
    c_half = driver.local_mul_vec(field, a, b)

    def shift_transform(x):
        return dom.fft(dom.distribute_powers(dom.ifft(x), root))

    a = driver.map_share(shift_transform, a)
    b = driver.map_share(shift_transform, b)
    c_half = shift_transform(c_half)

    ab_half = driver.local_mul_vec(field, a, b)
    return mont.sub(field, ab_half, c_half)

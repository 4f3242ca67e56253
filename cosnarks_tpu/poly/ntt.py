"""Radix-2 NTT (FFT over prime fields) with snarkjs-compatible domains.

TPU-native replacement for arkworks Radix2EvaluationDomain as used by the
reference witness map (co-groth16/src/groth16/reduction.rs: ifft ->
distribute_powers -> fft). Domains use the snarkjs/ffjavascript root-of-unity
chain (reference root_of_unity_for_groth16, co-groth16/src/groth16.rs:88-108)
so artifacts stay bit-compatible with snarkjs zkeys.

Layout: polynomials are (..., N, nlimbs) Montgomery limb arrays; the
transform runs log2(N) vectorized butterfly stages (one batched field mul +
add/sub per stage), which keeps graphs tiny and the VPU saturated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import mont
from ..ff.spec import Field


def _host_mont_limbs(field: Field, values: list[int]) -> np.ndarray:
    """Host-side Montgomery limb encoding (numpy, safe to cache anywhere)."""
    from ..ff.bigint import ints_to_limbs

    return ints_to_limbs([field.to_mont_int(v % field.p) for v in values],
                         field.nlimbs)


@functools.lru_cache(maxsize=None)
def _bit_reverse_perm(k: int) -> np.ndarray:
    n = 1 << k
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


class Domain:
    """Size-2^k multiplicative subgroup domain with fixed generator."""

    def __init__(self, field: Field, size: int, group_gen: int):
        if size & (size - 1):
            raise ValueError("domain size must be a power of two")
        self.field = field
        self.size = size
        self.k = size.bit_length() - 1
        self.group_gen = group_gen
        self.group_gen_inv = pow(group_gen, -1, field.p)
        self.size_inv = pow(size, -1, field.p)
        self._twiddles = {}
        self._powers = {}

    def _stage_twiddles(self, inverse: bool):
        """Per-stage twiddle tables (list of (half, nlimbs) mont arrays)."""
        key = bool(inverse)
        if key not in self._twiddles:
            p = self.field.p
            root = self.group_gen_inv if inverse else self.group_gen
            tables = []
            for s in range(1, self.k + 1):
                m = 1 << s
                half = m >> 1
                w = pow(root, self.size // m, p)
                pw = 1
                powers = []
                for _ in range(half):
                    powers.append(pw)
                    pw = pw * w % p
                # cache HOST limbs: device arrays created inside a jit trace
                # would poison the cache with tracers (JAX >= 0.9)
                tables.append(_host_mont_limbs(self.field, powers))
            self._twiddles[key] = tables
        return [jnp.asarray(t) for t in self._twiddles[key]]

    def fft(self, x):
        """Coefficients -> evaluations on the domain (axis -2 of size N)."""
        return _fft(self, x, False)

    def ifft(self, x):
        """Evaluations -> coefficients (includes the 1/N scaling)."""
        return _fft(self, x, True)

    def distribute_powers(self, x, g: int):
        """x_i *= g^i along axis -2 (the reference's coset/odd-domain shift,
        reduction.rs distribute_powers_and_mul_by_const)."""
        if g not in self._powers:
            p = self.field.p
            powers = []
            pw = 1
            for _ in range(self.size):
                powers.append(pw)
                pw = pw * g % p
            self._powers[g] = _host_mont_limbs(self.field, powers)
        return mont.mul(self.field, x, jnp.asarray(self._powers[g]))

    def elements(self):
        """Host list of domain elements [1, g, g^2, ...]."""
        p = self.field.p
        out = [1]
        for _ in range(self.size - 1):
            out.append(out[-1] * self.group_gen % p)
        return out

    def __hash__(self):
        return hash((self.field, self.size, self.group_gen))

    def __eq__(self, o):
        return (
            isinstance(o, Domain)
            and (o.field, o.size, o.group_gen)
            == (self.field, self.size, self.group_gen)
        )


def _fft(domain: Domain, x, inverse: bool):
    # Materialize twiddle tables OUTSIDE the trace: caching arrays created
    # inside a jit trace stores tracers (JAX >= 0.9 constant handling) and
    # poisons later retraces.
    domain._stage_twiddles(inverse)
    return _fft_jit(domain, x, inverse)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _fft_jit(domain: Domain, x, inverse: bool):
    field = domain.field
    n = domain.size
    if x.shape[-2] != n:
        raise ValueError(f"expected axis -2 of size {n}, got {x.shape}")
    perm = jnp.asarray(_bit_reverse_perm(domain.k))
    x = jnp.take(x, perm, axis=-2)
    tables = domain._stage_twiddles(inverse)
    lead = x.shape[:-2]
    for s in range(1, domain.k + 1):
        m = 1 << s
        half = m >> 1
        w = tables[s - 1]  # (half, nlimbs)
        y = x.reshape(lead + (n // m, m, field.nlimbs))
        even = y[..., :half, :]
        odd = y[..., half:, :]
        t = mont.mul(field, odd, w)
        y = jnp.concatenate(
            [mont.add(field, even, t), mont.sub(field, even, t)], axis=-2
        )
        x = y.reshape(lead + (n, field.nlimbs))
    if inverse:
        x = mont.mul(field, x, mont.constant(field, domain.size_inv))
    return x


@functools.lru_cache(maxsize=None)
def groth16_domain(field: Field, size: int) -> Domain:
    """Domain with the snarkjs generator convention (reference
    root_of_unity_for_groth16): group_gen = roots[log2(size)]."""
    k = (size - 1).bit_length() if size > 1 else 0
    n = 1 << k
    roots = field.groth16_roots()
    return Domain(field, n, roots[k])


def groth16_shift_root(field: Field, domain: Domain) -> int:
    """The 2N-th root used for the odd-coset shift: roots[k+1], or qnr^2 when
    the domain saturates the 2-adicity (groth16.rs:103-108)."""
    roots = field.groth16_roots()
    if domain.k == field.two_adicity:
        return pow(field.smallest_qnr(), 2, field.p)
    return roots[domain.k + 1]

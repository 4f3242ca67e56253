"""Correlated randomness for Rep3 — counter-based PRF streams.

Replaces the reference's Rep3CorrelatedRng / Rep3Rand (PRF-key pairs set up
in one network round, mpc-core/src/protocols/rep3.rs:71-110, rngs.rs:16-60).
Party i holds keys (k_i, k_{i+1}); any value derived from k_j is computable
by both parties that know k_j, so replicated random shares and zero shares
need no communication. `fork` is counter subspacing (deterministic on all
parties), which removes the reference's sequential-RNG bottleneck and lets
every draw be generated on-device in parallel.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import mont
from ..ff.spec import Field


def _draw_limbs(key, counter: int, field: Field, shape) -> jax.Array:
    """Uniform field element(s) in the internal (Montgomery) domain: draw
    2n 16-bit limbs (twice the modulus size) and reduce mod p — bias 2^-256.
    """
    k = jax.random.fold_in(key, counter)
    n = field.nlimbs
    bits = jax.random.bits(k, tuple(shape) + (2 * n,), dtype=jnp.uint32)
    cols = bits & np.uint32(0xFFFF)
    return mont.reduce_columns(field, cols)


class PartyRng:
    """One party's correlated PRF state: my key stream + next party's."""

    def __init__(self, key_mine, key_next, counter: int = 0):
        self.key_mine = key_mine
        self.key_next = key_next
        self._counter = counter

    @classmethod
    def setup(cls, net, seed: bytes | None = None):
        """One round: generate my key, send to prev party, recv next party's
        (so party i ends with (k_i, k_{i+1}))."""
        if seed is None:
            seed = os.urandom(8)
        my_key = jax.random.key(
            int.from_bytes(seed, "little") & ((1 << 63) - 1)
        )
        key_next = net.reshare_backward(jax.random.key_data(my_key))
        return cls(my_key, jax.random.wrap_key_data(jnp.asarray(key_next)))

    def _next_counter(self) -> int:
        c = self._counter
        self._counter += 1
        return c

    def rand_share(self, field: Field, shape=()):
        """Replicated share (r_i, r_{i+1}) of an unknown uniform value."""
        c = self._next_counter()
        return (
            _draw_limbs(self.key_mine, c, field, shape),
            _draw_limbs(self.key_next, c, field, shape),
        )

    def zero_additive(self, field: Field, shape=()):
        """Additive share of zero: r_i - r_{i+1} (sums to 0 over parties)."""
        a, b = self.rand_share(field, shape)
        return mont.sub(field, a, b)

    def fork(self, idx: int = 0) -> "PartyRng":
        """Deterministic independent substream (same on all parties)."""
        return PartyRng(
            jax.random.fold_in(self.key_mine, 0x5EED + idx),
            jax.random.fold_in(self.key_next, 0x5EED + idx),
        )

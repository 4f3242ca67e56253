"""PLONK MPC drivers: vectorized protocol ops the 5-round prover is generic
over — mirror of the reference's `CircomPlonkProver` trait
(co-plonk/src/mpc.rs:16-164) with plain / Rep3 / Shamir implementations
(co-plonk/src/mpc/{plain,rep3,shamir}.rs).

Share vectors are device Montgomery limb arrays: plain/Shamir = (k, nlimbs),
Rep3 = Share(a, b) pairs. All ops are whole-vector (one network round per
`mul`/`open` call regardless of k) — the local-phase/reshare-phase split
that makes MPC rounds coarse enough to amortize the TPU dispatch boundary.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ec import curve as ec
from ..ec import msm as msm_mod
from ..ff import mont
from ..ff.spec import Field
from ..mpc import rep3, shamir


class PlainPlonkDriver:
    """Single-party oracle (reference mpc/plain.rs)."""

    id = 0

    def __init__(self, field: Field, seed: int = 0):
        from ..mpc import chacha

        self.field = field
        self._key = jnp.asarray(
            chacha.key_to_words(seed.to_bytes(32, "little"))
        )
        self._ctr = 0

    def promote(self, pub):
        return pub

    def add(self, x, y):
        return mont.add(self.field, x, y)

    def sub(self, x, y):
        return mont.sub(self.field, x, y)

    def neg(self, x):
        return mont.neg(self.field, x)

    def add_public(self, x, pub):
        return mont.add(self.field, x, pub)

    def mul_public(self, x, pub):
        return mont.mul(self.field, x, pub)

    def mul(self, x, y):
        return mont.mul(self.field, x, y)

    def mul_open(self, x, y):
        return mont.mul(self.field, x, y)

    def open(self, x):
        return x

    def inv(self, x):
        return mont.inv(self.field, x)

    def rand(self, k: int):
        from ..mpc.rng import LABEL_FIELD, draw_field

        self._ctr += 1
        return draw_field(self._key, LABEL_FIELD, self._ctr, self.field, (k,))

    def map_components(self, fn, x):
        """Apply a linear device fn to every share component."""
        return fn(x)

    def commit_many(self, spec, points_mont, coeff_shares):
        """MSM commitments [sum c_i * P_i] for several (points, coeffs)
        pairs; one open round. Returns host affine points."""
        outs = []
        for pts_m, coeffs in zip(points_mont, coeff_shares):
            pts = _encode_g1(spec, pts_m[: coeffs.shape[0]])
            std = mont.from_mont(spec.scalar_field, coeffs)
            outs.append(msm_mod.msm(spec, pts, std))
        return [ec.decode_points(spec, tuple(x[None] for x in o))[0]
                for o in outs]

    def open_many(self, x):
        return x


def _encode_g1(spec, pts_mont: np.ndarray):
    """zkey (N, 2, nl) Montgomery affine -> device Jacobian tuple with
    Z in {0,1} (all-zero rows are infinity, snarkjs convention)."""
    x = jnp.asarray(pts_mont[:, 0])
    y = jnp.asarray(pts_mont[:, 1])
    inf = jnp.all(pts_mont.reshape(pts_mont.shape[0], -1) == 0, axis=1)
    fq = spec.ops.field
    one = mont.broadcast_one(fq, (pts_mont.shape[0],))
    z = jnp.where(inf[:, None], jnp.zeros_like(one), one)
    return (x, y, z)


class Rep3PlonkDriver:
    """3-party replicated driver (reference mpc/rep3.rs)."""

    def __init__(self, field: Field, net, state: rep3.Rep3State):
        self.field = field
        self.net = net
        self.state = state
        self.id = net.id

    def fork_channels(self, n: int) -> list["Rep3PlonkDriver"]:
        """n drivers over independent network channels + forked rng
        substreams, for concurrent protocol rounds (reference forks state
        per net in co-plonk's joined rounds, round1.rs:19). All parties
        must fork identically (same count, same order)."""
        return [Rep3PlonkDriver(self.field, ch, self.state.fork())
                for ch in self.net.channels(n)]

    def promote(self, pub):
        return rep3.promote_public(self.field, pub, self.id)

    def add(self, x, y):
        return rep3.add(self.field, x, y)

    def sub(self, x, y):
        return rep3.sub(self.field, x, y)

    def neg(self, x):
        return rep3.neg(self.field, x)

    def add_public(self, x, pub):
        return rep3.add_public(self.field, x, pub, self.id)

    def mul_public(self, x, pub):
        return rep3.mul_public(self.field, x, pub)

    def mul(self, x, y):
        return rep3.mul(self.field, x, y, self.net, self.state)

    def mul_open(self, x, y):
        local = rep3.local_mul(self.field, x, y, self.state)
        return rep3.open_additive(self.field, local, self.net, self.state)

    def open(self, x):
        return rep3.open(self.field, x, self.net)

    def inv(self, x):
        return rep3.inv(self.field, x, self.net, self.state)

    def rand(self, k: int):
        return rep3.rand(self.field, self.state, (k,))

    def map_components(self, fn, x: rep3.Share):
        return rep3.Share(fn(x.a), fn(x.b))

    def commit_many(self, spec, points_mont, coeff_shares):
        halves = []
        for pts_m, coeffs in zip(points_mont, coeff_shares):
            pts = _encode_g1(spec, pts_m[: coeffs.a.shape[0]])
            std = mont.from_mont(spec.scalar_field, coeffs.a)
            halves.append(msm_mod.msm(spec, pts, std))
        # one broadcast opens all commitments (stacked)
        stacked = tuple(
            jnp.stack([h[i] for h in halves]) for i in range(3)
        )
        opened = rep3.point_open_additive(spec, stacked, self.net, self.state)
        return ec.decode_points(spec, opened)

    def open_many(self, x):
        return rep3.open(self.field, x, self.net)


class ShamirPlonkDriver:
    """n-party Shamir driver (reference mpc/shamir.rs). Degree-t shares;
    mul = local mul to 2t + king degree-reduce."""

    def __init__(self, field: Field, net, state: shamir.ShamirState):
        self.field = field
        self.net = net
        self.state = state
        self.id = net.id

    def fork_channels(self, n: int) -> list["ShamirPlonkDriver"]:
        """See Rep3PlonkDriver.fork_channels."""
        return [ShamirPlonkDriver(self.field, ch, self.state.fork())
                for ch in self.net.channels(n)]

    def promote(self, pub):
        return pub  # constant poly share

    def add(self, x, y):
        return mont.add(self.field, x, y)

    def sub(self, x, y):
        return mont.sub(self.field, x, y)

    def neg(self, x):
        return mont.neg(self.field, x)

    def add_public(self, x, pub):
        return mont.add(self.field, x, pub)

    def mul_public(self, x, pub):
        return mont.mul(self.field, x, pub)

    def mul(self, x, y):
        return shamir.mul(self.field, x, y, self.net, self.state)

    def mul_open(self, x, y):
        local = shamir.local_mul(self.field, x, y)  # degree-2t
        return shamir.open(self.field, local, self.net, self.state,
                           degree=2 * self.state.t)

    def open(self, x):
        return shamir.open(self.field, x, self.net, self.state)

    def inv(self, x):
        k = x.shape[0]
        r = shamir.rand(self.field, self.state, (k,), net=self.net)
        rx = self.mul_open(r, x)
        return mont.mul(self.field, r, mont.inv(self.field, rx))

    def rand(self, k: int):
        return shamir.rand(self.field, self.state, (k,), net=self.net)

    def map_components(self, fn, x):
        return fn(x)

    def commit_many(self, spec, points_mont, coeff_shares):
        opened = []
        for pts_m, coeffs in zip(points_mont, coeff_shares):
            pts = _encode_g1(spec, pts_m[: coeffs.shape[0]])
            std = mont.from_mont(spec.scalar_field, coeffs)
            half = msm_mod.msm(spec, pts, std)  # degree-t point share
            opened.append(
                shamir.open_point(spec, half, self.net, self.state)
            )
        return [ec.decode_points(spec, tuple(x[None] for x in o))[0]
                for o in opened]

    def open_many(self, x):
        return shamir.open(self.field, x, self.net, self.state)

"""Groth16 MPC drivers: the per-protocol ops the prover is generic over.

Mirror of the reference's `CircomGroth16Prover` trait
(co-groth16/src/mpc.rs:21-131) with plain and Rep3 implementations
(mpc/plain.rs, mpc/rep3.rs). "Half shares" are additive shares — after the
witness map everything runs on plain per-party arrays + group sums, so the
heavy kernels (MSM, NTT, scalar-mul) are identical across drivers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ec import curve as ec
from ..ec import msm as msm_mod
from ..ff import mont
from ..ff.spec import Field
from ..mpc import rep3
from . import witness_map as wm


class PlainDriver:
    """Single-party driver (the reference's plain oracle, mpc/plain.rs)."""

    id = 0

    def __init__(self, seed: int = 0):
        from ..mpc import chacha

        self._key = jnp.asarray(
            chacha.key_to_words(seed.to_bytes(32, "little"))
        )
        self._ctr = 0

    # share plumbing
    def full_witness(self, field, public_ints, private):
        pub = mont.encode(field, public_ints)
        return jnp.concatenate([pub, private], axis=0)

    def matvec(self, field, rows, cols, vals, w, out):
        return wm.sparse_matvec(field, rows, cols, vals, w, out)

    def map_share(self, fn, x):
        return fn(x)

    def local_mul_vec(self, field, a, b):
        return mont.mul(field, a, b)

    def rand(self, field):
        from ..mpc.rng import LABEL_FIELD, draw_field

        self._ctr += 1
        return draw_field(self._key, LABEL_FIELD, self._ctr, field, ())

    def local_mul_scalar(self, field, r, s):
        return mont.mul(field, r, s)

    def to_half(self, x):
        return x

    def rand_to_half(self, r):
        return r

    # points
    def open_half_point(self, spec, pt):
        return pt

    def scalar_mul_half_point(self, spec, pt_half, r):
        """[r] * additive-shared point, r a `rand` share. 1 round for rep3."""
        return ec.scalar_mul(
            spec, pt_half, mont.from_mont(spec.scalar_field, r)
        )

    def add_public_point(self, spec, pt, public_pt):
        """Add a public point (only party 0 contributes to additive sums)."""
        return ec.add(spec, pt, public_pt)


class Rep3Driver:
    """3-party replicated driver (mpc/rep3.rs)."""

    def __init__(self, net, state: rep3.Rep3State):
        self.net = net
        self.state = state
        self.id = net.id

    def full_witness(self, field, public_ints, private: rep3.Share):
        pub = mont.encode(field, public_ints)
        pub_share = rep3.promote_public(field, pub, self.id)
        return rep3.Share(
            jnp.concatenate([pub_share.a, private.a], axis=0),
            jnp.concatenate([pub_share.b, private.b], axis=0),
        )

    def matvec(self, field, rows, cols, vals, w: rep3.Share, out):
        return rep3.Share(
            wm.sparse_matvec(field, rows, cols, vals, w.a, out),
            wm.sparse_matvec(field, rows, cols, vals, w.b, out),
        )

    def map_share(self, fn, x: rep3.Share):
        res = fn(jnp.stack([x.a, x.b]))
        return rep3.Share(res[0], res[1])

    def local_mul_vec(self, field, a: rep3.Share, b: rep3.Share):
        return rep3.local_mul(field, a, b, self.state)

    def rand(self, field):
        return rep3.rand(field, self.state)

    def local_mul_scalar(self, field, r: rep3.Share, s: rep3.Share):
        return rep3.local_mul(field, r, s, self.state)

    def to_half(self, x: rep3.Share):
        return x.a

    def rand_to_half(self, r: rep3.Share):
        return r.a

    def open_half_point(self, spec, pt):
        return rep3.point_open_additive(spec, pt, self.net, self.state)

    def scalar_mul_half_point(self, spec, pt_half, r: rep3.Share):
        repl = rep3.point_reshare(spec, pt_half, self.net, self.state)
        return rep3.point_scalar_mul_local(spec, repl, r, self.state)

    def add_public_point(self, spec, pt, public_pt):
        if self.id == 0:
            return ec.add(spec, pt, public_pt)
        return pt


class ShamirDriver:
    """n-party Shamir driver (mpc/shamir.rs): shares are single arrays; a
    degree-t share is a valid degree-2t "half share", and half-point opens
    interpolate 2t+1 contributions in the exponent."""

    def __init__(self, net, state):
        from ..mpc import shamir

        self.net = net
        self.state = state
        self.id = net.id
        self._sh = shamir

    def full_witness(self, field, public_ints, private):
        pub = mont.encode(field, public_ints)  # constant-poly shares
        return jnp.concatenate([pub, private], axis=0)

    def matvec(self, field, rows, cols, vals, w, out):
        return wm.sparse_matvec(field, rows, cols, vals, w, out)

    def map_share(self, fn, x):
        return fn(x)

    def local_mul_vec(self, field, a, b):
        return mont.mul(field, a, b)  # degree-2t half shares

    def rand(self, field):
        return self._sh.rand(field, self.state, net=self.net)

    def local_mul_scalar(self, field, r, s):
        return mont.mul(field, r, s)

    def to_half(self, x):
        return x

    def rand_to_half(self, r):
        return r

    def open_half_point(self, spec, pt):
        return self._sh.open_point(
            spec, pt, self.net, self.state, degree=2 * self.state.t
        )

    def scalar_mul_half_point(self, spec, pt_half, r):
        reduced = self._sh.degree_reduce_point(
            spec, pt_half, self.net, self.state
        )
        return ec.scalar_mul(
            spec, reduced, mont.from_mont(spec.scalar_field, r)
        )

    def add_public_point(self, spec, pt, public_pt):
        return ec.add(spec, pt, public_pt)  # constant shift on every share


def msm_half(spec, points, scalars_mont):
    """MSM of public points with additive-share scalars: each party runs a
    full plain MSM over its own summands (msm_public_points_hs)."""
    if points[0].shape[0] == 0:
        return ec.point_inf(spec)
    std = mont.from_mont(spec.scalar_field, scalars_mont)
    return msm_mod.msm(spec, points, std)


def scalar_mul_public_point(spec, public_pt, scalar_half_mont):
    """[half-share scalar] * public point (scalar_mul_public_point_hs)."""
    return ec.scalar_mul(
        spec, public_pt, mont.from_mont(spec.scalar_field, scalar_half_mont)
    )

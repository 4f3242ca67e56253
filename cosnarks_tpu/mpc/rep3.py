"""Rep3: 3-party replicated secret sharing over prime fields + EC groups.

TPU-native port of the reference's protocol surface
(mpc-core/src/protocols/rep3.rs + rep3/arithmetic.rs + rep3/pointshare.rs):
shares are limb arrays, all protocol ops are pure array functions; the only
host work is the thin send/recv between jitted local phases — mirroring the
reference's local_mul_vec/reshare_vec split (arithmetic.rs:133-164), which is
exactly the right shape for TPU.

Layout: value x = x_0 + x_1 + x_2 (additive); party i holds the replicated
pair (a, b) = (x_i, x_{i+1}). Public constants live in x_0, so party 0 adds
them to `.a` and party 2 to `.b` (cf. promote_from_trivial, rep3.rs).
"""

from __future__ import annotations

import dataclasses
import typing

import jax
import jax.numpy as jnp

from ..ec import curve as ec
from ..ff import mont
from ..ff.spec import Field
from .rng import PartyRng


class Share(typing.NamedTuple):
    """Replicated field share (a, b) — a pytree of two limb arrays."""

    a: jax.Array
    b: jax.Array


@dataclasses.dataclass
class Rep3State:
    """Party id + correlated randomness (the reference's MpcState,
    mpc-core/src/lib.rs:20-30). fork() yields substreams for concurrent
    protocol instances."""

    id: int
    rng: PartyRng
    _forks: int = 0

    @classmethod
    def setup(cls, net, seed: bytes | None = None) -> "Rep3State":
        return cls(net.id, PartyRng.setup(net, seed))

    def fork(self) -> "Rep3State":
        self._forks += 1
        return Rep3State(self.id, self.rng.fork(self._forks))


# -- host-side share/combine (io + tests; reference rep3.rs:112-220) --------

def share_field_elements(field: Field, values: list[int], rng) -> list:
    """Split host ints into 3 replicated share arrays (internal mont form)."""
    x0 = [rng.randrange(field.p) for _ in values]
    x1 = [rng.randrange(field.p) for _ in values]
    x2 = [(v - a - b) % field.p for v, a, b in zip(values, x0, x1)]
    enc = [mont.encode(field, x) for x in (x0, x1, x2)]
    return [Share(enc[i], enc[(i + 1) % 3]) for i in range(3)]


def combine_field_elements(field: Field, shares: list) -> list[int]:
    """Recombine 3 replicated shares to host ints (consistency-checked)."""
    import numpy as np

    for i in range(3):
        if not np.array_equal(
            np.asarray(shares[i].b), np.asarray(shares[(i + 1) % 3].a)
        ):
            raise ValueError("inconsistent replicated shares")
    total = mont.add(
        field, mont.add(field, shares[0].a, shares[1].a), shares[2].a
    )
    return mont.decode(field, total)


# -- linear ops (no communication) ------------------------------------------

def add(field: Field, x: Share, y: Share) -> Share:
    return Share(mont.add(field, x.a, y.a), mont.add(field, x.b, y.b))


def sub(field: Field, x: Share, y: Share) -> Share:
    return Share(mont.sub(field, x.a, y.a), mont.sub(field, x.b, y.b))


def neg(field: Field, x: Share) -> Share:
    return Share(mont.neg(field, x.a), mont.neg(field, x.b))


def add_public(field: Field, x: Share, v, party_id: int) -> Share:
    a = mont.add(field, x.a, v) if party_id == 0 else x.a
    b = mont.add(field, x.b, v) if party_id == 2 else x.b
    return Share(a, b)


def mul_public(field: Field, x: Share, v) -> Share:
    return Share(mont.mul(field, x.a, v), mont.mul(field, x.b, v))


def promote_public(field: Field, v, party_id: int, zeros_like=None) -> Share:
    z = jnp.zeros_like(v)
    if party_id == 0:
        return Share(v, z)
    if party_id == 2:
        return Share(z, v)
    return Share(z, z)


# -- multiplicative ops -----------------------------------------------------

def local_mul(field: Field, x: Share, y: Share, state: Rep3State):
    """Additive share of x*y (no communication; reference local_mul_vec,
    arithmetic.rs:133): x_a y_a + x_a y_b + x_b y_a + (zero share)."""
    z = state.rng.zero_additive(field, x.a.shape[:-1])
    s = jnp.stack([x.a, x.a, x.b])
    t = jnp.stack([y.a, y.b, y.a])
    prods = mont.mul(field, s, t)
    acc = mont.add(field, mont.add(field, prods[0], prods[1]), prods[2])
    return mont.add(field, acc, z)


def reshare(field: Field, additive, net) -> Share:
    """Additive share -> replicated share (1 round): party i needs x_{i+1},
    i.e. receives from next, sends to prev."""
    other = net.reshare_backward(additive)
    return Share(additive, jnp.asarray(other))


def mul(field: Field, x: Share, y: Share, net, state: Rep3State) -> Share:
    return reshare(field, local_mul(field, x, y, state), net)


def rand(field: Field, state: Rep3State, shape=()) -> Share:
    """Random replicated share, no communication (arithmetic.rs rand)."""
    a, b = state.rng.rand_share(field, shape)
    return Share(a, b)


def open(field: Field, x: Share, net):
    """Open to all parties (1 round): missing component x_{i+2} is the `b`
    of the next party."""
    other = net.reshare_backward(x.b)
    return mont.add(field, mont.add(field, x.a, x.b), jnp.asarray(other))


def open_additive(field: Field, additive, net, state: Rep3State | None = None):
    """Open an additive sharing (each party broadcasts its summand).

    When `state` is given the summand is re-randomized with an additive zero
    share first, so the broadcast values are uniform subject to their sum —
    required whenever the additive decomposition is not already masked
    (cf. masking_field_element uses in the reference, rep3/arithmetic.rs:110).
    """
    if state is not None:
        z = state.rng.zero_additive(field, additive.shape[:-1])
        additive = mont.add(field, additive, z)
    others = net.broadcast(additive)
    total = additive
    for v in others.values():
        total = mont.add(field, total, jnp.asarray(v))
    return total


def cmux(field: Field, cond: Share, a: Share, b: Share, net, state) -> Share:
    """cond*a + (1-cond)*b for a shared bit cond (arithmetic.rs cmux)."""
    d = sub(field, a, b)
    cd = mul(field, cond, d, net, state)
    return add(field, b, cd)


def inv(field: Field, x: Share, net, state: Rep3State) -> Share:
    """Masked inversion (1.5 rounds): open(r*x), then x^-1 = r/open."""
    r = rand(field, state, x.a.shape[:-1])
    rx = mul(field, r, x, net, state)
    opened = open(field, rx, net)
    inv_open = mont.inv(field, opened)
    return mul_public(field, r, inv_open)


# -- EC point shares --------------------------------------------------------
# Additive point share: each party holds P_i with P = P_0 + P_1 + P_2 (group
# sum); linear EC ops act share-wise (pointshare.rs). Replicated point share
# is a (A, B) pair of Jacobian points, same layout as field shares.


class PointShare(typing.NamedTuple):
    a: tuple  # Jacobian (X, Y, Z)
    b: tuple


def zero_point_mask(spec, state: Rep3State, shape=()):
    """Additive EC share of the identity: [z]G with z an additive zero share
    (the reference's masking_ec_element, rep3/pointshare.rs:88)."""
    field = spec.scalar_field
    z = state.rng.zero_additive(field, shape)
    gen = ec.encode_points(spec, [spec.generator])
    gen = tuple(x[0] for x in gen)
    if shape:
        gen = tuple(
            jnp.broadcast_to(x, tuple(shape) + x.shape) for x in gen
        )
    return ec.scalar_mul(spec, gen, mont.from_mont(field, z))


def _batch_shape(spec, additive_pt):
    """Leading batch dims of a point pytree (strip coord_ndim limb axes)."""
    nd = spec.ops.coord_ndim
    return additive_pt[0].shape[:-nd]


def point_reshare(spec, additive_pt, net, state: Rep3State | None = None
                  ) -> PointShare:
    """Additive EC share -> replicated. Masks with [z]G first when `state`
    is given (mandatory when the additive share came from a local product,
    pointshare.rs:88)."""
    if state is not None:
        mask = zero_point_mask(spec, state, _batch_shape(spec, additive_pt))
        additive_pt = ec.add(spec, additive_pt, mask)
    other = net.reshare_backward(additive_pt)
    return PointShare(additive_pt, jax.tree.map(jnp.asarray, other))


def point_open_additive(spec, additive_pt, net, state: Rep3State | None = None):
    """Open an additive EC sharing; re-randomized with [z]G when `state` is
    given so broadcast summands are uniform subject to their group sum."""
    if state is not None:
        mask = zero_point_mask(spec, state, _batch_shape(spec, additive_pt))
        additive_pt = ec.add(spec, additive_pt, mask)
    others = net.broadcast(additive_pt)
    total = additive_pt
    for v in others.values():
        total = ec.add(spec, total, jax.tree.map(jnp.asarray, v))
    return total


def point_scalar_mul_local(spec, pt: PointShare, scalar: Share, state):
    """Additive share of [s]*P from replicated scalar + replicated point
    (pointshare.rs scalar_mul_local beaver-style local phase):
    s_a*(A+B) + s_b*A, re-randomized with a zero scalar share times G
    (masking_ec_element, pointshare.rs:88)."""
    field = spec.scalar_field
    sa_std = mont.from_mont(field, scalar.a)
    sb_std = mont.from_mont(field, scalar.b)
    ab = ec.add(spec, pt.a, pt.b)
    t1 = ec.scalar_mul(spec, ab, sa_std)
    t2 = ec.scalar_mul(spec, pt.a, sb_std)
    mask = zero_point_mask(spec, state, scalar.a.shape[:-1])
    return ec.add(spec, ec.add(spec, t1, t2), mask)


def eval_poly(field: Field, coeffs: list, point_mont) -> Share:
    """Evaluate a secret-shared polynomial (list of coefficient shares,
    constant term first) at a PUBLIC point via Horner — local only, both
    replicated halves in one pass (rep3/poly.rs:28-44)."""
    acc = None
    for c in reversed(coeffs):
        if acc is None:
            acc = c
        else:
            acc = add(field, mul_public(field, acc, point_mont), c)
    if acc is None:
        z = mont.encode(field, [0])[0]
        return Share(z, z)
    return acc

"""Field-kernel tests against the python-int oracle.

Mirrors the role of the reference's protocol unit tests that check MPC results
against plain arkworks arithmetic (/root/reference/tests/tests/mpc/rep3.rs).
"""

import numpy as np
import pytest

from cosnarks_tpu.ff import bigint, mont
from cosnarks_tpu.ff.spec import BLS12_381_FQ, BLS12_381_FR, BN254_FQ, BN254_FR

FIELDS = [BN254_FR, BN254_FQ, BLS12_381_FR, BLS12_381_FQ]


def rand_elems(rng, field, k):
    return [rng.randrange(field.p) for _ in range(k)]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_limb_roundtrip(rng, field):
    xs = rand_elems(rng, field, 8) + [0, 1, field.p - 1]
    arr = mont.encode(field, xs, mont=False)
    assert mont.decode(field, arr, mont=False) == xs


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_mont_roundtrip(rng, field):
    xs = rand_elems(rng, field, 8) + [0, 1, field.p - 1]
    arr = mont.encode(field, xs)
    back = mont.decode(field, mont.from_mont(field, arr), mont=False)
    assert back == xs


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_to_mont_matches_host(rng, field):
    xs = rand_elems(rng, field, 8)
    std = mont.encode(field, xs, mont=False)
    dev = mont.decode(field, mont.to_mont(field, std), mont=False)
    assert dev == [field.to_mont_int(x) for x in xs]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_mul(rng, field):
    n = 64
    xs = rand_elems(rng, field, n) + [0, 1, field.p - 1, field.p - 1]
    ys = rand_elems(rng, field, n) + [field.p - 1, 1, field.p - 1, 0]
    a = mont.encode(field, xs)
    b = mont.encode(field, ys)
    got = mont.decode(field, mont.mul(field, a, b))
    assert got == [(x * y) % field.p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(rng, field):
    n = 64
    xs = rand_elems(rng, field, n) + [0, field.p - 1]
    ys = rand_elems(rng, field, n) + [0, field.p - 1]
    a = mont.encode(field, xs)
    b = mont.encode(field, ys)
    assert mont.decode(field, mont.add(field, a, b)) == [
        (x + y) % field.p for x, y in zip(xs, ys)
    ]
    assert mont.decode(field, mont.sub(field, a, b)) == [
        (x - y) % field.p for x, y in zip(xs, ys)
    ]
    assert mont.decode(field, mont.neg(field, a)) == [(-x) % field.p for x in xs]


@pytest.mark.parametrize("field", [BN254_FR, BLS12_381_FQ], ids=lambda f: f.name)
def test_inv_pow(rng, field):
    xs = rand_elems(rng, field, 8) + [1, field.p - 1]
    a = mont.encode(field, xs)
    got = mont.decode(field, mont.inv(field, a))
    assert got == [pow(x, -1, field.p) for x in xs]
    e = 0xDEADBEEFCAFE
    got = mont.decode(field, mont.pow_static(field, a, e))
    assert got == [pow(x, e, field.p) for x in xs]


def test_inv_zero_is_zero():
    field = BN254_FR
    a = mont.zeros(field, (3,))
    assert mont.decode(field, mont.inv(field, a)) == [0, 0, 0]


@pytest.mark.parametrize("field", [BN254_FR], ids=lambda f: f.name)
def test_reduce_columns_matvec_style(rng, field):
    # lazy limb-accumulation as used by sparse mat-vec: sum of k canonical
    # elements accumulated limb-wise without reduction, then reduced at once.
    k, rows = 300, 5
    vals = [[rng.randrange(field.p) for _ in range(k)] for _ in range(rows)]
    arrs = [mont.encode(field, v) for v in vals]
    import jax.numpy as jnp

    acc = jnp.stack([a.sum(axis=0, dtype=jnp.uint32) for a in arrs])  # (rows, n)
    acc = jnp.pad(acc, ((0, 0), (0, 1)))  # room for overflow limb
    got = mont.decode(field, mont.reduce_columns(field, acc))
    assert got == [sum(v) % field.p for v in vals]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_groth16_roots(field):
    roots = field.groth16_roots()
    # roots[k] must have multiplicative order exactly 2^k
    for k in sorted({0, 1, min(5, field.two_adicity), field.two_adicity}):
        r = roots[k]
        assert pow(r, 1 << k, field.p) == 1
        if k:
            assert pow(r, 1 << (k - 1), field.p) != 1

"""NTT tests vs a naive host DFT oracle."""

import pytest

from cosnarks_tpu.ff import mont
from cosnarks_tpu.ff.spec import BLS12_381_FR, BN254_FR
from cosnarks_tpu.poly import ntt


def naive_dft(field, coeffs, root):
    n = len(coeffs)
    out = []
    for j in range(n):
        acc = 0
        wj = pow(root, j, field.p)
        w = 1
        for c in coeffs:
            acc = (acc + c * w) % field.p
            w = w * wj % field.p
        out.append(acc)
    return out


@pytest.mark.parametrize("field", [BN254_FR, BLS12_381_FR], ids=lambda f: f.name)
@pytest.mark.parametrize("n", [8, 32])
def test_fft_matches_naive(rng, field, n):
    dom = ntt.groth16_domain(field, n)
    coeffs = [rng.randrange(field.p) for _ in range(n)]
    x = mont.encode(field, coeffs)
    got = mont.decode(field, dom.fft(x))
    assert got == naive_dft(field, coeffs, dom.group_gen)


@pytest.mark.parametrize("field", [BN254_FR], ids=lambda f: f.name)
def test_ifft_roundtrip(rng, field):
    n = 64
    dom = ntt.groth16_domain(field, n)
    coeffs = [rng.randrange(field.p) for _ in range(n)]
    x = mont.encode(field, coeffs)
    assert mont.decode(field, dom.ifft(dom.fft(x))) == coeffs
    assert mont.decode(field, dom.fft(dom.ifft(x))) == coeffs


def test_fft_batched_leading_axis(rng):
    field = BN254_FR
    n = 16
    dom = ntt.groth16_domain(field, n)
    a = [rng.randrange(field.p) for _ in range(n)]
    b = [rng.randrange(field.p) for _ in range(n)]
    import jax.numpy as jnp

    x = jnp.stack([mont.encode(field, a), mont.encode(field, b)])
    got = dom.fft(x)
    assert mont.decode(field, got[0]) == naive_dft(field, a, dom.group_gen)
    assert mont.decode(field, got[1]) == naive_dft(field, b, dom.group_gen)


def test_distribute_powers_and_shift_root(rng):
    field = BN254_FR
    n = 16
    dom = ntt.groth16_domain(field, n)
    root = ntt.groth16_shift_root(field, dom)
    # shift root squared must equal the domain generator (it is a 2n-th root)
    assert root * root % field.p == dom.group_gen
    coeffs = [rng.randrange(field.p) for _ in range(n)]
    x = mont.encode(field, coeffs)
    got = mont.decode(field, dom.distribute_powers(x, root))
    assert got == [c * pow(root, i, field.p) % field.p for i, c in enumerate(coeffs)]


def test_groth16_domain_rounds_up():
    dom = ntt.groth16_domain(BN254_FR, 5)
    assert dom.size == 8

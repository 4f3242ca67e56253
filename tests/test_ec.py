"""Curve kernel + MSM tests vs the host python-int oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosnarks_tpu.ec import curve as ec
from cosnarks_tpu.ec import host, msm
from cosnarks_tpu.ec.curves import BN254_G1, BN254_G2, BLS12_381_G1, GRUMPKIN
from cosnarks_tpu.ff import mont

CURVES = [BN254_G1, BN254_G2, BLS12_381_G1, GRUMPKIN]


def random_affines(rng, spec, k):
    hc = host.host_curve(spec)
    pts = []
    for _ in range(k):
        s = rng.randrange(1, spec.scalar_field.p)
        pts.append(hc.affine_ints(hc.mul(hc.generator, s)))
    return pts


@pytest.mark.parametrize("spec", CURVES, ids=lambda s: s.name)
def test_add_double_vs_host(rng, spec):
    hc = host.host_curve(spec)
    k = 8
    pa = random_affines(rng, spec, k)
    pb = random_affines(rng, spec, k)
    A = ec.encode_points(spec, pa)
    B = ec.encode_points(spec, pb)
    got = ec.decode_points(spec, jax.jit(ec.add, static_argnums=0)(spec, A, B))
    exp = [
        hc.affine_ints(hc.add(hc.lift_affine(x), hc.lift_affine(y)))
        for x, y in zip(pa, pb)
    ]
    assert got == exp
    got_dbl = ec.decode_points(
        spec, jax.jit(ec.double, static_argnums=0)(spec, A)
    )
    exp_dbl = [hc.affine_ints(hc.double(hc.lift_affine(x))) for x in pa]
    assert got_dbl == exp_dbl


@pytest.mark.parametrize("spec", [BN254_G1, BN254_G2], ids=lambda s: s.name)
def test_add_edge_cases(rng, spec):
    hc = host.host_curve(spec)
    [p] = random_affines(rng, spec, 1)
    inf = None
    # (P, Q) pairs: P+inf, inf+P, inf+inf, P+P (double), P+(-P)
    neg_p = hc.affine_ints(hc.neg(hc.lift_affine(p)))
    pas = [p, inf, inf, p, p]
    pbs = [inf, p, inf, p, neg_p]
    A = ec.encode_points(spec, pas)
    B = ec.encode_points(spec, pbs)
    got = ec.decode_points(spec, jax.jit(ec.add, static_argnums=0)(spec, A, B))
    exp = [
        hc.affine_ints(hc.add(hc.lift_affine(x), hc.lift_affine(y)))
        for x, y in zip(pas, pbs)
    ]
    assert got == exp


@pytest.mark.parametrize("spec", [BN254_G1], ids=lambda s: s.name)
def test_scalar_mul(rng, spec):
    hc = host.host_curve(spec)
    pts = random_affines(rng, spec, 4)
    scalars = [rng.randrange(spec.scalar_field.p) for _ in range(3)] + [0]
    P = ec.encode_points(spec, pts)
    s = mont.encode(spec.scalar_field, scalars, mont=False)
    got = ec.decode_points(spec, ec.scalar_mul(spec, P, s))
    exp = [
        hc.affine_ints(hc.mul(hc.lift_affine(p), k))
        for p, k in zip(pts, scalars)
    ]
    assert got == exp


@pytest.mark.parametrize("spec", [BN254_G1, BN254_G2], ids=lambda s: s.name)
@pytest.mark.parametrize("c,chunk", [(4, 32)])
def test_msm_vs_host(rng, spec, c, chunk):
    hc = host.host_curve(spec)
    n = 50
    pts = random_affines(rng, spec, n - 2) + [None, None]  # include infs
    scalars = [rng.randrange(spec.scalar_field.p) for _ in range(n - 4)] + [
        0,
        1,
        2,
        spec.scalar_field.p - 1,
    ]
    P = ec.encode_points(spec, pts)
    s = mont.encode(spec.scalar_field, scalars, mont=False)
    got = ec.decode_points(
        spec, tuple(x[None] for x in msm.msm(spec, P, s, c=c, chunk=chunk))
    )[0]
    exp = hc.affine_ints(hc.msm([hc.lift_affine(p) for p in pts], scalars))
    assert got == exp


def test_msm_duplicate_points_and_scalars(rng):
    # stresses P == Q inside bucket reductions (plain-driver realistic case)
    spec = BN254_G1
    hc = host.host_curve(spec)
    [p] = random_affines(rng, spec, 1)
    pts = [p] * 16
    scalars = [3] * 8 + [5] * 8
    P = ec.encode_points(spec, pts)
    s = mont.encode(spec.scalar_field, scalars, mont=False)
    got = ec.decode_points(
        spec, tuple(x[None] for x in msm.msm(spec, P, s, c=4, chunk=16))
    )[0]
    exp = hc.affine_ints(hc.mul(hc.lift_affine(p), 64))
    assert got == exp


def test_msm_level0_megakernel_interp(rng, monkeypatch):
    """The level-0 Pallas megakernel (TPU default) in interpret mode must
    match the XLA fori_loop formulation (the CPU default). Catches
    megakernel logic drift that TPU-only benching would miss."""
    monkeypatch.setenv("COSNARKS_MSM_L0", "mega-interp")
    spec = BN254_G1
    from cosnarks_tpu.ec import pallas_ec

    hc = host.host_curve(spec)
    n = 1024  # L = nwin * n/K = 32*32 = 1024 lanes: tiles as (8, 128)
    assert pallas_ec.lm_geometry(32 * (n // 32)) is not None
    pts = random_affines(rng, spec, n)
    scalars = [rng.randrange(spec.scalar_field.p) for _ in range(n - 2)]
    scalars += [0, spec.scalar_field.p - 1]
    P = ec.encode_points(spec, pts)
    s = mont.encode(spec.scalar_field, scalars, mont=False)
    got = ec.decode_points(
        spec, tuple(x[None] for x in msm.msm(spec, P, s, c=8))
    )[0]
    exp = hc.affine_ints(hc.msm([hc.lift_affine(p) for p in pts], scalars))
    assert got == exp


@pytest.mark.parametrize("n,c", [(128, 4), (256, 8), (200, None)])
def test_msm_pippenger_path(rng, n, c):
    """Covers the signed-digit Pippenger path (N > 64 bypasses _msm_small),
    including a non-multiple-of-CHUNK_K size and the default window."""
    spec = BN254_G1
    hc = host.host_curve(spec)
    pts = random_affines(rng, spec, n)
    scalars = [rng.randrange(spec.scalar_field.p) for _ in range(n - 2)]
    scalars += [0, spec.scalar_field.p - 1]
    P = ec.encode_points(spec, pts)
    s = mont.encode(spec.scalar_field, scalars, mont=False)
    got = ec.decode_points(
        spec, tuple(x[None] for x in msm.msm(spec, P, s, c=c))
    )[0]
    exp = hc.affine_ints(hc.msm([hc.lift_affine(p) for p in pts], scalars))
    assert got == exp

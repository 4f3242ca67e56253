"""Collaborative Groth16 prover (snarkjs-compatible).

Structure mirrors the reference prove_inner / create_proof_with_assignment
(co-groth16/src/groth16.rs:119-332): witness map -> 5 MSMs over additive
half-shares -> 2 communication rounds (open A / [r]*B, then open C / open B).
The prover is generic over a driver (drivers.py) exactly like the
CircomGroth16Prover trait, so the plain and Rep3 paths share all kernels.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..ec import curve as ec
from ..ec.curves import BN254_G1, BN254_G2, BLS12_381_G1, BLS12_381_G2
from ..ff import mont
from ..ff.spec import BN254_FR
from ..io.zkey import Groth16Zkey
from . import drivers as drv
from .witness_map import witness_map


@dataclasses.dataclass
class SharedWitness:
    """public_inputs includes the leading constant-1 wire (matches the
    reference SharedWitness, co-circom-types/src/lib.rs:167)."""

    public_inputs: list[int]
    witness: object  # driver share form, (n_vars - n_public - 1, nlimbs)


def curve_specs_for(zkey: Groth16Zkey):
    if zkey.fr is BN254_FR or zkey.fr.name == "bn254_fr":
        return BN254_G1, BN254_G2
    return BLS12_381_G1, BLS12_381_G2


def load_g1_array(spec, arr: np.ndarray):
    """(N, 2, nl) zkey Montgomery limbs -> device Jacobian points."""
    X = jnp.asarray(arr[:, 0])
    Y = jnp.asarray(arr[:, 1])
    inf = jnp.asarray(np.all(arr.reshape(arr.shape[0], -1) == 0, axis=1))
    one = spec.ops.one((arr.shape[0],))
    Z = spec.ops.select(inf, spec.ops.zeros((arr.shape[0],)), one)
    return (X, Y, Z)


def load_g2_array(spec, arr: np.ndarray):
    """(N, 2, 2, nl) -> device Jacobian G2 points ((..., 2, nl) Fq2 coords)."""
    X = jnp.asarray(arr[:, 0])
    Y = jnp.asarray(arr[:, 1])
    inf = jnp.asarray(np.all(arr.reshape(arr.shape[0], -1) == 0, axis=1))
    one = spec.ops.one((arr.shape[0],))
    Z = spec.ops.select(inf, spec.ops.zeros((arr.shape[0],)), one)
    return (X, Y, Z)


def _point_to_host(spec, pt):
    import jax

    return ec.decode_points(spec, jax.tree.map(lambda x: x[None], pt))[0]


def _calculate_coeff(driver, g1, initial, query_pts, vk_param_pt, query0_pt,
                     public_ints, aux_half, fr):
    """reference calculate_coeff (groth16.rs:173-197): initial
    + query[0] + vk_param + sum query[1..=npub]*pub + msm(query[npub+1..], aux)."""
    priv_acc = drv.msm_half(g1, query_pts, aux_half)
    res = ec.add(g1, initial, priv_acc)
    # public contributions (added by party 0 only in additive sharing)
    from ..ec import host

    hc = host.host_curve(g1)
    pub_acc = hc.msm(
        [hc.lift_affine(p) for p in public_ints["points"]],
        public_ints["values"],
    )
    combined = hc.add(hc.add(hc.lift_affine(query0_pt), hc.lift_affine(vk_param_pt)), pub_acc)
    dev_pt = tuple(
        x[0] for x in ec.encode_points(g1, [hc.affine_ints(combined)])
    )
    return driver.add_public_point(g1, res, dev_pt)


def prove(driver, zkey: Groth16Zkey, witness: SharedWitness) -> dict:
    """Produce a snarkjs-compatible Groth16 proof dict {a, b, c} (host ints).

    Communication (Rep3): PRF setup is assumed done (driver.state); rounds:
      1. open(A) and reshare+[r]*B_g1
      2. open(C) and open(B_g2)
    """
    fr = zkey.fr
    fq = zkey.fq
    g1, g2 = curve_specs_for(zkey)

    n_instance = zkey.n_public + 1
    if len(witness.public_inputs) != n_instance:
        raise ValueError("public input count mismatch")

    w = driver.full_witness(fr, witness.public_inputs, witness.witness)
    h_half = witness_map(driver, zkey, w)

    r = driver.rand(fr)
    s = driver.rand(fr)

    aux_half = driver.to_half(witness.witness)

    a_query = load_g1_array(g1, zkey.a_query)
    b_g1_query = load_g1_array(g1, zkey.b_g1_query)
    b_g2_query = load_g2_array(g2, zkey.b_g2_query)
    l_query = load_g1_array(g1, zkey.c_query)
    h_query = load_g1_array(g1, zkey.h_query)

    from ..io.zkey import g1_to_ints, g2_to_ints

    delta_g1_host = g1_to_ints(fq, zkey.delta_g1)
    delta_g1 = tuple(x[0] for x in ec.encode_points(g1, [delta_g1_host]))
    delta_g2 = tuple(x[0] for x in ec.encode_points(g2, [g2_to_ints(fq, zkey.delta_g2)]))
    alpha_g1 = g1_to_ints(fq, zkey.alpha_g1)
    beta_g1 = g1_to_ints(fq, zkey.beta_g1)
    beta_g2 = g2_to_ints(fq, zkey.beta_g2)

    def slice_pts(pts, lo):
        return tuple(x[lo:] for x in pts)

    pub_vals = witness.public_inputs[1:]

    def pub_points(query_np, to_ints):
        return {
            "points": [to_ints(fq, query_np[i]) for i in range(1, n_instance)],
            "values": pub_vals,
        }

    # A = [r]*delta + a_query . w  (+ alpha)
    r_half = driver.rand_to_half(r)
    s_half = driver.rand_to_half(s)
    r_delta = drv.scalar_mul_public_point(g1, delta_g1, r_half)
    g_a = _calculate_coeff(
        driver, g1, r_delta, slice_pts(a_query, n_instance), alpha_g1,
        g1_to_ints(fq, zkey.a_query[0]), pub_points(zkey.a_query, g1_to_ints),
        aux_half, fr,
    )
    # B in G1 (needed for C)
    s_delta_g1 = drv.scalar_mul_public_point(g1, delta_g1, s_half)
    g1_b = _calculate_coeff(
        driver, g1, s_delta_g1, slice_pts(b_g1_query, n_instance), beta_g1,
        g1_to_ints(fq, zkey.b_g1_query[0]),
        pub_points(zkey.b_g1_query, g1_to_ints), aux_half, fr,
    )
    # B in G2
    s_delta_g2 = drv.scalar_mul_public_point(g2, delta_g2, s_half)
    g2_b = _calculate_coeff_g2(
        driver, g2, s_delta_g2, slice_pts(b_g2_query, n_instance), beta_g2,
        g2_to_ints(fq, zkey.b_g2_query[0]), pub_vals,
        [g2_to_ints(fq, zkey.b_g2_query[i]) for i in range(1, n_instance)],
        aux_half,
    )

    l_acc = drv.msm_half(g1, l_query, aux_half)
    h_acc = drv.msm_half(g1, h_query, h_half)

    rs_half = driver.local_mul_scalar(fr, r, s)
    r_s_delta_g1 = drv.scalar_mul_public_point(g1, delta_g1, rs_half)

    # round 1: open A ; [r] * B_g1 (reshare + local scalar mul)
    g_a_opened = driver.open_half_point(g1, g_a)
    r_g1_b = driver.scalar_mul_half_point(g1, g1_b, r)

    s_g_a = drv.scalar_mul_public_point(g1, g_a_opened, s_half)
    g_c = ec.add(g1, s_g_a, r_g1_b)
    g_c = ec.add(g1, g_c, ec.neg(g1, r_s_delta_g1))
    g_c = ec.add(g1, g_c, l_acc)
    g_c = ec.add(g1, g_c, h_acc)

    # round 2: open C and B_g2
    g_c_opened = driver.open_half_point(g1, g_c)
    g2_b_opened = driver.open_half_point(g2, g2_b)

    return {
        "a": _point_to_host(g1, g_a_opened),
        "b": _point_to_host(g2, g2_b_opened),
        "c": _point_to_host(g1, g_c_opened),
        "protocol": "groth16",
        "curve": "bn128" if fr is BN254_FR else "bls12381",
    }


def _calculate_coeff_g2(driver, g2, initial, query_pts, vk_param, query0,
                        pub_vals, pub_pts, aux_half):
    priv_acc = drv.msm_half(g2, query_pts, aux_half)
    res = ec.add(g2, initial, priv_acc)
    from ..ec import host

    hc = host.host_curve(g2)
    pub_acc = hc.msm([hc.lift_affine(p) for p in pub_pts], pub_vals)
    combined = hc.add(
        hc.add(hc.lift_affine(query0), hc.lift_affine(vk_param)), pub_acc
    )
    dev_pt = tuple(
        x[0] for x in ec.encode_points(g2, [hc.affine_ints(combined)])
    )
    return driver.add_public_point(g2, res, dev_pt)


def vk_from_zkey(zkey: Groth16Zkey) -> dict:
    from ..io.zkey import g1_to_ints, g2_to_ints

    gamma_g2 = g2_to_ints(zkey.fq, zkey.gamma_g2)
    return {
        "protocol": "groth16",
        "curve": "bn128" if zkey.fr is BN254_FR else "bls12381",
        "n_public": zkey.n_public,
        "alpha_g1": g1_to_ints(zkey.fq, zkey.alpha_g1),
        "beta_g2": g2_to_ints(zkey.fq, zkey.beta_g2),
        "gamma_g2": gamma_g2,
        "delta_g2": g2_to_ints(zkey.fq, zkey.delta_g2),
        "ic": [g1_to_ints(zkey.fq, p) for p in zkey.ic],
    }

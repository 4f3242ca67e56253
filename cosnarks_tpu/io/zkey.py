"""snarkjs .zkey (Groth16 + PLONK) parser.

Mirrors the reference's `Groth16ZKey::from_reader` (external
taceo-circom-types, used at co-circom/src/bin/co-circom.rs:961-989).

snarkjs stores zkey field elements and point coordinates in **Montgomery
form** with R = 2^(8*n8) — identical to our device representation, so
sections map straight into limb arrays.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ff.bigint import limbs_to_int
from ..ff.spec import BLS12_381_FQ, BLS12_381_FR, BN254_FQ, BN254_FR, Field
from .binformat import Container, le_bytes_to_limbs, read_u32

GROTH16 = 1
PLONK = 2

_FIELDS_BY_P = {
    BN254_FQ.p: BN254_FQ,
    BN254_FR.p: BN254_FR,
    BLS12_381_FQ.p: BLS12_381_FQ,
    BLS12_381_FR.p: BLS12_381_FR,
}


@dataclasses.dataclass
class Groth16Zkey:
    """All arrays are numpy uint32 16-bit limbs in Montgomery form.

    G1 arrays: (N, 2, nq) [x, y]; G2 arrays: (N, 2, 2, nq) [x(c0,c1), y(..)].
    The all-zero point encodes infinity (snarkjs convention).
    """

    fq: Field
    fr: Field
    n_vars: int
    n_public: int
    domain_size: int
    alpha_g1: np.ndarray
    beta_g1: np.ndarray
    beta_g2: np.ndarray
    gamma_g2: np.ndarray
    delta_g1: np.ndarray
    delta_g2: np.ndarray
    ic: np.ndarray  # (n_public+1) G1
    # sparse A/B matrices: per entry (matrix, constraint, signal, value)
    coeff_matrix: np.ndarray  # (ncoeffs,) uint32, 0=A 1=B
    coeff_row: np.ndarray  # constraint index
    coeff_col: np.ndarray  # signal index
    coeff_val: np.ndarray  # (ncoeffs, nr) Montgomery limbs
    a_query: np.ndarray  # (n_vars) G1
    b_g1_query: np.ndarray  # (n_vars) G1
    b_g2_query: np.ndarray  # (n_vars) G2
    c_query: np.ndarray  # (n_vars - n_public - 1) G1  (the l_query)
    h_query: np.ndarray  # (domain_size) G1


def _g1s(view, n8q) -> np.ndarray:
    return le_bytes_to_limbs(view, n8q).reshape(-1, 2, n8q // 2)


def _g2s(view, n8q) -> np.ndarray:
    return le_bytes_to_limbs(view, n8q).reshape(-1, 2, 2, n8q // 2)


def parse_groth16_zkey(data: bytes) -> Groth16Zkey:
    c = Container(data, b"zkey")
    (prover_type,) = np.frombuffer(c.section(1), dtype="<u4")
    if prover_type != GROTH16:
        raise ValueError(f"not a groth16 zkey (prover type {prover_type})")
    h = c.section(2)
    off = 0
    n8q, off = read_u32(h, off)
    q = limbs_to_int(le_bytes_to_limbs(h[off : off + n8q], n8q)[0])
    off += n8q
    n8r, off = read_u32(h, off)
    r = limbs_to_int(le_bytes_to_limbs(h[off : off + n8r], n8r)[0])
    off += n8r
    fq = _FIELDS_BY_P[q]
    fr = _FIELDS_BY_P[r]
    n_vars, off = read_u32(h, off)
    n_public, off = read_u32(h, off)
    domain_size, off = read_u32(h, off)

    def g1(o):
        return _g1s(h[o : o + 2 * n8q], n8q)[0], o + 2 * n8q

    def g2(o):
        return _g2s(h[o : o + 4 * n8q], n8q)[0], o + 4 * n8q

    alpha_g1, off = g1(off)
    beta_g1, off = g1(off)
    beta_g2, off = g2(off)
    gamma_g2, off = g2(off)
    delta_g1, off = g1(off)
    delta_g2, off = g2(off)

    cv = c.section(4)
    ncoeffs, _ = read_u32(cv, 0)
    rec = np.frombuffer(cv, dtype=np.uint8, count=ncoeffs * (12 + n8r), offset=4)
    rec = rec.reshape(ncoeffs, 12 + n8r)
    meta = rec[:, :12].copy().view("<u4").reshape(ncoeffs, 3)
    vals = np.ascontiguousarray(rec[:, 12:]).view("<u2").astype(np.uint32)

    # sparse_matvec (groth16/witness_map.py) accumulates limb products in
    # uint32 lanes: per (matrix, row) entry counts must stay < 2^16 or the
    # lazy segment sum overflows silently. Fail loudly here instead.
    if ncoeffs:
        key = meta[:, 0].astype(np.int64) * domain_size + meta[:, 1]
        per_row = np.bincount(key)
        if per_row.max(initial=0) >= (1 << 16):
            raise ValueError(
                "zkey has a constraint row with >= 2^16 coefficients; "
                "lazy uint32 accumulation would overflow (chunked reduction "
                "not implemented)"
            )

    return Groth16Zkey(
        fq=fq,
        fr=fr,
        n_vars=n_vars,
        n_public=n_public,
        domain_size=domain_size,
        alpha_g1=alpha_g1,
        beta_g1=beta_g1,
        beta_g2=beta_g2,
        gamma_g2=gamma_g2,
        delta_g1=delta_g1,
        delta_g2=delta_g2,
        ic=_g1s(c.section(3), n8q),
        coeff_matrix=meta[:, 0].copy(),
        coeff_row=meta[:, 1].copy(),
        coeff_col=meta[:, 2].copy(),
        coeff_val=vals,
        a_query=_g1s(c.section(5), n8q),
        b_g1_query=_g1s(c.section(6), n8q),
        b_g2_query=_g2s(c.section(7), n8q),
        c_query=_g1s(c.section(8), n8q),
        h_query=_g1s(c.section(9), n8q),
    )


def load_groth16_zkey(path) -> Groth16Zkey:
    with open(path, "rb") as f:
        return parse_groth16_zkey(f.read())


# -- host-form helpers (for the verifier / vk export) -----------------------

def g1_to_ints(fq: Field, pt: np.ndarray):
    """Montgomery limb G1 point -> host affine int pair or None (infinity)."""
    x = fq.from_mont_int(limbs_to_int(pt[0]))
    y = fq.from_mont_int(limbs_to_int(pt[1]))
    if x == 0 and y == 0:
        return None
    return (x, y)


def g2_to_ints(fq: Field, pt: np.ndarray):
    x = (fq.from_mont_int(limbs_to_int(pt[0, 0])),
         fq.from_mont_int(limbs_to_int(pt[0, 1])))
    y = (fq.from_mont_int(limbs_to_int(pt[1, 0])),
         fq.from_mont_int(limbs_to_int(pt[1, 1])))
    if x == (0, 0) and y == (0, 0):
        return None
    return (x, y)

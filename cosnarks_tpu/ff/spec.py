"""Prime-field specifications for the curves the framework supports.

Plays the role of the compile-time field parameters arkworks bakes into its
`MontConfig` derive (reference uses ark-bn254 / ark-bls12-381,
/root/reference/Cargo.toml). A :class:`Field` is a hashable host object; all
device kernels take it as a static argument and pull pre-computed limb
constants from it.

Internal representation everywhere on device: little-endian 16-bit limbs
stored in uint32 lanes, values kept in Montgomery form with R = 2**(16*nlimbs).
"""

from __future__ import annotations

import functools

import numpy as np

from .bigint import LIMB_BITS, int_to_limbs


class Field:
    """A prime field p with Montgomery-form limb constants.

    Hashable + compares by modulus, so it can be a static jit argument.
    """

    def __init__(self, name: str, p: int, *, two_adicity: int | None = None):
        self.name = name
        self.p = p
        self.bits = p.bit_length()
        self.nlimbs = -(-self.bits // LIMB_BITS)
        self.R = (1 << (LIMB_BITS * self.nlimbs)) % p
        self.R2 = (self.R * self.R) % p
        self.R3 = (self.R2 * self.R) % p
        # -p^-1 mod 2^16 (the CIOS "n0inv" constant)
        self.n0inv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        self.p_limbs = int_to_limbs(p, self.nlimbs)
        self.one_mont = int_to_limbs(self.R, self.nlimbs)
        self.r2_limbs = int_to_limbs(self.R2, self.nlimbs)
        self.zero_limbs = np.zeros(self.nlimbs, dtype=np.uint32)
        if two_adicity is None:
            t = 0
            q = p - 1
            while q % 2 == 0:
                q //= 2
                t += 1
            two_adicity = t
        self.two_adicity = two_adicity
        self.trace = (p - 1) >> two_adicity

    # -- host-side scalar arithmetic oracle ---------------------------------
    def to_mont_int(self, x: int) -> int:
        return (x * self.R) % self.p

    def from_mont_int(self, x: int) -> int:
        return (x * pow(self.R, -1, self.p)) % self.p

    def inv(self, x: int) -> int:
        return pow(x, -1, self.p)

    @functools.cache
    def smallest_qnr(self) -> int:
        """Smallest quadratic non-residue (snarkjs root-of-unity convention,
        cf. reference roots_of_unity, co-groth16/src/groth16.rs:60-73)."""
        q = 1
        while pow(q, (self.p - 1) // 2, self.p) != self.p - 1:
            q += 1
        return q

    @functools.cache
    def groth16_roots(self) -> list[int]:
        """roots[i] = 2^i-th root of unity chain used by snarkjs/ffjavascript:
        z = qnr^trace, roots = reversed([z, z^2, z^4, ...]) so that
        roots[k] has multiplicative order 2^k (reference groth16.rs:60-88)."""
        z = pow(self.smallest_qnr(), self.trace, self.p)
        roots = [z]
        for _ in range(self.two_adicity):
            roots.append(roots[-1] * roots[-1] % self.p)
        roots.reverse()
        return roots

    def __hash__(self):
        return hash((self.name, self.p))

    def __eq__(self, other):
        return isinstance(other, Field) and self.p == other.p

    def __repr__(self):
        return f"Field({self.name}, {self.bits} bits, {self.nlimbs} limbs)"


# BN254 (a.k.a. alt_bn128), the curve snarkjs / circom / Barretenberg use.
BN254_FR = Field(
    "bn254_fr",
    21888242871839275222246405745257275088548364400416034343698204186575808495617,
)
BN254_FQ = Field(
    "bn254_fq",
    21888242871839275222246405745257275088696311157297823662689037894645226208583,
)

# BLS12-381 (second curve supported by co-circom, co-circom.rs:86-93).
BLS12_381_FR = Field(
    "bls12_381_fr",
    52435875175126190479447740508185965837690552500527637822603658699938581184513,
)
BLS12_381_FQ = Field(
    "bls12_381_fq",
    4002409555221667393417789825735904156556882819939007885332058136124031650490837864442687629129015664037894272559787,
)

# Grumpkin: Fq = BN254 Fr and vice versa (used by Noir embedded-curve ops).
GRUMPKIN_FR = BN254_FQ
GRUMPKIN_FQ = BN254_FR

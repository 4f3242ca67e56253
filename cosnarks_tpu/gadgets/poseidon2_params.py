"""Poseidon2 BN254 parameters t in {2, 3, 4, 16} (d = 5).

Public parameters from the Horizen Labs Poseidon2 instance generation
(poseidon2_rust_params.sage), as shipped by the reference
(mpc-core/src/gadgets/poseidon2/poseidon2_bn254_t*.rs) and used by
Barretenberg's BN254 Poseidon2 (t=4). Data extracted verbatim — these are
cryptographic constants, not code.

Layout per t: dict with rounds_f, rounds_p, mat_diag_m_1 (t ints),
rc_external (rounds_f lists of t ints), rc_internal (rounds_p ints).
"""

PARAMS = {}


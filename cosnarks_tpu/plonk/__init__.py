"""Collaborative snarkjs-compatible PLONK (co-plonk parity).

prove.py  — the 5-round prover, generic over the driver seam
drivers.py — plain / Rep3 / Shamir protocol drivers (device-vectorized)
verify.py — snarkjs verification_key.json verifier
"""

"""coNoir stack: ACIR artifacts, co-ACVM solver, (later) UltraHonk.

acir.py   — Noir .json artifact + witness-stack parsing, ABI encoding
solver.py — the ACVM opcode solver, generic over the VM driver seam
"""

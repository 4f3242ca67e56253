"""cosnarks_tpu: a TPU-native collaborative-SNARK framework.

Re-implements the capabilities of TaceoLabs/co-snarks (reference at
/root/reference) with a JAX/XLA/Pallas compute path: secret-shared BN254/
BLS12-381 arithmetic as vectorized limb kernels, MSM/NTT prover hot loops on
TPU, and MPC rounds as a thin host networking layer around jitted local
phases.
"""

__version__ = "0.1.0"

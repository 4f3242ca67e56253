"""Flagship benchmark: 2^20-constraint Groth16, 3-party Rep3, BN254.

Generates (once, cached) a synthetic snarkjs-convention zkey with domain
size 2^20 (groth16/setup.py), proves with the three parties as threads
over LocalNetwork on one chip, verifies the proof with the real pairing
check, and prints per-phase timings + proofs/sec.

Usage: python scripts/flagship_groth16.py [log2_constraints=20]
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cosnarks_tpu.groth16 import drivers, prove, setup
from cosnarks_tpu.groth16.verify import verify_bn254
from cosnarks_tpu.mpc import rep3
from cosnarks_tpu.mpc.net.local import run_parties


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ncon = (1 << logn) - 2  # domain = next_pow2(ncon + 2) = 2^logn
    t0 = time.time()
    zkey, w = setup.cached_synthetic_zkey(ncon)
    t_setup = time.time() - t0
    print(f"setup: domain 2^{logn} ({zkey.domain_size}), n_vars "
          f"{zkey.n_vars}, {t_setup:.1f}s (cached after first run)")

    n_inst = zkey.n_public + 1
    vk = prove.vk_from_zkey(zkey)
    shares = rep3.share_field_elements(zkey.fr, w[n_inst:],
                                       random.Random(0xF1A6))

    def party(i):
        def run(net):
            state = rep3.Rep3State.setup(net)
            drv = drivers.Rep3Driver(net, state)
            wit = prove.SharedWitness(public_inputs=w[:n_inst],
                                      witness=shares[net.id])
            t0 = time.time()
            proof = prove.prove(drv, zkey, wit)  # includes compile 1st time
            t_warm0 = time.time() - t0
            t0 = time.time()
            proof = prove.prove(drv, zkey, wit)
            return proof, time.time() - t0, t_warm0
        return run

    res = run_parties([party(i) for i in range(3)], timeout=7200.0)
    proof = res[0][0]
    t_prove = max(r[1] for r in res)
    t_first = max(r[2] for r in res)
    assert res[0][0] == res[1][0] == res[2][0], "parties disagree"
    ok = verify_bn254(vk, proof, w[1:n_inst])
    print(json.dumps({
        "metric": f"Groth16 proofs/sec (2^{logn} constraints, 3-party Rep3, "
                  "1 chip, LocalNetwork)",
        "value": round(1.0 / t_prove, 4),
        "unit": "proofs/s",
        "prove_wall_s": round(t_prove, 2),
        "first_run_incl_compile_s": round(t_first, 2),
        "verified": bool(ok),
    }))
    assert ok


if __name__ == "__main__":
    main()

"""Seeded/compressed .shared witness artifacts (CompressedRep3SharedWitness,
reference co-circom-types/src/lib.rs:152 + rep3.rs:138-150 SeededType)."""

import random

import numpy as np

from cosnarks_tpu.ff import mont
from cosnarks_tpu.ff.spec import BN254_FR
from cosnarks_tpu.io import shared
from cosnarks_tpu.mpc import rep3


def _recombine(field, files):
    swfs = [shared.read_shared_witness(d) for d in files]
    shares = [rep3.Share(s.share_a, s.share_b) for s in swfs]
    return shared.rep3.combine_field_elements(field, shares), swfs


def test_seeded_roundtrip_recombines():
    field = BN254_FR
    rng = random.Random(7)
    wit = [1, 5, 7] + [rng.randrange(field.p) for _ in range(61)]
    files = shared.split_witness_rep3(field, wit, 3, rng, seeded=True)
    vals, swfs = _recombine(field, files)
    assert vals == wit[3:]
    for s in swfs:
        assert s.public_inputs == [1, 5, 7]
    # replicated consistency: party i's b == party i+1's a
    for i in range(3):
        assert np.array_equal(
            np.asarray(swfs[i].share_b), np.asarray(swfs[(i + 1) % 3].share_a)
        )


def test_seeded_files_shrink():
    field = BN254_FR
    rng = random.Random(3)
    wit = [1] + [rng.randrange(field.p) for _ in range(4095)]
    plain = shared.split_witness_rep3(field, wit, 1, rng)
    seeded = shared.split_witness_rep3(field, wit, 1, rng, seeded=True)
    # party 0 holds (x0, x1), both seeded: constant-size file
    assert len(seeded[0]) < 512
    # parties 1/2 carry one raw vector instead of two: ~2x smaller
    assert len(seeded[1]) < 0.6 * len(plain[1])
    assert len(seeded[2]) < 0.6 * len(plain[2])


def test_expand_seed_deterministic_and_uniformish():
    field = BN254_FR
    a = shared.expand_seed(field, b"\x01" * 32, 8)
    b = shared.expand_seed(field, b"\x01" * 32, 8)
    c = shared.expand_seed(field, b"\x02" * 32, 8)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    vals = mont.decode(field, a)
    assert all(0 <= v < field.p for v in vals)
    assert len(set(vals)) == 8

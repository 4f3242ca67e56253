"""`.shared` artifact formats: secret-shared witnesses and inputs.

Role of co-circom-types (SharedWitness / Rep3SharedInput,
co-circom/co-circom-types/src/lib.rs:21-504) — the reference serializes via
bincode; we define an explicit versioned container (same iden3-style
framing as zkey/wtns) since cross-implementation share files were never
interoperable anyway. Share values are stored in standard (non-Montgomery)
form so files are representation-agnostic.
"""

from __future__ import annotations

import dataclasses
import json
import struct

import jax.numpy as jnp
import numpy as np

from ..ff import mont
from ..ff.bigint import ints_to_limbs
from ..ff.spec import BLS12_381_FR, BN254_FR, Field
from ..mpc import rep3, shamir
from .binformat import Container, le_bytes_to_limbs, limbs_to_le_bytes, write_container

PROTO_REP3 = 0
PROTO_SHAMIR = 1

_FIELDS = {BN254_FR.p: BN254_FR, BLS12_381_FR.p: BLS12_381_FR}


@dataclasses.dataclass
class SharedWitnessFile:
    protocol: int
    party_id: int
    n_parties: int
    threshold: int
    field: Field
    public_inputs: list[int]  # instance incl. leading 1
    share_a: jnp.ndarray  # (n_wit, nlimbs) Montgomery (internal form)
    share_b: jnp.ndarray | None  # rep3 only


def write_shared_witness(f: SharedWitnessFile) -> bytes:
    field = f.field
    n8 = field.nlimbs * 2
    header = struct.pack(
        "<IIIII", f.protocol, f.party_id, f.n_parties, f.threshold, n8
    ) + limbs_to_le_bytes(np.asarray(field.p_limbs)[None, :])
    pubs = limbs_to_le_bytes(ints_to_limbs(f.public_inputs, field.nlimbs))
    sections = [
        (1, header),
        (2, struct.pack("<I", len(f.public_inputs)) + pubs),
        (3, limbs_to_le_bytes(np.asarray(mont.from_mont(field, f.share_a)))),
    ]
    if f.share_b is not None:
        sections.append(
            (4, limbs_to_le_bytes(np.asarray(mont.from_mont(field, f.share_b))))
        )
    return write_container(b"cosw", 1, sections)


def read_shared_witness(data: bytes) -> SharedWitnessFile:
    from ..ff.bigint import limbs_to_int

    c = Container(data, b"cosw")
    h = c.section(1)
    protocol, party_id, n_parties, threshold, n8 = struct.unpack_from(
        "<IIIII", h, 0
    )
    prime = limbs_to_int(le_bytes_to_limbs(h[20 : 20 + n8], n8)[0])
    field = _FIELDS[prime]
    pub_sec = c.section(2)
    (npub,) = struct.unpack_from("<I", pub_sec, 0)
    pubs = [
        limbs_to_int(r) for r in le_bytes_to_limbs(pub_sec[4:], n8)[:npub]
    ]
    share_a = mont.to_mont(
        field, jnp.asarray(le_bytes_to_limbs(c.section(3), n8))
    )
    share_b = None
    if 4 in c.sections:
        share_b = mont.to_mont(
            field, jnp.asarray(le_bytes_to_limbs(c.section(4), n8))
        )
    return SharedWitnessFile(
        protocol, party_id, n_parties, threshold, field, pubs, share_a, share_b
    )


def split_witness_rep3(field: Field, witness: list[int], n_instance: int,
                       rng) -> list[bytes]:
    """Full wtns vector -> 3 rep3 .shared files (reference split_witness,
    co-circom/src/lib.rs:46-80)."""
    pubs = witness[:n_instance]
    shares = rep3.share_field_elements(field, witness[n_instance:], rng)
    return [
        write_shared_witness(
            SharedWitnessFile(PROTO_REP3, i, 3, 1, field, pubs, s.a, s.b)
        )
        for i, s in enumerate(shares)
    ]


def split_witness_shamir(field: Field, witness: list[int], n_instance: int,
                         n: int, t: int, rng) -> list[bytes]:
    pubs = witness[:n_instance]
    shares = shamir.share_values(field, witness[n_instance:], n, t, rng)
    return [
        write_shared_witness(
            SharedWitnessFile(PROTO_SHAMIR, i, n, t, field, pubs, s, None)
        )
        for i, s in enumerate(shares)
    ]


# -- shared input files (JSON; witness-extension inputs) --------------------

def split_input_rep3(field: Field, inputs: dict, rng,
                     public_keys: set[str] = frozenset()) -> list[str]:
    """input.json dict (name -> int | [int...]) -> 3 per-party JSON strings
    (the reference's Rep3SharedInput, co-circom-types lib.rs:207+)."""
    outs = [{} for _ in range(3)]
    for name, value in inputs.items():
        flat = value if isinstance(value, list) else [value]
        flat = [int(v) for v in flat]
        if name in public_keys:
            for o in outs:
                o[name] = {
                    "kind": "public",
                    "values": [str(v) for v in flat],
                    "shape": "list" if isinstance(value, list) else "scalar",
                }
        else:
            shares = rep3.share_field_elements(field, flat, rng)
            for i, o in enumerate(outs):
                a = mont.decode(field, shares[i].a)
                b = mont.decode(field, shares[i].b)
                o[name] = {
                    "kind": "shared",
                    "a": [str(v) for v in a],
                    "b": [str(v) for v in b],
                    "shape": "list" if isinstance(value, list) else "scalar",
                }
    return [json.dumps(o, indent=1) for o in outs]


def merge_input_shares(parts: list[str]) -> str:
    """Merge input shares from multiple providers into one per-party file,
    checking public-input consistency (reference merge_input_shares)."""
    merged = {}
    for part in parts:
        d = json.loads(part)
        for name, entry in d.items():
            if name in merged:
                if merged[name] != entry:
                    raise ValueError(
                        f"inconsistent duplicate input '{name}' during merge"
                    )
            else:
                merged[name] = entry
    return json.dumps(merged, indent=1)

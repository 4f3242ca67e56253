"""UltraHonk proof system (coNoir proving stack).

TPU-native re-implementation of the reference's ultrahonk / co-noir-common
crates (co-noir/ultrahonk/src/lib.rs:14-20, co-noir-common/src): the
Barretenberg-compatible UltraHonk prover/verifier used as the backend of
the coNoir pipeline. Layout:

- transcript: Fiat-Shamir transcript, Poseidon2Sponge + Keccak256 flavors
  (co-noir-common/src/transcript.rs, sponge_hasher.rs, keccak_hash.rs)
- crs: Barretenberg CRS .dat parsing + local known-tau generation
  (co-noir-common/src/crs/parse.rs)
- polyops: dense polynomial / multilinear helpers over python-int Fr
- builder: UltraCircuitBuilder — ACIR -> execution trace -> proving key
  (co-builder/src/ultra_builder.rs)
- relations: the 9 Ultra relation families / 28 subrelations
  (ultrahonk/src/decider/relations/)
- prover / verifier: oink + sumcheck + shplemini/KZG
"""

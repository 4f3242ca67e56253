#!/usr/bin/env bash
# 3-party Rep3 co-Groth16 over real TCP sockets, one process per party
# (the reference's co-circom/examples/groth16/run.sh pipeline).
set -euo pipefail
cd "$(dirname "$0")/.."
TV=/root/reference/test_vectors/Groth16/bn254/multiplier2
OUT=$(mktemp -d)

python -m cosnarks_tpu generate-witness \
    --circuit /root/reference/test_vectors/WitnessExtension/tests/multiplier2.circom \
    --input <(echo '{"a": "3", "b": "11"}') --out "$OUT/witness.wtns"

python -m cosnarks_tpu split-witness --witness "$OUT/witness.wtns" \
    --zkey "$TV/circuit.zkey" --protocol REP3 --out-dir "$OUT"

for i in 0 1 2; do
  python -m cosnarks_tpu generate-proof groth16 --zkey "$TV/circuit.zkey" \
      --witness "$OUT/witness.wtns.$i.shared" \
      --config examples/configs/tls/party$i.toml \
      --out "$OUT/proof.$i.json" --public-input "$OUT/public.$i.json" &
done
wait

python -m cosnarks_tpu verify groth16 --vk "$TV/verification_key.json" \
    --proof "$OUT/proof.0.json" --public-input "$OUT/public.0.json"
cmp "$OUT/proof.0.json" "$OUT/proof.1.json" && cmp "$OUT/proof.0.json" "$OUT/proof.2.json" \
    && echo "all parties produced the identical proof"

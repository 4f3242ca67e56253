"""CLI pipeline test: split-witness -> generate-proof (local parties) ->
verify, mirroring the reference's example shell pipelines
(co-circom/examples/groth16/run.sh)."""

import os
import subprocess
import sys

BASE = "/root/reference/test_vectors/Groth16/bn254/multiplier2/"


def run_cli(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    # drop the axon-tunnel trigger: the baked sitecustomize force-selects
    # the TPU backend whenever PALLAS_AXON_POOL_IPS is set, overriding
    # JAX_PLATFORMS — a CLI subprocess would then contend for the
    # single-tenant TPU tunnel and wedge if any other process holds it
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, "-m", "cosnarks_tpu", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, f"CLI failed: {r.stdout}\n{r.stderr}"
    return r.stdout


def test_cli_pipeline_rep3(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    run_cli(
        ["split-witness", "--witness", BASE + "witness.wtns",
         "--zkey", BASE + "circuit.zkey", "--protocol", "REP3",
         "--out-dir", str(tmp_path)], repo,
    )
    shares = [str(tmp_path / f"witness.wtns.{i}.shared") for i in range(3)]
    assert all(os.path.exists(s) for s in shares)
    run_cli(
        ["generate-proof", "groth16", "--zkey", BASE + "circuit.zkey",
         "--witness", *shares, "--local-parties", "3",
         "--out", str(tmp_path / "proof.json"),
         "--public-input", str(tmp_path / "public.json")], repo,
    )
    out = run_cli(
        ["verify", "groth16", "--vk", BASE + "verification_key.json",
         "--proof", str(tmp_path / "proof.json"),
         "--public-input", str(tmp_path / "public.json")], repo,
    )
    assert "OK" in out


def test_cli_split_input_and_merge(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inp = tmp_path / "input.json"
    inp.write_text('{"a": "3", "b": "11"}')
    run_cli(["split-input", "--input", str(inp), "--out-dir", str(tmp_path)],
            repo)
    parts = [str(tmp_path / f"input.json.{i}.shared") for i in range(3)]
    assert all(os.path.exists(p) for p in parts)
    run_cli(["merge-input-shares", "--inputs", parts[0],
             "--out", str(tmp_path / "merged.json")], repo)

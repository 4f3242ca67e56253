"""Raw transport benchmark: per-message latency and bulk throughput of a
3-party mesh (counterpart of the reference's mpc-net/examples/bench.rs).

Usage:
  python examples/net_bench.py              # in-process LocalNetwork
  python examples/net_bench.py tcp          # 3 localhost TCP parties

Prints per-transport round-trip latency (1 B ring pass) and throughput
(16 MiB ring pass) per party.
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cosnarks_tpu.mpc.net.local import run_parties  # noqa: E402

SMALL_ROUNDS = 200
BULK_BYTES = 16 << 20
BULK_ROUNDS = 4


def drive(net):
    # warmup + latency: 1-byte ring passes
    payload = b"x"
    for _ in range(10):
        net.reshare(payload)
    t0 = time.monotonic()
    for _ in range(SMALL_ROUNDS):
        net.reshare(payload)
    lat = (time.monotonic() - t0) / SMALL_ROUNDS
    # throughput: 16 MiB ring passes
    bulk = os.urandom(BULK_BYTES)
    t0 = time.monotonic()
    for _ in range(BULK_ROUNDS):
        net.reshare(bulk)
    dt = time.monotonic() - t0
    gbps = BULK_ROUNDS * BULK_BYTES * 8 / dt / 1e9
    return lat * 1e6, gbps


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "local"
    if mode == "local":
        res = run_parties([drive] * 3)
    else:
        from cosnarks_tpu.mpc.net.tcp import TcpNetwork, form_mesh

        addrs = [("127.0.0.1", 18880 + i) for i in range(3)]
        res = [None] * 3

        def party(i):
            socks = form_mesh(i, addrs, n_conns=2)
            net = TcpNetwork(i, 3, socks, duplex_split=True)
            res[i] = drive(net)
            net.close()

        ts = [threading.Thread(target=party, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    for i, (lat_us, gbps) in enumerate(res):
        print(f"party {i}: ring latency {lat_us:8.1f} us/round, "
              f"throughput {gbps:6.2f} Gbit/s ({mode})")


if __name__ == "__main__":
    main()

"""Transport tests: TCP mesh on localhost (mirrors mpc-net/tests/tcp.rs)."""

import threading

import numpy as np

from cosnarks_tpu.mpc.net.tcp import TcpNetwork


def test_tcp_mesh_3party():
    addrs = [("127.0.0.1", 19750 + i) for i in range(3)]
    nets = [None] * 3

    def setup(i):
        nets[i] = TcpNetwork.connect(i, addrs)

    ts = [threading.Thread(target=setup, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(30)
    assert all(n is not None for n in nets)

    results = [None] * 3

    def party(i):
        n = nets[i]
        arr = np.arange(10, dtype=np.uint32) + i
        got = n.reshare(arr)  # send next, recv prev
        pytree = n.reshare_backward({"x": arr * 2})
        results[i] = (got, pytree)

    ts = [threading.Thread(target=party, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(30)
    for i in range(3):
        got, pytree = results[i]
        assert np.array_equal(got, np.arange(10, dtype=np.uint32) + (i - 1) % 3)
        assert np.array_equal(
            pytree["x"], (np.arange(10, dtype=np.uint32) + (i + 1) % 3) * 2
        )
    stats = nets[0].stats()
    assert sum(v for (p, kind), v in stats.items() if kind == "sent") > 0
    for n in nets:
        n.close()

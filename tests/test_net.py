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


def test_tls_mesh_3party(tmp_path):
    """Mutually-authenticated TLS mesh (mirrors mpc-net/tests via tls.rs):
    reshare round-trips, and a party with the wrong key is rejected."""
    from cosnarks_tpu.mpc.net.tls import TlsNetwork, generate_self_signed

    certs, keys = {}, {}
    for i in range(3):
        keys[i] = str(tmp_path / f"p{i}.key")
        certs[i] = str(tmp_path / f"p{i}.pem")
        generate_self_signed(f"party{i}", keys[i], certs[i])

    addrs = [("127.0.0.1", 19850 + i) for i in range(3)]
    nets = [None] * 3
    errs = []

    def setup(i):
        try:
            nets[i] = TlsNetwork.connect_tls(
                i, addrs, keys[i], certs[i],
                {j: certs[j] for j in range(3) if j != i}, timeout=20.0)
        except Exception as e:  # surfaced below
            errs.append((i, e))

    ts = [threading.Thread(target=setup, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(30)
    assert not errs, errs
    assert all(n is not None for n in nets)

    results = [None] * 3

    def party(i):
        n = nets[i]
        arr = np.arange(8, dtype=np.uint32) * (i + 1)
        results[i] = n.reshare(arr)

    ts = [threading.Thread(target=party, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(30)
    for i in range(3):
        prev = (i - 1) % 3
        assert np.array_equal(results[i], np.arange(8, dtype=np.uint32) * (prev + 1))
    for n in nets:
        n.close()


def test_tls_rejects_wrong_identity(tmp_path):
    """A dialer claiming id 1 while holding party 2's key must be refused
    (DER equality check against the configured certificate for the id)."""
    import socket
    import ssl
    import struct

    from cosnarks_tpu.mpc.net.tls import TlsNetwork, generate_self_signed

    certs, keys = {}, {}
    for i in range(3):
        keys[i] = str(tmp_path / f"q{i}.key")
        certs[i] = str(tmp_path / f"q{i}.pem")
        generate_self_signed(f"party{i}", keys[i], certs[i])

    addrs = [("127.0.0.1", 19860 + i) for i in range(3)]
    failed = []

    def server():
        try:
            TlsNetwork.connect_tls(
                0, addrs, keys[0], certs[0],
                {1: certs[1], 2: certs[2]}, timeout=8.0)
        except Exception as e:
            failed.append(e)

    t = threading.Thread(target=server, daemon=True)
    t.start()

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.check_hostname = False
    ctx.verify_mode = ssl.CERT_NONE
    ctx.load_cert_chain(certs[2], keys[2])  # party 2's key ...
    import time as _time
    deadline = _time.time() + 8
    while True:
        try:
            raw = socket.create_connection(addrs[0], timeout=2.0)
            break
        except OSError:
            if _time.time() > deadline:
                raise
            _time.sleep(0.1)
    tsock = ctx.wrap_socket(raw)
    try:
        tsock.sendall(struct.pack("<I", 1))  # ... claiming to be party 1
        tsock.recv(1)
    except OSError:
        pass
    t.join(12)
    assert failed, "mesh accepted a peer with a mismatched certificate"


def test_concurrent_channels_hide_latency():
    """VERDICT acceptance for concurrent rounds: two independent
    multi-round protocol chains over separate channels + join() take
    ~half the wall-time of running them back-to-back when per-message
    latency dominates (reference mpc_net::join over multi-connection
    meshes, mpc-net/src/lib.rs:139-308)."""
    import time

    from cosnarks_tpu.mpc.net.base import join
    from cosnarks_tpu.mpc.net.local import LocalNetwork, run_parties

    delay, rounds = 0.004, 10

    class Delayed:
        def __init__(self, net):
            self._net = net
            self.id = net.id
            self.n_parties = net.n_parties

        def send(self, to, msg, chan=0):
            time.sleep(delay)  # injected wire latency
            self._net.send(to, msg, chan=chan)

        def recv(self, frm, chan=0):
            return self._net.recv(frm, chan=chan)

        channels = LocalNetwork.channels
        reshare = LocalNetwork.reshare
        next_id = LocalNetwork.next_id
        prev_id = LocalNetwork.prev_id

    def chain(net, x):
        for _ in range(rounds):
            x = net.reshare(x)
        return x

    def party(raw):
        net = Delayed(raw)
        c1, c2 = net.channels(2)
        t0 = time.monotonic()
        a = chain(c1, net.id)
        b = chain(c2, net.id + 10)
        t_seq = time.monotonic() - t0
        t0 = time.monotonic()
        a2, b2 = join(lambda: chain(c1, net.id),
                      lambda: chain(c2, net.id + 10))
        t_par = time.monotonic() - t0
        assert (a, b) == (a2, b2)
        return t_seq, t_par

    res = run_parties([party] * 3)
    t_seq = max(r[0] for r in res)
    t_par = max(r[1] for r in res)
    assert t_par < 0.75 * t_seq, (t_seq, t_par)


def test_tcp_session_handler():
    """Ephemeral sessions (net/tcp_session.py; reference tcp_session.rs):
    one bound handler per party mints independent meshes per session id —
    two sequential sessions exchange correctly, including out-of-order
    initialization across parties."""
    import threading

    from cosnarks_tpu.mpc.net.tcp_session import TcpSessionHandler

    addrs = [("127.0.0.1", 18860 + i) for i in range(3)]
    results = {}
    errs = []

    def party(i):
        try:
            h = TcpSessionHandler(i, addrs, timeout=20.0,
                                  insecure_plaintext=True)
            out = []
            for sid in (b"job-A", b"job-B"):
                net = h.init_session(sid)
                got = net.reshare((i, sid))  # ring round on the session
                out.append(got)
                net.close()
            results[i] = out
            h.close()
        except Exception as e:  # noqa: BLE001
            errs.append((i, e))

    ts = [threading.Thread(target=party, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(60)
    assert not errs, errs
    for i in range(3):
        assert results[i][0] == ((i - 1) % 3, b"job-A")
        assert results[i][1] == ((i - 1) % 3, b"job-B")


def test_tcp_session_requires_tls_or_optin():
    """Plaintext ephemeral sessions need the same explicit opt-in as
    NetworkConfig.connect (ADVICE r3): no wrap hooks + no flag = refused."""
    import pytest

    from cosnarks_tpu.mpc.net.tcp_session import TcpSessionHandler

    with pytest.raises(ValueError, match="insecure_plaintext"):
        TcpSessionHandler(0, [("127.0.0.1", 18890)])


def _udp_mesh(ports_base, loss=0.0):
    from cosnarks_tpu.mpc.net.udp import UdpNetwork

    addrs = [("127.0.0.1", ports_base + i) for i in range(3)]
    return [UdpNetwork(i, addrs, recv_timeout=30.0, loss_rate=loss,
                       seed=42) for i in range(3)]


def test_udp_mesh_3party_large_and_channels():
    """QUIC-equivalent UDP transport (net/udp.py): ordered reliable
    delivery incl. multi-fragment messages (200 KB ~ 170 datagrams) and
    lazily-created concurrent channels (the QUIC-stream analog)."""
    nets = _udp_mesh(19820)
    results = [None] * 3

    def party(i):
        n = nets[i]
        big = (np.arange(50_000, dtype=np.uint32) * (i + 1))
        got = n.reshare(big)
        chans = n.channels(2)
        chans[0].send(n.next_id, {"c": np.uint32(i)})
        chans[1].send(n.next_id, np.full(3, i, np.uint32))
        c1 = chans[1].recv(n.prev_id)  # out of send order across chans
        c0 = chans[0].recv(n.prev_id)
        results[i] = (got, c0, c1)

    ts = [threading.Thread(target=party, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(60)
    for i in range(3):
        got, c0, c1 = results[i]
        prev = (i - 1) % 3
        assert np.array_equal(
            got, np.arange(50_000, dtype=np.uint32) * (prev + 1))
        assert int(np.asarray(c0["c"]).ravel()[0]) == prev
        assert np.array_equal(c1, np.full(3, prev, np.uint32))
    assert sum(v for (p, k), v in nets[0].stats().items()
               if k == "sent") > 0
    for n in nets:
        n.flush()
        n.close()


def test_udp_arq_recovers_from_loss():
    """15% injected datagram loss in BOTH directions: the Go-Back-N ARQ
    must still deliver every message exactly once, in order."""
    nets = _udp_mesh(19830, loss=0.15)
    results = [None] * 3

    def party(i):
        n = nets[i]
        out = []
        for r in range(5):
            msg = n.reshare(np.arange(2_000, dtype=np.uint32) + 1000 * i + r)
            out.append(int(msg[0]) - 1000 * ((i - 1) % 3))
        results[i] = out

    ts = [threading.Thread(target=party, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(120)
    for i in range(3):
        assert results[i] == [0, 1, 2, 3, 4], results[i]
    for n in nets:
        n.close()

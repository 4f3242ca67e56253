"""TCP transport: full-mesh party network over sockets.

Counterpart of the reference's TCP backend (mpc-net/src/tcp.rs:22-80 +
blocking.rs): length-prefixed frames, a background reader thread per peer
feeding per-sender queues (preserves the per-peer ordering contract of
`Network`), keepalive, connect retry with deadline.
"""

from __future__ import annotations

import queue
import socket
import struct
import threading
import time

from .base import Network, from_wire, to_wire


class TcpNetwork(Network):
    def __init__(self, my_id: int, n_parties: int, socks: dict,
                 recv_timeout: float = 300.0):
        self.id = my_id
        self.n_parties = n_parties
        self.recv_timeout = recv_timeout
        self._socks = socks  # peer id -> socket
        self._inbox = {p: queue.Queue() for p in socks}
        self._lock = {p: threading.Lock() for p in socks}
        self._alive = True
        self._readers = []
        for p, s in socks.items():
            t = threading.Thread(target=self._reader, args=(p, s), daemon=True)
            t.start()
            self._readers.append(t)

    # -- connection establishment ------------------------------------------
    @classmethod
    def connect(cls, my_id: int, addrs: list[tuple[str, int]],
                timeout: float = 30.0, recv_timeout: float = 300.0,
                server_wrap=None, client_wrap=None) -> "TcpNetwork":
        socks = form_mesh(my_id, addrs, timeout,
                          server_wrap=server_wrap, client_wrap=client_wrap)
        return cls(my_id, len(addrs), socks, recv_timeout=recv_timeout)

    # -- transport ----------------------------------------------------------
    def _reader(self, peer: int, sock: socket.socket):
        try:
            while self._alive:
                hdr = _recv_exact(sock, 4)
                (ln,) = struct.unpack("<I", hdr)
                data = _recv_exact(sock, ln)
                self._count(peer, ln, sent=False)
                self._inbox[peer].put(from_wire(data))
        except (OSError, ConnectionError):
            self._inbox[peer].put(_Closed())

    def send(self, to: int, msg) -> None:
        data = to_wire(msg)
        self._count(to, len(data), sent=True)
        with self._lock[to]:
            self._socks[to].sendall(struct.pack("<I", len(data)) + data)

    def recv(self, frm: int):
        msg = self._inbox[frm].get(timeout=self.recv_timeout)
        if isinstance(msg, _Closed):
            raise ConnectionError(f"peer {frm} closed connection")
        return msg

    def close(self):
        self._alive = False
        for s in self._socks.values():
            try:
                s.close()
            except OSError:
                pass


class _Closed:
    pass


def form_mesh(my_id: int, addrs: list[tuple[str, int]], timeout: float = 30.0,
              server_wrap=None, client_wrap=None) -> dict:
    """Establish the full mesh: party i listens on addrs[i] and dials every
    lower-id party (so the mesh forms without races). Returns {peer: sock}.

    `server_wrap(sock)` / `client_wrap(sock, peer_id)` hooks let the TLS
    backend wrap each connection (handshake) before the party-id exchange;
    the id is then exchanged over the wrapped (authenticated) channel and
    `server_wrap`'s result may carry a `verify_peer(peer_id)` callable that
    checks the presented certificate belongs to the claimed id."""
    n = len(addrs)
    socks: dict[int, socket.socket] = {}
    err: list[BaseException] = []
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("0.0.0.0", addrs[my_id][1]))
    srv.listen(n)
    srv.settimeout(timeout)

    def accept_all():
        try:
            for _ in range(n - 1 - my_id):
                conn, _ = srv.accept()
                verify = None
                if server_wrap is not None:
                    conn, verify = server_wrap(conn)
                peer = struct.unpack("<I", _recv_exact(conn, 4))[0]
                if verify is not None:
                    verify(peer)
                _setup_sock(conn)
                socks[peer] = conn
        except BaseException as e:  # surfaced after join
            err.append(e)

    acceptor = threading.Thread(target=accept_all, daemon=True)
    acceptor.start()

    deadline = time.time() + timeout
    for p in range(my_id):
        host, port = addrs[p]
        while True:
            try:
                c = socket.create_connection((host, port), timeout=2.0)
                break
            except OSError:
                if time.time() > deadline:
                    raise TimeoutError(f"cannot reach party {p}")
                time.sleep(0.1)
        if client_wrap is not None:
            c = client_wrap(c, p)
        c.sendall(struct.pack("<I", my_id))
        _setup_sock(c)
        socks[p] = c
    acceptor.join(timeout)
    if err:
        raise err[0]
    if len(socks) != n - 1:
        raise TimeoutError("mesh incomplete")
    srv.close()
    return socks


def _setup_sock(s: socket.socket):
    s.settimeout(None)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    s.setsockopt(socket.SOL_SOCKET, socket.SO_KEEPALIVE, 1)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("socket closed")
        buf.extend(chunk)
    return bytes(buf)

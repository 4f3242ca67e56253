"""Party-to-party network abstraction.

TPU-native split of the reference's mpc-net (SURVEY.md L1): this layer is
*inter-party* transport only (the reference's `Network` trait,
mpc-net/src/lib.rs:34-63 — id / send(to) / recv(from) / ordered per peer);
*intra-party* scale-out is jax.sharding collectives, not sockets.

Messages are arbitrary pytrees of jax/numpy arrays; transports that cross
process boundaries serialize leaves as raw little-endian buffers.
"""

from __future__ import annotations

import abc

from . import wire


class Network(abc.ABC):
    """Blocking, per-peer-ordered message transport for one party."""

    id: int
    n_parties: int

    @abc.abstractmethod
    def send(self, to: int, msg) -> None: ...

    @abc.abstractmethod
    def recv(self, frm: int): ...

    # -- protocol sugar (mirrors Rep3NetworkExt, rep3/network.rs:12-100) ----
    @property
    def next_id(self) -> int:
        return (self.id + 1) % self.n_parties

    @property
    def prev_id(self) -> int:
        return (self.id - 1) % self.n_parties

    def reshare(self, msg):
        """Send to next party, receive from previous (rep3 reshare round)."""
        self.send(self.next_id, msg)
        return self.recv(self.prev_id)

    def reshare_backward(self, msg):
        """Send to previous party, receive from next."""
        self.send(self.prev_id, msg)
        return self.recv(self.next_id)

    def broadcast(self, msg):
        """Send to all others; receive from all others (deadlock-free order:
        send ascending, then receive ascending, cf. rep3/network.rs:64-74).
        Returns dict {party_id: msg}."""
        for p in range(self.n_parties):
            if p != self.id:
                self.send(p, msg)
        return {
            p: self.recv(p) for p in range(self.n_parties) if p != self.id
        }

    def channels(self, n: int) -> list["Network"]:
        """n independent logical sub-networks over this transport for
        CONCURRENT protocol rounds (reference TcpNetwork::networks::<N>,
        mpc-net/src/lib.rs:139-308; used by co-plonk's 8-net round1,
        co-plonk/src/round1.rs:19). Views use channels 1..n, leaving the
        default stream (channel 0) to the caller; message order is
        preserved per (peer, channel) but not across channels. Transports
        raise if they were not provisioned with enough connections."""
        return [ChannelView(self, i + 1) for i in range(n)]

    def stats(self) -> dict:
        """Per-peer byte counters (ConnectionStats, mpc-net/src/lib.rs:88)."""
        return getattr(self, "_stats", {})

    def _count(self, peer: int, nbytes: int, sent: bool):
        st = self.__dict__.setdefault("_stats", {})
        key = (peer, "sent" if sent else "recv")
        st[key] = st.get(key, 0) + nbytes


class ChannelView(Network):
    """Fixed-channel view over a multi-connection transport. The wrapped
    network's send/recv must accept a `chan` keyword."""

    def __init__(self, net: Network, chan: int):
        self._net = net
        self._chan = chan
        self.id = net.id
        self.n_parties = net.n_parties

    def send(self, to: int, msg) -> None:
        self._net.send(to, msg, chan=self._chan)

    def recv(self, frm: int):
        return self._net.recv(frm, chan=self._chan)


def join(*thunks):
    """Run independent protocol closures concurrently, one thread each
    (reference mpc_net::join / join8, mpc-net/src/lib.rs:139-308). Each
    closure must use its OWN channel/rng fork; returns results in order,
    re-raising the first failure."""
    import threading

    results = [None] * len(thunks)
    errors = [None] * len(thunks)

    def runner(i):
        try:
            results[i] = thunks[i]()
        except BaseException as e:  # noqa: BLE001 - surface to caller
            errors[i] = e

    ts = [threading.Thread(target=runner, args=(i,))
          for i in range(len(thunks))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for e in errors:
        if e is not None:
            raise e
    return results


def to_wire(msg) -> bytes:
    """Message -> bytes via the typed TLV format (wire.py) — no pickle, no
    code execution on decode, frame length capped."""
    return wire.encode(msg)


def from_wire(data: bytes):
    return wire.decode(data)

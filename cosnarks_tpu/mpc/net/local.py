"""In-process queue-based network for tests/benches — the counterpart of the
reference's LocalNetwork (crossbeam channels, mpc-net/src/local.rs:13-64).

Parties run as threads in one process; messages pass by reference (device
arrays are immutable, so zero-copy is safe). A send timeout doubles as the
deadlock detector the reference gets from bounded channels (local.rs:74-78).
"""

from __future__ import annotations

import queue
import threading

from .base import Network


N_CHANNELS = 9  # default stream + 8 concurrent-round channels (join8)


class LocalNetwork(Network):
    def __init__(self, my_id: int, n_parties: int, mailboxes):
        self.id = my_id
        self.n_parties = n_parties
        # mailboxes[chan][receiver][sender] -> Queue
        self._mailboxes = mailboxes

    @classmethod
    def make(cls, n_parties: int, timeout: float = 120.0):
        mailboxes = [
            [[queue.Queue() for _ in range(n_parties)]
             for _ in range(n_parties)]
            for _ in range(N_CHANNELS)
        ]
        nets = [cls(i, n_parties, mailboxes) for i in range(n_parties)]
        for n in nets:
            n._timeout = timeout
        return nets

    def send(self, to: int, msg, chan: int = 0) -> None:
        self._mailboxes[chan][to][self.id].put(msg)

    def recv(self, frm: int, chan: int = 0):
        try:
            return self._mailboxes[chan][self.id][frm].get(
                timeout=getattr(self, "_timeout", 120.0)
            )
        except queue.Empty:
            raise TimeoutError(
                f"party {self.id}: recv from {frm} timed out (deadlock?)"
            )


def run_parties(fns, n_parties: int | None = None, timeout: float = 3600.0):
    """Run one closure per party on threads over a LocalNetwork; returns
    their results in party order. Mirrors the reference test harness pattern
    (tests/tests/circom/e2e_tests/rep3.rs:57-70)."""
    if n_parties is None:
        n_parties = len(fns)
    nets = LocalNetwork.make(n_parties)
    results: list = [None] * n_parties
    errors: list = [None] * n_parties

    def runner(i):
        try:
            results[i] = fns[i](nets[i])
        except BaseException as e:  # noqa: BLE001 - surface to main thread
            errors[i] = e

    threads = [
        threading.Thread(target=runner, args=(i,), daemon=True)
        for i in range(n_parties)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=timeout)
        if t.is_alive():
            raise TimeoutError("party thread did not finish")
    for e in errors:
        if e is not None:
            raise e
    return results

"""Tests for the ChaCha20 device PRF and the typed wire format."""

import numpy as np
import pytest

from cosnarks_tpu.mpc import chacha
from cosnarks_tpu.mpc.net import wire


# -- reference ChaCha20 in pure python (independent oracle) ------------------

def _rotl32(x, r):
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def _qr(s, a, b, c, d):
    s[a] = (s[a] + s[b]) & 0xFFFFFFFF
    s[d] = _rotl32(s[d] ^ s[a], 16)
    s[c] = (s[c] + s[d]) & 0xFFFFFFFF
    s[b] = _rotl32(s[b] ^ s[c], 12)
    s[a] = (s[a] + s[b]) & 0xFFFFFFFF
    s[d] = _rotl32(s[d] ^ s[a], 8)
    s[c] = (s[c] + s[d]) & 0xFFFFFFFF
    s[b] = _rotl32(s[b] ^ s[c], 7)


def _chacha20_block(key_words, counter, nonce):
    s = (
        [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574]
        + list(key_words)
        + [counter & 0xFFFFFFFF, (counter >> 32) & 0xFFFFFFFF]
        + list(nonce)
    )
    w = list(s)
    for _ in range(10):
        _qr(w, 0, 4, 8, 12)
        _qr(w, 1, 5, 9, 13)
        _qr(w, 2, 6, 10, 14)
        _qr(w, 3, 7, 11, 15)
        _qr(w, 0, 5, 10, 15)
        _qr(w, 1, 6, 11, 12)
        _qr(w, 2, 7, 8, 13)
        _qr(w, 3, 4, 9, 14)
    return [(a + b) & 0xFFFFFFFF for a, b in zip(w, s)]


def test_chacha_blocks_match_reference():
    key = bytes(range(32))
    kw = chacha.key_to_words(key)
    nonce = np.asarray([7, 42], dtype=np.uint32)
    got = np.asarray(chacha.blocks(kw, nonce, 3))
    for blk in range(3):
        exp = _chacha20_block(kw.tolist(), blk, [7, 42])
        assert got[blk].tolist() == exp


def test_chacha_limbs_cover_streams():
    key = bytes(range(32))
    kw = chacha.key_to_words(key)
    nonce = np.asarray([0, 1], dtype=np.uint32)
    limbs = np.asarray(chacha.limbs16(kw, nonce, 40))
    assert limbs.shape == (40,)
    assert (limbs <= 0xFFFF).all()
    # lo/hi interleave of the first block word
    w0 = _chacha20_block(kw.tolist(), 0, [0, 1])[0]
    assert limbs[0] == w0 & 0xFFFF and limbs[1] == w0 >> 16


def test_derive_key_domain_separated():
    k = bytes(32)
    assert chacha.derive_key(k, b"a") != chacha.derive_key(k, b"b")
    assert len(chacha.derive_key(k, b"a")) == 32


# -- wire format -------------------------------------------------------------

def test_wire_roundtrip_structures():
    msg = {
        "arr": np.arange(12, dtype=np.uint32).reshape(3, 4),
        "int": -(1 << 300),
        "list": [1, "two", None, True, b"\x00\xff"],
        "tup": (np.zeros(2, dtype=np.float64), 5),
    }
    out = wire.decode(wire.encode(msg))
    assert np.array_equal(out["arr"], msg["arr"])
    assert out["int"] == msg["int"]
    assert out["list"] == msg["list"]
    assert np.array_equal(out["tup"][0], msg["tup"][0])
    assert isinstance(out["tup"], tuple)


def test_wire_rejects_unknown_and_truncated():
    with pytest.raises(wire.WireError):
        wire.encode(object())
    data = wire.encode([1, 2, 3])
    with pytest.raises(wire.WireError):
        wire.decode(data[:-1])
    with pytest.raises(wire.WireError):
        wire.decode(bytes([0x7F]))


def test_wire_no_pickle_anywhere():
    import cosnarks_tpu.mpc.net.base as base
    import cosnarks_tpu.mpc.net.tcp as tcp
    import inspect

    for mod in (base, tcp, wire):
        src = inspect.getsource(mod)
        assert "import pickle" not in src
        assert "pickle.loads" not in src and "pickle.dumps" not in src


def test_wire_frame_cap(monkeypatch):
    monkeypatch.setattr(wire, "MAX_FRAME_LENGTH", 64)
    with pytest.raises(wire.WireError):
        wire.encode(np.zeros(1024, dtype=np.uint32))

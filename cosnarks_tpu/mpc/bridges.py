"""Share-translation bridges between protocols.

Port of mpc-core/src/protocols/bridges/rep3_to_shamir.rs:11-77: a Rep3
additive component x_i divided by the i-th degree-2t Lagrange coefficient is
a valid degree-2t Shamir share of the same secret (x = sum_i lam_i *
(x_i/lam_i)); one degree reduction yields fresh degree-t shares.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ff import mont
from ..ff.spec import Field
from . import shamir
from .rep3 import Share as Rep3Share


def translate_rep3_to_shamir(field: Field, rep3_share: Rep3Share, net,
                             state: shamir.ShamirState):
    """Rep3 replicated share -> degree-t Shamir share (3 parties, t=1).

    One communication round (the king degree reduction).
    """
    if state.n != 3 or state.t != 1:
        raise ValueError("rep3->shamir bridge requires n=3, t=1")
    lam = shamir.lagrange_at_zero(field, [0, 1, 2])[state.id]
    lam_inv = mont.constant(field, pow(lam, -1, field.p))
    y = mont.mul(field, rep3_share.a, lam_inv)  # valid degree-2 share
    return shamir.degree_reduce(field, y, net, state)

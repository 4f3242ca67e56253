"""Collaborative (Rep3) UltraHonk prover.

Mirrors co-ultrahonk/src/{co_oink/co_oink_prover.rs, co_ultra_prover.rs,
co_decider/*}: the witness polynomials are Rep3-shared, the precomputed
polynomials and the transcript are public. The proof bytes are identical
to a plain proof of the same witness — every transcript element is an
opened value:

- wire/lookup/z_perm commitments: additive MSM per party + point open
- log-derivative inverses: one masked mul round + zero-leaking batch
  inversion (compute_logderivative_inverses, co_oink_prover.rs:229)
- grand product: batched numerator/denominator muls + constant-round
  masked prefix products (compute_grand_product, co_oink_prover.rs:382;
  CoUtils::array_prod_mul)
- sumcheck: the plain round pipeline from prover.py runs unchanged over
  SVec entities — each shared*shared product inside relations.accumulate
  is one batched Rep3 multiplication round — with one open per round for
  the round univariate (co_sumcheck_prover.rs)
- gemini/shplonk/KZG: all coefficient algebra is linear in the shared
  polynomials; only commitments and claimed evaluations are opened.
"""

from __future__ import annotations

import numpy as np

from . import prover, relations
from .builder import R
from .co_driver import Rep3HonkDriver, SVec
from .prover import CONST_PROOF_SIZE_LOG_N, ENTITY_ORDER, \
    PAIRING_POINT_ACCUMULATOR_SIZE
from .proving_key import PRECOMPUTED, SHIFTED, WITNESS, ProvingKey
from .relations import FV
from .transcript import Transcript

SHARED_PK_ENTITIES = ("w_l", "w_r", "w_o", "w_4", "lookup_read_counts",
                      "lookup_read_tags")


def share_proving_key(pk: ProvingKey, rng) -> list[dict]:
    """Split the witness polynomials of a plain proving key into 3 Rep3
    share dicts (the reference's SplitProvingKey flow,
    co-noir/src/lib.rs split_proving_key_rep3)."""
    from ..mpc.rep3_scalar import Rep3Scalar

    per_party = [dict() for _ in range(3)]
    for name in SHARED_PK_ENTITIES:
        cols = [[], [], []]
        for v in pk.polynomials[name]:
            shares = Rep3Scalar.share(v, R)
            for k in range(3):
                cols[k].append(shares[k])
        for k in range(3):
            per_party[k][name] = cols[k]
    return per_party


def _shift(sv: SVec) -> SVec:
    za = np.zeros(1, dtype=object)
    return SVec(np.concatenate([sv.a[1:], za]),
                np.concatenate([sv.b[1:], za.copy()]), sv.drv)


def _poly_eval_shared(sv: SVec, x: int):
    """Horner evaluation of shared coefficients at a public point."""
    acc_a, acc_b = 0, 0
    for ca, cb in zip(reversed(sv.a), reversed(sv.b)):
        acc_a = (acc_a * x + int(ca)) % R
        acc_b = (acc_b * x + int(cb)) % R
    from ..mpc.rep3_scalar import AShare

    return AShare(acc_a, acc_b)


def _factor_roots_shared(sv: SVec, root: int) -> SVec:
    """(p(X) - p(root) already subtracted) / (X - root), component-wise
    synthetic division (linear in the shared coefficients)."""
    if root % R == 0:
        return SVec(sv.a[1:], sv.b[1:], sv.drv)
    ninv = pow(-root % R, -1, R)
    out_a = np.zeros(len(sv.a) - 1, dtype=object)
    out_b = np.zeros(len(sv.b) - 1, dtype=object)
    prev_a = prev_b = 0
    for i in range(len(sv.a) - 1):
        prev_a = (int(sv.a[i]) - prev_a) * ninv % R
        prev_b = (int(sv.b[i]) - prev_b) * ninv % R
        out_a[i] = prev_a
        out_b[i] = prev_b
    return SVec(out_a, out_b, sv.drv)


def _compute_skip_set(pk: ProvingKey) -> frozenset:
    """Families whose gating selector column is identically zero add
    nothing to the round univariates — skipping them is public
    information (the selector polynomials are public)."""
    skip = set()
    for fam, sel, _cnt in relations.FAMILIES:
        if sel is not None and not any(pk.polynomials[sel]):
            skip.add(fam)
    return frozenset(skip)


def co_prove(pk: ProvingKey, shared_witness: dict, vk, crs, hasher,
             drv: Rep3HonkDriver):
    """Rep3CoUltraHonk::prove (co_ultra_prover.rs:95): produce the same
    proof bytes as the plain prover from a shared witness. `pk` carries
    the public parts (precomputed polys, public inputs, records); the six
    prover witness polynomials come shared in `shared_witness`."""
    n = pk.circuit_size
    transcript = Transcript(hasher)
    pub = {name: pk.polynomials[name] for name in PRECOMPUTED}
    sw = {name: drv.from_shares(shared_witness[name])
          for name in SHARED_PK_ENTITIES}

    # -- oink ---------------------------------------------------------------
    vk_hash = vk.hash_into_transcript(transcript)
    transcript.add_fr_to_hash_buffer("VK_HASH", vk_hash)
    for i, pi in enumerate(pk.public_inputs):
        transcript.send_fr(f"PUBLIC_INPUT_{i}", pi)

    for name, label in (("w_l", "W_L"), ("w_r", "W_R"), ("w_o", "W_O")):
        transcript.send_point(label, drv.commit_open(sw[name], crs))

    eta = transcript.get_challenge("eta")
    etas = (eta, eta * eta % R, eta * eta * eta % R)
    w4 = SVec(sw["w_4"].a.copy(), sw["w_4"].b.copy(), drv)
    read_set = pk.memory_read_records
    write_set = pk.memory_write_records
    for idx in list(read_set) + list(write_set):
        add_a = (sw["w_l"].a[idx] * etas[0] + sw["w_r"].a[idx] * etas[1]
                 + sw["w_o"].a[idx] * etas[2]) % R
        add_b = (sw["w_l"].b[idx] * etas[0] + sw["w_r"].b[idx] * etas[1]
                 + sw["w_o"].b[idx] * etas[2]) % R
        w4.a[idx] = (w4.a[idx] + add_a) % R
        w4.b[idx] = (w4.b[idx] + add_b) % R
    one = drv.promote_vec([1])
    for idx in write_set:
        w4.a[idx] = (w4.a[idx] + int(one.a[0])) % R
        w4.b[idx] = (w4.b[idx] + int(one.b[0])) % R

    transcript.send_point("LOOKUP_READ_COUNTS",
                          drv.commit_open(sw["lookup_read_counts"], crs))
    transcript.send_point("LOOKUP_READ_TAGS",
                          drv.commit_open(sw["lookup_read_tags"], crs))
    transcript.send_point("W_4", drv.commit_open(w4, crs))

    beta, gamma = transcript.get_challenges(["beta", "gamma"])
    lookup_inverses = _co_logderiv_inverses(pk, sw, beta, gamma, drv)
    transcript.send_point("LOOKUP_INVERSES",
                          drv.commit_open(lookup_inverses, crs))

    public_input_delta = prover.compute_public_input_delta(
        beta, gamma, pk.public_inputs, pk.pub_inputs_offset)
    z_perm = _co_grand_product(pk, sw, w4, beta, gamma, drv)
    transcript.send_point("Z_PERM", drv.commit_open(z_perm, crs))

    alpha = transcript.get_challenge("alpha")
    alphas = [alpha]
    for _ in range(1, relations.NUM_ALPHAS):
        alphas.append(alphas[-1] * alpha % R)
    params = dict(eta_1=etas[0], eta_2=etas[1], eta_3=etas[2], beta=beta,
                  gamma=gamma, public_input_delta=public_input_delta)

    # -- entity table: public precomputed as FV, shared witness as SVec -----
    polys = {name: FV(np.array(pub[name], dtype=object))
             for name in PRECOMPUTED}
    polys["w_l"], polys["w_r"], polys["w_o"] = sw["w_l"], sw["w_r"], sw["w_o"]
    polys["w_4"] = w4
    polys["z_perm"] = z_perm
    polys["lookup_inverses"] = lookup_inverses
    polys["lookup_read_counts"] = sw["lookup_read_counts"]
    polys["lookup_read_tags"] = sw["lookup_read_tags"]
    for name in SHIFTED:
        src = polys[name]
        if isinstance(src, SVec):
            polys["shift_" + name] = _shift(src)
        else:
            polys["shift_" + name] = FV(
                np.concatenate([src.a[1:], np.zeros(1, dtype=object)]))

    log_n = pk.log_circuit_size
    virtual_log_n = CONST_PROOF_SIZE_LOG_N if hasher.USE_PADDING else log_n
    gate_challenges = transcript.get_powers_of_challenge(
        "Sumcheck:gate_challenge", virtual_log_n)

    skip = _compute_skip_set(pk)

    def send_univariate(label, univ):
        transcript.send_frs(label, [int(v) for v in drv.open_vec(univ)])

    challenges, evals = prover.sumcheck_prove(
        polys, params, alphas, gate_challenges, n, virtual_log_n,
        transcript, skip=skip, send_univariate=send_univariate)
    # open the shared claimed evaluations in one round; public precomputed
    # evaluations pass through untouched
    from ..mpc.rep3_scalar import AShare

    vals = [e.at(0) for e in evals]
    shared_idx = [i for i, v in enumerate(vals) if isinstance(v, AShare)]
    opened = drv.open_vec(SVec([vals[i].a for i in shared_idx],
                               [vals[i].b for i in shared_idx], drv))
    merged = list(vals)
    for i, v in zip(shared_idx, opened):
        merged[i] = int(v)
    transcript.send_frs("Sumcheck:evaluations", merged)

    _co_gemini_shplonk_kzg(polys, challenges, log_n, virtual_log_n, crs,
                           transcript, drv)

    proof = transcript.get_proof()
    num_public = pk.num_public_inputs - PAIRING_POINT_ACCUMULATOR_SIZE
    return proof[num_public:], proof[:num_public]


def _co_logderiv_inverses(pk, sw, beta, gamma, drv) -> SVec:
    """co_oink_prover.rs:229-293."""
    p = pk.polynomials
    n = pk.circuit_size
    beta_sqr = beta * beta % R
    beta_cub = beta_sqr * beta % R
    q_l_arr = np.array(p["q_r"], dtype=object)
    q_m_arr = np.array(p["q_m"], dtype=object)
    q_c_arr = np.array(p["q_c"], dtype=object)
    q_o_arr = np.array(p["q_o"], dtype=object)
    wl, wr, wo = sw["w_l"], sw["w_r"], sw["w_o"]
    wl_s, wr_s, wo_s = _shift(wl), _shift(wr), _shift(wo)
    # read term: shared, linear in the wires
    read = (wl + wl_s * q_l_arr
            + (wr + wr_s * q_m_arr) * beta
            + (wo + wo_s * q_c_arr) * beta_sqr)
    read = drv.add_public_vec(read, (gamma + q_o_arr * beta_cub) % R)
    # write term: public (table polynomials)
    write = (np.array(p["table_1"], dtype=object)
             + np.array(p["table_2"], dtype=object) * beta
             + np.array(p["table_3"], dtype=object) * beta_sqr
             + np.array(p["table_4"], dtype=object) * beta_cub + gamma) % R
    prod = read * write  # shared * public: local
    # mask = q_lookup + (1 - q_lookup) * read_tags
    q_lookup = np.array(p["q_lookup"], dtype=object)
    mask = sw["lookup_read_tags"] * ((1 - q_lookup) % R)
    mask = drv.add_public_vec(mask, q_lookup)
    masked = drv.mul_vec(prod, mask)
    return drv.inv_vec_leaking_zeros(masked)


def _co_grand_product(pk, sw, w4, beta, gamma, drv) -> SVec:
    """co_oink_prover.rs:382-470 + CoUtils::array_prod_mul."""
    p = pk.polynomials
    active = pk.active_region_data
    has_ranges = active.size() > 0
    domain_size = pk.final_active_wire_idx + 1
    idxs = active.idxs if has_ranges else list(range(domain_size))
    m = len(idxs)
    sel = idxs[:m - 1]

    def gather(sv: SVec) -> SVec:
        return SVec(sv.a[sel], sv.b[sel], drv)

    def gather_pub(name):
        arr = np.array(p[name], dtype=object)
        return arr[sel]

    def term(sv, perm_name):
        out = sv + gather_pub(perm_name) * beta
        return drv.add_public_vec(out, gamma)

    wl, wr, wo = gather(sw["w_l"]), gather(sw["w_r"]), gather(sw["w_o"])
    w4g = gather(w4)
    num1 = drv.mul_vec(term(wl, "id_1"), term(wr, "id_2"))
    num2 = drv.mul_vec(term(wo, "id_3"), term(w4g, "id_4"))
    den1 = drv.mul_vec(term(wl, "sigma_1"), term(wr, "sigma_2"))
    den2 = drv.mul_vec(term(wo, "sigma_3"), term(w4g, "sigma_4"))
    num = drv.mul_vec(num1, num2)
    den = drv.mul_vec(den1, den2)
    num = drv.array_prod_mul(num)
    den = drv.array_prod_mul(den)
    den = drv.inv_vec(den)
    z_vals = drv.mul_vec(num, den)

    z = drv.zeros(pk.circuit_size)
    one = drv.promote_vec([1])
    z.a[1], z.b[1] = int(one.a[0]), int(one.b[0])
    for k in range(m - 1):
        i = idxs[k + 1] if has_ranges else k + 1
        z.a[i], z.b[i] = int(z_vals.a[k]), int(z_vals.b[k])
    if has_ranges:
        for i in range(domain_size):
            for j in range(len(active.ranges) - 1):
                prev_end = active.ranges[j][1]
                next_start = active.ranges[j + 1][0]
                if prev_end <= i < next_start:
                    z.a[i], z.b[i] = z.a[next_start], z.b[next_start]
                    break
    return z


def _co_gemini_shplonk_kzg(polys, challenges, log_n, virtual_log_n, crs,
                           transcript, drv):
    """shplemini_prover.rs gemini_prove + shplonk_prove + KZG over shared
    coefficients — all coefficient algebra is linear; commitments and
    claimed evaluations are opened."""
    n = 1 << log_n
    rho = transcript.get_challenge("rho")

    batched_unshifted = drv.zeros(n)
    pub_acc = np.zeros(n, dtype=object)
    running = 1
    for name in PRECOMPUTED + WITNESS:
        src = polys[name]
        if isinstance(src, SVec):
            batched_unshifted = batched_unshifted + src * running
        else:
            pub_acc = (pub_acc + src.a * running) % R
        running = running * rho % R
    batched_unshifted = batched_unshifted + drv.promote_vec(pub_acc)
    batched_shifted = drv.zeros(n)
    for name in SHIFTED:
        batched_shifted = batched_shifted + polys[name] * running
        running = running * rho % R

    a_0 = SVec(batched_unshifted.a.copy(), batched_unshifted.b.copy(), drv)
    a_0.a[:n - 1] = (a_0.a[:n - 1] + batched_shifted.a[1:]) % R
    a_0.b[:n - 1] = (a_0.b[:n - 1] + batched_shifted.b[1:]) % R

    fold_polys = []
    a_l = a_0
    for layer in range(log_n - 1):
        a_l = a_l.fold(challenges[layer])
        fold_polys.append(a_l)
    last = fold_polys[-1] if fold_polys else a_0
    u_last = challenges[log_n - 1]
    final_eval_a = (int(last.a[0]) + u_last * (int(last.a[1]) - int(last.a[0]))) % R
    final_eval_b = (int(last.b[0]) + u_last * (int(last.b[1]) - int(last.b[0]))) % R
    fold_polys.append(SVec([final_eval_a], [final_eval_b], drv))
    tail = 1
    for k in range(log_n, virtual_log_n - 1):
        tail = tail * (1 - challenges[k]) % R
        fold_polys.append(SVec([final_eval_a * tail % R],
                               [final_eval_b * tail % R], drv))

    # only the first virtual_log_n - 1 folds are committed and claimed
    # (shplemini_prover.rs zips r_squares.skip(1) with the folds)
    fold_polys = fold_polys[:virtual_log_n - 1]
    for idx, fp in enumerate(fold_polys):
        transcript.send_point(f"Gemini:FOLD_{idx + 1}",
                              drv.commit_open(fp, crs))

    r = transcript.get_challenge("Gemini:r")
    r_inv = pow(r, -1, R)
    a_0_pos = SVec((batched_unshifted.a + batched_shifted.a * r_inv) % R,
                   (batched_unshifted.b + batched_shifted.b * r_inv) % R,
                   drv)
    a_0_neg = SVec((batched_unshifted.a - batched_shifted.a * r_inv) % R,
                   (batched_unshifted.b - batched_shifted.b * r_inv) % R,
                   drv)

    claims = []  # (SVec poly, challenge, AShare evaluation, gemini_fold)
    claims.append((a_0_pos, r, _poly_eval_shared(a_0_pos, r), False))
    claims.append((a_0_neg, -r % R, _poly_eval_shared(a_0_neg, -r % R),
                   False))
    r_sq = r
    for fp in fold_polys:
        r_sq = r_sq * r_sq % R
        claims.append((fp, -r_sq % R, _poly_eval_shared(fp, -r_sq % R),
                       True))

    evs = [c[2] for c in claims[1:virtual_log_n + 1]]
    opened_evs = drv.open_vec(SVec([e.a for e in evs], [e.b for e in evs],
                                   drv))
    # re-inject opened evaluations so the quotient algebra matches plain
    opened_map = {}
    for idx, ev in enumerate(opened_evs):
        transcript.send_fr(f"Gemini:a_{idx + 1}", int(ev))
        opened_map[idx + 1] = int(ev)

    nu = transcript.get_challenge("Shplonk:nu")
    # positive fold evals (shared, never sent)
    pos_evals = [_poly_eval_shared(cpoly, -chal % R)
                 for (cpoly, chal, _e, is_fold) in claims if is_fold]

    max_size = max(len(c[0]) for c in claims)
    size = 1
    while size < max_size:
        size *= 2
    q = drv.zeros(size)
    current_nu = 1
    fold_idx = 0
    for cpoly, chal, ev, is_fold in claims:
        if is_fold:
            tmp = SVec(cpoly.a.copy(), cpoly.b.copy(), drv)
            pe = pos_evals[fold_idx]
            tmp.a[0] = (int(tmp.a[0]) - pe.a) % R
            tmp.b[0] = (int(tmp.b[0]) - pe.b) % R
            tmp = _factor_roots_shared(tmp, -chal % R)
            q.a[:len(tmp.a)] = (q.a[:len(tmp.a)] + tmp.a * current_nu) % R
            q.b[:len(tmp.b)] = (q.b[:len(tmp.b)] + tmp.b * current_nu) % R
            current_nu = current_nu * nu % R
            fold_idx += 1
        tmp = SVec(cpoly.a.copy(), cpoly.b.copy(), drv)
        tmp.a[0] = (int(tmp.a[0]) - ev.a) % R
        tmp.b[0] = (int(tmp.b[0]) - ev.b) % R
        tmp = _factor_roots_shared(tmp, chal)
        q.a[:len(tmp.a)] = (q.a[:len(tmp.a)] + tmp.a * current_nu) % R
        q.b[:len(tmp.b)] = (q.b[:len(tmp.b)] + tmp.b * current_nu) % R
        current_nu = current_nu * nu % R

    transcript.send_point("Shplonk:Q", drv.commit_open(q, crs))
    z = transcript.get_challenge("Shplonk:z")

    denoms = []
    for cpoly, chal, ev, is_fold in claims:
        if is_fold:
            denoms.append((z + chal) % R)
        denoms.append((z - chal) % R)
    from .polyops import batch_invert

    denoms = batch_invert(denoms)
    g = SVec(q.a.copy(), q.b.copy(), drv)
    current_nu = 1
    idx = 0
    fold_idx = 0
    for cpoly, chal, ev, is_fold in claims:
        if is_fold:
            tmp_a = cpoly.a.copy()
            tmp_b = cpoly.b.copy()
            pe = pos_evals[fold_idx]
            tmp_a[0] = (int(tmp_a[0]) - pe.a) % R
            tmp_b[0] = (int(tmp_b[0]) - pe.b) % R
            sc = -current_nu * denoms[idx] % R
            g.a[:len(tmp_a)] = (g.a[:len(tmp_a)] + tmp_a * sc) % R
            g.b[:len(tmp_b)] = (g.b[:len(tmp_b)] + tmp_b * sc) % R
            current_nu = current_nu * nu % R
            idx += 1
            fold_idx += 1
        tmp_a = cpoly.a.copy()
        tmp_b = cpoly.b.copy()
        tmp_a[0] = (int(tmp_a[0]) - ev.a) % R
        tmp_b[0] = (int(tmp_b[0]) - ev.b) % R
        sc = -current_nu * denoms[idx] % R
        g.a[:len(tmp_a)] = (g.a[:len(tmp_a)] + tmp_a * sc) % R
        g.b[:len(tmp_b)] = (g.b[:len(tmp_b)] + tmp_b * sc) % R
        current_nu = current_nu * nu % R
        idx += 1

    w_poly = _factor_roots_shared(g, z)
    transcript.send_point("KZG:W", drv.commit_open(w_poly, crs))


def split_builder_pk(pk: ProvingKey, drv: Rep3HonkDriver):
    """Mixed-valued proving key (from an UltraBuilder running over the
    Rep3 VM driver — witness wires are replicated shares, precomputed
    polys are public ints) -> (public pk, shared_witness) in co_prove's
    format. The dealer-free counterpart of share_proving_key: nothing is
    opened here, the shares come straight out of the MPC build
    (reference co-builder create_keys, co-builder/src/lib.rs:102)."""
    from ..mpc.rep3_scalar import AShare

    def triv(v: int) -> AShare:
        v = int(v) % R
        if drv.id == 0:
            return AShare(v, 0)
        if drv.id == 2:
            return AShare(0, v)
        return AShare(0, 0)

    shared = {}
    for name in SHARED_PK_ENTITIES:
        col = pk.polynomials[name]
        shared[name] = [v if isinstance(v, AShare) else triv(v)
                        for v in col]
        pk.polynomials[name] = [0] * len(col)
    return pk, shared

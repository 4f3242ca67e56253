"""Plain UltraHonk prover (non-ZK): oink + sumcheck + shplemini + KZG.

Mirrors ultrahonk/src/{oink/oink_prover.rs, ultra_prover.rs,
decider/decider_prover.rs, decider/sumcheck/*, decider/shplemini/
shplemini_prover.rs}. Proof layout and transcript bit-compatible with
Barretenberg (CONST_PROOF_SIZE_LOG_N padding for the Poseidon2Sponge
flavor, natural log-n length for Keccak — anchored by the reference KAT
proof byte counts in test_vectors/noir/*/kat).

Sumcheck round univariates are computed vectorized over the edge axis
with numpy object arrays (relations.FV) — mathematically identical to
the reference's per-edge Univariate accumulation since barycentric
extension commutes with the edge sum.
"""

from __future__ import annotations

import numpy as np

from . import polyops, relations
from .proving_key import PRECOMPUTED, SHIFTED, WITNESS, ProvingKey
from .relations import FV, NUM_ALPHAS, R
from .transcript import Transcript

CONST_PROOF_SIZE_LOG_N = 25
BATCHED_RELATION_PARTIAL_LENGTH = 8
PAIRING_POINT_ACCUMULATOR_SIZE = 8
ENTITY_ORDER = PRECOMPUTED + WITNESS + tuple("shift_" + s for s in SHIFTED)


class RelationParams(dict):
    pass


# -- oink -------------------------------------------------------------------

def compute_w4(pk: ProvingKey, eta: tuple[int, int, int]) -> list[int]:
    """oink_prover.rs compute_w4: fold memory records into the 4th wire."""
    e1, e2, e3 = eta
    w4 = list(pk.polynomials["w_4"])
    wl, wr, wo = (pk.polynomials["w_l"], pk.polynomials["w_r"],
                  pk.polynomials["w_o"])
    for idx in pk.memory_read_records:
        w4[idx] = (w4[idx] + wl[idx] * e1 + wr[idx] * e2 + wo[idx] * e3) % R
    for idx in pk.memory_write_records:
        w4[idx] = (w4[idx] + wl[idx] * e1 + wr[idx] * e2 + wo[idx] * e3
                   + 1) % R
    return w4


def compute_logderivative_inverses(pk: ProvingKey, w4, beta, gamma):
    """oink_prover.rs compute_logderivative_inverses."""
    n = pk.circuit_size
    p = pk.polynomials
    beta_sqr = beta * beta % R
    beta_cub = beta_sqr * beta % R
    wl, wr, wo = p["w_l"], p["w_r"], p["w_o"]
    inv = [0] * n
    for i in range(n):
        if p["q_lookup"][i] != 1 and p["lookup_read_tags"][i] != 1:
            continue
        wl_s = wl[i + 1] if i + 1 < n else 0
        wr_s = wr[i + 1] if i + 1 < n else 0
        wo_s = wo[i + 1] if i + 1 < n else 0
        read = (wl[i] + gamma + p["q_r"][i] * wl_s
                + (wr[i] + p["q_m"][i] * wr_s) * beta
                + (wo[i] + p["q_c"][i] * wo_s) * beta_sqr
                + p["q_o"][i] * beta_cub) % R
        write = (p["table_1"][i] + gamma + p["table_2"][i] * beta
                 + p["table_3"][i] * beta_sqr
                 + p["table_4"][i] * beta_cub) % R
        inv[i] = read * write % R
    return polyops.batch_invert(inv)


def compute_public_input_delta(beta, gamma, public_inputs, pub_inputs_offset):
    """oink_prover.rs:238-282."""
    sep = 1 << 28
    num = den = 1
    num_acc = (gamma + (sep + pub_inputs_offset) * beta) % R
    den_acc = (gamma - (1 + pub_inputs_offset) * beta) % R
    for x in public_inputs:
        num = num * (num_acc + x) % R
        den = den * (den_acc + x) % R
        num_acc = (num_acc + beta) % R
        den_acc = (den_acc - beta) % R
    return num * pow(den, -1, R) % R


def compute_grand_product(pk: ProvingKey, w4, beta, gamma):
    """oink_prover.rs compute_grand_product (with active regions)."""
    p = pk.polynomials
    active = pk.active_region_data
    has_ranges = active.size() > 0
    domain_size = pk.final_active_wire_idx + 1
    idxs = active.idxs if has_ranges else list(range(domain_size))
    m = len(idxs)
    wl, wr, wo = p["w_l"], p["w_r"], p["w_o"]
    nums, dens = [], []
    for k in range(m - 1):
        i = idxs[k]
        num = ((wl[i] + p["id_1"][i] * beta + gamma)
               * (wr[i] + p["id_2"][i] * beta + gamma) % R
               * (wo[i] + p["id_3"][i] * beta + gamma) % R
               * (w4[i] + p["id_4"][i] * beta + gamma) % R)
        den = ((wl[i] + p["sigma_1"][i] * beta + gamma)
               * (wr[i] + p["sigma_2"][i] * beta + gamma) % R
               * (wo[i] + p["sigma_3"][i] * beta + gamma) % R
               * (w4[i] + p["sigma_4"][i] * beta + gamma) % R)
        nums.append(num)
        dens.append(den)
    for k in range(1, m - 1):
        nums[k] = nums[k] * nums[k - 1] % R
        dens[k] = dens[k] * dens[k - 1] % R
    dens = polyops.batch_invert(dens)
    z_perm = [0] * pk.circuit_size
    z_perm[1] = 1
    for k in range(m - 1):
        i = idxs[k + 1] if has_ranges else k + 1
        z_perm[i] = nums[k] * dens[k] % R
    if has_ranges:
        for i in range(domain_size):
            for j in range(len(active.ranges) - 1):
                prev_end = active.ranges[j][1]
                next_start = active.ranges[j + 1][0]
                if prev_end <= i < next_start:
                    z_perm[i] = z_perm[next_start]
                    break
    return z_perm


def oink_prove(pk: ProvingKey, vk, crs, transcript: Transcript):
    """oink_prover.rs prove (non-ZK). Returns (entity polys dict, params,
    alphas)."""
    # preamble: vk hash + public inputs
    vk_hash = vk.hash_into_transcript(transcript)
    transcript.add_fr_to_hash_buffer("VK_HASH", vk_hash)
    assert pk.num_public_inputs == len(pk.public_inputs)
    for i, pi in enumerate(pk.public_inputs):
        transcript.send_fr(f"PUBLIC_INPUT_{i}", pi)

    # wire commitments
    for name, label in (("w_l", "W_L"), ("w_r", "W_R"), ("w_o", "W_O")):
        transcript.send_point(label, polyops.commit(pk.polynomials[name], crs))

    # sorted list accumulator round: eta challenge, w4, lookup counts
    eta = transcript.get_challenge("eta")
    etas = (eta, eta * eta % R, eta * eta * eta % R)
    w4 = compute_w4(pk, etas)
    transcript.send_point("LOOKUP_READ_COUNTS",
                          polyops.commit(pk.polynomials["lookup_read_counts"],
                                         crs))
    transcript.send_point("LOOKUP_READ_TAGS",
                          polyops.commit(pk.polynomials["lookup_read_tags"],
                                         crs))
    transcript.send_point("W_4", polyops.commit(w4, crs))

    # log-derivative inverse round
    beta, gamma = transcript.get_challenges(["beta", "gamma"])
    lookup_inverses = compute_logderivative_inverses(pk, w4, beta, gamma)
    transcript.send_point("LOOKUP_INVERSES",
                          polyops.commit(lookup_inverses, crs))

    # grand product round
    public_input_delta = compute_public_input_delta(
        beta, gamma, pk.public_inputs, pk.pub_inputs_offset)
    z_perm = compute_grand_product(pk, w4, beta, gamma)
    transcript.send_point("Z_PERM", polyops.commit(z_perm, crs))

    alpha = transcript.get_challenge("alpha")
    alphas = [alpha]
    for _ in range(1, NUM_ALPHAS):
        alphas.append(alphas[-1] * alpha % R)

    params = RelationParams(
        eta_1=etas[0], eta_2=etas[1], eta_3=etas[2], beta=beta, gamma=gamma,
        public_input_delta=public_input_delta)

    polys = {name: list(pk.polynomials[name]) for name in PRECOMPUTED}
    polys["w_l"] = list(pk.polynomials["w_l"])
    polys["w_r"] = list(pk.polynomials["w_r"])
    polys["w_o"] = list(pk.polynomials["w_o"])
    polys["w_4"] = w4
    polys["z_perm"] = z_perm
    polys["lookup_inverses"] = lookup_inverses
    polys["lookup_read_counts"] = list(pk.polynomials["lookup_read_counts"])
    polys["lookup_read_tags"] = list(pk.polynomials["lookup_read_tags"])
    for name in SHIFTED:
        polys["shift_" + name] = polys[name][1:] + [0]
    return polys, params, alphas


# -- sumcheck ---------------------------------------------------------------

def gate_separator_products(betas: list[int], log_n: int) -> list[int]:
    """GateSeparatorPolynomial beta_products (decider/types.rs:52-76)."""
    size = 1 << log_n
    bp = [1] * size
    for i in range(log_n):
        step = 1 << i
        for j in range(step):
            bp[step + j] = bp[j] * betas[i] % R
    return bp


def _edge_rows(cur, round_size):
    """Concatenate the 8 evaluation-point rows of every entity into one
    long vector per entity: value[k*n_edges + e] = even_e + k*diff_e.
    Works on FV (plain) and SVec (shared) polynomials."""
    D = BATCHED_RELATION_PARTIAL_LENGTH
    row = {}
    for name in ENTITY_ORDER:
        poly = cur[name]
        even = poly.slice_strided(0, round_size)
        odd = poly.slice_strided(1, round_size)
        diff = odd - even
        row[name] = even.concat([even + k * diff for k in range(1, D)])
    return row


def _compute_round_univariate(cur, params, alphas, beta_products,
                              periodicity, pow_partial, current_beta,
                              round_size, skip=frozenset()):
    """One sumcheck round univariate, evaluated at 0..7 (vectorized over
    edges AND evaluation points; sumcheck_round_prover.rs
    compute_univariate). `cur` maps entity -> FV or SVec. Returns a
    length-8 FV (plain) or SVec (shared)."""
    D = BATCHED_RELATION_PARTIAL_LENGTH
    n_edges = round_size // 2
    row = _edge_rows(cur, round_size)
    bp = np.array([beta_products[e * periodicity] for e in range(n_edges)],
                  dtype=object)
    scaling = FV(np.concatenate([bp] * D))
    contribs = relations.accumulate(row, params, scaling, skip=skip)
    return _batch_subrel_univariates(contribs, alphas, pow_partial,
                                     current_beta, n_edges)


def _batch_subrel_univariates(contribs, alphas, pow_partial, current_beta,
                              n_edges):
    """batch_over_relations_univariates + extend_and_batch_univariates:
    result[k] = pow_partial * rp(k) * sum_indep alpha_j S_j(k)
                + sum_dep alpha_j S_j(k), with rp(k) = (1-k) + k*beta.
    Contributions are length-8*n_edges vectors; per-point sums are taken
    blockwise."""
    D = BATCHED_RELATION_PARTIAL_LENGTH
    indep = None
    dep = None
    for j, c in enumerate(contribs):
        if c is None:
            continue
        scalar = 1 if j == 0 else alphas[j - 1]
        term = c * scalar
        if j in relations.LINEARLY_DEPENDENT:
            dep = term if dep is None else dep + term
        else:
            indep = term if indep is None else indep + term
    rp = FV(np.array([(pow_partial * (1 + k * (current_beta - 1))) % R
                      for k in range(D)], dtype=object))
    out = indep.block_sums(D) * rp
    if dep is not None:
        out = out + dep.block_sums(D)
    return out


def sumcheck_prove(polys, params, alphas, gate_challenges, circuit_size,
                   virtual_log_n, transcript: Transcript, skip=frozenset(),
                   send_univariate=None):
    """sumcheck_prover.rs sumcheck_prove (non-ZK). `polys` maps entity ->
    FV (plain) or SVec (shared). Real rounds use the gate-separator
    products as per-edge scaling; padding rounds (virtual_log_n > log_n)
    reduce to the single edge (poly[0], poly[1]) with scaling 1
    (compute_virtual_contribution). `send_univariate` lets the
    collaborative prover open the shared round univariate before it hits
    the transcript; default sends plain ints."""
    log_n = (circuit_size - 1).bit_length()
    beta_products = gate_separator_products(gate_challenges, log_n)
    if send_univariate is None:
        def send_univariate(label, univ):
            transcript.send_frs(label, [int(v) for v in univ.a])
    pow_partial = 1
    round_size = circuit_size
    challenges = []
    cur = dict(polys)
    ones = [1, 1]

    for k in range(virtual_log_n):
        padding = k >= log_n
        bp = ones if padding else beta_products
        rs = 2 if padding else round_size
        univariate = _compute_round_univariate(
            cur, params, alphas, bp, 0 if padding else (2 << k),
            pow_partial, gate_challenges[k], rs, skip=skip)
        send_univariate(f"Sumcheck:univariate_{k}", univariate)
        u = transcript.get_challenge(f"Sumcheck:u_{k}")
        challenges.append(u)
        cur = {name: cur[name].fold(u) for name in ENTITY_ORDER}
        pow_partial = pow_partial * (1 + u * (gate_challenges[k] - 1)) % R
        if not padding:
            round_size //= 2

    evaluations = [cur[name] for name in ENTITY_ORDER]
    return challenges, evaluations


# -- gemini / shplonk / KZG -------------------------------------------------

def gemini_prove(polys, challenges, log_n, crs, transcript: Transcript):
    """shplemini_prover.rs gemini_prove (non-ZK). Returns opening claims
    [(coeffs, challenge, evaluation, gemini_fold)]."""
    virtual_log_n = len(challenges)
    n = 1 << log_n
    rho = transcript.get_challenge("rho")

    batched_unshifted = [0] * n
    running = 1
    for name in PRECOMPUTED + WITNESS:
        polyops.add_scaled(batched_unshifted, polys[name], running)
        running = running * rho % R
    batched_to_be_shifted = [0] * n
    for name in SHIFTED:
        polyops.add_scaled(batched_to_be_shifted, polys[name], running)
        running = running * rho % R

    # A_0 = F + G_shifted (coefficient shift: G(X)/X)
    a_0 = list(batched_unshifted)
    for i in range(n - 1):
        a_0[i] = (a_0[i] + batched_to_be_shifted[i + 1]) % R

    # fold polynomials
    fold_polys = []
    a_l = a_0
    for l in range(log_n - 1):
        u = challenges[l]
        n_l = 1 << (log_n - l - 1)
        a_next = [(a_l[2 * j] + u * (a_l[2 * j + 1] - a_l[2 * j])) % R
                  for j in range(n_l)]
        fold_polys.append(a_next)
        a_l = a_next
    # constant virtual folds (compute_fold_polynomials:235-262, non-ZK)
    last = fold_polys[-1] if fold_polys else a_0
    u_last = challenges[log_n - 1]
    final_eval = (last[0] + u_last * (last[1] - last[0])) % R
    fold_polys.append([final_eval])
    tail = 1
    for k in range(log_n, virtual_log_n - 1):
        tail = tail * (1 - challenges[k]) % R
        fold_polys.append([final_eval * tail % R])

    # only the first virtual_log_n - 1 folds are committed and claimed —
    # for the non-padding flavor the trailing constant fold is unused
    # (construct_univariate_opening_claims zips r_squares.skip(1) with the
    # folds, truncating)
    fold_polys = fold_polys[:virtual_log_n - 1]
    for l in range(virtual_log_n - 1):
        transcript.send_point(f"Gemini:FOLD_{l + 1}",
                              polyops.commit(fold_polys[l], crs))

    r = transcript.get_challenge("Gemini:r")
    r_inv = pow(r, -1, R)
    a_0_pos = [(f + g * r_inv) % R
               for f, g in zip(batched_unshifted, batched_to_be_shifted)]
    a_0_neg = [(f - g * r_inv) % R
               for f, g in zip(batched_unshifted, batched_to_be_shifted)]

    claims = []
    claims.append((a_0_pos, r, polyops.eval_poly(a_0_pos, r), False))
    claims.append((a_0_neg, -r % R, polyops.eval_poly(a_0_neg, -r % R),
                   False))
    r_sq = r
    for fold in fold_polys:
        r_sq = r_sq * r_sq % R
        pt = -r_sq % R
        claims.append((fold, pt, polyops.eval_poly(fold, pt), True))

    for l, claim in enumerate(claims[1:virtual_log_n + 1]):
        transcript.send_fr(f"Gemini:a_{l + 1}", claim[2])
    return claims


def shplonk_prove(claims, crs, transcript: Transcript, virtual_log_n):
    """shplemini_prover.rs shplonk_prove + compute_partially_evaluated_
    batched_quotient (non-ZK). Returns (quotient_poly, z)."""
    nu = transcript.get_challenge("Shplonk:nu")
    # positive-side fold evaluations Fold_i(r^{2^i})
    pos_evals = [polyops.eval_poly(poly, -chal % R)
                 for (poly, chal, _e, is_fold) in claims if is_fold]

    max_size = max(len(c[0]) for c in claims)
    size = 1
    while size < max_size:
        size *= 2
    q = [0] * size
    current_nu = 1
    fold_idx = 0
    for poly, chal, ev, is_fold in claims:
        if is_fold:
            tmp = list(poly)
            tmp[0] = (tmp[0] - pos_evals[fold_idx]) % R
            tmp = polyops.factor_roots(tmp, -chal % R)
            polyops.add_scaled(q, tmp, current_nu)
            current_nu = current_nu * nu % R
            fold_idx += 1
        tmp = list(poly)
        tmp[0] = (tmp[0] - ev) % R
        tmp = polyops.factor_roots(tmp, chal)
        polyops.add_scaled(q, tmp, current_nu)
        current_nu = current_nu * nu % R

    transcript.send_point("Shplonk:Q", polyops.commit(q, crs))
    z = transcript.get_challenge("Shplonk:z")

    # G(X) = Q(X) - sum_j nu^j (f_j(X) - v_j) / (z - x_j)
    denoms = []
    for poly, chal, ev, is_fold in claims:
        if is_fold:
            denoms.append((z + chal) % R)
        denoms.append((z - chal) % R)
    denoms = polyops.batch_invert(denoms)
    g = list(q)
    current_nu = 1
    idx = 0
    fold_idx = 0
    for poly, chal, ev, is_fold in claims:
        if is_fold:
            tmp = list(poly)
            tmp[0] = (tmp[0] - pos_evals[fold_idx]) % R
            polyops.add_scaled(g, tmp, -current_nu * denoms[idx] % R)
            current_nu = current_nu * nu % R
            idx += 1
            fold_idx += 1
        tmp = list(poly)
        tmp[0] = (tmp[0] - ev) % R
        polyops.add_scaled(g, tmp, -current_nu * denoms[idx] % R)
        current_nu = current_nu * nu % R
        idx += 1
    return g, z


def kzg_open(quotient, z, crs, transcript: Transcript):
    """decider_prover.rs compute_opening_proof: W = commit((G - 0)/(X-z))."""
    w = polyops.factor_roots(quotient, z)
    transcript.send_point("KZG:W", polyops.commit(w, crs))


# -- entry ------------------------------------------------------------------

def prove(pk: ProvingKey, vk, crs, hasher) -> tuple[list[int], list[int]]:
    """ultra_prover.rs UltraHonk::prove (non-ZK). Returns (proof, public
    inputs), with the pairing-point accumulator left inside the proof."""
    transcript = Transcript(hasher)
    polys, params, alphas = oink_prove(pk, vk, crs, transcript)

    log_n = pk.log_circuit_size
    virtual_log_n = CONST_PROOF_SIZE_LOG_N if hasher.USE_PADDING else log_n
    gate_challenges = transcript.get_powers_of_challenge(
        "Sumcheck:gate_challenge", virtual_log_n)

    fv_polys = {name: FV(np.array(polys[name], dtype=object))
                for name in ENTITY_ORDER}
    challenges, evals = sumcheck_prove(
        fv_polys, params, alphas, gate_challenges, pk.circuit_size,
        virtual_log_n, transcript)
    transcript.send_frs("Sumcheck:evaluations", [e.at(0) for e in evals])

    claims = gemini_prove(polys, challenges, log_n, crs, transcript)
    quotient, z = shplonk_prove(claims, crs, transcript, virtual_log_n)
    kzg_open(quotient, z, crs, transcript)

    proof = transcript.get_proof()
    num_public = pk.num_public_inputs - PAIRING_POINT_ACCUMULATOR_SIZE
    return proof[num_public:], proof[:num_public]

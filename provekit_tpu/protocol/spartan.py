"""ZK-Spartan sumcheck: reduce R1CS satisfaction to weighted witness openings.

Faithful port of the protocol math in the reference prover
(``provekit/prover/src/whir_r1cs.rs:103-369``) and verifier
(``provekit/verifier/src/whir_r1cs.rs:110-172``):

* Prove sum over the hypercube of F(x) = eq(r,x) * (Az(x) Bz(x) - Cz(x)) is 0,
  blinded by a random polynomial G = sum of per-round cubics, combined with a
  challenge rho: the sumcheck target is rho * sum(G).
* The blinding polynomial is itself committed (masked, batch 2) and opened via
  a second WHIR instance with tensor-of-powers weights proving
  sum_i g_i(alpha_i).

Device kernels do the per-round O(n) work (``ops.sumcheck.spartan_round``);
host code does the tiny cubic-coefficient algebra and the sponge.
"""

from __future__ import annotations

import functools
import secrets
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..fields import bn254 as F
from ..fields import vector as V
from ..ops import sumcheck as sc
from ..whir import (DenseWeights, Statement, WhirConfig, committer, prover,
                    verifier)
from ..whir.verifier import WhirError

HALF = F.HALF


def eval_cubic(coeffs, x):
    return sc.eval_cubic(coeffs, x)


def blinding_coefficients_for_round(g_cubics, idx, alphas):
    """Round polynomial of G = sum_i g_i(X_i) partial-bound at alphas.

    Port of ``compute_blinding_coefficients_for_round``
    (prover/src/whir_r1cs.rs:103-171).
    """
    n = len(g_cubics)
    all_fixed = idx == n
    if all_fixed:
        idx = n - 1
    prefix_sum = 0
    for i in range(idx):
        prefix_sum += eval_cubic(g_cubics[i], alphas[i])
    suffix_sum = 0
    for g in g_cubics[idx + 1:]:
        suffix_sum += eval_cubic(g, 0) + eval_cubic(g, 1)
    prefix_multiplier = pow(2, n - 1 - idx, F.P)
    suffix_multiplier = prefix_multiplier * HALF % F.P
    const_term = (prefix_multiplier * prefix_sum
                  + suffix_multiplier * suffix_sum) % F.P
    g = g_cubics[idx]
    coeffs = [(prefix_multiplier * g[0] + const_term) % F.P,
              prefix_multiplier * g[1] % F.P,
              prefix_multiplier * g[2] % F.P,
              prefix_multiplier * g[3] % F.P]
    if all_fixed:
        return [eval_cubic(coeffs, alphas[idx]), 0, 0, 0]
    return coeffs


def sum_over_hypercube(g_cubics):
    c = blinding_coefficients_for_round(g_cubics, 0, [])
    return (eval_cubic(c, 0) + eval_cubic(c, 1)) % F.P


def expand_powers(values):
    """[1, a, a^2, a^3] per alpha (prover/src/whir_r1cs.rs:371-380)."""
    out = []
    for v in values:
        out.extend([1, v, v * v % F.P, v * v * v % F.P])
    return out


@jax.jit
def _reduce_512_dev(limbs):
    """(32, n) uint16-limb 512-bit values -> (16, n) uniform field elements.

    x = hi*2^256 + lo; x mod P = mont_mul(hi, R^2) + reduce_256(lo)
    (mont_mul(hi, R2) = hi*R2/R = hi*2^256 mod P).  Bias 2^-258.
    """
    lo, hi = limbs[:16], limbs[16:]
    r2 = V.broadcast_scalar(jnp.asarray(V.R2_LIMBS), lo.shape[1:])
    return V.add_mod(V.reduce_256(lo), V.mont_mul(hi, r2))


@functools.partial(jax.jit, static_argnums=(1,))
def _random_mont_jit(key, n: int):
    bits = jax.random.bits(key, (16, n), jnp.uint32)  # 512 bits / element
    limbs = jnp.concatenate([bits & jnp.uint32(0xFFFF), bits >> 16], axis=0)
    return _reduce_512_dev(limbs)


def _key_from_256_bits(bits: int):
    """PRNG key absorbing all 256 entropy bits via successive fold_in calls.

    PRNGKey() alone truncates its seed to 64 bits; folding eight 32-bit
    words keeps the full entropy so recovering the mask stream requires a
    2^256 search, matching the reference's thread_rng guarantee
    (prover/src/whir_r1cs.rs:212 context).
    """
    key = jax.random.PRNGKey(bits & 0xFFFFFFFF)
    for i in range(1, 8):
        key = jax.random.fold_in(key, (bits >> (32 * i)) & 0xFFFFFFFF)
    return key


def random_mont_dev(n: int, rng=None):
    """(16, n) uniform field elements (Montgomery form), device-resident.

    Replaces per-element host ``rng.randrange(P)`` (the reference's
    thread_rng in zk_utils.rs) with an on-device threefry draw reduced mod P
    (bias 2^-258) — zero host->device transfer (the tunnel moves ~150 MB/s,
    so shipping 2^17 mask elements would cost ~100 ms).  Uniform canonical
    is uniform in Montgomery form too; masks are never needed as host ints.

    The key is derived from 256 bits of OS entropy (or from ``rng`` when a
    deterministic stream is requested by tests) — see ``_key_from_256_bits``.
    """
    bits = (rng.getrandbits(256) if rng is not None
            else secrets.randbits(256))
    from ..parallel import context as pctx
    return pctx.shard_last(_random_mont_jit(_key_from_256_bits(bits), n))


def batch_commit_to_polynomial(m, whir_config, poly_mont, transcript,
                               rng=None):
    """Commit [poly || mask] and a fresh random polynomial as a batch of two.

    Port of ``batch_commit_to_polynomial`` (prover/src/whir_r1cs.rs:182-209):
    hides the polynomial behind a one-variable-extended mask, plus a fully
    random companion for batching-randomness hiding.  ``poly_mont`` is a
    (16, 2^(m-1)) Montgomery device array.
    """
    nv = poly_mont.shape[1].bit_length() - 1
    assert poly_mont.shape[1] == 1 << nv and m == nv + 1
    mask = random_mont_dev(1 << nv, rng)
    masked_arr = jnp.concatenate([poly_mont, mask], axis=1)
    rand_arr = random_mont_dev(1 << m, rng)
    return committer.commit(transcript, whir_config, [masked_arr, rand_arr])


def add_zk_sumcheck_pattern(ds, m_0: int) -> None:
    """add_zk_sumcheck_polynomials (common/src/utils/sumcheck.rs:123-129)."""
    ds.absorb(1, "Sum of G over boolean hypercube")
    ds.squeeze(1, "Rho")
    for _ in range(m_0):
        ds.absorb(4, "Sumcheck Polynomials").squeeze(1, "Sumcheck Random")
    ds.absorb(2, "Polynomial sums")


@dataclass
class SpartanProverOutput:
    r: object        # (16, m_0) Montgomery device scalars
    alpha: object    # (16, m_0) Montgomery device scalars


def _blinding_statement_dev(m_commit, alphas_m, com):
    """Statement over the blinding commitment, device-scalar twin of the
    tensor-of-powers weights (expand_powers): per alpha [1, a, a^2, a^3]."""
    import jax.numpy as jnp
    from ..fs import device as D
    m_0 = alphas_m.shape[1]
    a2 = D.mul(alphas_m, alphas_m)
    a3 = D.mul(a2, alphas_m)
    w = jnp.stack([D.one_m(m_0), alphas_m, a2, a3], axis=2
                  ).reshape(16, 4 * m_0)
    size = 1 << m_commit
    w = jnp.pad(w, [(0, 0), (0, size - w.shape[1])])
    weights = DenseWeights(w, m_commit)
    f_sum = sc.weighted_sum(w, com.polys[0]).reshape(16, 1)
    g_sum = sc.weighted_sum(w, com.polys[1]).reshape(16, 1)
    stmt = Statement(m_commit)
    sigma = V.add_mod(f_sum, V.mont_mul(com.batching_randomness, g_sum))
    stmt.add_constraint(weights, sigma)
    return stmt, f_sum, g_sum


def run_zk_sumcheck_prover(r1cs, z, transcript, m_0: int,
                           blinding_config: WhirConfig, rng=None):
    """Port of ``run_zk_sumcheck_prover`` (prover/src/whir_r1cs.rs:228-369).

    Device-resident: challenges, the fused m_0-round sumcheck, the blinding
    statement, and the claimed sums all stay on device (fs.device)."""
    from ..fs import device as D
    import jax.numpy as jnp

    from ..parallel import context as pctx
    r_c = transcript.challenge_scalars_dev(m_0)     # (16, m_0) canonical
    r_m = D.to_mont(r_c)
    a, b, c = r1cs.witness_bounds(z)
    n = 1 << m_0
    pad = n - a.shape[1]
    if pad:
        a = jnp.pad(a, [(0, 0), (0, pad)])
        b = jnp.pad(b, [(0, 0), (0, pad)])
        c = jnp.pad(c, [(0, 0), (0, pad)])
    a, b, c = (pctx.shard_last(x) for x in (a, b, c))
    eq = pctx.shard_last(D.eq_table_dev(r_m, m_0))

    g_cubics = [[(rng.randrange(F.P) if rng is not None
                  else secrets.randbelow(F.P)) for _ in range(4)]
                for _ in range(m_0)]

    flat = [x for g in g_cubics for x in g]
    nv = max(1, (len(flat) - 1).bit_length())
    flat = flat + [0] * ((1 << nv) - len(flat))
    m_commit = nv + 1
    assert blinding_config.num_variables == m_commit, \
        (blinding_config.num_variables, m_commit)
    com = batch_commit_to_polynomial(
        m_commit, blinding_config, V.to_mont(V.pack(flat)), transcript, rng)

    sum_g = sum_over_hypercube(g_cubics)
    transcript.add_scalars([sum_g])
    rho_m = D.to_mont(transcript.challenge_scalars_dev(1))
    claim0 = D.mul(rho_m, D.const_m(sum_g))

    abce = jnp.stack([a, b, c, eq], axis=1)

    from ..ops import fused
    pms = [pow(2, m_0 - 1 - i, F.P) for i in range(m_0)]
    sms = [p * F.HALF % F.P for p in pms]
    sfx = []
    for i in range(m_0):
        s = 0
        for g in g_cubics[i + 1:]:
            s += eval_cubic(g, 0) + eval_cubic(g, 1)
        sfx.append(s % F.P)
    g_arr = V.pack([F.to_mont(x) for g in g_cubics for x in g]
                   ).reshape(16, m_0, 4)
    pms_a = V.pack([F.to_mont(p) for p in pms])
    sms_a = V.pack([F.to_mont(s) for s in sms])
    sfx_a = V.pack([F.to_mont(s) for s in sfx])
    assert transcript.absorb_pos == 0
    if pctx.active_mesh() is not None:
        # Per-round kernels only: the fused segment's unrolled body is too
        # expensive for the GSPMD partitioner; small graphs + psum'd round
        # sums scale across the mesh (byte-identical messages).
        lead = m_0
    else:
        # Hybrid: fused rounds run at FULL static length with masking
        # (~m_0 * n/2 pair-ops); compact per-round kernels keep the leading
        # big rounds geometric and the fused segment handles the tail.
        from ..whir.prover import FUSE_MAX
        lead = 0
        while lead < m_0 and (abce.shape[2] >> lead) > FUSE_MAX:
            lead += 1

    claim, prefix = claim0, V.zeros((1,))
    alpha_parts = []
    if lead:
        abce, claim, prefix, a_lead = _spartan_rounds_unfused(
            transcript, abce, claim, prefix, rho_m, g_arr,
            pms_a, sms_a, sfx_a, 0, lead)
        alpha_parts.append(a_lead)
    if lead < m_0:
        state2, coeffs_arr, alphas_tail = fused.spartan_sumcheck_fused(
            abce, transcript.state, claim, rho_m, g_arr[:, lead:],
            pms_a[:, lead:], sms_a[:, lead:], sfx_a[:, lead:],
            prefix, m_0 - lead)
        transcript.replay_fused(
            state2, [coeffs_arr[:, i, :] for i in range(m_0 - lead)],
            [("A", 4), ("S", 1)] * (m_0 - lead))
        alpha_parts.append(alphas_tail)
    alphas_c = jnp.concatenate(alpha_parts, axis=1)
    alphas_m = D.to_mont(alphas_c)

    stmt, f_sum, g_sum = _blinding_statement_dev(m_commit, alphas_m, com)
    transcript.add_scalars_dev(D.from_mont(
        jnp.concatenate([f_sum, g_sum], axis=1)))
    prover.prove(transcript, blinding_config, com, stmt)
    return SpartanProverOutput(r=r_m, alpha=alphas_m)


def _spartan_rounds_unfused(transcript, abce, claim, prefix, rho_m, g_arr,
                            pms_a, sms_a, sfx_a, start: int, count: int):
    """``count`` compact per-round ZK-Spartan rounds starting at ``start``.

    Computes exactly the messages of ``fused.spartan_sumcheck_fused`` (same
    limb arithmetic — byte-identical transcript), one small round kernel +
    shape-constant scalar step at a time.  Arrays halve each round
    (geometric total work); under a mesh the round sums psum across it.
    Returns (abce, claim, prefix, alphas (16, count) canonical).
    """
    import jax.numpy as jnp
    from ..ops import fused

    alphas = []
    for idx in range(start, start + count):
        f0, fm1, finf = sc.spartan_round_stacked(abce)
        (state2, cs_c, alpha_c, alpha_m, claim,
         prefix) = fused.spartan_scalar_step(
            transcript.state, f0.reshape(16, 1), fm1.reshape(16, 1),
            finf.reshape(16, 1), claim, prefix, g_arr[:, idx],
            pms_a[:, idx:idx + 1], sms_a[:, idx:idx + 1],
            sfx_a[:, idx:idx + 1], rho_m)
        transcript.replay_fused(state2, [cs_c], [("A", 4), ("S", 1)])
        alphas.append(alpha_c)
        abce = sc.fold_stacked_msb(abce, alpha_m[:, 0])
    return abce, claim, prefix, jnp.concatenate(alphas, axis=1)


@dataclass
class SpartanVerifierOutput:
    r: list[int]
    alpha: list[int]
    last_sumcheck_val: int


def run_zk_sumcheck_verifier(transcript, m_0: int,
                             blinding_config: WhirConfig):
    """Port of ``run_sumcheck_verifier`` (verifier/src/whir_r1cs.rs:110-172),
    completing the blinding-weight evaluation the reference defers."""
    r = transcript.challenge_scalars(m_0)
    com = verifier.parse_commitment(transcript, blinding_config)
    [sum_g] = transcript.next_scalars(1)
    rho = transcript.challenge_scalars(1)[0]
    claim = rho * sum_g % F.P
    alphas = []
    for _ in range(m_0):
        coeffs = transcript.next_scalars(4)
        if (2 * coeffs[0] + coeffs[1] + coeffs[2] + coeffs[3]) % F.P != claim:
            raise WhirError("Spartan sumcheck equality assertion failed")
        alpha_i = transcript.challenge_scalars(1)[0]
        alphas.append(alpha_i)
        claim = eval_cubic(coeffs, alpha_i)

    f_sum, g_sum = transcript.next_scalars(2)
    m_commit = blinding_config.num_variables
    w_vals = expand_powers(alphas)
    w_vals = w_vals + [0] * ((1 << m_commit) - len(w_vals))
    stmt = Statement(m_commit)
    stmt.add_constraint(DenseWeights.from_ints(w_vals, m_commit),
                        (f_sum + com.batching_randomness * g_sum) % F.P)
    verifier.verify(transcript, blinding_config, com, stmt)

    last = (claim - rho * f_sum) % F.P
    return SpartanVerifierOutput(r=r, alpha=alphas, last_sumcheck_val=last)

"""Fused sumcheck segments with an on-device Fiat-Shamir sponge.

The sumcheck is round-sequential: each round's challenge comes from the
sponge after absorbing that round's coefficients, so dispatching one device
call per round costs a transport round-trip each — the dominant cost on
remote/tunneled devices.  These kernels run ALL rounds of a segment in one
dispatch:

* the duplex sponge (Skyscraper, N=2 R=1) advances on device between the
  vectorized round computations (a fori_loop ladder with a bar/square
  select), exactly mirroring the host sponge;
* the rounds are unrolled at trace time with exact halving shapes, so the
  whole segment does geometric (~n) pair-ops — shapes are static per round
  because the round index is a Python int;
* the host replays the returned coefficients through its own transcript
  (cheap) and lands on the identical sponge state.

Every segment starts right after a squeeze (absorb_pos == 0), so the
absorb/squeeze pattern is static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields import bn254 as F
from ..fields import vector as V
from ..hash import skyscraper as S
from . import sumcheck as sc


def _permute_state(state: jax.Array) -> jax.Array:
    """Duplex permute of a (16, 2) canonical state.

    On TPU this is a single VMEM-resident Pallas kernel (~20 us); the XLA
    lowering of the 18-round ladder costs ~1.8 ms in latency-bound tiny-op
    HBM round-trips, and a prove performs hundreds of sequential permutes."""
    from . import pallas_kernels as PK
    l, r = PK.permute_dispatch(state[:, :1], state[:, 1:])
    return jnp.concatenate([l, r], axis=1)


def _absorb_seq(state: jax.Array, units: list) -> jax.Array:
    """Absorb canonical (16,1) units starting at absorb_pos == 0."""
    for i, u in enumerate(units):
        if i > 0:
            state = _permute_state(state)
        state = jnp.concatenate([u, state[:, 1:]], axis=1)
    return state


def _squeeze1(state: jax.Array):
    state = _permute_state(state)
    return state, state[:, :1]


def _from_mont1(x: jax.Array) -> jax.Array:
    return V.mont_mul(x, jnp.asarray(V.ONE_LIMBS).reshape(16, 1))


def _to_mont1(x: jax.Array) -> jax.Array:
    return V.mont_mul(x, jnp.asarray(V.R2_LIMBS).reshape(16, 1))


def _mm(a, b):
    return V.mont_mul(a, b)


def _eval_poly_mont(coeffs: list, x: jax.Array) -> jax.Array:
    acc = coeffs[-1]
    for c in reversed(coeffs[:-1]):
        acc = V.add_mod(_mm(acc, x), c)
    return acc


# --- per-round message math (shared by the fused segments and the
#     per-round mesh path; see whir/prover._sumcheck_rounds_mesh) ----------


def whir_round_messages(h0, h1, h2):
    """Quadratic sums (Montgomery (16,1)) -> wire messages [h(0),h(1),h(2)].

    The whir crate's sumcheck wire basis is EVALUATIONS (gnark
    runWhirSumcheckRounds checks e0+e1 == claim and interpolates,
    whir_utilities.go:102-126)."""
    e1 = V.add_mod(V.add_mod(h0, h1), h2)
    e2 = V.add_mod(e1, V.add_mod(h1, V.add_mod(h2, V.add_mod(h2, h2))))
    return [h0, e1, e2]


def spartan_round_coeffs(f0, fm1, finf, claim, prefix, g, pm, sm, sfx,
                         rho, half_c):
    """ZK-combined cubic coefficients [cc0..cc3] for one Spartan round.

    All inputs (16, 1) Montgomery; ``g`` is the round's blinding cubic as a
    list of 4.  Mirrors the blinding-coefficient algebra of
    ``run_zk_sumcheck_prover`` (reference prover/src/whir_r1cs.rs:103-180).
    """
    const_term = V.add_mod(_mm(pm, prefix), _mm(sm, sfx))
    gp0 = V.add_mod(_mm(pm, g[0]), const_term)
    gp1, gp2, gp3 = (_mm(pm, g[k]) for k in (1, 2, 3))

    cc0 = V.add_mod(f0, _mm(rho, gp0))
    g_at_m1 = V.sub_mod(V.add_mod(gp0, gp2), V.add_mod(gp1, gp3))
    comb_m1 = V.add_mod(fm1, _mm(rho, g_at_m1))
    three_c0 = V.add_mod(V.add_mod(cc0, cc0), cc0)
    cc2 = _mm(half_c, V.sub_mod(V.add_mod(claim, comb_m1), three_c0))
    cc3 = V.add_mod(finf, _mm(rho, gp3))
    cc1 = V.sub_mod(V.sub_mod(claim, V.add_mod(cc0, cc0)),
                    V.add_mod(cc3, cc2))
    return [cc0, cc1, cc2, cc3]


# --- single-round scalar steps (mesh path) ---------------------------------
# One jitted function per protocol, shape-constant across rounds: computes
# the round's wire messages from the (16,1) sums, advances the sponge
# (absorb + squeeze), and returns the Montgomery alpha for the fold.  The
# per-round mesh drivers call [round-sum kernel] -> [this] -> [fold kernel],
# so only the two per-shape kernels recompile as sizes halve.


@jax.jit
def whir_scalar_step(state: jax.Array, h0: jax.Array, h1: jax.Array,
                     h2: jax.Array):
    """-> (state', msgs_canon (16,3), alpha_canon (16,1), alpha_mont)."""
    msgs = whir_round_messages(h0, h1, h2)
    msgs_c = [_from_mont1(x) for x in msgs]
    state = _absorb_seq(state, msgs_c)
    state, alpha_c = _squeeze1(state)
    return (state, jnp.concatenate(msgs_c, axis=1), alpha_c,
            _to_mont1(alpha_c))


@jax.jit
def spartan_scalar_step(state: jax.Array, f0, fm1, finf, claim, prefix,
                        g4: jax.Array, pm, sm, sfx, rho):
    """One round's ZK-combination + sponge advance.

    g4 is the round's blinding cubic as (16, 4).  Returns
    (state', cs_canon (16,4), alpha_canon, alpha_mont, claim', prefix').
    """
    half_c = jnp.asarray(V._const_limbs(F.to_mont(F.HALF))).reshape(16, 1)
    g = [g4[:, k:k + 1] for k in range(4)]
    cs = spartan_round_coeffs(f0, fm1, finf, claim, prefix, g,
                              pm, sm, sfx, rho, half_c)
    cs_c = [_from_mont1(c) for c in cs]
    state = _absorb_seq(state, cs_c)
    state, alpha_c = _squeeze1(state)
    alpha_m = _to_mont1(alpha_c)
    claim = _eval_poly_mont(cs, alpha_m)
    prefix = V.add_mod(prefix, _eval_poly_mont(g, alpha_m))
    return (state, jnp.concatenate(cs_c, axis=1), alpha_c, alpha_m,
            claim, prefix)


@functools.partial(jax.jit, static_argnums=(2,))
def whir_sumcheck_segment(fw: jax.Array, state: jax.Array, count: int):
    """count WHIR rounds in one dispatch.

    fw (16, 2, n) Montgomery; state (16, 2) canonical sponge.
    Returns (fw_folded (16,2,n) with the result in the leading n/2^count
    entries, state', coeffs (16, count, 3) canonical).

    The rounds are UNROLLED at trace time with exact halving shapes —
    geometric total work (~n pair-ops for the whole segment) instead of
    the fori_loop formulation's count*n/2 full-length masked passes
    (round-4 verdict item 4).  Same limb ops in the same order, so the
    messages are bit-identical to the masked version.
    """
    n = fw.shape[2]
    coeffs_cols, alpha_cols = [], []
    cur = fw
    for _ in range(count):
        f0, w0 = cur[:, 0, 0::2], cur[:, 1, 0::2]
        f1, w1 = cur[:, 0, 1::2], cur[:, 1, 1::2]
        df, dw = V.sub_mod(f1, f0), V.sub_mod(w1, w0)
        h0 = V.sum_mod(_mm(f0, w0)).reshape(16, 1)
        h1 = V.sum_mod(V.add_mod(_mm(f0, dw), _mm(w0, df))).reshape(16, 1)
        h2 = V.sum_mod(_mm(df, dw)).reshape(16, 1)

        hc = [_from_mont1(x) for x in whir_round_messages(h0, h1, h2)]
        coeffs_cols.append(jnp.stack(hc, axis=2).reshape(16, 1, 3))
        state = _absorb_seq(state, hc)
        state, alpha_c = _squeeze1(state)
        alpha_cols.append(alpha_c)
        alpha_m = _to_mont1(alpha_c)

        h = cur.shape[2] // 2
        ab = jnp.broadcast_to(alpha_m[:, None, :], (16, 2, h))
        ev = cur[:, :, 0::2]
        od = cur[:, :, 1::2]
        cur = V.add_mod(ev, V.mont_mul(ab, V.sub_mod(od, ev)))

    fw = jnp.concatenate(
        [cur, jnp.zeros((16, 2, n - cur.shape[2]), dtype=V.U32)], axis=2)
    return (fw, state, jnp.concatenate(coeffs_cols, axis=1),
            jnp.concatenate(alpha_cols, axis=1))


@functools.partial(jax.jit, static_argnums=(9,))
def spartan_sumcheck_fused(abce: jax.Array, state: jax.Array,
                           claim0: jax.Array, rho: jax.Array,
                           g_coeffs: jax.Array, pms: jax.Array,
                           sms: jax.Array, suffix: jax.Array,
                           prefix0: jax.Array, m_0: int):
    """m_0 ZK-Spartan rounds in one dispatch.

    abce: (16, 4, 2^m_0) Montgomery [Az; Bz; Cz; eq] — MSB pairing.
    state: (16, 2) canonical sponge (right after the rho squeeze).
    claim0, rho: (16, 1) Montgomery.
    g_coeffs: (16, m_0, 4); pms/sms/suffix: (16, m_0) Montgomery (see
    protocol.spartan for their definitions).  ``prefix0`` is the running
    blinding-prefix sum entering the segment ((16,1) Montgomery; zeros when
    the segment starts at round 0 — nonzero when leading rounds ran
    unfused, see protocol.spartan's hybrid driver).
    Returns (state', coeffs (16, m_0, 4) canonical).
    """
    # Rounds UNROLLED at trace time with exact halving shapes (geometric
    # total work in ONE dispatch; see whir_sumcheck_segment).  MSB pairing:
    # on the compact array, pair (i, i + len/2) is simply the two halves.
    half_c = jnp.asarray(V._const_limbs(F.to_mont(F.HALF))).reshape(16, 1)
    cur, claim, prefix = abce, claim0, prefix0
    coeffs_cols, alpha_cols = [], []
    for idx in range(m_0):
        h = cur.shape[2] // 2
        lo = cur[:, :, :h]
        hi = cur[:, :, h:]
        a0, b0, c0v, e0 = lo[:, 0], lo[:, 1], lo[:, 2], lo[:, 3]
        a1, b1, c1v, e1 = hi[:, 0], hi[:, 1], hi[:, 2], hi[:, 3]

        def dbl_sub(x0, x1):
            return V.sub_mod(V.add_mod(x0, x0), x1)

        f0v = _mm(e0, V.sub_mod(_mm(a0, b0), c0v))
        fm1v = _mm(dbl_sub(e0, e1),
                   V.sub_mod(_mm(dbl_sub(a0, a1), dbl_sub(b0, b1)),
                             dbl_sub(c0v, c1v)))
        finfv = _mm(V.sub_mod(e1, e0), _mm(V.sub_mod(a1, a0),
                                           V.sub_mod(b1, b0)))
        f0 = V.sum_mod(f0v).reshape(16, 1)
        fm1 = V.sum_mod(fm1v).reshape(16, 1)
        finf = V.sum_mod(finfv).reshape(16, 1)

        g = [g_coeffs[:, idx, k].reshape(16, 1) for k in range(4)]
        pm = pms[:, idx:idx + 1]
        sm = sms[:, idx:idx + 1]
        sfx = suffix[:, idx:idx + 1]

        cs = spartan_round_coeffs(f0, fm1, finf, claim, prefix, g,
                                  pm, sm, sfx, rho, half_c)
        cs_canon = [_from_mont1(c) for c in cs]
        coeffs_cols.append(jnp.stack(cs_canon, axis=2).reshape(16, 1, 4))
        state = _absorb_seq(state, cs_canon)
        state, alpha_c = _squeeze1(state)
        alpha_cols.append(alpha_c)
        alpha_m = _to_mont1(alpha_c)

        claim = _eval_poly_mont(cs, alpha_m)
        prefix = V.add_mod(prefix, _eval_poly_mont(g, alpha_m))

        ab = jnp.broadcast_to(alpha_m[:, None, :], (16, 4, h))
        cur = V.add_mod(lo, V.mont_mul(ab, V.sub_mod(hi, lo)))

    return (state, jnp.concatenate(coeffs_cols, axis=1),
            jnp.concatenate(alpha_cols, axis=1))

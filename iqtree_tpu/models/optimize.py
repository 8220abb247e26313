"""Model-parameter packing and joint optimization.

TPU-native replacement for ModelFactory::optimizeParameters
(/root/reference/model/modelfactory.cpp:707-1000): instead of alternating
per-parameter Brent / BFGS / EM loops, all free model parameters are
mapped to one unconstrained pytree and optimized by L-BFGS with exact
autodiff gradients (through the custom-VJP likelihood, the differentiable
eigendecomposition, and the differentiable Gamma quadrature); branch
lengths are interleaved via the batched Newton sweeps.

Unconstrained parameterization (replacing the reference's box bounds,
modelgtr.cpp setBounds / rategamma MIN/MAX_GAMMA_SHAPE):
  exchangeabilities  r_g = exp(x)            (reference bounds [1e-4, 100])
  frequencies        pi = softmax(x) floored at MIN_FREQ
  gamma shape        alpha = clip(exp(x), 0.02, 100)
  p_invar            p = sigmoid(x) * max_pinv  (max = fraction const sites)
  free rates (+R)    r = exp(x), w = softmax(y), renormalized to mean 1
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.derivatives import optimize_all_branches
from ..engine.grad import loglik
from ..engine.likelihood import ModelArrays, SiteData, TreeArrays
from ..utils.gamma_jax import discrete_gamma_rates_jax
from ..utils.lbfgs import lbfgs_minimize
from .eigen import eigen_reversible
from .rates import MAX_GAMMA_SHAPE, MIN_GAMMA_SHAPE, RateModel
from .subst import FREQ_ESTIMATE, ReversibleModel, pair_index

MIN_FREQ = 1e-4


@dataclass
class ModelOptimizer:
    """Builds ModelArrays from an unconstrained parameter pytree.

    Host-side constructor captures the static structure (which parameters
    are free, index arrays); `build` is pure/jit-traceable."""

    subst: ReversibleModel
    rate: RateModel
    dtype: object = jnp.float64

    def __post_init__(self):
        from .codon import CodonModel
        from .mixture import MixtureModel
        from .nonrev import NonRevModel

        self._jit_cache = {}
        s = self.subst
        self.is_mixture = isinstance(s, MixtureModel)
        self.is_codon = isinstance(s, CodonModel)
        self.is_nonrev = isinstance(s, NonRevModel)
        self.opt_alpha = self.rate.has_gamma and not self.rate.fix_alpha
        self.opt_pinv = self.rate.has_invar and not self.rate.fix_p_invar
        self.opt_free = self.rate.is_free_rate
        self.opt_kat = getattr(self.rate, "is_kategory", False)
        self.max_pinv = 0.999  # caller may tighten to frac_const_sites
        if self.is_nonrev:
            # UNREST: 11 free off-diagonal rates (last pinned 1.0,
            # modelnonrev.cpp:26); frequencies derive from Q, not free
            self.opt_rates = False
            self.opt_freq = False
            self.opt_weights = False
            self.opt_kappa = self.opt_omega = False
            self.opt_nr = not s.fixed_rates
            return
        self.opt_nr = False
        if self.is_mixture:
            self.opt_rates = False
            self.opt_freq = False
            self.opt_weights = (not s.fix_weights) and s.n_mix > 1
            # components are fixed matrices: eigendecompose once on host
            lam_m, v_m, vinv_m, freq_m = s.eigen_all()
            R = self.rate.ncat
            if s.fused_with_rate:
                if s.n_mix != R:
                    raise ValueError(
                        f"fused mixture has {s.n_mix} classes, rate model {R}"
                    )
                self._mix_eigen = (lam_m, v_m, vinv_m, freq_m)
            else:
                self._mix_eigen = (
                    np.repeat(lam_m, R, axis=0),
                    np.repeat(v_m, R, axis=0),
                    np.repeat(vinv_m, R, axis=0),
                    np.repeat(freq_m, R, axis=0),
                )
            return
        self.opt_weights = False
        self.opt_freq = s.freq_type == FREQ_ESTIMATE
        if self.is_codon:
            self.opt_rates = False
            self.opt_kappa = not s.fix_kappa
            self.opt_omega = not s.fix_omega
            return
        self.opt_kappa = self.opt_omega = False
        self.opt_rates = (not s.fixed_rates) and s.rate_groups is not None and s.n_rate_params > 0
        # static scatter indices for the exchangeability matrix
        S = s.num_states
        pairs = pair_index(S)
        self.pair_i = np.array([i for i, j in pairs])
        self.pair_j = np.array([j for i, j in pairs])

    # -- packing -------------------------------------------------------
    def init_params(self) -> Dict[str, jnp.ndarray]:
        p: Dict[str, jnp.ndarray] = {}
        dt = self.dtype
        if self.is_mixture and self.opt_weights:
            p["mix_logits"] = jnp.asarray(
                np.log(np.maximum(self.subst.weights, 1e-6)), dtype=dt
            )
        if self.is_nonrev and self.opt_nr:
            p["log_nr_rates"] = jnp.asarray(
                np.log(np.maximum(self.subst.nr_rates[:-1], 1e-4)), dtype=dt
            )
        if self.is_codon:
            if self.opt_kappa:
                p["log_kappa"] = jnp.asarray(np.log(self.subst.kappa), dtype=dt)
            if self.opt_omega:
                p["log_omega"] = jnp.asarray(np.log(self.subst.omega), dtype=dt)
        if self.opt_rates:
            p["log_rates"] = jnp.asarray(
                np.log(np.maximum(self.subst.group_rates[1:], 1e-4)), dtype=dt
            )
        if self.opt_freq:
            p["freq_logits"] = jnp.asarray(
                np.log(np.maximum(self.subst.state_freq, MIN_FREQ)), dtype=dt
            )
        if self.opt_alpha:
            # alpha = MIN + (MAX-MIN)*sigmoid(x): soft bounds keep a live
            # gradient at the rails (hard clip strands L-BFGS there)
            a0 = np.clip(
                (self.rate.alpha - MIN_GAMMA_SHAPE)
                / (MAX_GAMMA_SHAPE - MIN_GAMMA_SHAPE),
                1e-6,
                1 - 1e-6,
            )
            p["alpha_logit"] = jnp.asarray(np.log(a0 / (1 - a0)), dtype=dt)
        if self.opt_pinv:
            pv = self.rate.p_invar
            if pv <= 0.0:
                # start mid-range like the reference (frac_const/2,
                # model/rateinvar.cpp:26) — initializing at 0 parks the
                # logit at a saturated rail where the gradient vanishes
                # and p_invar never moves (seen as +I+G converging to
                # p_inv ~ 1e-4 with compensating alpha)
                pv = 0.5 * self.max_pinv
            p0 = np.clip(pv / self.max_pinv, 1e-4, 1 - 1e-4)
            p["logit_pinv"] = jnp.asarray(np.log(p0 / (1 - p0)), dtype=dt)
        if self.opt_free:
            p["log_free_rates"] = jnp.asarray(
                np.log(np.maximum(self.rate.free_rates, 1e-6)), dtype=dt
            )
            p["free_logits"] = jnp.asarray(
                np.log(np.maximum(self.rate.free_props, 1e-6)), dtype=dt
            )
        if self.opt_kat and self.rate.ncat > 1:
            # +K: K-1 logits; rates = K * softmax([0, logits]) keeps the
            # reference's sum(rates) == ncat constraint
            # (ratekategory.cpp:38) smoothly
            r0 = np.maximum(np.asarray(self.rate.free_rates), 1e-6)
            logit = np.log(r0 / r0.sum())
            p["kat_logits"] = jnp.asarray(logit[1:] - logit[0], dtype=dt)
        return p

    # -- building ------------------------------------------------------
    def _exchange_matrix(self, params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """[S,S] symmetric exchangeability matrix from the parameters
        (shared by the plain build and the site-specific SSF build)."""
        dt = self.dtype
        S = self.subst.num_states
        if self.is_codon:
            sub = self.subst
            lk = (
                params["log_kappa"]
                if self.opt_kappa
                else jnp.asarray(np.log(sub.kappa), dt)
            )
            lo = (
                params["log_omega"]
                if self.opt_omega
                else jnp.asarray(np.log(sub.omega), dt)
            )
            step = jnp.asarray(sub._step, dt)
            ts = jnp.asarray(sub._ts, dt)
            nsyn = jnp.asarray(sub._nonsyn, dt)
            sym = step * jnp.exp(lk * ts + lo * nsyn)
            if sub.mg:
                sym = sym * jnp.asarray(sub.mg_factor(), dt)
        elif self.subst.exchange is not None:
            sym = jnp.asarray(self.subst.exchange, dtype=dt)
        else:
            if self.opt_rates:
                group_rates = jnp.concatenate(
                    [jnp.ones((1,), dt), jnp.exp(params["log_rates"])]
                )
            else:
                group_rates = jnp.asarray(self.subst.group_rates, dtype=dt)
            pair_rates = group_rates[jnp.asarray(self.subst.rate_groups)]
            sym = jnp.zeros((S, S), dt)
            sym = sym.at[self.pair_i, self.pair_j].set(pair_rates)
            sym = sym + sym.T
        return sym

    def build(self, params: Dict[str, jnp.ndarray]) -> ModelArrays:
        if self.is_nonrev:
            return self._build_nonrev(params)
        if self.is_mixture:
            return self._build_mixture(params)
        dt = self.dtype
        S = self.subst.num_states
        sym = self._exchange_matrix(params)
        # frequencies
        if self.opt_freq:
            freq = jax.nn.softmax(params["freq_logits"])
            freq = jnp.maximum(freq, MIN_FREQ)
            freq = freq / freq.sum()
        else:
            freq = jnp.asarray(self.subst.state_freq, dtype=dt)
        lam, v, vinv = eigen_reversible(sym, freq)
        rates, props, pinv = self._rate_part(params)
        C_out = rates.shape[0]
        return ModelArrays(
            eigenvalues=jnp.broadcast_to(lam.astype(dt), (C_out, S)),
            eigvec=jnp.broadcast_to(v.astype(dt), (C_out, S, S)),
            inv_eigvec=jnp.broadcast_to(vinv.astype(dt), (C_out, S, S)),
            state_freq=jnp.broadcast_to(freq.astype(dt), (C_out, S)),
            rates=rates,
            props=props,
            p_invar=jnp.asarray(pinv, dtype=dt),
        )

    def _build_nonrev(self, params) -> ModelArrays:
        """UNREST ModelArrays: carries Q itself (qmat); the engine's
        transition matrices then go through expm (models/nonrev.py)."""
        from .nonrev import nonrev_qmat

        dt = self.dtype
        S = self.subst.num_states
        if self.opt_nr:
            r = jnp.concatenate(
                [jnp.exp(params["log_nr_rates"]), jnp.ones((1,), dt)]
            )
        else:
            r = jnp.asarray(self.subst.nr_rates, dtype=dt)
        q, pi = nonrev_qmat(r, S)
        rates, props, pinv = self._rate_part(params)
        C = rates.shape[0]
        eye = jnp.broadcast_to(jnp.eye(S, dtype=dt), (C, S, S))
        return ModelArrays(
            eigenvalues=jnp.zeros((C, S), dt),  # unused on the expm path
            eigvec=eye,
            inv_eigvec=eye,
            state_freq=jnp.broadcast_to(pi.astype(dt), (C, S)),
            rates=rates,
            props=props,
            p_invar=jnp.asarray(pinv, dtype=dt),
            qmat=jnp.broadcast_to(q.astype(dt), (C, S, S)),
        )

    def _rate_part(self, params):
        """(rates [R], props [R], pinv) from the rate-model parameters."""
        dt = self.dtype
        if self.opt_pinv:
            pinv = jax.nn.sigmoid(params["logit_pinv"]) * self.max_pinv
        else:
            pinv = jnp.asarray(self.rate.p_invar, dtype=dt)
        C = self.rate.ncat
        if self.rate.has_gamma:
            if self.opt_alpha:
                alpha = MIN_GAMMA_SHAPE + (
                    MAX_GAMMA_SHAPE - MIN_GAMMA_SHAPE
                ) * jax.nn.sigmoid(params["alpha_logit"])
            else:
                alpha = jnp.asarray(self.rate.alpha, dtype=dt)
            rates = discrete_gamma_rates_jax(alpha, C, pinv).astype(dt)
            props = jnp.full((C,), 1.0, dt) * (1.0 - pinv) / C
        elif self.opt_free:
            r = jnp.exp(params["log_free_rates"])
            w = jax.nn.softmax(params["free_logits"]) * (1.0 - pinv)
            mean = jnp.sum(r * w)
            rates = r / jnp.maximum(mean, 1e-8)
            props = w
        elif self.opt_kat:
            if self.rate.ncat > 1:
                logits = jnp.concatenate(
                    [jnp.zeros((1,), dt), params["kat_logits"]]
                )
                rates = jax.nn.softmax(logits) * self.rate.ncat
            else:
                rates = jnp.ones((1,), dt)
            # weight 1.0 per category (reference RateKategory convention,
            # rateheterogeneity.h:121 — see models/rates.py)
            props = jnp.ones((self.rate.ncat,), dt)
        else:
            rates = jnp.ones((1,), dt)
            props = jnp.ones((1,), dt) * (1.0 - pinv)
        return rates, props, pinv

    def _build_mixture(self, params) -> ModelArrays:
        """Fused (mixture x rate) ModelArrays; component eigensystems are
        fixed host constants, weights/rate-model parameters are traced."""
        dt = self.dtype
        mix = self.subst
        lam, v, vinv, freq = self._mix_eigen
        rates_r, props_r, pinv = self._rate_part(params)
        if self.opt_weights:
            w = jax.nn.softmax(params["mix_logits"])
        else:
            w = jnp.asarray(mix.weights, dtype=dt)
        comp_rate = jnp.asarray(mix.comp_rates, dtype=dt)
        if mix.fused_with_rate:
            rates = rates_r * comp_rate
            if self.opt_free:
                # LG4X-style: FreeRate weights ARE the class weights
                props = props_r
            else:
                props = w * jnp.sum(props_r)
        else:
            R = rates_r.shape[0]
            rates = (comp_rate[:, None] * rates_r[None, :]).reshape(-1)
            props = (w[:, None] * props_r[None, :]).reshape(-1)
        return ModelArrays(
            eigenvalues=jnp.asarray(lam, dtype=dt),
            eigvec=jnp.asarray(v, dtype=dt),
            inv_eigvec=jnp.asarray(vinv, dtype=dt),
            state_freq=jnp.asarray(freq, dtype=dt),
            rates=rates,
            props=props,
            p_invar=jnp.asarray(pinv, dtype=dt),
        )

    # -- write-back for reporting --------------------------------------
    def unpack(self, params: Dict[str, jnp.ndarray]):
        s, r = self.subst, self.rate
        if self.is_mixture and self.opt_weights:
            w = np.asarray(jax.nn.softmax(params["mix_logits"]))
            s.weights = w / w.sum()
        if self.is_codon:
            if self.opt_kappa:
                s.kappa = float(np.exp(params["log_kappa"]))
            if self.opt_omega:
                s.omega = float(np.exp(params["log_omega"]))
            s.refresh_exchange()
        if self.is_nonrev and self.opt_nr:
            s.set_rate_param_vector(
                np.exp(np.asarray(params["log_nr_rates"]))
            )
        if self.opt_rates:
            s.set_rate_param_vector(np.exp(np.asarray(params["log_rates"])))
        if self.opt_freq:
            f = np.asarray(jax.nn.softmax(params["freq_logits"]))
            f = np.maximum(f, MIN_FREQ)
            s.state_freq = f / f.sum()
        if self.opt_alpha:
            r.alpha = float(
                MIN_GAMMA_SHAPE
                + (MAX_GAMMA_SHAPE - MIN_GAMMA_SHAPE)
                * jax.nn.sigmoid(params["alpha_logit"])
            )
        if self.opt_pinv:
            r.p_invar = float(
                jax.nn.sigmoid(params["logit_pinv"]) * self.max_pinv
            )
        if self.opt_free:
            rr = np.exp(np.asarray(params["log_free_rates"]))
            ww = np.asarray(jax.nn.softmax(params["free_logits"]))
            r.free_rates, r.free_props = rr, ww
        if self.opt_kat and r.ncat > 1:
            logits = np.concatenate([[0.0], np.asarray(params["kat_logits"])])
            e = np.exp(logits - logits.max())
            r.free_rates = e / e.sum() * r.ncat
        return s, r

    @property
    def n_free_params(self) -> int:
        return sum(np.size(v) for v in self.init_params().values())


def fit_model_step(
    opt: ModelOptimizer,
    tree: TreeArrays,
    site: SiteData,
    params: Dict[str, jnp.ndarray],
    max_iters: int = 60,
    steps=None,
    n_slots: int = 0,
    lbfgs_state=None,
    return_state: bool = False,
):
    """One L-BFGS solve of all model parameters (branch lengths fixed).
    Jit-friendly; analogue of the model/rate halves of
    ModelFactory::optimizeParameters.

    With a slot schedule (steps, n_slots) the likelihood runs through the
    fused Pallas kernel — both the L-BFGS value evaluations and the
    forward of value_and_grad — keeping the optimizer loop's live HBM
    footprint to the backward sweep alone.

    lbfgs_state carries the curvature history across chunked calls
    (utils/lbfgs.py) so a 15-iteration chunk resumed 4 times converges
    like one 60-iteration solve."""
    if steps is not None:
        from ..engine.grad import loglik_fused_fn

        lfn = loglik_fused_fn(n_slots)

        def _lnl(ma):
            l, _ = lfn(tree, ma, site, steps)
            return l
    else:
        def _lnl(ma):
            l, _ = loglik(tree, ma, site)
            return l

    if not params:
        out = params, _lnl(opt.build(params))
        return out + (lbfgs_state,) if return_state else out

    # scale the objective to O(1) per site: raw |lnL| grows with the
    # alignment (1000 taxa x 10k sites => ~2.6e6) and the resulting
    # gradient magnitudes break the Armijo line search's unit trial
    # step, stalling L-BFGS far from the optimum
    scale = jnp.sum(site.pattern_freq)

    def negloglik(p):
        return -_lnl(opt.build(p)) / scale

    # ftol: with the steepest-descent rescue in place (utils/lbfgs.py),
    # two consecutive sub-0.005-lnL steps really mean convergence; this
    # stops converged chunks from burning their full iteration budget.
    # 8 backtracks suffice: the rescue catches what deeper halving
    # would, at a fraction of the evals.
    try:
        ftol = 0.005 / float(np.asarray(site.pattern_freq).sum())
    except (jax.errors.TracerArrayConversionError, TypeError):
        ftol = 0.0
    p, val, st = lbfgs_minimize(
        negloglik, params, max_iters=max_iters, init_state=lbfgs_state,
        ftol=ftol, max_backtracks=8,
    )
    if return_state:
        return p, -val * scale, st
    return p, -val * scale


def _optimize_nonrev_joint(
    opt: ModelOptimizer,
    tree: TreeArrays,
    site: SiteData,
    params: Dict[str, jnp.ndarray],
    max_iters: int = 300,
):
    """Joint (UNREST rates, rate-model params, log branch lengths) L-BFGS.

    Gradients flow through expm inside branch_transition_mats (the
    custom-VJP loglik chains d lnL/dP -> dP/d(blen, Q) by autodiff).

    `pinned` (the zero-length virtual-root half-edge, whose index is
    topology-dependent) is a TRACED argument, so one compiled executable
    serves every same-shaped tree — a closure capture here silently
    zeroed the wrong branch when bootstrap replicates or new start trees
    reused the cache.  The solve is CHUNKED into bounded device calls
    (L-BFGS state carried across chunks) so large alignments stay under
    the remote-executor deadline, mirroring the reversible path."""
    chunk = 15

    key = ("nonrev", site.tip_codes.shape, chunk)
    fit = opt._jit_cache.get(key)
    if fit is None:

        def _fit(t, p, pinned, lbfgs_state):
            state = {
                "model": p,
                "log_blen": jnp.log(jnp.maximum(t.blen, 1e-6)),
            }
            scale = jnp.sum(site.pattern_freq)

            def neg(st):
                bl = jnp.where(pinned, 0.0, jnp.exp(st["log_blen"]))
                l, _ = loglik(t.with_blen(bl), opt.build(st["model"]), site)
                return -l / scale

            st, val, lbfgs_state = lbfgs_minimize(
                neg, state, max_iters=chunk, init_state=lbfgs_state
            )
            bl = jnp.where(pinned, 0.0, jnp.exp(st["log_blen"]))
            return t.with_blen(bl), st["model"], -val * scale, lbfgs_state

        fit = jax.jit(_fit)
        opt._jit_cache[key] = fit

    from ..utils.lbfgs import zero_lbfgs_state

    pinned = jnp.asarray(np.asarray(tree.blen) <= 0.0)
    lnl_prev = -np.inf
    lbfgs_state = zero_lbfgs_state(
        {"model": params, "log_blen": tree.blen}
    )
    for _ in range(max(1, -(-max_iters // chunk))):
        tree, params, lnl, lbfgs_state = fit(tree, params, pinned, lbfgs_state)
        if float(lnl) - lnl_prev < 1e-3:
            break
        lnl_prev = float(lnl)
    return tree, params, float(lnl)


def optimize_model_and_branches(
    opt: ModelOptimizer,
    tree: TreeArrays,
    site: SiteData,
    params: Optional[Dict[str, jnp.ndarray]] = None,
    rounds: int = 10,
    tol: float = 0.01,
    branch_sweeps: int = 100,
    model_iters: int = 60,
    steps=None,
    n_slots: int = 0,
):
    """Alternating (model L-BFGS | branch Newton) until lnL gain < tol,
    mirroring the reference's alternation loop (modelfactory.cpp:937).
    Host-side loop over two jitted device steps.  Returns
    (tree, params, lnl)."""
    if params is None:
        params = opt.init_params()

    if opt.is_nonrev:
        # the theta-buffer Newton assumes the eigen path; UNREST instead
        # optimizes rates + log branch lengths JOINTLY by L-BFGS through
        # the expm custom-VJP likelihood (the reference falls back to
        # derivative-free BFGS here, modelgtr.cpp:556 on ModelNonRev)
        return _optimize_nonrev_joint(
            opt, tree, site, params, max_iters=branch_sweeps + rounds * model_iters
        )

    # One compiled executable per (optimizer, data shape, chunk size).
    # Long optimizations are CHUNKED into bounded device calls: a single
    # call with ~60 L-BFGS iterations + 100 Newton sweeps at 1000 taxa
    # runs past the remote-TPU execution deadline (~minutes) and kills
    # the worker.  Chunk sizes are config knobs (measured ~2-3s per
    # chunk at 1000 taxa x 10k patterns, leaving a wide deadline
    # margin); set IQTREE_TPU_MCHUNK / IQTREE_TPU_BCHUNK to retune for
    # much larger workloads.
    import os

    M_CHUNK = int(os.environ.get("IQTREE_TPU_MCHUNK", 15))
    B_CHUNK = int(os.environ.get("IQTREE_TPU_BCHUNK", 25))
    key_m = ("mstep", site.tip_codes.shape, M_CHUNK, n_slots)
    key_b = ("bstep", site.tip_codes.shape, B_CHUNK, n_slots)
    mstep = opt._jit_cache.get(key_m)
    bstep = opt._jit_cache.get(key_b)
    if mstep is None:

        def _mstep(t, p, st, lst):
            return fit_model_step(opt, t, site, p, M_CHUNK, steps=st,
                                  n_slots=n_slots, lbfgs_state=lst,
                                  return_state=True)

        mstep = jax.jit(_mstep)
        opt._jit_cache[key_m] = mstep
    if bstep is None:

        def _bstep(t, p, st):
            ma = opt.build(p)
            # NOTE: keep the tight default sweep tolerance (1e-5) —
            # loosening it to the alternation tol made the sweeps stop
            # while branches were still far from optimal after large
            # model moves, stalling the whole alternation ~50 lnL short
            return optimize_all_branches(
                t, ma, site, n_sweeps=B_CHUNK,
                steps=st, n_slots=n_slots,
            )

        bstep = jax.jit(_bstep)
        opt._jit_cache[key_b] = bstep

    # Fine-grained alternation — ONE model chunk, then ONE branch chunk —
    # mirroring the reference's per-round model/rate/branch interleave
    # (modelfactory.cpp:937).  Coarse alternation (model L-BFGS run to
    # convergence before branches ever move) dives into a degenerate
    # basin when the start tree's branch lengths are far from optimal
    # (alpha -> rail, tree length exploding); interleaving lets branch
    # lengths adapt between model updates.  The L-BFGS curvature history
    # is carried across model chunks (warm restart).
    total_chunks = rounds * max(
        1, -(-model_iters // M_CHUNK), -(-branch_sweeps // B_CHUNK)
    )
    lnl_prev = -np.inf
    lnl = -np.inf
    # zero curvature history == fresh start, but keeps the jit signature
    # stable across chunks (None would force a second compile)
    from ..utils.lbfgs import zero_lbfgs_state

    lst = zero_lbfgs_state(params)
    for it in range(total_chunks):
        params, mlnl, lst = mstep(tree, params, steps, lst)
        tree, lnl = bstep(tree, params, steps)
        if float(lnl) - lnl_prev < tol and it > 0:
            break
        lnl_prev = float(lnl)
    return tree, params, float(lnl)

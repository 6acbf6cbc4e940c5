"""GP regression surrogate: latent vector z -> structure score (BIC).

Replaces the reference's gpytorch stack (``src/predictors/gp.py:13-32``:
ExactGP with ConstantMean + ScaleKernel(RBFKernel) wrapped in an
InducingPointKernel, Adam lr=0.01 on the exact marginal log-likelihood).

Two jax models, both jitted end-to-end and differentiable (the posterior
mean drives gradient-ascent latent search):

- :class:`ExactGP` — full Cholesky exact GP.  The reference's deployed
  datasets are 1.4k-20k points (``experiments/01_bn_asia/main.py:566``,
  ``gp.py:95-106``), well within exact range on a TPU.
- :class:`SGPR` — Titsias variational inducing-point regression, the
  scalable analogue of gpytorch's ``InducingPointKernel`` (default 500
  inducing points from the head of the training set, ``gp.py:23-27``).

Targets are standardized internally (predictions are returned in the
original scale); kernels use a scalar RBF lengthscale + outputscale +
Gaussian noise, all softplus-parameterized.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _softplus(x):
    return jax.nn.softplus(x)


def _inv_softplus(y: float) -> float:
    return float(np.log(np.expm1(y)))


class GPParams(NamedTuple):
    mean_const: jnp.ndarray
    raw_outputscale: jnp.ndarray
    raw_lengthscale: jnp.ndarray
    raw_noise: jnp.ndarray


def init_params() -> GPParams:
    return GPParams(
        mean_const=jnp.zeros(()),
        raw_outputscale=jnp.asarray(_inv_softplus(1.0)),
        raw_lengthscale=jnp.asarray(_inv_softplus(1.0)),
        raw_noise=jnp.asarray(_inv_softplus(0.1)),
    )


def _sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    cross = jnp.matmul(a, b.T, preferred_element_type=jnp.float32)
    return jnp.maximum(a2 - 2.0 * cross + b2.T, 0.0)


def rbf_kernel(params: GPParams, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    lengthscale = _softplus(params.raw_lengthscale)
    outputscale = _softplus(params.raw_outputscale)
    return outputscale * jnp.exp(-0.5 * _sq_dists(a, b) / (lengthscale**2))


class ExactGP:
    """Exact GP regression with standardized targets.

    fit() runs `iters` Adam steps (lr matches the reference's 0.01) on the
    negative marginal log-likelihood under one lax.scan.
    """

    def __init__(self, jitter: float = 1e-4):
        self.jitter = jitter
        self.params: GPParams | None = None
        self._x = None
        self._y_std = None
        self._y_mean = None
        self._y_scale = None
        self._chol = None
        self._alpha = None

    def _nmll(self, params: GPParams, x, y) -> jnp.ndarray:
        n = x.shape[0]
        noise = _softplus(params.raw_noise) + self.jitter
        k = rbf_kernel(params, x, x) + noise * jnp.eye(n)
        chol = jnp.linalg.cholesky(k)
        resid = y - params.mean_const
        alpha = jax.scipy.linalg.cho_solve((chol, True), resid)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return 0.5 * (
            jnp.dot(resid, alpha) + logdet + n * jnp.log(2.0 * jnp.pi)
        )

    def fit(
        self,
        x: np.ndarray,
        y: np.ndarray,
        iters: int = 500,
        learning_rate: float = 0.01,
        init: "GPParams | None" = None,
    ) -> "ExactGP":
        """``init`` warm-starts the hyperparameters (e.g. from a previous
        round's fit in the closed BO loop) so a handful of Adam steps
        suffices instead of a cold 200-500."""
        import optax

        x = jnp.asarray(x, dtype=jnp.float32)
        y = np.asarray(y, dtype=np.float64)
        self._y_mean = float(y.mean())
        self._y_scale = float(y.std() + 1e-12)
        y_std = jnp.asarray((y - self._y_mean) / self._y_scale, dtype=jnp.float32)

        params = init if init is not None else init_params()
        opt = optax.adam(learning_rate)
        opt_state = opt.init(params)
        nmll = functools.partial(self._nmll, x=x, y=y_std)

        @jax.jit
        def run(params, opt_state):
            def step(carry, _):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(nmll)(params)
                updates, opt_state = opt.update(grads, opt_state)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), None, length=iters
            )
            return params, losses

        params, losses = run(params, opt_state)
        self.params = params
        self._x = x
        self._y_std = y_std
        self.final_nmll = float(losses[-1])

        noise = _softplus(params.raw_noise) + self.jitter
        k = rbf_kernel(params, x, x) + noise * jnp.eye(x.shape[0])
        self._chol = jnp.linalg.cholesky(k)
        self._alpha = jax.scipy.linalg.cho_solve(
            (self._chol, True), y_std - params.mean_const
        )
        return self

    def posterior_mean_std(self, xs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Standardized-space posterior (differentiable w.r.t. xs)."""
        ks = rbf_kernel(self.params, xs, self._x)
        mean = self.params.mean_const + ks @ self._alpha
        v = jax.scipy.linalg.solve_triangular(self._chol, ks.T, lower=True)
        kss = _softplus(self.params.raw_outputscale)
        var = jnp.maximum(kss - jnp.sum(v * v, axis=0), 1e-12)
        return mean, jnp.sqrt(var)

    def predict(self, xs: np.ndarray) -> np.ndarray:
        """Posterior mean in the original target scale."""
        mean, _ = self.posterior_mean_std(jnp.asarray(xs, dtype=jnp.float32))
        return np.asarray(mean) * self._y_scale + self._y_mean

    def predict_with_std(self, xs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        mean, std = self.posterior_mean_std(jnp.asarray(xs, dtype=jnp.float32))
        return (
            np.asarray(mean) * self._y_scale + self._y_mean,
            np.asarray(std) * self._y_scale,
        )


class SGPR(ExactGP):
    """Titsias sparse GP (inducing points), gpytorch-InducingPointKernel
    analogue.  Inducing locations initialize from the training head
    (reference ``gp.py:25``) and are optimized jointly."""

    def __init__(self, num_inducing: int = 500, jitter: float = 1e-4):
        super().__init__(jitter)
        self.num_inducing = num_inducing
        self.inducing: jnp.ndarray | None = None

    def fit(self, x, y, iters: int = 500, learning_rate: float = 0.01) -> "SGPR":
        import optax

        x = jnp.asarray(x, dtype=jnp.float32)
        y = np.asarray(y, dtype=np.float64)
        self._y_mean = float(y.mean())
        self._y_scale = float(y.std() + 1e-12)
        y_std = jnp.asarray((y - self._y_mean) / self._y_scale, dtype=jnp.float32)
        m = min(self.num_inducing, x.shape[0])
        state = {"gp": init_params(), "z": x[:m]}

        def bound(state):
            """Negative Titsias collapsed bound."""
            params, z = state["gp"], state["z"]
            n = x.shape[0]
            noise = _softplus(params.raw_noise) + self.jitter
            kuu = rbf_kernel(params, z, z) + self.jitter * jnp.eye(m)
            kuf = rbf_kernel(params, z, x)
            lu = jnp.linalg.cholesky(kuu)
            a = jax.scipy.linalg.solve_triangular(lu, kuf, lower=True)  # [m, n]
            b = jnp.eye(m) + (a @ a.T) / noise
            lb = jnp.linalg.cholesky(b)
            resid = y_std - params.mean_const
            c = jax.scipy.linalg.solve_triangular(lb, a @ resid, lower=True) / noise
            logdet = (
                2.0 * jnp.sum(jnp.log(jnp.diagonal(lb)))
                + n * jnp.log(noise)
            )
            quad = (jnp.dot(resid, resid) / noise) - jnp.dot(c, c)
            kdiag = _softplus(params.raw_outputscale) * n
            trace = (kdiag - jnp.sum(a * a)) / noise
            return 0.5 * (logdet + quad + n * jnp.log(2.0 * jnp.pi) + trace)

        opt = optax.adam(learning_rate)
        opt_state = opt.init(state)

        @jax.jit
        def run(state, opt_state):
            def step(carry, _):
                state, opt_state = carry
                loss, grads = jax.value_and_grad(bound)(state)
                updates, opt_state = opt.update(grads, opt_state)
                return (optax.apply_updates(state, updates), opt_state), loss

            (state, opt_state), losses = jax.lax.scan(
                step, (state, opt_state), None, length=iters
            )
            return state, losses

        state, losses = run(state, opt_state)
        self.params = state["gp"]
        self.inducing = state["z"]
        self.final_nmll = float(losses[-1])

        # Predictive precomputation (SGPR posterior).
        params, z = self.params, self.inducing
        noise = _softplus(params.raw_noise) + self.jitter
        kuu = rbf_kernel(params, z, z) + self.jitter * jnp.eye(m)
        kuf = rbf_kernel(params, z, x)
        lu = jnp.linalg.cholesky(kuu)
        a = jax.scipy.linalg.solve_triangular(lu, kuf, lower=True)
        b = jnp.eye(m) + (a @ a.T) / noise
        lb = jnp.linalg.cholesky(b)
        resid = y_std - params.mean_const
        c = jax.scipy.linalg.solve_triangular(lb, a @ resid, lower=True) / noise
        self._lu, self._lb, self._c = lu, lb, c
        return self

    def posterior_mean_std(self, xs):
        params, z = self.params, self.inducing
        kus = rbf_kernel(params, z, xs)  # [m, S]
        tmp1 = jax.scipy.linalg.solve_triangular(self._lu, kus, lower=True)
        tmp2 = jax.scipy.linalg.solve_triangular(self._lb, tmp1, lower=True)
        mean = params.mean_const + tmp2.T @ self._c
        kss = _softplus(params.raw_outputscale)
        var = jnp.maximum(
            kss - jnp.sum(tmp1 * tmp1, axis=0) + jnp.sum(tmp2 * tmp2, axis=0),
            1e-12,
        )
        return mean, jnp.sqrt(var)

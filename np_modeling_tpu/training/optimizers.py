"""Optimizers as pure gradient transformations.

Reference parity: /root/reference/optimizer.py. The reference mutates weights
in place during the backward sweep, keyed by ``id(obj).attr``
(optimizer.py:12-23) — the functional equivalent is a pure
``(grads, state, params) -> (updates, state)`` over pytrees, applied after
``jax.grad`` inside one jitted train step.

Adam note: the reference puts epsilon INSIDE the sqrt — ``m̂/√(v̂+ε)`` with
ε=1e-7 (optimizer.py:62-63) — deviating from canonical ``m̂/(√v̂+ε)``. We
default to canonical and expose ``reference_epsilon=True`` for bit-parity
with the reference's trajectory.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class Optimizer(NamedTuple):
    init: Callable[[Any], Any]
    update: Callable[[Any, Any, Any], tuple]  # (grads, state, params) -> (updates, state)


def apply_updates(params, updates):
    return jax.tree_util.tree_map(lambda p, u: (p + u).astype(p.dtype),
                                  params, updates)


def _lr_at(learning_rate, count):
    """Resolve a constant or schedule (step -> lr) learning rate."""
    if callable(learning_rate):
        return learning_rate(count)
    return learning_rate


def sgd(learning_rate) -> Optimizer:
    """w -= lr * g (reference optimizer.py:26-33). lr: float or schedule."""

    def init(params):
        del params
        return jnp.zeros((), jnp.int32)

    def update(grads, state, params=None):
        del params
        lr = _lr_at(learning_rate, state)
        return (jax.tree_util.tree_map(lambda g: -lr * g, grads),
                state + 1)

    return Optimizer(init, update)


def momentum(learning_rate: float, beta: float = 0.9) -> Optimizer:
    def init(params):
        return jax.tree_util.tree_map(jnp.zeros_like, params)

    def update(grads, state, params=None):
        del params
        new_v = jax.tree_util.tree_map(lambda v, g: beta * v + g, state, grads)
        updates = jax.tree_util.tree_map(lambda v: -learning_rate * v, new_v)
        return updates, new_v

    return Optimizer(init, update)


class AdamState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def adam(learning_rate, beta1: float = 0.9, beta2: float = 0.999,
         epsilon: float = 1e-8, reference_epsilon: bool = False) -> Optimizer:
    """Bias-corrected Adam. lr: float or schedule (step -> lr).

    ``reference_epsilon=True`` -> ``m̂/√(v̂+ε)`` (reference optimizer.py:62-63,
    ε default there is 1e-7); False -> canonical ``m̂/(√v̂+ε)`` (optax-equal).
    """

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamState(jnp.zeros((), jnp.int32), z,
                         jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = jax.tree_util.tree_map(
            lambda m, g: beta1 * m + (1 - beta1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: beta2 * v + (1 - beta2) * jnp.square(g),
            state.nu, grads)
        bc1 = 1 - beta1 ** t
        bc2 = 1 - beta2 ** t
        lr = _lr_at(learning_rate, state.count)

        def u(m, v):
            mhat = m / bc1
            vhat = v / bc2
            if reference_epsilon:
                denom = jnp.sqrt(vhat + epsilon)
            else:
                denom = jnp.sqrt(vhat) + epsilon
            return -lr * mhat / denom

        updates = jax.tree_util.tree_map(u, mu, nu)
        return updates, AdamState(count, mu, nu)

    return Optimizer(init, update)


def adamw(learning_rate, beta1: float = 0.9, beta2: float = 0.999,
          epsilon: float = 1e-8, weight_decay: float = 0.01) -> Optimizer:
    """Adam with decoupled weight decay (extension)."""
    base = adam(learning_rate, beta1, beta2, epsilon)

    def update(grads, state, params):
        lr = _lr_at(learning_rate, state.count)
        updates, state2 = base.update(grads, state, params)
        updates = jax.tree_util.tree_map(
            lambda u, p: u - lr * weight_decay * p, updates, params)
        return updates, state2

    return Optimizer(base.init, update)


def adafactor(learning_rate, min_dim_size_to_factor: int = 128,
              decay_rate: float = 0.8, epsilon: float = 1e-30,
              clipping_threshold: float | None = 1.0,
              multiply_by_parameter_scale: bool = True,
              epsilon_scale: float = 1e-3) -> Optimizer:
    """Adafactor (Shazeer & Stern 2018): factored second moments.

    For params whose two largest dims are both >= min_dim_size_to_factor,
    the second-moment EMA is stored as a row EMA + column EMA (O(m+n)
    instead of O(m*n) optimizer memory — the reason large TPU models train
    with Adafactor). Matches ``optax.adafactor`` with the same arguments
    (momentum-free form); verified leafwise in tests.
    """

    def _factored_dims(shape):
        if len(shape) < 2:
            return None
        sorted_dims = sorted(((s, i) for i, s in enumerate(shape)))
        if sorted_dims[-2][0] < min_dim_size_to_factor:
            return None
        # (second-largest axis, largest axis); ties resolve like optax
        # (argsort order).
        return sorted_dims[-2][1], sorted_dims[-1][1]

    def init(params):
        leaves = jax.tree_util.tree_leaves(params)
        state = []
        for p in leaves:
            f = _factored_dims(p.shape)
            if f is not None:
                d1, d0 = f   # d1: second-largest axis, d0: largest axis
                vr_shape = list(p.shape)
                del vr_shape[d0]          # row EMA: mean over largest axis
                vc_shape = list(p.shape)
                del vc_shape[d1]
                state.append({"v_row": jnp.zeros(vr_shape, jnp.float32),
                              "v_col": jnp.zeros(vc_shape, jnp.float32)})
            else:
                # zeros_like preserves the param's sharding (param-sized
                # state must live where the param lives on a mesh).
                state.append({"v": jnp.zeros_like(p, dtype=jnp.float32)})
        return (jnp.zeros((), jnp.int32), tuple(state))

    def update(grads, state, params=None):
        count, factors = state
        count = count + 1
        t = count.astype(jnp.float32)
        decay = 1.0 - t ** (-decay_rate)
        lr = _lr_at(learning_rate, count - 1)
        gleaves, treedef = jax.tree_util.tree_flatten(grads)
        pleaves = (jax.tree_util.tree_leaves(params) if params is not None
                   else [None] * len(gleaves))
        new_factors, updates = [], []
        for g, p, s in zip(gleaves, pleaves, factors):
            g32 = g.astype(jnp.float32)
            gsq = jnp.square(g32) + epsilon
            f = _factored_dims(g.shape)
            if f is not None:
                d1, d0 = f
                v_row = decay * s["v_row"] + (1 - decay) * jnp.mean(gsq,
                                                                    axis=d0)
                v_col = decay * s["v_col"] + (1 - decay) * jnp.mean(gsq,
                                                                    axis=d1)
                new_factors.append({"v_row": v_row, "v_col": v_col})
                # V ~= (row EMA x col EMA) / mean(row EMA): paper eq. (4).
                reduced_d1 = d1 - 1 if d1 > d0 else d1
                row_mean = jnp.mean(v_row, axis=reduced_d1, keepdims=True)
                row_factor = (v_row / row_mean) ** -0.5
                col_factor = v_col ** -0.5
                u = (g32 * jnp.expand_dims(row_factor, d0)
                     * jnp.expand_dims(col_factor, d1))
            else:
                v = decay * s["v"] + (1 - decay) * gsq
                new_factors.append({"v": v})
                u = g32 * (v ** -0.5)
            if clipping_threshold is not None:
                rms_u = jnp.sqrt(jnp.mean(jnp.square(u)))
                u = u / jnp.maximum(1.0, rms_u / clipping_threshold)
            scale = lr
            if multiply_by_parameter_scale:
                assert p is not None, (
                    "adafactor(multiply_by_parameter_scale=True) needs "
                    "params in update()")
                pscale = jnp.maximum(
                    jnp.sqrt(jnp.mean(jnp.square(p.astype(jnp.float32)))),
                    epsilon_scale)
                scale = scale * pscale
            updates.append((-scale * u).astype(g.dtype))
        return (jax.tree_util.tree_unflatten(treedef, updates),
                (count, tuple(new_factors)))

    return Optimizer(init, update)


def lion(learning_rate, beta1: float = 0.9, beta2: float = 0.99,
         weight_decay: float = 0.0) -> Optimizer:
    """Lion (Chen et al. 2023): sign of a momentum interpolation.

    ``u = -lr * (sign(b1*m + (1-b1)*g) + wd*p); m <- b2*m + (1-b2)*g``.
    1 state tree (vs Adam's 2) and sign-quantized updates. Matches
    ``optax.lion`` with the same arguments (verified leafwise in tests).
    """

    def init(params):
        return (jnp.zeros((), jnp.int32),
                jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        count, mu = state
        lr = _lr_at(learning_rate, count)

        def u(g, m, p):
            upd = jnp.sign(beta1 * m + (1 - beta1) * g)
            if weight_decay and p is not None:
                upd = upd + weight_decay * p
            return -lr * upd

        if weight_decay:
            assert params is not None, "lion(weight_decay>0) needs params"
            updates = jax.tree_util.tree_map(u, grads, mu, params)
        else:
            updates = jax.tree_util.tree_map(lambda g, m: u(g, m, None),
                                             grads, mu)
        new_mu = jax.tree_util.tree_map(
            lambda m, g: beta2 * m + (1 - beta2) * g, mu, grads)
        return updates, (count + 1, new_mu)

    return Optimizer(init, update)


def _newton_schulz(m, steps: int = 5):
    """Quintic Newton-Schulz orthogonalization (Muon's core): iterates
    ``X <- aX + (XXᵀ)(bX) + (XXᵀ)²(cX)`` on the Frobenius-normalized matrix,
    driving singular values toward 1 (loosely, into ~[0.7, 1.2])."""
    a, b, c = 3.4445, -4.7750, 2.0315
    x = m.astype(jnp.float32)
    transposed = x.shape[0] > x.shape[1]
    if transposed:
        x = x.T
    x = x / (jnp.linalg.norm(x) + 1e-7)
    for _ in range(steps):
        xxt = x @ x.T
        x = a * x + (b * xxt + c * (xxt @ xxt)) @ x
    return (x.T if transposed else x).astype(m.dtype)


def muon(learning_rate, beta: float = 0.95, ns_steps: int = 5,
         adam_lr: float | None = None, beta1: float = 0.9,
         beta2: float = 0.999, epsilon: float = 1e-8,
         nesterov: bool = True,
         exclude: str = r".*(embedding|lm_head|pos_embed|table).*") -> Optimizer:
    """Muon (Jordan et al. 2024): momentum orthogonalized by Newton-Schulz.

    Matrix params (ndim >= 2, flattened to [dim0, rest]) get
    ``-lr * sqrt(max(1, rows/cols)) * NS5(momentum)``. Everything else —
    vectors (biases, norms) and any path matching ``exclude`` (embeddings
    and LM heads, which the reference Muon formulation keeps OUT of the
    orthogonalized group) — runs Adam at ``adam_lr`` (default:
    ``learning_rate``). The second-moment state is allocated ONLY for the
    Adam group (a scalar placeholder elsewhere), so optimizer memory is
    one momentum tree plus Adam state for the small leaves. Verified
    against an independent NumPy implementation in tests.
    """
    import re

    from np_modeling_tpu.parallel.sharding import _path_str

    adam_rate = adam_lr if adam_lr is not None else learning_rate
    pat = re.compile(exclude)

    def _is_muon(path, p):
        return p.ndim >= 2 and not pat.match(_path_str(path))

    def init(params):
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map_with_path(
            lambda path, p: (jnp.zeros((), jnp.float32) if _is_muon(path, p)
                             else jnp.zeros_like(p)), params)
        return (jnp.zeros((), jnp.int32), mu, nu)

    def update(grads, state, params=None):
        del params
        count, mu, nu = state
        new_count = count + 1
        t = new_count.astype(jnp.float32)
        lr = _lr_at(learning_rate, count)
        a_lr = _lr_at(adam_rate, count)
        bc1 = 1 - beta1 ** t
        bc2 = 1 - beta2 ** t

        def upd(path, g, m, v):
            if _is_muon(path, g):
                m2 = beta * m + g                      # muon momentum
                eff = (beta * m2 + g) if nesterov else m2
                two_d = eff.reshape(eff.shape[0], -1)
                o = _newton_schulz(two_d, ns_steps).reshape(eff.shape)
                scale = jnp.sqrt(jnp.maximum(
                    1.0, two_d.shape[0] / two_d.shape[1]))
                return -lr * scale * o, m2, v
            m2 = beta1 * m + (1 - beta1) * g           # adam
            v2 = beta2 * v + (1 - beta2) * jnp.square(g)
            u = -a_lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + epsilon)
            return u, m2, v2

        flat = jax.tree_util.tree_map_with_path(upd, grads, mu, nu)
        three = jax.tree_util.tree_transpose(
            jax.tree_util.tree_structure(grads),
            jax.tree_util.tree_structure((0, 0, 0)),
            flat)
        updates, new_mu, new_nu = three
        return updates, (new_count, new_mu, new_nu)

    return Optimizer(init, update)


def clip_by_global_norm(max_norm: float):
    """Gradient clipping transform, composable via ``chain``."""

    def init(params):
        del params
        return ()

    def update(grads, state, params=None):
        del params
        leaves = jax.tree_util.tree_leaves(grads)
        norm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
        return jax.tree_util.tree_map(lambda g: g * scale, grads), state

    return Optimizer(init, update)


def chain(*transforms: Optimizer) -> Optimizer:
    """Compose transforms left-to-right (each one's output feeds the next)."""

    def init(params):
        return tuple(t.init(params) for t in transforms)

    def update(grads, state, params=None):
        new_state = []
        for t, s in zip(transforms, state):
            grads, s2 = t.update(grads, s, params)
            new_state.append(s2)
        return grads, tuple(new_state)

    return Optimizer(init, update)


def skip_nonfinite(inner: Optimizer) -> Optimizer:
    """Skip steps whose gradients contain NaN/Inf (production guard).

    When any grad leaf is non-finite: updates are zero and the inner
    optimizer state is left untouched (the bad step never happened).
    State: (skipped_count, inner_state) — read ``state[0]`` to monitor.
    The check is one in-graph all-finite reduction; no host sync.
    """

    def init(params):
        return (jnp.zeros((), jnp.int32), inner.init(params))

    def update(grads, state, params=None):
        skipped, inner_state = state
        finite = jnp.array(True)
        for g in jax.tree_util.tree_leaves(grads):
            finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(g)))
        # Run the inner update on sanitized grads (so it cannot poison its
        # own state with NaNs), then select old-vs-new by finiteness.
        safe_grads = jax.tree_util.tree_map(jnp.nan_to_num, grads)
        updates, new_inner = inner.update(safe_grads, inner_state, params)
        sel = lambda a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.where(finite, x, y), a, b)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, updates)
        return (sel(updates, zeros),
                (skipped + (~finite).astype(jnp.int32),
                 sel(new_inner, inner_state)))

    return Optimizer(init, update)


class EmaState(NamedTuple):
    count: jax.Array
    ema: Any


def ema_params(decay: float = 0.999, debias: bool = True):
    """Exponential moving average of params (evaluation weights).

    Functional API (not an Optimizer — it tracks params, not grads):
    ``state = ema_init(params)``; after each update step,
    ``state = ema_update(state, params)``; read ``ema_value(state)``.
    ``debias=True`` corrects the zero-init bias like Adam does, so early
    EMAs are usable.
    """

    def init(params):
        return EmaState(jnp.zeros((), jnp.int32),
                        jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(state, params):
        count = state.count + 1
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1 - decay) * p, state.ema, params)
        return EmaState(count, ema)

    def value(state):
        if not debias:
            return state.ema
        bc = 1 - decay ** state.count.astype(jnp.float32)
        return jax.tree_util.tree_map(lambda e: e / jnp.maximum(bc, 1e-12),
                                      state.ema)

    return init, update, value

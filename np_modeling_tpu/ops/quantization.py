"""Int8 quantization: absmax quant/dequant + TPU stochastic-rounding kernel.

Primary consumer is the int8 KV cache (serving): halving KV bytes halves the
page-load bandwidth of decode attention. Also usable for weights/activations.

Granularity: per row of the last axis ("per-token" for [**, d] activations) —
scale = absmax/127 over the last axis.
"""

from __future__ import annotations

import re
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from np_modeling_tpu.ops import dispatch
from np_modeling_tpu.ops.matmul import round_up


class QuantizedTensor(NamedTuple):
    values: jax.Array   # int8, same shape as the source
    scales: jax.Array   # fp32, source shape with last axis -> 1


def quantize_int8(x: jax.Array) -> QuantizedTensor:
    """Round-to-nearest absmax int8 over the last axis."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scales = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    values = jnp.clip(jnp.round(x / scales), -127, 127).astype(jnp.int8)
    return QuantizedTensor(values, scales)


def dequantize_int8(qt: QuantizedTensor, dtype=jnp.float32) -> jax.Array:
    return (qt.values.astype(jnp.float32) * qt.scales).astype(dtype)


# ---------------------------------------------------------------------------
# Stochastic-rounding quantization kernel (TPU PRNG)
# ---------------------------------------------------------------------------


def _sq_kernel(seed_ref, x_ref, v_ref, s_ref):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i)
    x = x_ref[...].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    scaled = x / scale
    # Stochastic round to integer: floor + Bernoulli(frac) carry, uniform
    # drawn from the top 24 PRNG bits (pltpu.stochastic_round only targets
    # bf16/fp8, so the int8 variant is hand-rolled).
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    # (top 24 bits fit in int32; Mosaic lacks a direct uint32->f32 cast)
    u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    fl = jnp.floor(scaled)
    rounded = fl + (u < (scaled - fl)).astype(jnp.float32)
    v_ref[...] = jnp.clip(rounded, -127, 127).astype(jnp.int8)
    s_ref[...] = jnp.broadcast_to(scale, s_ref.shape)


def quantize_int8_stochastic(x: jax.Array, seed: jax.Array) -> QuantizedTensor:
    """Absmax int8 with stochastic rounding (unbiased; TPU kernel).

    Off-TPU falls back to round-to-nearest (interpret mode's PRNG is a
    zero stub, so there is no faithful CPU emulation).
    """
    if not (dispatch.forced() or dispatch.on_tpu()):
        return quantize_int8(x)
    orig = x.shape
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    bn = min(round_up(n, 8), 512)
    n_p = round_up(n, bn)
    if n_p != n:
        x2 = jnp.pad(x2, ((0, n_p - n), (0, 0)))
    values, scales = pl.pallas_call(
        _sq_kernel,
        grid=(n_p // bn,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bn, d), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bn, d), lambda i: (i, 0)),
            pl.BlockSpec((bn, 128), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_p, d), jnp.int8),
            jax.ShapeDtypeStruct((n_p, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=dispatch.interpret_mode(),
    )(seed, x2)
    return QuantizedTensor(values[:n].reshape(orig),
                           scales[:n, 0:1].reshape(*orig[:-1], 1))


# ---------------------------------------------------------------------------
# Weight-only int8 params (serving: weights at rest in int8, dequant in-graph)
# ---------------------------------------------------------------------------

# Matmul weights of the transformer stack (attention projections, FFN —
# both mlp-style dense1/dense2 and swiglu/geglu w_gate/w_up/w_down —
# untied LM head). Embeddings are excluded by default: the lookup path
# gathers rows (per-column scales don't apply) and tied LM heads share them.
WEIGHT_QUANT_TARGETS = (
    r".*(/w[qkvo]|dense1/linear/w|dense2/w|swiglu/w_(gate|up|down)"
    r"|lm_head/w|mlm_transform/w)$")

_QKEYS = frozenset(("int8", "scale"))


def quantize_params_int8(params, match: str = WEIGHT_QUANT_TARGETS):
    """Replace matched weight leaves with ``{"int8", "scale"}`` dicts.

    Scales reduce over axis 0 only: a 2-D weight [in, out] gets true
    per-output-column scales [1, out], and a 3-D qkv projection
    [d, heads, dk] keeps per-(head, dk) ranges — a small head never shares
    the largest head's range. NOTE: for wo [heads, dk, d] the contraction
    is (heads, dk), so the [1, dk, d] scale varies ALONG a contraction
    axis — fine for the explicit dequantize-then-matmul path used here,
    but NOT factorable out of a fused int8 matmul; an int8-compute path
    would need per-output-only scales. Halves
    the at-rest bytes of the matched weights vs bf16 (4x vs fp32);
    :func:`dequantize_params` restores a compute pytree inside jit.

    Measured (v5e, probe 131 TF/s, same process): chained decode steps with
    the dequant forced to re-run every step (carry-dependent int8 values)
    run 1.14x FASTER than bf16 weights (4298 vs 4917 us/step, b8 decode on
    a 2L/d1024/ffn4096 GPT) — the halved weight HBM reads beat the added
    dequant VPU work, so int8 weights are a speed win for decode as well
    as a 2x (vs bf16) memory win.
    """
    from np_modeling_tpu.parallel.sharding import _path_str
    pat = re.compile(match)

    def f(path, leaf):
        if not (pat.match(_path_str(path)) and leaf.ndim >= 2):
            return leaf
        x = leaf.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(x), axis=0, keepdims=True)
        scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
        values = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        return {"int8": values, "scale": scale}

    return jax.tree_util.tree_map_with_path(f, params)


_QKEYS4 = frozenset(("int4", "scale"))


def quantize_params_int4(params, match: str = WEIGHT_QUANT_TARGETS,
                         group: int = 64):
    """Replace matched weight leaves with ``{"int4", "scale"}`` dicts:
    nibble-packed int4 values (two contraction-axis rows per byte) with
    GROUP-WISE absmax scales — ``group`` consecutive rows of axis 0 share
    one scale per remaining index. 4x smaller at rest than bf16 (8x vs
    fp32); int4's 3.5 bits need the group granularity (a whole-column
    absmax scale costs ~4x the roundtrip error).

    Symmetric range [-7, 7] (the -8 code is unused: asymmetry would bias
    the absmax mapping). Unpacking is two shifts + a mask in-graph —
    :func:`dequantize_params` handles both int8 and int4 leaves.

    MEASURED (v5e, probe 111, b8 decode on a 2L/d1024/ffn4096 GPT,
    carry-dependent values to defeat loop-invariant dequant hoisting,
    same process): int4 decode is 0.81x vs bf16 weights (1378 vs 1113
    us/step; int8 0.98x — a wash this session) — the nibble
    unpack/interleave VPU passes cost more than the saved weight HBM at
    this arithmetic intensity. int4 is a MEMORY feature (8x at-rest vs
    fp32, 4x vs bf16 — fit 4x the adapters/models per chip), not a
    decode-latency win; prefer int8 when speed-neutral halving is enough.
    """
    from np_modeling_tpu.parallel.sharding import _path_str
    pat = re.compile(match)

    def f(path, leaf):
        if not (pat.match(_path_str(path)) and leaf.ndim >= 2):
            return leaf
        n = leaf.shape[0]
        if n % group or group % 2:
            return leaf                  # shape not groupable: keep fp
        x = leaf.astype(jnp.float32)
        rest = leaf.shape[1:]
        xg = x.reshape(n // group, group, *rest)
        absmax = jnp.max(jnp.abs(xg), axis=1, keepdims=True)
        scale = jnp.where(absmax == 0, 1.0, absmax / 7.0)
        q = jnp.clip(jnp.round(xg / scale), -7, 7).astype(jnp.int32)
        q = q.reshape(n // 2, 2, *rest)
        packed = ((q[:, 0] & 0xF) | ((q[:, 1] & 0xF) << 4)).astype(jnp.int8)
        return {"int4": packed, "scale": scale}

    return jax.tree_util.tree_map_with_path(f, params)


def _unpack_int4(packed, scale, dtype):
    """[n/2, *rest] nibble-packed + [G, 1, *rest] group scales -> [n, *rest]."""
    p = packed.astype(jnp.int32)
    low = ((p & 0xF) ^ 8) - 8            # sign-extend the low nibble
    high = (((p >> 4) & 0xF) ^ 8) - 8
    q = jnp.stack([low, high], axis=1)   # [n/2, 2, *rest]
    n = 2 * packed.shape[0]
    rest = packed.shape[1:]
    g = n // scale.shape[0]
    xg = q.reshape(n // g, g, *rest).astype(jnp.float32) * scale
    return xg.reshape(n, *rest).astype(dtype)


def dequantize_params(qparams, dtype=jnp.bfloat16):
    """Rebuild a compute pytree from :func:`quantize_params_int8` /
    :func:`quantize_params_int4` output.

    Jit-safe: call inside the decode/eval step so weights stay quantized
    in HBM and dequantize on the fly (XLA fuses the convert+scale into
    consumers where profitable)."""
    if isinstance(qparams, dict):
        if frozenset(qparams.keys()) == _QKEYS:
            return (qparams["int8"].astype(jnp.float32)
                    * qparams["scale"]).astype(dtype)
        if frozenset(qparams.keys()) == _QKEYS4:
            return _unpack_int4(qparams["int4"], qparams["scale"], dtype)
        return {k: dequantize_params(v, dtype) for k, v in qparams.items()}
    if isinstance(qparams, (list, tuple)):
        return type(qparams)(dequantize_params(v, dtype) for v in qparams)
    return qparams

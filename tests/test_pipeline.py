"""Pipeline parallelism: pipelined stages == sequential application."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from np_modeling_tpu import parallel
from np_modeling_tpu.parallel.pipeline import make_pipeline
from np_modeling_tpu.utils.testing import assert_allclose, rand

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")
rng = np.random.default_rng(0)

S, D = 4, 16


def _stage_fn(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _stacked_params():
    return {"w": jnp.asarray(rand(S, D, D, rng=rng)) * 0.5,
            "b": jnp.asarray(rand(S, D, rng=rng)) * 0.1}


def _sequential(params, x):
    for i in range(S):
        x = _stage_fn(jax.tree_util.tree_map(lambda a: a[i], params), x)
    return x


@pytest.mark.parametrize("num_microbatches", [1, 2, 4])
def test_pipeline_matches_sequential(num_microbatches):
    mesh = parallel.make_mesh({"pp": S}, jax.devices()[:S])
    params = _stacked_params()
    x = jnp.asarray(rand(8, D, rng=rng))
    pipe = make_pipeline(mesh, _stage_fn, "pp", num_microbatches)
    assert_allclose(jax.jit(pipe)(params, x), _sequential(params, x),
                    rtol=1e-5, atol=1e-5)


def test_pipeline_backward_matches_sequential():
    mesh = parallel.make_mesh({"pp": S}, jax.devices()[:S])
    params = _stacked_params()
    x = jnp.asarray(rand(8, D, rng=rng))
    t = jnp.asarray(rand(8, D, rng=rng))
    pipe = make_pipeline(mesh, _stage_fn, "pp", num_microbatches=4)

    g_pipe = jax.jit(jax.grad(
        lambda p: jnp.sum((pipe(p, x) - t) ** 2)))(params)
    g_seq = jax.grad(lambda p: jnp.sum((_sequential(p, x) - t) ** 2))(params)
    assert_allclose(g_pipe["w"], g_seq["w"], rtol=1e-4, atol=1e-5)
    assert_allclose(g_pipe["b"], g_seq["b"], rtol=1e-4, atol=1e-5)


class TestPipelineGPT:
    """A REAL GPT trained over pp: blocks pipelined, embedding/head outside
    (round-1 gap: only a generic single-tensor stage_fn could be pipelined)."""

    def _gpt_and_params(self):
        from np_modeling_tpu import models
        cfg = models.GPTConfig(vocab_size=50, d_model=32, num_heads=4,
                               num_layers=4, hidden_units=64, max_len=16)
        gpt = models.GPT(cfg)
        tokens = jnp.asarray(rng.integers(0, 50, (8, 12)))
        loop_params = gpt.init(jax.random.PRNGKey(0), tokens)
        params = parallel.stack_gpt_layers(gpt, loop_params)
        return gpt, loop_params, params, tokens

    def test_forward_and_loss_match_single_device(self):
        gpt, loop_params, params, tokens = self._gpt_and_params()
        mesh = parallel.make_mesh({"pp": S}, jax.devices()[:S])
        apply_fn, loss_fn = parallel.pipeline_gpt(mesh, gpt,
                                                  num_microbatches=2)
        logits = jax.jit(apply_fn)(params, tokens)
        assert_allclose(logits, gpt.apply(loop_params, tokens),
                        rtol=1e-4, atol=1e-4)
        assert_allclose(jax.jit(loss_fn)(params, tokens),
                        gpt.loss(loop_params, tokens), rtol=1e-5, atol=1e-5)

    def test_grads_match_single_device(self):
        gpt, loop_params, params, tokens = self._gpt_and_params()
        mesh = parallel.make_mesh({"pp": S}, jax.devices()[:S])
        _, loss_fn = parallel.pipeline_gpt(mesh, gpt, num_microbatches=4)
        g_pipe = jax.jit(jax.grad(loss_fn))(params, tokens)
        g_ref = jax.grad(lambda p: gpt.loss(p, tokens))(loop_params)
        assert_allclose(g_pipe["layers"]["self_attention"]["wq"][2],
                        g_ref["layer_2"]["self_attention"]["wq"],
                        rtol=1e-4, atol=1e-5)
        assert_allclose(g_pipe["embedding"]["table"],
                        g_ref["embedding"]["table"], rtol=1e-4, atol=1e-5)

    def test_gpt_trains_over_pp(self):
        from np_modeling_tpu import training
        gpt, _, params, tokens = self._gpt_and_params()
        mesh = parallel.make_mesh({"pp": S}, jax.devices()[:S])
        _, loss_fn = parallel.pipeline_gpt(mesh, gpt, num_microbatches=2)
        opt = training.adam(1e-3)
        state = opt.init(params)

        @jax.jit
        def step(p, s):
            loss, g = jax.value_and_grad(loss_fn)(p, tokens)
            u, s = opt.update(g, s, p)
            return training.apply_updates(p, u), s, loss

        losses = []
        for _ in range(10):
            params, state, loss = step(params, state)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


def test_pipeline_training_loop():
    mesh = parallel.make_mesh({"pp": S}, jax.devices()[:S])
    params = _stacked_params()
    x = jnp.asarray(rand(8, D, rng=rng))
    t = jnp.asarray(rand(8, D, rng=rng))
    pipe = make_pipeline(mesh, _stage_fn, "pp", num_microbatches=2)

    @jax.jit
    def step(p):
        loss, g = jax.value_and_grad(
            lambda p: jnp.mean((pipe(p, x) - t) ** 2))(p)
        return jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, p, g), loss

    losses = []
    for _ in range(10):
        params, loss = step(params)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


class TestPipelineV2:
    """Round-3 pipeline: interleaved schedule, training-mode stages
    (dropout + segment_ids through the pipe), MoE aux, pp x dp."""

    def test_interleaved_matches_sequential(self):
        # 2 devices x 2 virtual stages = 4 stages round-robin.
        mesh = parallel.make_mesh({"pp": 2}, jax.devices()[:2])
        params = _stacked_params()
        x = jnp.asarray(rand(8, D, rng=rng))
        pipe = make_pipeline(mesh, _stage_fn, "pp", num_microbatches=2,
                             virtual_stages=2)
        assert_allclose(jax.jit(pipe)(params, x), _sequential(params, x),
                        rtol=1e-5, atol=1e-5)
        g_pipe = jax.jit(jax.grad(
            lambda p: jnp.sum(pipe(p, x) ** 2)))(params)
        g_seq = jax.grad(lambda p: jnp.sum(_sequential(p, x) ** 2))(params)
        assert_allclose(g_pipe["w"], g_seq["w"], rtol=1e-4, atol=1e-5)

    def test_bubble_accounting(self):
        from np_modeling_tpu.parallel.pipeline import (bubble_fraction,
                                                       schedule_ticks)
        # GPipe: S stages, M microbatches -> S+M-1 ticks, busy M.
        assert schedule_ticks(4, 4) == 7
        assert bubble_fraction(4, 4) == pytest.approx(1 - 4 / 7)
        # Interleaved v=2 on the same 4 DEVICES (8 stages): busy M*v of
        # Dv+M-1 ticks -> bubble shrinks.
        assert bubble_fraction(4, 4, virtual_stages=2) == pytest.approx(
            1 - 8 / 11)
        assert (bubble_fraction(4, 4, virtual_stages=2)
                < bubble_fraction(4, 4))
        # More microbatches amortize the fill/drain either way.
        assert bubble_fraction(4, 2) > bubble_fraction(4, 4)

    def _microbatched_oracle(self, gpt, loop_params, tokens, m, key=None,
                             training=False):
        """Sequential per-microbatch forward with the pipeline's rng
        derivation: dropout key fold_in(base, mb) then fold_in(., layer)."""
        c = gpt.config
        b = tokens.shape[0]
        toks = tokens[..., :-1]
        mb = b // m
        losses = []
        aux_total = 0.0
        for mi in range(m):
            sl = toks[mi * mb:(mi + 1) * mb]
            x = gpt.embed.apply(loop_params["embedding"], sl)
            if c.positional == "learned":
                x = x + gpt.pos_embed.apply(loop_params["pos_embedding"],
                                            jnp.arange(sl.shape[-1]))
            kmi = jax.random.fold_in(key, mi) if key is not None else None
            if training and key is not None:
                x = gpt.drop.apply({}, x, True, {"dropout": kmi}, salt=1000)
            for i in range(c.num_layers):
                r = ({"dropout": jax.random.fold_in(kmi, i)}
                     if kmi is not None else None)
                if c.moe_experts:
                    x, a = gpt.block.apply(loop_params[f"layer_{i}"], x,
                                           training=training, rngs=r,
                                           collect_aux=True)
                    aux_total = aux_total + a
                else:
                    x = gpt.block.apply(loop_params[f"layer_{i}"], x,
                                        training=training, rngs=r)
            x = gpt.final_norm.apply(loop_params["final_norm"], x)
            logits = jnp.einsum("...d,vd->...v", x,
                                loop_params["embedding"]["table"],
                                preferred_element_type=jnp.float32)
            from np_modeling_tpu import ops
            ce = ops.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32),
                tokens[mi * mb:(mi + 1) * mb, 1:])
            losses.append(jnp.mean(ce))
        return (jnp.mean(jnp.stack(losses))
                + c.moe_aux_weight * aux_total / m)

    def test_training_mode_dropout_matches_microbatched_oracle(self):
        from np_modeling_tpu import models
        cfg = models.GPTConfig(vocab_size=50, d_model=32, num_heads=4,
                               num_layers=4, hidden_units=64, max_len=16,
                               drop_rate=0.3)
        gpt = models.GPT(cfg)
        tokens = jnp.asarray(rng.integers(0, 50, (8, 13)))
        loop_params = gpt.init(jax.random.PRNGKey(0), tokens)
        params = parallel.stack_gpt_layers(gpt, loop_params)
        mesh = parallel.make_mesh({"pp": S}, jax.devices()[:S])
        _, loss_fn = parallel.pipeline_gpt(mesh, gpt, num_microbatches=2)
        key = jax.random.PRNGKey(42)
        got = jax.jit(lambda p: loss_fn(p, tokens, training=True,
                                        rngs={"dropout": key}))(params)
        want = self._microbatched_oracle(gpt, loop_params, tokens, 2,
                                         key=key, training=True)
        assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # And dropout actually fires (train loss != eval loss).
        eval_loss = jax.jit(loss_fn)(params, tokens)
        assert abs(float(got) - float(eval_loss)) > 1e-4

    def test_segment_ids_through_pipe(self):
        from np_modeling_tpu import models
        cfg = models.GPTConfig(vocab_size=50, d_model=32, num_heads=4,
                               num_layers=4, hidden_units=64, max_len=16)
        gpt = models.GPT(cfg)
        tokens = jnp.asarray(rng.integers(0, 50, (8, 12)))
        segs = jnp.asarray(np.broadcast_to(np.repeat([0, 1], 6), (8, 12)))
        loop_params = gpt.init(jax.random.PRNGKey(0), tokens)
        params = parallel.stack_gpt_layers(gpt, loop_params)
        mesh = parallel.make_mesh({"pp": S}, jax.devices()[:S])
        _, loss_fn = parallel.pipeline_gpt(mesh, gpt, num_microbatches=2)
        got = jax.jit(lambda p: loss_fn(p, tokens, segment_ids=segs))(params)
        want = gpt.loss(loop_params, tokens, segment_ids=segs)
        assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_moe_aux_through_pipe(self):
        from np_modeling_tpu import models
        cfg = models.GPTConfig(vocab_size=50, d_model=32, num_heads=4,
                               num_layers=4, hidden_units=32, max_len=16,
                               moe_experts=4, moe_aux_weight=0.05)
        gpt = models.GPT(cfg)
        tokens = jnp.asarray(rng.integers(0, 50, (8, 12)))
        loop_params = gpt.init(jax.random.PRNGKey(1), tokens)
        params = parallel.stack_gpt_layers(gpt, loop_params)
        mesh = parallel.make_mesh({"pp": S}, jax.devices()[:S])
        _, loss_fn = parallel.pipeline_gpt(mesh, gpt, num_microbatches=2)
        got = jax.jit(loss_fn)(params, tokens)
        # Routing is population-coupled: oracle applies blocks per
        # microbatch (same populations the pipeline sees).
        want = self._microbatched_oracle(gpt, loop_params, tokens, 2)
        assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # Aux contributes: zeroing the weight changes the loss.
        cfg0 = models.GPTConfig(**{**cfg.__dict__, "moe_aux_weight": 0.0})
        _, loss0 = parallel.pipeline_gpt(mesh, models.GPT(cfg0),
                                         num_microbatches=2)
        assert abs(float(got) - float(jax.jit(loss0)(params, tokens))) > 1e-6

    def test_pp_times_dp(self):
        from np_modeling_tpu import models
        cfg = models.GPTConfig(vocab_size=50, d_model=32, num_heads=4,
                               num_layers=4, hidden_units=64, max_len=16)
        gpt = models.GPT(cfg)
        tokens = jnp.asarray(rng.integers(0, 50, (8, 12)))
        loop_params = gpt.init(jax.random.PRNGKey(0), tokens)
        params = parallel.stack_gpt_layers(gpt, loop_params)
        mesh = parallel.make_mesh({"pp": 2, "dp": 4})
        _, loss_fn = parallel.pipeline_gpt(mesh, gpt, num_microbatches=2,
                                           virtual_stages=2)
        got, g_pipe = jax.jit(jax.value_and_grad(loss_fn))(params, tokens)
        want, g_ref = jax.value_and_grad(
            lambda p: gpt.loss(p, tokens))(loop_params)
        assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        assert_allclose(g_pipe["layers"]["self_attention"]["wq"][3],
                        g_ref["layer_3"]["self_attention"]["wq"],
                        rtol=1e-4, atol=1e-5)

    def test_remat_stages_matches(self):
        from np_modeling_tpu import models
        cfg = models.GPTConfig(vocab_size=50, d_model=32, num_heads=4,
                               num_layers=4, hidden_units=64, max_len=16)
        gpt = models.GPT(cfg)
        tokens = jnp.asarray(rng.integers(0, 50, (8, 12)))
        loop_params = gpt.init(jax.random.PRNGKey(0), tokens)
        params = parallel.stack_gpt_layers(gpt, loop_params)
        mesh = parallel.make_mesh({"pp": S}, jax.devices()[:S])
        _, loss_fn = parallel.pipeline_gpt(mesh, gpt, num_microbatches=2,
                                           remat_stages=True)
        g = jax.jit(jax.grad(loss_fn))(params, tokens)
        g_ref = jax.grad(lambda p: gpt.loss(p, tokens))(loop_params)
        assert_allclose(g["layers"]["self_attention"]["wq"][1],
                        g_ref["layer_1"]["self_attention"]["wq"],
                        rtol=1e-4, atol=1e-5)

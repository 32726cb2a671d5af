"""Native C++ data loader vs the bit-identical NumPy fallback."""

import numpy as np
import pytest

from np_modeling_tpu.training.native_data import TokenFileLoader


@pytest.fixture(scope="module")
def token_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "tokens.bin"
    rng = np.random.default_rng(0)
    rng.integers(0, 50000, 100_000, dtype=np.int32).tofile(p)
    return str(p)


def test_native_builds_and_matches_fallback(token_file):
    nat = TokenFileLoader(token_file, seq_len=128, batch=4, seed=7,
                          native=True)
    ref = TokenFileLoader(token_file, seq_len=128, batch=4, seed=7,
                          native=False)
    assert nat.is_native and not ref.is_native
    for _ in range(10):
        np.testing.assert_array_equal(next(nat), next(ref))
    nat.close()


def test_deterministic_across_instances(token_file):
    a = [next(TokenFileLoader(token_file, 64, 2, seed=3, native=False))
         for _ in range(1)][0]
    b = [next(TokenFileLoader(token_file, 64, 2, seed=3, native=False))
         for _ in range(1)][0]
    np.testing.assert_array_equal(a, b)
    c = next(TokenFileLoader(token_file, 64, 2, seed=4, native=False))
    assert not np.array_equal(a, c)


def test_windows_are_valid_slices(token_file):
    tokens = np.fromfile(token_file, dtype=np.int32)
    ld = TokenFileLoader(token_file, seq_len=32, batch=8, seed=1,
                         native=False)
    batch = next(ld)
    assert batch.shape == (8, 33)
    # Every row must be a contiguous slice of the corpus.
    for row in batch:
        starts = np.flatnonzero(tokens == row[0])
        assert any(np.array_equal(tokens[s:s + 33], row) for s in starts)


def test_feeds_gpt_training(token_file):
    import jax
    import jax.numpy as jnp
    from np_modeling_tpu import models, training
    ld = TokenFileLoader(token_file, seq_len=16, batch=4, seed=0)
    cfg = models.GPTConfig(vocab_size=50000, d_model=32, num_heads=4,
                           num_layers=1, hidden_units=32, max_len=17)
    gpt = models.GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), jnp.asarray(next(ld)))
    opt = training.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s, toks):
        loss, g = jax.value_and_grad(lambda p: gpt.loss(p, toks))(p)
        u, s = opt.update(g, s, p)
        return training.apply_updates(p, u), s, loss

    for batch, _ in zip(ld, range(3)):
        params, state, loss = step(params, state, jnp.asarray(batch))
        assert np.isfinite(float(loss))
    ld.close()


def test_native_many_batches_no_deadlock(token_file):
    # Stress the prefetch ring: many workers, tiny capacity, in-order
    # delivery over hundreds of batches (regression: a ring-size gate
    # could deadlock when the next-to-consume batch waited outside a
    # ring filled with later indices).
    nat = TokenFileLoader(token_file, seq_len=32, batch=2, seed=5,
                          native=True, n_threads=4, prefetch=1)
    ref = TokenFileLoader(token_file, seq_len=32, batch=2, seed=5,
                          native=False)
    for _ in range(300):
        np.testing.assert_array_equal(next(nat), next(ref))
    nat.close()

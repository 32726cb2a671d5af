"""Multi-host dryrun worker: one PROCESS of a 2-process CPU cluster.

Run as ``python -m np_modeling_tpu.parallel._multihost_dryrun <pid> <nproc>
<port> <workdir>`` (the launcher is ``dryrun_multihost()`` in
``__graft_entry__.py`` / ``tests/test_multihost.py``). Each process gets 4
virtual CPU devices; ``jax.distributed.initialize`` joins them into one
8-device cluster with gloo collectives standing in for DCN. Proves, on a
REAL process boundary (SURVEY.md §2.3's ICI/DCN story):

1. a dp-across-processes GPT train step (global batch assembled with
   ``make_array_from_process_local_data``; grad all-reduce crosses the
   process boundary) whose loss equals a single-device full-batch oracle,
2. param sharding that spans hosts (embedding rows on dp, attention/FFN
   on tp) — every host owns replica-0 shards,
3. a sharded checkpoint save (per-host manifests) + restore + bitwise
   continue-training equivalence.

Prints ``MULTIHOST OK`` and exits 0 on success; any assert kills the run.
"""

import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    workdir = sys.argv[4]

    import re
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

    import jax
    # This build ignores the JAX_PLATFORMS env var (axon plugin); force CPU
    # in-Python, BEFORE distributed init creates the backend.
    jax.config.update("jax_platforms", "cpu")

    from np_modeling_tpu.parallel import multihost
    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=nproc, process_id=pid,
                         initialization_timeout=60)
    assert jax.process_index() == pid
    assert jax.device_count() == 4 * nproc, jax.device_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from np_modeling_tpu import models, training
    from np_modeling_tpu.parallel import sharding as shd
    from np_modeling_tpu.training import checkpoint as ckpt

    # dp is the FIRST (host-crossing) axis; tp stays inside a host.
    mesh = multihost.global_mesh({"dp": 2 * nproc, "tp": 2})

    cfg = models.GPTConfig(vocab_size=64, d_model=32, num_heads=4,
                           num_layers=2, hidden_units=64, max_len=32,
                           drop_rate=0.0)
    gpt = models.GPT(cfg)

    # Same seed everywhere -> identical initial params on every process.
    tok_global = np.asarray(
        jax.random.randint(jax.random.PRNGKey(7), (8, 16), 0, 64))
    params = gpt.init(jax.random.PRNGKey(0), jnp.asarray(tok_global))

    # Shard params across BOTH hosts: embedding rows over dp (so each host
    # owns replica-0 shards - exercises per-host manifest writing),
    # attention/FFN over tp (within-host).
    rules = ((r".*embedding/table$", P("dp", None)),) + tuple(
        shd.TRANSFORMER_RULES)
    params_sh = shd.shard_params(params, mesh, rules)

    opt = training.adam(1e-2)

    def loss_fn(p, toks):
        return gpt.loss(p, toks)

    @jax.jit
    def train_step(p, opt_state, toks):
        loss, grads = jax.value_and_grad(loss_fn)(p, toks)
        updates, opt_state = opt.update(grads, opt_state, p)
        return training.apply_updates(p, updates), opt_state, loss

    opt_state = jax.jit(opt.init)(params_sh)

    # Each process contributes ITS 4 rows of the global batch.
    local_rows = tok_global[pid * 4:(pid + 1) * 4]
    toks = multihost.host_local_batch_to_global(local_rows, mesh,
                                                spec=P("dp", None))

    p, s = params_sh, opt_state
    for _ in range(2):
        p, s, loss = train_step(p, s, toks)
    loss = float(loss.addressable_data(0))

    # Loss agrees across processes ...
    assert multihost.all_processes_equal(np.float32(loss))
    # ... and with a single-device full-batch oracle.
    p1, s1 = params, jax.jit(opt.init)(params)
    for _ in range(2):
        p1, s1, loss1 = train_step(p1, s1, jnp.asarray(tok_global))
    np.testing.assert_allclose(loss, float(loss1), rtol=1e-5, atol=1e-6)

    # --- sharded checkpoint: per-host manifests, cross-process restore ---
    ckpt_dir = os.path.join(workdir, "ckpt")
    ckpt.save_checkpoint_sharded(ckpt_dir, {"params": p, "opt": s})
    manifests = [f for f in os.listdir(ckpt_dir)
                 if f.startswith("manifest.p")]
    assert len(manifests) == nproc, manifests

    template = jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.zeros(x.shape, x.dtype), x.sharding),
        {"params": p, "opt": s})
    restored = ckpt.load_checkpoint_sharded(ckpt_dir, template)

    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves({"params": p, "opt": s})):
        for sa, sb in zip(a.addressable_shards, b.addressable_shards):
            np.testing.assert_array_equal(np.asarray(sa.data),
                                          np.asarray(sb.data))

    # Continue-training equivalence: one more step from restored state is
    # BITWISE the step from live state.
    p2, s2, loss2 = train_step(restored["params"], restored["opt"], toks)
    p3, s3, loss3 = train_step(p, s, toks)
    assert float(loss2.addressable_data(0)) == float(loss3.addressable_data(0))

    multihost.sync("done")
    print(f"MULTIHOST OK pid={pid} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()

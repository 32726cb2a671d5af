"""CPU smoke for bench_breakdown.py at toy shapes (catch trace bugs before
paying tunneled-TPU compile time). Not a measurement."""
import jax
jax.config.update("jax_platforms", "cpu")

import bench_probe
bench_probe._PROBE_N = 256
bench_probe._PROBE_A = None

import bench_breakdown as bb
bb.BATCH, bb.SEQ, bb.D_MODEL, bb.HEADS = 2, 256, 64, 2
bb.LAYERS, bb.FFN, bb.VOCAB = 2, 128, 512

import bench
bench.BATCH, bench.SEQ, bench.D_MODEL, bench.HEADS = 2, 256, 64, 2
bench.LAYERS, bench.FFN, bench.VOCAB = 2, 128, 512

bb.main()

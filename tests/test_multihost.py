"""Multi-host (multi-process) story: REAL process boundaries.

Spawns a 2-process cluster (4 virtual CPU devices each, gloo collectives
standing in for DCN) via subprocess — the in-suite analogue of the driver's
``dryrun_multihost`` hook. The worker
(np_modeling_tpu/parallel/_multihost_dryrun.py) asserts:

- dp-across-processes GPT train step == single-device full-batch oracle,
- host-spanning param shardings (every host owns replica-0 shards),
- sharded checkpoint save with PER-HOST manifests + merged-manifest
  restore + bitwise continue-training equivalence.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_and_checkpoint(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # The workers set their own XLA flags; scrub the suite's 8-device flag
    # so each subprocess gets exactly 4 virtual devices.
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m",
             "np_modeling_tpu.parallel._multihost_dryrun",
             str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} rc={p.returncode}:\n{out[-4000:]}"
        assert "MULTIHOST OK" in out, out[-4000:]
    # Both hosts wrote a manifest, and both hosts wrote data shards
    # (embedding rows are dp-sharded across the process boundary).
    names = os.listdir(tmp_path / "ckpt")
    assert sum(n.startswith("manifest.p") for n in names) == 2
    assert any("_p00000_" in n for n in names)
    assert any("_p00001_" in n for n in names)

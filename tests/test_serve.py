"""Serving entry (scripts/serve.py): HTTP API + micro-batching.

A tiny random-weight checkpoint + pseudo-T5 backs a real server subprocess;
concurrent /generate requests with the same static signature must be served
from ONE batched pipeline call (batched_with > 1), and /healthz must
respond. The reference's serving story is the Gradio demos; this covers the
TPU-native production analogue.
"""

import base64
import io
import json
import os
import socket
import subprocess
import sys
import threading
import time
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _post(url, payload, out, idx):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        out[idx] = json.loads(resp.read())


def test_serve_end_to_end(tmp_path):
    from tests.test_validate_released import _make_tiny_pth

    pth = _make_tiny_pth(tmp_path)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # tiny arch matching the checkpoint, via a config override file
    cfg_py = tmp_path / "serve_cfg.py"
    cfg_py.write_text(
        "_base_ = ["
        f"{os.path.join(REPO, 'configs/pixart_sigma_config/PixArt_sigma_xl2_img256_internal.py')!r}"
        "]\n"
        "model_overrides = dict(depth=2, hidden_size=48, num_heads=4, "
        "caption_channels=64, model_max_length=16)\n"
    )
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
         "--config", str(cfg_py), "--model-path", pth,
         "--pseudo-t5", "64", "--port", str(port), "--max-wait-ms", "500"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=REPO,
    )
    try:
        base = f"http://127.0.0.1:{port}"
        for _ in range(120):  # wait for startup
            try:
                with urllib.request.urlopen(base + "/healthz", timeout=5) as r:
                    health = json.loads(r.read())
                break
            except Exception:
                assert proc.poll() is None, proc.communicate()[0]
                time.sleep(1)
        else:
            raise AssertionError("server never became healthy")
        assert health["status"] == "ok"

        # browser UI (the Gradio-demo stand-in)
        with urllib.request.urlopen(base + "/", timeout=30) as r:
            page = r.read().decode()
        assert "PixArt-Sigma-TPU" in page and "/generate" in page

        # two concurrent same-signature requests -> one batched call
        payload = {"prompt": "a red square", "steps": 2, "seed": 1,
                   "height": 256, "width": 256}
        results = [None, None]
        threads = [
            threading.Thread(target=_post, args=(base + "/generate",
                                                 dict(payload), results, i))
            for i in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(r is not None for r in results), results
        assert all(len(r["images"]) == 1 for r in results)
        assert max(r["batched_with"] for r in results) == 2, results
        # latents round-trip (no VAE configured)
        arr = np.load(io.BytesIO(base64.b64decode(results[0]["images"][0])))
        assert arr.shape == (32, 32, 4) and np.isfinite(arr).all()

        # per-request seeds are honored inside a shared batch: a request
        # batched behind a different-seed one must reproduce its solo image
        solo = [None]
        _post(base + "/generate", dict(payload, seed=7), solo, 0)
        mixed = [None, None]
        threads = [
            threading.Thread(
                target=_post,
                args=(base + "/generate", dict(payload, seed=s), mixed, i),
            )
            for i, s in enumerate((7, 8))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(r is not None for r in mixed), mixed
        a7 = np.load(io.BytesIO(base64.b64decode(mixed[0]["images"][0])))
        a8 = np.load(io.BytesIO(base64.b64decode(mixed[1]["images"][0])))
        solo7 = np.load(io.BytesIO(base64.b64decode(solo[0]["images"][0])))
        np.testing.assert_array_equal(a7, solo7)
        assert not np.array_equal(a7, a8)

        # a single request with a prompt LIST shares one micro-batch
        multi = [None]
        _post(base + "/generate",
              dict(payload, prompt=["a red square", "a blue circle"]),
              multi, 0)
        assert len(multi[0]["images"]) == 2
        assert multi[0]["batched_with"] == 2, multi[0]

        # bad request -> 400
        req = urllib.request.Request(
            base + "/generate", data=b'{"prompt": 5}',
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_serve_mixed_load_fairness(tmp_path):
    """Concurrent mixed-signature load (round-3 VERDICT next #8): two steps
    groups compete; every request must complete, same-signature requests
    must share batches, and neither shape group may starve."""
    from tests.test_validate_released import _make_tiny_pth

    pth = _make_tiny_pth(tmp_path)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    cfg_py = tmp_path / "serve_cfg.py"
    cfg_py.write_text(
        "_base_ = ["
        f"{os.path.join(REPO, 'configs/pixart_sigma_config/PixArt_sigma_xl2_img256_internal.py')!r}"
        "]\n"
        "model_overrides = dict(depth=2, hidden_size=48, num_heads=4, "
        "caption_channels=64, model_max_length=16)\n"
    )
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
         "--config", str(cfg_py), "--model-path", pth,
         "--pseudo-t5", "64", "--port", str(port), "--max-wait-ms", "300",
         "--max-batch", "4"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=REPO,
    )
    try:
        base = f"http://127.0.0.1:{port}"
        for _ in range(120):
            try:
                urllib.request.urlopen(base + "/healthz", timeout=5)
                break
            except Exception:
                assert proc.poll() is None, proc.communicate()[0]
                time.sleep(1)

        N = 12
        results = [None] * N
        threads = []
        for i in range(N):
            payload = {"prompt": f"p{i}", "steps": 2 if i % 3 else 3,
                       "seed": i, "height": 256, "width": 256}
            threads.append(threading.Thread(
                target=_post, args=(base + "/generate", payload, results, i)
            ))
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)

        assert all(r is not None for r in results), results  # no starvation
        # the majority-signature group (steps=2, 8 requests) must batch
        b2 = [results[i]["batched_with"] for i in range(N) if i % 3]
        assert max(b2) > 1, b2
        assert all(len(r["images"]) == 1 for r in results)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()

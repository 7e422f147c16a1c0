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


# ---------------------------------------------------------------- unit level
def _load_serve_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "serve_mod", os.path.join(REPO, "scripts", "serve.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FakeCfg:
    multi_scale = True


class _FakeModel:
    cfg = _FakeCfg()


class _FakePipe:
    """Stands in for PixArtPipeline: sleeps per call, records batches."""

    def __init__(self, delay=0.05):
        self.model = _FakeModel()
        self.base_resolution = 256
        self.vae = None
        self.delay = delay
        self.calls = []
        self.lock = threading.Lock()

    def __call__(self, prompts, **kw):
        with self.lock:
            self.calls.append((list(prompts), kw.get("num_inference_steps")))
        time.sleep(self.delay)
        return np.zeros((len(prompts), 4, 4, 4), np.float32)


def _opts(steps=2, seed=0):
    return dict(height=256, width=256, steps=steps, cfg_scale=4.5,
                sampler="dpm-solver", seed=seed)


def test_batcher_queue_depth_backpressure():
    """Admission control (round-4 VERDICT next #6): past queue_depth
    in-flight requests submit_async raises ServerBusyError; capacity frees
    as requests finish; multi-prompt admission is all-or-nothing."""
    serve = _load_serve_module()
    pipe = _FakePipe(delay=0.3)
    b = serve.MicroBatcher(pipe, max_wait_ms=50, max_batch=2,
                           batch_sizes=(1, 2), queue_depth=3)
    try:
        reqs = [b.submit_async(f"p{i}", _opts(seed=i)) for i in range(3)]
        try:
            b.submit_async("overflow", _opts())
            raise AssertionError("expected ServerBusyError")
        except serve.ServerBusyError:
            pass
        # atomic multi admission: 2 would exceed the cap even after 1 frees
        with b._inflight_lock:
            inflight_before = b._inflight
        try:
            b.submit_many(["a", "b", "c", "d"], _opts())
            raise AssertionError("expected ServerBusyError")
        except serve.ServerBusyError:
            pass
        with b._inflight_lock:
            assert b._inflight == inflight_before  # none admitted
        for r in reqs:
            b.wait(r, timeout=30)
        # capacity is released after completion
        r = b.submit_async("after", _opts())
        b.wait(r, timeout=30)
    finally:
        b.shutdown()


def test_batcher_rare_signature_not_starved_behind_hot_stream():
    """Fairness (round-4 VERDICT next #6): one rare-signature request
    submitted into a sustained hot stream of a different signature must be
    served within a bounded number of hot batches (oldest-group-first),
    not starved until the stream ends."""
    serve = _load_serve_module()
    pipe = _FakePipe(delay=0.08)
    b = serve.MicroBatcher(pipe, max_wait_ms=20, max_batch=2,
                           batch_sizes=(1, 2), queue_depth=1000)
    try:
        stop = threading.Event()
        hot_done = []

        def flood():
            while not stop.is_set():
                try:
                    r = b.submit_async("hot", _opts(steps=2))
                    hot_done.append(r)
                except serve.ServerBusyError:
                    pass
                time.sleep(0.01)

        flooder = threading.Thread(target=flood, daemon=True)
        flooder.start()
        time.sleep(0.2)  # hot stream saturates the batcher
        t0 = time.time()
        rare = b.submit_async("rare", _opts(steps=7))
        b.wait(rare, timeout=10)
        rare_latency = time.time() - t0
        stop.set()
        flooder.join(timeout=5)
        # bounded: one in-flight batch + max_wait + its own batch, with
        # generous slack; starvation would push this to ~10 s (the timeout)
        assert rare_latency < 2.0, rare_latency
        # the hot stream actually batched around it
        steps_served = [s for _, s in pipe.calls]
        assert 7 in steps_served and steps_served.count(2) > 3
        for r in hot_done:
            b.wait(r, timeout=30)
    finally:
        b.shutdown()


def test_serve_http_429_backpressure(tmp_path):
    """HTTP layer maps ServerBusyError to 429 + Retry-After under a tiny
    --queue-depth; admitted requests still complete."""
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
         "--pseudo-t5", "64", "--port", str(port), "--max-wait-ms", "100",
         "--queue-depth", "1"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=REPO,
    )
    try:
        base = f"http://127.0.0.1:{port}"
        for _ in range(120):
            try:
                with urllib.request.urlopen(base + "/healthz", timeout=5) as r:
                    health = json.loads(r.read())
                break
            except Exception:
                assert proc.poll() is None, proc.communicate()[0]
                time.sleep(1)
        assert health["queue_depth"] == 1

        codes = [None] * 4

        def post(i):
            payload = {"prompt": f"p{i}", "steps": 2, "seed": i,
                       "height": 256, "width": 256}
            req = urllib.request.Request(
                base + "/generate", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req, timeout=300) as resp:
                    codes[i] = resp.status
            except urllib.error.HTTPError as e:
                codes[i] = e.code
                if e.code == 429:
                    assert e.headers.get("Retry-After")

        threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert codes.count(200) >= 1, codes   # admitted work completes
        assert codes.count(429) >= 1, codes   # backpressure engaged
        # after the burst drains, capacity is available again
        ok = [None]
        _post(base + "/generate",
              {"prompt": "later", "steps": 2, "seed": 9,
               "height": 256, "width": 256}, ok, 0)
        assert ok[0] is not None and len(ok[0]["images"]) == 1
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_serve_turbo_block_cache(tmp_path):
    """--block-cache-interval + config cache_span: the server generates
    through the cached dpm-solver program; non-dpm samplers fall back to
    exact instead of erroring."""
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
        "cache_span = (0, 2)\n"
    )
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
         "--config", str(cfg_py), "--model-path", pth,
         "--pseudo-t5", "64", "--port", str(port),
         "--block-cache-interval", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=REPO,
    )
    try:
        base = f"http://127.0.0.1:{port}"
        for _ in range(120):
            try:
                with urllib.request.urlopen(base + "/healthz", timeout=5) as r:
                    health = json.loads(r.read())
                break
            except Exception:
                assert proc.poll() is None, proc.communicate()[0]
                time.sleep(1)
        assert health["turbo"] is True

        out = [None]
        _post(base + "/generate",
              {"prompt": "cached", "steps": 4, "seed": 0,
               "height": 256, "width": 256}, out, 0)
        arr = np.load(io.BytesIO(base64.b64decode(out[0]["images"][0])))
        assert arr.shape == (32, 32, 4) and np.isfinite(arr).all()

        # a non-dpm sampler must run exact, not 500
        out2 = [None]
        _post(base + "/generate",
              {"prompt": "exact", "steps": 4, "seed": 0, "sampler": "iddpm",
               "height": 256, "width": 256}, out2, 0)
        assert out2[0] is not None and len(out2[0]["images"]) == 1
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_serve_seq_parallel_mesh(tmp_path):
    """--seq-parallel N: the server runs each trajectory with its token dim
    sharded over an N-device mesh (latency-optimized multi-chip serving)."""
    from tests.test_validate_released import _make_tiny_pth

    pth = _make_tiny_pth(tmp_path)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(
        os.environ, JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
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
         "--pseudo-t5", "64", "--port", str(port), "--seq-parallel", "8"],
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
        out = [None]
        _post(base + "/generate",
              {"prompt": "sharded", "steps": 2, "seed": 3,
               "height": 256, "width": 256}, out, 0)
        arr = np.load(io.BytesIO(base64.b64decode(out[0]["images"][0])))
        assert arr.shape == (32, 32, 4) and np.isfinite(arr).all()
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()

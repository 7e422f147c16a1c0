#!/usr/bin/env python
"""Production txt2img serving: HTTP JSON API with micro-batching.

The reference ships interactive Gradio demos (scripts/interface.py:216-258,
app/app_pixart_sigma.py) as its serving story; this is the TPU-native
production analogue: a dependency-free HTTP server in front of
PixArtPipeline with request micro-batching, so concurrent prompts share one
compiled CFG-batched trajectory (XLA programs are cached per static
(batch, H, W, steps) signature — the batcher pads to fixed batch sizes to
avoid recompiles).

API:
  GET  /                     -> minimal browser UI (the TPU-native stand-in
                                for the reference's Gradio demos — zero deps)
  GET  /healthz              -> {"status": "ok", ...}
  POST /generate  {"prompt": "...", "steps": 20, "cfg_scale": 4.5,
                   "seed": 0, "height": 1024, "width": 1024,
                   "sampler": "dpm-solver"}
    -> {"images": ["<base64 png>", ...], "batched_with": N}
    Accepts a single prompt or a list. Images are PNG when the pipeline has
    a VAE, otherwise float latents as base64 .npy.

Run (toy checkpoint):
  python scripts/serve.py --config configs/toy/pixart_toy_img128.py \
      --model-path /tmp/toy_run/checkpoints --vae-flax /tmp/toy_vae \
      --pseudo-t5 64 --scale-factor 0.3264 --port 8000
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _Request:
    def __init__(self, prompt, opts):
        self.prompt = prompt
        self.opts = opts
        self.event = threading.Event()
        self.result = None
        self.error = None


class ServerBusyError(Exception):
    """Queue depth limit reached — callers should return 429/backpressure."""


class MicroBatcher:
    """Groups compatible requests into one pipeline call.

    Requests are compatible when their static signature (H, W, steps,
    cfg_scale, sampler) matches — those share an XLA program. The batch is
    padded to the next size in `batch_sizes` by repeating the last prompt,
    so the compile cache stays small and deterministic.

    Admission control: at most `queue_depth` requests may be in flight
    (enqueued or being generated); submit_async raises ServerBusyError past
    that, which the HTTP layer maps to 429 + Retry-After. Without a cap a
    saturating client builds an unbounded queue and p95 latency diverges
    (docs/performance.md §serving envelope: 16 clients -> p95 59.9 s).

    Fairness: the scheduler serves the ELIGIBLE group with the OLDEST
    waiting request first (eligible = full batch or past max_wait), so a
    rare signature behind a sustained hot stream is served as soon as it is
    the oldest — bounded by one in-flight batch plus max_wait, never
    starved.
    """

    def __init__(self, pipe, y_null_row=None, max_wait_ms: int = 25,
                 batch_sizes=(1, 2, 4, 8, 12), max_batch: int = 12,
                 queue_depth: int = 64, gen_kwargs=None):
        self.pipe = pipe
        self.y_null_row = y_null_row
        # server-wide pipeline kwargs (e.g. block_cache_interval for the
        # turbo preset) — deliberately NOT part of the request signature
        self.gen_kwargs = dict(gen_kwargs or {})
        self.max_wait = max_wait_ms / 1000.0
        self.batch_sizes = sorted(batch_sizes)
        self.max_batch = max_batch
        self.queue_depth = queue_depth
        self._inflight = 0
        self._inflight_lock = threading.Lock()
        self.q: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit_async(self, prompt, opts):
        """Enqueue without blocking; returns the request handle for wait().

        Multi-prompt API requests enqueue all prompts first so same-signature
        prompts from one request share a batch instead of running serially.
        Raises ServerBusyError when the in-flight depth cap is reached.
        """
        return self.submit_many([prompt], opts)[0]

    def submit_many(self, prompts, opts):
        """Atomically admit a list of prompts (all or none -> 429)."""
        n = len(prompts)
        with self._inflight_lock:
            if self._inflight + n > self.queue_depth:
                raise ServerBusyError(
                    f"queue full ({self._inflight} in flight + {n} requested "
                    f"> limit {self.queue_depth})"
                )
            self._inflight += n
        reqs = [_Request(p, opts) for p in prompts]
        for req in reqs:
            self.q.put(req)
        return reqs

    def _finish(self, reqs):
        with self._inflight_lock:
            self._inflight -= len(reqs)
        for r in reqs:
            r.event.set()

    def wait(self, req, timeout=600.0):
        if not req.event.wait(timeout):
            raise TimeoutError("generation timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def submit(self, prompt, opts, timeout=600.0):
        return self.wait(self.submit_async(prompt, opts), timeout)

    def shutdown(self):
        self._stop.set()
        self.q.put(None)

    # ------------------------------------------------------------- internal
    # samplers whose trajectory consumes a shared PRNG stream: a request's
    # output would depend on its batch position, so those only batch with
    # same-seed requests. Deterministic samplers honor per-request seeds via
    # per-row initial latents (see _run) and batch freely.
    _STOCHASTIC = frozenset({"sde-dpm-solver", "sa-solver", "iddpm", "lcm"})

    def _sig(self, req):
        o = req.opts
        sig = (o["height"], o["width"], o["steps"], o["cfg_scale"],
               o["sampler"])
        if o["sampler"] in self._STOCHASTIC:
            sig += (o["seed"],)
        return sig

    def _latent_hw(self, o):
        height, width = o["height"], o["width"]
        if (not getattr(self.pipe.model.cfg, "multi_scale", True)
                and height != width):
            height = width = self.pipe.base_resolution  # pipeline snaps too
        return height // 8, width // 8

    def _loop(self):
        # signature-keyed pending groups: interleaved mixed-signature
        # arrivals still batch with their own kind (a strict in-arrival-
        # order batcher measured mean_batched_with 1.38 and 0.25 img/s on
        # alternating steps=20/14 TPU load vs 8.0 / 0.375 uniform —
        # docs/performance.md §serving)
        pending: dict = {}  # sig -> [(req, arrival_time), ...]
        while not self._stop.is_set():
            timeout = None
            if pending:
                oldest = min(g[0][1] for g in pending.values())
                timeout = max(0.0, oldest + self.max_wait - time.time())
            try:
                req = self.q.get(timeout=timeout)
                if req is not None:
                    pending.setdefault(self._sig(req), []).append(
                        (req, time.time())
                    )
            except queue.Empty:
                pass
            # drain whatever else already queued before choosing batches
            while True:
                try:
                    nxt = self.q.get_nowait()
                except queue.Empty:
                    break
                if nxt is not None:
                    pending.setdefault(self._sig(nxt), []).append(
                        (nxt, time.time())
                    )
            now = time.time()
            for sig in sorted(
                pending, key=lambda s: pending[s][0][1]
            ):  # oldest group first (no starvation)
                group = pending[sig]
                if len(group) >= self.max_batch or (
                    now - group[0][1] >= self.max_wait
                ):
                    rest = group[self.max_batch:]
                    batch = [r for r, _ in group[: self.max_batch]]
                    if rest:
                        pending[sig] = rest
                    else:
                        del pending[sig]
                    self._run(batch)
                    break  # re-check the queue between batches

    def _run(self, batch):
        try:
            import jax
            import jax.numpy as jnp

            prompts = [r.prompt for r in batch]
            n = len(prompts)
            padded = next(
                (s for s in self.batch_sizes if s >= n), self.max_batch
            )
            prompts = prompts + [prompts[-1]] * (padded - n)
            o = batch[0].opts
            kwargs = {}
            # per-request seeds: build each row's initial noise exactly as
            # the pipeline would for a solo B=1 call with that seed
            # (rng, init_rng = split(PRNGKey(seed)); normal(init_rng, ...)),
            # so a batched request reproduces its served-alone image.
            h, w = self._latent_hw(o)
            rows = [
                jax.random.normal(
                    jax.random.split(jax.random.PRNGKey(int(r.opts["seed"])))[1],
                    (1, h, w, 4), jnp.float32,
                )
                for r in batch
            ]
            rows += [rows[-1]] * (padded - n)
            kwargs["latents"] = jnp.concatenate(rows, axis=0)
            if self.y_null_row is not None:
                kwargs["y_null"] = jnp.broadcast_to(
                    self.y_null_row[None],
                    (len(prompts),) + self.y_null_row.shape,
                )
            gen = dict(self.gen_kwargs)
            if o["sampler"] != "dpm-solver":
                # block caching is a dpm-solver-only program; other
                # samplers run exact rather than erroring under --turbo
                gen.pop("block_cache_interval", None)
            out = self.pipe(
                prompts,
                height=o["height"], width=o["width"],
                num_inference_steps=o["steps"],
                guidance_scale=o["cfg_scale"],
                sampler=o["sampler"], seed=o["seed"],
                **gen,
                **kwargs,
            )
            for i, r in enumerate(batch):
                r.result = (out[i], len(batch))
            self._finish(batch)
        except Exception as e:  # noqa: BLE001 - surfaced per request
            for r in batch:
                r.error = e
            self._finish(batch)


def _encode_image(arr, decoded: bool) -> str:
    if decoded:
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()
    import numpy as np

    buf = io.BytesIO()
    np.save(buf, arr)
    return base64.b64encode(buf.getvalue()).decode()


_INDEX_HTML = """<!doctype html>
<title>PixArt-Sigma-TPU</title>
<style>body{font-family:sans-serif;max-width:720px;margin:2em auto}
img{max-width:100%%;margin:4px;border-radius:6px}
input,select{margin:2px}textarea{width:100%%}</style>
<h2>PixArt-Sigma-TPU</h2>
<form id=f>
<textarea name=prompt rows=2
 placeholder="a small cactus with a happy face">%(example)s</textarea><br>
steps <input name=steps type=number value=20 size=3>
cfg <input name=cfg_scale type=number step=0.5 value=4.5 size=3>
seed <input name=seed type=number value=0 size=4>
sampler <select name=sampler><option>dpm-solver<option>sa-solver
<option>iddpm<option>lcm<option>dmd</select>
<button>generate</button> <span id=s></span></form><div id=out></div>
<script>
f.onsubmit = async (e) => {
  e.preventDefault(); s.textContent = "generating...";
  const d = Object.fromEntries(new FormData(f));
  d.steps = +d.steps; d.cfg_scale = +d.cfg_scale; d.seed = +d.seed;
  const r = await fetch("/generate", {method: "POST", body: JSON.stringify(d)});
  const j = await r.json(); s.textContent = r.ok ? "" : (j.error || r.status);
  if (r.ok) out.innerHTML = j.images.map(
    b => j.decoded ? `<img src="data:image/png;base64,${b}">`
                   : "<pre>(no VAE: latents returned)</pre>").join("");
};
</script>"""


def make_handler(batcher, pipe, info):
    decoded = pipe.vae is not None

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet access log
            pass

        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, dict(
                    status="ok", inflight=batcher._inflight,
                    queue_depth=batcher.queue_depth, **info,
                ))
            elif self.path in ("/", "/index.html"):
                body = (_INDEX_HTML % {
                    "example": "a small cactus with a happy face"
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                prompts = req.get("prompt", "")
                single = isinstance(prompts, str)
                prompts = [prompts] if single else list(prompts)
                assert prompts and all(isinstance(p, str) for p in prompts)
                opts = dict(
                    height=int(req.get("height", info["resolution"])),
                    width=int(req.get("width", info["resolution"])),
                    steps=int(req.get("steps", 20)),
                    cfg_scale=float(req.get("cfg_scale", 4.5)),
                    sampler=str(req.get("sampler", "dpm-solver")),
                    seed=int(req.get("seed", 0)),
                )
            except Exception as e:  # noqa: BLE001
                self._json(400, {"error": f"bad request: {e}"})
                return
            try:
                # enqueue all prompts first so they can share a micro-batch
                # (atomic admission: all rows or 429)
                reqs = batcher.submit_many(prompts, opts)
                results = [batcher.wait(r) for r in reqs]
            except ServerBusyError as e:
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(429)
                self.send_header("Content-Type", "application/json")
                self.send_header("Retry-After", "5")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": str(e)})
                return
            self._json(200, {
                "images": [_encode_image(r[0], decoded) for r in results],
                "decoded": decoded,
                "batched_with": max(r[1] for r in results),
            })

    return Handler


def build_pipeline(args):
    import jax
    import jax.numpy as jnp

    from pixart_sigma_tpu.config import read_config
    from pixart_sigma_tpu.models.builder import build_model_from_config
    from pixart_sigma_tpu.pipelines.pipeline import PixArtPipeline
    from pixart_sigma_tpu.utils import checkpoint as ckpt_io
    from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    config = read_config(args.config)
    overrides = {}
    if getattr(args, "int8", False) or getattr(args, "turbo", False):
        overrides["quant_int8"] = True
    wants_cache = (
        getattr(args, "turbo", False)
        or (getattr(args, "block_cache_interval", None) or 0) >= 2
        or config.get("block_cache_interval", 0) >= 2
    )
    if wants_cache and not config.get("cache_span"):
        # block caching needs scan-group boundaries in the model; without
        # this the first dpm-solver request would 500 at runtime
        overrides["cache_span"] = (7, 21)
    model = build_model_from_config(config, **overrides)
    params = {"params": ckpt_io.load_checkpoint(
        args.model_path, model.cfg, load_ema=args.load_ema)}

    t5 = None
    y_null_row = None
    if args.pseudo_t5:
        from pixart_sigma_tpu.models.t5 import PseudoT5Embedder

        t5 = PseudoT5Embedder(args.pseudo_t5, model.cfg.model_max_length)
        y_null_row = jnp.asarray(
            params["params"]["y_embedder"]["y_embedding"], jnp.float32
        )
    elif args.t5_path:
        from pixart_sigma_tpu.models.t5 import T5Embedder

        t5 = T5Embedder.from_pretrained(
            args.t5_path, model_max_length=model.cfg.model_max_length
        )
    vae = vae_params = None
    if args.vae_flax:
        from pixart_sigma_tpu.models.vae import load_flax_vae

        vae, vae_params = load_flax_vae(args.vae_flax)
    res = config.get("image_size", 1024)
    scale = args.scale_factor or config.get("scale_factor", 0.13025)
    mesh = None
    if getattr(args, "seq_parallel", 0) and args.seq_parallel > 1:
        # latency-optimized serving: one trajectory's token dim sharded
        # over N chips (sequence/context parallelism) — same mechanism as
        # scripts/inference.py --seq-parallel
        from pixart_sigma_tpu.parallel.mesh import MeshConfig, build_mesh

        mesh = build_mesh(MeshConfig(data=-1, seq=args.seq_parallel))
    pipe = PixArtPipeline(
        model, params, t5=t5, vae=vae, vae_params=vae_params,
        scale_factor=scale, base_resolution=res, mesh=mesh,
    )
    return pipe, y_null_row, res, config


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--model-path", required=True)
    p.add_argument("--load-ema", action="store_true")
    p.add_argument("--t5-path", default=None)
    p.add_argument("--pseudo-t5", type=int, default=None, metavar="DIM")
    p.add_argument("--vae-flax", default=None)
    p.add_argument("--scale-factor", type=float, default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=12,
                   help="largest micro-batch (offline bench: 12 is the "
                        "1024px throughput optimum — bench.py)")
    p.add_argument("--queue-depth", type=int, default=64,
                   help="max in-flight requests before /generate returns "
                        "429 (admission control / backpressure)")
    p.add_argument("--int8", action="store_true",
                   help="dynamic-int8 (W8A8) projection/MLP matmuls — "
                        "quantized serving (2x MXU rate on v5e)")
    p.add_argument("--max-wait-ms", type=int, default=25)
    p.add_argument("--seq-parallel", type=int, default=0, metavar="N",
                   help="shard the token dim over N devices per trajectory "
                        "(latency-optimized multi-chip serving)")
    p.add_argument("--turbo", action="store_true",
                   help="quality-validated turbo serving stack: int8 W8A8 "
                        "+ delta block caching interval 2 (+49% measured "
                        "at the 1024px op point; configs/..._serving_turbo)")
    p.add_argument("--block-cache-interval", type=int, default=None,
                   help="delta block caching refresh interval (>=2; "
                        "requires cache_span in the config or --turbo)")
    p.add_argument("--warmup", action="store_true",
                   help="compile the default program before serving")
    args = p.parse_args()

    pipe, y_null_row, res, config = build_pipeline(args)
    cfg_interval = config.get("block_cache_interval", 0)
    interval = (
        args.block_cache_interval if args.block_cache_interval is not None
        else (2 if args.turbo else cfg_interval)
    )
    gen_kwargs = {"block_cache_interval": interval} if interval >= 2 else {}
    info = {"resolution": res, "model": args.model_path,
            "turbo": bool(gen_kwargs)}
    batcher = MicroBatcher(
        pipe, y_null_row=y_null_row,
        max_wait_ms=args.max_wait_ms, max_batch=args.max_batch,
        queue_depth=args.queue_depth, gen_kwargs=gen_kwargs,
    )
    if args.warmup:
        batcher.submit("warmup", dict(
            height=res, width=res, steps=20, cfg_scale=4.5,
            sampler="dpm-solver", seed=0,
        ))
        print("warmup compile done", flush=True)

    server = ThreadingHTTPServer(
        (args.host, args.port), make_handler(batcher, pipe, info)
    )
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(max_batch={args.max_batch})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.shutdown()


if __name__ == "__main__":
    main()

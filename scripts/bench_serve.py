#!/usr/bin/env python
"""Load-test a running serve.py instance: latency percentiles + batching.

Round-3 VERDICT next #8. Fires concurrent /generate requests with a mix of
signatures (steps variants; same resolution groups can micro-batch) from N
client threads, then reports p50/p95/p99 latency, throughput, and how often
requests actually shared a batch.

Usage (server already running):
  python scripts/serve.py --config ... --model-path ... --port 8000 --warmup &
  python scripts/bench_serve.py --url http://127.0.0.1:8000 \
      --clients 8 --requests 32 --steps 20 --mixed-steps 20,14
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import urllib.request


def fire(url, payload, out, idx):
    t0 = time.time()
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=600) as resp:
            body = json.loads(resp.read())
        out[idx] = {
            "ok": True, "latency": time.time() - t0,
            "batched_with": body.get("batched_with", 1),
        }
    except Exception as e:  # noqa: BLE001
        out[idx] = {"ok": False, "latency": time.time() - t0, "error": str(e)}


def pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(p / 100 * len(xs)))]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--mixed-steps", default="20",
                    help="comma list; requests round-robin over these")
    ap.add_argument("--cfg-scale", type=float, default=4.5)
    args = ap.parse_args()

    with urllib.request.urlopen(args.url + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    res = health.get("resolution", 1024)
    height = args.height or res
    width = args.width or res
    steps_mix = [int(s) for s in args.mixed_steps.split(",")]

    payloads = [
        {
            "prompt": f"a load test prompt {i}",
            "steps": steps_mix[i % len(steps_mix)],
            "cfg_scale": args.cfg_scale,
            "seed": i,
            "height": height,
            "width": width,
        }
        for i in range(args.requests)
    ]
    results = [None] * args.requests
    sem = threading.Semaphore(args.clients)

    def worker(i):
        with sem:
            fire(args.url, payloads[i], results, i)

    t0 = time.time()
    threads = [
        threading.Thread(target=worker, args=(i,))
        for i in range(args.requests)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    ok = [r for r in results if r and r["ok"]]
    lat = [r["latency"] for r in ok]
    by_steps = {}
    for p, r in zip(payloads, results):
        if r and r["ok"]:
            by_steps.setdefault(p["steps"], []).append(r)
    print(json.dumps({
        "requests": args.requests,
        "clients": args.clients,
        "ok": len(ok),
        "errors": args.requests - len(ok),
        "wall_s": round(wall, 2),
        "img_per_s": round(len(ok) / wall, 3),
        "latency_p50_s": round(pct(lat, 50), 2) if lat else None,
        "latency_p95_s": round(pct(lat, 95), 2) if lat else None,
        "latency_p99_s": round(pct(lat, 99), 2) if lat else None,
        "mean_batched_with": round(
            sum(r["batched_with"] for r in ok) / max(len(ok), 1), 2
        ),
        "per_steps": {
            s: {
                "n": len(rs),
                "p50": round(pct([r["latency"] for r in rs], 50), 2),
                "batched": round(
                    sum(r["batched_with"] for r in rs) / len(rs), 2
                ),
            }
            for s, rs in sorted(by_steps.items())
        },
    }, indent=None))


if __name__ == "__main__":
    main()

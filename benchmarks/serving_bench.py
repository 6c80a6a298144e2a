"""Serving load test: concurrent clients against a live server.

Measures steady-state requests/s and latency percentiles at a given
concurrency — the end-to-end validation of the dynamic-batching path
(HTTP parse -> coalesce -> batched device program -> pipelined readback ->
base64 encode), which bench.py's in-process numbers cannot see.

Usage:
    # start a server first, e.g.:
    #   python -m riffusion_tpu.server --port 3013 --checkpoint random:full \
    #       --dynamic-batching --warmup
    python benchmarks/serving_bench.py --port 3013 --concurrency 8 --requests 32
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import threading
import time
import urllib.request


def _request(port: int, seed: int, steps: int, timeout: float):
    body = {
        "start": {"prompt": f"warm bass groove {seed}", "seed": seed},
        "end": {"prompt": "jazzy saxophone", "seed": 100 + seed},
        "alpha": 0.5,
        "num_inference_steps": steps,
        "seed_image_id": "og_beat",
    }
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/run_inference/",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    t0 = time.time()
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        out = json.loads(resp.read())
    assert resp.status == 200 and out["duration_s"] > 0
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=3013)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--timeout", type=float, default=1800.0)
    args = ap.parse_args()

    latencies: list = []
    errors: list = []
    lock = threading.Lock()
    counter = iter(range(args.requests))

    def worker():
        while True:
            with lock:
                seed = next(counter, None)
            if seed is None:
                return
            try:
                dt = _request(args.port, seed, args.steps, args.timeout)
                with lock:
                    latencies.append(dt)
            except Exception as e:  # noqa: BLE001 - load test records all
                with lock:
                    errors.append(repr(e))

    # one warm request (compile) before the timed phase
    _request(args.port, 999, args.steps, args.timeout)

    t0 = time.time()
    threads = [threading.Thread(target=worker) for _ in range(args.concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    ok = len(latencies)
    print(f"requests: {ok} ok, {len(errors)} failed", file=sys.stderr)
    if errors:
        print("first error:", errors[0], file=sys.stderr)
    if ok:
        lat_sorted = sorted(latencies)
        print(
            f"throughput: {ok / wall:.2f} req/s at concurrency {args.concurrency}; "
            f"latency p50 {statistics.median(lat_sorted):.2f} s, "
            f"p90 {lat_sorted[int(0.9 * (ok - 1))]:.2f} s, "
            f"max {lat_sorted[-1]:.2f} s",
            file=sys.stderr,
        )
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{args.port}/stats", timeout=30
            ) as r:
                print("server stats:", r.read().decode(), file=sys.stderr)
        except Exception:
            pass
        print(json.dumps({
            "metric": f"serving throughput (concurrency {args.concurrency})",
            "value": round(ok / wall, 3),
            "unit": "requests/s",
        }))


if __name__ == "__main__":
    main()

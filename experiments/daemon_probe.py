#!/usr/bin/env python
"""Warm-pool daemon probe: end-to-end request throughput through the
micro-batching ServingDaemon (serve/daemon.py) on a synthetic catalog.

Measures the thing the daemon exists for: many small concurrent requests
(the reference served ONE user per process launch, predict.cu:72-133)
coalescing into engine-sized batches.  Two regimes per op:

  - serial: one request in flight at a time (batch size 1 — what a naive
    per-request dispatch achieves; still amortizes compile, unlike the
    reference's process-per-user flow),
  - pooled: ``--clients`` threads keep requests in flight; the dispatcher
    drains them into batches.

Appends to results/daemon-probe.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--items", type=int, default=1_000_000)
    p.add_argument("--users", type=int, default=10_000)
    p.add_argument("--factors", type=int, default=64)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--requests", type=int, default=2048)
    p.add_argument("--clients", type=int, default=256)
    p.add_argument("--batch-users", type=int, nargs="*",
                   default=[64, 512, 4096],
                   help="batch-request sizes to probe ({'users': [...]}) "
                        "— the single-client path to the engine ceiling")
    p.add_argument("--serial", type=int, default=128,
                   help="#requests for the serial baseline")
    p.add_argument("--foldin-iters", type=int, default=100)
    p.add_argument("--window-ms", type=float, default=4.0)
    p.add_argument("--max-batch", type=int, default=512)
    p.add_argument("--only-batch", action="store_true",
                   help="skip the serial/pooled request-granular section")
    p.add_argument("--client-probe", action="store_true",
                   help="drive single-user recommend() calls through "
                        "serve.client.ServeClient over a unix socket — "
                        "measures the auto-batching client's users/s "
                        "(the request-granularity fix as an artifact)")
    args = p.parse_args()

    from cu2rec_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import numpy as np

    from cu2rec_tpu.models.state import init_model
    from cu2rec_tpu.serve.daemon import ServingDaemon
    from cu2rec_tpu.serve.engine import _pow2_pad
    from cu2rec_tpu.serve.engine import ShardedServingEngine
    from cu2rec_tpu.utils.config import Config

    I, U, F = args.items, args.users, args.factors
    model = init_model(U, I, F, 3.5, seed=0)
    t0 = time.perf_counter()
    eng = ShardedServingEngine(model)
    cfg = Config(total_iterations=args.foldin_iters, learning_rate=0.05,
                 n_factors=F, is_train=False)
    print(f"engine up: {U}x{I} W={eng.W} ip={eng.n_ip} "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)

    rng = np.random.default_rng(0)
    # pre-drawn item pool: rng.choice(I, d, replace=False) permutes all I
    # elements per call (tens of ms at 1M items) — not what we're timing
    item_pool = rng.integers(0, I, (4096, 32), np.int64)

    def make_req(i: int, op: str) -> dict:
        if op == "recommend":
            return {"id": i, "op": "recommend",
                    "user": int(rng.integers(0, U)), "k": args.k}
        d = int(rng.integers(8, 33))
        row = item_pool[rng.integers(0, len(item_pool))]
        req = {"id": i, "op": "fold_in",
               "items": [int(x) for x in row[:d]],
               "ratings": [float(x) for x in rng.uniform(1, 5, d)],
               "k": args.k, "iterations": args.foldin_iters}
        if op == "fold_in_implicit":
            # One exact ridge solve instead of SGD iterations.
            req.update(mode="implicit", alpha=40.0, reg=0.1)
            del req["iterations"]
        return req

    results = []
    for op in (() if args.only_batch
               else ("recommend", "fold_in", "fold_in_implicit")):
        daemon = ServingDaemon(eng, cfg=cfg, max_batch=args.max_batch,
                               window_ms=args.window_ms, default_k=args.k)
        daemon.start()
        # precompile the full pow2 program ladder (what a production
        # launch does via --warm-batch), then one traffic pass, untimed.
        t0 = time.perf_counter()
        n = daemon.warm(max_batch=min(args.max_batch, args.clients * 2),
                        max_width=32, iterations=args.foldin_iters)
        print(f"warm[{op}]: {n} programs "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
        warm = [daemon.submit(make_req(-2 - w, op))
                for w in range(args.clients)]
        for fut in warm:
            fut.result(timeout=600)

        # serial: one in flight at a time
        t0 = time.perf_counter()
        for i in range(args.serial):
            daemon.submit(make_req(i, op)).result(timeout=600)
        serial_dt = time.perf_counter() - t0

        # pooled: --clients threads, each owns requests/clients sends
        n = args.requests
        per = n // args.clients
        errs: list = []

        def client(cid: int) -> None:
            for j in range(per):
                r = daemon.submit(make_req(cid * per + j, op)).result(
                    timeout=600)
                if "error" in r:
                    errs.append(r)

        b0, r0 = daemon.n_batches, daemon.n_batched_requests
        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        pooled_dt = time.perf_counter() - t0
        daemon.close()
        assert not errs, errs[:3]
        nb = daemon.n_batches - b0
        rec = {"kind": "daemon_probe", "op": op, "n_items": I,
               "n_factors": F, "ip": eng.n_ip, "k": args.k,
               "serial_req_per_s": round(args.serial / serial_dt, 1),
               "pooled_req_per_s": round(per * args.clients / pooled_dt, 1),
               "clients": args.clients,
               "mean_batch": round((daemon.n_batched_requests - r0)
                                   / max(nb, 1), 1),
               "window_ms": args.window_ms,
               "foldin_iterations": args.foldin_iters,
               "backend": jax.default_backend()}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # --- batch-request mode + engine-direct decomposition (recommend) ---
    # The pooled regime above is request-granular; the batch op lets ONE
    # client ship B users per JSON line.  For each B: daemon users/s with
    # a 4-deep in-flight window (pipelines fetch against execute), the
    # direct engine call at the same B (device+fetch ceiling), and the
    # dispatch-only engine rate (device ceiling without per-call fetch).
    for B in (args.batch_users or []):
        daemon = ServingDaemon(eng, cfg=cfg, max_batch=args.max_batch,
                               window_ms=0.0, default_k=args.k)
        daemon.start()
        n_reqs = max(min(args.requests * 16, 131072) // B, 6)
        users_pool = rng.integers(0, U, (n_reqs, B))

        def breq(i):
            return {"id": i, "op": "recommend",
                    "users": [int(x) for x in users_pool[i]], "k": args.k}

        # Precompile every pow2 row-count the pipeline can coalesce to
        # (window in-flight batch requests can merge into one group):
        # an uncompiled shape mid-run would hide a multi-minute remote
        # compile inside the throughput number.
        window = 4
        bp = _pow2_pad(B)
        while bp <= _pow2_pad(B) * window and bp <= 65536:
            eng.recommend_padded(
                np.zeros((bp, eng.F), np.float32), np.zeros(bp, np.float32),
                np.zeros((bp, 1), np.int32), np.zeros((bp, 1), bool),
                k=args.k)
            bp *= 2
        daemon.submit(breq(0)).result(timeout=600)
        b0, r0 = daemon.n_batches, daemon.n_batched_requests
        futs = []
        t0 = time.perf_counter()
        for i in range(n_reqs):
            futs.append(daemon.submit(breq(i)))
            if len(futs) >= window:
                r = futs.pop(0).result(timeout=600)
                assert "error" not in r, r
        for f in futs:
            r = f.result(timeout=600)
            assert "error" not in r, r
        daemon_dt = time.perf_counter() - t0
        nb = daemon.n_batches - b0
        nr = daemon.n_batched_requests - r0
        daemon.close()

        # Engine-direct at the same B: what the daemon's _run_recommend
        # does, minus queue/JSON/future plumbing.
        uids = users_pool[0]
        pp, ubp = eng._pad_rows(eng.P[uids], eng.user_bias[uids])
        Bp = pp.shape[0]
        zi = np.zeros((Bp, 1), np.int32)
        zm = np.zeros((Bp, 1), bool)
        eng.recommend_padded(pp, ubp, zi, zm, k=args.k)  # compiled above
        reps = max(n_reqs // 2, 3)
        t0 = time.perf_counter()
        for i in range(reps):
            uids = users_pool[i % n_reqs]
            pp, ubp = eng._pad_rows(eng.P[uids], eng.user_bias[uids])
            s, ids_ = eng.recommend_padded(pp, ubp, zi, zm, k=args.k)
            np.asarray(s)  # fetch
        engine_dt = time.perf_counter() - t0
        # dispatch-only: fetch once at the end (device-rate bound)
        t0 = time.perf_counter()
        for i in range(reps):
            uids = users_pool[i % n_reqs]
            pp, ubp = eng._pad_rows(eng.P[uids], eng.user_bias[uids])
            s, ids_ = eng.recommend_padded(pp, ubp, zi, zm, k=args.k)
        np.asarray(s)
        device_dt = time.perf_counter() - t0

        rec = {"kind": "daemon_batch_probe", "op": "recommend",
               "n_items": I, "n_factors": F, "ip": eng.n_ip, "k": args.k,
               "batch_users": B, "n_requests": n_reqs,
               "engine_batches": nb,
               "mean_reqs_per_engine_batch": round(nr / max(nb, 1), 2),
               "daemon_users_per_s": round(n_reqs * B / daemon_dt, 1),
               "engine_users_per_s": round(reps * B / engine_dt, 1),
               "device_users_per_s": round(reps * B / device_dt, 1),
               "daemon_vs_engine": round(engine_dt / daemon_dt * n_reqs
                                         / reps, 3),
               "backend": jax.default_backend()}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # --- client probe: ServeClient auto-batching over a unix socket ----
    # The pooled regime above is the granularity ceiling (~2.2-2.4K
    # req/s: JSON+queue+dispatch per single-user request); the client
    # merges those same per-user calls into batch 'users' requests
    # transparently, so ONE caller making one-user calls should land at
    # the daemon batch ceiling instead.
    if args.client_probe:
        import tempfile

        from cu2rec_tpu.serve.client import ServeClient
        from cu2rec_tpu.serve.daemon import run_socket

        daemon = ServingDaemon(eng, cfg=cfg, max_batch=args.max_batch,
                               window_ms=0.0, default_k=args.k)
        path = os.path.join(tempfile.mkdtemp(prefix="cu2rec_probe_"),
                            "serve.sock")
        threading.Thread(target=run_socket, args=(daemon, path),
                         daemon=True).start()
        deadline = time.monotonic() + 30
        while not os.path.exists(path):
            assert time.monotonic() < deadline, "socket never appeared"
            time.sleep(0.05)
        client_bs = 256
        # precompile the shapes the client's batches coalesce to
        for bp in {_pow2_pad(client_bs), _pow2_pad(client_bs) * 2,
                   _pow2_pad(client_bs) * 4}:
            eng.recommend_padded(
                np.zeros((bp, eng.F), np.float32), np.zeros(bp, np.float32),
                np.zeros((bp, 1), np.int32), np.zeros((bp, 1), bool),
                k=args.k)
        n = max(args.requests * 8, 8192)
        users = rng.integers(0, U, n + client_bs)
        with ServeClient(path, batch_size=client_bs, flush_after_ms=2.0,
                         max_in_flight=16) as c:
            # warm pass (untimed)
            for f in [c.recommend(int(u), k=args.k)
                      for u in users[n:]]:
                f.result(timeout=600)
            b0, r0 = daemon.n_batches, daemon.n_batched_requests
            futs = []
            t0 = time.perf_counter()
            for i in range(n):
                futs.append(c.recommend(int(users[i]), k=args.k))
                if len(futs) >= 8192:
                    futs.pop(0).result(timeout=600)
            c.flush()
            for f in futs:
                assert "error" not in f.result(timeout=600)
            client_dt = time.perf_counter() - t0
        nb = daemon.n_batches - b0
        rec = {"kind": "client_probe", "op": "recommend", "n_items": I,
               "n_factors": F, "ip": eng.n_ip, "k": args.k,
               "client_batch_size": client_bs, "n_user_calls": n,
               "client_users_per_s": round(n / client_dt, 1),
               "engine_batches": nb,
               "mean_users_per_engine_batch": round(n / max(nb, 1), 1),
               "mean_wire_reqs_per_engine_batch": round(
                   (daemon.n_batched_requests - r0) / max(nb, 1), 1),
               "backend": jax.default_backend()}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    res = os.path.join(os.path.dirname(__file__), os.pardir, "results",
                       "daemon-probe.jsonl")
    os.makedirs(os.path.dirname(res), exist_ok=True)
    with open(res, "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()

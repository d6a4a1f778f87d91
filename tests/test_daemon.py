"""Warm-pool serving daemon tests: micro-batching, grouping, protocol
errors, stdio transport, and the ``cu2rec-serve`` CLI.

The daemon is the TPU-idiomatic replacement for the reference's
process-per-user serving flow (predict.cu:72-133): one engine, compiled
programs reused across requests, concurrent requests coalesced into
engine-sized batches.  Correctness bar: a batched daemon response must
equal the same engine call issued directly with the same grouping.
"""

import io
import json
import os
import pathlib
import time

import numpy as np
import pytest

from cu2rec_tpu.train.trainer import train
from cu2rec_tpu.utils.config import Config
from cu2rec_tpu.utils.metrics import MetricsLogger

DATA_DIR = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="module")
def served():
    import jax
    from cu2rec_tpu.data import build_csr, read_ratings_csv
    from cu2rec_tpu.serve.daemon import ServingDaemon
    from cu2rec_tpu.serve.engine import ShardedServingEngine

    rd = read_ratings_csv(str(DATA_DIR / "test_ratings.csv"))
    csr = build_csr(rd)
    cfg = Config(total_iterations=200, n_factors=4, learning_rate=0.05,
                 check_error=200)
    model, _ = train(csr, csr, cfg, rd.global_bias,
                     logger=MetricsLogger(verbose=False))
    engine = ShardedServingEngine(model, devices=jax.devices()[:2])
    fold_cfg = cfg.replace(total_iterations=30, cur_iterations=0,
                           is_train=False)
    daemon = ServingDaemon(engine, train_csr=csr, cfg=fold_cfg,
                           window_ms=0.0)
    return daemon, engine, csr, fold_cfg


def test_recommend_batch_matches_engine(served):
    daemon, engine, csr, _ = served
    users = [0, 2, 4]
    futs = [daemon.submit({"id": u, "op": "recommend", "user": u, "k": 3})
            for u in users]
    n0 = daemon.n_batches
    processed = 0
    while processed < len(users):
        processed += daemon.process_once(block=False)
    # all three coalesced into ONE engine call
    assert daemon.n_batches == n0 + 1
    scores, ids = engine.recommend_known(users, csr, k=3)
    scores, ids = np.asarray(scores), np.asarray(ids)
    for b, fut in enumerate(futs):
        resp = fut.result(timeout=5)
        keep = scores[b] > -1e30  # surplus slots are trimmed from responses
        assert resp["id"] == users[b]
        assert resp["items"] == [int(i) for i in ids[b][keep]]
        np.testing.assert_allclose(resp["scores"], scores[b][keep], atol=1e-5)


def test_recommend_users_batch_op(served):
    """The batch-request form ({"users": [...]}) must return per-user
    results identical to the same users issued individually AND coalesce
    with single-user requests into one engine call (round-2 verdict
    item 3: a single client must be able to amortize JSON/dispatch
    overhead)."""
    daemon, engine, csr, _ = served
    batch_fut = daemon.submit(
        {"id": 100, "op": "recommend", "users": [0, 2, 4], "k": 3})
    single_fut = daemon.submit(
        {"id": 101, "op": "recommend", "user": 1, "k": 3})
    n0 = daemon.n_batches
    processed = 0
    while processed < 2:
        processed += daemon.process_once(block=False)
    assert daemon.n_batches == n0 + 1  # one engine call for both requests
    scores, ids = engine.recommend_known([0, 2, 4, 1], csr, k=3)
    scores, ids = np.asarray(scores), np.asarray(ids)
    resp = batch_fut.result(timeout=5)
    assert resp["id"] == 100 and len(resp["results"]) == 3
    for b, row in enumerate(resp["results"]):
        keep = scores[b] > -1e30
        assert row["items"] == [int(i) for i in ids[b][keep]]
        np.testing.assert_allclose(row["scores"], scores[b][keep],
                                   atol=1e-5)
    single = single_fut.result(timeout=5)
    keep = scores[3] > -1e30
    assert single["items"] == [int(i) for i in ids[3][keep]]


def test_recommend_users_batch_validation(served):
    daemon, _, _, _ = served
    bad = [
        {"op": "recommend", "users": []},
        {"op": "recommend", "users": [0], "user": 1},
        {"op": "recommend", "users": [0, 999999]},
        {"op": "recommend", "users": [0, True]},
        {"op": "recommend", "users": "0,1"},
    ]
    for req in bad:
        resp = daemon.submit(req).result(timeout=5)
        assert "error" in resp, req


def test_fold_in_ragged_batch_matches_engine(served):
    daemon, engine, _, fold_cfg = served
    reqs = [
        {"id": 10, "op": "fold_in", "items": [0, 1, 2],
         "ratings": [5.0, 5.0, 5.0], "k": 2},
        {"id": 11, "op": "fold_in", "items": [3],
         "ratings": [1.0], "k": 2},
    ]
    futs = [daemon.submit(r) for r in reqs]
    processed = 0
    while processed < len(reqs):
        processed += daemon.process_once(block=False)
    # same padded batch issued directly
    rated = np.zeros((2, 3), np.int32)
    vals = np.zeros((2, 3), np.float32)
    mask = np.zeros((2, 3), bool)
    rated[0] = [0, 1, 2]
    vals[0] = [5.0, 5.0, 5.0]
    mask[0] = True
    rated[1, 0] = 3
    vals[1, 0] = 1.0
    mask[1, 0] = True
    scores, ids = engine.fold_in_and_recommend(rated, vals, mask,
                                               cfg=fold_cfg, k=2)
    scores, ids = np.asarray(scores), np.asarray(ids)
    for b, fut in enumerate(futs):
        resp = fut.result(timeout=5)
        keep = scores[b] > -1e30
        assert resp["items"] == [int(i) for i in ids[b][keep]]
        np.testing.assert_allclose(resp["scores"], scores[b][keep], atol=1e-5)
    # fold-in masks the user's own rated items out of the recommendations
    assert 3 not in futs[1].result()["items"]


def test_recommend_trims_surplus_slots(served):
    """A user with fewer than k unrated items gets a short list, never
    sentinel scores (serve/recommend.py: surplus slots carry < -1e30)."""
    daemon, _, csr, _ = served
    # user 0 rated 4 of the 5 toy items -> at most 1 real recommendation
    fut = daemon.submit({"id": 1, "op": "recommend", "user": 0, "k": 3})
    while not fut.done():
        daemon.process_once(block=False)
    resp = fut.result(timeout=5)
    n_unrated = csr.n_items - (csr.indptr[1] - csr.indptr[0])
    assert len(resp["items"]) == min(3, n_unrated) == 1
    assert all(s > -1e30 for s in resp["scores"])


def test_oversized_group_splits_at_row_cap(served):
    """A dispatch group whose flattened user rows exceed ``max_rows``
    must split into several bounded engine calls (round-3 advisor
    finding: max_batch counts REQUESTS, so one 65536-user batch request
    could flatten to a score tile far past the engine's ~512 MB chunk
    budget) — and the reassembled per-request results must be identical
    to the unsplit path."""
    daemon, engine, csr, _ = served
    users = [0, 2, 4, 1, 3, 5, 0, 1, 2, 3]  # 10 rows + 1 single = 11
    calls = []
    orig = engine.recommend_known_padded

    def counting(uids, *a, **k):
        calls.append(len(uids))
        return orig(uids, *a, **k)

    old_cap = daemon.max_rows
    engine.recommend_known_padded = counting
    daemon.max_rows = 4
    try:
        batch_fut = daemon.submit(
            {"id": 1, "op": "recommend", "users": users, "k": 3})
        single_fut = daemon.submit(
            {"id": 2, "op": "recommend", "user": 5, "k": 3})
        n0 = daemon.n_batches
        processed = 0
        while processed < 2:
            processed += daemon.process_once(block=False)
        assert daemon.n_batches == n0 + 1  # one GROUP...
        assert calls == [4, 4, 3]          # ...split into 3 engine calls
    finally:
        engine.recommend_known_padded = orig
        daemon.max_rows = old_cap
    scores, ids = engine.recommend_known(users + [5], csr, k=3)
    scores, ids = np.asarray(scores), np.asarray(ids)
    resp = batch_fut.result(timeout=5)
    assert len(resp["results"]) == len(users)
    for b, row in enumerate(resp["results"]):
        keep = scores[b] > -1e30
        assert row["items"] == [int(i) for i in ids[b][keep]]
        np.testing.assert_allclose(row["scores"], scores[b][keep],
                                   atol=1e-5)
    single = single_fut.result(timeout=5)
    keep = scores[10] > -1e30
    assert single["items"] == [int(i) for i in ids[10][keep]]


def test_fold_in_items_length_cap(served):
    daemon, _, _, _ = served
    resp = daemon.submit({"op": "fold_in",
                          "items": list(range(daemon.max_fold_in_items + 1)),
                          "ratings": [3.0] * (daemon.max_fold_in_items + 1),
                          "k": 2}).result(timeout=5)
    assert "error" in resp and "too long" in resp["error"]


def test_mixed_ops_split_into_groups(served):
    daemon, _, _, _ = served
    futs = [
        daemon.submit({"id": 1, "op": "recommend", "user": 0, "k": 2}),
        daemon.submit({"id": 2, "op": "fold_in", "items": [1],
                       "ratings": [4.0], "k": 2}),
        daemon.submit({"id": 3, "op": "recommend", "user": 1, "k": 2}),
    ]
    n0 = daemon.n_batches
    processed = 0
    while processed < 3:
        processed += daemon.process_once(block=False)
    # one recommend group (users 0 and 1 share k) + one fold-in group
    assert daemon.n_batches == n0 + 2
    for fut in futs:
        assert "error" not in fut.result(timeout=5)


def test_warm_precompiles_program_ladder(served):
    """warm() compiles the pow2 ladder; traffic within it adds nothing."""
    daemon, engine, _, _ = served
    daemon.warm(max_batch=8, max_width=8)
    n0 = len(engine._programs)
    futs = [daemon.submit({"id": i, "op": "recommend", "user": i, "k": 10})
            for i in range(3)]
    futs.append(daemon.submit({"id": 9, "op": "fold_in", "items": [0, 1],
                               "ratings": [4.0, 3.0], "k": 10}))
    done = 0
    while done < len(futs):
        done += daemon.process_once(block=False)
    for f in futs:
        assert "error" not in f.result(timeout=5)
    assert len(engine._programs) == n0


def test_warm_covers_heavy_users_and_extra_ks():
    """warm() must cover rated-list widths from the CSR's max degree
    (beyond max_width) and every k in ``ks`` — real traffic within those
    bounds compiles nothing (regression: widths were capped at max_width
    and k at default_k, so heavy users / non-default k stalled a live
    batch on a remote compile)."""
    from cu2rec_tpu.data.csr import csr_from_arrays
    from cu2rec_tpu.models.state import init_model
    from cu2rec_tpu.serve.daemon import ServingDaemon
    from cu2rec_tpu.serve.engine import ShardedServingEngine

    n_items = 40
    heavy = np.arange(20, dtype=np.int64)  # user 0 rated 20 items → Rp=32
    users = np.concatenate([np.zeros(20, np.int64), np.ones(2, np.int64)])
    items = np.concatenate([heavy, np.array([1, 2])])
    vals = np.full(22, 3.0, np.float32)
    csr = csr_from_arrays(users, items, vals, 2, n_items)
    model = init_model(2, n_items, 4, 3.0, seed=0)
    eng = ShardedServingEngine(model)
    daemon = ServingDaemon(eng, train_csr=csr,
                           cfg=Config(n_factors=4, total_iterations=5,
                                      is_train=False),
                           window_ms=0.0, default_k=10)
    daemon.warm(max_batch=8, max_width=8, ks=(10, 3))
    n0 = len(eng._programs)
    futs = [daemon.submit({"id": 1, "op": "recommend", "user": 0, "k": 3}),
            daemon.submit({"id": 2, "op": "recommend", "user": 1, "k": 10})]
    done = 0
    while done < len(futs):
        done += daemon.process_once(block=False)
    for f in futs:
        assert "error" not in f.result(timeout=5)
    assert len(eng._programs) == n0


def test_warm_ops_gating():
    """warm(ops=...) compiles only the selected op ladders: an
    explicit-only deployment skips the implicit fold-in rung (which
    otherwise roughly doubles fold-in warm-up compile time)."""
    from cu2rec_tpu.models.state import init_model
    from cu2rec_tpu.serve.daemon import ServingDaemon
    from cu2rec_tpu.serve.engine import ShardedServingEngine

    def fresh_daemon():
        model = init_model(2, 16, 4, 3.0, seed=0)
        eng = ShardedServingEngine(model)
        return ServingDaemon(eng, cfg=Config(n_factors=4,
                                             total_iterations=2,
                                             is_train=False),
                             window_ms=0.0, default_k=5), eng

    d_full, e_full = fresh_daemon()
    n_full = d_full.warm(max_batch=8, max_width=8)
    d_expl, e_expl = fresh_daemon()
    n_expl = d_expl.warm(max_batch=8, max_width=8,
                         ops=("recommend", "fold_in"))
    assert 0 < n_expl < n_full
    # the gated rung is exactly the implicit programs: warming it
    # afterwards lands at the full count
    n_imp = d_expl.warm(max_batch=8, max_width=8,
                        ops=("fold_in_implicit",))
    assert n_expl + n_imp == n_full
    with pytest.raises(ValueError, match="unknown warm ops"):
        d_full.warm(max_batch=8, ops=("recommend", "bogus"))


def test_validation_errors(served):
    daemon, engine, _, _ = served
    bad = [
        ({"id": 1, "op": "nope"}, "unknown op"),
        ({"id": 2, "op": "fold_in", "items": [], "ratings": []},
         "non-empty"),
        ({"id": 3, "op": "fold_in", "items": [0], "ratings": [1.0, 2.0]},
         "match"),
        ({"id": 4, "op": "fold_in", "items": [engine.n_items + 5],
          "ratings": [1.0]}, "item ids"),
        ({"id": 5, "op": "recommend", "user": -1}, "'user'"),
        ({"id": 6, "op": "recommend", "user": 10**6}, "'user'"),
        # non-numeric fields must become error RESPONSES, not exceptions
        # that kill the dispatcher/transport (regression)
        ({"id": 7, "op": "recommend", "user": 0, "k": "ten"}, "'k'"),
        ({"id": 8, "op": "recommend", "user": 0, "k": 0}, "'k'"),
        ({"id": 9, "op": "fold_in", "items": [None], "ratings": [1.0]},
         "item ids"),
        ({"id": 10, "op": "fold_in", "items": [0], "ratings": ["five"]},
         "'ratings'"),
        ({"id": 11, "op": "fold_in", "items": [0], "ratings": [1.0],
          "iterations": "x"}, "'iterations'"),
        ({"id": 12, "op": "fold_in", "items": [0], "ratings": [1.0],
          "iterations": -3}, "'iterations'"),
        # NaN/Inf would propagate through the fold-in SGD and produce a
        # silently empty recommendation list; must be rejected up front
        ({"id": 13, "op": "fold_in", "items": [0],
          "ratings": [float("nan")]}, "'ratings'"),
        ({"id": 14, "op": "fold_in", "items": [0],
          "ratings": [float("inf")]}, "'ratings'"),
        # bool is a subclass of int; "user": true must not serve user 1
        ({"id": 15, "op": "recommend", "user": True}, "'user'"),
        ({"id": 16, "op": "recommend", "user": 0, "k": True}, "'k'"),
        ({"id": 17, "op": "fold_in", "items": [True], "ratings": [1.0]},
         "item ids"),
    ]
    for req, frag in bad:
        resp = daemon.submit(req).result(timeout=5)
        assert frag in resp["error"], resp
    # the daemon must still serve good requests after all that
    fut = daemon.submit({"id": 99, "op": "recommend", "user": 0, "k": 2})
    while not fut.done():
        daemon.process_once(block=False)
    assert "items" in fut.result(timeout=5)


def test_stats(served):
    daemon, engine, _, _ = served
    resp = daemon.submit({"id": 9, "op": "stats"}).result(timeout=5)
    assert resp["n_items"] == engine.n_items
    assert resp["n_shards"] == engine.n_ip
    assert resp["requests"] >= 1
    assert resp["mean_batch"] >= 1.0


def test_stdio_transport_roundtrip(served):
    from cu2rec_tpu.serve.daemon import run_stdio

    daemon, _, _, _ = served
    lines = [
        json.dumps({"id": 1, "op": "recommend", "user": 0, "k": 2}),
        "not json at all",
        json.dumps({"id": 2, "op": "stats"}),
    ]
    out = io.StringIO()
    rc = run_stdio(daemon, io.StringIO("\n".join(lines) + "\n"), out)
    assert rc == 0
    resps = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(resps) == 3
    by_id = {r.get("id"): r for r in resps}
    # user 0 has a single unrated item, so k=2 trims to 1
    assert len(by_id[1]["items"]) == 1
    assert "bad json" in by_id[None]["error"]
    assert by_id[2]["n_items"] == daemon.engine.n_items


def test_socket_transport_concurrent_connections(served, tmp_path):
    """Two connections share one warm pool; both get correct answers."""
    import socket
    import threading

    from cu2rec_tpu.serve.daemon import run_socket

    daemon, _, _, _ = served
    path = str(tmp_path / "serve.sock")
    srv = threading.Thread(target=run_socket, args=(daemon, path),
                           daemon=True)
    srv.start()
    deadline = time.monotonic() + 10
    while not os.path.exists(path):
        assert time.monotonic() < deadline, "socket never appeared"
        time.sleep(0.01)

    def ask(reqs):
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c.connect(path)
        rf = c.makefile("r", encoding="utf-8")
        wf = c.makefile("w", encoding="utf-8")
        out = []
        for r in reqs:
            wf.write(json.dumps(r) + "\n")
        wf.flush()
        c.shutdown(socket.SHUT_WR)
        for line in rf:
            out.append(json.loads(line))
        c.close()
        return out

    results = {}

    def client(cid):
        results[cid] = ask([
            {"id": cid * 10, "op": "recommend", "user": cid, "k": 2},
            {"id": cid * 10 + 1, "op": "stats"},
        ])

    ts = [threading.Thread(target=client, args=(c,)) for c in (1, 2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    for cid in (1, 2):
        resps = {r["id"]: r for r in results[cid]}
        assert "items" in resps[cid * 10], resps
        assert resps[cid * 10 + 1]["n_items"] == daemon.engine.n_items
    # run_socket loops on accept() until interrupted; leave the daemon
    # thread to die with the test process (daemon=True).


def test_serve_client_auto_batches(served, tmp_path):
    """ServeClient merges concurrent single-user recommends into batch
    ``users`` requests (so one client rides the daemon's batch ceiling)
    and fans the responses back out per caller; pass-through ops and
    explicit batches keep working on the same connection."""
    import threading

    from cu2rec_tpu.serve.client import ServeClient
    from cu2rec_tpu.serve.daemon import run_socket

    daemon, engine, csr, _ = served
    path = str(tmp_path / "serve_client.sock")
    threading.Thread(target=run_socket, args=(daemon, path),
                     daemon=True).start()
    deadline = time.monotonic() + 10
    while not os.path.exists(path):
        assert time.monotonic() < deadline, "socket never appeared"
        time.sleep(0.01)

    n_users = csr.n_users
    n_req0 = daemon.n_requests
    with ServeClient(path, batch_size=8, flush_after_ms=50.0) as c:
        futs = [c.recommend(u % n_users, k=2) for u in range(16)]
        results = [f.result(timeout=30) for f in futs]
        # correctness: every row matches a direct single-user request
        direct = daemon.submit({"id": 0, "op": "recommend", "user": 0,
                                "k": 2}).result(timeout=30)
        assert results[0]["items"] == direct["items"]
        for r in results:
            assert "error" not in r and len(r["items"]) >= 1
        # 16 users crossed the wire as 2 batch requests, not 16
        assert daemon.n_requests - n_req0 == 2 + 1  # +1 direct submit

        # explicit batch + fold-in + stats pass through unscathed
        batch = c.recommend_many([0, 1, 2], k=2).result(timeout=30)
        assert len(batch["results"]) == 3
        assert batch["results"][0]["items"] == direct["items"]
        fi = c.fold_in([0, 1], [4.0, 3.0], k=2,
                       iterations=5).result(timeout=30)
        assert "error" not in fi and len(fi["items"]) >= 1
        st = c.stats().result(timeout=30)
        assert st["n_items"] == engine.n_items

        # a lone sub-batch-size recommend still flushes (timer path)
        lone = c.recommend(1, k=2).result(timeout=30)
        assert "error" not in lone


def test_serve_client_isolates_bad_user_in_batch(served, tmp_path):
    """The daemon rejects a batch 'users' request wholesale when ANY id
    is invalid; the client must not let that poison co-batched callers —
    it resubmits the members as single-user requests so only the bad id
    gets the error."""
    import threading

    from cu2rec_tpu.serve.client import ServeClient
    from cu2rec_tpu.serve.daemon import run_socket

    daemon, _, csr, _ = served
    path = str(tmp_path / "serve_iso.sock")
    threading.Thread(target=run_socket, args=(daemon, path),
                     daemon=True).start()
    deadline = time.monotonic() + 10
    while not os.path.exists(path):
        assert time.monotonic() < deadline
        time.sleep(0.01)

    with ServeClient(path, batch_size=2, flush_after_ms=200.0) as c:
        good = c.recommend(0, k=2)
        bad = c.recommend(csr.n_users + 99, k=2)  # out of range
        r_good = good.result(timeout=30)
        r_bad = bad.result(timeout=30)
    assert "error" not in r_good and len(r_good["items"]) >= 1
    assert "id" not in r_good  # bare per-row shape, even resubmitted
    assert "error" in r_bad


def test_serve_client_thread_stress(served, tmp_path):
    """Many caller threads hammering recommend()/fold_in concurrently:
    every future resolves to a correct-shaped response, nothing
    deadlocks, and the client's auto-batching keeps wire requests well
    under the call count."""
    import threading

    from cu2rec_tpu.serve.client import ServeClient
    from cu2rec_tpu.serve.daemon import run_socket

    daemon, _, csr, _ = served
    path = str(tmp_path / "serve_stress.sock")
    threading.Thread(target=run_socket, args=(daemon, path),
                     daemon=True).start()
    deadline = time.monotonic() + 10
    while not os.path.exists(path):
        assert time.monotonic() < deadline
        time.sleep(0.01)

    n_threads, per = 8, 25
    errs: list = []
    n_req0 = daemon.n_requests
    with ServeClient(path, batch_size=16, flush_after_ms=2.0,
                     max_in_flight=8) as c:
        def worker(t):
            try:
                futs = [c.recommend((t * per + j) % csr.n_users, k=2)
                        for j in range(per)]
                if t % 2 == 0:
                    futs.append(c.fold_in([0, 1], [4.0, 3.0], k=2,
                                          iterations=3))
                for f in futs:
                    r = f.result(timeout=60)
                    if "error" in r or "items" not in r:
                        errs.append(r)
            except Exception as e:  # noqa: BLE001 — collect, assert below
                errs.append(repr(e))

        ts = [threading.Thread(target=worker, args=(t,))
              for t in range(n_threads)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
            assert not t.is_alive(), "worker deadlocked"
    assert not errs, errs[:3]
    wire = daemon.n_requests - n_req0
    assert wire < n_threads * per  # auto-batching actually batched


def test_serve_client_survives_dead_connection(tmp_path):
    """A dying daemon connection fails outstanding futures with
    ConnectionError AND releases their in-flight semaphore permits —
    close() must return, not block forever in _sem.acquire()."""
    import socket
    import threading

    from cu2rec_tpu.serve.client import ServeClient

    path = str(tmp_path / "dead.sock")
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(path)
    srv.listen(1)
    conns = []

    def accept_then_hang():
        conn, _ = srv.accept()
        conns.append(conn)
        time.sleep(0.3)
        conn.close()          # daemon "crashes" with requests in flight

    threading.Thread(target=accept_then_hang, daemon=True).start()
    c = ServeClient(path, batch_size=4, flush_after_ms=1.0,
                    max_in_flight=2)
    futs = [c.recommend(u, k=2) for u in range(4)]
    c.flush()
    for f in futs:
        with pytest.raises(ConnectionError):
            f.result(timeout=30)
    t0 = time.monotonic()
    c.close()                 # must not hang on leaked permits
    assert time.monotonic() - t0 < 10
    with pytest.raises(RuntimeError, match="client closed"):
        c.recommend(0)
    srv.close()


def test_serve_cli_checkpoint_stdio(tmp_path, data_dir, monkeypatch,
                                    capsys):
    """Full CLI journey: train → checkpoint → cu2rec-serve over stdio."""
    import sys

    from cu2rec_tpu.cli.serve import main
    from cu2rec_tpu.data import build_csr, read_ratings_csv
    from cu2rec_tpu.utils.checkpoint import save_checkpoint

    rd = read_ratings_csv(str(data_dir / "test_ratings.csv"))
    csr = build_csr(rd)
    cfg = Config(total_iterations=100, n_factors=4, learning_rate=0.05,
                 check_error=100)
    model, _ = train(csr, csr, cfg, rd.global_bias,
                     logger=MetricsLogger(verbose=False))
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, model, cfg.replace(total_iterations=20))

    reqs = "\n".join([
        json.dumps({"id": 1, "op": "recommend", "user": 0, "k": 2}),
        json.dumps({"id": 2, "op": "fold_in", "items": [0, 1],
                    "ratings": [5.0, 4.0], "k": 2}),
    ]) + "\n"
    monkeypatch.setattr(sys, "stdin", io.StringIO(reqs))
    rc = main([
        "--checkpoint", ckpt,
        "--train", str(data_dir / "test_ratings.csv"),
        "--devices", "2", "--window-ms", "0",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    resps = [json.loads(l) for l in out.splitlines() if l.strip()]
    by_id = {r["id"]: r for r in resps}
    # user 0 has a single unrated item; the fold-in user left 3 unrated
    assert len(by_id[1]["items"]) == 1
    assert len(by_id[2]["items"]) == 2
    assert all("error" not in r for r in resps), resps


def test_serve_cli_item_components_foldin_only(tmp_path, data_dir,
                                               monkeypatch, capsys):
    """predict.cu-style source (-q/-i/-g): fold-in works, recommend-by-id
    is rejected (no known users)."""
    import sys

    from cu2rec_tpu.cli.serve import main
    from cu2rec_tpu.data import build_csr, read_ratings_csv
    from cu2rec_tpu.utils.checkpoint import export_components

    rd = read_ratings_csv(str(data_dir / "test_ratings.csv"))
    csr = build_csr(rd)
    cfg = Config(total_iterations=100, n_factors=4, learning_rate=0.05,
                 check_error=100)
    model, _ = train(csr, csr, cfg, rd.global_bias,
                     logger=MetricsLogger(verbose=False))
    export_components(model, str(tmp_path), "toy", cfg.n_factors)
    cfgfile = str(tmp_path / "serve.cfg")
    cfg.replace(total_iterations=20).write_config(cfgfile)

    reqs = "\n".join([
        json.dumps({"id": 1, "op": "fold_in", "items": [0, 1],
                    "ratings": [5.0, 4.0], "k": 3}),
        json.dumps({"id": 2, "op": "recommend", "user": 0, "k": 3}),
    ]) + "\n"
    monkeypatch.setattr(sys, "stdin", io.StringIO(reqs))
    rc = main([
        "-c", cfgfile,
        "-q", str(tmp_path / "toy_f4_q.csv"),
        "-i", str(tmp_path / "toy_f4_item_bias.csv"),
        "-g", str(tmp_path / "toy_f4_global_bias.csv"),
        "--devices", "2", "--window-ms", "0",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    by_id = {r["id"]: r for r in
             (json.loads(l) for l in out.splitlines() if l.strip())}
    assert len(by_id[1]["items"]) == 3
    assert 0 not in by_id[1]["items"] and 1 not in by_id[1]["items"]
    assert "error" in by_id[2]  # no known users in this mode


def test_fold_in_implicit_op_matches_engine(served):
    """mode='implicit' fold-in: one exact batched ridge solve per
    (alpha, reg) group, responses == the engine called directly, and
    sgd/implicit requests never share a group."""
    daemon, engine, csr, _ = served
    reqs = [{"id": 100 + b, "op": "fold_in", "mode": "implicit",
             "items": [0, 2 + b], "ratings": [2.0, 1.0 + b],
             "alpha": 5.0, "reg": 0.3, "k": 2} for b in range(3)]
    # a same-cycle sgd fold-in must go to its own group
    reqs.append({"id": 200, "op": "fold_in", "items": [1],
                 "ratings": [4.0], "k": 2, "iterations": 5})
    futs = [daemon.submit(r) for r in reqs]
    n0 = daemon.n_batches
    processed = 0
    while processed < len(reqs):
        processed += daemon.process_once(block=False)
    assert daemon.n_batches == n0 + 2  # implicit group + sgd group

    rated = np.asarray([[0, 2], [0, 3], [0, 4]], np.int32)
    vals = np.asarray([[2.0, 1.0], [2.0, 2.0], [2.0, 3.0]], np.float32)
    mask = np.ones((3, 2), bool)
    rows, ub = engine.fold_in_implicit(rated, vals, mask,
                                       alpha=5.0, reg=0.3)
    scores, ids = engine.recommend(rows, ub, rated, mask, k=2)
    for b in range(3):
        resp = futs[b].result(timeout=60)
        assert "error" not in resp, resp
        keep = np.asarray(scores[b]) > -1e30
        assert resp["items"] == [int(i) for i in np.asarray(ids[b])[keep]]
        # own rated items masked
        assert not set(resp["items"]) & {0, 2 + b}
    assert "error" not in futs[3].result(timeout=60)


def test_fold_in_implicit_validation(served):
    daemon, _, _, _ = served
    bad = [
        ({"op": "fold_in", "mode": "ridge", "items": [1],
          "ratings": [1.0]}, "'mode' must be"),
        ({"op": "fold_in", "mode": "implicit", "items": [1],
          "ratings": [1.0], "alpha": float("nan")}, "'alpha'"),
        ({"op": "fold_in", "mode": "implicit", "items": [1],
          "ratings": [1.0], "reg": -1}, "'reg'"),
    ]
    for req, frag in bad:
        resp = daemon.submit(req).result(timeout=10)
        assert "error" in resp and frag in resp["error"], (req, resp)


def test_fold_in_implicit_rejects_negative_strengths(served):
    """Negative implicit strengths make the ridge system indefinite
    (NaN factors -> silently empty response) — must be rejected."""
    daemon, _, _, _ = served
    resp = daemon.submit({"op": "fold_in", "mode": "implicit",
                          "items": [1, 2], "ratings": [-1.0, 2.0],
                          "k": 2}).result(timeout=10)
    assert "error" in resp and "must be >= 0" in resp["error"]


def test_fold_in_implicit_group_splits_at_element_budget(served,
                                                         monkeypatch):
    """An implicit group whose padded (B, D, F) gather tensor exceeds
    the element budget splits into several engine calls — responses
    still correct per request."""
    daemon, engine, _, _ = served
    # Budget forces a split at ~2 rows of width-8 requests (F=4).
    monkeypatch.setattr(type(daemon), "_IFOLD_ELEMS", 2 * 8 * engine.F)
    reqs = [{"id": 300 + b, "op": "fold_in", "mode": "implicit",
             "items": [b % engine.n_items, (b + 1) % engine.n_items],
             "ratings": [1.0, 2.0], "alpha": 5.0, "reg": 0.3, "k": 2}
            for b in range(5)]
    futs = [daemon.submit(r) for r in reqs]
    n0 = daemon.n_batches
    processed = 0
    while processed < len(reqs):
        processed += daemon.process_once(block=False)
    assert daemon.n_batches == n0 + 1  # one GROUP (one batch stat)...
    for b, fut in enumerate(futs):
        resp = fut.result(timeout=60)
        assert "error" not in resp, resp
        # ...but each request's own rated items are still masked, which
        # fails if rows were misaligned across the split engine calls.
        assert not set(resp["items"]) & {b % engine.n_items,
                                         (b + 1) % engine.n_items}
        want_rows, want_ub = engine.fold_in_implicit(
            np.asarray([[b % engine.n_items, (b + 1) % engine.n_items]],
                       np.int32),
            np.asarray([[1.0, 2.0]], np.float32),
            np.ones((1, 2), bool), alpha=5.0, reg=0.3)
        scores, ids = engine.recommend(
            want_rows, want_ub,
            np.asarray([[b % engine.n_items, (b + 1) % engine.n_items]],
                       np.int32), np.ones((1, 2), bool), k=2)
        keep = np.asarray(scores[0]) > -1e30
        assert resp["items"] == [int(i) for i in np.asarray(ids[0])[keep]]

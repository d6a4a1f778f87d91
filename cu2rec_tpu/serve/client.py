"""Client for the serving daemon: pipelining + client-side auto-batching.

The daemon's measured ceiling gap (docs/RESULTS.md §drain-window) is pure
request granularity: single-row ``recommend`` requests pay JSON + queue +
dispatch per row (~2.2-2.4K req/s pooled through the tunneled runtime),
while the batch ``users`` op amortizes all of it (~7.7K users/s from ONE
client).  This module turns that docstring advice into an artifact: a
client that (a) keeps many requests in flight over one connection — the
daemon coalesces them into engine batches across the pipeline — and
(b) transparently merges single-user ``recommend`` calls into batch
``users`` requests, so callers keep the one-user-per-call API and still
ride the batch path.

    from cu2rec_tpu.serve.client import ServeClient

    with ServeClient(socket_path="/tmp/cu2rec.sock") as c:
        futs = [c.recommend(u, k=10) for u in range(10_000)]
        results = [f.result() for f in futs]          # auto-batched
        c.fold_in([3, 7], [5.0, 3.5], k=10).result()  # pass-through

Wire protocol: the JSONL request/response contract in serve/daemon.py
(the TPU-native replacement for the reference's process-per-user predict
binary, predict.cu:72-133).  Transport: a unix socket from
``cu2rec-serve --socket`` (or any connected read/write file pair).
"""

from __future__ import annotations

import itertools
import json
import socket as _socket
import threading
from concurrent.futures import Future


class _StripId:
    """Future adapter for resubmitted single-user requests: resolves the
    wrapped future with the response minus the wire ``id``, preserving
    recommend()'s bare per-row shape contract."""

    def __init__(self, fut: Future):
        self._fut = fut

    def set_result(self, resp):
        if isinstance(resp, dict):
            resp = {k: v for k, v in resp.items() if k != "id"}
        if not self._fut.done():
            self._fut.set_result(resp)

    def set_exception(self, e):
        if not self._fut.done():
            self._fut.set_exception(e)

    def done(self):
        return self._fut.done()

    def exception(self, timeout=None):
        # close() waits on in-flight entries via .exception()
        return self._fut.exception(timeout=timeout)


class ServeClient:
    """Pipelined JSONL client over one daemon connection.

    ``recommend`` buffers single-user requests and flushes them as one
    batch ``users`` request when ``batch_size`` accumulate, when
    ``flush_after_ms`` elapses since the first buffered user, or on an
    explicit ``flush()``; responses are fanned back out to the
    per-caller futures.  All other ops submit immediately.  Up to
    ``max_in_flight`` wire requests ride the connection concurrently
    (the daemon's per-connection writer returns responses in order; ids
    are matched, not assumed).
    """

    def __init__(self, socket_path: str | None = None, *,
                 infile=None, outfile=None,
                 batch_size: int = 256, flush_after_ms: float = 2.0,
                 max_in_flight: int = 64):
        if socket_path is not None:
            self._sock = _socket.socket(_socket.AF_UNIX,
                                        _socket.SOCK_STREAM)
            self._sock.connect(socket_path)
            self._rf = self._sock.makefile("r", encoding="utf-8")
            self._wf = self._sock.makefile("w", encoding="utf-8")
        else:
            if infile is None or outfile is None:
                raise ValueError("need socket_path or infile+outfile")
            self._sock = None
            self._rf, self._wf = infile, outfile
        self.batch_size = int(batch_size)
        self.flush_after_ms = float(flush_after_ms)
        self._ids = itertools.count(1)
        self._lock = threading.Lock()          # buffer + table state
        self._wlock = threading.Lock()         # serializes wire writes
        self._in_flight: dict[int, Future] = {}
        # rid -> (k, [(user, fut), ...]) for batch 'users' requests
        self._batch_fanout: dict[int, tuple] = {}
        self._buf: list[tuple[int, Future]] = []   # (user, fut)
        self._buf_k: int | None = None
        self._sem = threading.BoundedSemaphore(max_in_flight)
        self._closed = False
        self._flush_timer: threading.Timer | None = None
        self._reader = threading.Thread(target=self._read_loop,
                                        daemon=True,
                                        name="cu2rec-client-reader")
        self._reader.start()

    # -- public ops --------------------------------------------------------

    def recommend(self, user: int, k: int = 10) -> Future:
        """Top-k for a known user; auto-batched with concurrent calls.

        The future resolves to ``{"items": [...], "scores": [...]}`` (or
        ``{"error": ...}``).
        """
        fut: Future = Future()
        stale = full = None
        with self._lock:
            if self._closed:
                raise RuntimeError("client closed")
            if self._buf and self._buf_k != k:
                stale = self._take_buf_locked()  # k is a batch key
            self._buf_k = k
            self._buf.append((int(user), fut))
            if len(self._buf) >= self.batch_size:
                full = self._take_buf_locked()
            elif self._flush_timer is None:
                t = threading.Timer(self.flush_after_ms / 1e3, self.flush)
                t.daemon = True
                self._flush_timer = t
                t.start()
        # Sends happen OUTSIDE the state lock: _send can block on the
        # in-flight semaphore, which only the reader thread (which needs
        # the state lock) releases.
        if stale:
            self._send_batch(stale)
        if full:
            self._send_batch(full)
        return fut

    def recommend_many(self, users, k: int = 10) -> Future:
        """One explicit batch request; resolves to the raw batch
        response ``{"results": [...]}`` in input order."""
        return self._submit({"op": "recommend",
                             "users": [int(u) for u in users], "k": k})

    def fold_in(self, items, ratings, k: int = 10, *,
                iterations: int | None = None, mode: str | None = None,
                alpha: float | None = None,
                reg: float | None = None) -> Future:
        req = {"op": "fold_in", "items": [int(i) for i in items],
               "ratings": [float(r) for r in ratings], "k": k}
        if iterations is not None:
            req["iterations"] = int(iterations)
        if mode is not None:
            req["mode"] = mode
        if alpha is not None:
            req["alpha"] = float(alpha)
        if reg is not None:
            req["reg"] = float(reg)
        return self._submit(req)

    def stats(self) -> Future:
        return self._submit({"op": "stats"})

    def flush(self) -> None:
        """Send any buffered single-user recommends now."""
        with self._lock:
            batch = self._take_buf_locked()
        if batch:
            self._send_batch(batch)

    def close(self) -> None:
        self.flush()
        # Wait for everything in flight so no future is abandoned.
        waiting = []
        with self._lock:
            self._closed = True
            waiting = list(self._in_flight.values())
            for _k, members in self._batch_fanout.values():
                waiting.extend(f for _u, f in members)
        for f in waiting:
            try:
                f.exception(timeout=60.0)
            except Exception:
                pass
        if self._sock is not None:
            try:
                self._sock.shutdown(_socket.SHUT_WR)
            except OSError:
                pass
            self._reader.join(timeout=10.0)
            self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- internals ---------------------------------------------------------

    def _take_buf_locked(self):
        """Detach the recommend buffer (state lock held); returns
        ``(k, [(user, fut), ...])`` or None."""
        if self._flush_timer is not None:
            self._flush_timer.cancel()
            self._flush_timer = None
        if not self._buf:
            return None
        buf, self._buf = self._buf, []
        k, self._buf_k = self._buf_k, None
        return (k, buf)

    def _send_batch(self, batch) -> None:
        # Always the batch op, even for one user: every recommend()
        # future then resolves to the SAME bare per-row shape
        # ({"items": ..., "scores": ...}) regardless of how the flush
        # happened to group it.
        k, buf = batch
        fut: Future = Future()
        self._send({"op": "recommend", "users": [u for u, _ in buf],
                    "k": k}, fut, fans=(k, list(buf)))

    def _submit(self, req: dict) -> Future:
        fut: Future = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("client closed")
        self._send(req, fut)
        return fut

    def _send(self, req: dict, fut: Future, fans=None) -> int:
        """Write one request.  Blocks when max_in_flight wire requests
        are outstanding — backpressure, not unbounded queueing.  Must
        NOT be called with the state lock held (the semaphore is
        released by the reader thread, which takes that lock)."""
        rid = next(self._ids)
        req = dict(req, id=rid)
        self._sem.acquire()
        with self._lock:
            self._in_flight[rid] = fut
            if fans is not None:
                self._batch_fanout[rid] = fans
        try:
            with self._wlock:
                self._wf.write(json.dumps(req) + "\n")
                self._wf.flush()
        except Exception as e:
            with self._lock:
                self._in_flight.pop(rid, None)
                self._batch_fanout.pop(rid, None)
            self._sem.release()
            fut.set_exception(e)
            if fans:
                for _u, f in fans[1]:
                    f.set_exception(e)
        return rid

    def _read_loop(self) -> None:
        try:
            for line in self._rf:
                line = line.strip()
                if not line:
                    continue
                resp = json.loads(line)
                self._dispatch(resp)
        except Exception:
            pass
        # EOF / error: fail anything still outstanding.  Release one
        # semaphore permit per popped wire request — otherwise senders
        # (and close()'s flush) block forever in _sem.acquire() once the
        # connection dies with max_in_flight requests outstanding.
        with self._lock:
            leftovers = list(self._in_flight.values())
            self._in_flight.clear()
            fans = [f for _k, fs in self._batch_fanout.values()
                    for _u, f in fs]
            self._batch_fanout.clear()
            self._closed = True   # no more sends on a dead connection
        for _ in leftovers:
            try:
                self._sem.release()
            except ValueError:    # BoundedSemaphore over-release guard
                pass
        for f in leftovers + fans:
            if not f.done():
                f.set_exception(ConnectionError("daemon connection closed"))

    def _dispatch(self, resp: dict) -> None:
        rid = resp.get("id")
        with self._lock:
            fut = self._in_flight.pop(rid, None)
            fans = self._batch_fanout.pop(rid, None)
        if fut is None:
            return  # unknown id (daemon-side parse error rows carry None)
        self._sem.release()
        if fans is not None:
            k, members = fans
            results = resp.get("results")
            if results is None:
                # Whole-batch rejection (the daemon validates batch
                # 'users' requests wholesale): one bad id must not
                # poison co-batched callers — resubmit every member as
                # its own single-user request so each gets its own
                # verdict.  Resubmission happens OFF the reader thread:
                # _send can block on the in-flight semaphore, which only
                # this thread releases.
                fut.set_result(resp)
                threading.Thread(target=self._resubmit_singles,
                                 args=(k, members), daemon=True,
                                 name="cu2rec-client-resubmit").start()
                return
            for (_u, f), r in zip(members, results):
                f.set_result(r)
        fut.set_result(resp)

    def _resubmit_singles(self, k: int, members) -> None:
        for user, f in members:
            try:
                with self._lock:
                    dead = self._closed
                if dead:
                    raise ConnectionError("daemon connection closed")
                self._send({"op": "recommend", "user": int(user),
                            "k": k}, _StripId(f))
            except Exception as e:
                if not f.done():
                    f.set_exception(e)

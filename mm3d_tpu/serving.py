"""HTTP serving for exported StableHLO artifacts.

The deployment tail of the serving story (SURVEY.md §1 L3 is the
lineage's eval CLI; the lineage has no serving daemon at all):

    python test.py --model ... --log_dir <run> --export model.stablehlo
    python -m mm3d_tpu.serving --artifact model.stablehlo --port 8765

The daemon needs ONLY jax + numpy + the artifact — no flax, no model
code, no checkpoint tree (weights are constants inside the artifact).

Protocol (numpy ``.npz`` bodies — zero extra dependencies, exact dtypes):

* ``POST /predict`` — body: npz with one array per model input, keys
  ``arg0..argN`` (cls: ``arg0``=points [B,N,3]; partseg adds
  ``arg1``=one-hot labels; fusion: points/image/K/R/t).  Response: npz
  with ``log_probs``.  Any request batch size works: fixed-batch
  artifacts are padded/chunked server-side, batch-polymorphic artifacts
  (``--export_batch poly``) are called directly.
* ``GET /spec`` — the artifact's input signature + platforms (JSON).
* ``GET /healthz`` — liveness (JSON).
* ``GET /metrics`` — request/error/cloud counters + latency
  percentiles over the last 1024 requests (JSON).

`PredictionService` is the transport-free core (load, pad/chunk,
predict) for embedding into other servers.
"""

from __future__ import annotations

import io
import json
import threading
import time
from typing import List, Sequence

import numpy as np

import jax


class PredictionService:
    """Loads one serving artifact; `predict` accepts any batch size."""

    def __init__(self, artifact_path: str):
        from jax import export as jexport

        with open(artifact_path, "rb") as f:
            self.exported = jexport.deserialize(f.read())
        self._fn = jax.jit(self.exported.call)
        self.in_avals = tuple(self.exported.in_avals)
        # int for fixed-batch artifacts, a symbolic dim for poly ones
        lead = self.in_avals[0].shape[0]
        self.batch = lead if isinstance(lead, int) else None

    def warmup(self) -> None:
        """Compile the artifact before the first request (a cold TPU
        compile can take minutes through a remote-compile tunnel; pay it
        at startup, not on a client's clock).  Poly artifacts warm at
        batch 1 — other batch sizes still compile on first use."""
        b = self.batch or 1
        zeros = [np.zeros((b,) + tuple(a.shape[1:]), np.dtype(a.dtype))
                 for a in self.in_avals]
        np.asarray(self._fn(*zeros))

    def spec(self) -> dict:
        return {
            "platforms": list(self.exported.platforms),
            "batch": self.batch or "poly",
            "inputs": [{"name": f"arg{i}",
                        "shape": [d if isinstance(d, int) else str(d)
                                  for d in a.shape],
                        "dtype": str(np.dtype(a.dtype))}
                       for i, a in enumerate(self.in_avals)],
        }

    def _check(self, arrays: Sequence[np.ndarray]) -> None:
        if len(arrays) != len(self.in_avals):
            raise ValueError(f"expected {len(self.in_avals)} inputs "
                             f"(arg0..arg{len(self.in_avals) - 1}), "
                             f"got {len(arrays)}")
        b = arrays[0].shape[0] if arrays[0].ndim else -1
        for i, (x, a) in enumerate(zip(arrays, self.in_avals)):
            want = tuple(a.shape[1:])
            if x.ndim != len(a.shape) or tuple(x.shape[1:]) != want:
                raise ValueError(
                    f"arg{i}: expected shape [B, {', '.join(map(str, want))}]"
                    f", got {list(x.shape)}")
            if x.shape[0] != b:
                raise ValueError(f"arg{i}: batch {x.shape[0]} != arg0 "
                                 f"batch {b}")
        if b == 0:
            raise ValueError("empty batch")

    def predict(self, *arrays: np.ndarray) -> np.ndarray:
        """Run the artifact; pads/chunks to its fixed batch if needed."""
        # validate (incl. arity) BEFORE the dtype cast: the cast zips
        # with in_avals, which would silently truncate on wrong arity
        arrays = [np.asarray(x) for x in arrays]
        self._check(arrays)
        arrays = [x.astype(np.dtype(a.dtype), copy=False)
                  for x, a in zip(arrays, self.in_avals)]
        b = arrays[0].shape[0]
        if self.batch is None or b == self.batch:
            return np.asarray(self._fn(*arrays))
        outs: List[np.ndarray] = []
        for lo in range(0, b, self.batch):
            chunk = [x[lo:lo + self.batch] for x in arrays]
            got = chunk[0].shape[0]
            if got < self.batch:  # wrap-pad the remainder (rows discarded)
                chunk = [np.concatenate(
                    [c, np.repeat(c[:1], self.batch - got, axis=0)], 0)
                    for c in chunk]
            outs.append(np.asarray(self._fn(*chunk))[:got])
        return np.concatenate(outs, axis=0)


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


class _Metrics:
    """Thread-safe /predict counters + latency percentiles (last 1024)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.requests_total = 0
        self.errors_total = 0
        self.clouds_total = 0
        self._lat: List[float] = []

    def observe(self, ok: bool, batch: int, seconds: float) -> None:
        with self._lock:
            self.requests_total += 1
            if ok:
                self.clouds_total += batch
            else:
                self.errors_total += 1
            self._lat.append(seconds)
            if len(self._lat) > 1024:
                del self._lat[:-1024]

    def snapshot(self) -> dict:
        with self._lock:
            lat = sorted(self._lat)
            out = {"requests_total": self.requests_total,
                   "errors_total": self.errors_total,
                   "clouds_total": self.clouds_total}

        def pct(p):
            if not lat:
                return None
            return round(lat[min(len(lat) - 1, int(p * len(lat)))], 6)

        out["latency_s"] = {"p50": pct(0.50), "p90": pct(0.90),
                            "p99": pct(0.99)}
        return out


def make_server(service: PredictionService, host: str = "127.0.0.1",
                port: int = 0, quiet: bool = True,
                max_body_mb: float = 256.0):
    """Returns an unstarted ThreadingHTTPServer bound to (host, port);
    port 0 picks a free one (server.server_address[1]).  `max_body_mb`
    bounds /predict request bodies (413 beyond it) so one oversized npz
    can't OOM the host.  GET /metrics reports request/error/cloud
    counters and latency percentiles (`server.metrics` programmatically)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    metrics = _Metrics()
    max_body = int(max_body_mb * (1 << 20))

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/spec":
                self._json(200, service.spec())
            elif self.path == "/metrics":
                self._json(200, metrics.snapshot())
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._json(404, {"error": f"no route {self.path}"})
                return
            t0 = time.monotonic()

            def fail(code: int, msg: str):
                metrics.observe(False, 0, time.monotonic() - t0)
                self._json(code, {"error": msg})

            try:
                n = int(self.headers.get("Content-Length", "0"))
                if n < 0:
                    raise ValueError(f"bad Content-Length {n}")
            except ValueError as e:  # malformed/negative header -> 400
                fail(400, str(e) or "bad Content-Length")
                return
            if n > max_body:
                # never hold the oversized body in memory, but DO drain
                # it in small discarded chunks before responding — a
                # mid-upload close would surface to the client as a
                # connection reset instead of this 413 envelope
                left = n
                while left > 0:
                    got = self.rfile.read(min(left, 1 << 16))
                    if not got:
                        break
                    left -= len(got)
                fail(413, f"request body {n} B > limit {max_body} B")
                return
            try:
                data = np.load(io.BytesIO(self.rfile.read(n)),
                               allow_pickle=False)
                keys = sorted(data.files)
                want = [f"arg{i}" for i in range(len(service.in_avals))]
                # set-compare: lexicographic sort misorders arg10 vs arg2
                # once a model has >9 inputs
                if keys != sorted(want):
                    raise ValueError(f"npz keys {keys} != expected {want}")
                arrays = [data[k] for k in want]
            except Exception as e:  # malformed request (body/npz/keys)
                fail(400, str(e) or type(e).__name__)
                return
            try:
                log_probs = service.predict(*arrays)
            except ValueError as e:  # shape/batch validation
                fail(400, str(e))
                return
            except Exception as e:  # artifact/runtime failure
                fail(500, str(e) or type(e).__name__)
                return
            body = _npz_bytes(log_probs=log_probs)
            metrics.observe(True, int(arrays[0].shape[0]),
                            time.monotonic() - t0)
            self.send_response(200)
            self.send_header("Content-Type", "application/x-npz")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        if quiet:
            def log_message(self, *a):  # noqa: D102 - stdlib signature
                pass

    server = ThreadingHTTPServer((host, port), Handler)
    server.metrics = metrics
    return server


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="serve an exported mm3d_tpu StableHLO artifact")
    p.add_argument("--artifact", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--platform", default="auto",
                   help="jax platform to serve on (auto|cpu|tpu); 'auto' "
                        "keeps the process default.  Must be one of the "
                        "artifact's lowered platforms (see /spec).")
    p.add_argument("--no_warmup", action="store_true",
                   help="skip the startup compile; the first /predict "
                        "request pays it instead")
    p.add_argument("--max_body_mb", type=float, default=256.0,
                   help="reject /predict bodies over this size (413)")
    a = p.parse_args(argv)
    if a.platform != "auto":
        # Before backend init; overrides env/sitecustomize plugins.
        jax.config.update("jax_platforms", a.platform)
    # Persistent compile cache: a daemon restart must not re-pay the
    # warmup compile (minutes on a remote-compile TPU tunnel).  Entries
    # are keyed by platform, so the shared dir is safe across cpu/tpu.
    from mm3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    service = PredictionService(a.artifact)
    if not a.no_warmup:
        service.warmup()
    server = make_server(service, a.host, a.port, quiet=False,
                         max_body_mb=a.max_body_mb)
    print(f"serving {a.artifact} on http://{a.host}:"
          f"{server.server_address[1]}  spec={service.spec()}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()

"""Production TTS serving daemon: dynamic request batching + HTTP API.

The reference serves one utterance at a time from a CLI
(SURVEY.md section 3.3 ``Inference.py``); a production TPU deployment
wants CONCURRENT requests coalesced into the Synthesizer's pow2-bucketed
batches — the chip decodes a 64-row batch for nearly the price of one
utterance (PROFILE.md "Synthesis batch scaling"), so batching is the whole
serving game. This module adds what the reference never had:

- :class:`DynamicBatcher` — a background worker that drains a request
  queue into batches (up to ``max_batch`` rows or ``max_wait_ms``,
  whichever first) and fans results back out to per-request futures.
  Latency cost of batching = the wait window + the marginal decode cost
  of sharing a bucket; both are measured and exposed.
- :class:`SpeakerRegistry` — named speaker embeddings, enrolled at boot
  (``-enroll name=wav``) or live over HTTP, so requests reference
  speakers by name instead of shipping embeddings.
- A stdlib-only HTTP front-end (``ThreadingHTTPServer``): POST
  ``/synthesize`` (JSON in, WAV out), POST ``/enroll``, GET
  ``/speakers`` / ``/stats`` / ``/healthz``. No web framework — the
  environment ships none, and none is needed.

Device work is serialized through one lock: JAX dispatch is thread-safe,
but serializing keeps the Synthesizer's compiled-program caches free of
duplicate-compile races and makes latency accounting honest (one program
on the chip at a time mirrors how a single-chip server actually runs).

CLI::

    python -m multi_speaker_tts_tpu.serve -checkpoint demo/serving_ckpt.msgpack \
        -enroll spk0=demo/enroll_spk0_utt0.wav -port 8000 -warmup
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import queue
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from multi_speaker_tts_tpu.audio import wav_io
from multi_speaker_tts_tpu.inference import Synthesizer


# ---------------------------------------------------------------------------
# Stats


class ServingStats:
    """Thread-safe serving counters: request latencies (bounded window),
    batch-size histogram, error count. ``snapshot()`` feeds ``/stats``."""

    def __init__(self, window: int = 2048):
        self._lock = threading.Lock()
        self._latencies_ms: deque = deque(maxlen=window)
        self.batch_sizes: dict[int, int] = {}
        self.requests = 0
        self.errors = 0

    def record_request(self, latency_ms: float) -> None:
        with self._lock:
            self.requests += 1
            self._latencies_ms.append(latency_ms)

    def record_batch(self, size: int) -> None:
        with self._lock:
            self.batch_sizes[size] = self.batch_sizes.get(size, 0) + 1

    def record_error(self) -> None:
        with self._lock:
            self.errors += 1

    def snapshot(self) -> dict:
        with self._lock:
            lat = np.asarray(self._latencies_ms, np.float64)
            out = {
                "requests": self.requests,
                "errors": self.errors,
                "batch_size_histogram": dict(sorted(self.batch_sizes.items())),
            }
            if lat.size:
                out["latency_ms"] = {
                    "p50": round(float(np.percentile(lat, 50)), 2),
                    "p95": round(float(np.percentile(lat, 95)), 2),
                    "p99": round(float(np.percentile(lat, 99)), 2),
                    "mean": round(float(lat.mean()), 2),
                    "window": int(lat.size),
                }
            return out


# ---------------------------------------------------------------------------
# Dynamic batching


@dataclass
class _Pending:
    text: str
    speaker_embedding: np.ndarray | None
    speaker_id: int | None
    max_steps: int | None
    done: threading.Event = field(default_factory=threading.Event)
    result: dict | None = None
    error: Exception | None = None
    enqueued_at: float = field(default_factory=time.perf_counter)


class DynamicBatcher:
    """Coalesces concurrent synthesis requests into Synthesizer batches.

    A single worker thread drains the queue: the first request opens a
    batch window; further requests join until ``max_batch`` rows are
    collected or ``max_wait_ms`` elapses. The batch then runs ONE
    ``Synthesizer.synthesize`` call (pow2 batch/token/decode buckets +
    stop-aware early exit do the rest) and each request's future is
    resolved with its own row. Requests may carry different speakers and
    lengths — every pipeline op is row-independent.

    ``synth_kwargs`` are passed through to ``synthesize`` (e.g.
    ``pcm16=True, return_linear=False`` for a wav-serving deployment).
    """

    def __init__(
        self,
        synth: Synthesizer,
        max_batch: int = 32,
        max_wait_ms: float = 15.0,
        stats: ServingStats | None = None,
        device_lock: threading.Lock | None = None,
        **synth_kwargs,
    ):
        self.synth = synth
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.stats = stats or ServingStats()
        self.device_lock = device_lock or threading.Lock()
        self.synth_kwargs = dict(synth_kwargs)
        self.synth_kwargs.setdefault("return_linear", False)
        self._queue: queue.Queue = queue.Queue()
        self._closed = threading.Event()
        self._worker = threading.Thread(
            target=self._run, name="tts-batcher", daemon=True
        )
        self._worker.start()

    # -- client side ---------------------------------------------------------
    def submit(
        self,
        text: str,
        speaker_embedding: np.ndarray | None = None,
        speaker_id: int | None = None,
        max_steps: int | None = None,
        timeout: float | None = 120.0,
    ) -> dict:
        """Enqueue one utterance and block until its row is synthesized.

        Returns the per-utterance dict from ``Synthesizer.synthesize``
        (wav, mel, alignment, mel_length). Raises the batch's exception if
        synthesis failed, TimeoutError if the deadline passes."""
        if self._closed.is_set():
            raise RuntimeError("batcher is closed")
        req = _Pending(
            text=text,
            speaker_embedding=(
                None if speaker_embedding is None
                else np.asarray(speaker_embedding, np.float32)
            ),
            speaker_id=speaker_id,
            max_steps=max_steps,
        )
        self._queue.put(req)
        if not req.done.wait(timeout):
            raise TimeoutError(f"synthesis timed out after {timeout}s")
        if req.error is not None:
            raise req.error
        self.stats.record_request(
            (time.perf_counter() - req.enqueued_at) * 1e3
        )
        return req.result

    def close(self) -> None:
        self._closed.set()
        self._queue.put(None)  # wake the worker
        self._worker.join(timeout=10.0)

    # -- worker side ---------------------------------------------------------
    def _collect(self) -> list[_Pending]:
        """Block for the first request, then drain until max_batch rows or
        the wait window closes."""
        first = self._queue.get()
        if first is None:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            batch.append(nxt)
        return batch

    def _run(self) -> None:
        while not self._closed.is_set():
            batch = self._collect()
            if not batch:
                continue
            self.stats.record_batch(len(batch))
            try:
                self._synthesize_batch(batch)
            except Exception as exc:  # resolve every future, never wedge
                self.stats.record_error()
                for req in batch:
                    req.error = exc
                    req.done.set()

    def _synthesize_batch(self, batch: list[_Pending]) -> None:
        texts = [r.text for r in batch]
        spk = None
        if any(r.speaker_embedding is not None for r in batch):
            missing = [r.text for r in batch if r.speaker_embedding is None]
            if missing:
                raise ValueError(
                    f"batch mixes embedded and embedding-less requests: {missing}"
                )
            spk = np.stack([r.speaker_embedding for r in batch])
        ids = None
        if any(r.speaker_id is not None for r in batch):
            if spk is not None:
                raise ValueError(
                    "batch mixes speaker embeddings and speaker ids"
                )
            ids = [r.speaker_id if r.speaker_id is not None else 0
                   for r in batch]
        # One decode bucket per batch: the largest explicit cap, or
        # auto-bucketing from the longest text when none is set.
        caps = [r.max_steps for r in batch if r.max_steps is not None]
        max_steps = max(caps) if len(caps) == len(batch) else None
        with self.device_lock:
            results = self.synth.synthesize(
                texts, spk, max_steps=max_steps, speaker_ids=ids,
                **self.synth_kwargs,
            )
        for req, res in zip(batch, results):
            req.result = res
            req.done.set()


# ---------------------------------------------------------------------------
# Speaker registry


class SpeakerRegistry:
    """Named speaker embeddings: enroll once, synthesize by name."""

    def __init__(self, synth: Synthesizer,
                 device_lock: threading.Lock | None = None):
        self.synth = synth
        self.device_lock = device_lock or threading.Lock()
        self._lock = threading.Lock()
        self._speakers: dict[str, np.ndarray] = {}

    def enroll(self, name: str, wavs) -> np.ndarray:
        with self.device_lock:
            emb = self.synth.enroll(wavs)
        with self._lock:
            self._speakers[name] = emb
        return emb

    def get(self, name: str) -> np.ndarray | None:
        with self._lock:
            return self._speakers.get(name)

    def names(self) -> list[str]:
        with self._lock:
            return sorted(self._speakers)


# ---------------------------------------------------------------------------
# HTTP front-end


class TTSServer:
    """Owns the Synthesizer, batcher, registry, and the HTTP server."""

    def __init__(
        self,
        synth: Synthesizer,
        host: str = "127.0.0.1",
        port: int = 8000,
        max_batch: int = 32,
        max_wait_ms: float = 15.0,
        **synth_kwargs,
    ):
        self.synth = synth
        self.stats = ServingStats()
        self.device_lock = threading.Lock()
        self.batcher = DynamicBatcher(
            synth, max_batch=max_batch, max_wait_ms=max_wait_ms,
            stats=self.stats, device_lock=self.device_lock, **synth_kwargs,
        )
        self.registry = SpeakerRegistry(synth, device_lock=self.device_lock)
        handler = _make_handler(self)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.httpd.daemon_threads = True

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def serve_forever(self) -> None:
        print(f"serving on http://{self.httpd.server_address[0]}:{self.port}")
        self.httpd.serve_forever()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(
            target=self.httpd.serve_forever, name="tts-http", daemon=True
        )
        t.start()
        return t

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        self.batcher.close()

    def warmup(self, text: str = "warmup", speaker: np.ndarray | None = None,
               speaker_id: int | None = None) -> None:
        """Pre-compile the serving programs for the common request shape so
        the first real request doesn't pay the cold compile (~minutes on a
        remote TPU)."""
        t0 = time.perf_counter()
        self.batcher.submit(text, speaker, speaker_id=speaker_id)
        print(f"warmup compile+run: {time.perf_counter() - t0:.1f}s")

    # -- request handlers (called from HTTP threads) --------------------------
    def handle_synthesize(self, payload: dict, accept: str) -> tuple:
        text = payload.get("text")
        if not isinstance(text, str) or not text.strip():
            return 400, "application/json", _jerr("missing or empty 'text'")
        spk = None
        speaker_id = payload.get("speaker_id")
        name = payload.get("speaker")
        if name is not None:
            spk = self.registry.get(str(name))
            if spk is None:
                return 400, "application/json", _jerr(
                    f"unknown speaker {name!r}; enrolled: {self.registry.names()}"
                )
        elif payload.get("speaker_embedding") is not None:
            spk = np.asarray(payload["speaker_embedding"], np.float32)
        if (spk is None and speaker_id is None
                and self.synth.models.tacotron.speaker_embedding_size):
            return 400, "application/json", _jerr(
                "model is speaker-conditioned: pass 'speaker' (an enrolled "
                "name), 'speaker_embedding' (floats), or 'speaker_id'"
            )
        max_steps = payload.get("max_steps")
        try:
            item = self.batcher.submit(
                text, spk, speaker_id=speaker_id,
                max_steps=None if max_steps is None else int(max_steps),
            )
        except Exception as exc:
            self.stats.record_error()
            return 500, "application/json", _jerr(f"synthesis failed: {exc}")

        sr = self.synth.dsp_cfg.sample_rate
        wav_bytes = _wav_bytes(item["wav"], sr)
        if "audio/wav" in (accept or ""):
            return 200, "audio/wav", wav_bytes
        body = json.dumps({
            "sample_rate": sr,
            "mel_length": int(item["mel_length"]),
            "duration_s": round(len(item["wav"]) / sr, 3),
            "wav_b64": base64.b64encode(wav_bytes).decode("ascii"),
        }).encode()
        return 200, "application/json", body

    def handle_enroll(self, name: str, body: bytes) -> tuple:
        if not name:
            return 400, "application/json", _jerr("pass ?name=<speaker>")
        try:
            wav, _ = wav_io.load_wav(
                io.BytesIO(body), target_sr=self.synth.hp.Sound.Sample_Rate
            )
        except Exception as exc:
            return 400, "application/json", _jerr(f"bad wav body: {exc}")
        self.registry.enroll(name, [wav])
        return 200, "application/json", json.dumps(
            {"ok": True, "name": name, "n_samples": int(len(wav))}
        ).encode()

    def handle_stats(self) -> tuple:
        snap = self.stats.snapshot()
        snap["compiled_programs"] = len(self.synth.compile_counts)
        snap["speakers"] = self.registry.names()
        return 200, "application/json", json.dumps(snap).encode()


def _jerr(msg: str) -> bytes:
    return json.dumps({"error": msg}).encode()


def _wav_bytes(wav: np.ndarray, sample_rate: int) -> bytes:
    buf = io.BytesIO()
    wav_io.save_wav(buf, wav, sample_rate)
    return buf.getvalue()


def _make_handler(server: TTSServer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, status: int, ctype: str, body: bytes) -> None:
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                self._reply(200, "application/json", b'{"ok": true}')
            elif path == "/stats":
                self._reply(*server.handle_stats())
            elif path == "/speakers":
                self._reply(200, "application/json",
                            json.dumps(server.registry.names()).encode())
            else:
                self._reply(404, "application/json", _jerr("not found"))

        def do_POST(self):
            parsed = urlparse(self.path)
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n) if n else b""
            if parsed.path == "/synthesize":
                try:
                    payload = json.loads(body or b"{}")
                except json.JSONDecodeError as exc:
                    self._reply(400, "application/json",
                                _jerr(f"bad json: {exc}"))
                    return
                self._reply(*server.handle_synthesize(
                    payload, self.headers.get("Accept", "")
                ))
            elif parsed.path == "/enroll":
                q = parse_qs(parsed.query)
                name = (q.get("name") or [""])[0]
                self._reply(*server.handle_enroll(name, body))
            else:
                self._reply(404, "application/json", _jerr("not found"))

    return Handler


# ---------------------------------------------------------------------------
# CLI


def main() -> None:
    from multi_speaker_tts_tpu.hparams import load_hyper_parameters
    from multi_speaker_tts_tpu.inference import _enable_compilation_cache

    _enable_compilation_cache()
    parser = argparse.ArgumentParser(description="TTS serving daemon")
    parser.add_argument("-checkpoint", required=True,
                        help=".msgpack compact checkpoint or Orbax dir")
    parser.add_argument("-hp", "--hyper_parameters", default=None)
    parser.add_argument("-host", default="127.0.0.1")
    parser.add_argument("-port", type=int, default=8000)
    parser.add_argument("-max_batch", type=int, default=32)
    parser.add_argument("-max_wait_ms", type=float, default=15.0)
    parser.add_argument("-enroll", action="append", default=[],
                        metavar="NAME=WAV",
                        help="enroll a named speaker at boot (repeatable)")
    parser.add_argument("-pcm16", action="store_true",
                        help="convert waveforms to int16 on device")
    parser.add_argument("-warmup", action="store_true",
                        help="pre-compile the serving programs before "
                             "accepting traffic")
    parser.add_argument("-quantize", default=None, choices=["int8"],
                        help="weight-only quantization for the AR decode "
                             "loop (serving speed knob)")
    args = parser.parse_args()

    hp = (load_hyper_parameters(args.hyper_parameters)
          if args.hyper_parameters else None)
    if args.checkpoint.endswith(".msgpack"):
        synth = Synthesizer.from_compact(args.checkpoint, hp=hp,
                                         quantize=args.quantize)
    else:
        synth = Synthesizer.from_checkpoint(args.checkpoint, hp=hp,
                                            quantize=args.quantize)

    server = TTSServer(
        synth, host=args.host, port=args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        pcm16=args.pcm16,
    )
    for spec in args.enroll:
        name, _, path = spec.partition("=")
        if not path:
            parser.error(f"-enroll expects NAME=WAV, got {spec!r}")
        server.registry.enroll(name, [path])
        print(f"enrolled speaker {name!r} from {path}")

    if args.warmup:
        names = server.registry.names()
        spk = server.registry.get(names[0]) if names else None
        sid = 0 if (spk is None
                    and synth.models.speaker_lut is not None) else None
        server.warmup(speaker=spk, speaker_id=sid)

    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()


if __name__ == "__main__":
    main()

"""Serving daemon tests: dynamic batching semantics + the HTTP API.

Runs the tiny-config model on the CPU mesh like the other API tests; the
vocoder exercises the GEMM fallback at max_steps=16 so each request stays
cheap. Coalescing is made deterministic with a generous wait window and
simultaneous submissions from worker threads."""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from multi_speaker_tts_tpu.data import (
    BucketBatcher,
    PatternDataset,
    generate_synthetic_dataset,
)
from multi_speaker_tts_tpu.serve import DynamicBatcher, ServingStats, TTSServer
from multi_speaker_tts_tpu.train import trainer as trainer_lib


@pytest.fixture(scope="module")
def setup(tiny_hp, tmp_path_factory):
    from multi_speaker_tts_tpu.inference import Synthesizer

    root = tmp_path_factory.mktemp("serve")
    generate_synthetic_dataset(tiny_hp, root, n_speakers=2, n_utterances=2)
    batcher = BucketBatcher(
        PatternDataset(root / "patterns"),
        batch_size=4,
        token_buckets=list(tiny_hp.Train.Batch_Bucketing.Token_Buckets),
        mel_buckets=list(tiny_hp.Train.Batch_Bucketing.Mel_Buckets),
        mel_dim=tiny_hp.Sound.Mel_Dim,
        ref_window=tiny_hp.Speaker_Embedding.GE2E.Window_Length,
        spect_dim=tiny_hp.Sound.Spectrogram_Dim,
        shuffle=False,
    )
    batch = next(iter(batcher))[1]
    models = trainer_lib.build_models(tiny_hp)
    state = trainer_lib.init_state(tiny_hp, models, jax.random.PRNGKey(0), batch)
    synth = Synthesizer.from_state(tiny_hp, state)
    spk = synth.enroll(
        [np.random.default_rng(0).normal(size=8000).astype(np.float32)]
    )
    return synth, spk, root


def test_batcher_coalesces_concurrent_requests(setup):
    """Simultaneous submissions land in ONE synthesize call (the batch-size
    histogram shows a row count > 1) and every request gets its own row."""
    synth, spk, _ = setup
    stats = ServingStats()
    b = DynamicBatcher(synth, max_batch=8, max_wait_ms=400.0, stats=stats,
                       vocode=False)
    try:
        texts = ["one", "two two", "three three three", "four"]
        results: dict = {}
        errors: list = []

        def worker(t):
            try:
                results[t] = b.submit(t, spk, max_steps=16)
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        threads = [threading.Thread(target=worker, args=(t,)) for t in texts]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors
        assert set(results) == set(texts)
        for t, item in results.items():
            assert item["mel"].shape[0] == item["mel_length"] >= 1
            assert np.isfinite(item["mel"]).all()
        assert max(stats.batch_sizes) > 1, (
            f"requests never coalesced: {stats.batch_sizes}"
        )
        snap = stats.snapshot()
        assert snap["requests"] == 4 and "latency_ms" in snap
    finally:
        b.close()


def test_batcher_single_request_and_close(setup):
    synth, spk, _ = setup
    b = DynamicBatcher(synth, max_batch=4, max_wait_ms=1.0, vocode=False)
    try:
        item = b.submit("hello", spk, max_steps=16)
        assert item["mel_length"] >= 1
    finally:
        b.close()
    with pytest.raises(RuntimeError):
        b.submit("after close", spk)


def test_batcher_propagates_errors(setup):
    """A failing batch resolves every waiter with the exception instead of
    wedging the queue (here: a speaker-conditioned model with no
    embedding)."""
    synth, _, _ = setup
    b = DynamicBatcher(synth, max_batch=4, max_wait_ms=1.0, vocode=False)
    try:
        with pytest.raises(Exception):
            b.submit("no speaker", None, max_steps=16)
        # The worker survives the failure: a good request still serves.
        spk = np.zeros((synth.hp.Speaker_Embedding.Embedding_Size,), np.float32)
        spk[0] = 1.0
        assert b.submit("ok", spk, max_steps=16)["mel_length"] >= 1
    finally:
        b.close()


@pytest.fixture(scope="module")
def server(setup):
    synth, spk, root = setup
    srv = TTSServer(synth, host="127.0.0.1", port=0, max_batch=4,
                    max_wait_ms=5.0, vocode=True)
    srv.registry.enroll("spk0", [str(root / "wavs" / "spk0_utt0.wav")])
    srv.start_background()
    yield srv
    srv.shutdown()


def _post(url: str, payload: dict | bytes, accept: str = "") -> tuple:
    data = payload if isinstance(payload, bytes) else json.dumps(payload).encode()
    req = urllib.request.Request(url, data=data, method="POST")
    if accept:
        req.add_header("Accept", accept)
    try:
        with urllib.request.urlopen(req, timeout=300) as resp:
            return resp.status, resp.headers.get("Content-Type"), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def test_http_synthesize_json(server):
    base = f"http://127.0.0.1:{server.port}"
    status, ctype, body = _post(
        f"{base}/synthesize",
        {"text": "hello world", "speaker": "spk0", "max_steps": 16},
    )
    assert status == 200 and ctype == "application/json"
    out = json.loads(body)
    assert out["mel_length"] >= 1
    assert out["sample_rate"] == server.synth.dsp_cfg.sample_rate
    wav_bytes = base64.b64decode(out["wav_b64"])
    from multi_speaker_tts_tpu.audio import wav_io

    wav, sr = wav_io.load_wav(io.BytesIO(wav_bytes))
    assert sr == out["sample_rate"]
    assert len(wav) == max(out["mel_length"] - 1, 1) * server.synth.dsp_cfg.hop


def test_http_synthesize_raw_wav(server):
    base = f"http://127.0.0.1:{server.port}"
    status, ctype, body = _post(
        f"{base}/synthesize",
        {"text": "raw please", "speaker": "spk0", "max_steps": 16},
        accept="audio/wav",
    )
    assert status == 200 and ctype == "audio/wav"
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"


def test_http_synthesize_errors(server):
    base = f"http://127.0.0.1:{server.port}"
    status, _, body = _post(f"{base}/synthesize", {"speaker": "spk0"})
    assert status == 400 and b"text" in body
    status, _, body = _post(
        f"{base}/synthesize", {"text": "x", "speaker": "nobody"}
    )
    assert status == 400 and b"unknown speaker" in body
    status, _, body = _post(f"{base}/synthesize", {"text": "x"})
    assert status == 400 and b"speaker-conditioned" in body
    status, _, _ = _post(f"{base}/synthesize", b"{not json")
    assert status == 400


def test_http_enroll_and_list(server, setup):
    _, _, root = setup
    base = f"http://127.0.0.1:{server.port}"
    wav_bytes = (root / "wavs" / "spk1_utt0.wav").read_bytes()
    status, _, body = _post(f"{base}/enroll?name=newspk", wav_bytes)
    assert status == 200 and json.loads(body)["ok"]
    with urllib.request.urlopen(f"{base}/speakers", timeout=30) as resp:
        names = json.loads(resp.read())
    assert "newspk" in names and "spk0" in names
    status, _, _ = _post(
        f"{base}/synthesize",
        {"text": "new speaker", "speaker": "newspk", "max_steps": 16},
    )
    assert status == 200


def test_http_health_and_stats(server):
    base = f"http://127.0.0.1:{server.port}"
    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as resp:
        assert json.loads(resp.read())["ok"]
    with urllib.request.urlopen(f"{base}/stats", timeout=30) as resp:
        snap = json.loads(resp.read())
    assert snap["requests"] >= 1
    assert snap["compiled_programs"] >= 1
    assert "spk0" in snap["speakers"]
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(f"{base}/nope", timeout=30)


def test_bad_request_fails_alone_in_concurrent_window(setup):
    """One malformed request (wrong embedding shape / non-string text)
    raises in ITS caller at submit time; the co-batched good requests in
    the same wait window all succeed (VERDICT r3 item 6)."""
    synth, spk, _ = setup
    stats = ServingStats()
    b = DynamicBatcher(synth, max_batch=8, max_wait_ms=400.0, stats=stats,
                       vocode=False)
    try:
        good_texts = ["alpha", "beta beta", "gamma gamma gamma"]
        results: dict = {}
        failures: dict = {}

        def good(t):
            results[t] = b.submit(t, spk, max_steps=16)

        def bad_shape():
            try:
                b.submit("bad shape", np.zeros((3,), np.float32),
                         max_steps=16)
            except Exception as exc:
                failures["shape"] = exc

        def bad_text():
            try:
                b.submit(12345, spk, max_steps=16)  # non-string text
            except Exception as exc:
                failures["text"] = exc

        threads = [threading.Thread(target=good, args=(t,))
                   for t in good_texts]
        threads += [threading.Thread(target=bad_shape),
                    threading.Thread(target=bad_text)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        # Both bad requests failed, in their own callers...
        assert isinstance(failures.get("shape"), ValueError)
        assert "text" in failures
        # ...and every good request synthesized.
        assert set(results) == set(good_texts)
        for item in results.values():
            assert item["mel_length"] >= 1
            assert np.isfinite(item["mel"]).all()
    finally:
        b.close()


def test_missing_speaker_fails_at_submit(setup):
    """A conditioned model with neither embedding nor id raises at submit
    (ValueError), never reaching a batch."""
    synth, _, _ = setup
    b = DynamicBatcher(synth, max_batch=4, max_wait_ms=1.0, vocode=False)
    try:
        with pytest.raises(ValueError, match="speaker-conditioned"):
            b.submit("no speaker", None, max_steps=16)
    finally:
        b.close()


def _read_chunked(sock) -> tuple[list, bytes]:
    """Parse an HTTP/1.1 chunked response off a raw socket; returns the
    list of chunk payloads (proving incremental delivery: each chunk was
    framed and flushed before the terminal 0-chunk) and the header
    block."""
    buf = b""
    while b"\r\n\r\n" not in buf:
        data = sock.recv(65536)
        assert data, "connection closed before headers"
        buf += data
    headers, buf = buf.split(b"\r\n\r\n", 1)
    if b"Transfer-Encoding: chunked" not in headers:
        # Error reply (Content-Length body): surface it instead of
        # waiting for chunk frames that will never come.
        n = 0
        for line in headers.split(b"\r\n"):
            if line.lower().startswith(b"content-length:"):
                n = int(line.split(b":")[1])
        while len(buf) < n:
            data = sock.recv(65536)
            if not data:
                break
            buf += data
        raise AssertionError(f"non-chunked reply: {headers!r} body {buf!r}")

    def need(n):
        nonlocal buf
        while len(buf) < n:
            data = sock.recv(65536)
            assert data, "connection closed mid-chunk"
            buf += data

    chunks = []
    while True:
        while b"\r\n" not in buf:
            need(len(buf) + 1)
        size_line, buf = buf.split(b"\r\n", 1)
        size = int(size_line.split(b";")[0], 16)
        if size == 0:
            break
        need(size + 2)
        chunks.append(buf[:size])
        buf = buf[size + 2:]
    return chunks, headers


@pytest.fixture(scope="module")
def stream_server(setup):
    """A server over a NO-STOP synthesizer (threshold > 1): the tiny
    random-weight model stops at frame 1, which would trim every chunk
    past the first to zero bytes; disabling the stop makes the chunk
    cadence deterministic for the incremental-delivery assertions."""
    from multi_speaker_tts_tpu.inference import Synthesizer

    synth, spk, _ = setup
    hp2 = synth.hp.replace(Decoder={"Stop_Threshold": 1.5})
    synth2 = Synthesizer(hp2, synth.params, synth.batch_stats)
    srv = TTSServer(synth2, host="127.0.0.1", port=0, max_batch=4,
                    max_wait_ms=5.0, vocode=True)
    srv.registry.register("spk0", spk)
    srv.start_background()
    yield srv
    srv.shutdown()


def test_http_stream_chunked(stream_server):
    """POST /stream delivers audio over chunked transfer encoding: a
    streaming WAV header plus >= 2 incrementally framed PCM chunks before
    the response completes (VERDICT r3 item 4), and the PCM equals the
    Synthesizer.stream output trimmed to the decoded length."""
    import socket

    server = stream_server
    synth = server.synth
    payload = json.dumps({
        "text": "stream me some audio please",
        "speaker": "spk0", "max_steps": 16, "segment_steps": 12,
    }).encode()
    with socket.create_connection(("127.0.0.1", server.port),
                                  timeout=300) as sock:
        sock.sendall(
            b"POST /stream HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: application/json\r\n"
            b"Content-Length: %d\r\n\r\n%s" % (len(payload), payload)
        )
        chunks, headers = _read_chunked(sock)
    assert b"200" in headers.split(b"\r\n")[0]
    assert b"Transfer-Encoding: chunked" in headers
    assert chunks[0][:4] == b"RIFF" and chunks[0][8:12] == b"WAVE"
    audio_chunks = chunks[1:]
    assert len(audio_chunks) >= 2, (
        f"expected incremental delivery, got {len(audio_chunks)} audio "
        f"chunks of sizes {[len(c) for c in chunks]}"
    )
    got = np.frombuffer(b"".join(audio_chunks), "<i2")

    # Parity: the same utterance through Synthesizer.stream directly.
    spk = server.registry.get("spk0")
    want = []
    final_len = 0
    for item in synth.stream(["stream me some audio please"], spk,
                             max_steps=16, segment_steps=12, pcm16=True):
        want.append(np.asarray(item["wav_chunk"][0]))
        final_len = int(item["mel_lengths"][0])
    want = np.concatenate(want)[: final_len * synth.dsp_cfg.hop]
    np.testing.assert_array_equal(got, want)


def test_http_stream_errors(server):
    base = f"http://127.0.0.1:{server.port}"
    status, _, body = _post(f"{base}/stream", {"text": "x", "speaker": "nobody"})
    assert status == 400 and b"unknown speaker" in body
    status, _, body = _post(f"{base}/stream", {"speaker": "spk0"})
    assert status == 400 and b"text" in body

"""Parity tests for the resident-weight AR decode segment kernel
(ops/decode_pallas.py) against the XLA int8 segment
(ops/decoder_scan.decoder_ar_segment with fused=quantize_fused) — same
quantization scheme, same attention math, dropout 0 for determinism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_speaker_tts_tpu.ops import decode_pallas as dkp
from multi_speaker_tts_tpu.ops import decoder_scan as dscan
from multi_speaker_tts_tpu.ops.lstm import LSTMParams

H, D, P, A, S, MEL, R, B, K = 128, 128, 128, 64, 24, 16, 2, 3, 8
CONV_K, CONV_C = 7, 8


def _params(rng):
    def w(*shape, scale=0.15):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    cellp = dscan.DecoderScanParams(
        lstm=(
            LSTMParams(w_ih=w(P + D, 4 * H), w_hh=w(H, 4 * H), b=w(4 * H)),
            LSTMParams(w_ih=w(H + D, 4 * H), w_hh=w(H, 4 * H), b=w(4 * H)),
        ),
        attention=dscan.AttentionParams(
            wq=w(H, A), conv_kernel=w(CONV_K, 2, CONV_C),
            wloc=w(CONV_C, A), v=w(A, 1),
        ),
    )
    prenet_ws = [(w(MEL, P), w(P)), ((w(P, P)), w(P))]
    frame_w = (w(H + D, MEL * R), w(MEL * R))
    stop_w = (w(H + D, 1), w(1))
    return cellp, prenet_ws, frame_w, stop_w


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    cellp, prenet_ws, frame_w, stop_w = _params(rng)
    keys = jnp.asarray(rng.standard_normal((B, S, A)) * 0.3, jnp.float32)
    memory = jnp.asarray(rng.standard_normal((B, S, D)) * 0.3, jnp.float32)
    mask = jnp.asarray(
        np.arange(S)[None, :] < np.array([S, S - 5, 7])[:, None], jnp.float32
    )
    return cellp, prenet_ws, frame_w, stop_w, keys, memory, mask


def _run_ref(setup, carry, prev, t0, stopped, lengths, threshold=0.5):
    cellp, prenet_ws, frame_w, stop_w, keys, memory, mask = setup

    def prenet_fn(frame, rngkey):
        x = frame
        for wgt, b in prenet_ws:
            x = jnp.maximum(jnp.dot(x, wgt) + b, 0.0)
        return x

    def project_fn(x):
        frames = jnp.dot(x, frame_w[0]) + frame_w[1]
        stop = (jnp.dot(x, stop_w[0]) + stop_w[1])[..., 0]
        return frames, stop

    return dscan.decoder_ar_segment(
        cellp, prenet_fn, project_fn, keys, memory, mask,
        carry, prev, t0, stopped, lengths, K, threshold,
        jax.random.PRNGKey(9), MEL, jnp.float32,
        fused=dscan.quantize_fused(cellp),
    )


def _run_pallas(setup, carry, prev, t0, stopped, lengths, threshold=0.5,
                k=K):
    cellp, prenet_ws, frame_w, stop_w, keys, memory, mask = setup
    bundle = dkp.prepare_bundle(cellp, prenet_ws, frame_w, stop_w, MEL, R)
    return dkp.decoder_ar_segment_pallas(
        bundle, keys, memory, mask, carry, prev, t0, stopped, lengths,
        k, threshold, jax.random.PRNGKey(9), MEL, R,
        prenet_dropout=0.0, interpret=True,
    )


def test_single_step_parity_tight(setup):
    """One step from the zero state: the int8 quanta are decided by
    IDENTICAL inputs on both sides, so only f32 reduction-order noise
    remains (~1e-6). Multi-step runs diverge more because epsilon
    differences flip activation-quantization rounding (see below)."""
    _, _, _, _, keys, memory, mask = setup
    carry0 = dscan.initial_carry(B, memory, 2, H)
    prev0 = jnp.zeros((B, MEL), jnp.float32)
    stopped0 = jnp.zeros((B,), bool)
    lengths0 = jnp.zeros((B,), jnp.int32)

    cellp, prenet_ws, frame_w, stop_w, keys, memory, mask = setup

    def prenet_fn(frame, rngkey):
        x = frame
        for wgt, b in prenet_ws:
            x = jnp.maximum(jnp.dot(x, wgt) + b, 0.0)
        return x

    def project_fn(x):
        frames = jnp.dot(x, frame_w[0]) + frame_w[1]
        stop = (jnp.dot(x, stop_w[0]) + stop_w[1])[..., 0]
        return frames, stop

    ref = dscan.decoder_ar_segment(
        cellp, prenet_fn, project_fn, keys, memory, mask,
        carry0, prev0, jnp.int32(0), stopped0, lengths0, 1, 0.5,
        jax.random.PRNGKey(9), MEL, jnp.float32,
        fused=dscan.quantize_fused(cellp),
    )
    got = _run_pallas(setup, carry0, prev0, jnp.int32(0), stopped0,
                      lengths0, k=1)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-5, rtol=1e-5,
        )


def test_supported_gate(setup):
    cellp = setup[0]
    assert dkp.supported(cellp, P, D, S)
    # 3-layer stacks and non-lane widths fall back.
    bad = dscan.DecoderScanParams(lstm=cellp.lstm * 2,
                                  attention=cellp.attention)
    assert not dkp.supported(bad, P, D, S)
    assert not dkp.supported(cellp, P, D + 7, S)


def test_segment_parity_from_zero_state(setup):
    _, _, _, _, keys, memory, mask = setup
    carry0 = dscan.initial_carry(B, memory, 2, H)
    prev0 = jnp.zeros((B, MEL), jnp.float32)
    stopped0 = jnp.zeros((B,), bool)
    lengths0 = jnp.zeros((B,), jnp.int32)

    ref = _run_ref(setup, carry0, prev0, jnp.int32(0), stopped0, lengths0)
    got = _run_pallas(setup, carry0, prev0, jnp.int32(0), stopped0, lengths0)

    names = ["carry", "prev", "stopped", "lengths", "frames", "stops",
             "aligns"]
    for name, a, b in zip(names, got, ref):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(
                np.asarray(la, np.float32), np.asarray(lb, np.float32),
                # Epsilon-level f32 reduction-order differences flip
                # int8 activation-quantization rounding; over K feedback
                # steps that compounds to ~1e-3 (single-step parity above
                # is tight).
                atol=3e-3, rtol=3e-3, err_msg=name,
            )


def test_segment_parity_from_midstream_state(setup):
    """Chained segments: run segment 1 with the reference, feed ITS state
    into both implementations for segment 2 — exercises the carry
    load/store paths with non-zero state."""
    _, _, _, _, keys, memory, mask = setup
    carry0 = dscan.initial_carry(B, memory, 2, H)
    prev0 = jnp.zeros((B, MEL), jnp.float32)
    stopped0 = jnp.zeros((B,), bool)
    lengths0 = jnp.zeros((B,), jnp.int32)
    carry1, prev1, stopped1, lengths1, *_ = _run_ref(
        setup, carry0, prev0, jnp.int32(0), stopped0, lengths0)

    ref = _run_ref(setup, carry1, prev1, jnp.int32(K), stopped1, lengths1)
    got = _run_pallas(setup, carry1, prev1, jnp.int32(K), stopped1, lengths1)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=3e-3, rtol=3e-3,
        )


def test_segment_parity_with_dropout(setup):
    """Always-on prenet dropout: the kernel streams in masks precomputed
    with prenet_apply's exact fold_in/split/bernoulli stream, so given the
    same top-level rng BOTH paths follow the same trajectory — parity at
    the dropout-free tolerance, not statistical equivalence."""
    from multi_speaker_tts_tpu.models.layers import prenet_apply

    cellp, prenet_ws, frame_w, stop_w, keys, memory, mask = setup
    carry0 = dscan.initial_carry(B, memory, 2, H)
    prev0 = jnp.zeros((B, MEL), jnp.float32)
    stopped0 = jnp.zeros((B,), bool)
    lengths0 = jnp.zeros((B,), jnp.int32)

    def prenet_fn(frame, rngkey):
        return prenet_apply(prenet_ws, frame, 0.5, rngkey)

    def project_fn(x):
        frames = jnp.dot(x, frame_w[0]) + frame_w[1]
        stop = (jnp.dot(x, stop_w[0]) + stop_w[1])[..., 0]
        return frames, stop

    ref = dscan.decoder_ar_segment(
        cellp, prenet_fn, project_fn, keys, memory, mask,
        carry0, prev0, jnp.int32(3), stopped0, lengths0, K, 0.5,
        jax.random.PRNGKey(9), MEL, jnp.float32,
        fused=dscan.quantize_fused(cellp),
    )
    bundle = dkp.prepare_bundle(cellp, prenet_ws, frame_w, stop_w, MEL, R)
    got = dkp.decoder_ar_segment_pallas(
        bundle, keys, memory, mask, carry0, prev0, jnp.int32(3), stopped0,
        lengths0, K, 0.5, jax.random.PRNGKey(9), MEL, R,
        prenet_dropout=0.5, interpret=True,
    )
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=3e-3, rtol=3e-3,
        )


def test_stopped_lengths_bookkeeping(setup):
    """Force stops via a negative threshold: every row should stop at its
    first step and lengths should count exactly one step."""
    _, _, _, _, keys, memory, mask = setup
    carry0 = dscan.initial_carry(B, memory, 2, H)
    prev0 = jnp.zeros((B, MEL), jnp.float32)
    stopped0 = jnp.asarray([False, True, False])
    lengths0 = jnp.zeros((B,), jnp.int32)
    got = _run_pallas(setup, carry0, prev0, jnp.int32(0), stopped0,
                      lengths0, threshold=-1.0)
    ref = _run_ref(setup, carry0, prev0, jnp.int32(0), stopped0,
                   lengths0, threshold=-1.0)
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    assert np.asarray(got[3]).tolist() == [1, 0, 1]


def _run_ref_bf16(setup, carry, prev, t0, stopped, lengths, threshold=0.5):
    """XLA segment in the default serving numerics: bf16 gate matmuls
    (fused=None builds the compute-dtype fused matrices), f32 everything
    else — the arm the bf16 kernel mode must reproduce."""
    cellp, prenet_ws, frame_w, stop_w, keys, memory, mask = setup

    def prenet_fn(frame, rngkey):
        x = frame
        for wgt, b in prenet_ws:
            x = jnp.maximum(jnp.dot(x, wgt) + b, 0.0)
        return x

    def project_fn(x):
        frames = jnp.dot(x, frame_w[0]) + frame_w[1]
        stop = (jnp.dot(x, stop_w[0]) + stop_w[1])[..., 0]
        return frames, stop

    return dscan.decoder_ar_segment(
        cellp, prenet_fn, project_fn, keys, memory, mask,
        carry, prev, t0, stopped, lengths, K, threshold,
        jax.random.PRNGKey(9), MEL, jnp.bfloat16, fused=None,
    )


def _run_pallas_bf16(setup, carry, prev, t0, stopped, lengths,
                     threshold=0.5, k=K):
    cellp, prenet_ws, frame_w, stop_w, keys, memory, mask = setup
    bundle = dkp.prepare_bundle(cellp, prenet_ws, frame_w, stop_w, MEL, R,
                                quantize=False)
    assert bundle["quantized"] is False
    assert bundle["w0q"].dtype == jnp.bfloat16
    return dkp.decoder_ar_segment_pallas(
        bundle, keys, memory, mask, carry, prev, t0, stopped, lengths,
        k, threshold, jax.random.PRNGKey(9), MEL, R,
        prenet_dropout=0.0, interpret=True,
    )


def test_bf16_segment_parity_from_zero_state(setup):
    """Full-precision resident mode: both arms run bf16 gate matmuls with
    f32 accumulation and f32 attention/projections, so the only gap is
    bf16 rounding-order noise compounding through the AR feedback."""
    _, _, _, _, keys, memory, mask = setup
    carry0 = dscan.initial_carry(B, memory, 2, H)
    prev0 = jnp.zeros((B, MEL), jnp.float32)
    stopped0 = jnp.zeros((B,), bool)
    lengths0 = jnp.zeros((B,), jnp.int32)

    ref = _run_ref_bf16(setup, carry0, prev0, jnp.int32(0), stopped0,
                        lengths0)
    got = _run_pallas_bf16(setup, carry0, prev0, jnp.int32(0), stopped0,
                           lengths0)
    names = ["carry", "prev", "stopped", "lengths", "frames", "stops",
             "aligns"]
    for name, a, b in zip(names, got, ref):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(
                np.asarray(la, np.float32), np.asarray(lb, np.float32),
                atol=5e-3, rtol=5e-3, err_msg=name,
            )


def test_bf16_segment_parity_midstream_and_stops(setup):
    """Chained bf16 segments from reference state, plus forced-stop
    bookkeeping equality (negative threshold)."""
    _, _, _, _, keys, memory, mask = setup
    carry0 = dscan.initial_carry(B, memory, 2, H)
    prev0 = jnp.zeros((B, MEL), jnp.float32)
    stopped0 = jnp.zeros((B,), bool)
    lengths0 = jnp.zeros((B,), jnp.int32)
    carry1, prev1, stopped1, lengths1, *_ = _run_ref_bf16(
        setup, carry0, prev0, jnp.int32(0), stopped0, lengths0)

    ref = _run_ref_bf16(setup, carry1, prev1, jnp.int32(K), stopped1,
                        lengths1)
    got = _run_pallas_bf16(setup, carry1, prev1, jnp.int32(K), stopped1,
                           lengths1)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-3, rtol=5e-3,
        )

    gstop = _run_pallas_bf16(setup, carry0, prev0, jnp.int32(0), stopped0,
                             lengths0, threshold=-1.0)
    rstop = _run_ref_bf16(setup, carry0, prev0, jnp.int32(0), stopped0,
                          lengths0, threshold=-1.0)
    np.testing.assert_array_equal(np.asarray(gstop[2]), np.asarray(rstop[2]))
    np.testing.assert_array_equal(np.asarray(gstop[3]), np.asarray(rstop[3]))

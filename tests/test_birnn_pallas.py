"""Fused bidirectional resident-weight Pallas kernels (ops/birnn_pallas.py):
interpret-mode parity vs the XLA direction-batched scans, gradient parity
through the custom VJPs, padding, dispatcher fallbacks, and the model-level
backend knobs. Real-TPU speed numbers live in PROFILE.md."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_speaker_tts_tpu.ops import birnn_pallas
from multi_speaker_tts_tpu.ops import gru as gru_ops
from multi_speaker_tts_tpu.ops import lstm as lstm_ops


def _lstm_params(rng, D, H, scale=0.15):
    return lstm_ops.LSTMParams(
        w_ih=jnp.asarray(rng.normal(size=(D, 4 * H)) * scale, jnp.float32),
        w_hh=jnp.asarray(rng.normal(size=(H, 4 * H)) * scale, jnp.float32),
        b=jnp.asarray(rng.normal(size=(4 * H,)) * 0.1, jnp.float32),
    )


def _gru_params(rng, D, H, scale=0.15):
    return gru_ops.GRUParams(
        w_ih=jnp.asarray(rng.normal(size=(D, 3 * H)) * scale, jnp.float32),
        w_hh=jnp.asarray(rng.normal(size=(H, 3 * H)) * scale, jnp.float32),
        b_ih=jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, jnp.float32),
        b_hh=jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, jnp.float32),
    )


@pytest.fixture(scope="module")
def lstm_case():
    rng = np.random.default_rng(21)
    B, T, D, H = 8, 11, 72, 128
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    return _lstm_params(rng, D, H), _lstm_params(rng, D, H), x


@pytest.fixture(scope="module")
def gru_case():
    rng = np.random.default_rng(22)
    B, T, D, H = 8, 13, 72, 128
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    return _gru_params(rng, D, H), _gru_params(rng, D, H), x


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)


def test_bilstm_forward_parity(lstm_case):
    fwd, bwd, x = lstm_case
    y_x = lstm_ops.bilstm_fused(fwd, bwd, x, compute_dtype=jnp.bfloat16)
    y_p = birnn_pallas.bilstm_pallas(fwd, bwd, x, interpret=True)
    assert y_p.shape == y_x.shape
    # Same bf16 gate math; the kernel additionally rounds the hoisted
    # input gates and the per-step outputs to bf16 (documented contract).
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=3e-2)


def test_bigru_forward_parity(gru_case):
    fwd, bwd, x = gru_case
    y_x = gru_ops.bigru_fused(fwd, bwd, x, compute_dtype=jnp.bfloat16)
    y_p = birnn_pallas.bigru_pallas(fwd, bwd, x, interpret=True)
    assert y_p.shape == y_x.shape
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=3e-2)


def test_bilstm_gradient_parity(lstm_case):
    fwd, bwd, x = lstm_case
    B, T, _ = x.shape
    probe = jnp.asarray(
        np.cos(np.arange(B * T * 256).reshape(B, T, 256) * 0.01), jnp.float32
    )

    def loss_x(ps, xx):
        return (lstm_ops.bilstm_fused(
            ps[0], ps[1], xx, compute_dtype=jnp.bfloat16) * probe).sum()

    def loss_p(ps, xx):
        return (birnn_pallas.bilstm_pallas(
            ps[0], ps[1], xx, interpret=True) * probe).sum()

    gx = jax.grad(loss_x, argnums=(0, 1))((fwd, bwd), x)
    gp = jax.grad(loss_p, argnums=(0, 1))((fwd, bwd), x)
    for lw, lp in zip(gx[0], gp[0]):
        for a, b in zip(lw, lp):
            assert _rel(a, b) < 3e-2
    assert _rel(gx[1], gp[1]) < 3e-2


def test_bigru_gradient_parity(gru_case):
    fwd, bwd, x = gru_case
    B, T, _ = x.shape
    probe = jnp.asarray(
        np.sin(np.arange(B * T * 256).reshape(B, T, 256) * 0.01), jnp.float32
    )

    def loss_x(ps, xx):
        return (gru_ops.bigru_fused(
            ps[0], ps[1], xx, compute_dtype=jnp.bfloat16) * probe).sum()

    def loss_p(ps, xx):
        return (birnn_pallas.bigru_pallas(
            ps[0], ps[1], xx, interpret=True) * probe).sum()

    gx = jax.grad(loss_x, argnums=(0, 1))((fwd, bwd), x)
    gp = jax.grad(loss_p, argnums=(0, 1))((fwd, bwd), x)
    for lw, lp in zip(gx[0], gp[0]):
        for a, b in zip(lw, lp):
            assert _rel(a, b) < 3e-2
    assert _rel(gx[1], gp[1]) < 3e-2


def test_row_padding_is_invisible(gru_case):
    fwd, bwd, _ = gru_case
    rng = np.random.default_rng(7)
    x5 = jnp.asarray(rng.normal(size=(5, 9, 72)), jnp.float32)
    x8 = jnp.concatenate([x5, jnp.zeros((3, 9, 72), jnp.float32)], axis=0)
    y5 = birnn_pallas.bigru_pallas(fwd, bwd, x5, interpret=True)
    y8 = birnn_pallas.bigru_pallas(fwd, bwd, x8, interpret=True)
    assert y5.shape == (5, 9, 256)
    np.testing.assert_allclose(np.asarray(y5), np.asarray(y8[:5]), atol=1e-6)


def test_dispatcher_fallbacks(lstm_case):
    fwd, bwd, x = lstm_case

    # CPU auto path (no interpret): identical to the XLA fused scan.
    y_a = birnn_pallas.bilstm_pallas(fwd, bwd, x)
    y_x = lstm_ops.bilstm_fused(fwd, bwd, x, compute_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(y_a), np.asarray(y_x))

    # f32 request: falls back even with interpret=True.
    y_f = birnn_pallas.bilstm_pallas(
        fwd, bwd, x, compute_dtype=jnp.float32, interpret=True
    )
    y_xf = lstm_ops.bilstm_fused(fwd, bwd, x, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(y_f), np.asarray(y_xf))

    # Non-lane hidden size: unsupported, falls back.
    rng = np.random.default_rng(8)
    f96, b96 = _lstm_params(rng, 72, 96), _lstm_params(rng, 72, 96)
    assert not birnn_pallas.supported(96, jnp.bfloat16)
    y_s = birnn_pallas.bilstm_pallas(f96, b96, x, interpret=True)
    y_sx = lstm_ops.bilstm_fused(f96, b96, x, compute_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(y_s), np.asarray(y_sx))


def test_model_backend_knobs_dispatch():
    """BiLSTM/BiGRU(backend='pallas') on CPU fall back to the XLA scans —
    bitwise equal to backend='fused' — so the default is safe everywhere."""
    from multi_speaker_tts_tpu.models.layers import BiGRU, BiLSTM

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 9, 48)), jnp.float32)
    for cls in (BiLSTM, BiGRU):
        m_p = cls(hidden_size=64, compute_dtype=jnp.bfloat16, backend="pallas")
        m_f = cls(hidden_size=64, compute_dtype=jnp.bfloat16, backend="fused")
        params = m_f.init(jax.random.PRNGKey(0), x)
        y_f = m_f.apply(params, x)
        y_p = m_p.apply(params, x)
        np.testing.assert_array_equal(np.asarray(y_p), np.asarray(y_f))

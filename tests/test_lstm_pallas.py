"""Resident-weight Pallas LSTM stack (ops/lstm_pallas.py): interpret-mode
parity vs the XLA wavefront oracle, gradient parity through the custom VJP,
padding paths, dispatcher fallbacks, and DP sharding composition.

The real-TPU speed numbers live in PROFILE.md ("Resident-weight Pallas
LSTM"); these tests pin the numerics on the CPU mesh with ``interpret=True``
(without it the dispatcher correctly refuses to run interpret-mode Pallas
in production and uses the wavefront instead).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_speaker_tts_tpu.ops import lstm as lstm_ops
from multi_speaker_tts_tpu.ops import lstm_pallas


def _make_stack(rng, D, H, L, scale=0.15):
    layers = []
    d = D
    for _ in range(L):
        layers.append(lstm_ops.LSTMParams(
            w_ih=jnp.asarray(rng.normal(size=(d, 4 * H)) * scale, jnp.float32),
            w_hh=jnp.asarray(rng.normal(size=(H, 4 * H)) * scale, jnp.float32),
            b=jnp.asarray(rng.normal(size=(4 * H,)) * 0.1, jnp.float32),
        ))
        d = H
    return tuple(layers)


@pytest.fixture(scope="module")
def stack_and_input():
    rng = np.random.default_rng(11)
    B, T, D, H, L = 8, 12, 80, 128, 3
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    return _make_stack(rng, D, H, L), x


def test_forward_parity_vs_wavefront(stack_and_input):
    layers, x = stack_and_input
    ys_w, last_w = lstm_ops.lstm_stack_wavefront(
        layers, x, compute_dtype=jnp.bfloat16
    )
    ys_p, last_p = lstm_pallas.lstm_stack_seq_pallas(
        layers, x, interpret=True
    )
    # Both stacks compute bf16 gates with f32 cell math; small divergence
    # comes only from op-ordering inside the matmuls.
    np.testing.assert_allclose(
        np.asarray(ys_p), np.asarray(ys_w), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(last_p), np.asarray(last_w), atol=5e-3
    )


def test_gradient_parity_vs_wavefront(stack_and_input):
    layers, x = stack_and_input
    probe = jnp.asarray(
        np.cos(np.arange(x.shape[0] * 128).reshape(x.shape[0], 128) * 0.01),
        jnp.float32,
    )

    def loss(fn):
        def f(ls, xx):
            _, h = fn(ls, xx)
            return (h * probe).sum()
        return f

    gw = jax.grad(
        loss(lambda ls, xx: lstm_ops.lstm_stack_wavefront(
            ls, xx, compute_dtype=jnp.bfloat16)),
        argnums=(0, 1),
    )(layers, x)
    gp = jax.grad(
        loss(lambda ls, xx: lstm_pallas.lstm_stack_seq_pallas(
            ls, xx, interpret=True)),
        argnums=(0, 1),
    )(layers, x)

    def rel(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)

    # Both backends store bf16 residuals; ~1e-2 relative agreement is the
    # bf16 floor (each is within the same distance of the f32 oracle).
    for lw, lp in zip(gw[0], gp[0]):
        assert rel(lw.w_ih, lp.w_ih) < 2e-2
        assert rel(lw.w_hh, lp.w_hh) < 2e-2
        assert rel(lw.b, lp.b) < 2e-2
    assert rel(gw[1], gp[1]) < 2e-2


def test_row_padding_is_invisible():
    """B not a multiple of 8 pads internally and slices back."""
    rng = np.random.default_rng(3)
    layers = _make_stack(rng, 80, 128, 2)
    x5 = jnp.asarray(rng.normal(size=(5, 9, 80)), jnp.float32)
    x8 = jnp.concatenate([x5, jnp.zeros((3, 9, 80), jnp.float32)], axis=0)
    ys5, last5 = lstm_pallas.lstm_stack_seq_pallas(layers, x5, interpret=True)
    ys8, last8 = lstm_pallas.lstm_stack_seq_pallas(layers, x8, interpret=True)
    assert ys5.shape == (5, 9, 128) and last5.shape == (5, 128)
    np.testing.assert_allclose(
        np.asarray(ys5), np.asarray(ys8[:5]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(last5), np.asarray(last8[:5]), atol=1e-6
    )


def test_dispatcher_falls_back_off_tpu_and_for_f32():
    """Without interpret=True on CPU — and always for f32 or non-lane
    hidden sizes — the dispatcher must return the wavefront result."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 7, 80)), jnp.float32)

    # CPU auto path: bitwise-identical to the wavefront (same code runs).
    layers = _make_stack(rng, 80, 128, 2)
    ys_a, last_a = lstm_pallas.lstm_stack_seq_pallas(layers, x)
    ys_w, last_w = lstm_ops.lstm_stack_wavefront(
        layers, x, compute_dtype=jnp.bfloat16, unroll=1
    )
    np.testing.assert_array_equal(np.asarray(ys_a), np.asarray(ys_w))
    np.testing.assert_array_equal(np.asarray(last_a), np.asarray(last_w))

    # f32 request: falls back even with interpret=True.
    ys_f, last_f = lstm_pallas.lstm_stack_seq_pallas(
        layers, x, compute_dtype=jnp.float32, interpret=True
    )
    ys_wf, last_wf = lstm_ops.lstm_stack_wavefront(
        layers, x, compute_dtype=jnp.float32, unroll=1
    )
    np.testing.assert_array_equal(np.asarray(ys_f), np.asarray(ys_wf))
    np.testing.assert_array_equal(np.asarray(last_f), np.asarray(last_wf))

    # Non-lane hidden size (H=96): unsupported, falls back.
    small = _make_stack(rng, 80, 96, 2)
    assert not lstm_pallas.supported(small)
    ys_s, _ = lstm_pallas.lstm_stack_seq_pallas(
        small, x, interpret=True
    )
    ys_sw, _ = lstm_ops.lstm_stack_wavefront(
        small, x, compute_dtype=jnp.bfloat16, unroll=1
    )
    np.testing.assert_array_equal(np.asarray(ys_s), np.asarray(ys_sw))


def test_sharded_train_step_matches_unsharded():
    """The kernel composes with GSPMD data parallelism: an 8-device DP
    grad step through the Pallas stack matches the single-device one
    (BASELINE config 2's DP training; the GE2E trainer shards N*M rows)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(9)
    layers = _make_stack(rng, 80, 128, 2)
    x = jnp.asarray(rng.normal(size=(16, 10, 80)), jnp.float32)
    probe = jnp.asarray(
        np.sin(np.arange(16 * 128).reshape(16, 128) * 0.01), jnp.float32
    )

    def loss(ls, xx):
        _, h = lstm_pallas.lstm_stack_seq_pallas(ls, xx, interpret=True)
        return (h * probe).sum()

    g_single = jax.jit(jax.grad(loss))(layers, x)

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    g_fn = jax.jit(jax.grad(loss), in_shardings=(repl, shard),
                   out_shardings=repl)
    g_sharded = g_fn(layers, jax.device_put(x, shard))

    for ls, lsh in zip(g_single, g_sharded):
        np.testing.assert_allclose(
            np.asarray(ls.w_ih), np.asarray(lsh.w_ih), atol=2e-2, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(ls.w_hh), np.asarray(lsh.w_hh), atol=2e-2, rtol=1e-3
        )


def test_ge2e_backend_knob_dispatches():
    """GE2E(backend='pallas') produces the wavefront result on CPU (the
    auto fallback) and stays unit-norm."""
    from multi_speaker_tts_tpu.models import GE2E

    rng = np.random.default_rng(2)
    mels = jnp.asarray(rng.uniform(0, 1, size=(4, 20, 80)), jnp.float32)
    kw = dict(lstm_size=128, lstm_stacks=2, embedding_size=64,
              compute_dtype=jnp.bfloat16, scan_unroll=1)
    m_p = GE2E(backend="pallas", **kw)
    m_w = GE2E(backend="wavefront", **kw)
    params = m_w.init(jax.random.PRNGKey(0), mels)
    e_w = m_w.apply(params, mels)
    e_p = m_p.apply(params, mels)
    np.testing.assert_array_equal(np.asarray(e_p), np.asarray(e_w))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(e_p), axis=-1), 1.0, atol=1e-3
    )

"""Custom-VJP decoder scan (ops/decoder_scan.py) vs XLA autodiff.

``decoder_tf_scan_ref`` is a plain lax.scan that XLA can differentiate; the
custom-VJP ``decoder_tf_scan`` must match it exactly in forward and to f32
tolerance in every gradient (params, prenet sequence, keys, memory).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_speaker_tts_tpu.ops import decoder_scan as ds
from multi_speaker_tts_tpu.ops.lstm import init_lstm_params


def _setup(n_layers: int, seed: int = 0):
    B, T, S, P, H, A, C, D, K = 3, 7, 11, 5, 16, 8, 4, 10, 5
    rng = np.random.default_rng(seed)
    keys_j = jax.random.split(jax.random.PRNGKey(seed), 3 + n_layers)
    lstm = [init_lstm_params(keys_j[0], P + D, H)]
    for i in range(1, n_layers):
        lstm.append(init_lstm_params(keys_j[i], H + D, H))
    ap = ds.AttentionParams(
        wq=jax.random.normal(keys_j[-3], (H, A)) * 0.3,
        conv_kernel=jax.random.normal(keys_j[-2], (K, 2, C)) * 0.3,
        wloc=jax.random.normal(keys_j[-1], (C, A)) * 0.3,
        v=jax.random.normal(keys_j[-1], (A, 1)) * 0.3,
    )
    p = ds.DecoderScanParams(lstm=tuple(lstm), attention=ap)
    pre_seq = jnp.asarray(rng.normal(size=(T, B, P)), jnp.float32)
    keys = jnp.asarray(rng.normal(size=(B, S, A)), jnp.float32)
    memory = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, S)) > 0.2, jnp.float32)
    mask = mask.at[:, 0].set(1.0)
    return p, pre_seq, keys, memory, mask


def _loss(scan_fn, p, pre_seq, keys, memory, mask, **kw):
    xs, ws = scan_fn(p, pre_seq, keys, memory, mask, **kw)
    # Position-dependent weights make every output element matter distinctly.
    wx = jnp.cos(jnp.arange(xs.size, dtype=jnp.float32).reshape(xs.shape) * 0.01)
    ww = jnp.sin(jnp.arange(ws.size, dtype=jnp.float32).reshape(ws.shape) * 0.02)
    return jnp.sum(xs * wx) + jnp.sum(ws * ww)


@pytest.mark.parametrize("n_layers", [2, 3])
def test_forward_matches_reference_exactly(n_layers):
    args = _setup(n_layers)
    ref = ds.decoder_tf_scan_ref(*args)
    cus = ds.decoder_tf_scan(*args)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(cus)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("n_layers", [2, 3])
@pytest.mark.parametrize("unroll", [1, 2])
def test_gradients_match_autodiff(n_layers, unroll):
    args = _setup(n_layers)
    g_ref = jax.grad(
        lambda *a: _loss(ds.decoder_tf_scan_ref, *a, unroll=unroll),
        argnums=(0, 1, 2, 3),
    )(*args)
    g_cus = jax.grad(
        lambda *a: _loss(ds.decoder_tf_scan, *a, unroll=unroll),
        argnums=(0, 1, 2, 3),
    )(*args)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree.leaves(g_cus),
    ):
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5 * scale,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}",
        )


def test_gradients_match_autodiff_bf16_compute():
    """bf16 matmul mode: same *code path* decisions, looser tolerance."""
    args = _setup(2)
    kw = dict(compute_dtype=jnp.bfloat16)
    g_ref = jax.grad(
        lambda *a: _loss(ds.decoder_tf_scan_ref, *a, **kw), argnums=0
    )(*args)
    g_cus = jax.grad(
        lambda *a: _loss(ds.decoder_tf_scan, *a, **kw), argnums=0
    )(*args)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_cus)):
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-2 * scale)


def test_early_exit_pre_stopped_rows_do_not_pin_the_loop():
    """A row that never emits a stop token (a serving PAD row) must not hold
    the early-exit while_loop open when it is pre-stopped via stopped_init
    (ADVICE r2 medium): the loop exits as soon as every REAL row stops, and
    pre-stopped rows report length 0."""
    p, pre_seq, keys, memory, mask = _setup(2)
    B = memory.shape[0]  # 3
    mel_dim = 4
    x_dim = p.lstm[-1].hidden_size + memory.shape[-1]
    wf = jax.random.normal(jax.random.PRNGKey(8), (x_dim, mel_dim)) * 0.1
    P = pre_seq.shape[-1]

    def prenet_fn(frame, rngkey):
        del rngkey
        return jnp.tile(frame[:, :1], (1, P)) + 0.1

    # Row 0 stops immediately; rows 1..2 NEVER stop.
    row_logit = jnp.where(jnp.arange(B) == 0, 10.0, -10.0)

    def project_fn(x):
        return jnp.dot(x, wf), row_logit + 0.0 * x[:, 0]

    n_steps = 12
    common = (p, prenet_fn, project_fn, keys, memory, mask, n_steps, 0.5,
              jax.random.PRNGKey(0), mel_dim)

    # Without pre-stopping, the non-stopping rows pin the loop to n_steps.
    _, _, _, lengths = ds.decoder_ar_early_exit(*common)
    assert int(lengths[1]) == n_steps and int(lengths[2]) == n_steps

    # Pre-stopped "PAD" rows: loop exits with row 0 after one step
    # (chunk=1: exact one-step granularity, the legacy semantics).
    stopped_init = jnp.asarray([False, True, True])
    frames, stops, _, lengths = ds.decoder_ar_early_exit(
        *common, stopped_init=stopped_init, chunk=1
    )
    assert int(lengths[0]) == 1
    assert int(lengths[1]) == 0 and int(lengths[2]) == 0
    # Steps the loop never ran keep the filler (-1e4) stop logits.
    assert float(stops[1, 0]) <= -1e3

    # Chunked (default) loop: decoded lengths are EXACTLY the chunk=1
    # values (bookkeeping is per-step inside the chunk); the loop
    # over-runs at most one chunk, so steps >= K keep the filler.
    frames_c, stops_c, _, lengths_c = ds.decoder_ar_early_exit(
        *common, stopped_init=stopped_init, chunk=8
    )
    assert np.array_equal(np.asarray(lengths_c), np.asarray(lengths))
    K = max(k for k in range(1, 9) if n_steps % k == 0)  # = 6 for 12
    assert float(stops_c[K, 0]) <= -1e3
    # Decoded frames within each row's length match the chunk=1 run.
    np.testing.assert_allclose(
        np.asarray(frames_c[:1]), np.asarray(frames[:1]), atol=1e-6
    )

    # All rows pre-stopped: zero trip count, nothing decoded.
    _, _, _, lengths = ds.decoder_ar_early_exit(
        *common, stopped_init=jnp.ones((B,), bool)
    )
    assert np.all(np.asarray(lengths) == 0)


def test_ar_scan_consistent_with_tf_cell():
    """The fixed-length AR driver uses the same cell: with a zero-dropout
    'prenet' that reproduces the teacher inputs it must emit the same first
    frame as the TF scan (both start from the GO frame)."""
    p, pre_seq, keys, memory, mask = _setup(2)
    T, B, P = pre_seq.shape
    mel_dim = 4
    x_dim = p.lstm[-1].hidden_size + memory.shape[-1]
    rng = jax.random.PRNGKey(7)
    wf = jax.random.normal(rng, (x_dim, mel_dim)) * 0.1

    def prenet_fn(frame, rngkey):
        del rngkey
        return jnp.tile(frame[:, :1], (1, P)) + pre_seq[0] * 0.0 + 0.1

    def project_fn(x):
        return jnp.dot(x, wf), x[:, 0]

    frames, stops, ws = ds.decoder_ar_scan(
        p, prenet_fn, project_fn, keys, memory, mask, 3,
        jax.random.PRNGKey(0), mel_dim,
    )
    assert frames.shape == (3, B, mel_dim)
    assert stops.shape == (3, B)
    assert ws.shape == (3, B, memory.shape[1])
    # Step 0 must equal a single manual cell step from the GO frame.
    carry0 = ds.initial_carry(B, memory, 2, p.lstm[0].hidden_size)
    pre0 = prenet_fn(jnp.zeros((B, mel_dim)), None)
    _, (x0, w0) = ds.decoder_cell_step(p, carry0, pre0, keys, memory, mask)
    np.testing.assert_allclose(frames[0], jnp.dot(x0, wf), atol=1e-6)
    np.testing.assert_allclose(ws[0], w0, atol=1e-6)

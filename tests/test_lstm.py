"""LSTM primitive tests: numerics vs torch.nn.LSTM (the reference's kernel),
plus scan/hoisting equivalences."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_speaker_tts_tpu.ops import lstm as lstm_ops


def _torch_oracle(x, w_ih, w_hh, b, reverse=False):
    torch = pytest.importorskip("torch")
    B, T, D = x.shape
    H = w_hh.shape[0]
    m = torch.nn.LSTM(D, H, num_layers=1, batch_first=True, bias=True)
    with torch.no_grad():
        # torch stores (4H, D); ours is (D, 4H). Same i,f,g,o gate order.
        m.weight_ih_l0.copy_(torch.from_numpy(w_ih.T.copy()))
        m.weight_hh_l0.copy_(torch.from_numpy(w_hh.T.copy()))
        m.bias_ih_l0.copy_(torch.from_numpy(b))
        m.bias_hh_l0.zero_()
        inp = torch.from_numpy(x[:, ::-1].copy() if reverse else x)
        y, (h, c) = m(inp)
    y = y.numpy()
    if reverse:
        y = y[:, ::-1]
    return y, h.numpy()[0], c.numpy()[0]


@pytest.fixture(scope="module")
def params_and_input():
    rng = np.random.default_rng(7)
    B, T, D, H = 3, 17, 12, 24
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    w_ih = (rng.normal(size=(D, 4 * H)) * 0.2).astype(np.float32)
    w_hh = (rng.normal(size=(H, 4 * H)) * 0.2).astype(np.float32)
    b = (rng.normal(size=(4 * H,)) * 0.1).astype(np.float32)
    return x, lstm_ops.LSTMParams(jnp.asarray(w_ih), jnp.asarray(w_hh), jnp.asarray(b))


def test_lstm_matches_torch(params_and_input):
    x, params = params_and_input
    y, (h, c) = lstm_ops.lstm(params, jnp.asarray(x))
    y_t, h_t, c_t = _torch_oracle(
        x, np.asarray(params.w_ih), np.asarray(params.w_hh), np.asarray(params.b)
    )
    np.testing.assert_allclose(np.asarray(y), y_t, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h), h_t, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c), c_t, atol=2e-5)


def test_lstm_reverse_matches_torch(params_and_input):
    x, params = params_and_input
    y, _ = lstm_ops.lstm(params, jnp.asarray(x), reverse=True)
    y_t, _, _ = _torch_oracle(
        x, np.asarray(params.w_ih), np.asarray(params.w_hh), np.asarray(params.b),
        reverse=True,
    )
    np.testing.assert_allclose(np.asarray(y), y_t, atol=2e-5)


def test_cell_step_equals_full_scan(params_and_input):
    """Stepping the cell manually reproduces lax.scan's output (the AR
    decoder uses the cell directly)."""
    x, params = params_and_input
    y, _ = lstm_ops.lstm(params, jnp.asarray(x))
    B, T, _ = x.shape
    H = params.hidden_size
    h = jnp.zeros((B, H))
    c = jnp.zeros((B, H))
    gx = lstm_ops.input_gates(params, jnp.asarray(x))
    outs = []
    for t in range(T):
        h, c = lstm_ops.lstm_cell_step(params, gx[:, t], h, c)
        outs.append(h)
    manual = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(manual), np.asarray(y), atol=1e-6)


def test_bilstm_shapes(params_and_input):
    x, params = params_and_input
    key = jax.random.PRNGKey(0)
    p2 = lstm_ops.init_lstm_params(key, x.shape[-1], params.hidden_size)
    y = lstm_ops.bilstm(params, p2, jnp.asarray(x))
    assert y.shape == (x.shape[0], x.shape[1], 2 * params.hidden_size)
    # forward half equals unidirectional forward output
    y_f, _ = lstm_ops.lstm(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(y[..., : params.hidden_size]), np.asarray(y_f), atol=1e-6
    )


def test_lstm_stack(params_and_input):
    x, params = params_and_input
    key = jax.random.PRNGKey(1)
    H = params.hidden_size
    p2 = lstm_ops.init_lstm_params(key, H, H)
    ys, h_T = lstm_ops.lstm_stack([params, p2], jnp.asarray(x))
    assert ys.shape == (x.shape[0], x.shape[1], H)
    np.testing.assert_allclose(np.asarray(ys[:, -1]), np.asarray(h_T), atol=1e-6)


def test_lstm_bf16_compute_close_to_f32(params_and_input):
    x, params = params_and_input
    y32, _ = lstm_ops.lstm(params, jnp.asarray(x))
    y16, _ = lstm_ops.lstm(params, jnp.asarray(x), compute_dtype=jnp.bfloat16)
    assert y16.dtype == jnp.float32  # state kept in f32
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32), atol=5e-2)


def test_lstm_grad_finite(params_and_input):
    x, params = params_and_input

    def loss(p):
        y, _ = lstm_ops.lstm(p, jnp.asarray(x))
        return (y**2).mean()

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_wavefront_matches_sequential_stack(params_and_input):
    """Wavefront == layer-by-layer stack (forward numerics)."""
    x, params = params_and_input
    key = jax.random.PRNGKey(2)
    H = params.hidden_size
    layers = [params] + [
        lstm_ops.init_lstm_params(jax.random.fold_in(key, i), H, H)
        for i in range(2)
    ]
    ys_seq, hT_seq = lstm_ops.lstm_stack(layers, jnp.asarray(x))
    ys_wf, hT_wf = lstm_ops.lstm_stack_wavefront(layers, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ys_wf), np.asarray(ys_seq), atol=2e-6)
    np.testing.assert_allclose(np.asarray(hT_wf), np.asarray(hT_seq), atol=2e-6)


def test_wavefront_custom_vjp_matches_autodiff(params_and_input):
    """The hand-written wavefront backward must match XLA autodiff of the
    reference scan for every weight and for the input."""
    x, params = params_and_input
    key = jax.random.PRNGKey(3)
    H = params.hidden_size
    layers = tuple(
        [params]
        + [
            lstm_ops.init_lstm_params(jax.random.fold_in(key, i), H, H)
            for i in range(2)
        ]
    )
    xj = jnp.asarray(x)

    def loss(fn, layers, xj):
        ys, h_T = fn(layers, xj)
        wy = jnp.cos(jnp.arange(ys.size, dtype=jnp.float32).reshape(ys.shape) * 0.01)
        return jnp.sum(ys * wy) + jnp.sum(h_T * 0.7)

    g_ref = jax.grad(
        lambda l, v: loss(lstm_ops.lstm_stack_wavefront_ref, l, v), argnums=(0, 1)
    )(layers, xj)
    g_cus = jax.grad(
        lambda l, v: loss(lstm_ops.lstm_stack_wavefront, l, v), argnums=(0, 1)
    )(layers, xj)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0], jax.tree.leaves(g_cus)
    ):
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5 * scale,
            err_msg=f"wavefront grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_wavefront_custom_vjp_matches_autodiff_bf16(params_and_input):
    """bf16-compute mode stores residuals in bf16 (unlike f32 mode, where
    the casts are no-ops): the backward must still match autodiff of the
    reference scan run in the SAME bf16 mode, at loosened tolerance
    (mirrors test_decoder_scan.test_gradients_match_autodiff_bf16_compute)."""
    x, params = params_and_input
    key = jax.random.PRNGKey(4)
    H = params.hidden_size
    layers = tuple(
        [params]
        + [
            lstm_ops.init_lstm_params(jax.random.fold_in(key, i), H, H)
            for i in range(2)
        ]
    )
    xj = jnp.asarray(x)

    def loss(fn, layers, xj):
        ys, h_T = fn(layers, xj, compute_dtype=jnp.bfloat16)
        wy = jnp.cos(jnp.arange(ys.size, dtype=jnp.float32).reshape(ys.shape) * 0.01)
        return jnp.sum(ys * wy) + jnp.sum(h_T * 0.7)

    g_ref = jax.grad(
        lambda l: loss(lstm_ops.lstm_stack_wavefront_ref, l, xj)
    )(layers)
    g_cus = jax.grad(
        lambda l: loss(lstm_ops.lstm_stack_wavefront, l, xj)
    )(layers)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0], jax.tree.leaves(g_cus)
    ):
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-2 * scale,
            err_msg=f"bf16 wavefront grad mismatch at {jax.tree_util.keystr(path)}",
        )

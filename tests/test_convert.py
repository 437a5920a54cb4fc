"""Torch -> JAX conversion round trips: converted weights must reproduce the
live torch module's outputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from multi_speaker_tts_tpu.convert import torch_to_jax as cv
from multi_speaker_tts_tpu.ops import lstm as lstm_ops

torch = pytest.importorskip("torch")


@pytest.fixture()
def x():
    return np.random.default_rng(0).normal(size=(2, 9, 12)).astype(np.float32)


def test_dense_roundtrip(x):
    m = torch.nn.Linear(12, 7)
    want = m(torch.from_numpy(x)).detach().numpy()
    p = cv.convert_dense(m.weight, m.bias)
    got = np.asarray(nn.Dense(7).apply({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv1d_roundtrip(x):
    m = torch.nn.Conv1d(12, 5, kernel_size=3, padding=1)
    want = m(torch.from_numpy(x).transpose(1, 2)).detach().numpy().transpose(0, 2, 1)
    p = cv.convert_conv1d(m.weight, m.bias)
    got = np.asarray(
        nn.Conv(5, (3,), padding="SAME").apply({"params": p}, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lstm_roundtrip(x):
    m = torch.nn.LSTM(12, 6, batch_first=True)
    want, _ = m(torch.from_numpy(x))
    p = cv.convert_lstm(
        m.weight_ih_l0, m.weight_hh_l0, m.bias_ih_l0, m.bias_hh_l0
    )
    params = lstm_ops.LSTMParams(
        jnp.asarray(p["w_ih"]), jnp.asarray(p["w_hh"]), jnp.asarray(p["b"])
    )
    got, _ = lstm_ops.lstm(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=2e-5)


def test_batchnorm_roundtrip(x):
    m = torch.nn.BatchNorm1d(12)
    m.eval()
    with torch.no_grad():
        m.running_mean.uniform_(-1, 1)
        m.running_var.uniform_(0.5, 2.0)
        m.weight.uniform_(0.5, 1.5)
        m.bias.uniform_(-0.5, 0.5)
    with torch.no_grad():
        want = m(torch.from_numpy(x).transpose(1, 2)).numpy().transpose(0, 2, 1)
    params, stats = cv.convert_batchnorm(
        m.weight, m.bias, m.running_mean, m.running_var
    )
    got = np.asarray(
        nn.BatchNorm(use_running_average=True, epsilon=1e-5).apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x)
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_embedding_roundtrip():
    m = torch.nn.Embedding(11, 4)
    idx = np.asarray([[1, 2, 10], [0, 3, 5]], np.int32)
    want = m(torch.from_numpy(idx).long()).detach().numpy()
    p = cv.convert_embedding(m.weight)
    got = np.asarray(nn.Embed(11, 4).apply({"params": p}, jnp.asarray(idx)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_convert_state_dict_mapping():
    lin = torch.nn.Linear(4, 3)
    bn = torch.nn.BatchNorm1d(3)
    sd = {
        "dense.weight": lin.weight,
        "dense.bias": lin.bias,
        "norm.weight": bn.weight,
        "norm.bias": bn.bias,
        "norm.running_mean": bn.running_mean,
        "norm.running_var": bn.running_var,
    }
    mapping = {
        "model/proj": (cv.convert_dense, ["dense.weight", "dense.bias"]),
        "model/bn": (
            cv.convert_batchnorm,
            ["norm.weight", "norm.bias", "norm.running_mean", "norm.running_var"],
        ),
    }
    tree = cv.convert_state_dict(sd, mapping)
    assert tree["params"]["model"]["proj"]["kernel"].shape == (4, 3)
    assert tree["batch_stats"]["model"]["bn"]["mean"].shape == (3,)


def test_convert_state_dict_strict_missing():
    with pytest.raises(KeyError, match="not in state_dict"):
        cv.convert_state_dict(
            {}, {"a/b": (cv.convert_dense, ["nope.weight"])}, strict=True
        )


def test_reference_checkpoint_file_roundtrip(tmp_path):
    """A reference-style torch.save({'Model': ..., 'Steps': ...}) file loads
    and converts end-to-end."""
    lin = torch.nn.Linear(6, 3)
    sd = {"proj.weight": lin.weight, "proj.bias": lin.bias}
    path = tmp_path / "S_100.pt"
    torch.save({"Model": sd, "Steps": 100, "Optimizer": {}}, path)

    tree = cv.convert_reference_checkpoint(
        str(path), {"tacotron/proj": (cv.convert_dense, ["proj.weight", "proj.bias"])}
    )
    assert tree["step"] == 100
    kernel = tree["params"]["tacotron"]["proj"]["kernel"]
    assert kernel.shape == (6, 3)
    x = np.random.default_rng(0).normal(size=(2, 6)).astype(np.float32)
    want = lin(torch.from_numpy(x)).detach().numpy()
    got = x @ kernel + tree["params"]["tacotron"]["proj"]["bias"]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_load_torch_checkpoint_bad_structure(tmp_path):
    path = tmp_path / "bad.pt"
    torch.save([1, 2, 3], path)
    with pytest.raises(ValueError, match="unrecognized checkpoint structure"):
        cv.load_torch_checkpoint(str(path))

"""GE2E speaker encoder tests: BASELINE config 2 (embeddings + similarity
matrix) plus loss properties from the GE2E paper."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_speaker_tts_tpu.models import ge2e


@pytest.fixture(scope="module")
def tiny_ge2e():
    model = ge2e.GE2E(lstm_size=32, lstm_stacks=2, embedding_size=16)
    mels = jnp.asarray(np.random.default_rng(0).normal(size=(4, 24, 8)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mels)
    return model, params, mels


def test_embeddings_unit_norm(tiny_ge2e):
    model, params, mels = tiny_ge2e
    emb = model.apply(params, mels)
    assert emb.shape == (4, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5
    )


def test_slide_windows_shapes():
    mel = jnp.arange(20 * 3, dtype=jnp.float32).reshape(20, 3)
    win = ge2e.slide_windows(mel, window_length=8, window_shift=4)
    assert win.shape == (4, 8, 3)
    np.testing.assert_array_equal(np.asarray(win[0]), np.asarray(mel[:8]))
    # final window is flush with the end
    np.testing.assert_array_equal(np.asarray(win[-1]), np.asarray(mel[12:20]))


def test_slide_windows_short_input_pads():
    mel = jnp.ones((5, 3))
    win = ge2e.slide_windows(mel, window_length=8, window_shift=4)
    assert win.shape == (1, 8, 3)
    assert float(win[0, 5:].sum()) == 0.0


def test_slide_windows_batched():
    mel = jnp.asarray(np.random.default_rng(1).normal(size=(2, 20, 3)), jnp.float32)
    win = ge2e.slide_windows(mel, 8, 4)
    assert win.shape == (2, 4, 8, 3)
    single = ge2e.slide_windows(mel[0], 8, 4)
    np.testing.assert_allclose(np.asarray(win[0]), np.asarray(single), atol=0)


def test_embed_utterance(tiny_ge2e):
    model, params, _ = tiny_ge2e
    mel = jnp.asarray(np.random.default_rng(2).normal(size=(2, 40, 8)), jnp.float32)
    emb = model.apply(
        params, mel, 24, 12, method=model.embed_utterance
    )
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5
    )


def test_similarity_matrix_separates_speakers():
    """Synthetic clustered embeddings: own-speaker similarity should beat
    cross-speaker similarity everywhere."""
    rng = np.random.default_rng(3)
    N, M, E = 4, 5, 8
    centers = rng.normal(size=(N, 1, E))
    emb = centers + 0.05 * rng.normal(size=(N, M, E))
    emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    S = ge2e.ge2e_similarity_matrix(jnp.asarray(emb, jnp.float32), 10.0, -5.0)
    assert S.shape == (N, M, N)
    S = np.asarray(S)
    own = np.stack([S[j, :, j] for j in range(N)])
    for j in range(N):
        others = np.delete(S[j], j, axis=1)
        assert own[j].min() > others.max()


def test_ge2e_loss_lower_for_clustered():
    rng = np.random.default_rng(4)
    N, M, E = 4, 5, 8
    centers = rng.normal(size=(N, 1, E))
    tight = centers + 0.02 * rng.normal(size=(N, M, E))
    loose = rng.normal(size=(N, M, E))
    norm = lambda e: jnp.asarray(  # noqa: E731
        e / np.linalg.norm(e, axis=-1, keepdims=True), jnp.float32
    )
    loss_tight = ge2e.ge2e_loss(norm(tight), 10.0, -5.0)
    loss_loose = ge2e.ge2e_loss(norm(loose), 10.0, -5.0)
    assert float(loss_tight) < float(loss_loose)


def test_ge2e_loss_weight_clamped():
    """Negative scale w must be clamped (paper: w > 0), keeping loss finite
    and ordering intact."""
    rng = np.random.default_rng(5)
    emb = rng.normal(size=(3, 4, 8))
    emb = jnp.asarray(emb / np.linalg.norm(emb, axis=-1, keepdims=True), jnp.float32)
    loss = ge2e.ge2e_loss(emb, -3.0, 0.0)
    assert bool(jnp.isfinite(loss))


def test_ge2e_training_reduces_loss(tiny_ge2e):
    """A few SGD steps on the GE2E loss over the encoder reduce it (tiny
    end-to-end sanity for BASELINE config 2's training path)."""
    import optax

    model = ge2e.GE2E(lstm_size=16, lstm_stacks=1, embedding_size=8)
    rng = np.random.default_rng(6)
    N, M, L, D = 3, 4, 12, 6
    # Speaker-dependent DC offset makes speakers separable.
    base = rng.normal(size=(N, 1, 1, D)) * 2.0
    mels = jnp.asarray(
        (base + rng.normal(size=(N, M, L, D))).reshape(N * M, L, D), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(1), mels)
    wb = {"w": jnp.asarray(10.0), "b": jnp.asarray(-5.0)}
    opt = optax.adam(1e-2)
    state = opt.init((params, wb))

    @jax.jit
    def step(params, wb, opt_state):
        def loss_fn(p):
            params_, wb_ = p
            emb = model.apply(params_, mels).reshape(N, M, -1)
            return ge2e.ge2e_loss(emb, wb_["w"], wb_["b"])

        loss, grads = jax.value_and_grad(loss_fn)((params, wb))
        updates, opt_state = opt.update(grads, opt_state)
        params, wb = optax.apply_updates((params, wb), updates)
        return params, wb, opt_state, loss

    losses = []
    for _ in range(12):
        params, wb, state, loss = step(params, wb, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()

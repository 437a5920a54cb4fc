"""Trained-checkpoint conversion parity (VERDICT r4 item 2).

Round 4 proved the torch->JAX converter on RANDOM weights only
(tests/test_convert_e2e.py). This tool closes the remaining honesty gap in
the "checkpoint-convertible weights ... mel L1 parity" claim
(BASELINE.json:5) by actually TRAINING the reconstructed PyTorch reference
(convert/reference_torch.py — per-frame Python decode loop, torch CPU) on
the demo corpus with the reference recipe (GE2E pretrain -> frozen-encoder
TTS), saving a reference-style ``torch.save`` checkpoint, converting it
with the production mapping table, and measuring BOTH frameworks on
IDENTICAL batches:

- elementwise forward parity (mel pre/post, stop logits, alignments,
  linear, GE2E embeddings) on the trained weights;
- quality metrics side by side (teacher-forced masked mel L1 pre/post,
  stop accuracy, attention diagonality) — the converted JAX model must
  reproduce the torch model's numbers, not merely produce finite ones.

Driven by ``tests/test_convert_trained.py`` (tiny width, fast) and by
``demo/RESULTS.md``'s trained-conversion section (serving width).
"""

from __future__ import annotations

import numpy as np


def _torch():
    import torch

    return torch


# --------------------------------------------------------------------------
# torch-side GE2E loss (mirror of models/ge2e.py::ge2e_loss, eq. 5/6/8/9)
# --------------------------------------------------------------------------

def torch_ge2e_loss(emb, w, b):
    """emb: (N, M, E) unit-norm torch tensor; w, b scalar Parameters."""
    torch = _torch()
    N, M, _ = emb.shape
    centroids = emb.mean(dim=1)
    centroids_n = centroids / centroids.norm(dim=-1, keepdim=True).clamp(min=1e-6)
    loo = (emb.sum(dim=1, keepdim=True) - emb) / (M - 1)
    loo_n = loo / loo.norm(dim=-1, keepdim=True).clamp(min=1e-6)
    cos_all = torch.einsum("jme,ke->jmk", emb, centroids_n)
    cos_own = torch.einsum("jme,jme->jm", emb, loo_n)
    own_col = torch.eye(N, dtype=emb.dtype)[:, None, :]  # (N, 1, N)
    cos = cos_all * (1.0 - own_col) + cos_own[..., None] * own_col
    S = w.clamp(min=1e-6) * cos + b
    own = S.gather(2, torch.arange(N)[:, None, None].expand(N, M, 1))[..., 0]
    return (-own + torch.logsumexp(S, dim=2)).mean()


# --------------------------------------------------------------------------
# torch-side synthesizer losses (mirror of models/losses.py)
# --------------------------------------------------------------------------

def torch_tacotron_losses(out, mels, mel_lengths, token_lengths, spects, r):
    torch = _torch()
    B, T, _ = mels.shape
    mask = (torch.arange(T)[None, :] < mel_lengths[:, None]).float()

    def masked_l1(pred, target):
        err = (pred - target).abs() * mask[..., None]
        return err.sum() / (mask.sum() * pred.shape[-1]).clamp(min=1.0)

    losses = {
        "mel_pre": masked_l1(out["mel_pre"], mels),
        "mel_post": masked_l1(out["mel_post"], mels),
    }
    # Stop BCE: target 1 at/after the last valid step, positives x5.
    logits = out["stop_logits"]
    n_steps = logits.shape[1]
    lengths_steps = torch.ceil(mel_lengths.float() / r).long()
    steps = torch.arange(n_steps)[None, :]
    target = (steps >= (lengths_steps[:, None] - 1)).float()
    valid = (steps < lengths_steps[:, None]).float()
    bce = (logits.clamp(min=0) - logits * target
           + torch.log1p(torch.exp(-logits.abs())))
    weight = torch.where(target > 0, 5.0, 1.0) * valid
    losses["stop"] = (bce * weight).sum() / weight.sum().clamp(min=1.0)
    total = losses["mel_pre"] + losses["mel_post"] + losses["stop"]
    if spects is not None and "linear" in out:
        losses["linear"] = masked_l1(out["linear"], spects)
        total = total + losses["linear"]
    # Guided attention (Tachibana, sigma 0.2, weight 10 — trainer defaults).
    align = out["alignments"]  # (B, steps, S)
    _, Td, S = align.shape
    t_pos = torch.arange(Td)[None, :, None] / lengths_steps[:, None, None].clamp(min=1)
    s_pos = torch.arange(S)[None, None, :] / token_lengths[:, None, None].clamp(min=1)
    W = 1.0 - torch.exp(-((s_pos - t_pos) ** 2) / (2 * 0.2**2))
    amask = ((torch.arange(Td)[None, :] < lengths_steps[:, None]).float()[:, :, None]
             * (torch.arange(S)[None, :] < token_lengths[:, None]).float()[:, None, :])
    losses["guided_attention"] = (align * W * amask).sum() / amask.sum().clamp(min=1.0)
    total = total + 10.0 * losses["guided_attention"]
    losses["total"] = total
    return losses


# --------------------------------------------------------------------------
# training
# --------------------------------------------------------------------------

def train_torch_reference(hp, pattern_dir: str, tts_steps: int,
                          ge2e_steps: int, seed: int = 0, lr: float = 1e-3,
                          log=print):
    """Reference recipe in torch: GE2E pretrain (SGD-momentum, grad-scaled
    w/b, clip 3.0 — mirroring train/ge2e_trainer.py), then frozen-encoder
    teacher-forced TTS training (Adam, clip 1.0). Returns (taco, ge2e)."""
    torch = _torch()
    from multi_speaker_tts_tpu.convert.reference_torch import (
        build_reference_ge2e, build_reference_tacotron,
    )
    from multi_speaker_tts_tpu.data.datasets import (
        BucketBatcher, GE2EBatchSampler, PatternDataset,
    )

    torch.manual_seed(seed)
    ds = PatternDataset(pattern_dir)

    # --- GE2E pretrain -----------------------------------------------------
    ge2e = build_reference_ge2e(hp)
    N = int(hp.GE2E_Train.Batch_Speakers)
    M = int(hp.GE2E_Train.Batch_Utterances)
    w = torch.nn.Parameter(torch.tensor(
        float(hp.Speaker_Embedding.GE2E.Loss.Initial_Weight)))
    b = torch.nn.Parameter(torch.tensor(
        float(hp.Speaker_Embedding.GE2E.Loss.Initial_Bias)))
    opt = torch.optim.SGD(
        list(ge2e.parameters()) + [w, b],
        lr=float(hp.GE2E_Train.Learning_Rate), momentum=0.9,
    )
    scale = float(hp.GE2E_Train.get("Scale_Gradient", 0.01))
    sampler = GE2EBatchSampler(ds, N, M, int(hp.GE2E_Train.Frame_Length),
                               seed=seed)
    ge2e.train()
    for step in range(1, ge2e_steps + 1):
        mels = torch.from_numpy(sampler.sample()["mels"])
        emb = ge2e(mels).reshape(N, M, -1)
        loss = torch_ge2e_loss(emb, w, b)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(
            list(ge2e.parameters()) + [w, b], 3.0)
        with torch.no_grad():
            w.grad *= scale
            b.grad *= scale
        opt.step()
        with torch.no_grad():
            w.clamp_(min=1e-6)
        if step % 50 == 0 or step == ge2e_steps:
            log(f"torch GE2E step {step}/{ge2e_steps} loss {loss.item():.4f}")
    ge2e.eval()

    # --- frozen-encoder TTS training ----------------------------------------
    taco = build_reference_tacotron(hp)
    r = int(hp.Decoder.get("N_Frames_Per_Step", 1))
    lh = hp.get("Linear_Head")
    use_linear = lh is not None and lh.Use
    batcher = BucketBatcher(
        ds,
        batch_size=int(hp.Train.Batch_Size),
        token_buckets=list(hp.Train.Batch_Bucketing.Token_Buckets),
        mel_buckets=list(hp.Train.Batch_Bucketing.Mel_Buckets),
        mel_dim=int(hp.Sound.Mel_Dim),
        n_frames_per_step=r,
        ref_window=int(hp.Speaker_Embedding.GE2E.Window_Length),
        spect_dim=int(hp.Sound.Spectrogram_Dim) if use_linear else None,
        seed=seed,
    )
    if not batcher.assignment:
        raise ValueError(
            f"no utterances fit the buckets (token {batcher.token_buckets}, "
            f"mel {batcher.mel_buckets}); {batcher.n_dropped} dropped"
        )
    opt = torch.optim.Adam(taco.parameters(), lr=lr)
    taco.train()
    step = 0
    while step < tts_steps:
        for _, batch in batcher:
            if step >= tts_steps:
                break
            tokens = torch.from_numpy(batch["tokens"]).long()
            token_lengths = torch.from_numpy(batch["token_lengths"]).long()
            mels = torch.from_numpy(batch["mels"])
            mel_lengths = torch.from_numpy(batch["mel_lengths"]).long()
            spects = (torch.from_numpy(batch["spects"])
                      if use_linear else None)
            with torch.no_grad():
                spk = ge2e(torch.from_numpy(batch["ref_mels"]))
            out = taco(tokens, token_lengths, mels, spk)
            losses = torch_tacotron_losses(
                out, mels, mel_lengths, token_lengths, spects, r)
            opt.zero_grad()
            losses["total"].backward()
            torch.nn.utils.clip_grad_norm_(taco.parameters(), 1.0)
            opt.step()
            step += 1
            if step % 50 == 0 or step == tts_steps:
                log(f"torch TTS step {step}/{tts_steps} "
                    f"total {losses['total'].item():.4f} "
                    f"mel_post {losses['mel_post'].item():.4f}")
    taco.eval()
    return taco, ge2e


# --------------------------------------------------------------------------
# evaluation on identical batches
# --------------------------------------------------------------------------

def _np_masked_l1(pred, target, mel_lengths):
    B, T, _ = target.shape
    mask = (np.arange(T)[None, :] < mel_lengths[:, None]).astype(np.float32)
    err = np.abs(pred - target) * mask[..., None]
    return float(err.sum() / max(mask.sum() * target.shape[-1], 1.0))


def _np_stop_accuracy(logits, mel_lengths, r):
    n_steps = logits.shape[1]
    lengths_steps = np.ceil(mel_lengths / r).astype(np.int64)
    steps = np.arange(n_steps)[None, :]
    target = steps >= (lengths_steps[:, None] - 1)
    valid = steps < lengths_steps[:, None]
    pred = logits >= 0.0  # sigmoid >= 0.5
    return float(((pred == target) & valid).sum() / max(valid.sum(), 1))


def compare_on_identical_batches(hp, taco, ge2e, pattern_dir: str,
                                 n_batches: int = 8, seed: int = 0):
    """Save the trained torch models reference-style, convert, and evaluate
    both frameworks on the SAME collated numpy batches (eval mode, prenet
    dropout 0 on both sides so the comparison is deterministic).

    Returns a report dict with per-framework metrics, their absolute
    deltas, and the elementwise max |torch - jax| per output key."""
    import tempfile

    import jax
    import jax.numpy as jnp

    torch = _torch()
    from multi_speaker_tts_tpu.convert.mapping import convert_full_checkpoint
    from multi_speaker_tts_tpu.convert.reference_torch import (
        build_reference_ge2e, build_reference_tacotron,
        save_reference_checkpoint,
    )
    from multi_speaker_tts_tpu.data.datasets import BucketBatcher, PatternDataset
    from multi_speaker_tts_tpu.evaluate import attention_diagonality
    from multi_speaker_tts_tpu.models import GE2E, Tacotron

    hp_eval = hp.replace(Decoder={"Prenet": {"Dropout_Rate": 0.0}})
    r = int(hp.Decoder.get("N_Frames_Per_Step", 1))
    lh = hp.get("Linear_Head")
    use_linear = lh is not None and lh.Use

    # Rebuild eval-config torch models and load the trained weights (the
    # dropout rate is baked into the module closures at build time).
    taco_eval = build_reference_tacotron(hp_eval)
    taco_eval.load_state_dict(taco.state_dict())
    taco_eval.eval()
    ge2e_eval = build_reference_ge2e(hp_eval)
    ge2e_eval.load_state_dict(ge2e.state_dict())
    ge2e_eval.eval()

    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/S_trained.pt"
        save_reference_checkpoint(path, tacotron=taco_eval, ge2e=ge2e_eval)
        converted = convert_full_checkpoint(path, hp_eval)

    taco_j = Tacotron.from_hp(hp_eval)
    ge2e_j = GE2E.from_hp(hp_eval)

    # Identical batches: collect ONCE (deterministic order + ref crops).
    batcher = BucketBatcher(
        PatternDataset(pattern_dir),
        batch_size=int(hp.Train.get("Eval_Batch_Size", 8)),
        token_buckets=list(hp.Train.Batch_Bucketing.Token_Buckets),
        mel_buckets=list(hp.Train.Batch_Bucketing.Mel_Buckets),
        mel_dim=int(hp.Sound.Mel_Dim),
        n_frames_per_step=r,
        ref_window=int(hp.Speaker_Embedding.GE2E.Window_Length),
        spect_dim=int(hp.Sound.Spectrogram_Dim) if use_linear else None,
        shuffle=False,
        seed=seed,
    )
    batches = []
    for _, batch in batcher:
        batches.append(batch)
        if len(batches) >= n_batches:
            break
    assert batches, f"no batches under {pattern_dir}"

    keys = ["mel_pre", "mel_post", "stop_logits", "alignments"]
    if use_linear:
        keys.append("linear")

    # One jitted program per side (all batches share the bucket shape); an
    # eager teacher-forced scan on CPU is minutes per batch.
    @jax.jit
    def jax_forward(tokens, token_lengths, mels, spk):
        return taco_j.apply(
            {"params": converted["params"]["tacotron"],
             "batch_stats": converted["batch_stats"]["tacotron"]},
            tokens, token_lengths, mels, spk, False,
            rngs={"prenet": jax.random.PRNGKey(0)},
        )

    @jax.jit
    def jax_embed(ref_mels):
        return ge2e_j.apply(
            {"params": converted["params"]["ge2e"]}, ref_mels)
    max_diff = {k: 0.0 for k in keys + ["speaker_embedding"]}
    m_t = {"mel_l1_pre": [], "mel_l1_post": [], "stop_accuracy": [], "diag": []}
    m_j = {k: [] for k in m_t}

    for batch in batches:
        with torch.no_grad():
            spk_t = ge2e_eval(torch.from_numpy(batch["ref_mels"])).numpy()
            out_t = taco_eval(
                torch.from_numpy(batch["tokens"]).long(),
                torch.from_numpy(batch["token_lengths"]).long(),
                torch.from_numpy(batch["mels"]),
                torch.from_numpy(spk_t),
            )
            out_t = {k: v.numpy() for k, v in out_t.items()}
        spk_j = np.asarray(jax.device_get(jax_embed(
            jnp.asarray(batch["ref_mels"]))))
        out_j = jax_forward(
            jnp.asarray(batch["tokens"]),
            jnp.asarray(batch["token_lengths"]),
            jnp.asarray(batch["mels"]),
            jnp.asarray(spk_j),
        )
        out_j = {k: np.asarray(jax.device_get(v), np.float32)
                 for k, v in out_j.items()}

        max_diff["speaker_embedding"] = max(
            max_diff["speaker_embedding"], float(np.abs(spk_t - spk_j).max()))
        for k in keys:
            max_diff[k] = max(
                max_diff[k], float(np.abs(out_t[k] - out_j[k]).max()))

        for side, out in (("t", out_t), ("j", out_j)):
            m = m_t if side == "t" else m_j
            m["mel_l1_pre"].append(_np_masked_l1(
                out["mel_pre"], batch["mels"], batch["mel_lengths"]))
            m["mel_l1_post"].append(_np_masked_l1(
                out["mel_post"], batch["mels"], batch["mel_lengths"]))
            m["stop_accuracy"].append(_np_stop_accuracy(
                out["stop_logits"], batch["mel_lengths"], r))
            m["diag"].append(attention_diagonality(
                out["alignments"], batch["token_lengths"],
                batch["mel_lengths"], r))

    report = {
        "n_batches": len(batches),
        "elementwise_max_abs_diff": {k: round(v, 8)
                                     for k, v in max_diff.items()},
        "torch": {k: round(float(np.mean(v)), 6) for k, v in m_t.items()},
        "jax_converted": {k: round(float(np.mean(v)), 6)
                          for k, v in m_j.items()},
    }
    report["metric_abs_delta"] = {
        k: round(abs(report["torch"][k] - report["jax_converted"][k]), 8)
        for k in m_t
    }
    return report


def main() -> None:
    """Demo-scale run for demo/RESULTS.md: train the torch reference on the
    committed demo-corpus recipe (serving width, CPU torch), convert, and
    write the side-by-side quality report.

        python tools/torch_parity.py -out /tmp/torch_parity \
            [-steps 300] [-ge2e_steps 300] [-report demo/report_torch_parity.json]
    """
    import argparse
    import json
    import pathlib
    import sys
    import time

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "demo"))
    from train_serving import serving_hp

    from multi_speaker_tts_tpu.data import generate_synthetic_dataset

    parser = argparse.ArgumentParser()
    parser.add_argument("-out", required=True)
    parser.add_argument("-steps", type=int, default=300)
    parser.add_argument("-ge2e_steps", type=int, default=300)
    parser.add_argument("-batches", type=int, default=8)
    parser.add_argument("-report", default=None)
    args = parser.parse_args()

    # Numerics check belongs on the CPU backend: TPU matmuls default to
    # bf16, which would hide converter bugs behind ~1e-2 rounding. (The
    # site hook pins JAX_PLATFORMS=axon, so force via config.)
    import jax

    jax.config.update("jax_platforms", "cpu")

    t0 = time.perf_counter()

    def stage(msg):
        print(f"[torch_parity +{time.perf_counter() - t0:.0f}s] {msg}",
              flush=True)

    hp = serving_hp(r=1)
    out = pathlib.Path(args.out)
    corpus = out / "corpus"
    if not (corpus / "patterns").exists():
        stage("generating demo-recipe corpus (6 speakers)")
        generate_synthetic_dataset(hp, corpus, n_speakers=6, n_utterances=20)
    stage(f"training torch reference (GE2E {args.ge2e_steps} + TTS "
          f"{args.steps} steps, CPU)")
    taco, ge2e = train_torch_reference(
        hp, str(corpus / "patterns"), tts_steps=args.steps,
        ge2e_steps=args.ge2e_steps, log=stage,
    )
    stage("converting + comparing on identical batches")
    report = compare_on_identical_batches(
        hp, taco, ge2e, str(corpus / "patterns"), n_batches=args.batches)
    report["tts_steps"] = args.steps
    report["ge2e_steps"] = args.ge2e_steps
    report["width"] = "serving"
    text = json.dumps(report, indent=2)
    (out / "report_torch_parity.json").write_text(text)
    if args.report:
        pathlib.Path(args.report).write_text(text)
    print("REPORT " + json.dumps(report))


if __name__ == "__main__":
    import os
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    main()

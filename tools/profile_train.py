"""Capture + summarize a device trace of the full-size train step.

PROFILE.md's step-budget tables were produced by hand from TensorBoard;
this tool makes that workflow reproducible: it jits the exact bench
workload (``bench.py::_bench_train`` shapes), captures a ``jax.profiler``
trace of a few steps on the real TPU, and aggregates per-op SELF time by
HLO category via xprof's ``framework_op_stats`` converter — the same
numbers the TensorBoard profile plugin shows, without the UI.

Usage::

    python tools/profile_train.py [-b 96] [-r 2] [-steps 4] [-out DIR]
    python tools/profile_train.py -summarize DIR   # re-parse an old trace

Prints a per-category ms/step table and a top-N op table (with source
lines), then one JSON line for scripting.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def capture(out_dir: str, batch_size: int, n_steps: int, r: int | None,
            synthesis: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    from multi_speaker_tts_tpu.hparams import default_hparams
    from multi_speaker_tts_tpu.train import trainer as trainer_lib

    hp = default_hparams()
    if r is not None:
        hp = hp.replace(Decoder={"N_Frames_Per_Step": int(r)})
    if synthesis:
        return _capture_synthesis(out_dir, batch_size, n_steps, hp)
    models = trainer_lib.build_models(hp)
    B = batch_size
    rr = int(hp.Decoder.get("N_Frames_Per_Step", 1))
    S, T = 100, 400 - (400 % rr)
    rng = np.random.default_rng(0)
    batch = {
        "tokens": rng.integers(2, 30, size=(B, S)).astype(np.int32),
        "token_lengths": np.full((B,), S, np.int32),
        "mels": rng.uniform(0, 1, size=(B, T, hp.Sound.Mel_Dim)).astype(np.float32),
        "mel_lengths": np.full((B,), T, np.int32),
        "spects": rng.uniform(
            0, 1, size=(B, T, hp.Sound.Spectrogram_Dim)
        ).astype(np.float32),
        "ref_mels": rng.uniform(
            0, 1,
            size=(B, hp.Speaker_Embedding.GE2E.Window_Length, hp.Sound.Mel_Dim),
        ).astype(np.float32),
        "speaker_ids": np.zeros((B,), np.int32),
    }
    state = trainer_lib.init_state(hp, models, jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer_lib.make_train_step(hp, models), donate_argnums=0)
    bd = jax.tree.map(jnp.asarray, batch)
    key = jax.random.PRNGKey(1)

    print(f"[profile] warmup (B={B}, r={rr}, S={S}, T={T})")
    for _ in range(2):
        state, m = step(state, bd, key)
    float(m["total"])  # sync (block_until_ready is a no-op on the tunnel)

    print(f"[profile] tracing {n_steps} steps -> {out_dir}")
    with jax.profiler.trace(out_dir):
        for _ in range(n_steps):
            state, m = step(state, bd, key)
        float(m["total"])


def _capture_synthesis(out_dir: str, batch_size: int, n_steps: int,
                       hp) -> None:
    """Trace bench.py's constant-workload synthesis path (enroll -> fixed
    400-frame decode -> Griffin-Lim), the headline-metric program."""
    import jax
    import jax.numpy as jnp

    from multi_speaker_tts_tpu.audio import dsp
    from multi_speaker_tts_tpu.ops import stft_matmul
    from multi_speaker_tts_tpu.train import trainer as trainer_lib

    cfg = dsp.DSPConfig.from_hp(hp)
    models = trainer_lib.build_models(hp)
    r = int(hp.Decoder.get("N_Frames_Per_Step", 1))
    B, S = batch_size, 64
    max_steps = 400 - (400 % r)
    rng = np.random.default_rng(0)
    init_batch = {
        "tokens": rng.integers(2, 30, size=(B, S)).astype(np.int32),
        "token_lengths": np.full((B,), S, np.int32),
        "mels": rng.uniform(0, 1, size=(B, 12 * r, hp.Sound.Mel_Dim)).astype(
            np.float32),
        "ref_mels": rng.uniform(
            0, 1,
            size=(B, hp.Speaker_Embedding.GE2E.Window_Length, hp.Sound.Mel_Dim),
        ).astype(np.float32),
    }
    state = trainer_lib.init_state(hp, models, jax.random.PRNGKey(0), init_batch)

    @jax.jit
    def synthesize(params, batch_stats, tokens, token_lengths, ref_mels, key):
        spk = models.ge2e.apply({"params": params["ge2e"]}, ref_mels)
        out = models.tacotron.apply(
            {"params": params["tacotron"], "batch_stats": batch_stats["tacotron"]},
            tokens, token_lengths, spk, max_steps, 1.5, False,
            method=models.tacotron.infer, rngs={"prenet": key},
        )
        S_db = dsp.denormalize(out["linear"], cfg.min_level_db)
        mag = dsp.db_to_amp(S_db + cfg.ref_level_db)
        wav = stft_matmul.griffin_lim_auto(
            mag**cfg.power, cfg.n_fft, cfg.hop, cfg.griffin_lim_iter,
            cfg.hop * (mag.shape[-2] - 1), precision="highest",
        )
        return jnp.abs(dsp.inv_preemphasis(wav, cfg.preemphasis)).mean()

    args = (state.params, state.batch_stats,
            jnp.asarray(init_batch["tokens"]),
            jnp.asarray(init_batch["token_lengths"]),
            jnp.asarray(init_batch["ref_mels"]), jax.random.PRNGKey(1))
    print(f"[profile] warmup synthesis (B={B}, r={r}, {max_steps} frames)")
    for _ in range(2):
        probe = synthesize(*args)
    float(probe)
    print(f"[profile] tracing {n_steps} synthesis calls -> {out_dir}")
    with jax.profiler.trace(out_dir):
        for _ in range(n_steps):
            probe = synthesize(*args)
        float(probe)


# Substrings mapping op names/sources to PROFILE.md's budget rows; first
# match wins, so order matters.
_BUCKETS = (
    ("decoder fwd scan", ("decoder_scan", "while")),
    ("ge2e wavefront", ("wavefront",)),
    ("bilstm/bigru scans", ("bilstm", "bigru", "gru.py", "lstm.py")),
    ("convs", ("conv",)),
    ("gemms (dW + hoisted)", ("dot", "einsum", "matmul")),
)


def summarize(out_dir: str, n_steps: int, top: int = 25) -> dict:
    paths = sorted(glob.glob(
        os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True
    ))
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {out_dir}")
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "framework_op_stats", {}
    )
    # gviz JSON: a LIST of two near-duplicate {cols, rows} tables (with and
    # without IDLE rows); using both double-counts every op, so parse only
    # the first. rows = [{"c": [{"v": ...}, ...]}] keyed by col id.
    tables = json.loads(data.decode() if isinstance(data, bytes) else data)
    table = tables[0]
    ids = [c["id"] for c in table["cols"]]
    rows = [
        {k: (cell or {}).get("v") for k, cell in zip(ids, r["c"])}
        for r in table["rows"]
    ]
    per_cat: dict[str, float] = {}
    per_op: dict[str, tuple[float, str]] = {}
    total_us = 0.0
    for row in rows:
        if str(row.get("host_or_device", "")).lower() != "device":
            continue
        self_us = float(row.get("total_self_time") or 0.0)
        cat = row.get("type") or "?"
        op = row.get("operation") or "?"
        per_cat[cat] = per_cat.get(cat, 0.0) + self_us
        prev = per_op.get(op, (0.0, ""))
        per_op[op] = (prev[0] + self_us, cat)
        total_us += self_us
    ms = 1e3 * n_steps  # us -> ms/step divisor

    print(f"\n== per-HLO-category self time (ms/step, {n_steps} steps) ==")
    cat_ms = {}
    for cat, us in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        cat_ms[cat] = round(us / ms, 3)
        print(f"  {us / ms:8.3f}  {cat}")
    print(f"  {total_us / ms:8.3f}  TOTAL device")

    print(f"\n== top {top} ops by self time (ms/step) ==")
    for op, (us, cat) in sorted(per_op.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"  {us / ms:8.3f}  [{cat:>18s}] {op[:90]}")

    # PROFILE.md budget rows: first matching substring wins; remainder is
    # "other" (optimizer, losses, formatting, small fusions).
    bucket_us = {name: 0.0 for name, _ in _BUCKETS}
    bucket_us["other"] = 0.0
    for op, (us, _cat) in per_op.items():
        low = op.lower()
        for name, subs in _BUCKETS:
            if any(s in low for s in subs):
                bucket_us[name] += us
                break
        else:
            bucket_us["other"] += us
    print("\n== PROFILE.md budget rows (ms/step) ==")
    bucket_ms = {}
    for name, us in sorted(bucket_us.items(), key=lambda kv: -kv[1]):
        bucket_ms[name] = round(us / ms, 3)
        print(f"  {us / ms:8.3f}  {name}")

    return {"total_ms_per_step": round(total_us / ms, 3),
            "per_category_ms": cat_ms, "per_bucket_ms": bucket_ms}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("-b", "--batch", type=int, default=96)
    p.add_argument("-r", type=int, default=None,
                   help="override Decoder.N_Frames_Per_Step")
    p.add_argument("-steps", type=int, default=4)
    p.add_argument("-top", type=int, default=25)
    p.add_argument("-out", default=None, help="trace dir (default: tmp)")
    p.add_argument("-summarize", default=None, metavar="DIR",
                   help="skip capture; parse an existing trace dir")
    p.add_argument("-synthesis", action="store_true",
                   help="trace the constant-workload synthesis path instead")
    args = p.parse_args()

    if args.summarize:
        result = summarize(args.summarize, args.steps, args.top)
    else:
        kind = "synth" if args.synthesis else "profile"
        out_dir = args.out or f"/tmp/mstts_{kind}_b{args.batch}"
        capture(out_dir, args.batch, args.steps, args.r, args.synthesis)
        result = summarize(out_dir, args.steps, args.top)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

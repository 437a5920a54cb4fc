"""Convert a reference-style torch checkpoint into a servable artifact.

    python -m multi_speaker_tts_tpu.convert \
        -in S_100000.pt -hp Hyper_Parameters.yaml -out converted.msgpack

One command from the reference's ``torch.save`` file (SURVEY.md section 5
"Checkpoint / resume") to this framework's compact single-file inference
checkpoint: ``Synthesizer.from_compact(out)`` / the inference CLI load it
directly. The mapping table lives in ``convert/mapping.py``; every rule is
forward-parity-tested in ``tests/test_convert_e2e.py``.
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(
        description="torch checkpoint -> compact JAX serving checkpoint"
    )
    parser.add_argument("-in", dest="input", required=True,
                        help="reference torch checkpoint (.pt)")
    parser.add_argument("-hp", "--hyper_parameters", default=None,
                        help="the checkpoint's hparams YAML (the reference "
                             "and this framework share the format)")
    parser.add_argument("-out", required=True,
                        help="output .msgpack compact checkpoint")
    parser.add_argument("-no_strict", action="store_true",
                        help="ignore unmapped torch keys instead of failing")
    args = parser.parse_args()

    from multi_speaker_tts_tpu.convert.mapping import convert_full_checkpoint
    from multi_speaker_tts_tpu.hparams import load_hyper_parameters
    from multi_speaker_tts_tpu.train.checkpoints import export_compact

    hp = load_hyper_parameters(args.hyper_parameters)
    tree = convert_full_checkpoint(args.input, hp, strict=not args.no_strict)
    meta = {"hp": hp.to_dict(), "source": args.input}
    if "step" in tree:
        meta["trained_steps"] = int(tree["step"])
    export_compact(args.out, tree["params"], tree.get("batch_stats", {}),
                   meta=meta)
    n = sum(
        v.size for v in _leaves(tree["params"])
    )
    print(f"wrote {args.out}: {n / 1e6:.2f}M params"
          + (f", step {tree['step']}" if "step" in tree else ""))


def _leaves(tree):
    import jax

    return jax.tree.leaves(tree)


if __name__ == "__main__":
    main()

"""Inference CLI — drop-in compatible with the reference's click interface
(reference infer.py:359-454), with TPU device auto-detection in place of CUDA.
"""

from __future__ import annotations

import sys
from pathlib import Path

import click

from ..config import load_raw_config


@click.command(help="Infer with WFL")
@click.argument("path", metavar="PATH")
@click.option("--checkpoint", "-ckpt", type=str, required=True,
              help="Path to WFL Checkpoint.")
@click.option("--config", "-c", type=str, required=True,
              help="Path to Config file.")
@click.option("--output", "-o", type=str, required=False, default=".",
              help="Path to output labels.")
@click.option("--lang-id", "-l", type=int, required=False, default=None,
              help="Language ID.")
@click.option("--sample", "-s", is_flag=True,
              help="Enable sampling instead of argmax")
@click.option("--top-k", "-tk", type=int, default=0,
              help="Top-K sampling (range: 1-20)")
@click.option("--top-p", "-tp", type=float, default=0.0,
              help="Top-P sampling (range: 0.1-1)")
@click.option("--temperature", "-temp", type=float, default=1.0,
              help="Sampling temperature (range: 0.1-2)")
@click.option("--device", "-d", type=str, default="auto",
              help='Device to use: "tpu" or "cpu". Auto-detects if not specified.')
@click.option("--confidence-threshold", "-ct", type=float, default=None,
              help="Suppress predictions with low confidence. Set 0 to disable.")
@click.option("--batch-size", "-b", type=int, default=1,
              help="Folder mode: batch this many files per forward "
                   "(TPU throughput mode; identical outputs).")
def main(path, checkpoint, config, output, lang_id, sample, top_k, top_p,
         temperature, device, confidence_threshold, batch_size):
    # Flag validation mirrors reference infer.py:377-391.
    if sample:
        if top_k <= 0 and top_p <= 0.0:
            print("Sampling is enabled but neither --top-k nor --top-p is set.")
            sys.exit(1)
        if top_k > 0 and top_p > 0.0:
            print("You can't use both --top-k and --top-p at the same time.")
            sys.exit(1)
        if top_k < 0:
            print("top-k must be ≥ 1.")
            sys.exit(1)
        if top_p < 0.0 or top_p > 1.0:
            print("top-p must be between 0.1 and 1.0.")
            sys.exit(1)
        if temperature <= 0.0:
            print("temperature must be greater than 0.")
            sys.exit(1)

    requested = device.lower()
    if requested == "auto":
        import jax
        platform = jax.devices()[0].platform
        device = "cpu" if platform == "cpu" else "tpu"
    elif requested.startswith("cuda"):
        print("Warning: CUDA not available in the TPU build, using the "
              "default JAX device.", file=sys.stderr)
        device = "tpu"
    elif requested == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
        device = "cpu"
    else:
        device = requested

    inf_path = Path(path)
    raw_cfg = load_raw_config(config)
    if confidence_threshold is None:
        confidence_threshold = raw_cfg.get("postprocess", {}) \
            .get("confidence_threshold", 0.0)

    if output == ".":
        # The reference sets output_path to the input path itself here
        # (infer.py:410-411), which for a single file overwrites the .wav
        # with label text. Deviation: default single-file output goes to the
        # sibling .lab instead.
        output_path = (inf_path if inf_path.is_dir()
                       else inf_path.with_suffix(".lab"))
    else:
        output_path = output
    if not inf_path.exists():
        print(f"Unable to locate folder {inf_path}")
        sys.exit(1)
    if lang_id is not None and lang_id <= -1:
        lang_id = None

    from .pipeline import infer_audio, infer_folder, infer_folder_batched
    if inf_path.is_dir():
        if batch_size > 1:
            infer_folder_batched(
                folder_path=str(inf_path), config_path=str(config),
                checkpoint_path=str(checkpoint), output_dir=str(output_path),
                lang_id=lang_id, confidence_threshold=confidence_threshold,
                batch_files=batch_size)
        else:
            infer_folder(folder_path=str(inf_path), config_path=str(config),
                         checkpoint_path=str(checkpoint),
                         output_dir=str(output_path), device=device,
                         lang_id=lang_id, sample=sample, top_k=top_k,
                         top_p=top_p, temperature=temperature,
                         confidence_threshold=confidence_threshold)
    else:
        segments = infer_audio(
            audio_path=str(inf_path), config_path=str(config),
            checkpoint_path=str(checkpoint),
            output_lab_path=str(output_path), device=device, lang_id=lang_id,
            sample=sample, top_k=top_k, top_p=top_p, temperature=temperature,
            confidence_threshold=confidence_threshold)
        print("Predicted segments:")
        for start, end, ph in segments:
            print(f"({round(start, 2)}, {round(end, 2)}, {ph})")


if __name__ == "__main__":
    main()

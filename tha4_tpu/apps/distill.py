"""distill — train the per-character student models from a config file.

CLI-compatible with the reference (reference: src/tha4/app/distill.py:8-25):

  tha4-distill --config_file <prefix>/config.yaml

Interruptible at any time; rerunning the same command resumes from the newest
checkpoint/snapshot (the documented contract, reference docs/distill.md).
"""

from __future__ import annotations

import argparse
import logging
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config_file", required=True)
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--f32", dest="bf16", action="store_false")
    parser.add_argument(
        "--random-teacher",
        action="store_true",
        help="initialize the five teacher networks randomly at the shipped "
        "architecture instead of loading data/tha4/*.pt — for pipeline "
        "validation and wall-clock benchmarking when the pretrained teacher "
        "weights are not present (they are placeholders in some bundles). "
        "The trained students mimic a random teacher and are NOT usable "
        "character models; training cost is identical.",
    )
    parser.add_argument(
        "--face-examples",
        type=int,
        default=None,
        help="override the face student's total training examples "
        "(default: the reference's 1,000,000). Must be a multiple of the "
        "100k checkpoint cadence. Useful for bounded throughput runs.",
    )
    parser.add_argument(
        "--body-examples",
        type=int,
        default=None,
        help="override the body student's total training examples "
        "(default: the reference's 1,500,000). Must be a multiple of the "
        "100k checkpoint cadence.",
    )
    parser.add_argument(
        "--mixed",
        action="store_true",
        default=True,
        help="selective-f32 (mixed-precision) BODY student training: bf16 "
        "activations/matmul operands with f32 position grids, sine "
        "evaluation, accumulation and head (models/siren.py mixed mode). "
        "THE PRODUCTION DEFAULT since the round-5 dtype A/B: closes the "
        "bf16 grid-fidelity gap (grid L1 0.0908 -> 0.0177, f32 = 0.0152) "
        "at ~0-3%% step cost — see docs/perf.md 'training dtype' table.",
    )
    parser.add_argument(
        "--no-mixed",
        dest="mixed",
        action="store_false",
        help="plain-bf16 student training (the pre-round-5 default; 6x worse "
        "grid-change L1 than f32 on the measured A/B).",
    )
    parser.add_argument(
        "--only",
        choices=("all", "face", "body"),
        default="all",
        help="run only one student's training task from the DAG instead of "
        "the full pipeline (default: all).",
    )
    parser.add_argument(
        "--teacher-int8",
        action="store_true",
        help="run the frozen teacher with int8 convolutions (post-training "
        "quantization, calibrated once on the character image; ops/quant.py). "
        "~6%% faster distillation step; the distillation labels differ "
        "slightly from the bf16 teacher — see docs/perf.md for the measured "
        "fidelity/outcome numbers before enabling.",
    )
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")

    import jax.numpy as jnp

    from tha4_tpu.distiller.config import DistillerConfig
    from tha4_tpu.distiller.pipeline import run_config

    config = DistillerConfig.load(args.config_file)
    kwargs = {}
    if args.random_teacher:
        import jax

        from tha4_tpu.poser.modes import mode_07

        logging.warning("--random-teacher: training against a randomly initialized "
                        "teacher (full shipped architecture); outputs are for "
                        "pipeline/throughput validation only")
        kwargs["teacher_params_07"] = mode_07.init(
            jax.random.PRNGKey(0), mode_07.TeacherConfig()
        )
    if args.teacher_int8:
        kwargs["teacher_int8"] = True
    kwargs["student_mixed"] = args.mixed
    from tha4_tpu.distiller import recipes

    for name, value in (("face", args.face_examples), ("body", args.body_examples)):
        if value is None:
            continue
        if value <= 0 or value % recipes.EXAMPLES_PER_CHECKPOINT != 0:
            parser.error(
                f"--{name}-examples must be a positive multiple of "
                f"{recipes.EXAMPLES_PER_CHECKPOINT}"
            )
        kwargs[f"{name}_total_examples"] = value
    run_config(config, target=args.only,
               compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32, **kwargs)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""distiller_ui — create/edit a distillation config, then optionally train.

Headless equivalent of the reference wx config editor
(reference: src/tha4/app/distiller_ui.py + src/tha4/distiller/ui/): every
parameter the UI exposes is a flag; --interactive prompts for missing values;
--train runs the distillation after writing the config (the reference's
Train button exits the UI then runs run_config in-process).

Example:
  tha4-distill-config --prefix jobs/lambda --character char.png --mask mask.png --train
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--prefix", help="working directory for the distillation job")
    parser.add_argument("--character", help="512x512 RGBA character PNG")
    parser.add_argument("--mask", help="512x512 RGB 0/255 face mask PNG")
    parser.add_argument("--load", help="start from an existing config.yaml")
    parser.add_argument("--face-seed-0", type=int, default=None)
    parser.add_argument("--face-seed-1", type=int, default=None)
    parser.add_argument("--face-batch-size", type=int, default=None)
    parser.add_argument("--face-sample-cadence", type=int, default=None, choices=[10_000, 100_000, 1_000_000])
    parser.add_argument("--body-seed-0", type=int, default=None)
    parser.add_argument("--body-seed-1", type=int, default=None)
    parser.add_argument("--body-batch-size", type=int, default=None)
    parser.add_argument("--body-sample-cadence", type=int, default=None, choices=[10_000, 100_000, 1_000_000])
    parser.add_argument("--num-cpu-workers", type=int, default=None)
    parser.add_argument("--num-chips", type=int, default=None, help="data-parallel chips (reference: num_gpus)")
    parser.add_argument("--interactive", action="store_true", help="prompt for missing values")
    parser.add_argument("--train", action="store_true", help="run distillation after saving the config")
    parser.add_argument("--explain", metavar="PARAM", default=None,
                        help="print detailed documentation for a config parameter (or 'all') and exit — the reference's in-app HTML help corpus")
    args = parser.parse_args(argv)

    if args.explain is not None:
        from tha4_tpu.distiller.param_help import explain

        try:
            print(explain(args.explain))
        except KeyError as e:
            print(e.args[0], file=sys.stderr)
            return 2
        return 0

    from tha4_tpu.distiller.config import DistillerConfig

    def ask(prompt, current):
        if not args.interactive:
            return current
        reply = input(f"{prompt} [{current}]: ").strip()
        return reply or current

    if args.load:
        config = DistillerConfig.load(args.load)
    else:
        prefix = args.prefix or ask("Working directory (prefix)", "")
        character = args.character or ask("Character image PNG", "")
        mask = args.mask or ask("Face mask PNG", "")
        if not (prefix and character and mask):
            parser.error("--prefix, --character and --mask are required (or use --interactive/--load)")
        os.makedirs(prefix, exist_ok=True)
        config = DistillerConfig(
            prefix=prefix,
            character_image_file_name=character,
            face_mask_image_file_name=mask,
        )

    overrides = {
        "face_morpher_random_seed_0": args.face_seed_0,
        "face_morpher_random_seed_1": args.face_seed_1,
        "face_morpher_batch_size": args.face_batch_size,
        "face_morpher_num_training_examples_per_sample_output": args.face_sample_cadence,
        "body_morpher_random_seed_0": args.body_seed_0,
        "body_morpher_random_seed_1": args.body_seed_1,
        "body_morpher_batch_size": args.body_batch_size,
        "body_morpher_num_training_examples_per_sample_output": args.body_sample_cadence,
        "num_cpu_workers": args.num_cpu_workers,
        "num_gpus": args.num_chips,
    }
    config = dataclasses.replace(config, **{k: v for k, v in overrides.items() if v is not None})

    config.check()
    config.save(config.config_yaml_file_name())
    print(f"Wrote {config.config_yaml_file_name()}")

    if args.train:
        from tha4_tpu.distiller.pipeline import run_config

        run_config(config)
    return 0


if __name__ == "__main__":
    sys.exit(main())

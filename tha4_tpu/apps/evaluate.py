"""tha4-eval — fidelity evaluation of a character model.

Renders a deterministic pose suite through this framework and (when the
original PyTorch implementation is importable) side by side through it,
reporting PSNR, windowed SSIM, and a self-contained random-feature
perceptual proxy (utils/fidelity.lpips_proxy; pass --lpips-weights for true
AlexNet-LPIPS) — the BASELINE parity check as a command.

--dtype bf16 evaluates the PRODUCTION fast path (the puppeteer/bench
configuration) against the f32 torch reference, so the headline fps number
can be quoted together with its measured fidelity.

Examples:
  tha4-eval --model data/character_models/lambda_00/character_model.yaml --poses 16
  tha4-eval --model a/character_model.yaml --against b/character_model.yaml
  tha4-eval --model a/character_model.yaml --dtype bf16
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--model", required=True, help="character_model.yaml")
    parser.add_argument("--against", default=None,
                        help="second character_model.yaml to compare with (default: the PyTorch reference implementation on the same model)")
    parser.add_argument("--poses", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--reference-src", default="/root/reference/src")
    parser.add_argument("--lpips-weights", default=None,
                        help="state dict of lpips.LPIPS(net='alex') for TRUE LPIPS; without it the self-contained random-feature proxy is still reported")
    parser.add_argument("--dtype", choices=("f32", "bf16"), default="f32",
                        help="compute dtype for THIS framework's poser (bf16 = the production fast path)")
    parser.add_argument("--matmul-precision", choices=("default", "high", "highest"), default=None,
                        help="MXU multiply precision override (default: highest for f32, default for bf16)")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from tha4_tpu.charmodel import CharacterModel
    from tha4_tpu.utils import fidelity

    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[args.dtype]

    if args.against is not None:
        a = CharacterModel.load(args.model)
        b = CharacterModel.load(args.against)
        poses = fidelity.random_pose_suite(args.poses, args.seed)
        stats = fidelity.compare_posers(
            a.get_poser(compute_dtype=dtype, matmul_precision=args.matmul_precision),
            b.get_poser(), a.get_character_image(), poses,
            lpips_weights=args.lpips_weights,
        )
    else:
        stats = fidelity.compare_with_reference(
            args.model, num_poses=args.poses, reference_src=args.reference_src,
            seed=args.seed, lpips_weights=args.lpips_weights,
            compute_dtype=dtype, matmul_precision=args.matmul_precision,
        )
        if stats is None:
            print("reference implementation not found; use --against", file=sys.stderr)
            return 2
    stats["dtype"] = args.dtype
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())

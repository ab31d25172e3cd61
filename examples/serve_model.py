"""Export a trained model for serving and run inference from the artifact.

The stronger analogue of the reference's ``model.save('model.h5')`` +
``load_model`` round trip (``TPUs_in_Colab.ipynb`` cell 42): the compiled
StableHLO computation is serialized next to the params, so the serving
process needs no model code.

    python examples/serve_model.py --checkpoint models/best-checkpoint \
        --model lite --out exported/
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from vit_unet_tpu.models.vit_unet import get_vit_unet
from vit_unet_tpu.serving import export_predictor, load_predictor


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="lite")
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir (Fitter.save layout); "
                        "random init if omitted")
    p.add_argument("--out", default="exported")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--flash", action="store_true")
    args = p.parse_args(argv)

    model = get_vit_unet(args.model, use_flash=args.flash)
    cfg = model.config
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 3, cfg.im_size, cfg.im_size)))
    if args.checkpoint:
        import orbax.checkpoint as ocp
        import os
        ckptr = ocp.StandardCheckpointer()
        template = {"params": variables["params"],
                    "opt_state": None, "batch_stats": variables.get(
                        "batch_stats", {}),
                    "step": jnp.zeros((), jnp.int32), "rng": None}
        restored = ckptr.restore(os.path.abspath(args.checkpoint),
                                 template)
        variables = {"params": restored["params"]}
        if restored["batch_stats"]:
            variables["batch_stats"] = restored["batch_stats"]

    export_predictor(model, variables, args.out, batch_size=args.batch_size)
    print(f"exported to {args.out}")

    fn = load_predictor(args.out)
    x = np.random.default_rng(0).normal(
        size=(args.batch_size, 3, cfg.im_size, cfg.im_size)).astype(np.float32)
    out = np.asarray(fn(x))
    print(f"served inference OK: {x.shape} -> {out.shape}")


if __name__ == "__main__":
    main()

"""Golden-number regression harness for released reference checkpoints.

The reference's de-facto regression test is the expected-EPE comments in
`adjusted_gmflow/scripts/evaluate.sh:8-36` — run manually, never asserted.
This harness makes them a checked contract: given the datasets and a
checkpoint (a reference `.pth`, ported on the fly, or a `.npz` written by
`tools/port_torch_weights.py`), run the validators and assert each metric
against its golden value.

    python -m opticalflowfromdepth_tpu.tools.golden_check \
        --model gmflow --ckpt gmflow_chairs_things.pth \
        --data_root datasets --datasets things_clean,sintel_clean \
        --tol 0.03

Exit code 0 iff every requested metric is within tolerance.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Callable, Dict, Tuple

# golden values: metric -> (EPE, validator key), from
# `adjusted_gmflow/scripts/evaluate.sh:8-36`
GOLDEN: Dict[str, Dict[str, float]] = {
    "gmflow": {            # C+T checkpoint, no refinement (lines 8-14)
        "things_clean": 3.475,
        "sintel_clean": 1.495,
        "sintel_final": 2.955,
    },
    "gmflow_refine": {     # C+T checkpoint with refinement (lines 29-36)
        "things_clean": 2.804,
        "sintel_clean": 1.084,
        "sintel_final": 2.475,
    },
}

# per-model forward recipes (`scripts/evaluate.sh`: --num_scales etc.)
RECIPES = {
    "gmflow": dict(num_scales=1, upsample_factor=8,
                   attn_splits_list=(2,), corr_radius_list=(-1,),
                   prop_radius_list=(-1,), padding_factor=16),
    "gmflow_refine": dict(num_scales=2, upsample_factor=4,
                          attn_splits_list=(2, 8),
                          corr_radius_list=(-1, 4),
                          prop_radius_list=(-1, 1), padding_factor=32),
}


def load_params(ckpt: str, num_scales: int):
    """Flax params from a ported .npz or a raw reference .pth."""
    import jax.numpy as jnp
    import numpy as np
    from flax import traverse_util as tu

    if ckpt.endswith(".npz"):
        flat = np.load(ckpt)
        tree = {}
        for key in flat.files:
            parts = tuple(key.split("/"))
            assert parts[0] == "params", key
            tree[parts[1:]] = jnp.asarray(flat[key])
        return tu.unflatten_dict(tree)

    from .port_torch_weights import load_torch_checkpoint, port_gmflow
    sd = load_torch_checkpoint(ckpt)
    flat = port_gmflow(sd, num_scales=num_scales)
    return tu.unflatten_dict({k: jnp.asarray(v) for k, v in flat.items()})


def make_infer_fn(model_name: str, params) -> Tuple[Callable, int]:
    import jax
    import jax.numpy as jnp

    from ..models.gmflow import GMFlow

    r = RECIPES[model_name]
    model = GMFlow(num_scales=r["num_scales"],
                   upsample_factor=r["upsample_factor"])

    @jax.jit
    def fwd(params, im1, im2):
        return model.apply({"params": params}, im1, im2,
                           attn_splits_list=r["attn_splits_list"],
                           corr_radius_list=r["corr_radius_list"],
                           prop_radius_list=r["prop_radius_list"],
                           training=False)["flow_preds"][-1]

    def infer_fn(im1, im2):
        return fwd(params, jnp.asarray(im1, jnp.float32),
                   jnp.asarray(im2, jnp.float32))

    return infer_fn, r["padding_factor"]


def run_check(model_name: str, infer_fn: Callable, padding_factor: int,
              data_root: str, dataset_keys, tol: float,
              golden=None) -> Dict[str, Dict[str, float]]:
    """Run each requested validator, compare to golden. Pure of I/O policy
    so tests can inject fake validators via monkeypatching `VALIDATORS`."""
    golden = golden if golden is not None else GOLDEN[model_name]
    results = {}
    for key in dataset_keys:
        expected = golden[key]
        measured = VALIDATORS[key](infer_fn, data_root, padding_factor)
        results[key] = {
            "expected": expected,
            "measured": round(measured, 4),
            "abs_err": round(abs(measured - expected), 4),
            "ok": abs(measured - expected) <= tol,
        }
    return results


def _v_things(infer_fn, root, pf):
    from ..eval.validators import validate_things
    return validate_things(infer_fn, root=root, dstype="frames_cleanpass",
                           padding_factor=pf)["things_clean_epe"]


def _v_sintel(dstype):
    def v(infer_fn, root, pf):
        from ..eval.validators import validate_sintel
        return validate_sintel(infer_fn, root=root, dstype=dstype,
                               padding_factor=pf)[f"sintel_{dstype}_epe"]
    return v


VALIDATORS = {
    "things_clean": _v_things,
    "sintel_clean": _v_sintel("clean"),
    "sintel_final": _v_sintel("final"),
}


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", choices=sorted(GOLDEN), required=True)
    ap.add_argument("--ckpt", required=True, help=".pth or ported .npz")
    ap.add_argument("--data_root", default="datasets")
    ap.add_argument("--datasets", default=None,
                    help="comma list (default: all golden metrics)")
    ap.add_argument("--tol", type=float, default=0.03,
                    help="absolute EPE tolerance (covers bf16-free f32 "
                    "eval numerics + resize differences)")
    args = ap.parse_args(argv)

    keys = (args.datasets.split(",") if args.datasets
            else sorted(GOLDEN[args.model]))
    params = load_params(args.ckpt, RECIPES[args.model]["num_scales"])
    infer_fn, pf = make_infer_fn(args.model, params)
    results = run_check(args.model, infer_fn, pf, args.data_root, keys,
                        args.tol)
    print(json.dumps({"model": args.model, "results": results}, indent=2))
    if not all(r["ok"] for r in results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()

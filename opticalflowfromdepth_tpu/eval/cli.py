"""Evaluation CLI — the `adjusted_RAFT/evaluate.py` / `adjusted_gmflow`
eval entry point.

    python -m opticalflowfromdepth_tpu.eval.cli --model gmflow \
        --ckpt runs/gmflow/checkpoints/step_100000_weights \
        --val sintel kitti --data_root datasets [--count_time]

    # inference on a frame directory (demo.py / inference_on_dir parity)
    python -m opticalflowfromdepth_tpu.eval.cli --model gmflow --ckpt ... \
        --inference_dir path/to/frames --output_path output \
        --pred_bidir_flow --fwd_bwd_consistency_check

    # submissions
    python -m opticalflowfromdepth_tpu.eval.cli --model raft --ckpt ... \
        --submission sintel --output_path sintel_submission
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", choices=("raft", "gmflow"), required=True)
    p.add_argument("--ckpt", required=True,
                   help="orbax weights dir (from train.cli checkpoints)")
    p.add_argument("--data_root", default="datasets")
    p.add_argument("--val", nargs="*", default=[])
    p.add_argument("--sintel_dstype", default="clean")
    p.add_argument("--with_speed_metric", action="store_true")
    p.add_argument("--count_time", action="store_true")
    p.add_argument("--evaluate_matched_unmatched", action="store_true",
                   help="matched/unmatched EPE via Sintel occlusion maps")
    p.add_argument("--iters", type=int, default=24)
    p.add_argument("--small", action="store_true")
    p.add_argument("--corr_impl", choices=("pyramid", "fused"),
                   default="pyramid",
                   help="RAFT correlation path: 'pyramid' (bit-matched "
                        "to the torch oracle) or the 'fused' Pallas "
                        "kernel (faster on TPU; the training default)")
    p.add_argument("--num_scales", type=int, default=1)
    p.add_argument("--upsample_factor", type=int, default=8)
    p.add_argument("--attn_splits_list", type=int, nargs="+", default=[2])
    p.add_argument("--corr_radius_list", type=int, nargs="+", default=[-1])
    p.add_argument("--prop_radius_list", type=int, nargs="+", default=[-1])
    p.add_argument("--padding_factor", type=int, default=8)
    p.add_argument("--inference_dir", default=None)
    p.add_argument("--output_path", default="output")
    p.add_argument("--paired_data", action="store_true")
    p.add_argument("--save_flo_flow", action="store_true")
    p.add_argument("--pred_bidir_flow", action="store_true")
    p.add_argument("--fwd_bwd_consistency_check", action="store_true")
    p.add_argument("--submission", choices=("sintel", "kitti"), default=None)
    p.add_argument("--warm_start", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..train.state import load_weights
    from . import validators as V
    from .infer import gmflow_infer_fn, raft_infer_fn
    from .inference import inference_on_dir
    from .submission import create_kitti_submission, create_sintel_submission

    # init a template, then restore into it (orbax needs concrete shapes)
    dummy = jnp.zeros((1, 64, 96, 3), jnp.float32)

    if args.model == "raft":
        from ..models.raft import RAFT
        model = RAFT(small=args.small, dtype=jnp.bfloat16,
                     corr_impl=args.corr_impl)
        template = jax.jit(lambda r: model.init(
            r, dummy, dummy, iters=1, train=False))(jax.random.PRNGKey(0))
        if template.get("batch_stats") is not None:
            params, batch_stats = load_weights(
                args.ckpt, template["params"], template["batch_stats"])
            variables = {"params": params, "batch_stats": batch_stats}
        else:
            params = load_weights(args.ckpt, template["params"])
            variables = {"params": params}
        infer_fn = raft_infer_fn(model, variables, iters=args.iters)
        warm_fn = raft_infer_fn(model, variables, iters=args.iters,
                                with_low_res=True)
    else:
        from ..models.gmflow import GMFlow
        model = GMFlow(num_scales=args.num_scales,
                       upsample_factor=args.upsample_factor,
                       dtype=jnp.bfloat16)
        template = jax.jit(lambda r: model.init(
            r, dummy, dummy,
            attn_splits_list=tuple(args.attn_splits_list[:1] *
                                   args.num_scales),
            corr_radius_list=tuple(args.corr_radius_list[:1] *
                                   args.num_scales),
            prop_radius_list=tuple(args.prop_radius_list[:1] *
                                   args.num_scales)))(jax.random.PRNGKey(0))
        params = load_weights(args.ckpt, template["params"])
        infer_fn = gmflow_infer_fn(
            model, {"params": params},
            attn_splits_list=args.attn_splits_list,
            corr_radius_list=args.corr_radius_list,
            prop_radius_list=args.prop_radius_list)
        warm_fn = infer_fn
        if args.pred_bidir_flow:
            infer_fn = gmflow_infer_fn(
                model, {"params": params},
                attn_splits_list=args.attn_splits_list,
                corr_radius_list=args.corr_radius_list,
                prop_radius_list=args.prop_radius_list,
                pred_bidir_flow=True)

    results = {}
    for name in args.val:
        kwargs = dict(root=args.data_root,
                      padding_factor=args.padding_factor)
        if name == "sintel":
            kwargs.update(dstype=args.sintel_dstype,
                          with_speed_metric=args.with_speed_metric,
                          count_time=args.count_time,
                          evaluate_matched_unmatched=(
                              args.evaluate_matched_unmatched))
        results.update(V.VALIDATORS[name](infer_fn, **kwargs))
    if results:
        print(json.dumps(results, indent=2))

    if args.inference_dir:
        inference_on_dir(
            infer_fn, args.inference_dir, output_path=args.output_path,
            padding_factor=args.padding_factor,
            paired_data=args.paired_data,
            save_flo_flow=args.save_flo_flow,
            pred_bidir_flow=args.pred_bidir_flow,
            fwd_bwd_consistency_check=args.fwd_bwd_consistency_check)
        print(f"inference written to {args.output_path}")

    if args.submission == "sintel":
        create_sintel_submission(warm_fn, root=args.data_root,
                                 output_path=args.output_path,
                                 warm_start=args.warm_start,
                                 padding_factor=args.padding_factor)
    elif args.submission == "kitti":
        create_kitti_submission(infer_fn, root=args.data_root,
                                output_path=args.output_path,
                                padding_factor=args.padding_factor)


if __name__ == "__main__":
    main()

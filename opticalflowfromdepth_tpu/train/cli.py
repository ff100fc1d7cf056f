"""Training CLI — the `adjusted_RAFT/train.py` / `adjusted_gmflow/main.py`
equivalent.

    python -m opticalflowfromdepth_tpu.train.cli --model raft \
        --stage mixed --redweb_shards synth/redweb --diml_shards synth/diml \
        --num_steps 120000 --batch_size 8 --lr 2.5e-4 \
        --add_classifier --classifier_ckpt runs/classifier/checkpoints/... \
        --val kitti --log_dir runs/raft_mixed

Covers the reference's recipes (`README.md:109-130`): stage-keyed data,
mixed ReDWeb+DIML, classifier regularizer, periodic validation, dual
checkpointing, resume. Multi-host: launch one process per host with
JAX_COORDINATOR_ADDRESS etc. (parallel.mesh.init_distributed).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", choices=("raft", "gmflow"), required=True)
    p.add_argument("--stage", default="mixed",
                   help="chairs|things|sintel|kitti|finetunekitti15|"
                        "augmentedredweb|augmenteddiml|mixed")
    p.add_argument("--data_root", default="datasets")
    p.add_argument("--redweb_shards", default=None)
    p.add_argument("--diml_shards", default=None)
    p.add_argument("--log_dir", default="runs/default")
    p.add_argument("--num_steps", type=int, default=100000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--image_size", type=int, nargs=2, default=None)
    p.add_argument("--iters", type=int, default=12, help="RAFT GRU iters")
    p.add_argument("--small", action="store_true")
    p.add_argument("--no_mixed_precision", action="store_true")
    p.add_argument("--freeze_bn", action="store_true")
    p.add_argument("--add_noise", action="store_true")
    p.add_argument("--num_scales", type=int, default=1)
    p.add_argument("--upsample_factor", type=int, default=8)
    p.add_argument("--attn_splits_list", type=int, nargs="+", default=[2])
    p.add_argument("--corr_radius_list", type=int, nargs="+", default=[-1])
    p.add_argument("--prop_radius_list", type=int, nargs="+", default=[-1])
    p.add_argument("--add_classifier", action="store_true")
    p.add_argument("--classifier_ckpt", default=None)
    p.add_argument("--classify_loss_weight_init", type=float, default=1.0)
    p.add_argument("--classify_loss_weight_increase", type=float,
                   default=-2e-5)
    p.add_argument("--max_classify_loss_weight", type=float, default=1.0)
    p.add_argument("--min_classify_loss_weight", type=float, default=0.0)
    p.add_argument("--val", nargs="*", default=[],
                   help="validators: chairs things sintel kitti kitti12 "
                        "finetunekitti15")
    p.add_argument("--val_freq", type=int, default=10000)
    p.add_argument("--save_ckpt_freq", type=int, default=10000)
    p.add_argument("--save_latest_freq", type=int, default=1000)
    p.add_argument("--resume", default=None)
    p.add_argument("--restore_weights", default=None,
                   help="weights-only warm start (stage chaining)")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=1234)
    return p


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)

    import jax

    from ..data.datasets import fetch_train_dataset
    from ..data.loader import Loader
    from ..eval import validators as V
    from ..eval.infer import gmflow_infer_fn, raft_infer_fn
    from ..parallel.mesh import init_distributed, make_mesh
    from ..utils.logging import save_args
    from .optim import one_cycle_schedule
    from .runner import RunnerConfig, TrainRunner
    from .state import load_weights

    init_distributed()
    mesh = make_mesh()
    save_args(args.log_dir, args)

    mixed_precision = not args.no_mixed_precision
    shards = {}
    if args.redweb_shards:
        shards["redweb"] = args.redweb_shards
    if args.diml_shards:
        shards["diml"] = args.diml_shards

    # classifier (frozen; `train.py:155-168`)
    classifier_model = classifier_params = None
    if args.add_classifier:
        from ..models.classifier import Classifier
        classifier_model = Classifier()
        import orbax.checkpoint as ocp
        classifier_params = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(args.classifier_ckpt))

    if args.model == "raft":
        from .raft_train import RAFTTrainConfig, init_state, make_train_step
        image_size = tuple(args.image_size or (368, 496))
        cfg = RAFTTrainConfig(
            lr=args.lr or 2.5e-4, num_steps=args.num_steps,
            batch_size=args.batch_size, image_size=image_size,
            iters=args.iters, small=args.small,
            mixed_precision=mixed_precision, add_noise=args.add_noise,
            freeze_bn=args.freeze_bn, add_classifier=args.add_classifier,
            classify_loss_weight_init=args.classify_loss_weight_init,
            classify_loss_weight_increase=args.classify_loss_weight_increase,
            max_classify_loss_weight=args.max_classify_loss_weight,
            min_classify_loss_weight=args.min_classify_loss_weight)
        state = init_state(cfg, jax.random.PRNGKey(args.seed))
        step_fn = make_train_step(cfg, classifier_params, classifier_model)
        schedule = one_cycle_schedule(cfg.lr, cfg.num_steps + 100,
                                      anneal_strategy="linear")
        from .raft_train import build_model
        model = build_model(cfg)

        def infer_fn_factory(state):
            variables = {"params": state.params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            return raft_infer_fn(model, variables, iters=24)
    else:
        from .gmflow_train import (GMFlowTrainConfig, init_state,
                                   make_train_step)
        image_size = tuple(args.image_size or (368, 560))
        cfg = GMFlowTrainConfig(
            lr=args.lr or 4e-4, num_steps=args.num_steps,
            batch_size=args.batch_size, image_size=image_size,
            num_scales=args.num_scales,
            upsample_factor=args.upsample_factor,
            attn_splits_list=tuple(args.attn_splits_list),
            corr_radius_list=tuple(args.corr_radius_list),
            prop_radius_list=tuple(args.prop_radius_list),
            mixed_precision=mixed_precision,
            add_classifier=args.add_classifier,
            classify_loss_weight_init=args.classify_loss_weight_init,
            classify_loss_weight_increase=args.classify_loss_weight_increase,
            max_classify_loss_weight=args.max_classify_loss_weight,
            min_classify_loss_weight=args.min_classify_loss_weight)
        state = init_state(cfg, jax.random.PRNGKey(args.seed))
        step_fn = make_train_step(cfg, classifier_params, classifier_model)
        schedule = one_cycle_schedule(cfg.lr, cfg.num_steps + 100,
                                      anneal_strategy="cos")
        from .gmflow_train import build_model
        model = build_model(cfg)

        def infer_fn_factory(state):
            return gmflow_infer_fn(
                model, {"params": state.params},
                attn_splits_list=cfg.attn_splits_list,
                corr_radius_list=cfg.corr_radius_list,
                prop_radius_list=cfg.prop_radius_list)

    # `{num_params}_parameters` touch-file sidecar
    # (`adjusted_gmflow/main.py:226-228`): a glanceable model-size marker
    # next to args.json
    num_params = sum(int(p.size) for p in jax.tree.leaves(state.params))
    open(os.path.join(args.log_dir, f"{num_params}_parameters"),
         "w").close()
    print(f"model parameters: {num_params}")

    if args.restore_weights:
        state = state.replace(params=load_weights(args.restore_weights,
                                                  state.params))
        print(f"warm-started weights from {args.restore_weights}")

    dataset = fetch_train_dataset(args.stage, image_size,
                                  shards_root=shards,
                                  data_root=args.data_root,
                                  seed=args.seed)
    loader = Loader(dataset, batch_size=args.batch_size,
                    num_workers=args.num_workers, seed=args.seed)

    validators = {}
    for name in args.val:
        fn = V.VALIDATORS[name]
        validators[name] = (lambda f, _fn=fn: _fn(f, root=args.data_root))

    runner = TrainRunner(
        RunnerConfig(log_dir=args.log_dir, num_steps=args.num_steps,
                     val_freq=args.val_freq,
                     save_ckpt_freq=args.save_ckpt_freq,
                     save_latest_freq=args.save_latest_freq,
                     resume=args.resume),
        state, step_fn, loader,
        lr_at=lambda s: float(schedule(s)),
        validators=validators, infer_fn_factory=infer_fn_factory,
        mesh=mesh, seed=args.seed)
    runner.run()


if __name__ == "__main__":
    main()

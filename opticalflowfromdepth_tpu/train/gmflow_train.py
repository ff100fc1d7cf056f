"""GMFlow training: pjit-sharded train step + NaN-skip semantics (T2).

Re-design of `adjusted_gmflow/main.py:133-659`:
  * AdamW + OneCycle cosine anneal (`main.py:230-231,425-432`), grad clip
    (`main.py:489`);
  * gamma=0.9 sequence loss over per-scale predictions (`loss.py:4-37`);
  * NaN-loss step skip (`main.py:474-478`) — expressed in-graph with
    `lax.cond`-free where-select so the step stays jittable;
  * optional frozen classifier CE with annealed clamped weight
    (`main.py:465-472`);
  * DDP/NCCL replaced by mesh batch sharding: the loss mean over a
    batch sharded on the ``data`` axis compiles to an ICI all-reduce.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..models.classifier import Classifier
from ..models.gmflow import GMFlow
from .loss import classifier_loss, sequence_loss
from .optim import make_optimizer
from .state import TrainState, create_train_state


@dataclass(frozen=True)
class GMFlowTrainConfig:
    lr: float = 4e-4
    num_steps: int = 100000
    batch_size: int = 16
    image_size: Tuple[int, int] = (368, 560)
    wdecay: float = 1e-4
    grad_clip: float = 1.0
    gamma: float = 0.9
    # model shape (`main.py:38-52`)
    num_scales: int = 1
    feature_channels: int = 128
    upsample_factor: int = 8
    num_transformer_layers: int = 6
    ffn_dim_expansion: int = 4
    attn_splits_list: Tuple[int, ...] = (2,)
    corr_radius_list: Tuple[int, ...] = (-1,)
    prop_radius_list: Tuple[int, ...] = (-1,)
    mixed_precision: bool = True
    # sequence parallelism: >1 shards the global-matching/attention token
    # axis over the mesh "model" axis (SURVEY.md §5.7); requires passing the
    # (data, model) mesh to build_model/init_state/make_train_step
    model_parallel: int = 1
    # classifier-regularizer schedule (`main.py:125-128`)
    add_classifier: bool = False
    classify_loss_weight_init: float = 1.0
    classify_loss_weight_increase: float = -2e-5
    max_classify_loss_weight: float = 1.0
    min_classify_loss_weight: float = 0.0


def build_model(cfg: GMFlowTrainConfig,
                mesh: Optional[Mesh] = None) -> GMFlow:
    dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
    return GMFlow(num_scales=cfg.num_scales,
                  upsample_factor=cfg.upsample_factor,
                  feature_channels=cfg.feature_channels,
                  num_transformer_layers=cfg.num_transformer_layers,
                  ffn_dim_expansion=cfg.ffn_dim_expansion,
                  dtype=dtype,
                  mesh=mesh if cfg.model_parallel > 1 else None)


def init_state(cfg: GMFlowTrainConfig, rng: jax.Array,
               mesh: Optional[Mesh] = None) -> TrainState:
    model = build_model(cfg, mesh)
    h, w = cfg.image_size
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(
        lambda r: model.init(r, img, img,
                             attn_splits_list=cfg.attn_splits_list,
                             corr_radius_list=cfg.corr_radius_list,
                             prop_radius_list=cfg.prop_radius_list))(rng)
    tx = make_optimizer(cfg.lr, cfg.num_steps, cfg.wdecay,
                        clip=cfg.grad_clip, anneal_strategy="cos")
    return create_train_state(model, variables, tx)


def classify_weight_at(cfg: GMFlowTrainConfig, step: jnp.ndarray
                       ) -> jnp.ndarray:
    """Linearly annealed, clamped classifier weight (`main.py:465-470`)."""
    w = cfg.classify_loss_weight_init + \
        cfg.classify_loss_weight_increase * step.astype(jnp.float32)
    return jnp.clip(w, cfg.min_classify_loss_weight,
                    cfg.max_classify_loss_weight)


def make_train_step(cfg: GMFlowTrainConfig,
                    classifier_params: Optional[Any] = None,
                    classifier_model: Optional[Classifier] = None,
                    mesh: Optional[Mesh] = None):
    """Returns jit-able (state, batch, key) -> (state, metrics).

    batch: image1/image2 [B, H, W, 3] (0..255), flow [B, H, W, 2],
    valid [B, H, W], label [B, 4]. Pass the (data, model) mesh when
    cfg.model_parallel > 1 to run sequence-parallel matching.
    """
    model = build_model(cfg, mesh)

    def loss_fn(params, batch, step):
        preds = model.apply(
            {"params": params}, batch["image1"], batch["image2"],
            attn_splits_list=cfg.attn_splits_list,
            corr_radius_list=cfg.corr_radius_list,
            prop_radius_list=cfg.prop_radius_list,
            training=True)["flow_preds"]
        loss, metrics = sequence_loss(preds, batch["flow"], batch["valid"],
                                      cfg.gamma)
        if cfg.add_classifier and classifier_params is not None:
            variables = {"params": classifier_params["params"]}
            if classifier_params.get("batch_stats"):
                variables["batch_stats"] = classifier_params["batch_stats"]
            logits = classifier_model.apply(variables, preds[-1], train=False)
            c_loss = classifier_loss(logits, batch["label"])
            metrics["classify_loss"] = c_loss
            loss = loss + c_loss * classify_weight_at(cfg, step)
        metrics["total_loss"] = loss
        return loss, metrics

    def train_step(state: TrainState, batch: Dict, key: jax.Array):
        del key  # GMFlow has no dropout/noise path in the reference recipe
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, metrics), grads = grad_fn(state.params, batch, state.step)

        # NaN-loss skip (`main.py:474-478`): keep the old state (params,
        # optimizer moments, step) when the loss is non-finite.
        ok = jnp.isfinite(loss)
        grads = jax.tree.map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updated = state.apply_gradients(grads=grads)
        new_state = jax.tree.map(lambda n, o: jnp.where(ok, n, o),
                                 updated, state)
        metrics["skipped_nan"] = (~ok).astype(jnp.float32)
        return new_state, metrics

    return train_step

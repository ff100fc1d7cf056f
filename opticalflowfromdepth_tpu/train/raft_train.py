"""RAFT training: the pjit-sharded train step + stage driver (T1).

Re-design of `adjusted_RAFT/train.py:140-271`:
  * AdamW + OneCycle linear (optim.py), grad clip 1.0;
  * gamma-weighted sequence loss with valid & |flow|<400 masking;
  * optional Gaussian image noise, stdv ~ U[0, 5] (`train.py:188-191`) —
    done on-device with the step key instead of host numpy;
  * optional frozen classifier CE with linearly annealed clamped weight
    (`train.py:196-203`);
  * BatchNorm freeze after the first stage (`train.py:152-153`) — expressed
    as ``freeze_bn`` making the cnet batch norm use running stats.

The step is one jit-compiled function; the global batch is sharded over the
mesh's ``data`` axis, so the gradient mean compiles to an ICI all-reduce
(replacing DDP/NCCL).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.classifier import Classifier
from ..models.raft import RAFT
from .loss import classifier_loss, sequence_loss
from .optim import make_optimizer
from .state import TrainState, create_train_state


@dataclass(frozen=True)
class RAFTTrainConfig:
    lr: float = 2.5e-4
    num_steps: int = 100000
    batch_size: int = 6
    image_size: Tuple[int, int] = (368, 496)
    iters: int = 12
    wdecay: float = 5e-5
    epsilon: float = 1e-8
    clip: float = 1.0
    gamma: float = 0.8
    dropout: float = 0.0
    small: bool = False
    mixed_precision: bool = True
    add_noise: bool = False
    freeze_bn: bool = False          # set for non-first stages
    # classifier-regularizer schedule (`train.py:299-305`)
    add_classifier: bool = False
    classify_loss_weight_init: float = 1.0
    classify_loss_weight_increase: float = -2e-5
    max_classify_loss_weight: float = 1.0
    min_classify_loss_weight: float = 0.0
    # GRU-scan rematerialization (see models/raft.py:RAFT.remat)
    remat: str = "none"
    # GRU-scan unroll factor (see models/raft.py:RAFT.unroll); 0 = full
    # unroll. Measured on-chip (368x496 bs4 bf16, 12 iters): 167.0 ms
    # rolled vs 167.2 (unroll=4) vs 169.9 (unroll=12) — no effect; the
    # rolled scan stays the default for its ~2x faster compile.
    unroll: int = 1
    # correlation implementation (models/raft.py:RAFT.corr_impl): the
    # fused Pallas kernel is the training default — volume + d_corr live
    # in VMEM only (interpret-mode off-TPU, so CPU runs work unchanged)
    corr_impl: str = "fused"
    # supervise in the blocked [B, h, w, 64, 2] layout (basic model
    # only; gt blocked once per step). Measured on-chip via interleaved
    # A/B at 368x496 bs4: consistently ~5 ms/step SLOWER than full-res
    # supervision (129.2 vs 123.6 ms — the per-iteration pixel-shuffle
    # relayouts sit off the critical path and the blocked ys stacking
    # fuses worse), so full-res stays the default; kept as a knob for
    # other shapes.
    blocked_supervision: bool = False


def _blocked(cfg: "RAFTTrainConfig") -> bool:
    return cfg.blocked_supervision and not cfg.small


def build_model(cfg: RAFTTrainConfig) -> RAFT:
    dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
    return RAFT(small=cfg.small, dropout=cfg.dropout, dtype=dtype,
                remat=cfg.remat, corr_impl=cfg.corr_impl,
                blocked_supervision=_blocked(cfg),
                unroll=cfg.iters if cfg.unroll == 0 else cfg.unroll)


def init_state(cfg: RAFTTrainConfig, rng: jax.Array) -> TrainState:
    model = build_model(cfg)
    h, w = cfg.image_size
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(
        lambda r: model.init(r, img, img, iters=1, train=True))(rng)
    tx = make_optimizer(cfg.lr, cfg.num_steps, cfg.wdecay, cfg.epsilon,
                        cfg.clip, anneal_strategy="linear")
    return create_train_state(model, variables, tx)


def classify_weight_at(cfg: RAFTTrainConfig, step: jnp.ndarray) -> jnp.ndarray:
    """Linearly annealed, clamped classifier-loss weight (`train.py:200-203`)."""
    w = cfg.classify_loss_weight_init + \
        cfg.classify_loss_weight_increase * step.astype(jnp.float32)
    return jnp.clip(w, cfg.min_classify_loss_weight,
                    cfg.max_classify_loss_weight)


def make_train_step(cfg: RAFTTrainConfig,
                    classifier_params: Optional[Any] = None,
                    classifier_model: Optional[Classifier] = None):
    """Returns jit-able (state, batch, key) -> (state, metrics).

    batch: dict with image1/image2 [B, H, W, 3] (0..255), flow [B, H, W, 2],
    valid [B, H, W], label [B, 4].
    """
    model = build_model(cfg)

    def loss_fn(params, batch_stats, batch, key):
        image1, image2 = batch["image1"], batch["image2"]
        if cfg.add_noise:
            k1, k2, k3 = jax.random.split(key, 3)
            stdv = jax.random.uniform(k1, (), jnp.float32, 0.0, 5.0)
            image1 = jnp.clip(
                image1 + stdv * jax.random.normal(k2, image1.shape), 0, 255)
            image2 = jnp.clip(
                image2 + stdv * jax.random.normal(k3, image2.shape), 0, 255)

        variables = {"params": params}
        mutable = []
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            mutable = [] if cfg.freeze_bn else ["batch_stats"]

        if mutable:
            flow_preds, new_model_state = model.apply(
                variables, image1, image2, iters=cfg.iters,
                train=not cfg.freeze_bn, mutable=mutable,
                rngs={"dropout": key})
        else:
            flow_preds = model.apply(
                variables, image1, image2, iters=cfg.iters,
                train=not cfg.freeze_bn, rngs={"dropout": key})
            new_model_state = {}

        flow_gt, valid = batch["flow"], batch["valid"]
        if _blocked(cfg):
            # preds come back blocked [B, h, w, 64, 2]; block gt/valid
            # ONCE — the L1/EPE reductions see the same value multiset
            from ..models.raft import block_pixels
            flow_gt = block_pixels(flow_gt)
            valid = block_pixels(valid)
        loss, metrics = sequence_loss(flow_preds, flow_gt, valid, cfg.gamma)
        if cfg.add_classifier and classifier_params is not None:
            final_pred = flow_preds[-1]
            if _blocked(cfg):
                from ..models.raft import unblock_pixels
                final_pred = unblock_pixels(final_pred)
            logits = classifier_model.apply(
                {"params": classifier_params["params"],
                 **({"batch_stats": classifier_params["batch_stats"]}
                    if classifier_params.get("batch_stats") else {})},
                final_pred, train=False)
            c_loss = classifier_loss(logits, batch["label"])
            metrics["classify_loss"] = c_loss
            loss = loss + c_loss * batch["classify_weight"]
        metrics["total_loss"] = loss
        return loss, (metrics, new_model_state)

    def train_step(state: TrainState, batch: Dict, key: jax.Array):
        if cfg.add_classifier:
            batch = dict(batch)
            batch["classify_weight"] = classify_weight_at(
                cfg, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_model_state)), grads = grad_fn(
            state.params, state.batch_stats, batch, key)
        state = state.apply_gradients(grads=grads)
        if new_model_state.get("batch_stats") is not None:
            state = state.replace(batch_stats=new_model_state["batch_stats"])
        return state, metrics

    return train_step

"""Auxiliary-classifier training — absent from the reference snapshot.

The reference ships only a frozen checkpoint + JSON hyperparams
(`README.md:113-114`, `.MISSING_LARGE_BLOBS:1`); this build trains the
classifier from synthesized flow maps: cross-entropy over the 4 classes
{none, flip, rotate, shear}, labels from the shard schema
(`dataloader.py:154-157`: label = max(0, augment_type - 4)).

Training samples are the ground-truth flow maps of augmented pairs — the
classifier learns to recognize the augmentation type from the flow field,
which is exactly the signal later used to regularize the flow estimators
(`adjusted_RAFT/train.py:196-203`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.classifier import Classifier
from .loss import classifier_loss
from .optim import make_optimizer
from .state import TrainState, create_train_state


@dataclass(frozen=True)
class ClassifierTrainConfig:
    lr: float = 1e-4
    num_steps: int = 20000
    batch_size: int = 32
    image_size: Tuple[int, int] = (320, 448)
    wdecay: float = 1e-5
    clip: float = 1.0
    output_dim: int = 64
    dropout: float = 0.1
    use_small: bool = False
    mixed_precision: bool = True


def build_model(cfg: ClassifierTrainConfig) -> Classifier:
    dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
    return Classifier(output_dim=cfg.output_dim, dropout=cfg.dropout,
                      use_small=cfg.use_small, dtype=dtype)


def init_state(cfg: ClassifierTrainConfig, rng: jax.Array) -> TrainState:
    model = build_model(cfg)
    h, w = cfg.image_size
    flow = jnp.zeros((1, h, w, 2), jnp.float32)
    variables = jax.jit(
        lambda r: model.init(r, flow, train=True))(rng)
    tx = make_optimizer(cfg.lr, cfg.num_steps, cfg.wdecay, clip=cfg.clip,
                        anneal_strategy="cos")
    return create_train_state(model, variables, tx)


def make_train_step(cfg: ClassifierTrainConfig):
    """(state, batch{flow, label}, key) -> (state, metrics)."""
    model = build_model(cfg)

    def loss_fn(params, batch_stats, batch, key):
        variables = {"params": params}
        mutable = []
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        if mutable:
            logits, new_state = model.apply(
                variables, batch["flow"], train=True, mutable=mutable,
                rngs={"dropout": key})
        else:
            logits = model.apply(variables, batch["flow"], train=True,
                                 rngs={"dropout": key})
            new_state = {}
        loss = classifier_loss(logits, batch["label"])
        acc = jnp.mean((jnp.argmax(logits, -1) ==
                        jnp.argmax(batch["label"], -1)).astype(jnp.float32))
        return loss, ({"loss": loss, "accuracy": acc}, new_state)

    def train_step(state: TrainState, batch: Dict, key: jax.Array):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_state)), grads = grad_fn(
            state.params, state.batch_stats, batch, key)
        state = state.apply_gradients(grads=grads)
        if new_state.get("batch_stats") is not None:
            state = state.replace(batch_stats=new_state["batch_stats"])
        return state, metrics

    return train_step


def make_eval_step(cfg: ClassifierTrainConfig):
    model = build_model(cfg)

    @jax.jit
    def eval_step(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        logits = model.apply(variables, batch["flow"], train=False)
        acc = jnp.mean((jnp.argmax(logits, -1) ==
                        jnp.argmax(batch["label"], -1)).astype(jnp.float32))
        return {"accuracy": acc,
                "loss": classifier_loss(logits, batch["label"])}

    return eval_step

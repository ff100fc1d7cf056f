"""Auxiliary augmentation classifier (M3).

Re-design of `auxiliary_classifier/classifier.py:269-333`: a ResNet-ish
encoder over the raw 2-channel flow map (input ch=2, `classifier.py:135`),
1x1 head conv, global avg/max pool, ReLU, optional dropout, and a linear
layer to ``num_classes = 1 + 3`` = {none, flip, rotate, shear}.

The reference ships only a frozen checkpoint — its classifier *training*
code is absent from the snapshot (SURVEY.md §2.4); this build provides
training in `train/classifier_train.py`.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import BasicEncoder, SmallEncoder

NUM_CLASSES = 1 + 3  # `classifier.py:5`


class Classifier(nn.Module):
    output_dim: int = 64
    norm_fn: str = "batch"
    dropout: float = 0.9
    use_small: bool = False
    use_dropout_in_encoder: bool = True
    use_dropout_in_classify: bool = False
    use_average_pooling: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, train: bool = True):
        """flow: [B, H, W, 2] predicted flow -> [B, 4] logits."""
        enc_dropout = self.dropout if self.use_dropout_in_encoder else 0.0
        enc_cls = SmallEncoder if self.use_small else BasicEncoder
        x = enc_cls(output_dim=self.output_dim, norm_fn=self.norm_fn,
                    dropout=enc_dropout, dtype=self.dtype,
                    name="encoder")(flow.astype(self.dtype), train)
        if self.use_average_pooling:
            x = jnp.mean(x, axis=(1, 2))
        else:
            x = jnp.max(x, axis=(1, 2))
        x = nn.relu(x)
        if self.use_dropout_in_classify:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(NUM_CLASSES, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        return x.astype(jnp.float32)

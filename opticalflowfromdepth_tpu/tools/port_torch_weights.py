"""Port reference PyTorch checkpoints onto the flax parameter trees.

Maps the reference models' state_dicts — GMFlow (`adjusted_gmflow/gmflow/
gmflow.py:12-48`), RAFT (`adjusted_RAFT/core/raft.py:24-56`), and the
auxiliary classifier (`auxiliary_classifier/classifier.py:269-333`) — onto
the parameter trees of this package's flax re-implementations.

The port is *bijective and shape-checked*: every torch tensor must be
consumed exactly once (except ``num_batches_tracked`` counters) and every
flax leaf must be produced exactly once with the template's shape; any
drift between the two architectures fails loudly instead of silently
mis-assigning a layer.

Layout transforms:
  * conv weights  [O, I, kH, kW] -> [kH, kW, I, O]
  * linear weights [O, I]        -> [I, O]
  * norm weight/bias             -> scale/bias; running stats -> batch_stats

Together with `tests/test_torch_parity.py` this is the activation-parity
harness: a random-init torch reference model, ported here, must produce the
same outputs to ~1e-4 on random inputs.

CLI:
  python -m opticalflowfromdepth_tpu.tools.port_torch_weights \
      --model gmflow --num_scales 1 --ckpt gmflow_things.pth --out ported.npz
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Optional, Tuple

import numpy as np

FlatTree = Dict[Tuple[str, ...], np.ndarray]


def _t_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _t_lin(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w))


class _Port:
    """Consume a torch state_dict into a flat flax tree, tracking usage."""

    def __init__(self, state_dict: Dict[str, Any]):
        self.sd: Dict[str, np.ndarray] = {}
        for k, v in state_dict.items():
            if k.startswith("module."):  # DataParallel/DDP prefix
                k = k[len("module."):]
            if k.endswith("num_batches_tracked"):
                continue
            self.sd[k] = np.asarray(
                v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                dtype=np.float32)
        self.params: FlatTree = {}
        self.stats: FlatTree = {}

    def _take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"torch key missing or already used: {key}")
        return self.sd.pop(key)

    def conv(self, dst: str, src: str, bias: bool = True) -> None:
        self.params[tuple(dst.split("/")) + ("Conv_0", "kernel")] = \
            _t_conv(self._take(src + ".weight"))
        if bias:
            self.params[tuple(dst.split("/")) + ("Conv_0", "bias")] = \
                self._take(src + ".bias")

    def raw(self, dst: str, src: str, transform=None) -> None:
        w = self._take(src)
        self.params[tuple(dst.split("/"))] = transform(w) if transform else w

    def linear(self, dst: str, src: str, bias: bool = True) -> None:
        self.params[tuple(dst.split("/")) + ("kernel",)] = \
            _t_lin(self._take(src + ".weight"))
        if bias:
            self.params[tuple(dst.split("/")) + ("bias",)] = \
                self._take(src + ".bias")

    def layernorm(self, dst: str, src: str) -> None:
        d = tuple(dst.split("/"))
        self.params[d + ("scale",)] = self._take(src + ".weight")
        self.params[d + ("bias",)] = self._take(src + ".bias")

    def batchnorm(self, dst: str, src: str, alias: Optional[str] = None
                  ) -> None:
        d = tuple(dst.split("/"))
        self.params[d + ("scale",)] = self._take(src + ".weight")
        self.params[d + ("bias",)] = self._take(src + ".bias")
        self.stats[d + ("mean",)] = self._take(src + ".running_mean")
        self.stats[d + ("var",)] = self._take(src + ".running_var")
        if alias is not None:
            # RAFT registers norm3 both directly and inside the downsample
            # Sequential (`extractor.py:44-45`), so the state_dict carries
            # the same tensors twice; consume and check the duplicates.
            for suf, val in (("weight", self.params[d + ("scale",)]),
                             ("bias", self.params[d + ("bias",)]),
                             ("running_mean", self.stats[d + ("mean",)]),
                             ("running_var", self.stats[d + ("var",)])):
                dup = self._take(f"{alias}.{suf}")
                if not np.array_equal(dup, val):
                    raise ValueError(f"{alias}.{suf} != {src}.{suf}")

    def finish(self) -> None:
        if self.sd:
            raise ValueError(
                f"{len(self.sd)} torch tensors were not consumed by the "
                f"port map, e.g. {sorted(self.sd)[:8]}")


# ---------------------------------------------------------------------------
# encoders (shared between RAFT fnet/cnet and the classifier)
# ---------------------------------------------------------------------------

def _port_basic_encoder(p: _Port, dst: str, src: str, norm: str) -> None:
    """BasicEncoder (`extractor.py:118-192`): conv1, norm1, 6 residual
    blocks (layer1-3), conv2. Flax: Conv_0, [BatchNorm_0], ResidualBlock_0-5,
    Conv_1."""
    p.conv(f"{dst}/Conv_0", f"{src}.conv1")
    if norm == "batch":
        p.batchnorm(f"{dst}/BatchNorm_0", f"{src}.norm1")
    for i in range(6):
        layer, sub = 1 + i // 2, i % 2
        tsrc = f"{src}.layer{layer}.{sub}"
        tdst = f"{dst}/ResidualBlock_{i}"
        p.conv(f"{tdst}/Conv_0", f"{tsrc}.conv1")
        p.conv(f"{tdst}/Conv_1", f"{tsrc}.conv2")
        if norm == "batch":
            p.batchnorm(f"{tdst}/BatchNorm_0", f"{tsrc}.norm1")
            p.batchnorm(f"{tdst}/BatchNorm_1", f"{tsrc}.norm2")
        # torch RAFT adds the downsample iff stride != 1 (`extractor.py:40`),
        # i.e. the first block of layer2/layer3
        if sub == 0 and layer > 1:
            p.conv(f"{tdst}/Conv_2", f"{tsrc}.downsample.0")
            if norm == "batch":
                p.batchnorm(f"{tdst}/BatchNorm_2", f"{tsrc}.norm3",
                            alias=f"{tsrc}.downsample.1")
    p.conv(f"{dst}/Conv_1", f"{src}.conv2")


def _port_small_encoder(p: _Port, dst: str, src: str, norm: str) -> None:
    """SmallEncoder (`extractor.py:195-267`): bottleneck blocks."""
    p.conv(f"{dst}/Conv_0", f"{src}.conv1")
    if norm == "batch":
        p.batchnorm(f"{dst}/BatchNorm_0", f"{src}.norm1")
    for i in range(6):
        layer, sub = 1 + i // 2, i % 2
        tsrc = f"{src}.layer{layer}.{sub}"
        tdst = f"{dst}/BottleneckBlock_{i}"
        for j in (1, 2, 3):
            p.conv(f"{tdst}/Conv_{j - 1}", f"{tsrc}.conv{j}")
            if norm == "batch":
                p.batchnorm(f"{tdst}/BatchNorm_{j - 1}", f"{tsrc}.norm{j}")
        if sub == 0 and layer > 1:
            p.conv(f"{tdst}/Conv_3", f"{tsrc}.downsample.0")
            if norm == "batch":
                p.batchnorm(f"{tdst}/BatchNorm_3", f"{tsrc}.norm4",
                            alias=f"{tsrc}.downsample.1")
    p.conv(f"{dst}/Conv_1", f"{src}.conv2")


# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------

def port_raft(state_dict: Dict[str, Any], small: bool = False
              ) -> Tuple[FlatTree, FlatTree]:
    """RAFT state_dict -> (params, batch_stats) flat trees.

    Matches `adjusted_RAFT/core/raft.py:47-56`: fnet (instance norm),
    cnet (batch norm basic / none small), update_block.
    """
    p = _Port(state_dict)
    if small:
        _port_small_encoder(p, "fnet", "fnet", norm="instance")
        _port_small_encoder(p, "cnet", "cnet", norm="none")
        enc = "update_block/SmallMotionEncoder_0"
        p.conv(f"{enc}/Conv_0", "update_block.encoder.convc1")
        p.conv(f"{enc}/Conv_1", "update_block.encoder.convf1")
        p.conv(f"{enc}/Conv_2", "update_block.encoder.convf2")
        p.conv(f"{enc}/Conv_3", "update_block.encoder.conv")
        for j, name in enumerate(("convz", "convr", "convq")):
            p.conv(f"update_block/ConvGRU_0/Conv_{j}",
                   f"update_block.gru.{name}")
        p.conv("update_block/FlowHead_0/Conv_0", "update_block.flow_head.conv1")
        p.conv("update_block/FlowHead_0/Conv_1", "update_block.flow_head.conv2")
    else:
        _port_basic_encoder(p, "fnet", "fnet", norm="instance")
        _port_basic_encoder(p, "cnet", "cnet", norm="batch")
        enc = "update_block/BasicMotionEncoder_0"
        for j, name in enumerate(("convc1", "convc2", "convf1", "convf2",
                                  "conv")):
            p.conv(f"{enc}/Conv_{j}", f"update_block.encoder.{name}")
        for j, name in enumerate(("convz1", "convr1", "convq1",
                                  "convz2", "convr2", "convq2")):
            p.conv(f"update_block/SepConvGRU_0/Conv_{j}",
                   f"update_block.gru.{name}")
        p.conv("update_block/FlowHead_0/Conv_0", "update_block.flow_head.conv1")
        p.conv("update_block/FlowHead_0/Conv_1", "update_block.flow_head.conv2")
        # mask head: flax creation order is outer-then-inner
        # (`models/raft.py` BasicUpdateBlock), so Conv_0 = mask.2 (1x1)
        p.conv("update_block/Conv_0", "update_block.mask.2")
        p.conv("update_block/Conv_1", "update_block.mask.0")
    p.finish()
    return p.params, p.stats


def port_gmflow(state_dict: Dict[str, Any], num_scales: int = 1) -> FlatTree:
    """GMFlow state_dict -> params flat tree (no batch stats: all instance
    norm / layernorm). Matches `adjusted_gmflow/gmflow/gmflow.py:12-48`."""
    p = _Port(state_dict)

    # backbone (`backbone.py:39-117`): conv1(no bias), 6 res blocks
    # (bias-free convs, biased 1x1 downsample), conv2, optional trident
    p.conv("backbone/Conv_0", "backbone.conv1", bias=False)
    for i in range(6):
        layer, sub = 1 + i // 2, i % 2
        tsrc = f"backbone.layer{layer}.{sub}"
        tdst = f"backbone/_ResBlock_{i}"
        p.conv(f"{tdst}/Conv_0", f"{tsrc}.conv1", bias=False)
        p.conv(f"{tdst}/Conv_1", f"{tsrc}.conv2", bias=False)
        if sub == 0 and layer > 1:  # in_planes != planes (`backbone.py:19`)
            p.conv(f"{tdst}/Conv_2", f"{tsrc}.downsample.0")
    p.conv("backbone/Conv_1", "backbone.conv2")
    if num_scales > 1:
        p.raw("backbone/trident_kernel", "backbone.trident_conv.weight",
              _t_conv)

    # transformer (`transformer.py:244-271`)
    for i in range(6):
        for attn, tname in (("self_attn", "self_attn"),
                            ("cross_attn_ffn", "cross_attn_ffn")):
            src = f"transformer.layers.{i}.{tname}"
            dst = f"transformer/block_{i}/{attn}"
            for proj in ("q_proj", "k_proj", "v_proj", "merge"):
                p.linear(f"{dst}/{proj}", f"{src}.{proj}", bias=False)
            p.layernorm(f"{dst}/norm1", f"{src}.norm1")
            if attn == "cross_attn_ffn":
                p.linear(f"{dst}/Dense_0", f"{src}.mlp.0", bias=False)
                p.linear(f"{dst}/Dense_1", f"{src}.mlp.2", bias=False)
                p.layernorm(f"{dst}/norm2", f"{src}.norm2")

    # flow propagation attention (`transformer.py:325-341`, biased Linear)
    p.linear("feature_flow_attn/q_proj", "feature_flow_attn.q_proj")
    p.linear("feature_flow_attn/k_proj", "feature_flow_attn.k_proj")

    # convex upsampler (`gmflow.py:46-48`): flax top-level Conv_0 / Conv_1
    p.conv("Conv_0", "upsampler.0")
    p.conv("Conv_1", "upsampler.2")
    p.finish()
    return p.params


def port_classifier(state_dict: Dict[str, Any], use_small: bool = False,
                    use_dropout_in_classify: bool = False
                    ) -> Tuple[FlatTree, FlatTree]:
    """Auxiliary classifier state_dict -> (params, batch_stats).

    `classifier.py:269-333`: encoder (2-ch BasicEncoder) + classify head
    [pool, flatten, relu, (dropout), linear]."""
    p = _Port(state_dict)
    if use_small:
        _port_small_encoder(p, "encoder", "encoder", norm="batch")
    else:
        _port_basic_encoder(p, "encoder", "encoder", norm="batch")
    lin_idx = 4 if use_dropout_in_classify else 3
    p.linear("Dense_0", f"classify.{lin_idx}")
    p.finish()
    return p.params, p.stats


# ---------------------------------------------------------------------------
# tree assembly / validation
# ---------------------------------------------------------------------------

def to_variables(params: FlatTree, stats: Optional[FlatTree] = None,
                 template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Nest flat trees into a flax ``variables`` dict, validating against a
    template from ``model.init`` when given: identical key sets + shapes."""
    import flax.traverse_util as tu
    import jax.numpy as jnp

    out: Dict[str, Any] = {
        "params": tu.unflatten_dict(
            {k: jnp.asarray(v) for k, v in params.items()})}
    if stats:
        out["batch_stats"] = tu.unflatten_dict(
            {k: jnp.asarray(v) for k, v in stats.items()})

    if template is not None:
        for coll in set(template) | set(out):
            want = tu.flatten_dict(template.get(coll, {}))
            got = tu.flatten_dict(out.get(coll, {}))
            missing = sorted(set(want) - set(got))
            extra = sorted(set(got) - set(want))
            if missing or extra:
                raise ValueError(
                    f"[{coll}] ported tree mismatch; missing={missing[:6]} "
                    f"extra={extra[:6]}")
            for k in want:
                if tuple(want[k].shape) != tuple(got[k].shape):
                    raise ValueError(
                        f"[{coll}] shape mismatch at {'/'.join(k)}: "
                        f"flax {tuple(want[k].shape)} vs "
                        f"ported {tuple(got[k].shape)}")
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pth: either a raw state_dict or {'model': sd}
    (`adjusted_gmflow/main.py:242`)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    return ckpt


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True,
                    choices=["gmflow", "raft", "raft_small", "classifier"])
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True,
                    help=".npz of flat ported arrays (collection/path keys)")
    ap.add_argument("--num_scales", type=int, default=1)
    args = ap.parse_args()

    sd = load_torch_checkpoint(args.ckpt)
    if args.model == "gmflow":
        params, stats = port_gmflow(sd, num_scales=args.num_scales), {}
    elif args.model == "raft":
        params, stats = port_raft(sd, small=False)
    elif args.model == "raft_small":
        params, stats = port_raft(sd, small=True)
    else:
        params, stats = port_classifier(sd)

    flat = {"params/" + "/".join(k): v for k, v in params.items()}
    flat.update({"batch_stats/" + "/".join(k): v for k, v in stats.items()})
    np.savez(args.out, **flat)
    print(f"wrote {len(flat)} arrays -> {args.out}")


if __name__ == "__main__":
    main()

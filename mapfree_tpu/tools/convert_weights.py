"""Convert reference PyTorch(-Lightning) RPR checkpoints to flax variables.

The reference releases trained weights (mapfree_rpr_weights.zip,
reference README.md:279) as Lightning checkpoints whose ``state_dict`` keys
mirror the module attributes of RegressionModel (encoder./aggregator./head.,
reference lib/models/regression/model.py:22-51). This tool maps that tree
onto this framework's flax param/batch_stats tree so reference checkpoints
run through the TPU inference pipeline without retraining.

Conventions handled:
- conv kernels: torch OIHW -> flax HWIO (grouped convs included);
- dense kernels: torch [out, in] -> flax [in, out];
- BatchNorm: weight/bias -> scale/bias; running stats -> batch_stats;
- module-name translation (Sequential indices, trunk flattening,
  ConvBnElu's 'normalize', fc1/2/3 <-> mlp.0/2/4, shortcut Sequential).

CLI:
    python -m mapfree_tpu.tools.convert_weights ckpt.ckpt out_dir \
        --config configs/regression/mapfree/3d3d.yaml \
        --dataset_config configs/mapfree.yaml
"""

from __future__ import annotations

import argparse

import numpy as np


def flax_path_to_torch_key(path) -> str:
    """Translate a flax variable path (tuple of names) to the reference's
    torch state_dict key."""
    parts = list(path)
    collection_leaf = parts[-1]

    out = []
    for p in parts[:-1]:
        if p == "trunk":
            continue  # head trunks are attributes of the head module itself
        if p.startswith("block") and p[5:].isdigit():
            out.append(p[5:])  # stage blocks are Sequential indices
        elif p == "bn":
            # "bn" only occurs inside ConvBnElu, whose torch counterpart
            # names its BatchNorm "normalize" (PreAct blocks use bn1/bn2/bn3)
            out.append("normalize")
        elif p == "cv_block":
            out.append("CV_block")
        elif p in ("fc1", "fc2", "fc3"):
            out.append({"fc1": "0", "fc2": "2", "fc3": "4"}[p])
        elif p == "shortcut":
            out.append("shortcut.0")  # reference wraps it in nn.Sequential
        else:
            out.append(p)

    leaf_map = {
        "kernel": "weight",
        "scale": "weight",
        "bias": "bias",
        "mean": "running_mean",
        "var": "running_var",
        "bin_score": "bin_score",
        "bin_feature": "bin_feature",
        "s_r": "s_r",
        "s_t": "s_t",
    }
    leaf = leaf_map.get(collection_leaf, collection_leaf)
    if collection_leaf in ("bin_score", "s_r", "s_t", "bin_feature"):
        return ".".join(out + [leaf]) if out else leaf
    return ".".join(out + [leaf])


def transform_tensor(torch_value: np.ndarray, flax_shape, path) -> np.ndarray:
    """Axis-convention transform for one tensor."""
    v = np.asarray(torch_value)
    if path[-1] == "kernel":
        if v.ndim == 4:  # conv OIHW -> HWIO
            v = v.transpose(2, 3, 1, 0)
        elif v.ndim == 2:  # dense [out, in] -> [in, out]
            v = v.transpose(1, 0)
    if tuple(v.shape) != tuple(flax_shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: torch {v.shape} vs "
            f"flax {tuple(flax_shape)}"
        )
    return v


def convert_state_dict(state_dict: dict, variables) -> dict:
    """Fill a flax variables tree from a reference torch state_dict.

    Raises KeyError listing any flax leaf without a torch source (partial
    checkpoints are an error: silent random weights are worse than failing).
    """
    import jax

    flat = {}
    missing = []
    for collection, tree in variables.items():
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for keypath, leaf in leaves:
            names = tuple(k.key for k in keypath)
            torch_key = flax_path_to_torch_key(names + ())
            # state_dicts may carry a "model." prefix depending on wrapper
            src = state_dict.get(torch_key, state_dict.get(f"model.{torch_key}"))
            if src is None:
                missing.append((collection, names, torch_key))
                continue
            flat[(collection,) + names] = transform_tensor(
                np.asarray(src), leaf.shape, names)
    if missing:
        detail = "\n".join(
            f"  {c}/{'/'.join(n)} <- {k}" for c, n, k in missing)
        raise KeyError(f"torch checkpoint missing {len(missing)} tensors:\n{detail}")

    # rebuild the nested tree
    out = {}
    for key, value in flat.items():
        node = out
        for part in key[:-1]:
            node = node.setdefault(part, {})
        node[key[-1]] = value
    return out


def load_torch_checkpoint(path) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() for k, v in state_dict.items()
            if hasattr(v, "numpy")}


def main():
    import jax
    import jax.numpy as jnp

    from mapfree_tpu.config import cfg
    from mapfree_tpu.models import build_regression_net

    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", help="reference .ckpt path")
    parser.add_argument("output", help="orbax checkpoint output dir")
    parser.add_argument("--config", required=True)
    parser.add_argument("--dataset_config", default="configs/mapfree.yaml")
    args = parser.parse_args()

    cfg.merge_from_file(args.dataset_config)
    cfg.merge_from_file(args.config)

    net = build_regression_net(cfg)
    H, W = cfg.DATASET.HEIGHT, cfg.DATASET.WIDTH
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(net.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), img, img, False)

    state_dict = load_torch_checkpoint(args.checkpoint)
    converted = convert_state_dict(state_dict, dict(variables))

    import orbax.checkpoint as ocp
    from pathlib import Path

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(args.output).absolute(), converted)
    ckptr.wait_until_finished()
    print(f"converted {len(state_dict)} tensors -> {args.output}")


if __name__ == "__main__":
    main()

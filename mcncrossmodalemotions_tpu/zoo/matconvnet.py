"""MatConvNet ``.mat`` weight import (released-model parity path).

The reference distributes its models as MatConvNet DagNN ``.mat`` files
(emoVoxZoo.m:74-102, ferPlusZoo.m downloads from
robots.ox.ac.uk/~albanie/models/...). This module loads those files and
rebuilds Flax variable trees so released weights can be run through the
TPU models for forward-parity validation against released logit
artifacts (wavLogits / afew-logits, SURVEY.md section 7 step 3).

Conventions handled:

- conv filters are stored HWCN (H, W, Cin, Cout) — identical to the Flax
  ``nn.Conv`` kernel layout, no transpose needed;
- batch-norm params come as (gamma, beta, moments[:, 0]=mean,
  moments[:, 1]=sigma) with sigma = sqrt(var + eps), so
  var = sigma^2 - eps;
- fully-connected layers appear as 1x1 convs; Dense kernels reshape from
  (1, 1, Cin, Cout) (or (Cin, Cout)) accordingly;
- ``ensure_compatibility``: stray fields like ``exBackprop`` on released
  models (misc/ensure_compatibility.m) are ignored by construction since
  only (name, value) pairs are read.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np

BN_EPSILON = 1e-5  # MatConvNet vl_nnbnorm default epsilon


def load_mat_params(path: str | Path) -> Dict[str, np.ndarray]:
    """Flat {param_name: array} from a DagNN/SimpleNN ``.mat`` file."""
    import scipy.io

    mat = scipy.io.loadmat(str(path), struct_as_record=False,
                           squeeze_me=True)
    net = mat.get("net", mat)
    params: Dict[str, np.ndarray] = {}
    if hasattr(net, "params"):  # DagNN: array of structs with .name/.value
        entries = np.atleast_1d(net.params)
        for p in entries:
            params[str(p.name)] = np.asarray(p.value)
    elif hasattr(net, "layers"):  # SimpleNN: per-layer weights cells
        for layer in np.atleast_1d(net.layers):
            name = str(getattr(layer, "name", ""))
            weights = getattr(layer, "weights", None)
            if weights is None:
                continue
            weights = np.atleast_1d(weights)
            for i, w in enumerate(weights):
                suffix = ["f", "b", "m"][i] if i < 3 else str(i)
                params[f"{name}_{suffix}"] = np.asarray(w)
    else:
        raise ValueError(f"{path}: no net.params or net.layers found")
    return params


def load_mat_meta(path: str | Path) -> dict:
    """Normalization meta (imageSize, averageImage, classes) if present."""
    import scipy.io

    mat = scipy.io.loadmat(str(path), struct_as_record=False, squeeze_me=True)
    net = mat.get("net", mat)
    meta = {}
    m = getattr(net, "meta", None)
    if m is not None:
        norm = getattr(m, "normalization", None)
        if norm is not None:
            for field in ("imageSize", "averageImage"):
                if hasattr(norm, field):
                    meta[field] = np.asarray(getattr(norm, field))
        classes = getattr(m, "classes", None)
        if classes is not None:
            names = getattr(classes, "name", classes)
            meta["classes"] = [str(c) for c in np.atleast_1d(names)]
    return meta


def conv_kernel(raw: np.ndarray, squeeze_axis: int = 2) -> np.ndarray:
    """HWCN filter -> Flax kernel (same layout, dtype-normalised).

    MATLAB squeezes singleton dims on save/load, so a 3-D filter is
    missing one axis; ``squeeze_axis`` names which one to restore
    (2 = single input channel, the common case; 1 = unit-width kernels
    like VGG-M's 9x1 fc6).
    """
    raw = np.asarray(raw, np.float32)
    if raw.ndim == 2:  # fc stored as matrix [Cin, Cout]
        return raw
    if raw.ndim == 3:
        return np.expand_dims(raw, squeeze_axis)
    return raw


def dense_kernel(raw: np.ndarray) -> np.ndarray:
    """1x1-conv (or matrix) weights -> Dense kernel [Cin, Cout]."""
    raw = np.asarray(raw, np.float32)
    if raw.ndim == 4:
        assert raw.shape[0] == raw.shape[1] == 1, raw.shape
        return raw[0, 0]
    return raw


def bn_variables(gamma: np.ndarray, beta: np.ndarray,
                 moments: np.ndarray, epsilon: float = BN_EPSILON) -> dict:
    """(gamma, beta, moments) -> {scale, bias, mean, var}."""
    gamma = np.asarray(gamma, np.float32).reshape(-1)
    beta = np.asarray(beta, np.float32).reshape(-1)
    moments = np.asarray(moments, np.float32)
    mean = moments[:, 0]
    sigma = moments[:, 1]
    var = np.maximum(sigma ** 2 - epsilon, 0.0)
    return {"scale": gamma, "bias": beta, "mean": mean, "var": var}


def import_variables(params: Dict[str, np.ndarray],
                     layer_map: Dict[str, dict]) -> dict:
    """Build a Flax variables tree from flat params + a layer mapping.

    ``layer_map`` maps a Flax module path (``"conv1"``,
    ``"layer1_0/bn2"``…) to a spec dict:
      {"kind": "conv"|"dense"|"bn",
       "filters"/"bias": param names, or for bn:
       "gamma"/"beta"/"moments": param names}.
    Returns {"params": ..., "batch_stats": ...} nested by path.
    """
    tree: dict = {"params": {}, "batch_stats": {}}

    def insert(root: dict, path: str, leaf: dict) -> None:
        parts = path.split("/")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = leaf

    for path, spec in layer_map.items():
        kind = spec["kind"]
        if kind == "conv":
            leaf = {"kernel": conv_kernel(params[spec["filters"]],
                                          spec.get("squeeze_axis", 2))}
            if "bias" in spec and spec["bias"] in params:
                leaf["bias"] = np.asarray(params[spec["bias"]], np.float32).reshape(-1)
            insert(tree["params"], path, leaf)
        elif kind == "dense":
            leaf = {"kernel": dense_kernel(params[spec["filters"]])}
            if "bias" in spec and spec["bias"] in params:
                leaf["bias"] = np.asarray(params[spec["bias"]], np.float32).reshape(-1)
            insert(tree["params"], path, leaf)
        elif kind == "bn":
            bn = bn_variables(params[spec["gamma"]], params[spec["beta"]],
                              params[spec["moments"]],
                              spec.get("epsilon", BN_EPSILON))
            insert(tree["params"], path, {"scale": bn["scale"], "bias": bn["bias"]})
            insert(tree["batch_stats"], path, {"mean": bn["mean"], "var": bn["var"]})
        else:
            raise ValueError(f"unknown layer kind {kind!r} for {path}")
    return tree


def vggm_layer_map(prefix: str = "") -> Dict[str, dict]:
    """Mapping for VGGVox-style VGG-M releases (conv{1..5}, fc{6,7,8}).

    MatConvNet param naming convention: ``<layer>f`` / ``<layer>b`` for
    conv filters/biases, ``bn<k>{m,x,v}``-style for batch norm (exact
    names vary per release; remap with ``rename`` when needed).
    """
    m: Dict[str, dict] = {}
    for i in range(1, 6):
        m[f"{prefix}conv{i}"] = {"kind": "conv", "filters": f"conv{i}f",
                                 "bias": f"conv{i}b"}
        m[f"{prefix}bn{i}"] = {"kind": "bn", "gamma": f"bn{i}f",
                               "beta": f"bn{i}b", "moments": f"bn{i}m"}
    m[f"{prefix}fc6"] = {"kind": "conv", "filters": "fc6f", "bias": "fc6b",
                         "squeeze_axis": 1}  # 9x1 kernel: W squeezed
    m[f"{prefix}bn6"] = {"kind": "bn", "gamma": "bn6f", "beta": "bn6b",
                         "moments": "bn6m"}
    m[f"{prefix}fc7"] = {"kind": "dense", "filters": "fc7f", "bias": "fc7b"}
    m[f"{prefix}prediction"] = {"kind": "dense", "filters": "fc8f",
                                "bias": "fc8b"}
    return m


def import_vggm_student(mat_path: str | Path) -> dict:
    """Released emovoxceleb-student .mat -> VGGMStudent variables."""
    params = load_mat_params(mat_path)
    return import_variables(params, vggm_layer_map())

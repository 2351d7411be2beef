"""Pretrained-weight import with the reference's .npy semantics.

The reference loads name -> {'weights': W, 'biases': b} dicts and silently
skips shape mismatches when ignore_missing=True (network.py:45-64) — that
skip is what keeps ImageNet's 3-channel conv1_1 from loading into the
9-channel BEV conv1_1 (it stays at its random init). Replicated here.

Also provides the pretrain-dict builder replicating
data/pretrain_model/make_pretrain_data.ipynb: duplicate every conv under
`*_2` for the image trunk and subsample VGG's fc6/fc7 4096->2048 with
np.random.randint(4096, size=2048) for fc6_1/fc6_2/fc7_1/fc7_2.
"""

import numpy as np


def _fc_row_perm(n_rows, pooled=7, channels=512):
    """Row permutation mapping the reference's channel-major fc flatten
    (c, h, w) to our NHWC flatten (h, w, c). models/mv3d.fc_apply skips
    the reference's NCHW transpose; imported fc weights acting on pooled
    feature maps must have their rows reordered to match."""
    return (np.arange(n_rows).reshape(channels, pooled, pooled)
            .transpose(1, 2, 0).reshape(-1))


# fc layers whose inputs are ROI-pooled maps in the reference graphs
_POOLED_FC_KEYS = ("fc6", "fc6_1", "fc6_2")


def load_npy_weights(params, path_or_dict, ignore_missing=True, log=print):
    """Merge a reference-style .npy weight dict into a param pytree.

    Returns a NEW pytree; assignment skips unknown names and (when
    ignore_missing) shape mismatches, like network.py:52-64. fc6-family
    weight rows are permuted from the reference's channel-major flatten
    to NHWC (see _fc_row_perm).
    """
    if isinstance(path_or_dict, (str, bytes)):
        data = np.load(path_or_dict, allow_pickle=True).item()
    else:
        data = path_or_dict
    out = dict(params)
    for key, sub in data.items():
        if key not in out:
            if log:
                log("ignore " + key)
            if not ignore_missing:
                raise KeyError(key)
            continue
        new_layer = dict(out[key])
        for subkey, value in sub.items():
            if subkey not in new_layer:
                if log:
                    log("ignore {}/{}".format(key, subkey))
                if not ignore_missing:
                    raise KeyError((key, subkey))
                continue
            if tuple(new_layer[subkey].shape) != tuple(np.shape(value)):
                if log:
                    log("ignore " + key + " (shape mismatch)")
                if not ignore_missing:
                    raise ValueError((key, subkey))
                continue
            arr = np.asarray(value,
                             dtype=np.asarray(new_layer[subkey]).dtype)
            if (key in _POOLED_FC_KEYS and subkey == "weights"
                    and arr.ndim == 2 and arr.shape[0] % 49 == 0):
                channels = arr.shape[0] // 49
                arr = arr[_fc_row_perm(arr.shape[0], 7, channels)]
            new_layer[subkey] = arr
            if log:
                log("assign pretrain model " + subkey + " to " + key)
        out[key] = new_layer
    return out


def make_mv3d_pretrain_dict(vgg_dict, fc_dim=2048, seed=None):
    """Standard VGG16 .npy dict -> MV3D pretrain dict.

    Replicates make_pretrain_data.ipynb: conv weights duplicated under
    `*_2`; fc6 (25088x4096) and fc7 (4096x4096) subsampled to fc_dim
    columns with np.random.randint (WITH replacement, like the notebook)
    for both the `_1` and `_2` copies.
    """
    rng = np.random.RandomState(seed)
    out = {}
    conv_names = [k for k in vgg_dict if k.startswith("conv")]
    for k in conv_names:
        out[k] = dict(vgg_dict[k])
        out[k + "_2"] = dict(vgg_dict[k])

    if "fc6" in vgg_dict and "fc7" in vgg_dict:
        idx6 = rng.randint(vgg_dict["fc6"]["weights"].shape[1], size=fc_dim)
        idx7 = rng.randint(vgg_dict["fc7"]["weights"].shape[1], size=fc_dim)
        fc6 = {"weights": vgg_dict["fc6"]["weights"][:, idx6],
               "biases": vgg_dict["fc6"]["biases"][idx6]}
        fc7 = {"weights": vgg_dict["fc7"]["weights"][idx6][:, idx7],
               "biases": vgg_dict["fc7"]["biases"][idx7]}
        for tgt, src in (("fc6_1", fc6), ("fc6_2", fc6),
                         ("fc7_1", fc7), ("fc7_2", fc7)):
            out[tgt] = {k: np.array(v) for k, v in src.items()}
    return out

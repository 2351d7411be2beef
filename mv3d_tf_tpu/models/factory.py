"""Network factory — name-dispatch parity with lib/networks/factory.py:23-33.

The reference returns a TF graph object per name; here a network is a
(init_fn, mode) descriptor over the functional MV3D model — *_train and
*_test share one parameter pytree (train/test differ by dropout + target
layers, not by graph).
"""

from mv3d_tf_tpu.models import mv3d


class NetworkSpec:
    def __init__(self, name, mode):
        self.name = name
        self.mode = mode                     # 'train' | 'test'
        self.n_classes = mv3d.N_CLASSES
        self.feat_stride = mv3d.FEAT_STRIDE

    def init_params(self, key):
        return mv3d.init_params(key)


def get_network(name):
    """'..._train' -> train spec, '..._test' -> test spec (factory.py:23-33)."""
    if name.endswith("_train"):
        return NetworkSpec(name, "train")
    if name.endswith("_test"):
        return NetworkSpec(name, "test")
    raise KeyError("Unknown network: {}".format(name))

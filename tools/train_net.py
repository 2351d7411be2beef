#!/usr/bin/env python
"""Train an MV3D network — CLI parity with the reference tools/train_net.py
(same flags: --device/--device_id/--weights/--imdb/--iters/--cfg/--network/
--set/--rand; --kitti_path added for relocatable data).

On TPU the --device flag selects jax platform; graph placement is
automatic (the reference computed a device string and never applied it,
train_net.py:88-89).
"""

import argparse
import pprint
import sys

import _init_paths  # noqa: F401
import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="Train an MV3D network")
    parser.add_argument("--device", dest="device", default="tpu", type=str,
                        help="device to use: tpu | cpu | gpu")
    parser.add_argument("--device_id", dest="device_id", default=0, type=int)
    parser.add_argument("--solver", dest="solver", default=None, type=str)
    parser.add_argument("--iters", dest="max_iters", default=70000, type=int)
    parser.add_argument("--weights", dest="pretrained_model", default=None,
                        type=str)
    parser.add_argument("--cfg", dest="cfg_file", default=None, type=str)
    parser.add_argument("--imdb", dest="imdb_name", default="kitti_train",
                        type=str)
    parser.add_argument("--rand", dest="randomize", action="store_true",
                        help="randomize (do not use a fixed seed)")
    parser.add_argument("--network", dest="network_name",
                        default="MV3D_train", type=str)
    parser.add_argument("--kitti_path", dest="kitti_path", default=None,
                        type=str)
    parser.add_argument("--devkit_path", dest="devkit_path", default=None,
                        type=str, help="VOCdevkit path for voc_* imdbs")
    parser.add_argument("--resume", dest="resume", action="store_true",
                        help="resume from the latest snapshot (incl. Adam state)")
    parser.add_argument("--dtype", dest="dtype", default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--set", dest="set_cfgs", default=None,
                        nargs=argparse.REMAINDER)
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    return parser.parse_args()


def main():
    args = parse_args()
    print("Called with args:")
    print(args)

    import jax
    if args.device.lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from mv3d_tf_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp
    from mv3d_tf_tpu.config import (cfg, cfg_from_file, cfg_from_list,
                                    get_output_dir)
    from mv3d_tf_tpu.data.kitti import get_imdb, prepare_roidb
    from mv3d_tf_tpu.models.factory import get_network
    from mv3d_tf_tpu.solver import train_net, train_net_2d

    if args.cfg_file is not None:
        cfg_from_file(args.cfg_file)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs)

    print("Using config:")
    pprint.pprint(cfg)

    if not args.randomize:
        np.random.seed(cfg.RNG_SEED)

    imdb = get_imdb(args.imdb_name, kitti_path=args.kitti_path,
                    devkit_path=args.devkit_path)
    print("Loaded dataset `{:s}` for training".format(imdb.name))
    if args.network_name.startswith("VGGnet"):
        roidb = imdb.roidb
        for i, entry in enumerate(roidb):
            entry.setdefault("image_path", imdb.image_path_at(i))
    else:
        roidb = prepare_roidb(imdb)
    print("{:d} roidb entries".format(len(roidb)))

    output_dir = get_output_dir(imdb, None)
    print("Output will be saved to `{:s}`".format(output_dir))

    network = get_network(args.network_name)
    print("Use network `{:s}` in training".format(args.network_name))

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    seed = None if not args.randomize else int(np.random.rand() * 1e6)
    if args.network_name.startswith("VGGnet"):
        # legacy 2D Faster R-CNN family (tools/demo.py path)
        train_net_2d(imdb, roidb, output_dir,
                     pretrained_model=args.pretrained_model,
                     max_iters=args.max_iters, compute_dtype=dtype,
                     seed=seed)
    else:
        train_net(imdb, roidb, output_dir,
                  pretrained_model=args.pretrained_model,
                  max_iters=args.max_iters, compute_dtype=dtype,
                  seed=seed, resume=args.resume)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Test an MV3D network — CLI parity with the reference tools/test_net.py
(flags --device/--device_id/--weights/--cfg/--wait/--imdb/--comp/--network/
--set; --kitti_path added)."""

import argparse
import os
import pprint
import sys
import time

import _init_paths  # noqa: F401


def parse_args():
    parser = argparse.ArgumentParser(description="Test an MV3D network")
    parser.add_argument("--device", dest="device", default="tpu", type=str)
    parser.add_argument("--device_id", dest="device_id", default=0, type=int)
    parser.add_argument("--def", dest="prototxt", default=None, type=str)
    parser.add_argument("--weights", dest="model", default=None, type=str,
                        help="snapshot path (orbax dir or .npy)")
    parser.add_argument("--cfg", dest="cfg_file", default=None, type=str)
    parser.add_argument("--wait", dest="wait", default=True, type=bool,
                        help="wait until the snapshot exists")
    parser.add_argument("--imdb", dest="imdb_name", default="kitti_val",
                        type=str)
    parser.add_argument("--comp", dest="comp_mode", action="store_true")
    parser.add_argument("--network", dest="network_name",
                        default="MV3D_test", type=str)
    parser.add_argument("--kitti_path", dest="kitti_path", default=None,
                        type=str)
    parser.add_argument("--devkit_path", dest="devkit_path", default=None,
                        type=str, help="VOCdevkit path for voc_* imdbs")
    parser.add_argument("--dtype", dest="dtype", default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--host_id", dest="host_id", default=None, type=int,
                        help="evaluate only this host's frame shard")
    parser.add_argument("--host_count", dest="host_count", default=1,
                        type=int, help="total hosts sharding the eval")
    parser.add_argument("--merge_shards", dest="merge_shards",
                        action="store_true",
                        help="merge per-host shard pickles and evaluate")
    parser.add_argument("--int8", dest="int8", action="store_true",
                        help="int8 PTQ eval (calibrates on the first "
                             "frames; tools/quant_check.py is the "
                             "accuracy gate)")
    parser.add_argument("--int8_stem", dest="int8_stem", default=None,
                        choices=[None, "bf16", "s2d", "s2d_int8"])
    parser.add_argument("--int8_conv_impl", dest="int8_conv_impl",
                        default="xla", choices=["xla", "pallas", "dots"])
    parser.add_argument("--int8_head", dest="int8_head",
                        action="store_true")
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
    from mv3d_tf_tpu.config import cfg, cfg_from_file, cfg_from_list
    from mv3d_tf_tpu.data.kitti import get_imdb
    from mv3d_tf_tpu.models import mv3d
    from mv3d_tf_tpu.models.factory import get_network
    from mv3d_tf_tpu.solver import test_net, test_net_2d
    from mv3d_tf_tpu.utils.checkpoint import load_pretrained

    if args.cfg_file is not None:
        cfg_from_file(args.cfg_file)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs)

    print("Using config:")
    pprint.pprint(cfg)

    # wait for the training side to produce the snapshot (test_net.py:70-72)
    while args.model and not os.path.exists(args.model) and args.wait:
        print("Waiting for {} to exist...".format(args.model))
        time.sleep(10)

    imdb = get_imdb(args.imdb_name, kitti_path=args.kitti_path,
                    devkit_path=args.devkit_path)
    get_network(args.network_name)
    print("Use network `{:s}` in testing".format(args.network_name))

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    weights_filename = "default"
    if args.network_name.startswith("VGGnet"):
        from mv3d_tf_tpu.models import vggnet
        params = vggnet.init_params_2d(jax.random.PRNGKey(0),
                                       n_classes=imdb.num_classes)
        if args.model:
            params = load_pretrained(params, args.model)
            weights_filename = os.path.splitext(
                os.path.basename(args.model))[0]
        test_net_2d(params, imdb, weights_filename=weights_filename,
                    compute_dtype=dtype)
        return

    params = mv3d.init_params(jax.random.PRNGKey(0))
    if args.model:
        params = load_pretrained(params, args.model)
        weights_filename = os.path.splitext(os.path.basename(args.model))[0]

    if args.merge_shards:
        from mv3d_tf_tpu.parallel.multihost import merge_shards
        merge_shards(imdb, args.host_count,
                     weights_filename=weights_filename)
    elif args.host_id is not None:
        from mv3d_tf_tpu.parallel.multihost import run_host_shard
        path = run_host_shard(params, imdb, args.host_id, args.host_count,
                              weights_filename=weights_filename,
                              compute_dtype=dtype)
        print("wrote shard " + path)
    else:
        quant_cfg = None
        if args.int8:
            quant_cfg = {"stem": args.int8_stem,
                         "conv_impl": args.int8_conv_impl,
                         "int8_head": args.int8_head}
        test_net(params, imdb, weights_filename=weights_filename,
                 compute_dtype=dtype, quant_cfg=quant_cfg)


if __name__ == "__main__":
    main()

"""Path bootstrap (tools/_init_paths.py parity): make mv3d_tf_tpu
importable when running tools/ scripts from anywhere."""

import os.path as osp
import sys

this_dir = osp.dirname(osp.abspath(__file__))
repo_root = osp.join(this_dir, "..")
if repo_root not in sys.path:
    sys.path.insert(0, repo_root)

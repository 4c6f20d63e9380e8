"""Multi-scan data-parallel training CLI: one scan per device.

    python scripts/train_multi_scan.py --conf confs/udf_dtu_blending.conf \
        --cases scan24 scan37 scan40 scan55 --end_iter 300000

Each scan trains with independent parameters; the scan axis is sharded
over the device mesh (BASELINE.json north-star: 8 cases over a v4-8).
Scans must share image resolution and view count.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--conf", type=str, required=True)
    p.add_argument("--cases", type=str, nargs="+", required=True)
    p.add_argument("--end_iter", type=int, default=0)
    p.add_argument("--report_freq", type=int, default=100)
    p.add_argument("--out_dir", type=str, default="./exp/multi_scan")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--multihost", action="store_true",
                   help="multi-host pod: initialize jax.distributed and train "
                        "this process's contiguous share of --cases")
    args = p.parse_args()

    from neuraludf_tpu.utils import setup_jax

    setup_jax()

    if args.multihost:
        import jax

        from neuraludf_tpu.parallel import multihost

        multihost.initialize()
        args.cases = multihost.shard_scans(
            args.cases, jax.process_index(), jax.process_count()
        )
        if not args.cases:
            print("no scans assigned to this host")
            return

    import pickle

    import jax
    import numpy as np

    from neuraludf_tpu import config as config_mod
    from neuraludf_tpu.parallel.multi_scan import multi_scan_train
    from neuraludf_tpu.parallel.sharding import make_mesh

    overrides = {}
    if args.end_iter > 0:
        overrides["train__end_iter"] = args.end_iter
    # the conf's CASE_NAME resolves per scan inside multi_scan_train
    cfg = config_mod.load(args.conf, case=args.cases[0], **overrides)
    data_dirs = [
        cfg.dataset.data_dir.replace(args.cases[0], case) for case in args.cases
    ]

    if args.multihost:
        # scans were partitioned per host: each process trains its share on
        # its LOCAL chips, zero cross-host traffic (scans are independent)
        from jax.sharding import Mesh

        devs = jax.local_devices()
        mesh = Mesh(np.array(devs[: min(len(devs), len(args.cases))]), ("data",))
    else:
        n_dev = len(jax.devices())
        mesh = make_mesh(min(n_dev, len(args.cases)))
    print(f"training {len(args.cases)} scans over mesh {mesh.shape}")

    params, opt_state, metrics = multi_scan_train(
        cfg, data_dirs, cfg.train.end_iter, mesh=mesh,
        seed=args.seed, report_freq=args.report_freq,
    )
    os.makedirs(args.out_dir, exist_ok=True)
    for i, case in enumerate(args.cases):
        leaf = jax.tree_util.tree_map(lambda x: np.asarray(x[i]), params)
        with open(os.path.join(args.out_dir, f"{case}.ckpt"), "wb") as f:
            pickle.dump({"params": leaf, "iter_step": cfg.train.end_iter}, f)
    print("saved per-scan checkpoints under", args.out_dir)


if __name__ == "__main__":
    main()

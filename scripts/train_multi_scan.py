"""Multi-scan data-parallel training CLI: one scan per device.

    python scripts/train_multi_scan.py --conf confs/udf_dtu_blending.conf \
        --cases scan24 scan37 scan40 scan55 --end_iter 300000

Each scan trains with independent parameters; the scan axis is sharded
over the device mesh (BASELINE.json north-star: 8 cases over a v4-8).
Scans must share image resolution and view count. Production loop
(parallel/multi_scan.py:MultiScanRunner): windowed dispatch, per-scan
checkpoint/resume (single-scan Runner format), periodic per-scan
validation renders + mesh exports, per-scan trainability state machines.
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
    p.add_argument("--report_freq", type=int, default=0,
                   help="override train.report_freq")
    p.add_argument("--out_dir", type=str, default="./exp/multi_scan")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--is_continue", action="store_true",
                   help="resume every scan from its newest common checkpoint")
    p.add_argument("--is_finetune", action="store_true")
    p.add_argument("--reg_weights_schedule", action="store_true")
    p.add_argument("--final_mesh_resolution", type=int, default=512)
    p.add_argument("--multihost", action="store_true",
                   help="multi-host pod: initialize jax.distributed and train "
                        "this process's round-robin share of --cases")
    p.add_argument("--sweep", type=str, default=None,
                   help="hyperparameter sweep over ONE case: "
                        "'field=v1,v2,...' (e.g. sparse_weight=0.001,0.01). "
                        "Requires exactly one --cases entry; it is replicated "
                        "once per value and each replica trains with that "
                        "override — the reference's per-scan -s sweep "
                        "(bashs/bash_garment_blending.sh:32-36) as one "
                        "compiled program across the mesh")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (virtual mesh via XLA_FLAGS="
                        "--xla_force_host_platform_device_count=N)")
    args = p.parse_args()

    from neuraludf_tpu.utils import setup_jax

    setup_jax()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    multihost_mod = None
    if args.multihost:
        import jax

        from neuraludf_tpu.parallel import multihost as multihost_mod

        multihost_mod.initialize()
        args.cases = multihost_mod.shard_scans(
            args.cases, jax.process_index(), jax.process_count()
        )

    import jax
    import numpy as np

    from neuraludf_tpu import config as config_mod
    from neuraludf_tpu.parallel.multi_scan import MultiScanRunner
    from neuraludf_tpu.parallel.sharding import make_mesh

    try:
        if not args.cases:
            # fewer scans than hosts: this process has no work, but it must
            # stay alive until the training hosts finish — leaving early
            # makes the coordination service treat it as a failed peer and
            # abort the job (ADVICE r2)
            print("no scans assigned to this host; waiting at the barrier")
            return

        overrides = {}
        if args.end_iter > 0:
            overrides["train__end_iter"] = args.end_iter
        if args.report_freq > 0:
            overrides["train__report_freq"] = args.report_freq
        # the conf's CASE_NAME resolves per scan
        cfg = config_mod.load(args.conf, case=args.cases[0], **overrides)
        data_dirs = [
            cfg.dataset.data_dir.replace(args.cases[0], case) for case in args.cases
        ]

        train_overrides = None
        if args.sweep:
            assert len(args.cases) == 1, "--sweep takes exactly one --cases"
            field, _, vals = args.sweep.partition("=")
            values = [float(v) for v in vals.split(",") if v]
            assert len(values) >= 2, "--sweep needs >= 2 values"
            train_overrides = [{field: v} for v in values]
            args.cases = [f"{args.cases[0]}_{field}{v:g}" for v in values]
            data_dirs = data_dirs * len(values)
            print(f"sweeping {field} over {values} on {data_dirs[0]}")

        if args.multihost:
            # scans were partitioned per host: each process trains its share
            # on its LOCAL chips, zero cross-host traffic (independent scans)
            from jax.sharding import Mesh

            devs = jax.local_devices()
            mesh = Mesh(np.array(devs[: min(len(devs), len(args.cases))]), ("data",))
        else:
            mesh = make_mesh(min(len(jax.devices()), len(args.cases)))
        print(f"training {len(args.cases)} scans over mesh {mesh.shape}")

        runner = MultiScanRunner(
            cfg, data_dirs, case_names=args.cases, mesh=mesh,
            out_dir=args.out_dir, seed=args.seed,
            is_continue=args.is_continue, is_finetune=args.is_finetune,
            reg_weights_schedule=args.reg_weights_schedule,
            train_overrides=train_overrides,
        )
        runner.train()
        runner.save_checkpoints()
        meshes = runner.final_meshes(resolution=args.final_mesh_resolution)
        print("saved per-scan checkpoints + meshes under", args.out_dir)
        for case, m in zip(args.cases, meshes):
            print(f"  {case}: {m}")
    finally:
        if args.multihost and multihost_mod is not None:
            multihost_mod.barrier("multi_scan_done")


if __name__ == "__main__":
    main()

"""Distributed GNN training example — single process or a pod slice.

Single host (uses all local devices; on this image, force the virtual
CPU mesh to see multi-device behavior):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/dist_train.py --platform cpu --epochs 10

Pod slice (every host runs the SAME command; jax.distributed discovers
peers on Cloud TPU):

    python examples/dist_train.py --multihost --epochs 50

The mesh is ('row', 'col'): graph-node stripes with halo exchange over
'row', tensor-parallel feature sharding over 'col' (parallel/train.py).
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--multihost", action="store_true")
    ap.add_argument("--n-nodes", type=int, default=2048)
    ap.add_argument("--dims", type=int, nargs="*", default=[32, 64, 8])
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--block-size", type=int, default=32)
    ap.add_argument("--strategy", default="ring", choices=["ring", "allgather"])
    ap.add_argument("--col-parallel", type=int, default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from spmm_denseblock_tpu.parallel import make_mesh, pod_mesh
    from spmm_denseblock_tpu.parallel.multihost import initialize, is_coordinator
    from spmm_denseblock_tpu.parallel.train import (
        make_dist_train_step,
        random_problem,
    )

    if args.multihost:
        initialize()
        mesh = pod_mesh(row_parallelism=args.col_parallel and
                        len(jax.devices()) // args.col_parallel)
    else:
        n = len(jax.devices())
        col = args.col_parallel or (2 if n >= 4 and n % 2 == 0 else 1)
        mesh = make_mesh((n // col, col))
    log = print if (not args.multihost or is_coordinator()) else (lambda *a: None)
    log(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
        f"on {jax.device_count()} devices / {jax.process_count()} processes")

    adj, x, y, mask = random_problem(args.n_nodes, args.dims, p=0.02, seed=0)
    params, opt_state, step = make_dist_train_step(
        adj, mesh, args.dims, model="gcn",
        block_size=args.block_size, strategy=args.strategy,
    )

    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        params, opt_state, m = step(params, opt_state, x, y, mask)
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            log(f"epoch {epoch:3d} loss {float(m['loss']):.4f} "
                f"acc {float(m['acc']):.3f}")
    dt = time.perf_counter() - t0
    log(f"{args.epochs} epochs in {dt:.1f}s ({dt / args.epochs * 1e3:.0f} ms/epoch)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Multi-host TPU pod launcher (the reference's cluster-launch analogue,
reference: nautilus/launch.py — which delegates to an internal k8s package;
here we wire jax.distributed directly).

Run the SAME command on every host of the pod slice (e.g. via
`gcloud compute tpus tpu-vm ssh --worker=all`):

    python scripts/launch_multihost.py --coordinator=<host0-ip>:8476 \
        --num-hosts=4 --host-id=$WORKER_ID -- \
        task=mt30 model_size=317 data_dir=/data/mt30 mesh_shape=16x2

On TPU VMs, jax.distributed auto-detects coordinator/host counts from the
TPU metadata, so all three flags may be omitted there.
"""

from __future__ import annotations

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--coordinator', default=None,
                    help='host0 address, e.g. 10.0.0.2:8476')
    ap.add_argument('--num-hosts', type=int, default=None)
    ap.add_argument('--host-id', type=int, default=None)
    ap.add_argument('overrides', nargs='*', help='train.py key=value overrides')
    args = ap.parse_args()

    import jax
    if args.coordinator or args.num_hosts:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.host_id)
    else:
        jax.distributed.initialize()  # TPU-VM metadata autodetection
    print(f'[host {jax.process_index()}/{jax.process_count()}] '
          f'{jax.local_device_count()} local / {jax.device_count()} global devices')

    from tdmpc2_tpu.train import main as train_main
    train_main(args.overrides)


if __name__ == '__main__':
    sys.exit(main())

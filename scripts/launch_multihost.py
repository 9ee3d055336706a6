#!/usr/bin/env python
"""Multi-host launch scaffolding (run one copy per host of a TPU slice).

The reference scales out with per-rank worker processes over NCCL
(multiproc_executor / Ray); the TPU-native equivalent is one process per
host, each driving its local chips, joined into a single global mesh by
``jax.distributed.initialize`` — collectives ride ICI within the slice
and DCN across slices, all inserted by the XLA SPMD partitioner.

    # on every host of the slice (coordinator = host 0's address):
    python scripts/launch_multihost.py --model /path/Qwen3-8B \
        --coordinator 10.0.0.1:8476 --num-hosts 4 --host-id $HOST_ID

Host 0 runs the engine frontend (scheduler + OpenAI server); all hosts
participate in every jitted step through the shared mesh. Single-host
multi-chip needs none of this — the default mesh already spans all
local chips.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--coordinator", required=True,
                    help="host0 address, e.g. 10.0.0.1:8476")
    ap.add_argument("--num-hosts", type=int, required=True)
    ap.add_argument("--host-id", type=int, required=True)
    ap.add_argument("--tensor-parallel-size", type=int, default=0,
                    help="0 = all devices in the global mesh")
    ap.add_argument("--control-port", type=int, default=8576,
                    help="ZMQ step-broadcast port on host 0 (port+1 is "
                    "the ack channel)")
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args()

    import jax

    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_hosts,
        process_id=args.host_id,
    )
    n_devices = len(jax.devices())
    print(f"host {args.host_id}: global mesh has {n_devices} devices")

    from vllm_trianglemix_tpu.config import (
        EngineConfig,
        ModelConfig,
        ParallelConfig,
    )

    host0 = args.coordinator.rsplit(":", 1)[0]
    tp = args.tensor_parallel_size or n_devices
    config = EngineConfig(
        model=ModelConfig(model=args.model),
        parallel=ParallelConfig(
            tensor_parallel_size=tp,
            num_hosts=args.num_hosts,
            host_id=args.host_id,
            control_address=f"tcp://{host0}:{args.control_port}",
        ),
    )

    if args.host_id == 0:
        # Engine in-process (the MultiHostExecutor broadcasts each step).
        from vllm_trianglemix_tpu.entrypoints.openai.api_server import (
            run_server,
        )

        run_server(config, port=args.port)
    else:
        # Peer hosts execute host 0's SchedulerOutput stream in lockstep
        # (executor/multihost_executor.py run_worker_loop).
        from vllm_trianglemix_tpu.executor.multihost_executor import (
            run_worker_loop,
        )

        run_worker_loop(config)


if __name__ == "__main__":
    main()

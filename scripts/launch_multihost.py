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
    from vllm_trianglemix_tpu.entrypoints.openai.api_server import run_server

    tp = args.tensor_parallel_size or n_devices
    config = EngineConfig(
        model=ModelConfig(model=args.model),
        parallel=ParallelConfig(tensor_parallel_size=tp),
    )

    if args.host_id == 0:
        run_server(config, port=args.port)
    else:
        # Non-zero hosts join every collective through their jitted step
        # executions; the frontend drives host 0. A per-host input-feed
        # broadcast loop lands with the multi-host executor (round 2).
        raise SystemExit(
            "multi-host engine loop lands in round 2; this script "
            "documents and validates the jax.distributed bring-up")


if __name__ == "__main__":
    main()

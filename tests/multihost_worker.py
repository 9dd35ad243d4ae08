"""Worker process for the 2-process multi-host integration test.

Launched by tests/test_multihost_integration.py with
JAX_COORDINATOR_ADDRESS / JAX_PROCESS_COUNT / JAX_PROCESS_ID in the
environment; ``train()`` itself performs the cluster join via
``maybe_initialize_distributed`` — the exact code path a real pod launch
takes (SURVEY.md §2 "Communication backend"). Not a test module.
"""

import os
import sys


def main() -> None:
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2")
    import jax
    # sitecustomize re-registers the TPU plugin; force CPU before any
    # backend use (same dance as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

    from wfl_asr_tpu.train.loop import train
    params, _ = train(sys.argv[1])

    # Digest of this process's OWN final (replicated) params, printed by
    # both processes: the test asserts they agree bit-for-bit — desynced
    # training (different trip counts, unsynced grads) would differ.
    import numpy as np
    leaves = jax.tree_util.tree_leaves(jax.device_get(params))
    digest = float(sum(np.abs(np.asarray(l, np.float64)).sum()
                       for l in leaves))
    print(f"WORKER_DONE pid={jax.process_index()} "
          f"params_l1={digest:.10e}", flush=True)


if __name__ == "__main__":
    main()

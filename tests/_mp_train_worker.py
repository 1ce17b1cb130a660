"""Subprocess worker for the two-real-process distributed test
(tests/test_multiprocess.py): one OS process of an N-process CPU gloo job.

Launched as  python tests/_mp_train_worker.py <family> <cli argv...>
with PANTO_COORDINATOR / PANTO_NUM_PROCESSES / PANTO_PROCESS_ID and
XLA_FLAGS=--xla_force_host_platform_device_count=<k> set by the parent.
This is the shape of a real multi-controller launch (the torchrun analogue,
/root/reference/README.md:329) with CPU devices standing in for TPU chips.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the env var alone is ignored when the axon TPU plugin is installed (CLAUDE.md)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

family = sys.argv[1]
sys.argv = [sys.argv[0]] + sys.argv[2:]

if family == "emage":
    from pantomatrix_tpu.cli.train_emage import main
elif family == "camn":
    from pantomatrix_tpu.cli.train_camn import main
elif family == "disco":
    from pantomatrix_tpu.cli.train_disco import main
else:
    raise SystemExit(f"unknown family {family!r}")

main()
print(f"WORKER_DONE process={jax.process_index()}/{jax.process_count()}", flush=True)

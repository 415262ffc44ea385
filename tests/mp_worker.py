"""Worker process for tests/test_multihost.py::TestTwoProcessIntegration.

NOT a test file. Launched twice by the test with SWNERF_COORDINATOR /
SWNERF_NUM_PROCESSES / SWNERF_PROCESS_ID in the environment; run_nerf's own
``initialize_from_env`` performs the ``jax.distributed.initialize`` handshake
(localhost coordinator, Gloo cross-process CPU collectives), after which the
two processes form one 8-device mesh (4 virtual CPU devices each).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The image's sitecustomize pre-registers the remote TPU backend; pin CPU
# (the launching test also clears PALLAS_AXON_POOL_IPS in our env).
jax.config.update("jax_platforms", "cpu")

from swnerf_tpu.pipelines.run_nerf import train

if __name__ == "__main__":
    train(sys.argv[1:])

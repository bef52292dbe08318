"""Subprocess worker for the mesh-CLI training test (test_train_cli.py).

Forces the CPU backend (the env pins an axon TPU; config.update must
happen before first backend use), then runs scripts/train_ditto.py's main
with the forwarded argv. XLA_FLAGS with the virtual device count is set by
the parent in the subprocess env.
"""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "scripts"))

import jax

jax.config.update("jax_platforms", "cpu")

import train_ditto

if __name__ == "__main__":
    sys.argv = ["train_ditto.py"] + sys.argv[1:]
    train_ditto.main()

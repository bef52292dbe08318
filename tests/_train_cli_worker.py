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

if __name__ == "__main__":
    # first arg selects the entry point: ditto (default) | nac | slp
    which = "ditto"
    argv = sys.argv[1:]
    if argv and argv[0] in ("ditto", "nac", "slp"):
        which, argv = argv[0], argv[1:]
    import importlib
    mod = importlib.import_module(f"train_{which}")
    sys.argv = [f"train_{which}.py"] + argv
    mod.main()

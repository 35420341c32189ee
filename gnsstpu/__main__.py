"""python -m gnsstpu entry point."""
import sys

import jax

# CLI runs are host-driven; pin to CPU unless the user overrides (the
# axon TPU tunnel stalls cold CLI invocations otherwise — see
# .claude/skills/verify).
import os
if os.environ.get("GNSSTPU_DEVICE", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from gnsstpu.cli import main  # noqa: E402

sys.exit(main())

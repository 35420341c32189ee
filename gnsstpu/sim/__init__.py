"""IF-signal simulation: fixture engine for closed-loop receiver tests."""

from gnsstpu.sim.generator import SatParams, IFSimulator  # noqa: F401

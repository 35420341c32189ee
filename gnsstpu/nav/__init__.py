from gnsstpu.nav.types import Ephemeris  # noqa: F401
from gnsstpu.nav import frame, lnav  # noqa: F401

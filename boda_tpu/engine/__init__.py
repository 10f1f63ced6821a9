from .iface import ConvFwd, make_engine
# importing the engine modules registers them with the engine= factory
from . import rtc_fwd as _rtc_fwd  # noqa: F401
from . import ref_fwd as _ref_fwd  # noqa: F401

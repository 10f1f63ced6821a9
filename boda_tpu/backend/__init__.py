from .iface import Backend, RtcFuncCall, make_backend
# importing the concrete backend modules registers them with the be= factory;
# they lazy-import jax internally so this is cheap.
from . import xla as _xla  # noqa: F401
from . import interp as _interp  # noqa: F401

from .iface import ConvFwd, make_engine

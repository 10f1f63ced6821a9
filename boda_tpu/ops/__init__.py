from .op_base import OpBase

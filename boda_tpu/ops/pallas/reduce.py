"""Reduction kernel template (reference: reduce.cucl / cnn_codegen
gen_op_reduce cnn_codegen.cc:28): sum N same-shaped inputs into one output
(used by BckConv filter-gradient accumulation across image blocks).
"""

from __future__ import annotations

import numpy as np

from ..op_base import OpBase
from ..registry import IN, OUT, KernelTemplate, adecl, template


@template
class Reduce(KernelTemplate):
    """out = sum over leading 'ins' dim of stacked inputs."""

    name = "reduce"
    args = [adecl("ins", IN, ""), adecl("out", OUT, "")]
    sig_nda_keys = ["ins", "out"]

    @classmethod
    def check_args(cls, op: OpBase) -> OpBase:
        rfs = OpBase({"func_name": cls.name})
        rfs.nda_vals["ins"] = op.nda_vals["ins"]
        rfs.nda_vals["out"] = op.nda_vals["out"]
        return rfs

    @classmethod
    def in_args(cls):
        return ["ins"]

    @classmethod
    def out_args(cls):
        return ["out"]

    @classmethod
    def io_args(cls):
        return []

    @classmethod
    def build(cls, rfs: OpBase):
        import jax.numpy as jnp

        def fn(ins):
            return jnp.sum(ins, axis=0)
        return fn

    @classmethod
    def ref_impl(cls, rfs: OpBase, ins):
        return np.asarray(ins).sum(axis=0)

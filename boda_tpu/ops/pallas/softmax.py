"""Softmax + loss kernel templates (reference: softmax.cucl,
sm_grad_and_loss.cucl, sum_loss_over_imgs.cucl; SoftmaxWithLoss lowering at
rtc_fwd.cc:365-374). Softmax is over the chan dim per (img,y,x), with the
max-subtraction stabilization the reference uses.
"""

from __future__ import annotations

import numpy as np

from ..op_base import OpBase
from ..registry import IN, OUT, KernelTemplate, adecl, template


def _np_softmax(x):
    x = np.asarray(x, np.float64)
    m = x.max(axis=1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=1, keepdims=True)


@template
class Softmax(KernelTemplate):
    name = "softmax"
    args = [adecl("in", IN, "img chan y x"), adecl("out", OUT, "img chan y x")]
    nhwc_ok = True

    @classmethod
    def build(cls, rfs: OpBase):
        import jax
        import jax.numpy as jnp
        ax = -1 if rfs.str_vals.get("io_layout") == "nhwc" else 1

        def fn(x):
            # stabilized softmax in f32 regardless of edge dtype
            y = jax.nn.softmax(x.astype(jnp.float32), axis=ax)
            return y.astype(x.dtype)
        return fn

    @classmethod
    def ref_impl(cls, rfs: OpBase, x):
        return _np_softmax(x).astype(np.asarray(x).dtype)


@template
class SmGradAndLoss(KernelTemplate):
    """Softmax gradient + per-pixel cross-entropy loss given labels."""

    name = "sm_grad_and_loss"
    args = [adecl("in", IN, "img chan y x"), adecl("label", IN, "img y x"),
            adecl("in_grad", OUT, "img chan y x"), adecl("loss", OUT, "img y x")]

    @classmethod
    def build(cls, rfs: OpBase):
        import jax
        import jax.numpy as jnp
        C = rfs.get_dims("in")["chan"]

        def fn(x, label):
            sm = jax.nn.softmax(x, axis=1)
            onehot = jax.nn.one_hot(label.astype(jnp.int32), C, axis=1, dtype=x.dtype)
            grad = sm - onehot
            p = jnp.take_along_axis(sm, label.astype(jnp.int32)[:, None], axis=1)[:, 0]
            loss = -jnp.log(jnp.maximum(p, 1e-30))
            return grad, loss.astype(x.dtype)
        return fn

    @classmethod
    def ref_impl(cls, rfs: OpBase, x, label):
        x = np.asarray(x)
        C = x.shape[1]
        sm = _np_softmax(x)
        li = np.asarray(label).astype(np.int64)
        onehot = np.moveaxis(np.eye(C)[li], -1, 1)
        grad = (sm - onehot).astype(x.dtype)
        p = np.take_along_axis(sm, li[:, None], axis=1)[:, 0]
        loss = (-np.log(np.maximum(p, 1e-30))).astype(x.dtype)
        return grad, loss


@template
class SumLossOverImgs(KernelTemplate):
    name = "sum_loss_over_imgs"
    args = [adecl("loss", IN, "img y x"), adecl("loss_sum", OUT, "n")]

    @classmethod
    def build(cls, rfs: OpBase):
        import jax.numpy as jnp

        def fn(loss):
            return jnp.sum(loss).reshape(1)
        return fn

    @classmethod
    def ref_impl(cls, rfs: OpBase, loss):
        return np.asarray(np.sum(loss)).reshape(1)
